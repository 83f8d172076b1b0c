package graft.operators

/** BPE trainer/encoder semantics on known inputs: classic merge
  * progression, the documented leftmost-non-overlapping replace
  * convention, weighted tie-breaks, and early stop on an exhausted
  * vocabulary.
  */
class BpeSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("classic progression: repeated pair merges first, then grows") {
    // 'aaab' x10, 'aab' x5: pair counts — (a,a): 2*10+5 = 25,
    // (a,b): 10+5 = 15. Merge 1 = (a,a) -> 'aa'.
    val vocab = Seq(("aaab", 10L), ("aab", 5L))
    val merges = Bpe.trainMerges(vocab, 2)
    assert(merges.head == (("a", "a")))
    // After merge 1: 'aaab' -> [aa, a, b] (leftmost pair consumed the
    // first two a's), 'aab' -> [aa, b]. Pair counts: (aa,a) 10,
    // (aa,b) 5, (a,b) 10 — tie (aa,a) vs (a,b) at 10 broken
    // lexicographically: 'a' < 'aa' is true, so (a,b) wins.
    assert(merges(1) == (("a", "b")))
  }

  test("encodeWord applies merges with replace semantics") {
    val merges = Seq(("a", "a"), ("a", "b"))
    // ' a a a b ' --(a,a)--> ' aa a b ' --(a,b)--> ' aa ab '
    assert(Bpe.encodeWord("aaab", merges) == Seq("aa", "ab"))
    // alternating: second occurrence loses its leading space to the
    // first replacement and stays unmerged (documented convention,
    // identical in DuckDB).
    assert(Bpe.applyMerges(" a b a b ", Seq(("a", "b"))) == " ab a b ")
  }

  test("training stops early when no pairs remain") {
    val merges = Bpe.trainMerges(Seq(("ab", 3L)), 10)
    assert(merges == Seq(("a", "b"))) // one merge, then single symbols
  }

  test("weights dominate raw frequency of words") {
    // 'xy' appears in one heavy word, 'pq' in many light ones.
    val merges = Bpe.trainMerges(Seq(("xy", 100L), ("pq", 1L)), 1)
    assert(merges == Seq(("x", "y")))
  }

  test("spaced splits on codepoints, not UTF-16 chars") {
    // U+1F600 is a surrogate pair in UTF-16; a per-char split would
    // emit two broken half-symbols. The oracle segments per codepoint.
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.spaced(s"a${emoji}b") == s" a $emoji b ")
    assert(Bpe.symbols(Bpe.spaced(s"$emoji$emoji")) == Seq(emoji, emoji))
  }
}
