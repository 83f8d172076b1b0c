package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {

  private val vocab = Set("un", "##aff", "##able", "##ly", "hello", "world",
    "book", "##s", ",", ".", "1", "##2", "3")
  private val wp = new WordPieceTokenizer(vocab)

  test("wordpiece: greedy longest-match with ## continuations") {
    assert(wp.tokenize("unaffable") == Seq("un", "##aff", "##able"))
    // "##ly" exists but greedy matching consumes "##able" first, leaving
    // no valid piece — vocab coverage decides, exactly like BERT.
    assert(wp.tokenize("unaffablely") == Seq("un", "##aff", "##able", "##ly"))
  }

  test("wordpiece: whole-vocab words pass through, case-folded") {
    assert(wp.tokenize("Hello WORLD") == Seq("hello", "world"))
    assert(wp.tokenize("books") == Seq("book", "##s"))
  }

  test("wordpiece: punctuation splits off as its own token") {
    assert(wp.tokenize("hello, world.") ==
      Seq("hello", ",", "world", "."))
  }

  test("wordpiece: unmatchable remainder collapses the word to [UNK]") {
    assert(wp.tokenize("unaffordable") == Seq("[UNK]"))
    assert(wp.tokenize("zzz") == Seq("[UNK]"))
    // ...but neighbors still tokenize independently.
    assert(wp.tokenize("hello zzz world") ==
      Seq("hello", "[UNK]", "world"))
  }

  test("wordpiece: digit runs pre-tokenize like words") {
    assert(wp.tokenize("12 3") == Seq("1", "##2", "3"))
  }

  test("wordpiece: over-long words become [UNK] (BERT maxWordChars guard)") {
    val longWord = "a" * 200
    assert(wp.tokenize(longWord) == Seq("[UNK]"))
  }

  test("wordpiece plugs into the chunker token budget (countTokens)") {
    assert(wp.countTokens("unaffable books, hello") == 3 + 2 + 1 + 1)
  }

  test("vocab file round-trip") {
    val f = java.nio.file.Files.createTempFile("vocab", ".txt")
    java.nio.file.Files.writeString(f,
      vocab.toSeq.sorted.mkString("\n") + "\n\n")
    val loaded = WordPieceTokenizer.fromVocabFile(f.toString)
    assert(loaded.tokenize("unaffable books") ==
      Seq("un", "##aff", "##able", "book", "##s"))
  }

  test("regex tokenizer: words, digits, punctuation, 8-char pieces") {
    assert(RegexTokenizer.tokenize("Hello, world42!") ==
      Seq("hello", ",", "world", "42", "!"))
    assert(RegexTokenizer.tokenize("internationalization") ==
      Seq("internat", "##ionaliza", "##tion"))
  }
}
