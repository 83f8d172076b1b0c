package graft.operators

import graft.functions.{RegexTokenizer, WordPieceTokenizer}
import graft.model.ElementRow
import org.scalatest.funsuite.AnyFunSuite

/** C1's token budget under a REAL WordPiece vocabulary — the reference
  * counts tokens with a BERT tokenizer loaded from `vocab.txt`
  * (`Program.cs:64-65,70`), so the budget that decides chunk boundaries
  * is a vocab-driven count, not a regex approximation. This spec loads
  * the committed frozen fixture (`src/main/resources/wordpiece_vocab
  * .txt`), derives the counts BY HAND from the vocab, and pins that the
  * chunker's cut points actually move with the tokenizer: the same
  * document under the same `maxTokens` budget chunks differently under
  * WordPiece (sub-word splits inflate counts past the budget) than
  * under the regex default — and each emitted chunk honors the budget
  * in ITS OWN tokenizer's units.
  */
class WordPieceChunkerSpec extends AnyFunSuite {

  private val vocabPath = {
    val url = getClass.getClassLoader.getResource("wordpiece_vocab.txt")
    require(url != null, "frozen vocab fixture missing from resources")
    java.nio.file.Paths.get(url.toURI).toString
  }
  private val wp = WordPieceTokenizer.fromVocabFile(vocabPath)

  private val s1 = "the semantic chunker splits documents"
  private val s2 = "token budgets bound the chunks"
  private val s3 = "wordpiece vocabularies match greedily"

  test("fixture vocab drives hand-derivable greedy counts that differ " +
      "from the regex tokenizer's") {
    // the(1) semantic(1) chunk+##er(2) split+##s(2) document+##s(2) = 8
    assert(wp.tokenize(s1) == Seq("the", "semantic", "chunk", "##er",
      "split", "##s", "document", "##s"))
    // token(1) budget+##s(2) bound(1) the(1) chunk+##s(2) = 7
    assert(wp.countTokens(s2) == 7)
    // word+##piece(2) vocab+##ular+##ies(3) match(1) greed+##ily(2) = 8
    assert(wp.tokenize(s3) == Seq("word", "##piece", "vocab", "##ular",
      "##ies", "match", "greed", "##ily"))
    // The regex default sees the same strings as 6 / 5 / 6 tokens
    // (words ≤8 chars are single; "documents"/"wordpiece"/"vocabularies"
    // split into 8-char pieces).
    assert(RegexTokenizer.countTokens(s1) == 6)
    assert(RegexTokenizer.countTokens(s2) == 5)
    assert(RegexTokenizer.countTokens(s3) == 6)
  }

  test("C1 budget parity: the SAME document and budget cut differently " +
      "under the vocab — WordPiece counts 8+7 > 13, regex counts " +
      "6+5 <= 13") {
    // Two segments, so no semantic cut can fire (that path needs >2) —
    // the boundary below is PURELY the token budget's.
    val elements = Seq(
      ElementRow.para("d1", Seq(0), 0, s1, s1),
      ElementRow.para("d1", Seq(0), 1, s2, s2))
    val wpChunks = new SemanticChunker(tokenizer = wp, maxTokens = 13)
      .chunkDocument("d1", elements)
    val reChunks = new SemanticChunker(maxTokens = 13)
      .chunkDocument("d1", elements)
    assert(wpChunks.map(_.content) == Seq(s1, s2),
      "WordPiece counts (8 then 7) must overflow the 13-token budget " +
        "and cut between the segments")
    assert(reChunks.map(_.content) == Seq(s"$s1\n$s2"),
      "regex counts (6 + 5 = 11) fit the same budget in one chunk")
    // Keys stay the deterministic ingest keys in both runs.
    assert(wpChunks.map(_.chunk_index) == Seq(0, 1))
    assert(reChunks.map(_.chunk_index) == Seq(0))
  }

  test("every emitted chunk honors the budget in its own tokenizer's " +
      "units on a 3-segment document (semantic cuts may add boundaries, " +
      "never violate the budget)") {
    val elements = Seq(
      ElementRow.para("d2", Seq(0), 0, s1, s1),
      ElementRow.para("d2", Seq(0), 1, s2, s2),
      ElementRow.para("d2", Seq(0), 2, s3, s3))
    val budget = 14
    val wpChunks = new SemanticChunker(tokenizer = wp, maxTokens = budget)
      .chunkDocument("d2", elements)
    val reChunks = new SemanticChunker(maxTokens = budget)
      .chunkDocument("d2", elements)
    // Segment texts are never split below element granularity, so a
    // chunk's count is the sum of its segments' counts — each must fit
    // the budget (single over-budget segments excepted; none here).
    wpChunks.foreach { c =>
      val n = c.content.split("\n").map(wp.countTokens).sum
      assert(n <= budget, s"WordPiece chunk '$c' holds $n > $budget tokens")
    }
    reChunks.foreach { c =>
      val n = c.content.split("\n").map(RegexTokenizer.countTokens).sum
      assert(n <= budget, s"regex chunk '$c' holds $n > $budget tokens")
    }
    // WordPiece counts (8,7,8) cannot pack ANY two of these segments
    // under 14 (8+7 and 7+8 both overflow), so the vocab forces all
    // three boundaries whatever the semantic cuts do — hand-derivable.
    // Regex counts (6,5,6) pack at least one adjacent pair (11 ≤ 14):
    // the vocab strictly refines the boundary structure.
    assert(wpChunks.length == 3)
    assert(wpChunks.length >= reChunks.length && reChunks.length >= 2)
    // Both runs agree on total content — chunking never drops text.
    assert(wpChunks.map(_.content).mkString("\n") ==
      reChunks.map(_.content).mkString("\n"))
  }
}
