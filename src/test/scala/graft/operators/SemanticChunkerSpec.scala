package graft.operators

import graft.SparkSpec
import graft.model.ElementRow
import graft.sources.MarkdownSource

class SemanticChunkerSpec extends SparkSpec {

  private def para(doc: String, seq: Int, text: String): ElementRow =
    ElementRow.para(doc, Seq(0), seq, text, text)

  private def header(doc: String, seq: Int, text: String, lvl: Int): ElementRow =
    ElementRow(doc, Seq(0), None, seq, "header", Some(lvl), Some(text),
      Some("#" * lvl + " " + text), None, None, None, None, None)

  test("content is preserved: concat(chunks) == concat(segments)") {
    val elems = Seq(
      header("d", 0, "Title", 1),
      para("d", 1, "first paragraph about stars"),
      para("d", 2, "second paragraph about stars too"),
      para("d", 3, "totally different topic entirely now"))
    val chunks = SemanticChunker.default.chunkDocument("d", elems)
    assert(chunks.nonEmpty)
    assert(chunks.map(_.content).mkString("\n") ==
      elems.flatMap(_.text).mkString("\n"))
    assert(chunks.map(_.chunk_index) == chunks.indices)
    assert(chunks.map(_.key).distinct.size == chunks.size)
  }

  test("token bound forces splits") {
    val longPara = ("word " * 600).trim // 600 tokens
    val elems = (0 until 5).map(i => para("d", i, longPara))
    val c = new SemanticChunker(maxTokens = 1000, splitPercentile = 0.0)
    val chunks = c.chunkDocument("d", elems)
    // 5 segments of 600 tokens with a 1000 cap → no chunk holds >1 segment.
    assert(chunks.size >= 3)
    val tok = graft.functions.RegexTokenizer
    chunks.foreach(ch => assert(tok.countTokens(ch.content) <= 1000))
  }

  test("semantic boundary: topic change is a preferred split point") {
    val space = Seq(
      "stars collapse under gravity forming black holes",
      "black holes bend light near the event horizon",
      "the event horizon hides the singularity of black holes",
      "coral reefs host thousands of tropical fish",
      "reef fish depend on coral polyps for food and shelter",
      "coral polyps build calcium carbonate reef structures")
    val elems = space.zipWithIndex.map { case (t, i) => para("d", i, t) }
    val c = new SemanticChunker(maxTokens = 100000, splitPercentile = 0.2)
    val chunks = c.chunkDocument("d", elems)
    assert(chunks.size >= 2)
    // The astronomy→reef transition (after segment 3) must start a chunk.
    assert(chunks.exists(_.content.startsWith("coral reefs host")))
  }

  test("context carries the heading trail") {
    val elems = Seq(
      header("d", 0, "Guide", 1),
      header("d", 1, "Install", 2),
      para("d", 2, "run the installer"),
      header("d", 3, "Usage", 2),
      para("d", 4, "run the binary"))
    val chunks = SemanticChunker.default.chunkDocument("d", elems)
    val all = chunks.map(c => (c.content, c.context))
    assert(all.head._2.startsWith("Guide"))
    // Some chunk containing 'Usage' content sees the Guide > Usage trail.
    assert(chunks.exists(c => c.content.contains("run the binary") ||
      c.context == "Guide > Usage"))
  }

  test("empty documents produce no chunks; error rows are ignored") {
    assert(SemanticChunker.default.chunkDocument("d", Seq.empty).isEmpty)
    val errOnly = Seq(ElementRow("d", Seq(0), None, 0, "error", None,
      Some("boom"), None, None, None, None, None, None))
    assert(SemanticChunker.default.chunkDocument("d", errOnly).isEmpty)
  }

  test("distributed chunks over the markdown corpus: 10 docs, determinism") {
    val elems = MarkdownSource.elements(spark, resourcePath("content/markdown"))
    val chunker = SemanticChunker.default
    val a = chunker.chunks(elems).collect().sortBy(c => (c.documentid, c.chunk_index))
    val b = chunker.chunks(elems).collect().sortBy(c => (c.documentid, c.chunk_index))
    assert(a.map(_.key).toSeq == b.map(_.key).toSeq) // idempotent
    assert(a.map(_.documentid).distinct.length == 10)
    assert(a.forall(_.content.nonEmpty))
  }
}
