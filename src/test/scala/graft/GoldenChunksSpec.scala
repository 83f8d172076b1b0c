package graft

import graft.operators.SemanticChunker
import graft.sources.MarkdownSource

import scala.io.Source

/** Golden end-to-end (SURVEY §5.3.3): the chunker's output over the ported
  * reference corpus is pinned to a checked-in manifest — any drift in
  * parsing, tokenization, embedding, boundary selection, or key derivation
  * fails here first, with a precise diff.
  */
class GoldenChunksSpec extends SparkSpec {

  test("markdown corpus chunks match the golden manifest exactly") {
    val elems = MarkdownSource.elements(spark, resourcePath("content/markdown"))
    val got = SemanticChunker.default.chunks(elems)
      .collect().sortBy(c => (c.documentid, c.chunk_index))
      .map(c => s"${c.documentid},${c.chunk_index},${c.key}," +
        s"${c.content.length},${c.context.replace(",", ";")}")
      .toSeq
    val src = Source.fromInputStream(
      getClass.getClassLoader.getResourceAsStream("golden_chunks.csv"), "UTF-8")
    val want = try src.getLines().toList finally src.close()
    assert(got.length == want.length,
      s"chunk count drifted: got ${got.length}, golden ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"golden row $i drifted:\n  got    $g\n  golden $w")
    }
  }
}
