package graft.operators

import graft.SparkSpec

/** Paragraph-grid boilerplate removal semantics (q126's operator) on
  * crafted corpora where the expected answer is computed by hand. The
  * DuckDB oracle certifies engine agreement at each SF; these pin the
  * SEMANTICS: grid alignment, cross-doc-only stripping, trailing
  * partial-segment survival.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")

  test("strip removes grid-aligned cross-doc duplicate segments only") {
    // docs 0/1 share tokens b1..b12 as their FIRST grid segment; doc 0
    // continues with 12 unique tokens + a 3-token tail, doc 1 with 12
    // unique tokens exactly. doc 2 contains the same b-run but OFF the
    // grid (1-token prefix), so its hash differs and nothing strips.
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (0L, boiler + " " + run(1, 12) + " x y z"),
      (1L, boiler + " " + run(21, 32)),
      (2L, "pre " + boiler + " " + run(41, 51)))
      .toDF("doc_id", "text")
    val out = ParagraphDedup.strip(corpus, "doc_id", "text", w = 12,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(0L) == ((run(1, 12) + " x y z", 2L, 1L, 12L)))
    assert(out(1L) == ((run(21, 32), 2L, 1L, 12L)))
    // doc 2: 24 tokens -> 2 full segments, both unique (misaligned run)
    assert(out(2L) == (("pre " + boiler + " " + run(41, 51), 2L, 0L, 0L)))
  }

  test("within-doc repetition alone does not strip") {
    val seg = run(1, 12)
    val corpus = Seq(
      (0L, seg + " " + seg), // same segment twice in ONE doc
      (1L, run(21, 32)))
      .toDF("doc_id", "text")
    val out = ParagraphDedup.strip(corpus, "doc_id", "text", w = 12,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
    assert(out(0L) == ((seg + " " + seg, 0L)))
  }

  test("fully-covered doc rebuilds empty; short docs pass through") {
    val seg = run(1, 12)
    val corpus = Seq(
      (0L, seg), (1L, seg),   // both fully covered
      (2L, "a b c"))          // < W tokens: no segments at all
      .toDF("doc_id", "text")
    val out = ParagraphDedup.strip(corpus, "doc_id", "text", w = 12,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(0L) == (("", 1L, 1L, 12L)))
    assert(out(1L) == (("", 1L, 1L, 12L)))
    assert(out(2L) == (("a b c", 0L, 0L, 0L)))
  }

  test("trailing partial segment survives even when all full segs strip") {
    val seg = run(1, 12)
    val corpus = Seq(
      (0L, seg + " tail1 tail2"),
      (1L, seg))
      .toDF("doc_id", "text")
    val out = ParagraphDedup.strip(corpus, "doc_id", "text", w = 12,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
    assert(out(0L) == (("tail1 tail2", 12L)))
    assert(out(1L) == (("", 12L)))
  }

  test("minDocFreq=3 requires three distinct docs") {
    val seg = run(1, 12)
    val corpus = Seq((0L, seg), (1L, seg), (2L, run(21, 32)))
      .toDF("doc_id", "text")
    val out2 = ParagraphDedup.strip(corpus, "doc_id", "text", w = 12,
      minDocFreq = 3).collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out2 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }
}
