package graft.operators

import graft.SparkSpec

/** Content-defined-chunking dedup semantics (q130's operator). The
  * decisive property — the one the fixed grid (q126) lacks — is shift
  * robustness: a shared run at DIFFERENT offsets still produces
  * identical interior chunks, because cut positions depend only on
  * local content. md5 is deterministic, so these fixtures pin the exact
  * outcome forever.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")

  private def strip(df: org.apache.spark.sql.DataFrame) =
    Cdc.strip(df, "doc_id", "text", w = 4, modulus = 16, minDocFreq = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("shared run at DIFFERENT offsets still dedupes (shift robust)") {
    // doc 0 carries the 200-token run bare; doc 1 shifts it by a
    // 3-token prefix (which breaks EVERY fixed-grid alignment); doc 2
    // is disjoint. Interior chunks of the run are offset-independent.
    val corpus = Seq(
      (0L, run(1, 200)),
      (1L, "p1 p2 p3 " + run(1, 200)),
      (2L, run(501, 700)))
      .toDF("doc_id", "text")
    val out = strip(corpus)
    assert(out(0L)._4 > 100L,
      s"doc 0 should lose most of the shared run, lost ${out(0L)._4}")
    assert(out(1L)._4 > 100L,
      s"doc 1 should lose most of the shared run, lost ${out(1L)._4}")
    // the disjoint doc is untouched
    assert(out(2L) == ((run(501, 700), out(2L)._2, 0L, 0L)))
    // only boundary chunks may differ between the two carriers
    assert(math.abs(out(0L)._4 - out(1L)._4) < 64L)
  }

  test("short identical docs dedupe as whole-doc chunks") {
    val corpus = Seq((0L, "x y"), (1L, "x y"), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = strip(corpus)
    assert(out(0L) == (("", 1L, 1L, 2L)))
    assert(out(1L) == (("", 1L, 1L, 2L)))
    assert(out(2L) == (("a b", 1L, 0L, 0L)))
  }

  test("within-doc repetition alone does not strip") {
    val seg = run(1, 30)
    val corpus = Seq((0L, seg + " " + seg), (1L, run(101, 160)))
      .toDF("doc_id", "text")
    val out = strip(corpus)
    assert(out(0L)._3 == 0L && out(0L)._4 == 0L)
  }

  test("token conservation: kept + removed = original length") {
    val corpus = Seq(
      (0L, run(1, 100)),
      (1L, "q1 q2 " + run(1, 100) + " z1 z2 z3"))
      .toDF("doc_id", "text")
    val out = strip(corpus)
    out.foreach { case (id, (text, _, _, removed)) =>
      val kept = if (text.isEmpty) 0 else text.split(" ").length
      val orig = if (id == 0L) 100 else 105
      assert(kept + removed == orig, s"doc $id: $kept + $removed != $orig")
    }
  }
}
