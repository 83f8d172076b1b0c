package graft.operators

import graft.SparkSpec
import graft.queries.DedupQueries

/** Planted-fixture spec for q239: the leak propagates exactly one hop
  * — the direct sharer is the seed, its near-copy (which shares NO
  * eval 3-gram) is hop 1, and an unrelated doc is never reached.
  */
class ContaminationRadiusSpec extends SparkSpec {
  import spark.implicits._

  test("a near-copy that shares no eval n-gram is quarantined at " +
      "hop 1; unrelated docs stay outside the radius") {
    val dir = java.nio.file.Files.createTempDirectory("rad-spec").toString
    val evalWords = (0 until 40).map(i => s"w$i")
    val tail = (0 until 80).map(i => s"t$i")
    val xText = evalWords.mkString(" ")
    // seed: contains the whole eval doc → contaminated (38/118 ≥ 0.3)
    val yText = (evalWords ++ tail).mkString(" ")
    // hop-1 candidate: shares Y's tail (J ≈ 0.64 in shingle space —
    // enough for a band collision with these fixed strings, asserted
    // below) but ZERO eval 3-grams
    val zText = ((0 until 4).map(i => s"h$i") ++ tail).mkString(" ")
    val uText = (0 until 50).map(i => s"u$i").mkString(" ")
    Seq((50L, xText, "s", "en"), (1L, yText, "s", "en"),
      (2L, zText, "s", "en"), (3L, uText, "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("q239_contamination_radius")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 3)
    assert(out(0) == (0L, 1L, 120L), s"seed row: ${out(0)}")
    assert(out(1) == (1L, 1L, 84L), s"hop-1 row: ${out(1)}")
    assert(out(2) == (2L, 0L, 0L), s"hop-2 row: ${out(2)}")
  }
}
