package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-resampling semantics (q127's operator). The DuckDB
  * oracle certifies the fixed-point arithmetic engine-for-engine; these
  * pin the STATISTICS on corpora where the right ranking is known by
  * construction: target-vocabulary documents must outweigh
  * off-distribution ones, and the Gumbel perturbation must be
  * reproducible.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Two disjoint vocabularies: target docs speak a*, raw-only docs speak
  // b*. 20-token docs; each vocabulary's bigrams repeat across its docs.
  private def doc(prefix: String, seed: Int): String =
    (0 until 20).map(i => s"$prefix${(seed + i) % 6}").mkString(" ")
  private lazy val corpus =
    ((0 until 5).map(i => (i.toLong, doc("a", i), true)) ++
     (5 until 10).map(i => (i.toLong, doc("b", i), false)))
      .toDF("doc_id", "text", "is_en")

  test("target-vocabulary docs outweigh off-distribution docs") {
    val out = Dsir.importanceResample(corpus, "doc_id", "text",
      isTarget = col("is_en"), buckets = 512, k = 100).collect()
    assert(out.length == 10) // k exceeds corpus: everything selected
    val w = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val aMin = (0L to 4L).map(w).min
    val bMax = (5L to 9L).map(w).max
    assert(aMin > bMax,
      s"target min logw_e4 $aMin should exceed raw-only max $bMax")
  }

  test("n_grams counts bigram instances; short docs are dropped") {
    val mini = Seq((0L, "x y z x y", true), (1L, "solo", true),
      (2L, "", false)).toDF("doc_id", "text", "is_en")
    val out = Dsir.importanceResample(mini, "doc_id", "text",
      isTarget = col("is_en"), buckets = 64, k = 10).collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L))
    assert(out.head.getLong(1) == 4L) // 5 tokens -> 4 bigrams
  }

  test("score decomposes exactly and the ordering is deterministic") {
    val out = Dsir.importanceResample(corpus, "doc_id", "text",
      isTarget = col("is_en"), buckets = 512, k = 100).collect()
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3)) // score = logw + gumbel
    }
    val scores = out.map(r => (r.getLong(4), r.getLong(0)))
    assert(scores.sortBy { case (s, id) => (-s, id) }.toSeq == scores.toSeq)
    // Reproducible end to end: the Gumbel noise is md5-derived, not RNG.
    val again = Dsir.importanceResample(corpus, "doc_id", "text",
      isTarget = col("is_en"), buckets = 512, k = 100).collect()
    assert(again.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("k truncates at the score boundary with doc_id tiebreak") {
    val out = Dsir.importanceResample(corpus, "doc_id", "text",
      isTarget = col("is_en"), buckets = 512, k = 3).collect()
    val all = Dsir.importanceResample(corpus, "doc_id", "text",
      isTarget = col("is_en"), buckets = 512, k = 100).collect()
    assert(out.map(_.toSeq).toSeq == all.take(3).map(_.toSeq).toSeq)
  }
}
