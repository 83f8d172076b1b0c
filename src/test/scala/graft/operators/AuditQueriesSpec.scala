package graft.operators

import graft.SparkSpec
import graft.queries.{ModelQueries, OperatorQueries}
import org.apache.spark.sql.functions._

/** Planted-fixture specs for the r13 audit queries: q143 semantic
  * decontamination, q144 filter-agreement calibration, q145 ANN
  * ranking quality. The DuckDB oracle certifies engine-equality; these
  * pin the SEMANTICS on corpora where the right answer is known by
  * construction.
  */
class AuditQueriesSpec extends SparkSpec {

  private val Dim = 64

  /** Write a tiny embeddings table and return its table dir. */
  private def embTable(rows: Seq[(Long, Array[Float])]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("audit-spec").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private val vA: Array[Float] =
    Array.tabulate(Dim)(i => if (i < 32) 1f else 0f)
  private val vB: Array[Float] =
    Array.tabulate(Dim)(i => if (i >= 32) 1f else 0f) // vA · vB = 0

  test("q143: a train doc identical to an eval doc is flagged; an " +
      "orthogonal one is not") {
    // vec_id % 10 == 0 → eval; others → train.
    val dir = embTable(Seq(
      10L -> vA, // eval
      11L -> vA, // train, exact contamination of eval 10
      12L -> vB, // train, orthogonal to every eval vector
      20L -> vA  // second eval doc, also identical to 11
    ))
    val out = OperatorQueries.queries("q143_semantic_decontam")(spark, dir)
      .collect()
    assert(out.length == 1, s"expected exactly one flagged train doc, " +
      s"got ${out.mkString("; ")}")
    val r = out.head
    assert(r.getLong(0) == 11L)        // train_id
    assert(r.getLong(1) == 2L)         // n_hits: eval 10 AND eval 20
    assert(r.getDouble(2) == 1.0)      // max_sim (ROUND-4 of identical)
    assert(r.getLong(3) == 10L)        // best_eval: tie → min eval id
  }

  test("q145: on an identical-copy corpus the LSH top-10 equals the " +
      "exact top-10 — recall 1.0, nDCG 1.0, full pool visible") {
    // ids 0..29 all carry the SAME vector: one bucket holds all of
    // them, every cosine is 1.0, ties order by vec_id in both the
    // exact and the approximate ranking.
    val dir = embTable((0L until 30L).map(_ -> vA))
    val out = OperatorQueries.queries("q145_ann_rank_quality")(spark, dir)
      .collect()
    // Audit queries: vec_id % 25 == 0 → qids 0 and 25.
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 25L))
    for (r <- out) {
      assert(r.getLong(1) == 29L, "candidate pool = the other 29 copies")
      assert(r.getLong(2) == 10L, "all ten results are true top-10")
      assert(r.getLong(3) == 10000L, "recall@10 = 1.0 in e4")
      assert(r.getLong(4) == 1000000L, "nDCG@10 = 1.0 in e6")
    }
  }

  test("q144: decile report invariants on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    // Columns: bucket, n_docs, n_keep, mean_score_e6, n_bigrams,
    // mean_nll_e4.
    val out = ModelQueries.queries("q144_filter_agreement")(spark, dir)
      .collect()
    val buckets = out.map(_.getLong(0)).toSeq
    assert(buckets == buckets.sorted && buckets.distinct == buckets)
    assert(buckets.forall(b => b >= 0 && b <= 9))
    // Interior (un-clamped) buckets: the exact integer mean must sit
    // inside the bucket's own score band.
    for (r <- out; b = r.getLong(0) if b >= 1 && b <= 8) {
      val mean = r.getLong(3)
      assert(mean >= b * 100000 && mean < (b + 1) * 100000,
        s"bucket $b mean_score_e6 $mean outside its band")
    }
    // Conservation: every doc with ≥2 tokens (the LM-evidence floor)
    // lands in exactly one bucket, and the keep column re-derives from
    // the classifier applied independently to the same slice.
    val d = graft.Tables.load(spark, dir, "documents")
    val eligible = TextAnalysis.linearQuality(d, "text")
      .filter(size(filter(split(lower(col("text")), " "),
        t => length(t) > 0)) >= 2)
      .select(col("doc_id"), col("score_e6"))
    assert(out.map(_.getLong(1)).sum == eligible.count())
    assert(out.map(_.getLong(2)).sum ==
      eligible.filter(col("score_e6") >= 500000L).count())
    // Every bucket carries LM evidence and a positive mean NLL.
    assert(out.forall(r => r.getLong(4) >= 1L && r.getLong(5) > 0L))
  }
}
