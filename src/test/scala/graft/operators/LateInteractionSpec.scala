package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture specs for late-interaction MaxSim retrieval (q149).
  * The DuckDB oracle certifies engine-equality on the testdata; these
  * pin the SEMANTICS — term-level matching that single-vector pooling
  * cannot express — on a corpus where MaxSim is computable by hand.
  */
class LateInteractionSpec extends SparkSpec {

  private val e1 = Array(1f, 0f, 0f, 0f)
  private val e2 = Array(0f, 1f, 0f, 0f)

  /** Query doc 0: tokens (e1, e2, e1, e2, e1). Doc 1: five e1 tokens —
    * the three e1 query tokens hit 1.0, the two e2 tokens hit 0.0 →
    * MaxSim 3.0. Doc 2: a mixed bag covering BOTH terms → every query
    * token finds a 1.0 match → MaxSim 5.0. A mean-pooled single vector
    * for doc 1 is closer to the pooled query than doc 2's is — the
    * ranking flip below is exactly what late interaction buys.
    */
  private def fixture() = {
    import spark.implicits._
    val rows =
      Seq(e1, e2, e1, e2, e1) ++ // ddoc 0 (query)
        Seq(e1, e1, e1, e1, e1) ++ // ddoc 1
        Seq(e1, e2, e1, e2, e2) // ddoc 2
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(expr("vec_id div 5").as("ddoc"), col("vec_id"),
        col("embedding"))
  }

  test("MaxSim scores and ranking match the hand computation") {
    val toks = fixture()
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 4)
    val out = LateInteraction.search(toks, "ddoc", "embedding",
        toks.filter(col("ddoc") === 0)
          .select(col("ddoc").as("qd"), col("vec_id"), col("embedding")),
        "qd", "vec_id", "embedding", lsh, k = 5, excludeSelf = true)
      .orderBy("pos").collect()
    assert(out.map(_.getAs[Long]("ddoc")).toSeq == Seq(2L, 1L),
      "full-coverage doc ranks above the single-term doc")
    assert(out(0).getAs[Long]("score_e4") == 50000L, "5 x 1.0 at e4")
    assert(out(1).getAs[Long]("score_e4") == 30000L, "3 x 1.0 + 2 x 0.0")
    assert(out.forall(_.getAs[Long]("n_cand") == 2L))
  }

  test("excludeSelf drops the query doc; without it the self-match " +
      "tops the ranking at a perfect score") {
    val toks = fixture()
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 4)
    val q = toks.filter(col("ddoc") === 0)
      .select(col("ddoc").as("qd"), col("vec_id"), col("embedding"))
    val withSelf = LateInteraction.search(toks, "ddoc", "embedding", q,
        "qd", "vec_id", "embedding", lsh, k = 5)
      .orderBy("pos").collect()
    assert(withSelf(0).getAs[Long]("ddoc") == 0L)
    assert(withSelf(0).getAs[Long]("score_e4") == 50000L)
    assert(withSelf.length == 3)
  }

  test("search is partition-invariant") {
    val toks = fixture()
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 4)
    val q = toks.filter(col("ddoc") === 0)
      .select(col("ddoc").as("qd"), col("vec_id"), col("embedding"))
    def run(df: org.apache.spark.sql.DataFrame) =
      LateInteraction.search(df, "ddoc", "embedding", q,
        "qd", "vec_id", "embedding", lsh, k = 5, excludeSelf = true)
        .orderBy("pos").collect().toSeq
    assert(run(toks.coalesce(1)) == run(toks.repartition(7)))
  }
}
