package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (3L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (4L, Array(0f, 0f, 0f), Array(1f, 1f, 1f)),
    (5L, null, Array(1f, 1f, 1f)))
    .toDF("id", "a", "b")

  test("native expression matches the higher-order-function formula") {
    val hof = {
      val ad = transform(col("a"), _.cast("double"))
      val bd = transform(col("b"), _.cast("double"))
      val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), _ + _)
      val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), _ + _))
      val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), _ + _))
      when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
    }
    val rows = df.filter(col("id") < 5)
      .select(col("id"), CosineSimilarity(col("a"), col("b")).as("native"),
        hof.as("hof")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"id=${r.getLong(0)}")
    }
  }

  test("known values, zero-norm, and null semantics") {
    val m = df.select(col("id"), CosineSimilarity(col("a"), col("b")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(m(1L).contains(1.0))
    assert(m(2L).contains(0.0))
    assert(math.abs(m(3L).get - 0.9746318) < 1e-6)
    assert(m(4L).contains(0.0)) // zero-norm → 0.0
    assert(m(5L).isEmpty) // null input → null
  }

  test("stays inside whole-stage codegen over a parquet scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select("embedding").head().getSeq[Float](0).toArray
    val native = emb.select(CosineSimilarity(col("embedding"),
      typedlit(q)).as("s"))
    // the scoring Project carries the codegen star in the formatted plan
    val fmt = native.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("* Project"), fmt.take(400))
    // and the HOF formulation's Project is NOT codegen'd (no star)
    val ad = transform(col("embedding"), _.cast("double"))
    val hof = emb.select(aggregate(ad, lit(0.0), _ + _).as("s"))
    val fmtHof = hof.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!fmtHof.contains("* Project"), fmtHof.take(400))
  }

  test("registered as SQL function via GraftExtensions (shared session)") {
    import spark.implicits._
    Seq((Array(1f, 2f), Array(1f, 2f))).toDF("a", "b")
      .createOrReplaceTempView("cos_v")
    val r = spark.sql("SELECT cosine_sim(a, b) FROM cos_v").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
