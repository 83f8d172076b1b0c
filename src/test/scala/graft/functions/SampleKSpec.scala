package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SampleK = the k smallest (hash, id) pairs per group, merged across
  * partitions with bounded state: must equal the row_number plan
  * exactly, regardless of partitioning, and return whole groups smaller
  * than k.
  */
class SampleKSpec extends SparkSpec {
  import spark.implicits._

  // 3 strata of different sizes: a (40), b (12), c (3 — smaller than k).
  private lazy val rows =
    (1 to 40).map(i => ("a", i.toLong)) ++
      (101 to 112).map(i => ("b", i.toLong)) ++
      (201 to 203).map(i => ("c", i.toLong))

  private val K = 10

  private def sampled(parts: Int): Seq[(String, Long, String)] = {
    val df = rows.toDF("g", "id").repartition(parts)
    df.groupBy(col("g"))
      .agg(SampleK(md5(concat_ws(":", lit("t"), col("id"))), col("id"), K)
        .as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.id"), col("e.key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(t => (t._1, t._3))
  }

  private lazy val reference: Seq[(String, Long, String)] = {
    val df = rows.toDF("g", "id")
      .withColumn("k", md5(concat_ws(":", lit("t"), col("id"))))
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("k"), col("id"))))
      .filter(col("rn") <= K)
      .select(col("g"), col("id"), col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(t => (t._1, t._3))
  }

  test("equals the row_number plan on every stratum") {
    assert(sampled(8) == reference)
    // Stratum c has 3 < k members: all of them survive.
    assert(reference.count(_._1 == "c") == 3)
    assert(reference.count(_._1 == "a") == K)
  }

  test("partition-invariant: 1 partition and 16 partitions agree") {
    assert(sampled(1) == sampled(16))
  }

  test("eval returns pairs sorted ascending by hash") {
    val arr = rows.toDF("g", "id")
      .groupBy(col("g"))
      .agg(SampleK(md5(concat_ws(":", lit("t"), col("id"))), col("id"), K)
        .as("s"))
      .filter(col("g") === "a")
      .select(col("s")).head().getSeq[org.apache.spark.sql.Row](0)
    val hashes = arr.map(_.getString(0))
    assert(hashes == hashes.sorted)
  }

  test("an integer id coerces at analysis time instead of crashing") {
    // r9: declared inputTypes (ImplicitCastInputTypes) — an INT id used
    // to pass analysis and throw ClassCastException inside update().
    val got = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "id")
      .groupBy(col("g"))
      .agg(SampleK(md5(col("id").cast("string")), col("id"), 5).as("s"))
      .select(explode(col("s")).as("e")).select(col("e.id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }
}
