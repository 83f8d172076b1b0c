package graft

import org.apache.spark.sql.functions._

/** The documented scale path for few-group exact quantiles: q38's window
  * formulation is exact and spillable but its parallelism is bounded by
  * the group count; `percentile_approx` (mergeable KLL-style sketch)
  * keeps full parallelism with bounded rank error. This spec pins that
  * the approximation tracks the exact answer closely on the testdata, so
  * switching plans at scale is a measured tradeoff, not a leap.
  */
class ApproxQuantileSpec extends SparkSpec {

  test("percentile_approx tracks exact window quantiles within 1%") {
    val exact = SparkEntry.queries("q38_percentiles")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
          .as("p90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (p50, p90)) =>
      val (a50, a90) = approx(flag)
      assert(math.abs(a50 - p50) / p50 < 0.01, s"$flag p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"$flag p90: $a90 vs $p90")
    }
  }

  test("approx_count_distinct (HLL++) tracks exact distinct within 5%") {
    // The other mergeable sketch a 100 TB pipeline leans on: exact
    // COUNT(DISTINCT) shuffles every distinct key; HLL++ carries a
    // fixed-size register set per partial aggregate.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
      .head()
    val (exactN, approxN) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approxN - exactN).toDouble / exactN < 0.05,
      s"approx $approxN vs exact $exactN")
  }
}
