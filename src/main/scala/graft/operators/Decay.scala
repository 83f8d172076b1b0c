package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXPONENTIAL TIME-DECAY aggregates — "what matters NOW": activity
  * counts where an event's weight halves every `halflife` (trending
  * detection, freshness-weighted popularity, the recency prior a crawl
  * scheduler feeds on). The standard form w = 2^(−age/h) needs float
  * `pow`; this one quantizes age to half-life BUCKETS — k = age div h
  * (clamped at 0 for future-dated rows), w_e6 = 10⁶ >> k — so every
  * weight is an exact integer, every sum is order-free exact
  * arithmetic, and the whole report replays bit-for-bit in SQL.
  * Weights vanish at k ≥ 20 (10⁶ >> 20 = 0): a built-in horizon ~20
  * half-lives out, exactly where the real exponential is noise anyway.
  *
  * The decay anchor (`asOfEpoch`) is a parameter, not `now()`: reports
  * are reproducible and backfillable. Scale shape: pure per-row
  * integer algebra into one map-side-combinable aggregate per group —
  * rides the scan, one shuffle of group cells.
  *
  * Output per group: n_events, decayed_n_e6 (Σ w_e6 — the "effective
  * recent count"), decayed_value_e8 (Σ w_e6 · value_e2 with
  * value_e2 = round(value·100) — the same multiply-then-round both
  * engines evaluate on the same double), and recency_e4 =
  * decayed_n_e6 div (n_events · 100): 10⁴ means everything happened
  * inside the newest bucket, → 0 means the mass is ancient.
  */
object Decay {

  def timeDecayed(df: DataFrame, groupCol: String, tsCol: Column,
      valueCol: Column, asOfEpoch: Long, halflifeSec: Long): DataFrame =
    decayCore(graft.SparkUtil.ensureParallelism(df), groupCol, tsCol,
      valueCol, lit(asOfEpoch), halflifeSec)

  /** [[timeDecayed]] anchored at the stream's OWN max timestamp,
    * derived IN-PLAN as a broadcast scalar (r21): the q196 shape ran a
    * separate max(ts) collect action just to bake the anchor into a
    * literal — same two scans either way, one Spark action instead of
    * two, and still reproducible (the anchor is a pure function of the
    * stream, not `now()`).
    */
  def timeDecayedAtStreamMax(df: DataFrame, groupCol: String,
      tsCol: Column, valueCol: Column, halflifeSec: Long): DataFrame = {
    val src = graft.SparkUtil.ensureParallelism(df)
    val anchor = src.agg(max(unix_timestamp(tsCol)).as("__asof"))
    decayCore(src.crossJoin(broadcast(anchor)), groupCol, tsCol,
      valueCol, col("__asof"), halflifeSec)
  }

  private def decayCore(src: DataFrame, groupCol: String, tsCol: Column,
      valueCol: Column, asOf: Column, halflifeSec: Long): DataFrame = {
    require(halflifeSec > 0, s"halflife must be positive: $halflifeSec")
    src
      .select(col(groupCol).as("__g"),
        (asOf - unix_timestamp(tsCol)).as("__age"),
        valueCol.cast("double").as("__val"))
      .withColumn("__k",
        when(col("__age") <= 0, lit(0L))
          .otherwise(expr(s"__age div ${halflifeSec}L")))
      .withColumn("__w",
        expr("shiftright(1000000L, CAST(least(__k, 62) AS INT))"))
      .withColumn("__v", expr("CAST(round(__val * 100) AS BIGINT)"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w")).as("decayed_n_e6"),
        sum(col("__w") * col("__v")).as("decayed_value_e8"))
      .withColumn("recency_e4",
        expr("decayed_n_e6 div (n_events * 100)"))
      .withColumnRenamed("__g", groupCol)
  }
}
