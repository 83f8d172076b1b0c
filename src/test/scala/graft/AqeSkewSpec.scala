package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning, demonstrated live: a join whose shuffle has
  * one pathological hot key gets its oversized partition SPLIT by the
  * adaptive skew-join optimization — the runtime half of the engine's
  * skew story (the compile-time half, exact block salting, is certified
  * by q27/q50's oracle hash-match).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed shuffle partition of a hot-key join") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Tiny thresholds so the local fixture's hot key counts as skew.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key + a uniform tail vs a small right side.
      val left = spark.range(50000).select(lit(7L).as("k"), col("id").as("payload"))
        .union(spark.range(2000).select((col("id") % 40 + 100).as("k"),
          col("id").as("payload")))
      val right = spark.range(200).select(col("id").as("k"),
        (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      // collect() is the one action bound to THIS frame's queryExecution
      // (count()/write() spawn fresh executions), so afterwards the
      // frame's AdaptiveSparkPlan is the re-planned final one.
      val rows = joined.collect()
      // key 7 matches once per left row; tail keys 100..139 each match once.
      assert(rows.length == 50000 + 2000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
