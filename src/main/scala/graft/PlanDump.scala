package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query from [[SparkEntry.queries]] with a
  * noop sink (same measurement as Bench), print wall time and the
  * formatted physical plan. Usage:
  *   tools/run.sh graft.PlanDump <sfDir> <queryName> [repeat]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to repeat) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      println(f"[plandump] $name run $i: build ${(tPlan - t0) / 1e9}%.2f s, " +
        f"exec ${(t1 - tPlan) / 1e9}%.2f s")
      if (i == repeat) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
