package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query cost attribution for the bench-gate analysis: wall time vs
  * Spark job structure (job count, summed job wall, largest job). Lets
  * BASELINE.md's floor correction be MEASURED instead of asserted —
  * `wall − jobsum` is driver-side planning/codegen/collect latency, and
  * `njobs × empty-job floor` is the scheduling cost a long-lived cluster
  * amortizes but a per-query local bench pays in full.
  *
  * Usage: graft.Profile <sfDir> <queryName>... (3 warm reps each; an
  * empty-job floor probe prints first).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // SPARK_GRAFT_AQE=false lets an A/B measure AQE's per-stage job
      // scheduling cost at bench scale (it's a cluster-scale feature;
      // locally each query stage is its own job + floor).
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val starts = scala.collection.mutable.Map.empty[Int, (Long, String)]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized {
          val desc = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?")
          starts(j.jobId) = (j.time, desc)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          val (t0, desc) = starts.getOrElse(j.jobId, (j.time, "?"))
          jobs += ((j.time - t0, desc))
        }
    })

    // Empty-job floor: the fixed scheduling+codegen cost of one no-op job.
    val floorReps = (1 to 10).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"empty_job_floor_median=${floorReps(5)}%.3f s")

    for (n <- names) {
      val fn = SparkEntry.queries(n)
      for (rep <- 1 to 3) {
        starts.synchronized { jobs.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let async listener events drain
        val (nj, sumS, maxS) = starts.synchronized {
          (jobs.size, jobs.map(_._1).sum / 1000.0,
            jobs.map(_._1).maxOption.getOrElse(0L) / 1000.0)
        }
        println(f"$n rep$rep wall=$wall%.2f njobs=$nj jobsum=$sumS%.2f " +
          f"maxjob=$maxS%.2f driver=${wall - sumS}%.2f")
        // SPARK_GRAFT_JOBDBG: per-job wall + submitting call site, last
        // rep only — which operator pays the njobs × floor tax.
        if (rep == 3 && sys.env.contains("SPARK_GRAFT_JOBDBG"))
          starts.synchronized {
            jobs.zipWithIndex.foreach { case ((ms, desc), i) =>
              println(f"  job$i%3d ${ms / 1000.0}%6.2fs  $desc")
            }
          }
      }
    }
    spark.stop()
  }
}
