package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Eagerly-materialized localCheckpoints (bm25 stats, LSH buckets,
      // packing) are freed by the ContextCleaner only after a JVM GC;
      // across 85 queries x 2 reps the orphaned blocks otherwise pile up
      // in the block manager and late queries pay eviction churn.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-footer warmup so the first measured query does
    // not absorb session startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Optional comma-separated prefix filter for local iteration on a
    // subset (e.g. SPARK_GRAFT_ONLY=q30,q92); the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    val results = selected.map { case (name, fn) =>
      // Three reps, report the MEDIAN of the last three measured walls:
      // the DuckDB denominator (BASELINE_QUERIES.json) is a median of 3
      // warm reps, so the apples-to-apples Spark number is a warm median
      // too. Rep 1 absorbs per-query codegen/JIT that a long-lived
      // deployment pays once; the median (not "the 2nd rep") survives the
      // sandbox's random multi-second scheduler stalls, which measured
      // GC=0 and move between queries on every run.
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      var ok = true
      for (rep <- 1 to 3 if ok) {
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        // noop sink (not .count) so the measured plan includes the final
        // sort/project work the driver's correctness dump actually
        // executes — count() would let Catalyst drop ordering entirely.
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // Keep timing the rest, but a failed query must be VISIBLE in
          // both channels — on stderr AND in the JSON — or its deceptively
          // small timing would make the bench gate easier to pass while
          // broken.
          ok = false
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        walls += t
        if (sys.env.contains("SPARK_GRAFT_GCDBG"))
          System.err.println(f"[gcdbg] $name rep$rep wall=$t%.2f gc=${(gcMillis() - gc0) / 1000.0}%.2f")
      }
      name -> walls.sorted.apply(walls.size / 2)
    }.toMap
    // Headline fields FIRST and per-query times sorted + rounded to 3 dp:
    // the driver archives only a bounded tail of this output, so the
    // compact deterministic layout keeps the newest (alphabetically last)
    // queries inside the window and makes any cut reproducible instead of
    // hash-map-order random.
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The six queries that execute a REAL streaming run or physical
    // store write: their DuckDB denominators are single-statement batch
    // replays (the oracle certifies their answers, not their runtime
    // model — BASELINE.md fairness notes), so the 2x gate is read on
    // the batch tier and the stream tier is reported separately.
    val streamExec = Set("q69_bucketed_merge", "q84_stream_e2e",
      "q85_stream_neardup", "q89_stream_ingest", "q107_stream_join",
      "q117_stream_sessions")
    // Self-check the split on a full run: a renamed stream query would
    // otherwise silently land in (and inflate) the gated batch tier.
    if (only.isEmpty)
      require(streamExec.subsetOf(results.keySet),
        s"stream split out of sync with the registry: missing " +
          (streamExec -- results.keySet).mkString(", "))
    val batchTotal = results.filterNot(r => streamExec(r._1)).values.sum
    val r3 = (v: Double) => math.rint(v * 1000) / 1000
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","batch_value":${r3(batchTotal)},"stream_exec_value":${r3(total - batchTotal)},"failed":$failedJson,"sf":"$sfDir","queries":$qs}"""
    // The driver archives only a bounded TAIL of stdout, which has
    // truncated the per-query map (alphabetically-early q100-q123 keys)
    // two rounds running. The complete artifact therefore also goes to a
    // repo file — committed post-run — so every timing is verifiable
    // regardless of how the console output is cut.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json"))
      .toAbsolutePath
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The artifact only counts if it lands in the repo; a cwd outside
    // the project would quietly leave the committed copy stale.
    if (!java.nio.file.Files.exists(out.getParent.resolve("build.sbt")))
      System.err.println(s"[bench] WARNING: wrote $out outside a repo " +
        "root (no build.sbt beside it) — the committed BENCH_FULL.json " +
        "was NOT updated")
    println(line)
    spark.stop()
  }
}
