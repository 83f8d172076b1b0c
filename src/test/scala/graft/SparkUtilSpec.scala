package graft

class SparkUtilSpec extends SparkSpec {

  test("stableCheckpoint: the durable opt-in returns identical rows " +
      "through a reliable checkpoint, and the default stays local") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 997).select(col("id"),
      pmod(col("id"), lit(7)).cast("string").as("g"))
    // Default mode: no reliable checkpoint files are written.
    val local = SparkUtil.stableCheckpoint(df)
    val expected = local.collect().map(_.toSeq).sortBy(_.toString).toSeq
    // Durable mode: checkpoint dir + the opt-in conf. The two-pass
    // primitives rely on partitioning surviving the materialization —
    // reliable Dataset.checkpoint preserves it (unlike a parquet
    // round-trip), so the downstream mapPartitions offsets stay valid.
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val durable = SparkUtil.stableCheckpoint(
        df.repartitionByRange(4, col("g"), col("id")))
      assert(durable.collect().map(_.toSeq).sortBy(_.toString).toSeq
        == expected)
      assert(durable.rdd.getNumPartitions == 4,
        "reliable checkpoint must preserve the range partitioning")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "durable mode must write checkpoint files")
      // The real consumer: the distributed rank fallback is row-equal
      // under the durable materialization.
      val viaDurable = graft.operators.Ranks.distributedPrefixSum(
        df.withColumn("w", lit(1L)), "g", Seq("id"), "w", "cum")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
      val viaLocal = graft.operators.Ranks.distributedPrefixSum(
        df.withColumn("w", lit(1L)), "g", Seq("id"), "w", "cum")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(viaDurable == viaLocal)
    } finally spark.conf.set("spark.graft.checkpoint.reliable", "false")
  }

  test("ensureParallelism raises split-sparse input to default parallelism") {
    val one = spark.range(1000).coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val raised = SparkUtil.ensureParallelism(one.toDF())
    assert(raised.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("ensureParallelism is a structural no-op with enough partitions") {
    val wide = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism + 4)
    val out = SparkUtil.ensureParallelism(wide.toDF())
    // same plan, no extra exchange — partition count unchanged
    assert(out.rdd.getNumPartitions == wide.rdd.getNumPartitions)
    assert(out.queryExecution.executedPlan.toString ==
      wide.toDF().queryExecution.executedPlan.toString)
  }
}
