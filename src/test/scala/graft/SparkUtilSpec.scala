package graft

class SparkUtilSpec extends SparkSpec {

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
