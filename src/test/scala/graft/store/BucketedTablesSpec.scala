package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of bucketing: a join between two tables bucketed on the join
  * key plans with NO Exchange (and, being sorted, no per-query Sort) —
  * the shuffle was paid once at write time.
  */
class BucketedTablesSpec extends SparkSpec {

  test("join of co-bucketed tables plans without any shuffle") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    // Clean both the catalog entry and the on-disk location: a previous
    // JVM's managed-table directory survives in spark-warehouse/ while the
    // new session's in-memory catalog has no entry for it, and CTAS then
    // fails with LOCATION_ALREADY_EXISTS.
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    BucketedTables.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    BucketedTables.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    // Force the sort-merge path (both sides are tiny at sf0.001 and would
    // broadcast, which hides the bucketing effect being asserted).
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = BucketedTables.read(spark, "orders_b")
        .join(BucketedTables.read(spark, "lineitem_b"), "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() ==
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count())
    }
  }

  private def withConf[T](kv: (String, String))(f: => T): T = {
    val (k, v) = kv
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f
    finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }
}
