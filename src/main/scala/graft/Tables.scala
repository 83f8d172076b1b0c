package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet dataset under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles predicate
  * pushdown, column pruning and vectorized decoding — at 100 TB the same
  * call scales by splitting files into `maxPartitionBytes` tasks.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, name): the testdata is read-only and
  // DataFrame plans are immutable, so re-loading per query would only
  // repeat the parquet footer read + file listing — measurable across a
  // 60-query run, and the same pattern a real deployment uses (register
  // the catalog once, plan many queries against it). The outer map is
  // WEAK on the session so a stopped SparkSession (and every plan cached
  // under it) stays collectable — a static strong map would pin sessions
  // for the JVM's lifetime.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent(spark, _ =>
        new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
      .computeIfAbsent((dir, name), _ => {
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    })

  /** Normalize an events-style `ts` column to TIMESTAMP (UTC-adjusted),
    * whatever convention the generator wrote:
    *  - TIMESTAMP(NANOS) parquet + spark.sql.legacy.parquet.nanosAsLong
    *    =true arrives as a long of epoch-nanos → truncate to micros
    *    (integer div — double division would lose precision above 2^53
    *    ns) and rebuild the timestamp;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ → cast to TIMESTAMP, exact because sessions run
    *    with spark.sql.session.timeZone=UTC (and NTZ is rejected by
    *    watermarks, so the streaming tier needs the cast even where
    *    batch SQL would tolerate NTZ).
    * DuckDB reads the same parquet naively; with a UTC session both
    * paths agree with the oracle bit-for-bit.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Register every table as a temp view (used by the CLI / SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
