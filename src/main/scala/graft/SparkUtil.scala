package graft

import org.apache.spark.sql.DataFrame

object SparkUtil {

  /** Raise a compute-bound pipeline's input to the session's default
    * parallelism when the scan produced fewer partitions.
    *
    * Parquet splits are row-group-granular, so a small table written as
    * one file with one row group scans as ONE task — and an expression-
    * heavy projection (language scoring, simhash, n-gram hashing) then
    * runs single-threaded however many cores the session has. At
    * production scale input splits outnumber cores and this is a
    * structural no-op; when it does fire, the one round-robin exchange of
    * the input is exactly the trade a compute-bound stage wants. Filter/
    * projection pushdown is unaffected (Catalyst pushes both through the
    * repartition to the scan).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // no partition introspection on streams
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
