package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join primitive for repeated
  * big⋈big joins (SURVEY.md §2.9 north-star scale design; no reference
  * counterpart, the reference is single-process).
  *
  * Writing both sides bucketed (and sorted) by the join key once means
  * every subsequent join on that key reads pre-partitioned, pre-sorted
  * buckets: no Exchange, no per-query Sort — the shuffle is paid once at
  * write time instead of on every query. At 100 TB this is the difference
  * between re-shuffling the fact table per query and never shuffling it
  * again; pick `numBuckets` so a bucket of the LARGEST table fits an
  * executor core's working set (e.g. 100 TB / 8192 buckets ≈ 12 GB).
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
