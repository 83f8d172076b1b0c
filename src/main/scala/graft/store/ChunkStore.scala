package graft.store

import graft.model.EmbeddedChunk
import org.apache.spark.sql.{DataFrame, Dataset}

/** The store seam: what the ingestion surface (batch pipeline, stream
  * ingest) requires of a chunk store — replace-by-document upsert with
  * idempotent deterministic keys, and schema-on-read read-back. Two
  * layouts implement it:
  *
  *   - [[VectorStore]]: one parquet partition per documentid — the
  *     reference's replace-unit layout (`VectorStoreCommands.cs:159`),
  *     right for ingest increments and REPL collections;
  *   - [[BucketedVectorStore]]: nBuckets hash partitions of documentid
  *     — the 100 TB layout (file census independent of document count,
  *     O(buckets) commits, bucket-pruned merges and point reads).
  *
  * The contract both must honor (and ChunkStoreSwapSpec certifies):
  * the LAYOUT is invisible to readers — the same pipeline run lands
  * byte-identical (key, content, context, documentid, embedding) rows
  * through either implementation.
  */
trait ChunkStore {
  def upsert(chunks: Dataset[EmbeddedChunk], collection: String): Unit
  def read(collection: String): DataFrame
}

object ChunkStore {
  /** Recursive .parquet data-file census under a store path — ONE
    * walker for every layout's compaction certificate (underscore
    * sidecar dirs are invisible to reads and constant-size, so they
    * are not part of the census).
    */
  def countDataFiles(spark: org.apache.spark.sql.SparkSession,
      p: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val isSidecar = f.getPath.toString.contains("/_schema/")
      if (f.getPath.getName.endsWith(".parquet") && !isSidecar) n += 1
    }
    n
  }
}
