package graft.store

import graft.functions.{Embedding, EmbeddingProvider}
import graft.model.EmbeddedChunk
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed vector store (SURVEY.md §1.2, §2.6, §2.7).
  *
  * A store root directory holds one collection per subdirectory; each
  * collection is a parquet dataset partitioned by `documentid`. The record
  * schema mirrors the reference's collection definition
  * (`VectorStoreCommands.cs:91-104`): key, embedding float[384] @ cosine,
  * content, context, documentid.
  *
  * Upsert semantics: the reference's writer runs with
  * `IncrementalIngestion = false` (`VectorStoreCommands.cs:159`) — a
  * re-processed document's prior records are replaced wholesale. Dynamic
  * partition overwrite on `documentid` gives exactly that: only the
  * partitions present in the incoming batch are rewritten, every other
  * document's chunks are untouched. Combined with deterministic chunk keys
  * re-ingestion is idempotent. At 100 TB this is the scalable upsert: no
  * read-modify-write of the whole store, just the touched partitions.
  */
final class VectorStore(spark: SparkSession, root: String) {

  private def path(collection: String) = s"$root/$collection"

  /** W1: create-or-replace the incoming documents' chunks. */
  def upsert(chunks: Dataset[EmbeddedChunk], collection: String): Unit =
    chunks.write
      .partitionBy("documentid")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path(collection))

  /** Q3: schema-on-read — no fixed case class required on the way out. */
  def read(collection: String): DataFrame =
    spark.read.parquet(path(collection))

  /** Schema-supplied read: skips the footer-sampling schema-inference
    * job — the right call when the caller already knows the chunk
    * schema (every re-read in a pipeline does).
    */
  def read(collection: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(path(collection))

  /** Q2: list collection names (subdirectories with parquet data). */
  def listCollections(): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Q1: exact cosine KNN. Embeds the query with the same provider used at
    * ingest time (one generator for both, as in `Program.cs:76-79`), scores
    * with codegen-friendly higher-order functions (no UDF), and reduces with
    * TakeOrderedAndProject — the only cross-node traffic is k rows.
    */
  def search(collection: String, queryText: String, k: Int = 1,
      provider: EmbeddingProvider = Embedding.default): DataFrame =
    searchFiltered(collection, queryText, k, lit(true), provider)

  /** Q1 + metadata pre-filter: restrict the scan BEFORE scoring. Because
    * collections are parquet partitioned by `documentid`, a filter on
    * `documentid` becomes partition PRUNING — the KNN only reads the
    * matching documents' files, never the whole collection. (The
    * reference's sqlite-vec search has no filter surface; this is the
    * store feature every production vector search needs.)
    */
  def searchFiltered(collection: String, queryText: String, k: Int,
      filter: org.apache.spark.sql.Column,
      provider: EmbeddingProvider = Embedding.default): DataFrame = {
    val qv = provider.embed(queryText)
    read(collection)
      .filter(filter)
      .withColumn("score",
        round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6))
      .orderBy(col("score").desc, col("key"))
      .limit(k)
  }
}
