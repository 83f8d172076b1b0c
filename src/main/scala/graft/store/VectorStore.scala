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
final class VectorStore(spark: SparkSession, root: String)
    extends ChunkStore {

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

  /** Q1: cosine KNN. Embeds the query with the same provider used at
    * ingest time (one generator for both, as in `Program.cs:76-79`), scores
    * with codegen-friendly higher-order functions (no UDF), and reduces with
    * TakeOrderedAndProject — the only cross-node traffic is k rows.
    *
    * `mode` selects the scan strategy; the DEFAULT is `exact` (the
    * reference's semantics — sqlite-vec brute force scan,
    * `VectorStoreCommands.cs:113`). The ANN modes are opt-in and
    * APPROXIMATE (sub-linear scan, recall < 1):
    *
    *   - `lsh`: random-hyperplane bucket probe (radius-2 multiprobe,
    *     r15 — 1 + nBits + C(nBits,2) buckets) — only the probe
    *     buckets are scanned, candidates re-scored with exact cosine.
    *   - `ivfsq`: the composed IVF-SQ tier (q138's operator) — coarse
    *     k-means probe pruning + SQ8 residual codes rank the
    *     candidates in integer space; the returned rows carry exact
    *     cosine scores. The chunk embeddings are L2-normalized at
    *     ingest, so L2 ranking and cosine ranking agree.
    *
    * Every mode returns the SAME shape: chunk columns + `score`
    * (cosine, 6dp), ordered (score desc, key). Here the ANN index is
    * built at search time from the collection (the convenience path —
    * right for REPL-sized collections); a production store materializes
    * the code tables once at write time — exactly the stored-code
    * shape q128/q138 certify under the oracle.
    */
  def search(collection: String, queryText: String, k: Int = 1,
      provider: EmbeddingProvider = Embedding.default,
      mode: String = "exact"): DataFrame = mode match {
    case "exact" =>
      searchFiltered(collection, queryText, k, lit(true), provider)
    case "lsh" =>
      val qv = provider.embed(queryText)
      val chunks = read(collection)
      // Bucket count sized to the collection (~8 vectors/bucket): a
      // fixed high nBits over a small collection scatters neighbors
      // into unprobed buckets (recall collapses), a fixed low one over
      // a large collection stops pruning. At store scale nBits grows
      // as log2(n) — the scan stays ~constant per bucket.
      val n = chunks.count()
      val nBits = math.max(2, math.min(16,
        (math.log(math.max(n, 8L).toDouble / 8.0) / math.log(2.0))
          .round.toInt))
      val lsh = new graft.operators.Ann.RandomHyperplaneLsh(
        nBits = nBits, dim = qv.length)
      // Radius-2 multiprobe: the REPL path favors recall over scan
      // fraction (C(nBits,2) extra buckets of a REPL-sized collection);
      // the production scan-budget knob is the stored-code index tier
      // (q128/q138), not this convenience path.
      val probes = lsh.probeBuckets(qv, probes = 2)
      lsh.index(chunks, "embedding")
        .filter(col("bucket").isin(probes: _*))
        .drop("bucket")
        .withColumn("score",
          round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6))
        .orderBy(col("score").desc, col("key"))
        .limit(k)
    case "ivfsq" =>
      val qv = provider.embed(queryText)
      val chunks = read(collection)
      val m = graft.operators.IvfSq.fit(chunks, "key", "embedding",
        kCentroids = 8, dim = qv.length)
      val ids = graft.operators.IvfSq.search(chunks, "key", "embedding",
          m, qv, k = k, nprobe = 3, pool = math.max(200, 20 * k))
        .select(col("key"))
      chunks.join(broadcast(ids), Seq("key"))
        .withColumn("score",
          round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6))
        .orderBy(col("score").desc, col("key"))
        .limit(k)
    case other => throw new IllegalArgumentException(
      s"unknown search mode '$other' (exact|lsh|ivfsq)")
  }

  /** Store MAINTENANCE: compact a collection's small files. Every
    * dynamic-overwrite upsert writes ≥1 new file into each touched
    * `documentid` partition, and chunks of one document arriving in
    * different tasks fan a single partition out over many files — on a
    * long-lived corpus-scale store the accumulated small files, not the
    * bytes, become the scan bottleneck (open/footer cost per file,
    * manifest pressure). Compaction re-clusters each document's rows
    * into one task (`repartition(documentid)`), rewrites the collection
    * so every partition holds a single file, and swaps the directories
    * — the layout rewrite is invisible to readers' results and
    * preserves the replace-unit (`documentid`) the upsert contract
    * depends on. At 100 TB the same rewrite runs per partition-RANGE
    * (compact only directories whose file count exceeds a threshold)
    * and also folds `maxRecordsPerFile` for file-size targets; the
    * whole-collection form here is that operation at collection scope.
    * Returns (files_before, files_after) so callers can certify the
    * physical claim, not just assume it.
    */
  def compact(collection: String): (Long, Long) = {
    val p = path(collection)
    val before = countDataFiles(p)
    val tmp = p + "__compact_tmp"
    read(collection)
      .repartition(col("documentid"))
      .write.partitionBy("documentid").mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(p)),
      s"compact: rename $tmp -> $p failed")
    (before, countDataFiles(p))
  }

  /** Recursive .parquet data-file count (shared walker). */
  private def countDataFiles(p: String): Long =
    ChunkStore.countDataFiles(spark, p)

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
