package graft.store

import graft.functions.{Embedding, EmbeddingProvider}
import graft.model.EmbeddedChunk
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
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
  *
  * ANN serving: [[buildIndex]] persists a `_index` sidecar per mode
  * (LSH bucket table / IVF-SQ code table + fitted-model meta, each
  * stamped with the store's data fingerprint), and [[search]]'s ANN
  * modes serve from the sidecar whenever it is FRESH — the reference
  * analogue is sqlite-vec querying a PERSISTED index
  * (`VectorStoreCommands.cs:113`), not refitting per query. A stale
  * sidecar (any upsert/compact since the build) is ignored, falling
  * back to the fit-at-search convenience path; [[hasFreshIndex]] is
  * the staleness probe the q146/q151 refresh policies hook into.
  */
final class VectorStore(protected val spark: SparkSession,
    protected val root: String) extends ChunkStore {

  private def path(collection: String) = s"$root/$collection"

  private def indexDir(collection: String, part: String) =
    s"${path(collection)}/_index/$part"

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

  /** Persist the ANN index sidecar for `mode` (`lsh` or `ivfsq`) under
    * `<collection>/_index/` — the write-time half of the stored-code
    * index tier (q128/q138): fit once, serve many. Each sidecar
    * carries the store's [[ChunkStore.dataFingerprint]] at build time;
    * [[search]] trusts it only while the fingerprint still matches.
    * The code tables store only (key, code) — int8/int columns, the
    * ~1% footprint that makes a persisted index affordable at 100 TB —
    * and float vectors stay solely in the collection, joined back for
    * the exact re-score of the pruned survivors. An underscore-prefixed
    * sidecar dir is invisible to the collection's own parquet reads
    * and excluded from the file census, so building an index changes
    * neither query results nor compaction certificates.
    */
  def buildIndex(collection: String, mode: String): Unit = mode match {
    case "ivfsq" =>
      val fp = ChunkStore.dataFingerprint(spark, path(collection))
      val chunks = read(collection)
      val dim = chunks.select("embedding").head().getSeq[Float](0).length
      val m = graft.operators.IvfSq.fit(chunks, "key", "embedding",
        kCentroids = 8, dim = dim)
      graft.operators.IvfSq.index(chunks, "embedding", m)
        .select(col("key"), col("ivf_cid"), col("sq_code"))
        .write.mode("overwrite").parquet(indexDir(collection, "ivfsq"))
      spark.createDataset(Seq(VectorStore.IvfSqMeta(fp, dim,
          m.ivf.centroidsE6.map(_.toSeq).toSeq,
          m.sq.mnE6.toSeq, m.sq.mxE6.toSeq)))(
          Encoders.product[VectorStore.IvfSqMeta])
        .coalesce(1).write.mode("overwrite")
        .parquet(indexDir(collection, "ivfsq_meta"))
    case "lsh" =>
      val fp = ChunkStore.dataFingerprint(spark, path(collection))
      val chunks = read(collection)
      val dim = chunks.select("embedding").head().getSeq[Float](0).length
      val nBits = lshBitsFor(chunks.count())
      val lsh = new graft.operators.Ann.RandomHyperplaneLsh(
        nBits = nBits, dim = dim)
      lsh.index(chunks, "embedding").select(col("key"), col("bucket"))
        .write.mode("overwrite").parquet(indexDir(collection, "lsh"))
      spark.createDataset(Seq(VectorStore.LshMeta(fp, dim, nBits, 42L)))(
          Encoders.product[VectorStore.LshMeta])
        .coalesce(1).write.mode("overwrite")
        .parquet(indexDir(collection, "lsh_meta"))
    case other => throw new IllegalArgumentException(
      s"unknown index mode '$other' (lsh|ivfsq)")
  }

  /** True iff `mode`'s sidecar exists AND was built over exactly the
    * current data files (fingerprint match) — one driver-side listing
    * plus a 1-row meta read; no scan of the collection. Any upsert or
    * compact since the build flips this false, which is the signal the
    * q151 refresh policy acts on (rebuild) and [[search]] acts on
    * conservatively (serve exact-fit-at-search instead of a stale
    * index — never silently missing the newest documents).
    */
  def hasFreshIndex(collection: String, mode: String): Boolean = {
    val metaDir = indexDir(collection, s"${mode}_meta")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(metaDir), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) return false
    val stamped = spark.read.parquet(metaDir)
      .select("fingerprint").head().getString(0)
    stamped == ChunkStore.dataFingerprint(spark, path(collection))
  }

  /** LSH serving: the persisted bucket table when fresh (scan = probe
    * buckets of a (key, bucket) table + a keyed join back for exact
    * re-score), else the trait's fit-at-search path. Identical output
    * either way: the sidecar stores the SAME deterministic
    * hyperplane-family assignment (nBits from the same size rule,
    * fixed seed) the search-time fit would recompute.
    */
  override protected def searchLsh(collection: String, qv: Array[Float],
      k: Int): DataFrame = {
    if (!hasFreshIndex(collection, "lsh"))
      return super.searchLsh(collection, qv, k)
    val meta = spark.read.parquet(indexDir(collection, "lsh_meta")).head()
    val nBits = meta.getAs[Int]("nbits")
    val dim = meta.getAs[Int]("dim")
    require(dim == qv.length,
      s"lsh index dim $dim != query dim ${qv.length}")
    val lsh = new graft.operators.Ann.RandomHyperplaneLsh(
      nBits = nBits, dim = dim, seed = meta.getAs[Long]("seed"))
    val probes = lsh.probeBuckets(qv, probes = 2)
    val cand = spark.read.parquet(indexDir(collection, "lsh"))
      .filter(col("bucket").isin(probes: _*))
      .select(col("key"))
    read(collection).join(cand, Seq("key"))
      .withColumn("score",
        round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6))
      .orderBy(col("score").desc, col("key"))
      .limit(k)
  }

  /** IVF-SQ serving: the persisted code table + fitted model when
    * fresh ([[graft.operators.IvfSq.searchCodes]] — probe-pruned
    * integer ranking over (key, cid, code) rows, exact re-score joined
    * from the collection), else the trait's fit-at-search path. The
    * fit is deterministic over the same rows, so sidecar and
    * fit-at-search return the identical id set.
    */
  override protected def searchIvfsq(collection: String, qv: Array[Float],
      k: Int): DataFrame = {
    if (!hasFreshIndex(collection, "ivfsq"))
      return super.searchIvfsq(collection, qv, k)
    val meta = spark.read.parquet(indexDir(collection, "ivfsq_meta")).head()
    val dim = meta.getAs[Int]("dim")
    require(dim == qv.length,
      s"ivfsq index dim $dim != query dim ${qv.length}")
    val cents = meta.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](
      "cents").map(_.toArray).toArray
    val m = new graft.operators.IvfSq.Model(
      new graft.operators.Ann.Ivf(cents),
      new graft.operators.Sq.Model(
        meta.getAs[scala.collection.Seq[Long]]("mn").toArray,
        meta.getAs[scala.collection.Seq[Long]]("mx").toArray))
    val chunks = read(collection)
    val ids = graft.operators.IvfSq.searchCodes(
        spark.read.parquet(indexDir(collection, "ivfsq")), chunks,
        "key", "embedding", "ivf_cid", "sq_code", m, qv,
        k = k, nprobe = 3, pool = math.max(200, 20 * k))
      .select(col("key"))
    chunks.join(broadcast(ids), Seq("key"))
      .withColumn("score",
        round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6))
      .orderBy(col("score").desc, col("key"))
      .limit(k)
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
    * via the crash-safe rename-aside commit ([[ChunkStore.commitSwap]])
    * — the layout rewrite is invisible to readers' results and
    * preserves the replace-unit (`documentid`) the upsert contract
    * depends on. Any `_index` sidecar does not survive the swap — it
    * would be fingerprint-stale against the rewritten files anyway;
    * rebuilding after compaction is the q151 refresh policy's job.
    * At 100 TB the same rewrite runs per partition-RANGE
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
    ChunkStore.commitSwap(spark, p, tmp)
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

object VectorStore {
  /** `_index/ivfsq_meta` row: build fingerprint + the fitted model
    * (IVF centroids at e6, SQ residual bounds) — everything a search
    * needs to serve without refitting.
    */
  private[store] case class IvfSqMeta(fingerprint: String, dim: Int,
      cents: Seq[Seq[Long]], mn: Seq[Long], mx: Seq[Long])

  /** `_index/lsh_meta` row: build fingerprint + the deterministic
    * hyperplane-family parameters (the planes regenerate from
    * (nbits, dim, seed); only the bucket TABLE needs storing).
    */
  private[store] case class LshMeta(fingerprint: String, dim: Int,
      nbits: Int, seed: Long)
}
