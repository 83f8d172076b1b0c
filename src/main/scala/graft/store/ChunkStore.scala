package graft.store

import graft.functions.{Embedding, EmbeddingProvider}
import graft.model.EmbeddedChunk
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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
  *
  * The QUERY surface (Q1 search, Q2 list) lives here too, implemented
  * once over `read`: search semantics must not depend on the layout,
  * so the CLI's `--layout` flag can swap stores without changing what
  * a query returns. [[VectorStore]] overrides the ANN scan hooks to
  * serve from a persisted `_index` sidecar when one is fresh.
  */
trait ChunkStore {
  protected def spark: SparkSession
  protected def root: String

  def upsert(chunks: Dataset[EmbeddedChunk], collection: String): Unit
  def read(collection: String): DataFrame

  /** Store maintenance: rewrite a collection to its canonical file
    * layout. Returns (files_before, files_after).
    */
  def compact(collection: String): (Long, Long)

  /** Q2: list collection names (subdirectories of the store root) —
    * layout-independent, both stores keep one directory per collection.
    */
  def listCollections(): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSeq.sorted
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
    *   - `lsh`: random-hyperplane bucket probe (radius-2 multiprobe —
    *     1 + nBits + C(nBits,2) buckets) — only the probe buckets are
    *     scanned, candidates re-scored with exact cosine.
    *   - `ivfsq`: the composed IVF-SQ tier (q138's operator) — coarse
    *     k-means probe pruning + SQ8 residual codes rank the
    *     candidates in integer space; the returned rows carry exact
    *     cosine scores. The chunk embeddings are L2-normalized at
    *     ingest, so L2 ranking and cosine ranking agree.
    *
    * Every mode returns the SAME shape: chunk columns + `score`
    * (cosine, 6dp), ordered (score desc, key). The trait's ANN hooks
    * build the index at search time from the collection (the
    * convenience path — right for REPL-sized collections);
    * [[VectorStore.buildIndex]] persists the code tables once so the
    * serving path reads a `_index` sidecar instead — exactly the
    * stored-code shape q128/q138 certify under the oracle.
    */
  def search(collection: String, queryText: String, k: Int = 1,
      provider: EmbeddingProvider = Embedding.default,
      mode: String = "exact"): DataFrame = mode match {
    case "exact" =>
      val qv = provider.embed(queryText)
      read(collection)
        .withColumn("score",
          round(graft.operators.Ann.cosineCol(col("embedding"), qv), 6))
        .orderBy(col("score").desc, col("key"))
        .limit(k)
    case "lsh" => searchLsh(collection, provider.embed(queryText), k)
    case "ivfsq" => searchIvfsq(collection, provider.embed(queryText), k)
    case other => throw new IllegalArgumentException(
      s"unknown search mode '$other' (exact|lsh|ivfsq)")
  }

  /** LSH bucket count sized to the collection (~8 vectors/bucket): a
    * fixed high nBits over a small collection scatters neighbors into
    * unprobed buckets (recall collapses), a fixed low one over a large
    * collection stops pruning. At store scale nBits grows as log2(n) —
    * the scan stays ~constant per bucket. Shared by the fit-at-search
    * path and [[VectorStore.buildIndex]] so a sidecar built over the
    * same rows probes the same buckets.
    */
  protected final def lshBitsFor(n: Long): Int =
    math.max(2, math.min(16,
      (math.log(math.max(n, 8L).toDouble / 8.0) / math.log(2.0))
        .round.toInt))

  /** ANN scan hook: fit-at-search LSH (the REPL convenience path). */
  protected def searchLsh(collection: String, qv: Array[Float],
      k: Int): DataFrame = {
    val chunks = read(collection)
    val nBits = lshBitsFor(chunks.count())
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
  }

  /** ANN scan hook: fit-at-search IVF-SQ (the REPL convenience path). */
  protected def searchIvfsq(collection: String, qv: Array[Float],
      k: Int): DataFrame = {
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
  }
}

object ChunkStore {
  /** Recursive .parquet data-file census under a store path — ONE
    * walker for every layout's compaction certificate (underscore
    * sidecar dirs — `_schema`, `_index` — are invisible to reads and
    * bounded in size, so they are not part of the census).
    */
  def countDataFiles(spark: org.apache.spark.sql.SparkSession,
      p: String): Long = {
    var n = 0L
    walkDataFiles(spark, p)(_ => n += 1)
    n
  }

  /** Content-version fingerprint of a store path: an MD5 over the
    * sorted (relative-path, length, mtime) of its data files. Any
    * upsert/compact changes at least one component, so an `_index`
    * sidecar stamped with the fingerprint at build time can be
    * freshness-checked with ONE driver-side listing (O(files), no
    * job) — the cheap staleness test [[VectorStore.hasFreshIndex]]
    * runs before trusting a persisted index. Sidecar dirs are
    * excluded (building an index must not invalidate it).
    */
  def dataFingerprint(spark: org.apache.spark.sql.SparkSession,
      p: String): String = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val prefix = p.stripSuffix("/") + "/"
    walkDataFiles(spark, p) { f =>
      val rel = f.getPath.toString.split(prefix.replace("//", "/"), 2)
        .lastOption.getOrElse(f.getPath.getName)
      entries += s"$rel:${f.getLen}:${f.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def walkDataFiles(spark: org.apache.spark.sql.SparkSession,
      p: String)(f: org.apache.hadoop.fs.LocatedFileStatus => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
    while (it.hasNext) {
      val st = it.next()
      val isSidecar = st.getPath.toString.contains("/_schema/") ||
        st.getPath.toString.contains("/_index/")
      if (st.getPath.getName.endsWith(".parquet") && !isSidecar) f(st)
    }
  }

  /** CRASH-SAFE staged-rewrite commit: publish `tmp` at `dir` via
    * rename-aside — `dir → dir__compact_old`, `tmp → dir`, delete
    * `__old` — never delete-then-rename. The difference matters
    * exactly when the driver dies mid-commit: with delete-first a
    * crash between the two calls leaves the collection PATH ABSENT
    * (readers get PATH_NOT_FOUND; data recoverable from tmp only by
    * hand), while here every intermediate state keeps a complete copy
    * on disk — before step 2 the old data is intact at `__old` (and a
    * failed step 2 rolls it back into place), after step 2 the new
    * data is live and `__old` is garbage a later commit clears. On an
    * object store the renames are per-path metadata ops; both are
    * O(1) directory moves on HDFS-like filesystems.
    */
  def commitSwap(spark: org.apache.spark.sql.SparkSession, dir: String,
      tmp: String,
      rename: (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path,
        org.apache.hadoop.fs.Path) => Boolean = _.rename(_, _)): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val dirP = new org.apache.hadoop.fs.Path(dir)
    val tmpP = new org.apache.hadoop.fs.Path(tmp)
    val oldP = new org.apache.hadoop.fs.Path(dir + "__compact_old")
    // Leftover from a crash AFTER step 2 of a prior commit: the live
    // dir is already the compacted data; the aside copy is garbage.
    if (fs.exists(oldP)) fs.delete(oldP, true)
    require(rename(fs, dirP, oldP),
      s"compact: rename-aside $dir -> $oldP failed")
    val published =
      try rename(fs, tmpP, dirP)
      catch {
        case e: Throwable => fs.rename(oldP, dirP); throw e
      }
    if (!published) {
      // Roll the old data back into place: the collection stays
      // readable; the staged tmp remains for inspection/retry.
      fs.rename(oldP, dirP)
      throw new IllegalStateException(
        s"compact: publish $tmp -> $dir failed; previous data restored")
    }
    fs.delete(oldP, true)
  }
}
