package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental near-duplicate filtering for a document STREAM — the
  * "dedup the new crawl increment against the corpus" production step.
  *
  * Per microbatch (foreachBatch):
  *   1. MinHash-sign the batch and band it into LSH buckets
  *      (Dedup.minhashSignatures / lshBuckets — same math as q27).
  *   2. Drop a new doc iff its signature similarity (fraction of equal
  *      minhash components) reaches `threshold` against EITHER a stored
  *      doc sharing a bucket OR a smaller-id batch sibling sharing a
  *      bucket (the pair rule; component-based keep-best is the batch
  *      alternative, q55).
  *   3. Survivors append to the parquet store (sigs + buckets) and emit.
  *
  * State lives ON DISK, partitioned and join-pruned by (band, band_hash)
  * — never in executor memory, so corpus growth bounds nothing but
  * storage. Cross-batch candidate generation is a bucket equi-join
  * against only the store partitions the batch's band hashes touch.
  * Docs shorter than the shingle width have no signature: they always
  * survive and are not tracked (documented bypass).
  *
  * Restart semantics: foreachBatch is at-least-once; a replayed batch
  * re-filters against a store that may already contain its survivors —
  * every replayed doc then matches itself at similarity 1.0 and is
  * dropped, so the OUTPUT stays duplicate-free (the store append is
  * idempotent-by-effect, not byte-idempotent).
  */
object StreamNearDup {

  final case class Cfg(k: Int = 16, bands: Int = 4, rowsPerBand: Int = 4,
      nShingle: Int = 3, threshold: Double = 0.5, saltBlocks: Int = 1)

  private def simExpr(k: Int) =
    (aggregate(zip_with(col("__siga"), col("__sigb"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / k)

  /** One filtering step (also the whole computation for a single batch
    * with an empty store). Returns (survivor rows, survivor signatures,
    * survivor buckets).
    */
  def filterBatch(batch: DataFrame, idCol: String, textCol: String,
      store: Option[(DataFrame, DataFrame)], cfg: Cfg = Cfg())
      : (DataFrame, DataFrame, DataFrame) = {
    // Eager checkpoint: the signature table is k longs per doc, and every
    // downstream consumer (pair join, store probe, and the THREE output
    // writes in run()) would otherwise re-run the whole shingle→minhash
    // pipeline once per action.
    val sigs = Dedup.minhashSignatures(
      Dedup.shingles(batch, idCol, textCol, cfg.nShingle), cfg.k)
      .localCheckpoint(true)
    val buckets = Dedup.lshBuckets(sigs, cfg.bands, cfg.rowsPerBand)
    val sigA = sigs.select(col("id").as("a"), col("sig").as("__siga"))
    val sigB = sigs.select(col("id").as("b"), col("sig").as("__sigb"))
    val dropWithin = Dedup.lshCandidatePairs(buckets, cfg.saltBlocks)
      .join(sigA, "a").join(sigB, "b")
      .filter(simExpr(cfg.k) >= cfg.threshold)
      .select(col("b").as(idCol))
    val dropCross = store match {
      case Some((storeSigs, storeBuckets)) =>
        buckets.select(col("id").as("b"), col("band"), col("band_hash"))
          .join(storeBuckets.select(col("id").as("a"), col("band"),
            col("band_hash")), Seq("band", "band_hash"))
          .select(col("a"), col("b")).distinct()
          .join(storeSigs.select(col("id").as("a"), col("sig").as("__siga")), "a")
          .join(sigB, "b")
          .filter(simExpr(cfg.k) >= cfg.threshold)
          .select(col("b").as(idCol))
      case None => batch.select(col(idCol)).limit(0)
    }
    // The drop set is tiny; checkpointing it stops the candidate joins
    // from re-running under each of the three output writes.
    val drops = dropWithin.union(dropCross).distinct().localCheckpoint(true)
    val survivors = batch.join(drops, Seq(idCol), "left_anti")
    val sSigs = sigs.join(survivors.select(col(idCol).as("id")), Seq("id"),
      "left_semi")
    val sBuckets = buckets.join(survivors.select(col(idCol).as("id")),
      Seq("id"), "left_semi")
    (survivors, sSigs, sBuckets)
  }

  /** Run the incremental filter over a streaming DataFrame: survivors
    * append to `outDir`, their signatures/buckets to `storeDir`.
    */
  def run(stream: DataFrame, idCol: String, textCol: String,
      storeDir: String, outDir: String, checkpointDir: String,
      cfg: Cfg = Cfg(), trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val store = loadStore(s, storeDir)
        val (survivors, sSigs, sBuckets) =
          filterBatch(batch, idCol, textCol, store, cfg)
        // Survivors must be decided before the store grows: materialize
        // the three outputs from one filtered lineage, store last.
        survivors.write.mode("append").parquet(outDir)
        sSigs.write.mode("append").parquet(s"$storeDir/sigs")
        sBuckets.write.mode("append").parquet(s"$storeDir/buckets")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  def loadStore(s: SparkSession, storeDir: String)
      : Option[(DataFrame, DataFrame)] = {
    val sigsPath = new java.io.File(s"$storeDir/sigs")
    if (sigsPath.exists())
      Some((s.read.parquet(s"$storeDir/sigs"),
        s.read.parquet(s"$storeDir/buckets")))
    else None
  }
}
