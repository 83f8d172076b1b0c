package graft.operators

import graft.functions.{Embedding, EmbeddingProvider}
import graft.model.{ElementRow, EmbeddedChunk, IngestionResult}
import graft.store.ChunkStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pipeline driver (SURVEY.md §2.5, D1): composes
  * `source → chunk → embed → write` as one lazy lineage and returns a
  * per-document results dataset — the Spark analogue of the reference's
  * `IngestionPipeline.ProcessAsync` stream of `IngestionResult`s
  * (`VectorStoreCommands.cs:58-64,74-80,163-180`).
  *
  * Fault isolation matches the reference: a document whose parse produced
  * `error` element rows is reported as failed and contributes no chunks;
  * every other document proceeds independently (per-item try/catch ≙
  * error rows as data, `VectorStoreCommands.cs:32-47`).
  */
object IngestionPipeline {

  def run(elements: Dataset[ElementRow], store: ChunkStore,
      collection: String,
      chunker: SemanticChunker = SemanticChunker.default,
      provider: EmbeddingProvider = Embedding.default)
      : Dataset[IngestionResult] = {
    val spark = elements.sparkSession
    import spark.implicits._

    // Eager materialization in its own job: `elems` feeds BOTH the
    // failed-docs aggregate and the anti-join below — a lazy persist would
    // have the two branches race to compute the same partitions inside the
    // first action ("Block already exists" churn). Checkpoint blocks are
    // freed by the ContextCleaner when `elems` goes out of scope.
    val elems = elements.localCheckpoint(true)
    val failedDocs = elems.filter(col("element_type") === "error")
      .groupBy(col("doc_id"))
      .agg(first(col("text"), ignoreNulls = true).as("error"))

    val good = elems.join(failedDocs.select(col("doc_id")), Seq("doc_id"),
      "left_anti").as[ElementRow]
    val embedded = Embed.chunks(chunker.chunks(good), provider)
      .persist(StorageLevel.MEMORY_AND_DISK)

    store.upsert(embedded, collection)

    val counts = embedded.groupBy(col("documentid").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    // Materialize the per-document results (small: one row per document,
    // stays distributed — no driver collect; at 100 TB "documents" can be
    // millions of rows) so the heavyweight element/chunk caches can be
    // released HERE rather than living for the rest of the session. The
    // local checkpoint cuts the result's lineage off the unpersisted
    // inputs; its own blocks are freed by the ContextCleaner on GC.
    val results = elems.select(col("doc_id")).distinct()
      .join(failedDocs, Seq("doc_id"), "left")
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id").as("documentid"),
        col("error").isNull.as("succeeded"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        col("error"))
      .as[IngestionResult]
      .localCheckpoint(true)
    embedded.unpersist()
    results
  }

  /** Multi-source ingestion as ONE lineage: all sources are unioned and
    * parsed/chunked/embedded in a single pass (one eager checkpoint, one
    * embed computation, one results job) instead of paying the per-run job
    * floor once per source; only the store writes remain per-collection
    * (they land in different directories by design). At scale this is the
    * shape you want anyway — heterogeneous readers feeding one cluster
    * pipeline, partitioned by doc_id, not N serialized pipelines.
    *
    * `sources` maps a tag (reported in the result's `reader` column) to
    * that source's element rows; `collectionOf` names the store collection
    * per tag. Document ids must be disjoint across sources (the reference's
    * identifiers — file names vs "Article #N" — are); collisions throw
    * rather than silently cross-wiring chunks to the wrong collection.
    */
  def runTagged(sources: Seq[(String, Dataset[ElementRow])],
      store: ChunkStore, collectionOf: String => String,
      chunker: SemanticChunker = SemanticChunker.default,
      provider: EmbeddingProvider = Embedding.default): DataFrame = {
    require(sources.nonEmpty, "runTagged: no sources")
    val spark = sources.head._2.sparkSession
    import spark.implicits._

    val elems = sources.map { case (tag, ds) =>
      ds.toDF().withColumn("__tag", lit(tag))
    }.reduce(_.unionAll(_)).localCheckpoint(true)

    // Docs-sized relations with many consumers are materialized ONCE:
    // tagOf feeds the collision check, the per-chunk tag join and the
    // results join, failedDocs feeds the anti-join and the results join
    // — un-materialized, every consumer re-runs the distinct/groupBy
    // shuffle from elems, and under AQE each re-run is its own fan of
    // stage jobs (the r9 plan paid ~10 extra scheduling floors here).
    val tagAgg = elems.groupBy(col("doc_id"))
      .agg(countDistinct(col("__tag")).as("__nt"),
        first(col("__tag")).as("__tag"))
      .localCheckpoint(true)
    val collisions = tagAgg.filter(col("__nt") > 1).count()
    require(collisions == 0,
      s"runTagged: $collisions doc_id(s) appear under multiple sources")
    // Safe after the check: every doc has exactly one tag.
    val tagOf = tagAgg.select(col("__tag"), col("doc_id"))

    val failedDocs = elems.filter(col("element_type") === "error")
      .groupBy(col("doc_id"))
      .agg(first(col("text"), ignoreNulls = true).as("error"))
      .localCheckpoint(true)
    val good = elems.drop("__tag")
      .join(failedDocs.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .as[ElementRow]
    // ONE broadcast join tags every chunk with its source, materialized
    // eagerly — the per-collection writes below are then plain filters
    // over the checkpointed blocks (the r9 shape ran one broadcast
    // semi-join per collection against the cached-but-lazy embed).
    val embTagged = Embed.chunks(chunker.chunks(good), provider)
      .join(broadcast(tagOf), col("documentid") === col("doc_id"))
      .drop("doc_id")
      .localCheckpoint(true)

    sources.foreach { case (tag, _) =>
      store.upsert(
        embTagged.filter(col("__tag") === tag).drop("__tag")
          .as[EmbeddedChunk],
        collectionOf(tag))
    }

    val counts = embTagged.groupBy(col("documentid").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    val results = tagOf
      .join(failedDocs, Seq("doc_id"), "left")
      .join(counts, Seq("doc_id"), "left")
      .select(col("__tag").as("reader"), col("doc_id").as("documentid"),
        col("error").isNull.as("succeeded"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"), col("error"))
      .localCheckpoint(true)
    results
  }
}
