package graft

import graft.operators.IngestionPipeline
import graft.sources.{DatabaseSource, MarkdownSource, PdfSource, SqliteReader}
import graft.store.{BucketedVectorStore, ChunkStore, SnapshotStore, VectorStore}
import org.apache.spark.sql.SparkSession

import scala.io.StdIn

/** CLI surface (SURVEY.md §2.8, A1–A3): `ingest | search | list`, mirroring
  * the reference's three subcommands (`Program.cs:22-53`) with the same
  * defaults (collection `documents`, reader-specific sources).
  *
  * `--layout document|bucketed|snapshot` selects the store layout
  * behind the [[graft.store.ChunkStore]] seam: `document` is the
  * reference's replace-unit layout (one parquet partition per
  * documentid — right for REPL-scale collections), `bucketed` is the
  * 100 TB rename-commit layout (nBuckets hash partitions — file census
  * independent of document count, O(buckets) commits; q202/q205's
  * certified shape), `snapshot` is the manifest-committed layout for
  * object stores (immutable data files, atomic versioned-manifest
  * commits, time travel + vacuum; q244/q245/q246's certified shape —
  * its `versions` and `vacuum` subcommands below exist only there).
  * The layout is invisible to results: ingest/search/list return the
  * same answers through any of them (MainLayoutSpec drives all three
  * end-to-end).
  */
object Main {

  private def opt(args: Array[String], name: String, dflt: String): String = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) args(i + 1) else dflt
  }

  def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    .appName("graft")
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val spark = session()
    spark.sparkContext.setLogLevel("WARN")
    val code = run(args, spark)
    spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** The command dispatcher, separated from session lifecycle so specs
    * can drive the full CLI path (store construction included) on the
    * shared test session. Returns the process exit code.
    */
  def run(args: Array[String], spark: SparkSession): Int = {
    val storeRoot = opt(args, "store", "/tmp/graft-store")
    val collection = opt(args, "collection", "documents")
    val layout = opt(args, "layout", "document")
    // --embedder selects the EmbeddingProvider for BOTH ingest and
    // search — one generator for both, as in the reference
    // (`Program.cs:64-79`); pass the SAME flag to both commands or
    // queries embed into a different space than the stored chunks.
    // A real ONNX MiniLM provider registers as one more case here when
    // an ONNX runtime jar is available offline; any new case must pass
    // EmbeddingContractSpec's 7-clause battery first.
    val embedderName = opt(args, "embedder", "hashing")
    val provider: graft.functions.EmbeddingProvider = embedderName match {
      case "hashing" => graft.functions.Embedding.default
      case "randproj" => new graft.functions.RandomProjectionEmbedder(
        dim = opt(args, "embedder-dim", "256").toInt,
        seed = opt(args, "embedder-seed", "2025").toLong)
      case other =>
        System.err.println(s"unknown --embedder '$other' " +
          "(hashing|randproj required)")
        return 2
    }
    val store: ChunkStore = layout match {
      case "document" => new VectorStore(spark, storeRoot)
      case "bucketed" => new BucketedVectorStore(spark, storeRoot,
        nBuckets = opt(args, "buckets", "16").toInt)
      case "snapshot" => new SnapshotStore(spark, storeRoot,
        nBuckets = opt(args, "buckets", "16").toInt)
      case other =>
        System.err.println(s"unknown --layout '$other' " +
          "(document|bucketed|snapshot required)")
        return 2
    }

    args(0) match {
      case "ingest" =>
        val reader = opt(args, "reader", "")
        val source = opt(args, "source", "")
        val elements = reader match {
          case "markdown" => MarkdownSource.elements(spark, source)
          case "pdf" => PdfSource.elements(spark, source)
          case "database" =>
            val rows = SqliteReader.readTable(source, "Items")
              .map(r => (r.long(0), r.string(1), r.string(2)))
            DatabaseSource.elements(
              spark.createDataFrame(rows).toDF("id", "title", "body"))
          case other =>
            System.err.println(s"unknown --reader '$other' " +
              "(markdown|pdf|database required)") // validated, Program.cs:24-25
            return 2
        }
        val results = IngestionPipeline.run(elements, store, collection,
          chunker = new graft.operators.SemanticChunker(embedder = provider),
          provider = provider)
        results.collect().foreach { r =>
          val status = if (r.succeeded) "SUCCESS" else "FAILURE"
          println(s"[$status] ${r.documentid} chunks=${r.n_chunks}" +
            r.error.map(e => s" error=$e").getOrElse(""))
        }
        0
      case "search" =>
        // REPL: blank line exits (VectorStoreCommands.cs:110,128-138).
        // --mode exact|lsh|ivfsq selects the scan strategy (default
        // exact = reference semantics; ANN modes are approximate).
        val mode = opt(args, "mode", "exact")
        if (!Set("exact", "lsh", "ivfsq")(mode)) {
          System.err.println(
            s"unknown --mode '$mode' (exact|lsh|ivfsq required)")
          return 2
        }
        val k = opt(args, "k", "1").toInt
        // Fail with the available names instead of a Spark
        // PATH_NOT_FOUND stack trace when the collection is mistyped.
        val existing = store.listCollections()
        if (!existing.contains(collection)) {
          System.err.println(s"collection '$collection' not found in " +
            s"this store; available: ${existing.mkString(", ")}")
          return 2
        }
        var line = ""
        while ({ print("query> "); line = Option(StdIn.readLine()).getOrElse("");
            line.trim.nonEmpty }) {
          val hits = store.search(collection, line.trim, k = k,
            provider = provider, mode = mode).collect()
          hits.foreach { row =>
            println(s"score=${row.getAs[Any]("score")}")
            row.schema.fieldNames.filterNot(_ == "score")
              .foreach(f => println(s"  $f: ${row.getAs[Any](f)}"))
          }
        }
        0
      case "list" =>
        store.listCollections().foreach(println)
        0
      case "delete" =>
        // Whole-document takedown (ChunkStore.delete): the opt-out /
        // right-to-be-forgotten primitive. Ids are documentids — the
        // store's replace unit — so the cost is the layout's replace
        // cost (partition dirs dropped / touched buckets rewritten).
        val ids = opt(args, "ids", "").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        if (ids.isEmpty) {
          System.err.println("delete requires --ids id1,id2,...")
          return 2
        }
        val existing = store.listCollections()
        if (!existing.contains(collection)) {
          System.err.println(s"collection '$collection' not found in " +
            s"this store; available: ${existing.mkString(", ")}")
          return 2
        }
        store.delete(collection, ids)
        println(s"deleted ${ids.length} document(s) from $collection")
        0
      case "index" =>
        // Persisted-ANN maintenance (ChunkStore.buildIndex /
        // refreshIndex / hasFreshIndex): `build` fits + persists the
        // `_index` sidecar, `refresh` re-encodes only the named
        // documents under the FROZEN model, `status` reports
        // freshness. Works on either layout — the sidecar lives on
        // the trait.
        val action = if (args.length > 1) args(1) else ""
        val mode = opt(args, "mode", "ivfsq")
        if (!Set("lsh", "ivfsq")(mode)) {
          System.err.println(s"unknown --mode '$mode' (lsh|ivfsq required)")
          return 2
        }
        val existing = store.listCollections()
        if (!existing.contains(collection)) {
          System.err.println(s"collection '$collection' not found in " +
            s"this store; available: ${existing.mkString(", ")}")
          return 2
        }
        action match {
          case "build" =>
            store.buildIndex(collection, mode)
            println(s"built $mode index for $collection " +
              s"(fresh=${store.hasFreshIndex(collection, mode)})")
            0
          case "refresh" =>
            val ids = opt(args, "ids", "").split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq
            if (ids.isEmpty) {
              System.err.println(
                "index refresh requires --ids id1,id2,...")
              return 2
            }
            store.refreshIndex(collection, mode, ids)
            println(s"refreshed $mode index for $collection " +
              s"(${ids.length} document(s), " +
              s"fresh=${store.hasFreshIndex(collection, mode)})")
            0
          case "status" =>
            Seq("lsh", "ivfsq").foreach { m =>
              println(s"$m: " + (if (store.hasFreshIndex(collection, m))
                "fresh" else "stale-or-absent"))
            }
            0
          case other =>
            System.err.println(s"unknown index action '$other' " +
              "(build|refresh|status required)")
            2
        }
      case "migrate" =>
        // Move a collection between layouts through the ChunkStore
        // seam (one scan, one replace-by-document upsert = one commit
        // on the target). Re-runnable: deterministic keys make the
        // upsert idempotent.
        val toRoot = opt(args, "to-store", "")
        val toLayout = opt(args, "to-layout", "")
        if (toRoot.isEmpty || toLayout.isEmpty) {
          System.err.println(
            "migrate requires --to-store <dir> --to-layout " +
              "document|bucketed|snapshot")
          return 2
        }
        val target: ChunkStore = toLayout match {
          case "document" => new VectorStore(spark, toRoot)
          case "bucketed" => new BucketedVectorStore(spark, toRoot,
            nBuckets = opt(args, "to-buckets", "16").toInt)
          case "snapshot" => new SnapshotStore(spark, toRoot,
            nBuckets = opt(args, "to-buckets", "16").toInt)
          case other =>
            System.err.println(s"unknown --to-layout '$other' " +
              "(document|bucketed|snapshot required)")
            return 2
        }
        val existing = store.listCollections()
        if (!existing.contains(collection)) {
          System.err.println(s"collection '$collection' not found in " +
            s"this store; available: ${existing.mkString(", ")}")
          return 2
        }
        val n = ChunkStore.migrate(store, target, collection)
        println(s"migrated $collection: $n chunk(s) now in $toLayout " +
          s"layout at $toRoot")
        0
      case "compact" =>
        // Store maintenance on any layout: rewrite the collection to
        // its canonical file layout (per-document: one file per doc;
        // bucketed: one per bucket; snapshot: copy-on-write to
        // nBuckets base files — old versions stay readable until
        // vacuum).
        val existing = store.listCollections()
        if (!existing.contains(collection)) {
          System.err.println(s"collection '$collection' not found in " +
            s"this store; available: ${existing.mkString(", ")}")
          return 2
        }
        val (before, after) = store.compact(collection)
        println(s"compacted $collection: $before -> $after data file(s)")
        0
      case "versions" =>
        // Snapshot history (snapshot layout only): one line per
        // committed version — the time-travel/provenance surface.
        store match {
          case snap: SnapshotStore =>
            val existing = store.listCollections()
            if (!existing.contains(collection)) {
              System.err.println(s"collection '$collection' not found " +
                s"in this store; available: ${existing.mkString(", ")}")
              return 2
            }
            snap.versions(collection).foreach { v =>
              println(s"v$v: ${snap.liveDataFiles(collection, v).size} " +
                "live data file(s)")
            }
            0
          case _ =>
            System.err.println(
              "versions requires --layout snapshot (the rename-commit " +
                "layouts keep no history)")
            2
        }
      case "vacuum" =>
        // Retention (snapshot layout only): age out history past
        // --retain versions; --min-age-ms guards in-flight writers.
        store match {
          case snap: SnapshotStore =>
            val existing = store.listCollections()
            if (!existing.contains(collection)) {
              System.err.println(s"collection '$collection' not found " +
                s"in this store; available: ${existing.mkString(", ")}")
              return 2
            }
            val (deleted, live) = snap.vacuum(collection,
              retainLast = opt(args, "retain", "2").toInt,
              minAgeMs = opt(args, "min-age-ms", "3600000").toLong)
            println(s"vacuumed $collection: $deleted data dir(s) " +
              s"deleted, $live live")
            0
          case _ =>
            System.err.println(
              "vacuum requires --layout snapshot (the rename-commit " +
                "layouts keep no history; their maintenance op is " +
                "compact)")
            2
        }
      case "diff" =>
        // Version diff (snapshot layout only): per-document
        // added/removed/changed between two committed versions — the
        // provenance question on top of time travel (q252's operator;
        // manifest-pruned when no compaction sits in the window).
        store match {
          case snap: SnapshotStore =>
            val existing = store.listCollections()
            if (!existing.contains(collection)) {
              System.err.println(s"collection '$collection' not found " +
                s"in this store; available: ${existing.mkString(", ")}")
              return 2
            }
            val vs = snap.versions(collection)
            val from = opt(args, "from", "").toLongOption
            val to = opt(args, "to",
              vs.lastOption.map(_.toString).getOrElse("")).toLongOption
            (from, to) match {
              case (Some(a), Some(b)) if vs.contains(a) && vs.contains(b)
                  && a < b =>
                val rows = snap.changedDocuments(collection, a, b)
                  .orderBy("change", "documentid").collect()
                rows.foreach(r =>
                  println(s"${r.getString(1)}: ${r.getString(0)}"))
                println(s"${rows.length} document(s) differ " +
                  s"between v$a and v$b")
                0
              case _ =>
                System.err.println("diff requires --from v --to v with " +
                  s"from < to among committed versions " +
                  s"(${vs.mkString(", ")})")
                2
            }
          case _ =>
            System.err.println(
              "diff requires --layout snapshot (the rename-commit " +
                "layouts keep no history to diff against)")
            2
        }
      case "sql" =>
        // Analytics REPL over the engine's full SQL surface: testdata
        // tables (--data <sfDir>) and every store collection (as
        // store_<name>) become temp views; blank line exits.
        val data = opt(args, "data", "")
        if (data.nonEmpty) Tables.registerAll(spark, data)
        store.listCollections().foreach(c =>
          store.read(c).createOrReplaceTempView(s"store_$c"))
        var line = ""
        while ({ print("sql> "); line = Option(StdIn.readLine()).getOrElse("")
            line.trim.nonEmpty }) {
          try spark.sql(line).show(50, truncate = false)
          catch { case e: Exception => System.err.println(e.getMessage) }
        }
        0
      case other =>
        System.err.println(s"unknown command '$other'"); usage(); 2
    }
  }

  private def usage(): Unit = System.err.println(
    """usage: graft.Main <command> [options]
      |  ingest --reader markdown|pdf|database --source <path>
      |         [--collection c] [--store dir] [--layout document|bucketed|snapshot]
      |         [--buckets n] [--embedder hashing|randproj]
      |  search [--collection c] [--store dir] [--k n]
      |         [--layout document|bucketed|snapshot]
      |         [--mode exact|lsh|ivfsq]   (default exact; ANN approximate)
      |         [--embedder hashing|randproj]  (MUST match the ingest flag)
      |  list   [--store dir] [--layout document|bucketed|snapshot]
      |  delete --ids id1,id2,... [--collection c] [--store dir]
      |         [--layout document|bucketed|snapshot]
      |  index  build|refresh|status [--mode lsh|ivfsq] [--ids id1,...]
      |         [--collection c] [--store dir] [--layout document|bucketed|snapshot]
      |  migrate --to-store dir --to-layout document|bucketed|snapshot
      |         [--to-buckets n] [--collection c] [--store dir]
      |         [--layout document|bucketed|snapshot]
      |  compact [--collection c] [--store dir]
      |         [--layout document|bucketed|snapshot]
      |  diff   --from v [--to v] [--collection c] [--store dir]
      |         --layout snapshot   (per-document added/removed/changed)
      |  versions [--collection c] [--store dir] --layout snapshot
      |  vacuum [--collection c] [--store dir] --layout snapshot
      |         [--retain n] [--min-age-ms ms]
      |  sql    [--data sfDir] [--store dir]""".stripMargin)
}
