package graft.store

import graft.SparkSpec
import graft.operators.IngestionPipeline
import graft.sources.MarkdownSource
import java.nio.file.Files

class VectorStoreSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-store").toString
  private lazy val store = new VectorStore(spark, root)

  test("ingest markdown corpus end-to-end: per-doc results + store contents") {
    val elems = MarkdownSource.elements(spark, resourcePath("content/markdown"))
    val results = IngestionPipeline.run(elems, store, "documents").collect()
    assert(results.length == 10)
    assert(results.forall(_.succeeded))
    assert(results.forall(_.n_chunks > 0))

    val stored = store.read("documents")
    assert(stored.count() == results.map(_.n_chunks).sum)
    val cols = stored.columns.toSet
    assert(cols == Set("key", "embedding", "content", "context", "documentid"))
    val emb = stored.select("embedding").head().getSeq[Float](0)
    assert(emb.length == 384)
  }

  test("re-ingestion is idempotent (document-replace upsert)") {
    val elems = MarkdownSource.elements(spark, resourcePath("content/markdown"))
    IngestionPipeline.run(elems, store, "documents").collect()
    val before = store.read("documents")
      .select("key").collect().map(_.getString(0)).sorted
    IngestionPipeline.run(elems, store, "documents").collect()
    val after = store.read("documents")
      .select("key").collect().map(_.getString(0)).sorted
    assert(before.toSeq == after.toSeq)
  }

  test("partial re-ingest replaces only the touched document's chunks") {
    val elems = MarkdownSource.elements(spark, resourcePath("content/markdown"))
    IngestionPipeline.run(elems, store, "part").collect()
    val total = store.read("part").count()
    val one = elems.filter(_.doc_id == "black_holes.md")
    IngestionPipeline.run(one, store, "part").collect()
    assert(store.read("part").count() == total)
    val docs = store.read("part").select("documentid").distinct().count()
    assert(docs == 10)
  }

  test("search finds the on-topic document top-1 (REPL semantics)") {
    val hits = store.search("documents",
      "gravity so strong that light cannot escape the event horizon", k = 1)
      .collect()
    assert(hits.length == 1)
    assert(hits.head.getAs[String]("documentid") == "black_holes.md")
    assert(hits.head.getAs[Double]("score") > 0.1)
    val hits3 = store.search("documents",
      "coral reefs marine fish species", k = 3).collect()
    assert(hits3.length == 3)
    assert(hits3.head.getAs[String]("documentid") == "coral_reefs.md")
    // scores descending
    val scores = hits3.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("filtered search prunes to matching documents before scoring") {
    import org.apache.spark.sql.functions.col
    // Exclude the otherwise-top document: the best remaining hit wins.
    val hits = store.searchFiltered("documents",
      "gravity so strong that light cannot escape the event horizon", 3,
      col("documentid") =!= "black_holes.md").collect()
    assert(hits.nonEmpty)
    assert(hits.forall(_.getAs[String]("documentid") != "black_holes.md"))
    // Restrict to exactly one document: every hit comes from it, and the
    // partitioned layout turns the filter into partition pruning.
    val one = store.searchFiltered("documents",
      "coral reefs marine fish species", 5,
      col("documentid") === "coral_reefs.md")
    assert(one.collect().forall(
      _.getAs[String]("documentid") == "coral_reefs.md"))
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("coral_reefs.md"), scan.take(1500))
  }

  test("list collections") {
    assert(store.listCollections().contains("documents"))
    assert(store.listCollections().contains("part"))
  }

  test("search mode default is exact, and exact-mode rows equal the brute-force path") {
    // The reference's semantics (sqlite-vec brute scan) must stay the
    // default: search() with no mode argument == mode="exact" ==
    // searchFiltered(lit(true)) row for row.
    val q = "gravity so strong that light cannot escape the event horizon"
    val dflt = store.search("documents", q, k = 3).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Double]("score"))).toSeq
    val exact = store.search("documents", q, k = 3, mode = "exact").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Double]("score"))).toSeq
    assert(dflt == exact)
    intercept[IllegalArgumentException] {
      store.search("documents", q, k = 1, mode = "bogus")
    }
  }

  test("ANN modes (lsh, ivfsq): same output shape, recall floor vs exact top-k") {
    // Both ANN modes are approximate; on the deterministic fixture
    // (fixed corpus, fixed hyperplane seed / kmeans chain) the floor
    // pinned is: at least 2 of the exact top-3 keys recovered, and the
    // on-topic document still wins top-1 — the invariant a user of
    // `--mode lsh|ivfsq` actually relies on.
    val q = "coral reefs marine fish species"
    val exactKeys = store.search("documents", q, k = 3).collect()
      .map(_.getAs[String]("key")).toSet
    // Floors differ per mode because the mechanisms do: ivfsq prunes by
    // actual geometry (kmeans cells) and re-ranks in near-lossless SQ8
    // space — it must keep the on-topic top-1 and ≥2/3 of the exact
    // top-3; lsh at collection size prunes by random hyperplanes with
    // radius-1 multiprobe — the pinned invariant is a non-zero overlap
    // with the exact top-3 (the knob a user turns for more is the probe
    // radius, as with q142's filtered search).
    for ((mode, floor) <- Seq("lsh" -> 1, "ivfsq" -> 2)) {
      val hits = store.search("documents", q, k = 3, mode = mode).collect()
      assert(hits.nonEmpty, s"mode=$mode returned no rows")
      assert(hits.head.schema.fieldNames.toSet ==
        Set("key", "embedding", "content", "context", "documentid", "score"),
        s"mode=$mode schema mismatch")
      val scores = hits.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, s"mode=$mode not score-desc")
      if (mode == "ivfsq")
        assert(hits.head.getAs[String]("documentid") == "coral_reefs.md",
          s"mode=$mode top-1 off-topic: ${hits.head.getAs[String]("documentid")}")
      val recall = hits.map(_.getAs[String]("key")).toSet
        .intersect(exactKeys).size
      assert(recall >= floor, s"mode=$mode recall $recall/3 below floor $floor")
    }
  }

  test("failed documents carry error results and contribute no chunks") {
    import spark.implicits._
    val bad = Seq(
      graft.model.ElementRow("ok.md", Seq(0), None, 0, "paragraph", None,
        Some("fine text"), None, None, None, None, None, None),
      graft.model.ElementRow("bad.md", Seq(0), None, 0, "error", None,
        Some("boom"), None, None, None, None, None, None)).toDS()
    val res = IngestionPipeline.run(bad, store, "errcase").collect()
      .map(r => r.documentid -> r).toMap
    assert(res("ok.md").succeeded && res("ok.md").n_chunks == 1)
    assert(!res("bad.md").succeeded)
    assert(res("bad.md").error.contains("boom"))
    assert(store.read("errcase").select("documentid").distinct().count() == 1)
  }
}
