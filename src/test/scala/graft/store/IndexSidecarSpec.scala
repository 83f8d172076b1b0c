package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import org.apache.spark.sql.functions._

/** [[VectorStore.buildIndex]] / [[VectorStore.hasFreshIndex]] — the
  * persisted ANN serving path. Properties:
  *
  *   - a fresh sidecar serves `search(mode=lsh|ivfsq)` with EXACTLY the
  *     rows the fit-at-search path returns (the fits are deterministic
  *     over the same rows, so persistence must be invisible to results);
  *   - any upsert stales the sidecar (fingerprint mismatch) and search
  *     falls back to fit-at-search — never silently serving an index
  *     that is missing the newest documents;
  *   - the sidecar is invisible to the collection's own reads and its
  *     file census.
  */
class IndexSidecarSpec extends SparkSpec {

  private val dim = 16

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  private def mkStore(): (VectorStore, String) = {
    val root = java.nio.file.Files
      .createTempDirectory("sidecar-spec").toString
    val vs = new VectorStore(spark, root)
    import spark.implicits._
    val rows = for (d <- 0 until 8; i <- 0 until 8) yield
      EmbeddedChunk(f"d$d%02d:$i", vec(d * 100 + i), s"c$d$i", "",
        f"d$d%02d")
    vs.upsert(rows.toDS().repartition(4), "c")
    (vs, root)
  }

  private def hits(vs: VectorStore, mode: String, qv: Array[Float]) =
    vs.search("c", graft.functions.VectorLiteralProvider.render(qv),
        k = 5, provider = new graft.functions.VectorLiteralProvider(dim),
        mode = mode)
      .select(col("key"), col("score")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("sidecar-served ANN search returns the fit-at-search rows") {
    val (vs, root) = mkStore()
    val queries = Seq(vec(9001), vec(9002), vec(9003))
    val before = for (m <- Seq("lsh", "ivfsq"); q <- queries)
      yield hits(vs, m, q)
    val censusBefore = ChunkStore.countDataFiles(spark, s"$root/c")
    val fpBefore = ChunkStore.dataFingerprint(spark, s"$root/c")
    vs.buildIndex("c", "lsh")
    vs.buildIndex("c", "ivfsq")
    assert(vs.hasFreshIndex("c", "lsh"), "lsh sidecar not fresh")
    assert(vs.hasFreshIndex("c", "ivfsq"), "ivfsq sidecar not fresh")
    val after = for (m <- Seq("lsh", "ivfsq"); q <- queries)
      yield hits(vs, m, q)
    assert(after == before,
      "sidecar-served results differ from fit-at-search results")
    // Building the index changes neither the data census nor the
    // fingerprint (else building would immediately stale itself).
    assert(ChunkStore.countDataFiles(spark, s"$root/c") == censusBefore,
      "index sidecar files leaked into the data census")
    assert(ChunkStore.dataFingerprint(spark, s"$root/c") == fpBefore,
      "building the index changed the data fingerprint")
  }

  test("an upsert stales the sidecar and search falls back") {
    import spark.implicits._
    val (vs, _) = mkStore()
    vs.buildIndex("c", "ivfsq")
    vs.buildIndex("c", "lsh")
    assert(vs.hasFreshIndex("c", "ivfsq"))
    // New document: the persisted index has no codes for it.
    val extra = Seq(EmbeddedChunk("d99:0", vec(9900), "new", "", "d99"))
    vs.upsert(extra.toDS(), "c")
    assert(!vs.hasFreshIndex("c", "ivfsq"),
      "sidecar still fresh after an upsert")
    assert(!vs.hasFreshIndex("c", "lsh"),
      "sidecar still fresh after an upsert")
    // Fallback fit-at-search CAN see the new document: query with the
    // new doc's own vector — exact nearest neighbor is itself.
    val got = hits(vs, "ivfsq", vec(9900))
    assert(got.nonEmpty && got.head._1 == "d99:0",
      s"stale-index fallback missed the newest document: $got")
    // Rebuild restores freshness and serves the new row.
    vs.buildIndex("c", "ivfsq")
    assert(vs.hasFreshIndex("c", "ivfsq"))
    val got2 = hits(vs, "ivfsq", vec(9900))
    assert(got2.nonEmpty && got2.head._1 == "d99:0",
      s"rebuilt sidecar missed the newest document: $got2")
  }

  test("compact drops the sidecar; staleness is detected either way") {
    val (vs, _) = mkStore()
    vs.buildIndex("c", "lsh")
    assert(vs.hasFreshIndex("c", "lsh"))
    vs.compact("c")
    // The swap removed the sidecar dir entirely; hasFreshIndex must
    // report false, and search must serve via fit-at-search.
    assert(!vs.hasFreshIndex("c", "lsh"),
      "sidecar reported fresh after compact rewrote every file")
    assert(hits(vs, "lsh", vec(9001)).nonEmpty)
  }
}
