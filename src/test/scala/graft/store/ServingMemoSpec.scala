package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import org.apache.spark.sql.functions._

/** The serving memo's CROSS-PROCESS safety: the memoized codes
  * DataFrames are keyed by (data fingerprint, sidecar stamp), so a
  * sidecar rebuild by a DIFFERENT store instance over the same root —
  * the stand-in for a second CLI/driver process, whose in-process
  * invalidation hook can't reach ours — must be a cache miss here, not
  * a FileNotFoundException against the overwritten parquet files or a
  * silent serve of the stale candidates.
  */
class ServingMemoSpec extends SparkSpec {

  private val dim = 16

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  private def hits(vs: ChunkStore, mode: String, qv: Array[Float]) =
    vs.search("c", graft.functions.VectorLiteralProvider.render(qv),
        k = 5, provider = new graft.functions.VectorLiteralProvider(dim),
        mode = mode)
      .select(col("key"), col("score")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  for (mode <- Seq("lsh", "ivfsq")) {
    test(s"[$mode] a sidecar rebuild by a second store instance over " +
        "the same root misses the first instance's serving memo") {
      val root = java.nio.file.Files
        .createTempDirectory("memo-spec").toString
      val vs1 = new VectorStore(spark, root)
      import spark.implicits._
      val rows = for (d <- 0 until 8; i <- 0 until 8) yield
        EmbeddedChunk(f"d$d%02d:$i", vec(d * 100 + i), s"c$d$i", "",
          f"d$d%02d")
      vs1.upsert(rows.toDS().repartition(4), "c")
      vs1.buildIndex("c", mode)
      val q = vec(9001)
      val served = hits(vs1, mode, q) // memo is now WARM in vs1
      // "Another process": a second instance whose buildIndex overwrite
      // replaces the codes parquet files on disk. vs1's cached codes
      // DataFrames point at the deleted files; the data fingerprint is
      // UNCHANGED (sidecars are excluded from it), so only the sidecar
      // stamp in the memo key can save the next search.
      val vs2 = new VectorStore(spark, root)
      vs2.buildIndex("c", mode)
      assert(vs1.hasFreshIndex("c", mode),
        "the rebuilt sidecar is fresh — same data, new codes files")
      val reserved = hits(vs1, mode, q)
      assert(reserved == served,
        "the reload after a cross-process rebuild must serve the same " +
          "deterministic answer")
    }
  }
}
