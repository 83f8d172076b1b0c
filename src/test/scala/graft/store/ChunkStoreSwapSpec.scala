package graft.store

import graft.SparkSpec
import graft.operators.IngestionPipeline
import graft.sources.MarkdownSource
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The store seam, certified: the SAME pipeline run (markdown corpus →
  * chunk → embed → upsert) lands byte-identical rows through either
  * [[ChunkStore]] layout — per-document partitions or hash buckets.
  * Layout is physical; results are not.
  */
class ChunkStoreSwapSpec extends SparkSpec {

  private def contents(st: ChunkStore): Seq[(String, String, String, String, Long)] = {
    import spark.implicits._
    st.read("docs")
      .select(col("key"), md5(col("content")).as("c"), col("context"),
        col("documentid"),
        // e6 checksum over the embedding values — full float equality.
        aggregate(col("embedding"), lit(0L),
          (acc, v) => acc + round(v.cast("double") * 1e6).cast("long"))
          .as("e"))
      .as[(String, String, String, String, Long)]
      .collect().sortBy(_._1).toSeq
  }

  test("the same ingest lands identical store contents through the " +
      "per-document and bucketed layouts (ChunkStore swap)") {
    val elems = MarkdownSource.elements(spark,
      resourcePath("content/markdown")).localCheckpoint(true)
    val perDoc = new VectorStore(spark,
      Files.createTempDirectory("swap-vs").toString)
    val bucketed = new BucketedVectorStore(spark,
      Files.createTempDirectory("swap-bvs").toString, nBuckets = 8)
    val snapshot = new SnapshotStore(spark,
      Files.createTempDirectory("swap-snap").toString, nBuckets = 8)
    val r1 = IngestionPipeline.run(elems, perDoc, "docs").collect()
    val r2 = IngestionPipeline.run(elems, bucketed, "docs").collect()
    val r3 = IngestionPipeline.run(elems, snapshot, "docs").collect()
    assert(r1.length == 10 && r1.forall(_.succeeded))
    assert(r2.map(r => (r.documentid, r.succeeded, r.n_chunks)).sorted.toSeq ==
      r1.map(r => (r.documentid, r.succeeded, r.n_chunks)).sorted.toSeq)
    assert(r3.map(r => (r.documentid, r.succeeded, r.n_chunks)).sorted.toSeq ==
      r1.map(r => (r.documentid, r.succeeded, r.n_chunks)).sorted.toSeq)
    val c1 = contents(perDoc)
    val c2 = contents(bucketed)
    val c3 = contents(snapshot)
    assert(c1.nonEmpty && c1 == c2,
      s"layouts disagree: perDoc=${c1.size} rows, bucketed=${c2.size} rows")
    assert(c1 == c3,
      s"layouts disagree: perDoc=${c1.size} rows, snapshot=${c3.size} rows")
    // And the bucketed store's point read returns the same chunks the
    // per-document layout's partition holds.
    val doc = "black_holes.md"
    val viaPoint = bucketed.readDocument("docs", doc)
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    val viaScan = perDoc.read("docs")
      .filter(col("documentid") === doc)
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(viaPoint == viaScan && viaPoint.nonEmpty)
  }
}
