package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** [[ChunkStore.delete]] — whole-document deletion on both layouts.
  * Contract: deleted documents' chunks are gone from read-back, every
  * other document is untouched, the two layouts agree byte-for-byte,
  * deleting an absent id is a no-op, a deleted document can be
  * re-ingested, and (bucketed) a bucket emptied by the delete is
  * physically removed — a stale directory would resurrect the chunks.
  */
class DocumentDeleteSpec extends SparkSpec {

  private def chunk(doc: Int, i: Int): EmbeddedChunk =
    EmbeddedChunk(s"d$doc:$i", Array(0.5f, 0.25f), s"content $doc $i",
      "ctx", s"d$doc")

  private def contentOf(s: ChunkStore): Seq[String] =
    s.read("c").select(col("key"), col("content"), col("documentid"))
      .collect().map(_.toString).sorted.toSeq

  test("delete removes whole documents identically on both layouts") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("delete-spec").toString
    val doc = new VectorStore(spark, s"$root/doc")
    val bkt = new BucketedVectorStore(spark, s"$root/bkt", nBuckets = 4)
    val rows = for (d <- 0 until 8; i <- 0 until 3) yield chunk(d, i)
    Seq(doc: ChunkStore, bkt).foreach(_.upsert(rows.toDS().repartition(4), "c"))
    // Pick a victim set that EMPTIES at least one bucket (all docs of
    // some bucket) plus one doc from a surviving bucket — exercises
    // both the rewrite path and the emptied-directory cleanup.
    val byBucket = (0 until 8).map(d => s"d$d").groupBy(id =>
      spark.range(1).select(BucketedMerge.bucketOf(lit(id), 4))
        .head().getInt(0))
    val (emptyB, emptyDocs) = byBucket.minBy(_._2.size)
    val otherDoc = byBucket.filter(_._1 != emptyB).values.flatten.head
    val victims = emptyDocs :+ otherDoc
    Seq(doc: ChunkStore, bkt).foreach(_.delete("c", victims))
    val dContent = contentOf(doc)
    val bContent = contentOf(bkt)
    assert(dContent == bContent, "layouts disagree after delete")
    victims.foreach { v =>
      assert(!dContent.exists(_.contains(s"$v]")),
        s"deleted document $v still readable")
    }
    assert(dContent.size == (8 - victims.size) * 3,
      "survivor chunk count wrong")
    // The emptied bucket's directory must be gone (stale dirs
    // resurrect deleted chunks on the next read).
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    if (byBucket(emptyB).forall(victims.contains)) {
      assert(!fs.exists(new Path(
        s"$root/bkt/c/${BucketedMerge.BucketCol}=$emptyB")),
        s"emptied bucket $emptyB directory survived the delete")
    }
    // Absent-id delete is a no-op on both layouts.
    Seq(doc: ChunkStore, bkt).foreach(_.delete("c", Seq("d-nope")))
    assert(contentOf(doc) == dContent && contentOf(bkt) == bContent)
    // A deleted document re-ingests cleanly (keys were fully dropped).
    val back = victims.head
    val backId = back.stripPrefix("d").toInt
    Seq(doc: ChunkStore, bkt).foreach(
      _.upsert(Seq(chunk(backId, 0)).toDS(), "c"))
    Seq(doc: ChunkStore, bkt).foreach { s =>
      val got = s.read("c").filter(col("documentid") === back).collect()
      assert(got.length == 1 && got.head.getAs[String]("key") ==
        s"$back:0", s"re-ingest after delete failed on $s")
    }
  }
}
