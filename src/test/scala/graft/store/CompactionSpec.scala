package graft.store

import graft.SparkSpec
import graft.model.EmbeddedChunk
import org.apache.spark.sql.functions._

/** [[VectorStore.compact]]: the physical file census shrinks to one
  * file per documentid partition, readers see byte-identical content
  * before and after, and the upsert contract keeps working on the
  * compacted layout.
  */
class CompactionSpec extends SparkSpec {

  private def chunk(doc: Int, i: Int): EmbeddedChunk =
    EmbeddedChunk(s"d$doc:$i", Array(0.5f, 0.25f), s"content $doc $i",
      "ctx", s"d$doc")

  test("compact: one file per partition, content identical, upsert " +
      "still replaces whole documents") {
    val root = java.nio.file.Files
      .createTempDirectory("compact-spec").toString
    val vs = new VectorStore(spark, root)
    import spark.implicits._
    // 6 docs × 4 chunks scattered over 8 tasks → partitions hold
    // multiple files each.
    val rows = for (d <- 0 until 6; i <- 0 until 4) yield chunk(d, i)
    vs.upsert(rows.toDS().repartition(8), "c")
    val beforeContent = vs.read("c")
      .select(col("key"), col("content"), col("documentid"))
      .collect().map(_.toString).sorted
    val (before, after) = vs.compact("c")
    assert(after == 6, s"expected one file per document, got $after")
    assert(before > after,
      s"fragmented layout should exceed one file/doc ($before)")
    val afterContent = vs.read("c")
      .select(col("key"), col("content"), col("documentid"))
      .collect().map(_.toString).sorted
    assert(afterContent.toSeq == beforeContent.toSeq,
      "compaction changed reader-visible content")
    // Dynamic-overwrite upsert still replaces exactly the touched
    // document on the compacted layout.
    vs.upsert(Seq(chunk(3, 0)).toDS(), "c")
    val d3 = vs.read("c").filter(col("documentid") === "d3").collect()
    assert(d3.length == 1 && d3.head.getAs[String]("key") == "d3:0")
    assert(vs.read("c").filter(col("documentid") === "d2").count() == 4,
      "untouched document lost rows after post-compaction upsert")
  }
}
