package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaRow(id: Long, kind: String, n: Int, durMs: Long): Row =
    Row(id, kind, Array.tabulate(n)(i => (i % (40 + 10 * id)).toByte),
      Row(64, 48, 16000, durMs, "fake"))

  private lazy val media = spark.createDataFrame(
    java.util.Arrays.asList(
      mediaRow(1, "image", 4096, 0L),
      mediaRow(2, "image", 1024, 0L),
      mediaRow(3, "video", 8192, 5000L),
      mediaRow(4, "audio", 2048, 3000L)),
    Multimodal.mediaSchema)

  test("schema: metadata queries never touch the bytes column") {
    val metaOnly = media.select(col("media_id"), col("meta.width"))
      .filter(col("meta.width") === 64)
    assert(metaOnly.count() == 4)
    assert(!metaOnly.queryExecution.executedPlan.toString.contains("bytes"))
  }

  test("image features: 64-dim normalized histogram, deterministic") {
    val f = Multimodal.imageFeatures(media.filter(col("kind") === "image"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(1L).length == 64)
    assert(math.abs(f(1L).sum - 1.0f) < 1e-3)
    val again = Multimodal.imageFeatures(media.filter(col("kind") === "image"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(1L) == again(1L))
    assert(f(1L) != f(2L))
  }

  test("resize updates bytes and meta, preserves other columns") {
    val out = Multimodal.resizeImages(media.filter(col("kind") === "image"),
      32, 32)
    val r = out.filter(col("media_id") === 1).head()
    assert(r.getAs[Row]("meta").getAs[Int]("width") == 32)
    assert(r.getAs[Array[Byte]]("bytes").length == 32 * 32 / 64)
    assert(out.columns.toSet ==
      Set("media_id", "kind", "bytes", "meta"))
  }

  test("frame sampling explodes video rows only, ordered frames") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.forall(_.getLong(0) == 3L))
    assert(frames.length == 5) // 5000ms / 1000ms
    val idxs = frames.map(_.getInt(1)).toSeq.sorted
    assert(idxs == (0 until 5))
    val totalBytes = frames.map(_.getAs[Array[Byte]]("frame_bytes").length).sum
    assert(totalBytes == 8192) // frames partition the video bytes
  }
}
