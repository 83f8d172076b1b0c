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

  test("q48 golden manifest: deterministic media table → pinned outputs") {
    // The driver runs q48 rows-only (the media bytes exist nowhere in SQL
    // for an oracle to replay); these pinned rows are the exact-value gate.
    // (media_id, kind, n_bytes, feat_dim, feat_chk, resized_len,
    //  resized_w, n_frames, frame_bytes_total)
    val rows = graft.queries.MultimodalQueries.q48(spark, "")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Int]),
        Option(r.get(6)).map(_.asInstanceOf[Int]),
        r.getLong(7), r.getLong(8)))
    assert(rows.length == 60)
    val byId = rows.map(t => t._1 -> t).toMap
    assert(byId(0L) == (0L, "image", 16, Some(64), Some(32.625), Some(48),
      Some(64), 0L, 0L))
    assert(byId(2L) == (2L, "video", 48, None, None, None, None, 9L, 48L))
    assert(byId(3L) == (3L, "image", 64, Some(64), Some(34.578125), Some(48),
      Some(64), 0L, 0L))
    assert(byId(5L) == (5L, "video", 96, None, None, None, None, 18L, 96L))
    assert(byId(57L) == (57L, "image", 32, Some(64), Some(30.6875), Some(48),
      Some(64), 0L, 0L))
    assert(byId(58L) == (58L, "audio", 48, None, None, None, None, 0L, 0L))
    assert(byId(59L) == (59L, "video", 64, None, None, None, None, 30L, 64L))
    // Aggregate invariants: 20 of each kind; frames partition the video
    // bytes exactly (sum of frame bytes == sum of video payload bytes).
    val byKind = rows.groupBy(_._2)
    assert(byKind.keySet == Set("image", "audio", "video"))
    assert(byKind.forall(_._2.length == 20))
    assert(byKind("video").map(_._8).sum == 330L)
    assert(byKind("video").map(_._9).sum == 1376L)
    assert(byKind("video").map(_._3.toLong).sum == 1376L)
    assert(byKind("image").forall(t => t._4 == Some(64) && t._6 == Some(48)))
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

  test("pHash60: 1-byte edit on a 128-byte payload flips <= 1 bit; " +
      "banding finds every planted pair, no cross pairs") {
    import org.apache.spark.sql.functions._
    // 128-byte payloads: bit i reads bytes i and i+64, so a byte-0
    // tamper touches only bit 0 (positions 64..127 feed no first
    // operand below i=60) — >= 3 clean bands by pigeonhole, every
    // planted pair MUST surface with hamming <= 1.
    val base = spark.range(10).select(col("id").as("media_id"),
      lower(hex(concat((0 until 8).map(k =>
        unhex(md5(concat(col("id").cast("string"), lit(s"_pp$k")))))
        : _*))).as("h"),
      lit(128L).as("len"))
    val tampered = base.select((col("media_id") + 100).as("media_id"),
      concat(lit("00"), expr("substring(h, 3)")).as("h"), col("len"))
    val sigs = base.union(tampered)
      .withColumn("sig", Multimodal.pHash60(col("h"), col("len")))
    val pairs = Multimodal.pHashPairs(sigs, "media_id", "sig",
      maxHamming = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 100 }
    assert(planted.length == 10, s"missing planted pairs: ${pairs.toSeq}")
    assert(planted.forall(_._3 <= 1), planted.toSeq)
    assert(pairs.length == planted.length,
      s"unexpected cross pairs: ${pairs.toSeq}")
  }

  test("pHashPairs recall gap: hamming-12 pair spread over all 4 default " +
      "bands is missed, numBands = maxHamming + 1 guarantees it") {
    import org.apache.spark.sql.functions._
    // 12 differing bits, 3 per 15-bit band: every default band differs,
    // so 4-band LSH generates no candidate — the documented gap.
    import spark.implicits._
    val diff = Seq(0, 1, 2, 15, 16, 17, 30, 31, 32, 45, 46, 47)
      .map(1L << _).reduce(_ | _)
    val sigs = Seq((1L, 0L), (2L, diff))
      .toDF("media_id", "sig")
    val miss = Multimodal.pHashPairs(sigs, "media_id", "sig",
      maxHamming = 12).count()
    assert(miss == 0L, "default 4-band LSH unexpectedly found the pair")
    // 13 bands over 60 bits: pigeonhole leaves >= 1 untouched band for
    // any hamming <= 12 pair — the pair MUST surface, with exact hamming.
    val hit = Multimodal.pHashPairs(sigs, "media_id", "sig",
      maxHamming = 12, numBands = 13).collect()
    assert(hit.length == 1 && hit.head.getLong(2) == 12L, hit.toSeq)
  }
}
