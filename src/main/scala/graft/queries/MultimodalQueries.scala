package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q48: the multimodal operator surface as a driver-executed query
  * (north-star component; full DuckDB oracle since r10 — the media bytes
  * never exist in the testdata parquet, but the table is an md5-hex chain
  * DuckDB re-derives, so the whole codec surface is replayed in SQL; the
  * golden manifest in MultimodalSpec stays as the engine-side pin).
  *
  * The media table is fully deterministic — bytes are an md5 chain over the
  * row id, lengths/metadata are id arithmetic — so every run, every JVM and
  * the golden spec see identical inputs. The query drives all three
  * operators end-to-end: [[Multimodal.imageFeatures]] (decode →
  * feature-vector batch shape), [[Multimodal.resizeImages]] (byte
  * replacement + meta update) and [[Multimodal.sampleFrames]]
  * (executor-side frame explode), then folds each to stable per-media
  * scalars with a total-order sort.
  */
object MultimodalQueries {

  /** Deterministic media table: `n` rows cycling image/audio/video, with
    * id-seeded binary payloads (16–128 bytes via an md5 hex chain) and
    * typed metadata matching [[Multimodal.mediaSchema]]'s shape.
    */
  def mediaTable(s: SparkSession, n: Int = 60): DataFrame = {
    val id = col("id")
    // 8 chained md5s = 256 hex chars; keep 32*(1 + id mod 8) → 16–128 bytes.
    val hexChain = concat((0 until 8).map(k =>
      md5(concat(id.cast("string"), lit(s"_$k")))): _*)
    val hexLen = (lit(1) + pmod(id, lit(8)).cast("int")) * lit(32)
    s.range(n).select(
      id.as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(id, lit(3)) + 1).cast("int")).as("kind"),
      unhex(hexChain.substr(lit(1), hexLen)).as("bytes"),
      struct(
        ((pmod(id, lit(16)) + 1) * 64).cast("int").as("width"),
        ((pmod(id, lit(12)) + 1) * 48).cast("int").as("height"),
        when(pmod(id, lit(3)) === 1, 16000).otherwise(44100)
          .cast("int").as("sample_rate"),
        ((pmod(id, lit(10)) + 1) * 3000).cast("long").as("duration_ms"),
        element_at(array(lit("raw"), lit("pcm"), lit("mjpeg")),
          (pmod(id, lit(3)) + 1).cast("int")).as("codec")).as("meta"))
  }

  /** One row per media item: payload size, image feature checksum +
    * resized payload size (images), sampled frame count + total frame
    * bytes (videos). All doubles rounded; ordered by media_id.
    */
  def q48(s: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(s, 60)
    val images = media.filter(col("kind") === "image")

    val featsD = transform(col("features"), _.cast("double"))
    val feats = Multimodal.imageFeatures(images)
      .select(col("media_id"),
        size(col("features")).as("feat_dim"),
        // Position-weighted checksum: sum(f_i * i) pins both the values
        // AND their order, not just the histogram mass (which is ~1.0).
        round(aggregate(
          zip_with(featsD,
            transform(sequence(lit(1), size(col("features"))),
              _.cast("double")),
            (f, i) => f * i),
          lit(0.0), (a, x) => a + x), 6).as("feat_chk"))

    val resized = Multimodal.resizeImages(images, w = 64, h = 48)
      .select(col("media_id"), length(col("bytes")).as("resized_len"),
        col("meta.width").as("resized_w"))

    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("frame_bytes_total"))

    media.select(col("media_id"), col("kind"),
        length(col("bytes")).as("n_bytes"))
      .join(feats, Seq("media_id"), "left")
      .join(resized, Seq("media_id"), "left")
      .join(frames, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("feat_dim"), col("feat_chk"), col("resized_len"),
        col("resized_w"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("frame_bytes_total"), lit(0L)).as("frame_bytes_total"))
      .orderBy(col("media_id"))
  }

  // q88: the multimodal BINARY layer under the oracle — the media table's
  // payload bytes and typed metadata are reconstructed by DuckDB from the
  // same md5-chain/arithmetic recipe, so the hash-match certifies Spark's
  // binary round trip (expression → unhex → parquet BINARY → hex) and the
  // metadata struct byte-for-byte — and is the foundation the q48 codec
  // replay builds its per-byte extraction on.
  def q88(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, 60).select(col("media_id"), col("kind"),
        length(col("bytes")).as("n_bytes"),
        lower(hex(col("bytes"))).as("bytes_hex"),
        col("meta.width").as("width"),
        col("meta.duration_ms").as("duration_ms"))
      .orderBy(col("media_id"))

  /** q174: image near-dup via 60-bit perceptual hash + 15-bit LSH
    * banding — every image paired with a 1-byte-tampered copy (the
    * planted near-dup), signatures from the codegen'd
    * [[Multimodal.pHash60]] locality hash, candidates from the banded
    * self-join (never all-pairs), exact Hamming filter ≤ 12. The
    * image-modality sibling of q27's text MinHash: the oracle replays
    * the whole signature → band → pair trajectory from the md5-chain
    * payload fabric.
    */
  def q174(s: SparkSession, dir: String): DataFrame = {
    val imgs = mediaTable(s, 60).filter(col("kind") === "image")
      .select(col("media_id"), lower(hex(col("bytes"))).as("h"),
        length(col("bytes")).cast("long").as("len"))
    val copies = imgs.select((col("media_id") + 1000).as("media_id"),
      concat(lit("ff"), expr("substring(h, 3)")).as("h"), col("len"))
    val sigs = imgs.union(copies)
      .withColumn("sig", Multimodal.pHash60(col("h"), col("len")))
    Multimodal.pHashPairs(sigs, "media_id", "sig", maxHamming = 12)
      .orderBy(col("a"), col("b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_multimodal" -> (q48 _),
    "q88_media_roundtrip" -> (q88 _),
    "q174_phash_neardup" -> (q174 _)
  )

  /** q174's oracle: the full pHash trajectory replayed — payload fabric
    * (md5 chain, image slice), the 1-byte tamper, all 60 wrapped byte
    * comparisons as generated terms (BIGINT shifts — INTEGER `1 << i`
    * overflows at i ≥ 31), band extraction on the positive 60-bit
    * long, the banded pair join, and the exact Hamming filter.
    */
  private lazy val q174Sql: String = {
    def byteAt(p: String) =
      s"CAST(('0x' || substr(h, CAST(($p) * 2 + 1 AS INTEGER), 2)) " +
        "AS BIGINT)"
    val terms = (0 until 60).map { i =>
      val p1 = s"$i % len"
      val p2 = s"($i + len // 2) % len"
      s"CASE WHEN ${byteAt(p1)} > ${byteAt(p2)} " +
        s"THEN CAST(1 AS BIGINT) << $i ELSE CAST(0 AS BIGINT) END"
    }.mkString(" +\n  ")
    val chain = (0 until 8).map(k => s"md5(id || '_$k')").mkString(" || ")
    s"""WITH m AS (SELECT unnest(range(60)) AS id),
       |base AS (SELECT id AS media_id,
       |    substr($chain, 1, CAST(32 * (1 + id % 8) AS INTEGER)) AS h,
       |    CAST(16 * (1 + id % 8) AS BIGINT) AS len
       |  FROM m WHERE id % 3 = 0),
       |allr AS (SELECT media_id, h, len FROM base
       |  UNION ALL SELECT media_id + 1000, 'ff' || substr(h, 3), len
       |  FROM base),
       |sig AS MATERIALIZED (SELECT media_id, ($terms) AS sig FROM allr),
       |bands AS (SELECT media_id, sig, b,
       |    (sig >> CAST(b * 15 AS INTEGER)) & 32767 AS v
       |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
       |p AS (SELECT DISTINCT x.media_id AS a, y.media_id AS b2,
       |    x.sig AS sa, y.sig AS sb
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.v = y.v AND x.media_id < y.media_id)
       |SELECT a, b2 AS b,
       |  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM p WHERE bit_count(xor(sa, sb)) <= 12
       |ORDER BY a, b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q174_phash_neardup" -> q174Sql,
    // q48 full replay (r10): every operator in the chain is deterministic
    // arithmetic over the md5-hex payload q88 already certifies, so DuckDB
    // re-derives the whole feature surface — including the float32 step:
    // FakeCodec.decodeImage divides each 64-bin byte histogram count by n
    // IN FLOAT (hist(j) /= n); DuckDB's FLOAT/FLOAT division is the same
    // IEEE binary32 op (verified bit-for-bit), and the cast back to DOUBLE
    // makes the weighted checksum sum exact. resized_len = 64*48/64 and
    // frame totals tile the payload (sum of copyOfRange frames == length),
    // so those columns are closed-form. The 60-row input is fixed and
    // SF-independent: a hash-match here is permanent, not per-SF.
    "q48_multimodal" -> {
      val chain = (0 until 8)
        .map(k => s"md5(id || '_$k')").mkString(" || ")
      s"""WITH m AS (SELECT unnest(range(60)) AS id),
         |c AS (SELECT id, $chain AS chain,
         |        (1 + id % 8) * 32 AS hexlen FROM m),
         |b AS (
         |  SELECT c.id,
         |    (strpos('0123456789abcdef',
         |        substr(c.chain, CAST(2*j+1 AS INTEGER), 1)) - 1) * 16
         |    + strpos('0123456789abcdef',
         |        substr(c.chain, CAST(2*j+2 AS INTEGER), 1)) - 1 AS byte
         |  FROM c, (SELECT unnest(range(128)) AS j)
         |  WHERE c.id % 3 = 0 AND j < hexlen // 2
         |),
         |bins AS (
         |  SELECT id, byte // 4 AS bin, count(*) AS cnt FROM b GROUP BY 1, 2),
         |chk AS (
         |  SELECT bins.id,
         |    round(SUM(CAST(CAST(cnt AS FLOAT) / CAST(c.hexlen // 2 AS FLOAT)
         |        AS DOUBLE) * (bin + 1)), 6) AS feat_chk
         |  FROM bins JOIN c ON bins.id = c.id GROUP BY 1)
         |SELECT id AS media_id,
         |  CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |    ELSE 'video' END AS kind,
         |  CAST((1 + id % 8) * 16 AS INTEGER) AS n_bytes,
         |  CAST(CASE WHEN id % 3 = 0 THEN 64 END AS INTEGER) AS feat_dim,
         |  (SELECT feat_chk FROM chk WHERE chk.id = m.id) AS feat_chk,
         |  CAST(CASE WHEN id % 3 = 0 THEN 48 END AS INTEGER) AS resized_len,
         |  CAST(CASE WHEN id % 3 = 0 THEN 64 END AS INTEGER) AS resized_w,
         |  CAST(CASE WHEN id % 3 = 2 THEN (id % 10 + 1) * 3 ELSE 0 END
         |    AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN id % 3 = 2 THEN (1 + id % 8) * 16 ELSE 0 END
         |    AS BIGINT) AS frame_bytes_total
         |FROM m ORDER BY media_id""".stripMargin
    },
    "q88_media_roundtrip" -> {
      val chain = (0 until 8)
        .map(k => s"md5(id || '_$k')").mkString(" || ")
      s"""WITH m AS (SELECT unnest(range(60)) AS id),
         |c AS (SELECT id, $chain AS chain,
         |        (1 + id % 8) * 32 AS hexlen FROM m)
         |SELECT id AS media_id,
         |  CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |    ELSE 'video' END AS kind,
         |  CAST((1 + id % 8) * 16 AS INTEGER) AS n_bytes,
         |  substr(chain, 1, CAST(hexlen AS INTEGER)) AS bytes_hex,
         |  CAST((id % 16 + 1) * 64 AS INTEGER) AS width,
         |  CAST((id % 10 + 1) * 3000 AS BIGINT) AS duration_ms
         |FROM c ORDER BY media_id""".stripMargin
    }
  )
}
