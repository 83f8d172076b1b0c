package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines (north-star
  * surface): images/audio/video as opaque `BINARY` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The actual codecs are NOT available in this environment, so the byte →
  * pixels/samples step is a clearly marked deterministic fake
  * ([[FakeCodec]]); everything around it — the schema contract, the
  * `mapPartitions` batch shape (decode setup paid once per partition, the
  * way a real JNI/FFmpeg handle would be), the explode pattern for frame
  * sampling, and the partitioning story — is real, tested, and is exactly
  * the plumbing a real decoder would drop into.
  *
  * 100 TB design: media rows are large (MBs); keep them in their own table
  * partitioned by `kind` and bucketed/range-partitioned by id so metadata
  * predicates prune before any bytes are read (parquet column pruning means
  * a `meta`-only query never touches the `bytes` column pages). Feature
  * extraction streams partition-at-a-time; nothing holds more than one
  * batch of decoded media in memory.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", metaSchema)))

  /** DETERMINISTIC FAKE CODEC — stand-in for a real image/audio/video
    * decoder (none is installable here). "Decoding" derives stable pseudo
    * content from the bytes; a real implementation replaces ONLY this
    * object (the operator signatures and batch shapes stay unchanged).
    */
  object FakeCodec extends Serializable {
    /** Fake "pixels": byte value histogram, 64 bins — plays the role of a
      * decoded image for downstream feature extraction.
      */
    def decodeImage(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](64)
      if (bytes == null) return hist
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 2) += 1f
        i += 1
      }
      val n = math.max(1, bytes.length)
      (0 until 64).foreach(j => hist(j) /= n)
      hist
    }

    /** Fake resize: re-derives a content signature at the target size and
      * returns replacement bytes (w*h/64 long, deterministic).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(1, w * h / 64))
      var i = 0
      while (i < out.length) {
        out(i) = (if (bytes == null || bytes.isEmpty) 0
                  else bytes(i % bytes.length)).toByte
        i += 1
      }
      out
    }

    /** Fake frame boundaries: fixed-size chunks of the "video" bytes. */
    def frameOffsets(bytes: Array[Byte], everyMs: Long,
        durationMs: Long): Seq[(Int, Long)] = {
      if (bytes == null || bytes.isEmpty || durationMs <= 0) return Seq.empty
      val nFrames = math.max(1, (durationMs / math.max(1, everyMs)).toInt)
      (0 until nFrames).map(i =>
        (i * (bytes.length / nFrames), i * everyMs))
    }
  }

  /** Image feature extraction: bytes → Array[Float] feature vector.
    * `mapPartitions` so a real decoder's session/threadpool is initialized
    * once per partition; rows stream through in one pass.
    */
  def imageFeatures(df: DataFrame, bytesCol: String = "bytes",
      idCol: String = "media_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Real codec: init decoder handle here, once per partition.
        it.map { case (id, bytes) =>
          (id, FakeCodec.decodeImage(bytes))
        }
      }
      .toDF(idCol, "features")
  }

  /** Resize: replaces bytes, updates meta (width/height); metadata-only
    * columns pass through untouched.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val resized = df.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        (id, FakeCodec.resize(b, w, h))
      })
      .toDF("media_id", "bytes_resized")
    df.drop("bytes").join(resized, "media_id")
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.codec").as("codec")))
      .withColumnRenamed("bytes_resized", "bytes")
  }

  /** Frame sampling: one output row per sampled frame (media_id, frame_idx,
    * frame_ts_ms, frame_bytes). The explode happens executor-side inside
    * flatMap — no driver materialization, scales with partitions.
    */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("kind") === "video")
      .select(col("media_id").cast("long"), col("bytes"),
        col("meta.duration_ms").as("duration_ms"))
      .as[(Long, Array[Byte], Long)]
      .flatMap { case (id, bytes, dur) =>
        val offs = FakeCodec.frameOffsets(bytes, everyMs, dur)
        offs.zipWithIndex.map { case ((off, ts), idx) =>
          val end = if (idx + 1 < offs.length) offs(idx + 1)._1 else bytes.length
          (id, idx, ts, java.util.Arrays.copyOfRange(bytes, off, end))
        }
      }
      .toDF("media_id", "frame_idx", "frame_ts_ms", "frame_bytes")
  }

  /** 60-bit PERCEPTUAL-hash signature over a payload's hex view — the
    * image-near-dup primitive (pHash-family): bit i compares the byte
    * at wrapped position `i mod L` against the byte half-a-payload
    * away (`(i + L/2) mod L`), so a small byte edit flips only the few
    * bits whose comparisons touch it (locality — the property a
    * cryptographic hash destroys and near-dup detection requires).
    * 60 bits = 4 × 15-bit LSH bands with the sign bit untouched, so
    * band extraction is shift-and-mask on a POSITIVE long in every
    * engine (no arithmetic-shift divergence). Pure codegen'd column
    * expression — no UDF, no decode; a real pipeline swaps the hex
    * view for decoded luma the same way [[FakeCodec]] stubs decode.
    *
    * `hexCol`: lowercase hex of the payload; `lenCol`: payload byte
    * length (must be even — every media payload here is 16-aligned).
    */
  def pHash60(hexCol: Column, lenCol: Column): Column = {
    val half = (lenCol / 2).cast("long")
    def byteAt(pos: Column): Column =
      conv(hexCol.substr((pos * 2 + 1).cast("int"), lit(2)), 16, 10)
        .cast("long")
    // Horner fold, bit 59 first: acc·2 + bit — one COMPACT aggregate
    // expression instead of a 60-term sum (the unrolled tree cost
    // ~2-5 s of plan compilation PER EXECUTION for a 40-row input —
    // r13 bench; same value, sig = Σ bit_i·2^i, so the oracle's
    // unrolled integer sum is unchanged).
    aggregate(
      sequence(lit(59L), lit(0L), lit(-1L)),
      lit(0L),
      (acc, i) => {
        val p1 = pmod(i, lenCol.cast("long"))
        val p2 = pmod(i + half, lenCol.cast("long"))
        acc * 2 + when(byteAt(p1) > byteAt(p2), 1L).otherwise(0L)
      })
  }

  /** Near-duplicate pairs among pHash signatures via LSH banding over
    * the 60-bit signature, then the exact Hamming filter. The
    * pigeonhole RECALL GUARANTEE is hamming < `numBands` ONLY: a pair
    * differing in fewer bits than there are bands must leave some band
    * untouched. At the DEFAULT (numBands = 4, maxHamming = 12) that
    * means pairs at hamming ≤ 3 are guaranteed; pairs at 4–12 are found
    * only if their differing bits happen to cluster inside ≤ 3 bands —
    * real recall loss, accepted for bucket selectivity (15-bit bands
    * keep buckets tiny). For GUARANTEED recall at the configured
    * threshold, pass `numBands = maxHamming + 1` (Manku et al.'s
    * block-permutation bound, WWW'07): bands shrink to ~60/(h+1) bits,
    * buckets coarsen, and the candidate join pays for the guarantee —
    * the classic LSH trade, now a caller choice instead of a silent
    * default. The self-join is banded — never all-pairs — and the band
    * table is `numBands` rows per signature.
    * Input: (idCol, sigCol). Output: a, b, hamming.
    */
  def pHashPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 12, numBands: Int = 4): DataFrame = {
    require(numBands >= 2 && numBands <= 60,
      s"numBands must be in [2, 60], got $numBands")
    // Distribute the 60 bits over numBands contiguous bands, sizes as
    // equal as integers allow (rem bands get one extra bit).
    val base = 60 / numBands
    val rem = 60 % numBands
    val sizes = Array.tabulate(numBands)(b => if (b < rem) base + 1 else base)
    val offsets = sizes.scanLeft(0)(_ + _)
    val bands = sigs.select(col(idCol).as("__id"), col(sigCol).as("__s"))
      .select(col("__id"), col("__s"),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("__s"), offsets(b))
              .bitwiseAND(lit((1L << sizes(b)) - 1L))
              .as("v"))): _*)).as("__b"))
      .select(col("__id"), col("__s"), col("__b.band").as("band"),
        col("__b.v").as("v"))
    val x = bands.select(col("band"), col("v"), col("__id").as("a"),
      col("__s").as("sa"))
    val y = bands.select(col("band"), col("v"), col("__id").as("b"),
      col("__s").as("sb"))
    x.join(y, Seq("band", "v"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        expr("bit_count(sa ^ sb)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
