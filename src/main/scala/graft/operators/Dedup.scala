package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text pipelines (north-star
  * surface; no counterpart in the reference, which ingests 30 documents —
  * SURVEY.md §2.9).
  *
  * All signature math is built on `md5` so every step is reproducible in
  * ANSI SQL — the DuckDB oracle can replay MinHash signatures, LSH bands,
  * SimHash bits and winnowed fingerprints exactly (hash-match correctness,
  * not just row counts). Everything is expression-level (no UDFs): the whole
  * chain stays inside WholeStageCodegen.
  *
  * Scale design (100 TB): shingling explodes ~L rows per document but is
  * map-side only; signatures reduce back to one row per document via
  * map-side partial min-aggregation; LSH candidate generation joins on
  * (band, band_hash) — the classic way to avoid the quadratic all-pairs
  * compare. The only quadratic step left is verification *within* a bucket,
  * which banding keeps small; skewed buckets (e.g. boilerplate) can be
  * salted or capped.
  */
object Dedup {

  /** Exact duplicate removal: first row per normalized text wins.
    * `dropDuplicates` on a normalization column; at scale this is one
    * hash-shuffle on the md5 of the text (shuffle compares 16 bytes/row,
    * not whole documents).
    */
  def exact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__h", md5(lower(col(textCol))))
      .dropDuplicates("__h")
      .drop("__h")

  /** Word n-gram shingle hashes per document index: (id, pos, h). Documents
    * shorter than n tokens produce no shingles.
    */
  private def shingleHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val idxs = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"),
      posexplode(transform(idxs,
        i => concat_ws(" ", (0 until n).map(j => toks(i + lit(j))): _*)))
        .as(Seq("pos", "shingle")))
  }

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    shingleHashes(df, idCol, textCol, n)
      .select(col("id"), col("shingle")).distinct()

  /** MinHash signature: k independent permutations simulated by seeded
    * md5; signature element j = lexicographic min of `md5(j:shingle)`.
    * One row per id with `sig` array<string> of length k.
    */
  def minhashSignatures(sh: DataFrame, k: Int = 16): DataFrame =
    sh.groupBy(col("id"))
      .agg(array((0 until k).map(j =>
        min(md5(concat(lit(j.toString), lit(":"), col("shingle"))))): _*)
        .as("sig"))

  /** LSH banding: split the k-length signature into `bands` bands of
    * `rowsPerBand`, hash each band, emit (id, band, band_hash). Documents
    * sharing any (band, band_hash) are candidate near-duplicates.
    */
  def lshBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("id"), posexplode(array((0 until bands).map(b =>
        md5(concat_ws("|", (0 until rowsPerBand).map(r =>
          col("sig")(b * rowsPerBand + r)): _*))): _*))
        .as(Seq("band", "band_hash")))

  /** Candidate pairs (a < b) from shared LSH buckets, deduplicated. */
  def lshCandidatePairs(buckets: DataFrame): DataFrame =
    buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()

  /** 60-bit SimHash from md5 of tokens (with multiplicity): bit j of the
    * signature is set iff the sum over tokens of ±1 (token hash bit j) is
    * positive. 60 bits = 15 hex chars keeps the value in a signed long for
    * both engines.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 60): DataFrame = {
    val tokHash = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    val toks = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col("id"), tokHash.as("h"))
    val withBits = toks.select(col("id"),
      explode(sequence(lit(0), lit(bits - 1))).as("j"), col("h"))
      .select(col("id"), col("j"),
        when(expr("(h >> j) & 1") === 1, 1).otherwise(-1).as("contrib"))
    withBits.groupBy(col("id"), col("j"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(0L)).as("simhash"))
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowed document fingerprints (MOSS-style): rolling window of `w`
    * consecutive shingle hashes keeps the minimum; the distinct kept hashes
    * are the document's fingerprints. Cheap containment/near-dup sketch.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, n)
      .select(col("id"), col("pos"), md5(col("shingle")).as("h"))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    sh.select(col("id"), min(col("h")).over(win).as("fp"))
      .groupBy(col("id"))
      .agg(countDistinct(col("fp")).as("n_fp"))
  }
}
