package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental snapshot-vs-arrivals dedup verdicts on handcrafted cases:
  * exact ties to the smallest snapshot id, near-dup catches an edited
  * copy, disjoint text is 'new', and a shingle-less (too short) arrival
  * can still be exact but never near.
  */
class SnapshotDedupSpec extends SparkSpec {
  import spark.implicits._

  private val longA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  // One token changed near the end: most shingles shared -> near-dup.
  private val longAEdit = longA.replace("upsilon", "psi")

  private lazy val snapshot = Seq(
    (10L, longA),
    (11L, longA), // duplicate inside the snapshot: min id 10 must win
    (12L, "the quick brown fox jumps over the lazy dog again and again"),
    (13L, "hi")
  ).toDF("doc_id", "text")

  private lazy val arrivals = Seq(
    (20L, longA),          // exact (matches 10, not 11)
    (21L, longAEdit),      // near
    (22L, "completely different words entirely unrelated content here"),
    (23L, "hi"),           // exact vs 13, despite having no 3-shingles
    (24L, "yo")            // too short, no match -> new
  ).toDF("doc_id", "text")

  private lazy val verdicts =
    Dedup.snapshotDedup(snapshot, arrivals, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))).toMap

  test("exact duplicate matches the smallest snapshot id") {
    assert(verdicts(20L) == (("exact", 10L)))
  }

  test("edited copy is a near-dup of its source") {
    assert(verdicts(21L) == (("near", 10L)))
  }

  test("disjoint text is new") {
    assert(verdicts(22L) == (("new", null)))
  }

  test("a shingle-less arrival can be exact but never near") {
    assert(verdicts(23L) == (("exact", 13L)))
    assert(verdicts(24L) == (("new", null)))
  }

  test("verdicts are partition-invariant") {
    def run(parts: Int) =
      Dedup.snapshotDedup(snapshot.repartition(parts),
          arrivals.repartition(parts), "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(run(1) == run(16))
  }

  test("works when the id column is literally named 'id'") {
    // r9 regression guard: the near-side join used an unanchored
    // col("id") that was ambiguous for idCol = "id" callers.
    val got = Dedup.snapshotDedup(
        snapshot.withColumnRenamed("doc_id", "id"),
        arrivals.withColumnRenamed("doc_id", "id"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(20L) == "exact" && got(21L) == "near" && got(22L) == "new")
  }

  test("negative ids survive the parity tagging (near tier included)") {
    // r9 regression guard: a sign-keeping `% 2` filter silently dropped
    // negative arrival ids from the signature table (verdict flipped to
    // 'new'); pmod + (cid - pmod) div 2 decode handles both signs.
    val snapNeg = Seq((-10L, longA)).toDF("doc_id", "text")
    val arrNeg = Seq((-20L, longA), (-21L, longAEdit), (-22L, "other "
      + "completely different unrelated words here now")).toDF("doc_id", "text")
    val got = Dedup.snapshotDedup(snapNeg, arrNeg, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(got(-20L) == (("exact", -10L)))
    assert(got(-21L) == (("near", -10L)))
    assert(got(-22L)._1 == "new")
  }

  test("full-range 64-bit ids survive the one-pass signature build") {
    // r10 regression guard: the r9 parity composite `(id*2, id*2+1)`
    // overflowed Long for |id| >= 2^62 (ANSI mode throws; non-ANSI
    // silently decodes a wrong id). The side tag is now carried
    // out-of-band in a struct id, so any long is legal.
    val big = Long.MaxValue - 1L
    val snapBig = Seq((big, longA)).toDF("doc_id", "text")
    val arrBig = Seq((Long.MinValue, longA), (Long.MinValue + 1L, longAEdit))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDedup(snapBig, arrBig, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(got(Long.MinValue) == (("exact", big)))
    assert(got(Long.MinValue + 1L) == (("near", big)))
  }

  test("rejects a non-integral id column") {
    val err = intercept[IllegalArgumentException] {
      Dedup.snapshotDedup(
        snapshot.withColumn("doc_id", col("doc_id").cast("string")),
        arrivals.withColumn("doc_id", col("doc_id").cast("string")),
        "doc_id", "text")
    }
    assert(err.getMessage.contains("integral"))
  }
}
