package graft.operators

import graft.SparkSpec

/** k-anonymity lattice-walk semantics (q129's operator) on corpora
  * where the generalization outcome is known by hand: which cells
  * release as-is, which fold per-level, and when the remainder is
  * suppressed. Conservation (every record lands in exactly one released
  * or suppressed group) is the safety property.
  */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (String, String, Int)*) =
    rows.flatMap { case (l, s, n) => Seq.fill(n)((l, s)) }
      .zipWithIndex.map { case ((l, s), i) => (i.toLong, l, s) }
      .toDF("doc_id", "lang", "source")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    Curation.kAnonymize(df, "lang", "source", k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSet

  test("cells at or above k release unchanged; small cells fold by lang") {
    // en cells: (a=5 ok), (b=2, c=3 -> fold to en,* = 5 ok)
    // de cells: (a=1, b=1 -> fold to de,* = 2 < 5 -> suppressed pool)
    val df = corpus(("en", "a", 5), ("en", "b", 2), ("en", "c", 3),
      ("de", "a", 1), ("de", "b", 1))
    assert(run(df, 5) == Set(
      ("en", "a", 0, 5L), ("en", "*", 1, 5L), ("*", "*", 3, 2L)))
  }

  test("fully generalized remainder releases at level 2 when >= k") {
    // three langs, each with a 2-doc cell: per-lang folds stay under k,
    // but the pooled remainder (6) clears k=5.
    val df = corpus(("en", "a", 2), ("de", "a", 2), ("fr", "a", 2))
    assert(run(df, 5) == Set(("*", "*", 2, 6L)))
  }

  test("no remainder row when everything releases earlier") {
    val df = corpus(("en", "a", 7), ("de", "b", 6))
    assert(run(df, 5) == Set(("en", "a", 0, 7L), ("de", "b", 0, 6L)))
  }

  test("records are conserved across every level") {
    val df = corpus(("en", "a", 9), ("en", "b", 1), ("de", "a", 4),
      ("de", "b", 3), ("fr", "a", 1), ("zh", "a", 2))
    val out = run(df, 5)
    assert(out.toSeq.map(_._4).sum == 20L)
    // levels present: en,a releases; de folds to (de,*)=7; en-b + fr + zh
    // pool to 4 < 5 -> suppressed
    assert(out == Set(("en", "a", 0, 9L), ("de", "*", 1, 7L),
      ("*", "*", 3, 4L)))
  }
}
