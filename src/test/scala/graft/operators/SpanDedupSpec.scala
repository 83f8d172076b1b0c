package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-level dedup semantics on crafted corpora (q98/q101's operator)
  * plus the adaptive-threshold and novelty operators (q99/q100). The
  * DuckDB oracle certifies engine agreement at each SF; these pin the
  * SEMANTICS on inputs where the expected answer is computed by hand.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // w1..w30 is a run shared verbatim by docs 0 and 1 at different
  // offsets; doc 2 is disjoint; doc 3 is too short for one shingle.
  private def run(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
  private lazy val corpus = Seq(
    (0L, run(1, 30) + " " + run(101, 120)),
    (1L, run(201, 210) + " " + run(1, 30)),
    (2L, run(301, 340)),
    (3L, "x y z"))
    .toDF("doc_id", "text")

  test("spans: the shared run is found once per doc, merged maximal") {
    val sp = SpanDedup.spans(corpus, "doc_id", "text", k = 8, minDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // doc 0: tokens 1..30 are the shared run (positions 1..30).
    // doc 1: the run sits after a 10-token prefix (positions 11..40).
    assert(sp.toSet == Set((0L, 1, 30), (1L, 11, 40)))
  }

  test("report: covered fraction is exact") {
    val rep = SpanDedup.report(corpus, "doc_id", "text", k = 8,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(rep(0L) == ((1L, 30L, 30.0 / 50)))
    assert(rep(1L) == ((1L, 30L, 30.0 / 40)))
    assert(!rep.contains(2L) && !rep.contains(3L))
  }

  test("stripSpans removes exactly the covered runs, keeps order") {
    val out = SpanDedup.stripSpans(corpus, "doc_id", "text", k = 8,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == ((run(101, 120), 30L)))
    assert(out(1L) == ((run(201, 210), 30L)))
    assert(out(2L) == ((run(301, 340), 0L))) // untouched doc verbatim
    assert(out(3L) == (("x y z", 0L)))
  }

  test("stripSpans emits an empty doc when fully covered") {
    val dup = Seq((0L, run(1, 12)), (1L, run(1, 12))).toDF("doc_id", "text")
    val out = SpanDedup.stripSpans(dup, "doc_id", "text", k = 8,
      minDocFreq = 2).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == (("", 12L)) && out(1L) == (("", 12L)))
  }

  test("spans merge adjacency but not a one-token gap") {
    // doc 0/1 share tokens 1..8 and 10..17 of doc 0 (gap at 9).
    val gap = Seq(
      (0L, run(1, 8) + " zzz " + run(10, 17)),
      (1L, run(1, 8) + " qqq " + run(10, 17)))
      .toDF("doc_id", "text")
    val sp = SpanDedup.spans(gap, "doc_id", "text", k = 8, minDocFreq = 2)
      .filter($"doc_id" === 0L)
      .collect().map(r => (r.getInt(2), r.getInt(3))).toSet
    assert(sp == Set((1, 8), (10, 17)))
  }

  test("adaptiveThreshold: exact P25 cutoff from the histogram") {
    // Group a: scores 1,2,3,4 once each -> rank ceil(4/4)=1 -> cutoff 1
    // (everything kept). Group b: 10 docs scored 1..10 -> rank 3,
    // cutoff 3, kept 8 of 10.
    val df = (Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)) ++
      (1L to 10L).map(i => ("b", i))).toDF("g", "s")
    val out = Curation.adaptiveThreshold(df, "g", col("s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a") == ((1L, 4L, 4L, 1.0)))
    assert(out("b") == ((3L, 10L, 8L, 0.8)))
  }

  test("ngramNovelty: first occurrence wins, later docs score lower") {
    val df = Seq(
      (0L, "a b c d e"),        // 3 trigrams, all novel
      (1L, "a b c d x"),        // shares "a b c"+"b c d" -> 1 of 3 novel
      (2L, "a b c d e"))        // exact dup of doc 0 -> 0 novel
      .toDF("doc_id", "text")
    val out = Curation.ngramNovelty(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((3L, 3L)))
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 0L)))
  }
}
