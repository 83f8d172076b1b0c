package graft.operators

import graft.SparkSpec
import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._

/** q134 dedup-tier attribution semantics: the query is exercised
  * through its registered entry on crafted parquet (the tiers' own
  * operators are spec'd separately); here the point is the TIER
  * CONTRAST — what only the shift-robust tiers see — and the coverage
  * invariants.
  */
class DedupAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) = {
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("x"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CorpusQueries.q134(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
  }

  private def words(a: Int, b: Int) =
    (a to b).map(i => s"w$i").mkString(" ")

  test("misaligned boilerplate: grid blind, span sees it") {
    // 36-token run shared at offsets 0 and 1: every 12-token grid cell
    // differs, but 8-shingles align and CDC's content cuts align.
    val out = run(
      0L -> words(1, 36),
      1L -> ("pre " + words(1, 36)),
      2L -> words(101, 140))
    assert(out.contains(0L) && out.contains(1L) && !out.contains(2L))
    out.values.foreach { case (_, g, _, _, _) => assert(g == 0L) }
    out.values.foreach { case (_, _, _, s, _) => assert(s >= 29L) }
  }

  test("coverage invariants: max tier <= any <= min(n, sum of tiers)") {
    val out = run(
      0L -> (words(1, 24) + " " + words(201, 212)),
      1L -> (words(1, 24) + " tail7 tail8 tail9"),
      2L -> ("ofs " + words(1, 24)))
    out.foreach { case (id, (n, g, c, s, a)) =>
      assert(a >= Seq(g, c, s).max, s"doc $id")
      assert(a <= math.min(n, g + c + s), s"doc $id")
    }
    // the aligned 24-token prefix is grid-visible in docs 0 and 1
    assert(out(0L)._2 == 24L && out(1L)._2 == 24L)
    // ...but not in the shifted doc 2, where only CDC/span see it
    assert(out(2L)._2 == 0L && out(2L)._4 > 0L)
  }
}
