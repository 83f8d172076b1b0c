package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries guarantees, exercised distributed (map-side partials merge
  * across 8 partitions): every term with true frequency > n/k survives
  * the sketch, estimates undercount by at most n/k, and memory never
  * exceeds k counters per buffer.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Skewed corpus: hot1 ×3000, hot2 ×1000, warm ×150, 6000 unique singles.
  private lazy val terms =
    (Seq.fill(3000)("hot1") ++ Seq.fill(1000)("hot2") ++
      Seq.fill(150)("warm") ++ (1 to 6000).map(i => s"u$i"))
  private lazy val df = terms.toDF("term").repartition(8)
  private lazy val n = terms.length.toLong // 10150

  private def sketch(k: Int): Map[String, Long] =
    df.agg(MisraGries(col("term"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every term with freq > n/k is in the sketch, error <= n/k") {
    val k = 16
    val s = sketch(k)
    assert(s.size <= k)
    // hot1 (3000) and hot2 (1000) are > n/16 = 634 — must be present.
    assert(s.contains("hot1") && s.contains("hot2"), s)
    // Estimates undercount by at most n/k.
    assert(s("hot1") <= 3000 && s("hot1") >= 3000 - n / k, s("hot1"))
    assert(s("hot2") <= 1000 && s("hot2") >= 1000 - n / k, s("hot2"))
  }

  test("two-pass sketch + exact recount equals the exact heavy-hitter set") {
    val thresh = n / 100.0 // 101.5 — hot1, hot2, warm qualify
    val cand = df.agg(MisraGries(col("term"), 400).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term").as("term"))
    val twoPass = df.join(cand, Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= thresh)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= thresh)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPass == exact)
    assert(exact == Map("hot1" -> 3000L, "hot2" -> 1000L, "warm" -> 150L))
  }

  test("sketch output is sorted by estimate desc, then term") {
    val rows = df.agg(MisraGries(col("term"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.est")).collect().map(_.getLong(0)).toSeq
    assert(rows == rows.sorted.reverse)
  }
}
