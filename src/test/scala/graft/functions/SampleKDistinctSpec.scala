package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SampleKDistinct = the k smallest DISTINCT (hash, id) pairs per
  * group, with duplicates collapsing inside the bounded buffer: must
  * equal distinct-then-SampleK exactly for any partitioning and any
  * duplication factor, and a full buffer must be exactly the df > k-1
  * signal q97 reads it as.
  */
class SampleKDistinctSpec extends SparkSpec {
  import spark.implicits._

  // Group a: ids 1..10 each duplicated 3x. Group b: ids 1..3, once.
  private lazy val rows =
    (1 to 10).flatMap(i => Seq.fill(3)(("a", i.toLong))) ++
      (1 to 3).map(i => ("b", i.toLong))

  private def run(k: Int, parts: Int): Map[String, Seq[Long]] =
    rows.toDF("g", "id").repartition(parts)
      .groupBy(col("g"))
      .agg(SampleKDistinct(col("g"), col("id"), k).as("s"))
      .select(col("g"), expr("transform(s, x -> x.id)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("duplicates collapse: the buffer holds the distinct id set") {
    val got = run(k = 20, parts = 8)
    assert(got("a") == (1L to 10L))
    assert(got("b") == (1L to 3L))
  }

  test("full buffer = df exceeds k-1; non-full = exact df") {
    val got = run(k = 5, parts = 8)
    assert(got("a") == (1L to 5L)) // full: df(a)=10 > 4
    assert(got("b") == (1L to 3L)) // non-full: exact carrier set
  }

  test("partition-invariant, including the single-partition plan") {
    assert(run(7, 1) == run(7, 16))
  }

  test("matches distinct-then-SampleK exactly") {
    val viaDistinct = rows.toDF("g", "id").distinct()
      .groupBy(col("g"))
      .agg(SampleK(col("g"), col("id"), 6).as("s"))
      .select(col("g"), expr("transform(s, x -> x.id)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(6, 8) == viaDistinct)
  }
}
