package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) plus a long tail
  private lazy val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "bv")
  private lazy val other = (Seq(("hot", 1.0), ("hot", 2.0)) ++
    (1 to 50).map(i => (s"k$i", i * 1.0))).toDF("k", "ov")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(other, Seq("k")).select("k", "bv", "ov")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    val salted = SkewJoin.inner(big, other, Seq("k"), g = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 1800) // 900 x 2 matches survived
  }

  test("the hot key's rows spread across all g salt blocks") {
    val g = 8
    val salts = big.filter(col("k") === "hot")
      .withColumn("__salt",
        pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*),
          spark_partition_id(), monotonically_increasing_id()), lit(g)))
      .groupBy("__salt").count().collect().map(r => r.getLong(1))
    assert(salts.length == g, s"expected $g blocks, got ${salts.length}")
    // hash spread: no block holds more than 2x its share
    assert(salts.max <= 2 * 900 / g, s"unbalanced blocks: ${salts.toSeq}")
  }

  test("byte-identical duplicate rows still spread (and join exactly)") {
    val dupBig = (1 to 800).map(_ => ("hot", 1L)).toDF("k", "bv")
    val out = SkewJoin.inner(dupBig, other, Seq("k"), g = 8)
    assert(out.count() == 1600) // 800 x 2 hot matches, duplicates kept
    val salts = dupBig
      .withColumn("__salt",
        pmod(xxhash64(struct(dupBig.columns.map(col).toIndexedSeq: _*),
          spark_partition_id(), monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "identical rows collapsed into one salt block")
  }

  test("colliding internal or non-key column names are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.inner(big.withColumn("__salt", lit(1)), other, Seq("k"), 2)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.inner(big, other.withColumnRenamed("ov", "bv"), Seq("k"), 2)
    }
  }

  test("g = 1 degenerates to the plain join") {
    assert(SkewJoin.inner(big, other, Seq("k"), 1).count() ==
      big.join(other, Seq("k")).count())
  }
}
