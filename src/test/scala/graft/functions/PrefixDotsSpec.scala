package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence of the native PrefixDots ladder with the per-slice HOF
  * folds it replaces (q152's truncation audit) — bit-for-bit, since a
  * shorter prefix's index-order fold is literally a prefix of the
  * longer one's.
  */
class PrefixDotsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, d: Int) =
    aggregate(
      zip_with(slice(a, 1, d), slice(b, 1, d),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, z) => acc + z)

  test("ladder equals the per-slice HOF folds, bit-for-bit") {
    import spark.implicits._
    val bounds = Seq(8, 16, 32, 64)
    val rnd = new scala.util.Random(42)
    val df = (1 to 64).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 4f - 2f),
        Array.fill(64)(rnd.nextFloat() * 4f - 2f))
    }.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        PrefixDots(col("a"), col("b"), bounds).as("pd"),
        array(bounds.map(d => hofDot(col("a"), col("b"), d)): _*).as("hf"))
      .filter(col("pd") =!= col("hf")).count()
    assert(bad == 0L)
  }

  test("self-dots give the norm ladder; bounds past the length report " +
      "the full prefix") {
    import spark.implicits._
    val df = Seq((1, Array(3f, 4f))).toDF("id", "v")
    val got = df.select(
        PrefixDots(col("v"), col("v"), Seq(1, 2, 8)).as("pd"))
      .head().getSeq[Double](0)
    assert(got == Seq(9.0, 25.0, 25.0))
  }

  test("strictly-increasing bounds are enforced") {
    intercept[IllegalArgumentException] {
      PrefixDots(col("a"), col("b"), Seq(4, 4, 8))
    }
    intercept[IllegalArgumentException] {
      PrefixDots(col("a"), col("b"), Seq.empty)
    }
  }
}
