package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence of the native SqDistE8 expression with the HOF
  * formulation it replaced (q106 pair distance, Centroids.assign,
  * q111) — bit-for-bit, across float/double sides, including the
  * codegen path (32-row frames keep WholeStageCodegen engaged).
  */
class SqDistE8Spec extends SparkSpec {

  private def hofD2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor((x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double")) * lit(1e8)).cast("long")),
      lit(0L), (acc, z) => acc + z)

  test("float-float vectors: native == HOF (incl. negatives, zeros)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 64).map { i =>
      (i, Array.fill(384)(rnd.nextFloat() * 4f - 2f),
        Array.fill(384)(rnd.nextFloat() * 4f - 2f))
    } :+ ((65, Array.fill(384)(0f), Array.fill(384)(0f)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), SqDistE8(col("a"), col("b")).as("n"),
      hofD2(col("a"), col("b")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(got == 0L)
  }

  test("float vector vs double literal centroid: native == HOF") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cent = Array.fill(384)(rnd.nextDouble() * 2 - 1)
    val df = (1 to 64).map { i =>
      (i, Array.fill(384)(rnd.nextFloat() * 4f - 2f))
    }.toDF("id", "v")
    val hof = aggregate(
      zip_with(col("v"), lit(cent), (x, c) =>
        floor((x.cast("double") - c) * (x.cast("double") - c) * lit(1e8))
          .cast("long")),
      lit(0L), (acc, z) => acc + z)
    val bad = df.select(SqDistE8(col("v"), lit(cent)).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0L)
  }

  test("null and empty inputs") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Array(1f, 2f)), Some(Array(1f, 2f))),
      (2, None, Some(Array(1f, 2f))),
      (3, Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), SqDistE8(col("a"), col("b")).as("d"))
      .orderBy(col("id")).collect()
    assert(out(0).getLong(1) == 0L)
    assert(out(1).isNullAt(1))
    assert(out(2).getLong(1) == 0L)
  }
}
