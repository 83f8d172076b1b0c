package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style statistics pass that feeds size
  * estimation, partition planning, and data-quality monitoring. One
  * aggregation job computes every column's stats together (count,
  * nulls, exact distincts, min/max as strings for type-uniform output);
  * the per-column rows are then unpivoted driver-side from the single
  * result row, so profiling cost is one scan regardless of column count.
  *
  * Exact `countDistinct` here is deliberate (oracle-checkable); swap in
  * `approx_count_distinct` (HLL++, one pass, mergeable sketches) when
  * profiling at 100 TB — the HLL accuracy envelope is pinned in
  * SketchesSpec.
  */
object Stats {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs: _*).head()
    val totalCnt = row.getAs[Long]("__total")
    cols.map { c =>
      (c, totalCnt - row.getAs[Long](s"__cnt_$c"),
        row.getAs[Long](s"__ndv_$c"),
        row.getAs[String](s"__min_$c"),
        row.getAs[String](s"__max_$c"))
    }.toDF("column", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** The 100 TB profiling tier: identical shape to [[profile]] but
    * distinct counts come from HLL++ sketches (`approx_count_distinct`,
    * relative sd `rsd`). Exact `countDistinct` re-shuffles every column's
    * full value set; the HLL sketch is a fixed few-KB buffer per column,
    * merged map-side, so the whole profile stays ONE scan + one tiny
    * final merge regardless of cardinality. Not oracle-replayable
    * (sketch internals are Spark's); SketchesSpec pins the accuracy
    * envelope against [[profile]].
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profileApprox needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        approx_count_distinct(col(c), rsd).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*).head()
    val totalCnt = row.getAs[Long]("__total")
    cols.map { c =>
      (c, totalCnt - row.getAs[Long](s"__cnt_$c"),
        row.getAs[Long](s"__ndv_$c"),
        row.getAs[String](s"__min_$c"),
        row.getAs[String](s"__max_$c"))
    }.toDF("column", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** Key-skew diagnostic: per-key row counts for the `topK` heaviest
    * keys, each with its corpus share and a cumulative share — the
    * operator you run BEFORE choosing a partitioning/salting strategy
    * for a 100 TB join (a key with share ≫ 1/numPartitions is the skew
    * that `SkewJoin.salted` exists for). One map-side-combined
    * aggregation + a top-K take; exact and oracle-checkable.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .withColumn("share", round(col("cnt") / lit(total.toDouble), 6))
      .withColumn("cum_share", round(
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          / lit(total.toDouble), 6))
  }
}
