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
}
