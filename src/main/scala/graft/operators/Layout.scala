package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan efficiency at scale.
  *
  * Z-ordering clusters rows so that ALL clustering columns are
  * simultaneously "almost sorted": files/row-groups then carry tight
  * min/max ranges on every clustered column, and engines that prune on
  * footer statistics (Spark parquet row-group skipping, any lakehouse
  * file index) skip most of the data for selective predicates on ANY of
  * the columns — not just the leading sort key, which is all a plain
  * lexicographic sort can serve.
  */
object Layout {

  /** Morton (Z-order) key: interleaves the low `bits` bits of each
    * column — pure expression algebra (shift/and/or), codegen'd, no UDF.
    *
    * Inputs must be non-negative integers that fit in `bits` bits; map
    * arbitrary domains onto that range first (rank, range-bucket, or
    * truncate). `bits * cols.length` must be ≤ 63 so the key fits a long.
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits * cols.length <= 63,
      s"zorder key would need ${bits * cols.length} bits; max 63")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      // A negative value would sign-extend to the all-ones key and
      // silently destroy locality; fail the row loudly instead.
      shiftright(when(c.cast("long") >= 0, c.cast("long"))
        .otherwise(raise_error(concat(
          lit("zorderKey: negative input "), c.cast("string")))), j)
        .bitwiseAND(lit(1L)),
      j * cols.length + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into Z-order: range-partition on the Morton key (so
    * partitions hold contiguous key ranges → tight per-file stats), sort
    * within partitions, drop the key. This is the write-side half; the
    * read-side payoff is footer-stats pruning, which needs no code here.
    */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__zkey", zorderKey(cols.map(col), bits))
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    keyed.repartitionByRange(parts, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}
