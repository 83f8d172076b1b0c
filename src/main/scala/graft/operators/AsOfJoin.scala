package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join: each left row is matched to the
  * LATEST right row with the same key whose timestamp is `<=` the left
  * row's — the standard time-series enrichment (trade→quote, event→last
  * dimension version) that plain equi/range joins can't express without a
  * per-left-row aggregation.
  *
  * Scale design: implemented as union + one window pass, NOT as a range
  * join. A range-join formulation (`l.ts >= r.ts` then per-left max) is
  * quadratic in rows-per-key and shuffles the cross product; the union
  * plan shuffles each input exactly once on the key, sorts within
  * partitions, and carries O(1) running state per key (`last(..,
  * ignoreNulls)` over an unbounded-preceding frame) — the same shape
  * Structured Streaming would use for a stream-side as-of, so it holds at
  * 100 TB with keys spread across executors.
  *
  * Determinism: ties are broken lexicographically on `(ts, side, right
  * payload)` — a right row at exactly the left row's timestamp IS visible
  * (side orders right before left), and equal-timestamp right rows pick
  * the greatest payload struct, which is stable across partitionings.
  */
object AsOfJoin {

  /** Join `left` to the latest matching `right` row per key.
    *
    * @param payload   right columns to carry onto matched left rows (must
    *                  not collide with left column names)
    * @param toleranceMs  max lookback: matches older than this many ms
    *                  before the left timestamp are dropped (→ nulls)
    * @return left columns + payload columns (null where no match)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns collide with left columns: " +
        payload.intersect(leftCols).mkString(", "))

    val rStruct = struct(col(tsCol).as("__rts") +: payload.map(col): _*)
    // A right row with no timestamp can never be "at or before" anything
    // (SQL comparison semantics); unfiltered it would sort nulls-first and
    // become a universal match.
    val r = right.filter(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        rStruct.as("__r")): _*)
    val l = left.withColumn("__l", struct(leftCols.map(col): _*))
      .select(keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r"), col("__l")): _*)
    val u = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .unionByName(l)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inTolerance = toleranceMs match {
      case Some(ms) => col("__m").isNotNull &&
        unix_micros(col("__ts")) - unix_micros(col("__m.__rts")) <= ms * 1000L
      case None => col("__m").isNotNull
    }
    val outPayload = payload.map(p =>
      when(inTolerance, col(s"__m.$p")).otherwise(lit(null)).as(p))
    matched.select(col("__l.*") +: outPayload: _*)
  }
}
