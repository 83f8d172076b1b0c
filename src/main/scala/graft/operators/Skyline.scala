package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) selection — "give me every document no
  * other document beats on ALL quality axes at once": the multi-
  * criteria data-selection primitive that replaces ad-hoc weighted
  * scores (q92's linear head picks ONE tradeoff; the skyline returns
  * the whole undominated tradeoff surface for a curator — or a
  * downstream mixer — to sample along).
  *
  * Semantics: with all metrics maximized, point `a` is DOMINATED iff
  * some point `b` has `b_i ≥ a_i` on every metric and `b_i > a_i` on at
  * least one. The frontier is every undominated point. Duplicated
  * metric vectors never dominate each other (no strict coordinate), so
  * ties all survive — deterministic without an id tie-break.
  *
  * Scale shape (the classic two-phase distributed skyline, Börzsönyi's
  * block-nested-loop run per partition):
  *  1. LOCAL skyline per partition via `mapPartitions` — memory is
  *     bounded by the partition's own frontier (not the partition), and
  *     every pruned point keeps a surviving dominator in-partition, so
  *     by transitivity pruning is lossless.
  *  2. GLOBAL skyline over the union of local frontiers: a broadcast
  *     LEFT ANTI self-join on the dominance predicate (array algebra —
  *     `forall`/`exists` over `zip_with`). Candidates ≪ corpus for any
  *     correlated metric set; the anti-join is exact, and dominance
  *     transitivity guarantees frontier(candidates) == frontier(all).
  *
  * The operator never collects to the driver and never shuffles the
  * corpus — only the candidate set (frontier-sized) crosses the wire.
  * Caveat for adversarially ANTI-correlated metrics: the frontier
  * itself can approach |corpus|; that is a property of the question,
  * not the plan (no algorithm returns a small answer then).
  *
  * Metrics must be non-null integral columns; encode "minimize" by
  * negating the column and "float" metrics by e4 fixed-point
  * quantization (SURVEY §5.4 — also what makes the oracle exact).
  */
object Skyline {

  /** The frontier of `df` over `metricCols` (all maximized, all
    * non-null, cast to long). Output: `idCol` + `metricCols`, one row
    * per undominated input row.
    */
  def frontier(df: DataFrame, idCol: String, metricCols: Seq[String])
      : DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val n = metricCols.length
    require(n >= 2, s"skyline needs >= 2 metrics, got $metricCols")

    def dominates(a: Array[Long], b: Array[Long]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (i < n && ge) {
        if (a(i) < b(i)) ge = false
        else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    // Block-nested-loop local skyline: the window holds only the
    // partition's current frontier; each arrival either dies against
    // it, or enters and evicts what it dominates.
    def localSkyline(it: Iterator[(Long, Array[Long])])
        : Iterator[(Long, Array[Long])] = {
      val win = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]()
      it.foreach { p =>
        var dead = false
        var i = 0
        while (i < win.length && !dead) {
          if (dominates(win(i)._2, p._2)) dead = true
          i += 1
        }
        if (!dead) {
          var j = 0
          while (j < win.length) {
            if (dominates(p._2, win(j)._2)) win.remove(j) else j += 1
          }
          win += p
        }
      }
      win.iterator
    }

    val pts = graft.SparkUtil.ensureParallelism(
        df.select(col(idCol).cast("long") +:
          metricCols.map(c => col(c).cast("long")): _*))
      .map(r => (r.getLong(0), Array.tabulate(n)(i => r.getLong(i + 1))))
    // Candidates are frontier-sized: materialize once (two consumers —
    // both sides of the anti-join).
    val cand = pts.mapPartitions(localSkyline _).toDF("__id", "__m")
      .localCheckpoint(true)

    val domPred: Column =
      forall(zip_with(col("__bm"), col("__am"), (x, y) => x >= y),
        b => b) &&
        exists(zip_with(col("__bm"), col("__am"), (x, y) => x > y),
          b => b)
    val a = cand.select(col("__id"), col("__m").as("__am"))
    val b = cand.select(col("__m").as("__bm"))
    a.join(broadcast(b), domPred, "left_anti")
      .select(col("__id").as(idCol) +:
        metricCols.zipWithIndex.map { case (c, i) =>
          element_at(col("__am"), i + 1).as(c)
        }: _*)
  }
}
