package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed per-group rank/cumulation — the documented "distributed-
  * rank swap" for the rank-window statistics (q211 Spearman, q250
  * Mann-Whitney).
  *
  * The keyed window `sum(w) OVER (PARTITION BY g ORDER BY o ROWS
  * UNBOUNDED PRECEDING)` is the right plan while every group fits one
  * task: parallelism = |groups|, per-task state = the group's rows.
  * Past that (one source holding most of a 100 TB corpus; a value-
  * distinct table with billions of rows per pair) the window serializes
  * a whole group onto one core. [[groupedPrefixSum]] keeps ONE code
  * path for both regimes:
  *
  *   - **bounded fast path**: when `max rows per group ≤ windowBudget`
  *     (ONE partial-aggregable count pass over just the group column —
  *     column pruning keeps it cheap), emit the keyed window exactly as
  *     before;
  *   - **distributed fallback** (automatic, same rows): range-partition
  *     by (group, order...), sort within partitions, then the two-pass
  *     prefix shape shared with [[Packing.prefixSums]] /
  *     [[graft.operators.Stats]]' rank-join — pass one computes each
  *     (partition, group) run's weight total (a bounded O(partitions +
  *     groups) collect: groups are contiguous under the range sort),
  *     pass two streams each partition adding its broadcast offset.
  *     No group ever lands on one core; the only driver state is the
  *     run-length table.
  *
  * The fallback requires (group, orderCols...) to be a TOTAL order for
  * deterministic output — the same requirement the window form already
  * had, so callers pass a tiebreak column. Both paths return the input
  * columns plus `outCol` = the EXCLUSIVE running sum of `weightCol`
  * (sum over rows strictly before, 0 for a group's first row):
  * row_number = exclusive-count + 1; a tie run's start offset = the
  * exclusive sum of counts. RanksSpec pins fast == fallback equality
  * and drives q211/q250 past the budget.
  */
object Ranks {

  /** Max rows a single group may hold before the keyed window is
    * swapped for the distributed two-pass prefix. The default keeps
    * the window while a group fits comfortably in one task (~4M rows
    * × ~32B of rank state well under executor memory) — far above the
    * per-source/per-pair cardinality at the test SFs, so the bench
    * plan is unchanged; a spec (and a 100× corpus) crosses it.
    */
  val DefaultWindowBudget: Long = 4L * 1000 * 1000

  /** One ranked/cumulated column: (order columns, weight column, output
    * column). Several specs over the same frame share ONE budget
    * trigger through [[groupedPrefixSums]] — q211 ranks by two
    * different orders but must not pay two trigger aggregates.
    */
  final case class PrefixSpec(orderCols: Seq[String], weightCol: String,
      outCol: String)

  def groupedPrefixSum(df: DataFrame, groupCol: String,
      orderCols: Seq[String], weightCol: String, outCol: String,
      windowBudget: Long = DefaultWindowBudget,
      knownMaxPerGroup: Option[Long] = None): DataFrame =
    groupedPrefixSums(df, groupCol,
      Seq(PrefixSpec(orderCols, weightCol, outCol)), windowBudget,
      knownMaxPerGroup)

  /** Session-scoped trigger memo: (canonicalized-plan hash, group col) →
    * measured max-rows-per-group. The trigger aggregate runs EAGERLY at
    * plan-construction time, so without the memo every re-construction
    * of the same query (bench reps, a REPL re-run) re-pays a full
    * scan+aggregate even when the result is never consumed. Keyed by
    * the ANALYZED plan's semantic hash: a re-read of a mutated path
    * builds a new FileIndex and thus a new hash, so staleness is
    * bounded to literally-identical plans within one session — and a
    * stale hit can only mis-pick the path, never change the rows (the
    * two paths are rowwise-equal by RanksSpec). Bounded size: evicts
    * oldest beyond 256 entries.
    */
  // Value type MUST be the boxed java.lang.Long: with a Scala Long the
  // compiler unboxes get()'s null-on-miss to 0L, the null check below
  // becomes vacuously true, and every call would "hit" a memoized max
  // of 0 — silently pinning the window path forever.
  private val triggerMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(Int, String), java.lang.Long](
          64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Int, String), java.lang.Long]): Boolean =
          size() > 256
      })

  def groupedPrefixSums(df: DataFrame, groupCol: String,
      specs: Seq[PrefixSpec],
      windowBudget: Long = DefaultWindowBudget,
      knownMaxPerGroup: Option[Long] = None): DataFrame = {
    require(specs.nonEmpty && specs.forall(_.orderCols.nonEmpty),
      "groupedPrefixSums needs at least one spec with an order")
    // Validate the WHOLE contract at the entry point, not inside the
    // fallback: a caller must never pass every small-scale test on the
    // window path and then die (or silently change semantics) the
    // first time a group crosses the budget in production.
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"groupedPrefixSums groups on a STRING column; '$groupCol' is " +
        s"${df.schema(groupCol).dataType.simpleString} — cast it first")
    specs.foreach { sp =>
      require(!df.columns.contains(sp.outCol),
        s"output column '${sp.outCol}' already exists in the input")
      val wt = df.schema(sp.weightCol).dataType
      require(Seq(org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.ByteType).contains(wt),
        s"weight column '${sp.weightCol}' must be integral (got " +
          s"${wt.simpleString}): both paths sum in LONG, and a " +
          "fractional weight would silently truncate in the " +
          "distributed path only")
    }
    // The ONE trigger: max rows per group, over just the group column —
    // column pruning keeps the pass cheap whatever else the input
    // computes, and every spec shares the decision. A caller who KNOWS
    // a bound (e.g. an upstream limit or a grouping invariant) passes
    // it and skips the aggregate entirely — the bound's truth is the
    // caller's contract; a lie only risks the window path on an
    // oversized group, never wrong rows.
    val maxPerGroup = knownMaxPerGroup.getOrElse {
      val memoKey = (df.queryExecution.analyzed.semanticHash(), groupCol)
      val hit = triggerMemo.get(memoKey)
      if (hit != null) hit.longValue()
      else {
        val measured = df.select(col(groupCol))
          .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
          .agg(max(col("__n"))).head() match {
            case r if r.isNullAt(0) => 0L
            case r => r.getLong(0)
          }
        triggerMemo.put(memoKey, java.lang.Long.valueOf(measured))
        measured
      }
    }
    if (maxPerGroup <= windowBudget)
      specs.foldLeft(df) { (acc, sp) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(sp.orderCols.map(col): _*)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        acc.withColumn(sp.outCol,
          coalesce(sum(col(sp.weightCol).cast("long")).over(w), lit(0L)))
      }
    else
      specs.foldLeft(df) { (acc, sp) =>
        distributedPrefixSum(acc, groupCol, sp.orderCols, sp.weightCol,
          sp.outCol)
      }
  }

  /** The fallback, callable directly (RanksSpec equality-checks it
    * against the window on small data).
    */
  private[graft] def distributedPrefixSum(df: DataFrame, groupCol: String,
      orderCols: Seq[String], weightCol: String,
      outCol: String): DataFrame = {
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"distributedPrefixSum groups on a STRING column; '$groupCol' is " +
        s"${df.schema(groupCol).dataType.simpleString} — cast it first " +
        "(the run-length offsets key on the group's string value)")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val keyCols: Seq[Column] = (groupCol +: orderCols).map(col)
    // Collision-proof staging name: a caller's own "__w" column must
    // survive into the output exactly as the window path keeps it.
    val wTmp = Iterator.from(0).map(i => s"__graft_w$i")
      .find(n => !df.columns.contains(n)).get
    // Eager checkpoint: both passes must see the identical range
    // partitioning (the Packing.prefixSums discipline; durable opt-in
    // via SparkUtil.stableCheckpoint's reliable mode).
    val sorted = graft.SparkUtil.stableCheckpoint(
      df.withColumn(wTmp, col(weightCol).cast("long"))
        .repartitionByRange(parts, keyCols: _*)
        .sortWithinPartitions(keyCols: _*))
    val schema = sorted.schema
    val gi = schema.fieldIndex(groupCol)
    val wi = schema.fieldIndex(wTmp)
    // Pass 1: per-(partition, group-run) weight totals. Groups are
    // contiguous under the range sort, so this is a run-length pass and
    // the collect is O(partitions + groups) rows, not partitions×groups.
    val runTotals: Array[(Int, String, Long)] = sorted.queryExecution
      .toRdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[String, Long]
        it.foreach { ir =>
          val g = if (ir.isNullAt(gi)) null
            else ir.getString(gi)
          acc(g) = acc.getOrElse(g, 0L) +
            (if (ir.isNullAt(wi)) 0L else ir.getLong(wi))
        }
        acc.iterator.map { case (g, s) => (pid, g, s) }
      }.collect()
    // offset(pid, g) = Σ of g's totals in EARLIER partitions (range
    // partitioning splits a large group across adjacent partitions).
    val offsets: Map[(Int, String), Long] = {
      val byGroup = runTotals.groupBy(_._2)
      byGroup.iterator.flatMap { case (g, runs) =>
        val sorted = runs.sortBy(_._1)
        sorted.map(_._1).zip(
          sorted.map(_._3).scanLeft(0L)(_ + _)).map { case (pid, off) =>
          (pid, g) -> off
        }
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(
      schema.filterNot(_.name == wTmp) :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val keep = schema.fields.zipWithIndex
      .filterNot(_._1.name == wTmp).map(_._2)
    // Pass 2: stream each partition, running total seeded per group
    // from the broadcast offsets; emit the row + its EXCLUSIVE sum.
    val rows = sorted.queryExecution.toRdd.mapPartitionsWithIndex {
      (pid, it) =>
        val off = bc.value
        var curG: String = null
        var started = false
        var running = 0L
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(schema)
        it.map { ir =>
          val g = if (ir.isNullAt(gi)) null else ir.getString(gi)
          if (!started || g != curG) {
            started = true; curG = g
            running = off.getOrElse((pid, g), 0L)
          }
          val w = if (ir.isNullAt(wi)) 0L else ir.getLong(wi)
          val before = running
          running += w
          val full = conv(ir.copy()).asInstanceOf[Row]
          Row.fromSeq(keep.toSeq.map(full.get) :+ before)
        }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
