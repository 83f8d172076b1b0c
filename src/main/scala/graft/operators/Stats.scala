package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style statistics pass that feeds size
  * estimation, partition planning, and data-quality monitoring. One
  * narrow aggregation computes every column's base stats together
  * (count, nulls, min/max as strings for type-uniform output) and a
  * second stacked pipeline computes every column's EXACT distinct count
  * (map-side-combinable distinct, no Expand row replication); the
  * per-column rows are combined driver-side, so profiling cost stays
  * two scans regardless of column count.
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
    // Base stats: one narrow single-row aggregate (no distincts). Putting
    // N countDistincts in the same agg would compile to an Expand that
    // replicates every row (N+1)× into one wide hash aggregate — measured
    // ~2× slower than splitting at sf0.1 and strictly worse at scale.
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*).head()
    val totalCnt = row.getAs[Long]("__total")
    // Exact distincts for ALL columns in one stacked pipeline: explode to
    // (column, value), map-side-combinable distinct (low-cardinality
    // columns collapse before the shuffle), then a vocabulary-sized count
    // per column.
    val ndvRows = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.c").as("__c"), col("s.v").as("__v"))
      .filter(col("__v").isNotNull)
      .distinct()
      .groupBy(col("__c")).agg(count(lit(1)).as("__ndv"))
      .collect()
    val ndv = ndvRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    cols.map { c =>
      (c, totalCnt - row.getAs[Long](s"__cnt_$c"),
        ndv.getOrElse(c, 0L),
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

  /** HLL register width: first 3 md5 hex chars = 2^12 buckets (standard
    * error 1.04/√4096 ≈ 1.6%).
    */
  private val HllBuckets = 4096

  /** Cross-engine-replayable HLL profiling — same output shape as
    * [[profileApprox]] but the distinct sketch is OUR HyperLogLog over
    * md5 hex algebra instead of Spark's opaque HLL++ buffer, so a SQL
    * oracle can replay the estimate bit-for-bit (every intermediate is an
    * integer or a fixed-shape IEEE expression; the register max and the
    * scaled harmonic sum are exact integer aggregations, order-immune —
    * SURVEY §5.4).
    *
    * Sketch: bucket = first 3 md5 hex chars (m = 4096); rho = 1 +
    * leading-zero bits of the next 13 hex chars (52 bits), register =
    * max(rho) per bucket capped at 50 so the harmonic term 2^(50-rho)
    * stays an exact BIGINT (max Σ = 4096·2^50 = 2^62). Estimate =
    * α·m²·2^50 / Σ with the standard linear-counting fallback
    * m·ln(m/zeros) when raw ≤ 2.5m — the original HLL recipe.
    *
    * Scale shape: registers aggregate map-side to ≤ cols × 4096 states
    * per task regardless of row count — the same mergeable-sketch
    * property as HLL++ (this IS an HLL, just with a portable hash and
    * register layout). Costs one extra scan vs [[profileApprox]] (the
    * stacked string projection can't share the typed min/max pass);
    * at 100 TB prefer [[profileApprox]] unless cross-engine
    * reproducibility of the estimate itself is required.
    */
  /** HLL register value from an md5-hex column: rho = 1 + leading-zero
    * BITS of hex chars 4..16 (52 bits), capped at 50 so the harmonic
    * term 2^(50-rho) stays an exact BIGINT. Hex-digit algebra — 4 zero
    * bits per leading '0' char plus the zero bits inside the first
    * non-zero digit — so the identical expression runs in DuckDB
    * (bit-level property-tested in SketchesSpec).
    */
  private[graft] def hllRegister(h: Column): Column = {
    val t = ltrim(substring(h, 4, 13), "0")
    val first = substring(t, 1, 1)
    val zbits = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(t === "", lit(53))
      .otherwise((lit(13) - length(t)) * 4 + zbits + 1)
    least(rho, lit(50))
  }

  /** HLL estimate from a register table (`keys..., __b, __m`): groups
    * the registers by `keys` and applies the original HLL recipe —
    * α·m²·2^50 over the exact-integer harmonic sum, linear-counting
    * fallback below 2.5m. The α·m²·2^50 prefactor is written as the
    * same left-associated literal tree the oracle uses, so constant
    * folding reproduces DuckDB's runtime doubles exactly. Returns
    * `keys..., __ndv` (rounded long).
    */
  private def hllEstimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0)) *
      lit(16777216.0) * lit(1125899906842624.0) / col("__s").cast("double")
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 50 - __m)")).as("__sp"))
      .withColumn("__zeros", lit(HllBuckets) - col("__present"))
      .withColumn("__s", col("__sp") + col("__zeros") * lit(1L << 50))
      .withColumn("__est",
        when(raw <= lit(10240.0) && col("__zeros") > 0,
          lit(4096.0) * log(lit(4096.0) / col("__zeros").cast("double")))
          .otherwise(raw))
      .select(keys.map(col) :+
        round(col("__est"), 0).cast("long").as("__ndv"): _*)
  }

  /** MERGEABLE-SKETCH ROLLUP CERTIFICATE — the cube pattern that makes
    * distinct counts affordable at 100 TB: build one small HLL register
    * set per (group, partition) cell ONCE (e.g. per source per day),
    * persist those, and answer any coarser distinct-count — per group,
    * global, arbitrary date ranges — by register-max MERGE, never
    * rescanning the data. This operator certifies the whole contract on
    * real data, per group:
    *
    *  - `est_merged` (cells max-merged, the production path) EQUALS
    *    `est_direct` (a one-pass sketch over the raw stream) — register
    *    max is associative, and the hash-match proves the merge
    *    implementation loses nothing (`merged_eq_direct`);
    *  - `sum_part_est` (naively ADDING per-partition estimates — the
    *    classic wrong rollup) overcounts whenever values recur across
    *    partitions, which is why sketches must merge, not add;
    *  - `err_e4` = |est_merged − exact|·10⁴ div exact puts the measured
    *    error next to the 1.6% theory bound (m = 4096).
    *
    * Scale: the sketch passes aggregate map-side to ≤ 4096 registers
    * per cell; `exact_ndv` (one distinct count) is the certificate's
    * audit column — at 100 TB you run the sketch passes only.
    *
    * Output: (group, n_parts, exact_ndv, est_direct, est_merged,
    * merged_eq_direct, sum_part_est, err_e4).
    */
  def hllRollup(df: DataFrame, groupCol: String, partCol: Column,
      value: Column): DataFrame = {
    val h = md5(value.cast("string"))
    // Materialized ONCE: the hashed stream feeds three consumers (cell
    // registers, the direct one-pass sketch, the exact audit count) and
    // Catalyst does not share subtrees — un-checkpointed, the source
    // scan + value expression + md5 would run once per consumer.
    val stream = graft.SparkUtil.ensureParallelism(df)
      .select(col(groupCol).as("__g"), partCol.as("__p"),
        value.cast("string").as("__v"), substring(h, 1, 3).as("__b"),
        hllRegister(h).as("__m"))
      .filter(col("__v").isNotNull)
      .localCheckpoint(true)
    val cells = stream
      .groupBy(col("__g"), col("__p"), col("__b"))
      .agg(max(col("__m")).as("__m"))
      .localCheckpoint(true)
    val perPart = hllEstimate(cells, Seq("__g", "__p"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_parts"), sum(col("__ndv")).as("sum_part_est"))
    val merged = hllEstimate(
      cells.groupBy(col("__g"), col("__b")).agg(max(col("__m")).as("__m")),
      Seq("__g")).withColumnRenamed("__ndv", "est_merged")
    val direct = hllEstimate(
      stream.groupBy(col("__g"), col("__b")).agg(max(col("__m")).as("__m")),
      Seq("__g")).withColumnRenamed("__ndv", "est_direct")
    val exact = stream.groupBy(col("__g"))
      .agg(countDistinct(col("__v")).as("exact_ndv"))
    exact.join(direct, Seq("__g")).join(merged, Seq("__g"))
      .join(perPart, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_parts"), col("exact_ndv"),
        col("est_direct"), col("est_merged"),
        (col("est_merged") === col("est_direct")).as("merged_eq_direct"),
        col("sum_part_est"),
        expr("abs(est_merged - exact_ndv) * 10000 div exact_ndv")
          .as("err_e4"))
  }

  def profileApproxPortable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileApproxPortable needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*).head()
    val totalCnt = row.getAs[Long]("__total")

    // One scan for every column's registers: stack to (column, value).
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.c").as("__c"), col("s.v").as("__v"))
      .filter(col("__v").isNotNull)
    val h = md5(col("__v"))
    val regs = stacked
      .select(col("__c"), substring(h, 1, 3).as("__b"),
        hllRegister(h).as("__m"))
      .groupBy(col("__c"), col("__b"))
      .agg(max(col("__m")).as("__m"))
    val est = hllEstimate(regs, Seq("__c"))
    val ndv = est.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cols.map { c =>
      (c, totalCnt - row.getAs[Long](s"__cnt_$c"),
        ndv.getOrElse(c, 0L),
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
  /** Exact continuous quantiles per group (DuckDB `quantile_cont`
    * semantics: pos = p·(n−1) zero-based, result = v_floor·(1−frac)
    * + v_ceil·frac) via DISTRIBUTED RANK SELECTION — the shape that
    * survives 100 TB where the two obvious ones don't:
    *
    *   - `percentile(...)` buffers every group value in one imperative
    *     aggregation buffer (cannot spill → executor OOM);
    *   - a `Window.partitionBy(group)` sort caps parallelism at the
    *     group count (3 groups over 100 TB = 3 tasks sorting 33 TB
    *     each — a straggler death), even though it spills.
    *
    * Here the (group, value) space is range-partitioned across ALL
    * cores (each partition a spillable local sort), and only BOUNDED
    * state ever reaches the driver: per-(partition, group) counts and
    * running sums (numPartitions × ngroups rows) locate each target
    * rank's partition + local offset, and a second pass over the same
    * checkpoint extracts exactly the ≤ 2·|ps| interpolation rows per
    * group. Three jobs total, full parallelism, O(parts × groups)
    * driver memory.
    *
    * Returns one row per group: (groupCol, <quantile names>..., mean),
    * mean = round(sum/n, 2) — rounded because partial-sum order is
    * engine-specific; the quantiles ship unrounded (the interpolation
    * is bit-equal to DuckDB's, ROUND-of-double is not portable).
    *
    * `interpolate = false` switches to the EXACT LOWER-RANK pick
    * (value at zero-based rank floor(p·(n−1)) — well-defined under
    * ties, no float arithmetic between values): the q86 sampled-
    * percentile convention. Only the lo row is fetched per quantile.
    * `includeMean = false` drops the mean column (for callers whose
    * mean is computed over a DIFFERENT relation than the rank input,
    * e.g. full data vs a sample).
    */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], interpolate: Boolean = true,
      includeMean: Boolean = true,
      maxDriverStateRows: Long = 1L << 20): DataFrame = {
    require(ps.nonEmpty, "quantilesByGroup needs at least one quantile")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(parts, col("__g"), col("__v"))
      .sortWithinPartitions(col("__g"), col("__v"))
      .localCheckpoint(true)
    // Bounded driver reduction #1: (partition, group) → (count, sum),
    // computed shuffle-free inside each checkpoint partition (groups are
    // contiguous after the range sort, so this is a run-length pass; the
    // range partitioning also means the stream is O(groups + parts)
    // rows, not parts × groups).
    val partStatsDs = sorted.as[(String, Double)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (Long, Double)]
      for ((g, v) <- it) {
        val (n0, s0) = acc.getOrElse(g, (0L, 0.0))
        acc(g) = (n0 + 1, s0 + v)
      }
      acc.iterator.map { case (g, (n, s)) => (pid, g, n, s) }
    }
    // DRIVER-MEMORY GUARD: the collect below materializes the whole
    // stats stream on the driver. That is the right shape when groups
    // are FEW (the q38 case: 3 groups over the entire corpus — a
    // Window.partitionBy(group) would cap parallelism at 3 tasks), but
    // it dies when the group column is high-cardinality (per-user, per-
    // url). Guard and collect in ONE pass: fetch at most bound+1 rows
    // (CollectLimit scans partitions incrementally and stops once the
    // limit is satisfied, so a high-cardinality stream never lands on
    // the driver); an overflow row switches to the fully distributed
    // rank-join fallback — there, one sort per group IS the scalable
    // shape because parallelism equals the group count. The common
    // few-groups call pays no extra job (the r12 separate count() did).
    val bound = math.min(maxDriverStateRows, (Int.MaxValue - 1).toLong).toInt
    val partStats0 = partStatsDs.limit(bound + 1).collect()
    if (partStats0.length > bound)
      return quantilesDistributed(sorted, groupCol, ps, interpolate,
        includeMean)
    val partStats = partStats0
      .sortBy(_._1)
    val groups = partStats.map(_._2).distinct.sorted
    // Per group: total n, total sum, and the global ranks to fetch.
    val nByG = partStats.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val sumByG = partStats.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    // slot = (group, quantile index, lo/hi) → flat id for reassembly.
    // Global rank → (partition, local-index-within-that-group) via the
    // partition-ordered cumulative counts.
    val targetsByPid =
      scala.collection.mutable.Map.empty[Int,
        scala.collection.mutable.Map[String, List[(Long, Int)]]]
    val fracs = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (g <- groups) {
      val n = nByG(g)
      val cum = partStats.filter(_._2 == g) // pid-sorted
      for (((_, p), qi) <- ps.zipWithIndex) {
        val pos = (n - 1).toDouble * p
        val frac = if (interpolate) pos - math.floor(pos) else 0.0
        fracs((g, qi)) = frac
        val lo = math.floor(pos).toLong
        val hi = math.min(lo + 1, n - 1)
        val sides = if (interpolate) Seq((lo, 0), (hi, 1)) else Seq((lo, 0))
        for ((rank, side) <- sides) {
          var before = 0L
          var placed = false
          for ((pid, _, cnt, _) <- cum if !placed) {
            if (rank < before + cnt) {
              val slot = (qi * 2 + side)
              val m = targetsByPid.getOrElseUpdate(pid,
                scala.collection.mutable.Map.empty)
              m(g) = (rank - before, slot) :: m.getOrElse(g, Nil)
              placed = true
            }
            before += cnt
          }
        }
      }
    }
    val bc = spark.sparkContext.broadcast(
      targetsByPid.map { case (k, v) => (k, v.toMap) }.toMap)
    // Bounded driver reduction #2: the ≤ groups × |ps| × 2 picked rows.
    val picked = sorted.as[(String, Double)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      bc.value.get(pid) match {
        case None => Iterator.empty
        case Some(want) =>
          val counters = scala.collection.mutable.Map.empty[String, Long]
          it.flatMap { case (g, v) =>
            val idx = counters.getOrElse(g, 0L)
            counters(g) = idx + 1
            want.getOrElse(g, Nil).collect {
              case (li, slot) if li == idx => ((g, slot), v)
            }
          }
      }
    }.collect().toMap
    val rows = groups.map { g =>
      val qVals = ps.indices.map { qi =>
        val frac = fracs((g, qi))
        val vLo = picked((g, qi * 2))
        if (frac == 0.0) vLo
        else {
          val vHi = picked.getOrElse((g, qi * 2 + 1), vLo)
          vLo * (1.0 - frac) + vHi * frac
        }
      }
      val mean = new java.math.BigDecimal(sumByG(g) / nByG(g).toDouble)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
      org.apache.spark.sql.Row.fromSeq(
        if (includeMean) g +: qVals :+ mean else g +: qVals)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(groupCol,
        org.apache.spark.sql.types.StringType, nullable = false) +:
        (if (includeMean) ps.map(_._1) :+ "mean" else ps.map(_._1)).map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      schema)
  }

  /** High-cardinality fallback for [[quantilesByGroup]]: exact per-group
    * quantiles with NOTHING on the driver — per-group (n, sum) by
    * aggregate, target ranks derived distributed, and the ≤ 2·|ps|
    * interpolation rows per group fetched by an equi join on
    * (group, row_number). The per-group sort (row_number window) is the
    * scalable shape HERE because parallelism equals the group count —
    * the exact inverse of the few-groups case the driver path serves.
    * Quantile arithmetic mirrors the driver path bit-for-bit
    * (pos = (n−1)·p, v_lo·(1−frac) + v_hi·frac in doubles); the mean is
    * Spark's round(sum/n, 2) (HALF_UP on the decimal repr), which can
    * differ from the driver path's exact-binary HALF_UP only on a
    * mid-cent tie of the double quotient.
    */
  private def quantilesDistributed(sorted: DataFrame, groupCol: String,
      ps: Seq[(String, Double)], interpolate: Boolean,
      includeMean: Boolean): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val ranked = sorted
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
    val stats = sorted.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sum"))
    val qlits = array(ps.zipWithIndex.map { case ((_, p), qi) =>
      struct(lit(qi).as("qi"), lit(p).as("p")) }: _*)
    val pos = (col("__n") - 1).cast("double") * col("__q.p")
    val targets = stats
      .select(col("__g"), col("__n"), col("__sum"), explode(qlits).as("__q"))
      .select(col("__g"), col("__n"), col("__sum"),
        col("__q.qi").as("__qi"),
        floor(pos).cast("long").as("__lo"),
        least(floor(pos).cast("long") + 1L, col("__n") - 1L).as("__hi"),
        (if (interpolate) pos - floor(pos) else lit(0.0)).as("__frac"))
    val sideRows = Seq(
      struct(col("__lo").as("r"), lit(0).as("side")),
      struct(col("__hi").as("r"), lit(1).as("side")))
    val sides = targets
      .select(col("__g"), col("__qi"), col("__frac"), col("__n"),
        col("__sum"),
        explode(array(sideRows.take(if (interpolate) 2 else 1): _*))
          .as("__s"))
      .select(col("__g"), col("__qi"), col("__frac"), col("__n"),
        col("__sum"), col("__s.r").as("__rn"), col("__s.side").as("__side"))
    val hit = ranked.join(sides, Seq("__g", "__rn"))
    val perQ = hit
      .groupBy(col("__g"), col("__qi"), col("__frac"), col("__n"),
        col("__sum"))
      .agg(max(when(col("__side") === 0, col("__v"))).as("__vlo"),
        max(when(col("__side") === 1, col("__v"))).as("__vhi"))
      .withColumn("__qv",
        when(col("__frac") === 0.0, col("__vlo"))
          .otherwise(col("__vlo") * (lit(1.0) - col("__frac")) +
            coalesce(col("__vhi"), col("__vlo")) * col("__frac")))
    val qCols = ps.zipWithIndex.map { case ((name, _), qi) =>
      max(when(col("__qi") === qi, col("__qv"))).as(name)
    }
    val grouped = perQ.groupBy(col("__g"), col("__n"), col("__sum"))
      .agg(qCols.head, qCols.tail: _*)
    val outCols =
      col("__g").as(groupCol) +: (ps.map(p => col(p._1)) ++
        (if (includeMean)
          Seq(round(col("__sum") / col("__n").cast("double"), 2).as("mean"))
        else Nil))
    // Group ordering aligned with the driver path (which emits groups
    // sorted ascending); the sort is over ngroups rows — noise next to
    // the rank join above. Schema note: the quantile columns here are
    // declared nullable (they come through conditional aggregates)
    // where the driver path declares them non-null — callers comparing
    // values are unaffected; callers comparing StructTypes should
    // compare names+types only.
    grouped.orderBy(col("__g")).select(outCols: _*)
  }

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

  /** Zipf power-law fit over the corpus token-frequency distribution —
    * the one-row health certificate of a text corpus: natural language
    * sits near slope −1 on log-rank/log-frequency; spam farms, OCR
    * noise, and template floods bend it. Least squares over the top
    * `topR` ranks with both axes pinned to e4 integers BEFORE the
    * moment sums (Σx, Σy, Σxy, Σx² stay exact longs — overflow-audited:
    * |x|,|y| ≤ 2·10⁵ ⇒ Σxy ≤ topR·4·10¹⁰ ≪ 2⁶³), so the only floats
    * are the two final divisions and the oracle replays the fit
    * bit-for-bit.
    *
    * Scale shape: one map-side-combinable token count (vocabulary-
    * sized), TakeOrdered top-R, and the moment sums over R rows. The
    * corpus crosses exactly one aggregate. Output one row: n_ranks,
    * slope, intercept_e4 (intercept in e4 log-frequency space).
    */
  /** Heaps'-law vocabulary-growth fit — [[zipfFit]]'s dataset-SCALING
    * sibling: V(T) ≈ K·T^β, how many NEW distinct tokens the next
    * slice of corpus buys. The measurement behind "does more of this
    * source still add vocabulary?" when composing a 100 TB mix: β near
    * 1 means the source keeps surprising, β near 0 means it's
    * exhausted (natural corpora sit around 0.4–0.6).
    *
    * Prefixes are ingestion-order cuts at `checkpoints` evenly-spaced
    * doc-id thresholds (min + (max−min)·i/k, integer arithmetic — no
    * global row-number sort, just a min/max aggregate, so the
    * checkpoint derivation is O(1) state at any corpus size). The
    * corpus crosses exactly TWO map-side-combinable aggregates: each
    * word's FIRST-occurrence doc id (vocabulary-sized), and per-doc
    * token counts; each joins the broadcast k-row checkpoint relation,
    * so V_i / T_i never rescans the corpus per checkpoint. Axes are
    * e4-pinned ln integers before the moment sums ([[zipfFit]]'s
    * discipline — the only floats are the two final divisions), so a
    * SQL oracle replays the whole curve and fit bit-for-bit.
    *
    * Output: one row per checkpoint (cut doc id, prefix token/vocab
    * totals, the e4 axes) with the shared slope (β) and e4 intercept
    * (ln K) as window columns — the curve AND its fit in one report.
    */
  def heapsFit(df: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lnE4H = (c: Column) =>
      round(log(c.cast("double")) * 10000, 0).cast("long")
    val d = graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol).cast("long").as("__id"),
        split(col(textCol), " ").as("__t"))
    val b = d.agg(min(col("__id")), max(col("__id"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val ck = (1 to checkpoints)
      .map(i => (i.toLong, lo + (hi - lo) * i / checkpoints))
      .toDF("ckpt", "cut_doc")
    val firstocc = d.select(col("__id"), explode(col("__t")).as("__w"))
      .groupBy(col("__w")).agg(min(col("__id")).as("__fd"))
    val v = firstocc.crossJoin(broadcast(ck))
      .filter(col("__fd") <= col("cut_doc"))
      .groupBy(col("ckpt"), col("cut_doc"))
      .agg(count(lit(1)).as("n_vocab"))
    val t = d.select(col("__id"), size(col("__t")).cast("long").as("__nw"))
      .crossJoin(broadcast(ck))
      .filter(col("__id") <= col("cut_doc"))
      .groupBy(col("ckpt"), col("cut_doc"))
      .agg(sum(col("__nw")).as("n_tokens"))
    // Unpartitioned window — deliberately: its input is the CHECKPOINT
    // table (k rows by construction, corpus-size-independent), so the
    // single-partition WindowExec warning does not indicate a scale
    // hazard here.
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val pts = t.join(v, Seq("ckpt", "cut_doc"), "left")
      .select(col("ckpt"), col("cut_doc"), col("n_tokens"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"))
      .withColumn("x", lnE4H(col("n_tokens")))
      .withColumn("y", lnE4H(col("n_vocab")))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("x")).over(w))
      .withColumn("__sy", sum(col("y")).over(w))
      .withColumn("__sxy", sum(col("x") * col("y")).over(w))
      .withColumn("__sxx", sum(col("x") * col("x")).over(w))
    val slope = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double") /
      (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .cast("double")
    pts.select(col("ckpt"), col("cut_doc"), col("n_tokens"),
        col("n_vocab"), col("x"), col("y"), slope.as("slope"),
        (col("__sy").cast("double") / col("__n").cast("double") -
          slope * (col("__sx").cast("double") / col("__n").cast("double")))
          .as("intercept_e4"))
      .orderBy(col("ckpt"))
  }

  def zipfFit(df: DataFrame, textCol: String, topR: Int = 1000)
      : DataFrame = {
    val lnE4 = (c: Column) =>
      round(log(c.cast("double")) * 10000, 0).cast("long")
    val byFreq = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("w"))
    val top = graft.SparkUtil.ensureParallelism(df)
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(topR)
      .select(lnE4(row_number().over(byFreq)).as("x"),
        lnE4(col("cnt")).as("y"))
    val m = top.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    m.select(col("n").as("n_ranks"), slope.as("slope"),
      (col("sy").cast("double") / col("n").cast("double") -
        slope * (col("sx").cast("double") / col("n").cast("double")))
        .as("intercept_e4"))
  }

  /** Per-GROUP robust standardization — lower-median / MAD z-scores
    * over an integral column: the outlier-immune scaling (one wild doc
    * shifts a mean-σ z arbitrarily; it moves the median/MAD not at
    * all) a 100 TB quality-filter threshold should be quoted in.
    *
    *   med_g  = value at rank ⌈n/2⌉ (lower median — exact, integral)
    *   mad_g  = lower median of |x − med_g|
    *   z_e4   = (x − med_g)·10⁴ div mad_g   (0 when mad_g = 0)
    *
    * Scale shape: BOTH medians come from value-HISTOGRAM cumsums
    * (windows over the per-group distinct-value tables — never a
    * corpus sort, never a per-group collect; q176's discipline), each
    * joined back broadcast. Everything is exact integer algebra, so
    * the oracle replays rank selection and the signed trunc-div
    * bit-for-bit. Output: input columns + med, mad, z_e4.
    */
  def robustZByGroup(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(valueCol).cast("long")
    def medians(in: DataFrame, vc: Column, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("__v"))
      val wg = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
      in.select(col(groupCol), vc.as("__v"))
        .groupBy(col(groupCol), col("__v"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        .withColumn("__n", sum(col("__c")).over(wg))
        .filter(col("__cum") >= expr("(__n + 1) div 2"))
        .groupBy(col(groupCol)).agg(min(col("__v")).as(out))
    }
    val med = medians(df, v, "med")
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = medians(withMed, abs(v - col("med")), "mad")
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("z_e4",
        when(col("mad") === 0, lit(0L))
          .otherwise(expr(s"CAST(($valueCol - med) * 10000 div mad " +
            "AS BIGINT)")))
  }

  /** Per-GROUP ordinary-least-squares fit y ~ a + b·x over integral
    * columns — the grouped trend diagnostic ([[zipfFit]]'s global OLS,
    * generalized): per group the slope, intercept, and r² of the
    * centered moments, each a fixed-shape double expression over EXACT
    * integer sums (n·Σxy − ΣxΣy etc.), so partial aggregation is
    * order-exact and the oracle replays bit-for-bit (SURVEY §5.4).
    * One map-side-combinable aggregate; everything after is
    * groups-sized. Degenerate groups (zero x- or y-variance) emit
    * NaN/Inf slopes — callers filter by `n` if that matters.
    */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val g = graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
    val dxy = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val dyy = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast("double")
    val slope = dxy / dxx
    g.select(col(groupCol), col("n"), slope.as("slope"),
      ((col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n")).as("intercept"),
      (dxy / dxx * (dxy / dyy)).as("r2"))
  }

  /** ROBUST per-group trend — Bartlett's three-group resistant line
    * (Bartlett 1949), the outlier-immune sibling of [[olsByGroup]]:
    * one wild y value moves an OLS slope arbitrarily; it cannot move a
    * slope built from MEDIANS. Sort by x (conceptually), take the
    * outer thirds, and run the line through their coordinate-wise
    * medians: slope = (medY_hi − medY_lo)/(medX_hi − medX_lo),
    * intercept anchored at the overall medians. This is also the
    * SCALE-SAFE robust slope: full Theil–Sen is O(n²) pairwise slopes
    * per group — a non-starter at corpus scale — while every statistic
    * here is an exact rank selection over VALUE HISTOGRAMS (the
    * q176/q177 discipline: the corpus crosses map-side-combinable
    * counts; cumsum windows run on distinct-value tables only; there
    * is no per-group sort of data rows anywhere).
    *
    * Terciles are VALUE-threshold sets: lo = {x ≤ x@rank ⌈n/3⌉},
    * hi = {x ≥ x@rank n−⌈n/3⌉+1} — ties at the boundary widen the
    * tercile identically in both engines. Medians are lower-medians
    * (rank ⌈m/2⌉, the q177 convention). Slope/intercept at e4
    * trunc-div; a group whose outer-tercile x-medians coincide (no x
    * spread) emits a NULL slope rather than a division error.
    *
    * Output per group: (groupCol, n, mx_lo, my_lo, mx_hi, my_hi,
    * slope_e4, intercept_e4).
    */
  def robustTrendByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.SparkUtil.ensureParallelism(df)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .localCheckpoint(true)
    val grp = Window.partitionBy(col("__g"))
    // r21 fusion (guide §1.2-1: remove passes): the r19 shape ran EIGHT
    // independent histogram-rank chains (each its own groupBy + two
    // windows + filter + groupBy) plus a corpus-sized `marked`
    // checkpoint and a 7-join assembly. Every x-side pick — the
    // tercile bounds xl/xu, the overall median, and the lo/hi tercile
    // x-medians — is answerable from ONE (group, x) histogram: with
    // the cumulative count column in hand, "value at rank r" is
    // `min(x | cum ≥ r)`, and the lo subset's size is just the
    // cumulative count AT xl (resp. above xu), so the subset medians
    // are rank picks on the SAME cumulative column. The y side needs
    // actual subset histograms (y within an x-tercile is not derivable
    // from the full y histogram), but one tagged pass builds all three
    // at once. Two passes over the checkpointed base, zero extra
    // checkpoints, one final join — same exact integer rank algebra,
    // bit-identical picks.
    val byX = Window.partitionBy(col("__g")).orderBy(col("__x"))
    val hx = base.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(byX))
      .withColumn("__n", sum(col("__c")).over(grp))
      // integer ranks (trunc div — `div`, never Column `/` which is
      // double division and would corrupt the >= rank comparison)
      .withColumn("xl",
        min(when(col("__cum") >= expr("(__n + 2) div 3"), col("__x")))
          .over(grp))
      .withColumn("xu",
        min(when(col("__cum") >=
          expr("__n - ((__n + 2) div 3) + 1"), col("__x"))).over(grp))
      // |lo| = cumulative count at xl; |hi| = n − cumulative count
      // just below xu. Any x whose cum reaches a rank inside the lo
      // (resp. hi) range is inside that tercile by construction, so
      // the subset medians need no explicit x-bound filter.
      .withColumn("__nlo",
        max(when(col("__x") === col("xl"), col("__cum"))).over(grp))
      .withColumn("__below",
        max(when(col("__x") === col("xu"), col("__cum") - col("__c")))
          .over(grp))
    val xs = hx.groupBy(col("__g")).agg(
      max(col("__n")).as("n"),
      max(col("xl")).as("xl"),
      max(col("xu")).as("xu"),
      min(when(col("__cum") >= expr("(__nlo + 1) div 2"), col("__x")))
        .as("mx_lo"),
      min(when(col("__cum") >=
        expr("__below + ((__n - __below + 1) div 2)"), col("__x")))
        .as("mx_hi"),
      min(when(col("__cum") >= expr("(__n + 1) div 2"), col("__x")))
        .as("mx_all"))
      // groups-sized; consumed by the tagged pass AND the final join —
      // an un-materialized xs would re-run the whole x-histogram chain
      // (a corpus pass at scale) once per consumer.
      .localCheckpoint(true)
    // One tagged y pass: every row votes into the overall histogram,
    // plus the lo (x ≤ xl) and hi (x ≥ xu) ones it belongs to.
    val tagged = base.join(broadcast(xs.select(col("__g"), col("xl"),
        col("xu"))), Seq("__g"))
      .select(col("__g"), col("__y"), explode(filter(array(
        lit("a"),
        when(col("__x") <= col("xl"), "l"),
        when(col("__x") >= col("xu"), "h")), t => t.isNotNull))
        .as("__t"))
    val byY = Window.partitionBy(col("__g"), col("__t")).orderBy(col("__y"))
    val grpT = Window.partitionBy(col("__g"), col("__t"))
    val ys = tagged.groupBy(col("__g"), col("__t"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(byY))
      .withColumn("__n", sum(col("__c")).over(grpT))
      .withColumn("__m",
        min(when(col("__cum") >= expr("(__n + 1) div 2"), col("__y")))
          .over(grpT))
      .groupBy(col("__g")).agg(
        max(when(col("__t") === "a", col("__m"))).as("my_all"),
        max(when(col("__t") === "l", col("__m"))).as("my_lo"),
        max(when(col("__t") === "h", col("__m"))).as("my_hi"))
    xs.join(ys, Seq("__g"))
      .withColumn("slope_e4",
        when(col("mx_hi") =!= col("mx_lo"),
          expr("(my_hi - my_lo) * 10000 div (mx_hi - mx_lo)")))
      .withColumn("intercept_e4",
        when(col("slope_e4").isNotNull,
          col("my_all") * 10000 - col("slope_e4") * col("mx_all")))
      .select(col("__g").as(groupCol), col("n"), col("mx_lo"),
        col("my_lo"), col("mx_hi"), col("my_hi"), col("slope_e4"),
        col("intercept_e4"))
  }

  /** Delete-one-group JACKKNIFE of a corpus mean — the error bar every
    * corpus-level metric this engine reports should carry before a
    * 100 TB mixture decision leans on it: leave each `groupCol` shard
    * out, recompute the mean, and summarize the spread as the grouped-
    * jackknife standard error (Tukey). The per-group influence
    * (loo_mean − overall mean) doubles as an attribution signal: a
    * source whose REMOVAL moves the metric most is the source to audit
    * first (q134's question, answered for any scalar metric).
    *
    * Scale shape: ONE map-side-combinable groupBy collapses the corpus
    * to a groups-sized table; every leave-one-out statistic is pure
    * complement algebra on that table against its own 1-row total
    * (cross-joined in-plan — groups-sized × 1, no driver collect). The
    * corpus is scanned once; nothing post-aggregation exceeds G rows.
    *
    * Determinism (SURVEY §5.4): each loo mean is ONE division of exact
    * longs (portable double); the SE's sum-of-squares runs in e4
    * integer space via the algebraic identity
    *   Σ(l − T/G)² = (G·Σl² − T²)/G
    * so no float ever enters a multi-row aggregate. SE fits longs for
    * G·(mean·1e4)² ≲ 2^63 — e4 quantization leaves headroom up to
    * ~10⁵-token means at G ≲ 10⁴ groups.
    *
    * `valueCol` must be integral and non-null. Output: one row per
    * group — groupCol, n_docs, n_value (group sum), loo_mean,
    * influence_e4, and the shared jack_se repeated per row.
    */
  def jackknifeMean(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(valueCol).cast("long")).as("s"))
      .localCheckpoint(true)
    val tot = g.agg(sum(col("n_docs")).as("nn"), sum(col("s")).as("ss"),
      count(lit(1)).as("gg"))
    val looMean = (col("ss") - col("s")).cast("double") /
      (col("nn") - col("n_docs"))
    val l = g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("s").as("n_value"),
        looMean.as("loo_mean"),
        round(looMean * 10000, 0).cast("long").as("__l_e4"),
        round(col("ss").cast("double") / col("nn") * 10000, 0)
          .cast("long").as("__m_e4"),
        col("gg").as("__gg"))
      .localCheckpoint(true)
    val j = l.agg(sum(col("__l_e4")).as("t4"),
      sum(col("__l_e4") * col("__l_e4")).as("ssq"), max(col("__gg")).as("gg"))
    l.crossJoin(broadcast(j))
      .select(col(groupCol), col("n_docs"), col("n_value"),
        col("loo_mean"),
        (col("__l_e4") - col("__m_e4")).as("influence_e4"),
        (sqrt(((col("gg") - 1) * (col("gg") * col("ssq") -
          col("t4") * col("t4"))).cast("double")) / col("gg") /
          lit(10000.0)).as("jack_se"))
  }

  /** Poisson(1) multiplicity thresholds at 2^52 — the exact-integer
    * inverse CDF the bootstrap compares 13-hex-digit md5 draws
    * against: m = #{thresholds below the draw}, capped at 4
    * (P(m ≥ 5) ≈ 0.37%). Longs precomputed here (and inlined into the
    * oracle) so no float `exp` crosses an engine boundary.
    */
  val PoissonThresholdsE52: Seq[Long] =
    Seq(1656781714176974L, 3313563428353948L, 4141954285442435L,
      4418084571138598L)

  /** POISSON-BOOTSTRAP confidence intervals for a per-group mean —
    * [[jackknifeMean]] needs a within-group block structure; the
    * bootstrap needs nothing: each of `b` replicates re-weights every
    * row with an independent Poisson(1) multiplicity (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams" — the
    * map-side-combinable bootstrap, since multiplicities are per-row
    * and never require resampling the dataset). Deterministic: the
    * multiplicity of (row, replicate) is md5-derived and compared
    * against the exact-integer [[PoissonThresholdsE52]], so every
    * replicate — and the CI — replays bit-for-bit in SQL.
    *
    * Scale shape: ONE map-side explode of b (replicate, m) structs per
    * row (m = 0 rows dropped before the shuffle) into a combinable
    * (group, replicate) sum/count aggregate — the corpus crosses one
    * shuffle of b×groups cells; the percentile pick is a window over
    * the b-row per-group table. No per-replicate scan, no RNG state.
    *
    * Output per group: n_rows, mean_e4 (full sample), boot_lo_e4 /
    * boot_hi_e4 (the `loRank`-th / `hiRank`-th of the b sorted
    * replicate means — ranks 2 and b−1 at b = 40 ≈ a 95% interval),
    * n_replicates.
    */
  def bootstrapMeanCi(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, b: Int = 40, seed: String = "boot",
      loRank: Int = 2, hiRank: Int = 39): DataFrame = {
    require(b >= 4 && loRank >= 1 && hiRank <= b && loRank < hiRank,
      s"bad bootstrap config b=$b loRank=$loRank hiRank=$hiRank")
    import org.apache.spark.sql.expressions.Window
    // Replicate index exploded FIRST, hash computed ONCE per
    // (row, replicate) (r21, guide §4): the former shape built an
    // array of b structs whose md5→conv chain appeared 4× per
    // replicate (once per threshold comparison) — ~2.8k expression
    // nodes that cost the driver more analysis/canonicalization time
    // per bench rep than the job did. Same md5 inputs (concat_ws casts
    // the int column exactly like the int literal), same threshold
    // algebra, bit-identical cells.
    val h = conv(substring(md5(concat_ws(":", lit(seed), col("__rep"),
      col("__k"))), 1, 13), 16, 10).cast("long")
    val cells = graft.SparkUtil.ensureParallelism(df)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"),
        col(keyCol).cast("string").as("__k"))
      .select(col("__g"), col("__v"), col("__k"),
        explode(typedlit((0 until b).toList)).as("__rep"))
      .withColumn("__h", h)
      .withColumn("__m", PoissonThresholdsE52
        .map(t => when(col("__h") >= t, 1).otherwise(0)).reduce(_ + _))
      .filter(col("__m") > 0)
      .groupBy(col("__g"), col("__rep"))
      .agg(sum(col("__m") * col("__v")).as("__s"),
        sum(col("__m")).as("__n"))
      .withColumn("__mean_e4", expr("__s * 10000 div __n"))
    val byMean = Window.partitionBy(col("__g"))
      .orderBy(col("__mean_e4"), col("__rep"))
    val ranked = cells
      .withColumn("__rk", row_number().over(byMean))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_replicates"),
        max(when(col("__rk") === loRank, col("__mean_e4")))
          .as("boot_lo_e4"),
        max(when(col("__rk") === hiRank, col("__mean_e4")))
          .as("boot_hi_e4"))
    val full = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("__sv"))
      .withColumn("mean_e4", expr("__sv * 10000 div n_rows"))
    full.join(ranked, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_rows"), col("mean_e4"),
        col("boot_lo_e4"), col("boot_hi_e4"), col("n_replicates"))
  }

  /** EXACT k-each-end trimmed mean per group — the robust center a
    * plain mean loses to outliers and a median throws information away
    * for: drop exactly k = n·trimNum div trimDen rows from EACH end
    * (row-exact even when ties straddle the cut — the boundary value's
    * partial multiplicity is counted, not the whole tie class) and
    * average the rest.
    *
    * Computation is the histogram-rank discipline (q124/q176): the
    * corpus crosses ONE (group, value) aggregate; cumulative count and
    * value-mass windows run on that histogram. The k smallest sum to
    * maskBelow + lo·(k − countBelow) where lo is the k-th value — on
    * the row holding lo this simplifies to sv + v·(k − cum), a single
    * conditional picked by max(); the top side mirrors. No corpus
    * sort, no per-group collect.
    *
    * Output: group, n, k_trim, trimmed_sum, trimmed_mean (floor of the
    * exact rational — integer-div portable). Overflow: value mass must
    * fit a long (Σ|v| ≤ 9·10¹⁸).
    */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String,
      valueCol: String, trimNum: Int = 1, trimDen: Int = 10)
      : DataFrame = {
    require(trimNum >= 0 && trimDen > 2 * trimNum,
      s"trim fraction must leave rows: $trimNum/$trimDen")
    import org.apache.spark.sql.expressions.Window
    val byV = Window.partitionBy("__g").orderBy("__v")
    val w = Window.partitionBy("__g")
    df.groupBy(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(byV))
      .withColumn("__sv", sum(col("__c") * col("__v")).over(byV))
      .withColumn("__n", sum(col("__c")).over(w))
      .withColumn("__tot", sum(col("__c") * col("__v")).over(w))
      .withColumn("__k", expr(s"__n * $trimNum div $trimDen"))
      .groupBy(col("__g"), col("__n"), col("__tot"), col("__k"))
      .agg(
        // the row holding the k-th smallest value: cum−c < k ≤ cum
        max(when(col("__cum") - col("__c") < col("__k") &&
            col("__cum") >= col("__k"),
          col("__sv") + col("__v") * (col("__k") - col("__cum"))))
          .as("__low"),
        // the row holding the k-th largest: n−cum < k ≤ n−cum+c
        max(when(col("__n") - col("__cum") < col("__k") &&
            col("__n") - col("__cum") + col("__c") >= col("__k"),
          col("__tot") - col("__sv") +
            col("__v") * (col("__k") - col("__n") + col("__cum"))))
          .as("__high"))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("__k").as("k_trim"),
        (col("__tot") - coalesce(col("__low"), lit(0L)) -
          coalesce(col("__high"), lit(0L))).as("trimmed_sum"),
        expr("""(__tot - coalesce(__low, 0L) - coalesce(__high, 0L))
                div (__n - 2 * __k)""").as("trimmed_mean"))
      .orderBy(groupCol)
  }
}
