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

  /** CONSISTENT-HASH ring positions for `numShards` shards with
    * `vnodesPerShard` virtual nodes each, computed on the driver (the
    * ring is shards×vnodes metadata — IVF-centroid legitimacy): vnode
    * (s, v) sits at the 52-bit position read from the first 13 hex
    * digits of md5("shard:s:v") — the same digest both engines
    * evaluate, so an oracle rebuilds the identical ring in SQL.
    * Returned sorted by position.
    */
  def hashRing(numShards: Int, vnodesPerShard: Int): Seq[(Long, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (for {
      s <- 0 until numShards
      v <- 0 until vnodesPerShard
    } yield {
      val hex = md.digest(s"shard:$s:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      (java.lang.Long.parseLong(hex, 16), s)
    }).sortBy(_._1)
  }

  /** CONSISTENT-HASH shard assignment — the layout primitive behind
    * "grow the cluster without reshuffling the world": a key goes to
    * the first ring vnode clockwise from its hash (wrap-around to the
    * ring minimum). With mod-N hashing, adding one shard moves
    * ~(N−1)/N of ALL keys; on the ring, ONLY keys landing in the new
    * shard's vnode arcs move — expected 1/(N+1) of the data, nothing
    * shard-to-old-shard. Vnodes smooth per-shard load (arc-length
    * variance ~1/√V).
    *
    * The ring enters the row expression as a SORTED LITERAL ARRAY and
    * the successor lookup is `filter(ring, pos >= h)[1]` with a
    * wrap-around coalesce — per-row codegen'd expression algebra, zero
    * joins, zero shuffles: assignment rides the scan at any scale.
    */
  def consistentShard(keyCol: Column, numShards: Int,
      vnodesPerShard: Int = 16): Column = {
    val ring = hashRing(numShards, vnodesPerShard)
    // typedlit: ONE folded ArrayData literal — an array(struct(lit..))
    // tree of S·V CreateStructs would be re-evaluated per row (measured
    // 1.4 s on 5k rows at 272 vnodes before this).
    val ringLit = typedlit(ring)
    val h = conv(substring(md5(keyCol.cast("string")), 1, 13), 16, 10)
      .cast("long")
    // try_element_at: an empty successor list (key past the last vnode)
    // must yield NULL for the wrap-around coalesce, not an ANSI error.
    val succ = filter(ringLit, r => r.getField("_1") >= h)
    coalesce(try_element_at(succ, lit(1)).getField("_2"),
      lit(ring.head._2)).cast("long")
  }

  /** One Hilbert-curve refinement level as engine-portable SQL texts —
    * the SAME strings run through Spark `expr` and the DuckDB oracle's
    * CTE chain, so the two engines cannot drift. Level `s` (a power of
    * two) reads quadrant bits rx/ry from columns `__x`/`__y`, adds the
    * quadrant's arc offset to `__d` (3·rx XOR ry, written as the
    * arithmetic identity 3rx + ry − 2·rx·ry so no engine-specific XOR
    * operator appears), and applies the standard reflect-and-swap
    * rotation. The reflection uses n−1 (the FULL grid) so intermediate
    * coordinates stay in [0, n) — never negative, so `&` needs no
    * two's-complement portability argument.
    *
    * Returns (dExpr, xExpr, yExpr); all three read the PREVIOUS level's
    * columns, so they evaluate together in one projection per level.
    */
  def hilbertLevelSql(n: Long, s: Long): (String, String, String) = {
    val rx = s"(CASE WHEN (__x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (__y & $s) > 0 THEN 1 ELSE 0 END)"
    (s"__d + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry)",
      s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 " +
        s"THEN ${n - 1} - __y ELSE __y END) ELSE __x END",
      s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 " +
        s"THEN ${n - 1} - __x ELSE __x END) ELSE __y END")
  }

  /** Hilbert-curve key for 2D layout — the alternative to [[zorderKey]]
    * with strictly better worst-case locality: consecutive curve
    * positions are always grid-adjacent (Z-order jumps across the grid
    * at quadrant seams), so a rectangular predicate maps to FEWER,
    * LONGER contiguous key ranges — fewer row-group seeks for the same
    * selectivity once files are sorted by the key (Jagadish, "Linear
    * clustering of objects with multiple attributes", SIGMOD'90 for the
    * comparison; the xy→d recurrence is the standard reflect-and-swap
    * form). The recurrence is `bits` chained projections (one per
    * level) of branch-free-ish CASE algebra — codegen'd, no UDF, no
    * join; the key rides the scan at any scale, exactly like
    * [[zorderKey]].
    *
    * Inputs must lie in [0, 2^bits); out-of-range rows raise in-plan
    * (the zorderKey discipline). 2·bits ≤ 62 keeps d in a long.
    */
  def hilbertKey(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val n = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.cast("long") >= 0 && c.cast("long") < n, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"hilbertKey: $name out of [0, $n): "), c.cast("string"))))
    var cur = df.withColumn("__x", guarded(x, "x"))
      .withColumn("__y", guarded(y, "y"))
      .withColumn("__d", lit(0L))
    for (lev <- (bits - 1) to 0 by -1) {
      val (dE, xE, yE) = hilbertLevelSql(n, 1L << lev)
      cur = cur.withColumn("__d2", expr(dE)).withColumn("__x2", expr(xE))
        .withColumn("__y2", expr(yE))
        .drop("__d", "__x", "__y")
        .withColumnRenamed("__d2", "__d").withColumnRenamed("__x2", "__x")
        .withColumnRenamed("__y2", "__y")
    }
    cur.withColumn(out, col("__d")).drop("__x", "__y", "__d")
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
