package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational wave (q36–q43): cube, pivot, exact percentiles,
  * correlated subqueries, window analytics beyond ranking, conditional
  * aggregation, array algebra, cross join — rounding out the operator
  * inventory with DuckDB-oracle parity.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // q36: CUBE with grouping markers (generalizes q14's rollup).
  def q36(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g1"),
        grouping(col("o_orderpriority")).cast("int").as("g2"),
        count(lit(1)).as("c"),
        round(sum(col("o_totalprice")), 2).as("tp"))
      .coalesce(1)
      .orderBy(col("g1"), col("g2"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  // q37: pivot — events per type per hour-of-day, wide layout.
  def q37(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(hour(col("ts")).as("h"), col("event_type"))
      .groupBy(col("h"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .coalesce(1)
      .orderBy(col("h"))

  // q38: exact continuous percentiles (median & p90) per group
  // ≙ DuckDB quantile_cont, via [[graft.operators.Stats.quantilesByGroup]]'s
  // distributed rank selection: range-partitioned spillable sorts across
  // ALL cores + bounded per-(partition,group) counts on the driver —
  // unlike a Window.partitionBy(group) sort (parallelism = group count,
  // 3 tasks sorting 33 TB each at scale) or Spark's `percentile`
  // aggregate (unspillable whole-group buffer). The interpolation
  // (pos = p·(n−1), v_floor·(1−frac) + v_ceil·frac) is DuckDB's exact
  // double arithmetic; quantiles ship UNROUNDED because ROUND-of-double
  // is not portable, while the mean keeps its round(2) because partial-
  // sum order is engine-specific.
  def q38(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.quantilesByGroup(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice").as("v")),
        "l_returnflag", "v", Seq("p50" -> 0.5, "p90" -> 0.9))
      .orderBy(col("l_returnflag"))

  // q51: explicit GROUPING SETS (generalizes q14 rollup / q36 cube):
  // (status, priority), (status), and the grand total in one pass.
  def q51(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g1"),
        grouping(col("o_orderpriority")).cast("int").as("g2"),
        count(lit(1)).as("c"),
        round(sum(col("o_totalprice")), 2).as("tp"))
      .coalesce(1)
      .orderBy(col("g1"), col("g2"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  // q39: correlated scalar subquery — orders above their customer's
  // average order value.
  def q39(s: SparkSession, dir: String): DataFrame = {
    val avgPerCust = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("avg_tp"))
    t(s, dir, "orders")
      .join(avgPerCust, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_tp"))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  // q40: conditional aggregation (CASE WHEN inside agg) + FILTER clause.
  def q40(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        count(when(col("l_returnflag") =!= "R", 1)).as("n_kept"),
        round(sum(when(col("l_discount") > 0.05,
          col("l_extendedprice"))).cast("double"), 2).as("disc_rev"))
      .orderBy(col("l_linestatus"))

  // q41: window analytics beyond ranking — dense_rank, ntile, lead.
  def q41(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .withColumn("dr", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("next_price",
        round(coalesce(lead(col("p_retailprice"), 1).over(w), lit(0.0)), 2))
      .filter(col("dr") <= 5)
      .orderBy(col("p_brand"), col("dr"), col("p_partkey"))
  }

  // q42: array algebra over embeddings — slice/sort/sum statistics.
  def q42(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        round(aggregate(transform(col("embedding"), _.cast("double")),
          lit(0.0), (a, x) => a + x), 4).as("vsum"),
        round(element_at(array_sort(transform(col("embedding"),
          _.cast("double"))), -1), 4).as("vmax"),
        round(aggregate(transform(slice(col("embedding"), 1, 8),
          _.cast("double")), lit(0.0), (a, x) => a + x), 4).as("head_sum"))
      .orderBy(col("vec_id"))

  // q43: cross join (small × small) with expression filter — cartesian
  // region × nation pairs that do NOT match.
  def q43(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .filter(col("r_regionkey") =!= col("n_regionkey"))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  // q71: the generic exact salted skew join (operators/SkewJoin.scala) on
  // lineitem (skewed side) vs orders, g=4 — the oracle replays the PLAIN
  // join, so the hash-match certifies salting loses and duplicates
  // nothing (the two-table generalization of q27/q50's salted self-join
  // guarantee).
  def q71(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewJoin.inner(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount")),
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        Seq("l_orderkey"), g = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))

  // q86: q38's 100 TB tier — approximate percentiles via a DETERMINISTIC
  // hash sample (md5-bucket rule, the q66 convention: first hex char
  // < '4' keeps 25%) + an exact integer rank pick within the sample
  // (value at sorted position floor(p·(n−1))+1 — well-defined under ties,
  // no float interpolation), so unlike an opaque sketch the estimate is
  // replayed bit-for-bit by the DuckDB oracle: full hash-match, nothing
  // rows-only. Rank error ~1/√(rate·n): tune the hex threshold down
  // (1/256, 1/4096 …) as n grows — the per-group sort only ever touches
  // the sample. The mean stays exact over the FULL data. Spark's native
  // approx_percentile tier remains envelope-pinned in SketchesSpec.
  def q86(s: SparkSession, dir: String): DataFrame = {
    // r11: the sampled values route through the SAME distributed rank
    // selection as q38 (range-partitioned spillable sorts, bounded
    // per-(partition,group) driver state) with `interpolate = false` —
    // the exact lower-rank pick at floor(p·(n−1)) over the sorted
    // sample, bit-identical to the sorted-array index the r10 shape
    // computed. The r10 single-aggregate fusion buffered the whole 25%
    // sample (rate·n_group doubles) in ONE collect_list aggregation
    // buffer — unspillable and LINEAR in n, the exact failure class
    // quantilesByGroup exists to remove; at the 100 TB target that
    // buffer is an executor OOM, so the fusion was a false economy.
    // The exact mean stays a single codegen'd scan-aggregate over ALL
    // rows; the rank picks come back as a groups-sized local relation
    // joined to it (3 rows — broadcast, no shuffle).
    val li = t(s, dir, "lineitem")
    val sampled = substring(md5(concat(col("l_orderkey").cast("string"),
      lit(":"), col("l_linenumber").cast("string"))), 1, 1) < "4"
    val means = li.groupBy(col("l_returnflag"))
      .agg(round(avg(col("l_extendedprice")), 2).as("mean"))
    val picks = graft.operators.Stats.quantilesByGroup(
      li.filter(sampled)
        .select(col("l_returnflag"), col("l_extendedprice").as("v")),
      "l_returnflag", "v", Seq("p50" -> 0.5, "p90" -> 0.9),
      interpolate = false, includeMean = false)
    means.join(picks, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("p50"), col("p90"), col("mean"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_approx_percentiles" -> (q86 _),
    "q71_salted_join" -> (q71 _),
    "q36_cube" -> (q36 _),
    "q37_pivot" -> (q37 _),
    "q38_percentiles" -> (q38 _),
    "q39_corr_subquery" -> (q39 _),
    "q40_cond_agg" -> (q40 _),
    "q41_window_analytics" -> (q41 _),
    "q42_array_algebra" -> (q42 _),
    "q43_cross_join" -> (q43 _),
    "q51_grouping_sets" -> (q51 _)
  )

  val oracle: Map[String, String] = Map(
    "q86_approx_percentiles" ->
      """-- Single-scan replay: the sorted sample array's element at rank
        |-- FLOOR(p*(n-1))+1 is the same value the ROW_NUMBER formulation
        |-- picked (only the values are ordered). e0 literals force DOUBLE
        |-- (bare decimals are DECIMAL in DuckDB).
        |WITH a AS (SELECT l_returnflag,
        |    ROUND(AVG(l_extendedprice), 2) AS mean,
        |    list_sort(list(l_extendedprice) FILTER (WHERE
        |      substring(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |        CAST(l_linenumber AS VARCHAR)), 1, 1) < '4')) AS s
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  s[CAST(FLOOR(0.5e0 * (len(s) - 1)) AS BIGINT) + 1] AS p50,
        |  s[CAST(FLOOR(0.9e0 * (len(s) - 1)) AS BIGINT) + 1] AS p90,
        |  mean
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q71_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q36_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2,
        |  COUNT(*) AS c, ROUND(SUM(o_totalprice), 2) AS tp
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g1, g2, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin,
    "q37_pivot" ->
      """SELECT CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS h,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS "error",
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin,
    "q38_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  ROUND(AVG(l_extendedprice), 2) AS mean
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q39_corr_subquery" ->
      """SELECT o_orderkey FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q40_cond_agg" ->
      """SELECT l_linestatus,
        |  COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
        |  COUNT(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS n_kept,
        |  ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice END), 2)
        |    AS disc_rev
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q41_window_analytics" ->
      """SELECT p_partkey, p_brand, p_retailprice, dr, quartile, next_price
        |FROM (
        |  SELECT p_partkey, p_brand, p_retailprice,
        |    DENSE_RANK() OVER w AS dr,
        |    NTILE(4) OVER w AS quartile,
        |    ROUND(COALESCE(LEAD(p_retailprice, 1) OVER w, 0.0), 2) AS next_price
        |  FROM part
        |  WINDOW w AS (PARTITION BY p_brand
        |               ORDER BY p_retailprice DESC, p_partkey))
        |WHERE dr <= 5 ORDER BY p_brand, dr, p_partkey""".stripMargin,
    "q42_array_algebra" ->
      """SELECT vec_id,
        |  ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)
        |    AS vsum,
        |  ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)
        |    AS vmax,
        |  ROUND(list_sum(list_transform(embedding[1:8],
        |    x -> CAST(x AS DOUBLE))), 4) AS head_sum
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin,
    "q43_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |WHERE r_regionkey <> n_regionkey
        |ORDER BY r_name, n_name""".stripMargin,
    "q51_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2,
        |  COUNT(*) AS c, ROUND(SUM(o_totalprice), 2) AS tp
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY g1, g2, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin
  )
}
