package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface q01–q18 (SURVEY.md §2.9 declared inventory).
  *
  * Each query is a declarative DataFrame plan: filters/projections reach the
  * parquet scan via Catalyst pushdown, dimension joins are explicitly
  * broadcast, and every result carries a total-order sort for oracle
  * comparison (SURVEY §5.4 determinism rules).
  *
  * The matching DuckDB oracle SQL lives in [[oracle]]; column names and types
  * are aligned pairwise (the driver sorts columns by name before hashing).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // q01: scan + project + filter (pushed to parquet).
  def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .filter(col("l_quantity") > 45)
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // q02: composite predicates AND/IN/BETWEEN/LIKE.
  def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderstatus").isin("F", "O")
        && col("o_totalprice").between(1000, 5000)
        && col("o_orderpriority").like("1%"))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))

  // q03: hash aggregation + having (TPC-H Q1 shape).
  def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("c"),
        round(sum(col("l_quantity")), 2).as("sq"),
        round(avg(col("l_extendedprice")), 2).as("ap"))
      .filter(col("c") > 0)
      .coalesce(1)
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // q04: distinct aggregation (expand + two-phase agg under the hood).
  def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("dp"),
        countDistinct(col("l_suppkey")).as("ds"))

  // q05: inner equi-join over broadcast-size dims; Catalyst picks BHJ, the
  // explicit broadcast() hints make the 100 TB plan independent of stats.
  def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("c"))
      .coalesce(1)
      .orderBy(col("r_name"))

  // q06: multi-way join + agg + top-k (TPC-H Q3 shape). customer is the
  // small side of the orders join at any scale ratio → broadcast; the
  // orders⋈lineitem join shuffles on orderkey (co-partitioned agg follows
  // free of an extra shuffle since grouping includes the join key).
  def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  // q07: left outer join + count of nullable key (0 for match-less rows).
  def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  // q08: semi join (EXISTS).
  def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  // q09: anti join (NOT EXISTS). The anti side is pre-aggregated to its
  // distinct join keys: semantics are identical for an equality anti join,
  // and the build side shrinks from |lineitem| rows to |distinct partkey|
  // (fits a broadcast at any scale where part itself is scannable) — a
  // rewrite the optimizer does not do on its own.
  def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .join(t(s, dir, "lineitem").select(col("l_partkey")).distinct(),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))

  // q10: window ranking — top-3 orders per customer.
  def q10(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  // q11: window analytic with explicit ROWS frame + lag.
  def q11(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("running",
        round(sum(col("value"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("prev", round(lag(col("value"), 1, 0).over(w), 2))
      .select(col("event_id"), col("user_id"), col("running"), col("prev"))
      .orderBy(col("event_id"))
  }

  // q12: deterministic sort + offset + limit (TakeOrderedAndProject).
  def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .offset(5)
      .limit(20)

  // q13: set operations (INTERSECT distinct + EXCEPT distinct), tagged and
  // unioned into one deterministic result.
  def q13(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("n"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("n"))
    c.intersect(sup).select(lit("intersect").as("op"), col("n"))
      .unionAll(c.except(sup).select(lit("except").as("op"), col("n")))
      .coalesce(1)
      .orderBy(col("op"), col("n"))
  }

  // q14: rollup with grouping markers (cast to int for oracle type parity).
  def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g1"),
        grouping(col("l_linestatus")).cast("int").as("g2"),
        count(lit(1)).as("c"),
        round(sum(col("l_quantity")), 2).as("sq"))
      .coalesce(1)
      .orderBy(col("g1"), col("g2"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  // q15: scalar string/date/math functions.
  def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        upper(col("event_type")).as("et_upper"),
        substring(col("event_type"), 1, 3).as("et_sub"),
        length(col("props")).as("plen"),
        col("ts").cast("date").as("d"),
        year(col("ts")).as("yr"),
        round(abs(col("value")), 1).as("av"))
      .orderBy(col("event_id"))

  // q16: date_trunc time bucketing (batch analogue of tumbling windows).
  def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("sv"))
      .orderBy(col("h"), col("event_type"))

  // q17: JSON extraction from a string column.
  def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy(col("event_id"))

  // q18: array column scan + cardinality.
  def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), col("label"), size(col("embedding")).as("dim"))
      .orderBy(col("vec_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter" -> (q01 _),
    "q02_predicates" -> (q02 _),
    "q03_agg_having" -> (q03 _),
    "q04_distinct_agg" -> (q04 _),
    "q05_join_dims" -> (q05 _),
    "q06_join_agg_topk" -> (q06 _),
    "q07_left_join" -> (q07 _),
    "q08_semi_join" -> (q08 _),
    "q09_anti_join" -> (q09 _),
    "q10_window_rank" -> (q10 _),
    "q11_window_frame" -> (q11 _),
    "q12_sort_limit_offset" -> (q12 _),
    "q13_set_ops" -> (q13 _),
    "q14_rollup" -> (q14 _),
    "q15_scalar_fns" -> (q15 _),
    "q16_time_bucket" -> (q16 _),
    "q17_json_extract" -> (q17 _),
    "q18_array_ops" -> (q18 _)
  )

  val oracle: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_predicates" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 5000
        |  AND o_orderpriority LIKE '1%' ORDER BY o_orderkey""".stripMargin,
    "q03_agg_having" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
        |  ROUND(SUM(l_quantity), 2) AS sq, ROUND(AVG(l_extendedprice), 2) AS ap
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |HAVING COUNT(*) > 0 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q04_distinct_agg" ->
      """SELECT COUNT(DISTINCT l_partkey) AS dp, COUNT(DISTINCT l_suppkey) AS ds
        |FROM lineitem""".stripMargin,
    "q05_join_dims" ->
      """SELECT r_name, COUNT(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q06_join_agg_topk" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q07_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q09_anti_join" ->
      """SELECT p_partkey FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q11_window_frame" ->
      """SELECT event_id, user_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
        |  ROUND(LAG(value, 1, 0) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), 2) AS prev
        |FROM events ORDER BY event_id""".stripMargin,
    "q12_sort_limit_offset" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 20 OFFSET 5""".stripMargin,
    "q13_set_ops" ->
      """SELECT 'intersect' AS op, n FROM (
        |  SELECT c_nationkey AS n FROM customer
        |  INTERSECT SELECT s_nationkey AS n FROM supplier)
        |UNION ALL
        |SELECT 'except' AS op, n FROM (
        |  SELECT c_nationkey AS n FROM customer
        |  EXCEPT SELECT s_nationkey AS n FROM supplier)
        |ORDER BY op, n""".stripMargin,
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
        |  COUNT(*) AS c, ROUND(SUM(l_quantity), 2) AS sq
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q15_scalar_fns" ->
      """SELECT event_id, UPPER(event_type) AS et_upper,
        |  SUBSTR(event_type, 1, 3) AS et_sub,
        |  CAST(LENGTH(props) AS INTEGER) AS plen,
        |  CAST(ts AS DATE) AS d,
        |  CAST(EXTRACT(YEAR FROM ts) AS INTEGER) AS yr,
        |  ROUND(ABS(value), 1) AS av
        |FROM events ORDER BY event_id""".stripMargin,
    "q16_time_bucket" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
        |  COUNT(*) AS c, ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,
    "q17_json_extract" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q18_array_ops" ->
      """SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin
  )
}
