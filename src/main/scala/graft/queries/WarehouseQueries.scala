package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q206–q213: warehouse / governance certificates added in round 15 —
  * SCD Type-2 interval compression (q206), snapshot churn diff (q207),
  * l-diversity privacy audit (q208), corpus concentration via
  * histogram Gini (q209), hourly burstiness Fano factors (q210),
  * Spearman signal agreement (q211), gaps-and-islands activity streaks
  * (q212), and a join-cardinality-estimation audit of the uniform
  * optimizer-stats model (q213). All exact integer (or DECIMAL(38) /
  * HUGEINT) algebra with full DuckDB oracles; every window is keyed by
  * user/source/type — no partition-less window touches a corpus-sized
  * table.
  */
object WarehouseQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val EpochDay = lit("1970-01-01").cast("date")

  // q206: SCD Type-2 interval build — the warehouse "collapse daily
  // attribute snapshots into validity intervals" operator. The tracked
  // attribute is each user's daily activity tier (high ≥5, mid ≥2,
  // low otherwise, from per-day event counts); consecutive days with
  // the same tier fold into one version with [valid_from, valid_to)
  // epoch-day bounds, valid_to = next version's start (NULL ⇒ current).
  // Scale shape: every window is keyed by user_id (per-key cardinality
  // = that user's active days, bounded by the time span), the version
  // fold is one keyed aggregate — the classic CDC-compaction plan that
  // survives a per-user-bounded 100 TB event log unchanged.
  def q206(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .groupBy(col("user_id"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tier",
        when(col("n") >= 5, "high").when(col("n") >= 2, "mid")
          .otherwise("low"))
    val wd = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val versioned = daily
      .withColumn("chg",
        when(col("tier") <=> lag(col("tier"), 1).over(wd), 0L)
          .otherwise(1L))
      .withColumn("version",
        sum(col("chg")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    versioned
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("day")).as("vf"), min(col("tier")).as("tier"),
        count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      .withColumn("vt", lead(col("vf"), 1).over(wv))
      .select(col("user_id"), col("version"), col("tier"),
        datediff(col("vf"), EpochDay).cast("long").as("valid_from_d"),
        datediff(col("vt"), EpochDay).cast("long").as("valid_to_d"),
        col("n_days"), col("n_events"),
        col("vt").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  // q207: snapshot churn diff — the data-versioning census between two
  // keyed state snapshots (per (user, event_type) activity in the
  // first 60% vs the last 60% of the stream's span; the 20% overlap
  // makes all four statuses reachable). added = key only in B,
  // removed = only in A, changed/unchanged = both with count drift.
  // One full-outer join on the key — the snapshot-diff plan is a
  // single co-partitioned shuffle at any scale, and the output is the
  // status × type census, never the row-level diff.
  def q207(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).filter(col("user_id").isNotNull)
      .withColumn("ts_s", unix_timestamp(col("ts")))
    val bounds = e.agg(min(col("ts_s")).as("lo"), max(col("ts_s")).as("hi"))
      .select(
        expr("lo + (hi - lo) * 6 div 10").as("cut_a"),
        expr("lo + (hi - lo) * 4 div 10").as("cut_b"))
    val tagged = e.crossJoin(broadcast(bounds))
    def snap(cond: Column, name: String): DataFrame =
      tagged.filter(cond)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as(name))
    val a = snap(col("ts_s") <= col("cut_a"), "cnt_a")
    val b = snap(col("ts_s") >= col("cut_b"), "cnt_b")
    a.join(b, Seq("user_id", "event_type"), "full_outer")
      .withColumn("status",
        when(col("cnt_a").isNull, "added")
          .when(col("cnt_b").isNull, "removed")
          .when(col("cnt_a") === col("cnt_b"), "unchanged")
          .otherwise("changed"))
      .groupBy(col("status"), col("event_type"))
      .agg(count(lit(1)).as("n_keys"),
        sum(coalesce(col("cnt_b"), lit(0L)) -
          coalesce(col("cnt_a"), lit(0L))).as("net_delta"))
      .orderBy(col("status"), col("event_type"))
  }

  // q208: l-diversity audit — the privacy gate one step past q129's
  // k-anonymity: a QI group can be k-anonymous yet leak its sensitive
  // attribute when every member shares one value. Per quasi-identifier
  // group (nation, segment): size k, distinct sensitive buckets l
  // (acctbal in 1000-unit bands), the modal bucket's share (e4), and
  // the l<3 violation flag. Two keyed aggregates, no window.
  def q208(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("sens"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("sens"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("c")).as("k_anon"),
        count(lit(1)).as("l_distinct"),
        max(col("c")).as("modal"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("k_anon"),
        col("l_distinct"),
        expr("modal * 10000 div k_anon").as("max_share_e4"),
        (col("l_distinct") < 3).as("violates_l3"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  // q209: corpus concentration — per-source Gini coefficient and
  // top-decile token share of the document-length distribution, the
  // dataset-card "is this source dominated by a few long documents"
  // gauge. Computed EXACTLY on the 1024-bin token histogram (the
  // metric is defined on binned lengths): rank sums per bin are closed
  // form (ranks w₀+1..w₀+c sum to c·w₀ + c(c+1)/2), so Gini needs only
  // the per-source histogram + a 1024-row keyed window — the corpus
  // crosses ONE map-side-combinable aggregate, the otsuThreshold
  // discipline. Products run in DECIMAL(38) (HUGEINT in the oracle):
  // n²·s̄ stays exact past 10¹² docs/source, no silent wrap.
  def q209(s: SparkSession, dir: String): DataFrame = {
    val hist = docs(s, dir)
      .select(col("source"),
        least(size(filter(split(lower(col("text")), " "),
          t => length(t) > 0)), lit(1023)).cast("long").as("sb"))
      .groupBy(col("source"), col("sb")).agg(count(lit(1)).as("c"))
    val wAsc = Window.partitionBy(col("source")).orderBy(col("sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.partitionBy(col("source")).orderBy(col("sb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("source"))
    val enriched = hist
      .withColumn("w0", coalesce(sum(col("c")).over(wAsc), lit(0L)))
      .withColumn("cdp", coalesce(sum(col("c")).over(wDesc), lit(0L)))
      .withColumn("mdp",
        coalesce(sum(col("c") * col("sb")).over(wDesc), lit(0L)))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("m", sum(col("c") * col("sb")).over(wAll))
      // rank-sum term for Gini: s · (c·w₀ + c(c+1)/2), exact in dec38
      // (c(c+1) is even, so `div 2` loses nothing)
      .withColumn("rs",
        expr("CAST(sb AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0)) " +
          "* w0 + CAST(c AS DECIMAL(38,0)) * (c + 1) div 2)"))
    val gini = enriched.groupBy(col("source"))
      .agg(min(col("n")).as("n_docs"), min(col("m")).as("total_tokens"),
        sum(col("rs")).as("s_rank"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("CAST((2 * s_rank - (CAST(n_docs AS DECIMAL(38,0)) + 1) " +
          "* total_tokens) * 10000 div " +
          "(CAST(n_docs AS DECIMAL(38,0)) * total_tokens) AS BIGINT)")
          .as("gini_e4"))
    // top-decile share: t = n - 9n/10 docs from the top; the crossing
    // bin contributes (t - cdp) of its identical-valued docs exactly.
    val top = enriched
      .withColumn("t", col("n") - expr("9 * n div 10"))
      .filter(col("cdp") < col("t") && col("cdp") + col("c") >= col("t"))
      .select(col("source"),
        expr("CAST(mdp + (t - cdp) * sb AS DECIMAL(38,0)) * 10000 div m")
          .as("top10_share_e4"))
    gini.join(top, Seq("source")).orderBy(col("source"))
  }

  // q210: burstiness — per event type, the Fano factor (variance /
  // mean) of hourly arrival counts on the DENSE hour grid (q121's
  // zero-filled spine: omitting empty hours biases the variance), as
  // the exact rational (n·S2 − S1²)·10⁴ // (n·S1): Poisson arrivals
  // sit at 10⁴, bursty streams above, clocklike below. The corpus
  // crosses one (type, hour) aggregate; the stats fold runs on the
  // types × hours grid.
  def q210(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val b = e.select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val hours = e.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(hours))
    grid.join(b, Seq("event_type", "h"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("total"),
        // c² in DECIMAL(38): a 10⁹-events/hour stream would wrap long
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      .select(col("event_type"), col("n_hours"), col("total"),
        // n·S2 − S1² ≥ 0 (Cauchy–Schwarz): positive-operand div only
        expr("(n_hours * s2 - CAST(total AS DECIMAL(38,0)) * total) " +
          "* 10000 div (n_hours * CAST(total AS DECIMAL(38,0)))")
          .as("fano_e4"))
      .withColumn("klass",
        when(col("fano_e4") > 15000, "bursty")
          .when(col("fano_e4") < 7500, "regular")
          .otherwise("poisson-like"))
      .orderBy(col("event_type"))
  }

  // q211: signal agreement — per-source Spearman rank correlation
  // between two quality signals (raw length n_chars vs lexical
  // richness = distinct words), the "do my filters measure the same
  // thing" audit complementing q144's κ on binary labels. Ranks are
  // row_numbers with doc_id tiebreak (deterministic in both engines;
  // documented as tiebroken-Spearman, not midrank), ρ_e4 = 10⁴ −
  // 6·10⁴·Σd² // (n(n²−1)) exact in DECIMAL(38). Windows are keyed by
  // source; the 100× path swaps them for the range-partitioned
  // distributed rank (Indexing.vocab's shape) without changing the
  // rank rule.
  def q211(s: SparkSession, dir: String): DataFrame = {
    val sig = docs(s, dir).select(col("source"), col("doc_id"),
      col("n_chars").as("x"),
      size(array_distinct(filter(split(lower(col("text")), " "),
        t => length(t) > 0))).cast("long").as("y"))
    val rx = Window.partitionBy(col("source"))
      .orderBy(col("x"), col("doc_id"))
    val ry = Window.partitionBy(col("source"))
      .orderBy(col("y"), col("doc_id"))
    sig
      .withColumn("rx", row_number().over(rx).cast("long"))
      .withColumn("ry", row_number().over(ry).cast("long"))
      .groupBy(col("source"))
      // Σd² summed in DECIMAL(38) (it approaches n³/3 under
      // anti-correlation; long wraps silently past n/source ≈ 3·10⁶),
      // then emitted as BIGINT — past that budget run the audit on a
      // per-source sample or swap the keyed windows for the
      // range-partitioned distributed rank (Indexing.vocab's shape).
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(rx - ry AS DECIMAL(38,0)) * (rx - ry)) " +
          "AS BIGINT)").as("sum_d2"))
      .filter(col("n") > 1)
      .select(col("source"), col("n"), col("sum_d2"),
        expr("CAST(10000 - CAST(60000 AS DECIMAL(38,0)) * sum_d2 div " +
          "(CAST(n AS DECIMAL(38,0)) * (n * n - 1)) AS BIGINT)")
          .as("rho_e4"))
      .orderBy(col("source"))
  }

  // q212: gaps-and-islands activity streaks — per user: active-day
  // count, number of maximal consecutive-day runs, and the longest
  // streak with its start (earliest on ties). The islands key is the
  // O(1) day_idx − row_number trick; every window is keyed by user
  // with per-key cardinality bounded by the calendar span.
  def q212(s: SparkSession, dir: String): DataFrame = {
    val days = ev(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), EpochDay).cast("long").as("d"))
      .distinct()
    val wd = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val runs = days
      .withColumn("grp", col("d") - row_number().over(wd))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"))
    val pick = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("start_d"))
    runs
      .withColumn("rk", row_number().over(pick))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(when(col("rk") === 1, col("len"))).as("longest_streak"),
        max(when(col("rk") === 1, col("start_d"))).as("streak_start_d"))
      .orderBy(col("user_id"))
  }

  // q213: join-cardinality-estimation audit — the optimizer-statistics
  // certificate: for three equi-joins (orders⋈lineitem, customer⋈
  // orders, events⋈events self-join), the uniform-NDV textbook
  // estimate |A||B| / max(ndvA, ndvB) vs the TRUE join size computed
  // WITHOUT materializing the join (Σ cA(k)·cB(k) over the per-key
  // count tables — a count-contraction any CBO validation harness
  // runs at scale). Products in DECIMAL(38)/HUGEINT; err_e4 signed.
  def q213(s: SparkSession, dir: String): DataFrame = {
    def audit(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      val ca = left.groupBy(col(lk).as("k")).agg(count(lit(1)).as("ca"))
      val cb = right.groupBy(col(rk).as("k")).agg(count(lit(1)).as("cb"))
      val statsA = ca.agg(sum(col("ca")).as("n_left"),
        count(lit(1)).as("ndv_left"))
      val statsB = cb.agg(sum(col("cb")).as("n_right"),
        count(lit(1)).as("ndv_right"))
      val actual = ca.join(cb, Seq("k"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("actual"))
      statsA.crossJoin(statsB).crossJoin(actual)
        .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
          col("ndv_left"), col("ndv_right"),
          expr("CAST(CAST(n_left AS DECIMAL(38,0)) * n_right div " +
            "greatest(ndv_left, ndv_right) AS BIGINT)").as("est_uniform"),
          col("actual"))
        // signed error with positive-operand division only: Spark's
        // `div` truncates toward zero while DuckDB's `//` floors, so a
        // negative non-exact quotient would diverge between engines
        .withColumn("err_e4",
          expr("CASE WHEN est_uniform >= actual THEN " +
            "CAST(CAST(est_uniform - actual AS DECIMAL(38,0)) * 10000 " +
            "div actual AS BIGINT) ELSE " +
            "-CAST(CAST(actual - est_uniform AS DECIMAL(38,0)) * 10000 " +
            "div actual AS BIGINT) END"))
    }
    val e = ev(s, dir).filter(col("user_id").isNotNull)
    audit("customer_orders", Tables.load(s, dir, "customer"), "c_custkey",
        Tables.load(s, dir, "orders"), "o_custkey")
      .unionByName(audit("events_self", e, "user_id", e, "user_id"))
      .unionByName(audit("orders_lineitem",
        Tables.load(s, dir, "orders"), "o_orderkey",
        Tables.load(s, dir, "lineitem"), "l_orderkey"))
      .orderBy(col("join_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_scd2_intervals" -> (q206 _),
    "q207_snapshot_diff" -> (q207 _),
    "q208_l_diversity" -> (q208 _),
    "q209_gini_concentration" -> (q209 _),
    "q210_burstiness" -> (q210 _),
    "q211_spearman_agreement" -> (q211 _),
    "q212_activity_streaks" -> (q212 _),
    "q213_join_size_estimate" -> (q213 _))

  val oracle: Map[String, String] = Map(
    "q206_scd2_intervals" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT *, CASE WHEN n >= 5 THEN 'high'
        |    WHEN n >= 2 THEN 'mid' ELSE 'low' END AS tier FROM daily),
        |c AS (SELECT *, CASE WHEN tier IS NOT DISTINCT FROM
        |      LAG(tier) OVER (PARTITION BY user_id ORDER BY day)
        |    THEN 0 ELSE 1 END AS chg FROM t),
        |v AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS version FROM c),
        |g AS (SELECT user_id, version, MIN(day) AS vf, MIN(tier) AS tier,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(n) AS BIGINT) AS n_events
        |  FROM v GROUP BY 1, 2),
        |f AS (SELECT *, LEAD(vf) OVER (PARTITION BY user_id
        |    ORDER BY version) AS vt FROM g)
        |SELECT user_id, CAST(version AS BIGINT) AS version, tier,
        |  CAST(vf - DATE '1970-01-01' AS BIGINT) AS valid_from_d,
        |  CAST(vt - DATE '1970-01-01' AS BIGINT) AS valid_to_d,
        |  n_days, n_events, vt IS NULL AS is_current
        |FROM f ORDER BY user_id, version""".stripMargin,
    "q207_snapshot_diff" ->
      """WITH b AS (SELECT MIN(epoch_us(ts) // 1000000) AS lo,
        |    MAX(epoch_us(ts) // 1000000) AS hi FROM events
        |  WHERE user_id IS NOT NULL),
        |cuts AS (SELECT lo + (hi - lo) * 6 // 10 AS cut_a,
        |    lo + (hi - lo) * 4 // 10 AS cut_b FROM b),
        |sa AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS cnt_a
        |  FROM events, cuts
        |  WHERE user_id IS NOT NULL
        |    AND epoch_us(ts) // 1000000 <= cut_a GROUP BY 1, 2),
        |sb AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS cnt_b
        |  FROM events, cuts
        |  WHERE user_id IS NOT NULL
        |    AND epoch_us(ts) // 1000000 >= cut_b GROUP BY 1, 2),
        |d AS (SELECT COALESCE(sa.user_id, sb.user_id) AS user_id,
        |    COALESCE(sa.event_type, sb.event_type) AS event_type,
        |    cnt_a, cnt_b,
        |    CASE WHEN cnt_a IS NULL THEN 'added'
        |      WHEN cnt_b IS NULL THEN 'removed'
        |      WHEN cnt_a = cnt_b THEN 'unchanged'
        |      ELSE 'changed' END AS status
        |  FROM sa FULL OUTER JOIN sb
        |    ON sa.user_id = sb.user_id AND sa.event_type = sb.event_type)
        |SELECT status, event_type, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(COALESCE(cnt_b, 0) - COALESCE(cnt_a, 0)) AS BIGINT)
        |    AS net_delta
        |FROM d GROUP BY 1, 2 ORDER BY status, event_type""".stripMargin,
    "q208_l_diversity" ->
      """WITH cells AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sens,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(SUM(c) AS BIGINT) AS k_anon,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  CAST(MAX(c) * 10000 // SUM(c) AS BIGINT) AS max_share_e4,
        |  COUNT(*) < 3 AS violates_l3
        |FROM cells GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q209_gini_concentration" ->
      """WITH toks AS (SELECT source,
        |    LEAST(len(list_filter(regexp_split_to_array(lower(text), ' '),
        |      x -> LENGTH(x) > 0)), 1023) AS sb
        |  FROM documents),
        |hist AS (SELECT source, CAST(sb AS BIGINT) AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |e AS (SELECT source, sb, c,
        |    COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY sb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS w0,
        |    COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY sb DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cdp,
        |    COALESCE(SUM(c * sb) OVER (PARTITION BY source
        |      ORDER BY sb DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS mdp,
        |    SUM(c) OVER (PARTITION BY source) AS n,
        |    SUM(c * sb) OVER (PARTITION BY source) AS m
        |  FROM hist),
        |rs AS (SELECT source, MIN(n) AS n, MIN(m) AS m,
        |    SUM(CAST(sb AS HUGEINT) * (CAST(c AS HUGEINT) * w0 +
        |      CAST(c AS HUGEINT) * (c + 1) // 2)) AS s_rank
        |  FROM e GROUP BY source),
        |g AS (SELECT source, n AS n_docs, m AS total_tokens,
        |    CAST((2 * s_rank - (CAST(n AS HUGEINT) + 1) * m) * 10000 //
        |      (CAST(n AS HUGEINT) * m) AS BIGINT) AS gini_e4
        |  FROM rs),
        |tp AS (SELECT source,
        |    CAST(CAST(mdp + (n - 9 * n // 10 - cdp) * sb AS HUGEINT)
        |      * 10000 // m AS BIGINT) AS top10_share_e4
        |  FROM e
        |  WHERE cdp < n - 9 * n // 10 AND cdp + c >= n - 9 * n // 10)
        |SELECT g.source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(total_tokens AS BIGINT) AS total_tokens, gini_e4,
        |  top10_share_e4
        |FROM g JOIN tp ON g.source = tp.source
        |ORDER BY g.source""".stripMargin,
    "q210_burstiness" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |r AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
        |    date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |hours AS (SELECT unnest(generate_series(h0, h1,
        |    INTERVAL 1 HOUR)) AS h FROM r),
        |grid AS (SELECT et.event_type, hours.h
        |  FROM (SELECT DISTINCT event_type FROM events) et, hours),
        |filled AS (SELECT grid.event_type, COALESCE(b.c, 0) AS c
        |  FROM grid LEFT JOIN b
        |    ON grid.event_type = b.event_type AND grid.h = b.h),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |    CAST(SUM(c) AS BIGINT) AS total,
        |    SUM(CAST(c AS HUGEINT) * c) AS s2
        |  FROM filled GROUP BY 1),
        |f AS (SELECT event_type, n_hours, total,
        |    CAST((n_hours * s2 - CAST(total AS HUGEINT) * total)
        |      * 10000 // (n_hours * CAST(total AS HUGEINT)) AS BIGINT)
        |      AS fano_e4
        |  FROM st)
        |SELECT event_type, n_hours, total, fano_e4,
        |  CASE WHEN fano_e4 > 15000 THEN 'bursty'
        |    WHEN fano_e4 < 7500 THEN 'regular'
        |    ELSE 'poisson-like' END AS klass
        |FROM f ORDER BY event_type""".stripMargin,
    "q211_spearman_agreement" ->
      """WITH sig AS (SELECT source, doc_id, n_chars AS x,
        |    CAST(len(list_distinct(list_filter(
        |      regexp_split_to_array(lower(text), ' '),
        |      t -> LENGTH(t) > 0))) AS BIGINT) AS y
        |  FROM documents),
        |r AS (SELECT source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY x, doc_id) AS BIGINT) AS rx,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY y, doc_id) AS BIGINT) AS ry
        |  FROM sig),
        |s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS BIGINT)
        |      AS sum_d2
        |  FROM r GROUP BY source)
        |SELECT source, n, sum_d2,
        |  CAST(10000 - CAST(60000 AS HUGEINT) * sum_d2 //
        |    (CAST(n AS HUGEINT) * (n * n - 1)) AS BIGINT) AS rho_e4
        |FROM s WHERE n > 1 ORDER BY source""".stripMargin,
    "q212_activity_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM events),
        |isl AS (SELECT user_id, d,
        |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
        |      AS grp
        |  FROM days),
        |runs AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
        |    MIN(d) AS start_d
        |  FROM isl GROUP BY 1, 2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, start_d) AS r FROM runs)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(MAX(CASE WHEN r = 1 THEN len END) AS BIGINT)
        |    AS longest_streak,
        |  CAST(MAX(CASE WHEN r = 1 THEN start_d END) AS BIGINT)
        |    AS streak_start_d
        |FROM rk GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q213_join_size_estimate" -> {
      def auditSql(name: String, lt: String, lk: String, rt: String,
          rk: String, lf: String, rf: String): String =
        s"""SELECT join_name, n_left, n_right, ndv_left, ndv_right,
           |  est_uniform, actual,
           |  CASE WHEN est_uniform >= actual THEN
           |    CAST(CAST(est_uniform - actual AS HUGEINT) * 10000
           |      // actual AS BIGINT)
           |  ELSE
           |    -CAST(CAST(actual - est_uniform AS HUGEINT) * 10000
           |      // actual AS BIGINT) END AS err_e4
           |FROM (SELECT '$name' AS join_name, n_left, n_right, ndv_left,
           |  ndv_right,
           |  CAST(CAST(n_left AS HUGEINT) * n_right //
           |    GREATEST(ndv_left, ndv_right) AS BIGINT) AS est_uniform,
           |  actual
           |FROM
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_left,
           |     CAST(COUNT(DISTINCT $lk) AS BIGINT) AS ndv_left
           |   FROM $lt $lf),
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_right,
           |     CAST(COUNT(DISTINCT $rk) AS BIGINT) AS ndv_right
           |   FROM $rt $rf),
           |  (SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS actual
           |   FROM (SELECT $lk AS k, CAST(COUNT(*) AS BIGINT) AS ca
           |         FROM $lt $lf GROUP BY 1) a
           |   JOIN (SELECT $rk AS k, CAST(COUNT(*) AS BIGINT) AS cb
           |         FROM $rt $rf GROUP BY 1) b ON a.k = b.k)) q""".stripMargin
      auditSql("customer_orders", "customer", "c_custkey",
        "orders", "o_custkey", "", "") +
        "\nUNION ALL\n" +
        auditSql("events_self", "events", "user_id", "events", "user_id",
          "WHERE user_id IS NOT NULL", "WHERE user_id IS NOT NULL") +
        "\nUNION ALL\n" +
        auditSql("orders_lineitem", "orders", "o_orderkey",
          "lineitem", "l_orderkey", "", "") +
        "\nORDER BY join_name"
    })
}
