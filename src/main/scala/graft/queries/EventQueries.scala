package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q119–q120: event-sequence analytics — ordered funnels and retention
  * cohorts, the product-analytics half of an events pipeline. Both are
  * exact (timestamp arithmetic is lossless at the table's µs
  * granularity; counts and ratios are integer-derived) and fully
  * oracle-replayed.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // q119: ordered conversion funnel signup → view → purchase, each step
  // within 7 days of the previous, greedy-first semantics (first
  // qualifying event per step). The plan is the scale-safe join chain —
  // three per-user aggregates, no per-user event-list materialization
  // (a hot user with 10^8 events would OOM a collect_list walk; here it
  // just aggregates).
  def q119(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_signup"),
        count(col("t2")).as("n_view7"),
        count(col("t3")).as("n_purchase7"))
      .select(col("n_signup"), col("n_view7"), col("n_purchase7"),
        when(col("n_signup") > 0,
          col("n_view7").cast("double") / col("n_signup").cast("double"))
          .as("conv_view"),
        when(col("n_view7") > 0,
          col("n_purchase7").cast("double") / col("n_view7").cast("double"))
          .as("conv_purchase"))
  }

  // q120: weekly retention cohorts — users grouped by the ISO week of
  // their first event; each later active week contributes to the
  // (cohort, offset) cell. Two map-side-combinable aggregates plus one
  // join on user_id; the cohort matrix is weeks², tiny at any corpus
  // size.
  def q120(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val first = e.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val act = e.select(col("user_id"),
      date_trunc("week", col("ts")).as("aw")).distinct()
    act.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        ((unix_timestamp(col("aw")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  // q121: time-series gap fill + moving aggregate — hourly counts per
  // event type on a DENSE hour grid (missing buckets zero-filled from a
  // generated sequence over the observed range), then a 3-bucket
  // trailing moving average. q99's shape discipline: the corpus crosses
  // ONE aggregate; the grid join and the window run on the tiny
  // (types × hours) table. ma3 is a quotient of exact integers — the
  // same IEEE double in every engine.
  def q121(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir)
    val b = e.select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val hours = e.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val grid = e.select(col("event_type")).distinct().crossJoin(hours)
    val filled = grid.join(b, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-2, 0)
    filled
      .withColumn("ma3", sum(col("c")).over(w).cast("double") /
        count(lit(1)).over(w).cast("double"))
      .select(col("event_type"), col("h").as("bucket_start"), col("c"),
        col("ma3"))
      .orderBy(col("event_type"), col("bucket_start"))
  }

  // q170: first-order MARKOV transition matrix over per-user event
  // sequences — the journey model q119's fixed funnel is a slice of:
  // each (prev → next) cell with its count and e4 conditional
  // probability. The lag window is keyed by user (distributed, no
  // global sort); the row-conditional total runs on the types²-sized
  // matrix, never the event stream. (ts, event_id) ordering makes the
  // sequence — and the oracle's LAG replay — deterministic under ties.
  def q170(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_e4",
        expr("CAST(n * 10000 div sum(n) over (partition by prev) " +
          "AS BIGINT)"))
      .orderBy(col("prev"), col("next"))
  }

  // q196: exponential time-decay aggregates per event type — the
  // freshness-weighted popularity report (half-life 7 days, anchored
  // at the stream's own max timestamp so it replays): weights are
  // exact integers (10^6 >> half-life buckets), every sum order-free.
  def q196(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    graft.operators.Decay.timeDecayedAtStreamMax(ev, "event_type",
        col("ts"), col("value"), halflifeSec = 7L * 86400L)
      .orderBy(col("event_type"))
  }

  // q222: CUSUM changepoint monitor over per-type DAILY event volume —
  // the sequential "WHEN did this stream's rate shift" companion to
  // q150's PSI / q195's KS "did it shift at all": one-sided cumulative
  // sums against the type's own mean daily rate, unrolled to prefix-sum
  // minus running-extremum window algebra (no recursion — see
  // [[graft.operators.Drift.cusum]]), exact integers scaled by the day
  // count. is_peak marks the earliest maximum of the upward
  // statistic (the point of strongest evidence; onset = the last
  // prefix minimum before it). All windows keyed by event_type, bounded per key by the
  // calendar span.
  def q222(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.operators.Drift.cusum(daily, "event_type", "day", "n")
      .orderBy(col("event_type"), col("day"))
  }

  // q228: lag-1..7 AUTOCORRELATION of per-type daily volume — the
  // seasonality/persistence read beside q222's level-shift monitor
  // (lag-7 high = weekly rhythm; lag-1 high = bursts persist): the
  // biased sample ACF in exact integers via the D-scaled residuals
  // u_t = D·x_t − T ([[graft.operators.Drift.autocorr]] — the scale
  // factor cancels in the ratio). One keyed window pass materializes
  // the leads; one keyed aggregate emits the (type, lag) matrix.
  def q228(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.operators.Drift.autocorr(daily, "event_type", "day", "n",
      maxLag = 7)
  }

  // q233: RFM SEGMENTATION census — the classic customer-value grid:
  // per purchasing user, Recency (days since last purchase vs the
  // stream's own max-day anchor — the q196 replayable-anchor
  // discipline), Frequency (purchase count) and Monetary (cents, the
  // certified scale-0 ROUND idiom). R and F codes are exact quartiles
  // via VALUE-HISTOGRAM windows — both domains are value-bounded (the
  // calendar span; the per-user count range), so the partition-less
  // window never sees corpus-sized input; a value class straddling a
  // cut takes ONE code (the value-tie rule, deterministic in both
  // engines). M uses fixed business bands ($50/$200/$1000) — the
  // scale-safe choice for an unbounded-domain dimension. Output: the
  // (r, f, m) segment census with user counts and monetary mass.
  def q233(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
    // Anchor day as an in-plan broadcast scalar (r21): the separate
    // max(day) collect action existed only to bake the anchor into a
    // literal; the same one-row aggregate now rides the checkpointed
    // per-user plan — two events scans either way, one action fewer.
    val anchorDf = ev
      .agg(max(expr("unix_timestamp(ts) div 86400")).as("__anchor"))
    val u = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(expr("unix_timestamp(ts) div 86400")).as("__last"),
        count(lit(1)).as("f"),
        sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("m_cents"))
      .crossJoin(broadcast(anchorDf))
      .select(col("user_id"), (col("__anchor") - col("__last"))
        .as("r_days"), col("f"), col("m_cents"))
      .localCheckpoint(true) // two histogram consumers + the final join
    // quartile code from the bounded value histogram: code 1 = the
    // smallest values (for R that means MOST recent)
    def codeMap(c: String): DataFrame = u
      .groupBy(col(c).as("v")).agg(count(lit(1)).as("c"))
      // bounded-domain table (days / count values) — window OK
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      .withColumn("cumb",
        sum(col("c")).over(Window.orderBy(col("v"))) - col("c"))
      .select(col("v"), expr("1 + cumb * 4 div n").as("code"))
    u.join(broadcast(codeMap("r_days")
        .select(col("v").as("r_days"), col("code").as("r_code"))),
        Seq("r_days"))
      .join(broadcast(codeMap("f")
        .select(col("v").as("f"), col("code").as("f_code"))), Seq("f"))
      .withColumn("m_code",
        when(col("m_cents") < 5000L, 1L)
          .when(col("m_cents") < 20000L, 2L)
          .when(col("m_cents") < 100000L, 3L).otherwise(4L))
      .groupBy(col("r_code"), col("f_code"), col("m_code"))
      .agg(count(lit(1)).as("n_users"), sum(col("m_cents")).as("m_total"))
      .orderBy(col("r_code"), col("f_code"), col("m_code"))
  }

  // q237: top SESSION PATHS — the "how do users actually move" census
  // generalizing q170's single-step Markov matrix to 3-step journeys:
  // 30-minute-gap sessions via the lag/cumsum idiom (q46's rule), then
  // consecutive event-type 3-grams WITHIN session (leads stop at the
  // session edge by construction of the keyed window), global top-20
  // by count (ties → path — a TakeOrdered, never a full sort). All
  // windows keyed by user / (user, session); the path census is at
  // most |types|³ rows.
  def q237(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order on the epoch-SECOND anchor + event_id (not the full-µs
    // timestamp): the oracle's sequence must be the same total order,
    // and same-second ties must break identically in both engines
    val byT = Window.partitionBy("user_id")
      .orderBy(col("__t"), col("event_id"))
    val bySess = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("__t"), col("event_id"))
    Tables.load(s, dir, "events")
      .withColumn("__t", unix_timestamp(col("ts")))
      .withColumn("__gap", col("__t") - lag(col("__t"), 1).over(byT))
      .withColumn("sess",
        sum(when(col("__gap").isNull || col("__gap") > 1800L, 1L)
          .otherwise(0L)).over(byT))
      .withColumn("e2", lead(col("event_type"), 1).over(bySess))
      .withColumn("e3", lead(col("event_type"), 2).over(bySess))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q237_session_paths" -> (q237 _),
    "q233_rfm_segments" -> (q233 _),
    "q228_autocorrelation" -> (q228 _),
    "q222_cusum_changepoint" -> (q222 _),
    "q196_time_decay" -> (q196 _),
    "q170_markov_transitions" -> (q170 _),
    "q119_funnel" -> (q119 _),
    "q120_retention" -> (q120 _),
    "q121_gap_fill" -> (q121 _))

  val oracle: Map[String, String] = Map(
    // q237: the same session rule (lag gap > 1800 s on the epoch-sec
    // anchor), in-session leads, and top-20 with the path tie-break.
    "q237_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS t
        |  FROM events),
        |g AS (SELECT *, t - LAG(t) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id) AS gap FROM e),
        |sx AS (SELECT *, SUM(CASE WHEN gap IS NULL OR gap > 1800
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id) AS sess FROM g),
        |p AS (SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id, sess
        |      ORDER BY t, event_id) AS e2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id, sess
        |      ORDER BY t, event_id) AS e3
        |  FROM sx)
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM p WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // q233: same anchor, same quartile-from-histogram code rule
    // (value ties take one code), same fixed monetary bands.
    "q233_rfm_segments" ->
      """WITH anchor AS (SELECT MAX((epoch_us(ts) // 1000000) // 86400)
        |    AS a FROM events),
        |u AS MATERIALIZED (SELECT user_id,
        |    CAST(anchor.a - MAX((epoch_us(ts) // 1000000) // 86400)
        |      AS BIGINT) AS r_days,
        |    CAST(COUNT(*) AS BIGINT) AS f,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS m_cents
        |  FROM events CROSS JOIN anchor
        |  WHERE event_type = 'purchase'
        |  GROUP BY user_id, anchor.a),
        |rh AS (SELECT r_days AS v, COUNT(*) AS c FROM u GROUP BY 1),
        |rm AS (SELECT v, 1 + (SUM(c) OVER (ORDER BY v) - c) * 4
        |    // (SUM(c) OVER ()) AS code FROM rh),
        |fh AS (SELECT f AS v, COUNT(*) AS c FROM u GROUP BY 1),
        |fm AS (SELECT v, 1 + (SUM(c) OVER (ORDER BY v) - c) * 4
        |    // (SUM(c) OVER ()) AS code FROM fh)
        |SELECT CAST(rm.code AS BIGINT) AS r_code,
        |  CAST(fm.code AS BIGINT) AS f_code,
        |  CAST(CASE WHEN m_cents < 5000 THEN 1
        |    WHEN m_cents < 20000 THEN 2
        |    WHEN m_cents < 100000 THEN 3 ELSE 4 END AS BIGINT) AS m_code,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(m_cents) AS BIGINT) AS m_total
        |FROM u JOIN rm ON rm.v = u.r_days JOIN fm ON fm.v = u.f
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q228: LEAD over the same keyed day order; products of exact
    // D-scaled residuals; COUNT(u*uk) = the t ≤ D−k pair count.
    "q228_autocorrelation" -> {
      val leads = (1 to 7).map(k => s"LEAD(u, $k) OVER (PARTITION BY " +
        s"event_type ORDER BY day) AS u$k").mkString(",\n    ")
      val nums = (1 to 7).map(k =>
        s"CAST(SUM(u * u$k) AS BIGINT) AS n$k, " +
          s"CAST(COUNT(u * u$k) AS BIGINT) AS p$k").mkString(",\n    ")
      val rows = (1 to 7).map(k =>
        s"SELECT event_type, CAST($k AS BIGINT) AS lag, p$k AS n_pairs, " +
          s"CASE WHEN den > 0 THEN CAST(n$k * 10000 // den AS BIGINT) " +
          "END AS r_e4 FROM g").mkString("\nUNION ALL\n")
      s"""WITH daily AS (SELECT event_type,
         |    (epoch_us(ts) // 1000000) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type, day, n,
         |    COUNT(*) OVER (PARTITION BY event_type) AS d,
         |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS t
         |  FROM daily),
         |u AS (SELECT event_type, day, d * n - t AS u FROM st),
         |l AS MATERIALIZED (SELECT event_type, u,
         |    $leads
         |  FROM u),
         |g AS MATERIALIZED (SELECT event_type,
         |    CAST(SUM(u * u) AS BIGINT) AS den,
         |    $nums
         |  FROM l GROUP BY 1)
         |$rows
         |ORDER BY event_type, lag""".stripMargin
    },
    // q222: the same day anchor as q196 (epoch_us // 1e6 == Spark's
    // unix_timestamp, then // 86400); prefix sums and running extrema
    // over the same (event_type ORDER BY day) windows — default frames
    // agree (RANGE UNBOUNDED PRECEDING..CURRENT ROW, days unique).
    "q222_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    (epoch_us(ts) // 1000000) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, day, n,
        |    COUNT(*) OVER (PARTITION BY event_type) AS d,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS t,
        |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS cum,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM daily),
        |p AS (SELECT event_type, day, n, d * cum - i * t AS pp FROM st),
        |sx AS (SELECT event_type, day, n,
        |    pp - LEAST(0, MIN(pp) OVER (PARTITION BY event_type
        |      ORDER BY day)) AS s_pos,
        |    GREATEST(0, MAX(pp) OVER (PARTITION BY event_type
        |      ORDER BY day)) - pp AS s_neg
        |  FROM p)
        |SELECT event_type, CAST(day AS BIGINT) AS day, n,
        |  CAST(s_pos AS BIGINT) AS s_pos, CAST(s_neg AS BIGINT) AS s_neg,
        |  (ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY s_pos DESC, day) = 1) AS is_peak
        |FROM sx ORDER BY event_type, day""".stripMargin,
    // q196: the same epoch-second anchor (epoch_us // 1e6 == Spark's
    // unix_timestamp), half-life buckets as integer div, weights as
    // right shifts — every cell exact.
    "q196_time_decay" ->
      """WITH anchor AS (SELECT MAX(epoch_us(ts) // 1000000) AS a
        |  FROM events),
        |w AS (SELECT event_type,
        |    CASE WHEN a - (epoch_us(ts) // 1000000) <= 0 THEN 0
        |      ELSE (a - (epoch_us(ts) // 1000000)) // 604800 END AS k,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v
        |  FROM events CROSS JOIN anchor),
        |ww AS (SELECT event_type,
        |    1000000 >> CAST(LEAST(k, 62) AS INTEGER) AS wgt, v FROM w)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(wgt) AS BIGINT) AS decayed_n_e6,
        |  CAST(SUM(wgt * v) AS BIGINT) AS decayed_value_e8,
        |  CAST(SUM(wgt) // (COUNT(*) * 100) AS BIGINT) AS recency_e4
        |FROM ww GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q170: LAG over the same (user, ts, event_id) order; conditional
    // shares as `//` of exact counts on the matrix-sized aggregate.
    "q170_markov_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev, event_type AS next,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) * 10000 // SUM(COUNT(*)) OVER
        |    (PARTITION BY prev) AS BIGINT) AS p_e4
        |FROM t WHERE prev IS NOT NULL
        |GROUP BY prev, event_type ORDER BY prev, next""".stripMargin,
    "q119_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1
        |         AND e.ts <= s1.t1 + INTERVAL 7 DAY
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |         AND e.ts <= s2.t2 + INTERVAL 7 DAY
        |       GROUP BY 1),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signup,
        |        CAST(COUNT(s2.t2) AS BIGINT) AS n_view7,
        |        CAST(COUNT(s3.t3) AS BIGINT) AS n_purchase7
        |      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |      LEFT JOIN s3 ON s1.user_id = s3.user_id)
        |SELECT n_signup, n_view7, n_purchase7,
        |  CASE WHEN n_signup > 0 THEN
        |    CAST(n_view7 AS DOUBLE) / CAST(n_signup AS DOUBLE) END
        |    AS conv_view,
        |  CASE WHEN n_view7 > 0 THEN
        |    CAST(n_purchase7 AS DOUBLE) / CAST(n_view7 AS DOUBLE) END
        |    AS conv_purchase
        |FROM f""".stripMargin,
    "q121_gap_fill" ->
      """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |r AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
        |        date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |            AS h FROM r),
        |t AS (SELECT DISTINCT event_type FROM events),
        |g AS (SELECT event_type, h FROM t CROSS JOIN hours),
        |f AS (SELECT g.event_type, g.h, COALESCE(b.c, 0) AS c
        |      FROM g LEFT JOIN b ON g.event_type = b.event_type
        |        AND g.h = b.h)
        |SELECT event_type, CAST(h AS TIMESTAMP) AS bucket_start,
        |  CAST(c AS BIGINT) AS c,
        |  CAST(SUM(c) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
        |    AS ma3
        |FROM f
        |WINDOW w AS (PARTITION BY event_type ORDER BY h
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, bucket_start""".stripMargin,
    "q120_retention" ->
      """WITH first AS (SELECT user_id,
        |    date_trunc('week', MIN(ts)) AS cohort_week
        |  FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
        |        FROM events)
        |SELECT CAST(first.cohort_week AS TIMESTAMP) AS cohort_week,
        |  CAST((epoch(act.aw) - epoch(first.cohort_week)) / 604800
        |    AS INT) AS week_offset,
        |  CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
        |FROM act JOIN first ON act.user_id = first.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
