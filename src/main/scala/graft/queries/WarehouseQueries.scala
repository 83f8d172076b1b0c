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
  def q206(s: SparkSession, dir: String): DataFrame =
    scd2Plan(ev(s, dir))

  /** q206's plan on an arbitrary events frame — shared with the
    * ScaleStress warehouse tier so the scale certificate runs the
    * exact gated plan, not a reimplementation.
    */
  private[graft] def scd2Plan(e: DataFrame): DataFrame = {
    val daily = e
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

  /** Per-(source, binned-token-count) histogram — ONE map-side
    * combinable aggregate over the corpus; q209 (Gini) and q215
    * (weighted quantiles) both fold it through bounded 1024-row keyed
    * windows.
    */
  private def tokHist(d: DataFrame): DataFrame =
    d.select(col("source"),
        least(size(filter(split(lower(col("text")), " "),
          t => length(t) > 0)), lit(1023)).cast("long").as("sb"))
      .groupBy(col("source"), col("sb")).agg(count(lit(1)).as("c"))

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
    val hist = tokHist(docs(s, dir))
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
  def q210(s: SparkSession, dir: String): DataFrame =
    burstinessPlan(ev(s, dir))

  /** q210's plan on an arbitrary events frame (ScaleStress shares it). */
  private[graft] def burstinessPlan(e: DataFrame): DataFrame = {
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
  // 6·10⁴·Σd² // (n(n²−1)) exact in DECIMAL(38). Ranks come from
  // [[graft.operators.Ranks.groupedPrefixSum]]: the keyed window while
  // every source fits one task, the range-partitioned two-pass
  // distributed rank automatically past the budget — same rank rule,
  // same rows either way (RanksSpec drives this plan across the swap).
  def q211(s: SparkSession, dir: String): DataFrame =
    q211Plan(s, dir, graft.operators.Ranks.DefaultWindowBudget)

  private[graft] def q211Plan(s: SparkSession, dir: String,
      windowBudget: Long): DataFrame = {
    val sig = docs(s, dir).select(col("source"), col("doc_id"),
      col("n_chars").as("x"),
      size(array_distinct(filter(split(lower(col("text")), " "),
        t => length(t) > 0))).cast("long").as("y"))
      .withColumn("__one", lit(1L))
    // BOTH ranks through one call — one shared budget trigger (over the
    // pruned group column only), and in the fast path the same stacked
    // two-window single-pass plan the keyed form always had.
    val ranked = graft.operators.Ranks.groupedPrefixSums(sig, "source",
      Seq(graft.operators.Ranks.PrefixSpec(Seq("x", "doc_id"), "__one",
          "__rx0"),
        graft.operators.Ranks.PrefixSpec(Seq("y", "doc_id"), "__one",
          "__ry0")), windowBudget)
    ranked
      .withColumn("rx", col("__rx0") + lit(1L))
      .withColumn("ry", col("__ry0") + lit(1L))
      .groupBy(col("source"))
      // Σd² summed in DECIMAL(38) (it approaches n³/3 under
      // anti-correlation; long wraps silently past n/source ≈ 3·10⁶ —
      // and DECIMAL(38) holds to n/source ≈ 10¹² before this audit
      // needs per-source sampling). The rank swap past the window
      // budget is automatic (Ranks.groupedPrefixSum above).
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
  def q212(s: SparkSession, dir: String): DataFrame =
    streaksPlan(ev(s, dir))

  /** q212's plan on an arbitrary events frame (ScaleStress shares it). */
  private[graft] def streaksPlan(e: DataFrame): DataFrame = {
    val days = e
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
      // ONE full-outer join + ONE 1-row aggregate per pair: side stats
      // (sum/count ignore the other side's nulls) and the true join
      // size (Σ ca·cb — the product is null unless the key matched)
      // fall out of the same pass; the 3-subquery crossJoin form cost
      // 27 AQE stage-jobs of pure scheduling floor.
      ca.join(cb, Seq("k"), "full_outer")
        .agg(sum(col("ca")).as("n_left"),
          count(col("ca")).as("ndv_left"),
          sum(col("cb")).as("n_right"),
          count(col("cb")).as("ndv_right"),
          coalesce(sum(col("ca") * col("cb")), lit(0L)).as("actual"))
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

  // q214: entity-resolution BLOCKING audit — the reduction-ratio /
  // pairs-completeness trade every record-linkage pipeline measures
  // before it dares run a matcher, on the planted messy-URL truth
  // (q185's four variants per page; truth = same page). Three blocking
  // schemes: the canonical URL (perfect), the host (coarse but
  // complete), the raw-URL length (cheap and lossy). EVERYTHING is
  // count algebra — candidate pairs Σ C(c,2) over block sizes,
  // co-blocked truth Σ C(m,2) over (page, key) cells — no pair is ever
  // materialized, which is the only shape that survives a 10¹⁰-record
  // linkage; C(c,2) sums run in DECIMAL(38)/HUGEINT.
  def q214(s: SparkSession, dir: String): DataFrame = {
    val base = graft.operators.WebIngest
      .withMessyUrl(docs(s, dir), "doc_id", "source")
      .select(expr("doc_id div 4").as("page"), col("raw_url"))
    // canonicalizeUrl is interpreted HOF algebra → one-split guard
    val keyed = graft.SparkUtil.ensureParallelism(base)
      .select(col("page"), explode(array(
        struct(lit("canon").as("scheme"),
          graft.operators.WebIngest.canonicalizeUrl(col("raw_url"))
            .as("bkey")),
        struct(lit("host").as("scheme"),
          lower(regexp_extract(col("raw_url"),
            "^[A-Za-z]+://([^/:?#]+)", 1)).as("bkey")),
        struct(lit("len").as("scheme"),
          length(col("raw_url")).cast("string").as("bkey")))).as("r"))
      .select(col("r.scheme").as("scheme"), col("page"),
        col("r.bkey").as("bkey"))
    val pairs2 = (c: String) =>
      s"CAST(CAST($c AS DECIMAL(38,0)) * ($c - 1) div 2 AS DECIMAL(38,0))"
    // ONE aggregation chain per audit side: the (scheme, bkey, page)
    // cells fold into blocks CARRYING the per-cell co-blocked C(m,2)
    // partial, so block stats and pairs-completeness come out of the
    // same two-shuffle chain (a separate co-blocked branch would
    // re-run the canonicalize chain — the Catalyst no-subtree-sharing
    // rule — and an eager checkpoint measured WORSE than the recompute
    // at this row count: lineage conversion beats pipelining only when
    // the recomputed pass is expensive).
    val perScheme = keyed
      .groupBy(col("scheme"), col("bkey"), col("page"))
      .agg(count(lit(1)).as("m"))
      .groupBy(col("scheme"), col("bkey"))
      .agg(sum(col("m")).as("c"),
        expr(s"SUM(${pairs2("m")})").as("cobp"))
      .groupBy(col("scheme"))
      .agg(count(lit(1)).as("n_blocks"),
        expr(s"CAST(SUM(${pairs2("c")}) AS BIGINT)").as("cand_pairs"),
        expr("CAST(SUM(cobp) AS BIGINT)").as("coblocked_pairs"))
    val truth = base.groupBy(col("page")).agg(count(lit(1)).as("v"))
      .agg(sum(col("v")).as("n_rows"),
        expr(s"CAST(SUM(${pairs2("v")}) AS BIGINT)").as("true_pairs"))
    perScheme
      .crossJoin(broadcast(truth))
      .select(col("scheme"), col("n_blocks"), col("cand_pairs"),
        expr("10000 - CAST(cand_pairs AS DECIMAL(38,0)) * 10000 div " +
          "(CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1) div 2)")
          .as("reduction_e4"),
        col("true_pairs"), col("coblocked_pairs"),
        expr("CAST(coblocked_pairs AS DECIMAL(38,0)) * 10000 div " +
          "true_pairs").as("pc_e4"))
      .orderBy(col("scheme"))
  }

  // q215: token-mass-weighted quantiles — per source, the doc-length
  // bins where 25/50/75% of the TOKEN MASS sits (vs the unweighted doc
  // median): the "half our training tokens come from docs longer than
  // X" dataset-card line, which the unweighted median wildly misstates
  // on skewed corpora. Same 1024-bin histogram as q209, answered by
  // conditional-min crossing picks over the cumulative-mass window —
  // the histogram-rank discipline, no data-row sort.
  def q215(s: SparkSession, dir: String): DataFrame = {
    val wAsc = Window.partitionBy(col("source")).orderBy(col("sb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    tokHist(docs(s, dir))
      .withColumn("cm", sum(col("c") * col("sb")).over(wAsc))
      .withColumn("cc", sum(col("c")).over(wAsc))
      .withColumn("m", sum(col("c") * col("sb")).over(wAll))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("source"))
      .agg(min(col("n")).as("n_docs"), min(col("m")).as("total_tokens"),
        min(when(expr("CAST(cc AS DECIMAL(38,0)) * 2 >= n"), col("sb")))
          .as("p50_docs"),
        min(when(expr("CAST(cm AS DECIMAL(38,0)) * 4 >= m"), col("sb")))
          .as("wp25"),
        min(when(expr("CAST(cm AS DECIMAL(38,0)) * 2 >= m"), col("sb")))
          .as("wp50"),
        min(when(expr("CAST(cm AS DECIMAL(38,0)) * 4 >= " +
          "CAST(m AS DECIMAL(38,0)) * 3"), col("sb"))).as("wp75"))
      .orderBy(col("source"))
  }

  // q216: k-fold split balance audit — hash-assign every doc to one of
  // 5 folds (the q188 md5-prefix idiom: deterministic, replayable,
  // scan-local) and measure per-fold stratification drift: for each
  // language, the fold's share of that language in e4 vs the ideal
  // 2000, reported as the fold's max and summed absolute deviation.
  // Two keyed aggregates + one window over the langs × folds cell
  // table (bounded), nothing corpus-sized past the first fold.
  def q216(s: SparkSession, dir: String): DataFrame = {
    val fold = (conv(substring(md5(col("doc_id").cast("string")), 1, 13),
      16, 10).cast("long") % 5).as("fold")
    val cells = docs(s, dir).select(col("lang"), fold)
      .groupBy(col("lang"), col("fold")).agg(count(lit(1)).as("o"))
    val wLang = Window.partitionBy(col("lang"))
    cells
      .withColumn("tl", sum(col("o")).over(wLang))
      .withColumn("dev",
        abs(expr("o * 10000 div tl") - lit(2000L)))
      .groupBy(col("fold"))
      .agg(sum(col("o")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        max(col("dev")).as("max_dev_e4"),
        sum(col("dev")).as("sum_dev_e4"))
      .orderBy(col("fold"))
  }

  // q217: last-touch attribution — every purchase is credited to the
  // user's most recent click/view within a 7-day lookback, the
  // marketing-analytics join that funnel (q119) and Markov journeys
  // (q170) bracket. The "last preceding touch" is a running MAX over a
  // user-keyed window of a single sortable key (epoch-sec·10 + type
  // code — click 1, view 2, so a same-second view outranks the click
  // identically in both engines); no self-join, no range join. Output
  // is the (touch_type, age_days) census.
  def q217(s: SparkSession, dir: String): DataFrame =
    lastTouchPlan(ev(s, dir).filter(col("user_id").isNotNull))

  /** q217's plan on an arbitrary (null-free) events frame (ScaleStress
    * shares it).
    */
  private[graft] def lastTouchPlan(ev0: DataFrame): DataFrame = {
    val e = ev0
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
    val code = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "view", 2L)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("lk",
        max(when(code.isNotNull, col("ts_s") * 10 + code)).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("age_s", col("ts_s") - expr("lk div 10"))
      .withColumn("touch_type",
        when(col("lk").isNull || col("age_s") > 7L * 86400L, "none")
          .otherwise(when(col("lk") % 10 === 1L, "click")
            .otherwise("view")))
      .withColumn("age_days",
        when(col("touch_type") === "none", -1L)
          .otherwise(expr("age_s div 86400")))
      .groupBy(col("touch_type"), col("age_days"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("touch_type"), col("age_days"))
  }

  /** Trailing-ones count of a nonnegative integer column expression,
    * as engine-portable SQL TEXT (the same string runs in Spark and
    * DuckDB): a uniform bit-string has P(t trailing ones) = 2^-(t+1),
    * i.e. t ~ Geometric(1/2) — EXACT integer sampling, no ln/exp.
    * Capped at 20 (P = 2^-21 ≈ 5·10^-7 of reaching the cap).
    */
  private def trailingOnesSql(u: String): String = {
    val cases = (0 to 20).map { i =>
      s"WHEN $u % ${1L << (i + 1)} = ${(1L << i) - 1} THEN $i"
    }.mkString(" ")
    s"CASE $cases ELSE 21 END"
  }

  // q218: DP-noisy-release CALIBRATION audit — per (lang, source) doc
  // counts released under the geometric mechanism (discrete Laplace,
  // ε = ln 2): noise magnitude ~ Geometric(1/2) drawn EXACTLY from the
  // trailing-ones of a seeded md5 bit-string (P(t ones) = 2^-(t+1) —
  // no ln, no float, both engines replay the same bits), sign from the
  // next bit. This is the audit run BEFORE a release ships — true and
  // noisy side by side with the mechanism's tail bound — not the
  // release itself (publishing true_n would defeat the ε). Per-row
  // expression algebra over the cell census; nothing corpus-sized.
  def q218(s: SparkSession, dir: String): DataFrame = {
    val cells = docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("true_n"))
    // 52-bit uniform from the md5-prefix idiom; bit 0 → sign, bits
    // 1.. → the geometric magnitude.
    val h = conv(substring(md5(concat(lit("dp:"), col("lang"),
      lit(":"), col("source"))), 1, 13), 16, 10).cast("long")
    cells
      .withColumn("__h", h)
      .withColumn("__u", expr("__h div 2"))
      .withColumn("mag", expr(trailingOnesSql("__u")).cast("long"))
      .withColumn("noise",
        when(col("__h") % 2 === 0, col("mag")).otherwise(-col("mag")))
      .select(col("lang"), col("source"), col("true_n"), col("noise"),
        (col("true_n") + col("noise")).as("noisy_n"),
        // mechanism tail: P(|noise| ≥ t) = 2^-t ⇒ the 1-in-a-cell-set
        // bound used to pre-check utility before release
        abs(col("noise")).as("abs_noise"))
      .orderBy(col("lang"), col("source"))
  }

  // q219: V-OPTIMAL histogram certificate (Jagadish et al., VLDB'98)
  // — the optimizer-statistics layout choice behind range-partition
  // boundaries and footer-stats pruning: per language, the minimal
  // total SSE achievable with 6 variance-optimal buckets over the
  // 256-bin chars/20 histogram vs the equi-width default, and the
  // improvement the optimal cut buys. The corpus crosses ONE histogram
  // aggregate; the O(k·B²) dynamic program runs DRIVER-SIDE on the
  // bounded (≤256 bins × languages) table — the "d×d moment cells"
  // bounded-collect discipline — with every product in BigInt, exactly
  // mirroring the oracle's HUGEINT unrolled-CTE replay. SSE is the e4
  // integer (ΔS2·ΔC − ΔS1²)·10⁴ div ΔC (exact: that quotient IS
  // SSE·10⁴ before truncation); budget: SSE_e4 < 2⁶³ ⇔ ≲10¹⁰ docs per
  // language at full spread — past that, scale the e4 pin down.
  def q219(s: SparkSession, dir: String): DataFrame = {
    val K = 6
    val hist = docs(s, dir)
      .select(col("lang"),
        least(expr("n_chars div 20"), lit(255L)).as("sb"))
      .groupBy(col("lang"), col("sb")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = hist.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, cells) =>
        val bins = cells.sortBy(_._2).map(t => (t._2, t._3))
        val n = bins.length
        // prefix sums over (count, count·s, count·s²), index 0 = empty
        val pc = new Array[BigInt](n + 1)
        val p1 = new Array[BigInt](n + 1)
        val p2 = new Array[BigInt](n + 1)
        pc(0) = 0; p1(0) = 0; p2(0) = 0
        for (i <- 1 to n) {
          val (sv, cv) = bins(i - 1)
          pc(i) = pc(i - 1) + cv
          p1(i) = p1(i - 1) + BigInt(cv) * sv
          p2(i) = p2(i - 1) + BigInt(cv) * sv * sv
        }
        def sse(a: Int, b: Int): Long = {
          val dc = pc(b) - pc(a)
          val d1 = p1(b) - p1(a)
          val d2 = p2(b) - p2(a)
          ((d2 * dc - d1 * d1) * 10000 / dc).toLong
        }
        val vopt =
          if (n <= K) 0L
          else {
            var prev = Array.tabulate(n + 1)(i =>
              if (i >= 1) sse(0, i) else Long.MaxValue)
            for (_ <- 2 to K) {
              val cur = Array.fill(n + 1)(Long.MaxValue)
              for (i <- 1 to n; m <- 1 until i
                   if prev(m) != Long.MaxValue) {
                val cand = prev(m) + sse(m, i)
                if (cand < cur(i)) cur(i) = cand
              }
              prev = cur
            }
            prev(n)
          }
        // equi-width: fixed value cuts s·6 div 256, SSE summed per cut
        val equiw = bins.groupBy { case (sv, _) => sv * K / 256 }
          .map { case (_, bs) =>
            val dc = BigInt(bs.map(_._2).sum)
            val d1 = bs.map(t => BigInt(t._2) * t._1).sum
            val d2 = bs.map(t => BigInt(t._2) * t._1 * t._1).sum
            ((d2 * dc - d1 * d1) * 10000 / dc).toLong
          }.sum
        val improvement =
          if (equiw > 0) 10000L - vopt * 10000L / equiw else 0L
        (lang, n.toLong, vopt, equiw, improvement)
    }
    import s.implicits._
    rows.toDF("lang", "n_bins", "vopt_sse_e4", "equiw_sse_e4",
      "improvement_e4").orderBy(col("lang"))
  }

  // q226: CUPED experiment readout (Deng et al., WSDM'13) — the
  // variance-reduced A/B metric every experimentation platform ships:
  // users hash-split into arms (md5 first hex < '8' — the q188
  // deterministic-assignment idiom), the post-period purchase value
  // adjusted by the PRE-period covariate, θ = cov(x,y)/var(x) fit on
  // the pooled population. All integer e4: θ as the exact ratio of
  // long moment products (BigInt driver arithmetic on the ONE-row
  // moment aggregate — the d×d bounded-collect discipline; BigInt and
  // DuckDB `//` both truncate toward zero, so negatives replay), the
  // per-arm adjustment as portable integer algebra. Scale shape: one
  // keyed user aggregate (checkpointed — moments + per-arm consumers),
  // then arm-count-sized algebra. Budget: n·Σx² must fit a long —
  // whole-unit values cap the population at ~5·10⁴ users per 2·10⁴
  // value units; past that, coarsen units (documented, require'd).
  def q226(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val purchase = col("event_type") === "purchase"
    val users = graft.Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(purchase && col("ts") < cut,
          round(col("value"), 0).cast("long")).otherwise(0L)).as("x"),
        sum(when(purchase && col("ts") >= cut,
          round(col("value"), 0).cast("long")).otherwise(0L)).as("y"))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"),
          col("user_id").cast("string"))), 1, 1) < "8",
          lit("treat")).otherwise(lit("control")))
      .localCheckpoint(true)
    val m = users.agg(count(lit(1)), sum("x"), sum("y"),
      sum(expr("x * x")), sum(expr("x * y"))).head()
    val (n, sx, sy, sxx, sxy) =
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3),
        m.getLong(4))
    val num = BigInt(n) * sxy - BigInt(sx) * sy
    val den = BigInt(n) * sxx - BigInt(sx) * sx
    require(den > 0, "q226: zero pre-period variance — CUPED undefined")
    require(BigInt(n) * sxx <= BigInt(Long.MaxValue) &&
      (num * 10000).abs <= BigInt(Long.MaxValue) * 10000,
      "q226: moment products exceed the long budget; coarsen value units")
    val thetaE4 = (num * 10000 / den).toLong
    val xbarE4 = sx * 10000L / n
    users.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum("x").as("sxa"),
        sum("y").as("sya"))
      .select(col("arm"), col("n_users"),
        expr("sxa * 10000 div n_users").as("mean_pre_e4"),
        expr("sya * 10000 div n_users").as("mean_post_e4"),
        expr(s"sya * 10000 div n_users - ($thetaE4 * " +
          s"(sxa * 10000 div n_users - $xbarE4)) div 10000")
          .as("adj_post_e4"),
        lit(thetaE4).as("theta_e4"))
      .orderBy("arm")
  }

  /** Benford e4 expectations log10(1 + 1/d), HALF_UP — the canonical
    * first-digit law table, pinned as literals in BOTH engines.
    */
  private val BenfordE4: Seq[(Long, Long)] = Seq(1L -> 3010L,
    2L -> 1761L, 3L -> 1249L, 4L -> 969L, 5L -> 792L, 6L -> 669L,
    7L -> 580L, 8L -> 512L, 9L -> 458L)

  // q227: BENFORD first-digit audit over order totals — the
  // data-forensics read: organic multiplicative amounts follow
  // log10(1+1/d); uniform/synthetic/fabricated columns deviate, and
  // the per-digit deviation IS the detector (here it flags the
  // testdata's uniform price generator — the audit working as
  // intended). First digit via floor-then-string (CAST of a DOUBLE to
  // BIGINT rounds in DuckDB but truncates in Spark — floor first is
  // the portable form). ONE corpus aggregate into 9 digit rows; the
  // share window runs on that bounded table.
  def q227(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exp = BenfordE4.toDF("digit", "benford_e4")
    graft.Tables.load(s, dir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      // partition-less window over the ≤9-digit table only
      .withColumn("share_e4", expr("n * 10000 div sum(n) over ()"))
      .join(broadcast(exp), Seq("digit"))
      .withColumn("dev_e4", abs(col("share_e4") - col("benford_e4")))
      .select(col("digit"), col("n"), col("share_e4"),
        col("benford_e4"), col("dev_e4"))
      .coalesce(1)
      .orderBy("digit")
  }

  // q229: exact 10%-each-end TRIMMED mean of the order total per
  // priority class — the robust KPI center a plain mean loses to whale
  // orders, row-exact even when ties straddle the cut (boundary
  // values count with PARTIAL multiplicity — see
  // [[graft.operators.Stats.trimmedMeanByGroup]]): one (group, cents)
  // histogram aggregate, keyed cumulative windows, no corpus sort.
  // Cents via the certified scale-0 ROUND idiom (q196).
  def q229(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.trimmedMeanByGroup(
      graft.Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"),
          expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents")),
      "o_orderpriority", "cents", trimNum = 1, trimDen = 10)

  // q232: market-basket ASSOCIATION RULES (support / confidence /
  // lift) over order baskets — the apriori level the warehouse
  // actually runs: within-basket ordered pairs, then the pair
  // support floor (which by apriori monotonicity subsumes a
  // frequent-item prefilter: an item below the floor cannot appear
  // in a qualifying pair). Lift is the exact integer n_pair·N·10⁴
  // div (n1·n2); its long budget (n_pair·N ≤ 9.2·10¹⁴) is raise'd
  // in-plan per pair (the ksReport pattern).
  def q232(s: SparkSession, dir: String): DataFrame = {
    val minSup = 3L
    // Baskets as per-order SORTED part arrays in ONE aggregate (r21 —
    // the q194 shape): `collect_set` dedups (order, part) inside the
    // aggregate buffer, so the standalone `distinct()` pass is gone;
    // the basket census N and the item counts both derive from the
    // materialized basket table (same values: one row per order, one
    // exploded row per distinct (o, p)). Ordered pairs unnest
    // map-side (posexplode × slice, p1 < p2 by the sort) instead of
    // the o-keyed self-join, whose two exchanges + sorts are gone.
    // The former frequent-item PREFILTER is gone too — it never
    // changed results (n_pair ≥ minSup forces np(p1), np(p2) ≥
    // minSup, the apriori monotonicity itself), and TPC-H baskets
    // are ≤ 7 lines so per-row pair fan-out is bounded without it;
    // a corpus with unbounded baskets would reintroduce a prune (the
    // q194 maxBasket cap) BEFORE pair generation.
    val arrs = graft.SparkUtil.ensureParallelism(
      graft.Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("__ps"))
      ).localCheckpoint(true) // consumers: census, item counts, pairs
    // Basket census N as an in-plan broadcast scalar (r21): the r19
    // shape ran a SEPARATE `distinct().count()` action — one more
    // sequential driver round-trip before any rule work could start —
    // only to fold the result back in as a literal. The basket table
    // already has exactly one row per order.
    val nDf = arrs.agg(count(lit(1)).as("__nn"))
    val itemN = arrs.select(explode(col("__ps")).as("p"))
      .groupBy("p").agg(count(lit(1)).as("np"))
      .localCheckpoint(true) // consumers: two rule joins
    arrs
      .select(col("__ps"),
        posexplode(col("__ps")).as(Seq("__i", "p1")))
      .select(col("p1"),
        explode(slice(col("__ps"), col("__i") + 2,
          size(col("__ps")) - col("__i") - 1)).as("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSup)
      .join(itemN.select(col("p").as("p1"), col("np").as("n1")), "p1")
      .join(itemN.select(col("p").as("p2"), col("np").as("n2")), "p2")
      .crossJoin(broadcast(nDf))
      .select(col("p1"), col("p2"), col("n_pair"), col("n1"), col("n2"),
        expr("n_pair * 10000 div n1").as("conf12_e4"),
        expr("n_pair * 10000 div n2").as("conf21_e4"),
        when(col("n_pair").cast("double") * col("__nn").cast("double") >
            lit(9.2e14),
          raise_error(lit("q232: n_pair*N overflows the e4 lift " +
            "budget; sample baskets first")))
          .otherwise(expr("n_pair * __nn * 10000 div (n1 * n2)"))
          .as("lift_e4"))
      .orderBy(col("p1"), col("p2"))
  }

  // q234: ABC / PARETO revenue classification — the inventory-policy
  // cut ("class A carries 80% of revenue, B the next 15%"): per-part
  // revenue in exact cents (scale-0 ROUND of the same IEEE product —
  // the q92 discipline), then the cut VALUES from a descending
  // cumulative-mass window over the revenue-DOLLAR histogram (the
  // q215 weighted-quantile shape: the window input is value-domain
  // bounded, never part-count bounded — the global part rank a naive
  // ABC sorts for is exactly the single-partition window the q87 fix
  // removed). cutA = largest dollar value whose ≥-tail carries ≥ 4/5
  // of total mass (exact integer cross-multiplication, no floats);
  // parts sharing a boundary value share a class (the value-cut form
  // of ABC — deterministic in both engines). Output: per class, part
  // count, revenue and exact e4 share.
  def q234(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = graft.Tables.load(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(expr(
        "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
        .as("rev"))
      .localCheckpoint(true) // histogram + classification consumers
    val hist = rev.groupBy(expr("rev div 100").as("rd"))
      .agg(sum(col("rev")).as("mass"))
      // value-domain-bounded dollar histogram — window OK
      .withColumn("cm", sum(col("mass")).over(Window.orderBy(col("rd").desc)))
      .withColumn("total", sum(col("mass")).over(Window.partitionBy()))
    val cuts = hist.agg(
      max(when(col("cm") * 5 >= col("total") * 4, col("rd"))).as("cutA"),
      max(when(col("cm") * 20 >= col("total") * 19, col("rd"))).as("cutB"),
      max(col("total")).as("total")).head()
    val (cutA, cutB, total) =
      (cuts.getLong(0), cuts.getLong(1), cuts.getLong(2))
    rev.withColumn("abc_class",
        when(expr("rev div 100") >= cutA, "A")
          .when(expr("rev div 100") >= cutB, "B").otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("revenue_cents"))
      .withColumn("share_e4", expr(s"revenue_cents * 10000 div ${total}L"))
      .orderBy(col("abc_class"))
  }

  // q235: A/B conversion CHI-SQUARE — the significance read on q226's
  // experiment: did the treatment arm convert (become a HEAVY
  // post-period buyer, ≥8 purchases — every synthetic user purchases
  // at least once, so plain did-purchase is a degenerate margin) at a
  // different rate? Pearson's 2×2 statistic computed
  // EXACTLY: the four cells are one keyed aggregate + a 2-row bounded
  // collect, χ² = N·(ad−bc)²·10⁴ div (row·row·col·col margins) in
  // BigInt on the driver (the d×d discipline — (ad−bc)² needs ~N⁴,
  // far past a long; BigInt and DuckDB HUGEINT `//` agree), so the e4
  // statistic replays bit-for-bit. Read against 3.84 (95%) / 6.63
  // (99%) — the χ²₁ thresholds belong in the reader's head, not the
  // engine.
  def q235(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit("2024-01-16").cast("timestamp")
    val u = graft.Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase" &&
        col("ts") >= cut, 1L).otherwise(0L)) >= 8, 1L).otherwise(0L)
        .as("conv"))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"),
          col("user_id").cast("string"))), 1, 1) < "8",
          lit("treat")).otherwise(lit("control")))
    val cells = u.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("conv").as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (nt, kt) = cells("treat")
    val (nc, kc) = cells("control")
    val (colC, colN) = (kt + kc, nt + nc - kt - kc)
    require(colC > 0 && colN > 0 && nt > 0 && nc > 0,
      "q235: a degenerate margin makes chi-square undefined")
    val dd = BigInt(kt) * (nc - kc) - BigInt(kc) * (nt - kt)
    val chi2E4 = (BigInt(nt + nc) * dd * dd * 10000 /
      (BigInt(nt) * nc * colC * colN)).toLong
    Seq((nt, kt, nc, kc, kt * 10000L / nt, kc * 10000L / nc, chi2E4))
      .toDF("n_treat", "conv_treat", "n_control", "conv_control",
        "rate_treat_e4", "rate_control_e4", "chi2_e4")
  }

  /** q238's feature columns as exact integer expressions — shared by
    * the engine and the oracle generator so the moment definitions
    * cannot drift. (name, Spark/DuckDB-portable SQL over lineitem).
    */
  private val CorrFeatures: Seq[(String, String)] = Seq(
    "quantity" -> "CAST(l_quantity AS BIGINT)",
    "price_c" -> "CAST(ROUND(l_extendedprice * 100) AS BIGINT)",
    "disc_e2" -> "CAST(ROUND(l_discount * 100) AS BIGINT)",
    "tax_e2" -> "CAST(ROUND(l_tax * 100) AS BIGINT)")

  // q238: pairwise CORRELATION matrix over the lineitem measure
  // columns — the profiling step before any feature is trusted in a
  // model or a mixture weight. Pearson r needs a sqrt no engine pair
  // computes bit-identically, so the certified statistic is SIGNED
  // r²·10⁴ — computed as the SLOPE PRODUCT r² = b_xy·b_yx (the two
  // regression slopes), each slope a truncated e6 integer: squaring
  // the covariance numerator directly would pass even int128 at
  // sf0.1 (num² ~ 10⁵¹), while Cauchy–Schwarz bounds the slope
  // product at 10¹² and each factor at ~10¹⁶ — inside HUGEINT and
  // BigInt alike, truncation toward zero in both. Driver BigInt over
  // the ONE-row moment aggregate (the d×d discipline — F(F+3)/2
  // cells, all map-side combinable; product sums accumulate in
  // decimal(38,0), since Σprice² passes a long at sf0.1 already).
  // NULL when a feature is constant (no variance to correlate).
  def q238(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = CorrFeatures.map(_._1)
    val li = graft.Tables.load(s, dir, "lineitem")
      .select(CorrFeatures.map { case (n, e) => expr(e).as(n) }: _*)
    val aggs = (f.map(c => sum(col(c)).as(s"s_$c")) ++
      (for { i <- f.indices; j <- i until f.length } yield
        sum(expr(s"CAST(${f(i)} AS DECIMAL(38,0)) * ${f(j)}"))
          .as(s"p_${i}_$j")))
    val m = li.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = m.getLong(0)
    def sm(i: Int) = BigInt(m.getAs[Long](s"s_${f(i)}"))
    def pm(i: Int, j: Int) = BigInt(m.getAs[java.math.BigDecimal](
      s"p_${math.min(i, j)}_${math.max(i, j)}").toBigInteger)
    val rows = for { i <- f.indices; j <- (i + 1) until f.length } yield {
      val num = BigInt(n) * pm(i, j) - sm(i) * sm(j)
      val di = BigInt(n) * pm(i, i) - sm(i) * sm(i)
      val dj = BigInt(n) * pm(j, j) - sm(j) * sm(j)
      val r2: Option[Long] =
        if (di == 0 || dj == 0) None
        else {
          val q = ((num * 1000000 / di) * (num * 1000000 / dj) /
            100000000L).toLong
          Some(if (num < 0) -q else q)
        }
      (f(i), f(j), r2)
    }
    rows.toDF("col_x", "col_y", "signed_r2_e4")
      .orderBy("col_x", "col_y")
  }

  // q248: KAPLAN-MEIER survival — the time-to-event estimator every
  // conversion/churn analysis runs (here: days from a user's first
  // `signup` to their first subsequent `purchase`, administratively
  // censored at a 2-day study horizon — users converting later are
  // observed only as "still unconverted at day 2", the right-censoring
  // KM exists to handle; the margins are healthy at every SF:
  // 11/110/1008 events vs 4/40/492 censored). Estimator conventions
  // pinned identically in both engines: events at t precede censoring
  // at t (censored-at-t users are IN the t risk set), survival is the
  // exact integer recurrence S_e6(i) = S_e6(i-1)·(n_i−d_i) div n_i
  // from 10⁶ — a per-step floor both engines share (all terms
  // positive), replayed in DuckDB as a RECURSIVE CTE over the
  // row-numbered duration table. Scale shape: two keyed user-level
  // aggregates cross the corpus; the KM table itself is CALENDAR-
  // BOUNDED (≤ horizon+1 rows — durations are whole days), so the
  // descending at-risk cumulation and the driver-side BigInt fold run
  // on a ≤3-row table at any corpus size (the otsuThreshold
  // discipline).
  def q248(s: SparkSession, dir: String): DataFrame = {
    val horizon = 2 // study cutoff, days
    val e = ev(s, dir).filter(col("user_id").isNotNull)
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("st"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("ts") >= col("st"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
    val durs = su.join(pu, Seq("user_id"), "left")
      .select(
        datediff(col("pt").cast("date"), col("st").cast("date"))
          .as("rawdur"))
      .select(
        when(col("rawdur").isNotNull && col("rawdur") <= horizon,
          col("rawdur")).otherwise(lit(horizon)).as("duration_days"),
        (col("rawdur").isNotNull && col("rawdur") <= horizon)
          .cast("long").as("d"),
        (col("rawdur").isNull || col("rawdur") > horizon)
          .cast("long").as("c"))
      .groupBy(col("duration_days"))
      .agg(sum(col("d")).as("n_churn"), sum(col("c")).as("n_censored"))
    // ≤ horizon+1 rows from here on: the at-risk cumulation and the
    // survival fold are value-histogram-bounded, never corpus-sized.
    val rows = durs.orderBy(col("duration_days")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val totalAtRisk = rows.map(r => r._2 + r._3).sum
    var atRisk = totalAtRisk
    var s6 = BigInt(1000000)
    val km = rows.map { case (t, d, c) =>
      val n = atRisk
      s6 = s6 * (n - d) / n // positive: floor == truncate == DuckDB //
      atRisk -= (d + c)
      (t, n, d, c, s6.toLong)
    }
    import s.implicits._
    km.toSeq
      .toDF("duration_days", "n_risk", "n_churn", "n_censored", "surv_e6")
      .orderBy(col("duration_days"))
  }

  // q249: T-CLOSENESS privacy audit — the third rung of the anonymity
  // ladder (q129 k-anonymity: groups big enough; q208 l-diversity:
  // enough distinct sensitive values; t-closeness: the group's
  // SENSITIVE DISTRIBUTION must not diverge from the global one — a
  // group can be 5-diverse yet consist almost entirely of one balance
  // band, leaking by skew). Distance = the Earth Mover's Distance for
  // ordered attributes (Li et al.'s t-closeness form): mean |cumulative
  // difference| over the B ordered acctbal bands, computed EXACTLY on
  // the common denominator N_g·M — the per-band cumulation A_j =
  // Σ_{i≤j}(n_i·M − m_i·N_g) is integer, emd_e6 = 10⁶·Σ|A_j| div
  // (N_g·M·(B−1)) in DECIMAL(38)/HUGEINT (exact past 10¹² rows).
  // Groups are audited RELATIVELY (worst quartile by exact rank) —
  // absolute-t flags are SF-degenerate on this synthetic table (every
  // group violates t=0.15 at sf0.001, none at sf0.1). Scale shape: one
  // (QI, band) aggregate crosses the corpus; the spine/cumulation run
  // on the groups×bands grid (≤ 125×11).
  def q249(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.load(s, dir, "customer")
      .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val grp = b.groupBy(col("nk"), col("seg"), col("band"))
      .agg(count(lit(1)).as("c"))
    val gt = grp.groupBy(col("nk"), col("seg"))
      .agg(sum(col("c")).as("ng"))
    val gl = b.groupBy(col("band")).agg(count(lit(1)).as("m"))
    val tot = b.agg(count(lit(1)).as("mm"))
    // Dense spine: every group × every GLOBAL band (a group missing a
    // band contributes n_i = 0, not a missing row — omitting it biases
    // the cumulation).
    val spine = gt.crossJoin(broadcast(gl)).crossJoin(broadcast(tot))
    val j = spine.join(grp, Seq("nk", "seg", "band"), "left")
      .select(col("nk"), col("seg"), col("ng"), col("band"), col("mm"),
        coalesce(col("c"), lit(0L)).as("c"), col("m"))
    val w = Window.partitionBy(col("nk"), col("seg"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = j.withColumn("a",
      sum(col("c").cast("decimal(38,0)") * col("mm") -
        col("m").cast("decimal(38,0)") * col("ng")).over(w))
    val emd = cum.groupBy(col("nk"), col("seg"))
      .agg(max(col("ng")).as("k_anon"), max(col("mm")).as("mm"),
        sum(abs(col("a"))).as("sabs"), count(lit(1)).as("nb"))
      .select(col("nk"), col("seg"), col("k_anon"),
        expr("""cast((cast(sabs as decimal(38,0)) * 1000000) div
          (cast(k_anon as decimal(38,0)) * mm * (nb - 1)) as bigint)""")
          .as("emd_e6"))
    // Worst quartile by exact rank (ties broken by the QI key — total
    // and deterministic in both engines).
    val wr = Window.orderBy(col("emd_e6").desc, col("nk"), col("seg"))
    val n = emd.count()
    emd.withColumn("r", row_number().over(wr))
      .select(col("nk"), col("seg"), col("k_anon"), col("emd_e6"),
        (col("r") * 4 <= n).as("worst_quartile"))
      .orderBy(col("nk"), col("seg"))
  }

  // q250: MANN-WHITNEY U — the nonparametric two-sample location test
  // (does `value` for event type X come from a shifted distribution
  // vs `purchase`?), exact to the integer: tie-averaged DOUBLED ranks
  // (the average rank of a tie run starting after w₀ rows with c
  // members is (2w₀+c+1)/2 — its double is integer), U₂ = 2U =
  // R₂ − n₁(n₁+1), and the rank-biserial effect size r = 2U/(n₁n₂) − 1
  // as sign·(|U₂−n₁n₂|·10⁶ div n₁n₂) — truncation toward zero made
  // explicit so both engines agree on negative effects. Purchase rows
  // replicate once per comparison pair (map-side, ×|types|−1, bounded).
  // Scale shape: one (pair, value) aggregate crosses the corpus; the
  // rank cumulation runs through
  // [[graft.operators.Ranks.groupedPrefixSum]] — the pair-keyed window
  // over the distinct-value table while a pair's value-distinct
  // cardinality fits the budget, the range-partitioned two-pass
  // distributed cumulation automatically past it (same rows either
  // way; RanksSpec drives this plan across the swap).
  def q250(s: SparkSession, dir: String): DataFrame =
    q250Plan(s, dir, graft.operators.Ranks.DefaultWindowBudget)

  private[graft] def q250Plan(s: SparkSession, dir: String,
      windowBudget: Long): DataFrame = {
    val e = ev(s, dir).select(col("event_type"), col("value"))
    val types = Seq("click", "error", "signup", "view")
    val cohort1 = e.filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("pair"), col("value"),
        lit(1L).as("is1"))
    val cohort2 = e.filter(col("event_type") === "purchase")
      .select(explode(typedLit(types)).as("pair"), col("value"),
        lit(0L).as("is1"))
    // Eager local checkpoint: the budget trigger AND the cumulation both
    // consume this table; without it each would re-run the full events
    // aggregate (Catalyst shares no subtrees). Bounded state: one row
    // per (pair, distinct value) — the same arbitration-sized bound the
    // windowed form already relied on. (Not fault-tolerant on executor
    // loss — the Packing.prefixSums tradeoff, documented there.)
    val byVal = cohort1.unionByName(cohort2)
      .groupBy(col("pair"), col("value"))
      .agg(count(lit(1)).as("call"), sum(col("is1")).as("c1"))
      .localCheckpoint(true)
    // w0 = rows strictly before this value in its pair = the EXCLUSIVE
    // prefix sum of the per-value counts (values are distinct within a
    // pair after the aggregate, so the order is total).
    val ranked = graft.operators.Ranks.groupedPrefixSum(byVal, "pair",
      Seq("value"), "call", "w0", windowBudget)
    ranked.groupBy(col("pair"))
      .agg(sum(col("c1")).as("n1"),
        sum(col("call") - col("c1")).as("n2"),
        sum(col("c1") * (lit(2L) * col("w0") + col("call") + 1L))
          .as("r2"))
      .select(col("pair"), col("n1"), col("n2"),
        (col("r2") - col("n1") * (col("n1") + 1L)).as("u2"))
      .select(col("pair"), col("n1"), col("n2"), col("u2"),
        expr("""cast(sign(u2 - n1 * n2) as bigint) *
          ((abs(u2 - n1 * n2) * 1000000) div (n1 * n2))""").as("rb_e6"))
      .orderBy(col("pair"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_kaplan_meier" -> (q248 _),
    "q249_t_closeness" -> (q249 _),
    "q250_mann_whitney" -> (q250 _),
    "q238_corr_matrix" -> (q238 _),
    "q235_ab_chisquare" -> (q235 _),
    "q234_abc_classification" -> (q234 _),
    "q232_association_rules" -> (q232 _),
    "q229_trimmed_mean" -> (q229 _),
    "q226_cuped_readout" -> (q226 _),
    "q227_benford_audit" -> (q227 _),
    "q206_scd2_intervals" -> (q206 _),
    "q207_snapshot_diff" -> (q207 _),
    "q208_l_diversity" -> (q208 _),
    "q209_gini_concentration" -> (q209 _),
    "q210_burstiness" -> (q210 _),
    "q211_spearman_agreement" -> (q211 _),
    "q212_activity_streaks" -> (q212 _),
    "q213_join_size_estimate" -> (q213 _),
    "q214_blocking_audit" -> (q214 _),
    "q215_weighted_quantiles" -> (q215 _),
    "q216_kfold_balance" -> (q216 _),
    "q217_last_touch" -> (q217 _),
    "q218_dp_noisy_release" -> (q218 _),
    "q219_vopt_histogram" -> (q219 _))

  val oracle: Map[String, String] = Map(
    // q248: the same duration table (identical censoring conventions)
    // with the survival recurrence replayed as a RECURSIVE CTE — the
    // same per-step integer floor (all terms positive, so DuckDB //
    // == BigInt /).
    "q248_kaplan_meier" ->
      """WITH RECURSIVE
        |su AS (SELECT user_id, min(ts) st FROM events
        |       WHERE event_type = 'signup' AND user_id IS NOT NULL
        |       GROUP BY 1),
        |pu AS (SELECT e.user_id, min(e.ts) pt FROM events e
        |       JOIN su ON su.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= su.st
        |       GROUP BY 1),
        |d0 AS (SELECT su.user_id,
        |         date_diff('day', CAST(su.st AS DATE), CAST(pu.pt AS DATE))
        |           AS rawdur
        |       FROM su LEFT JOIN pu ON pu.user_id = su.user_id),
        |d AS (SELECT
        |        CASE WHEN rawdur IS NOT NULL AND rawdur <= 2
        |          THEN rawdur ELSE 2 END AS duration_days,
        |        CASE WHEN rawdur IS NOT NULL AND rawdur <= 2
        |          THEN 1 ELSE 0 END AS dd,
        |        CASE WHEN rawdur IS NULL OR rawdur > 2
        |          THEN 1 ELSE 0 END AS cc
        |      FROM d0),
        |g AS (SELECT duration_days, CAST(SUM(dd) AS BIGINT) AS n_churn,
        |        CAST(SUM(cc) AS BIGINT) AS n_censored
        |      FROM d GROUP BY 1),
        |k AS (SELECT duration_days, n_churn, n_censored,
        |        CAST(SUM(n_churn + n_censored)
        |          OVER (ORDER BY duration_days DESC) AS BIGINT) AS n_risk,
        |        row_number() OVER (ORDER BY duration_days) AS rn
        |      FROM g),
        |rec AS (
        |  SELECT rn, duration_days, n_risk, n_churn, n_censored,
        |    (1000000 * (n_risk - n_churn)) // n_risk AS s
        |  FROM k WHERE rn = 1
        |  UNION ALL
        |  SELECT k.rn, k.duration_days, k.n_risk, k.n_churn,
        |    k.n_censored, (r.s * (k.n_risk - k.n_churn)) // k.n_risk
        |  FROM k JOIN rec r ON k.rn = r.rn + 1)
        |SELECT CAST(duration_days AS INTEGER) AS duration_days, n_risk,
        |  n_churn, n_censored, CAST(s AS BIGINT) AS surv_e6
        |FROM rec ORDER BY 1""".stripMargin,
    // q249: the same dense groups×bands spine, HUGEINT cumulation on
    // the common denominator, and the same exact-rank quartile flag.
    "q249_t_closeness" ->
      """WITH b AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        |      FROM customer),
        |grp AS (SELECT nk, seg, band, count(*) AS c FROM b
        |        GROUP BY 1, 2, 3),
        |gt AS (SELECT nk, seg, CAST(SUM(c) AS BIGINT) AS k_anon
        |       FROM grp GROUP BY 1, 2),
        |gl AS (SELECT band, count(*) AS m FROM b GROUP BY 1),
        |tot AS (SELECT count(*) AS mm FROM b),
        |spine AS (SELECT gt.nk, gt.seg, gt.k_anon, gl.band, gl.m, tot.mm
        |          FROM gt CROSS JOIN gl CROSS JOIN tot),
        |j AS (SELECT s.nk, s.seg, s.k_anon, s.band, s.mm, s.m,
        |        COALESCE(grp.c, 0) AS c
        |      FROM spine s LEFT JOIN grp ON grp.nk = s.nk
        |        AND grp.seg = s.seg AND grp.band = s.band),
        |cum AS (SELECT nk, seg, k_anon, mm,
        |        SUM(CAST(c AS HUGEINT) * mm - CAST(m AS HUGEINT) * k_anon)
        |          OVER (PARTITION BY nk, seg ORDER BY band) AS a,
        |        COUNT(*) OVER (PARTITION BY nk, seg) AS nb
        |      FROM j),
        |emd AS (SELECT nk, seg, MAX(k_anon) AS k_anon,
        |        CAST((SUM(ABS(a)) * 1000000) //
        |          (CAST(MAX(k_anon) AS HUGEINT) * MAX(mm) * (MAX(nb) - 1))
        |          AS BIGINT) AS emd_e6
        |      FROM cum GROUP BY 1, 2),
        |n AS (SELECT COUNT(*) AS cnt FROM emd),
        |r AS (SELECT emd.*, row_number()
        |        OVER (ORDER BY emd_e6 DESC, nk, seg) AS rk FROM emd)
        |SELECT r.nk, r.seg, r.k_anon, r.emd_e6,
        |  (rk * 4 <= n.cnt) AS worst_quartile
        |FROM r, n ORDER BY nk, seg""".stripMargin,
    // q250: the same doubled tie-averaged ranks (one row per
    // (pair, value), so the RANGE-default window frame equals ROWS)
    // and the same explicit sign × truncated-magnitude effect size.
    "q250_mann_whitney" ->
      """WITH t AS (SELECT event_type, value FROM events),
        |c1 AS (SELECT event_type AS pair, value, 1 AS is1 FROM t
        |       WHERE event_type <> 'purchase'),
        |c2 AS (SELECT p.pair, t.value, 0 AS is1 FROM t,
        |        (SELECT UNNEST(['click','error','signup','view'])
        |           AS pair) p
        |       WHERE t.event_type = 'purchase'),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
        |bv AS (SELECT pair, value, count(*) AS call,
        |        CAST(SUM(is1) AS BIGINT) AS c1
        |       FROM u GROUP BY 1, 2),
        |rk AS (SELECT pair, value, call, c1,
        |        CAST(SUM(call) OVER (PARTITION BY pair ORDER BY value)
        |          - call AS BIGINT) AS w0
        |       FROM bv),
        |agg AS (SELECT pair, CAST(SUM(c1) AS BIGINT) AS n1,
        |        CAST(SUM(call - c1) AS BIGINT) AS n2,
        |        CAST(SUM(c1 * (2 * w0 + call + 1)) AS BIGINT) AS r2
        |       FROM rk GROUP BY 1),
        |uu AS (SELECT pair, n1, n2, r2 - n1 * (n1 + 1) AS u2 FROM agg)
        |SELECT pair, n1, n2, CAST(u2 AS BIGINT) AS u2,
        |  CAST(CAST(sign(u2 - n1 * n2) AS BIGINT) *
        |    ((ABS(u2 - n1 * n2) * 1000000) // (n1 * n2)) AS BIGINT)
        |    AS rb_e6
        |FROM uu ORDER BY pair""".stripMargin,
    // q238: the same moment cells in HUGEINT and the same two-step
    // slope-product algebra (each slope truncated at e6, the product
    // truncated at the final e4 — toward zero in both engines).
    "q238_corr_matrix" -> {
      val f = CorrFeatures
      val moments = (f.map { case (nm, e) =>
        s"CAST(SUM($e) AS HUGEINT) AS s_$nm" } ++
        (for { i <- f.indices; j <- i until f.length } yield
          s"SUM(CAST((${f(i)._2}) AS HUGEINT) * (${f(j)._2})) " +
            s"AS p_${i}_$j")).mkString(",\n    ")
      def num(i: Int, j: Int) =
        s"(n * p_${i}_$j - s_${f(i)._1} * s_${f(j)._1})"
      def dd(i: Int) = s"(n * p_${i}_$i - s_${f(i)._1} * s_${f(i)._1})"
      val pairRows = (for { i <- f.indices; j <- (i + 1) until f.length }
        yield {
          val (q, di, dj) = (num(i, j), dd(i), dd(j))
          s"SELECT '${f(i)._1}' AS col_x, '${f(j)._1}' AS col_y, " +
            s"CASE WHEN $di = 0 OR $dj = 0 THEN NULL " +
            s"WHEN $q < 0 THEN CAST(-(($q * 1000000 // $di) " +
            s"* ($q * 1000000 // $dj) // 100000000) AS BIGINT) " +
            s"ELSE CAST(($q * 1000000 // $di) " +
            s"* ($q * 1000000 // $dj) // 100000000 AS BIGINT) " +
            "END AS signed_r2_e4 FROM mom"
        }).mkString("\nUNION ALL\n")
      s"""WITH mom AS MATERIALIZED (SELECT
         |    CAST(COUNT(*) AS HUGEINT) AS n,
         |    $moments
         |  FROM lineitem)
         |$pairRows
         |ORDER BY col_x, col_y""".stripMargin
    },
    // q235: the same md5 arm split and conversion flag; the χ²
    // products run in HUGEINT ((ad−bc)² needs ~N⁴) and truncate
    // toward zero exactly like the engine's BigInt.
    "q235_ab_chisquare" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase'
        |      AND ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) >= 8
        |      THEN 1 ELSE 0 END AS conv,
        |    CASE WHEN substring(md5('ab:' || CAST(user_id AS VARCHAR)),
        |        1, 1) < '8'
        |      THEN 'treat' ELSE 'control' END AS arm
        |  FROM events GROUP BY user_id),
        |t AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 'treat' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nt,
        |    CAST(SUM(CASE WHEN arm = 'treat' THEN conv ELSE 0 END)
        |      AS BIGINT) AS kt,
        |    CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN arm = 'control' THEN conv ELSE 0 END)
        |      AS BIGINT) AS kc
        |  FROM u),
        |d AS (SELECT *,
        |    CAST(kt AS HUGEINT) * (nc - kc)
        |      - CAST(kc AS HUGEINT) * (nt - kt) AS dd
        |  FROM t)
        |SELECT nt AS n_treat, kt AS conv_treat, nc AS n_control,
        |  kc AS conv_control,
        |  CAST(kt * 10000 // nt AS BIGINT) AS rate_treat_e4,
        |  CAST(kc * 10000 // nc AS BIGINT) AS rate_control_e4,
        |  CAST((nt + nc) * dd * dd * 10000
        |    // (CAST(nt AS HUGEINT) * nc * (kt + kc)
        |       * (nt + nc - kt - kc)) AS BIGINT) AS chi2_e4
        |FROM d""".stripMargin,
    // q234: the same cents aggregation, dollar-histogram tail-mass
    // cuts by exact cross-multiplication, and value-cut classes.
    "q234_abc_classification" ->
      """WITH rev AS MATERIALIZED (SELECT l_partkey AS part,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
        |      * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |hist AS (SELECT rev // 100 AS rd,
        |    CAST(SUM(rev) AS BIGINT) AS mass
        |  FROM rev GROUP BY 1),
        |cm AS (SELECT rd, SUM(mass) OVER (ORDER BY rd DESC) AS cm,
        |    SUM(mass) OVER () AS total FROM hist),
        |cuts AS (SELECT
        |    MAX(CASE WHEN cm * 5 >= total * 4 THEN rd END) AS cuta,
        |    MAX(CASE WHEN cm * 20 >= total * 19 THEN rd END) AS cutb,
        |    CAST(MAX(total) AS BIGINT) AS total
        |  FROM cm)
        |SELECT CASE WHEN rev // 100 >= cuta THEN 'A'
        |    WHEN rev // 100 >= cutb THEN 'B' ELSE 'C' END AS abc_class,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(rev) AS BIGINT) AS revenue_cents,
        |  CAST(SUM(rev) * 10000 // cuts.total AS BIGINT) AS share_e4
        |FROM rev CROSS JOIN cuts
        |GROUP BY 1, cuts.total ORDER BY 1""".stripMargin,
    // q232: the same frequent-item prune, within-basket pair join and
    // integer rule metrics; N enters as a scalar subquery.
    "q232_association_rules" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
        |    l_partkey AS p FROM lineitem),
        |nn AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM li),
        |itemn AS MATERIALIZED (SELECT p, CAST(COUNT(*) AS BIGINT) AS np
        |  FROM li GROUP BY 1),
        |lif AS MATERIALIZED (SELECT li.o, li.p FROM li
        |  JOIN itemn ON itemn.p = li.p AND itemn.np >= 3),
        |pairs AS (SELECT x.p AS p1, y.p AS p2,
        |    CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM lif x JOIN lif y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT p1, p2, n_pair, a.np AS n1, b.np AS n2,
        |  CAST(n_pair * 10000 // a.np AS BIGINT) AS conf12_e4,
        |  CAST(n_pair * 10000 // b.np AS BIGINT) AS conf21_e4,
        |  CAST(n_pair * nn.n * 10000 // (a.np * b.np) AS BIGINT)
        |    AS lift_e4
        |FROM pairs JOIN itemn a ON a.p = p1 JOIN itemn b ON b.p = p2
        |CROSS JOIN nn ORDER BY p1, p2""".stripMargin,
    // q229: the same histogram-rank windows; the k-th-value boundary
    // rows picked by the identical cum−c < k ≤ cum conditionals.
    "q229_trimmed_mean" ->
      """WITH h AS (SELECT o_orderpriority AS g,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |wnd AS (SELECT g, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(c * v) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS sv,
        |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(SUM(c * v) OVER (PARTITION BY g) AS BIGINT) AS tot
        |  FROM h),
        |kk AS (SELECT *, n // 10 AS k FROM wnd),
        |agg AS (SELECT g, n, tot, k,
        |    MAX(CASE WHEN cum - c < k AND cum >= k
        |      THEN sv + v * (k - cum) END) AS low,
        |    MAX(CASE WHEN n - cum < k AND n - cum + c >= k
        |      THEN tot - sv + v * (k - n + cum) END) AS high
        |  FROM kk GROUP BY 1, 2, 3, 4)
        |SELECT g AS o_orderpriority, n, CAST(k AS BIGINT) AS k_trim,
        |  CAST(tot - COALESCE(low, 0) - COALESCE(high, 0) AS BIGINT)
        |    AS trimmed_sum,
        |  CAST((tot - COALESCE(low, 0) - COALESCE(high, 0))
        |    // (n - 2 * k) AS BIGINT) AS trimmed_mean
        |FROM agg ORDER BY o_orderpriority""".stripMargin,
    // q226: θ derived IN SQL from the same integer moments the engine
    // collects (BigInt and `//` both truncate toward zero, so the
    // negative adjustment replays); same md5 arm split, same scale-0
    // ROUND of the double value.
    "q226_cuped_readout" ->
      """WITH u AS MATERIALIZED (SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        AND ts < TIMESTAMP '2024-01-16'
        |      THEN CAST(ROUND(value) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        AND ts >= TIMESTAMP '2024-01-16'
        |      THEN CAST(ROUND(value) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS y,
        |    CASE WHEN substring(md5('ab:' || CAST(user_id AS VARCHAR)),
        |        1, 1) < '8'
        |      THEN 'treat' ELSE 'control' END AS arm
        |  FROM events GROUP BY user_id),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM u),
        |t AS (SELECT
        |    (n * sxy - sx * sy) * 10000 // (n * sxx - sx * sx)
        |      AS theta_e4,
        |    sx * 10000 // n AS xbar_e4
        |  FROM m)
        |SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(x) * 10000 // COUNT(*) AS BIGINT) AS mean_pre_e4,
        |  CAST(SUM(y) * 10000 // COUNT(*) AS BIGINT) AS mean_post_e4,
        |  CAST(SUM(y) * 10000 // COUNT(*) - (t.theta_e4 *
        |    (SUM(x) * 10000 // COUNT(*) - t.xbar_e4)) // 10000
        |    AS BIGINT) AS adj_post_e4,
        |  CAST(t.theta_e4 AS BIGINT) AS theta_e4
        |FROM u CROSS JOIN t
        |GROUP BY arm, t.theta_e4, t.xbar_e4 ORDER BY arm""".stripMargin,
    "q227_benford_audit" -> {
      val rows = BenfordE4.map { case (d, e) => s"($d, $e)" }
        .mkString(", ")
      s"""WITH d AS (SELECT CAST(substring(CAST(CAST(
         |      FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
         |      AS BIGINT) AS digit
         |  FROM orders),
         |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM d GROUP BY 1),
         |s AS (SELECT digit, n,
         |    CAST(n * 10000 // SUM(n) OVER () AS BIGINT) AS share_e4
         |  FROM c),
         |b(digit, benford_e4) AS (VALUES $rows)
         |SELECT s.digit, s.n, s.share_e4,
         |  CAST(b.benford_e4 AS BIGINT) AS benford_e4,
         |  CAST(ABS(s.share_e4 - b.benford_e4) AS BIGINT) AS dev_e4
         |FROM s JOIN b ON s.digit = b.digit ORDER BY s.digit"""
        .stripMargin
    },
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
    "q214_blocking_audit" ->
      (AnalyticsQueries.CanonCtes + ",\n" +
        """base AS (SELECT doc_id // 4 AS page, raw_url, canon AS ck
          |  FROM canon),
          |keyed AS (SELECT page, 'canon' AS scheme, ck AS bkey FROM base
          |  UNION ALL
          |  SELECT page, 'host', lower(regexp_extract(raw_url,
          |    '^[A-Za-z]+://([^/:?#]+)', 1)) FROM base
          |  UNION ALL
          |  SELECT page, 'len', CAST(LENGTH(raw_url) AS VARCHAR)
          |  FROM base),
          |blocks AS (SELECT scheme, bkey, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM keyed GROUP BY 1, 2),
          |ps AS (SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_blocks,
          |    CAST(SUM(CAST(c AS HUGEINT) * (c - 1) // 2) AS BIGINT)
          |      AS cand_pairs
          |  FROM blocks GROUP BY 1),
          |cbk AS (SELECT scheme,
          |    CAST(SUM(CAST(m AS HUGEINT) * (m - 1) // 2) AS BIGINT)
          |      AS coblocked_pairs
          |  FROM (SELECT scheme, page, bkey,
          |          CAST(COUNT(*) AS BIGINT) AS m
          |        FROM keyed GROUP BY 1, 2, 3) GROUP BY 1),
          |tt AS (SELECT CAST(SUM(v) AS BIGINT) AS n_rows,
          |    CAST(SUM(CAST(v AS HUGEINT) * (v - 1) // 2) AS BIGINT)
          |      AS true_pairs
          |  FROM (SELECT page, CAST(COUNT(*) AS BIGINT) AS v FROM base
          |        GROUP BY 1))
          |SELECT ps.scheme, n_blocks, cand_pairs,
          |  CAST(10000 - CAST(cand_pairs AS HUGEINT) * 10000 //
          |    (CAST(n_rows AS HUGEINT) * (n_rows - 1) // 2) AS BIGINT)
          |    AS reduction_e4,
          |  true_pairs, coblocked_pairs,
          |  CAST(CAST(coblocked_pairs AS HUGEINT) * 10000 // true_pairs
          |    AS BIGINT) AS pc_e4
          |FROM ps JOIN cbk ON ps.scheme = cbk.scheme CROSS JOIN tt
          |ORDER BY ps.scheme""".stripMargin),
    "q215_weighted_quantiles" ->
      """WITH toks AS (SELECT source,
        |    LEAST(len(list_filter(regexp_split_to_array(lower(text), ' '),
        |      x -> LENGTH(x) > 0)), 1023) AS sb
        |  FROM documents),
        |hist AS (SELECT source, CAST(sb AS BIGINT) AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |e AS (SELECT source, sb, c,
        |    SUM(c * sb) OVER (PARTITION BY source ORDER BY sb
        |      ROWS UNBOUNDED PRECEDING) AS cm,
        |    SUM(c) OVER (PARTITION BY source ORDER BY sb
        |      ROWS UNBOUNDED PRECEDING) AS cc,
        |    SUM(c * sb) OVER (PARTITION BY source) AS m,
        |    SUM(c) OVER (PARTITION BY source) AS n
        |  FROM hist)
        |SELECT source, CAST(MIN(n) AS BIGINT) AS n_docs,
        |  CAST(MIN(m) AS BIGINT) AS total_tokens,
        |  CAST(MIN(CASE WHEN CAST(cc AS HUGEINT) * 2 >= n THEN sb END)
        |    AS BIGINT) AS p50_docs,
        |  CAST(MIN(CASE WHEN CAST(cm AS HUGEINT) * 4 >= m THEN sb END)
        |    AS BIGINT) AS wp25,
        |  CAST(MIN(CASE WHEN CAST(cm AS HUGEINT) * 2 >= m THEN sb END)
        |    AS BIGINT) AS wp50,
        |  CAST(MIN(CASE WHEN CAST(cm AS HUGEINT) * 4 >=
        |      CAST(m AS HUGEINT) * 3 THEN sb END) AS BIGINT) AS wp75
        |FROM e GROUP BY source ORDER BY source""".stripMargin,
    "q216_kfold_balance" ->
      """WITH cells AS (SELECT lang,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) % 5 AS fold,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |d AS (SELECT lang, fold, o,
        |    SUM(o) OVER (PARTITION BY lang) AS tl FROM cells),
        |v AS (SELECT fold, o, ABS(o * 10000 // tl - 2000) AS dev FROM d)
        |SELECT CAST(fold AS BIGINT) AS fold,
        |  CAST(SUM(o) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_langs,
        |  CAST(MAX(dev) AS BIGINT) AS max_dev_e4,
        |  CAST(SUM(dev) AS BIGINT) AS sum_dev_e4
        |FROM v GROUP BY fold ORDER BY fold""".stripMargin,
    "q217_last_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS ts_s FROM events
        |  WHERE user_id IS NOT NULL),
        |k AS (SELECT *, MAX(CASE
        |      WHEN event_type = 'click' THEN ts_s * 10 + 1
        |      WHEN event_type = 'view' THEN ts_s * 10 + 2 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS UNBOUNDED PRECEDING) AS lk
        |  FROM e),
        |p AS (SELECT ts_s - lk // 10 AS age_s, lk FROM k
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT CASE WHEN lk IS NULL OR age_s > 604800 THEN 'none'
        |      WHEN lk % 10 = 1 THEN 'click' ELSE 'view' END
        |      AS touch_type,
        |    CASE WHEN lk IS NULL OR age_s > 604800 THEN -1
        |      ELSE age_s // 86400 END AS age_days
        |  FROM p)
        |SELECT touch_type, CAST(age_days AS BIGINT) AS age_days,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM t GROUP BY 1, 2 ORDER BY touch_type, age_days""".stripMargin,
    "q218_dp_noisy_release" ->
      (s"""WITH cells AS (SELECT lang, source,
         |    CAST(COUNT(*) AS BIGINT) AS true_n
         |  FROM documents GROUP BY 1, 2),
         |hh AS (SELECT lang, source, true_n,
         |    CAST(('0x' || substring(md5('dp:' || lang || ':' || source),
         |      1, 13)) AS BIGINT) AS h
         |  FROM cells),
         |mm AS (SELECT lang, source, true_n, h,
         |    CAST(${trailingOnesSql("(h // 2)")} AS BIGINT) AS m
         |  FROM hh),
         |nn AS (SELECT lang, source, true_n,
         |    CASE WHEN h % 2 = 0 THEN m ELSE -m END AS noise
         |  FROM mm)
         |SELECT lang, source, true_n, noise,
         |  true_n + noise AS noisy_n, ABS(noise) AS abs_noise
         |FROM nn ORDER BY lang, source""".stripMargin),
    "q219_vopt_histogram" -> {
      // Unrolled DP levels as single-line fragments (a line-leading
      // "||" inside an interpolated fragment loses a pipe to the outer
      // stripMargin — the q188 gotcha).
      def lvl(j: Int): String =
        s"lv$j AS MATERIALIZED (SELECT s.lang, s.b AS i, " +
          "MIN(l.best + s.sse) AS best " +
          s"FROM lv${j - 1} l JOIN seg s ON l.lang = s.lang " +
          "AND l.i = s.a GROUP BY 1, 2)"
      s"""WITH hist AS MATERIALIZED (SELECT lang,
         |    LEAST(n_chars // 20, 255) AS sb,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |idx AS MATERIALIZED (SELECT lang, sb, c,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY sb) AS i,
         |    SUM(c) OVER (PARTITION BY lang ORDER BY sb) AS pc,
         |    SUM(c * sb) OVER (PARTITION BY lang ORDER BY sb) AS p1,
         |    SUM(c * sb * sb) OVER (PARTITION BY lang ORDER BY sb) AS p2
         |  FROM hist),
         |pz AS MATERIALIZED (SELECT lang, CAST(0 AS BIGINT) AS i,
         |    CAST(0 AS HUGEINT) AS pc, CAST(0 AS HUGEINT) AS p1,
         |    CAST(0 AS HUGEINT) AS p2
         |  FROM (SELECT DISTINCT lang FROM hist)
         |  UNION ALL
         |  SELECT lang, i, CAST(pc AS HUGEINT), CAST(p1 AS HUGEINT),
         |    CAST(p2 AS HUGEINT) FROM idx),
         |seg AS MATERIALIZED (SELECT a.lang, a.i AS a, b.i AS b,
         |    CAST(((b.p2 - a.p2) * (b.pc - a.pc)
         |      - (b.p1 - a.p1) * (b.p1 - a.p1)) * 10000
         |      // (b.pc - a.pc) AS BIGINT) AS sse
         |  FROM pz a JOIN pz b ON a.lang = b.lang AND a.i < b.i),
         |lv1 AS MATERIALIZED (SELECT lang, b AS i, sse AS best
         |  FROM seg WHERE a = 0),
         |${lvl(2)},
         |${lvl(3)},
         |${lvl(4)},
         |${lvl(5)},
         |${lvl(6)},
         |mx AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nb
         |  FROM idx GROUP BY 1),
         |eqw AS (SELECT lang, CAST(SUM(bsse) AS BIGINT) AS equiw
         |  FROM (SELECT lang,
         |      CAST((SUM(CAST(c AS HUGEINT) * sb * sb) * SUM(c)
         |        - SUM(CAST(c AS HUGEINT) * sb)
         |          * SUM(CAST(c AS HUGEINT) * sb)) * 10000
         |        // SUM(c) AS BIGINT) AS bsse
         |    FROM hist GROUP BY lang, sb * 6 // 256)
         |  GROUP BY lang)
         |SELECT mx.lang, mx.nb AS n_bins,
         |  CAST(CASE WHEN mx.nb <= 6 THEN 0 ELSE l6.best END AS BIGINT)
         |    AS vopt_sse_e4,
         |  eqw.equiw AS equiw_sse_e4,
         |  CASE WHEN eqw.equiw > 0 THEN
         |    CAST(10000 - CAST(CASE WHEN mx.nb <= 6 THEN 0
         |        ELSE l6.best END AS HUGEINT) * 10000 // eqw.equiw
         |      AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS improvement_e4
         |FROM mx
         |LEFT JOIN lv6 l6 ON mx.lang = l6.lang AND l6.i = mx.nb
         |JOIN eqw ON mx.lang = eqw.lang
         |ORDER BY mx.lang""".stripMargin
    },
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
