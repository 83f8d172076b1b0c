package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the Population Stability Index pass a
  * long-lived ingestion pipeline runs between the reference corpus
  * snapshot and each arrival cohort BEFORE committing the new data to a
  * 100 TB training mix (the q115 validation tier checks rows against a
  * static contract; this checks the corpus against its own past).
  *
  * PSI per feature = Σ_bins (p_ref − p_cur) · ln(p_ref / p_cur), with
  * add-one (Laplace) smoothing over the feature's OBSERVED bin set so
  * one-sided empty bins stay finite (the standard industry form; the
  * usual read: < 0.10 stable, 0.10–0.25 drifting, > 0.25 shifted).
  *
  * Scale shape: the features are stacked map-side — one `explode` of F
  * (feature, bin) structs per row, no per-feature corpus scans — so the
  * whole report is ONE map-side-combinable aggregate on (feature, bin)
  * (a few hundred groups out of any corpus size) plus bin-count-sized
  * window arithmetic on the aggregated rows. Everything downstream of
  * the integer counts is deterministic double algebra rounded at e4
  * (the q91 `-ln` discipline), so a SQL oracle replays the report
  * bit-for-bit from the same parquet.
  */
object Drift {

  /** Per-(feature, bin) drift report over one DataFrame holding both
    * cohorts. `refCohort` is a boolean column: true rows form the
    * reference distribution, false rows the current one. Each feature
    * is (name, bin expression); bins are compared as strings so
    * numeric-range and categorical features share one report schema
    * (zero-pad numeric bins at the call site if lexical order should
    * match numeric order).
    *
    * Output: feature, bin, ref_n, cur_n, smoothed shares (e6 fixed
    * point, truncating div), the bin's PSI term (e4) and the feature's
    * total PSI (e4) — per-bin rows so the report shows WHERE the drift
    * lives, not just that it exists.
    */
  def psiReport(df: DataFrame, refCohort: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "psiReport needs at least one feature")
    val stacked = df
      .select(refCohort.as("__ref"),
        explode(array(features.map { case (n, b) =>
          struct(lit(n).as("feature"), b.cast("string").as("bin"))
        }: _*)).as("__fb"))
      .select(col("__ref"), col("__fb.feature").as("feature"),
        col("__fb.bin").as("bin"))
    val counts = stacked.groupBy(col("feature"), col("bin"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("cur_n"))
    val w = Window.partitionBy("feature")
    // Laplace smoothing denominator: cohort total + observed bin count
    // (each bin contributes a +1 pseudo-count), derived from the data in
    // both engines — no out-of-band bin registry to drift.
    counts
      .withColumn("__rt", sum(col("ref_n")).over(w))
      .withColumn("__ct", sum(col("cur_n")).over(w))
      .withColumn("__b", count(lit(1)).over(w))
      .withColumn("ref_share_e6",
        expr("(ref_n + 1) * 1000000 div (__rt + __b)"))
      .withColumn("cur_share_e6",
        expr("(cur_n + 1) * 1000000 div (__ct + __b)"))
      .withColumn("__pr",
        (col("ref_n") + 1).cast("double") /
          (col("__rt") + col("__b")).cast("double"))
      .withColumn("__pc",
        (col("cur_n") + 1).cast("double") /
          (col("__ct") + col("__b")).cast("double"))
      // (pr−pc) and ln(pr/pc) always share a sign, so each term — and
      // every partial sum — is non-negative; HALF_UP at e4 agrees with
      // DuckDB's ROUND on the whole range.
      .withColumn("psi_e4",
        round((col("__pr") - col("__pc")) *
          log(col("__pr") / col("__pc")) * 10000).cast("long"))
      .withColumn("psi_total_e4", sum(col("psi_e4")).over(w))
      .select(col("feature"), col("bin"), col("ref_n"), col("cur_n"),
        col("ref_share_e6"), col("cur_share_e6"), col("psi_e4"),
        col("psi_total_e4"))
  }

  /** KOLMOGOROV–SMIRNOV two-sample drift — [[psiReport]]'s sup-norm
    * sibling: PSI needs a binning choice and reads total divergence;
    * KS is binning-free on ordered features and reads the WORST
    * cumulative gap, D = sup_v |F_ref(v) − F_cur(v)| — the statistic
    * that catches a pure location shift PSI's coarse bins can smear.
    * Reported per feature with the value where the sup is attained
    * (argmax, ties → smallest value): the actionable "the
    * distributions cross worst HERE".
    *
    * ALL-INTEGER: with cumulative counts cumR/cumC over the merged
    * value histogram, D's numerator is max |cumR·nC − cumC·nR| (exact
    * longs), ks_e4 = D_num·10⁴ div (nR·nC). Overflow budget: the e4
    * step needs nR·nC·10⁴ ≤ Long.Max — ≈ 3·10⁷ rows per cohort; a
    * larger monitor samples the cohorts (a KS estimate from 10⁷
    * uniform samples resolves D to ±0.04% — far inside any drift
    * threshold) or divides D_num by a cohort first. That budget is
    * ENFORCED in-plan (the otsuThreshold/Pca discipline): the e4
    * projection `raise_error`s when nR·nC would overflow the ×10⁴
    * step, so an oversized cohort fails loudly instead of silently
    * corrupting the argmax ranking. Scale shape: the features stack
    * map-side (ONE explode, the psiReport discipline) into one
    * combinable (feature, value) aggregate; the cumsum windows run on
    * the value-histogram table only. Values compare as LONGS (order
    * must be numeric, not lexical).
    *
    * Output per feature: (feature, n_ref, n_cur, ks_num, ks_e4,
    * argmax_value).
    */
  def ksReport(df: DataFrame, refCohort: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "ksReport needs at least one feature")
    val stacked = graft.SparkUtil.ensureParallelism(df)
      .select(refCohort.as("__ref"),
        explode(array(features.map { case (n, v) =>
          struct(lit(n).as("feature"), v.cast("long").as("v"))
        }: _*)).as("__fv"))
      .select(col("__ref"), col("__fv.feature").as("feature"),
        col("__fv.v").as("v"))
    val counts = stacked.groupBy(col("feature"), col("v"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__r"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("__c"))
    val byV = Window.partitionBy(col("feature")).orderBy(col("v"))
    val w = Window.partitionBy(col("feature"))
    counts
      .withColumn("__cumR", sum(col("__r")).over(byV))
      .withColumn("__cumC", sum(col("__c")).over(byV))
      .withColumn("__nR", sum(col("__r")).over(w))
      .withColumn("__nC", sum(col("__c")).over(w))
      .withColumn("__d",
        abs(col("__cumR") * col("__nC") - col("__cumC") * col("__nR")))
      .withColumn("__rk", row_number().over(
        w.orderBy(col("__d").desc, col("v"))))
      .filter(col("__rk") === 1)
      .select(col("feature"), col("__nR").as("n_ref"),
        col("__nC").as("n_cur"), col("__d").as("ks_num"),
        // Overflow budget enforced in-plan: nR·nC·10⁴ must fit a long
        // (nR·nC ≤ Long.Max/10⁴ ≈ 9.2·10¹⁴; the check multiplies in
        // doubles, exact below 2⁵³, because the long product itself
        // would wrap first). Fails loudly with the sample-the-cohorts
        // guidance from the scaladoc instead of corrupting the argmax.
        when(col("__nR").cast("double") * col("__nC").cast("double") >
            lit(Long.MaxValue / 10000L).cast("double"),
          raise_error(concat(
            lit("ksReport: cohort sizes overflow the e4 step (n_ref "),
            col("__nR").cast("string"), lit(", n_cur "),
            col("__nC").cast("string"),
            lit(") — nR*nC must be <= Long.Max/1e4; "),
            lit("sample the cohorts first"))))
          .otherwise(expr("__d * 10000 div (__nR * __nC)")).as("ks_e4"),
        col("v").as("argmax_value"))
  }

  /** One-sided CUSUM changepoint statistics per key — the sequential
    * drift monitor for "WHEN did this source's volume shift", where
    * psi/ksReport answer "did the distribution shift at all". Against
    * the key's own mean rate as the reference, the classic recursions
    *
    *   S⁺_t = max(0, S⁺_{t-1} + (x_t − μ)),   S⁻_t symmetric,
    *
    * unroll to pure window algebra: with P_t = Σ_{i≤t}(x_i − μ),
    * S⁺_t = P_t − min(0, min_{j≤t} P_j) and S⁻_t = max(0, max_{j≤t}
    * P_j) − P_t — a prefix sum minus a running extremum, no recursion,
    * no UDF. μ = T/D is kept EXACT by scaling everything by D (the
    * key's period count): the reported statistics are in x·D units,
    * all-integer, bit-identical in both engines.
    *
    * Scale shape: all windows are KEYED by `keyCol` and bounded per key
    * by the calendar span (the q206 discipline) — nothing global, no
    * corpus sort. Overflow: |P| ≤ D·T, enforced in-plan (D·T must fit
    * a long; a 10-year daily monitor allows ~2.5·10¹⁵ events per key).
    *
    * Input: one row per (key, t) with the period's measure `xCol`
    * (integer). Output: key, t, x, s_pos, s_neg (scaled ×D),
    * is_peak (the earliest argmax of s_pos per key — the point of maximal upward evidence; the shift ONSET is the last prefix minimum before it, and an online monitor alarms when s_pos crosses its h threshold).
    */
  def cusum(df: DataFrame, keyCol: String, tCol: String, xCol: String)
      : DataFrame = {
    val byT = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val w = Window.partitionBy(col(keyCol))
    df
      .withColumn("__D", count(lit(1)).over(w))
      .withColumn("__T",
        when(sum(col(xCol)).over(w) <=
            lit(Long.MaxValue).cast("double") /
              count(lit(1)).over(w).cast("double"),
          sum(col(xCol)).over(w))
          .otherwise(raise_error(lit(
            "cusum: D*T overflows a long; aggregate coarser periods"))))
      .withColumn("__P",
        col("__D") * sum(col(xCol)).over(byT)
          - row_number().over(byT) * col("__T"))
      .withColumn("__sPos",
        col("__P") - least(lit(0L), min(col("__P")).over(byT)))
      .withColumn("__sNeg",
        greatest(lit(0L), max(col("__P")).over(byT)) - col("__P"))
      .withColumn("__rk", row_number().over(
        w.orderBy(col("__sPos").desc, col(tCol))))
      .select(col(keyCol), col(tCol), col(xCol),
        col("__sPos").as("s_pos"), col("__sNeg").as("s_neg"),
        (col("__rk") === 1).as("is_peak"))
  }

  /** Lag-k AUTOCORRELATION per key — the seasonality/memory read of a
    * per-period volume series ([[cusum]] finds level shifts; this finds
    * weekly rhythm and burst persistence). The biased sample ACF
    *
    *   r_k = Σ_{t ≤ D−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * is scale-invariant, so the mean is kept EXACT by working with
    * u_t = D·x_t − T (integers, the [[cusum]] scaling): r_k_e4 =
    * Σ u_t·u_{t+k} · 10⁴ div Σ u_t². Lags materialize as `lead`
    * columns over ONE keyed window pass (nulls past the series end
    * drop out of the sum exactly as the t ≤ D−k bound requires).
    *
    * Scale shape: keyed windows bounded by the calendar span, then one
    * keyed aggregate to (key, lag) rows. Overflow: Σu² ≤ D·(D·max|x −
    * x̄|)² — enforced in-plan via a double-side check (D³·maxdev²
    * must fit a long; a 365-day daily monitor allows ~4·10⁵ mean
    * deviation per period — aggregate coarser periods past that).
    *
    * Output: key, lag (1..maxLag), n_pairs, r_e4 (NULL for a
    * zero-variance series — flat input has no correlation to read).
    */
  def autocorr(df: DataFrame, keyCol: String, tCol: String, xCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val byT = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val w = Window.partitionBy(col(keyCol))
    val withU = df
      .withColumn("__D", count(lit(1)).over(w))
      .withColumn("__T", sum(col(xCol)).over(w))
      .withColumn("__u", col("__D") * col(xCol) - col("__T"))
      .withColumn("__maxu", max(abs(col("__u"))).over(w))
      .withColumn("__u",
        when(col("__maxu").cast("double") * col("__maxu").cast("double") *
            col("__D").cast("double") < lit(9.0e18),
          col("__u"))
          .otherwise(raise_error(lit(
            "autocorr: D^3*maxdev^2 overflows a long; " +
              "aggregate coarser periods"))))
    val withLeads = (1 to maxLag).foldLeft(withU) { (d, k) =>
      d.withColumn(s"__u$k", lead(col("__u"), k).over(byT))
    }
    val grouped = withLeads.groupBy(col(keyCol))
      .agg(sum(expr("__u * __u")).as("__den"),
        (1 to maxLag).flatMap(k => Seq(
          sum(expr(s"__u * __u$k")).as(s"__num$k"),
          count(expr(s"__u * __u$k")).as(s"__np$k"))): _*)
    val lagRows = (1 to maxLag).map(k =>
      s"struct(${k}L as lag, __num$k as num, __np$k as np)")
      .mkString(", ")
    grouped
      .select(col(keyCol), col("__den"),
        explode(expr(s"array($lagRows)")).as("__l"))
      .select(col(keyCol), col("__l.lag").as("lag"),
        col("__l.np").as("n_pairs"),
        when(col("__den") > 0,
          expr("__l.num * 10000 div __den")).as("r_e4"))
      .orderBy(col(keyCol), col("lag"))
  }
}
