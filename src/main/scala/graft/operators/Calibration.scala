package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-calibration audits for quality-filter scores.
  *
  * A learned (or hand-weighted, [[TextAnalysis.linearQuality]]) quality
  * score gates what enters a training mix; before its threshold is
  * trusted, two standard audits run against labeled outcomes: the
  * ISOTONIC (monotone) calibration curve — the best monotone map from
  * score to outcome rate, what a PAV-calibrated filter would actually
  * emit — and the BRIER DECOMPOSITION, which splits mean squared error
  * into reliability (are the probabilities honest), resolution (do the
  * scores separate outcomes at all) and outcome uncertainty.
  *
  * Both run as exact integer (e4/e8 fixed-point) algebra so the DuckDB
  * oracle replays them bit-for-bit.
  */
object Calibration {

  /** Isotonic calibration curve via the minimax closed form of
    * pool-adjacent-violators: over score bins k (ascending), the
    * isotonic fit is
    *
    *   fit(k) = max_{i ≤ k} min_{j ≥ k} rate(i..j),
    *
    * with rate(i..j) the pooled positive rate of bins i..j as an exact
    * e4 integer (`pos·10⁴ div n`). The minimax is monotone in k for ANY
    * segment function (the i-range only grows and the j-range only
    * shrinks), and on exact rationals it equals the PAVA solution; with
    * e4-truncated rates it is the self-consistent fixed-point form both
    * engines compute identically (within one e4 ulp of real PAVA).
    *
    * Scale shape: the corpus crosses ONE keyed aggregate into the bins
    * table (bounded by the bin-domain size, ≤ dozens of rows); the
    * segment table (bins³ via the membership join) and the minimax
    * (bins³) are algebra on that bounded table — eagerly checkpointed so
    * the corpus aggregate runs once, not once per downstream consumer.
    * Overflow: `pos·10⁴` caps the corpus at ~9·10¹⁴ positive rows.
    *
    * Input: `binCol` a non-negative integer bin id, `yCol` a 0/1
    * outcome. Output: (bin, n, pos, raw_rate_e4, iso_rate_e4).
    */
  def isotonicFit(df: DataFrame, binCol: String, yCol: String): DataFrame = {
    val bins = df.groupBy(col(binCol).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(yCol).cast("long")).as("pos"))
      .localCheckpoint(true) // bounded (bin-domain rows), 3 consumers
    val seg = bins.select(col("bin").as("lo"))
      .crossJoin(bins.select(col("bin").as("hi")))
      .filter(col("lo") <= col("hi"))
      .join(bins.select(col("bin").as("m"), col("n"), col("pos")),
        col("m") >= col("lo") && col("m") <= col("hi"))
      .groupBy("lo", "hi")
      .agg(sum("n").as("sn"), sum("pos").as("sp"))
      .withColumn("rate_e4", expr("sp * 10000 div sn"))
    val fit = bins.select(col("bin").as("k"))
      .join(seg, col("lo") <= col("k") && col("hi") >= col("k"))
      .groupBy(col("k"), col("lo"))
      .agg(min(col("rate_e4")).as("mn"))
      .groupBy(col("k"))
      .agg(max(col("mn")).as("iso_rate_e4"))
    bins.join(fit, col("bin") === col("k"))
      .select(col("bin"), col("n"), col("pos"),
        expr("pos * 10000 div n").as("raw_rate_e4"), col("iso_rate_e4"))
      .orderBy("bin")
  }

  /** Murphy decomposition of the Brier score per group:
    *
    *   brier = reliability − resolution + uncertainty,
    *
    * over cells of identical predicted probability (`pCol`, an e4
    * integer in [0, 10⁴]): reliability Σ n_c·(p_c − ȳ_c)²/N punishes
    * dishonest probabilities, resolution Σ n_c·(ȳ_c − ȳ)²/N rewards
    * outcome separation, uncertainty ȳ(1−ȳ) is the data's floor. All
    * terms are e8 integers; cell and group outcome rates are e4
    * integers truncated BEFORE squaring, so the identity holds within
    * ~6·10⁴ e8 (three truncated means × ≲2·10⁴ e8 each — 6·10⁻⁴ of
    * the Brier scale; EXACT on exact-division cells). Both bounds are
    * spec-pinned and both engines agree bit-for-bit.
    *
    * Scale shape: ONE corpus aggregate into (group, p) cells — bounded
    * by 10⁴+1 rows per group — eagerly checkpointed (two consumers),
    * then keyed cell algebra. The squared terms stay inside a long for
    * N ≤ 9·10¹⁰ rows per group; the output N is guarded in-plan and
    * fails loudly past the budget (sample first at that scale).
    *
    * Output: (groupCol, n, brier_e8, rel_e8, res_e8, unc_e8).
    */
  def brierDecomposition(df: DataFrame, groupCol: String, pCol: String,
      yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(groupCol).as("grp"), col(pCol).cast("long").as("p"))
      .agg(count(lit(1)).as("nc"), sum(col(yCol).cast("long")).as("yc"))
      .localCheckpoint(true) // bounded (groups × ≤10⁴+1 cells), 2 consumers
    val g = cells.groupBy("grp")
      .agg(sum("nc").as("n"), sum("yc").as("y"))
      .withColumn("n",
        when(col("n") <= 92233720368L, col("n")).otherwise(raise_error(
          concat(lit("brierDecomposition: group size "), col("n"),
            lit(" exceeds the 9.2e10 e8-square budget; sample first")))))
      .withColumn("ybar_e4", expr("y * 10000 div n"))
      .select("grp", "n", "ybar_e4")
    cells.join(broadcast(g), "grp")
      .withColumn("ybc_e4", expr("yc * 10000 div nc"))
      .groupBy(col("grp"), col("n"), col("ybar_e4"))
      .agg(
        sum(expr("yc * (p - 10000) * (p - 10000) + (nc - yc) * p * p"))
          .as("bsum"),
        sum(expr("nc * (p - ybc_e4) * (p - ybc_e4)")).as("rsum"),
        sum(expr("nc * (ybc_e4 - ybar_e4) * (ybc_e4 - ybar_e4)")).as("ssum"))
      .select(col("grp").as(groupCol), col("n"),
        expr("bsum div n").as("brier_e8"),
        expr("rsum div n").as("rel_e8"),
        expr("ssum div n").as("res_e8"),
        expr("ybar_e4 * (10000 - ybar_e4)").as("unc_e8"))
      .orderBy(groupCol)
  }
}
