package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that RESEMBLE a target
  * domain, not merely high-"quality" ones. Both distributions are
  * hashed-bigram bag-of-words models; each document's importance weight
  * is
  *
  *   log w(x) = Σ_b c_x[b] · (ln p_target[b] − ln p_raw[b])
  *
  * over hash buckets b, and selection is Gumbel top-k — equivalent to
  * sampling without replacement proportionally to w(x), which preserves
  * target-distribution DIVERSITY where a plain top-k by weight would
  * collapse onto the mode.
  *
  * Scale shape (100 TB): the bigram instance stream collapses ONCE to
  * per-doc bucket multiplicities (map-side-combinable, ≤ `buckets` rows
  * per doc) and is materialized — it feeds the model counts and the
  * scoring join (Catalyst does not share subtrees). Both models live in
  * ONE `buckets`-row count table (target tagged by a boolean, so one
  * aggregate serves both); the log-ratio table joins back BROADCAST.
  * Only two scalars (corpus gram totals) ever reach the driver, and the
  * final top-k is TakeOrdered (per-partition k then a driver merge of
  * k·partitions rows) — no global sort, no single-partition window.
  *
  * Determinism: per-bucket log-ratios and the per-doc Gumbel perturbation
  * are pinned to e4 fixed-point BEFORE summation ([[LanguageModel]]'s
  * discipline), so scores are exact integers; the Gumbel uniform derives
  * from md5(doc_id) — reproducible across engines, runs, and cluster
  * sizes. Ties break on doc_id. Documents with < 2 tokens carry no
  * bigram evidence and are dropped (same contract as q91's LM score).
  */
object Dsir {

  private val E4: Double = 10000.0

  /** Per-doc hashed-bigram bucket multiplicities, target-tagged:
    * (idCol, __tgt, b, c). One explode, one aggregate, materialized.
    */
  private def docBuckets(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " "), t => length(t) > 0)
    val bgLen = greatest(size(col("__t")) - 1, lit(0))
    val grams = zip_with(
      slice(col("__t"), lit(1), bgLen),
      slice(col("__t"), lit(2), bgLen),
      (a, b) => concat(a, lit(" "), b))
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), isTarget.as("__tgt"), toks.as("__t"))
      .select(col(idCol), col("__tgt"), explode(grams).as("g"))
      .select(col(idCol), col("__tgt"),
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
      .groupBy(col(idCol), col("__tgt"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
  }

  /** The k documents Gumbel-top-k-selected by target/raw importance.
    * Output: idCol, n_grams, logw_e4, gumbel_e4, score_e4 — ordered by
    * (score_e4 DESC, idCol).
    *
    * Model-contrast convention (deliberate deviation from Xie et al.
    * 2023, which contrasts DISJOINT raw vs target distributions): the
    * "raw" bigram model here sums over the FULL corpus, target-tagged
    * docs included. This keeps the pipeline one-pass (a single
    * parity-tagged count table carries both models) at the cost of
    * compressing log-ratios toward zero as the target fraction grows —
    * immaterial when the target slice is small (the intended use), and
    * rank-preserving either way for a fixed target set. Callers who
    * need the paper's exact contrast can pre-filter the input to
    * exclude target docs from the raw side.
    */
  def importanceResample(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 512, k: Int = 100): DataFrame = {
    val db = docBuckets(df, idCol, textCol, isTarget, buckets)
    // One count table carries BOTH models: cr = raw (all docs),
    // ct = target-tagged docs only. `buckets` rows; consumed twice
    // (totals + log-ratio join) — materialized, trivially small.
    val cnt = db.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("__tgt"), col("c")).otherwise(0L)).as("ct"))
      .localCheckpoint(true)
    // Corpus gram totals: two bounded scalars to the driver, folded into
    // the smoothing denominators as literals (blocks nothing; keeps the
    // per-bucket expression constant-foldable).
    val tot = cnt.agg(sum(col("cr")), sum(col("ct"))).collect()(0)
    val (nr, nt) = (tot.getLong(0), tot.getLong(1))
    // Add-one-smoothed log-ratio per bucket, e4-pinned BEFORE the doc
    // sum. ln((ct+1)/(NT+B)) − ln((cr+1)/(NR+B)): each quotient is one
    // IEEE division of exactly-representable values — the oracle mirrors
    // the tree textually.
    val lr = cnt.select(col("b"),
      round((log((col("ct") + lit(1.0)) / lit(nt.toDouble + buckets)) -
        log((col("cr") + lit(1.0)) / lit(nr.toDouble + buckets))) * E4, 0)
        .cast("long").as("lr_e4"))
    // Score join: per-doc bucket rows × a broadcast `buckets`-row table.
    val scored = db.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("lr_e4")).as("logw_e4"))
    // Gumbel(0,1) from the md5-derived uniform in (0,1):
    // u = (h48 + 0.5) / 2^48, g = −ln(−ln u), e4-pinned.
    val h48 = conv(substring(md5(concat_ws(":", lit("dsir"), col(idCol))),
      1, 12), 16, 10).cast("long")
    scored
      .withColumn("gumbel_e4",
        round(-log(-log((h48.cast("double") + lit(0.5)) /
          lit(281474976710656.0))) * E4, 0).cast("long"))
      .withColumn("score_e4", col("logw_e4") + col("gumbel_e4"))
      .orderBy(col("score_e4").desc, col(idCol))
      .limit(k)
  }
}
