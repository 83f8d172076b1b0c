package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics (north-star surface, SURVEY.md §2.9).
  *
  * Everything is Column-level expression algebra — no UDFs — so the scoring
  * runs inside WholeStageCodegen and scales with the scan. Language ID uses
  * stopword hit-rates + script character ranges (the classic cheap n-gram
  * heuristic); it is intentionally vocabulary-driven so it needs no model
  * asset.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for",
      "with", "as", "was", "on", "are", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den",
      "nicht", "ein", "eine", "zu", "im", "für", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las",
      "por", "un", "una", "con", "para", "es"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "en", "un",
      "une", "du", "que", "pour", "dans", "qui"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column =
    stopwordRatioOfTokens(split(lower(text), "\\s+"), lang)

  /** Same, over an already-tokenized column — lets callers project the
    * token array ONCE and score many languages against it (languageId
    * would otherwise tokenize per language and depend on Catalyst
    * subexpression elimination to dedup the work).
    */
  private def stopwordRatioOfTokens(toks: Column, lang: String): Column = {
    val hits = filter(toks, t =>
      array_contains(lit(stopwords(lang).toArray), t))
    when(size(toks) > 0, size(hits).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** CJK / Cyrillic script character ratios decide non-Latin scripts. */
  private def scriptRatio(text: Column, pattern: String): Column = {
    val stripped = regexp_replace(text, pattern, "")
    when(length(text) > 0,
      (length(text) - length(stripped)).cast("double") / length(text))
      .otherwise(0.0)
  }

  /** Language identification: script ranges first (zh/ru), then the
    * stopword profile with the highest hit-rate among Latin languages;
    * `und` (undetermined) when nothing clears `minConfidence`.
    * Output: input columns + `lang_pred` + `lang_score`.
    */
  def languageId(df: DataFrame, textCol: String,
      minConfidence: Double = 0.05): DataFrame = {
    val t = col(textCol)
    val zh = scriptRatio(t, "[\\u4e00-\\u9fff]")
    val ru = scriptRatio(t, "[\\u0400-\\u04ff]")
    // Tokenize ONCE into a projected column; every language score reads it.
    val latinScores = stopwords.keys.toSeq.sorted
      .map(l => struct(stopwordRatioOfTokens(col("__toks"), l).as("score"),
        lit(l).as("lang")))
    val best = array_max(array(latinScores: _*))
    graft.SparkUtil.ensureParallelism(df)
      .withColumn("__toks", split(lower(t), "\\s+"))
      .withColumn("lang_pred",
        when(zh > 0.25, lit("zh"))
          .when(ru > 0.25, lit("ru"))
          .when(best.getField("score") >= minConfidence,
            best.getField("lang"))
          .otherwise(lit("und")))
      .withColumn("lang_score",
        round(greatest(zh, ru, best.getField("score")), 4))
      .drop("__toks")
  }

  /** Corpus text normalization (the standard pre-dedup/pre-train clean):
    * lowercase, strip HTML-ish tags, fold digit runs to `0`, collapse
    * whitespace, trim. Pure expression algebra (regexp_replace chains
    * stay inside codegen); adds `<outCol>`.
    */
  def normalize(df: DataFrame, textCol: String,
      outCol: String = "norm_text"): DataFrame = {
    val lowered = lower(col(textCol))
    val noTags = regexp_replace(lowered, "<[^>]*>", " ")
    val digitsFolded = regexp_replace(noTags, "[0-9]+", "0")
    val squashed = regexp_replace(digitsFolded, "\\s+", " ")
    graft.SparkUtil.ensureParallelism(df).withColumn(outCol, trim(squashed))
  }

  /** Composite quality score in [0,1]: mean of
    *   - long-token ratio (alpha tokens len>3)
    *   - lexical diversity (distinct/total tokens)
    *   - alpha character ratio
    *   - non-repetition (1 − max single-token frequency share)
    * plus boolean flags for common filters. Mirrors the usual LLM-corpus
    * quality heuristics (length / punctuation / stopword mix).
    */
  def qualityScore(df0: DataFrame, textCol: String): DataFrame = {
    val df = graft.SparkUtil.ensureParallelism(df0)
    val toks = split(col(textCol), "\\s+")
    val nTok = size(toks)
    val longRatio = when(nTok > 0,
      size(filter(toks, t => length(t) > 3)).cast("double") / nTok)
      .otherwise(0.0)
    val uniqRatio = when(nTok > 0,
      size(array_distinct(toks)).cast("double") / nTok).otherwise(0.0)
    val alphaRatio = when(length(col(textCol)) > 0,
      length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double") /
        length(col(textCol))).otherwise(0.0)
    df.withColumn("n_tokens", nTok)
      .withColumn("quality",
        round((longRatio + uniqRatio + alphaRatio) / 3.0, 4))
      .withColumn("too_short", nTok < 10)
      .withColumn("low_diversity", uniqRatio < 0.3)
  }

  /** Pretrained-linear-classifier inference — the fastText/logistic-head
    * quality-filter shape: a fixed weight vector over engineered text
    * features, evaluated as pure expression algebra so "model inference"
    * is a codegen'd projection over the scan (the way a 100 TB quality
    * pass actually ships: weights frozen offline, scoring embarrassingly
    * parallel, no shuffle at all).
    *
    * Features: English stopword fraction, lexical diversity
    * (distinct/total), mean token length, and a capped length feature
    * min(n_tokens, 1000)/1000. `keep` = score >= threshold.
    *
    * Arithmetic is FIXED-POINT end to end (SURVEY §5.4): each feature is
    * quantized to 1e-4 as a long (`round(raw·1e4, 0)` — scale-0 rounding
    * of the same IEEE double is portable; `round(x, 4)` is not), weights
    * are 2-dp (integer coefficients after ×100), so the score is an
    * EXACT integer in 1e-6 space and a dot product of 4-dp features with
    * 2-dp weights — which lands on .00005 decimal boundaries by
    * construction — never meets a float round. Shipped values are exact
    * integer quotients (bit-identical in every engine).
    */
  def linearQuality(df: DataFrame, textCol: String,
      weights: Seq[Double] = Seq(-0.6, 1.8, 0.9, 0.08, 0.35),
      threshold: Double = 0.5): DataFrame = {
    val wE2 = weights.map(w => math.round(w * 100))
    require(wE2.zip(weights).forall { case (i, w) => i / 100.0 == w },
      s"linearQuality weights must be 2-dp decimals, got $weights")
    val thrE6 = math.round(threshold * 1e6)
    val toks = filter(split(lower(col(textCol)), " "), t => length(t) > 0)
    val n = size(toks)
    def e4(raw: Column): Column = round(raw * 10000, 0).cast("long")
    val kStop = e4(when(n > 0,
      size(filter(toks, t => array_contains(lit(stopwords("en").toArray), t)))
        .cast("double") / n).otherwise(0.0))
    val kUniq = e4(when(n > 0,
      size(array_distinct(toks)).cast("double") / n).otherwise(0.0))
    val kMeanWl = e4(when(n > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
      .otherwise(0.0))
    val kLen = e4(least(n, lit(1000)).cast("double") / 1000.0)
    val scoreE6 = lit(wE2.head * 10000L) + lit(wE2(1)) * kStop +
      lit(wE2(2)) * kUniq + lit(wE2(3)) * kMeanWl + lit(wE2(4)) * kLen
    graft.SparkUtil.ensureParallelism(df)
      .withColumn("stop_frac", kStop / 10000.0)
      .withColumn("uniq_frac", kUniq / 10000.0)
      .withColumn("mean_wl", kMeanWl / 10000.0)
      .withColumn("clf_score", scoreE6.cast("double") / 1000000.0)
      .withColumn("score_e6", scoreE6)
      .withColumn("keep", scoreE6 >= thrE6)
  }

  /** Per-document token-distribution Shannon entropy — the information
    * signal behind the repetition verdicts: spam/templated text carries
    * low entropy even when no single token dominates (q65's top-word
    * fraction sees only the mode). H = ln n − (Σ c·ln c)/n over the
    * token histogram, reported in e4 nats: each ln term is pinned to
    * an e4 integer BEFORE the sum ([[LanguageModel]]'s discipline), the
    * per-doc division is exact integer `div`, so the value replays
    * bit-for-bit in SQL.
    *
    * Scale shape: the whole computation is per-row algebra over the
    * sorted token array (one fold accumulates run lengths AND the
    * Σ c·lnE4(c) term as runs close) — the corpus crosses ZERO
    * shuffles, the q65 discipline. Output: idCol, n_tokens,
    * n_distinct, entropy_e4, ttr (type-token ratio).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = split(col(textCol), " ")
    val lnE4 = (c: Column) =>
      round(log(c.cast("double")) * 10000, 0).cast("long")
    // run=0 only before the first element: guard keeps ln(0) (-Inf,
    // which ANSI cast-to-long rejects) out of the expression's value.
    val term = (run: Column) =>
      when(run > 0, run * lnE4(run)).otherwise(lit(0L))
    val runFold = (acc: Column, x: Column) =>
      when(x === acc.getField("prev"), acc.getField("run") + 1)
        .otherwise(lit(1L))
    // Fold over the sorted array: close each run into the Σ c·lnE4(c)
    // accumulator when the token changes; finish() closes the last run.
    val sumTerm = aggregate(array_sort(col("__t")),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("acc")),
      (acc, x) => struct(x.as("prev"), runFold(acc, x).as("run"),
        (acc.getField("acc") + when(x === acc.getField("prev"), lit(0L))
          .otherwise(term(acc.getField("run")))).as("acc")),
      acc => acc.getField("acc") + term(acc.getField("run")))
    val n = size(col("__t")).cast("long")
    val intDiv = (a: Column, b: Column) =>
      ((a - pmod(a, b)) / b).cast("long")
    graft.SparkUtil.ensureParallelism(df)
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol), n.as("n_tokens"),
        size(array_distinct(col("__t"))).cast("long").as("n_distinct"),
        (lnE4(n) - intDiv(sumTerm, n)).as("entropy_e4"),
        (size(array_distinct(col("__t"))).cast("double") /
          size(col("__t"))).as("ttr"))
  }

  /** Control characters that should never appear in clean text —
    * C0 minus TAB/LF/CR (RE2- and Java-regex-portable class).
    */
  val ControlCharRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** ENCODING/MOJIBAKE AUDIT — the data-quality gate that catches
    * transcoding damage before it reaches a tokenizer: per group,
    * documents carrying U+FFFD replacement characters (the universal
    * "decode failed here" marker) and documents carrying C0 control
    * characters (minus TAB/LF/CR). Bad decodes are per-FILE events, so
    * per-source rates localize the broken pipeline stage; a tokenizer
    * fed U+FFFD learns a garbage token that then attracts real text.
    * Pure per-row `contains`/regexp algebra — rides the scan, one
    * combinable aggregate.
    *
    * Output: (group, n_docs, n_replacement, n_control, repl_rate_e4,
    * ctrl_rate_e4).
    */
  def encodingAudit(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    graft.SparkUtil.ensureParallelism(df)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(t.contains("�"), 1L).otherwise(0L))
          .as("n_replacement"),
        sum(when(t.rlike(ControlCharRe), 1L).otherwise(0L))
          .as("n_control"))
      .withColumn("repl_rate_e4",
        expr("n_replacement * 10000 div n_docs"))
      .withColumn("ctrl_rate_e4",
        expr("n_control * 10000 div n_docs"))
  }

  /** KEYNESS — per-group characteristic terms by Dunning's G² (the
    * log-likelihood ratio of the 2×2 contingency table term × group,
    * Dunning 1993): for a term t in group g with observed in-group
    * count a, out-of-group count b = tt−a, other-in-group mass c =
    * st−a and remainder d = N−st−b, G² = 2·Σ k·ln(k/E_k) over the four
    * cells. The corpus-linguistics answer to "what vocabulary makes
    * this source DIFFERENT" — q160's PMI finds pairs that co-occur,
    * q172's MI scores the whole lang×source association; keyness ranks
    * individual terms per group, the signal behind source-mixture
    * descriptions and contamination triage ("why is this shard full of
    * SEO words"). Only over-represented cells (a·N > st·tt) rank —
    * positive keywords, the standard keyness convention.
    *
    * Portability: each cell's ln argument is the DOUBLE-RATIO product
    * (k/row)·(N/col) — mathematically the (k·N)/(row·col) association
    * ratio, but restructured so NO 64-bit integer product is ever
    * formed (r16; the r15 form multiplied k·N and row·col, capping the
    * exact-integer budget at √Long.Max ≈ 3·10⁹ tokens). Each cast is
    * exact for counts < 2^53 and both engines evaluate the identical
    * IEEE chain (divide, divide, multiply, ln), the ln is pinned at e4
    * (the psiReport discipline), and G²_e4 = 2·Σ k·lnE4 is then an
    * exact integer sum. The expected-count and over-representation
    * tests are restructured the same way (st/n·tt·10⁴ with FLOOR;
    * a/st > tt/n — the identical double comparison in both engines).
    * Overflow: the binding term is now the OUTPUT sum — |k·lnE4| ≤
    * k·ln(N)·10⁴, and the four cells' k sum to N, so |G²_e4| ≤
    * 2·N·ln(N)·10⁴, which fits a long to N = 10¹³ total tokens
    * (2·10¹³·30·10⁴ = 6·10¹⁸ < 2⁶³) — the 100 TB-corpus budget, 3,000×
    * the r15 ceiling. The cap is ENFORCED (the otsuThreshold
    * discipline): a corpus past it must pre-aggregate (keyness over
    * per-shard samples) rather than silently wrap.
    *
    * Scale shape: ONE tokenize+explode pass into a map-side-combinable
    * (group, term) count (checkpointed); everything after is
    * vocabulary-sized — term marginals via a term-partitioned window,
    * group marginals via a BROADCAST join of the groups-sized totals,
    * and the grand total as a literal (never a partition-less window
    * over the vocabulary table, which would single-thread a 100M-term
    * vocab). No second corpus scan, no join back to rows.
    *
    * Output: (group, rank, term, n_obs, exp_e4, g2_e4), rank 1..topK
    * per group by G² desc (tie: term asc).
    */
  def keyness(df: DataFrame, groupCol: String, textCol: String,
      minCount: Int = 5, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = graft.SparkUtil.ensureParallelism(df)
      .select(col(groupCol).as("grp"),
        explode(filter(split(lower(col(textCol)), " "),
          t => length(t) > 0)).as("term"))
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("a"))
      .localCheckpoint(true)
    val byTerm = Window.partitionBy(col("term"))
    val byGrp = Window.partitionBy(col("grp"))
    // lnE4 of the association ratio via the double-ratio product
    // (k/row)·(N/col): no integer product is ever formed, so the only
    // overflow budget left is the output sum (see scaladoc). Each cast
    // is exact below 2^53; both engines run the identical IEEE chain.
    val lnE4 = (k: Column, row: Column, cTot: Column, n: Column) =>
      round(log((k.cast("double") / row.cast("double")) *
        (n.cast("double") / cTot.cast("double"))) * 10000, 0)
        .cast("long")
    val cellTerm = (k: Column, row: Column, cTot: Column, n: Column) =>
      when(k > 0, k * lnE4(k, row, cTot, n)).otherwise(lit(0L))
    val grpTotals = cells.groupBy(col("grp"))
      .agg(sum(col("a")).as("st"))
    // Token census as an in-plan broadcast 1-row scalar instead of a
    // separate collect action (r22 — the q176/q233/q194 discipline):
    // one fewer sequential driver action per keyness call (q186 and
    // the q201 compose both pay it). The exact-integer output-sum
    // budget guard (|G²_e4| ≤ 2·N·ln(N)·10⁴ fits a long to N = 10¹³
    // tokens, mirroring otsuThreshold) rides IN the scalar expression
    // via raise_error, so any consumption of the scored table trips
    // it; coalesce keeps an empty corpus an empty result, not an NPE.
    val census = grpTotals.agg(
      when(coalesce(sum(col("st")), lit(0L)) <= 10000000000000L,
        coalesce(sum(col("st")), lit(0L)))
        .otherwise(raise_error(concat(
          lit("keyness: "), coalesce(sum(col("st")), lit(0L)).cast("string"),
          lit(" total tokens exceeds the exact-integer budget (the G2_e4 " +
            "output sum wraps past ~1e13 tokens) — pre-aggregate or " +
            "sample the corpus")))).as("__n"))
    val scored = cells
      .withColumn("tt", sum(col("a")).over(byTerm))
      .join(broadcast(grpTotals), Seq("grp"))
      .crossJoin(broadcast(census))
      .withColumn("n", col("__n"))
      .withColumn("b", col("tt") - col("a"))
      .withColumn("c", col("st") - col("a"))
      .withColumn("d", col("n") - col("st") - col("b"))
      // Over-representation as the identical double comparison in
      // both engines (a/st > tt/n) — the r15 integer products a·n and
      // st·tt would wrap past 3e9 tokens.
      .filter(col("a") >= minCount &&
        col("a").cast("double") / col("st").cast("double") >
          col("tt").cast("double") / col("n").cast("double"))
      .withColumn("g2_e4", lit(2L) * (
        cellTerm(col("a"), col("st"), col("tt"), col("n")) +
          cellTerm(col("b"), col("n") - col("st"), col("tt"), col("n")) +
          cellTerm(col("c"), col("st"), col("n") - col("tt"), col("n")) +
          cellTerm(col("d"), col("n") - col("st"), col("n") - col("tt"),
            col("n"))))
      .withColumn("exp_e4",
        floor(col("st").cast("double") / col("n").cast("double") *
          col("tt").cast("double") * lit(10000)).cast("long"))
      .withColumn("rank", row_number().over(
        byGrp.orderBy(col("g2_e4").desc, col("term"))))
      .filter(col("rank") <= topK)
    scored.select(col("grp").as(groupCol),
      col("rank").cast("long").as("rank"), col("term"),
      col("a").as("n_obs"), col("exp_e4"), col("g2_e4"))
  }

  /** DISTINCT-n corpus diversity — per group, for n ∈ {1..maxN}: total
    * n-grams, distinct n-grams, and the distinct ratio at e4 (the
    * "distinct-1/distinct-2" metrics of Li et al. 2016 — the standard
    * templatedness/diversity gauge run before admitting a source to a
    * mixture; a low distinct-3 says the source is boilerplate even when
    * document-level dedup is clean). Total counts are map-side
    * combinable; the distinct count shuffles (group, n, gram) once —
    * vocabulary-sized, the same budget as any df count.
    *
    * One tokenize pass: each doc's n-gram arrays for every n are built
    * from ONE split and exploded together (n tags the rows), so the
    * corpus crosses one Generate + one aggregate regardless of maxN.
    *
    * Output: (group, n, total_grams, distinct_grams, distinct_e4).
    */
  def distinctNgrams(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val toks = split(lower(col(textCol)), " ")
    // Guard short docs: sequence(1, 0) in Spark DESCENDS ([1, 0]), so
    // the window must only be built when the doc has >= n tokens.
    val gramsOf = (n: Int) => {
      val t = col("__t")
      when(size(t) >= n,
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => array_join(slice(t, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    graft.SparkUtil.ensureParallelism(df)
      .select(col(groupCol).as("grp"), toks.as("__t"))
      .select(col("grp"), explode(array((1 to maxN).map(n =>
        struct(lit(n.toLong).as("n"), gramsOf(n).as("gs"))): _*)).as("__g"))
      .select(col("grp"), col("__g.n").as("n"),
        explode(col("__g.gs")).as("gram"))
      .groupBy(col("grp"), col("n"))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("gram")).as("distinct_grams"))
      .withColumn("distinct_e4",
        expr("distinct_grams * 10000 div total_grams"))
      .withColumnRenamed("grp", groupCol)
  }
}
