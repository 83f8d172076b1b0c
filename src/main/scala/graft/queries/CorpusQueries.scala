package graft.queries

import graft.Tables
import graft.operators.{Cdc, Curation, Drift, ParagraphDedup, SpanDedup,
  Stats, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q98–q101: substring-level dedup and corpus-adaptive curation — the
  * span tier. Document-level dedup (q19/q27/q28) treats a document as
  * the unit; these operators work BELOW it (duplicated token runs,
  * q98/q101), or ABOVE it (corpus-derived thresholds q99, novelty
  * attribution q100). All four are exact integer/string algebra with
  * full DuckDB oracles.
  */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val K = 8 // span shingle width (tokens)

  // q98: duplicated-span report — maximal cross-doc verbatim runs of
  // >= K tokens, per doc: span count, covered tokens, covered fraction.
  def q98(s: SparkSession, dir: String): DataFrame =
    SpanDedup.report(docs(s, dir), "doc_id", "text", k = K, minDocFreq = 2)
      .orderBy(col("doc_id"))

  // q99: adaptive per-language quality cutoff — keep docs at/above the
  // language's P25 of the e3 fixed-point mean-word-length score. The
  // cutoff is DERIVED from the corpus (histogram percentile), not
  // hand-tuned.
  def q99(s: SparkSession, dir: String): DataFrame =
    Curation.adaptiveThreshold(docs(s, dir), "lang",
        expr("(CAST(n_chars AS BIGINT) * 1000) div size(split(text, ' '))"),
        pctNum = 1, pctDen = 4)
      .orderBy(col("lang"))

  // q100: n-gram novelty attribution — per doc, the fraction of its
  // distinct 3-grams that no lower-id doc contains (diversity decay in
  // corpus order).
  def q100(s: SparkSession, dir: String): DataFrame =
    Curation.ngramNovelty(docs(s, dir), "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))

  // q101: the q98 rewrite applied — corpus with duplicated spans
  // REMOVED, certified byte-for-byte via md5 of the rebuilt text.
  def q101(s: SparkSession, dir: String): DataFrame =
    SpanDedup.stripSpans(docs(s, dir), "doc_id", "text", k = K,
        minDocFreq = 2)
      .select(col("doc_id"), md5(col("text")).as("clean_md5"),
        col("n_removed"))
      .orderBy(col("doc_id"))

  private val W = 12 // paragraph-grid segment width (tokens)

  // q126: CCNet/RefinedWeb-style paragraph-hash boilerplate removal —
  // the CHEAP substring-dedup tier (non-overlapping W-token grid, n/W
  // hash rows per doc) vs q98/q101's overlapping-shingle span tier.
  // Certified byte-for-byte via md5 of the rebuilt text.
  def q126(s: SparkSession, dir: String): DataFrame =
    ParagraphDedup.strip(docs(s, dir), "doc_id", "text", w = W,
        minDocFreq = 2)
      .select(col("doc_id"), md5(col("text")).as("clean_md5"),
        col("n_segs"), col("n_dup_segs"), col("n_removed"))
      .orderBy(col("doc_id"))

  // q130: content-defined-chunking dedup — the shift-robust third
  // member of the substring trilogy (fixed grid q126, shingle spans
  // q98/q101): cut after token i when hash(4-token window) % 16 == 0,
  // strip chunks hashed in >= 2 distinct docs, same certified rebuild.
  def q130(s: SparkSession, dir: String): DataFrame =
    Cdc.strip(docs(s, dir), "doc_id", "text", w = 4, modulus = 16,
        minDocFreq = 2)
      .select(col("doc_id"), md5(col("text")).as("clean_md5"),
        col("n_chunks"), col("n_dup_chunks"), col("n_removed"))
      .orderBy(col("doc_id"))

  // q132: per-doc token-distribution Shannon entropy (e4 nats) + TTR —
  // the information signal q65's mode-only fractions miss; zero-shuffle
  // per-row fold over the sorted token array.
  def q132(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenEntropy(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // q133: corpus Zipf power-law fit — one-row least-squares slope /
  // intercept over the top-1000 token ranks, both axes e4-pinned so the
  // moment sums are exact integers.
  def q133(s: SparkSession, dir: String): DataFrame =
    Stats.zipfFit(docs(s, dir), "text", topR = 1000)

  // q134: dedup-tier attribution — the three substring tiers run
  // side-by-side on the SAME corpus, reporting per doc how many token
  // positions each flags (grid q126, CDC q130, shingle spans q98) and
  // the union. The triage view for choosing a tier at 100 TB: span
  // coverage ⊇ the others on long runs; what ONLY the span tier sees
  // is sub-grid-width duplication, what CDC adds over grid is
  // misaligned boilerplate. Each tier's stream is the operator's own
  // (checkpointed once); the merge is three doc-keyed span-list joins
  // and one per-row counting filter. The corpus is TOKENIZED ONCE —
  // one checkpointed (doc_id, tokens) table feeds all three tiers and
  // the coverage count (r11 ran split(text) four times, making q134
  // the slowest batch query purely from re-tokenization).
  def q134(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.SparkUtil.ensureParallelism(docs(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .localCheckpoint(true)
    val grid = ParagraphDedup.dupSpansTokens(tok, "doc_id", "__t", w = W,
      minDocFreq = 2)
    val cdc = Cdc.dupSpansTokens(tok, "doc_id", "__t", w = 4,
      modulus = 16, minDocFreq = 2)
    val span = SpanDedup.spansTokens(tok, "doc_id", "__t", k = K,
        minDocFreq = 2)
      .select(col("doc_id"), col("span_start").as("s"),
        col("span_end").as("e"))
    // ONE union-tagged span aggregate + ONE join (r22, guide §2.4):
    // the three per-detector groupBy+left-join chains shuffled the
    // same doc-keyed span rows three times and joined three times;
    // tagging the detector in a union lets a single aggregate build
    // all three lists (collect_list skips the other detectors' null
    // rows) and a single left join attach them.
    def tag(df: DataFrame, k: Int) = df.select(col("doc_id"),
      lit(k).as("__k"), col("s").cast("int").as("s"),
      col("e").cast("int").as("e"))
    def listOf(k: Int) = collect_list(when(col("__k") === k,
      struct(col("s"), col("e"))))
    val noSpans = array().cast("array<struct<s:int,e:int>>")
    // Covered-position count as UNION-OF-INTERVALS length (r21): the
    // r19 shape evaluated `exists(spans, ...)` for EVERY token position
    // of every doc, four times — O(tokens × spans × 4) interpreted
    // lambda calls per row (HOFs don't codegen), which the profile
    // showed as ~3 s of jobsum for a counting projection. Sorting the
    // span list and folding a (covered-end, total) pair counts the same
    // positions in O(spans log spans) per row: clamp each [s, e] to
    // [1, n], add the part past the running end, advance the end.
    // Overlaps, nesting and out-of-range spans contribute exactly what
    // the per-position scan counted.
    def covCount(lists: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      aggregate(array_sort(lists),
        struct(lit(0).as("end"), lit(0L).as("tot")),
        (acc, sp) => {
          val hi = least(sp.getField("e"), n)
          val lo = greatest(sp.getField("s"), lit(1),
            acc.getField("end") + 1)
          struct(
            greatest(acc.getField("end"), hi).as("end"),
            (acc.getField("tot") +
              when(hi >= lo, (hi - lo + 1).cast("long"))
                .otherwise(lit(0L))).as("tot"))
        },
        acc => acc.getField("tot"))
    val lists = tag(grid, 1).unionByName(tag(cdc, 2)).unionByName(tag(span, 3))
      .groupBy(col("doc_id"))
      .agg(listOf(1).as("__g"), listOf(2).as("__c"), listOf(3).as("__s"))
    tok.join(lists, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("__t")).as("__n"),
        coalesce(col("__g"), noSpans).as("__g"),
        coalesce(col("__c"), noSpans).as("__c"),
        coalesce(col("__s"), noSpans).as("__s"))
      .select(col("doc_id"), col("__n").cast("long").as("n_words"),
        covCount(col("__g"), col("__n")).as("cov_grid"),
        covCount(col("__c"), col("__n")).as("cov_cdc"),
        covCount(col("__s"), col("__n")).as("cov_span"),
        covCount(concat(col("__g"), col("__c"), col("__s")), col("__n"))
          .as("cov_any"))
      .filter(col("cov_any") > 0)
      .orderBy(col("doc_id"))
  }

  // q150: PSI distribution-drift monitor — the go/no-go gate between a
  // reference corpus snapshot (even doc_ids, standing in for yesterday's
  // accepted corpus) and an arrival cohort (odd doc_ids) BEFORE the new
  // data joins a 100 TB training mix. Three features spanning the two
  // feature shapes — binned numerics (chars div 100, words div 20,
  // zero-padded so lexical bin order is numeric order) and a raw
  // categorical (lang) — stack through ONE map-side explode into one
  // (feature, bin) aggregate; per-bin PSI terms localize the drift,
  // window totals give the per-feature index an operator alerts on.
  // Smoothed shares in e6 truncating-div integers; the ln-based PSI
  // terms rounded at e4 (the q91 cross-engine ln discipline).
  def q150(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Drift.psiReport(d, col("doc_id") % 2 === 0, Seq(
        "chars" -> expr("lpad(CAST(n_chars div 100 AS STRING), 2, '0')"),
        "words" ->
          expr("lpad(CAST(size(split(text, ' ')) div 20 AS STRING), 2, '0')"),
        "lang" -> col("lang")))
      .orderBy(col("feature"), col("bin"))
  }

  // q195: Kolmogorov–Smirnov two-sample drift — q150's sup-norm
  // sibling (binning-free on ordered features, catches the pure
  // location shift PSI's coarse bins smear): per feature, the maximal
  // cumulative gap as exact integers plus the value where the
  // distributions cross worst.
  def q195(s: SparkSession, dir: String): DataFrame =
    Drift.ksReport(docs(s, dir), col("doc_id") % 2 === 0, Seq(
        "chars" -> col("n_chars"),
        "words" -> size(split(col("text"), " ")).cast("long")))
      .orderBy(col("feature"))

  // q153: Heaps'-law vocabulary-growth fit — q133's dataset-SCALING
  // sibling: V(T) ≈ K·T^β over ten ingestion-order prefixes (evenly
  // spaced doc-id cuts from a min/max aggregate — no global sort).
  // β answers "does more of this source still add vocabulary?" before
  // a 100 TB mixture commits to it. Two combinable corpus aggregates
  // (word first-occurrence ids, per-doc token counts) each joined to
  // the broadcast 10-row checkpoint relation; e4-pinned ln axes,
  // integer moments, two final IEEE divisions (the q133 discipline).
  def q153(s: SparkSession, dir: String): DataFrame =
    Stats.heapsFit(docs(s, dir), "doc_id", "text", checkpoints = 10)

  /** q155's frozen vocabulary size — deliberately smaller than the
    * corpus vocabulary so the tail mass is measurable (a production
    * tokenizer vocab never covers the open corpus).
    */
  private val VocabK = 16

  // q155: OOV-rate audit per source — the unk-rate measurement run
  // BEFORE committing a frozen vocabulary to a 100 TB tokenization
  // (q147 measures fertility of a LEARNED tokenizer; this measures
  // what a FROZEN top-K vocabulary misses, per source): vocab = the
  // top-K corpus words (count desc, word tie-break — q133's top-rank
  // discipline), then per source the token occurrences and distinct
  // words falling OUTSIDE it, as counts and an e4 rate. Corpus passes:
  // ONE (source, word) map-side-combinable count; the vocab is a
  // TakeOrdered over the word margin and broadcasts into an anti-join
  // — the corpus never shuffles on anything wider than its vocabulary.
  def q155(s: SparkSession, dir: String): DataFrame = {
    val sw = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val vocab = sw.groupBy(col("w")).agg(sum(col("c")).as("tc"))
      .orderBy(col("tc").desc, col("w")).limit(VocabK)
      .select(col("w"))
    val oov = sw.join(broadcast(vocab), Seq("w"), "left_anti")
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_oov"),
        count(lit(1)).as("distinct_oov"))
    sw.groupBy(col("source")).agg(sum(col("c")).as("n_tokens"))
      .join(oov, Seq("source"), "left")
      .select(col("source"), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("distinct_oov"), lit(0L)).as("distinct_oov"))
      .withColumn("oov_e4", expr("n_oov * 10000 div n_tokens"))
      .coalesce(1)
      .orderBy(col("source"))
  }

  // q160: top-20 PMI collocations — the multi-word-expression miner
  // (Church & Hanks): ordered skip-gram pairs at distance <= 3, pair
  // counts >= 5, PMI quantized e4 before the total-ordered top-K.
  def q160(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.pmiTopK(docs(s, dir), "text",
      maxDist = 3, minCount = 5, topK = 20)

  // q161: grouped-jackknife error bar + leave-one-source-out influence
  // for the corpus mean tokens/doc — the uncertainty a mixture decision
  // should see next to the point estimate (and q134's "which source
  // moves the metric" question answered by complement algebra).
  def q161(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "),
      t => length(t) > 0)
    Stats.jackknifeMean(
        docs(s, dir).select(col("source"),
          size(toks).cast("long").as("n_toks")),
        "source", "n_toks")
      .orderBy(col("source"))
  }

  // q166: TextRank corpus keywords — PageRank centrality over the
  // co-occurrence graph q160 mines; pure operator composition
  // (Collocations.pairCounts × Ranking.pageRank), all-integer.
  def q166(s: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.textRank(docs(s, dir), "text",
      maxDist = 3, minCount = 5, iterations = 3, topK = 25)

  // q172: categorical MUTUAL INFORMATION between lang and source —
  // "is source informative of language?" (drives whether a mixture
  // should stratify jointly or independently): per-cell pointwise
  // ln-association pinned to e4 (q91's cross-engine ln discipline),
  // MI as the exact-integer Σ n·t_e4 over the cells²-sized matrix,
  // one final division chain. Corpus crosses ONE combinable aggregate.
  def q172(s: SparkSession, dir: String): DataFrame = {
    val cells = docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
    cells
      .withColumn("__cx", sum(col("n")).over(w.partitionBy(col("lang"))))
      .withColumn("__cy",
        sum(col("n")).over(w.partitionBy(col("source"))))
      .withColumn("__nn", sum(col("n")).over(w.partitionBy()))
      .withColumn("t_e4",
        round(log((col("n") * col("__nn")).cast("double") /
          (col("__cx") * col("__cy")).cast("double")) * 10000, 0)
          .cast("long"))
      .withColumn("mi_nats",
        sum(col("n") * col("t_e4")).over(w.partitionBy())
          .cast("double") / col("__nn") / lit(10000.0))
      .select(col("lang"), col("source"), col("n"), col("t_e4"),
        col("mi_nats"))
      .orderBy(col("lang"), col("source"))
  }

  // q173: per-language OLS of n_chars against token count — does the
  // chars-per-token relationship (≈ tokenizer byte fertility) differ
  // by language, with r² saying how linear it is.
  def q173(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "),
      t => length(t) > 0)
    Stats.olsByGroup(
        docs(s, dir).select(col("lang"),
          size(toks).cast("long").as("x"), col("n_chars").as("y")),
        "lang", "x", "y")
      .orderBy(col("lang"))
  }

  // q198: ROBUST per-language trend — Bartlett's three-group resistant
  // line over the same (tokens, chars) relationship q173 fits by OLS:
  // coordinate-wise medians of the outer x-terciles, every median an
  // exact histogram-rank selection (no per-group sort, no O(n²)
  // Theil–Sen pairs). One wild doc cannot move this slope.
  def q198(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "),
      t => length(t) > 0)
    Stats.robustTrendByGroup(
        docs(s, dir).select(col("lang"),
          size(toks).cast("long").as("x"), col("n_chars").as("y")),
        "lang", "x", "y")
      .orderBy(col("lang"))
  }

  // q182: the one-row corpus DATASHEET — the dataset-card numbers a
  // release ships (docs/tokens/languages/sources, exact-dup mass, the
  // token median): counts from two combinable aggregates (corpus +
  // md5-group table), the median from the q176/q177 histogram-cumsum
  // selection — nothing here sorts or collects the corpus.
  def q182(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "),
      t => length(t) > 0)
    val d = docs(s, dir).select(col("lang"), col("source"),
        md5(col("text")).as("__m"), size(toks).cast("long").as("__n"))
      .localCheckpoint(true)
    val base = d.agg(count(lit(1)).as("n_docs"),
      sum(col("__n")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val dups = d.groupBy(col("__m")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L))
        .as("exact_dup_docs"))
    val med = d.groupBy(col("__n")).agg(count(lit(1)).as("c"))
      .withColumn("__cum", sum(col("c")).over(org.apache.spark.sql
        .expressions.Window.orderBy(col("__n"))))
      .withColumn("__t", sum(col("c")).over(org.apache.spark.sql
        .expressions.Window.partitionBy()))
      .filter(col("__cum") >= expr("(__t + 1) div 2"))
      .agg(min(col("__n")).as("median_tokens"))
    base.crossJoin(broadcast(dups)).crossJoin(broadcast(med))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_sources"), col("exact_dup_docs"),
        expr("CAST(exact_dup_docs * 10000 div n_docs AS BIGINT)")
          .as("dup_frac_e4"),
        expr("CAST(n_tokens * 100 div n_docs AS BIGINT)")
          .as("mean_tokens_e2"),
        col("median_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q182_dataset_card" -> (q182 _),
    "q173_group_ols" -> (q173 _),
    "q172_mutual_information" -> (q172 _),
    "q166_textrank_keywords" -> (q166 _),
    "q161_jackknife_influence" -> (q161 _),
    "q160_pmi_collocations" -> (q160 _),
    "q134_dedup_attribution" -> (q134 _),
    "q150_psi_drift" -> (q150 _),
    "q195_ks_drift" -> (q195 _),
    "q198_robust_trend" -> (q198 _),
    "q153_heaps_fit" -> (q153 _),
    "q155_oov_rate" -> (q155 _),
    "q98_span_dedup" -> (q98 _),
    "q99_adaptive_threshold" -> (q99 _),
    "q100_ngram_novelty" -> (q100 _),
    "q101_span_strip" -> (q101 _),
    "q126_paragraph_dedup" -> (q126 _),
    "q130_cdc_dedup" -> (q130 _),
    "q132_token_entropy" -> (q132 _),
    "q133_zipf_fit" -> (q133 _))

  // Shared CTE prefix: K-shingle positions and the merged duplicated
  // spans (the SQL mirror of SpanDedup.spans at k=8, minDocFreq=2).
  private val SpanCtes =
    """toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
      |          FROM documents),
      |pos AS (SELECT doc_id, len(t) AS n_words, t,
      |          unnest(range(1, len(t) - 8 + 2)) AS i
      |        FROM toks WHERE len(t) >= 8),
      |ng AS (SELECT doc_id, n_words, i,
      |         list_aggregate(t[i:i+7], 'string_agg', ' ') AS g FROM pos),
      |dup AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM ng)
      |        GROUP BY g HAVING COUNT(*) >= 2),
      |dp AS (SELECT ng.doc_id, ng.n_words, ng.i FROM ng JOIN dup USING (g)),
      |isl AS (SELECT doc_id, n_words, i,
      |          CASE WHEN i > COALESCE(LAG(i) OVER
      |            (PARTITION BY doc_id ORDER BY i), -9) + 8
      |          THEN 1 ELSE 0 END AS nw
      |        FROM dp),
      |run AS (SELECT doc_id, n_words, i, SUM(nw) OVER
      |          (PARTITION BY doc_id ORDER BY i) AS island FROM isl),
      |sp AS (SELECT doc_id, n_words, MIN(i) AS s, MAX(i) + 7 AS e
      |       FROM run GROUP BY doc_id, n_words, island)""".stripMargin

  val oracle: Map[String, String] = Map(
    // q182: the same aggregates + the histogram lower median; all
    // exact integers, trunc-div shares.
    "q182_dataset_card" ->
      """WITH d AS (SELECT lang, source, md5(text) AS m,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), ' '),
        |      x -> LENGTH(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM d),
        |g AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY m),
        |dd AS (SELECT CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c END), 0)
        |    AS BIGINT) AS exact_dup_docs FROM g),
        |h AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY n),
        |w AS (SELECT n,
        |    CAST(SUM(c) OVER (ORDER BY n) AS BIGINT) AS cum,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM h) AS t FROM h),
        |md AS (SELECT CAST(MIN(n) AS BIGINT) AS median_tokens FROM w
        |  WHERE cum >= (t + 1) // 2)
        |SELECT b.n_docs, b.n_tokens, b.n_langs, b.n_sources,
        |  dd.exact_dup_docs,
        |  CAST(dd.exact_dup_docs * 10000 // b.n_docs AS BIGINT)
        |    AS dup_frac_e4,
        |  CAST(b.n_tokens * 100 // b.n_docs AS BIGINT) AS mean_tokens_e2,
        |  md.median_tokens
        |FROM b, dd, md""".stripMargin,
    // q173: exact integer moments, then the engine's identical
    // centered-moment double expressions (left-assoc division chains).
    "q173_group_ols" ->
      """WITH t AS (SELECT lang,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), ' '),
        |      x -> LENGTH(x) > 0)) AS BIGINT) AS x,
        |    CAST(n_chars AS BIGINT) AS y
        |  FROM documents),
        |g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM t GROUP BY lang)
        |SELECT lang, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / n AS intercept,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE)
        |    * (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        |FROM g ORDER BY lang""".stripMargin,
    // q172: margins/total as windows over the cells-sized aggregate;
    // per-cell ln pinned e4 before the exact integer MI sum.
    "q172_mutual_information" ->
      """WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang, source),
        |w AS (SELECT c.*,
        |    CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS cx,
        |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS cy,
        |    CAST(SUM(n) OVER () AS BIGINT) AS nn FROM c),
        |t AS (SELECT lang, source, n,
        |    CAST(ROUND(ln(CAST(n * nn AS DOUBLE)
        |      / CAST(cx * cy AS DOUBLE)) * 10000, 0) AS BIGINT) AS t_e4,
        |    nn FROM w)
        |SELECT lang, source, n, t_e4,
        |  CAST(SUM(n * t_e4) OVER () AS DOUBLE) / nn / 10000e0
        |    AS mi_nats
        |FROM t ORDER BY lang, source""".stripMargin,
    // q166: q160's pair CTEs feed the edge set; PageRank unrolls as
    // materialized per-iteration CTEs (q118's replay — plain CTEs
    // would re-execute the chain exponentially), contributions in the
    // engine's exact div-first integer association.
    "q166_textrank_keywords" -> {
      val iters = (1 to 3).map { i =>
        val p = s"r${i - 1}"
        s"""k$i AS MATERIALIZED (SELECT und.dst,
           |  CAST(SUM(r // 100 // deg * 85) AS BIGINT) AS cin
           |  FROM und JOIN $p ON $p.id = und.src
           |  JOIN deg ON deg.src = und.src GROUP BY 1),
           |r$i AS MATERIALIZED (SELECT $p.id,
           |  CAST(150000000 + COALESCE(k$i.cin, 0) AS BIGINT) AS r
           |  FROM $p LEFT JOIN k$i ON k$i.dst = $p.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (SELECT
         |    list_filter(regexp_split_to_array(lower(text), ' '),
         |                x -> LENGTH(x) > 0) AS t
         |  FROM documents),
         |pos AS (SELECT t, unnest(range(1, len(t) + 1)) AS i FROM toks),
         |pw AS (SELECT t[i] AS w1, t[i + d] AS w2
         |       FROM pos CROSS JOIN (VALUES (1), (2), (3)) v(d)
         |       WHERE i + d <= len(t)),
         |pc AS MATERIALIZED (SELECT w1, w2,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM pw GROUP BY w1, w2),
         |ed AS MATERIALIZED (SELECT DISTINCT least(w1, w2) AS a,
         |    greatest(w1, w2) AS b
         |  FROM pc WHERE c >= 5 AND w1 <> w2),
         |und AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
         |  UNION ALL SELECT b AS src, a AS dst FROM ed),
         |deg AS MATERIALIZED (SELECT src,
         |  CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT src AS id,
         |  CAST(1000000000 AS BIGINT) AS r FROM deg),
         |$iters
         |SELECT id AS word, r AS rank_e9 FROM r3
         |ORDER BY rank_e9 DESC, word LIMIT 25""".stripMargin
    },
    // q161: every loo mean is one exact-integer division; the SE's
    // sum-of-squares runs in e4 integer space ((G·Σl² − T²)/G identity)
    // — HUGEINT sums CAST to BIGINT before products, sqrt/divisions
    // replayed in the engine's exact shape (10000e0, not the DECIMAL
    // literal 10000.0).
    "q161_jackknife_influence" ->
      """WITH t AS (SELECT source,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), ' '),
        |      x -> LENGTH(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(n) AS BIGINT) AS s
        |      FROM t GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
        |          CAST(SUM(s) AS BIGINT) AS ss,
        |          CAST(COUNT(*) AS BIGINT) AS gg FROM g),
        |l AS (SELECT g.source, g.n_docs, g.s AS n_value,
        |    CAST(tot.ss - g.s AS DOUBLE) / (tot.nn - g.n_docs)
        |      AS loo_mean,
        |    CAST(ROUND(CAST(tot.ss - g.s AS DOUBLE)
        |      / (tot.nn - g.n_docs) * 10000, 0) AS BIGINT) AS l_e4,
        |    CAST(ROUND(CAST(tot.ss AS DOUBLE) / tot.nn * 10000, 0)
        |      AS BIGINT) AS m_e4,
        |    tot.gg AS gg
        |  FROM g CROSS JOIN tot),
        |j AS (SELECT CAST(SUM(l_e4) AS BIGINT) AS t4,
        |        CAST(SUM(l_e4 * l_e4) AS BIGINT) AS ssq,
        |        MAX(gg) AS gg FROM l)
        |SELECT l.source, l.n_docs, l.n_value, l.loo_mean,
        |  l.l_e4 - l.m_e4 AS influence_e4,
        |  sqrt(CAST((j.gg - 1) * (j.gg * j.ssq - j.t4 * j.t4)
        |    AS DOUBLE)) / j.gg / 10000e0 AS jack_se
        |FROM l CROSS JOIN j ORDER BY l.source""".stripMargin,
    // q160: pair marginals computed over the FULL pair-type table (the
    // min-count floor applies only at scoring), products cast to DOUBLE
    // as exact integers (<= 2^53), same ln/e4/tie-break as the engine.
    "q160_pmi_collocations" ->
      """WITH toks AS (SELECT
        |    list_filter(regexp_split_to_array(lower(text), ' '),
        |                x -> LENGTH(x) > 0) AS t
        |  FROM documents),
        |pos AS (SELECT t, unnest(range(1, len(t) + 1)) AS i FROM toks),
        |pr AS (SELECT t[i] AS w1, t[i + d] AS w2
        |       FROM pos CROSS JOIN (VALUES (1), (2), (3)) v(d)
        |       WHERE i + d <= len(t)),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM pr GROUP BY w1, w2),
        |m1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS m1
        |       FROM c2 GROUP BY w1),
        |m2 AS (SELECT w2, CAST(SUM(c) AS BIGINT) AS m2
        |       FROM c2 GROUP BY w2),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c2),
        |sc AS (SELECT c2.w1, c2.w2, c2.c AS n_pairs,
        |    CAST(ROUND(ln(CAST(c2.c * n.n AS DOUBLE)
        |      / CAST(m1.m1 * m2.m2 AS DOUBLE)) * 10000, 0) AS BIGINT)
        |      AS pmi_e4
        |  FROM c2 JOIN m1 ON c2.w1 = m1.w1 JOIN m2 ON c2.w2 = m2.w2
        |  CROSS JOIN n WHERE c2.c >= 5)
        |SELECT w1, w2, n_pairs, pmi_e4 FROM sc
        |ORDER BY pmi_e4 DESC, w1, w2 LIMIT 20""".stripMargin,
    // q150: full PSI replay — same stacked (feature, bin) counts, the
    // same Laplace denominators (cohort total + observed bin count,
    // derived from the data), e6 truncating-div shares, and the same
    // double algebra under ROUND-4: both engines divide the identical
    // integers and take ln of the identical quotient, so the e4 terms
    // and their integer window sums agree bit-for-bit.
    // q155: replays the frozen-vocab cut (count desc, word — QUALIFY
    // over the same margin) and the per-source anti-join tail mass.
    "q155_oov_rate" ->
      s"""WITH sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT source,
         |          unnest(regexp_split_to_array(text, ' ')) AS w
         |        FROM documents) GROUP BY 1, 2),
         |vocab AS (SELECT w FROM (
         |    SELECT w, SUM(c) AS tc, ROW_NUMBER() OVER
         |      (ORDER BY SUM(c) DESC, w) AS r
         |    FROM sw GROUP BY w) WHERE r <= $VocabK),
         |oov AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_oov,
         |          CAST(COUNT(*) AS BIGINT) AS distinct_oov
         |        FROM sw ANTI JOIN vocab USING (w) GROUP BY source),
         |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens
         |        FROM sw GROUP BY source)
         |SELECT t.source, t.n_tokens,
         |  CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov,
         |  CAST(COALESCE(o.distinct_oov, 0) AS BIGINT) AS distinct_oov,
         |  CAST(COALESCE(o.n_oov, 0) * 10000 // t.n_tokens AS BIGINT)
         |    AS oov_e4
         |FROM tot t LEFT JOIN oov o ON o.source = t.source
         |ORDER BY t.source""".stripMargin,
    // q153: replays the Heaps fit — the same integer checkpoint
    // thresholds (min + (max−min)·i // 10: `//` and the engine's Long
    // division both truncate toward zero, operands non-negative), the
    // first-occurrence and token-count aggregates, e4 ln axes, exact
    // integer window moments, and q133's two final-division textual
    // forms.
    "q153_heaps_fit" ->
      """WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
        |           FROM documents),
        |ck AS (SELECT CAST(i.range AS BIGINT) AS ckpt,
        |         b.lo + (b.hi - b.lo) * CAST(i.range AS BIGINT) // 10
        |           AS cut_doc
        |       FROM b CROSS JOIN range(1, 11) i),
        |d AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |      FROM documents),
        |fo AS (SELECT w, MIN(doc_id) AS fd FROM
        |         (SELECT doc_id, unnest(t) AS w FROM d) GROUP BY w),
        |v AS (SELECT ck.ckpt, ck.cut_doc,
        |        CAST(COUNT(*) AS BIGINT) AS n_vocab
        |      FROM fo JOIN ck ON fo.fd <= ck.cut_doc GROUP BY 1, 2),
        |tt AS (SELECT ck.ckpt, ck.cut_doc,
        |         CAST(SUM(len(d.t)) AS BIGINT) AS n_tokens
        |       FROM d JOIN ck ON d.doc_id <= ck.cut_doc GROUP BY 1, 2),
        |xy AS (SELECT tt.ckpt, tt.cut_doc, tt.n_tokens,
        |         CAST(COALESCE(v.n_vocab, 0) AS BIGINT) AS n_vocab,
        |         CAST(ROUND(ln(CAST(tt.n_tokens AS DOUBLE)) * 10000, 0)
        |           AS BIGINT) AS x,
        |         CAST(ROUND(ln(CAST(COALESCE(v.n_vocab, 0) AS DOUBLE))
        |           * 10000, 0) AS BIGINT) AS y
        |       FROM tt LEFT JOIN v
        |         ON v.ckpt = tt.ckpt AND v.cut_doc = tt.cut_doc),
        |m AS (SELECT *, CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |        CAST(SUM(x) OVER () AS BIGINT) AS sx,
        |        CAST(SUM(y) OVER () AS BIGINT) AS sy,
        |        CAST(SUM(x * y) OVER () AS BIGINT) AS sxy,
        |        CAST(SUM(x * x) OVER () AS BIGINT) AS sxx
        |      FROM xy)
        |SELECT ckpt, cut_doc, n_tokens, n_vocab, x, y,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
        |    (CAST(n * sxy - sx * sy AS DOUBLE) /
        |     CAST(n * sxx - sx * sx AS DOUBLE)) *
        |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept_e4
        |FROM m ORDER BY ckpt""".stripMargin,
    "q198_robust_trend" -> {
      // histogram-rank pick as a reusable CTE triple (flattened to
      // single lines — fragment lines must not re-enter stripMargin)
      def pick(src: String, v: String, rank: String, name: String) =
        s"${name}_h AS (SELECT g, $v AS v, CAST(COUNT(*) AS BIGINT) " +
          s"AS c FROM $src GROUP BY 1, 2), " +
          s"${name}_c AS (SELECT g, v, SUM(c) OVER (PARTITION BY g " +
          s"ORDER BY v) AS cum, SUM(c) OVER (PARTITION BY g) AS n " +
          s"FROM ${name}_h), " +
          s"$name AS (SELECT g, MIN(v) AS $name FROM ${name}_c " +
          s"WHERE cum >= $rank GROUP BY g)"
      val r13 = "(n + 2) // 3"
      val rUp = "n - ((n + 2) // 3) + 1"
      val med = "(n + 1) // 2"
      "WITH base AS (SELECT lang AS g, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(text), ' '), " +
        "t -> LENGTH(t) > 0)) AS BIGINT) AS x, " +
        "CAST(n_chars AS BIGINT) AS y FROM documents), " +
        pick("base", "x", r13, "xl") + ", " +
        pick("base", "x", rUp, "xu") + ", " +
        "lo AS (SELECT base.g, base.x, base.y FROM base " +
        "JOIN xl USING (g) WHERE base.x <= xl.xl), " +
        "hi AS (SELECT base.g, base.x, base.y FROM base " +
        "JOIN xu USING (g) WHERE base.x >= xu.xu), " +
        pick("lo", "x", med, "mx_lo") + ", " +
        pick("lo", "y", med, "my_lo") + ", " +
        pick("hi", "x", med, "mx_hi") + ", " +
        pick("hi", "y", med, "my_hi") + ", " +
        pick("base", "x", med, "mx_all") + ", " +
        pick("base", "y", med, "my_all") + ", " +
        "nn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM base " +
        "GROUP BY g) " +
        "SELECT nn.g AS lang, nn.n, mx_lo, my_lo, mx_hi, my_hi, " +
        "CASE WHEN mx_hi <> mx_lo THEN " +
        "CAST((my_hi - my_lo) * 10000 // (mx_hi - mx_lo) AS BIGINT) " +
        "END AS slope_e4, " +
        "CASE WHEN mx_hi <> mx_lo THEN CAST(my_all * 10000 - " +
        "((my_hi - my_lo) * 10000 // (mx_hi - mx_lo)) * mx_all " +
        "AS BIGINT) END AS intercept_e4 " +
        "FROM nn JOIN mx_lo USING (g) JOIN my_lo USING (g) " +
        "JOIN mx_hi USING (g) JOIN my_hi USING (g) " +
        "JOIN mx_all USING (g) JOIN my_all USING (g) ORDER BY lang"
    },
    "q195_ks_drift" ->
      """WITH st AS (
        |  SELECT (doc_id % 2 = 0) AS ref, 'chars' AS feature,
        |    CAST(n_chars AS BIGINT) AS v FROM documents
        |  UNION ALL
        |  SELECT (doc_id % 2 = 0), 'words',
        |    CAST(len(string_split(text, ' ')) AS BIGINT) FROM documents),
        |cnt AS (SELECT feature, v,
        |    CAST(SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS r,
        |    CAST(SUM(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM st GROUP BY 1, 2),
        |cum AS (SELECT feature, v,
        |    SUM(r) OVER (PARTITION BY feature ORDER BY v) AS cumr,
        |    SUM(c) OVER (PARTITION BY feature ORDER BY v) AS cumc,
        |    SUM(r) OVER (PARTITION BY feature) AS nr,
        |    SUM(c) OVER (PARTITION BY feature) AS nc
        |  FROM cnt),
        |d AS (SELECT feature, v, nr, nc,
        |    abs(cumr * nc - cumc * nr) AS dd,
        |    ROW_NUMBER() OVER (PARTITION BY feature
        |      ORDER BY abs(cumr * nc - cumc * nr) DESC, v) AS rk
        |  FROM cum)
        |SELECT feature, CAST(nr AS BIGINT) AS n_ref,
        |  CAST(nc AS BIGINT) AS n_cur, CAST(dd AS BIGINT) AS ks_num,
        |  CAST(dd * 10000 // (nr * nc) AS BIGINT) AS ks_e4,
        |  CAST(v AS BIGINT) AS argmax_value
        |FROM d WHERE rk = 1 ORDER BY feature""".stripMargin,
    "q150_psi_drift" ->
      """WITH base AS (SELECT doc_id % 2 = 0 AS ref,
        |    lpad(CAST(n_chars // 100 AS VARCHAR), 2, '0') AS chars_bin,
        |    lpad(CAST(len(string_split(text, ' ')) // 20 AS VARCHAR),
        |      2, '0') AS words_bin,
        |    lang FROM documents),
        |st AS (SELECT ref, 'chars' AS feature, chars_bin AS bin FROM base
        |  UNION ALL SELECT ref, 'words', words_bin FROM base
        |  UNION ALL SELECT ref, 'lang', lang FROM base),
        |c AS (SELECT feature, bin,
        |    CAST(COUNT(*) FILTER (ref) AS BIGINT) AS ref_n,
        |    CAST(COUNT(*) FILTER (NOT ref) AS BIGINT) AS cur_n
        |  FROM st GROUP BY 1, 2),
        |wnd AS (SELECT *,
        |    CAST(SUM(ref_n) OVER (PARTITION BY feature) AS BIGINT) AS rt,
        |    CAST(SUM(cur_n) OVER (PARTITION BY feature) AS BIGINT) AS ct,
        |    CAST(COUNT(*) OVER (PARTITION BY feature) AS BIGINT) AS b
        |  FROM c),
        |t AS (SELECT feature, bin, ref_n, cur_n,
        |    CAST((ref_n + 1) * 1000000 // (rt + b) AS BIGINT)
        |      AS ref_share_e6,
        |    CAST((cur_n + 1) * 1000000 // (ct + b) AS BIGINT)
        |      AS cur_share_e6,
        |    CAST(ROUND((((ref_n + 1.0) / (rt + b)) -
        |        ((cur_n + 1.0) / (ct + b))) *
        |      ln(((ref_n + 1.0) / (rt + b)) /
        |        ((cur_n + 1.0) / (ct + b))) * 10000, 0) AS BIGINT)
        |      AS psi_e4
        |  FROM wnd)
        |SELECT feature, bin, ref_n, cur_n, ref_share_e6, cur_share_e6,
        |  psi_e4,
        |  CAST(SUM(psi_e4) OVER (PARTITION BY feature) AS BIGINT)
        |    AS psi_total_e4
        |FROM t ORDER BY feature, bin""".stripMargin,
    "q98_span_dedup" ->
      s"""WITH $SpanCtes
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |  CAST(COUNT(*) AS BIGINT) AS n_spans,
         |  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
         |  CAST(SUM(e - s + 1) AS DOUBLE) / n_words AS dup_frac
         |FROM sp GROUP BY doc_id, n_words ORDER BY doc_id""".stripMargin,
    "q99_adaptive_threshold" ->
      """WITH d AS (SELECT lang,
        |    (CAST(n_chars AS BIGINT) * 1000)
        |      // len(regexp_split_to_array(text, ' ')) AS s
        |  FROM documents),
        |hist AS (SELECT lang, s, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM d GROUP BY 1, 2),
        |r AS (SELECT lang, s, c,
        |        SUM(c) OVER (PARTITION BY lang ORDER BY s) AS cum,
        |        SUM(c) OVER (PARTITION BY lang) AS n
        |      FROM hist),
        |r2 AS (SELECT lang, s, c, cum, n, (1 * n + 3) // 4 AS rnk FROM r),
        |cut AS (SELECT lang, MIN(s) AS cutoff FROM r2 WHERE cum >= rnk
        |        GROUP BY lang)
        |SELECT r2.lang, CAST(cut.cutoff AS BIGINT) AS cutoff,
        |  CAST(MAX(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN s >= cutoff THEN c ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN s >= cutoff THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(MAX(n) AS DOUBLE) AS kept_frac
        |FROM r2 JOIN cut USING (lang)
        |GROUP BY r2.lang, cut.cutoff ORDER BY lang""".stripMargin,
    "q100_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |              FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 2 + 1)) AS i
        |        FROM toks),
        |ng AS (SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ')
        |         AS g FROM pos),
        |pairs AS (SELECT DISTINCT doc_id, g FROM ng),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        |        FROM pairs GROUP BY doc_id),
        |nov AS (SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        |        FROM (SELECT g, MIN(doc_id) AS fd FROM pairs GROUP BY g)
        |        GROUP BY fd)
        |SELECT per.doc_id, per.n_grams,
        |  COALESCE(nov.n_novel, 0) AS n_novel,
        |  CAST(COALESCE(nov.n_novel, 0) AS DOUBLE) / per.n_grams
        |    AS novelty_frac
        |FROM per LEFT JOIN nov ON per.doc_id = nov.doc_id
        |ORDER BY per.doc_id""".stripMargin,
    "q101_span_strip" ->
      s"""WITH $SpanCtes,
         |cov AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS j
         |        FROM sp),
         |tok AS (SELECT doc_id, unnest(t) AS w,
         |          generate_subscripts(t, 1) AS j FROM toks),
         |keep AS (SELECT tok.doc_id, tok.j, tok.w FROM tok
         |         LEFT JOIN cov ON tok.doc_id = cov.doc_id
         |           AND tok.j = cov.j
         |         WHERE cov.j IS NULL),
         |reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY j) AS text2,
         |          CAST(COUNT(*) AS BIGINT) AS kept
         |        FROM keep GROUP BY doc_id)
         |SELECT toks.doc_id, md5(COALESCE(reb.text2, '')) AS clean_md5,
         |  CAST(len(toks.t) - COALESCE(reb.kept, 0) AS BIGINT) AS n_removed
         |FROM toks LEFT JOIN reb USING (doc_id)
         |ORDER BY toks.doc_id""".stripMargin,
    // Replays the identical W=12 segment grid: same md5 per segment,
    // same distinct-doc frequency, same index-aware rebuild. Both
    // engines rebuild EVERY doc from its token array, so the md5s
    // agree even where the rewrite is a no-op.
    "q126_paragraph_dedup" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |              FROM documents),
        |seg AS (SELECT doc_id, t, unnest(range(1, len(t) // 12 + 1)) AS p
        |        FROM toks WHERE len(t) >= 12),
        |sh AS (SELECT doc_id, p,
        |         md5(list_aggregate(t[(p-1)*12+1 : p*12], 'string_agg',
        |           ' ')) AS h
        |       FROM seg),
        |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sh)
        |        GROUP BY h HAVING COUNT(*) >= 2),
        |ds AS (SELECT doc_id, p FROM sh JOIN dup USING (h)),
        |tok AS (SELECT doc_id, unnest(t) AS w,
        |          generate_subscripts(t, 1) AS j FROM toks),
        |keep AS (SELECT tok.doc_id, j, w FROM tok LEFT JOIN ds
        |           ON tok.doc_id = ds.doc_id AND (j - 1) // 12 + 1 = ds.p
        |         WHERE ds.p IS NULL),
        |reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY j) AS text2,
        |          CAST(COUNT(*) AS BIGINT) AS kept
        |        FROM keep GROUP BY doc_id),
        |rep AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nd
        |        FROM ds GROUP BY doc_id)
        |SELECT toks.doc_id, md5(COALESCE(reb.text2, '')) AS clean_md5,
        |  CAST(len(toks.t) // 12 AS BIGINT) AS n_segs,
        |  CAST(COALESCE(rep.nd, 0) AS BIGINT) AS n_dup_segs,
        |  CAST(len(toks.t) - COALESCE(reb.kept, 0) AS BIGINT) AS n_removed
        |FROM toks LEFT JOIN reb USING (doc_id)
        |  LEFT JOIN rep USING (doc_id)
        |ORDER BY toks.doc_id""".stripMargin,
    // Replays the CDC tier: the same 4-token window hash and mod-16
    // cut rule, boundary assembly (DISTINCT absorbs a cut at n, which
    // the engine drops as an empty span), chunk md5s, distinct-doc
    // frequency, and the index-aware rebuild.
    "q130_cdc_dedup" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |              FROM documents),
        |win AS (SELECT doc_id, t, unnest(range(4, len(t) + 1)) AS i
        |        FROM toks WHERE len(t) >= 4),
        |cuts AS (SELECT doc_id, i FROM win
        |         WHERE CAST(('0x'||substr(md5(list_aggregate(t[i-3:i],
        |           'string_agg', ' ')), 1, 8)) AS BIGINT) % 16 = 0),
        |bd AS (SELECT DISTINCT doc_id, p FROM (
        |         SELECT doc_id, 0 AS p FROM toks
        |         UNION ALL SELECT doc_id, i FROM cuts
        |         UNION ALL SELECT doc_id, len(t) FROM toks)),
        |sp AS (SELECT doc_id, p + 1 AS s,
        |         LEAD(p) OVER (PARTITION BY doc_id ORDER BY p) AS e
        |       FROM bd),
        |ch AS (SELECT sp.doc_id, s, e,
        |         md5(list_aggregate(t[s:e], 'string_agg', ' ')) AS h
        |       FROM sp JOIN toks ON sp.doc_id = toks.doc_id
        |       WHERE e IS NOT NULL AND s <= e),
        |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM ch)
        |        GROUP BY h HAVING COUNT(*) >= 2),
        |ds AS (SELECT doc_id, s, e FROM ch JOIN dup USING (h)),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS j
        |        FROM ds),
        |tok AS (SELECT doc_id, unnest(t) AS w,
        |          generate_subscripts(t, 1) AS j FROM toks),
        |keep AS (SELECT tok.doc_id, tok.j, tok.w FROM tok
        |         LEFT JOIN cov ON tok.doc_id = cov.doc_id
        |           AND tok.j = cov.j
        |         WHERE cov.j IS NULL),
        |reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY j) AS text2,
        |          CAST(COUNT(*) AS BIGINT) AS kept
        |        FROM keep GROUP BY doc_id),
        |rep AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nd
        |        FROM ds GROUP BY doc_id),
        |cc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nch
        |       FROM ch GROUP BY doc_id)
        |SELECT toks.doc_id, md5(COALESCE(reb.text2, '')) AS clean_md5,
        |  cc.nch AS n_chunks,
        |  CAST(COALESCE(rep.nd, 0) AS BIGINT) AS n_dup_chunks,
        |  CAST(len(toks.t) - COALESCE(reb.kept, 0) AS BIGINT) AS n_removed
        |FROM toks JOIN cc ON toks.doc_id = cc.doc_id
        |  LEFT JOIN reb ON toks.doc_id = reb.doc_id
        |  LEFT JOIN rep ON toks.doc_id = rep.doc_id
        |ORDER BY toks.doc_id""".stripMargin,
    // q132: replays the histogram entropy — identical e4 ln pins per
    // run length, identical integer floor division (// mirrors the
    // engine's exact non-negative intDiv).
    "q132_token_entropy" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |              FROM documents),
        |w AS (SELECT doc_id, unnest(t) AS term, len(t) AS n FROM toks),
        |wc AS (SELECT doc_id, term, n, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM w GROUP BY 1, 2, 3),
        |ent AS (SELECT doc_id, CAST(ANY_VALUE(n) AS BIGINT) AS n,
        |          CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |          CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE)) * 10000,
        |            0) AS BIGINT)) AS BIGINT) AS s
        |        FROM wc GROUP BY doc_id)
        |SELECT doc_id, n AS n_tokens, n_distinct,
        |  CAST(CAST(ROUND(ln(CAST(n AS DOUBLE)) * 10000, 0) AS BIGINT)
        |    - s // n AS BIGINT) AS entropy_e4,
        |  CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE) AS ttr
        |FROM ent ORDER BY doc_id""".stripMargin,
    // q133: replays the Zipf fit — e4-pinned axes, exact integer moment
    // sums, the same two final IEEE divisions (expression trees mirror
    // the engine textually).
    "q133_zipf_fit" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, ' ')) AS w
        |             FROM documents),
        |fr AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok
        |       GROUP BY w),
        |top AS (SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
        |        FROM fr QUALIFY r <= 1000),
        |xy AS (SELECT
        |         CAST(ROUND(ln(CAST(r AS DOUBLE)) * 10000, 0) AS BIGINT)
        |           AS x,
        |         CAST(ROUND(ln(CAST(c AS DOUBLE)) * 10000, 0) AS BIGINT)
        |           AS y
        |       FROM top),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx,
        |        CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy,
        |        CAST(SUM(x * x) AS BIGINT) AS sxx
        |      FROM xy)
        |SELECT n AS n_ranks,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
        |    (CAST(n * sxy - sx * sy AS DOUBLE) /
        |     CAST(n * sxx - sx * sx AS DOUBLE)) *
        |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept_e4
        |FROM m""".stripMargin,
    // q134: the three tiers replayed side by side as POSITION sets.
    // The span tier's coverage is the union of its dup shingle windows
    // [i, i+7] — identical to the merged-island spans, so the replay
    // skips the merge. Union = SQL UNION (distinct) of the three.
    "q134_dedup_attribution" ->
      """WITH t0 AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |            FROM documents),
        |g_seg AS (SELECT doc_id, t, unnest(range(1, len(t) // 12 + 1))
        |            AS p FROM t0 WHERE len(t) >= 12),
        |g_sh AS (SELECT doc_id, p, md5(list_aggregate(
        |           t[(p-1)*12+1 : p*12], 'string_agg', ' ')) AS h
        |         FROM g_seg),
        |g_dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM g_sh)
        |          GROUP BY h HAVING COUNT(*) >= 2),
        |g_cov AS (SELECT DISTINCT doc_id,
        |            unnest(range((p-1)*12+1, p*12+1)) AS j
        |          FROM g_sh JOIN g_dup USING (h)),
        |c_win AS (SELECT doc_id, t, unnest(range(4, len(t) + 1)) AS i
        |          FROM t0 WHERE len(t) >= 4),
        |c_cut AS (SELECT doc_id, i FROM c_win
        |          WHERE CAST(('0x'||substr(md5(list_aggregate(t[i-3:i],
        |            'string_agg', ' ')), 1, 8)) AS BIGINT) % 16 = 0),
        |c_bd AS (SELECT DISTINCT doc_id, p FROM (
        |           SELECT doc_id, 0 AS p FROM t0
        |           UNION ALL SELECT doc_id, i FROM c_cut
        |           UNION ALL SELECT doc_id, len(t) FROM t0)),
        |c_sp AS (SELECT doc_id, p + 1 AS s,
        |           LEAD(p) OVER (PARTITION BY doc_id ORDER BY p) AS e
        |         FROM c_bd),
        |c_ch AS (SELECT c_sp.doc_id, s, e,
        |           md5(list_aggregate(t[s:e], 'string_agg', ' ')) AS h
        |         FROM c_sp JOIN t0 ON c_sp.doc_id = t0.doc_id
        |         WHERE e IS NOT NULL AND s <= e),
        |c_dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM c_ch)
        |          GROUP BY h HAVING COUNT(*) >= 2),
        |c_cov AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS j
        |          FROM c_ch JOIN c_dup USING (h)),
        |s_pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 8 + 2)) AS i
        |          FROM t0 WHERE len(t) >= 8),
        |s_ng AS (SELECT doc_id, i, list_aggregate(t[i:i+7], 'string_agg',
        |           ' ') AS g FROM s_pos),
        |s_dup AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM s_ng)
        |          GROUP BY g HAVING COUNT(*) >= 2),
        |s_cov AS (SELECT DISTINCT s_ng.doc_id, unnest(range(i, i + 8))
        |            AS j
        |          FROM s_ng JOIN s_dup USING (g)),
        |ga AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS g FROM g_cov
        |       GROUP BY doc_id),
        |ca AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM c_cov
        |       GROUP BY doc_id),
        |sa AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s FROM s_cov
        |       GROUP BY doc_id),
        |ua AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS u FROM (
        |         SELECT doc_id, j FROM g_cov
        |         UNION SELECT doc_id, j FROM c_cov
        |         UNION SELECT doc_id, j FROM s_cov) GROUP BY doc_id)
        |SELECT t0.doc_id, CAST(len(t) AS BIGINT) AS n_words,
        |  CAST(COALESCE(ga.g, 0) AS BIGINT) AS cov_grid,
        |  CAST(COALESCE(ca.c, 0) AS BIGINT) AS cov_cdc,
        |  CAST(COALESCE(sa.s, 0) AS BIGINT) AS cov_span,
        |  ua.u AS cov_any
        |FROM t0 JOIN ua ON t0.doc_id = ua.doc_id
        |  LEFT JOIN ga ON t0.doc_id = ga.doc_id
        |  LEFT JOIN ca ON t0.doc_id = ca.doc_id
        |  LEFT JOIN sa ON t0.doc_id = sa.doc_id
        |ORDER BY t0.doc_id""".stripMargin)
}
