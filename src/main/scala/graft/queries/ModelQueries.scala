package graft.queries

import graft.Tables
import graft.operators.{Centroids, Curation, Dsir, LanguageModel,
  Projection, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q91–q96: model-shaped curation operators — corpus LM scoring, frozen
  * linear-classifier inference, random-projection dimensionality
  * reduction, domain mixture reweighting, and nearest-centroid
  * assignment. Every query is DuckDB-oracle-checked: the LM replays the
  * count tables, the projection replays the seeded ±1 matrix (q33's
  * generated-literals technique), the centroid fit is fixed-point so its
  * aggregation is order-exact (SURVEY §5.4).
  */
object ModelQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Projection width (k) for q93. */
  private val ProjDims = 16

  // q91: add-one-smoothed bigram LM negative log-likelihood per document
  // — the CCNet-style "perplexity filter" signal, model estimated on the
  // corpus itself in one pass. Low = fluent under corpus statistics.
  def q91(s: SparkSession, dir: String): DataFrame =
    LanguageModel.bigramNll(s, docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // q92: frozen linear quality classifier (fastText-head shape) — model
  // inference as a codegen'd projection, zero shuffles.
  def q92(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.linearQuality(docs(s, dir), "text")
      .select(col("doc_id"), col("stop_frac"), col("uniq_frac"),
        col("mean_wl"), col("clf_score"), col("keep"))
      .orderBy(col("doc_id"))

  // q93: JL random projection 64→16 dims, then top-10 nearest to the
  // vec_id=0 query in PROJECTED space — the cheap pre-filter tier under
  // exact KNN (q21) and alongside the sign-only LSH tier (q33). The
  // query's own projection is collected from the same Spark fold that
  // projects the corpus, so both sides of the distance share one code
  // path.
  def q93(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val proj = Projection.reduce(emb, "embedding", ProjDims,
      OperatorQueries.EmbeddingDim)
    val qp = proj.filter(col("vec_id") === 0)
      .select("proj").head().getSeq[Long](0).toArray
    // Rank on the EXACT e12 integer distance (order-independent in both
    // engines); pdist ships as one IEEE division of identical integers.
    proj.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Projection.sqDist(col("proj"), lit(qp)).as("__d2"))
      .orderBy(col("__d2"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"),
        (col("__d2").cast("double") / lit(Projection.Scale * Projection.Scale))
          .as("pdist"))
  }

  // q94: domain mixture reweighting over `source` — target shares 10%
  // for src0, 8% for src1, uniform for the rest; weights capped at 4×.
  def q94(s: SparkSession, dir: String): DataFrame =
    Curation.mixtureWeights(docs(s, dir), "source", "text",
        targetShares = Map("src0" -> 0.10, "src1" -> 0.08),
        maxWeight = 4.0)
      .coalesce(1)
      .orderBy(col("source"))

  // q96: nearest-class-centroid assignment over the labeled embeddings —
  // fit 10 fixed-point centroids, assign every vector shuffle-free, emit
  // the label × assigned confusion counts.
  def q96(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
    Centroids.assign(emb, "embedding", cents, "label")
      .groupBy(col("label"), col("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("assigned"))
  }

  // q201: CLUSTER TOPIC LABELS — the standard topic-browser step, two
  // certified layers composed: q96's fixed-point centroid assignment
  // puts every doc (vec_id == doc_id) in an embedding cluster, q186's
  // Dunning-G² keyness names each cluster by the vocabulary that makes
  // it DIFFERENT. The oracle composes the shared CentroidCtes and
  // keynessChainSql fragments — neither layer can drift from its
  // own gated query.
  def q201(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
    val asg = Centroids.assign(emb, "embedding", cents, "label")
      .select(col("vec_id").as("doc_id"), col("assigned"))
    val d = Tables.load(s, dir, "documents")
      .join(asg, Seq("doc_id"))
    TextAnalysis.keyness(d, "assigned", "text", minCount = 5, topK = 5)
      .orderBy(col("assigned"), col("rank"))
  }

  // q124: embedding-space outlier report — SemDeDup's companion pruning
  // op: vectors far from EVERY cluster center are OOD/noise (corrupt
  // embeds, mislabeled modality, adversarial junk) and get pruned before
  // training. Per assigned cluster: the exact P95 of the e8 integer
  // distance-to-centroid (histogram rank over the integer distances the
  // argmin already computed — no float percentile, so the cutoff is
  // oracle-replayable) and the count/fraction above it. Scale shape:
  // assignment is the shuffle-free codegen'd argmin (q96); the histogram
  // is (clusters × distinct-distances)-sized — the corpus crosses one
  // aggregate.
  def q124(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
    val assigned = Centroids.assign(emb, "embedding", cents, "label")
    Curation.adaptiveThreshold(assigned, "assigned", col("dist2_e8"),
        pctNum = 19, pctDen = 20)
      .select(col("assigned"), col("cutoff").as("p95_d2e8"),
        col("n_docs").as("n_vecs"), col("n_kept").as("n_outliers"),
        col("kept_frac").as("outlier_frac"))
      .orderBy(col("assigned"))
  }

  // q127: DSIR importance resampling — select raw docs that RESEMBLE
  // the target domain (here: lang='en') under hashed-bigram bag-of-words
  // models, Gumbel-top-k so the sample tracks the target DISTRIBUTION
  // instead of collapsing onto its mode. Integer e4 scores end to end.
  def q127(s: SparkSession, dir: String): DataFrame =
    Dsir.importanceResample(docs(s, dir), "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 512, k = 100)

  // q144: filter-AGREEMENT calibration audit — before spending a 100 TB
  // pass on a quality filter, check that the two independent cheap
  // signals (the frozen linear classifier, q92, and the corpus bigram-LM
  // NLL, q91) order the corpus the SAME way: per classifier-score decile
  // (score_e6 div 100000, clamped 0..9 — q108's bucketing convention),
  // the doc count, how many the classifier keeps, the exact mean
  // classifier score, and the bigram-weighted mean LM NLL. A calibrated
  // pair shows NLL falling monotonically as the classifier decile rises;
  // a flat or inverted column means one of the filters is noise on this
  // corpus. The audit discipline of q140/q141 (measure the estimator
  // before trusting it) applied to the quality tier. All-integer
  // arithmetic: exact long sums, `div` means (DuckDB `//` and Spark
  // `div` both truncate toward zero — safe on the negative bucket-0
  // score sums). Docs under 2 tokens carry no LM evidence and are
  // inner-joined away (bigramNll's contract).
  def q144(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val clf = TextAnalysis.linearQuality(d, "text")
      .select(col("doc_id"), col("score_e6"))
    // Single global LM == q91's model: bigramNllBy with a constant group
    // reuses the one-pass gram machinery AND its exact integer score_e4
    // (q91's avg_nll is a float quotient — not bucket-aggregatable).
    val lm = LanguageModel.bigramNllBy(d.withColumn("__g", lit("all")),
        "__g", "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"), col("score_e4"))
    clf.join(lm, Seq("doc_id"))
      .withColumn("bucket",
        least(greatest(expr("score_e6 div 100000"), lit(0L)), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_e6") >= 500000L, 1L).otherwise(0L))
          .as("n_keep"),
        expr("CAST(sum(score_e6) div count(1) AS BIGINT)")
          .as("mean_score_e6"),
        sum(col("n_bigrams")).as("n_bigrams"),
        expr("CAST(sum(n_bigrams * score_e4) div sum(n_bigrams) AS BIGINT)")
          .as("mean_nll_e4"))
      .orderBy(col("bucket"))
  }

  // q146: vector-index STALENESS audit — the maintenance decision every
  // serving ANN index faces at 100 TB: the coarse quantizer was trained
  // on yesterday's corpus, today's delta batch streams in, and the
  // operator must decide from MEASURED drift (not folklore) when to pay
  // a re-train. Centroids fit on the BASE snapshot only (vec_id % 10
  // <> 0, ~90%); BOTH cohorts then assign through those frozen
  // centroids — the exact shape of an un-rebuilt index serving fresh
  // writes. Per centroid: base/delta assignment counts, the delta share
  // (e4 — list-growth skew: a centroid absorbing far more than its
  // proportional share of new vectors is where probe latency degrades
  // first), each cohort's mean e8 quantization error, and the
  // delta/base error-inflation ratio (e4 — rising inflation means the
  // frozen cells no longer fit the new distribution: the re-index
  // trigger). All-integer outputs: counts, `div` means of the exact e8
  // integers the argmin compared (SURVEY §5.4), so the oracle replays
  // bit-for-bit in any row order. Scale shape: fit aggregates k×dim
  // fixed-point sums (driver-sized), assignment is the q96 codegen'd
  // zero-shuffle argmin over ONE corpus scan, and the audit itself is a
  // k-row aggregate — nothing here grows with corpus size except the
  // single pass a real index build pays anyway.
  def q146(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val cents = Centroids.fit(base, "label", "embedding")
    Centroids.assign(emb, "embedding", cents, "label")
      .withColumn("is_delta", col("vec_id") % 10 === 0)
      .groupBy(col("assigned"))
      .agg(
        sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"),
        sum(when(!col("is_delta"), col("dist2_e8")).otherwise(0L))
          .as("__sb"),
        sum(when(col("is_delta"), col("dist2_e8")).otherwise(0L))
          .as("__sd"))
      .withColumn("delta_share_e4",
        expr("n_delta * 10000 div (n_base + n_delta)"))
      .withColumn("mean_d2_base_e8",
        expr("case when n_base > 0 then __sb div n_base " +
          "else cast(0 as bigint) end"))
      .withColumn("mean_d2_delta_e8",
        expr("case when n_delta > 0 then __sd div n_delta " +
          "else cast(0 as bigint) end"))
      .withColumn("err_inflation_e4",
        expr("mean_d2_delta_e8 * 10000 div " +
          "greatest(mean_d2_base_e8, cast(1 as bigint))"))
      .select(col("assigned"), col("n_base"), col("n_delta"),
        col("delta_share_e4"), col("mean_d2_base_e8"),
        col("mean_d2_delta_e8"), col("err_inflation_e4"))
      .orderBy(col("assigned"))
  }

  // q158: interpolated Kneser–Ney bigram NLL per document — the KenLM
  // smoothing proper, next to q91's add-one baseline. Same output schema
  // so the two perplexity filters are drop-in comparable downstream.
  def q158(s: SparkSession, dir: String): DataFrame =
    LanguageModel.kneserNeyNll(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // q159: Pareto-frontier document selection — the undominated tradeoff
  // surface over (length, lexical diversity, stopword fluency), where
  // q92 collapses the same three axes into one weighted score. Features
  // are e4 fixed-point longs so the dominance test (and the oracle's
  // NOT EXISTS replay) is exact integer comparison.
  def q159(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val toks = filter(split(lower(col("text")), " "), t => length(t) > 0)
    def e4(raw: Column): Column = round(raw * 10000, 0).cast("long")
    val n = size(col("__t"))
    val feats = docs(s, dir)
      .withColumn("__t", toks)
      .select(col("doc_id"),
        n.cast("long").as("n_tokens"),
        e4(when(n > 0, size(array_distinct(col("__t"))).cast("double") / n)
          .otherwise(0.0)).as("uniq_e4"),
        e4(when(n > 0, size(filter(col("__t"), t =>
            array_contains(lit(TextAnalysis.stopwords("en").toArray), t)))
          .cast("double") / n).otherwise(0.0)).as("stop_e4"))
    graft.operators.Skyline.frontier(feats, "doc_id",
        Seq("n_tokens", "uniq_e4", "stop_e4"))
      .orderBy(col("doc_id"))
  }

  // q165: per-cluster silhouette audit under the q96 fit — mean
  // simplified silhouette + the count of boundary vectors (sil < 0.5,
  // i.e. runner-up cell closer than 2x) per assigned cell.
  def q165(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
    Centroids.silhouette(emb, "embedding", cents, "label")
      .groupBy(col("assigned"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(sil_e4) div count(1) AS BIGINT)")
          .as("mean_sil_e4"),
        sum(when(col("sil_e4") < 5000, 1L).otherwise(0L))
          .as("n_boundary"))
      .orderBy(col("assigned"))
  }

  // q168: Gonzalez farthest-first k-center coreset (k=8) — global
  // exemplar selection + the coverage-radius curve; full trajectory
  // replayed by an unrolled oracle.
  def q168(s: SparkSession, dir: String): DataFrame =
    graft.operators.Coreset.farthestFirst(
      Tables.load(s, dir, "embeddings"), "vec_id", "embedding", k = 8)

  // q178: top principal component of the embedding covariance —
  // distributed moment pass, all-integer power iteration (8 steps),
  // trajectory replayed by an unrolled oracle.
  def q178(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.topComponent(Tables.load(s, dir, "embeddings"),
      "embedding", dim = OperatorQueries.EmbeddingDim, iterations = 8)

  // q220: ISOTONIC calibration curve for the q92 quality score — the
  // audit run before a score threshold gates a training mix: over 40
  // fixed score bins, the best MONOTONE map from score to outcome rate
  // (outcome: the document reaches 350 chars — a real corpus signal
  // correlated with, but not determined by, the score's length
  // feature). Computed by the PAVA minimax closed form on the bounded
  // bins table ([[graft.operators.Calibration.isotonicFit]]); the
  // oracle replays the identical max-min over e4 segment rates. The
  // corpus crosses ONE aggregate; everything after is bins³ algebra.
  def q220(s: SparkSession, dir: String): DataFrame =
    graft.operators.Calibration.isotonicFit(
      TextAnalysis.linearQuality(docs(s, dir), "text")
        .withColumn("bin",
          expr("greatest(0, least(39, (score_e6 + 600000) div 100000))"))
        .withColumn("y", when(col("n_chars") >= 350, 1L).otherwise(0L)),
      "bin", "y")

  // q221: BRIER decomposition of the q92 score read as a probability
  // (min-max linear squash of score_e6 onto e4 [0,10⁴] — the honest
  // "uncalibrated head" a raw linear classifier ships with): per
  // source, reliability / resolution / uncertainty in exact e8
  // integers ([[graft.operators.Calibration.brierDecomposition]]).
  // Murphy's identity brier = rel − res + unc is spec-pinned within
  // truncation ulps; the oracle replays every term bit-for-bit.
  def q221(s: SparkSession, dir: String): DataFrame =
    graft.operators.Calibration.brierDecomposition(
      TextAnalysis.linearQuality(docs(s, dir), "text")
        .withColumn("p_e4",
          expr("least(10000, greatest(0, (score_e6 + 600000) div 400))"))
        .withColumn("y", when(col("n_chars") >= 350, 1L).otherwise(0L)),
      "source", "p_e4", "y")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q220_isotonic_calibration" -> (q220 _),
    "q221_brier_decomposition" -> (q221 _),
    "q178_pca_power" -> (q178 _),
    "q168_kcenter_coreset" -> (q168 _),
    "q165_silhouette" -> (q165 _),
    "q159_pareto_frontier" -> (q159 _),
    "q158_kneser_ney" -> (q158 _),
    "q144_filter_agreement" -> (q144 _),
    "q146_index_staleness" -> (q146 _),
    "q91_lm_score" -> (q91 _),
    "q92_quality_classifier" -> (q92 _),
    "q93_random_projection" -> (q93 _),
    "q94_mixture_weights" -> (q94 _),
    "q96_centroid_assign" -> (q96 _),
    "q201_topic_labels" -> (q201 _),
    "q124_embedding_outliers" -> (q124 _),
    "q127_dsir_resample" -> (q127 _)
  )

  /** English stopword list as a DuckDB list literal (same vocabulary as
    * the engine side — [[TextAnalysis.stopwords]]).
    */
  private val enStops: String =
    TextAnalysis.stopwords("en")
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString("[", ", ", "]")

  /** Shared q92/q220/q221 replay prefix ending in `sc(doc_id, k_stop,
    * k_uniq, k_mw, score_e6)`: the [[TextAnalysis.linearQuality]]
    * features quantized to e4 LONGS (scale-0 ROUND of the same IEEE
    * double is portable; ROUND(x, 4) is not — SURVEY §5.4), then the
    * score as EXACT integer arithmetic in 1e-6 space. Pre-stripped —
    * no line carries a leading `|` (double-strip gotcha).
    */
  private val ScoreCtes: String =
    s"""t AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), ' '),
       |                x -> LENGTH(x) > 0) AS t
       |  FROM documents),
       |f AS (SELECT doc_id,
       |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
       |    CAST(len(list_filter(t, x -> list_contains($enStops, x)))
       |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
       |    AS k_stop,
       |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
       |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
       |    ELSE 0.0 END) * 10000, 0) AS BIGINT) AS k_uniq,
       |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
       |    CAST(list_aggregate(list_transform(t, w -> LENGTH(w)), 'sum')
       |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
       |    AS k_mw,
       |  CAST(ROUND((CAST(LEAST(len(t), 1000) AS DOUBLE) / 1000.0)
       |    * 10000, 0) AS BIGINT) AS k_len
       |  FROM t),
       |sc AS (SELECT doc_id, k_stop, k_uniq, k_mw,
       |  -600000 + 180 * k_stop + 90 * k_uniq + 8 * k_mw + 35 * k_len
       |    AS score_e6
       |  FROM f)""".stripMargin

  /** The q93 projection directions as DuckDB VALUES rows — generated from
    * [[Projection.planes]] (seed 7) so the oracle replays the projection
    * with the exact ±1 matrix the engine folded into codegen.
    */
  private val q93PlaneRows: String =
    Projection.planes(ProjDims, OperatorQueries.EmbeddingDim)
      .zipWithIndex.map { case (p, b) =>
        val lst = p.map(x => if (x > 0) "1" else "-1").mkString(",")
        s"($b, CAST([$lst] AS DOUBLE[]))"
      }.mkString(",\n  ")

  /** Shared q96/q124 replay prefix: the fixed-point centroid fit, the
    * e8 integer distances, and the argmin row-number (ties by d2 then
    * label — the engine's struct-min tiebreak). `a` carries d2 so q124
    * can histogram the winning distances. Lines deliberately carry no
    * leading `|` after their own stripMargin — safe to interpolate into
    * an outer stripMargin string (SNIPPETS double-strip gotcha).
    */
  private val CentroidCtes: String =
    """e AS (SELECT vec_id, label,
      |    generate_subscripts(embedding, 1) AS pos,
      |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
      |c AS (SELECT label AS clabel, pos,
      |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
      |    COUNT(*) AS n
      |  FROM e GROUP BY 1, 2),
      |cx AS (SELECT clabel, pos,
      |         CAST(s AS DOUBLE) / n / 1000000.0 AS cx FROM c),
      |-- e8 fixed-point per squared component BEFORE the sum (exact
      |-- integers in any row order — Spark folds arrays in place, this
      |-- SUM is order-agnostic; only integers make the argmin portable).
      |d AS (SELECT e.vec_id, e.label, cx.clabel,
      |        CAST(SUM(CAST(FLOOR((e.x - cx.cx) * (e.x - cx.cx)
      |          * 100000000.0) AS BIGINT)) AS BIGINT) AS d2
      |      FROM e JOIN cx ON e.pos = cx.pos GROUP BY 1, 2, 3),
      |a AS (SELECT vec_id, label, clabel, d2, ROW_NUMBER() OVER
      |        (PARTITION BY vec_id ORDER BY d2, clabel) AS rn FROM d)"""
      .stripMargin

  /** q168's oracle: the farthest-first trajectory unrolled — per step a
    * MATERIALIZED argmax CTE (d DESC, vec_id — the engine's tie-break)
    * and a min-distance fold against the new center's components; the
    * FLOOR-e8 per-component quantization matches SqDistE8 exactly, so
    * every pick and radius replays bit-for-bit. Plain CTEs would
    * re-execute the chain exponentially (the q112 lesson).
    */
  private val q168Sql: String = {
    val k = 8
    def dist(center: String): String =
      "SELECT e.vec_id, CAST(SUM(CAST(FLOOR((e.x - c.x) * (e.x - c.x)" +
        " * 100000000.0) AS BIGINT)) AS BIGINT) AS d FROM e JOIN " +
        s"(SELECT pos, x FROM e WHERE vec_id = $center) c " +
        "ON e.pos = c.pos GROUP BY e.vec_id"
    val steps = (2 to k).map { i =>
      val prev = s"d${i - 1}"
      s"""m$i AS MATERIALIZED (SELECT vec_id, d FROM $prev
         |  ORDER BY d DESC, vec_id LIMIT 1),
         |d$i AS MATERIALIZED (SELECT $prev.vec_id,
         |    LEAST($prev.d, nd.d) AS d
         |  FROM $prev JOIN (${dist(s"(SELECT vec_id FROM m$i)")}) nd
         |    ON nd.vec_id = $prev.vec_id
         |  WHERE $prev.vec_id <> (SELECT vec_id FROM m$i))""".stripMargin
    }.mkString(",\n")
    val sel = (2 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS step, vec_id, d AS radius_e8 " +
          s"FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    generate_subscripts(embedding, 1) AS pos,
       |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
       |s1 AS MATERIALIZED (SELECT MIN(vec_id) AS id FROM e),
       |d1 AS MATERIALIZED (SELECT * FROM (${dist("(SELECT id FROM s1)")})
       |  t WHERE vec_id <> (SELECT id FROM s1)),
       |$steps
       |SELECT * FROM (
       |SELECT CAST(1 AS BIGINT) AS step, (SELECT id FROM s1) AS vec_id,
       |  CAST(0 AS BIGINT) AS radius_e8
       |UNION ALL $sel
       |UNION ALL SELECT CAST(${k + 1} AS BIGINT), CAST(NULL AS BIGINT),
       |  (SELECT MAX(d) FROM d$k)
       |) ORDER BY step""".stripMargin
  }

  /** q178's oracle: the centered moment matrix from an e×e self-join
    * on vec_id, then the 8 power-iteration steps unrolled as
    * MATERIALIZED CTEs — every mat-vec an exact integer SUM, every
    * renormalization the engine's branch rule (`//` == trunc toward
    * zero == Java `/`), the sign pinned by the same (|v| desc, i)
    * pivot.
    */
  private val q178Sql: String = {
    val iters = (1 to 8).map { k =>
      val p = s"v${k - 1}"
      s"""y$k AS MATERIALIZED (SELECT a.i,
         |    CAST(SUM(a.a * p.v) AS BIGINT) AS y
         |  FROM a JOIN $p p ON p.i = a.j GROUP BY a.i),
         |m$k AS MATERIALIZED (SELECT MAX(ABS(y)) AS mx FROM y$k),
         |v$k AS MATERIALIZED (SELECT y$k.i,
         |    CAST(CASE WHEN m$k.mx >= 1000000
         |      THEN y$k.y // (m$k.mx // 1000000)
         |      ELSE y$k.y * 1000000 // m$k.mx END AS BIGINT) AS v
         |  FROM y$k CROSS JOIN m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    generate_subscripts(embedding, 1) AS pos,
       |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000)
       |      AS BIGINT) AS xq FROM embeddings),
       |cells AS MATERIALIZED (SELECT x.pos AS i, y.pos AS j,
       |    CAST(SUM(x.xq * y.xq) AS BIGINT) AS s
       |  FROM e x JOIN e y ON x.vec_id = y.vec_id GROUP BY 1, 2),
       |sm AS MATERIALIZED (SELECT pos AS i, CAST(SUM(xq) AS BIGINT)
       |    AS sm FROM e GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
       |  FROM e),
       |a AS MATERIALIZED (SELECT c.i, c.j,
       |    CAST((c.s * nn.n - si.sm * sj.sm) // 10000000 AS BIGINT)
       |      AS a
       |  FROM cells c JOIN sm si ON si.i = c.i JOIN sm sj ON sj.i = c.j
       |  CROSS JOIN nn),
       |v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS v FROM sm),
       |$iters,
       |piv AS (SELECT v FROM v8 ORDER BY ABS(v) DESC, i LIMIT 1)
       |SELECT CAST(v8.i AS BIGINT) AS pos,
       |  CAST(CASE WHEN (SELECT v FROM piv) < 0 THEN -v8.v ELSE v8.v
       |    END AS BIGINT) AS pc1_e6
       |FROM v8 ORDER BY pos""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q178_pca_power" -> q178Sql,
    "q168_kcenter_coreset" -> q168Sql,
    // q144: ONE shared tokenization CTE feeds both the classifier
    // features (q92's replay) and the LM count tables (q91's replay);
    // the bucket/mean arithmetic is all-integer (`//` and Spark `div`
    // both truncate toward zero, so the negative bucket-0 mean is safe).
    "q144_filter_agreement" ->
      s"""WITH toks AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), ' '),
         |                x -> LENGTH(x) > 0) AS t
         |  FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_filter(t, x -> list_contains($enStops, x)))
         |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
         |    AS k_stop,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         |    ELSE 0.0 END) * 10000, 0) AS BIGINT) AS k_uniq,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(list_aggregate(list_transform(t, w -> LENGTH(w)), 'sum')
         |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
         |    AS k_mw,
         |  CAST(ROUND((CAST(LEAST(len(t), 1000) AS DOUBLE) / 1000.0)
         |    * 10000, 0) AS BIGINT) AS k_len
         |  FROM toks),
         |cs AS (SELECT doc_id,
         |  -600000 + 180 * k_stop + 90 * k_uniq + 8 * k_mw + 35 * k_len
         |    AS score_e6
         |  FROM f),
         |uni AS (SELECT unnest(t) AS w FROM toks),
         |c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
         |v AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
         |bpos AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |         FROM toks WHERE len(t) >= 2),
         |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM bpos),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
         |nl AS (SELECT bi.doc_id,
         |    CAST(ROUND(-ln((c2.c2 + 1.0) / (c1.c1 + CAST(v.v AS DOUBLE)))
         |      * 10000, 0) AS BIGINT) AS nll
         |  FROM bi JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
         |  JOIN c1 ON bi.w1 = c1.w CROSS JOIN v),
         |lm AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(nll) // COUNT(*) AS BIGINT) AS score_e4
         |  FROM nl GROUP BY doc_id),
         |j AS (SELECT LEAST(GREATEST(cs.score_e6 // 100000, 0), 9)
         |      AS bucket,
         |    cs.score_e6, lm.n_bigrams, lm.score_e4
         |  FROM cs JOIN lm ON cs.doc_id = lm.doc_id)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN score_e6 >= 500000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_keep,
         |  CAST(SUM(score_e6) // COUNT(*) AS BIGINT) AS mean_score_e6,
         |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(n_bigrams * score_e4) // SUM(n_bigrams) AS BIGINT)
         |    AS mean_nll_e4
         |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q159_pareto_frontier" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), ' '),
         |                x -> LENGTH(x) > 0) AS t
         |  FROM documents),
         |f AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         |    ELSE 0.0 END) * 10000, 0) AS BIGINT) AS uniq_e4,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_filter(t, x -> list_contains($enStops, x)))
         |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
         |    AS stop_e4
         |  FROM t)
         |SELECT a.doc_id, a.n_tokens, a.uniq_e4, a.stop_e4 FROM f a
         |WHERE NOT EXISTS (SELECT 1 FROM f b
         |  WHERE b.n_tokens >= a.n_tokens AND b.uniq_e4 >= a.uniq_e4
         |    AND b.stop_e4 >= a.stop_e4
         |    AND (b.n_tokens > a.n_tokens OR b.uniq_e4 > a.uniq_e4
         |         OR b.stop_e4 > a.stop_e4))
         |ORDER BY a.doc_id""".stripMargin,
    "q158_kneser_ney" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), ' '),
        |                x -> LENGTH(x) > 0) AS t
        |  FROM documents),
        |bpos AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |         FROM toks WHERE len(t) >= 2),
        |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM bpos),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
        |ctx AS (SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1p
        |        FROM c2 GROUP BY w1),
        |cont AS (SELECT w2, COUNT(*) AS nc FROM c2 GROUP BY w2),
        |nbt AS (SELECT COUNT(*) AS nbt FROM c2),
        |-- arithmetic shape mirrors LanguageModel.kneserNeyNll exactly
        |-- (left-associative * and /): same IEEE doubles in both engines.
        |sc AS (SELECT bi.doc_id,
        |    CAST(ROUND(-ln((c2.c2 - 0.75) / ctx.c1
        |      + 0.75 * ctx.n1p / ctx.c1
        |        * (cont.nc / CAST(nbt.nbt AS DOUBLE))) * 10000, 0)
        |      AS BIGINT) AS nll
        |  FROM bi JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
        |  JOIN ctx ON bi.w1 = ctx.w1
        |  JOIN cont ON bi.w2 = cont.w2 CROSS JOIN nbt)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(nll) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q91_lm_score" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), ' '),
        |                x -> LENGTH(x) > 0) AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS w FROM toks),
        |c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
        |bpos AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |         FROM toks WHERE len(t) >= 2),
        |bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM bpos),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
        |sc AS (SELECT bi.doc_id,
        |    CAST(ROUND(-ln((c2.c2 + 1.0) / (c1.c1 + CAST(v.v AS DOUBLE)))
        |      * 10000, 0) AS BIGINT) AS nll
        |  FROM bi JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
        |  JOIN c1 ON bi.w1 = c1.w CROSS JOIN v)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(nll) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q92_quality_classifier" ->
      s"""WITH $ScoreCtes
         |SELECT doc_id,
         |  CAST(k_stop AS DOUBLE) / 10000.0 AS stop_frac,
         |  CAST(k_uniq AS DOUBLE) / 10000.0 AS uniq_frac,
         |  CAST(k_mw AS DOUBLE) / 10000.0 AS mean_wl,
         |  CAST(score_e6 AS DOUBLE) / 1000000.0 AS clf_score,
         |  (score_e6 >= 500000) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q220_isotonic_calibration" ->
      (s"WITH $ScoreCtes,\n" +
        """labeled AS (SELECT
          |    GREATEST(0, LEAST(39, (s.score_e6 + 600000) // 100000))
          |      AS bin,
          |    CASE WHEN d.n_chars >= 350 THEN 1 ELSE 0 END AS y
          |  FROM sc s JOIN documents d USING (doc_id)),
          |bins AS MATERIALIZED (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
          |    CAST(SUM(y) AS BIGINT) AS pos
          |  FROM labeled GROUP BY 1),
          |seg AS MATERIALIZED (SELECT l.bin AS lo, h.bin AS hi,
          |    CAST(SUM(m.n) AS BIGINT) AS sn, CAST(SUM(m.pos) AS BIGINT) AS sp
          |  FROM bins l JOIN bins h ON l.bin <= h.bin
          |  JOIN bins m ON m.bin BETWEEN l.bin AND h.bin
          |  GROUP BY 1, 2),
          |mn AS (SELECT k.bin AS k, s.lo,
          |    MIN(s.sp * 10000 // s.sn) AS mnrate
          |  FROM bins k JOIN seg s ON s.lo <= k.bin AND s.hi >= k.bin
          |  GROUP BY 1, 2),
          |fit AS (SELECT k, CAST(MAX(mnrate) AS BIGINT) AS iso
          |  FROM mn GROUP BY 1)
          |SELECT b.bin, b.n, b.pos,
          |  CAST(b.pos * 10000 // b.n AS BIGINT) AS raw_rate_e4,
          |  f.iso AS iso_rate_e4
          |FROM bins b JOIN fit f ON f.k = b.bin ORDER BY b.bin"""
          .stripMargin),
    "q221_brier_decomposition" ->
      (s"WITH $ScoreCtes,\n" +
        """labeled AS (SELECT d.source,
          |    LEAST(10000, GREATEST(0, (s.score_e6 + 600000) // 400)) AS p,
          |    CASE WHEN d.n_chars >= 350 THEN 1 ELSE 0 END AS y
          |  FROM sc s JOIN documents d USING (doc_id)),
          |cells AS MATERIALIZED (SELECT source, p,
          |    CAST(COUNT(*) AS BIGINT) AS nc, CAST(SUM(y) AS BIGINT) AS yc
          |  FROM labeled GROUP BY 1, 2),
          |g AS (SELECT source, CAST(SUM(nc) AS BIGINT) AS n,
          |    CAST(SUM(yc) AS BIGINT) AS y
          |  FROM cells GROUP BY 1),
          |g2 AS (SELECT source, n, y * 10000 // n AS ybar FROM g),
          |cc AS (SELECT c.source, c.nc, c.yc, c.p,
          |    c.yc * 10000 // c.nc AS ybc, g2.n, g2.ybar
          |  FROM cells c JOIN g2 USING (source))
          |SELECT source, n,
          |  CAST(SUM(yc * (p - 10000) * (p - 10000) + (nc - yc) * p * p)
          |    // n AS BIGINT) AS brier_e8,
          |  CAST(SUM(nc * (p - ybc) * (p - ybc)) // n AS BIGINT) AS rel_e8,
          |  CAST(SUM(nc * (ybc - ybar) * (ybc - ybar)) // n AS BIGINT)
          |    AS res_e8,
          |  CAST(ybar * (10000 - ybar) AS BIGINT) AS unc_e8
          |FROM cc GROUP BY source, n, ybar ORDER BY source"""
          .stripMargin),
    "q93_random_projection" ->
      s"""WITH planes(b, p) AS (VALUES
         |  $q93PlaneRows),
         |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
         |       FROM planes),
         |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
         |-- e6 fixed-point BEFORE the sum: the aggregate is then exact
         |-- integer arithmetic, immune to row-order float summation
         |-- (Spark folds the array in place; this SUM sees arbitrary
         |-- order — only integers make the two agree bit-for-bit).
         |proj AS (SELECT e.vec_id, pe.b,
         |           CAST(SUM(CAST(FLOOR(e.val * pe.pv * 1000000.0)
         |             AS BIGINT)) AS BIGINT) AS pr
         |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
         |qp AS (SELECT b, pr AS qpr FROM proj WHERE vec_id = 0),
         |d AS (SELECT proj.vec_id,
         |        CAST(SUM((proj.pr - qp.qpr) * (proj.pr - qp.qpr))
         |          AS BIGINT) AS d2
         |      FROM proj JOIN qp ON proj.b = qp.b
         |      WHERE proj.vec_id <> 0 GROUP BY 1)
         |SELECT vec_id, CAST(d2 AS DOUBLE) / 1000000000000.0 AS pdist
         |FROM d ORDER BY d2, vec_id LIMIT 10""".stripMargin,
    "q94_mixture_weights" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(list_filter(regexp_split_to_array(lower(text), ' '),
        |      x -> LENGTH(x) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
        |               COUNT(*) AS nd FROM per)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
        |  -- ELSE arm is CAST AS DOUBLE: bare 1.0/nd is DECIMAL division
        |  -- in DuckDB (truncating scale), not Spark's IEEE quotient.
        |  -- n_tokens = 0 is guarded BEFORE the division on both engines
        |  -- (Spark: Infinity, DuckDB: NULL — the unguarded forms diverge):
        |  -- zero-token domains take the ceiling weight, explicitly capped.
        |  CASE WHEN n_tokens > 0 THEN ROUND(LEAST(
        |    (CASE WHEN source = 'src0' THEN 0.10
        |          WHEN source = 'src1' THEN 0.08
        |          ELSE CAST(1.0 AS DOUBLE) / nd END)
        |      * CAST(tot AS DOUBLE) / CAST(n_tokens AS DOUBLE),
        |    4.0), 4) ELSE 4.0 END AS weight,
        |  CASE WHEN n_tokens > 0 THEN
        |    ((CASE WHEN source = 'src0' THEN 0.10
        |           WHEN source = 'src1' THEN 0.08
        |           ELSE CAST(1.0 AS DOUBLE) / nd END)
        |       * CAST(tot AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 4.0)
        |    ELSE TRUE END AS capped
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,
    "q96_centroid_assign" ->
      s"""WITH $CentroidCtes
         |SELECT label, clabel AS assigned, CAST(COUNT(*) AS BIGINT) AS n
         |FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q201: CentroidCtes assignment joined to documents, then the q186
    // keyness chain keyed by the assigned cluster.
    "q201_topic_labels" ->
      (s"WITH $CentroidCtes,\n" +
        AnalyticsQueries.keynessChainSql(
          """tok AS (SELECT asg.assigned AS grp,
            |    unnest(list_filter(regexp_split_to_array(lower(d.text),
            |      ' '), x -> LENGTH(x) > 0)) AS term
            |  FROM documents d JOIN (SELECT vec_id AS doc_id,
            |      clabel AS assigned FROM a WHERE rn = 1) asg
            |    USING (doc_id))""".stripMargin) + """
        |SELECT grp AS assigned, CAST(rank AS BIGINT) AS rank, term,
        |  a AS n_obs, CAST(exp_e4 AS BIGINT) AS exp_e4,
        |  CAST(g2_e4 AS BIGINT) AS g2_e4
        |FROM ranked WHERE rank <= 5
        |ORDER BY assigned, rank""".stripMargin),
    // q165: silhouette from the SAME ranked-distance CTE — a² is the
    // rn=1 distance, b² the rn=2 runner-up; one exact-integer division
    // + ROUND per row, `//` mean (all sil_e4 ≥ 0, trunc == floor).
    "q165_silhouette" ->
      s"""WITH $CentroidCtes,
         |sil AS (SELECT a1.vec_id, a1.clabel AS assigned,
         |    a1.d2 AS a2, a2r.d2 AS b2
         |  FROM a a1 JOIN a a2r
         |    ON a1.vec_id = a2r.vec_id AND a2r.rn = 2
         |  WHERE a1.rn = 1),
         |sv AS (SELECT vec_id, assigned,
         |    CASE WHEN b2 = 0 THEN 0
         |      ELSE CAST(ROUND(CAST(b2 - a2 AS DOUBLE) / b2 * 10000, 0)
         |        AS BIGINT) END AS sil_e4
         |  FROM sil)
         |SELECT assigned, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(sil_e4) // COUNT(*) AS BIGINT) AS mean_sil_e4,
         |  CAST(SUM(CASE WHEN sil_e4 < 5000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_boundary
         |FROM sv GROUP BY assigned ORDER BY assigned""".stripMargin,
    // q146: the q96 replay with the fit restricted to the BASE cohort
    // (vec_id % 10 <> 0) — frozen centroids serving the delta batch —
    // then per-centroid cohort counts and `//` means of the exact e8
    // integers (all operands non-negative, so DuckDB floor-// and Spark
    // trunc-div agree).
    "q146_index_staleness" ->
      """WITH e AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |c AS (SELECT label AS clabel, pos,
        |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
        |    COUNT(*) AS n
        |  FROM e WHERE vec_id % 10 <> 0 GROUP BY 1, 2),
        |cx AS (SELECT clabel, pos,
        |         CAST(s AS DOUBLE) / n / 1000000.0 AS cx FROM c),
        |d AS (SELECT e.vec_id, e.vec_id % 10 = 0 AS is_delta, cx.clabel,
        |        CAST(SUM(CAST(FLOOR((e.x - cx.cx) * (e.x - cx.cx)
        |          * 100000000.0) AS BIGINT)) AS BIGINT) AS d2
        |      FROM e JOIN cx ON e.pos = cx.pos GROUP BY 1, 2, 3),
        |a AS (SELECT vec_id, is_delta, clabel, d2, ROW_NUMBER() OVER
        |        (PARTITION BY vec_id ORDER BY d2, clabel) AS rn FROM d),
        |g AS (SELECT clabel AS assigned,
        |    CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_base,
        |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_delta,
        |    CAST(SUM(CASE WHEN NOT is_delta THEN d2 ELSE 0 END) AS BIGINT)
        |      AS sb,
        |    CAST(SUM(CASE WHEN is_delta THEN d2 ELSE 0 END) AS BIGINT)
        |      AS sd
        |  FROM a WHERE rn = 1 GROUP BY 1),
        |m AS (SELECT assigned, n_base, n_delta,
        |    CAST(n_delta * 10000 // (n_base + n_delta) AS BIGINT)
        |      AS delta_share_e4,
        |    CAST(CASE WHEN n_base > 0 THEN sb // n_base ELSE 0 END
        |      AS BIGINT) AS mean_d2_base_e8,
        |    CAST(CASE WHEN n_delta > 0 THEN sd // n_delta ELSE 0 END
        |      AS BIGINT) AS mean_d2_delta_e8
        |  FROM g)
        |SELECT assigned, n_base, n_delta, delta_share_e4,
        |  mean_d2_base_e8, mean_d2_delta_e8,
        |  CAST(mean_d2_delta_e8 * 10000 // GREATEST(mean_d2_base_e8, 1)
        |    AS BIGINT) AS err_inflation_e4
        |FROM m ORDER BY assigned""".stripMargin,
    // q124: per-cluster P95 cutoff on the SAME integer distances the
    // argmin compared — q96's assignment replay + q99's histogram-rank
    // machinery ((19n+19)//20, cutoff = min s with cum >= rank).
    "q124_embedding_outliers" ->
      s"""WITH $CentroidCtes,
         |v AS (SELECT clabel AS assigned, d2 FROM a WHERE rn = 1),
         |hist AS (SELECT assigned, d2 AS s, CAST(COUNT(*) AS BIGINT) AS c
         |         FROM v GROUP BY 1, 2),
         |r AS (SELECT assigned, s, c,
         |        SUM(c) OVER (PARTITION BY assigned ORDER BY s) AS cum,
         |        SUM(c) OVER (PARTITION BY assigned) AS n
         |      FROM hist),
         |r2 AS (SELECT assigned, s, c, cum, n, (19 * n + 19) // 20 AS rnk
         |       FROM r),
         |cut AS (SELECT assigned, MIN(s) AS cutoff FROM r2 WHERE cum >= rnk
         |        GROUP BY assigned)
         |SELECT r2.assigned, CAST(cut.cutoff AS BIGINT) AS p95_d2e8,
         |  CAST(MAX(n) AS BIGINT) AS n_vecs,
         |  CAST(SUM(CASE WHEN s >= cutoff THEN c ELSE 0 END) AS BIGINT)
         |    AS n_outliers,
         |  CAST(SUM(CASE WHEN s >= cutoff THEN c ELSE 0 END) AS DOUBLE)
         |    / CAST(MAX(n) AS DOUBLE) AS outlier_frac
         |FROM r2 JOIN cut USING (assigned)
         |GROUP BY r2.assigned, cut.cutoff ORDER BY assigned""".stripMargin,
    // q127: replays the hashed-bigram models, the e4 log-ratio table,
    // the integer doc score, and the md5-derived Gumbel perturbation.
    // Smoothing quotients mirror the engine's expression tree textually
    // (e0 literals — SURVEY §5.4); totals join in via a 1-row CTE where
    // the engine folds driver scalars.
    "q127_dsir_resample" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(lower(text), ' '),
        |                x -> LENGTH(x) > 0) AS t
        |  FROM documents),
        |bi AS (SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS g
        |       FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
        |             FROM toks WHERE len(t) >= 2)),
        |db AS (SELECT doc_id, lang,
        |         CAST(('0x'||substr(md5(g),1,8)) AS BIGINT) % 512 AS b,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM bi GROUP BY 1, 2, 3),
        |cnt AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr,
        |          CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END)
        |            AS BIGINT) AS ct
        |        FROM db GROUP BY b),
        |tot AS (SELECT CAST(SUM(cr) AS DOUBLE) AS nr,
        |          CAST(SUM(ct) AS DOUBLE) AS nt FROM cnt),
        |lr AS (SELECT b,
        |         CAST(ROUND((ln((ct + 1.0e0) / (nt + 512.0e0)) -
        |           ln((cr + 1.0e0) / (nr + 512.0e0))) * 10000, 0)
        |           AS BIGINT) AS lr_e4
        |       FROM cnt CROSS JOIN tot),
        |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
        |         CAST(SUM(c * lr_e4) AS BIGINT) AS logw_e4
        |       FROM db JOIN lr USING (b) GROUP BY doc_id),
        |g AS (SELECT doc_id, n_grams, logw_e4,
        |        CAST(ROUND(-ln(-ln((CAST(CAST(('0x'||substr(
        |          md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 12))
        |          AS BIGINT) AS DOUBLE) + 0.5e0) / 281474976710656.0e0))
        |          * 10000, 0) AS BIGINT) AS gumbel_e4
        |      FROM sc)
        |SELECT doc_id, n_grams, logw_e4, gumbel_e4,
        |  logw_e4 + gumbel_e4 AS score_e4
        |FROM g ORDER BY score_e4 DESC, doc_id LIMIT 100""".stripMargin
  )
}
