package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring — the CCNet/KenLM-style
  * quality signal: documents whose token transitions are improbable under
  * a model trained on the corpus itself score high (junk), fluent text
  * scores low. Here the model is an add-one-smoothed bigram LM estimated
  * from the full corpus in one aggregation pass, and scoring is a join of
  * each document's bigrams against the count tables — no model asset, no
  * UDF, everything stays in Tungsten aggregates and shuffle joins.
  *
  * Scale shape (100 TB): tokenization + bigram assembly are map-side;
  * the per-token-instance bigram stream (the largest relation here) is
  * aggregated ONCE — `(id, w1, w2) → cnt`, map-side-combinable, keyed by
  * the well-distributed composite — and every downstream relation derives
  * from that collapsed table: the corpus bigram counts re-aggregate it
  * (vocabulary²-sized input, not instance-sized), the unigram counts join
  * it into a per-bigram score table (both sides vocabulary-sized), and
  * scoring is ONE join of the per-doc counts against that score table.
  * The raw stream never crosses a join and never shuffles on a bare `w1`
  * key (the most skewed key distribution there is — "the" heads a huge
  * fraction of all bigrams; that skewed join lives entirely in the small
  * count tables). The per-document reduction is an integer sum weighted
  * by multiplicity, so partial aggregation is exact and order-independent.
  *
  * Determinism: the per-bigram negative log-likelihood is fixed to 1e-4
  * nats (`round(-ln(p) * 10000)` as a long) BEFORE summation, so the
  * cross-engine aggregate is an integer sum — immune to float summation
  * order (SURVEY §5.4). The oracle replays the same counts, the same
  * smoothing and the same fixed-point rule.
  */
object LanguageModel {

  /** The fused 1-gram/2-gram corpus pass shared by [[bigramNll]] and
    * [[bigramNllBy]]: tokenize, emit every token instance as a unigram
    * row (`w2` NULL) and every adjacent pair as a bigram row from ONE
    * explode, and collapse to multiplicities keyed by `keyCols × (w1,
    * w2)` in ONE aggregate. Eagerly materialized — it is the single
    * corpus-derived relation every downstream count table reads, and it
    * has multiple consumers (Catalyst does not share subtrees).
    */
  private def gramCounts(df: DataFrame, keyCols: Seq[org.apache.spark.sql
      .Column], idCol: String, textCol: String): DataFrame = {
    val toksExpr = filter(split(lower(col(textCol)), " "),
      t => length(t) > 0)
    // Adjacent pairs via two shifted slices zipped in place — array
    // algebra, no positional self-join. `greatest(…, 0)` keeps the slice
    // length legal for 0/1-token docs (they emit no bigram rows).
    val bgLen = greatest(size(col("__t")) - 1, lit(0))
    val uniPart = transform(col("__t"),
      t => struct(t.as("w1"), lit(null).cast("string").as("w2")))
    val bgPart = zip_with(
      slice(col("__t"), lit(1), bgLen),
      slice(col("__t"), lit(2), bgLen),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    graft.SparkUtil.ensureParallelism(df)
      .select(keyCols :+ toksExpr.as("__t"): _*)
      .select(keyCols :+ explode(concat(uniPart, bgPart)).as("g"): _*)
      .select(keyCols ++ Seq(col("g.w1").as("w1"), col("g.w2").as("w2")): _*)
      .groupBy(keyCols ++ Seq(col("w1"), col("w2")): _*)
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
  }

  /** Per-document average bigram negative log-likelihood (nats, 4 dp)
    * under an add-one-smoothed bigram LM estimated on `df` itself:
    *
    *   P(w2 | w1) = (C(w1 w2) + 1) / (C(w1) + V)
    *
    * with V = |vocabulary|. Documents with fewer than 2 tokens carry no
    * bigram evidence and are dropped (they need a length-based filter,
    * not an LM score). Output: idCol, n_bigrams, avg_nll.
    */
  def bigramNll(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // ONE corpus pass (r10 — was two: a unigram explode for the count
    // table and a bigram explode for the doc stream, each re-reading the
    // tokenized checkpoint): a single explode emits every token instance
    // as a unigram row (w2 NULL) and every adjacent pair as a bigram row,
    // and ONE map-side-combinable aggregate collapses both to per-doc
    // multiplicities. The materialized result is the only relation any
    // count table reads — the corpus is scanned once, exploded once.
    val grams = gramCounts(df, Seq(col(idCol)), idCol, textCol)
    val docBg = grams.filter(col("w2").isNotNull)
    // Unigram counts derive from the collapsed table (vocabulary-sized
    // re-aggregation, not an instance pass). Materialized: consumed twice
    // — the V scalar and the score-table join.
    val c1 = grams.filter(col("w2").isNull)
      .groupBy(col("w1")).agg(sum(col("cnt")).as("c1"))
      .localCheckpoint(true)
    // V = |vocabulary| is just the count-table row count — no separate
    // countDistinct pass over the unigram stream. One number to the
    // driver, folded into the score expression as a literal (a
    // broadcast-join of a 1-row frame would work too but blocks constant
    // folding).
    val vocab = c1.count()

    // Corpus bigram counts derive from the collapsed table — the raw
    // stream is not re-aggregated.
    val c2 = docBg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c2"))

    // Per-bigram score table: the skewed w1 join happens HERE, between
    // two vocabulary-sized count tables, never against the doc stream.
    val perBigram = c2
      .join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(-log((col("c2") + lit(1.0)) / (col("c1") + lit(vocab.toDouble)))
          * 10000, 0).cast("long").as("nll_e4"))

    // avg ships at FULL precision: the quotient of exact integers is the
    // same IEEE double in every engine, while ROUND(x, 4) of a value that
    // sits on a decimal boundary is not (SURVEY §5.4 — q38's lesson;
    // 2/500 sf0.01 rows flipped the 4th decimal under a rounded avg).
    // Σ cnt·nll_e4 over distinct (id,w1,w2) == Σ nll_e4 over instances,
    // so the result is bit-identical to the instance-level formulation.
    docBg.join(perBigram, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_bigrams"),
        (sum(col("cnt") * col("nll_e4")) / 10000.0 / sum(col("cnt")))
          .as("avg_nll"))
  }

  /** Per-GROUP bigram LMs in one pass — the CCNet shape proper: each
    * language (or domain) gets its own add-one-smoothed model, estimated
    * and scored without looping over groups. Same plan discipline as
    * [[bigramNll]] — the instance stream aggregates once on
    * `(id, group, w1, w2)`; count tables, per-group vocab sizes and the
    * smoothing join are all (group × vocabulary)-sized. The per-group
    * vocabulary size joins in as a groups-sized relation (broadcast)
    * instead of a driver literal.
    *
    * Output: idCol, groupCol, n_bigrams, `score_e4` = the integer
    * quotient `Σ cnt·nll_e4 div Σ cnt` — an exact long in both engines,
    * histogram-bucketable downstream (q99's machinery) without float
    * portability caveats.
    */
  def bigramNllBy(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame = {
    // ONE corpus pass for both gram orders (r10) — see [[gramCounts]].
    val grams = gramCounts(df, Seq(col(idCol), col(groupCol)), idCol,
      textCol)
    val docBg = grams.filter(col("w2").isNotNull)
    val c1 = grams.filter(col("w2").isNull)
      .groupBy(col(groupCol), col("w1"))
      .agg(sum(col("cnt")).as("c1"))
      .localCheckpoint(true)
    // Per-group V: a groups-sized table, broadcast into the score join.
    val vocabs = c1.groupBy(col(groupCol)).agg(count(lit(1)).as("__v"))

    val c2 = docBg.groupBy(col(groupCol), col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c2"))

    val perBigram = c2
      .join(c1, Seq(groupCol, "w1"))
      .join(broadcast(vocabs), Seq(groupCol))
      .select(col(groupCol), col("w1"), col("w2"),
        round(-log((col("c2") + lit(1.0)) /
            (col("c1") + col("__v").cast("double"))) * 10000, 0)
          .cast("long").as("nll_e4"))

    docBg.join(perBigram, Seq(groupCol, "w1", "w2"))
      .groupBy(col(idCol), col(groupCol))
      .agg(sum(col("cnt")).as("n_bigrams"),
        expr("CAST(sum(cnt * nll_e4) div sum(cnt) AS BIGINT)")
          .as("score_e4"))
  }

  /** Fixed absolute discount for [[kneserNeyNll]] — 0.75 is the
    * classic KN default and is exactly representable in binary (3/4),
    * so `c2 - Discount` is the same IEEE double in every engine.
    */
  val KnDiscount = 0.75

  /** Per-document average bigram negative log-likelihood under an
    * INTERPOLATED KNESER–NEY bigram LM estimated on `df` itself — the
    * smoothing KenLM actually ships (vs [[bigramNll]]'s add-one
    * pedagogy). With absolute discount d = [[KnDiscount]]:
    *
    *   P_KN(w2 | w1) = (C(w1 w2) − d) / C(w1 ·)
    *                 + d · N1+(w1 ·) / C(w1 ·) · N1+(· w2) / N1+(· ·)
    *
    * where C(w1 ·) = Σ_w2 C(w1 w2) (bigram-token count of the context),
    * N1+(w1 ·) = distinct continuations of w1, N1+(· w2) = distinct
    * contexts preceding w2 (the continuation probability — "how many
    * NOVEL contexts does w2 appear in", not raw frequency: the reason KN
    * ranks "Francisco" low despite "San Francisco" being frequent), and
    * N1+(· ·) = total distinct bigram types. Scoring the training corpus
    * means every scored bigram has C ≥ 1, so the max(·, 0) clip in the
    * textbook formula is vacuous and omitted — the oracle replays the
    * identical unclipped expression.
    *
    * Scale shape: everything derives from the collapsed bigram TYPE
    * table `c2` — context totals, continuation counts and the type count
    * are vocabulary-sized re-aggregations of it, never of the instance
    * stream (same discipline as [[bigramNll]]; the raw stream aggregates
    * exactly once, in [[gramCounts]]). N1+(· ·) is one scalar to the
    * driver, folded into the score expression as a literal. Determinism:
    * per-bigram NLL quantized to e4 longs before the multiplicity-
    * weighted integer sum (SURVEY §5.4).
    *
    * Output: idCol, n_bigrams, avg_nll — [[bigramNll]]'s schema, so the
    * two smoothers are drop-in comparable.
    */
  def kneserNeyNll(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val grams = gramCounts(df, Seq(col(idCol)), idCol, textCol)
    val docBg = grams.filter(col("w2").isNotNull)
    // Bigram TYPE table — the single corpus-derived relation every KN
    // statistic reads. Materialized: three consumers below.
    val c2 = docBg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c2"))
      .localCheckpoint(true)
    // Context stats in ONE pass over the type table: C(w1·) and N1+(w1·)
    // share a groupBy.
    val ctx = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val nbt = c2.count()

    // Skewed w1/w2 joins live between vocabulary-sized count tables —
    // never against the doc stream. The arithmetic shape below is
    // replicated token-for-token in the oracle SQL (left-associative
    // * and /), so both engines evaluate the identical IEEE expression.
    val perBigram = c2
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .select(col("w1"), col("w2"),
        round(-log(
          (col("c2") - lit(KnDiscount)) / col("c1") +
            lit(KnDiscount) * col("n1p") / col("c1") *
              (col("nc") / lit(nbt.toDouble))) * 10000, 0)
          .cast("long").as("nll_e4"))

    docBg.join(perBigram, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_bigrams"),
        (sum(col("cnt") * col("nll_e4")) / 10000.0 / sum(col("cnt")))
          .as("avg_nll"))
  }
}
