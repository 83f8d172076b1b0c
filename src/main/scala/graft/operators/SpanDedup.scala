package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection and removal — substring-level dedup.
  *
  * Document-level dedup (exact [[Dedup.exact]], near [[Dedup]] MinHash /
  * SimHash) misses the dominant real-world contamination shape: two
  * mostly-different documents sharing a long verbatim run (boilerplate,
  * license headers, quoted passages, templated sections). Training-data
  * pipelines strip the RUN, not the document. This operator finds every
  * maximal token span covered by k-token shingles that occur in at least
  * `minDocFreq` distinct documents, and [[stripSpans]] rewrites the
  * corpus with those spans removed.
  *
  * Scale shape: the shingle stream is exploded once per use; the
  * duplicated-shingle set derives from a map-side-combinable
  * groupBy(shingle).count over DISTINCT (doc, shingle) pairs — never a
  * window over the raw stream, so a boilerplate shingle in 10^6 docs
  * costs one combiner cell, not a 10^6-row window partition. Positions
  * rejoin that set with a semi join (AQE broadcasts it when small,
  * skew-splits when not). Span merging is a per-document
  * gaps-and-islands window — partitioned by doc id, bounded by document
  * length. Everything is exact integer arithmetic; the DuckDB oracle
  * replays it bit-for-bit.
  */
object SpanDedup {

  /** k-token shingles with their 1-based start position:
    * (idCol, n_words, i, g). Documents shorter than k emit nothing.
    * `tok` carries a pre-split token array in `tokCol` — shared q134
    * attribution tokenizes the corpus ONCE and feeds all three dedup
    * tiers from the same checkpoint.
    */
  private[operators] def shinglesTokens(tok: DataFrame, idCol: String,
      tokCol: String, k: Int): DataFrame =
    tok.select(col(idCol), col(tokCol).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col(idCol), size(col("__t")).as("n_words"),
        explode(transform(sequence(lit(1), size(col("__t")) - (k - 1)),
          i => struct(i.as("i"),
            concat_ws(" ", slice(col("__t"), i, lit(k))).as("g"))))
          .as("__s"))
      .select(col(idCol), col("n_words"),
        col("__s.i").as("i"), col("__s.g").as("g"))

  private def shingles(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    shinglesTokens(
      graft.SparkUtil.ensureParallelism(df)
        .select(col(idCol), split(col(textCol), " ").as("__tok")),
      idCol, "__tok", k)

  /** Shingle start positions (idCol, n_words, i) whose shingle occurs in
    * >= minDocFreq distinct docs.
    *
    * The shingle stream is consumed twice (document-frequency aggregate
    * + position semi join) and Catalyst does NOT share the subtree — an
    * un-materialized `pos` explodes the corpus into shingles once per
    * consumer. Materialize it once (same tokenize-once discipline as
    * [[LanguageModel.bigramNll]]); the explode is the dominant cost of
    * the whole span tier, so this halves it.
    */
  private def dupPositionsFrom(pos0: DataFrame, idCol: String,
      minDocFreq: Int): DataFrame = {
    val pos = pos0.localCheckpoint(true)
    val dup = pos.select(col(idCol), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("g"))
    pos.join(dup, Seq("g"), "left_semi")
  }

  private def dupPositions(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocFreq: Int): DataFrame =
    dupPositionsFrom(shingles(df, idCol, textCol, k), idCol, minDocFreq)

  /** Merged duplicated spans per document: one row per maximal run of
    * overlapping/adjacent duplicated k-shingles, with 1-based inclusive
    * token bounds. Columns: idCol, n_words, span_start, span_end.
    */
  def spans(df: DataFrame, idCol: String, textCol: String, k: Int = 8,
      minDocFreq: Int = 2): DataFrame =
    spansFromPositions(
      dupPositions(df, idCol, textCol, k, minDocFreq), idCol, k)

  /** [[spans]] over a pre-tokenized corpus (`tokCol` holds the token
    * array): the q134 shape where one checkpointed tokenize feeds all
    * three dedup tiers.
    */
  def spansTokens(tok: DataFrame, idCol: String, tokCol: String,
      k: Int = 8, minDocFreq: Int = 2): DataFrame =
    spansFromPositions(
      dupPositionsFrom(shinglesTokens(tok, idCol, tokCol, k), idCol,
        minDocFreq), idCol, k)

  private def spansFromPositions(pos: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("i"))
    // A shingle at i covers [i, i+k-1]; runs merge while the next start
    // is within k of the previous (overlap or exact adjacency).
    pos
      .withColumn("__new",
        when(col("i") > lag(col("i"), 1, -(k + 1)).over(byDoc) + k, 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col(idCol), col("n_words"), col("__island"))
      .agg(min(col("i")).as("span_start"),
        (max(col("i")) + (k - 1)).as("span_end"))
      .drop("__island")
  }

  /** Per-document duplicated-span report: span count, tokens covered,
    * and covered fraction. Only documents with at least one duplicated
    * span appear. dup_frac is a single IEEE division of two exact
    * integers — portable across engines without rounding.
    */
  def report(df: DataFrame, idCol: String, textCol: String, k: Int = 8,
      minDocFreq: Int = 2): DataFrame =
    spans(df, idCol, textCol, k, minDocFreq)
      .groupBy(col(idCol), col("n_words"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
      .select(col(idCol), col("n_words").cast("long").as("n_words"),
        col("n_spans"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_words"))
          .as("dup_frac"))

  /** The rewrite: corpus with every duplicated span removed. Documents
    * keep their surviving tokens in original order (empty if fully
    * covered); docs with no duplicated span pass through verbatim.
    * Output: idCol, textCol (rewritten), n_removed.
    *
    * The span table collapses to ONE doc-keyed row (a span LIST bounded
    * by document length), joins back to the corpus, and the rewrite is
    * a per-row index-aware `filter` over the token array — a token
    * survives iff its 1-based position lies in no span. No token
    * posexplode, no per-position anti join, no collect_list reassembly
    * shuffle: the corpus crosses zero exchanges in the rebuild (the r9a
    * shape paid a Generate + an anti join + a reassembly aggregate).
    * Per-token cost is O(spans in this doc) — bounded by doc length.
    */
  def stripSpans(df: DataFrame, idCol: String, textCol: String, k: Int = 8,
      minDocFreq: Int = 2): DataFrame = {
    val spanLists = spans(df, idCol, textCol, k, minDocFreq)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val toks = split(col(textCol), " ")
    // Left join: docs with no duplicated span carry an empty span list
    // and pass through verbatim.
    val noSpans = array().cast("array<struct<span_start:int,span_end:int>>")
    df.join(spanLists, Seq(idCol), "left")
      .select(col(idCol), toks.as("__t"),
        coalesce(col("__spans"), noSpans).as("__s"))
      .select(col(idCol), col("__t"),
        filter(col("__t"), (_, j) => !exists(col("__s"),
          s => j + 1 >= s.getField("span_start") &&
            j + 1 <= s.getField("span_end"))).as("__kept"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as(textCol),
        (size(col("__t")) - size(col("__kept"))).cast("long")
          .as("n_removed"))
  }
}
