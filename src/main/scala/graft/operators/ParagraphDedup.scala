package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet/RefinedWeb-style paragraph-hash boilerplate removal.
  *
  * The cheap tier of substring dedup: instead of q98's overlapping
  * k-shingles + span merge ([[SpanDedup]]), hash fixed-width
  * NON-overlapping W-token segments ("paragraphs" — the corpus carries
  * no newlines, so the segment grid stands in for paragraph breaks) and
  * strip every segment whose hash occurs in >= `minDocFreq` DISTINCT
  * documents. One corpus pass, n/W hash rows per document (vs ~n shingle
  * rows for the span tier), exact by construction — the DuckDB oracle
  * replays the identical grid and md5s.
  *
  * Scale shape: the segment stream is materialized ONCE
  * (localCheckpoint, same tokenize-once discipline as
  * [[SpanDedup.dupPositions]]) because it feeds two consumers (the
  * doc-frequency aggregate and the position semi join). Document
  * frequency is a map-side-combinable count over DISTINCT (doc, hash) —
  * a boilerplate paragraph in 10^6 docs costs one combiner cell. The
  * rebuild is a per-row index-aware `filter` over the token array
  * against a doc-keyed duplicated-segment list (AQE broadcasts it): the
  * corpus crosses zero exchanges in the rebuild, exactly the
  * [[SpanDedup.stripSpans]] shape.
  *
  * Within-doc repetition alone does NOT strip (df counts distinct docs):
  * this operator targets cross-document boilerplate, not self-repetition
  * (q65's top-bigram fractions cover that axis).
  */
object ParagraphDedup {

  /** One row per full W-token segment: (idCol, n_words, p, h) with
    * 1-based segment ordinal p covering tokens [(p-1)*W+1, p*W] and
    * h = md5 of the space-joined segment text. The trailing partial
    * segment (< W tokens) is never hashed and always survives.
    */
  private def segmentsTokens(tok: DataFrame, idCol: String,
      tokCol: String, w: Int): DataFrame =
    tok.select(col(idCol), col(tokCol).as("__t"))
      .filter(size(col("__t")) >= w)
      .select(col(idCol), size(col("__t")).as("n_words"),
        explode(transform(
          sequence(lit(1), (size(col("__t")) / w).cast("int")),
          p => struct(p.as("p"),
            md5(concat_ws(" ",
              slice(col("__t"), (p - 1) * w + 1, lit(w)))).as("h"))))
          .as("__s"))
      .select(col(idCol), col("n_words"),
        col("__s.p").as("p"), col("__s.h").as("h"))

  private def segments(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    segmentsTokens(
      graft.SparkUtil.ensureParallelism(df)
        .select(col(idCol), split(col(textCol), " ").as("__tok")),
      idCol, "__tok", w)

  /** Segment ordinals (idCol, p) whose hash occurs in >= minDocFreq
    * distinct documents. The segment stream is consumed twice —
    * materialize once.
    */
  private def dupSegmentsFrom(seg0: DataFrame, idCol: String,
      minDocFreq: Int): DataFrame = {
    val seg = seg0.localCheckpoint(true)
    val dup = seg.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("h"))
    seg.join(dup, Seq("h"), "left_semi").select(col(idCol), col("p"))
  }

  private def dupSegments(df: DataFrame, idCol: String, textCol: String,
      w: Int, minDocFreq: Int): DataFrame =
    dupSegmentsFrom(segments(df, idCol, textCol, w), idCol, minDocFreq)

  /** Duplicated segments as 1-based inclusive token spans
    * (idCol, s, e) — segment p covers [(p−1)·w+1, p·w]. The q134
    * attribution view of the same dup set [[strip]] removes.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 12, minDocFreq: Int = 2): DataFrame =
    dupSegments(df, idCol, textCol, w, minDocFreq)
      .select(col(idCol), ((col("p") - 1) * w + 1).as("s"),
        (col("p") * w).as("e"))

  /** [[dupSpans]] over a pre-tokenized corpus (`tokCol` holds the token
    * array): the q134 shape — one checkpointed tokenize feeds all three
    * substring-dedup tiers.
    */
  def dupSpansTokens(tok: DataFrame, idCol: String, tokCol: String,
      w: Int = 12, minDocFreq: Int = 2): DataFrame =
    dupSegmentsFrom(segmentsTokens(tok, idCol, tokCol, w), idCol,
        minDocFreq)
      .select(col(idCol), ((col("p") - 1) * w + 1).as("s"),
        (col("p") * w).as("e"))

  /** The rewrite: corpus with every cross-doc duplicated W-segment
    * removed; untouched documents pass through verbatim. Output:
    * idCol, textCol (rewritten), n_segs, n_dup_segs, n_removed.
    *
    * A 0-based token j belongs to segment j/w + 1; it survives iff that
    * ordinal is in no duplicated-segment entry for this doc (trailing
    * partial-segment tokens can never match — dup ordinals only name
    * full segments). Per-token cost is O(dup segs in this doc).
    */
  def strip(df: DataFrame, idCol: String, textCol: String, w: Int = 12,
      minDocFreq: Int = 2): DataFrame = {
    val dupPerDoc = dupSegments(df, idCol, textCol, w, minDocFreq)
      .groupBy(col(idCol))
      .agg(collect_list(col("p")).as("__dp"))
    val toks = split(col(textCol), " ")
    val noDups = array().cast("array<int>")
    df.join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), toks.as("__t"),
        coalesce(col("__dp"), noDups).as("__d"))
      .select(col(idCol), col("__t"), col("__d"),
        filter(col("__t"), (_, j) => !array_contains(col("__d"),
          (j / w).cast("int") + 1)).as("__kept"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as(textCol),
        (size(col("__t")) / w).cast("long").as("n_segs"),
        size(col("__d")).cast("long").as("n_dup_segs"),
        (size(col("__t")) - size(col("__kept"))).cast("long")
          .as("n_removed"))
  }
}
