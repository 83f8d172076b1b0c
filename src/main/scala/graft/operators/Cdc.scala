package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup — the shift-robust member of
  * the substring-dedup trilogy. [[ParagraphDedup]]'s fixed grid (q126)
  * misses boilerplate that sits at different token offsets in each
  * document (one inserted token shifts every later segment hash);
  * [[SpanDedup]]'s overlapping shingles (q98/q101) catch any alignment
  * but cost ~n shingle rows per doc. CDC cuts at positions chosen by
  * the CONTENT — after token i whenever the hash of the w-token window
  * ending at i is ≡ 0 (mod `modulus`) — so a chunk boundary depends
  * only on its local window: an insertion perturbs chunking only until
  * the next content cut, and shared runs at DIFFERENT offsets still
  * produce identical interior chunks (the rsync/LBFS/backup-dedup
  * technique applied to corpus text). Mean chunk length ≈ `modulus`
  * tokens, at n/modulus hash rows per doc.
  *
  * Cross-doc dedup then mirrors the grid tier: md5 each chunk, strip
  * every chunk whose hash occurs in ≥ `minDocFreq` distinct documents,
  * rebuild with the index-aware filter (zero corpus exchanges in the
  * rebuild). Chunking itself is per-row array algebra — cut selection,
  * boundary assembly, and chunk hashing never leave the row — and the
  * chunk stream is materialized ONCE for its consumers. All hashes are
  * md5-derived integers, so a SQL oracle replays cuts, chunks, and the
  * rebuilt text byte-for-byte.
  */
object Cdc {

  /** Duplicated chunks as 1-based inclusive token spans (idCol, s, e) —
    * the q134 attribution view of the dup set [[strip]] removes.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, w: Int = 4,
      modulus: Int = 16, minDocFreq: Int = 2): DataFrame =
    dupSpansFrom(chunkStream(df, idCol, textCol, w, modulus), idCol,
      minDocFreq)

  private def dupSpansFrom(seg: DataFrame, idCol: String,
      minDocFreq: Int): DataFrame = {
    val dup = seg.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("h"))
    seg.join(dup, Seq("h"), "left_semi")
      .select(col(idCol), col("s"), col("e"))
  }

  /** Corpus with every cross-doc duplicated CDC chunk removed.
    * Output: idCol, textCol (rewritten), n_chunks, n_dup_chunks,
    * n_removed. Documents shorter than `w` tokens form one whole-doc
    * chunk (so exact short-doc duplicates still dedupe).
    */
  /** The CDC chunk stream (idCol, s, e, h): per-row cut selection,
    * boundary assembly, chunk hashing — materialized once for its
    * consumers.
    */
  private def chunkStreamTokens(tok: DataFrame, idCol: String,
      tokCol: String, w: Int, modulus: Int): DataFrame = {
    val n = size(col("__t"))
    // Cut positions: i ∈ [w, n] with hash(window ending at i) % m == 0.
    val winHash = (i: org.apache.spark.sql.Column) =>
      pmod(conv(substring(md5(concat_ws(" ",
        slice(col("__t"), i - (w - 1), lit(w)))), 1, 8), 16, 10)
        .cast("long"), lit(modulus.toLong))
    val cuts = when(n >= w,
      filter(transform(sequence(lit(w), n),
        i => when(winHash(i) === 0L, i).otherwise(lit(-1))), x => x > 0))
      .otherwise(array().cast("array<int>"))
    // Boundary array P = [0] ++ cuts ++ [n]; chunk c spans tokens
    // [P(c)+1, P(c+1)] — empty spans (a cut at n) drop out.
    val bounds = concat(array(lit(0)), cuts, array(n))
    val chunks = filter(
      transform(sequence(lit(1), size(col("__P")) - 1),
        c => struct(
          (element_at(col("__P"), c) + 1).as("s"),
          element_at(col("__P"), c + 1).as("e"))),
      ch => ch.getField("s") <= ch.getField("e"))
    tok.select(col(idCol), col(tokCol).as("__t"))
      .withColumn("__P", bounds)
      .select(col(idCol), col("__t"), explode(chunks).as("__c"))
      .select(col(idCol),
        col("__c.s").as("s"), col("__c.e").as("e"),
        md5(concat_ws(" ",
          slice(col("__t"), col("__c.s"),
            col("__c.e") - col("__c.s") + 1))).as("h"))
      .localCheckpoint(true)
  }

  private def chunkStream(df: DataFrame, idCol: String, textCol: String,
      w: Int, modulus: Int): DataFrame =
    chunkStreamTokens(
      graft.SparkUtil.ensureParallelism(df)
        .select(col(idCol), split(col(textCol), " ").as("__tok")),
      idCol, "__tok", w, modulus)

  /** [[dupSpans]] over a pre-tokenized corpus (`tokCol` holds the token
    * array): the q134 shape — one checkpointed tokenize feeds all three
    * substring-dedup tiers.
    */
  def dupSpansTokens(tok: DataFrame, idCol: String, tokCol: String,
      w: Int = 4, modulus: Int = 16, minDocFreq: Int = 2): DataFrame =
    dupSpansFrom(chunkStreamTokens(tok, idCol, tokCol, w, modulus),
      idCol, minDocFreq)

  def strip(df: DataFrame, idCol: String, textCol: String, w: Int = 4,
      modulus: Int = 16, minDocFreq: Int = 2): DataFrame = {
    val toks = split(col(textCol), " ")
    val seg = chunkStream(df, idCol, textCol, w, modulus)
    val dup = seg.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("h"))
    val dupPerDoc = seg.join(dup, Seq("h"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("__spans"),
        count(lit(1)).as("n_dup_chunks"))
    val chunkCounts = seg.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"))
    val noSpans = array().cast("array<struct<s:int,e:int>>")
    df.join(chunkCounts, Seq(idCol))
      .join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), toks.as("__t"), col("n_chunks"),
        coalesce(col("__spans"), noSpans).as("__s"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"))
      .select(col(idCol), col("__t"), col("n_chunks"), col("n_dup_chunks"),
        filter(col("__t"), (_, j) => !exists(col("__s"),
          sp => j + 1 >= sp.getField("s") &&
            j + 1 <= sp.getField("e"))).as("__kept"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as(textCol),
        col("n_chunks"), col("n_dup_chunks"),
        (size(col("__t")) - size(col("__kept"))).cast("long")
          .as("n_removed"))
  }
}
