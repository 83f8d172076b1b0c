package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-boundary STITCHING — the crawl/export artifact where one
  * logical document arrives as consecutive records with a duplicated
  * overlap region (paginated scrapes, chunked exports, resumable
  * fetches). Detection is the inverse of chunking: scan ADJACENT
  * records per source and fire when the k-token tail of one record
  * equals the k-token head of the next; repair drops the duplicated
  * overlap and concatenates. Training corpora need this BEFORE
  * tokenization — an unstitched pair double-counts the overlap and
  * truncates both halves' context.
  *
  * [[shard]] synthesizes the planted ground truth (the q185 messy-URL
  * convention: the artifact is deterministic, the detector is the real
  * operator): each doc with ≥ 2k tokens splits into two shards with an
  * exact k-token overlap; shorter docs pass through unsplit.
  *
  * Scale shape: detection is ONE per-source window (lead over shard
  * order — keyed, never a global sort) on a narrow (source, shard_id,
  * tokens) projection; the overlap equality is per-row array algebra.
  * Repair is a projection of the same window row. Everything replays
  * in SQL (LEAD + list slicing).
  */
object Stitch {

  /** Split each doc into two overlapping shards: shard 2·id carries
    * tokens 1..h, shard 2·id+1 carries tokens h−k+1..n with
    * h = (n+k) div 2 — an exact k-token overlap. Docs with fewer than
    * 2k tokens emit a single unsplit shard 2·id. Output: (shard_id,
    * `idCol`, part, text, plus every other input column).
    */
  def shard(df: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame = {
    require(k >= 1, s"shard needs k >= 1, got $k")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val h = (n + k).cast("long") - pmod(n + k, lit(2))
    val half = (h / 2).cast("int")
    val splittable = n >= 2 * k
    val first = array_join(slice(toks, lit(1), half), " ")
    // Guarded: the slice start half−k+1 would be non-positive for docs
    // shorter than k tokens, and Spark evaluates projected expressions
    // for every row regardless of which explode branch wins.
    val second = when(splittable, array_join(
      slice(toks, half - (k - 1), n - half + lit(k)), " "))
    val rest = df.columns.filter(c => c != idCol && c != textCol)
      .map(col).toSeq
    graft.SparkUtil.ensureParallelism(df).select(
        Seq(col(idCol), col(textCol).as("__text"), splittable.as("__sp"),
          first.as("__first"), second.as("__second")) ++ rest: _*)
      .select(col(idCol) +:
        explode(when(col("__sp"), array(
            struct(lit(0).as("part"), col("__first").as("text")),
            struct(lit(1).as("part"), col("__second").as("text"))))
          .otherwise(array(
            struct(lit(0).as("part"), col("__text").as("text")))))
          .as("__s") +: rest: _*)
      .select((col(idCol) * 2 + col("__s.part")).as("shard_id") +:
        col(idCol) +: col("__s.part").as("part") +:
          col("__s.text").as("text") +: rest: _*)
  }

  /** Detect-and-repair over adjacent shards within each `groupCol`
    * stream (shard order = `ordCol`): a pair is STITCHED when the
    * k-token tail of the left record equals the k-token head of the
    * right. Output one row per adjacent pair: (left_id, right_id,
    * matched, merged_text — overlap dropped, null when unmatched).
    * The last record of each group has no right neighbor and emits
    * nothing.
    */
  def detectAdjacent(shards: DataFrame, groupCol: String, ordCol: String,
      textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(ordCol))
    val toks = split(col(textCol), " ")
    val next = lead(col(ordCol), 1).over(w)
    val nextText = lead(col(textCol), 1).over(w)
    val nt = split(col("__next_text"), " ")
    val ct = split(col("__text"), " ")
    shards
      .select(col(groupCol), col(ordCol).as("left_id"),
        col(textCol).as("__text"), next.as("right_id"),
        nextText.as("__next_text"))
      .filter(col("right_id").isNotNull)
      .withColumn("matched",
        size(ct) >= k && size(nt) >= k &&
          slice(ct, size(ct) - (k - 1), lit(k)) === slice(nt, lit(1), lit(k)))
      .withColumn("merged_text",
        // Full containment (right shard is exactly the k-token overlap):
        // the merge is the left text UNCHANGED. The general concat would
        // emit a trailing space here (array_join over the empty remainder
        // slice is ""), and engines disagree on the empty-list edge
        // (DuckDB's list_aggregate yields NULL, nulling the concat), so
        // the edge gets its own branch in BOTH engines.
        when(col("matched") && size(nt) === k, col("__text"))
          .when(col("matched"), concat(col("__text"), lit(" "),
            array_join(slice(nt, lit(k + 1), size(nt) - k), " "))))
      .select(col(groupCol), col("left_id"), col("right_id"),
        col("matched"), col("merged_text"))
  }
}
