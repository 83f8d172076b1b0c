package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining — the corpus-level "which word pairs belong
  * together" statistic (Church & Hanks' association ratio): for ordered
  * skip-gram pairs (w1 before w2, distance ≤ `maxDist`),
  *
  *   PMI(w1,w2) = ln( P(w1,w2) / (P1(w1)·P2(w2)) )
  *              = ln( C(w1,w2)·N / (M1(w1)·M2(w2)) )
  *
  * with M1/M2 the pair-table marginals and N the total pair count.
  * High-PMI pairs are multi-word expressions ("san francisco"), the
  * vocabulary a tokenizer or a phrase-aware dedup shingle should treat
  * as units; the min-count floor kills the classic PMI pathology
  * (hapax pairs scoring ln N).
  *
  * Scale shape: pair generation is per-row ARRAY ALGEBRA — for each
  * distance d, the token array zipped with its d-shifted self (the
  * [[LanguageModel]] slice/zip_with discipline, generalized), all
  * distances concatenated and exploded ONCE — so the corpus crosses
  * exactly one map-side-combinable aggregate into the pair TYPE table.
  * Marginals and the N scalar are vocabulary²-sized re-aggregations of
  * that table (never of the instance stream); the final join is count
  * table × count table. Top-K is a TakeOrdered, not a global sort.
  *
  * Determinism: PMI quantizes to e4 BEFORE ranking; ties break on
  * (w1, w2), so the LIMIT boundary is total-ordered. `C·N` and `M1·M2`
  * stay ≤ 2^53 for any corpus this engine's long counts can hold
  * (each factor ≤ N; overflow needs N > 3e9 pairs in ONE PMI table —
  * shard the vocabulary first at that point), so the double quotient
  * is exact-ratio-of-exact-products in both engines.
  */
object Collocations {

  /** Top-`topK` collocations by e4-quantized PMI over ordered pairs at
    * distance ≤ `maxDist`, with pair count ≥ `minCount`. Output:
    * w1, w2, n_pairs, pmi_e4.
    */
  /** The ordered skip-gram pair TYPE table — (w1, w2, c) for pairs at
    * distance ≤ `maxDist`. ONE explode for all distances, ONE
    * combinable aggregate collapses the instance stream; eagerly
    * materialized (every consumer — PMI marginals, TextRank edges —
    * re-reads it, and Catalyst does not share subtrees).
    */
  def pairCounts(df: DataFrame, textCol: String, maxDist: Int)
      : DataFrame = {
    require(maxDist >= 1)
    val toksExpr = filter(split(lower(col(textCol)), " "),
      t => length(t) > 0)
    val withT = graft.SparkUtil.ensureParallelism(df)
      .select(toksExpr.as("__t"))
    val parts = (1 to maxDist).map { d =>
      val len = greatest(size(col("__t")) - d, lit(0))
      zip_with(
        slice(col("__t"), lit(1), len),
        slice(col("__t"), lit(1 + d), len),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }
    withT.select(explode(concat(parts: _*)).as("g"))
      .select(col("g.w1"), col("g.w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
  }

  def pmiTopK(df: DataFrame, textCol: String, maxDist: Int = 3,
      minCount: Long = 5, topK: Int = 20): DataFrame = {
    require(topK >= 1)
    val c2 = pairCounts(df, textCol, maxDist)
    val m1 = c2.groupBy(col("w1")).agg(sum(col("c")).as("m1"))
    val m2 = c2.groupBy(col("w2")).agg(sum(col("c")).as("m2"))
    val n = c2.agg(sum(col("c"))).head().getLong(0)
    c2.filter(col("c") >= minCount)
      .join(m1, Seq("w1"))
      .join(m2, Seq("w2"))
      .select(col("w1"), col("w2"), col("c").as("n_pairs"),
        round(log((col("c") * lit(n)).cast("double") /
          (col("m1") * col("m2")).cast("double")) * 10000, 0)
          .cast("long").as("pmi_e4"))
      .orderBy(col("pmi_e4").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau) — PageRank over the
    * word co-occurrence graph: vertices are words, edges are unordered
    * pair types with count ≥ `minCount` at distance ≤ `maxDist`, and a
    * word's rank is its stationary centrality — corpus keywords without
    * any supervised signal. Pure composition: [[pairCounts]] builds the
    * graph, [[Ranking.pageRank]] iterates it in exact e9 integer
    * fixed-point (per iteration ONE edge⋈rank join + a combinable
    * integer sum; checkpointed lineage) — the whole computation is
    * count-table-sized after the single corpus pass.
    */
  def textRank(df: DataFrame, textCol: String, maxDist: Int = 3,
      minCount: Long = 5, iterations: Int = 3, topK: Int = 25)
      : DataFrame = {
    val c2 = pairCounts(df, textCol, maxDist)
    val edges = c2.filter(col("c") >= minCount && col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .distinct()
    Ranking.pageRank(edges, iterations)
      .select(col("id").as("word"), col("rank_e9"))
      .orderBy(col("rank_e9").desc, col("word"))
      .limit(topK)
  }
}
