package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction (ColBERT-style) multi-vector retrieval: a document
  * is a BAG of token/chunk vectors, and the query-document score is
  * MaxSim — Σ over query tokens of the max cosine against any document
  * token. Single-vector search (q21/q33) collapses a document to one
  * point and loses term-level matching; late interaction keeps it and
  * is the standard quality step above bi-encoder retrieval.
  *
  * Serving shape at 100 TB — the two-stage plan every production
  * late-interaction system runs, expressed declaratively:
  *   1. CANDIDATE GENERATION on the token-vector LSH index: each query
  *      token multiprobes its radius-1 buckets; one bucket-equality
  *      join (the corpus's only full scan) surfaces candidate docs. The
  *      probe set is (qdoc, bucket)-deduped and BROADCAST — a query
  *      batch is small by construction; the corpus never self-joins.
  *   2. EXACT MaxSim RESCORE restricted to candidates: candidate pairs
  *      and the query tokens broadcast against the corpus token table;
  *      per-(qdoc, ddoc, qtoken) max then per-(qdoc, ddoc) sum — both
  *      aggregates map-side combinable, so the shuffle carries one row
  *      per (query, candidate-doc, query-token), not per token pair.
  *
  * Scores are sums of ROUND-4 cosines lifted to e4 integers, so ranking
  * and ties are exact and a SQL oracle replays the whole search
  * bit-for-bit (q33's plane replay + q145's rounding discipline).
  */
object LateInteraction {

  /** Vector norm as the sqrt of the full-length [[graft.functions
    * .PrefixDots]] self-dot: the index-order fold the oracle's textual
    * norm form (`SQRT(SUM(val·val))` under ROUND-4) absorbs, in one
    * codegen'd loop instead of an interpreted HOF per row.
    */
  private def normCol(v: Column, dim: Int): Column =
    sqrt(element_at(graft.functions.PrefixDots(v, v, Seq(dim)), 1))

  /** Batch MaxSim top-k. `tokens`: corpus token vectors (docCol,
    * vecCol); `qTokens`: query token vectors (qDocCol, qTokCol,
    * qVecCol) — the small side, broadcast throughout. Returns per query
    * doc the top-`k` candidate docs by e4 MaxSim score with rank and
    * candidate-pool size (the recall/cost knob an operator watches).
    * `excludeSelf` drops ddoc == qdoc pairs for self-audits over one
    * corpus.
    */
  def search(tokens: DataFrame, docCol: String, vecCol: String,
      qTokens: DataFrame, qDocCol: String, qTokCol: String,
      qVecCol: String, lsh: Ann.RandomHyperplaneLsh, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val nBits = lsh.planes.length
    // Corpus token index: bucket once, reuse for both stages. A small
    // local parquet reads as ONE split and the per-pair HOF cosines
    // would serialize onto one core (the q145 lesson) — structural
    // no-op at scale where splits >= cores.
    val dim = lsh.planes.head.length
    // Norms ride the per-TOKEN rows (computed once per side), so the
    // per-pair rescore below is one codegen'd dot ladder + a division —
    // no interpreted HOF cosine re-deriving both norms per pair (the
    // q152 PrefixDots lesson).
    val corpus = graft.SparkUtil.ensureParallelism(
      lsh.index(tokens.select(col(docCol).as("ddoc"),
          col(vecCol).as("__vd")), "__vd")
        .withColumn("__nd", normCol(col("__vd"), dim)))
    val qIdx = lsh.index(qTokens.select(col(qDocCol).as("qdoc"),
        col(qTokCol).as("qtid"), col(qVecCol).as("__vq")), "__vq")
      .withColumn("__nq", normCol(col("__vq"), dim))
    // Radius-1 multiprobe per query token, deduped to (qdoc, bucket):
    // probes of one query are distinct buckets, so a corpus token meets
    // each query at most once per probe set.
    val probes = qIdx.select(col("qdoc"),
        explode(array((col("bucket") +: (0 until nBits).map(b =>
          col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
      .distinct()
    val collided = corpus.join(broadcast(probes), Seq("bucket"))
    val cand = (if (excludeSelf) collided.filter(col("ddoc") =!= col("qdoc"))
      else collided)
      .select(col("qdoc"), col("ddoc")).distinct()
    // Exact rescore over the candidates' FULL token bags (candidate
    // generation bounds WHICH docs are scored, never HOW — MaxSim on a
    // candidate is exact).
    val pairs = corpus.select(col("ddoc"), col("__vd"), col("__nd"))
      .join(broadcast(cand), Seq("ddoc"))
      .join(broadcast(qIdx.select(col("qdoc"), col("qtid"), col("__vq"),
        col("__nq"))), Seq("qdoc"))
      .select(col("qdoc"), col("ddoc"), col("qtid"),
        round(element_at(graft.functions.PrefixDots(col("__vd"),
            col("__vq"), Seq(dim)), 1) /
          (col("__nd") * col("__nq")), 4).as("__sim"))
    val sc = pairs
      .groupBy(col("qdoc"), col("ddoc"), col("qtid"))
      .agg(max(col("__sim")).as("__ms"))
      .groupBy(col("qdoc"), col("ddoc"))
      .agg(sum(round(col("__ms") * 10000).cast("long")).as("score_e4"))
    val w = Window.partitionBy("qdoc")
    sc.withColumn("n_cand", count(lit(1)).over(w))
      .withColumn("pos", row_number().over(
        w.orderBy(col("score_e4").desc, col("ddoc"))).cast("long"))
      .filter(col("pos") <= k)
      .select(col("qdoc"), col("ddoc"), col("pos"), col("score_e4"),
        col("n_cand"))
  }
}
