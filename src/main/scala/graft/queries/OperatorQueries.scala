package graft.queries

import graft.Tables
import graft.functions.Embedding
import graft.operators.{Ann, SemanticChunker, TextAnalysis}
import graft.sources.DatabaseSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query entries exercising the non-SQL operator surface (q31–q35):
  * language ID, quality scoring, LSH ANN search, the semantic chunker, and
  * embed+KNN — the reference's own core loop (C1/E1/Q1) over the testdata.
  *
  * q32 has a full DuckDB oracle; the rest are deterministic but depend on
  * engine-side hashing/embedding that SQL cannot replay, so the driver
  * records rows-only checks (their exact semantics are unit-tested in
  * `src/test/scala/graft/operators/`).
  */
object OperatorQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // q31: language identification over documents (rows-only).
  def q31(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(s, dir), "text")
      .select(col("doc_id"), col("lang_pred"), col("lang_score"))
      .orderBy(col("doc_id"))

  // q32: quality scoring over documents (oracle-checked).
  def q32(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(s, dir), "text")
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("too_short"), col("low_diversity"))
      .orderBy(col("doc_id"))

  // q33: LSH ANN top-5 for the vec_id=0 query vector (rows-only; exact
  // counterpart is oracle-checked q21).
  def q33(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = q.length)
    lsh.search(lsh.index(emb.filter(col("vec_id") =!= 0), "embedding"),
      "vec_id", "embedding", q, k = 5, probes = 1)
  }

  // q34: semantic chunker over the documents corpus (rows-only): the
  // reference's C1 operator at query-surface level.
  def q34(s: SparkSession, dir: String): DataFrame = {
    val chunker = new SemanticChunker(maxTokens = 64)
    chunker.chunks(DatabaseSource.fromDocumentsTable(
        docs(s, dir).filter(col("doc_id") < 100)))
      .toDF()
      .select(col("documentid"), col("chunk_index"), length(col("content"))
        .as("content_len"), col("key"))
      .orderBy(col("documentid"), col("chunk_index"))
  }

  // q35: embed + brute-force KNN over document texts with the hashing
  // embedder (rows-only): E1+Q1 composed, all engine-side.
  def q35(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val provider = Embedding.default
    val embedded = docs(s, dir).select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, provider.embed(t)) })
      .toDF("doc_id", "emb")
    val q = provider.embed("fast hash join on the customer table")
    embedded.select(col("doc_id"),
        round(Ann.cosineCol(col("emb"), q), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_lang_id" -> (q31 _),
    "q32_quality" -> (q32 _),
    "q33_ann_lsh" -> (q33 _),
    "q34_chunker" -> (q34 _),
    "q35_embed_knn" -> (q35 _)
  )

  val oracle: Map[String, String] = Map(
    "q32_quality" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(text, '\s+') toks
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  ROUND((
        |    CAST(len(list_filter(toks, x -> LENGTH(x) > 3)) AS DOUBLE) / len(toks)
        |    + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |    + CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / LENGTH(text)) / 3.0, 4) AS quality,
        |  len(toks) < 10 AS too_short,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) < 0.3
        |    AS low_diversity
        |FROM t ORDER BY doc_id""".stripMargin
  )
}
