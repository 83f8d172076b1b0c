package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline queries over `documents` / `embeddings`
  * (SURVEY.md §2.9 q19–q22 + oracle-checkable dedup / text-analysis /
  * similarity extensions).
  *
  * These certify, in DuckDB-comparable form, the SQL-expressible halves of
  * the LLM-data operators: exact dedup, term statistics, token chunking,
  * cosine top-k, pairwise Jaccard, embedding near-dup. The non-SQL halves
  * (MinHash/LSH, SimHash, language-ID, fingerprints) live in
  * [[graft.operators]] with rows-only verification + unit tests.
  *
  * All array math stays inside codegen-friendly higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no Scala UDF in the hot path, so
  * whole-stage codegen spans the scoring expressions at 100 TB.
  */
object TrainingText {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Array<float> → array<double> (FP parity with the DuckDB oracle). */
  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  private def l2norm(v: org.apache.spark.sql.Column) =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (a, x) => a + x))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  // q19: exact deduplication counts — distinct text, distinct (lang, source).
  def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .agg(
        countDistinct(col("text")).as("n_text"),
        countDistinct(concat_ws("|", col("lang"), col("source"))).as("n_ls"))

  // q20: tokenize + term frequency, top-20 terms.
  def q20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(20)

  // q21: brute-force cosine top-5 vs the vec_id=0 query vector. The single
  // query row is broadcast — the scan side stays fully distributed (this is
  // exactly the 100 TB-shaped plan: broadcast tiny side, stream the big one).
  def q21(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (l2norm(col("v")) * l2norm(col("qv"))), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  // q90: metadata-filtered KNN — q21's exact cosine top-k restricted to
  // documents with lang = 'en' (the filtered-vector-search pattern:
  // predicate prunes BEFORE scoring, so the scan and the score loop only
  // touch qualifying vectors; same plan the store's searchFiltered uses).
  def q90(s: SparkSession, dir: String): DataFrame = {
    val enIds = t(s, dir, "documents").filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.join(enIds, Seq("vec_id"), "left_semi")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("v"), col("qv")) / (l2norm(col("v")) * l2norm(col("qv"))), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  // q22: fixed-size token chunking (16 tokens) — the SQL-expressible core of
  // the chunker C1; reassembly order pinned via sort_array over (pos, tok).
  def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("chunk_id", floor(col("pos") / 16).cast("int"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("chunk"))
      .orderBy(col("doc_id"), col("chunk_id"))

  // q23: per-document token statistics (token counting for pipelines).
  def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        col("n_chars"),
        round(length(col("text")).cast("double") / size(split(col("text"), " ")), 2)
          .as("avg_tok_len"))
      .orderBy(col("doc_id"))

  // q24: quality scoring — long-token ratio + lexical diversity, via
  // higher-order array functions (codegen'd, no UDF).
  def q24(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"),
        round(size(filter(toks, x => length(x) > 3)).cast("double") / size(toks), 4)
          .as("long_ratio"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("uniq_ratio"))
      .orderBy(col("doc_id"))
  }

  // q25: exact pairwise token-set Jaccard (restricted key range), top-20.
  // Shape: explode distinct tokens → self-equi-join on token → count
  // intersections → |A∪B| = |A|+|B|−|A∩B|. At 100 TB the same plan holds
  // with the token join salted / the MinHash-LSH variant pre-filtering pairs.
  def q25(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    val cnt = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = toks.as("x")
      .join(toks.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(cnt).as("ca"), col("a") === col("ca.doc_id"))
      .join(broadcast(cnt).as("cb"), col("b") === col("cb.doc_id"))
      .select(col("a"), col("b"),
        round(col("i") / (col("ca.n") + col("cb.n") - col("i")), 4).as("jac"))
      .orderBy(col("jac").desc, col("a"), col("b"))
      .limit(20)
  }

  // q26: embedding near-duplicate pairs — pairwise cosine over a restricted
  // key range, top-20 most-similar. Brute-force here; at scale, bucket by
  // operators.Ann.RandomHyperplaneLsh and compare within buckets only.
  def q26(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val a = e.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
      .orderBy(col("sim").desc, col("a"), col("b"))
      .limit(20)
  }

  // q56: TF-IDF top-3 terms per document (doc_id < 50; document frequency
  // over the FULL corpus). tf·ln((N+1)/(df+1)), rounded, ranked with a
  // term tiebreak — the standard relevance/quality scoring primitive. At
  // scale this is two map-side-combinable aggregates (tf, df) + one
  // broadcast-size join on term.
  def q56(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val n = d.count()
    val toks = d.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // Document frequency derives from tf itself — its (doc_id, term) rows
    // are already distinct, so a plain count per term IS the distinct doc
    // count. The corpus is exploded + aggregated exactly once; the two
    // consumers of `tf` share one identical aggregate subtree, which
    // Catalyst collapses via ReusedExchange (no checkpoint needed).
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("tfidf",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 4))
      .filter(col("doc_id") < 50)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rn"))
  }

  // q57: exact heavy hitters with bounded memory — pass 1: the native
  // Misra-Gries TypedImperativeAggregate (k=400 counters per partial
  // buffer, map-side combinable) yields a candidate SUPERSET of every term
  // with frequency ≥ n/200; pass 2: exact recount restricted (semi-join)
  // to the candidates. Output is EXACT — hash-matched against a plain
  // grouped count in DuckDB — while aggregation state never exceeds k
  // counters per task: the two-pass recipe that replaces a
  // full-vocabulary groupBy (state = |vocab|) at 100 TB.
  def q57(s: SparkSession, dir: String): DataFrame = {
    // Tokenize ONCE (materialized): three consumers — the total count,
    // the sketch pass and the recount join — would otherwise each re-run
    // scan + split + explode over the corpus, turning the advertised
    // two-pass recipe into four.
    val toks = t(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .localCheckpoint(true)
    val n = toks.count()
    val cand = toks
      .agg(graft.functions.MisraGries(col("term"), 400).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term").as("term"))
    toks.join(cand, Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= lit(n / 200.0))
      .coalesce(1)
      .orderBy(col("c").desc, col("term"))
  }

  /** BM25 scores (Okapi, k1=1.2, b=0.75) of every document against a
    * literal term set — the lexical ranking half of hybrid retrieval.
    * Shared by q75 (ranked list) and q76 (fusion input).
    *
    * Plan shape: for a LITERAL term set there is no reason to explode the
    * corpus into a token table — per-doc length and per-term tf are
    * `size(filter(split(text)))` expressions in one narrow projection
    * (5 longs per doc, checkpointed so the text is split once), followed
    * by one scalar stats pass (N, Σdl, per-term df) and a per-row score.
    * Zero wide shuffles; the same values the exploded formulation gave,
    * so the DuckDB oracle is unchanged.
    */
  private def bm25(s: SparkSession, dir: String,
      qTerms: Seq[String]): DataFrame = {
    val k1 = 1.2; val b = 0.75
    def toks = split(lower(col("text")), " ")
    val tfCols = qTerms.zipWithIndex.map { case (term, i) =>
      size(filter(toks, x => x === term)).cast("long").as(s"__tf$i") }
    val per = t(s, dir, "documents")
      .select(col("doc_id") +:
        size(filter(toks, x => length(x) > 0)).cast("long").as("dl") +:
        tfCols: _*)
      .localCheckpoint(true)
    val stats = per.agg(count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl") +:
        sum(when(col("dl") > 0, 1L).otherwise(0L)).as("n_dl") +:
        qTerms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
      .head()
    val n = stats.getLong(0)
    // avgdl averages docs WITH tokens (the oracle's lens CTE groups the
    // exploded token table, so token-free docs have no row there).
    // Integer-valued partials: exact in double regardless of partition
    // order, so sum/count here is bit-identical to AVG in both engines.
    val avgdl = stats.getLong(1).toDouble / stats.getLong(2)
    val parts = qTerms.indices.map { i =>
      val df = stats.getLong(3 + i)
      val idf = math.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5))
      when(col(s"__tf$i") > 0,
        lit(idf) * col(s"__tf$i") * lit(k1 + 1) /
          (col(s"__tf$i") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
        .otherwise(lit(0.0))
    }
    per.filter(qTerms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"), round(parts.reduce(_ + _), 4).as("bm25"))
  }

  // q75: BM25 lexical ranking (top 10) for a fixed query term set.
  def q75(s: SparkSession, dir: String): DataFrame =
    bm25(s, dir, Seq("table", "hash", "join"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)

  // q76: HYBRID retrieval — reciprocal rank fusion (k=60) of the dense
  // cosine ranking (top 20 for vec_id=0's vector, q21's exact tier) and
  // the BM25 lexical ranking (top 20 for the fixed terms). The standard
  // two-tower RAG retrieval merge, fully replayed by the oracle.
  def q76(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val dense = graft.operators.Ann.bruteForceKnn(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 20)
      .withColumn("rd", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("score").desc, col("vec_id"))))
      .select(col("vec_id").as("id"), col("rd"))
    // Both towers must exclude the query document (vec 0 / doc 0) — an
    // asymmetric exclusion would let it rank on one tower while its
    // dominant score on the other is suppressed.
    // TakeOrdered top-20 first, then rank the 20 survivors — the global
    // row_number window over every scoring doc was a single-partition
    // sort of the whole corpus' matches; the same (bm25 desc, doc_id)
    // total order makes the two formulations identical.
    val lex = bm25(s, dir, Seq("table", "hash", "join"))
      .filter(col("doc_id") =!= 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
      .withColumn("rl", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id").as("id"), col("rl"))
    dense.join(lex, Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("rd")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rl")), lit(0.0)), 6))
      .select(col("id"), col("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(10)
  }

  // q77: inverted-index build — term → (df, capped ascending posting
  // list) over the documents corpus; the materialized index behind q75.
  def q77(s: SparkSession, dir: String): DataFrame =
    graft.operators.Indexing.postings(t(s, dir, "documents"),
        "doc_id", "text", maxPostings = 5)
      .orderBy(col("term"))

  // q87: token-id encode/decode round trip — corpus-frequency vocab,
  // every doc encoded to its id array and decoded back; the md5 pair
  // certifies both directions byte-for-byte in both engines.
  def q87(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val enc = graft.operators.Indexing.encode(
      d, graft.operators.Indexing.vocab(d, "text"), "doc_id", "text")
    enc.join(d.select(col("doc_id"), md5(col("text")).as("__tmd5")),
        Seq("doc_id"))
      .select(col("doc_id"),
        size(col("ids")).cast("long").as("n_toks"),
        md5(array_join(transform(col("ids"), x => x.cast("string")), ","))
          .as("ids_md5"),
        (md5(array_join(col("toks"), " ")) === col("__tmd5"))
          .as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_tokenize_roundtrip" -> (q87 _),
    "q75_bm25" -> (q75 _),
    "q76_hybrid_rrf" -> (q76 _),
    "q77_inverted_index" -> (q77 _),
    "q19_dedup_exact" -> (q19 _),
    "q20_term_freq" -> (q20 _),
    "q21_cosine_topk" -> (q21 _),
    "q90_filtered_knn" -> (q90 _),
    "q22_chunk_tokens" -> (q22 _),
    "q23_token_stats" -> (q23 _),
    "q24_quality_score" -> (q24 _),
    "q25_jaccard_pairs" -> (q25 _),
    "q26_embed_neardup" -> (q26 _),
    "q56_tfidf" -> (q56 _),
    "q57_heavy_hitters" -> (q57 _)
  )

  private val bm25Sql: String =
    """toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |         FROM documents),
      |t2 AS (SELECT doc_id, term FROM toks WHERE LENGTH(term) > 0),
      |lens AS (SELECT doc_id, COUNT(*) AS dl FROM t2 GROUP BY 1),
      |stats AS (SELECT AVG(dl) AS avgdl FROM lens),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t2
      |       WHERE term IN ('table', 'hash', 'join') GROUP BY 1, 2),
      |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t2
      |        WHERE term IN ('table', 'hash', 'join') GROUP BY 1),
      |parts AS (SELECT tf.doc_id,
      |    LN(1.0 + (nn.n - dfq.df + 0.5) / (dfq.df + 0.5)) * tf.tf * 2.2
      |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * lens.dl / stats.avgdl)) AS part
      |  FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id)
      |  CROSS JOIN nn CROSS JOIN stats),
      |bm AS (SELECT doc_id, ROUND(SUM(part), 4) AS bm25 FROM parts
      |       GROUP BY doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q87_tokenize_roundtrip" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') t
        |              FROM documents),
        |idx AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        |        FROM toks),
        |p AS (SELECT doc_id, i AS pos, t[i] AS term FROM idx),
        |tf AS (SELECT term, COUNT(*) AS c FROM p GROUP BY term),
        |v AS (SELECT term, CAST(ROW_NUMBER() OVER
        |        (ORDER BY c DESC, term) - 1 AS INTEGER) AS id FROM tf),
        |e AS (SELECT p.doc_id, p.pos, COALESCE(v.id, -1) AS id, p.term
        |      FROM p LEFT JOIN v USING (term)),
        |g AS (SELECT doc_id, COUNT(*) AS n_toks,
        |        md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos))
        |          AS ids_md5,
        |        md5(string_agg(term, ' ' ORDER BY pos)) AS dec_md5
        |      FROM e GROUP BY doc_id)
        |SELECT g.doc_id, n_toks, ids_md5,
        |  (dec_md5 = md5(d.text)) AS roundtrip_ok
        |FROM g JOIN documents d USING (doc_id) ORDER BY g.doc_id""".stripMargin,
    "q77_inverted_index" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |pairs AS (SELECT DISTINCT doc_id, term FROM toks
        |          WHERE LENGTH(term) > 0),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM pairs GROUP BY term),
        |ranked AS (SELECT term, doc_id, ROW_NUMBER() OVER
        |    (PARTITION BY term ORDER BY doc_id) AS rn FROM pairs),
        |top AS (SELECT term, string_agg(CAST(doc_id AS VARCHAR), ','
        |          ORDER BY doc_id) AS postings
        |        FROM ranked WHERE rn <= 5 GROUP BY term)
        |SELECT term, df, postings FROM dfreq JOIN top USING (term)
        |ORDER BY term""".stripMargin,
    "q75_bm25" ->
      s"""WITH $bm25Sql
         |SELECT doc_id, bm25 FROM bm
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    "q76_hybrid_rrf" ->
      s"""WITH $bm25Sql,
         |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
         |vn AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM e GROUP BY vec_id),
         |qv AS (SELECT pos, val FROM e WHERE vec_id = 0),
         |dots AS (SELECT e.vec_id, SUM(e.val * qv.val) AS dot
         |         FROM e JOIN qv ON e.pos = qv.pos
         |         WHERE e.vec_id <> 0 GROUP BY e.vec_id),
         |scored AS (SELECT dots.vec_id,
         |    ROUND(dots.dot / (vn.nrm * (SELECT nrm FROM vn WHERE vec_id = 0)), 6)
         |      AS score
         |  FROM dots JOIN vn ON dots.vec_id = vn.vec_id),
         |dense AS (SELECT vec_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rd
         |  FROM scored QUALIFY rd <= 20),
         |lex AS (SELECT doc_id AS id,
         |    ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rl
         |  FROM bm WHERE doc_id <> 0 QUALIFY rl <= 20)
         |SELECT COALESCE(dense.id, lex.id) AS id,
         |  ROUND(COALESCE(1.0 / (60 + rd), 0) + COALESCE(1.0 / (60 + rl), 0), 6)
         |    AS rrf
         |FROM dense FULL OUTER JOIN lex ON dense.id = lex.id
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin,
    "q57_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |t2 AS (SELECT term FROM toks WHERE LENGTH(term) > 0),
        |n AS (SELECT COUNT(*) AS n FROM t2)
        |SELECT term, COUNT(*) AS c FROM t2 CROSS JOIN n
        |GROUP BY term, n.n HAVING COUNT(*) >= n.n / 200.0
        |ORDER BY c DESC, term""".stripMargin,
    "q56_tfidf" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |t2 AS (SELECT doc_id, term FROM toks WHERE LENGTH(term) > 0),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t2 GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |    ROUND(tf.tf * LN((n.n + 1.0) / (dfreq.df + 1.0)), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, term) AS rn
        |  FROM scored WHERE doc_id < 50)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rn, term, tfidf FROM ranked
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q19_dedup_exact" ->
      """SELECT COUNT(DISTINCT text) AS n_text,
        |  COUNT(DISTINCT lang || '|' || source) AS n_ls FROM documents""".stripMargin,
    "q20_term_freq" ->
      """SELECT term, COUNT(*) AS c FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY c DESC, term LIMIT 20""".stripMargin,
    "q90_filtered_knn" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
        |n AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM e GROUP BY vec_id),
        |q AS (SELECT pos, val FROM e WHERE vec_id = 0),
        |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        |d AS (SELECT e.vec_id, SUM(e.val * q.val) AS dot
        |      FROM e JOIN q ON e.pos = q.pos
        |      JOIN en ON en.doc_id = e.vec_id
        |      WHERE e.vec_id <> 0 GROUP BY e.vec_id)
        |SELECT d.vec_id,
        |  ROUND(d.dot / (n.nrm * (SELECT nrm FROM n WHERE vec_id = 0)), 4) AS sim
        |FROM d JOIN n ON d.vec_id = n.vec_id
        |ORDER BY sim DESC, d.vec_id LIMIT 5""".stripMargin,
    "q21_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
        |n AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM e GROUP BY vec_id),
        |q AS (SELECT pos, val FROM e WHERE vec_id = 0),
        |d AS (SELECT e.vec_id, SUM(e.val * q.val) AS dot
        |      FROM e JOIN q ON e.pos = q.pos WHERE e.vec_id <> 0 GROUP BY e.vec_id)
        |SELECT d.vec_id,
        |  ROUND(d.dot / (n.nrm * (SELECT nrm FROM n WHERE vec_id = 0)), 4) AS sim
        |FROM d JOIN n ON d.vec_id = n.vec_id
        |ORDER BY sim DESC, d.vec_id LIMIT 5""".stripMargin,
    "q22_chunk_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
        |    unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT doc_id, CAST(FLOOR(pos / 16) AS INTEGER) AS chunk_id,
        |  string_agg(tok, ' ' ORDER BY pos) AS chunk
        |FROM toks GROUP BY doc_id, CAST(FLOOR(pos / 16) AS INTEGER)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q23_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  n_chars,
        |  ROUND(CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')), 2)
        |    AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q24_quality_score" ->
      """SELECT doc_id,
        |  ROUND(CAST(len(list_filter(string_split(text, ' '),
        |    x -> LENGTH(x) > 3)) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS long_ratio,
        |  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS uniq_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q25_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 200),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
        |  FROM toks x JOIN toks y ON x.tok = y.tok AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, ROUND(i / (ca.n + cb.n - i), 4) AS jac
        |FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
        |ORDER BY jac DESC, a, b LIMIT 20""".stripMargin,
    "q26_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS val
        |  FROM embeddings WHERE vec_id < 100),
        |n AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM e GROUP BY vec_id),
        |d AS (SELECT x.vec_id AS a, y.vec_id AS b, SUM(x.val * y.val) AS dot
        |      FROM e x JOIN e y ON x.pos = y.pos AND x.vec_id < y.vec_id
        |      GROUP BY 1, 2)
        |SELECT a, b, ROUND(dot / (na.nrm * nb.nrm), 4) AS sim
        |FROM d JOIN n na ON na.vec_id = a JOIN n nb ON nb.vec_id = b
        |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin
  )
}
