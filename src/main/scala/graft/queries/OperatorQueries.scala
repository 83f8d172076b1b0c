package graft.queries

import graft.Tables
import graft.functions.{Embedding, WordPieceTokenizer}
import graft.operators.{Ann, LateInteraction, SemanticChunker, TextAnalysis}
import graft.sources.DatabaseSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query entries exercising the non-SQL operator surface (q31–q35):
  * language ID, quality scoring, LSH ANN search, the semantic chunker, and
  * embed+KNN — the reference's own core loop (C1/E1/Q1) over the testdata.
  *
  * q31/q32/q33 have full DuckDB oracles (the language-ID vocabulary and the
  * deterministic LSH hyperplanes are generated INTO the SQL from the same
  * Scala constants the engine uses, the way q27 inlines its minhash
  * parameters). Since r10, q35/q49/q72 do too: the hashing embedder is
  * replayed feature-for-feature (FNV-1a in UBIGINT, float32 normalization
  * via REAL casts) and the IVF/PQ k-means fits are replayed level-for-level
  * as generated MATERIALIZED-CTE chains over the deterministic integer
  * fit. Only q34 remains rows-only here (the semantic chunker's float
  * cosine boundary decisions sit on thresholds SQL cannot hold bit-stable;
  * golden-manifest + property specs gate it instead).
  */
object OperatorQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Embedding-dim guard, memoized per (session, dir) — r22. The
    * embeddings table is immutable within a session (`Tables.load`
    * memoizes the frame on the same reasoning), so the assertion needs
    * ONE 1-row scan per session+dir, not a scheduled job on every
    * query invocation and bench rep. Weak on the session so a stopped
    * SparkSession stays collectable. Only the guard-only sites use
    * this; queries that fetch a query VECTOR anyway keep asserting on
    * the fetched array for free.
    */
  private val dimChecked = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())
  private def requireEmbeddingDim(s: SparkSession, dir: String,
      emb: DataFrame, who: String): Unit = {
    val seen = dimChecked.computeIfAbsent(s, _ =>
      java.util.Collections.synchronizedSet(
        new java.util.HashSet[String]()))
    if (!seen.contains(dir)) {
      val d = emb.select("embedding").head().getSeq[Float](0).length
      require(d == EmbeddingDim,
        s"$who oracle is generated for dim=$EmbeddingDim, testdata has $d")
      seen.add(dir)
    }
  }

  // q31: language identification over documents (oracle-checked).
  def q31(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(s, dir), "text")
      .select(col("doc_id"), col("lang_pred"), col("lang_score"))
      .orderBy(col("doc_id"))

  // q169: language-id CONFUSION matrix — q31's predictions against the
  // labeled lang column, with per-label row shares (recall on the
  // diagonal); the window total runs on the matrix-sized aggregate.
  def q169(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(docs(s, dir), "text")
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_share_e4",
        expr("CAST(n * 10000 div sum(n) over (partition by lang) " +
          "AS BIGINT)"))
      .orderBy(col("lang"), col("lang_pred"))

  // q32: quality scoring over documents (oracle-checked).
  def q32(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(s, dir), "text")
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("too_short"), col("low_diversity"))
      .orderBy(col("doc_id"))

  // q33: LSH ANN top-5 for the vec_id=0 query vector (oracle-checked: the
  // DuckDB side replays bucket assignment + multiprobe pruning with the
  // same deterministic hyperplanes; exact counterpart is q21).
  def q33(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    // The DuckDB oracle inlines hyperplanes for exactly EmbeddingDim
    // positions; a testdata dim change must fail loudly, not silently
    // drift via a truncated pos-join.
    require(q.length == EmbeddingDim,
      s"q33 oracle is generated for dim=$EmbeddingDim, testdata has ${q.length}")
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = q.length)
    lsh.search(lsh.index(emb.filter(col("vec_id") =!= 0), "embedding"),
      "vec_id", "embedding", q, k = 5, probes = 1)
  }

  // q189: margin-ordered MULTI-PROBE LSH (Lv et al., VLDB'07) — q33's
  // recall knob done properly: instead of the uniform radius-1 Hamming
  // ball (9 buckets), probe exactly t=6 buckets chosen by the query's
  // OWN hyperplane margins (base + the 5 cheapest single/pair flips at
  // e6 integer ranking). One LSH table serving tunable recall without
  // multiplying tables or probing blind — the scan-budget shape a
  // serving ANN runs at 100 TB. The oracle replays margins → probing
  // sequence → prune → exact rescore bit-for-bit.
  def q189(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    require(q.length == EmbeddingDim,
      s"q189 oracle is generated for dim=$EmbeddingDim, testdata has ${q.length}")
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = q.length)
    lsh.searchMultiProbe(
      lsh.index(emb.filter(col("vec_id") =!= 0), "embedding"),
      "vec_id", "embedding", q, k = 5, t = 6)
  }

  // q49: IVF (k-means coarse quantizer) ANN top-5 for the vec_id=0 query.
  // Fully oracle-checked (r10): the fit is the deterministic integer
  // k-means (md5-ordered sample, farthest-point seeding, fixed Lloyd
  // rounds — [[Ann.Ivf.deterministicKmeans]]), so [[q49OracleSql]]
  // replays the ENTIRE build in SQL, fit included. Recall/pruning
  // structure stays spec-gated in AnnSpec/AnnRecallSpec. Exact
  // counterpart is q21; the LSH tier counterpart is q33.
  def q49(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val corpus = emb.filter(col("vec_id") =!= 0)
    val ivf = Ann.Ivf.fit(corpus, "vec_id", "embedding", kCentroids = 8)
    ivf.search(ivf.index(corpus, "embedding"), "vec_id", "embedding", q,
      k = 5, nprobe = 2)
  }

  // q50: embedding near-dup PAIRS via LSH bucketing (oracle-checked): the
  // scale path behind q26's range-restricted brute force — bucket join,
  // never all-pairs, salted (saltBlocks=2) so the oracle hash-match also
  // certifies the blocked self-join is pair-exact on a second operator.
  // minSim=0.2 because the synthetic embeddings are near-random (real
  // near-dup corpora use ≥0.9); the plumbing is threshold-independent.
  def q50(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Ann.nearDupPairs(emb, "vec_id", "embedding", dim = EmbeddingDim,
        nBits = 8, minSim = 0.2, saltBlocks = 2)
      .orderBy(col("a"), col("b"))
  }

  // q61: corpus text normalization (oracle-checked): lowercase, tag strip,
  // digit fold, whitespace collapse — the standard pre-dedup clean, with
  // an md5 fingerprint so the oracle certifies every character.
  def q61(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.normalize(docs(s, dir), "text")
      .select(col("doc_id"),
        length(col("norm_text")).as("norm_len"),
        md5(col("norm_text")).as("norm_md5"))
      .orderBy(col("doc_id"))

  // q34: semantic chunker over the documents corpus — FULLY oracle-
  // replayed (r10): 12-word window segmentation, per-segment hashing-
  // embedder features, EXACT integer-space boundary cosines
  // (HashingEmbedder.neighborSims — no float32 normalization ulps), the
  // 25th-percentile tau, and the sequential semantic/token-cut assembly
  // loop replayed as a DuckDB recursive CTE. Content md5 certifies the
  // exact reassembled chunk text. (The chunkKey UUID is not emitted:
  // DuckDB has no sha1; key determinism is pinned by the store
  // idempotence specs.)
  def q34(s: SparkSession, dir: String): DataFrame = {
    val chunker = new SemanticChunker(maxTokens = 64)
    chunker.chunks(DatabaseSource.fromDocumentsTableWindows(
        docs(s, dir).filter(col("doc_id") < 100)))
      .toDF()
      .select(col("documentid"), col("chunk_index"), length(col("content"))
        .as("content_len"), md5(col("content")).as("content_md5"))
      .orderBy(col("documentid"), col("chunk_index"))
  }

  // q253: C1 under the REAL WordPiece tokenizer (r18 verdict item 5) —
  // the SAME chunker pipeline as q34, but the token budget counts
  // greedy longest-match-first WordPiece pieces over the committed
  // frozen vocab (`src/main/resources/wordpiece_vocab.txt`, the fixture
  // WordPieceChunkerSpec hand-derives counts for). The embedder (and so
  // the semantic boundaries + tau) is unchanged; only the token-cut arm
  // of the assembly loop moves, so a wrong WordPiece count shifts chunk
  // boundaries and fails the content md5s. Oracle: the q34 replay with
  // the count CTEs swapped for a recursive greedy-match over a VALUES
  // render of the SAME vocab resource.
  def q253(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val wp = WordPieceTokenizer.fromResource("wordpiece_vocab.txt")
    // maxTokens = 48 (not q34's 64) so the cut pattern is decorrelated
    // from the regex-token run; chunk_tokens re-counts each assembled
    // chunk with the SAME tokenizer (content = segments joined by \n, and
    // the pre-tokenizer never merges across whitespace, so the count
    // equals the per-segment sum the oracle replays) — the gate certifies
    // every WordPiece count directly, not only via boundary coincidence.
    val chunker = new SemanticChunker(tokenizer = wp, maxTokens = 48)
    chunker.chunks(DatabaseSource.fromDocumentsTableWindows(
        docs(s, dir).filter(col("doc_id") < 100)))
      .map(c => (c.documentid, c.chunk_index, c.content,
        wp.countTokens(c.content).toLong))
      .toDF("documentid", "chunk_index", "content", "chunk_tokens")
      .select(col("documentid"), col("chunk_index"), length(col("content"))
        .as("content_len"), md5(col("content")).as("content_md5"),
        col("chunk_tokens"))
      .orderBy(col("documentid"), col("chunk_index"))
  }

  // q35: embed + brute-force KNN over document texts with the hashing
  // embedder: E1+Q1 composed, all engine-side. Fully oracle-checked
  // (r10): the DuckDB side replays the embedder exactly — tokenize
  // (regex + 8-char wordpiece split), FNV-1a per feature in UBIGINT
  // with HUGEINT mod-2^64 multiply, signed bucket sums in integer space
  // (weights ×2, so the float accumulation is provably exact), float32
  // L2 normalization via REAL casts (DuckDB REAL arithmetic IS IEEE
  // float32), and the cosine in doubles. The query vector and its
  // self-norm are generated from the LIVE embedder at dump time.
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

  // q72: product-quantization ANN top-5. Fully oracle-checked (r10):
  // the per-subspace codebooks come from the same deterministic integer
  // k-means as q49, so [[q72OracleSql]] replays fit, code assignment,
  // integer ADC ranking and the exact re-score end to end; ADC/exact
  // rank agreement and planted-near-dup recall stay spec-gated in
  // PqSpec. The billion-vector tier: 32x-compressed codes ADC-ranked,
  // floats read only for the re-scored pool.
  def q72(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val corpus = emb.filter(col("vec_id") =!= 0)
    val pq = graft.operators.Pq.fit(corpus, "vec_id", "embedding", dim = EmbeddingDim,
      m = 8, kSub = 16)
    pq.search(pq.index(corpus, "embedding"), "vec_id", "embedding", q,
      k = 5, pool = 50)
  }

  // q128: SQ8 (int8 scalar quantization) ANN top-5 — the 4×-compression
  // no-codebook tier between brute force (q21) and PQ (q72). Fit =
  // one per-dimension min/max pass on the corpus; search ranks by
  // exact-query × dequantized-corpus integer L2, re-scores the pool
  // exactly in e6. All-integer, so the oracle replays every step.
  // PRODUCTION SHAPE (r13): the query certifies the STORED-CODE index
  // path — Sq.index materializes the int8 codes to parquet (the table
  // a real store writes once), and searchIndexed ranks on the
  // 4×-smaller code column read BACK from storage; the float column is
  // read only for the ≤ pool re-scored rows. The index build is inside
  // the timed query (floats read once, at index time).
  def q128(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val corpus = emb.filter(col("vec_id") =!= 0)
    val m = graft.operators.Sq.fit(corpus, "embedding", EmbeddingDim)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-sq8-idx").resolve("t").toString
    graft.operators.Sq.index(corpus, "embedding", m)
      .write.mode("overwrite").parquet(idxPath)
    graft.operators.Sq.searchIndexed(s.read.parquet(idxPath), "vec_id",
      "embedding", "sq_code", m, q, k = 5, pool = 50)
  }

  // q136: the SAME LSH ANN search as q33, but never calling the index's
  // search() — the query is written as the DECLARATIVE exact top-k
  // (score-sort + limit over the indexed relation) and the
  // [[graft.plans.AnnTopKRewrite]] optimizer rule injects the
  // bucket-probe prune, the sqlite-vec analogue of querying through the
  // index transparently. The rewrite is certified structurally (the
  // optimized plan must carry the In/InSet bucket prune — a silent
  // fall-through to the full scan would change the candidate pool and
  // fail the oracle, but fail loudly here instead) and the bounded
  // (k-row) result is returned as a local relation so the rewrite flag
  // never leaks outside this query's construction.
  def q136(s: SparkSession, dir: String): DataFrame =
    annRewriteQuery(s, dir, filtered = false)

  // q142: the FILTERED-KNN shape through the same optimizer rule — a
  // metadata predicate (`vec_id % 3 = 1`, the q90 `searchFiltered`
  // pattern; reference `VectorStoreCommands.cs:113` has no filter
  // surface, production stores need one) sits between the declarative
  // top-k and the indexed relation. The rewrite must COMPOSE with the
  // predicate, not replace it: the certified optimized plan carries
  // BOTH the In/InSet bucket prune and the user predicate, and the
  // oracle replays bucket-probe ∩ predicate before the exact re-score.
  def q142(s: SparkSession, dir: String): DataFrame =
    annRewriteQuery(s, dir, filtered = true)

  private def annRewriteQuery(s: SparkSession, dir: String,
      filtered: Boolean): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{In, InSet, Pmod}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    require(q.length == EmbeddingDim,
      s"q136/q142 oracle is generated for dim=$EmbeddingDim, testdata has ${q.length}")
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = q.length)
    val indexed0 = lsh.index(emb.filter(col("vec_id") =!= 0), "embedding")
    val indexed =
      if (filtered) indexed0.filter(pmod(col("vec_id"), lit(3L)) === 1L)
      else indexed0
    // `bucket` must survive projection (as in a pre-indexed stored
    // table): column pruning would otherwise remove the index column
    // before the rule sees it, leaving nothing to prune on. It is
    // dropped from the final (local) result below.
    val topk = indexed
      .select(col("vec_id"), col("bucket"),
        round(graft.functions.CosineSimilarity(col("embedding"),
          typedlit(q)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(5)
    // Verify/Bench sessions are plain (no GraftExtensions); install the
    // rule via the experimental hook when absent. cosine_sim in the
    // function registry is the extensions-installed marker.
    val viaExtensions = s.sessionState.functionRegistry.functionExists(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"))
    // Capture BOTH pieces of session state this query touches — the
    // flag and the experimental rule list — and restore both in the
    // finally: leaving the (flag-gated, inert) rule installed in the
    // shared session would still be a state leak into later queries.
    val prevRules = s.experimental.extraOptimizations
    if (!viaExtensions &&
        !prevRules.contains(graft.plans.AnnTopKRewrite))
      s.experimental.extraOptimizations =
        prevRules :+ graft.plans.AnnTopKRewrite
    val flag = "spark.graft.ann.autoRewrite"
    val prev = s.conf.getOption(flag)
    s.conf.set(flag, "true")
    try {
      // After projection collapse the prune wraps the bucket
      // EXPRESSION (not a column named bucket), so detect any In/InSet
      // filter — the only membership predicate in this plan is the
      // rule's probe prune.
      val opt = topk.queryExecution.optimizedPlan
      val pruned = opt.collect {
        case f: Filter => f.condition.exists {
          case _: In | _: InSet => true
          case _ => false
        }
      }.exists(identity)
      require(pruned,
        "AnnTopKRewrite did not fire: no bucket prune in the optimized plan")
      if (filtered) {
        // The rewrite must not have REPLACED the user predicate with
        // the probe prune: the modulo filter must survive in the same
        // optimized plan (composed — possibly as a separate Filter or
        // merged into one conjunction).
        val predKept = opt.collect {
          case f: Filter => f.condition.exists {
            case _: Pmod => true
            case _ => false
          }
        }.exists(identity)
        require(predKept,
          "filtered-KNN rewrite dropped the user predicate from the plan")
      }
      // Executes the rewritten (bucket-pruned) plan: collect is bounded
      // at k rows by construction. The bucket index column is dropped
      // from the emitted result (the oracle replays vec_id + score).
      val rows = topk.collect().map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(2)))
      s.createDataFrame(java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(
          Seq(topk.schema("vec_id"), topk.schema("score"))))
    } finally {
      prev match {
        case Some(v) => s.conf.set(flag, v)
        case None => s.conf.unset(flag)
      }
      s.experimental.extraOptimizations = prevRules
    }
  }

  // q138: IVF-SQ composed ANN — coarse k-means probe pruning (q49's
  // replayable deterministic fit) + SQ8-quantized RESIDUALS (v −
  // centroid), the FAISS IVF…,SQ8 billion-vector default: the centroid
  // absorbs cluster location so the residual spans a tighter range than
  // raw SQ8 (q128) at the same byte budget. All-integer e6 arithmetic;
  // the oracle replays BOTH fits (kmeans chain + residual bounds) and
  // the probe-pruned quantized ranking + exact re-score end to end.
  def q138(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    require(q.length == EmbeddingDim,
      s"q138 oracle is generated for dim=$EmbeddingDim, testdata has ${q.length}")
    val corpus = emb.filter(col("vec_id") =!= 0)
    val m = graft.operators.IvfSq.fit(corpus, "vec_id", "embedding",
      kCentroids = 8, dim = EmbeddingDim)
    // PRODUCTION SHAPE (r13): materialize (cid, residual codes) to
    // parquet PARTITIONED BY the coarse cell — the inverted-list layout
    // — and search the stored table: the nprobe filter becomes parquet
    // partition PRUNING (only the probed cells' files are opened), the
    // ranking scan reads int8 codes, and floats are read only for the
    // ≤ pool re-scored rows. Index build inside the timed query.
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-ivfsq-idx").resolve("t").toString
    graft.operators.IvfSq.index(corpus, "embedding", m)
      .write.partitionBy("ivf_cid").mode("overwrite").parquet(idxPath)
    graft.operators.IvfSq.searchIndexed(s.read.parquet(idxPath), "vec_id",
      "embedding", "ivf_cid", "sq_code", m, q, k = 5, nprobe = 2,
      pool = 50)
  }

  /** ROUND-4 cosine of two float-array columns in q21's textual form
    * (`dot / (nrm·nrm)`, doubles) — the 4-dp rounding absorbs the
    * summation-order noise between Spark's index-order fold and the
    * oracle's unordered SUM.
    */
  private def simR4(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val asD = (c: org.apache.spark.sql.Column) =>
      transform(c, x => x.cast("double"))
    val nrm = (c: org.apache.spark.sql.Column) =>
      sqrt(aggregate(transform(asD(c), x => x * x), lit(0.0),
        (acc, x) => acc + x))
    val dot = aggregate(zip_with(asD(a), asD(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    round(dot / (nrm(a) * nrm(b)), 4)
  }

  /** q143 decontamination threshold on the ROUND-4 cosine. The synthetic
    * embeddings are near-random (real eval-contamination runs use ≥0.9);
    * 0.2 keeps the report non-degenerate at every SF — the plumbing is
    * threshold-independent (q50's convention).
    */
  private val DecontamTau = 0.2

  // q143: SEMANTIC decontamination — the embedding-space member of the
  // decontamination trio (exact n-gram q64, Bloom-probe q78): flag every
  // TRAIN document whose embedding is close to ANY eval-benchmark
  // document, via the LSH bucket index — never the train × eval cross
  // product. The EVAL side is the small one by construction (a benchmark
  // suite vs a 100 TB corpus), so its radius-1 multiprobe expansion
  // (bucket + the 8 Hamming-1 neighbors — each (train, eval) pair can
  // meet in at most ONE probe bucket, so the candidate set needs no
  // dedup) broadcasts, and the corpus-sized train side streams through
  // one codegen'd bucket-equality join: per train partition the work is
  // |partition| × (eval docs sharing a bucket), the same bounded-bucket
  // argument as q50. Report: per flagged train doc, how many eval docs
  // it collides with, the max ROUND-4 cosine, and the best-matching eval
  // id (ties → min id) — one window pass, no second join over the
  // scored stream.
  def q143(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    requireEmbeddingDim(s, dir, emb, "q143")
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = EmbeddingDim)
    val indexed = lsh.index(emb, "embedding")
    val evalSide = indexed.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ve"),
        col("bucket"))
    val probes = evalSide.select(col("eval_id"), col("ve"),
      explode(array((col("bucket") +: (0 until 8).map(b =>
        col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
    // Stream side of the broadcast bucket join — raise the single local
    // parquet split to session parallelism so the per-candidate simR4
    // work spreads across cores (same rationale as q145's corpus).
    val train = graft.SparkUtil.ensureParallelism(
      indexed.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("train_id"), col("embedding").as("vt"),
          col("bucket")))
    val scored = train.join(broadcast(probes), Seq("bucket"))
      .select(col("train_id"), col("eval_id"),
        simR4(col("vt"), col("ve")).as("sim"))
      .filter(col("sim") >= DecontamTau)
    // One map-side-combinable aggregate instead of a row_number +
    // count window pair (r22, guide §2.3): the window sorted the whole
    // scored stream per train_id to keep one row; max_by with the
    // (sim, −eval_id) ordering struct picks the identical (sim DESC,
    // eval_id ASC) winner — eval_id is unique within a group, so the
    // ordering value is unique and max_by is deterministic — and the
    // hit count rides in the same aggregate.
    scored.groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_hits"),
        max_by(struct(col("sim").as("max_sim"),
            col("eval_id").as("best_eval")),
          struct(col("sim"), (-col("eval_id")).as("nid"))).as("__b"))
      .select(col("train_id"), col("n_hits"),
        col("__b.max_sim").as("max_sim"),
        col("__b.best_eval").as("best_eval"))
      .orderBy(col("train_id"))
  }

  /** nDCG@10 position weights w_i = round(1e6 / log2(i+1)) — computed
    * ONCE here and inlined as INTEGER literals into both the Spark plan
    * and the DuckDB oracle, so no cross-engine float log ever meets the
    * comparison. IDCG@10 is their sum (all ten positions relevant).
    */
  private val NdcgW: Seq[Long] =
    (1 to 10).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
  private val IdcgE6: Long = NdcgW.sum

  // q145: ANN RANKING-quality audit — q141 measures the LSH candidate
  // set (recall/precision of a boolean "is a candidate" prediction);
  // this measures what a search user actually receives: for each audit
  // query vector (vec_id % 25 = 0 — the bounded-slice ground-truth
  // discipline, exact top-10 needs an O(|Q|·n) scan so |Q| is the knob),
  // the radius-1 LSH top-10 is scored against the exact cosine top-10
  // with recall@10 and position-discounted nDCG@10. All ranking on the
  // shared ROUND-4 cosine with (sim desc, vec_id) tie-breaks; the DCG
  // discount weights are pre-rounded integer literals, so the report is
  // exact-integer end to end. Per query: candidate-pool size, hits,
  // recall@10 (e4), nDCG@10 (e6) — the measured curve an operator reads
  // before choosing nBits/probe radius for a 100 TB index (BASELINE.md
  // MinHash/LSH tuning note's vector-search sibling). Queries whose
  // probe buckets hold no other vector drop out (no row) in both
  // engines. Corpus cost: ONE bucket-equality join (the search shape
  // itself); the exact pass is audit-only.
  def q145(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    requireEmbeddingDim(s, dir, emb, "q145")
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = EmbeddingDim)
    val indexed = lsh.index(emb, "embedding")
    val qs = indexed.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("vq"),
        col("bucket"))
    // The corpus is the STREAM side of both broadcast joins below, and
    // the interpreted per-pair simR4 work rides on its partitioning — a
    // row-group-sparse local parquet yields ONE split, serializing the
    // whole audit onto one core (measured: a single 2.4–3 s task at
    // sf0.1). Structural no-op at production scale where splits ≫ cores.
    val corpus = graft.SparkUtil.ensureParallelism(indexed
      .select(col("vec_id"), col("embedding"), col("bucket")))
    // Both top-10 ranks through the bounded SampleK aggregate (r22,
    // guide §2.3 — the q111/q152 discipline): the former plan ranked
    // the |corpus|×|Q| exact stream AND the candidate stream through
    // row_number windows (full exchange+sort of ~4M rows at sf0.1 for
    // 10 survivors per query). The fixed-width key (10000 − sim_e4,
    // vec_id) replays the exact (sim DESC, vec_id ASC) order — simR4
    // is already rounded to 4 dp, so sim_e4 = round(sim·10⁴) is the
    // same total order and vec_id uniqueness makes it deterministic;
    // posexplode of the sorted result array recovers the rank, and the
    // candidate census rides in the same aggregate as n_cand.
    def simKey(v: org.apache.spark.sql.Column) = format_string(
      "%05d:%010d",
      lit(10000L) - round(simR4(col("embedding"), v) * 10000).cast("long"),
      col("vec_id"))
    // Ground truth: exact top-10 per audit query (broadcast the tiny
    // query side, stream the corpus — q21's plan shape, fanned out).
    val ex10 = corpus.crossJoin(broadcast(qs.select(col("qid"), col("vq"))))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"))
      .agg(graft.functions.SampleK(simKey(col("vq")), col("vec_id"), 10)
        .as("__t"))
      .select(col("qid"), posexplode(col("__t")))
      .select(col("qid"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("int").as("erank"))
    // The search under audit: radius-1 multiprobe bucket join (q143's
    // probe expansion), ranked by the same rounded cosine.
    val probes = qs.select(col("qid"), col("vq"),
      explode(array((col("bucket") +: (0 until 8).map(b =>
        col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
    val ranked = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_cand"),
        graft.functions.SampleK(simKey(col("vq")), col("vec_id"), 10)
          .as("__t"))
      .select(col("qid"), col("n_cand"), posexplode(col("__t")))
      .select(col("qid"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("int").as("pos"), col("n_cand"))
    val wArr = array(NdcgW.map(lit): _*)
    ranked.join(ex10, Seq("qid", "vec_id"), "left")
      .withColumn("hit", when(col("erank").isNotNull, 1L).otherwise(0L))
      .withColumn("g", when(col("erank").isNotNull,
        element_at(wArr, col("pos"))).otherwise(0L))
      .groupBy(col("qid"))
      .agg(max(col("n_cand")).as("n_cand"),
        sum(col("hit")).as("hits"),
        (sum(col("hit")) * 1000).as("recall10_e4"),
        expr(s"CAST(sum(g) * 1000000 div $IdcgE6 AS BIGINT)").as("ndcg_e6"))
      .orderBy(col("qid"))
  }

  // q149: late-interaction (ColBERT-style) MaxSim retrieval — the
  // multi-vector member of the search ladder. Documents are token BAGS
  // (5 consecutive embeddings per ddoc = vec_id div 5); every 20th doc
  // is a query. Score(q, d) = Σ over q-tokens of max cosine against any
  // d-token — term-level matching the single-vector tier (q21/q33)
  // collapses away. Two-stage serving shape: LSH radius-1 candidate
  // generation on the token index (ONE bucket-equality corpus join,
  // probes broadcast), then exact MaxSim restricted to candidates with
  // map-side-combinable max→sum aggregates. e4 integer scores; the
  // oracle replays planes, probes, candidates and the rescore
  // bit-for-bit. Per query: top-5 docs with rank and candidate-pool
  // size (the recall/cost curve's x-axis).
  def q149(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    requireEmbeddingDim(s, dir, emb, "q149")
    val toks = emb.select(expr("vec_id div 5").as("ddoc"),
      col("vec_id"), col("embedding"))
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = EmbeddingDim)
    LateInteraction.search(
        toks, "ddoc", "embedding",
        toks.filter(col("ddoc") % 20 === 0)
          .select(col("ddoc").as("qd"), col("vec_id"), col("embedding")),
        "qd", "vec_id", "embedding", lsh, k = 5, excludeSelf = true)
      .orderBy(col("qdoc"), col("pos"))
  }

  // q151: IVF centroid REFRESH — the maintenance op q146's staleness
  // audit decides to run: instead of a full re-train, the coarse
  // quantizer's centroids are refreshed from MERGEABLE sufficient
  // statistics (per-list count + per-dimension e6 component sums —
  // exactly the state an incremental index maintains per arrival
  // batch). The engine computes the base snapshot's stats and the
  // delta batch's stats SEPARATELY under the frozen q49 fit and merges
  // them algebraically (full-outer join, sums add); the oracle computes
  // the same stats in ONE full-corpus pass — the hash match is the
  // merge==recompute certificate (q139's discipline applied to index
  // state). The refreshed centroid is the truncating-division integer
  // mean (empty lists keep their centroid), so everything downstream —
  // displacement, centroid checksum, assignment churn under the
  // refreshed cells (one scan, two codegen'd argmins) — is exact
  // integer algebra. Scale shape: stats are k×dim-sized
  // map-side-combinable aggregates; only k×dim longs ever reach the
  // driver (the legitimate index-metadata state), and the churn pass
  // is the zero-shuffle q96 argmin shape.
  def q151(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 8
    val emb = Tables.load(s, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val ivf = Ann.Ivf.fit(base, "vec_id", "embedding", kCentroids = k,
      sampleCap = 4096, rounds = 3)
    def stats(df: DataFrame) = df
      .select(ivf.assignCol(col("embedding")).as("cid"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1e6).cast("long")))
          .as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val merged = stats(base)
      .select(col("cid"), col("pos"), col("s").as("sb"), col("n").as("nb"))
      .join(stats(delta)
        .select(col("cid"), col("pos"), col("s").as("sd"),
          col("n").as("nd")),
        Seq("cid", "pos"), "full_outer")
      .select(col("cid"), col("pos"),
        (coalesce(col("sb"), lit(0L)) + coalesce(col("sd"), lit(0L)))
          .as("s"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nd"), lit(0L)).as("nd"))
      .collect()
    val old = ivf.centroidsE6
    val dim = old(0).length
    val sums = Array.fill(k)(Array.ofDim[Long](dim))
    val nBase = Array.ofDim[Long](k)
    val nDelta = Array.ofDim[Long](k)
    merged.foreach { r =>
      val (cid, pos) = (r.getInt(0), r.getInt(1))
      sums(cid)(pos) = r.getLong(2)
      if (pos == 0) { nBase(cid) = r.getLong(3); nDelta(cid) = r.getLong(4) }
    }
    val newCents = Array.tabulate(k) { c =>
      val n = nBase(c) + nDelta(c)
      if (n > 0) sums(c).map(_ / n) else old(c)
    }
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s0 = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s0 += d * d; i += 1 }
      s0
    }
    val churn = emb
      .select(ivf.assignCol(col("embedding")).as("oldc"),
        new Ann.Ivf(newCents).assignCol(col("embedding")).as("newc"))
      .filter(col("oldc") =!= col("newc"))
      .groupBy(col("newc")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until k).map { c =>
      (c, nBase(c), nDelta(c), d2(old(c), newCents(c)), newCents(c).sum,
        churn.getOrElse(c, 0L))
    }.toDF("cid", "n_base", "n_delta", "disp_e12", "csum_e6", "churn_in")
      .orderBy(col("cid"))
  }

  /** q152's truncation ladder: prefix lengths whose recall curve the
    * audit measures (64 = full dim, the self-certifying anchor row).
    */
  private val TruncDims: Seq[Int] = Seq(8, 16, 32, 64)

  // q152: dimension-TRUNCATION audit (matryoshka retrieval) — the
  // storage/recall curve an operator measures before committing a
  // 100 TB index to truncated vectors (a 64→16 cut is 4× less memory
  // bandwidth per scan, IF recall holds; q93's JL projection is the
  // rotate-then-cut sibling, this measures the plain prefix cut those
  // embedding families are trained for). Per (prefix length d, audit
  // query qid — vec_id % 25 = 0, q145's bounded-slice ground-truth
  // discipline): the top-10 by ROUND-4 cosine in the d-prefix space vs
  // the full-dim exact top-10, as hits and recall@10 (e4), plus the
  // per-d mean recall (e4, integer div) — the curve's y-axis. The d=64
  // rows are the harness's own certificate (recall exactly 1.0). One
  // corpus×queries broadcast join computes all four prefix cosines per
  // pair map-side (explode of 4 structs); the window ranks are
  // (d, qid)-partitioned.
  def q152(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    requireEmbeddingDim(s, dir, emb, "q152")
    // Prefix norms are per-VECTOR, not per-pair: computed once on each
    // side of the join (sqrt of the prefix self-dots, same index-order
    // fold as simR4's norm). The pair stage then runs ONE codegen'd
    // prefix-dot ladder per pair — 64 multiply-adds emitting all four
    // dots — instead of 4 interpreted HOF cosines re-deriving both
    // norms (measured 5.1 s → the PrefixDots plan at sf0.1).
    val pnorms = (v: org.apache.spark.sql.Column) =>
      transform(graft.functions.PrefixDots(v, v, TruncDims),
        x => sqrt(x))
    val qs = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("vq"),
        pnorms(col("embedding")).as("nq"))
    val corpus = graft.SparkUtil.ensureParallelism(
      emb.select(col("vec_id"), col("embedding"),
        pnorms(col("embedding")).as("nv")))
    // Per-(d, qid) top-10 through the bounded SampleK aggregate (r22,
    // guide §2.3 "aggregate before you shuffle" — the q111 discipline):
    // the former plan EXPLODED every pair ×4 prefix lengths and ranked
    // the 4·|corpus|·|Q| row stream through row_number windows — a full
    // exchange+sort of ~16M rows at sf0.1 of which 10 per (d, qid)
    // survive. SampleK keeps the k smallest fixed-width order keys per
    // group in the aggregate buffer (map-side combinable, k×groups
    // state), and the key (10000 − sim_e4, vec_id) replays the exact
    // (sim DESC, vec_id ASC) window order: sim is already rounded to
    // 4 dp, so sim_e4 = round(sim·10⁴) is the same total order, and
    // vec_id is unique so ties cannot differ. One aggregate per qid
    // (4 SampleKs) instead of the ×4 explode — no 4× row blow-up.
    val sims = corpus.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.PrefixDots(col("embedding"), col("vq"), TruncDims)
          .as("dots"), col("nq"), col("nv"))
    def keyAt(i: Int): org.apache.spark.sql.Column = format_string(
      "%05d:%010d",
      (lit(10000L) - round(round(element_at(col("dots"), i + 1) /
        (element_at(col("nq"), i + 1) * element_at(col("nv"), i + 1)), 4)
        * 10000).cast("long")),
      col("vec_id"))
    val topAggs = TruncDims.indices.map(i =>
      graft.functions.SampleK(keyAt(i), col("vec_id"), 10).as(s"__s$i"))
    val top = sims.groupBy(col("qid"))
      .agg(topAggs.head, topAggs.tail: _*)
      .select(col("qid"), explode(array(TruncDims.indices.map(i =>
        struct(lit(TruncDims(i)).as("d"),
          transform(col(s"__s$i"), e => e.getField("id")).as("ids"))): _*))
        .as("x"))
      .select(col("x.d").as("d"), col("qid"),
        explode(col("x.ids")).as("vec_id"))
    // The ground-truth side is |Q|×10 rows — broadcast it (left to
    // stats, the planner sort-merges two same-lineage frames).
    val ex = top.filter(col("d") === EmbeddingDim)
      .select(col("qid"), col("vec_id"), lit(1L).as("hit"))
    val wd = org.apache.spark.sql.expressions.Window.partitionBy("d")
    top.join(broadcast(ex), Seq("qid", "vec_id"), "left")
      .groupBy(col("d"), col("qid"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall10_e4", col("hits") * 1000)
      .withColumn("mean_recall_d_e4",
        expr("sum(hits) over (partition by d) * 1000 " +
          "div count(*) over (partition by d)"))
      .orderBy(col("d"), col("qid"))
  }

  /** q157's pool/selection sizes: a 12-candidate LSH pool per query,
    * 4 MMR picks. λ = 1/2, so the argmax of λ·rel − (1−λ)·red equals
    * the argmax of (rel − red) and the whole selection stays in exact
    * e4 integers.
    */
  private val MmrPool = 12
  private val MmrK = 4

  // q157: MMR-diversified CONTEXT assembly — the serving-side step
  // between ANN retrieval and the prompt: a raw top-k is often k
  // near-copies of one chunk; maximal-marginal-relevance re-picks the
  // context set, trading query relevance against redundancy to what is
  // already selected (argmax of sim(q,c) − max over selected of
  // sim(c,s), each step). Pipeline: radius-1 LSH candidates (q145's
  // probe shape, ONE bucket-equality corpus join), ROUND-4-cosine
  // top-12 pool per query, pool-internal pair cosines (12×12 per
  // query, bounded — never corpus-wide), then the greedy selection as
  // a per-query cogroup over the pooled rows — sequential in k=4 ONLY,
  // distributed across queries, exact e4 integers end to end. The
  // oracle replays the pool, the pair matrix and FOUR unrolled argmax
  // steps (joins + anti-joins, no correlated state), so the hash match
  // certifies the entire greedy trajectory, not just the final set.
  def q157(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    requireEmbeddingDim(s, dir, emb, "q157")
    val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = EmbeddingDim)
    val nrm = (v: org.apache.spark.sql.Column) =>
      sqrt(element_at(graft.functions.PrefixDots(v, v, Seq(EmbeddingDim)),
        1))
    val indexed = lsh.index(emb, "embedding")
      .withColumn("__n", nrm(col("embedding")))
    val qs = indexed.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("vq"),
        col("__n").as("nq"), col("bucket"))
    val probes = qs.select(col("qid"),
        explode(array((col("bucket") +: (0 until 8).map(b =>
          col("bucket").bitwiseXOR(lit(1 << b)))): _*)).as("bucket"))
      .distinct()
    val corpus = graft.SparkUtil.ensureParallelism(
      indexed.select(col("vec_id"), col("embedding"), col("__n"),
        col("bucket")))
    val simE4 = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
        nb: org.apache.spark.sql.Column) =>
      round(round(element_at(graft.functions.PrefixDots(a, b,
        Seq(EmbeddingDim)), 1) / (na * nb), 4) * 10000).cast("long")
    val wq = org.apache.spark.sql.expressions.Window.partitionBy("qid")
    val pool = corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(qs.select(col("qid"), col("vq"), col("nq"))),
        Seq("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        col("embedding").as("vc"), col("__n").as("nc"),
        simE4(col("embedding"), col("vq"), col("__n"), col("nq"))
          .as("simq_e4"))
      .withColumn("__r", row_number().over(
        wq.orderBy(col("simq_e4").desc, col("cid"))))
      .filter(col("__r") <= MmrPool)
      .localCheckpoint(true)
    val p1 = pool.select(col("qid"), col("cid").as("a"),
      col("vc").as("va"), col("nc").as("na"))
    val p2 = pool.select(col("qid"), col("cid").as("b"),
      col("vc").as("vb"), col("nc").as("nb"))
    val pairs = p1.join(p2, Seq("qid")).filter(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        simE4(col("va"), col("vb"), col("na"), col("nb")).as("s"))
    val poolDs = pool.select(col("qid"), col("cid"), col("simq_e4"))
      .as[(Long, Long, Long)]
    val pairDs = pairs.as[(Long, Long, Long, Long)]
    poolDs.groupByKey(_._1).cogroup(pairDs.groupByKey(_._1)) {
      (q, ps, rs) =>
        val cands = ps.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        val pairSim = rs.map(t => (t._2, t._3) -> t._4).toMap
        val selected = scala.collection.mutable.ArrayBuffer[Long]()
        val out = scala.collection.mutable.ArrayBuffer[
          (Long, Int, Long, Long, Long)]()
        var remaining = cands
        var step = 1
        while (remaining.nonEmpty && step <= MmrK) {
          var bestIdx = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < remaining.length) {
            val (cid, simq) = remaining(i)
            val red = if (selected.isEmpty) 0L
              else selected.map(sl => pairSim((cid, sl))).max
            val sc = simq - red
            // ties: higher score, then LOWER cid — cands is cid-sorted,
            // so strict > keeps the first (lowest) cid on ties.
            if (sc > bestScore) { bestScore = sc; bestIdx = i }
            i += 1
          }
          val (cid, simq) = remaining(bestIdx)
          out += ((q, step, cid, simq, bestScore))
          selected += cid
          remaining = remaining.filterNot(_._1 == cid)
          step += 1
        }
        out.iterator
    }.toDF("qid", "step", "cid", "simq_e4", "mmr_e4")
      .orderBy(col("qid"), col("step"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_mmr_context" -> (q157 _),
    "q152_dim_truncation" -> (q152 _),
    "q151_index_refresh" -> (q151 _),
    "q149_late_interaction" -> (q149 _),
    "q72_ann_pq" -> (q72 _),
    "q128_ann_sq8" -> (q128 _),
    "q143_semantic_decontam" -> (q143 _),
    "q145_ann_rank_quality" -> (q145 _),
    "q136_ann_autorewrite" -> (q136 _),
    "q142_ann_filtered_rewrite" -> (q142 _),
    "q138_ann_ivfsq" -> (q138 _),
    "q31_lang_id" -> (q31 _),
    "q169_langid_confusion" -> (q169 _),
    "q32_quality" -> (q32 _),
    "q33_ann_lsh" -> (q33 _),
    "q189_ann_multiprobe" -> (q189 _),
    "q34_chunker" -> (q34 _),
    "q253_wordpiece_chunker" -> (q253 _),
    "q35_embed_knn" -> (q35 _),
    "q49_ann_ivf" -> (q49 _),
    "q50_embed_neardup_lsh" -> (q50 _),
    "q61_normalize" -> (q61 _)
  )

  /** Testdata embedding dimensionality the q33 oracle SQL is generated
    * for; [[q33]] asserts the live data agrees (TESTDATA.md).
    */
  val EmbeddingDim: Int = 64

  /** DuckDB list literals for the stopword profiles — generated from the
    * exact [[TextAnalysis.stopwords]] vocabulary so oracle and engine can
    * never drift. Single quotes are SQL-escaped ('') so apostrophe words
    * (fr "qu'il"-style) cannot break the generated SQL.
    */
  private def swList(lang: String): String =
    TextAnalysis.stopwords(lang)
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString("[", ", ", "]")

  /** The q31 language-id replay through the best-Latin-score CTE `b` —
    * shared by the per-doc prediction dump (q31) and the confusion
    * matrix (q169).
    */
  private lazy val langPredCtes: String =
    s"""t AS (SELECT doc_id, text,
       |    regexp_split_to_array(lower(text), '\\s+') toks FROM documents),
       |s AS (SELECT doc_id, text,
       |  CAST(len(list_filter(toks, x -> list_contains(${swList("de")}, x))) AS DOUBLE) / len(toks) AS s_de,
       |  CAST(len(list_filter(toks, x -> list_contains(${swList("en")}, x))) AS DOUBLE) / len(toks) AS s_en,
       |  CAST(len(list_filter(toks, x -> list_contains(${swList("es")}, x))) AS DOUBLE) / len(toks) AS s_es,
       |  CAST(len(list_filter(toks, x -> list_contains(${swList("fr")}, x))) AS DOUBLE) / len(toks) AS s_fr,
       |  CASE WHEN LENGTH(text) > 0 THEN
       |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS DOUBLE) / LENGTH(text)
       |    ELSE 0.0 END AS zh,
       |  CASE WHEN LENGTH(text) > 0 THEN
       |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{0400}-\\x{04ff}]', '', 'g')) AS DOUBLE) / LENGTH(text)
       |    ELSE 0.0 END AS ru
       |  FROM t),
       |b AS (SELECT doc_id, zh, ru,
       |  GREATEST(s_de, s_en, s_es, s_fr) AS bs,
       |  CASE WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr) THEN 'fr'
       |       WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
       |       WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
       |       ELSE 'de' END AS bl
       |  FROM s)""".stripMargin

  private val langPredExpr: String =
    "CASE WHEN zh > 0.25 THEN 'zh' WHEN ru > 0.25 THEN 'ru' " +
      "WHEN bs >= 0.05 THEN bl ELSE 'und' END"

  /** The q33 LSH hyperplanes as DuckDB VALUES rows — the same deterministic
    * ±1 matrix [[Ann.hyperplanes]] builds engine-side (nBits=8,
    * dim=[[EmbeddingDim]], seed=42), so the oracle replays bucket
    * assignment bit-for-bit.
    */
  private val q33PlaneRows: String =
    Ann.hyperplanes(nBits = 8, dim = EmbeddingDim).zipWithIndex.map {
      case (p, b) =>
        val lst = p.map(x => if (x > 0) "1" else "-1").mkString(",")
        s"($b, CAST([$lst] AS DOUBLE[]))"
    }.mkString(",\n  ")

  /** q35 oracle ingredients, generated from the LIVE hashing embedder so
    * the replay cannot drift from the engine: the query's nonzero buckets
    * as a VALUES relation (bucket, double value of the float32) and the
    * query self-norm Σq² — the exact double [[graft.functions
    * .CosineSimilarity]] accumulates (zero terms are IEEE no-ops).
    */
  private lazy val q35QueryVec: Array[Float] =
    graft.functions.Embedding.default
      .embed("fast hash join on the customer table")
  private lazy val q35QvRows: String =
    q35QueryVec.zipWithIndex.collect { case (v, i) if v != 0f =>
      s"($i,CAST(${v.toDouble} AS DOUBLE))"
    }.mkString(",")
  private lazy val q35Ny: String = {
    var ny = 0.0
    var i = 0
    while (i < q35QueryVec.length) {
      val y = q35QueryVec(i).toDouble; ny += y * y; i += 1
    }
    ny.toString
  }

  /** q49's oracle: a generated MATERIALIZED-CTE chain that replays the
    * ENTIRE deterministic IVF build in SQL — e6 quantization, the
    * md5-ordered sample, farthest-point seeding (one CTE level per
    * centroid), the fixed Lloyd rounds with truncating-division means,
    * corpus assignment, probe selection and the exact cosine re-score.
    * Every step is integer arithmetic except the final q21-style cosine,
    * so the replay is bit-exact; every level is MATERIALIZED because
    * DuckDB inlines plain CTEs at each reference (the q112 lesson —
    * exponential re-execution otherwise). Parameters must mirror
    * [[q49]]: k=8, rounds=3, sampleCap=4096, nprobe=2, top-5.
    */
  /** Exact e6 squared distance between two SQL list expressions. */
  private def sqlDist(dim: Int)(p: String, c: String): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($p[i]-$c[i])*($p[i]-$c[i])))"

  /** The deterministic-kmeans replay chain shared by q49 and q138:
    * assumes CTEs `corpus` (vec_id, pt) and `samp` (ord, pt) are
    * already in scope; returns (ctes, finalCentsName). Mirrors
    * [[Ann.Ivf.deterministicKmeans]] step for step (farthest-point
    * seeding with ord tiebreak, fixed Lloyd rounds, truncating-division
    * means, empty clusters keep their centroid).
    */
  private def kmeansChainCtes(dim: Int, k: Int,
      rounds: Int): (Seq[String], String) = {
    val dist = sqlDist(dim) _
    val ctes = scala.collection.mutable.ArrayBuffer(
      "c0 AS MATERIALIZED (SELECT 0 AS cid, pt AS c FROM samp WHERE ord = 1)",
      s"""md0 AS MATERIALIZED (SELECT s.ord, s.pt, ${dist("s.pt", "c.c")}
         |  AS d FROM samp s, c0 c)""".stripMargin)
    var prevMd = "md0"
    val centParts = scala.collection.mutable.ArrayBuffer("c0")
    for (j <- 1 until k) {
      ctes += s"""pick$j AS MATERIALIZED (SELECT $j AS cid, pt AS c
                 |  FROM $prevMd ORDER BY d DESC, ord LIMIT 1)""".stripMargin
      centParts += s"pick$j"
      if (j < k - 1) {
        ctes += s"""md$j AS MATERIALIZED (
                   |  SELECT m.ord, m.pt, least(m.d, ${dist("m.pt", "p.c")})
                   |    AS d FROM $prevMd m, pick$j p)""".stripMargin
        prevMd = s"md$j"
      }
    }
    ctes += centParts.map(t => s"SELECT cid, c FROM $t")
      .mkString("cents0 AS MATERIALIZED (", " UNION ALL ", ")")
    var prev = "cents0"
    for (r <- 1 to rounds) {
      ctes += s"""asg$r AS MATERIALIZED (
                 |  SELECT ord, pt, cid FROM (
                 |    SELECT s.ord, s.pt, c.cid,
                 |      row_number() OVER (PARTITION BY s.ord
                 |        ORDER BY ${dist("s.pt", "c.c")}, c.cid) AS rn
                 |    FROM samp s CROSS JOIN $prev c) WHERE rn = 1)""".stripMargin
      ctes += s"""mean$r AS MATERIALIZED (
                 |  SELECT cid, list(cs ORDER BY j) AS c FROM (
                 |    SELECT cid, j, CASE WHEN SUM(pt[j]) < 0
                 |      THEN -((-SUM(pt[j])) // COUNT(*))
                 |      ELSE SUM(pt[j]) // COUNT(*) END AS cs
                 |    FROM asg$r, UNNEST(range(1, ${dim + 1})) AS r(j)
                 |    GROUP BY cid, j) GROUP BY cid)""".stripMargin
      ctes += s"""cents$r AS MATERIALIZED (
                 |  SELECT o.cid, COALESCE(m.c, o.c) AS c
                 |  FROM $prev o LEFT JOIN mean$r m ON o.cid = m.cid)""".stripMargin
      prev = s"cents$r"
    }
    (ctes.toSeq, prev)
  }

  /** CTEs `corpus` (e6 corpus without the query vector), `samp`
    * (md5-ordered bounded training sample) — the shared fit input
    * preamble of q49/q138.
    */
  private def corpusSampCtes(cap: Int): Seq[String] = Seq(
    s"""corpus AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS pt
       |  FROM embeddings WHERE vec_id <> 0)""".stripMargin,
    s"""samp AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
       |    AS ord, pt
       |  FROM corpus QUALIFY ord <= $cap)""".stripMargin)

  private lazy val q49OracleSql: String = {
    val (dim, k, rounds, cap, nprobe, topk) = (EmbeddingDim, 8, 3, 4096, 2, 5)
    val dist = sqlDist(dim) _
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes ++= corpusSampCtes(cap)
    val (chain, prev) = kmeansChainCtes(dim, k, rounds)
    ctes ++= chain
    ctes += s"""qpt AS MATERIALIZED (SELECT list_transform(embedding,
               |  x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS pt
               |  FROM embeddings WHERE vec_id = 0)""".stripMargin
    ctes += s"""probe AS MATERIALIZED (
               |  SELECT c.cid FROM $prev c, qpt q
               |  ORDER BY ${dist("q.pt", "c.c")}, c.cid LIMIT $nprobe)""".stripMargin
    ctes += s"""asgc AS MATERIALIZED (
               |  SELECT vec_id, cid FROM (
               |    SELECT co.vec_id, c.cid,
               |      row_number() OVER (PARTITION BY co.vec_id
               |        ORDER BY ${dist("co.pt", "c.c")}, c.cid) AS rn
               |    FROM corpus co CROSS JOIN $prev c) WHERE rn = 1)""".stripMargin
    ctes += """e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              |  CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings)""".stripMargin
    ctes += "n AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM e GROUP BY vec_id)"
    ctes += "q AS (SELECT pos, val FROM e WHERE vec_id = 0)"
    ctes += """d AS (SELECT e.vec_id, SUM(e.val * q.val) AS dot FROM e
              |  JOIN q ON e.pos = q.pos WHERE e.vec_id <> 0
              |  GROUP BY e.vec_id)""".stripMargin
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT d.vec_id, ROUND(d.dot / (n.nrm *
       |    (SELECT nrm FROM n WHERE vec_id = 0)), 6) AS score
       |FROM d JOIN n ON d.vec_id = n.vec_id
       |JOIN asgc a ON d.vec_id = a.vec_id
       |WHERE a.cid IN (SELECT cid FROM probe)
       |ORDER BY score DESC, d.vec_id LIMIT $topk""".stripMargin
  }

  /** q72's oracle: the [[q49OracleSql]] discipline applied per subspace —
    * the same md5-ordered sample sliced into m=8 subvectors (one `subs`
    * relation keyed by subspace, so all subspaces advance through the
    * same CTE levels together), farthest-point seeding (one level per of
    * the kSub=16 codebook entries), fixed Lloyd rounds, integer ADC
    * lookup tables from the e6-quantized query, the top-`pool` ADC
    * ranking, and the exact cosine re-score. Parameters mirror [[q72]]:
    * m=8, kSub=16, rounds=3, sampleCap=4096, pool=50, top-5.
    */
  private lazy val q72OracleSql: String = {
    val (dim, m, kSub, rounds, cap, pool, topk) =
      (EmbeddingDim, 8, 16, 3, 4096, 50, 5)
    val sub = dim / m
    def dist(p: String, c: String) =
      s"list_sum(list_transform(range(1, ${sub + 1}), i -> ($p[i]-$c[i])*($p[i]-$c[i])))"
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""corpus AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS pt
         |  FROM embeddings WHERE vec_id <> 0)""".stripMargin,
      s"""samp AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
         |    AS ord, pt
         |  FROM corpus QUALIFY ord <= $cap)""".stripMargin,
      s"""subs AS MATERIALIZED (
         |  SELECT s, ord, pt[s*$sub+1 : s*$sub+$sub] AS p
         |  FROM samp, UNNEST(range(0, $m)) AS r(s))""".stripMargin,
      "c0 AS MATERIALIZED (SELECT s, 0 AS cid, p AS c FROM subs WHERE ord = 1)",
      s"""md0 AS MATERIALIZED (
         |  SELECT u.s, u.ord, u.p, ${dist("u.p", "c.c")} AS d
         |  FROM subs u JOIN c0 c ON u.s = c.s)""".stripMargin)
    var prevMd = "md0"
    val centParts = scala.collection.mutable.ArrayBuffer("c0")
    for (j <- 1 until kSub) {
      ctes += s"""pick$j AS MATERIALIZED (
                 |  SELECT s, $j AS cid, p AS c FROM (
                 |    SELECT s, p, row_number() OVER (PARTITION BY s
                 |      ORDER BY d DESC, ord) AS rn
                 |    FROM $prevMd) WHERE rn = 1)""".stripMargin
      centParts += s"pick$j"
      if (j < kSub - 1) {
        ctes += s"""md$j AS MATERIALIZED (
                   |  SELECT m.s, m.ord, m.p, least(m.d, ${dist("m.p", "p.c")})
                   |    AS d FROM $prevMd m JOIN pick$j p ON m.s = p.s)""".stripMargin
        prevMd = s"md$j"
      }
    }
    ctes += centParts.map(t => s"SELECT s, cid, c FROM $t")
      .mkString("cents0 AS MATERIALIZED (", " UNION ALL ", ")")
    var prev = "cents0"
    for (r <- 1 to rounds) {
      ctes += s"""asg$r AS MATERIALIZED (
                 |  SELECT s, ord, p, cid FROM (
                 |    SELECT u.s, u.ord, u.p, c.cid,
                 |      row_number() OVER (PARTITION BY u.s, u.ord
                 |        ORDER BY ${dist("u.p", "c.c")}, c.cid) AS rn
                 |    FROM subs u JOIN $prev c ON u.s = c.s) WHERE rn = 1)""".stripMargin
      ctes += s"""mean$r AS MATERIALIZED (
                 |  SELECT s, cid, list(cs ORDER BY j) AS c FROM (
                 |    SELECT s, cid, j, CASE WHEN SUM(p[j]) < 0
                 |      THEN -((-SUM(p[j])) // COUNT(*))
                 |      ELSE SUM(p[j]) // COUNT(*) END AS cs
                 |    FROM asg$r, UNNEST(range(1, ${sub + 1})) AS r(j)
                 |    GROUP BY s, cid, j) GROUP BY s, cid)""".stripMargin
      ctes += s"""cents$r AS MATERIALIZED (
                 |  SELECT o.s, o.cid, COALESCE(m.c, o.c) AS c
                 |  FROM $prev o LEFT JOIN mean$r m
                 |    ON o.s = m.s AND o.cid = m.cid)""".stripMargin
      prev = s"cents$r"
    }
    ctes += s"""qpt AS MATERIALIZED (SELECT list_transform(embedding,
               |  x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS pt
               |  FROM embeddings WHERE vec_id = 0)""".stripMargin
    ctes += s"""lut AS MATERIALIZED (
               |  SELECT c.s, c.cid, list_sum(list_transform(range(1, ${sub + 1}),
               |    j -> q.pt[c.s*$sub+j] * c.c[j])) AS v
               |  FROM $prev c, qpt q)""".stripMargin
    ctes += s"""codes AS MATERIALIZED (
               |  SELECT vec_id, s, cid FROM (
               |    SELECT co.vec_id, c.s, c.cid,
               |      row_number() OVER (PARTITION BY co.vec_id, c.s
               |        ORDER BY ${dist(s"co.pt[c.s*$sub+1 : c.s*$sub+$sub]", "c.c")},
               |          c.cid) AS rn
               |    FROM corpus co CROSS JOIN $prev c) WHERE rn = 1)""".stripMargin
    ctes += s"""pool AS MATERIALIZED (
               |  SELECT c.vec_id FROM codes c
               |  JOIN lut l ON c.s = l.s AND c.cid = l.cid
               |  GROUP BY c.vec_id ORDER BY SUM(l.v) DESC, c.vec_id
               |  LIMIT $pool)""".stripMargin
    ctes += """e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
              |  CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings)""".stripMargin
    ctes += "n AS (SELECT vec_id, SQRT(SUM(val*val)) AS nrm FROM e GROUP BY vec_id)"
    ctes += "q AS (SELECT pos, val FROM e WHERE vec_id = 0)"
    ctes += """d AS (SELECT e.vec_id, SUM(e.val * q.val) AS dot FROM e
              |  JOIN q ON e.pos = q.pos WHERE e.vec_id <> 0
              |  GROUP BY e.vec_id)""".stripMargin
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT d.vec_id, ROUND(d.dot / (n.nrm *
       |    (SELECT nrm FROM n WHERE vec_id = 0)), 6) AS score
       |FROM d JOIN n ON d.vec_id = n.vec_id
       |WHERE d.vec_id IN (SELECT vec_id FROM pool)
       |ORDER BY score DESC, d.vec_id LIMIT $topk""".stripMargin
  }

  /** q128's oracle: replays the SQ8 tier end to end — e6 quantization,
    * per-dimension corpus bounds, integer code/dequantize arithmetic
    * (`//` mirrors the engine's exact non-negative intDiv), the
    * quantized-space pool and the exact e6 re-score. No float anywhere.
    * Parameters mirror [[q128]]: 255 levels, pool=50, top-5.
    */
  private lazy val q128OracleSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS v
      |  FROM embeddings),
      |dim AS MATERIALIZED (
      |  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS d
      |  FROM e),
      |mm AS (SELECT d, MIN(x) AS mn, GREATEST(MAX(x) - MIN(x), 1) AS rg
      |       FROM dim WHERE vec_id <> 0 GROUP BY d),
      |qv AS (SELECT d, x FROM dim WHERE vec_id = 0),
      |xh AS (SELECT vec_id, dim.d,
      |         mn + ((((x - mn) * 255) // rg) * rg) // 255 AS xh
      |       FROM dim JOIN mm USING (d) WHERE vec_id <> 0),
      |d2q AS (SELECT vec_id,
      |          CAST(SUM((xh - qv.x) * (xh - qv.x)) AS BIGINT) AS d2q_e12
      |        FROM xh JOIN qv USING (d) GROUP BY vec_id),
      |pool AS (SELECT vec_id, d2q_e12 FROM d2q
      |         ORDER BY d2q_e12, vec_id LIMIT 50),
      |d2 AS (SELECT dim.vec_id,
      |         CAST(SUM((dim.x - qv.x) * (dim.x - qv.x)) AS BIGINT)
      |           AS d2_e12
      |       FROM dim JOIN qv USING (d)
      |       WHERE dim.vec_id IN (SELECT vec_id FROM pool)
      |       GROUP BY dim.vec_id)
      |SELECT pool.vec_id, pool.d2q_e12, d2.d2_e12
      |FROM pool JOIN d2 USING (vec_id)
      |ORDER BY d2_e12, vec_id LIMIT 5""".stripMargin

  /** q138's oracle: the q49 kmeans replay chain, then residuals
    * (pt − centroid) per corpus vector, per-dimension residual bounds
    * (range clamped ≥ 1 exactly like [[Sq.Model]]), SQ8 code/dequant in
    * truncating integer division (all operands non-negative, so
    * DuckDB's `//` equals the engine's intDiv), probe-pruned quantized
    * ranking, and the exact e6 re-score of the pool.
    */
  private lazy val q138OracleSql: String = {
    val (dim, k, rounds, cap, nprobe, topk, pool) =
      (EmbeddingDim, 8, 3, 4096, 2, 5, 50)
    val dist = sqlDist(dim) _
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes ++= corpusSampCtes(cap)
    val (chain, cents) = kmeansChainCtes(dim, k, rounds)
    ctes ++= chain
    ctes += s"""qpt AS MATERIALIZED (SELECT list_transform(embedding,
               |  x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS pt
               |  FROM embeddings WHERE vec_id = 0)""".stripMargin
    ctes += s"""probe AS MATERIALIZED (
               |  SELECT c.cid FROM $cents c, qpt q
               |  ORDER BY ${dist("q.pt", "c.c")}, c.cid LIMIT $nprobe)""".stripMargin
    ctes += s"""asgc AS MATERIALIZED (
               |  SELECT vec_id, cid FROM (
               |    SELECT co.vec_id, c.cid,
               |      row_number() OVER (PARTITION BY co.vec_id
               |        ORDER BY ${dist("co.pt", "c.c")}, c.cid) AS rn
               |    FROM corpus co CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    ctes += s"""resid AS MATERIALIZED (
               |  SELECT a.vec_id, a.cid,
               |    list_transform(range(1, ${dim + 1}),
               |      i -> co.pt[i] - c.c[i]) AS r
               |  FROM asgc a JOIN corpus co ON a.vec_id = co.vec_id
               |  JOIN $cents c ON a.cid = c.cid)""".stripMargin
    ctes += s"""bounds AS MATERIALIZED (
               |  SELECT j, MIN(r[j]) AS mn,
               |    GREATEST(MAX(r[j]) - MIN(r[j]), 1) AS rg
               |  FROM resid, UNNEST(range(1, ${dim + 1})) AS u(j)
               |  GROUP BY j)""".stripMargin
    ctes += s"""appx AS MATERIALIZED (
               |  SELECT v.vec_id,
               |    list(c.c[b.j] + b.mn +
               |      ((((v.r[b.j] - b.mn) * 255) // b.rg) * b.rg) // 255
               |      ORDER BY b.j) AS ax
               |  FROM resid v JOIN $cents c ON v.cid = c.cid
               |  CROSS JOIN bounds b
               |  WHERE v.cid IN (SELECT cid FROM probe)
               |  GROUP BY v.vec_id)""".stripMargin
    ctes += s"""dq AS MATERIALIZED (
               |  SELECT a.vec_id, ${dist("a.ax", "q.pt")} AS d2q
               |  FROM appx a, qpt q)""".stripMargin
    ctes += s"""pl AS MATERIALIZED (
               |  SELECT vec_id, d2q FROM dq
               |  ORDER BY d2q, vec_id LIMIT $pool)""".stripMargin
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT p.vec_id, CAST(p.d2q AS BIGINT) AS d2q_e12,
       |  CAST(${dist("co.pt", "q.pt")} AS BIGINT) AS d2_e12
       |FROM pl p JOIN corpus co ON p.vec_id = co.vec_id, qpt q
       |ORDER BY d2_e12, p.vec_id LIMIT $topk""".stripMargin
  }

  /** Shared oracle for the LSH ANN tier: q33 (manual index search) and
    * q136 (optimizer-rewritten declarative top-k) execute the SAME
    * deterministic probe pool + exact re-score, so one SQL replay
    * certifies both paths.
    */
  private lazy val annLshOracleSql: String = annLshSql(extraPred = "")

  /** q142's oracle: identical LSH replay, with the metadata predicate
    * intersected into the candidate set (prune ∩ predicate, exactly
    * what the composed optimized plan executes).
    */
  private lazy val annLshFilteredOracleSql: String =
    annLshSql(extraPred = " AND (bk.vec_id % 3) = 1")

  private def annLshSql(extraPred: String): String =
      s"""WITH planes(b, p) AS (VALUES
         |  $q33PlaneRows),
         |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
         |       FROM planes),
         |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
         |dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
         |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
         |buckets AS (SELECT vec_id,
         |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id),
         |qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
         |probes AS (SELECT bucket AS pb FROM qb
         |  UNION
         |  SELECT xor(qb.bucket, 1 << CAST(r.range AS INTEGER))
         |  FROM qb CROSS JOIN range(8) r),
         |cand AS (SELECT bk.vec_id FROM buckets bk JOIN probes ON bk.bucket = probes.pb
         |         WHERE bk.vec_id <> 0$extraPred),
         |n AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM e GROUP BY vec_id),
         |q AS (SELECT pos, val FROM e WHERE vec_id = 0),
         |d2 AS (SELECT e.vec_id, SUM(e.val * q.val) AS dot
         |       FROM e JOIN q ON e.pos = q.pos
         |       JOIN cand c ON e.vec_id = c.vec_id GROUP BY e.vec_id)
         |SELECT d2.vec_id,
         |  ROUND(d2.dot / (n.nrm * (SELECT nrm FROM n WHERE vec_id = 0)), 6) AS score
         |FROM d2 JOIN n ON d2.vec_id = n.vec_id
         |ORDER BY score DESC, d2.vec_id LIMIT 5""".stripMargin

  /** q189's oracle: the annLshSql bucket replay, with the probe set
    * derived from the query's e6 margins — singles and pairs ranked by
    * summed margin (tie: mask), top 5 + the base bucket, then the same
    * prune → exact-rescore tail.
    */
  private lazy val annMultiProbeOracleSql: String =
      s"""WITH planes(b, p) AS (VALUES
         |  $q33PlaneRows),
         |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
         |       FROM planes),
         |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
         |dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
         |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
         |buckets AS (SELECT vec_id,
         |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id),
         |qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
         |m AS (SELECT b, CAST(ROUND(abs(d) * 1000000) AS BIGINT) AS mg
         |      FROM dots WHERE vec_id = 0),
         |flips AS (SELECT (1 << b) AS mask, mg AS score FROM m
         |  UNION ALL
         |  SELECT (1 << m1.b) + (1 << m2.b), m1.mg + m2.mg
         |  FROM m m1 JOIN m m2 ON m1.b < m2.b),
         |top AS (SELECT mask FROM flips ORDER BY score, mask LIMIT 5),
         |probes AS (SELECT bucket AS pb FROM qb
         |  UNION
         |  SELECT xor(qb.bucket, CAST(mask AS INTEGER))
         |  FROM qb CROSS JOIN top),
         |cand AS (SELECT bk.vec_id FROM buckets bk
         |         JOIN probes ON bk.bucket = probes.pb
         |         WHERE bk.vec_id <> 0),
         |n AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM e GROUP BY vec_id),
         |q AS (SELECT pos, val FROM e WHERE vec_id = 0),
         |d2 AS (SELECT e.vec_id, SUM(e.val * q.val) AS dot
         |       FROM e JOIN q ON e.pos = q.pos
         |       JOIN cand c ON e.vec_id = c.vec_id GROUP BY e.vec_id)
         |SELECT d2.vec_id,
         |  ROUND(d2.dot / (n.nrm * (SELECT nrm FROM n WHERE vec_id = 0)), 6) AS score
         |FROM d2 JOIN n ON d2.vec_id = n.vec_id
         |ORDER BY score DESC, d2.vec_id LIMIT 5""".stripMargin

  /** q143's oracle: full replay — hyperplane buckets for the whole
    * table, the eval side's radius-1 probe expansion, bucket-equality
    * candidates, ROUND-4 cosine (q21's `dot/(nrm·nrm)` textual form —
    * 4-dp rounding absorbs summation-order noise), then the same
    * window pick of (count, max, argmax-with-min-id-tiebreak).
    */
  private lazy val q143OracleSql: String =
    s"""WITH planes(b, p) AS (VALUES
       |  $q33PlaneRows),
       |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
       |       FROM planes),
       |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
       |dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
       |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
       |buckets AS (SELECT vec_id,
       |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INTEGER)
       |      AS bucket
       |  FROM dots GROUP BY vec_id),
       |ev AS (SELECT vec_id AS eval_id, bucket FROM buckets
       |       WHERE vec_id % 10 = 0),
       |probes AS (SELECT eval_id, bucket AS pb FROM ev
       |  UNION ALL
       |  SELECT eval_id, xor(bucket, 1 << CAST(r.range AS INTEGER))
       |  FROM ev CROSS JOIN range(8) r),
       |tr AS (SELECT vec_id AS train_id, bucket FROM buckets
       |       WHERE vec_id % 10 <> 0),
       |cand AS (SELECT tr.train_id, probes.eval_id
       |         FROM tr JOIN probes ON tr.bucket = probes.pb),
       |n AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM e
       |      GROUP BY vec_id),
       |d2 AS (SELECT c.train_id, c.eval_id, SUM(et.val * ee.val) AS dot
       |       FROM cand c JOIN e et ON et.vec_id = c.train_id
       |       JOIN e ee ON ee.vec_id = c.eval_id AND ee.pos = et.pos
       |       GROUP BY 1, 2),
       |sims AS (SELECT d2.train_id, d2.eval_id,
       |    ROUND(d2.dot / (nt.nrm * ne.nrm), 4) AS sim
       |  FROM d2 JOIN n nt ON nt.vec_id = d2.train_id
       |  JOIN n ne ON ne.vec_id = d2.eval_id
       |  WHERE ROUND(d2.dot / (nt.nrm * ne.nrm), 4) >= 0.2e0),
       |r AS (SELECT train_id, eval_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY train_id
       |                       ORDER BY sim DESC, eval_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY train_id) AS BIGINT) AS n_hits
       |  FROM sims)
       |SELECT train_id, n_hits, sim AS max_sim, eval_id AS best_eval
       |FROM r WHERE rn = 1 ORDER BY train_id""".stripMargin

  /** q145's oracle: the q143 bucket/probe replay, plus the exact
    * all-pairs ground truth for the audit-query slice and the
    * integer-weighted DCG. `dall`/`sims` are consumed by both the
    * exact and the approximate rankings — MATERIALIZED, or DuckDB
    * re-executes the 64-way pos-join per reference (r8's q112 lesson).
    */
  private lazy val q145OracleSql: String = {
    val wRows = NdcgW.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    s"""WITH planes(b, p) AS (VALUES
       |  $q33PlaneRows),
       |w(i, wt) AS (VALUES $wRows),
       |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
       |       FROM planes),
       |e AS MATERIALIZED (SELECT vec_id,
       |        generate_subscripts(embedding, 1) AS pos,
       |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
       |dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
       |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
       |buckets AS MATERIALIZED (SELECT vec_id,
       |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INTEGER)
       |      AS bucket
       |  FROM dots GROUP BY vec_id),
       |qs AS (SELECT vec_id AS qid, bucket FROM buckets
       |       WHERE vec_id % 25 = 0),
       |n AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM e
       |      GROUP BY vec_id),
       |dall AS MATERIALIZED (SELECT q.qid, ev.vec_id,
       |    SUM(eq.val * ev.val) AS dot
       |  FROM qs q JOIN e eq ON eq.vec_id = q.qid
       |  JOIN e ev ON ev.pos = eq.pos AND ev.vec_id <> q.qid
       |  GROUP BY 1, 2),
       |sims AS MATERIALIZED (SELECT d.qid, d.vec_id,
       |    ROUND(d.dot / (nq.nrm * nv.nrm), 4) AS sim
       |  FROM dall d JOIN n nq ON nq.vec_id = d.qid
       |  JOIN n nv ON nv.vec_id = d.vec_id),
       |ex10 AS (SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY sim DESC, vec_id) AS erank FROM sims)
       |  WHERE erank <= 10),
       |probes AS (SELECT qid, bucket AS pb FROM qs
       |  UNION ALL
       |  SELECT qid, xor(bucket, 1 << CAST(r.range AS INTEGER))
       |  FROM qs CROSS JOIN range(8) r),
       |cand AS (SELECT p.qid, bk.vec_id FROM buckets bk
       |         JOIN probes p ON bk.bucket = p.pb
       |         WHERE bk.vec_id <> p.qid),
       |ranked AS (SELECT s.qid, s.vec_id, s.sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.qid
       |                       ORDER BY s.sim DESC, s.vec_id) AS pos,
       |    COUNT(*) OVER (PARTITION BY s.qid) AS n_cand
       |  FROM sims s JOIN cand c ON c.qid = s.qid AND c.vec_id = s.vec_id),
       |top AS (SELECT * FROM ranked WHERE pos <= 10),
       |sc AS (SELECT t.qid, t.n_cand,
       |    CASE WHEN x.vec_id IS NULL THEN 0 ELSE 1 END AS hit,
       |    CASE WHEN x.vec_id IS NULL THEN 0 ELSE w.wt END AS g
       |  FROM top t JOIN w ON w.i = t.pos
       |  LEFT JOIN ex10 x ON x.qid = t.qid AND x.vec_id = t.vec_id)
       |SELECT qid, CAST(MAX(n_cand) AS BIGINT) AS n_cand,
       |  CAST(SUM(hit) AS BIGINT) AS hits,
       |  CAST(SUM(hit) * 1000 AS BIGINT) AS recall10_e4,
       |  CAST(SUM(g) * 1000000 // $IdcgE6 AS BIGINT) AS ndcg_e6
       |FROM sc GROUP BY qid ORDER BY qid""".stripMargin
  }

  /** q149's oracle: the q33 plane replay grouped into 5-token docs,
    * the operator's (qdoc, bucket)-deduped radius-1 probe expansion,
    * DISTINCT candidate pairs, then the exact MaxSim rescore — per
    * (qdoc, ddoc, qtoken) MAX of the ROUND-4 cosine, summed in e4
    * integers — and the same (score desc, ddoc) top-5 window.
    * `e`/`buckets`/`tok`/`pr`/`d2` are multiply-referenced or sit under
    * a multiply-referenced chain — MATERIALIZED (the q112 lesson).
    */
  private lazy val q149OracleSql: String =
    s"""WITH planes(b, p) AS (VALUES
       |  $q33PlaneRows),
       |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
       |       FROM planes),
       |e AS MATERIALIZED (SELECT vec_id,
       |        generate_subscripts(embedding, 1) AS pos,
       |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
       |dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
       |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
       |buckets AS MATERIALIZED (SELECT vec_id,
       |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INTEGER)
       |      AS bucket
       |  FROM dots GROUP BY vec_id),
       |tok AS MATERIALIZED (SELECT vec_id, vec_id // 5 AS ddoc, bucket
       |  FROM buckets),
       |qt AS (SELECT vec_id AS qtid, ddoc AS qdoc, bucket FROM tok
       |       WHERE ddoc % 20 = 0),
       |probes AS (SELECT DISTINCT qdoc, pb FROM (
       |    SELECT qdoc, bucket AS pb FROM qt
       |    UNION ALL
       |    SELECT qdoc, xor(bucket, 1 << CAST(r.range AS INTEGER))
       |    FROM qt CROSS JOIN range(8) r)),
       |cand AS (SELECT DISTINCT p.qdoc, t.ddoc
       |         FROM tok t JOIN probes p ON t.bucket = p.pb
       |         WHERE t.ddoc <> p.qdoc),
       |pr AS MATERIALIZED (SELECT c.qdoc, c.ddoc, q.qtid,
       |    t.vec_id AS dtid
       |  FROM cand c JOIN qt q ON q.qdoc = c.qdoc
       |  JOIN tok t ON t.ddoc = c.ddoc),
       |d2 AS MATERIALIZED (SELECT p.qdoc, p.ddoc, p.qtid, p.dtid,
       |    SUM(eq.val * ed.val) AS dot
       |  FROM pr p JOIN e eq ON eq.vec_id = p.qtid
       |  JOIN e ed ON ed.vec_id = p.dtid AND ed.pos = eq.pos
       |  GROUP BY 1, 2, 3, 4),
       |n AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM e
       |      GROUP BY vec_id),
       |sims AS (SELECT d.qdoc, d.ddoc, d.qtid,
       |    ROUND(d.dot / (nq.nrm * nd.nrm), 4) AS sim
       |  FROM d2 d JOIN n nq ON nq.vec_id = d.qtid
       |  JOIN n nd ON nd.vec_id = d.dtid),
       |ms AS (SELECT qdoc, ddoc, qtid, MAX(sim) AS ms FROM sims
       |       GROUP BY 1, 2, 3),
       |sc AS (SELECT qdoc, ddoc,
       |    CAST(SUM(CAST(ROUND(ms * 10000, 0) AS BIGINT)) AS BIGINT)
       |      AS score_e4
       |  FROM ms GROUP BY 1, 2),
       |r AS (SELECT qdoc, ddoc, score_e4,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qdoc
       |      ORDER BY score_e4 DESC, ddoc) AS BIGINT) AS pos,
       |    CAST(COUNT(*) OVER (PARTITION BY qdoc) AS BIGINT) AS n_cand
       |  FROM sc)
       |SELECT qdoc, ddoc, pos, score_e4, n_cand
       |FROM r WHERE pos <= 5 ORDER BY qdoc, pos""".stripMargin

  /** q151's oracle: the q49 fit replay restricted to the base cohort,
    * then — deliberately in ONE full-corpus pass, against the engine's
    * base+delta algebraic merge — the per-list sufficient statistics,
    * the truncating-division refreshed centroids (empty lists keep
    * their centroid), and the two argmin assignments whose disagreement
    * count is the churn column. The hash match is the merge==recompute
    * certificate for incremental index state.
    */
  private lazy val q151OracleSql: String = {
    val (dim, k, rounds, cap) = (EmbeddingDim, 8, 3, 4096)
    val dist = sqlDist(dim) _
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""corpus AS MATERIALIZED (
               |  SELECT vec_id, list_transform(embedding,
               |    x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS pt
               |  FROM embeddings)""".stripMargin
    ctes += s"""samp AS MATERIALIZED (
               |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))
               |    AS ord, pt
               |  FROM corpus WHERE vec_id % 10 <> 0 QUALIFY ord <= $cap)""".stripMargin
    val (chain, oldc) = kmeansChainCtes(dim, k, rounds)
    ctes ++= chain
    ctes += s"""asgo AS MATERIALIZED (
               |  SELECT vec_id, pt, cid FROM (
               |    SELECT co.vec_id, co.pt, c.cid,
               |      row_number() OVER (PARTITION BY co.vec_id
               |        ORDER BY ${dist("co.pt", "c.c")}, c.cid) AS rn
               |    FROM corpus co CROSS JOIN $oldc c) WHERE rn = 1)""".stripMargin
    ctes += s"""st AS MATERIALIZED (
               |  SELECT cid, r.j, CAST(SUM(pt[j]) AS BIGINT) AS s,
               |    CAST(COUNT(*) AS BIGINT) AS n
               |  FROM asgo, UNNEST(range(1, ${dim + 1})) AS r(j)
               |  GROUP BY 1, 2)""".stripMargin
    ctes += s"""newc AS MATERIALIZED (
               |  SELECT cid, list(comp ORDER BY j) AS c FROM (
               |    SELECT o.cid, r.j,
               |      CASE WHEN m.n IS NULL THEN o.c[r.j]
               |           WHEN m.s < 0 THEN -((-m.s) // m.n)
               |           ELSE m.s // m.n END AS comp
               |    FROM $oldc o CROSS JOIN UNNEST(range(1, ${dim + 1})) AS r(j)
               |    LEFT JOIN st m ON m.cid = o.cid AND m.j = r.j)
               |  GROUP BY cid)""".stripMargin
    ctes += s"""cnt AS (SELECT cid,
               |    CAST(COUNT(*) FILTER (WHERE vec_id % 10 <> 0) AS BIGINT)
               |      AS n_base,
               |    CAST(COUNT(*) FILTER (WHERE vec_id % 10 = 0) AS BIGINT)
               |      AS n_delta
               |  FROM asgo GROUP BY 1)""".stripMargin
    ctes += s"""asgn AS MATERIALIZED (
               |  SELECT vec_id, cid FROM (
               |    SELECT a.vec_id, n.cid,
               |      row_number() OVER (PARTITION BY a.vec_id
               |        ORDER BY ${dist("a.pt", "n.c")}, n.cid) AS rn
               |    FROM asgo a CROSS JOIN newc n) WHERE rn = 1)""".stripMargin
    ctes += s"""chn AS (SELECT an.cid, CAST(COUNT(*) AS BIGINT) AS churn_in
               |  FROM asgn an JOIN asgo ao ON an.vec_id = ao.vec_id
               |  WHERE an.cid <> ao.cid GROUP BY 1)""".stripMargin
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT o.cid, CAST(COALESCE(c.n_base, 0) AS BIGINT) AS n_base,
       |  CAST(COALESCE(c.n_delta, 0) AS BIGINT) AS n_delta,
       |  CAST(${dist("o.c", "nw.c")} AS BIGINT) AS disp_e12,
       |  CAST(list_sum(nw.c) AS BIGINT) AS csum_e6,
       |  CAST(COALESCE(ch.churn_in, 0) AS BIGINT) AS churn_in
       |FROM $oldc o JOIN newc nw ON nw.cid = o.cid
       |LEFT JOIN cnt c ON c.cid = o.cid
       |LEFT JOIN chn ch ON ch.cid = o.cid
       |ORDER BY o.cid""".stripMargin
  }

  /** q152's oracle: per-prefix norms and dot products from the
    * pos-exploded table (`pos <= d` joins against the dims relation),
    * ROUND-4 cosines, (d, qid) window ranks, hits against the d=64
    * rows' own top-10, and the same integer-div per-d mean.
    */
  private lazy val q152OracleSql: String = {
    val dimRows = TruncDims.map(d => s"($d)").mkString(", ")
    s"""WITH dims(d) AS (VALUES $dimRows),
       |e AS MATERIALIZED (SELECT vec_id,
       |        generate_subscripts(embedding, 1) AS pos,
       |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
       |nrm AS MATERIALIZED (SELECT e.vec_id, d.d,
       |    SQRT(SUM(val * val)) AS nrm
       |  FROM e JOIN dims d ON e.pos <= d.d GROUP BY 1, 2),
       |dall AS MATERIALIZED (SELECT eq.vec_id AS qid, ev.vec_id, d.d,
       |    SUM(eq.val * ev.val) AS dot
       |  FROM e eq JOIN e ev ON ev.pos = eq.pos
       |  JOIN dims d ON eq.pos <= d.d
       |  WHERE eq.vec_id % 25 = 0 AND ev.vec_id <> eq.vec_id
       |  GROUP BY 1, 2, 3),
       |sims AS (SELECT da.qid, da.vec_id, da.d,
       |    ROUND(da.dot / (nq.nrm * nv.nrm), 4) AS sim
       |  FROM dall da
       |  JOIN nrm nq ON nq.vec_id = da.qid AND nq.d = da.d
       |  JOIN nrm nv ON nv.vec_id = da.vec_id AND nv.d = da.d),
       |top AS MATERIALIZED (SELECT d, qid, vec_id FROM (
       |    SELECT d, qid, vec_id, ROW_NUMBER() OVER (
       |      PARTITION BY d, qid ORDER BY sim DESC, vec_id) AS pos
       |    FROM sims) WHERE pos <= 10),
       |ex AS (SELECT qid, vec_id FROM top WHERE d = $EmbeddingDim),
       |h AS (SELECT t.d, t.qid,
       |    CAST(SUM(CASE WHEN x.vec_id IS NULL THEN 0 ELSE 1 END)
       |      AS BIGINT) AS hits
       |  FROM top t LEFT JOIN ex x
       |    ON x.qid = t.qid AND x.vec_id = t.vec_id
       |  GROUP BY 1, 2)
       |SELECT d, qid, hits, CAST(hits * 1000 AS BIGINT) AS recall10_e4,
       |  CAST(SUM(hits) OVER (PARTITION BY d) * 1000
       |    // COUNT(*) OVER (PARTITION BY d) AS BIGINT)
       |    AS mean_recall_d_e4
       |FROM h ORDER BY d, qid""".stripMargin
  }

  /** q157's oracle: the q145 plane/probe machinery at the % 50 query
    * slice, the e4 top-12 pool, the pool-internal pair-cosine matrix,
    * then FOUR unrolled greedy steps — each an (anti-join remaining) ×
    * (max-redundancy join to the selected set) × (argmax window) —
    * certifying the whole MMR trajectory.
    */
  private lazy val q157OracleSql: String = {
    val sim = (dot: String, na: String, nb: String) =>
      s"CAST(ROUND(ROUND($dot / ($na * $nb), 4) * 10000, 0) AS BIGINT)"
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""planes(b, p) AS (VALUES
               |  $q33PlaneRows)""".stripMargin
    ctes += """pe AS (SELECT b, generate_subscripts(p, 1) AS pos,
              |  unnest(p) AS pv FROM planes)""".stripMargin
    ctes += """e AS MATERIALIZED (SELECT vec_id,
              |    generate_subscripts(embedding, 1) AS pos,
              |    CAST(unnest(embedding) AS DOUBLE) AS val
              |  FROM embeddings)""".stripMargin
    ctes += """dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
              |  FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2)""".stripMargin
    ctes += """buckets AS MATERIALIZED (SELECT vec_id,
              |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END)
              |      AS INTEGER) AS bucket
              |  FROM dots GROUP BY vec_id)""".stripMargin
    ctes += """qs AS (SELECT vec_id AS qid, bucket FROM buckets
              |  WHERE vec_id % 50 = 0)""".stripMargin
    ctes += """probes AS (SELECT DISTINCT qid, pb FROM (
              |    SELECT qid, bucket AS pb FROM qs
              |    UNION ALL
              |    SELECT qid, xor(bucket, 1 << CAST(r.range AS INTEGER))
              |    FROM qs CROSS JOIN range(8) r))""".stripMargin
    ctes += """cand AS (SELECT p.qid, bk.vec_id AS cid
              |  FROM buckets bk JOIN probes p ON bk.bucket = p.pb
              |  WHERE bk.vec_id <> p.qid)""".stripMargin
    ctes += """n AS MATERIALIZED (SELECT vec_id, SQRT(SUM(val * val))
              |  AS nrm FROM e GROUP BY vec_id)""".stripMargin
    ctes += """dq AS MATERIALIZED (SELECT c.qid, c.cid,
              |    SUM(eq.val * ec.val) AS dot
              |  FROM cand c JOIN e eq ON eq.vec_id = c.qid
              |  JOIN e ec ON ec.vec_id = c.cid AND ec.pos = eq.pos
              |  GROUP BY 1, 2)""".stripMargin
    ctes += s"""pool AS MATERIALIZED (SELECT qid, cid, simq FROM (
               |    SELECT d.qid, d.cid,
               |      ${sim("d.dot", "nq.nrm", "nc.nrm")} AS simq,
               |      ROW_NUMBER() OVER (PARTITION BY d.qid
               |        ORDER BY ${sim("d.dot", "nq.nrm", "nc.nrm")} DESC,
               |          d.cid) AS r
               |    FROM dq d JOIN n nq ON nq.vec_id = d.qid
               |    JOIN n nc ON nc.vec_id = d.cid)
               |  WHERE r <= $MmrPool)""".stripMargin
    ctes += """ppd AS MATERIALIZED (SELECT pa.qid, pa.cid AS a,
              |    pb.cid AS b, SUM(ea.val * eb.val) AS dot
              |  FROM pool pa JOIN pool pb
              |    ON pa.qid = pb.qid AND pa.cid <> pb.cid
              |  JOIN e ea ON ea.vec_id = pa.cid
              |  JOIN e eb ON eb.vec_id = pb.cid AND eb.pos = ea.pos
              |  GROUP BY 1, 2, 3)""".stripMargin
    ctes += s"""pp AS MATERIALIZED (SELECT ppd.qid, a, b,
               |    ${sim("ppd.dot", "na.nrm", "nb.nrm")} AS s
               |  FROM ppd JOIN n na ON na.vec_id = a
               |  JOIN n nb ON nb.vec_id = b)""".stripMargin
    ctes += """sel1 AS MATERIALIZED (SELECT qid, cid, simq, simq AS sc,
              |    1 AS step FROM (
              |    SELECT qid, cid, simq, ROW_NUMBER() OVER (
              |      PARTITION BY qid ORDER BY simq DESC, cid) AS r
              |    FROM pool) WHERE r = 1)""".stripMargin
    ctes += "selU1 AS (SELECT qid, cid FROM sel1)"
    for (t <- 2 to MmrK) {
      ctes += s"""ms$t AS (SELECT pp.qid, pp.a AS cid, MAX(pp.s) AS red
                 |  FROM pp JOIN selU${t - 1} u
                 |    ON u.qid = pp.qid AND u.cid = pp.b
                 |  GROUP BY 1, 2)""".stripMargin
      ctes += s"""sc$t AS (SELECT p.qid, p.cid, p.simq,
                 |    p.simq - COALESCE(m.red, 0) AS sc
                 |  FROM pool p
                 |  LEFT JOIN selU${t - 1} u
                 |    ON u.qid = p.qid AND u.cid = p.cid
                 |  LEFT JOIN ms$t m ON m.qid = p.qid AND m.cid = p.cid
                 |  WHERE u.cid IS NULL)""".stripMargin
      ctes += s"""sel$t AS MATERIALIZED (SELECT qid, cid, simq, sc,
                 |    $t AS step FROM (
                 |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                 |      ORDER BY sc DESC, cid) AS r FROM sc$t)
                 |  WHERE r = 1)""".stripMargin
      if (t < MmrK)
        ctes += s"""selU$t AS (SELECT qid, cid FROM selU${t - 1}
                   |  UNION ALL SELECT qid, cid FROM sel$t)""".stripMargin
    }
    val union = (1 to MmrK)
      .map(t => s"SELECT qid, step, cid, simq, sc FROM sel$t")
      .mkString(" UNION ALL ")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT qid, CAST(step AS INTEGER) AS step, cid,
       |  simq AS simq_e4, sc AS mmr_e4
       |FROM ($union) ORDER BY qid, step""".stripMargin
  }

  /** Shared full semantic-chunker DuckDB replay (q34 + q253): 12-word
    * window segmentation, per-segment hashing-embedder features, exact
    * integer-space boundary cosines, the 25th-percentile tau, and the
    * sequential semantic/token-cut assembly loop as a recursive CTE.
    * The TOKEN COUNTER is the injected `ntokCtes` fragment — it must
    * define an `ntok(doc_id, seq, toks)` CTE (and any helpers), ending
    * with a trailing comma. Fragment lines are margin-free on purpose:
    * the outer stripMargin leaves lines without a leading pipe intact
    * (and a fragment line starting with `||` would lose a pipe to it —
    * the r8 double-strip bite).
    */
  private def chunkerReplaySql(ntokCtes: String, maxTokens: Int,
      outExtra: String): String =
    s"""WITH RECURSIVE segs0 AS MATERIALIZED (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS seq,
         |    array_to_string(ws[(i-1)*12+1 : (i-1)*12+12], ' ') AS seg
         |  FROM (SELECT doc_id,
         |          list_filter(str_split(text, ' '), x -> x <> '') AS ws
         |        FROM documents WHERE doc_id < 100),
         |       UNNEST(range(1, CAST(ceil(len(ws)/12.0) AS INT) + 1))
         |         AS r(i)),
         |tok0 AS (
         |  SELECT doc_id, seq, i1, toks[i1] AS tok
         |  FROM (SELECT doc_id, seq, regexp_extract_all(lower(seg),
         |          '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS toks FROM segs0),
         |       UNNEST(range(1, len(toks)+1)) AS r(i1)),
         |pieces AS (
         |  SELECT doc_id, seq, i1, i2,
         |    CASE WHEN np = 1 THEN tok
         |         WHEN i2 = 1 THEN substring(tok, 1, 8)
         |         ELSE '##' || substring(tok, (i2-1)*8+1, 8) END AS piece
         |  FROM (SELECT doc_id, seq, i1, tok,
         |          CASE WHEN length(tok) > 8 AND
         |               substring(tok,1,1) BETWEEN 'a' AND 'z'
         |               THEN CAST(ceil(length(tok)/8.0) AS INT) ELSE 1
         |          END AS np
         |        FROM tok0),
         |       UNNEST(range(1, np+1)) AS r2(i2)),
         |seqd AS MATERIALIZED (
         |  SELECT doc_id, seq, row_number() OVER (PARTITION BY doc_id, seq
         |    ORDER BY i1, i2) AS pseq, piece
         |  FROM pieces),
         |$ntokCtes
         |feats AS (
         |  SELECT doc_id, seq, piece AS f, 2 AS w2 FROM seqd
         |  UNION ALL
         |  SELECT doc_id, seq, piece || chr(1) || nxt, 1
         |  FROM (SELECT doc_id, seq, piece, lead(piece) OVER (PARTITION BY
         |          doc_id, seq ORDER BY pseq) AS nxt FROM seqd)
         |  WHERE nxt IS NOT NULL),
         |bks AS MATERIALIZED (
         |  SELECT doc_id, seq, CAST(h % 384 AS INT) AS bucket,
         |    SUM(CASE WHEN ((h >> 62) & 1) = 0 THEN w2 ELSE -w2 END) AS w2s
         |  FROM (SELECT doc_id, seq, w2, list_reduce(
         |      list_prepend(CAST(14695981039346656037 AS UBIGINT),
         |        list_transform(split(f, ''),
         |          c -> CAST(unicode(c) AS UBIGINT))),
         |      (acc, c) -> CAST((CAST(xor(acc, c) AS HUGEINT) *
         |        1099511628211) % 18446744073709551616 AS UBIGINT)) AS h
         |    FROM feats)
         |  GROUP BY 1, 2, 3 HAVING SUM(CASE WHEN ((h >> 62) & 1) = 0
         |    THEN w2 ELSE -w2 END) <> 0),
         |nrm AS MATERIALIZED (
         |  SELECT doc_id, seq, SUM(CAST(w2s AS BIGINT) * w2s) AS n2
         |  FROM bks GROUP BY 1, 2),
         |sims AS MATERIALIZED (
         |  SELECT r.doc_id, r.seq,
         |    CASE WHEN COALESCE(nl.n2, 0) = 0 OR COALESCE(nr.n2, 0) = 0
         |      THEN 0.0
         |      ELSE CAST(COALESCE(d.dot, 0) AS DOUBLE) /
         |        sqrt(CAST(nl.n2 AS DOUBLE) * CAST(nr.n2 AS DOUBLE)) END
         |      AS sim
         |  FROM (SELECT doc_id, seq FROM segs0 WHERE seq >= 1) r
         |  LEFT JOIN nrm nl ON nl.doc_id = r.doc_id AND nl.seq = r.seq - 1
         |  LEFT JOIN nrm nr ON nr.doc_id = r.doc_id AND nr.seq = r.seq
         |  LEFT JOIN (SELECT a.doc_id, a.seq + 1 AS seq,
         |        SUM(CAST(a.w2s AS BIGINT) * b.w2s) AS dot
         |      FROM bks a JOIN bks b ON a.doc_id = b.doc_id
         |        AND b.seq = a.seq + 1 AND a.bucket = b.bucket
         |      GROUP BY 1, 2) d
         |    ON d.doc_id = r.doc_id AND d.seq = r.seq),
         |tauq AS MATERIALIZED (
         |  SELECT doc_id, sim AS tau FROM (
         |    SELECT doc_id, sim,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY sim) AS rk,
         |      count(*) OVER (PARTITION BY doc_id) AS nb
         |    FROM sims)
         |  WHERE rk = LEAST(nb - 1, GREATEST(0,
         |    CAST(floor(0.25e0 * (nb - 1) + 0.5e0) AS INT))) + 1),
         |nseg AS MATERIALIZED (
         |  SELECT doc_id, count(*) AS ns FROM segs0 GROUP BY 1),
         |cutf AS MATERIALIZED (
         |  SELECT s.doc_id, s.seq,
         |    (g.ns > 2 AND s.sim <= t.tau) AS semcut
         |  FROM sims s JOIN tauq t ON s.doc_id = t.doc_id
         |    JOIN nseg g ON g.doc_id = s.doc_id),
         |st AS (
         |  SELECT n.doc_id, n.seq, CAST(0 AS INT) AS chunk, n.toks AS cur
         |  FROM ntok n WHERE n.seq = 0
         |  UNION ALL
         |  SELECT st.doc_id, st.seq + 1,
         |    CASE WHEN COALESCE(c.semcut, FALSE) OR st.cur + nt.toks > $maxTokens
         |      THEN st.chunk + 1 ELSE st.chunk END,
         |    CASE WHEN COALESCE(c.semcut, FALSE) OR st.cur + nt.toks > $maxTokens
         |      THEN nt.toks ELSE st.cur + nt.toks END
         |  FROM st
         |  JOIN ntok nt ON nt.doc_id = st.doc_id AND nt.seq = st.seq + 1
         |  LEFT JOIN cutf c ON c.doc_id = st.doc_id AND c.seq = st.seq + 1),
         |ch AS (
         |  SELECT st.doc_id, st.chunk,
         |    string_agg(s.seg, chr(10) ORDER BY st.seq) AS content,
         |    SUM(nt.toks) AS ctoks
         |  FROM st JOIN segs0 s ON s.doc_id = st.doc_id AND s.seq = st.seq
         |    JOIN ntok nt ON nt.doc_id = st.doc_id AND nt.seq = st.seq
         |  GROUP BY 1, 2)
         |SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS documentid,
         |  chunk AS chunk_index,
         |  CAST(LENGTH(content) AS INT) AS content_len,
         |  md5(content) AS content_md5$outExtra
         |FROM ch ORDER BY documentid, chunk_index""".stripMargin

  /** q34's counter: the 8-char-piece RegexTokenizer count (one row per
    * piece in `seqd`, already built for the embedder replay).
    */
  private val RegexNtokCtes: String =
    """ntok AS MATERIALIZED (
  SELECT s.doc_id, s.seq, COALESCE(t.n, 0) AS toks
  FROM segs0 s LEFT JOIN (SELECT doc_id, seq, count(*) AS n
    FROM seqd GROUP BY 1, 2) t
    ON s.doc_id = t.doc_id AND s.seq = t.seq),"""

  /** q253's counter: WordPiece greedy longest-match-first over the
    * committed frozen vocab (`src/main/resources/wordpiece_vocab.txt`,
    * rendered as a VALUES relation from the SAME resource the Spark side
    * loads — one source of truth). `wpstep` advances one matched piece
    * per recursion step, taking the LONGEST vocab entry matching at the
    * current position (max over matching lengths = greedy
    * longest-match-first); a position with no match fails the whole word
    * to [UNK] (count 1), as does a word past the 100-char cap — exactly
    * [[graft.functions.WordPieceTokenizer.pieces]].
    */
  private def wordpieceNtokCtes: String = {
    val values = graft.functions.WordPieceTokenizer
      .vocabTokens("wordpiece_vocab.txt")
      .map(t => "('" + t.replace("'", "''") + "')").mkString(",")
    s"""wpvocab(t) AS (VALUES $values),
wpstep AS (
  SELECT doc_id, seq, i1, tok, 0 AS pos, 0 AS cnt, FALSE AS failed
  FROM tok0
  UNION ALL
  SELECT doc_id, seq, i1, tok,
    CASE WHEN b IS NULL THEN pos ELSE pos + b END,
    cnt + 1, b IS NULL
  FROM (
    SELECT w.*, (SELECT max(CASE WHEN w.pos = 0 THEN length(v.t)
                    ELSE length(v.t) - 2 END)
                 FROM wpvocab v
                 WHERE CASE WHEN w.pos = 0 THEN v.t NOT LIKE '##%'
                     AND v.t = substring(w.tok, 1, length(v.t))
                   ELSE v.t LIKE '##%' AND substring(v.t, 3) =
                     substring(w.tok, w.pos + 1, length(v.t) - 2) END) AS b
    FROM wpstep w
    WHERE w.pos < length(w.tok) AND NOT w.failed)),
wpcnt AS MATERIALIZED (
  SELECT doc_id, seq, i1,
    CASE WHEN failed OR length(tok) > 100 THEN 1 ELSE cnt END AS n
  FROM wpstep WHERE failed OR pos = length(tok)),
ntok AS MATERIALIZED (
  SELECT s.doc_id, s.seq, CAST(COALESCE(t.n, 0) AS BIGINT) AS toks
  FROM segs0 s LEFT JOIN (SELECT doc_id, seq, SUM(n) AS n
    FROM wpcnt GROUP BY 1, 2) t
    ON s.doc_id = t.doc_id AND s.seq = t.seq),"""
  }


  val oracle: Map[String, String] = Map(
    "q157_mmr_context" -> q157OracleSql,
    "q152_dim_truncation" -> q152OracleSql,
    "q151_index_refresh" -> q151OracleSql,
    "q149_late_interaction" -> q149OracleSql,
    "q143_semantic_decontam" -> q143OracleSql,
    "q145_ann_rank_quality" -> q145OracleSql,
    "q49_ann_ivf" -> q49OracleSql,
    "q138_ann_ivfsq" -> q138OracleSql,
    "q72_ann_pq" -> q72OracleSql,
    "q128_ann_sq8" -> q128OracleSql,
    // ASCII PRECONDITION (q34 + q35): this replay tokenizes with ASCII
    // classes ([a-z]+|[0-9]+|[^a-z0-9\s], BETWEEN 'a' AND 'z') and
    // hashes unicode() codepoints, while the engine uses \p{L}/\p{N},
    // isLetter, and FNV over UTF-16 units — bit-equal ONLY on ASCII
    // text. FixtureAsciiSpec pins the documents fixture ASCII-only so
    // a future non-ASCII fixture fails loudly there, not as a silent
    // hash mismatch here.
    // Full semantic-chunker replay: 12-word windows → per-segment
    // RegexTokenizer pieces (q35's machinery, keyed by segment) →
    // FNV-1a ×2-integer bucket sums → EXACT boundary cosines
    // (dot/√(na·nb) over BIGINTs — bit-equal to
    // HashingEmbedder.neighborSims) → tau = sims[round(0.25·(n−1))] →
    // the sequential cut/flush loop as a recursive CTE carrying
    // (chunk, running-token-count) state per document.
    "q34_chunker" -> chunkerReplaySql(RegexNtokCtes, 64, ""),
    // q253: the SAME end-to-end chunker replay under the REAL WordPiece
    // token counter — only the token-count CTEs differ (greedy
    // longest-match-first over the committed frozen vocab, replayed as a
    // recursive CTE; see [[wordpieceNtokCtes]]).
    "q253_wordpiece_chunker" -> chunkerReplaySql(wordpieceNtokCtes, 48,
      ",\n  CAST(ctoks AS BIGINT) AS chunk_tokens"),
    "q35_embed_knn" ->
      s"""WITH tok0 AS (
         |  SELECT doc_id, i1, toks[i1] AS tok
         |  FROM (SELECT doc_id, regexp_extract_all(lower(text),
         |          '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS toks FROM documents),
         |       UNNEST(range(1, len(toks)+1)) AS r(i1)),
         |pieces AS (
         |  SELECT doc_id, i1, i2,
         |    CASE WHEN np = 1 THEN tok
         |         WHEN i2 = 1 THEN substring(tok, 1, 8)
         |         ELSE '##' || substring(tok, (i2-1)*8+1, 8) END AS piece
         |  FROM (SELECT doc_id, i1, tok,
         |          CASE WHEN length(tok) > 8 AND
         |               substring(tok,1,1) BETWEEN 'a' AND 'z'
         |               THEN CAST(ceil(length(tok)/8.0) AS INT) ELSE 1
         |          END AS np
         |        FROM tok0),
         |       UNNEST(range(1, np+1)) AS r2(i2)),
         |seqd AS (
         |  SELECT doc_id, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY i1, i2) AS seq, piece
         |  FROM pieces),
         |feats AS (
         |  SELECT doc_id, piece AS f, 2 AS w2 FROM seqd
         |  UNION ALL
         |  SELECT doc_id, piece || chr(1) || nxt, 1
         |  FROM (SELECT doc_id, piece, lead(piece) OVER (PARTITION BY
         |          doc_id ORDER BY seq) AS nxt FROM seqd)
         |  WHERE nxt IS NOT NULL),
         |hashed AS (
         |  SELECT doc_id, w2, list_reduce(
         |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
         |      list_transform(split(f, ''),
         |        c -> CAST(unicode(c) AS UBIGINT))),
         |    (acc, c) -> CAST((CAST(xor(acc, c) AS HUGEINT) *
         |      1099511628211) % 18446744073709551616 AS UBIGINT)) AS h
         |  FROM feats),
         |bks AS (
         |  SELECT doc_id, CAST(h % 384 AS INT) AS bucket,
         |    SUM(CASE WHEN ((h >> 62) & 1) = 0 THEN w2 ELSE -w2 END) AS w2s
         |  FROM hashed GROUP BY 1, 2),
         |nz AS (SELECT doc_id, bucket, w2s FROM bks WHERE w2s <> 0),
         |nrm AS (SELECT doc_id, SUM(CAST(w2s AS DOUBLE)*w2s)/4 AS n2
         |        FROM nz GROUP BY 1),
         |vecs AS (
         |  SELECT nz.doc_id, bucket,
         |    CAST(CAST(CAST(w2s AS DOUBLE)/2 AS REAL) *
         |      CAST(1.0/sqrt(n2) AS REAL) AS REAL) AS vf
         |  FROM nz JOIN nrm ON nz.doc_id = nrm.doc_id WHERE n2 > 0),
         |qv(bucket, qval) AS (VALUES $q35QvRows),
         |scored AS (
         |  SELECT v.doc_id,
         |    SUM(CAST(v.vf AS DOUBLE) * CAST(v.vf AS DOUBLE)) AS nx,
         |    SUM(CASE WHEN qv.bucket IS NOT NULL
         |        THEN CAST(v.vf AS DOUBLE) * qv.qval ELSE 0.0 END) AS dot
         |  FROM vecs v LEFT JOIN qv ON v.bucket = qv.bucket
         |  GROUP BY v.doc_id)
         |SELECT d.doc_id,
         |  ROUND(CASE WHEN s.nx IS NULL OR s.nx = 0.0 THEN 0.0
         |    ELSE COALESCE(s.dot, 0.0) / sqrt(s.nx * $q35Ny) END, 6)
         |    AS score
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |  LEFT JOIN scored s ON d.doc_id = s.doc_id
         |ORDER BY score DESC, d.doc_id LIMIT 10""".stripMargin,
    "q61_normalize" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |    '<[^>]*>', ' ', 'g'), '[0-9]+', '0', 'g'), '\s+', ' ', 'g'))
        |    AS norm_text
        |  FROM documents)
        |SELECT doc_id, CAST(LENGTH(norm_text) AS INTEGER) AS norm_len,
        |  md5(norm_text) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    "q31_lang_id" ->
      s"""WITH $langPredCtes
         |SELECT doc_id,
         |  $langPredExpr AS lang_pred,
         |  ROUND(GREATEST(zh, ru, bs), 4) AS lang_score
         |FROM b ORDER BY doc_id""".stripMargin,
    // q169: the q31 prediction replay folded into a (label, pred)
    // confusion matrix; window row-total on the matrix-sized aggregate.
    "q169_langid_confusion" ->
      s"""WITH $langPredCtes,
         |p AS (SELECT doc_id, $langPredExpr AS lang_pred FROM b),
         |j AS (SELECT d.lang, p.lang_pred
         |      FROM documents d JOIN p USING (doc_id))
         |SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) * 10000 // SUM(COUNT(*)) OVER
         |    (PARTITION BY lang) AS BIGINT) AS row_share_e4
         |FROM j GROUP BY lang, lang_pred
         |ORDER BY lang, lang_pred""".stripMargin,
    "q33_ann_lsh" -> annLshOracleSql,
    "q189_ann_multiprobe" -> annMultiProbeOracleSql,
    "q136_ann_autorewrite" -> annLshOracleSql,
    "q142_ann_filtered_rewrite" -> annLshFilteredOracleSql,
    "q50_embed_neardup_lsh" ->
      s"""WITH planes(b, p) AS (VALUES
         |  $q33PlaneRows),
         |pe AS (SELECT b, generate_subscripts(p, 1) AS pos, unnest(p) AS pv
         |       FROM planes),
         |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |        CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
         |dots AS (SELECT e.vec_id, pe.b, SUM(e.val * pe.pv) AS d
         |         FROM e JOIN pe ON e.pos = pe.pos GROUP BY 1, 2),
         |buckets AS (SELECT vec_id,
         |    CAST(SUM(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id),
         |pairs AS (SELECT x.vec_id a, y.vec_id b FROM buckets x JOIN buckets y
         |          ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |n AS (SELECT vec_id, SQRT(SUM(val * val)) AS nrm FROM e GROUP BY vec_id),
         |d2 AS (SELECT p.a, p.b, SUM(ea.val * eb.val) AS dot
         |       FROM pairs p JOIN e ea ON ea.vec_id = p.a
         |       JOIN e eb ON eb.vec_id = p.b AND eb.pos = ea.pos
         |       GROUP BY p.a, p.b)
         |SELECT d2.a, d2.b, ROUND(d2.dot / (na.nrm * nb.nrm), 6) AS sim
         |FROM d2 JOIN n na ON na.vec_id = d2.a JOIN n nb ON nb.vec_id = d2.b
         |WHERE ROUND(d2.dot / (na.nrm * nb.nrm), 6) >= 0.2
         |ORDER BY a, b""".stripMargin,
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
