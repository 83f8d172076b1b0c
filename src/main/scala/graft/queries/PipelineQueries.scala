package graft.queries

import graft.Tables
import graft.functions.SampleK
import graft.operators.{Centroids, CountMin, WebIngest}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-completion tiers — bounded-state summaries (count-min q102,
  * exact seeded k-sample q103, KMV set-overlap q114), web-corpus ingest
  * (HTML extraction q104, URL/public-suffix/blocklist q105), SemDeDup
  * cluster-scoped semantic dedup (q106), curriculum packing (q108),
  * per-language CCNet LM terciles (q110), hard-negative mining (q111),
  * the BPE tokenizer (q112 — its oracle replays the training loop),
  * sliding-window chunking (q113), and dbt-style data-quality checks
  * (q115). All under full DuckDB oracles: sketches by md5 register
  * algebra (q79's technique), distances and scores in fixed-point
  * integers (SURVEY §5.4), HTML/URL by identical regex algebra on both
  * engines.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Count-min geometry: 4 hash rows × 1024 buckets (4 KB of registers;
    * one-sided error ≤ e/w · N ≈ 0.27% of stream length per estimate).
    */
  private val CmD = 4
  private val CmW = 1024

  // q102: count-min point-frequency estimates for the top-20 event users
  // — registers built in ONE map-side-combinable aggregate (d·w cells of
  // state, never the key space), estimates broadcast-joined, reported
  // against the exact counts with the (provably non-negative) overcount.
  def q102(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    // ONE stream scan (r19): the exact per-key counts are needed for
    // the report anyway, and the registers are cell-identical whether
    // summed from the raw stream or from the (key, count) table —
    // sketch the checkpointed counts instead of re-scanning events.
    val counts = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact")).localCheckpoint(true)
    val regs = CountMin.sketchFromCounts(counts, "user_id", "n_exact",
      CmD, CmW)
    val exact = counts
      .orderBy(col("n_exact").desc, col("user_id")).limit(20)
    CountMin.estimate(exact, regs, "user_id", CmD, CmW)
      .join(exact, Seq("user_id"))
      .select(col("user_id"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  // q181: Count-Min OVERESTIMATE calibration sweep — q102 shows the
  // top-20's overcounts at one width; this measures the whole key
  // population at w ∈ {64, 256, 1024} (d=4): total/max overcount and
  // exact-match count per config — the numbers that size w against the
  // e·N/w bound before a 100 TB frequency table trusts a sketch
  // (theory comparison in BASELINE.md prose, with q180's rationale).
  // All-integer; completes the sketch-audit family (q140 MinHash,
  // q141 LSH, q180 Bloom).
  def q181(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val exact = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact")).localCheckpoint(true)
    // FUSED sweep (r19): the three widths' register tables build in ONE
    // pass keyed by (w, r, b) — the per-w loop scanned the event stream
    // three times and paid a broadcast + collect per config (21 Spark
    // actions; profile row in BASELINE.md). Register contents per w are
    // identical (same [[CountMin.bucket]] per hash row), the pooled
    // table is still tiny ((64+256+1024)·d cells → one broadcast), and
    // the per-key minima + per-w stats reduce in one aggregate pair —
    // at 100 TB the sweep costs one stream read, not |configs|.
    val ws = Seq(64, 256, 1024)
    def wrb(w: Int, r: Int, b: Column) =
      struct(lit(w).as("w"), lit(r).as("r"), b.as("b"))
    val key = col("user_id").cast("string")
    // Registers from the checkpointed (key, count) table — the event
    // stream is scanned once in this whole query (for `exact`); see
    // [[CountMin.sketchFromCounts]] for the cell-identity argument.
    val regs = exact.select(col("n_exact"),
        explode(array(ws.flatMap(w => (0 until CmD).map(
          r => wrb(w, r, CountMin.bucket(r, key, w)))): _*)).as("x"))
      .groupBy(col("x.w").as("w"), col("x.r").as("r"), col("x.b").as("b"))
      .agg(sum(col("n_exact")).as("c"))
    exact.select(col("user_id"), col("n_exact"),
        explode(array(ws.flatMap(w => (0 until CmD).map(
          r => wrb(w, r, CountMin.bucket(r, key, w)))): _*)).as("x"))
      .select(col("user_id"), col("n_exact"), col("x.w").as("w"),
        col("x.r").as("r"), col("x.b").as("b"))
      .join(broadcast(regs), Seq("w", "r", "b"), "left")
      .groupBy(col("user_id"), col("n_exact"), col("w"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("est") - col("n_exact")).as("sum_overcount"),
        max(col("est") - col("n_exact")).as("max_overcount"),
        sum(when(col("est") === col("n_exact"), 1L).otherwise(0L))
          .as("n_exact_match"))
      .select(col("w").cast("long").as("w"), lit(CmD.toLong).as("d"),
        col("n_keys"), col("sum_overcount"), col("max_overcount"),
        col("n_exact_match"))
      .orderBy(col("w"))
  }

  // q103: exact seeded 10-sample per language in one bounded-state
  // aggregate — k×strata pairs of state instead of a per-stratum sort of
  // the corpus (the row_number plan the oracle replays).
  def q103(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(SampleK(md5(concat_ws(":", lit("s8"), col("doc_id"))),
        col("doc_id"), 10).as("__s"))
      .select(col("lang"), posexplode(col("__s")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.key").as("sample_key"))
      .orderBy(col("lang"), col("rank"))

  // q104: HTML main-content extraction over deterministically wrapped
  // documents — title, link inventory, boilerplate permille, and the
  // main text md5-certified byte-for-byte against the original body.
  def q104(s: SparkSession, dir: String): DataFrame =
    WebIngest.extract(
        WebIngest.withHtml(docs(s, dir), "doc_id", "text", "lang", "source"),
        "html")
      .select(col("doc_id"), col("title"), col("n_links"), col("first_href"),
        md5(col("main_text")).as("main_md5"),
        (col("main_text") === col("text")).as("roundtrip_ok"),
        col("boiler_permille"))
      .orderBy(col("doc_id"))

  /** Registrable domains curated out of the corpus (the blocklist). */
  private val Blocked = Seq("src1.com", "src7.co.uk", "src4.org")

  // q105: URL parse (scheme/host/path/query-param), public-suffix-aware
  // registrable domain, blocklist anti-join, per-domain curation report.
  def q105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parsed = WebIngest.parseUrls(
      WebIngest.withUrl(docs(s, dir), "doc_id", "lang", "source"), "url")
    val kept = WebIngest.filterBlocked(parsed, "registered_domain",
      Blocked.toDF("rd"))
    kept.groupBy(col("registered_domain"), col("public_suffix"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"),
        sum(when(col("host").startsWith("www."), 1L).otherwise(0L))
          .as("n_www"),
        sum(when(col("page").isNotNull, 1L).otherwise(0L)).as("n_paged"))
      .coalesce(1)
      .orderBy(col("registered_domain"), col("public_suffix"))
  }

  /** q106 near-dup threshold: e8-fixed-point squared L2 (≈1.45 in real
    * distance²) — chosen below the intra-cluster median so the report is
    * non-degenerate at every scale factor.
    */
  private val SemTau = 145000000L

  // q106: SemDeDup-style semantic dedup — fit fixed-point centroids,
  // assign shuffle-free (q96's machinery), then search near-duplicates
  // ONLY within a cluster: the O(n²) pair space drops to O(n²/k). A
  // "dup" is a vector with a smaller-id neighbor at e8 integer squared
  // distance ≤ τ. At corpus scale k grows with n (n/1000 clusters), so
  // per-cluster pair work stays bounded; here k = the 10 label classes.
  def q106(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
    val v = Centroids.assign(emb, "embedding", cents, "label")
      .select(col("vec_id"), col("assigned"), col("embedding"))
    // The probe side spreads across all cores (a small parquet scan is
    // 1-2 partitions — without this the whole quadratic pair stage runs
    // in ONE task); the build side broadcasts, so no co-location needed.
    val a = graft.SparkUtil.ensureParallelism(
      v.select(col("assigned"), col("vec_id").as("a"),
        col("embedding").as("va")))
    val b = v.select(col("assigned"), col("vec_id").as("b"),
      col("embedding").as("vb"))
    // Native codegen'd distance (r11): this is the pairs × 384 hot loop
    // — the interpreted HOF formulation dominated the stage wall.
    // SqDistE8 is bit-identical (same IEEE ops, same association).
    val d2 = graft.functions.SqDistE8(col("va"), col("vb"))
    val dup = a.join(broadcast(b), Seq("assigned"))
      .filter(col("a") < col("b"))
      .withColumn("__d2", d2).filter(col("__d2") <= SemTau)
    val perCluster = dup.groupBy(col("assigned"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("b")).as("n_dups"))
    v.groupBy(col("assigned")).agg(count(lit(1)).as("n_vecs"))
      .join(perCluster, Seq("assigned"), "left")
      .select(col("assigned"), col("n_vecs"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
      .orderBy(col("assigned"))
  }

  /** q108 curriculum geometry: difficulty buckets (clamped quartiles of
    * the e6 classifier score), packed easy-first. The order key encodes
    * (bucket desc, md5 shuffle, id) in one long — `(3−bucket)·2^44 +
    * hash24·2^20 + id` — so the distributed prefix-sum packer
    * ([[graft.operators.Packing.packByStart]]) needs no new machinery.
    * The 20-bit id field covers the tested SFs; a deployment widens the
    * key or packs per bucket.
    */
  private val BucketShift = 1L << 44
  private val IdShift = 1L << 20

  // q108: curriculum construction — score every document with the frozen
  // quality classifier (q92), bucket into difficulty quartiles, order
  // easy-first with a seeded shuffle inside each bucket, and pack into
  // 512-token training bins via the two-pass distributed prefix sum.
  // Per-bin bucket span (b_hi/b_lo) certifies curriculum monotonicity.
  def q108(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.TextAnalysis
      .linearQuality(docs(s, dir), "text")
      .select(col("doc_id"), col("score_e6"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val bucket = least(greatest(expr("score_e6 div 250000"), lit(0L)),
      lit(3L))
    val h24 = conv(substring(md5(concat_ws(":", lit("c8"), col("doc_id"))),
      1, 6), 16, 10).cast("long")
    val ord = scored.select(
      ((lit(3L) - bucket) * BucketShift + h24 * IdShift + col("doc_id"))
        .as("ok"),
      col("n_toks"))
    graft.operators.Packing.packByStart(ord, "ok", "n_toks", capacity = 512)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        expr(s"3 - (min(ok) div $BucketShift)").as("b_hi"),
        expr(s"3 - (max(ok) div $BucketShift)").as("b_lo"),
        (min(col("ok")) % IdShift).as("first_doc"))
      .orderBy(col("bin"))
  }

  // q110: the CCNet pipeline shape end to end — per-LANGUAGE bigram LMs
  // estimated in one pass (no per-language loop), each document scored
  // under its own language's model (integer e4 NLL), then split into
  // head/middle/tail by exact per-language tercile cutoffs from the
  // (lang, score) histogram (q99's machinery — the corpus crosses the
  // aggregates once; windows run on the histogram).
  def q110(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Materialized: consumed by BOTH the histogram and the final bucket
    // join, and each consumer would otherwise re-run the scoring joins
    // from the gram checkpoints (docs-sized — one row per scored doc).
    val scored = graft.operators.LanguageModel
      .bigramNllBy(docs(s, dir), "lang", "doc_id", "text")
      .localCheckpoint(true)
    val hist = scored.groupBy(col("lang"), col("score_e4"))
      .agg(count(lit(1)).as("__c"))
    val r = hist
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col("lang")).orderBy(col("score_e4"))))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col("lang"))))
    val cuts = r.groupBy(col("lang")).agg(
      min(when(col("__cum") >= expr("(__n + 2) div 3"), col("score_e4")))
        .as("__cut1"),
      min(when(col("__cum") >= expr("(2 * __n + 2) div 3"),
        col("score_e4"))).as("__cut2"))
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("score_e4") <= col("__cut1"), lit("head"))
          .when(col("score_e4") <= col("__cut2"), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_e4")).as("min_score"),
        max(col("score_e4")).as("max_score"))
      .coalesce(1)
      .orderBy(col("lang"), col("bucket"))
  }

  // q111: hard-negative mining for contrastive training — for every
  // class centroid, the 5 nearest vectors of OTHER classes (e8 integer
  // distance, vec_id tiebreak). The top-k-per-class runs through the
  // bounded SampleK aggregate on a fixed-width order key — k×classes of
  // state, no per-class sort of the scored stream (the ROW_NUMBER plan
  // the oracle replays). Distances against all centroids are one
  // literal-folded projection (q96's machinery), exploded ×k_classes
  // map-side.
  def q111(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val cents = Centroids.fit(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val scored = cents.map { case (lbl, cv) =>
      struct(lit(lbl).as("class"),
        // Native codegen'd loop — bit-identical to the HOF formulation
        // (see SqDistE8; k_classes × 384 per row).
        graft.functions.SqDistE8(col("embedding"), lit(cv)).as("d2"))
    }
    val ex = emb.select(col("vec_id"), col("label"),
        explode(array(scored.toIndexedSeq: _*)).as("s"))
      .select(col("vec_id"), col("label"), col("s.class").as("class"),
        col("s.d2").as("d2"))
      .filter(col("label") =!= col("class"))
    // Fixed-width key: lexicographic == numeric (d2, vec_id) order.
    val key = format_string("%018d:%010d", col("d2"), col("vec_id"))
    ex.groupBy(col("class"))
      .agg(SampleK(key, col("vec_id"), 5).as("__s"))
      .select(col("class"), posexplode(col("__s")))
      .select(col("class"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"),
        (substring(col("col.key"), 1, 18).cast("long").cast("double") / 1e8)
          .as("dist2"))
      .orderBy(col("class"), col("rank"))
  }

  /** q113 chunk geometry: 100-token windows, stride 60 (40-token
    * overlap) — the sliding-window chunker of every RAG/pretraining
    * pipeline, exact and oracle-replayed (the semantic chunker q34 is
    * its embedding-gated sibling).
    */
  private val ChunkW = 100
  private val ChunkStride = 60

  // q113: overlapping sliding-window chunking — per chunk: start token,
  // length, md5 of the joined text. Pure array algebra (slice on the
  // tokenized column), map-side only. Convention: every stride multiple
  // that still lands inside the document starts a chunk; the final
  // chunk is simply shorter.
  def q113(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val toks = split(col("text"), " ")
    val n = size(toks)
    // Window starts: 0, stride, 2·stride, …, the last one that still
    // begins inside the document.
    val starts = sequence(lit(0), greatest(
      (n - 1).cast("int") - pmod(n - 1, lit(ChunkStride)), lit(0)),
      lit(ChunkStride))
    d.select(col("doc_id"), n.as("n_toks"), toks.as("__t"),
        explode(starts).as("start"))
      .select(col("doc_id"), col("n_toks"), col("start"),
        slice(col("__t"), col("start") + 1,
          least(lit(ChunkW), col("n_toks") - col("start"))).as("__c"))
      .select(col("doc_id"), (col("start") / ChunkStride).cast("int")
          .as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        size(col("__c")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("__c"))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** q112 BPE geometry: merge budget and the vocabulary cap for the
    * driver-side merge loop (the cap documents the 100 TB contract — the
    * loop runs on the top-`MaxVocab` weighted words; it never binds at
    * the tested scale factors, where the synthetic vocabulary is tiny).
    */
  private val BpeMerges = 10
  private val BpeMaxVocab = 100000

  // q112: BPE tokenizer, trained AND applied — word counting is the one
  // distributed pass (map-side-combinable aggregate); the merge loop
  // runs on the bounded weighted vocabulary; encoding is a
  // mapPartitions over the DISTINCT-WORD table (vocabulary-sized, never
  // the corpus) whose dictionary joins back by weight. The oracle
  // replays the whole thing — training iterations included — as
  // generated SQL (pair-count + argmax + replace per merge), so the
  // learned merges are certified, not just the final counts.
  def q112(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = docs(s, dir).select(explode(filter(
      split(lower(col("text")), " "), t => length(t) > 0)).as("w"))
    val wc = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // The oracle trains on the FULL vocabulary; if the cap ever binds,
    // learned merges would silently diverge and the hash gate would
    // fail with no pointer to the cause — fail fast instead.
    val nVocab = wc.count()
    require(nVocab <= BpeMaxVocab,
      s"q112 vocabulary $nVocab exceeds BpeMaxVocab=$BpeMaxVocab: " +
        "the training cap would bind and diverge from the oracle")
    val vocab = wc.orderBy(col("cnt").desc, col("w")).limit(BpeMaxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = graft.operators.Bpe.trainMerges(vocab, BpeMerges)
    val dict = wc.as[(String, Long)].mapPartitions { it =>
      it.map { case (w, c) =>
        (w, c, graft.operators.Bpe.encodeWord(w, merges))
      }
    }.toDF("w", "cnt", "toks")
    dict.select(explode(col("toks")).as("token"), col("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(30)
  }

  // q147: tokenizer FERTILITY audit per language — the pre-training
  // tokenizer-selection measurement (a tokenizer that spends 2× the
  // tokens per word on one language halves that language's effective
  // context and doubles its training cost; the fertility curve is how
  // you catch that BEFORE committing a 100 TB tokenization run). Same
  // BPE geometry as q112 (trained on the corpus-global vocabulary, so
  // every language is encoded by ONE shared tokenizer — the scenario
  // the audit exists to measure); per language: doc/word/token/codepoint
  // totals plus tokens-per-word and chars-per-token e4 ratios, all
  // integer. Scale shape: the ONLY corpus-sized pass is the per-(lang,
  // word) count aggregate (map-side-combinable); training runs on the
  // bounded weighted vocabulary, encoding on DISTINCT words only, and
  // the fertility join is lang-word-counts ⋈ broadcast dictionary —
  // the corpus is never re-tokenized row by row.
  def q147(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lw = docs(s, dir)
      .select(col("lang"), explode(filter(
        split(lower(col("text")), " "), t => length(t) > 0)).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds the global vocab AND the lang join
    val wc = lw.groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
    // Census guard folded into the vocab collect (r22): fetching cap+1
    // rows answers "does the vocabulary exceed the cap" in the SAME
    // action that fetches the vocabulary — the former wc.count() was a
    // second full aggregate over the checkpointed (lang, word) table.
    val vocabPlus = wc.orderBy(col("cnt").desc, col("w"))
      .limit(BpeMaxVocab + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(vocabPlus.length <= BpeMaxVocab,
      s"q147 vocabulary exceeds BpeMaxVocab=$BpeMaxVocab: " +
        "the training cap would bind and diverge from the oracle")
    val vocab = vocabPlus
    val merges = graft.operators.Bpe.trainMerges(vocab, BpeMerges)
    // Codepoint counts, not UTF-16 units: the merge machinery and the
    // oracle's LENGTH() are both codepoint-granular (Bpe.spaced).
    val dict = wc.select(col("w")).as[String].mapPartitions { it =>
      it.map { w =>
        (w, graft.operators.Bpe.encodeWord(w, merges).size.toLong,
          w.codePointCount(0, w.length).toLong)
      }
    }.toDF("w", "ntok", "nchar")
    val nd = docs(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    lw.join(broadcast(dict), "w")
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("ntok")).as("n_tokens"),
        sum(col("cnt") * col("nchar")).as("n_chars"))
      .join(broadcast(nd), "lang")
      .withColumn("toks_per_word_e4",
        expr("n_tokens * 10000 div n_words"))
      .withColumn("chars_per_token_e4",
        expr("n_chars * 10000 div n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"), col("toks_per_word_e4"),
        col("chars_per_token_e4"))
      .coalesce(1)
      .orderBy(col("lang"))
  }

  /** q114 KMV geometry: 64-minimum-values sketches; 2^52 hash space
    * (13 md5 hex digits). A sketch smaller than k IS the set — the
    * estimator takes the exact branch.
    */
  private val KmvK = 64

  // q114: audience-overlap estimation from KMV (k-minimum-values) set
  // sketches — distinct counts, union, intersection and Jaccard for
  // every event-type pair, from 64-hash summaries instead of the sets
  // themselves. Sketch collection reuses the bounded SampleK aggregate
  // (a KMV sketch IS "the k smallest hashes"); sketch MERGE is SampleK
  // again over the two sides' sketch rows. At 100 TB each set ships as
  // k hashes however large the audience is; the membership predicate
  // (user has the event type ∧ md5(type:user) in the lower half) keeps
  // the five sets differentiated at every scale factor.
  def q114(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val mem = ev.select(col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
      .filter(substring(md5(concat_ws(":", col("t"), col("u"))), 1, 1)
        < lit("8"))
    val hx = md5(concat_ws(":", lit("v"), col("u")))
    val sk = mem.groupBy(col("t"))
      .agg(SampleK(hx, col("u"), KmvK).as("kmv"))
      .localCheckpoint(true) // feeds per-type stats AND both pair sides
    val skx = sk.select(col("t"), explode(col("kmv")).as("e"))
      .select(col("t"), col("e.key").as("h"), col("e.id").as("u"))
    val perType = skx.groupBy(col("t"))
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("hk"))
    val types = sk.select(col("t"))
    val pairs = types.select(col("t").as("ta"))
      .crossJoin(types.select(col("t").as("tb")))
      .filter(col("ta") < col("tb"))
    val both = pairs
      .join(skx, col("t") === col("ta") || col("t") === col("tb"))
      .select(col("ta"), col("tb"), col("h"), col("u")).distinct()
    val usk = both.groupBy(col("ta"), col("tb"))
      .agg(SampleK(col("h"), col("u"), KmvK).as("kmv"))
      .select(col("ta"), col("tb"), explode(col("kmv")).as("e"))
      .select(col("ta"), col("tb"), col("e.key").as("h"))
    val um = usk
      .join(skx.select(col("t").as("ta"), col("h"), lit(1).as("__a")),
        Seq("ta", "h"), "left")
      .join(skx.select(col("t").as("tb"), col("h"), lit(1).as("__b")),
        Seq("tb", "h"), "left")
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("ku"), max(col("h")).as("uhk"),
        sum(when(col("__a").isNotNull && col("__b").isNotNull, 1L)
          .otherwise(0L)).as("m"))
    // (k−1)·2^52 / kth-hash, or the exact size when the sketch IS the
    // set. The literal product constant-folds to the same exact double
    // DuckDB computes at runtime; the division tree matches the oracle
    // textually (SURVEY §5.4 / q79's e0 discipline).
    def est(n: Column, hk: Column): Column =
      when(n < KmvK, n.cast("double"))
        .otherwise(lit((KmvK - 1).toDouble) * lit(4503599627370496.0) /
          conv(substring(hk, 1, 13), 16, 10).cast("long").cast("double"))
    um
      .join(perType.select(col("t").as("ta"), col("n_sk").as("na"),
        col("hk").as("ha")), Seq("ta"))
      .join(perType.select(col("t").as("tb"), col("n_sk").as("nb"),
        col("hk").as("hb")), Seq("tb"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        est(col("na"), col("ha")).as("est_a"),
        est(col("nb"), col("hb")).as("est_b"),
        est(col("ku"), col("uhk")).as("est_union"),
        col("m"),
        (col("m").cast("double") / col("ku").cast("double")).as("jaccard"),
        (col("m").cast("double") * est(col("ku"), col("uhk")) /
          col("ku").cast("double")).as("est_intersection"))
      .orderBy(col("type_a"), col("type_b"))
  }

  // q115: declarative data-quality validation (the dbt-test/Deequ stage
  // every pipeline runs before training): primary-key uniqueness,
  // referential integrity (broadcast anti-joins), range / accepted-value
  // / not-null constraints and an outlier screen, one report row per
  // check. Each check is an independent aggregate; the union evaluates
  // as one job. The outlier screen is deliberately tight so the report
  // exercises its failure path on real data.
  def q115(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    val lineitem = Tables.load(s, dir, "lineitem")
    val events = Tables.load(s, dir, "events")
    def row(name: String, table: String, viol: DataFrame): DataFrame =
      viol.select(lit(name).as("check_name"), lit(table).as("table_name"),
        col("violations").cast("long").as("violations"))
    def dupKeys(df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(count(lit(1)).as("violations"))
    def countWhere(df: DataFrame, pred: Column): DataFrame =
      df.agg(sum(when(pred, 1L).otherwise(0L)).as("violations"))
    val checks = Seq(
      row("accepted_values_orderstatus", "orders",
        countWhere(orders,
          !col("o_orderstatus").isin("O", "F", "P"))),
      row("fk_lineitem_orders", "lineitem",
        lineitem.join(broadcast(orders.select(col("o_orderkey"))),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))),
      row("fk_orders_customer", "orders",
        orders.join(broadcast(customer.select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))),
      row("not_null_customer_name", "customer",
        countWhere(customer, col("c_name").isNull)),
      row("outlier_event_value", "events",
        countWhere(events, col("value") > 500.0)),
      row("pk_unique_lineitem", "lineitem",
        dupKeys(lineitem, Seq("l_orderkey", "l_linenumber"))),
      row("pk_unique_orders", "orders",
        dupKeys(orders, Seq("o_orderkey"))),
      row("range_quantity", "lineitem",
        countWhere(lineitem,
          col("l_quantity") < 1 || col("l_quantity") > 50)))
    checks.reduce(_.unionAll(_))
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("check_name"))
  }

  /** The deletion-1 neighborhood of a word column as SQL/Column algebra
    * (FastSS blocking): `{w} ∪ {w with character i removed}`. Two words
    * are within edit distance 1 (sub/ins/del) iff their neighborhoods
    * intersect — so the candidate join is keyed, never all-pairs.
    */
  private def del1Keys(w: String): String =
    s"array_union(array($w), transform(sequence(1, length($w)), " +
      s"i -> concat(substr($w, 1, i - 1), substr($w, i + 1, 1000))))"

  // q122: fuzzy dictionary match via deletion-1 blocking — the
  // OCR/typo-normalization join. Noisy tokens (the first word of every
  // 7th document with its 2nd character deleted; every doc_id%7==1 doc
  // contributes its first word unchanged, exercising the exact path)
  // are matched back to the corpus vocabulary through the keyed
  // neighborhood join, each candidate confirmed with a real
  // `levenshtein` ≤ 1 (native in both engines), smallest matching word
  // wins. q52 computes edit distance all-pairs on a tiny slice; THIS is
  // the formulation that survives a billion-word dictionary.
  def q122(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val dict = d.select(explode(filter(split(lower(col("text")), " "),
        t => length(t) > 0)).as("w")).distinct()
    val noisy = d
      .filter(col("doc_id") % 7 <= 1)
      .select(col("doc_id"),
        expr("element_at(split(lower(text), ' '), 1)").as("__w"))
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          expr("concat(substr(__w, 1, 1), substr(__w, 3, 1000))"))
          .otherwise(col("__w")).as("token"))
    val dictKeys = dict.select(col("w"),
      explode(expr(del1Keys("w"))).as("k"))
    val noisyKeys = noisy.select(col("doc_id"), col("token"),
      explode(expr(del1Keys("token"))).as("k"))
    noisyKeys.join(dictKeys, Seq("k"))
      .select(col("doc_id"), col("token"), col("w")).distinct()
      .filter(levenshtein(col("token"), col("w")) <= 1)
      .groupBy(col("doc_id"), col("token")).agg(min(col("w")).as("matched"))
      .select(col("doc_id"), col("token"), col("matched"),
        levenshtein(col("token"), col("matched")).as("dist"))
      .orderBy(col("doc_id"))
  }

  // q123: the web-corpus pipeline composed END TO END — HTML
  // main-content extraction (q104) feeding the frozen quality classifier
  // (q92's keep rule) on the EXTRACTED text, exact dedup (min doc_id per
  // body), then 512-token training bins via the distributed prefix-sum
  // packer. One replayed oracle certifies the whole chain composes —
  // the ingest-side sibling of q83's curation composition.
  def q123(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ext = WebIngest.extract(
        WebIngest.withHtml(docs(s, dir), "doc_id", "text", "lang", "source"),
        "html")
      .select(col("doc_id"), col("main_text").as("text"))
    val kept = graft.operators.TextAnalysis.linearQuality(ext, "text")
      .filter(col("keep"))
    val unique = kept
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("text")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    graft.operators.Packing.packByStart(unique, "doc_id", "n_toks",
        capacity = 512)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bin"))
  }

  // q137: PII detection + certified redaction — emails, IPv4s, phone
  // numbers, card-like digit runs planted deterministically in every
  // third document ([[graft.operators.Pii.withPii]], the q104/q105
  // synthesis discipline: the corpus itself carries no digits), then
  // detected, counted, and redacted with md5-pinned output. Patterns
  // live in the RE2 ∩ Java common subset so the oracle replays
  // detection byte-for-byte — certifying both hits on planted spans
  // and zero false positives everywhere else.
  def q137(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pii.redact(
        graft.operators.Pii.withPii(docs(s, dir), "doc_id", "text"),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_pii_redact" -> (q137 _),
    "q112_bpe_tokens" -> (q112 _),
    "q147_tokenizer_fertility" -> (q147 _),
    "q114_kmv_overlap" -> (q114 _),
    "q115_data_checks" -> (q115 _),
    "q122_fuzzy_match" -> (q122 _),
    "q123_web_pipeline" -> (q123 _),
    "q102_countmin" -> (q102 _),
    "q181_cms_calibration" -> (q181 _),
    "q103_sample_k" -> (q103 _),
    "q104_html_extract" -> (q104 _),
    "q105_url_report" -> (q105 _),
    "q106_semantic_dedup" -> (q106 _),
    "q108_curriculum" -> (q108 _),
    "q110_ccnet_buckets" -> (q110 _),
    "q111_hard_negatives" -> (q111 _),
    "q113_chunk_windows" -> (q113 _))

  /** The q104/q105 HTML and URL builders as SQL (must stay byte-identical
    * to [[WebIngest.withHtml]] / [[WebIngest.withUrl]]).
    */
  // Single-line on purpose: these interpolate into stripMargin'd oracle
  // strings, where a line-leading `||` would lose a pipe to the OUTER
  // stripMargin pass.
  private val HtmlSql: String = Seq(
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' (' || lang",
    "|| ')</title></head><body>'",
    "|| '<nav><a href=\"/home\">home</a> <a href=\"/about\">about</a></nav>'",
    "|| '<h1>Doc ' || CAST(doc_id AS VARCHAR) || ' (' || lang || ')</h1>'",
    "|| '<p class=\"ref\"><a href=\"https://' || source || '.example.com/d/'",
    "|| CAST(doc_id AS VARCHAR) || '\">source</a> <em>' || lang",
    "|| '</em></p>' || '<p>' || text || '</p>'",
    "|| '<footer>(c) 2026 ' || source || '</footer></body></html>'")
    .mkString(" ")

  private val UrlSql: String = Seq(
    "'https://'",
    "|| CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE 'cdn.' || lang || '.' END",
    "|| source",
    "|| CASE WHEN doc_id % 3 = 0 THEN '.com'",
    "WHEN doc_id % 3 = 1 THEN '.co.uk' ELSE '.org' END",
    "|| '/' || lang || '/d' || CAST(doc_id AS VARCHAR)",
    "|| CASE WHEN doc_id % 5 = 0",
    "THEN '?ref=feed&page=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END")
    .mkString(" ")

  /** English stopword list as a DuckDB list literal (q92's convention). */
  private val enStops: String =
    graft.operators.TextAnalysis.stopwords("en")
      .map(w => "'" + w.replace("'", "''") + "'")
      .mkString("[", ", ", "]")

  /** The q92 classifier score as CTEs ending in `sc(doc_id, score_e6)` —
    * the SQL mirror of [[graft.operators.TextAnalysis.linearQuality]].
    */
  private val ScoreCtes: String =
    s"""t AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), ' '),
       |                x -> LENGTH(x) > 0) AS t
       |  FROM documents),
       |f AS (SELECT doc_id,
       |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
       |    CAST(len(list_filter(t, x -> list_contains($enStops, x)))
       |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
       |    AS k_stop,
       |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
       |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
       |    ELSE 0.0 END) * 10000, 0) AS BIGINT) AS k_uniq,
       |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
       |    CAST(list_aggregate(list_transform(t, w -> LENGTH(w)), 'sum')
       |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
       |    AS k_mw,
       |  CAST(ROUND((CAST(LEAST(len(t), 1000) AS DOUBLE) / 1000.0)
       |    * 10000, 0) AS BIGINT) AS k_len
       |  FROM t),
       |sc AS (SELECT doc_id,
       |  -600000 + 180 * k_stop + 90 * k_uniq + 8 * k_mw + 35 * k_len
       |    AS score_e6
       |  FROM f)""".stripMargin

  /** md5-derived count-min bucket of VARCHAR expression `k` in row `r`
    * (the SQL mirror of [[CountMin.bucket]]).
    */
  private def cmBucketSql(r: String, k: String): String =
    cmBucketSqlW(r, k, CmW)

  private def cmBucketSqlW(r: String, k: String, w: Int): String =
    s"CAST(('0x' || substring(md5(CAST($r AS VARCHAR) || ':' || $k), 1, 8)) " +
      s"AS BIGINT) % $w"

  private val blockedInList: String =
    Blocked.map(d => s"'$d'").mkString("(", ", ", ")")

  /** The q112 oracle, generated: `BpeMerges` unrolled training
    * iterations (adjacent-pair count → weighted argmax with the
    * (count desc, a, b) tie-break → literal replace), then token counts
    * from the final segmentation. Data-driven end to end — the SQL
    * learns the same merges the engine does at ANY scale factor. An
    * exhausted vocabulary (no pairs left) degrades to a no-op replace
    * via the chr(1) sentinel.
    */
  /** The BPE training replay as a CTE chain — seg0 (per-codepoint
    * split) through seg`BpeMerges` (pair-count → weighted argmax with
    * the (count desc, a, b) tie-break → literal replace, per merge).
    * Assumes a `wc(w, cnt)` CTE is already in scope; shared verbatim by
    * the q112 and q147 oracles so both certify the SAME learned merges.
    */
  private def bpeSegCtes: String = {
    val sb = new StringBuilder
    sb ++= """seg0 AS MATERIALIZED (SELECT w, cnt,
             |  ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS sp
             |  FROM wc)""".stripMargin
    for (i <- 1 to BpeMerges) {
      val p = i - 1
      sb ++= s""",
                |pc$i AS MATERIALIZED (SELECT t[j] AS a, t[j + 1] AS b,
                |    CAST(SUM(cnt) AS BIGINT) AS c
                |  FROM (SELECT cnt, t, unnest(range(1, len(t))) AS j
                |    FROM (SELECT cnt, list_filter(
                |        regexp_split_to_array(trim(sp), ' '),
                |        x -> LENGTH(x) > 0) AS t FROM seg$p))
                |  GROUP BY 1, 2),
                |b$i AS MATERIALIZED (SELECT a, b FROM pc$i ORDER BY c DESC, a, b
                |        LIMIT 1),
                |seg$i AS MATERIALIZED (SELECT w, cnt, replace(sp,
                |    COALESCE((SELECT ' ' || a || ' ' || b || ' ' FROM b$i),
                |      chr(1)),
                |    COALESCE((SELECT ' ' || a || b || ' ' FROM b$i),
                |      chr(1))) AS sp
                |  FROM seg$p)""".stripMargin
    }
    sb.toString
  }

  private def bpeOracle: String = {
    val sb = new StringBuilder
    sb ++= """WITH wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM (SELECT unnest(list_filter(
             |      regexp_split_to_array(lower(text), ' '),
             |      x -> LENGTH(x) > 0)) AS w FROM documents)
             |  GROUP BY 1),
             |""".stripMargin
    sb ++= bpeSegCtes
    sb ++= s"""
              |SELECT token, CAST(SUM(cnt) AS BIGINT) AS n
              |FROM (SELECT cnt, unnest(list_filter(
              |    regexp_split_to_array(trim(sp), ' '),
              |    x -> LENGTH(x) > 0)) AS token FROM seg$BpeMerges)
              |GROUP BY 1 ORDER BY n DESC, token LIMIT 30""".stripMargin
    sb.toString
  }

  /** The q147 oracle: wc is re-derived as the lang-marginal of the
    * per-(lang, word) counts — textually different from q112's wc but
    * the same multiset, so `bpeSegCtes` learns identical merges — then
    * per-language fertility from the final segmentation's token counts.
    * `//` on non-negative integers matches Spark's `div` exactly;
    * LENGTH(w) counts codepoints in DuckDB, mirrored by
    * `codePointCount` on the engine side (the spaced/merge machinery is
    * codepoint-granular — Bpe.spaced).
    */
  private def fertilityOracle: String = {
    val sb = new StringBuilder
    sb ++= """WITH lw AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM (SELECT lang, unnest(list_filter(
             |      regexp_split_to_array(lower(text), ' '),
             |      x -> LENGTH(x) > 0)) AS w FROM documents)
             |  GROUP BY 1, 2),
             |wc AS (SELECT w, CAST(SUM(cnt) AS BIGINT) AS cnt
             |       FROM lw GROUP BY 1),
             |""".stripMargin
    sb ++= bpeSegCtes
    sb ++= s""",
              |tok AS (SELECT w,
              |    CAST(len(list_filter(regexp_split_to_array(trim(sp), ' '),
              |      x -> LENGTH(x) > 0)) AS BIGINT) AS ntok,
              |    CAST(LENGTH(w) AS BIGINT) AS nchar
              |  FROM seg$BpeMerges),
              |nd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
              |       FROM documents GROUP BY 1),
              |g AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_words,
              |    CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens,
              |    CAST(SUM(cnt * nchar) AS BIGINT) AS n_chars
              |  FROM lw JOIN tok USING (w) GROUP BY 1)
              |SELECT g.lang, nd.n_docs, n_words, n_tokens, n_chars,
              |  CAST(n_tokens * 10000 // n_words AS BIGINT)
              |    AS toks_per_word_e4,
              |  CAST(n_chars * 10000 // n_tokens AS BIGINT)
              |    AS chars_per_token_e4
              |FROM g JOIN nd ON g.lang = nd.lang ORDER BY g.lang""".stripMargin
    sb.toString
  }

  /** The q114 KMV estimator as SQL: exact branch for sub-k sketches,
    * else (k−1)·2^52 / kth-hash — e0 literals and the same association
    * as the engine-side expression tree.
    */
  private def kmvEstSql(n: String, hk: String): String =
    s"CASE WHEN $n < $KmvK THEN CAST($n AS DOUBLE) " +
      s"ELSE ${KmvK - 1}.0e0 * 4503599627370496.0e0 / " +
      s"CAST(CAST(('0x' || substring($hk, 1, 13)) AS BIGINT) AS DOUBLE) END"

  /** The [[graft.operators.Pii.withPii]] injection as SQL (must stay
    * byte-identical to the engine builder). Single-line on purpose —
    * see HtmlSql.
    */
  private val PiiInjectSql: String = Seq(
    "CASE WHEN doc_id % 3 = 0 THEN text",
    "|| ' contact user' || CAST(doc_id % 97 AS VARCHAR)",
    "|| '@ex' || CAST(doc_id % 7 AS VARCHAR)",
    "|| '.com call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')",
    "|| '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')",
    "|| ' from 10.' || CAST(doc_id % 256 AS VARCHAR)",
    "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR)",
    "|| '.' || CAST((doc_id * 13) % 256 AS VARCHAR)",
    "|| ' card 4' || lpad(CAST(doc_id % 1000000007 AS VARCHAR), 15, '0')",
    "ELSE text END").mkString(" ")

  private val q137OracleSql: String = {
    val (em, ip, ph, cd) = (graft.operators.Pii.EmailPat,
      graft.operators.Pii.Ipv4Pat, graft.operators.Pii.PhonePat,
      graft.operators.Pii.CardPat)
    s"""WITH p AS (SELECT doc_id, $PiiInjectSql AS t FROM documents),
       |r AS (SELECT doc_id, t,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      t, '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
       |      '$ph', '<PHONE>', 'g'), '$cd', '<CARD>', 'g') AS red
       |  FROM p)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(t, '$cd')) AS BIGINT) AS n_cards,
       |  md5(red) AS redacted_md5,
       |  red <> t AS changed
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q137_pii_redact" -> q137OracleSql,
    "q112_bpe_tokens" -> bpeOracle,
    "q147_tokenizer_fertility" -> fertilityOracle,
    "q123_web_pipeline" ->
      s"""WITH h AS (SELECT doc_id, $HtmlSql AS html FROM documents),
         |x AS (SELECT doc_id,
         |        regexp_extract(html, '<p>([^<]*)</p>', 1) AS text
         |      FROM h),
         |t AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(lower(text), ' '),
         |                w -> LENGTH(w) > 0) AS t, text
         |  FROM x),
         |f AS (SELECT doc_id, text,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_filter(t, w -> list_contains($enStops, w)))
         |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
         |    AS k_stop,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         |    ELSE 0.0 END) * 10000, 0) AS BIGINT) AS k_uniq,
         |  CAST(ROUND((CASE WHEN len(t) > 0 THEN
         |    CAST(list_aggregate(list_transform(t, w -> LENGTH(w)), 'sum')
         |      AS DOUBLE) / len(t) ELSE 0.0 END) * 10000, 0) AS BIGINT)
         |    AS k_mw,
         |  CAST(ROUND((CAST(LEAST(len(t), 1000) AS DOUBLE) / 1000.0)
         |    * 10000, 0) AS BIGINT) AS k_len
         |  FROM t),
         |kp AS (SELECT doc_id, text FROM f
         |       WHERE -600000 + 180 * k_stop + 90 * k_uniq + 8 * k_mw
         |         + 35 * k_len >= 500000),
         |u AS (SELECT doc_id, text FROM
         |    (SELECT doc_id, text, ROW_NUMBER() OVER
         |       (PARTITION BY text ORDER BY doc_id) AS rn FROM kp)
         |    WHERE rn = 1),
         |t2 AS (SELECT doc_id,
         |    len(regexp_split_to_array(text, ' ')) AS n_toks FROM u),
         |c2 AS (SELECT doc_id, n_toks,
         |    SUM(n_toks) OVER (ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_toks AS cb FROM t2),
         |b2 AS (SELECT doc_id, n_toks,
         |    CAST(FLOOR(cb / 512) AS BIGINT) AS bin FROM c2)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS bin_tokens,
         |  MIN(doc_id) AS first_doc
         |FROM b2 GROUP BY bin ORDER BY bin""".stripMargin,
    "q122_fuzzy_match" ->
      """WITH dict AS (SELECT DISTINCT unnest(list_filter(
        |    regexp_split_to_array(lower(text), ' '),
        |    x -> LENGTH(x) > 0)) AS w FROM documents),
        |noisy AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN substr(w0, 1, 1) || substr(w0, 3, 1000) ELSE w0 END
        |      AS token
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(lower(text), ' ')[1] AS w0
        |        FROM documents WHERE doc_id % 7 <= 1)),
        |dk AS (SELECT w, unnest(list_append(
        |    list_transform(range(1, LENGTH(w) + 1),
        |      i -> substr(w, 1, i - 1) || substr(w, i + 1, 1000)), w))
        |    AS k FROM dict),
        |nk AS (SELECT doc_id, token, unnest(list_append(
        |    list_transform(range(1, LENGTH(token) + 1),
        |      i -> substr(token, 1, i - 1) || substr(token, i + 1, 1000)),
        |    token)) AS k FROM noisy),
        |cand AS (SELECT DISTINCT nk.doc_id, nk.token, dk.w
        |         FROM nk JOIN dk USING (k)),
        |ok AS (SELECT doc_id, token, MIN(w) AS matched FROM cand
        |       WHERE levenshtein(token, w) <= 1 GROUP BY 1, 2)
        |SELECT doc_id, token, matched,
        |  CAST(levenshtein(token, matched) AS INT) AS dist
        |FROM ok ORDER BY doc_id""".stripMargin,
    "q115_data_checks" ->
      """WITH c AS (
        |  SELECT 'accepted_values_orderstatus' AS check_name,
        |    'orders' AS table_name,
        |    (SELECT CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |       THEN 1 ELSE 0 END) AS BIGINT) FROM orders) AS violations
        |  UNION ALL SELECT 'fk_lineitem_orders', 'lineitem',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |  UNION ALL SELECT 'fk_orders_customer', 'orders',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |  UNION ALL SELECT 'not_null_customer_name', 'customer',
        |    (SELECT CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) FROM customer)
        |  UNION ALL SELECT 'outlier_event_value', 'events',
        |    (SELECT CAST(SUM(CASE WHEN value > 500.0 THEN 1 ELSE 0 END)
        |       AS BIGINT) FROM events)
        |  UNION ALL SELECT 'pk_unique_lineitem', 'lineitem',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |      (SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber
        |       HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'pk_unique_orders', 'orders',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
        |      (SELECT 1 FROM orders GROUP BY o_orderkey
        |       HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'range_quantity', 'lineitem',
        |    (SELECT CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |       THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem))
        |SELECT check_name, table_name, violations,
        |  (violations = 0) AS passed
        |FROM c ORDER BY check_name""".stripMargin,
    "q114_kmv_overlap" ->
      s"""WITH mem AS (SELECT t, u FROM
         |    (SELECT DISTINCT event_type AS t, user_id AS u FROM events)
         |  WHERE substring(md5(t || ':' || CAST(u AS VARCHAR)), 1, 1)
         |    < '8'),
         |h AS (SELECT t, u, md5('v:' || CAST(u AS VARCHAR)) AS hx
         |      FROM mem),
         |rk AS (SELECT t, u, hx, ROW_NUMBER() OVER
         |         (PARTITION BY t ORDER BY hx, u) AS rn FROM h),
         |sk AS (SELECT t, u, hx FROM rk WHERE rn <= $KmvK),
         |pt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_sk,
         |         MAX(hx) AS hk FROM sk GROUP BY t),
         |tp AS (SELECT DISTINCT t FROM sk),
         |pairs AS (SELECT a.t AS ta, b.t AS tb FROM tp a JOIN tp b
         |          ON a.t < b.t),
         |uni AS (SELECT DISTINCT ta, tb, hx, u FROM pairs
         |        JOIN sk ON sk.t = ta OR sk.t = tb),
         |urk AS (SELECT ta, tb, hx, u, ROW_NUMBER() OVER
         |          (PARTITION BY ta, tb ORDER BY hx, u) AS rn FROM uni),
         |usk AS (SELECT ta, tb, hx FROM urk WHERE rn <= $KmvK),
         |um AS (SELECT usk.ta, usk.tb,
         |         CAST(COUNT(*) AS BIGINT) AS ku, MAX(usk.hx) AS uhk,
         |         CAST(SUM(CASE WHEN sa.hx IS NOT NULL
         |           AND sb.hx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |           AS m
         |       FROM usk
         |       LEFT JOIN sk sa ON sa.t = usk.ta AND sa.hx = usk.hx
         |       LEFT JOIN sk sb ON sb.t = usk.tb AND sb.hx = usk.hx
         |       GROUP BY 1, 2)
         |SELECT um.ta AS type_a, um.tb AS type_b,
         |  ${kmvEstSql("pa.n_sk", "pa.hk")} AS est_a,
         |  ${kmvEstSql("pb.n_sk", "pb.hk")} AS est_b,
         |  ${kmvEstSql("um.ku", "um.uhk")} AS est_union,
         |  m,
         |  CAST(m AS DOUBLE) / CAST(ku AS DOUBLE) AS jaccard,
         |  CAST(m AS DOUBLE) * ${kmvEstSql("um.ku", "um.uhk")}
         |    / CAST(ku AS DOUBLE) AS est_intersection
         |FROM um JOIN pt pa ON pa.t = um.ta JOIN pt pb ON pb.t = um.tb
         |ORDER BY type_a, type_b""".stripMargin,
    // q181: the q102 register/estimate replay swept over widths; the
    // aggregate runs over ALL keys, all exact integers.
    "q181_cms_calibration" -> {
      val widths = Seq(64, 256, 1024)
      val blocks = widths.map { w =>
        s"""regs$w AS MATERIALIZED (SELECT r,
           |    ${cmBucketSqlW("r", "k", w)} AS b,
           |    CAST(COUNT(*) AS BIGINT) AS c
           |  FROM src CROSS JOIN rs GROUP BY 1, 2),
           |pe$w AS (SELECT user_id, n_exact, r,
           |    ${cmBucketSqlW("r", "CAST(user_id AS VARCHAR)", w)} AS b
           |  FROM exact CROSS JOIN rs),
           |est$w AS (SELECT user_id, n_exact,
           |    MIN(COALESCE(regs$w.c, 0)) AS est
           |  FROM pe$w LEFT JOIN regs$w USING (r, b) GROUP BY 1, 2),
           |agg$w AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk,
           |    CAST(SUM(est - n_exact) AS BIGINT) AS so,
           |    CAST(MAX(est - n_exact) AS BIGINT) AS mo,
           |    CAST(SUM(CASE WHEN est = n_exact THEN 1 ELSE 0 END)
           |      AS BIGINT) AS nx
           |  FROM est$w)""".stripMargin
      }.mkString(",\n")
      val sel = widths.map { w =>
        s"SELECT CAST($w AS BIGINT) AS w, CAST($CmD AS BIGINT) AS d, " +
          s"nk AS n_keys, so AS sum_overcount, mo AS max_overcount, " +
          s"nx AS n_exact_match FROM agg$w"
      }.mkString("\nUNION ALL ")
      s"""WITH rs(r) AS (SELECT unnest(range(0, $CmD))),
         |src AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         |exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM events GROUP BY 1),
         |$blocks
         |SELECT * FROM ($sel) t ORDER BY w""".stripMargin
    },
    "q102_countmin" ->
      s"""WITH rs(r) AS (SELECT unnest(range(0, $CmD))),
         |src AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         |regs AS (SELECT r, ${cmBucketSql("r", "k")} AS b,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM src CROSS JOIN rs GROUP BY 1, 2),
         |exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM events GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 20),
         |pe AS (SELECT user_id, r,
         |    ${cmBucketSql("r", "CAST(user_id AS VARCHAR)")} AS b
         |  FROM exact CROSS JOIN rs),
         |est AS (SELECT user_id, MIN(COALESCE(regs.c, 0)) AS est
         |  FROM pe LEFT JOIN regs USING (r, b) GROUP BY 1)
         |SELECT exact.user_id, exact.n_exact, est.est,
         |  est.est - exact.n_exact AS overcount
         |FROM exact JOIN est USING (user_id)
         |ORDER BY n_exact DESC, user_id""".stripMargin,
    "q103_sample_k" ->
      """WITH h AS (SELECT lang, doc_id,
        |    md5('s8:' || CAST(doc_id AS VARCHAR)) AS k FROM documents),
        |r AS (SELECT lang, doc_id, k, ROW_NUMBER() OVER
        |        (PARTITION BY lang ORDER BY k, doc_id) AS rn FROM h)
        |SELECT lang, CAST(rn AS INT) AS rank, doc_id, k AS sample_key
        |FROM r WHERE rn <= 10 ORDER BY lang, rank""".stripMargin,
    "q104_html_extract" ->
      s"""WITH h AS (SELECT doc_id, text, $HtmlSql AS html FROM documents),
         |x AS (SELECT doc_id, text,
         |    regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
         |    regexp_extract_all(html, 'href="([^"]*)"', 1) AS hrefs,
         |    regexp_extract(html, '<p>([^<]*)</p>', 1) AS main_text,
         |    regexp_replace(regexp_extract(html, '<nav>(.*?)</nav>', 1),
         |      '<[^>]*>', '', 'g') AS nav_t,
         |    regexp_replace(regexp_extract(html, '<footer>(.*?)</footer>', 1),
         |      '<[^>]*>', '', 'g') AS foot_t,
         |    regexp_replace(html, '<[^>]*>', '', 'g') AS all_t
         |  FROM h)
         |SELECT doc_id, title, CAST(len(hrefs) AS BIGINT) AS n_links,
         |  hrefs[1] AS first_href, md5(main_text) AS main_md5,
         |  (main_text = text) AS roundtrip_ok,
         |  CAST(FLOOR((LENGTH(nav_t) + LENGTH(foot_t)) * 1000.0
         |    / LENGTH(all_t)) AS BIGINT) AS boiler_permille
         |FROM x ORDER BY doc_id""".stripMargin,
    "q105_url_report" ->
      s"""WITH u AS (SELECT doc_id, lang, source, $UrlSql AS url
         |  FROM documents),
         |p AS (SELECT url,
         |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
         |    NULLIF(regexp_extract(url, '[?&]page=([0-9]+)', 1), '') AS page
         |  FROM u),
         |p2 AS (SELECT *,
         |    CASE WHEN host LIKE '%.co.uk' THEN 'co.uk'
         |         WHEN host LIKE '%.com' THEN 'com'
         |         WHEN host LIKE '%.org' THEN 'org' ELSE '' END
         |      AS public_suffix,
         |    CASE WHEN host LIKE '%.co.uk'
         |           THEN regexp_extract(host, '([^.]+\\.co\\.uk)$$', 1)
         |         WHEN host LIKE '%.com'
         |           THEN regexp_extract(host, '([^.]+\\.com)$$', 1)
         |         WHEN host LIKE '%.org'
         |           THEN regexp_extract(host, '([^.]+\\.org)$$', 1)
         |         ELSE '' END AS registered_domain
         |  FROM p),
         |k AS (SELECT * FROM p2
         |      WHERE registered_domain NOT IN $blockedInList)
         |SELECT registered_domain, public_suffix,
         |  CAST(COUNT(*) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
         |  CAST(SUM(CASE WHEN host LIKE 'www.%' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_www,
         |  CAST(SUM(CASE WHEN page IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_paged
         |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q111_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |c AS (SELECT label AS clabel, pos,
        |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
        |    COUNT(*) AS n
        |  FROM e GROUP BY 1, 2),
        |cx AS (SELECT clabel, pos,
        |         CAST(s AS DOUBLE) / n / 1000000.0 AS cx FROM c),
        |d AS (SELECT e.vec_id, e.label, cx.clabel,
        |        CAST(SUM(CAST(FLOOR((e.x - cx.cx) * (e.x - cx.cx)
        |          * 100000000.0) AS BIGINT)) AS BIGINT) AS d2
        |      FROM e JOIN cx ON e.pos = cx.pos GROUP BY 1, 2, 3),
        |r AS (SELECT clabel AS class, vec_id, d2, ROW_NUMBER() OVER
        |        (PARTITION BY clabel ORDER BY d2, vec_id) AS rn
        |      FROM d WHERE label <> clabel)
        |SELECT class, CAST(rn AS INT) AS rank, vec_id,
        |  CAST(d2 AS DOUBLE) / 100000000.0 AS dist2
        |FROM r WHERE rn <= 5 ORDER BY class, rank""".stripMargin,
    "q113_chunk_windows" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS t
        |           FROM documents),
        |st AS (SELECT doc_id, t, len(t) AS n,
        |         unnest(range(0, len(t), 60)) AS s FROM t),
        |c AS (SELECT doc_id, s, t[s + 1 : s + 100] AS c FROM st)
        |SELECT doc_id, CAST(s // 60 AS INT) AS chunk_idx,
        |  CAST(s AS BIGINT) AS start_tok,
        |  CAST(len(c) AS BIGINT) AS n_tok,
        |  md5(list_aggregate(c, 'string_agg', ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q108_curriculum" ->
      s"""WITH $ScoreCtes,
         |b AS (SELECT doc_id,
         |        LEAST(GREATEST(score_e6 // 250000, 0), 3) AS bucket
         |      FROM sc),
         |o AS (SELECT b.doc_id,
         |    (3 - bucket) * $BucketShift
         |      + CAST(('0x' || substring(md5('c8:'
         |          || CAST(b.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
         |        * $IdShift
         |      + b.doc_id AS ok,
         |    len(regexp_split_to_array(d.text, ' ')) AS n_toks
         |  FROM b JOIN documents d ON b.doc_id = d.doc_id),
         |cum AS (SELECT ok, n_toks, SUM(n_toks) OVER (ORDER BY ok
         |          ROWS UNBOUNDED PRECEDING) - n_toks AS cb FROM o),
         |pk AS (SELECT ok, n_toks,
         |         CAST(FLOOR(cb / 512) AS BIGINT) AS bin FROM cum)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS bin_tokens,
         |  CAST(3 - (MIN(ok) // $BucketShift) AS BIGINT) AS b_hi,
         |  CAST(3 - (MAX(ok) // $BucketShift) AS BIGINT) AS b_lo,
         |  CAST(MIN(ok) % $IdShift AS BIGINT) AS first_doc
         |FROM pk GROUP BY bin ORDER BY bin""".stripMargin,
    "q110_ccnet_buckets" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(lower(text), ' '),
        |                x -> LENGTH(x) > 0) AS t
        |  FROM documents),
        |uni AS (SELECT lang, unnest(t) AS w FROM toks),
        |c1 AS (SELECT lang, w, COUNT(*) AS c1 FROM uni GROUP BY 1, 2),
        |v AS (SELECT lang, COUNT(*) AS v FROM c1 GROUP BY 1),
        |bpos AS (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
        |         FROM toks WHERE len(t) >= 2),
        |bi AS (SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2 FROM bpos),
        |c2 AS (SELECT lang, w1, w2, COUNT(*) AS c2 FROM bi
        |       GROUP BY 1, 2, 3),
        |nll AS (SELECT c2.lang, c2.w1, c2.w2,
        |    CAST(ROUND(-ln((c2.c2 + 1.0) / (c1.c1 + CAST(v.v AS DOUBLE)))
        |      * 10000, 0) AS BIGINT) AS nll_e4
        |  FROM c2 JOIN c1 ON c2.lang = c1.lang AND c2.w1 = c1.w
        |  JOIN v ON v.lang = c2.lang),
        |ds AS (SELECT bi.doc_id, bi.lang,
        |         CAST(COUNT(*) AS BIGINT) AS nb,
        |         CAST(SUM(nll_e4) AS BIGINT) AS se
        |       FROM bi JOIN nll ON bi.lang = nll.lang
        |         AND bi.w1 = nll.w1 AND bi.w2 = nll.w2
        |       GROUP BY 1, 2),
        |s AS (SELECT doc_id, lang, se // nb AS score FROM ds),
        |hist AS (SELECT lang, score, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM s GROUP BY 1, 2),
        |r AS (SELECT lang, score, c,
        |        SUM(c) OVER (PARTITION BY lang ORDER BY score) AS cum,
        |        SUM(c) OVER (PARTITION BY lang) AS n
        |      FROM hist),
        |cut AS (SELECT lang,
        |    MIN(CASE WHEN cum >= (n + 2) // 3 THEN score END) AS c1,
        |    MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN score END) AS c2
        |  FROM r GROUP BY lang),
        |bkt AS (SELECT s.doc_id, s.lang, s.score,
        |    CASE WHEN s.score <= cut.c1 THEN 'head'
        |         WHEN s.score <= cut.c2 THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM s JOIN cut USING (lang))
        |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(score) AS BIGINT) AS min_score,
        |  CAST(MAX(score) AS BIGINT) AS max_score
        |FROM bkt GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q106_semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, label,
         |    generate_subscripts(embedding, 1) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         |c AS (SELECT label AS clabel, pos,
         |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
         |    COUNT(*) AS n
         |  FROM e GROUP BY 1, 2),
         |cx AS (SELECT clabel, pos,
         |         CAST(s AS DOUBLE) / n / 1000000.0 AS cx FROM c),
         |d AS (SELECT e.vec_id, cx.clabel,
         |        CAST(SUM(CAST(FLOOR((e.x - cx.cx) * (e.x - cx.cx)
         |          * 100000000.0) AS BIGINT)) AS BIGINT) AS d2
         |      FROM e JOIN cx ON e.pos = cx.pos GROUP BY 1, 2),
         |asg AS (SELECT vec_id, clabel AS assigned FROM
         |    (SELECT vec_id, clabel, ROW_NUMBER() OVER
         |       (PARTITION BY vec_id ORDER BY d2, clabel) AS rn FROM d)
         |    WHERE rn = 1),
         |ea AS (SELECT e.vec_id, asg.assigned, e.pos, e.x
         |       FROM e JOIN asg USING (vec_id)),
         |pd AS (SELECT x.assigned, x.vec_id AS a, y.vec_id AS b,
         |         CAST(SUM(CAST(FLOOR((x.x - y.x) * (x.x - y.x)
         |           * 100000000.0) AS BIGINT)) AS BIGINT) AS d2
         |       FROM ea x JOIN ea y ON x.pos = y.pos
         |         AND x.assigned = y.assigned AND x.vec_id < y.vec_id
         |       GROUP BY 1, 2, 3),
         |dup AS (SELECT * FROM pd WHERE d2 <= $SemTau),
         |agg AS (SELECT assigned, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |          CAST(COUNT(DISTINCT b) AS BIGINT) AS n_dups
         |        FROM dup GROUP BY 1),
         |sz AS (SELECT assigned, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |       FROM asg GROUP BY 1)
         |SELECT sz.assigned, sz.n_vecs,
         |  COALESCE(agg.n_pairs, 0) AS n_pairs,
         |  COALESCE(agg.n_dups, 0) AS n_dups
         |FROM sz LEFT JOIN agg USING (assigned)
         |ORDER BY assigned""".stripMargin)
}
