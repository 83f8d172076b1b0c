package graft.queries

import graft.Tables
import graft.operators.{Dedup, Ranking}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked dedup / fingerprint query surface (q27–q30, q52,
  * q54–q55, the q85 stream replay, snapshot dedup q109, canonical
  * PageRank q118).
  *
  * Every signature here is built from `md5` so the DuckDB oracle replays the
  * *exact* MinHash signatures, LSH bands, SimHash bits and winnowed
  * fingerprints — these are hash-match correctness checks of the real
  * algorithms in [[graft.operators.Dedup]], not just row counts.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // q27: MinHash(k=16) + LSH(4 bands × 4 rows) candidate near-dup pairs.
  // saltBlocks=4 exercises the skew-proof blocked self-join on the driver
  // path — it is pair-exact, so the oracle hash-match also certifies that
  // salting loses/duplicates nothing.
  def q27(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(docs(s, dir), "doc_id", "text", n = 3)
    val sigs = Dedup.minhashSignatures(sh, k = 16)
    Dedup.lshCandidatePairs(
        Dedup.lshBuckets(sigs, bands = 4, rowsPerBand = 4), saltBlocks = 4)
      .orderBy(col("a"), col("b"))
  }

  /** q156's band-config ladder — the BASELINE.md tuning table's rows,
    * measured on the corpus itself. All three slice ONE shared k=48
    * signature set: `lshBuckets` reads components `band·rows + r`, so
    * 8×2 and 4×4 consume the first 16 (the 4×4 pair set is exactly
    * q27's — [[graft.operators.Dedup.minhashParams]] is prefix-stable
    * in k) and 6×8 all 48.
    */
  private val SweepCfgs: Seq[(Int, Int)] = Seq((4, 4), (6, 8), (8, 2))
  private val SweepK = 48
  private val SweepTauE4 = 8000L

  // q156: LSH band-config SWEEP — the corpus-impact measurement behind
  // choosing (bands × rows): q140/q141 calibrate the ESTIMATOR; this
  // measures what each config would actually do to THIS corpus, from
  // one shared signature computation (the corpus crosses the shingle →
  // md5 → k-min pipeline ONCE; each config is a vocabulary-sized band
  // grouping + self-join over the checkpointed signature table). Per
  // config: candidate pairs, docs flagged into >= 1 pair, and pairs
  // whose signature Jaccard over the config's OWN k components clears
  // τ = 0.8 — the s-curve midpoint ladder (0.35 / 0.71 / 0.80 for
  // 8×2 / 4×4 / 6×8) read against measured counts instead of folklore.
  // Report rows are driver-assembled counts (the report IS k-config
  // sized); the oracle replays signatures, per-config bands, pairs and
  // the integer Jaccard threshold.
  def q156(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Dedup.shingles(docs(s, dir), "doc_id", "text", n = 3)
    val sigs = Dedup.minhashSignatures(sh, k = SweepK)
      .localCheckpoint(true)
    // FUSED config sweep (r19): the per-config loop paid a checkpoint
    // + three actions per (bands, rowsPerBand) — 42 Spark jobs at three
    // configs (profile row in BASELINE.md). One cfg-tagged bucket table
    // feeds ONE self-join (the join keys carry the tag, so candidate
    // sets stay per-config), one signature join scores every config's
    // pairs, and the three counters reduce to two grouped aggregates +
    // a left join back to the literal config list (a config with zero
    // pairs still reports its zeros). Same rows, ~10 jobs, and the
    // bucket/pair materializations happen once instead of per config.
    val buckets = SweepCfgs.map { case (b, r) =>
      Dedup.lshBuckets(sigs, b, r)
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("id"), col("band"), col("band_hash"))
    }.reduce(_ unionByName _)
    val bk = graft.SparkUtil.stableCheckpoint(buckets)
    val pairs = bk.as("x").join(bk.as("y"),
        col("x.bands") === col("y.bands") &&
          col("x.rows_per_band") === col("y.rows_per_band") &&
          col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.bands").as("bands"),
        col("x.rows_per_band").as("rows_per_band"),
        col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
      .localCheckpoint(true) // feeds the pair stats AND the flag census
    val kSig = (col("bands") * col("rows_per_band")).cast("int")
    val stats = pairs
      .join(sigs.select(col("id").as("a"), col("sig").as("__sa")),
        Seq("a"))
      .join(sigs.select(col("id").as("b"), col("sig").as("__sb")),
        Seq("b"))
      .select(col("bands"), col("rows_per_band"),
        size(filter(zip_with(slice(col("__sa"), lit(1), kSig),
          slice(col("__sb"), lit(1), kSig), (x, y) => x === y), e => e))
          .cast("long").as("__eq"),
        kSig.cast("long").as("__k"))
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("n_cand_pairs"),
        sum(when(expr(s"__eq * 10000 div __k >= $SweepTauE4"), 1L)
          .otherwise(0L)).as("n_est_dup_pairs"))
    val flagged = pairs
      .select(col("bands"), col("rows_per_band"),
        explode(array(col("a"), col("b"))).as("id"))
      .distinct()
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("n_flagged_docs"))
    SweepCfgs.toDF("bands", "rows_per_band")
      .join(stats, Seq("bands", "rows_per_band"), "left")
      .join(flagged, Seq("bands", "rows_per_band"), "left")
      .select(col("bands"), col("rows_per_band"),
        (col("bands") * col("rows_per_band")).as("k_sig"),
        coalesce(col("n_cand_pairs"), lit(0L)).as("n_cand_pairs"),
        coalesce(col("n_flagged_docs"), lit(0L)).as("n_flagged_docs"),
        coalesce(col("n_est_dup_pairs"), lit(0L)).as("n_est_dup_pairs"))
      .orderBy(col("bands"), col("rows_per_band"))
  }

  // q140: MinHash estimator calibration — the precision audit a
  // production near-dup tier runs before trusting its threshold: for
  // every LSH candidate pair (q27's exact pair set), the SIGNATURE
  // estimate of Jaccard (equal components / k, e4) next to the EXACT
  // shingle-set Jaccard (|∩|/|∪|, e4) and the absolute error. Scale
  // shape: the estimate is a pair-scoped signature join (k longs per
  // doc); the exact side joins shingles only for CANDIDATE pairs —
  // pair-scoped, never corpus all-pairs — and both the shingle stream
  // and the signature table are materialized once for their multiple
  // consumers. All-integer e4 arithmetic; the oracle replays
  // signatures, pairs, and both Jaccards bit-for-bit.
  def q140(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(docs(s, dir), "doc_id", "text", n = 3)
      .localCheckpoint(true)
    val sigs = Dedup.minhashSignatures(sh, k = 16).localCheckpoint(true)
    val cand = Dedup.lshCandidatePairs(
      Dedup.lshBuckets(sigs, bands = 4, rowsPerBand = 4))
    val est = cand
      .join(sigs.select(col("id").as("a"), col("sig").as("__sa")), Seq("a"))
      .join(sigs.select(col("id").as("b"), col("sig").as("__sb")), Seq("b"))
      .select(col("a"), col("b"),
        size(filter(zip_with(col("__sa"), col("__sb"),
          (x, y) => x === y), e => e)).cast("long").as("__eq"))
    val cnt = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("shingle")),
        Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("__i"))
    est
      .join(cnt.select(col("id").as("a"), col("n").as("__na")), Seq("a"))
      .join(cnt.select(col("id").as("b"), col("n").as("__nb")), Seq("b"))
      .join(inter, Seq("a", "b"), "left")
      .withColumn("__iv", coalesce(col("__i"), lit(0L)))
      .select(col("a"), col("b"),
        expr("__eq * 10000 div 16").as("est_e4"),
        expr("__iv * 10000 div (__na + __nb - __iv)").as("exact_e4"))
      .withColumn("abs_err_e4", abs(col("est_e4") - col("exact_e4")))
      .orderBy(col("a"), col("b"))
  }

  // q141: LSH bucketing recall/precision audit — q140 audits the
  // ESTIMATOR; this audits the CANDIDATE GENERATION: on a bounded
  // key-range slice (the q25/q26/q52 diagnostic discipline — ground
  // truth needs exact pair Jaccards, so it is slice-scoped BY DESIGN),
  // the exact-Jaccard-≥-τ pair set is the truth, the LSH candidate set
  // the prediction, and the one-row report carries TP/FP/FN and
  // precision/recall in e4. Slicing before vs after banding is
  // equivalent (signatures are per-doc; a pair shares a bucket
  // independently of other docs), so the engine bands the SLICE while
  // the oracle filters the corpus-wide candidate CTE — the hash match
  // certifies that equivalence too. Zero-intersection pairs can't reach
  // τ, so ground truth needs only the shingle-intersection join, never
  // the full cross product.
  def q141(s: SparkSession, dir: String): DataFrame = {
    val tau = 2000L // exact Jaccard >= 0.2 counts as a true near-dup
    val d = docs(s, dir).filter(col("doc_id") < 300)
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
      .localCheckpoint(true)
    val pred = Dedup.lshCandidatePairs(
        Dedup.lshBuckets(Dedup.minhashSignatures(sh, k = 16),
          bands = 4, rowsPerBand = 4))
      .select(col("a"), col("b")).localCheckpoint(true)
    val cnt = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val truth = sh.select(col("id").as("a"), col("shingle"))
      .join(sh.select(col("id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("__i"))
      .join(cnt.select(col("id").as("a"), col("n").as("__na")), Seq("a"))
      .join(cnt.select(col("id").as("b"), col("n").as("__nb")), Seq("b"))
      .filter(expr(s"__i * 10000 div (__na + __nb - __i) >= $tau"))
      .select(col("a"), col("b")).localCheckpoint(true)
    // ONE action for all three counts (r21): the r19 shape ran three
    // sequential count jobs (semi-join tp, truth census, pred census)
    // over the two checkpoints. A full-outer join of marker columns
    // reduces the same three numbers in a single aggregate pass.
    val stats = truth.select(col("a"), col("b"), lit(1L).as("__t"))
      .join(pred.select(col("a"), col("b"), lit(1L).as("__p")),
        Seq("a", "b"), "full_outer")
      .agg(coalesce(sum(col("__t")), lit(0L)).as("nT"),
        coalesce(sum(col("__p")), lit(0L)).as("nP"),
        coalesce(sum(col("__t") * col("__p")), lit(0L)).as("tp"))
      .head()
    val (nT, nP, tp) = (stats.getLong(0), stats.getLong(1),
      stats.getLong(2))
    val (fp, fn) = (nP - tp, nT - tp)
    val prec = if (nP == 0) -1L else tp * 10000L / nP
    val rec = if (nT == 0) -1L else tp * 10000L / nT
    s.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(nT, nP, tp, fp, fn, prec, rec)),
      org.apache.spark.sql.types.StructType(
        Seq("n_truth", "n_pred", "tp", "fp", "fn", "precision_e4",
          "recall_e4").map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.LongType, nullable = false))))
  }

  // q28: 60-bit SimHash per document.
  def q28(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  // q29: winnowed fingerprint count per document (MOSS-style, w=4, n=3).
  def q29(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprints(docs(s, dir), "doc_id", "text", n = 3, w = 4)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  // q30: BPE-ish regex token counting (letters / digit runs / punctuation).
  def q30(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .as("n_tok"))
      .orderBy(col("doc_id"))

  /** The q27 candidate-pair chain without the final sort, reused by the
    * clustering queries (saltBlocks=1 here: the pairs are identical either
    * way and the salted join is already oracle-certified by q27/q50).
    */
  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(docs(s, dir), "doc_id", "text", n = 3)
    Dedup.lshCandidatePairs(
      Dedup.lshBuckets(Dedup.minhashSignatures(sh, k = 16),
        bands = 4, rowsPerBand = 4))
  }

  // q191: DEDUP-ADJUSTED TOKEN YIELD per source — the planning table a
  // mixture is actually built from: raw token mass, mass surviving
  // exact dedup (md5-group min-id keepers), mass surviving near-dup
  // clustering (q54's component representatives), and the e4 yield
  // ratio. A source with a low yield is mostly mirrors — its raw size
  // overstates its contribution to a 100 TB mix. Tokens attribute to
  // the KEEPER's source. One narrow checkpointed projection feeds all
  // three tiers; the keeper sets arrive as doc-keyed left-join marks.
  def q191(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val base = d.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("__ntok"),
        md5(col("text")).as("__h"))
      .localCheckpoint(true)
    val exactKeep = base.groupBy(col("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("__ke"))
    val ndKeep = Dedup.connectedComponentsFast(lshPairs(s, dir),
        d.select(col("doc_id").as("id")))
      .filter(col("id") === col("component"))
      .select(col("id").as("doc_id"), lit(true).as("__kn"))
    base.join(exactKeep, Seq("doc_id"), "left")
      .join(ndKeep, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("tok_raw"),
        sum(when(col("__ke"), col("__ntok")).otherwise(0L))
          .as("tok_exact"),
        sum(when(col("__kn"), col("__ntok")).otherwise(0L))
          .as("tok_neardup"))
      .withColumn("yield_e4",
        expr("tok_neardup * 10000 div tok_raw"))
      .orderBy(col("source"))
  }

  // q197: LABEL-PROPAGATION communities over the LSH candidate graph —
  // the community view CC can't give (a barbell is ONE component but
  // TWO communities; the split is exactly where a dedup keep-policy
  // should cut). Four synchronous deterministic rounds, min-label
  // ties; oracle unrolls all four with MATERIALIZED CTEs.
  def q197(s: SparkSession, dir: String): DataFrame =
    Ranking.labelPropagation(lshPairs(s, dir),
        docs(s, dir).select(col("doc_id").as("id")), rounds = 4)
      .select(col("id").as("doc_id"), col("community"),
        col("community_size"))
      .orderBy(col("doc_id"))

  // q54: near-dup CLUSTERS — connected components over the LSH candidate
  // pairs, every doc labeled with its component (min reachable doc_id).
  // The oracle replays the component labels with a recursive CTE.
  def q54(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(lshPairs(s, dir),
        docs(s, dir).select(col("doc_id").as("id")))
      .select(col("id").as("doc_id"), col("component"))
      .orderBy(col("doc_id"))

  // q135: k-core of the near-dup graph — the DENSITY view q54's
  // components can't give (CC labels chains and cliques alike): docs
  // with >= 2 near-duplicates that survive mutual peeling are the
  // template-farm clusters. n_unstable is the structural convergence
  // certificate (0 iff the fixed peel rounds reached the true core).
  def q135(s: SparkSession, dir: String): DataFrame =
    Dedup.kCore(lshPairs(s, dir), k = 2, rounds = 4)
      .select(col("id").as("doc_id"), col("degree"), col("in_core"),
        col("core_degree"), col("n_unstable"))
      .orderBy(col("doc_id"))

  // q55: canonical-per-cluster dedup decision — keep the longest document
  // of each component (ties → lowest id), the classic keep-best policy.
  def q55(s: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.connectedComponentsFast(lshPairs(s, dir),
      docs(s, dir).select(col("doc_id").as("id")))
    val withLen = comp.join(
      docs(s, dir).select(col("doc_id").as("id"),
        length(col("text")).as("len")), "id")
    // Keep-best as ONE map-side-combinable argmax instead of a
    // row_number window (r22, guide §2.3): the window sorted the whole
    // corpus-sized (id, component, len) table inside each partition to
    // keep one row per component; max_by with the (len, -id) ordering
    // struct picks the identical row (longest, ties to lowest id — ids
    // are unique, so the ordering value is unique and max_by is
    // deterministic) through a hash aggregate that combines map-side.
    withLen.groupBy(col("component"))
      .agg(max_by(struct(col("id"), col("len")),
        struct(col("len"), (-col("id")).as("nid"))).as("__best"))
      .select(col("__best.id").as("doc_id"), col("component"),
        col("__best.len").as("len"))
      .orderBy(col("doc_id"))
  }

  // q52: pairwise edit distance (Levenshtein) on truncated doc prefixes —
  // the classic exact near-dup verifier; brute-force pairing is scoped to
  // a key range exactly like q25/q26 (candidate generation at scale comes
  // from LSH, q27/q50; edit distance is the within-candidate verifier).
  def q52(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 30)
      .select(col("doc_id"), substring(col("text"), 1, 80).as("t"))
    d.as("x").join(d.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        levenshtein(col("x.t"), col("y.t")).as("dist"))
      .filter(col("dist") <= 60)
      .orderBy(col("a"), col("b"))
  }

  // q85: the streaming incremental near-dup filter EXECUTED as a real
  // Structured Streaming query (file-source stream over the documents
  // parquet → foreachBatch MinHash/LSH filter against a fresh on-disk
  // store → survivor parquet), then the survivors are oracle-replayed:
  // DuckDB recomputes the same signatures/buckets/pair rule (q27's CTE
  // chain + component-equality similarity) and derives the identical
  // survivor set. Fresh temp store per call keeps bench reps identical.
  def q85(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .parquet(s"$dir/documents.parque*")
    val tmp = java.nio.file.Files.createTempDirectory("graft-q85")
    val q = graft.streaming.StreamNearDup.run(stream, "doc_id", "text",
      s"$tmp/store", s"$tmp/out", s"$tmp/ckpt")
    q.awaitTermination()
    s.read.parquet(s"$tmp/out").select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  // q109: incremental snapshot-vs-arrivals dedup (the CDC ingest shape):
  // docs with doc_id%10 < 8 are the EXISTING corpus, the rest arrive new.
  // Each arrival gets a verdict — 'exact' (md5 match, smallest snapshot
  // id), 'near' (LSH band collision confirmed by >= 8/16 equal minhash
  // components, smallest colliding id), or 'new'. The existing corpus is
  // never re-deduplicated; its signature table is the persisted asset.
  // Oracle: the q27 CTE chain over ALL docs, with cross-side pairs
  // filtered out of `cand` (a doc's signature depends only on itself, so
  // per-side signature builds and the all-docs build agree exactly).
  def q109(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.snapshotDedup(
        d.filter(col("doc_id") % 10 < 8),
        d.filter(col("doc_id") % 10 >= 8),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  // q118: canonical-document ranking — integer fixed-point PageRank
  // (3 damped rounds, e9 ranks, pure long arithmetic) over the LSH
  // candidate graph; the top-ranked docs are the canonical keepers of
  // the densest duplicate neighborhoods. The oracle replays training
  // end to end: the same candidate CTE chain, then the three unrolled
  // iterations in MATERIALIZED CTEs with the identical integer-division
  // contribution chain.
  def q118(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.pageRank(lshPairs(s, dir), iterations = 3)
      .select(col("id").as("doc_id"), col("rank_e9"))
      .orderBy(col("rank_e9").desc, col("doc_id"))
      .limit(20)

  // q125: leakage-free train/val split — the split unit is the NEAR-DUP
  // COMPONENT, not the document: hashing a doc_id instead silently puts
  // near-duplicates of training docs into validation (the classic eval
  // contamination). Split = md5 of the component's canonical id
  // (12/16 hex → ~75% train), so membership is deterministic and every
  // component lands whole. The report carries its own certificate:
  // cross_split_components counts components spanning both splits —
  // structurally 0 here, and the column turns a future "split by doc"
  // regression into an oracle mismatch instead of silent leakage.
  // Scale shape: components from the O(log d) pointer-doubling CC over
  // LSH pairs (q54); the report is two aggregates over the materialized
  // (id, component) table + a broadcast 1-row certificate join.
  def q125(s: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.connectedComponentsFast(lshPairs(s, dir),
        docs(s, dir).select(col("doc_id").as("id")))
      .localCheckpoint(true) // two consumers: split report + certificate
    val sp = comp.withColumn("split",
      when(substring(md5(concat(lit("split:"),
          col("component").cast("string"))), 1, 1) < "c", "train")
        .otherwise("val"))
    val leak = sp.groupBy(col("component"))
      .agg(countDistinct(col("split")).as("__nsp"))
      .agg(sum(when(col("__nsp") > 1, 1L).otherwise(0L))
        .as("cross_split_components"))
    sp.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("component")).as("n_components"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_docs"), col("n_components"),
        col("cross_split_components"))
      .orderBy(col("split"))
  }

  // q167: cross-source DUPLICATION matrix — "which sources copy from
  // which": the q27 LSH candidate pairs lifted to (source, source)
  // cells with pair counts and e4 shares. Within-source mass (the
  // diagonal) is boilerplate; off-diagonal mass is syndication — the
  // numbers that decide which source to dedup FIRST in a 100 TB mix.
  // The matrix is sources²-sized; the one window-total runs on that
  // aggregate, never on the pair stream.
  def q167(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    lshPairs(s, dir)
      .join(d.select(col("doc_id").as("a"), col("source").as("src_a")),
        Seq("a"))
      .join(d.select(col("doc_id").as("b"), col("source").as("src_b")),
        Seq("b"))
      .groupBy(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("share_e4",
        expr("CAST(n_pairs * 10000 div sum(n_pairs) over () AS BIGINT)"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  // q175: triangle census + global clustering coefficient over the
  // LSH candidate graph — is the near-dup graph a loose PATH (chained
  // borderline pairs; keep-one-per-component overreaches) or a dense
  // CLIQUE (true mirror set)? Ordered two-join triangle enumeration,
  // never a cartesian.
  def q175(s: SparkSession, dir: String): DataFrame =
    Dedup.triangleCensus(lshPairs(s, dir))

  // q223: ASYMMETRIC near-CONTAINMENT pairs — the quote/subset case the
  // resemblance tiers (q27 MinHash, q28 SimHash) structurally miss: a
  // short document wholly embedded in a longer one has near-zero
  // Jaccard but containment ≈ 1, and contributes no novel training
  // tokens. Word 5-shingles, boilerplate excluded by the document-
  // frequency cap (the q97 ubiquity discipline — it also bounds join
  // fan-out and skew), containment as the exact e4 integer
  // |A∩B|·10⁴ div min(|A|,|B|) ≥ 0.5. See
  // [[graft.operators.Dedup.containmentPairs]].
  def q223(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
      n = 5, dfCap = 50, minContainE4 = 5000)

  // q225: ENTITY-RESOLUTION capstone — the record-linkage pipeline
  // composed from certified layers (q214's blocking discipline, q122's
  // levenshtein matcher, q54's connected components): the testdata's
  // customer names are synthetically uniform, so the query PLANTS
  // deterministic messy variants (the q63 PII discipline — identical
  // string algebra in both engines): every entity gets a canonical
  // record `cust-DDDDDD-tttt` (tttt an md5 tail making distinct
  // entities far apart in edit space), every k%3 a dash-dropped
  // variant (lev 1), every k%5 a doubled-digit variant (lev 1).
  // Pipeline: block on the perturbation-invariant first-5-digit key
  // (bounds candidate fan-out — never all-pairs), match at
  // levenshtein ≤ 2 within block, cluster via min-label components,
  // report the (cluster_size → n_clusters, n_pure) census — purity =
  // one true entity per cluster, the ER quality read. Rare accidental
  // merges (a neighbor key whose md5 tail lands within the threshold)
  // are part of the measured answer, replayed identically by the
  // oracle's recursive-CTE closure; the spec pins exact
  // precision/recall on a planted fixture. ONE customer scan (variants
  // explode map-side), keyed block join, O(dup-subgraph) clustering.
  def q225(s: SparkSession, dir: String): DataFrame =
    erClusters(graft.Tables.load(s, dir, "customer"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("nents") === 1, 1L).otherwise(0L)).as("n_pure"))
      .orderBy("cluster_size")

  /** q225's ER pipeline up to the per-cluster table (component, sz,
    * nents, min_k) — exposed so the ScaleStress linkage tier can run
    * the SAME plan on replicated cohorts and fingerprint the
    * original-cohort slice.
    */
  def erClusters(customers: DataFrame): DataFrame = {
    val recs = customers
      .select(col("c_custkey").as("k"),
        // lpad TRUNCATES past 10^n (r15 gotcha) — guard in-plan.
        when(col("c_custkey").between(0, 999999),
          lpad(col("c_custkey").cast("string"), 6, "0"))
          .otherwise(raise_error(lit("q225: custkey out of 6 digits")))
          .as("pad"),
        substring(md5(concat(lit("e:"), col("c_custkey").cast("string"))),
          1, 4).as("tail"))
      .select(col("k"), explode(filter(array(
        struct(lit(0L).as("v"),
          concat(lit("cust-"), col("pad"), lit("-"), col("tail"))
            .as("name")),
        struct(lit(1L).as("v"),
          when(col("k") % 3 === 0,
            concat(lit("cust-"), col("pad"), col("tail"))).as("name")),
        struct(lit(2L).as("v"),
          when(col("k") % 5 === 0,
            concat(lit("cust-"), col("pad"), substring(col("pad"), 6, 1),
              lit("-"), col("tail"))).as("name"))),
        s => s.getField("name").isNotNull)).as("r"))
      .select((col("k") * 10 + col("r.v")).as("rec_id"), col("k"),
        col("r.name").as("name"),
        substring(col("r.name"), 6, 5).as("block"))
      .localCheckpoint(true) // join sides + vertex list + purity join
    val edges = recs.as("x").join(recs.as("y"),
        col("x.block") === col("y.block") &&
          col("x.rec_id") < col("y.rec_id") &&
          levenshtein(col("x.name"), col("y.name")) <= 2)
      .select(col("x.rec_id").as("a"), col("y.rec_id").as("b"))
    val comp = graft.operators.Dedup.connectedComponentsFast(edges,
      recs.select(col("rec_id").as("id")))
    comp.join(recs.select(col("rec_id").as("id"), col("k")), "id")
      .groupBy("component")
      .agg(count(lit(1)).as("sz"), countDistinct(col("k")).as("nents"),
        min(col("k")).as("min_k"))
  }

  // q236: MODULARITY of the q197 LPA communities over the q54
  // candidate graph — the "did the communities actually capture the
  // edge structure" number (Newman Q ∈ [−0.5, 1]; ~0 = no better than
  // random given degrees): Q = Σ_c e_c/m − Σ_c d_c²/(4m²), computed
  // as ONE exact rational (Σe·4m − Σd²)·10⁴ div 4m². The per-
  // community sums are keyed aggregates; Σd² accumulates in
  // decimal(38,0) (a giant community's d_c² passes a long at web
  // scale — DuckDB mirrors in HUGEINT); the final division runs on
  // the driver in BigInt over the 1-row sums (the d×d discipline),
  // truncating toward zero exactly like `//`.
  def q236(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = lshPairs(s, dir).localCheckpoint(true)
    val labels = Ranking.labelPropagation(edges,
        docs(s, dir).select(col("doc_id").as("id")), rounds = 4)
      .select(col("id"), col("community"))
      .localCheckpoint(true) // degree join + two intra-edge sides
    val intra = edges
      .join(labels.select(col("id").as("a"), col("community").as("ca")),
        "a")
      .join(labels.select(col("id").as("b"), col("community").as("cb")),
        "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_c"))
    // m rides the same 1-row moment collect as Σe/Σd² (r21): every
    // vertex carries a label, so Σ_c d_c counts each edge's two
    // endpoints exactly once each — m = Σd/2. The separate
    // edges.count() action (one more scheduled job per run) is gone.
    val sums = edges.select(col("a").as("id"))
      .union(edges.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .join(labels, "id")
      .groupBy("community").agg(sum("deg").as("d_c"))
      .join(intra, Seq("community"), "left")
      .agg(sum(coalesce(col("e_c"), lit(0L))).as("se"),
        sum(expr("CAST(d_c AS DECIMAL(38,0)) * d_c")).as("sd2"),
        count(lit(1)).as("ncomm"),
        sum(col("d_c")).as("sdeg"))
      .head()
    val (se, sd2, ncomm) = (sums.getLong(0),
      BigInt(sums.getDecimal(1).toBigInteger), sums.getLong(2))
    val m = sums.getLong(3) / 2
    val qE4 = ((BigInt(se) * 4 * m - sd2) * 10000 /
      (BigInt(4) * m * m)).toLong
    Seq((m, ncomm, se, qE4))
      .toDF("m", "n_communities", "sum_intra", "q_e4")
  }

  // q239: CONTAMINATION BLAST RADIUS — q64 flags train docs that
  // directly share eval n-grams; this answers the question a real
  // decontamination pass must: how far does the leak propagate through
  // the near-dup graph (a near-copy of a contaminated doc carries the
  // leak without sharing the exact 3-grams)? Hop 0 = q64's flagged
  // set (same operator, same threshold — the flags cannot drift),
  // hops 1–2 = new TRAIN docs reached across the q54 LSH candidate
  // edges, each hop one keyed frontier join + anti-joins against the
  // already-reached sets — O(frontier), never a transitive closure
  // materialization. Output per hop: newly reached docs and their
  // token mass — the "how much more must be quarantined" number.
  def q239(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val seeds = graft.operators.Curation.decontaminate(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, threshold = 0.3)
      .filter(col("contaminated"))
      .select(col("doc_id").as("id"))
      .localCheckpoint(true) // hop-0 row + two anti-join consumers
    val e = lshPairs(s, dir)
    val und = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
      // hash on src once, so BOTH frontier joins read the checkpointed
      // edge list exchange-free (guide §2.4; the frontier side is the
      // small one).
      .repartition(s.sessionState.conf.numShufflePartitions, col("src"))
      .localCheckpoint(true) // two frontier joins
    val hop1 = und.join(seeds.select(col("id").as("src")), "src")
      .select(col("dst").as("id")).distinct()
      .filter(col("id") % 50 =!= 0)
      .join(seeds, Seq("id"), "left_anti")
      .localCheckpoint(true) // hop-1 row + two hop-2 consumers
    val hop2 = und.join(hop1.select(col("id").as("src")), "src")
      .select(col("dst").as("id")).distinct()
      .filter(col("id") % 50 =!= 0)
      .join(seeds, Seq("id"), "left_anti")
      .join(hop1, Seq("id"), "left_anti")
    val toks = d.select(col("doc_id").as("id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    // ONE token-mass pass for all three hops (r21): the r19 shape ran
    // one ids⋈toks join + one global aggregate PER hop — three corpus
    // text scans and three aggregate actions for three output rows.
    // The hop sets are disjoint by construction (each hop anti-joins
    // the previous tiers), so tagging and unioning them lets a single
    // join + one grouped aggregate produce every row; the static hop
    // spine keeps the empty-hop zero rows the per-hop global
    // aggregates used to emit.
    import s.implicits._
    val tagged = seeds.select(lit(0L).as("hop"), col("id"))
      .unionByName(hop1.select(lit(1L).as("hop"), col("id")))
      .unionByName(hop2.select(lit(2L).as("hop"), col("id")))
    val perHop = tagged.join(toks, "id")
      .groupBy(col("hop"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok_mass"))
    Seq(0L, 1L, 2L).toDF("hop")
      .join(perHop, Seq("hop"), "left")
      .select(col("hop"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("tok_mass"), lit(0L)).as("tok_mass"))
      .orderBy("hop")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q239_contamination_radius" -> (q239 _),
    "q236_lpa_modularity" -> (q236 _),
    "q225_entity_resolution" -> (q225 _),
    "q223_containment_pairs" -> (q223 _),
    "q175_triangle_census" -> (q175 _),
    "q167_source_overlap" -> (q167 _),
    "q125_leakage_free_split" -> (q125 _),
    "q109_snapshot_dedup" -> (q109 _),
    "q118_canonical_rank" -> (q118 _),
    "q85_stream_neardup" -> (q85 _),
    "q27_minhash_lsh" -> (q27 _),
    "q156_lsh_config_sweep" -> (q156 _),
    "q141_lsh_recall_audit" -> (q141 _),
    "q140_minhash_calibration" -> (q140 _),
    "q28_simhash" -> (q28 _),
    "q29_winnow_fp" -> (q29 _),
    "q30_regex_tokens" -> (q30 _),
    "q52_edit_distance" -> (q52 _),
    "q54_neardup_components" -> (q54 _),
    "q191_token_yield" -> (q191 _),
    "q197_label_propagation" -> (q197 _),
    "q135_neardup_kcore" -> (q135 _),
    "q55_dedup_keep_best" -> (q55 _)
  )

  private val P = graft.operators.Dedup.MinhashPrime
  private val sigMins: String =
    graft.operators.Dedup.minhashParams(16).zipWithIndex
      .map { case ((a, b), j) => s"min((h*$a+$b)%$P) s$j" }
      .mkString(",\n  ")
  private val bandSelects: String =
    (0 until 4).map { b =>
      val parts = (0 until 4).map(r => s"s${4 * b + r}").mkString("||'|'||")
      s"SELECT doc_id, $b AS band, $parts h FROM sig"
    }.mkString("\n  UNION ALL\n  ")

  /** q156's oracle: the q27 signature chain widened to k=48 flat
    * columns (minhashParams is prefix-stable, so the 4×4 config's pair
    * set equals q27's), then per config its OWN band grouping,
    * DISTINCT candidate pairs and the integer-Jaccard τ count,
    * assembled as one-row scalar-subquery CTEs. Each config CTE is
    * stripMargin'd at construction and the final SQL is plain
    * concatenation — no fragment ever meets an outer stripMargin (the
    * SNIPPETS double-strip gotcha).
    */
  private lazy val q156OracleSql: String = {
    val sig48 = graft.operators.Dedup.minhashParams(SweepK).zipWithIndex
      .map { case ((a, b), j) => s"min((h*$a+$b)%$P) s$j" }
      .mkString(",\n  ")
    val header =
      s"""toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
         |idx AS (SELECT doc_id, t, unnest(range(len(t)-2)) AS i FROM toks),
         |sh AS (SELECT DISTINCT doc_id, t[i+1]||' '||t[i+2]||' '||t[i+3] AS shingle FROM idx),
         |shh AS (SELECT doc_id, CAST(('0x'||substr(md5(shingle),1,8)) AS BIGINT) h FROM sh),
         |sig AS MATERIALIZED (SELECT doc_id,
         |  $sig48
         |  FROM shh GROUP BY doc_id)""".stripMargin
    val cfgCtes = SweepCfgs.map { case (b, r) =>
      val k = b * r
      val tag = s"${b}x$r"
      val bandSel = (0 until b).map { bi =>
        val parts = (0 until r).map(j => s"s${bi * r + j}")
          .mkString("||'|'||")
        s"SELECT doc_id, $bi AS band, $parts h FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      val eqSum = (0 until k).map(j =>
        s"CASE WHEN x.s$j = y.s$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""bands_$tag AS MATERIALIZED (
         |  $bandSel),
         |cand_$tag AS MATERIALIZED (SELECT DISTINCT x.doc_id a, y.doc_id b
         |  FROM bands_$tag x JOIN bands_$tag y
         |  ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id),
         |row_$tag AS (SELECT $b AS bands, $r AS rows_per_band,
         |    $k AS k_sig,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_$tag)
         |    AS n_cand_pairs,
         |  (SELECT CAST(COUNT(DISTINCT id) AS BIGINT) FROM
         |     (SELECT a AS id FROM cand_$tag
         |      UNION ALL SELECT b FROM cand_$tag)) AS n_flagged_docs,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_$tag c
         |     JOIN sig x ON x.doc_id = c.a JOIN sig y ON y.doc_id = c.b
         |     WHERE CAST(($eqSum) AS BIGINT) * 10000 // $k
         |       >= $SweepTauE4) AS n_est_dup_pairs)""".stripMargin
    }
    val rowsSel = SweepCfgs
      .map { case (b, r) => s"SELECT * FROM row_${b}x$r" }
      .mkString(" UNION ALL ")
    "WITH " + (header +: cfgCtes).mkString(",\n") +
      "\nSELECT * FROM (" + rowsSel + ") ORDER BY bands, rows_per_band"
  }

  /** Shared CTE chain computing the LSH candidate pairs (`cand(a, b)`) —
    * the q27 oracle body, reused by the recursive clustering oracles and
    * the q109 snapshot-dedup oracle.
    */
  private[queries] val candCte: String =
    s"""toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
       |idx AS (SELECT doc_id, t, unnest(range(len(t)-2)) AS i FROM toks),
       |sh AS (SELECT DISTINCT doc_id, t[i+1]||' '||t[i+2]||' '||t[i+3] AS shingle FROM idx),
       |shh AS (SELECT doc_id, CAST(('0x'||substr(md5(shingle),1,8)) AS BIGINT) h FROM sh),
       |sig AS (SELECT doc_id,
       |  $sigMins
       |  FROM shh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects
       |),
       |cand AS (SELECT DISTINCT x.doc_id a, y.doc_id b
       |  FROM bands x JOIN bands y ON x.band=y.band AND x.h=y.h AND x.doc_id<y.doc_id)""".stripMargin

  /** Recursive transitive closure over the undirected `cand` graph →
    * per-doc component label (min reachable doc_id).
    */
  private val compCte: String =
    s"""$candCte,
       |und AS (SELECT a, b FROM cand UNION ALL SELECT b AS a, a AS b FROM cand),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.id, u.b FROM reach JOIN und u ON reach.r = u.a
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)""".stripMargin

  /** q197's LPA chain as CTEs ending in `l4(id, lbl)` — shared by the
    * q197 and q236 oracles so the community assignment cannot drift.
    */
  private val lpaCtes: String = {
    val roundCtes = (1 to 4).map { i =>
      val prev = s"l${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT und.dst, $prev.lbl,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM und JOIN $prev ON $prev.id = und.src GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT dst, lbl FROM (
         |    SELECT dst, lbl, ROW_NUMBER() OVER (PARTITION BY dst
         |      ORDER BY c DESC, lbl) AS rk FROM c$i) WHERE rk = 1),
         |l$i AS MATERIALIZED (SELECT $prev.id,
         |    COALESCE(b$i.lbl, $prev.lbl) AS lbl
         |  FROM $prev LEFT JOIN b$i ON b$i.dst = $prev.id)""".stripMargin
    }.mkString(",\n")
    s"""$candCte,
       |und AS MATERIALIZED (SELECT a AS src, b AS dst FROM cand
       |  UNION ALL SELECT b, a FROM cand),
       |l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl
       |  FROM documents),
       |$roundCtes""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // q239: q64's seed CTE (same ROUND-threshold flag), the shared
    // candidate chain, and two unrolled frontier hops with the same
    // train-only filter and anti-join discipline.
    "q239_contamination_radius" ->
      s"""WITH $candCte,
         |und AS MATERIALIZED (SELECT a AS src, b AS dst FROM cand
         |  UNION ALL SELECT b, a FROM cand),
         |toksq AS (SELECT doc_id, regexp_split_to_array(text, ' ') t
         |  FROM documents),
         |posq AS (SELECT doc_id, t, unnest(range(1, len(t) - 2 + 1))
         |    AS i FROM toksq),
         |ngq AS (SELECT doc_id,
         |    list_aggregate(t[i:i+2], 'string_agg', ' ') AS g
         |  FROM posq),
         |evq AS (SELECT DISTINCT g FROM ngq WHERE doc_id % 50 = 0),
         |seeds AS MATERIALIZED (SELECT doc_id AS id FROM (
         |    SELECT doc_id, COUNT(*) AS n_ngrams,
         |      SUM(CASE WHEN g IN (SELECT g FROM evq) THEN 1 ELSE 0 END)
         |        AS n_hits
         |    FROM ngq WHERE doc_id % 50 <> 0 GROUP BY doc_id)
         |  WHERE ROUND(n_hits * 1.0 / n_ngrams, 4) >= 0.3),
         |h1 AS MATERIALIZED (SELECT DISTINCT und.dst AS id
         |  FROM und JOIN seeds ON seeds.id = und.src
         |  WHERE und.dst % 50 <> 0
         |    AND und.dst NOT IN (SELECT id FROM seeds)),
         |h2 AS MATERIALIZED (SELECT DISTINCT und.dst AS id
         |  FROM und JOIN h1 ON h1.id = und.src
         |  WHERE und.dst % 50 <> 0
         |    AND und.dst NOT IN (SELECT id FROM seeds)
         |    AND und.dst NOT IN (SELECT id FROM h1)),
         |tk AS (SELECT doc_id AS id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
         |  FROM documents)
         |SELECT CAST(0 AS BIGINT) AS hop,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS tok_mass
         |FROM seeds JOIN tk USING (id)
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(SUM(ntok), 0) AS BIGINT)
         |FROM h1 JOIN tk USING (id)
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(SUM(ntok), 0) AS BIGINT)
         |FROM h2 JOIN tk USING (id)
         |ORDER BY hop""".stripMargin,
    // q225: the same planted variants, block join, lev ≤ 2 match, and
    // a recursive-CTE reachability closure whose MIN(r) is exactly the
    // engine's min-label component.
    "q225_entity_resolution" ->
      """WITH RECURSIVE base AS (SELECT c_custkey AS k,
        |    lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS pad,
        |    substring(md5('e:' || CAST(c_custkey AS VARCHAR)), 1, 4)
        |      AS tail
        |  FROM customer),
        |recs AS MATERIALIZED (
        |  SELECT k * 10 AS rec_id, k,
        |    'cust-' || pad || '-' || tail AS name FROM base
        |  UNION ALL SELECT k * 10 + 1, k, 'cust-' || pad || tail
        |  FROM base WHERE k % 3 = 0
        |  UNION ALL SELECT k * 10 + 2, k,
        |    'cust-' || pad || substring(pad, 6, 1) || '-' || tail
        |  FROM base WHERE k % 5 = 0),
        |blocked AS MATERIALIZED (SELECT rec_id, k, name,
        |    substring(name, 6, 5) AS block FROM recs),
        |edges AS MATERIALIZED (SELECT x.rec_id AS a, y.rec_id AS b
        |  FROM blocked x JOIN blocked y ON x.block = y.block
        |    AND x.rec_id < y.rec_id
        |    AND levenshtein(x.name, y.name) <= 2),
        |und AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
        |reach(id, r) AS (
        |  SELECT rec_id, rec_id FROM recs
        |  UNION
        |  SELECT reach.id, u.b FROM reach JOIN und u ON reach.r = u.a),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |cl AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz,
        |    COUNT(DISTINCT bl.k) AS nents
        |  FROM comp JOIN blocked bl ON bl.rec_id = comp.id GROUP BY 1)
        |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(CASE WHEN nents = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pure
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    // q223: the engine's 0-based sequence(0, len−n) shingle windows are
    // DuckDB's 1-based inclusive slices ts[i:i+4] over generate_series
    // (1, len−4); both sides split on single spaces with empties kept.
    "q223_containment_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |pos AS (SELECT doc_id, ts,
        |    unnest(generate_series(1, len(ts) - 4)) AS i
        |  FROM toks WHERE len(ts) >= 5),
        |sh AS MATERIALIZED (SELECT DISTINCT doc_id,
        |    list_aggregate(ts[i:i+4], 'string_agg', ' ') AS s
        |  FROM pos),
        |rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 50),
        |cand AS MATERIALIZED (SELECT sh.doc_id, sh.s
        |  FROM sh JOIN rare USING (s)),
        |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM cand GROUP BY 1),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |    CAST(COUNT(*) AS BIGINT) AS i
        |  FROM cand x JOIN cand y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, sa.n AS n_a, sb.n AS n_b, i AS inter,
        |  CAST(i * 10000 // LEAST(sa.n, sb.n) AS BIGINT)
        |    AS containment_e4
        |FROM inter JOIN sizes sa ON sa.doc_id = a
        |JOIN sizes sb ON sb.doc_id = b
        |WHERE i * 10000 // LEAST(sa.n, sb.n) >= 5000
        |ORDER BY containment_e4 DESC, a, b""".stripMargin,
    // q175: ordered (a<b<c) triangle enumeration — (a,b)⋈(b,c) on the
    // shared vertex, closing (a,c) via join; wedges from the degree
    // table; the single 3T/W division in the engine's exact shape.
    "q175_triangle_census" ->
      s"""WITH $candCte,
         |e AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a,
         |    greatest(a, b) AS b FROM cand WHERE a <> b),
         |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
         |  GROUP BY v),
         |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w,
         |    CAST(COUNT(*) AS BIGINT) AS nv FROM deg),
         |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS ne FROM e),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
         |  FROM e e1 JOIN e e2 ON e1.b = e2.a
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT w.nv AS n_vertices, ne.ne AS n_edges, w.w AS n_wedges,
         |  t.t AS n_triangles,
         |  CASE WHEN w.w = 0 THEN 0e0
         |    ELSE CAST(3 * t.t AS DOUBLE) / w.w END AS global_cc
         |FROM w, ne, t""".stripMargin,
    // q167: the candidate-pair CTE lifted to a source×source matrix;
    // window total over the aggregate, `//` on non-negatives.
    "q167_source_overlap" ->
      s"""WITH $candCte,
         |j AS (SELECT least(da.source, db.source) AS source_lo,
         |        greatest(da.source, db.source) AS source_hi
         |      FROM cand JOIN documents da ON da.doc_id = cand.a
         |      JOIN documents db ON db.doc_id = cand.b)
         |SELECT source_lo, source_hi,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(COUNT(*) * 10000 // SUM(COUNT(*)) OVER () AS BIGINT)
         |    AS share_e4
         |FROM j GROUP BY source_lo, source_hi
         |ORDER BY source_lo, source_hi""".stripMargin,
    "q141_lsh_recall_audit" ->
      s"""WITH $candCte,
         |shs AS (SELECT doc_id, shingle FROM sh WHERE doc_id < 300),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n
         |        FROM shs GROUP BY doc_id),
         |it AS (SELECT x.doc_id a, y.doc_id b, CAST(COUNT(*) AS BIGINT) i
         |  FROM shs x JOIN shs y
         |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id),
         |truth AS (SELECT it.a, it.b FROM it
         |  JOIN cnt ca ON ca.doc_id = it.a
         |  JOIN cnt cb ON cb.doc_id = it.b
         |  WHERE it.i * 10000 // (ca.n + cb.n - it.i) >= 2000),
         |pred AS (SELECT a, b FROM cand WHERE a < 300 AND b < 300),
         |m AS (SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) nt,
         |  CAST((SELECT COUNT(*) FROM pred) AS BIGINT) np,
         |  CAST((SELECT COUNT(*) FROM truth t JOIN pred p
         |        ON t.a = p.a AND t.b = p.b) AS BIGINT) tp)
         |SELECT nt AS n_truth, np AS n_pred, tp, np - tp AS fp,
         |  nt - tp AS fn,
         |  CAST(CASE WHEN np = 0 THEN -1 ELSE tp * 10000 // np END
         |    AS BIGINT) AS precision_e4,
         |  CAST(CASE WHEN nt = 0 THEN -1 ELSE tp * 10000 // nt END
         |    AS BIGINT) AS recall_e4
         |FROM m""".stripMargin,
    "q140_minhash_calibration" ->
      s"""WITH $candCte,
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n
         |        FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) i
         |  FROM cand c JOIN sh x ON x.doc_id = c.a
         |  JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
         |  GROUP BY c.a, c.b),
         |eq AS (SELECT c.a, c.b, CAST(CASE WHEN sa.s0 = sb.s0 THEN 1 ELSE 0 END + CASE WHEN sa.s1 = sb.s1 THEN 1 ELSE 0 END + CASE WHEN sa.s2 = sb.s2 THEN 1 ELSE 0 END + CASE WHEN sa.s3 = sb.s3 THEN 1 ELSE 0 END + CASE WHEN sa.s4 = sb.s4 THEN 1 ELSE 0 END + CASE WHEN sa.s5 = sb.s5 THEN 1 ELSE 0 END + CASE WHEN sa.s6 = sb.s6 THEN 1 ELSE 0 END + CASE WHEN sa.s7 = sb.s7 THEN 1 ELSE 0 END + CASE WHEN sa.s8 = sb.s8 THEN 1 ELSE 0 END + CASE WHEN sa.s9 = sb.s9 THEN 1 ELSE 0 END + CASE WHEN sa.s10 = sb.s10 THEN 1 ELSE 0 END + CASE WHEN sa.s11 = sb.s11 THEN 1 ELSE 0 END + CASE WHEN sa.s12 = sb.s12 THEN 1 ELSE 0 END + CASE WHEN sa.s13 = sb.s13 THEN 1 ELSE 0 END + CASE WHEN sa.s14 = sb.s14 THEN 1 ELSE 0 END + CASE WHEN sa.s15 = sb.s15 THEN 1 ELSE 0 END AS BIGINT) e
         |  FROM cand c JOIN sig sa ON sa.doc_id = c.a
         |  JOIN sig sb ON sb.doc_id = c.b),
         |j AS (SELECT e1.a, e1.b,
         |    CAST(e1.e * 10000 // 16 AS BIGINT) AS est_e4,
         |    CAST(COALESCE(i.i, 0) * 10000
         |      // (ca.n + cb.n - COALESCE(i.i, 0)) AS BIGINT) AS exact_e4
         |  FROM eq e1 JOIN cnt ca ON ca.doc_id = e1.a
         |  JOIN cnt cb ON cb.doc_id = e1.b
         |  LEFT JOIN inter i ON i.a = e1.a AND i.b = e1.b)
         |SELECT a, b, est_e4, exact_e4,
         |  CAST(abs(est_e4 - exact_e4) AS BIGINT) AS abs_err_e4
         |FROM j ORDER BY a, b""".stripMargin,
    "q27_minhash_lsh" ->
      s"""WITH $candCte
         |SELECT a, b FROM cand ORDER BY a, b""".stripMargin,
    "q156_lsh_config_sweep" -> q156OracleSql,
    "q118_canonical_rank" -> {
      val iters = (1 to 3).map { i =>
        val p = if (i == 1) "r0" else s"r${i - 1}"
        s"""c$i AS MATERIALIZED (SELECT und.dst,
           |  CAST(SUM(r // 100 // deg * 85) AS BIGINT) AS cin
           |  FROM und JOIN $p ON $p.id = und.src
           |  JOIN deg ON deg.src = und.src GROUP BY 1),
           |r$i AS MATERIALIZED (SELECT $p.id,
           |  CAST(150000000 + COALESCE(c$i.cin, 0) AS BIGINT) AS r
           |  FROM $p LEFT JOIN c$i ON c$i.dst = $p.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $candCte,
         |und AS MATERIALIZED (SELECT a AS src, b AS dst FROM cand
         |  UNION ALL SELECT b AS src, a AS dst FROM cand),
         |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM und GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT src AS id,
         |  CAST(1000000000 AS BIGINT) AS r FROM deg),
         |$iters
         |SELECT id AS doc_id, r AS rank_e9 FROM r3
         |ORDER BY rank_e9 DESC, doc_id LIMIT 20""".stripMargin
    },
    "q109_snapshot_dedup" -> {
      val eqSum = (0 until 16)
        .map(j => s"CASE WHEN x.s$j = y.s$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $candCte,
         |cr AS (SELECT CASE WHEN a % 10 < 8 THEN a ELSE b END AS s,
         |         CASE WHEN a % 10 < 8 THEN b ELSE a END AS ar
         |       FROM cand WHERE (a % 10 < 8) <> (b % 10 < 8)),
         |sims AS (SELECT cr.ar, cr.s, ($eqSum) AS eq
         |         FROM cr JOIN sig x ON x.doc_id = cr.s
         |         JOIN sig y ON y.doc_id = cr.ar),
         |near AS (SELECT ar, MIN(s) AS nid FROM sims WHERE eq >= 8
         |         GROUP BY ar),
         |em AS (SELECT md5(text) AS m, MIN(doc_id) AS sid FROM documents
         |       WHERE doc_id % 10 < 8 GROUP BY 1),
         |arr AS (SELECT doc_id, md5(text) AS m FROM documents
         |        WHERE doc_id % 10 >= 8),
         |ex AS (SELECT arr.doc_id, em.sid FROM arr
         |       LEFT JOIN em USING (m))
         |SELECT ex.doc_id,
         |  CASE WHEN ex.sid IS NOT NULL THEN 'exact'
         |       WHEN near.nid IS NOT NULL THEN 'near'
         |       ELSE 'new' END AS verdict,
         |  COALESCE(ex.sid, near.nid) AS matched
         |FROM ex LEFT JOIN near ON near.ar = ex.doc_id
         |ORDER BY ex.doc_id""".stripMargin
    },
    "q85_stream_neardup" -> {
      val simSum = (0 until 16)
        .map(j => s"CASE WHEN x.s$j = y.s$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $candCte,
         |sims AS (SELECT c.a, c.b, ($simSum) / 16.0 AS sim
         |  FROM cand c JOIN sig x ON x.doc_id = c.a
         |  JOIN sig y ON y.doc_id = c.b),
         |drops AS (SELECT DISTINCT b FROM sims WHERE sim >= 0.5)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT b FROM drops)
         |ORDER BY doc_id""".stripMargin
    },
    "q54_neardup_components" ->
      s"""WITH RECURSIVE $compCte
         |SELECT id AS doc_id, component FROM comp ORDER BY doc_id""".stripMargin,
    // q197: four unrolled synchronous LPA rounds (MATERIALIZED — DuckDB
    // re-inlines plain CTEs exponentially), min-label tie-break in the
    // per-dst argmax, isolated vertices carried by the LEFT JOIN.
    "q197_label_propagation" ->
      s"""WITH $lpaCtes
         |SELECT id AS doc_id, lbl AS community,
         |  CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT)
         |    AS community_size
         |FROM l4 ORDER BY doc_id""".stripMargin,
    // q236: the shared LPA chain, then degree/intra-edge sums per
    // community; the modularity products run in HUGEINT (Σd² needs
    // past a long at web scale) and truncate toward zero exactly like
    // the engine's driver BigInt.
    "q236_lpa_modularity" ->
      s"""WITH $lpaCtes,
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM cand),
         |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM cand UNION ALL SELECT b FROM cand)
         |  GROUP BY 1),
         |dl AS (SELECT l4.lbl AS community,
         |    CAST(SUM(deg.deg) AS BIGINT) AS d_c
         |  FROM deg JOIN l4 ON l4.id = deg.id GROUP BY 1),
         |ie AS (SELECT x.lbl AS community, CAST(COUNT(*) AS BIGINT)
         |      AS e_c
         |  FROM cand JOIN l4 x ON x.id = cand.a
         |  JOIN l4 y ON y.id = cand.b AND y.lbl = x.lbl GROUP BY 1),
         |s AS (SELECT
         |    CAST(SUM(COALESCE(ie.e_c, 0)) AS HUGEINT) AS se,
         |    CAST(SUM(CAST(dl.d_c AS HUGEINT) * dl.d_c) AS HUGEINT)
         |      AS sd2,
         |    CAST(COUNT(*) AS BIGINT) AS ncomm
         |  FROM dl LEFT JOIN ie USING (community))
         |SELECT mm.m, s.ncomm AS n_communities,
         |  CAST(s.se AS BIGINT) AS sum_intra,
         |  CAST((s.se * 4 * mm.m - s.sd2) * 10000
         |    // (4 * CAST(mm.m AS HUGEINT) * mm.m) AS BIGINT) AS q_e4
         |FROM mm CROSS JOIN s""".stripMargin,
    // q191: the q54 component chain + md5 exact-keep marks folded into
    // one per-source aggregate of the token masses.
    "q191_token_yield" ->
      s"""WITH RECURSIVE $compCte,
         |base AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         |    md5(text) AS h
         |  FROM documents),
         |ek AS (SELECT MIN(doc_id) AS doc_id FROM base GROUP BY h),
         |nk AS (SELECT id AS doc_id FROM comp WHERE id = component)
         |SELECT base.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(ntok) AS BIGINT) AS tok_raw,
         |  CAST(SUM(CASE WHEN ek.doc_id IS NOT NULL THEN ntok ELSE 0 END)
         |    AS BIGINT) AS tok_exact,
         |  CAST(SUM(CASE WHEN nk.doc_id IS NOT NULL THEN ntok ELSE 0 END)
         |    AS BIGINT) AS tok_neardup,
         |  CAST(SUM(CASE WHEN nk.doc_id IS NOT NULL THEN ntok ELSE 0 END)
         |    * 10000 // SUM(ntok) AS BIGINT) AS yield_e4
         |FROM base LEFT JOIN ek ON base.doc_id = ek.doc_id
         |LEFT JOIN nk ON base.doc_id = nk.doc_id
         |GROUP BY base.source ORDER BY base.source""".stripMargin,
    // q135: four unrolled peel rounds over the candidate pair graph
    // (MATERIALIZED — DuckDB re-inlines plain CTEs exponentially), then
    // the same degree/core/witness join the engine emits.
    "q135_neardup_kcore" -> {
      val rounds = (1 to 4).map { i =>
        val p = s"e${i - 1}"
        s"""k$i AS MATERIALIZED (SELECT src FROM $p GROUP BY src
           |  HAVING COUNT(*) >= 2),
           |e$i AS MATERIALIZED (SELECT $p.src, $p.dst FROM $p
           |  JOIN k$i x ON $p.src = x.src
           |  JOIN k$i y ON $p.dst = y.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH $candCte,
         |e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM cand
         |  UNION ALL SELECT b AS src, a AS dst FROM cand),
         |d0 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM e0
         |       GROUP BY src),
         |$rounds,
         |cd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS core_degree
         |       FROM e4 GROUP BY src),
         |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_unstable FROM cd
         |      WHERE core_degree < 2)
         |SELECT d0.src AS doc_id, d0.degree,
         |  CASE WHEN cd.src IS NULL THEN 0 ELSE 1 END AS in_core,
         |  CAST(COALESCE(cd.core_degree, 0) AS BIGINT) AS core_degree,
         |  u.n_unstable
         |FROM d0 LEFT JOIN cd ON d0.src = cd.src CROSS JOIN u
         |ORDER BY doc_id""".stripMargin
    },
    "q125_leakage_free_split" ->
      s"""WITH RECURSIVE $compCte,
         |sp AS (SELECT id, component,
         |    CASE WHEN substr(md5('split:' || CAST(component AS VARCHAR)),
         |        1, 1) < 'c' THEN 'train' ELSE 'val' END AS split
         |  FROM comp),
         |pc AS (SELECT component, COUNT(DISTINCT split) AS nsp
         |       FROM sp GROUP BY component),
         |leak AS (SELECT CAST(SUM(CASE WHEN nsp > 1 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS cross_split_components FROM pc)
         |SELECT sp.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT sp.component) AS BIGINT) AS n_components,
         |  leak.cross_split_components
         |FROM sp CROSS JOIN leak
         |GROUP BY sp.split, leak.cross_split_components
         |ORDER BY sp.split""".stripMargin,
    "q55_dedup_keep_best" ->
      s"""WITH RECURSIVE $compCte,
         |lens AS (SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS len
         |         FROM documents),
         |ranked AS (SELECT c.id, c.component, l.len,
         |    ROW_NUMBER() OVER (PARTITION BY c.component
         |                       ORDER BY l.len DESC, c.id) AS rn
         |  FROM comp c JOIN lens l ON l.doc_id = c.id)
         |SELECT id AS doc_id, component, len FROM ranked
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q28_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) tok FROM documents),
        |h AS (SELECT doc_id, CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) h
        |      FROM toks WHERE len(tok)>0),
        |hb AS (SELECT doc_id, h, unnest(range(60)) AS j FROM h),
        |bits AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) s
        |         FROM hb GROUP BY doc_id, j)
        |SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
        |  ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q29_winnow_fp" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(range(len(t)-2)) AS i FROM toks),
        |sh AS (SELECT doc_id, i AS pos,
        |  CAST(('0x'||substr(md5(t[i+1]||' '||t[i+2]||' '||t[i+3]),1,15)) AS BIGINT) AS h
        |  FROM idx),
        |w AS (SELECT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) fp FROM sh)
        |SELECT doc_id, COUNT(DISTINCT fp) AS n_fp FROM w GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q30_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q52_edit_distance" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 80) AS t FROM documents
        |           WHERE doc_id < 30)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(levenshtein(x.t, y.t) AS INTEGER) AS dist
        |FROM d x JOIN d y ON x.doc_id < y.doc_id
        |WHERE levenshtein(x.t, y.t) <= 60
        |ORDER BY a, b""".stripMargin
  )
}
