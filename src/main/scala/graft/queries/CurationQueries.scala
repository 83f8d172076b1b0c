package graft.queries

import graft.Tables
import graft.operators.{Curation, Layout, Stats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q62–q66: training-data curation surface (operators/Curation.scala) —
  * PII scrubbing, benchmark decontamination, Gopher-style repetition
  * rules, and deterministic stratified sampling, all DuckDB-oracle-checked
  * over the documents table.
  *
  * The testdata text is digit-free word soup, so q63 PLANTS deterministic
  * PII (email/IP/phone fragments derived from doc_id) identically in both
  * engines before detecting and redacting it — the operator is generic,
  * the query certifies detection+redaction byte-for-byte via md5.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // q63: PII detect + redact. Every 3rd doc gets an email, every 4th an
  // IP, every 5th a phone — so counts vary and some docs carry none.
  def q63(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).withColumn("text2",
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact doc"), col("doc_id"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" host 10.0."), col("doc_id") % 256,
            lit(".1"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555 "),
            lpad(col("doc_id") % 10000, 4, "0"))).otherwise(lit(""))))
    Curation.piiScrub(planted, "text2")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  // q64: train/eval 3-gram overlap decontamination; eval set = every 50th
  // doc. The corpus's planted near-dups surface as contaminated docs.
  def q64(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.decontaminate(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, threshold = 0.3)
      .orderBy(col("doc_id"))
  }

  // q65: Gopher-style repetition/quality rules.
  def q65(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionStats(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // q66: deterministic md5-bucket stratified sample: en 50%, zh 25%,
  // de/es/fr 12.5%.
  def q66(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(docs(s, dir), "lang", "doc_id",
        Map("en" -> "80", "zh" -> "40", "de" -> "20", "es" -> "20",
          "fr" -> "20"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  // q67: Morton (Z-order) clustering key over (l_partkey, l_suppkey) —
  // the data-layout operator's key function certified bit-for-bit (the
  // oracle SQL is generated from the same (col, bit) loop); the write-side
  // repartitionByRange+sort and the locality payoff are spec'd in
  // LayoutSpec.
  def q67(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.Layout.zorderKey(
          Seq(col("l_partkey"), col("l_suppkey")), bits = 16).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      .limit(500)

  // q224: HILBERT vs Z-ORDER locality audit — the layout decision q67's
  // Morton key leaves open: for the same 2D clustering dims
  // (customer bucket × season half-day-of-year), which curve maps a
  // rectangular predicate to the TIGHTER contiguous key range? The
  // metric is scan amplification: rows a contiguous [min_key, max_key]
  // range fetch reads, over rows the rectangle actually wants — the
  // file-skipping payoff a range-partitioned store sees from footer
  // stats, measured instead of asserted. Hilbert's grid-adjacent steps
  // beat Z-order's quadrant seams on square-ish windows (Jagadish,
  // SIGMOD'90); the wide stripe shows the reverse can hold too — that
  // is the audit's point. Scale shape: both keys ride the scan as
  // codegen'd expression algebra ([[Layout.hilbertKey]] — bits chained
  // projections, no UDF); TWO corpus passes total (rect bounds, then
  // fetch counts with the 3-row bounds folded in as literals); driver
  // state is rect-count-bounded. The oracle replays the curve from the
  // same per-level SQL fragments, so the engines cannot drift.
  def q224(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rects = Seq(("square", 64L, 95L, 60L, 89L),
      ("wide", 0L, 255L, 80L, 84L), ("tall", 100L, 103L, 0L, 181L))
    val keyed = Layout.hilbertKey(
      Tables.load(s, dir, "orders")
        .select((col("o_custkey") % 256).as("x"),
          expr("cast((dayofyear(o_orderdate) - 1) div 2 as long)").as("y"))
        .withColumn("zkey", Layout.zorderKey(Seq(col("x"), col("y")), 8)),
      col("x"), col("y"), 8, "hkey")
    val rdf = rects.toDF("rect", "x0", "x1", "y0", "y1")
    val bounds = keyed.join(broadcast(rdf),
        col("x") >= col("x0") && col("x") <= col("x1") &&
          col("y") >= col("y0") && col("y") <= col("y1"))
      .groupBy("rect")
      .agg(count(lit(1)).as("nr"),
        min("hkey").as("hmin"), max("hkey").as("hmax"),
        min("zkey").as("zmin"), max("zkey").as("zmax"))
      .collect() // 3 rows — rect-count-bounded driver state
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val aggs = bounds.flatMap { case (rect, _, hmin, hmax, zmin, zmax) =>
      Seq(sum(when(col("hkey") >= hmin && col("hkey") <= hmax, 1L)
          .otherwise(0L)).as(s"h_$rect"),
        sum(when(col("zkey") >= zmin && col("zkey") <= zmax, 1L)
          .otherwise(0L)).as(s"z_$rect"))
    }.toSeq
    val fetched = keyed.agg(aggs.head, aggs.tail: _*).head()
    bounds.toSeq.flatMap { case (rect, nr, _, _, _, _) =>
      val fh = fetched.getAs[Long](s"h_$rect")
      val fz = fetched.getAs[Long](s"z_$rect")
      Seq(("hilbert", rect, nr, fh, fh * 10000L / nr),
        ("zorder", rect, nr, fz, fz * 10000L / nr))
    }.toDF("curve", "rect", "n_rows", "n_fetch", "amp_e4")
      .orderBy("curve", "rect")
  }

  // q68: temperature-balanced language sampling (alpha=0.5, target 30%):
  // heavy strata are downsampled toward the flattened p^alpha mixture.
  def q68(s: SparkSession, dir: String): DataFrame =
    Curation.temperatureSample(docs(s, dir), "lang", "doc_id",
        alpha = 0.5, targetFrac = 0.3)
      .select(col("doc_id"), col("lang"), col("rate"))
      .orderBy(col("doc_id"))

  // q70: sequence packing — documents into 512-token training bins via
  // the start-based window rule, computed with the DISTRIBUTED two-pass
  // prefix sum (never a single-partition global window); the oracle
  // replays the same rule as a SQL window. Per-bin stats certify both
  // the assignment and the aggregate shape. The exact no-overflow greedy
  // variant is spec-gated (PackingSpec).
  def q70(s: SparkSession, dir: String): DataFrame = {
    val withTokens = docs(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    graft.operators.Packing.packByStart(withTokens, "doc_id", "n_toks",
        capacity = 512)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bin"))
  }

  /** q154's capacity ladder — the candidate max-seq-len values whose
    * waste curve the audit measures.
    */
  private val PackCaps: Seq[Int] = Seq(128, 256, 512, 1024)

  // q154: packing-capacity CURVE — the measurement behind choosing
  // max_seq_len for a 100 TB tokenization+packing commit (q70 packs at
  // ONE capacity; the decision needs the ladder). The corpus-sized work
  // is ONE distributed exclusive prefix sum (Packing.prefixSums, the
  // q70 two-pass shape — never a single-partition window); every
  // capacity's metrics then derive from the SAME cumulative starts via
  // a map-side explode: bins opened (distinct start bins), straddling
  // docs ((cum mod L) + n > L), overflow tokens past each straddler's
  // boundary, and utilization = corpus tokens vs opened capacity (e4,
  // can exceed 10000 exactly because the start-rule lets a straddler
  // overflow its bin — the quantity the pack-then-truncate practice
  // trades against bin count). All-integer; the oracle replays the
  // cumsum as a SQL window and the same modular algebra.
  def q154(s: SparkSession, dir: String): DataFrame = {
    val withTokens = docs(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    val ps = graft.operators.Packing.prefixSums(withTokens, "doc_id",
      "n_toks")
    ps.select(col("n_tokens"), col("cum_before"),
        explode(array(PackCaps.map(lit): _*)).as("capacity"))
      .groupBy(col("capacity"))
      .agg(
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(expr("cum_before div capacity")).as("n_bins"),
        sum(when(expr("cum_before % capacity + n_tokens > capacity"), 1L)
          .otherwise(0L)).as("n_straddlers"),
        sum(greatest(expr("cum_before % capacity + n_tokens - capacity"),
          lit(0L))).as("over_tokens"))
      .withColumn("util_e4",
        expr("total_tokens * 10000 div (n_bins * capacity)"))
      .orderBy(col("capacity"))
  }

  // q74: table profiling (ANALYZE-style column stats) over orders — one
  // narrow base-stats aggregate + one stacked exact-distinct pipeline
  // (no Expand row replication); exact distincts so the oracle can
  // replay it. Restricted to integer/string columns on purpose: the
  // type-uniform string min/max renders doubles and timestamps with
  // engine-specific formats ('1.0E-4' vs '0.0001'), which would false-
  // fail the oracle — profile those with the operator, not the oracle.
  def q74(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.profile(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority")),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("column"))

  // q78: bloom-filter decontamination — same train/eval split and output
  // shape as q64, hit-testing through the PORTABLE Bloom tier
  // (engine-neutral md5 bit layout) so the oracle replays the exact
  // verdicts, false-positive collisions included (full oracle since r10;
  // was rows-only on the native BloomFilterAggregate sketch, whose
  // Spark-internal layout SQL cannot reproduce). The native tier stays
  // the cluster fast path and keeps its SketchesSpec envelope pin; the
  // m/k here are sized to EXERCISE collisions at sf0.1 (~4.5k distinct
  // eval grams on 2^15 bits ⇒ a few % fpp) instead of hiding them.
  val Q78Bits = 1 << 15
  val Q78Hashes = 5
  def q78(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.decontaminateBloomPortable(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, threshold = 0.3,
        numBits = Q78Bits, numHashes = Q78Hashes)
      .orderBy(col("doc_id"))
  }

  // q79: HLL approximate profiling — q74's documented 100 TB swap-in
  // made executable AND oracle-replayable: the portable HLL (md5 hex
  // algebra, integer registers) lets DuckDB reproduce the ESTIMATES
  // bit-for-bit, so the whole row hash-matches — nulls/min/max exact,
  // distincts sketched, nothing rows-only. Spark's native HLL++ tier
  // ([[graft.operators.Stats.profileApprox]]) stays envelope-pinned in
  // SketchesSpec.
  def q79(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.profileApproxPortable(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority")),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("column"))

  // q97: leakage attribution — which train docs carry which eval doc's
  // content (same split as q64/q78): (eval, train) pairs sharing >= 3
  // distinct 3-grams after the ubiquity prefilter, with the fraction of
  // the eval doc covered. The triage report behind q64's verdict.
  def q97(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.leakageReport(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, minShared = 3, maxTrainDf = 100)
      .orderBy(col("eval_id"), col("train_id"))
  }

  // q80: key-skew report over events.user_id — the diagnostic run before
  // choosing a join/partitioning strategy; exact and oracle-replayed.
  def q80(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.keySkew(
        Tables.load(s, dir, "events"), "user_id", topK = 20)
      .orderBy(col("cnt").desc, col("key"))

  // q81: deterministic seeded corpus shuffle (training order) — position
  // is md5(seed || doc_id); first 100 rows of the shuffled order.
  def q81(s: SparkSession, dir: String): DataFrame =
    Curation.seededShuffle(docs(s, dir), "doc_id", "epoch7")
      .select(col("doc_id"), col("lang"), col("shuffle_key"))
      .limit(100)

  // q82: deterministic weighted upsampling with replacement — epoch
  // mixing at weights en×0.5, zh×2.5, de×1.0, es×3.0, fr×1.25.
  def q82(s: SparkSession, dir: String): DataFrame =
    Curation.upsample(docs(s, dir), "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 2.5, "de" -> 1.0, "es" -> 3.0,
          "fr" -> 1.25))
      .select(col("doc_id"), col("lang"), col("copy"))
      .orderBy(col("doc_id"), col("copy"))

  // q83: the composed curation pipeline — quality filter (q65's verdict)
  // → exact text dedup (min doc_id wins) → stratified sample (q66's
  // rule) → sequence packing (q70's distributed prefix sum) — certifying
  // that the operators COMPOSE, end to end, against one replayed oracle.
  def q83(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val kept = Curation.repetitionStats(d, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    // Exact dedup as ONE hash aggregate instead of a text-partitioned
    // row_number window (r22, guide §2.3): the window shuffled and
    // SORTED every kept row (full text payload) to keep one per text;
    // min over a (doc_id, lang) struct picks the identical min-doc_id
    // winner (doc_id leads the struct and is unique, so the lexical
    // min IS the window's rank-1 row) with map-side partial
    // aggregation, and the downstream steps only need (doc_id, lang,
    // text).
    val unique = d.join(kept, Seq("doc_id"))
      .groupBy(col("text"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"), col("__w.lang").as("lang"),
        col("text"))
    val samp = Curation.stratifiedSample(unique, "lang", "doc_id",
      Map("en" -> "80", "zh" -> "40", "de" -> "20", "es" -> "20",
        "fr" -> "20"))
    val withTokens = samp
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    graft.operators.Packing.packByStart(withTokens, "doc_id", "n_toks",
        capacity = 512)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bin"))
  }

  // q129: k-anonymity release report over the (lang, source)
  // quasi-identifier — under-k combinations generalize up the lattice
  // (lang, source) → (lang, '*') → ('*', '*'), still-under-k remainder
  // is suppressed. The corpus crosses ONE aggregate; the walk is
  // bounded-cells-table algebra.
  def q129(s: SparkSession, dir: String): DataFrame =
    Curation.kAnonymize(docs(s, dir), "lang", "source", k = 5)
      .orderBy(col("level"), col("lang"), col("source"))

  // q131: UniMax language-budget waterfill — spend a 150%-of-corpus
  // token budget across languages as uniformly as possible with at most
  // 2 epochs per language: small languages saturate at their cap, the
  // freed budget waterfills the rest (the budget deliberately exceeds
  // one corpus epoch so the cap BINDS — the regime UniMax is for).
  // One corpus aggregate; the fill is window algebra on the
  // languages-sized table.
  def q131(s: SparkSession, dir: String): DataFrame =
    Curation.unimaxAllocation(docs(s, dir), "lang", "text",
        epochCap = 2, budgetNum = 3, budgetDen = 2)
      .orderBy(col("lang"))

  // q139: incremental corpus-statistics maintenance — the daily-batch
  // pattern at 100 TB: yesterday's per-language stats state (computed
  // over the snapshot, checkpointed — standing in for state read back
  // from storage) is MERGED algebraically with the arrivals' stats
  // (full-outer join on language: counts/sums add, min/max fold,
  // means derive post-merge) instead of recomputing the snapshot. The
  // oracle computes the SAME stats in one full-corpus pass, so the
  // hash match IS the merge-equals-recompute certificate — the
  // property that makes the aggregate state incrementally
  // maintainable at all. Corpus cost: each half crosses one
  // map-side-combinable aggregate; the merge is languages-sized.
  def q139(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("__nt"))
    def stats(x: DataFrame) = x.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"),
        min(col("__nt")).as("min_toks"), max(col("__nt")).as("max_toks"))
    val snap = stats(d.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint(true)
    val delta = stats(d.filter(col("doc_id") % 10 === 0))
      .select(col("lang"), col("n_docs").as("d_docs"),
        col("n_tokens").as("d_tokens"), col("min_toks").as("d_min"),
        col("max_toks").as("d_max"))
    snap.join(delta, Seq("lang"), "full_outer")
      .select(col("lang"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)) +
          coalesce(col("d_tokens"), lit(0L))).as("n_tokens"),
        least(coalesce(col("min_toks"), col("d_min")),
          coalesce(col("d_min"), col("min_toks"))).as("min_toks"),
        greatest(coalesce(col("max_toks"), col("d_max")),
          coalesce(col("d_max"), col("max_toks"))).as("max_toks"))
      .withColumn("mean_toks_e4",
        expr("n_tokens * 10000 div n_docs"))
      .orderBy(col("lang"))
  }

  // q163: Efraimidis–Spirakis weighted sample without replacement —
  // 50 docs proportional to length (n_chars), deterministic md5
  // uniforms, ln(u)/w keys, one TakeOrdered.
  def q163(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(docs(s, dir), "doc_id", "n_chars",
        k = 50, seed = "s17")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("es_key_e9"))

  // q171: largest-remainder (Hare) QUOTA apportionment — "allocate
  // exactly T=1000 sampled docs across languages proportional to token
  // mass, integer quotas only": floor quotas from exact integer
  // division, the leftover seats to the largest remainders (tie: lang).
  // The exact-k counterpart of q94's real-valued mixture weights —
  // quotas sum to T by construction, no rounding drift. One combinable
  // corpus aggregate; everything after is groups-sized window algebra.
  def q171(s: SparkSession, dir: String): DataFrame = {
    val T = 1000L
    val toks = filter(split(lower(col("text")), " "),
      t => length(t) > 0)
    val g = docs(s, dir)
      .select(col("lang"), size(toks).cast("long").as("__n"))
      .groupBy(col("lang")).agg(sum(col("__n")).as("n_tokens"))
    g.withColumn("__w", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("quota_floor",
        expr(s"CAST($T * n_tokens div __w AS BIGINT)"))
      .withColumn("__rem", expr(s"CAST($T * n_tokens % __w AS BIGINT)"))
      .withColumn("rem_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__rem").desc, col("lang"))))
      .withColumn("__left",
        lit(T) - sum(col("quota_floor")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("quota",
        (col("quota_floor") +
          when(col("rem_rank") <= col("__left"), 1L).otherwise(0L))
          .cast("long"))
      .select(col("lang"), col("n_tokens"), col("quota_floor"),
        col("rem_rank").cast("long").as("rem_rank"), col("quota"))
      .orderBy(col("lang"))
  }

  // q230: NEYMAN-style sampling ALLOCATION with a robust scale — the
  // survey-design upgrade of q171's proportional quotas: a fixed
  // T=1000 audit budget goes where the VARIABILITY is, alloc_h ∝
  // N_h·scale_h, with scale the exact P90−P10 length spread (integer
  // histogram-rank picks — classical Neyman uses σ, whose sqrt is not
  // exactly portable across engines; an interdecile range is the
  // standard robust stand-in and keeps every step integer). Quotas by
  // the q171 largest-remainder rule, so allocations sum to T exactly.
  // One (lang, n_chars) histogram aggregate; everything after is
  // keyed-window algebra on that bounded table; the rank/remainder
  // windows run on the languages-sized table only. Σw > 0 raise'd
  // in-plan (an all-constant corpus has no variance to chase).
  def q230(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val T = 1000L
    val byV = Window.partitionBy("lang").orderBy("n_chars")
    val w = Window.partitionBy("lang")
    docs(s, dir)
      .groupBy(col("lang"), col("n_chars")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(byV))
      .withColumn("n", sum(col("c")).over(w))
      .withColumn("r10", expr("greatest(1L, n div 10)"))
      .withColumn("r90", expr("n - n div 10"))
      .groupBy(col("lang"), col("n"))
      .agg(
        max(when(col("cum") - col("c") < col("r10") &&
          col("cum") >= col("r10"), col("n_chars"))).as("p10"),
        max(when(col("cum") - col("c") < col("r90") &&
          col("cum") >= col("r90"), col("n_chars"))).as("p90"))
      .withColumn("scale", col("p90") - col("p10"))
      .withColumn("wt", col("n") * col("scale"))
      // languages-sized table from here on — partition-less windows OK
      .withColumn("tw", sum(col("wt")).over(Window.partitionBy()))
      .withColumn("tw", when(col("tw") > 0, col("tw"))
        .otherwise(raise_error(lit(
          "q230: zero total scale weight — no variability to allocate"))))
      .withColumn("quota_floor", expr(s"CAST($T * wt div tw AS BIGINT)"))
      .withColumn("rem", expr(s"CAST($T * wt % tw AS BIGINT)"))
      .withColumn("rem_rank", row_number().over(
        Window.orderBy(col("rem").desc, col("lang"))))
      .withColumn("leftover", lit(T) -
        sum(col("quota_floor")).over(Window.partitionBy()))
      .select(col("lang"), col("n").as("n_docs"), col("p10"), col("p90"),
        col("scale"), col("quota_floor"),
        (col("quota_floor") + when(col("rem_rank") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy(col("lang"))
  }

  // q176: QUANTILE (rank) normalization — map every doc's raw score to
  // its corpus percent-rank in e4 integer space (the feature scaling a
  // mixer/curriculum needs: scale-free, outlier-immune). The corpus is
  // never globally sorted: ranks come from a VALUE-HISTOGRAM cumsum
  // (window over the distinct-score table), broadcast-joined back —
  // percent_rank semantics (below/(N−1)) as exact integer div.
  def q176(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
    // Corpus census as an in-plan broadcast scalar (r21): the separate
    // d.count() action existed only to bake N into a literal — the
    // histogram is tiny, so N rides it as a cross-joined column
    // instead, and the query is ONE action.
    val nDf = d.agg(count(lit(1)).as("__n"))
    val h = d.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
      .withColumn("below",
        sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_chars"))) - col("c"))
      .crossJoin(broadcast(nDf))
      .withColumn("pct_e4",
        expr("CAST(below * 10000 div (__n - 1) AS BIGINT)"))
    d.join(broadcast(h.select(col("n_chars"), col("pct_e4"))),
        Seq("n_chars"))
      .select(col("doc_id"), col("n_chars"), col("pct_e4"))
      .orderBy(col("doc_id"))
  }

  // q177: robust per-language z-scores (lower-median / MAD) of doc
  // length — the outlier-immune scale q176's percent-rank complements;
  // exact histogram medians, signed trunc-div, no corpus sort.
  def q177(s: SparkSession, dir: String): DataFrame =
    Stats.robustZByGroup(
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("med"),
        col("mad"), col("z_e4"))
      .orderBy(col("doc_id"))

  // q179: exact-quota STRATIFIED weighted sampling — the two new
  // primitives composed: q171's largest-remainder quotas (T=200,
  // proportional to token mass) consumed by q163's Efraimidis–Spirakis
  // keys, ranked WITHIN language (distributed window, never global) —
  // "exactly 200 docs, mixture-faithful across languages, drawn
  // without replacement proportional to length within each".
  /** The q179 selection with per-doc token counts retained — shared by
    * q179 (the sample dump) and q200 (the packing capstone) so the two
    * cannot drift. Returns (doc_id, lang, n_chars, es_key_e9, rk,
    * quota, __n) for the selected docs only.
    */
  private def quotaSample(s: SparkSession, dir: String): DataFrame = {
    val T = 200L
    val toks = filter(split(lower(col("text")), " "),
      t => length(t) > 0)
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      col("n_chars"), size(toks).cast("long").as("__n"))
    val g = d.groupBy(col("lang")).agg(sum(col("__n")).as("n_tokens"))
    val quotas = g
      .withColumn("__w", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("qf", expr(s"CAST($T * n_tokens div __w AS BIGINT)"))
      .withColumn("__rem", expr(s"CAST($T * n_tokens % __w AS BIGINT)"))
      .withColumn("__rr", row_number().over(org.apache.spark.sql
        .expressions.Window.orderBy(col("__rem").desc, col("lang"))))
      .withColumn("__left", lit(T) - sum(col("qf")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("lang"),
        (col("qf") + when(col("__rr") <= col("__left"), 1L)
          .otherwise(0L)).as("quota"))
    val h = conv(substring(md5(concat(lit("s19"), lit(":"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0)
    val keyed = d.withColumn("es_key_e9",
      round(log(u) / col("n_chars").cast("double") * 1000000000, 0)
        .cast("long"))
    keyed.join(broadcast(quotas), Seq("lang"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("es_key_e9").desc, col("doc_id"))))
      .filter(col("rk") <= col("quota"))
  }

  def q179(s: SparkSession, dir: String): DataFrame =
    quotaSample(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("es_key_e9"), col("rk").cast("long").as("rk"))
      .orderBy(col("doc_id"))

  // q200: the TRAINING-MIX ASSEMBLY capstone — the last mile from
  // corpus to batches, composing three certified primitives: q171's
  // exact quotas × q163's ES sampling (= q179's selection, shared
  // helper) × q70/q154's concat-packing geometry at max_seq_len 512.
  // Per language: quota, selected count (== quota by construction),
  // sampled token mass, bins opened (ceil pack), straddling docs
  // (start bin ≠ end bin under sequential concat in sample order:
  // es_key desc, doc_id), and utilization e4 (only the final bin pads).
  // The packing windows run over the SAMPLE (T rows), never the
  // corpus — the sample is the working set a mixer actually ships.
  def q200(s: SparkSession, dir: String): DataFrame = {
    val C = 512L
    val byRk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("rk"))
    quotaSample(s, dir)
      .withColumn("__cum", sum(col("__n")).over(byRk))
      .withColumn("__start", expr(s"(__cum - __n) div $C"))
      .withColumn("__end", expr(s"(__cum - 1) div $C"))
      .groupBy(col("lang"))
      .agg(max(col("quota")).as("quota"),
        count(lit(1)).as("n_selected"),
        sum(col("__n")).as("tok_sum"),
        sum(when(col("__start") =!= col("__end"), 1L).otherwise(0L))
          .as("n_straddle"))
      .withColumn("n_bins", expr(s"(tok_sum + ${C - 1}) div $C"))
      .withColumn("util_e4",
        expr(s"tok_sum * 10000 div (n_bins * $C)"))
      .select(col("lang"), col("quota"), col("n_selected"),
        col("tok_sum"), col("n_bins"), col("n_straddle"), col("util_e4"))
      .orderBy(col("lang"))
  }

  // q180: Bloom FPR calibration sweep — measured false-positive rates
  // at 2^14 / 2^17 / 2^20 bits (saturated → moderate → clean) for the
  // q78 decontamination filter's parameter choice.
  def q180(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.bloomFprAudit(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        "text", n = 3,
        bitSizes = Seq(1 << 14, 1 << 17, 1 << 20),
        numHashes = Q78Hashes)
      .orderBy(col("m_bits"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_neyman_allocation" -> (q230 _),
    "q224_hilbert_locality" -> (q224 _),
    "q180_bloom_fpr" -> (q180 _),
    "q179_quota_sample" -> (q179 _),
    "q200_mix_assembly" -> (q200 _),
    "q177_robust_zscore" -> (q177 _),
    "q176_quantile_normalize" -> (q176 _),
    "q171_quota_apportionment" -> (q171 _),
    "q163_weighted_sample" -> (q163 _),
    "q139_incremental_stats" -> (q139 _),
    "q129_k_anonymity" -> (q129 _),
    "q131_unimax_budget" -> (q131 _),
    "q83_curation_pipeline" -> (q83 _),
    "q81_seeded_shuffle" -> (q81 _),
    "q82_upsample" -> (q82 _),
    "q78_decontam_bloom" -> (q78 _),
    "q79_profile_approx" -> (q79 _),
    "q80_skew_report" -> (q80 _),
    "q97_leakage_report" -> (q97 _),
    "q74_profile" -> (q74 _),
    "q70_sequence_pack" -> (q70 _),
    "q154_packing_curve" -> (q154 _),
    "q68_temperature_sample" -> (q68 _),
    "q67_zorder_key" -> (q67 _),
    "q63_pii_redact" -> (q63 _),
    "q64_decontam" -> (q64 _),
    "q65_repetition" -> (q65 _),
    "q66_stratified_sample" -> (q66 _)
  )

  /** The q67 Morton key as DuckDB bit algebra — generated from the same
    * (column, bit-position) loop shape as [[graft.operators.Layout.zorderKey]]
    * so oracle and engine cannot drift.
    */
  private val zkeySql: String = {
    val cols = Seq("l_partkey", "l_suppkey")
    (for { (c, i) <- cols.zipWithIndex; j <- 0 until 16 }
      yield s"(((($c >> $j) & 1)) << ${j * cols.length + i})")
      .mkString(" + ")
  }

  /** q224's Hilbert levels + Morton key as DuckDB CTEs — generated from
    * [[graft.operators.Layout.hilbertLevelSql]] (the SAME strings the
    * engine evaluates through `expr`), so oracle and engine cannot
    * drift. ox/oy carry the ORIGINAL dims through the coordinate-
    * mutating levels; each level is MATERIALIZED (a plain CTE chain
    * re-inlines its parent per reference — the q112 gotcha).
    */
  private val hilbertKeyCtes: String = {
    val zk = (for { (c, i) <- Seq("__x", "__y").zipWithIndex;
        j <- 0 until 8 }
      yield s"((($c >> $j) & 1) << ${j * 2 + i})").mkString(" + ")
    val lvls = (7 to 0 by -1).zipWithIndex.map { case (lev, idx) =>
      val (dE, xE, yE) =
        graft.operators.Layout.hilbertLevelSql(256L, 1L << lev)
      s"lvl${idx + 1} AS MATERIALIZED (SELECT ox, oy, zkey, " +
        s"$dE AS __d, $xE AS __x, $yE AS __y FROM lvl$idx)"
    }.mkString(",\n")
    "lvl0 AS MATERIALIZED (SELECT __x AS ox, __y AS oy, " +
      s"CAST($zk AS BIGINT) AS zkey, __x, __y, CAST(0 AS BIGINT) AS __d " +
      "FROM (SELECT o_custkey % 256 AS __x, " +
      "(dayofyear(o_orderdate) - 1) // 2 AS __y FROM orders)),\n" + lvls
  }

  /** Gopher-repetition CTE block ending in `rep(doc_id, n_words,
    * mean_word_len, top_word_frac, top_bigram_frac, keep)` — shared by
    * q65 and the q83 pipeline so the two oracles cannot drift.
    */
  private val repetitionSql: String =
    """toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') t
      |              FROM documents),
      |base AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS n_words,
      |  ROUND(CAST(list_aggregate(list_transform(t, w -> LENGTH(w)), 'sum')
      |    AS DOUBLE) / len(t), 4) AS mean_word_len FROM toks),
      |w AS (SELECT doc_id, unnest(t) AS term, len(t) AS tot FROM toks),
      |wc AS (SELECT doc_id, term, tot, COUNT(*) c FROM w GROUP BY 1, 2, 3),
      |tw AS (SELECT doc_id, ROUND(MAX(c) * 1.0 / ANY_VALUE(tot), 4)
      |         AS top_word_frac FROM wc GROUP BY doc_id),
      |bpos AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
      |b AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS term, len(t) - 1 AS tot
      |      FROM bpos),
      |bc AS (SELECT doc_id, term, tot, COUNT(*) c FROM b GROUP BY 1, 2, 3),
      |tb AS (SELECT doc_id, ROUND(MAX(c) * 1.0 / ANY_VALUE(tot), 4)
      |         AS top_bigram_frac FROM bc GROUP BY doc_id),
      |-- LEFT JOIN + COALESCE: a one-token doc has no bigrams; its
      |-- verdict is a definite FALSE (matches the engine), not null.
      |rep AS (SELECT base.doc_id, n_words, mean_word_len, top_word_frac,
      |  top_bigram_frac,
      |  (n_words >= 10 AND mean_word_len BETWEEN 2.0 AND 10.0
      |   AND top_word_frac <= 0.2
      |   AND COALESCE(top_bigram_frac <= 0.18, FALSE)) AS keep
      |FROM base JOIN tw ON base.doc_id = tw.doc_id
      |LEFT JOIN tb ON base.doc_id = tb.doc_id)""".stripMargin

  /** Scalar-subquery replay of one column's portable-HLL estimate
    * ([[graft.operators.Stats.profileApproxPortable]]): same md5 hex
    * algebra, same integer registers, same left-associated double tree
    * (e0 literals force DOUBLE — bare decimals are DECIMAL in DuckDB,
    * whose truncating division would diverge from Spark's IEEE one).
    */
  private def hllNdvSql(c: String): String = {
    val raw = "(0.7213e0 / (1.0e0 + 1.079e0 / 4096.0e0)) * 16777216.0e0" +
      " * 1125899906842624.0e0 / CAST(s AS DOUBLE)"
    s"""(WITH hh AS (SELECT md5(CAST($c AS VARCHAR)) AS h FROM orders
       |    WHERE $c IS NOT NULL),
       |  tt AS (SELECT substring(h, 1, 3) AS b,
       |           ltrim(substring(h, 4, 13), '0') AS t FROM hh),
       |  rr AS (SELECT b, MAX(LEAST(CASE WHEN t = '' THEN 53
       |           ELSE (13 - LENGTH(t)) * 4
       |             + CASE WHEN substring(t, 1, 1) = '1' THEN 3
       |                    WHEN substring(t, 1, 1) IN ('2','3') THEN 2
       |                    WHEN substring(t, 1, 1) IN ('4','5','6','7') THEN 1
       |                    ELSE 0 END + 1 END, 50)) AS m
       |         FROM tt GROUP BY b),
       |  ss AS (SELECT COUNT(*) AS present,
       |           CAST(SUM(CAST(1 AS BIGINT) << (50 - m)) AS BIGINT) AS sp
       |         FROM rr),
       |  ee AS (SELECT 4096 - present AS zeros,
       |           sp + (4096 - present) * (CAST(1 AS BIGINT) << 50) AS s
       |         FROM ss)
       |  SELECT COALESCE(CAST(ROUND(CASE
       |      WHEN $raw <= 10240.0e0 AND zeros > 0
       |      THEN 4096.0e0 * ln(4096.0e0 / zeros)
       |      ELSE $raw END, 0) AS BIGINT), 0)
       |  FROM ee)""".stripMargin
  }

  /** The q179 selection chain (quotas + ES keys + per-language
    * ranks), shared verbatim by the q179 dump and the q200 packing
    * capstone.
    */
  private val Q179Ctes: String =
    """WITH d AS (SELECT doc_id, lang, n_chars,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text),
        |      ' '), x -> LENGTH(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY lang),
        |w AS (SELECT g.*, (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM g)
        |        AS tw FROM g),
        |f AS (SELECT lang,
        |    CAST(200 * n_tokens // tw AS BIGINT) AS qf,
        |    CAST(200 * n_tokens % tw AS BIGINT) AS rem
        |  FROM w),
        |r AS (SELECT f.*, ROW_NUMBER() OVER (ORDER BY rem DESC, lang)
        |        AS rr,
        |      (SELECT 200 - CAST(SUM(qf) AS BIGINT) FROM f) AS leftover
        |  FROM f),
        |q AS (SELECT lang, CAST(qf + CASE WHEN rr <= leftover THEN 1
        |        ELSE 0 END AS BIGINT) AS quota FROM r),
        |k AS (SELECT d.doc_id, d.lang, d.n_chars,
        |    CAST(ROUND(ln(CAST(CAST(('0x' || substr(md5('s19:' ||
        |      CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1
        |      AS DOUBLE) / 4503599627370496e0)
        |      / CAST(d.n_chars AS DOUBLE) * 1000000000, 0) AS BIGINT)
        |      AS es_key_e9
        |  FROM d),
        |rk AS (SELECT k.*, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY es_key_e9 DESC, doc_id) AS BIGINT) AS rk
        |  FROM k)""".stripMargin

  val oracle: Map[String, String] = Map(
    // q179: the q171 quota chain (T=200) + the q163 key chain (seed
    // s19, e9) + a per-language ROW_NUMBER — one composed replay.
    "q179_quota_sample" ->
      (Q179Ctes + """
        |SELECT rk.doc_id, rk.lang, rk.n_chars, rk.es_key_e9, rk.rk
        |FROM rk JOIN q USING (lang) WHERE rk.rk <= q.quota
        |ORDER BY rk.doc_id""".stripMargin),
    // q200: the q179 selection joined back to its token counts,
    // packed sequentially per language in sample order.
    "q200_mix_assembly" ->
      (Q179Ctes + """
        |,
        |sel AS (SELECT rk.lang, rk.doc_id, rk.rk, q.quota, d.n
        |  FROM rk JOIN q USING (lang) JOIN d USING (doc_id)
        |  WHERE rk.rk <= q.quota),
        |pk AS (SELECT lang, quota, n,
        |    SUM(n) OVER (PARTITION BY lang ORDER BY rk) AS cum
        |  FROM sel),
        |ag AS (SELECT lang, CAST(MAX(quota) AS BIGINT) AS quota,
        |    CAST(COUNT(*) AS BIGINT) AS n_selected,
        |    CAST(SUM(n) AS BIGINT) AS tok_sum,
        |    CAST(SUM(CASE WHEN (cum - n) // 512 <> (cum - 1) // 512
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
        |  FROM pk GROUP BY lang)
        |SELECT lang, quota, n_selected, tok_sum,
        |  CAST((tok_sum + 511) // 512 AS BIGINT) AS n_bins,
        |  n_straddle,
        |  CAST(tok_sum * 10000 // (((tok_sum + 511) // 512) * 512)
        |    AS BIGINT) AS util_e4
        |FROM ag ORDER BY lang""".stripMargin),

    // q177: the same histogram-cumsum selection for BOTH medians
    // (lower median at rank (n+1)//2), then the signed trunc-div —
    // DuckDB // truncates toward zero like Spark div (the q144 note).
    "q177_robust_zscore" ->
      """WITH h1 AS (SELECT lang, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY lang, n_chars),
        |w1 AS (SELECT lang, v,
        |    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM h1),
        |med AS (SELECT lang, CAST(MIN(v) AS BIGINT) AS med FROM w1
        |  WHERE cum >= (n + 1) // 2 GROUP BY lang),
        |dv AS (SELECT d.doc_id, d.lang, d.n_chars, med.med,
        |    ABS(d.n_chars - med.med) AS adev
        |  FROM documents d JOIN med USING (lang)),
        |h2 AS (SELECT lang, adev AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM dv GROUP BY lang, adev),
        |w2 AS (SELECT lang, v,
        |    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM h2),
        |mad AS (SELECT lang, CAST(MIN(v) AS BIGINT) AS mad FROM w2
        |  WHERE cum >= (n + 1) // 2 GROUP BY lang)
        |SELECT dv.doc_id, dv.lang, dv.n_chars, dv.med, mad.mad,
        |  CASE WHEN mad.mad = 0 THEN 0
        |    ELSE CAST((dv.n_chars - dv.med) * 10000 // mad.mad
        |      AS BIGINT) END AS z_e4
        |FROM dv JOIN mad USING (lang) ORDER BY dv.doc_id""".stripMargin,
    // q176: identical histogram-cumsum percent-rank; `//` of exact
    // non-negatives.
    "q176_quantile_normalize" ->
      """WITH h AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY n_chars),
        |w AS (SELECT n_chars,
        |    CAST(SUM(c) OVER (ORDER BY n_chars) - c AS BIGINT) AS below,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n
        |  FROM h)
        |SELECT d.doc_id, d.n_chars,
        |  CAST(w.below * 10000 // (w.n - 1) AS BIGINT) AS pct_e4
        |FROM documents d JOIN w USING (n_chars)
        |ORDER BY d.doc_id""".stripMargin,
    // q171: same integer floor-quota + remainder-rank algebra; the
    // leftover-seat count derives from the floors, so quotas sum to T
    // identically in both engines.
    "q171_quota_apportionment" ->
      """WITH g AS (SELECT lang,
        |    CAST(SUM(len(list_filter(regexp_split_to_array(lower(text),
        |      ' '), x -> LENGTH(x) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |w AS (SELECT g.*, (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM g)
        |        AS tw FROM g),
        |f AS (SELECT lang, n_tokens,
        |    CAST(1000 * n_tokens // tw AS BIGINT) AS quota_floor,
        |    CAST(1000 * n_tokens % tw AS BIGINT) AS rem
        |  FROM w),
        |r AS (SELECT f.*, CAST(ROW_NUMBER() OVER
        |        (ORDER BY rem DESC, lang) AS BIGINT) AS rem_rank,
        |      (SELECT 1000 - CAST(SUM(quota_floor) AS BIGINT) FROM f)
        |        AS leftover
        |  FROM f)
        |SELECT lang, n_tokens, quota_floor, rem_rank,
        |  CAST(quota_floor + CASE WHEN rem_rank <= leftover THEN 1
        |    ELSE 0 END AS BIGINT) AS quota
        |FROM r ORDER BY lang""".stripMargin,
    // q163: same md5→(0,1] uniform (13 hex digits, +1, /2^52), same
    // ln(u)/w key — quantized to an e9 long BEFORE ranking because
    // Spark's StrictMath log and DuckDB's libm ln can differ in the
    // last ulp (a raw-double boundary would be engine-dependent).
    "q163_weighted_sample" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
        |    CAST(('0x' || substr(md5('s17:' || CAST(doc_id AS VARCHAR)),
        |      1, 13)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CAST(ROUND(ln(CAST(h + 1 AS DOUBLE) / 4503599627370496e0)
        |    / CAST(n_chars AS DOUBLE) * 1000000000, 0) AS BIGINT)
        |    AS es_key_e9
        |FROM h ORDER BY es_key_e9 DESC, doc_id LIMIT 50""".stripMargin,
    // Deliberately a SINGLE full-corpus pass (no snapshot/delta split):
    // engine merges incremental state, oracle recomputes from scratch —
    // the hash match certifies merge == recompute.
    "q139_incremental_stats" ->
      """WITH t AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  MIN(nt) AS min_toks, MAX(nt) AS max_toks,
        |  CAST(SUM(nt) AS BIGINT) * 10000 // CAST(COUNT(*) AS BIGINT)
        |    AS mean_toks_e4
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q129_k_anonymity" ->
      """WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS
        |    n_docs FROM documents GROUP BY 1, 2),
        |l0 AS (SELECT lang, source, 0 AS level, n_docs FROM cells
        |       WHERE n_docs >= 5),
        |f0 AS (SELECT lang, n_docs FROM cells WHERE n_docs < 5),
        |l1c AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_docs
        |        FROM f0 GROUP BY lang),
        |l1 AS (SELECT lang, '*' AS source, 1 AS level, n_docs FROM l1c
        |       WHERE n_docs >= 5),
        |l2 AS (SELECT '*' AS lang, '*' AS source,
        |         CASE WHEN SUM(n_docs) >= 5 THEN 2 ELSE 3 END AS level,
        |         CAST(SUM(n_docs) AS BIGINT) AS n_docs
        |       FROM l1c WHERE n_docs < 5 HAVING COUNT(*) > 0)
        |SELECT lang, source, level, n_docs FROM
        |  (SELECT * FROM l0 UNION ALL SELECT * FROM l1
        |   UNION ALL SELECT * FROM l2)
        |ORDER BY level, lang, source""".stripMargin,
    // q131: replays the waterfill — same prefix sums, the same
    // saturation predicate (exact integer comparison), the same
    // integer remainder split. Params mirror the engine: epoch cap 2,
    // budget = 150% of corpus tokens.
    "q131_unimax_budget" ->
      """WITH langs AS (SELECT lang,
        |    CAST(SUM(len(regexp_split_to_array(text, ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY lang),
        |rk AS (SELECT lang, n_tokens, n_tokens * 2 AS cap,
        |         ((SUM(n_tokens) OVER ()) * 3) // 2 AS T,
        |         COUNT(*) OVER () AS L,
        |         ROW_NUMBER() OVER (ORDER BY n_tokens * 2, lang) AS r,
        |         SUM(n_tokens * 2) OVER (ORDER BY n_tokens * 2, lang)
        |           AS P
        |       FROM langs),
        |st AS (SELECT *, (cap * (L - r + 1)) <= (T - (P - cap)) AS sat
        |       FROM rk),
        |fl AS (SELECT *,
        |         SUM(CASE WHEN sat THEN 1 ELSE 0 END) OVER () AS m,
        |         SUM(CASE WHEN sat THEN cap ELSE 0 END) OVER () AS Pm
        |       FROM st),
        |al AS (SELECT *,
        |         CASE WHEN m < L THEN (T - Pm) // (L - m) ELSE 0 END
        |           AS base,
        |         CASE WHEN m < L THEN (T - Pm) % (L - m) ELSE 0 END
        |           AS rem
        |       FROM fl),
        |res AS (SELECT lang, n_tokens, cap, sat,
        |          CASE WHEN sat THEN cap ELSE base +
        |            (CASE WHEN r - m <= rem THEN 1 ELSE 0 END) END
        |            AS alloc
        |        FROM al)
        |SELECT lang, n_tokens, CAST(cap AS BIGINT) AS cap,
        |  CAST(alloc AS BIGINT) AS alloc,
        |  CASE WHEN sat THEN 1 ELSE 0 END AS saturated,
        |  CAST((alloc * 10000) // n_tokens AS BIGINT) AS epochs_e4
        |FROM res ORDER BY lang""".stripMargin,
    "q79_profile_approx" ->
      s"""WITH s AS (SELECT
         |  COUNT(*) AS total,
         |  COUNT(o_orderkey) c1, CAST(MIN(o_orderkey) AS VARCHAR) mn1,
         |    CAST(MAX(o_orderkey) AS VARCHAR) mx1,
         |  COUNT(o_custkey) c2, CAST(MIN(o_custkey) AS VARCHAR) mn2,
         |    CAST(MAX(o_custkey) AS VARCHAR) mx2,
         |  COUNT(o_orderstatus) c3, CAST(MIN(o_orderstatus) AS VARCHAR) mn3,
         |    CAST(MAX(o_orderstatus) AS VARCHAR) mx3,
         |  COUNT(o_orderpriority) c4, CAST(MIN(o_orderpriority) AS VARCHAR) mn4,
         |    CAST(MAX(o_orderpriority) AS VARCHAR) mx4
         |  FROM orders)
         |SELECT 'o_custkey' AS "column", total - c2 AS n_nulls,
         |  ${hllNdvSql("o_custkey")} AS n_distinct,
         |  mn2 AS min_value, mx2 AS max_value FROM s
         |UNION ALL
         |SELECT 'o_orderkey', total - c1, ${hllNdvSql("o_orderkey")},
         |  mn1, mx1 FROM s
         |UNION ALL
         |SELECT 'o_orderpriority', total - c4, ${hllNdvSql("o_orderpriority")},
         |  mn4, mx4 FROM s
         |UNION ALL
         |SELECT 'o_orderstatus', total - c3, ${hllNdvSql("o_orderstatus")},
         |  mn3, mx3 FROM s
         |ORDER BY "column"""".stripMargin,
    "q83_curation_pipeline" ->
      s"""WITH $repetitionSql,
         |keep AS (SELECT doc_id FROM rep WHERE keep),
         |kd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
         |dd AS (SELECT kd.*, ROW_NUMBER() OVER
         |         (PARTITION BY text ORDER BY doc_id) AS rn FROM kd),
         |u AS (SELECT * FROM dd WHERE rn = 1),
         |samp AS (SELECT * FROM u WHERE
         |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
         |    CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN '40'
         |      WHEN 'de' THEN '20' WHEN 'es' THEN '20' WHEN 'fr' THEN '20'
         |      ELSE '00' END),
         |t2 AS (SELECT doc_id,
         |    len(regexp_split_to_array(text, ' ')) AS n_toks FROM samp),
         |c2 AS (SELECT doc_id, n_toks,
         |    SUM(n_toks) OVER (ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_toks AS cum_before FROM t2),
         |b2 AS (SELECT doc_id, n_toks,
         |    CAST(FLOOR(cum_before / 512) AS BIGINT) AS bin FROM c2)
         |SELECT bin, COUNT(*) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS bin_tokens,
         |  MIN(doc_id) AS first_doc
         |FROM b2 GROUP BY bin ORDER BY bin""".stripMargin,
    "q81_seeded_shuffle" ->
      """SELECT doc_id, lang,
        |  md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key LIMIT 100""".stripMargin,
    "q82_upsample" ->
      """WITH w AS (SELECT doc_id, lang,
        |    CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 2.5
        |      WHEN 'de' THEN 1.0 WHEN 'es' THEN 3.0 WHEN 'fr' THEN 1.25
        |      ELSE 0.0 END AS DOUBLE) AS wt
        |  FROM documents),
        |c AS (SELECT doc_id, lang,
        |    CAST(FLOOR(wt) + CASE WHEN
        |        substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        |        lower(lpad(to_hex(CAST(FLOOR((wt - FLOOR(wt)) * 4294967296)
        |          AS BIGINT)), 8, '0'))
        |      THEN 1 ELSE 0 END AS INTEGER) AS n FROM w)
        |SELECT doc_id, lang, unnest(range(1, n + 1)) AS copy
        |FROM c WHERE n >= 1 ORDER BY doc_id, copy""".stripMargin,
    "q80_skew_report" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |             COUNT(*) AS cnt FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM events),
        |r AS (SELECT key, cnt, ROW_NUMBER() OVER
        |        (ORDER BY cnt DESC, key) AS rn FROM c)
        |SELECT key, cnt,
        |  ROUND(cnt * 1.0 / tot.n, 6) AS share,
        |  ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, key
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1.0 / tot.n, 6)
        |    AS cum_share
        |FROM r CROSS JOIN tot WHERE rn <= 20
        |ORDER BY cnt DESC, key""".stripMargin,
    "q74_profile" ->
      """WITH s AS (SELECT
        |  COUNT(*) AS total,
        |  COUNT(o_orderkey) c1, COUNT(DISTINCT o_orderkey) d1,
        |    CAST(MIN(o_orderkey) AS VARCHAR) mn1, CAST(MAX(o_orderkey) AS VARCHAR) mx1,
        |  COUNT(o_custkey) c2, COUNT(DISTINCT o_custkey) d2,
        |    CAST(MIN(o_custkey) AS VARCHAR) mn2, CAST(MAX(o_custkey) AS VARCHAR) mx2,
        |  COUNT(o_orderstatus) c3, COUNT(DISTINCT o_orderstatus) d3,
        |    CAST(MIN(o_orderstatus) AS VARCHAR) mn3, CAST(MAX(o_orderstatus) AS VARCHAR) mx3,
        |  COUNT(o_orderpriority) c4, COUNT(DISTINCT o_orderpriority) d4,
        |    CAST(MIN(o_orderpriority) AS VARCHAR) mn4, CAST(MAX(o_orderpriority) AS VARCHAR) mx4
        |  FROM orders)
        |SELECT 'o_custkey' AS "column", total - c2 AS n_nulls, d2 AS n_distinct,
        |  mn2 AS min_value, mx2 AS max_value FROM s
        |UNION ALL
        |SELECT 'o_orderkey', total - c1, d1, mn1, mx1 FROM s
        |UNION ALL
        |SELECT 'o_orderpriority', total - c4, d4, mn4, mx4 FROM s
        |UNION ALL
        |SELECT 'o_orderstatus', total - c3, d3, mn3, mx3 FROM s
        |ORDER BY "column"""".stripMargin,
    // q154: the q70 cumsum window replayed once, then every capacity's
    // metrics from the same cumulative starts (UNNEST of the ladder) —
    // identical modular algebra, `//`/div both truncating on the
    // non-negative operands.
    "q154_packing_curve" ->
      """WITH t AS (SELECT doc_id,
        |    len(regexp_split_to_array(text, ' ')) AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |    CAST(SUM(n_toks) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_toks AS BIGINT) AS cum_before
        |  FROM t),
        |x AS (SELECT n_toks, cum_before,
        |        CAST(unnest([128, 256, 512, 1024]) AS INTEGER)
        |          AS capacity
        |      FROM c),
        |g AS (SELECT capacity,
        |    CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |    CAST(COUNT(DISTINCT cum_before // capacity) AS BIGINT)
        |      AS n_bins,
        |    CAST(SUM(CASE WHEN cum_before % capacity + n_toks > capacity
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
        |    CAST(SUM(GREATEST(cum_before % capacity + n_toks - capacity,
        |      0)) AS BIGINT) AS over_tokens
        |  FROM x GROUP BY capacity)
        |SELECT capacity, total_tokens, n_bins, n_straddlers, over_tokens,
        |  CAST(total_tokens * 10000 // (n_bins * capacity) AS BIGINT)
        |    AS util_e4
        |FROM g ORDER BY capacity""".stripMargin,
    "q70_sequence_pack" ->
      """WITH t AS (SELECT doc_id,
        |    len(regexp_split_to_array(text, ' ')) AS n_toks FROM documents),
        |c AS (SELECT doc_id, n_toks,
        |    SUM(n_toks) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_toks AS cum_before FROM t),
        |b AS (SELECT doc_id, n_toks,
        |    CAST(FLOOR(cum_before / 512) AS BIGINT) AS bin FROM c)
        |SELECT bin, COUNT(*) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q68_temperature_sample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
        |t AS (SELECT lang, cnt, SUM(cnt) OVER () AS tot,
        |        POW(cnt * 1.0 / SUM(cnt) OVER (), 0.5) AS w FROM c),
        |r AS (SELECT lang,
        |        ROUND(LEAST(1.0, 0.3 * tot * (w / SUM(w) OVER ()) / cnt), 6)
        |          AS rate FROM t)
        |SELECT d.doc_id, d.lang, r.rate
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE r.rate >= 1.0 OR
        |  substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
        |  lower(lpad(to_hex(CAST(FLOOR(r.rate * 4294967296) AS BIGINT)), 8, '0'))
        |ORDER BY d.doc_id""".stripMargin,
    "q67_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, CAST($zkeySql AS BIGINT) AS zkey
         |FROM lineitem
         |ORDER BY zkey, l_orderkey, l_linenumber LIMIT 500""".stripMargin,
    // q230: identical histogram-rank picks and largest-remainder
    // windows; the remainder rank ties break on lang in both engines.
    "q230_neyman_allocation" ->
      """WITH h AS (SELECT lang, n_chars,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |wnd AS (SELECT lang, n_chars, c,
        |    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM h),
        |rk AS (SELECT *, GREATEST(1, n // 10) AS r10, n - n // 10 AS r90
        |  FROM wnd),
        |q AS (SELECT lang, n,
        |    MAX(CASE WHEN cum - c < r10 AND cum >= r10
        |      THEN n_chars END) AS p10,
        |    MAX(CASE WHEN cum - c < r90 AND cum >= r90
        |      THEN n_chars END) AS p90
        |  FROM rk GROUP BY 1, 2),
        |wt AS (SELECT lang, n, p10, p90, p90 - p10 AS scale,
        |    n * (p90 - p10) AS w FROM q),
        |tt AS (SELECT *, CAST(SUM(w) OVER () AS BIGINT) AS tw FROM wt),
        |fl AS (SELECT *,
        |    CAST(1000 * w // tw AS BIGINT) AS quota_floor,
        |    CAST(1000 * w % tw AS BIGINT) AS rem
        |  FROM tt),
        |rr AS (SELECT *,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rem_rank,
        |    1000 - CAST(SUM(quota_floor) OVER () AS BIGINT) AS leftover
        |  FROM fl)
        |SELECT lang, n AS n_docs, p10, p90, CAST(scale AS BIGINT)
        |    AS scale, quota_floor,
        |  CAST(quota_floor + CASE WHEN rem_rank <= leftover
        |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM rr ORDER BY lang""".stripMargin,
    "q224_hilbert_locality" ->
      (s"WITH $hilbertKeyCtes,\n" +
        """keyed AS MATERIALIZED (SELECT ox AS x, oy AS y, zkey,
          |    __d AS hkey
          |  FROM lvl8),
          |rects(rect, x0, x1, y0, y1) AS (VALUES
          |  ('square', 64, 95, 60, 89), ('wide', 0, 255, 80, 84),
          |  ('tall', 100, 103, 0, 181)),
          |bounds AS MATERIALIZED (SELECT r.rect,
          |    CAST(COUNT(*) AS BIGINT) AS nr,
          |    MIN(k.hkey) AS hmin, MAX(k.hkey) AS hmax,
          |    MIN(k.zkey) AS zmin, MAX(k.zkey) AS zmax
          |  FROM keyed k JOIN rects r ON k.x BETWEEN r.x0 AND r.x1
          |    AND k.y BETWEEN r.y0 AND r.y1
          |  GROUP BY 1),
          |ftc AS (SELECT b.rect,
          |    CAST(SUM(CASE WHEN k.hkey BETWEEN b.hmin AND b.hmax
          |      THEN 1 ELSE 0 END) AS BIGINT) AS fh,
          |    CAST(SUM(CASE WHEN k.zkey BETWEEN b.zmin AND b.zmax
          |      THEN 1 ELSE 0 END) AS BIGINT) AS fz
          |  FROM keyed k CROSS JOIN bounds b GROUP BY 1)
          |SELECT 'hilbert' AS curve, b.rect, b.nr AS n_rows,
          |  f.fh AS n_fetch, CAST(f.fh * 10000 // b.nr AS BIGINT) AS amp_e4
          |FROM bounds b JOIN ftc f USING (rect)
          |UNION ALL
          |SELECT 'zorder' AS curve, b.rect, b.nr, f.fz,
          |  CAST(f.fz * 10000 // b.nr AS BIGINT)
          |FROM bounds b JOIN ftc f USING (rect)
          |ORDER BY curve, rect""".stripMargin),
    "q63_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 3 = 0
         |    THEN ' contact doc' || doc_id || '@example.com' ELSE '' END ||
         |  CASE WHEN doc_id % 4 = 0
         |    THEN ' host 10.0.' || (doc_id % 256) || '.1' ELSE '' END ||
         |  CASE WHEN doc_id % 5 = 0
         |    THEN ' call 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |    ELSE '' END AS text2
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text2, '${Curation.EmailRe}')) AS INTEGER)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(text2, '${Curation.Ipv4Re}')) AS INTEGER)
         |    AS n_ips,
         |  CAST(len(regexp_extract_all(text2, '${Curation.PhoneRe}')) AS INTEGER)
         |    AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text2,
         |    '${Curation.EmailRe}', '[EMAIL]', 'g'),
         |    '${Curation.Ipv4Re}', '[IP]', 'g'),
         |    '${Curation.PhoneRe}', '[PHONE]', 'g')) AS redacted_md5
         |FROM p ORDER BY doc_id""".stripMargin,
    "q97_leakage_report" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') t
        |              FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 2 + 1)) AS i
        |        FROM toks),
        |ng AS (SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ') AS g
        |       FROM pos),
        |tn AS (SELECT DISTINCT doc_id AS train_id, g FROM ng
        |       WHERE doc_id % 50 <> 0),
        |en AS (SELECT DISTINCT doc_id AS eval_id, g FROM ng
        |       WHERE doc_id % 50 = 0),
        |et AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS eval_ngrams
        |       FROM en GROUP BY eval_id),
        |rare AS (SELECT g FROM tn GROUP BY g HAVING COUNT(*) <= 100),
        |pairs AS (SELECT en.eval_id, tn.train_id,
        |            CAST(COUNT(*) AS BIGINT) AS n_shared
        |          FROM tn JOIN rare USING (g) JOIN en USING (g)
        |          GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT eval_id, train_id, n_shared, eval_ngrams,
        |  ROUND(CAST(n_shared AS DOUBLE) / eval_ngrams, 4) AS overlap_frac
        |FROM pairs JOIN et USING (eval_id)
        |ORDER BY eval_id, train_id""".stripMargin,
    // q78 portable-Bloom replay: the k bit positions per gram are plain
    // md5 algebra (15 hex chars → 60-bit int, CAST('0x…' AS BIGINT)), the
    // filter is a words CTE (p//32, BIT_OR of 32-bit shifts — mirroring
    // the operator's long-packed 32-bit words), and the hit test is a
    // LEFT JOIN + BOOL_AND over the k positions — the relational
    // equivalent of the engine's array-literal probe. Position exprs are
    // generated from the same (i, Q78Bits) loop as the Scala side so the
    // two cannot drift. Verdicts match bit-for-bit INCLUDING false
    // positives — the collisions are part of the certified semantics.
    // q180: the q78 bloom replay swept over three sizes; negatives are
    // the train-only distinct grams (NOT IN ev), fpr as exact `//`.
    "q180_bloom_fpr" -> {
      def posList(m: Int) = (0 until Q78Hashes)
        .map(i => s"CAST('0x' || substr(md5(g || '#$i'), 1, 15) " +
          s"AS BIGINT) % $m")
        .mkString("list_value(", ", ", ")")
      val sizes = Seq(1 << 14, 1 << 17, 1 << 20)
      val blocks = sizes.map { m =>
        s"""ep$m AS MATERIALIZED (SELECT DISTINCT
           |    unnest(${posList(m)}) AS p FROM ev),
           |w$m AS MATERIALIZED (SELECT p // 32 AS w,
           |    BIT_OR(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
           |      AS word
           |  FROM ep$m GROUP BY 1),
           |h$m AS MATERIALIZED (SELECT t.g,
           |    BOOL_AND(COALESCE((w.word &
           |      (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))) <> 0,
           |      FALSE)) AS hit
           |  FROM (SELECT g, unnest(${posList(m)}) AS p FROM tn) t
           |  LEFT JOIN w$m w ON p // 32 = w.w GROUP BY t.g),
           |f$m AS (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
           |    AS BIGINT) AS fp FROM h$m)""".stripMargin
      }.mkString(",\n")
      val sel = sizes.map { m =>
        s"SELECT CAST($m AS BIGINT) AS m_bits, " +
          s"CAST($Q78Hashes AS BIGINT) AS k_hashes, " +
          s"c.nk AS n_keys, c.nn AS n_negatives, f$m.fp AS n_fp, " +
          s"CAST(f$m.fp * 10000 // c.nn AS BIGINT) AS fpr_e4 " +
          s"FROM f$m CROSS JOIN c"
      }.mkString("\nUNION ALL ")
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') t
         |              FROM documents),
         |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 2 + 1)) AS i
         |        FROM toks),
         |ng AS (SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ')
         |         AS g FROM pos),
         |ev AS MATERIALIZED (SELECT DISTINCT g FROM ng
         |  WHERE doc_id % 50 = 0),
         |tn AS MATERIALIZED (SELECT DISTINCT g FROM ng
         |  WHERE doc_id % 50 <> 0 AND g NOT IN (SELECT g FROM ev)),
         |c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ev) AS nk,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM tn) AS nn),
         |$blocks
         |SELECT * FROM ($sel) t ORDER BY m_bits""".stripMargin
    },
    "q78_decontam_bloom" -> {
      val posList = (0 until Q78Hashes)
        .map(i => s"CAST('0x' || substr(md5(g || '#$i'), 1, 15) AS BIGINT)" +
          s" % $Q78Bits")
        .mkString("list_value(", ", ", ")")
      s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') t
         |              FROM documents),
         |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 2 + 1)) AS i
         |        FROM toks),
         |ng AS (SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ')
         |         AS g FROM pos),
         |ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 50 = 0),
         |ep AS (SELECT DISTINCT unnest($posList) AS p FROM ev),
         |words AS (SELECT p // 32 AS w,
         |            BIT_OR(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
         |              AS word
         |          FROM ep GROUP BY 1),
         |tg AS (SELECT doc_id, g, COUNT(*) AS occ FROM ng
         |       WHERE doc_id % 50 <> 0 GROUP BY 1, 2),
         |tp AS (SELECT doc_id, g, occ, unnest($posList) AS p FROM tg),
         |hp AS (SELECT doc_id, g, occ,
         |         BOOL_AND(COALESCE((w.word &
         |           (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))) <> 0,
         |           FALSE)) AS hit
         |       FROM tp LEFT JOIN words w ON p // 32 = w.w GROUP BY 1, 2, 3),
         |tr AS (SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_ngrams,
         |         CAST(SUM(CASE WHEN hit THEN occ ELSE 0 END) AS BIGINT)
         |           AS n_hits
         |       FROM hp GROUP BY doc_id)
         |SELECT doc_id, n_ngrams, n_hits,
         |  ROUND(n_hits * 1.0 / n_ngrams, 4) AS contam_frac,
         |  ROUND(n_hits * 1.0 / n_ngrams, 4) >= 0.3 AS contaminated
         |FROM tr ORDER BY doc_id""".stripMargin
    },
    "q64_decontam" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(text, ' ') t
        |              FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 2 + 1)) AS i
        |        FROM toks),
        |ng AS (SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ') AS g
        |       FROM pos),
        |ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, COUNT(*) AS n_ngrams,
        |         CAST(SUM(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_hits
        |       FROM ng WHERE doc_id % 50 <> 0 GROUP BY doc_id)
        |SELECT doc_id, n_ngrams, n_hits,
        |  ROUND(n_hits * 1.0 / n_ngrams, 4) AS contam_frac,
        |  ROUND(n_hits * 1.0 / n_ngrams, 4) >= 0.3 AS contaminated
        |FROM tr ORDER BY doc_id""".stripMargin,
    "q65_repetition" ->
      s"""WITH $repetitionSql
         |SELECT doc_id, n_words, mean_word_len, top_word_frac,
         |  top_bigram_frac, keep
         |FROM rep ORDER BY doc_id""".stripMargin,
    "q66_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN '40'
        |    WHEN 'de' THEN '20' WHEN 'es' THEN '20' WHEN 'fr' THEN '20'
        |    ELSE '00' END
        |ORDER BY doc_id""".stripMargin
  )
}
