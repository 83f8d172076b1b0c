package graft.queries

import graft.Tables
import graft.operators.{Cooccurrence, Curation, Layout, Stats, Stitch,
  TextAnalysis, WebIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q183–q190: corpus-analytics and layout certificates added in round
  * 14 — data-derived thresholds (q183 Otsu), mergeable-sketch rollups
  * (q184), URL-level dedup (q185), per-source characteristic vocabulary
  * (q186 keyness), n-gram diversity (q187), consistent-hash shard
  * rebalancing (q188), and shard-boundary stitch repair (q190). All
  * exact integer/string algebra (ln pinned at e4 where it appears)
  * with full DuckDB oracles. (q189 multi-probe LSH lives with the ANN
  * family in OperatorQueries; q191 token yield with the dedup family
  * in DedupQueries.)
  */
object AnalyticsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // q183: Otsu per-language threshold over the chars-per-doc histogram
  // (bins of 20 chars, capped at 255) — the parameter-free binarization
  // cut between the "short doc" and "long doc" modes, maximizing
  // between-class variance in exact integer arithmetic.
  def q183(s: SparkSession, dir: String): DataFrame =
    Curation.otsuThreshold(docs(s, dir), "lang",
        least(expr("n_chars div 20"), lit(255L)))
      .orderBy(col("lang"))

  // q184: HLL register-rollup certificate — per-language word NDV from
  // per-(language, shard) sketches max-merged vs built in one pass vs
  // exact, with the naive sum-of-estimates column showing why sketches
  // merge rather than add.
  def q184(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir).select(col("lang"),
      (col("doc_id") % 7).as("shard"),
      explode(filter(split(lower(col("text")), " "),
        t => length(t) > 0)).as("w"))
    Stats.hllRollup(words, "lang", col("shard"), col("w"))
      .orderBy(col("lang"))
  }

  // q185: URL canonicalization — four deterministic messy variants per
  // page (case, default port, fragment, tracking params, param order,
  // trailing slash) must collapse to ONE canonical URL per page; the
  // report is the per-cluster raw-variant census a crawl frontier runs
  // before any content fetch.
  def q185(s: SparkSession, dir: String): DataFrame =
    WebIngest.withMessyUrl(docs(s, dir), "doc_id", "source")
      .withColumn("canon", WebIngest.canonicalizeUrl(col("raw_url")))
      .groupBy(col("canon"))
      .agg(countDistinct(col("raw_url")).as("n_raw"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("canon"))

  // q186: per-source keyness — top-5 characteristic terms by Dunning G²
  // (observed >= 5, over-represented cells only), the "what vocabulary
  // makes this source different" report.
  def q186(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.keyness(docs(s, dir), "source", "text",
        minCount = 5, topK = 5)
      .orderBy(col("source"), col("rank"))

  // q187: distinct-n diversity — per source, the distinct/total n-gram
  // ratio for n = 1..3 (the Li et al. distinct-n templatedness gauge).
  def q187(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.distinctNgrams(docs(s, dir), "source", "text", maxN = 3)
      .orderBy(col("source"), col("n"))

  // q188: consistent-hash rebalancing certificate — assign every doc to
  // 8 and then 9 shards on the same 16-vnode ring; per final shard:
  // docs before, docs after, docs that MOVED in. Consistent hashing's
  // guarantee is that only the NEW shard gains moved keys (~1/9 of the
  // data); the mod-N alternative would move ~8/9.
  def q188(s: SparkSession, dir: String): DataFrame = {
    // ensureParallelism: the ring lookup is an interpreted HOF (no
    // codegen for higher-order functions), so a one-split parquet read
    // would serialize ~3M lambda evals onto one core (the q145 gotcha).
    val assigned = graft.SparkUtil.ensureParallelism(docs(s, dir))
      .select(col("doc_id"),
        Layout.consistentShard(col("doc_id"), 8).as("sh8"),
        Layout.consistentShard(col("doc_id"), 9).as("sh9"))
    // One pass: stack each doc into a before-row and an after-row, then
    // a single map-side-combinable aggregate per shard.
    assigned
      .select(explode(array(
        struct(col("sh8").as("shard"), lit(1L).as("before"),
          lit(0L).as("after"), lit(0L).as("moved")),
        struct(col("sh9").as("shard"), lit(0L).as("before"),
          lit(1L).as("after"),
          when(col("sh8") =!= col("sh9"), 1L).otherwise(0L)
            .as("moved")))).as("r"))
      .groupBy(col("r.shard").as("shard"))
      .agg(sum(col("r.before")).as("n_before"),
        sum(col("r.after")).as("n_after"),
        sum(col("r.moved")).as("n_moved_in"))
      .orderBy(col("shard"))
  }

  // q190: shard-boundary STITCH round-trip — every doc is split into two
  // shards with a 4-token overlap (the planted crawl artifact), the
  // detector scans ADJACENT records per source (it does not know doc
  // boundaries), and the repaired text must md5 back to the original.
  def q190(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val det = Stitch.detectAdjacent(
      Stitch.shard(d, "doc_id", "text", k = 4),
      "source", "shard_id", "text", k = 4)
    val own = det
      .filter(col("left_id") % 2 === 0 &&
        col("right_id") === col("left_id") + 1)
      .select(expr("left_id div 2").as("doc_id"), col("matched"),
        md5(col("merged_text")).as("merged_md5"))
    d.select(col("doc_id"), col("source"),
        (size(split(col("text"), " ")) >= 8).as("was_split"),
        md5(col("text")).as("__orig"))
      .join(own, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("was_split"),
        coalesce(col("matched"), lit(false)).as("stitched"),
        coalesce(col("__orig") === col("merged_md5"), !col("was_split"))
          .as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  // q192: Poisson-bootstrap 95% CI on the per-language mean doc length
  // — 40 deterministic md5-derived replicates (exact-integer inverse
  // CDF), percentile pick at ranks 2/39 of the sorted replicate means.
  def q192(s: SparkSession, dir: String): DataFrame =
    Stats.bootstrapMeanCi(
        docs(s, dir).withColumn("len", length(col("text"))),
        "lang", "len", "doc_id", b = 40, seed = "boot",
        loRank = 2, hiRank = 39)
      .orderBy(col("lang"))

  // q193: encoding/mojibake audit over planted corruption — doc_id%7=0
  // gets a U+FFFD prefix (decode damage), doc_id%11=3 gets a BEL
  // control char appended (binary bleed); both moduli are coprime to
  // the source assignment's mod-20 cycle, so the planted rates spread
  // across every source instead of degenerating to all-or-nothing.
  // The per-source audit must count exactly the planted sets.
  def q193(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val dirty = d.withColumn("text",
      when(col("doc_id") % 7 === 0,
        concat(lit("� "), col("text"))).otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 11 === 3,
          concat(col("text"), expr("chr(7)"))).otherwise(col("text")))
    TextAnalysis.encodingAudit(dirty, "source", "text")
      .orderBy(col("source"))
  }

  // q194: item co-occurrence with support + lift over the events
  // baskets (item = the props.k payload): distinct per-user baskets,
  // power users (> 64 items) dropped before the keyed pair join,
  // minSupport 2.
  def q194(s: SparkSession, dir: String): DataFrame =
    Cooccurrence.pairs(
      Tables.load(s, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("item")),
      "user_id", "item", minSupport = 2L, maxBasket = 64)

  // q199: STREAMING canonical-URL dedup — the round-14 canonicalizer
  // run through the REAL streaming runtime (readStream source listing ->
  // per-row canonicalization -> stateful dropDuplicates on the canonical
  // form -> parquet sink commit): the crawl-frontier shape, where URL
  // dedup must happen as URLs ARRIVE, not in a nightly batch. The
  // certified output is the distinct canonical SET (the representative
  // chosen inside a micro-batch is not deterministic; the set is),
  // hash-matched against the batch DISTINCT replay.
  //
  // STATE BOUND (r15): the unwatermarked dropDuplicates here holds one
  // state row per distinct canonical URL FOREVER — exact, and correct
  // for this certificate's bounded AvailableNow corpus, but unbounded
  // on a true continuous crawl. The two scale-safe shapes both exist
  // in-repo, and a 100 TB frontier picks by its recrawl policy:
  //   - recrawl horizon (a URL seen again after H days is refetched
  //     anyway): q203's dropDuplicatesWithinWatermark form — state is
  //     bounded by the horizon, eviction is the watermark's;
  //   - exact-forever frontier: the q85 discipline — foreachBatch
  //     against an on-disk hash-bucketed signature store (state lives
  //     in the store, pruned per batch by bucket, RAM stays O(batch)).
  def q199(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .parquet(s"$dir/documents.parque*")
    val canon = WebIngest.withMessyUrl(stream, "doc_id", "source")
      .select(WebIngest.canonicalizeUrl(col("raw_url")).as("canon"))
      .dropDuplicates("canon")
    val tmp = java.nio.file.Files.createTempDirectory("graft-q199")
    val q = canon.writeStream
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$tmp/out").orderBy(col("canon"))
  }

  // q203: q199 with BOUNDED state — the recrawl-horizon frontier shape.
  // Same real micro-batch runtime (readStream -> canonicalize -> state
  // dedup -> parquet sink), but the dedup is dropDuplicatesWithinWatermark
  // over a synthesized event time: state holds a canonical URL only until
  // the watermark passes its event time + delay, so frontier RAM is
  // O(URLs within the recrawl horizon), never O(URLs ever seen). Event
  // times are deterministic (page id mod 600 seconds past a fixed epoch;
  // all four messy variants of a page share the page's timestamp), and
  // the delay (10 min) covers the full event-time span, so within this
  // bounded run nothing is late and nothing is evicted-then-re-emitted —
  // the emitted set IS the exact distinct set, hash-matched against the
  // same DISTINCT replay as q199. The eviction behavior itself (state
  // rows dropped once the watermark passes, a re-arrival after eviction
  // re-emitting — the documented horizon trade-off) is pinned by the
  // 2-batch UrlDedupWatermarkSpec, where batches control the watermark.
  def q203(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .parquet(s"$dir/documents.parque*")
    val canon = WebIngest.withMessyUrl(stream, "doc_id", "source")
      .select(WebIngest.canonicalizeUrl(col("raw_url")).as("canon"),
        timestamp_seconds(lit(1700000000L) +
          pmod(expr("doc_id div 4"), lit(600L))).as("ts"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("canon")
      .select(col("canon"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-q203")
    val q = canon.writeStream
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$tmp/out").orderBy(col("canon"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_otsu_threshold" -> (q183 _),
    "q184_hll_rollup" -> (q184 _),
    "q185_url_canonical" -> (q185 _),
    "q186_keyness" -> (q186 _),
    "q187_distinct_ngrams" -> (q187 _),
    "q188_consistent_shards" -> (q188 _),
    "q190_shard_stitch" -> (q190 _),
    "q192_bootstrap_ci" -> (q192 _),
    "q193_encoding_audit" -> (q193 _),
    "q194_cooccurrence" -> (q194 _),
    "q199_stream_url_dedup" -> (q199 _),
    "q203_stream_url_dedup_wm" -> (q203 _))

  /** The Dunning-G2 keyness replay from a caller-supplied `tok(grp,
    * term)` CTE to the `ranked` CTE — shared by q186 (grp = source)
    * and q201 (grp = embedding cluster) so the two cannot drift.
    * Pre-flattened lines: safe inside an outer concatenation.
    *
    * r16 double-ratio form, in lockstep with `TextAnalysis.keyness`:
    * every ln argument is (k/row)·(N/col) evaluated as two double
    * divisions and one multiply (NO integer product — the r15 k·N and
    * row·col products capped the budget at 3·10⁹ tokens); the
    * over-representation filter and exp_e4 are restructured the same
    * way. Identical IEEE chains in both engines.
    */
  private[queries] def keynessChainSql(tokCte: String): String =
    tokCte + ",\n" +
      """cells AS (SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS a
        |          FROM tok GROUP BY 1, 2),
        |marg AS (SELECT grp, term, a,
        |    SUM(a) OVER (PARTITION BY term) AS tt,
        |    SUM(a) OVER (PARTITION BY grp) AS st,
        |    SUM(a) OVER () AS n
        |  FROM cells),
        |cell4 AS (SELECT grp, term, a, tt, st, n, tt - a AS b, st - a AS c,
        |    n - st - (tt - a) AS d
        |  FROM marg WHERE a >= 5 AND
        |    CAST(a AS DOUBLE) / CAST(st AS DOUBLE) >
        |      CAST(tt AS DOUBLE) / CAST(n AS DOUBLE)),
        |g2 AS (SELECT grp, term, a, st, tt, n,
        |    2 * (
        |      (CASE WHEN a > 0 THEN a * CAST(ROUND(ln(
        |        (CAST(a AS DOUBLE) / CAST(st AS DOUBLE))
        |          * (CAST(n AS DOUBLE) / CAST(tt AS DOUBLE)))
        |        * 10000, 0) AS BIGINT) ELSE 0 END) +
        |      (CASE WHEN b > 0 THEN b * CAST(ROUND(ln(
        |        (CAST(b AS DOUBLE) / CAST(n - st AS DOUBLE))
        |          * (CAST(n AS DOUBLE) / CAST(tt AS DOUBLE)))
        |        * 10000, 0) AS BIGINT) ELSE 0 END) +
        |      (CASE WHEN c > 0 THEN c * CAST(ROUND(ln(
        |        (CAST(c AS DOUBLE) / CAST(st AS DOUBLE))
        |          * (CAST(n AS DOUBLE) / CAST(n - tt AS DOUBLE)))
        |        * 10000, 0) AS BIGINT) ELSE 0 END) +
        |      (CASE WHEN d > 0 THEN d * CAST(ROUND(ln(
        |        (CAST(d AS DOUBLE) / CAST(n - st AS DOUBLE))
        |          * (CAST(n AS DOUBLE) / CAST(n - tt AS DOUBLE)))
        |        * 10000, 0) AS BIGINT) ELSE 0 END)) AS g2_e4,
        |    CAST(FLOOR(CAST(st AS DOUBLE) / CAST(n AS DOUBLE)
        |      * CAST(tt AS DOUBLE) * 10000) AS BIGINT) AS exp_e4
        |  FROM cell4),
        |ranked AS (SELECT grp, term, a, exp_e4, g2_e4,
        |    ROW_NUMBER() OVER (PARTITION BY grp
        |      ORDER BY g2_e4 DESC, term) AS rank
        |  FROM g2)""".stripMargin

  /** The portable-HLL rho/register algebra over an md5 column `h`,
    * shared by every q184 CTE — the same hex-digit recipe as
    * [[graft.operators.Stats.hllRegister]] and q79's oracle.
    */
  private val RhoSql: String =
    """LEAST(CASE WHEN t = '' THEN 53
      |  ELSE (13 - LENGTH(t)) * 4
      |    + CASE WHEN substring(t, 1, 1) = '1' THEN 3
      |           WHEN substring(t, 1, 1) IN ('2','3') THEN 2
      |           WHEN substring(t, 1, 1) IN ('4','5','6','7') THEN 1
      |           ELSE 0 END + 1 END, 50)""".stripMargin
      .linesIterator.map(_.stripPrefix("|")).mkString(" ")

  /** Grouped HLL estimate chain: from a register CTE `reg(keys..., b,
    * m)` to `out(keys..., ndv)` — the q79 estimate arithmetic, grouped.
    */
  private def hllEstCtes(reg: String, keys: String, out: String): String = {
    val raw = "(0.7213e0 / (1.0e0 + 1.079e0 / 4096.0e0)) * 16777216.0e0" +
      " * 1125899906842624.0e0 / CAST(s AS DOUBLE)"
    s"""${out}_ss AS (SELECT $keys, COUNT(*) AS present,
       |    CAST(SUM(CAST(1 AS BIGINT) << (50 - m)) AS BIGINT) AS sp
       |  FROM $reg GROUP BY $keys),
       |${out}_ee AS (SELECT $keys, 4096 - present AS zeros,
       |    sp + (4096 - present) * (CAST(1 AS BIGINT) << 50) AS s
       |  FROM ${out}_ss),
       |$out AS (SELECT $keys, CAST(ROUND(CASE
       |    WHEN $raw <= 10240.0e0 AND zeros > 0
       |    THEN 4096.0e0 * ln(4096.0e0 / zeros)
       |    ELSE $raw END, 0) AS BIGINT) AS ndv
       |  FROM ${out}_ee)""".stripMargin
  }

  /** The messy-URL synthesis + canonicalization replay (raw/parts/
    * canon CTE chain) — shared by the q185 cluster census and the
    * q199 streaming-dedup certificate so the two oracles cannot
    * drift.
    */
  /** Shared with WarehouseQueries (q214 reuses the messy-URL + canon
    * replay as its planted entity-resolution truth).
    */
  private[queries] val CanonCtes: String =
    """WITH raw AS (SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 4 = 1
        |      THEN upper('www.' || source || CASE WHEN (doc_id // 4) % 3 = 0
        |        THEN '.com' WHEN (doc_id // 4) % 3 = 1 THEN '.co.uk'
        |        ELSE '.org' END)
        |      ELSE 'www.' || source || CASE WHEN (doc_id // 4) % 3 = 0
        |        THEN '.com' WHEN (doc_id // 4) % 3 = 1 THEN '.co.uk'
        |        ELSE '.org' END END ||
        |    CASE WHEN doc_id % 4 = 2 THEN ':443' ELSE '' END ||
        |    '/p/' || CAST(doc_id // 4 AS VARCHAR) ||
        |    CASE WHEN doc_id % 4 = 3 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=2'
        |         WHEN doc_id % 4 = 1 THEN '?b=2&a=1&utm_source=feed'
        |         WHEN doc_id % 4 = 2 THEN '?utm_campaign=x&a=1&b=2'
        |         ELSE '?a=1&gclid=zzz&b=2' END ||
        |    CASE WHEN doc_id % 4 = 2 THEN '#frag' ELSE '' END AS raw_url
        |  FROM documents),
        |parts AS (SELECT doc_id, raw_url,
        |    lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]+)', 1))
        |      AS hostraw,
        |    regexp_replace(regexp_extract(raw_url,
        |      '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '') AS path,
        |    regexp_extract(raw_url, '\?([^#]*)', 1) AS qs
        |  FROM raw),
        |canon AS (SELECT doc_id, raw_url,
        |    scheme || '://' ||
        |    CASE WHEN scheme = 'https'
        |         THEN regexp_replace(hostraw, ':443$', '')
        |         WHEN scheme = 'http'
        |         THEN regexp_replace(hostraw, ':80$', '')
        |         ELSE hostraw END ||
        |    path ||
        |    CASE WHEN len(list_sort(list_filter(string_split(qs, '&'),
        |        p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
        |          '^(utm_|gclid=|fbclid=|ref=)')))) > 0
        |      THEN '?' || list_aggregate(list_sort(list_filter(
        |        string_split(qs, '&'),
        |        p -> LENGTH(p) > 0 AND NOT regexp_matches(p,
        |          '^(utm_|gclid=|fbclid=|ref=)'))), 'string_agg', '&')
        |      ELSE '' END AS canon
        |  FROM parts)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q192_bootstrap_ci" -> {
      val th = graft.operators.Stats.PoissonThresholdsE52
      val mExpr = th.map(t =>
        s"(CASE WHEN h >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH reps AS (SELECT unnest(range(0, 40)) AS rep),
         |base AS (SELECT doc_id, lang,
         |    CAST(LENGTH(text) AS BIGINT) AS v FROM documents),
         |hh AS (SELECT lang, rep, v,
         |    CAST(('0x' || substring(md5('boot:' || CAST(rep AS VARCHAR)
         |      || ':' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS h
         |  FROM base CROSS JOIN reps),
         |mm AS (SELECT lang, rep, v, $mExpr AS m FROM hh),
         |cells AS (SELECT lang, rep, SUM(m * v) AS s, SUM(m) AS n
         |  FROM mm WHERE m > 0 GROUP BY 1, 2),
         |means AS (SELECT lang, rep, s * 10000 // n AS mean_e4
         |  FROM cells),
         |rk AS (SELECT lang, rep, mean_e4, ROW_NUMBER() OVER
         |    (PARTITION BY lang ORDER BY mean_e4, rep) AS rk FROM means),
         |ci AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_replicates,
         |    CAST(MAX(CASE WHEN rk = 2 THEN mean_e4 END) AS BIGINT)
         |      AS boot_lo_e4,
         |    CAST(MAX(CASE WHEN rk = 39 THEN mean_e4 END) AS BIGINT)
         |      AS boot_hi_e4
         |  FROM rk GROUP BY lang),
         |fl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(v) * 10000 // COUNT(*) AS BIGINT) AS mean_e4
         |  FROM base GROUP BY lang)
         |SELECT fl.lang, n_rows, mean_e4, boot_lo_e4, boot_hi_e4,
         |  n_replicates
         |FROM fl JOIN ci USING (lang) ORDER BY fl.lang""".stripMargin
    },
    "q193_encoding_audit" ->
      """WITH dirty AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 11 = 3 THEN t2 || chr(7) ELSE t2 END AS text
        |  FROM (SELECT doc_id, source,
        |      CASE WHEN doc_id % 7 = 0 THEN '� ' || text ELSE text END
        |        AS t2
        |    FROM documents))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN contains(text, '�') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_replacement,
        |  CAST(SUM(CASE WHEN regexp_matches(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_control,
        |  CAST(SUM(CASE WHEN contains(text, '�') THEN 1 ELSE 0 END)
        |    * 10000 // COUNT(*) AS BIGINT) AS repl_rate_e4,
        |  CAST(SUM(CASE WHEN regexp_matches(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END)
        |    * 10000 // COUNT(*) AS BIGINT) AS ctrl_rate_e4
        |FROM dirty GROUP BY source ORDER BY source""".stripMargin,
    "q194_cooccurrence" ->
      """WITH b0 AS (SELECT DISTINCT user_id AS u,
        |    CAST(json_extract(props, '$.k') AS INTEGER) AS i
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND json_extract(props, '$.k') IS NOT NULL),
        |ku AS (SELECT u FROM b0 GROUP BY u HAVING COUNT(*) <= 64),
        |k AS (SELECT b0.u, b0.i FROM b0 JOIN ku USING (u)),
        |n AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS nu FROM k),
        |sup AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS s FROM k
        |        GROUP BY i),
        |p AS (SELECT a.i AS ia, b.i AS ib FROM k a
        |      JOIN k b ON a.u = b.u AND a.i < b.i),
        |g AS (SELECT ia, ib, CAST(COUNT(*) AS BIGINT) AS n_both
        |      FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT ia AS item_a, ib AS item_b, n_both, sa.s AS sup_a,
        |  sb.s AS sup_b,
        |  CAST(n_both * n.nu * 10000 // (sa.s * sb.s) AS BIGINT)
        |    AS lift_e4
        |FROM g JOIN sup sa ON g.ia = sa.i JOIN sup sb ON g.ib = sb.i
        |CROSS JOIN n
        |ORDER BY n_both DESC, item_a, item_b""".stripMargin,
    "q183_otsu_threshold" ->
      """WITH d AS (SELECT lang,
        |    LEAST(n_chars // 20, 255) AS s FROM documents),
        |hist AS (SELECT lang, s, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM d GROUP BY 1, 2),
        |r AS (SELECT lang, s, c,
        |        SUM(c) OVER (PARTITION BY lang ORDER BY s) AS w0,
        |        SUM(c * s) OVER (PARTITION BY lang ORDER BY s) AS m0,
        |        SUM(c) OVER (PARTITION BY lang) AS n,
        |        SUM(c * s) OVER (PARTITION BY lang) AS m
        |      FROM hist),
        |r2 AS (SELECT lang, s, w0, m0, n - w0 AS w1, m - m0 AS m1
        |       FROM r WHERE n - w0 > 0),
        |r3 AS (SELECT lang, s, w0, m0, w1, m1,
        |        (m0 * w1 - m1 * w0) * 100 // (w0 * w1) AS d
        |      FROM r2),
        |r4 AS (SELECT lang, s, w0, m0, w1, m1, w0 * w1 * d * d AS obj,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY w0 * w1 * d * d DESC, s) AS rk
        |      FROM r3)
        |SELECT lang, CAST(s + 1 AS BIGINT) AS threshold,
        |  CAST(w0 AS BIGINT) AS n_below, CAST(w1 AS BIGINT) AS n_above,
        |  CAST(m0 * 100 // w0 AS BIGINT) AS mu_below_e2,
        |  CAST(m1 * 100 // w1 AS BIGINT) AS mu_above_e2,
        |  CAST(obj AS BIGINT) AS sep_obj
        |FROM r4 WHERE rk = 1 ORDER BY lang""".stripMargin,
    "q184_hll_rollup" -> {
      s"""WITH words AS (SELECT lang, doc_id % 7 AS shard,
         |    unnest(list_filter(regexp_split_to_array(lower(text), ' '),
         |      x -> LENGTH(x) > 0)) AS w
         |  FROM documents),
         |hh AS (SELECT lang, shard, md5(w) AS h, w FROM words),
         |tt AS (SELECT lang, shard, w, substring(h, 1, 3) AS b,
         |         ltrim(substring(h, 4, 13), '0') AS t FROM hh),
         |rho AS (SELECT lang, shard, w, b, $RhoSql AS m FROM tt),
         |reg AS (SELECT lang, shard, b, MAX(m) AS m FROM rho
         |        GROUP BY 1, 2, 3),
         |${hllEstCtes("reg", "lang, shard", "estp")},
         |pp AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_parts,
         |         CAST(SUM(ndv) AS BIGINT) AS sum_part_est
         |       FROM estp GROUP BY lang),
         |mreg AS (SELECT lang, b, MAX(m) AS m FROM reg GROUP BY 1, 2),
         |${hllEstCtes("mreg", "lang", "estm")},
         |dreg AS (SELECT lang, b, MAX(m) AS m FROM rho GROUP BY 1, 2),
         |${hllEstCtes("dreg", "lang", "estd")},
         |ex AS (SELECT lang, CAST(COUNT(DISTINCT w) AS BIGINT)
         |         AS exact_ndv FROM words GROUP BY lang)
         |SELECT ex.lang, pp.n_parts, ex.exact_ndv,
         |  estd.ndv AS est_direct, estm.ndv AS est_merged,
         |  (estm.ndv = estd.ndv) AS merged_eq_direct, pp.sum_part_est,
         |  CAST(abs(estm.ndv - ex.exact_ndv) * 10000 // ex.exact_ndv
         |    AS BIGINT) AS err_e4
         |FROM ex JOIN estd USING (lang) JOIN estm USING (lang)
         |  JOIN pp USING (lang)
         |ORDER BY ex.lang""".stripMargin
    },
    "q185_url_canonical" ->
      (CanonCtes + """
        |SELECT canon, CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM canon GROUP BY canon ORDER BY canon""".stripMargin),
    "q199_stream_url_dedup" ->
      (CanonCtes +
        "\nSELECT DISTINCT canon FROM canon ORDER BY canon"),
    // q203: watermark delay covers the event-time span, so the bounded
    // run's emitted set is exactly the distinct set — same replay.
    "q203_stream_url_dedup_wm" ->
      (CanonCtes +
        "\nSELECT DISTINCT canon FROM canon ORDER BY canon"),
    "q186_keyness" ->
      ("WITH " + keynessChainSql(
        """tok AS (SELECT source AS grp,
          |    unnest(list_filter(regexp_split_to_array(lower(text), ' '),
          |      x -> LENGTH(x) > 0)) AS term
          |  FROM documents)""".stripMargin) + """
        |SELECT grp AS source, CAST(rank AS BIGINT) AS rank, term,
        |  a AS n_obs, CAST(exp_e4 AS BIGINT) AS exp_e4,
        |  CAST(g2_e4 AS BIGINT) AS g2_e4
        |FROM ranked WHERE rank <= 5 ORDER BY source, rank""".stripMargin),
    "q187_distinct_ngrams" ->
      """WITH toks AS (SELECT source,
        |    regexp_split_to_array(lower(text), ' ') AS t FROM documents),
        |g AS (
        |  SELECT source, 1 AS n, unnest(t) AS gram FROM toks
        |  UNION ALL
        |  SELECT source, 2 AS n,
        |    list_aggregate(t[i:i+1], 'string_agg', ' ') AS gram
        |  FROM (SELECT source, t, unnest(range(1, len(t))) AS i FROM toks)
        |  UNION ALL
        |  SELECT source, 3 AS n,
        |    list_aggregate(t[i:i+2], 'string_agg', ' ') AS gram
        |  FROM (SELECT source, t, unnest(range(1, len(t) - 1)) AS i
        |        FROM toks))
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS total_grams,
        |  CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_grams,
        |  CAST(COUNT(DISTINCT gram) * 10000 // COUNT(*) AS BIGINT)
        |    AS distinct_e4
        |FROM g GROUP BY source, n ORDER BY source, n""".stripMargin,
    "q190_shard_stitch" ->
      """WITH d AS (SELECT doc_id, source, text,
        |    string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id * 2 AS shard_id, doc_id, source,
        |    CASE WHEN len(t) >= 8
        |      THEN list_aggregate(t[1:(len(t)+4)//2], 'string_agg', ' ')
        |      ELSE text END AS text
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id * 2 + 1, doc_id, source,
        |    list_aggregate(t[(len(t)+4)//2-3:len(t)], 'string_agg', ' ')
        |  FROM d WHERE len(t) >= 8),
        |w AS (SELECT source, shard_id AS left_id, text,
        |    LEAD(shard_id) OVER (PARTITION BY source ORDER BY shard_id)
        |      AS right_id,
        |    LEAD(text) OVER (PARTITION BY source ORDER BY shard_id)
        |      AS next_text
        |  FROM sh),
        |p AS (SELECT source, left_id, right_id, text,
        |    string_split(text, ' ') AS ct, string_split(next_text, ' ') AS nt
        |  FROM w WHERE right_id IS NOT NULL),
        |det AS (SELECT source, left_id, right_id,
        |    (len(ct) >= 4 AND len(nt) >= 4
        |      AND ct[len(ct)-3:len(ct)] = nt[1:4]) AS matched,
        |    CASE WHEN (len(ct) >= 4 AND len(nt) >= 4
        |        AND ct[len(ct)-3:len(ct)] = nt[1:4])
        |      THEN CASE WHEN len(nt) = 4 THEN text
        |        ELSE text || ' ' ||
        |          list_aggregate(nt[5:len(nt)], 'string_agg', ' ') END
        |      END AS merged
        |  FROM p),
        |own AS (SELECT left_id // 2 AS doc_id, matched,
        |    md5(merged) AS merged_md5
        |  FROM det WHERE left_id % 2 = 0 AND right_id = left_id + 1)
        |SELECT d.doc_id, d.source, len(d.t) >= 8 AS was_split,
        |  COALESCE(own.matched, FALSE) AS stitched,
        |  COALESCE(md5(d.text) = own.merged_md5, NOT (len(d.t) >= 8))
        |    AS roundtrip_ok
        |FROM d LEFT JOIN own USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q188_consistent_shards" -> {
      // Single-line fragment body: a continuation line starting with
      // "||" would lose a pipe to the OUTER stripMargin (skill gotcha).
      def ringCte(n: Int, name: String): String =
        s"$name AS (SELECT CAST(('0x' || substring(md5('shard:' || " +
          "CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 13)) " +
          "AS BIGINT) AS pos, s AS shard " +
          s"FROM (SELECT unnest(range(0, $n)) AS s), " +
          "(SELECT unnest(range(0, 16)) AS v))"
      def asgCte(ring: String, out: String): String =
        s"""${out}_succ AS (SELECT d.doc_id, MIN($ring.pos) AS p
           |  FROM d JOIN $ring ON $ring.pos >= d.h GROUP BY d.doc_id),
           |$out AS (SELECT d.doc_id, CAST(COALESCE(r2.shard,
           |    (SELECT shard FROM $ring ORDER BY pos LIMIT 1)) AS BIGINT)
           |      AS shard
           |  FROM d LEFT JOIN ${out}_succ ON d.doc_id = ${out}_succ.doc_id
           |  LEFT JOIN $ring r2 ON ${out}_succ.p = r2.pos)""".stripMargin
      s"""WITH d AS (SELECT doc_id,
         |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
         |      AS BIGINT) AS h
         |  FROM documents),
         |${ringCte(8, "ring8")},
         |${ringCte(9, "ring9")},
         |${asgCte("ring8", "a8")},
         |${asgCte("ring9", "a9")},
         |st AS (SELECT a8.shard AS shard, 1 AS before, 0 AS after, 0 AS mv
         |       FROM a8
         |       UNION ALL
         |       SELECT a9.shard, 0, 1,
         |         CASE WHEN a8.shard <> a9.shard THEN 1 ELSE 0 END
         |       FROM a9 JOIN a8 USING (doc_id))
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(SUM(before) AS BIGINT) AS n_before,
         |  CAST(SUM(after) AS BIGINT) AS n_after,
         |  CAST(SUM(mv) AS BIGINT) AS n_moved_in
         |FROM st GROUP BY shard ORDER BY shard""".stripMargin
    })
}
