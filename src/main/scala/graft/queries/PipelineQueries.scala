package graft.queries

import graft.Tables
import graft.functions.SampleK
import graft.operators.{Centroids, CountMin, WebIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q102–q106: pipeline-completion tier — bounded-state frequency and
  * sampling summaries (count-min point estimates q102, exact seeded
  * k-sample q103), web-corpus ingest (HTML main-content extraction q104,
  * URL parsing/public-suffix/blocklist curation q105), and SemDeDup-style
  * cluster-scoped semantic dedup (q106). All five under full DuckDB
  * oracles: sketches by md5 register algebra (q79's technique), distances
  * in fixed-point integers (SURVEY §5.4), HTML/URL by the identical
  * regex algebra on both engines.
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
    val regs = CountMin.sketch(ev, "user_id", CmD, CmW)
    val exact = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(20)
    CountMin.estimate(exact, regs, "user_id", CmD, CmW)
      .join(exact, Seq("user_id"))
      .select(col("user_id"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("user_id"))
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
    val a = v.select(col("assigned"), col("vec_id").as("a"),
      col("embedding").as("va"))
    val b = v.select(col("assigned"), col("vec_id").as("b"),
      col("embedding").as("vb"))
    val d2 = aggregate(
      zip_with(col("va"), col("vb"), (x, y) =>
        floor((x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double")) * lit(1e8)).cast("long")),
      lit(0L), (acc, z) => acc + z)
    val dup = a.join(b, Seq("assigned")).filter(col("a") < col("b"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_countmin" -> (q102 _),
    "q103_sample_k" -> (q103 _),
    "q104_html_extract" -> (q104 _),
    "q105_url_report" -> (q105 _),
    "q106_semantic_dedup" -> (q106 _))

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

  /** md5-derived count-min bucket of VARCHAR expression `k` in row `r`
    * (the SQL mirror of [[CountMin.bucket]]).
    */
  private def cmBucketSql(r: String, k: String): String =
    s"CAST(('0x' || substring(md5(CAST($r AS VARCHAR) || ':' || $k), 1, 8)) " +
      s"AS BIGINT) % $CmW"

  private val blockedInList: String =
    Blocked.map(d => s"'$d'").mkString("(", ", ", ")")

  val oracle: Map[String, String] = Map(
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
