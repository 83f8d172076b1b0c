package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus ingest primitives: HTML main-content extraction and URL
  * parsing/filtering — the first two operators of every web-scale
  * training-data pipeline (boilerplate removal and domain curation),
  * expressed as portable regex/string algebra so a DuckDB oracle replays
  * them bit-for-bit.
  *
  * The HTML inputs are CONSTRUCTED deterministically from the documents
  * table (same convention as the q88 media round-trip: the container
  * format is real, the payload synthesized — no HTML corpus ships in the
  * testdata). The extraction path is the real operator: it is also
  * spec-tested on handcrafted nested markup, and the main-content text is
  * md5-certified byte-for-byte against the original document body.
  *
  * Everything is `functions._` column algebra (codegen'd, no UDFs); at
  * 100 TB both operators are embarrassingly parallel single-pass
  * projections — no shuffle until the final report aggregate.
  */
object WebIngest {

  // ---------------------------------------------------------------- HTML

  /** Deterministic HTML wrapping of a document row: title head, nav
    * boilerplate, h1, a reference link + language tag, the body text as
    * the single plain `<p>`, and a footer.
    */
  def withHtml(df: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String, out: String = "html"): DataFrame = {
    val title = concat(lit("Doc "), col(idCol).cast("string"),
      lit(" ("), col(langCol), lit(")"))
    val href = concat(lit("https://"), col(sourceCol),
      lit(".example.com/d/"), col(idCol).cast("string"))
    df.withColumn(out, concat(
      lit("<html><head><title>"), title, lit("</title></head><body>"),
      lit("<nav><a href=\"/home\">home</a> <a href=\"/about\">about</a></nav>"),
      lit("<h1>"), title, lit("</h1>"),
      lit("<p class=\"ref\"><a href=\""), href, lit("\">source</a> <em>"),
      col(langCol), lit("</em></p>"),
      lit("<p>"), col(textCol), lit("</p>"),
      lit("<footer>(c) 2026 "), col(sourceCol),
      lit("</footer></body></html>")))
  }

  /** Strip every tag: the text a `<tag>`-blind reader sees. */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  /** Main-content extraction over `htmlCol`: title, link inventory, the
    * main `<p>` body, and the boilerplate fraction (nav + footer text as
    * a permille of all visible text — integer division, so the ratio is
    * engine-exact; the trafilatura-style content/chrome signal).
    */
  def extract(df: DataFrame, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    val hrefs = regexp_extract_all(h, lit("href=\"([^\"]*)\""), lit(1))
    val navTxt = stripTags(regexp_extract(h, "<nav>(.*?)</nav>", 1))
    val footTxt = stripTags(regexp_extract(h, "<footer>(.*?)</footer>", 1))
    val allTxt = stripTags(h)
    df.withColumn("title", regexp_extract(h, "<title>([^<]*)</title>", 1))
      .withColumn("n_links", size(hrefs).cast("long"))
      .withColumn("first_href", element_at(hrefs, 1))
      .withColumn("main_text", regexp_extract(h, "<p>([^<]*)</p>", 1))
      // floor of an exact-integer quotient: both engines see the same
      // rational, so FLOOR agrees with integer division bit-for-bit.
      .withColumn("boiler_permille",
        floor((length(navTxt) + length(footTxt)).cast("double") * 1000.0 /
          length(allTxt).cast("double")).cast("long"))
  }

  // ---------------------------------------------------------------- URLs

  /** Deterministic URL for a document row: varies subdomain (www / a
    * language cdn), effective TLD (.com / .co.uk / .org — the multi-label
    * suffix exercises real public-suffix logic), and an optional query
    * string.
    */
  def withUrl(df: DataFrame, idCol: String, langCol: String,
      sourceCol: String, out: String = "url"): DataFrame = {
    val id = col(idCol)
    val sub = when(id % 2 === 0, lit("www."))
      .otherwise(concat(lit("cdn."), col(langCol), lit(".")))
    val tld = when(id % 3 === 0, lit(".com"))
      .when(id % 3 === 1, lit(".co.uk"))
      .otherwise(lit(".org"))
    val qs = when(id % 5 === 0,
        concat(lit("?ref=feed&page="), (id % 7).cast("string")))
      .otherwise(lit(""))
    df.withColumn(out, concat(lit("https://"), sub, col(sourceCol), tld,
      lit("/"), col(langCol), lit("/d"), id.cast("string"), qs))
  }

  /** Public suffixes the parser knows, longest (most labels) first —
    * the literal stand-in for the public-suffix list. A naive
    * "last two labels" rule would call the registrable domain of
    * `cdn.en.src3.co.uk` "co.uk"; matching multi-label suffixes first
    * yields `src3.co.uk`.
    */
  val PublicSuffixes: Seq[String] = Seq("co.uk", "com", "org")

  /** URL decomposition: scheme, host, path, the `page` query parameter,
    * public suffix, and registrable domain. Pure regex algebra (the same
    * expressions the oracle replays); null page when absent.
    */
  def parseUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val host = regexp_extract(u, "^[a-z]+://([^/?#]+)", 1)
    // Reverse-fold so the FIRST (longest) suffix ends up as the
    // outermost branch: "co.uk" must win over a hypothetical "uk".
    val suffix = PublicSuffixes.reverse.foldLeft(lit("")) { (acc, s) =>
      when(col("host").endsWith("." + s), lit(s)).otherwise(acc)
    }
    val rd = PublicSuffixes.reverse.foldLeft(lit("")) { (acc, s) =>
      val esc = s.replace(".", "\\.")
      when(col("host").endsWith("." + s),
        regexp_extract(col("host"), s"([^.]+\\.$esc)$$", 1)).otherwise(acc)
    }
    df.withColumn("scheme", regexp_extract(u, "^([a-z]+)://", 1))
      .withColumn("host", host)
      .withColumn("path", regexp_extract(u, "^[a-z]+://[^/?#]+([^?#]*)", 1))
      .withColumn("page", nullif(regexp_extract(u, "[?&]page=([0-9]+)", 1),
        lit("")))
      .withColumn("public_suffix", suffix)
      .withColumn("registered_domain", rd)
  }

  /** Deterministic MESSY URL for a document row — four raw variants per
    * canonical page (page = id div 4, variant = id mod 4), covering the
    * real crawl-frontier noise classes: mixed-case host (v1), explicit
    * default port (v2), trailing slash (v3), shuffled query-parameter
    * order (all), tracking parameters (utm_, gclid; v1/v2/v3), and a
    * fragment (v2). All four variants of a page canonicalize to
    * `https://www.<source><tld>/p/<page>?a=1&b=2` — the planted ground
    * truth [[canonicalizeUrl]] must recover.
    */
  def withMessyUrl(df: DataFrame, idCol: String, sourceCol: String,
      out: String = "raw_url"): DataFrame = {
    val id = col(idCol)
    val page = expr(s"$idCol div 4")
    val v = id % 4
    val tld = when(page % 3 === 0, lit(".com"))
      .when(page % 3 === 1, lit(".co.uk"))
      .otherwise(lit(".org"))
    val host = concat(lit("www."), col(sourceCol), tld)
    val hostCased = when(v === 1, upper(host)).otherwise(host)
    val port = when(v === 2, lit(":443")).otherwise(lit(""))
    val slash = when(v === 3, lit("/")).otherwise(lit(""))
    val qs = when(v === 0, lit("?a=1&b=2"))
      .when(v === 1, lit("?b=2&a=1&utm_source=feed"))
      .when(v === 2, lit("?utm_campaign=x&a=1&b=2"))
      .otherwise(lit("?a=1&gclid=zzz&b=2"))
    val frag = when(v === 2, lit("#frag")).otherwise(lit(""))
    df.withColumn(out, concat(lit("https://"), hostCased, port,
      lit("/p/"), page.cast("string"), slash, qs, frag))
  }

  /** Query parameters that never change content: tracking junk dropped
    * by canonicalization (the adblock/uBlock removeparam core set).
    */
  val TrackingParams = "^(utm_|gclid=|fbclid=|ref=)"

  /** URL CANONICALIZATION — the dedup key for web-scale crawls: two
    * fetches of the same page under cosmetically different URLs must
    * collapse BEFORE content dedup ever runs (URL-level dedup is free;
    * content dedup costs a corpus pass). Normalizations, each portable
    * string algebra both engines replay bit-for-bit:
    * lowercase scheme+host; strip the scheme's default port (:443 https,
    * :80 http); strip the fragment; strip trailing slashes from the
    * path; drop tracking parameters ([[TrackingParams]]) and empty
    * params; SORT surviving parameters (order never changes content on
    * idempotent GETs — the aggressive-but-standard crawler convention).
    * Pure per-row expression algebra — zero shuffles, runs inside the
    * scan at any scale.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val hostRaw = lower(regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = when(scheme === "https",
        regexp_replace(hostRaw, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .otherwise(hostRaw)
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val params = filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => length(p) > 0 && !p.rlike(TrackingParams))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Drop rows whose registrable domain is blocklisted. The blocklist
    * arrives as a DataFrame and joins as a broadcast anti-join — the
    * shape that still works when the list is millions of domains (a
    * literal `NOT IN` would compile an unboundedly wide expression).
    */
  def filterBlocked(df: DataFrame, rdCol: String,
      blocklist: DataFrame): DataFrame = {
    val b = blocklist.select(col(blocklist.columns.head).as("__blocked_rd"))
    df.join(broadcast(b), df(rdCol) === col("__blocked_rd"), "left_anti")
  }
}
