package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WebIngest extraction and URL parsing on handcrafted inputs — the
  * cases the synthetic corpus can't produce (nested markup, multi-label
  * suffixes on deep subdomains, absent query params, blocklist hits).
  */
class WebIngestSpec extends SparkSpec {
  import spark.implicits._

  test("stripTags flattens nested markup to visible text") {
    val out = Seq("<div><a href=\"x\"><b>bold</b> link</a> tail</div>")
      .toDF("h").select(WebIngest.stripTags(col("h"))).head().getString(0)
    assert(out == "bold link tail")
  }

  test("html round-trip: built page extracts back to the original text") {
    val df = Seq((7L, "alpha beta gamma", "en", "src3"))
      .toDF("doc_id", "text", "lang", "source")
    val r = WebIngest.extract(
        WebIngest.withHtml(df, "doc_id", "text", "lang", "source"), "html")
      .head()
    assert(r.getAs[String]("title") == "Doc 7 (en)")
    assert(r.getAs[String]("main_text") == "alpha beta gamma")
    // nav (2) + the reference link (1)
    assert(r.getAs[Long]("n_links") == 3L)
    assert(r.getAs[String]("first_href") == "/home")
    val bp = r.getAs[Long]("boiler_permille")
    assert(bp > 0 && bp < 1000, bp)
  }

  test("registrable domain honors multi-label public suffixes") {
    val df = Seq(
      "https://cdn.en.src3.co.uk/en/d1",
      "https://www.src3.com/en/d2",
      "https://a.b.c.src9.org/x",
      "https://src0.com/plain").toDF("url")
    val got = WebIngest.parseUrls(df, "url")
      .select(col("url"), col("registered_domain"), col("public_suffix"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got("https://cdn.en.src3.co.uk/en/d1") == (("src3.co.uk", "co.uk")))
    assert(got("https://www.src3.com/en/d2") == (("src3.com", "com")))
    assert(got("https://a.b.c.src9.org/x") == (("src9.org", "org")))
    // A bare registrable domain is its own registrable domain.
    assert(got("https://src0.com/plain") == (("src0.com", "com")))
  }

  test("query param extraction yields null when absent") {
    val df = Seq(
      "https://www.src0.com/en/d0?ref=feed&page=3",
      "https://www.src0.com/en/d1").toDF("url")
    val got = WebIngest.parseUrls(df, "url")
      .select(col("url"), col("page"), col("path"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got("https://www.src0.com/en/d0?ref=feed&page=3") ==
      (("3", "/en/d0")))
    assert(got("https://www.src0.com/en/d1") == ((null, "/en/d1")))
  }

  test("degenerate bodies survive the round trip: empty and single-word") {
    val df = Seq((1L, "", "en", "src0"), (2L, "x", "de", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val got = WebIngest.extract(
        WebIngest.withHtml(df, "doc_id", "text", "lang", "source"), "html")
      .select(col("doc_id"), col("main_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "", 2L -> "x"))
  }

  test("blocklist anti-join drops exactly the listed domains") {
    val df = Seq("src1.com", "src2.com", "src1.org").toDF("rd")
    val kept = WebIngest.filterBlocked(df, "rd", Seq("src1.com").toDF("b"))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("src2.com", "src1.org"))
  }
}
