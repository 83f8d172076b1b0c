package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII detect/redact semantics (q137's operator): planted spans are
  * found and redacted, clean documents pass untouched, and the four
  * pattern classes don't cross-fire on each other's spans.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("planted spans detected once each; clean docs untouched") {
    val df = Seq((0L, "alpha beta"), (1L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    val out = Pii.redact(Pii.withPii(df, "doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(6)))).toMap
    // ids 0 and 3 are planted (id % 3 == 0): one hit per class, changed
    assert(out(0L) == ((1L, 1L, 1L, 1L, true)))
    assert(out(3L) == ((1L, 1L, 1L, 1L, true)))
    // id 1 is clean: zero hits, byte-identical passthrough
    assert(out(1L) == ((0L, 0L, 0L, 0L, false)))
  }

  test("redaction replaces every class with its tag") {
    val df = Seq((6L, "start")).toDF("doc_id", "text")
    val injected = Pii.withPii(df, "doc_id", "text")
      .select("text").head().getString(0)
    val red = injected
    val expected = red
      .replaceAll(Pii.EmailPat, "<EMAIL>")
      .replaceAll(Pii.Ipv4Pat, "<IP>")
      .replaceAll(Pii.PhonePat, "<PHONE>")
      .replaceAll(Pii.CardPat, "<CARD>")
    val got = Pii.redact(Pii.withPii(df, "doc_id", "text"),
        "doc_id", "text")
      .select("redacted_md5").head().getString(0)
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == expectedMd5)
    assert(Seq("<EMAIL>", "<IP>", "<PHONE>", "<CARD>")
      .forall(expected.contains))
    // full redaction: no class pattern survives in the output
    Seq(Pii.EmailPat, Pii.Ipv4Pat, Pii.PhonePat, Pii.CardPat).foreach(p =>
      assert(!p.r.findFirstIn(expected).isDefined, p))
  }
}
