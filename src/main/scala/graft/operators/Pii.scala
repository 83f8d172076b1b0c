package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub every shipped training corpus
  * runs (emails, phone numbers, IP addresses, card-like digit runs),
  * reference behavior per the C# pipeline's plain-text normalization
  * surface (DataIngestionPlayground has no PII pass; this is part of the
  * LLM-data-pipeline tier the rebuild adds first-class).
  *
  * Everything is expression-level `regexp_replace`/`regexp_count` —
  * codegen'd, zero shuffles, linear per-row work, so the pass composes
  * into any scan without changing a plan's shape. The pattern dialect is
  * deliberately restricted to the RE2 ∩ java.util.regex common subset
  * (character classes, bounded repetition, no backrefs/lookaround, no
  * group refs in replacements) so a DuckDB oracle replays detection,
  * counts, and the redacted text byte-for-byte.
  *
  * The synthetic corpus carries no digits at all, so [[withPii]] plants
  * deterministic PII spans in every third document (id-derived digits —
  * the [[WebIngest.withHtml]] synthesis discipline): the oracle then
  * certifies BOTH detection on planted spans and non-detection
  * everywhere else, md5-pinning the full redacted text.
  */
object Pii {

  /** RE2 ∩ Java patterns; order-independent on any input (the classes
    * cannot overlap: dots vs dashes vs plain digit runs), applied
    * email → ip → phone → card.
    */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val PhonePat = "\\d{3}-\\d{3}-\\d{4}"
  val CardPat = "\\d{13,16}"

  /** Plant deterministic PII in every third document (appended spans,
    * digits derived from the id so the oracle rebuilds them exactly);
    * other documents pass through untouched. Output: idCol, textCol
    * (augmented), planted (boolean).
    */
  def withPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val planted = pmod(id, lit(3)) === 0
    val injected = concat(col(textCol),
      lit(" contact user"), (id % 97).cast("string"),
      lit("@ex"), (id % 7).cast("string"),
      lit(".com call 555-"),
      lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((id % 10000).cast("string"), 4, "0"),
      lit(" from 10."),
      (id % 256).cast("string"), lit("."),
      ((id * 7) % 256).cast("string"), lit("."),
      ((id * 13) % 256).cast("string"),
      lit(" card 4"),
      lpad((id % 1000000007).cast("string"), 15, "0"))
    df.select(id.as(idCol),
      when(planted, injected).otherwise(col(textCol)).as(textCol),
      planted.as("planted"))
  }

  private def countAs(c: Column, pat: String, name: String): Column =
    regexp_count(c, lit(pat)).cast("long").as(name)

  /** Per-document PII report + certified redaction. Output: idCol,
    * n_emails, n_ips, n_phones, n_cards, redacted_md5, changed.
    */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val red =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPat, "<EMAIL>"),
            Ipv4Pat, "<IP>"),
          PhonePat, "<PHONE>"),
        CardPat, "<CARD>")
    df.select(col(idCol),
      countAs(t, EmailPat, "n_emails"),
      countAs(t, Ipv4Pat, "n_ips"),
      countAs(t, PhonePat, "n_phones"),
      countAs(t, CardPat, "n_cards"),
      md5(red).as("redacted_md5"),
      (red =!= t).as("changed"))
  }
}
