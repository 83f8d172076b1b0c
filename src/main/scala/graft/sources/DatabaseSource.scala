package graft.sources

import graft.model.{Article, ElementRow}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Relational (database) source (SURVEY.md §2.1 S4).
  *
  * The reference scans SQLite `Items(Id, Title, Body)` through EF Core and
  * builds one document per row: a level-1 header from the title plus one
  * paragraph per non-blank line of the body, with identifier
  * `"Article #{Id}"` (`Readers/Database/DatabaseIngestionReader.cs:42-63`,
  * `VectorStoreCommands.cs:30-48`).
  *
  * The Spark-native scan is any relational DataFrame with (id, title, body)
  * — parquet mirror, JDBC, or the bundled SQLite page reader
  * ([[SqliteReader]]) for the reference's own CMS.DB fixture. The document
  * build is pure column algebra (split/explode/filter), fully codegen'd —
  * no per-row driver loop as in the reference.
  */
object DatabaseSource {

  /** Identifier format from `VectorStoreCommands.cs:37`. */
  def docId(id: Column): Column = concat(lit("Article #"), id)

  /** (id, title, body) rows → element rows: header + one paragraph per
    * non-blank trimmed body line, ordered.
    */
  def elements(articles: DataFrame): Dataset[ElementRow] = {
    val spark = articles.sparkSession
    import spark.implicits._
    articles
      .select(col("id").cast("long"), col("title").cast("string"),
        col("body").cast("string"))
      .as[Article]
      .flatMap { a =>
        val doc = s"Article #${a.id}"
        val header = ElementRow(doc, Seq(0), None, 0, "header", Some(1),
          Some(a.title), Some(s"# ${a.title}"), None, None, None, None, None)
        val paras = a.body.split("\n").iterator
          .map(_.trim).filter(_.nonEmpty).zipWithIndex
          .map { case (line, i) =>
            ElementRow.para(doc, Seq(0), i + 1, line, line)
          }
        Iterator.single(header) ++ paras
      }
  }

  /** Convenience: documents-table shape (doc_id, text, …) → one header-less
    * paragraph stream per document (used to ingest the driver testdata's
    * `documents` parquet as a corpus).
    */
  def fromDocumentsTable(docs: DataFrame): Dataset[ElementRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text").cast("string"))
      .as[(String, String)]
      .map { case (id, text) =>
        ElementRow.para(s"doc:$id", Seq(0), 0, text, text)
      }
  }

  /** The segmented variant for flat (punctuation-free) text: one element
    * per fixed window of `wordsPerSegment` whitespace words, in document
    * order — the analog of sentence segmentation for corpora without
    * sentence boundaries. Deliberately expressible in plain SQL
    * (split + slice + rejoin) so a chunking pipeline built on it can be
    * oracle-replayed end to end (q34).
    */
  def fromDocumentsTableWindows(docs: DataFrame,
      wordsPerSegment: Int = 12): Dataset[ElementRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text").cast("string"))
      .as[(String, String)]
      .flatMap { case (id, text) =>
        text.split(" ").filter(_.nonEmpty).grouped(wordsPerSegment)
          .zipWithIndex.map { case (ws, i) =>
            val seg = ws.mkString(" ")
            ElementRow.para(s"doc:$id", Seq(i), i, seg, seg)
          }
      }
  }
}
