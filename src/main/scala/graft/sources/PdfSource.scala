package graft.sources

import graft.model.ElementRow
import graft.parse.PdfTextExtractor
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** PDF directory source (SURVEY.md §2.1 S3).
  *
  * `binaryFile` scan → per-file text extraction → one paragraph row per
  * layout block, `page_number` carried on every row and pages mapped to
  * `section_path = [0, page-1]` — mirroring the reference's one-Section-per
  * -page with `PageNumber` (`Readers/Pdf/PdfReader.cs:30-35`) and one
  * Paragraph per Docstrum block (`:38-44`).
  *
  * A PDF the extractor can't handle becomes a single `error` row for that
  * document (fault isolation, SURVEY §2.5) — never a task failure.
  */
object PdfSource {

  def elements(spark: SparkSession, dir: String,
      glob: String = "*.pdf"): Dataset[ElementRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val docId = MarkdownSource.docIdOf(path)
        try {
          PdfTextExtractor.extract(bytes).zipWithIndex.map {
            case (b, i) =>
              ElementRow(docId, Seq(0, b.page - 1), Some(b.page), i,
                "paragraph", None, Some(b.text), None, None, None, None,
                None, None)
          }
        } catch {
          case e: Throwable =>
            Seq(ElementRow(docId, Seq(0), None, 0, "error", None,
              Some(s"pdf extract failed: ${e.getMessage}"), None, None, None,
              None, None, None))
        }
      }
  }
}
