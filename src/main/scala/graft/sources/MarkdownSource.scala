package graft.sources

import graft.model.ElementRow
import graft.parse.MarkdownParser
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import java.nio.charset.StandardCharsets

/** Markdown directory source (SURVEY.md §2.1 S1+S2).
  *
  * `binaryFile` scan (path + content) → UTF-8 decode → per-file parse
  * emitting element rows — the Spark analogue of the reference's
  * directory-enumeration pipeline (`VectorStoreCommands.cs:60-64`) with the
  * stream→string read of `Readers/Markdown/MarkdownReader.cs:12-35`.
  *
  * Files are independent ⇒ the flatMap is embarrassingly parallel; at
  * 100 TB the source scales by file-splitting alone (no shuffle here).
  * Parse failures surface as `error` element rows, not task failures.
  */
object MarkdownSource {

  /** Document id = file name, mirroring per-file identifiers. */
  def docIdOf(path: String): String = path.substring(path.lastIndexOf('/') + 1)

  def elements(spark: SparkSession, dir: String,
      glob: String = "*.md"): Dataset[ElementRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val docId = docIdOf(path)
        try MarkdownParser.parse(docId, new String(bytes, StandardCharsets.UTF_8))
        catch {
          case e: Throwable =>
            Seq(ElementRow(docId, Seq(0), None, 0, "error", None,
              Some(s"parse failed: ${e.getMessage}"), None, None, None, None,
              None, None))
        }
      }
  }
}
