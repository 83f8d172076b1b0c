package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class PdfAndSqliteSpec extends SparkSpec {

  test("pdf extractor recovers title + paragraphs from corpus pdf") {
    val bytes = Files.readAllBytes(Paths.get(
      resourcePath("content/pdf/black_holes.pdf")))
    val blocks = graft.parse.PdfTextExtractor.extract(bytes)
    assert(blocks.nonEmpty)
    val all = blocks.map(_.text).mkString(" ")
    assert(all.contains("Black Holes"))
    assert(all.toLowerCase.contains("event horizon"))
    assert(blocks.forall(_.page == 1))
  }

  test("pdf source parses all 10 corpus pdfs without error rows") {
    val rows = PdfSource.elements(spark, resourcePath("content/pdf"))
      .collect().toSeq
    val byDoc = rows.groupBy(_.doc_id)
    assert(byDoc.size == 10)
    val errors = rows.filter(_.element_type == "error")
    assert(errors.isEmpty, s"errors: ${errors.map(_.text)}")
    byDoc.foreach { case (doc, elems) =>
      assert(elems.exists(_.text.exists(_.length > 50)), s"$doc has prose")
      assert(elems.forall(_.page_number.contains(1)), s"$doc page numbers")
    }
  }

  test("sqlite reader scans the 10-row Items table of CMS.DB") {
    val rows = SqliteReader.readTable(resourcePath("content/CMS.DB"), "Items")
    assert(rows.length == 10)
    val titles = rows.map(_.string(1)).sorted
    assert(titles.contains("Black Holes"))
    rows.foreach { r =>
      assert(r.long(0) > 0)
      assert(r.string(2).length > 100, "body text present")
    }
  }

  test("database source builds header + line paragraphs per article") {
    val rows = SqliteReader.readTable(resourcePath("content/CMS.DB"), "Items")
      .map(r => (r.long(0), r.string(1), r.string(2)))
    val df = spark.createDataFrame(rows).toDF("id", "title", "body")
    val elems = DatabaseSource.elements(df).collect().toSeq
    val byDoc = elems.groupBy(_.doc_id)
    assert(byDoc.size == 10)
    assert(byDoc.keySet.forall(_.startsWith("Article #")))
    byDoc.values.foreach { docElems =>
      val sorted = docElems.sortBy(_.element_seq)
      assert(sorted.head.element_type == "header")
      assert(sorted.tail.forall(_.element_type == "paragraph"))
      assert(sorted.tail.forall(_.text.exists(t => t.trim == t && t.nonEmpty)))
    }
  }

  test("cross-reader consistency: markdown/pdf/database cover the same topics") {
    // SURVEY §5.2: the three readers over the same corpus must agree on
    // content modulo layout. Compare title sets.
    val mdTitles = MarkdownSource
      .elements(spark, resourcePath("content/markdown"))
      .collect().filter(_.element_type == "header").flatMap(_.text).toSet
    val dbRows = SqliteReader.readTable(resourcePath("content/CMS.DB"), "Items")
    val dbTitles = dbRows.map(_.string(1)).toSet
    assert(mdTitles == dbTitles)
    val pdfText = PdfSource.elements(spark, resourcePath("content/pdf"))
      .collect().flatMap(_.text).mkString(" ")
    dbTitles.foreach(t => assert(pdfText.contains(t), s"pdf corpus has '$t'"))
  }
}
