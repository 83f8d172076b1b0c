package graft.sources

import graft.SparkSpec

class MarkdownSourceSpec extends SparkSpec {

  test("corpus: 10 markdown files parse to header + 3 paragraphs each") {
    val dir = resourcePath("content/markdown")
    val rows = MarkdownSource.elements(spark, dir).collect().toSeq
    val byDoc = rows.groupBy(_.doc_id)
    assert(byDoc.size == 10)
    byDoc.foreach { case (doc, elems) =>
      val sorted = elems.sortBy(_.element_seq)
      assert(sorted.head.element_type == "header", s"$doc first element")
      assert(sorted.head.level.contains(1), s"$doc header level")
      assert(sorted.tail.map(_.element_type) ==
        Seq("paragraph", "paragraph", "paragraph"), s"$doc body")
      assert(sorted.forall(_.text.exists(_.nonEmpty)), s"$doc texts")
      assert(elems.forall(e => !e.element_type.equals("error")), s"$doc errors")
    }
  }

  test("doc ids are file names") {
    val dir = resourcePath("content/markdown")
    val ids = MarkdownSource.elements(spark, dir)
      .select("doc_id").distinct().collect().map(_.getString(0)).toSet
    assert(ids.contains("black_holes.md"))
    assert(ids.size == 10)
  }
}
