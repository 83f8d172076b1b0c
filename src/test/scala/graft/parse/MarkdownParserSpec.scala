package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class MarkdownParserSpec extends AnyFunSuite {

  private def parse(md: String) = MarkdownParser.parse("d", md)

  test("heading + paragraphs (corpus shape)") {
    val rows = parse(
      """# Black Holes
        |
        |A black hole is a region in space.
        |
        |The boundary is the event horizon.
        |""".stripMargin)
    assert(rows.map(_.element_type) == Seq("header", "paragraph", "paragraph"))
    assert(rows.head.level.contains(1))
    assert(rows.head.text.contains("Black Holes"))
    assert(rows(1).text.contains("A black hole is a region in space."))
    assert(rows.map(_.element_seq) == Seq(0, 1, 2))
    assert(rows.forall(_.section_path == Seq(0)))
  }

  test("paragraph immediately after thematic break becomes footer (P3)") {
    val rows = parse(
      """Intro paragraph.
        |
        |---
        |
        |Copyright 2026 Example.
        |
        |Another normal paragraph.
        |""".stripMargin)
    assert(rows.map(_.element_type) == Seq("paragraph", "footer", "paragraph"))
    assert(rows(1).text.contains("Copyright 2026 Example."))
  }

  test("data-URL image decodes base64 bytes + media type (P4)") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](1, 2, 3, 4, 5))
    val rows = parse(s"![tiny pic](data:image/png;base64,$b64)\n")
    assert(rows.map(_.element_type) == Seq("image"))
    assert(rows.head.alt_text.contains("tiny pic"))
    assert(rows.head.media_type.contains("image/png"))
    assert(rows.head.image_bytes.get.toSeq == Seq[Byte](1, 2, 3, 4, 5))
  }

  test("invalid base64 data URL becomes an error row, not a throw") {
    val rows = parse("![x](data:image/png;base64,!!!notb64!!!)\n")
    assert(rows.map(_.element_type) == Seq("error"))
  }

  test("non-data-URL image keeps alt text without bytes") {
    val rows = parse("![alt text](https://example.com/x.png)\n")
    assert(rows.map(_.element_type) == Seq("image"))
    assert(rows.head.alt_text.contains("alt text"))
    assert(rows.head.image_bytes.isEmpty)
  }

  test("fenced code block becomes a paragraph with literal text (P5)") {
    val rows = parse("```\nval x = 1\nval y = 2\n```\n")
    assert(rows.map(_.element_type) == Seq("paragraph"))
    assert(rows.head.text.contains("val x = 1\nval y = 2"))
  }

  test("list items flatten into one nested section (P6)") {
    val rows = parse(
      """Before list.
        |
        |- first item
        |- second item
        |- third item
        |
        |After list.
        |""".stripMargin)
    assert(rows.map(_.element_type).forall(_ == "paragraph"))
    val listRows = rows.filter(_.section_path.length == 2)
    assert(listRows.map(_.text.get) ==
      Seq("first item", "second item", "third item"))
    assert(listRows.map(_.section_path).distinct.size == 1) // one section
    assert(rows.head.section_path == Seq(0))
    assert(rows.last.section_path == Seq(0))
  }

  test("sub-lists nest as child sections of the list section (P6)") {
    val rows = parse(
      """- top one
        |  - sub a
        |  - sub b
        |- top two
        |""".stripMargin)
    assert(rows.map(_.text.get) ==
      Seq("top one", "sub a", "sub b", "top two"))
    val byText = rows.map(r => r.text.get -> r.section_path).toMap
    assert(byText("top one").length == 2)
    assert(byText("top two") == byText("top one")) // same list section
    assert(byText("sub a").length == 3) // child section of the list
    assert(byText("sub a").startsWith(byText("top one")))
    assert(byText("sub b") == byText("sub a"))
  }

  test("block quotes recurse as nested sections (P7)") {
    val rows = parse(
      """> quoted line one
      |> ## quoted heading
      |> quoted line two
      |""".stripMargin)
    assert(rows.map(_.element_type) == Seq("paragraph", "header", "paragraph"))
    assert(rows.forall(_.section_path.length == 2))
    assert(rows(1).level.contains(2))
  }

  test("pipe table emits (row, col) cells sharing one element_seq (P8)") {
    val rows = parse(
      """| a | b |
        ||---|---|
        || 1 | 2 |
        || 3 | 4 |
        |""".stripMargin)
    assert(rows.forall(_.element_type == "table_cell"))
    assert(rows.map(_.element_seq).distinct.size == 1)
    assert(rows.map(r => (r.table_row.get, r.table_col.get, r.text.get)) ==
      Seq((0, 0, "a"), (0, 1, "b"), (1, 0, "1"), (1, 1, "2"),
        (2, 0, "3"), (2, 1, "4")))
  }

  test("table short row replicates last cell across span (colspan artifact)") {
    val rows = parse(
      """| a | b | c |
        ||---|---|---|
        || x |
        |""".stripMargin)
    val data = rows.filter(_.table_row.contains(1))
    assert(data.map(_.text.get) == Seq("x", "x", "x"))
  }

  test("table all-blank first data row is skipped (MarkItDown artifact)") {
    val rows = parse(
      """| a | b |
        ||---|---|
        ||   |   |
        || 1 | 2 |
        |""".stripMargin)
    assert(rows.map(r => (r.table_row.get, r.text.get)).filter(_._1 == 1) ==
      Seq((1, "1"), (1, "2")))
    assert(rows.map(_.table_row.get).max == 1)
  }

  test("inline extraction flattens emphasis/links/code (P9)") {
    assert(MarkdownParser.extractInline("**bold** and *em* and `code`") ==
      "bold and em and code")
    assert(MarkdownParser.extractInline("[text](http://x) __b__ _i_") ==
      "text b i")
    assert(MarkdownParser.extractInline("snake_case stays_put") ==
      "snake_case stays_put")
  }

  test("thematic break itself emits nothing (P10)") {
    val rows = parse("---\n")
    assert(rows.isEmpty)
  }

  test("setext headings: === is h1, --- is h2, underline consumed") {
    val rows = parse(
      """Main Title
        |==========
        |
        |Subsection
        |----------
        |
        |Body text here.
        |""".stripMargin)
    assert(rows.map(_.element_type) == Seq("header", "header", "paragraph"))
    assert(rows(0).level.contains(1) && rows(0).text.contains("Main Title"))
    assert(rows(1).level.contains(2) && rows(1).text.contains("Subsection"))
    assert(rows(0).markdown.exists(_.contains("=====")))
  }

  test("setext precedence: dashes after text are a heading, not break+footer") {
    // No blank line between text and ---: CommonMark says setext h2.
    // With a blank line, --- is a thematic break and the next paragraph
    // is a footer (the P3 test above) — both behaviors must coexist.
    val rows = parse(
      """Heading text
        |---
        |following para
        |""".stripMargin)
    assert(rows.map(_.element_type) == Seq("header", "paragraph"))
    assert(rows.head.level.contains(2))
  }

  test("standalone underline with no preceding text stays a paragraph") {
    val rows = parse("===\n")
    assert(rows.map(_.element_type) == Seq("paragraph"))
    assert(rows.head.text.contains("==="))
  }

  test("indented code block becomes a paragraph with dedented text (P5)") {
    val rows = parse(
      """Before.
        |
        |    val x = 1
        |
        |    val y = 2
        |
        |After.
        |""".stripMargin)
    assert(rows.map(_.element_type) ==
      Seq("paragraph", "paragraph", "paragraph"))
    assert(rows(1).text.contains("val x = 1\n\nval y = 2"))
    assert(rows(1).markdown.exists(_.startsWith("    val x = 1")))
  }

  test("indented continuation of a paragraph is not code (lazy continuation)") {
    val rows = parse("a line\n    still the same para\n")
    assert(rows.map(_.element_type) == Seq("paragraph"))
    assert(rows.head.text.contains("a line\nstill the same para"))
  }

  test("crlf input parses the same as lf") {
    val lf = parse("# T\n\npara one\n")
    val crlf = parse("# T\r\n\r\npara one\r\n")
    assert(lf.map(_.text) == crlf.map(_.text))
  }

  test("markdown raw substring retained per block (P1)") {
    val rows = parse("# Title\n\nsome **bold** para\n")
    assert(rows(0).markdown.contains("# Title"))
    assert(rows(1).markdown.contains("some **bold** para"))
  }
}
