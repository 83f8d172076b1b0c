package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Direction-aware reading order: standard PDF user space is y-UP (the
  * first line of a page carries the LARGEST y), while the corpus
  * fixtures' generator emits y increasing downward. The extractor votes
  * on the content stream's emission order — this spec builds a minimal
  * uncompressed y-up PDF and checks blocks come out top-to-bottom with
  * the pitch-based block break applied to |gaps|.
  */
class PdfLayoutSpec extends AnyFunSuite {

  private def minimalPdf(content: String): Array[Byte] = {
    val s =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${content.length} >> stream
         |$content
         |endstream endobj
         |%%EOF
         |""".stripMargin
    s.getBytes("ISO-8859-1")
  }

  test("y-up page reads top-to-bottom with block break at the wide gap") {
    val content =
      """BT 1 0 0 1 72 720 Tm (Title line) Tj ET
        |BT 1 0 0 1 72 700 Tm (Body one) Tj ET
        |BT 1 0 0 1 72 680 Tm (Body two) Tj ET
        |BT 1 0 0 1 72 610 Tm (Footer after wide gap) Tj ET""".stripMargin
    val blocks = PdfTextExtractor.extract(minimalPdf(content))
    assert(blocks.map(_.page).distinct == Seq(1))
    assert(blocks.length == 2, blocks.map(_.text))
    assert(blocks(0).text == "Title line Body one Body two")
    assert(blocks(1).text == "Footer after wide gap")
  }

  test("jumbled emission order (no strict majority) falls back to ascending") {
    // Five lines emitted out of order: the four stream pairs split
    // 2 down / 2 up, so the y-up vote has no STRICT majority and the
    // extractor must deterministically keep the pre-r11 ascending sort
    // — not flip on a single pair. y gaps are uniform (20pt pitch), so
    // all five lines form one block.
    val content =
      """BT 1 0 0 1 72 120 Tm (Line two) Tj ET
        |BT 1 0 0 1 72 100 Tm (Line one) Tj ET
        |BT 1 0 0 1 72 160 Tm (Line four) Tj ET
        |BT 1 0 0 1 72 140 Tm (Line three) Tj ET
        |BT 1 0 0 1 72 180 Tm (Line five) Tj ET""".stripMargin
    val blocks = PdfTextExtractor.extract(minimalPdf(content))
    assert(blocks.length == 1, blocks.map(_.text))
    assert(blocks(0).text ==
      "Line one Line two Line three Line four Line five")
  }

  test("y-down (generator-style) page keeps the fixtures' ascending order") {
    val content =
      """BT 1 0 0 1 72 100 Tm (Title line) Tj ET
        |BT 1 0 0 1 72 120 Tm (Body one) Tj ET
        |BT 1 0 0 1 72 140 Tm (Body two) Tj ET
        |BT 1 0 0 1 72 210 Tm (Footer after wide gap) Tj ET""".stripMargin
    val blocks = PdfTextExtractor.extract(minimalPdf(content))
    assert(blocks.length == 2, blocks.map(_.text))
    assert(blocks(0).text == "Title line Body one Body two")
    assert(blocks(1).text == "Footer after wide gap")
  }

  test("90-degree rotated margin note assembles in its own reading " +
      "frame, after the unrotated body (r19 quadrant envelope)") {
    // Body: plain y-up text. Margin: Tm = [0 1 -1 0 e f] (90 deg CCW) —
    // characters advance along page +y, successive lines stack along
    // page +x. The second margin line arrives via a TEXT-SPACE Td of
    // (0, -20): with c = -1 that must move the pen +20 in page x.
    val content =
      """BT 1 0 0 1 72 720 Tm (Body one) Tj ET
        |BT 1 0 0 1 72 700 Tm (Body two) Tj ET
        |BT 0 1 -1 0 30 200 Tm (Margin one) Tj 0 -20 Td (Margin two) Tj ET""".stripMargin
    val blocks = PdfTextExtractor.extract(minimalPdf(content))
    assert(blocks.map(_.text) ==
      Seq("Body one Body two", "Margin one Margin two"), blocks)
  }

  test("scaled text matrix applies Td in text space (glyph-space line " +
      "moves scale by the matrix)") {
    val content =
      """BT 12 0 0 12 72 720 Tm (Line one) Tj 0 -1.5 Td (Line two) Tj 0 -1.5 Td (Line three) Tj ET""".stripMargin
    val blocks = PdfTextExtractor.extract(minimalPdf(content))
    assert(blocks.length == 1, blocks.map(_.text))
    assert(blocks(0).text == "Line one Line two Line three")
  }

  test("fully inverted (180-degree) page reads in its own frame") {
    val content =
      """BT -1 0 0 -1 540 100 Tm (Upside one) Tj 0 -20 Td (Upside two) Tj ET""".stripMargin
    val blocks = PdfTextExtractor.extract(minimalPdf(content))
    assert(blocks.map(_.text) == Seq("Upside one Upside two"), blocks)
  }
}
