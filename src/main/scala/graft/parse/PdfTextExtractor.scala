package graft.parse

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Minimal PDF text extractor (SURVEY.md §2.1 S3, §7.4).
  *
  * Stand-in for the reference's PdfPig pipeline
  * (`Readers/Pdf/PdfReader.cs:10-50`: per page, letters → words → layout
  * blocks → one paragraph per block, one section per page). This extractor
  * understands exactly what the corpus-style PDFs need, all public PDF 1.7
  * format knowledge:
  *   - object scan (`N 0 obj … endobj`), FlateDecode via
  *     `java.util.zip.Inflater`
  *   - page content streams with BT/ET text objects, Tm/Td/TD positioning,
  *     Tj/TJ show-text
  *   - CID text via each font's /ToUnicode CMap (beginbfchar/beginbfrange)
  *   - literal `(...)` and hex `<...>` strings
  *
  * Layout (coarse Docstrum/XY-cut stand-in, `PdfReader.cs:38-40`): text
  * runs carry their (x, y) pen position; a page first splits into COLUMNS
  * where the starting-x distribution has a gutter wider than [[GutterPt]]
  * AND the clusters genuinely coexist vertically (a centered title above
  * a body is not a column). Within a column, runs group into lines by y;
  * reading order is DIRECTION-AWARE (standard PDF user space is y-up —
  * the page's first line has the largest y — while generator-style
  * top-left systems grow y downward; the stream's emission order votes).
  * Lines group into blocks by |vertical gap|: a gap > 1.5× the dominant
  * line pitch (median |gap|) starts a new block; columns emit
  * left-to-right. Single-column pages take the exact pre-split path.
  * ROTATED text (r19): the full text matrix is tracked — Td/TD
  * translate in text space, and each run carries its rotation quadrant
  * from (a, b); 90°/180°/270° text assembles in its own reading frame
  * (PdfLayoutSpec pins a rotated-margin page). Remaining envelope
  * limits: arbitrary-angle skew, the graphics-state CTM (`cm`), and
  * true Docstrum nearest-neighbour geometry.
  * Unsupported structure throws — callers turn that into error rows.
  */
object PdfTextExtractor {

  final case class Block(page: Int, text: String)

  private final case class Run(x: Double, y: Double, text: String,
    quad: Int = 0)

  /** Minimum starting-x gutter (points) that can separate two columns. */
  private val GutterPt = 90.0

  /** Coarse XY-cut: cluster runs on starting x at gutters wider than
    * [[GutterPt]]; accept the split only when every cluster carries a
    * meaningful share of the page's runs AND adjacent clusters overlap
    * vertically by at least half the smaller cluster's y-span — real
    * columns coexist in y, while an indented heading or centered title
    * does not. Anything implausible collapses back to one column,
    * preserving the single-column behavior bit-for-bit.
    */
  private def splitColumns(runs: IndexedSeq[Run]): Seq[IndexedSeq[Run]] = {
    val xs = runs.map(_.x).distinct.sorted
    val bounds = (1 until xs.length)
      .filter(i => xs(i) - xs(i - 1) > GutterPt)
      .map(i => (xs(i - 1) + xs(i)) / 2)
    if (bounds.isEmpty) return Seq(runs)
    val groups = runs.groupBy(r => bounds.count(_ < r.x)).toSeq
      .sortBy(_._1).map(_._2)
    val minShare = math.max(3.0, runs.length * 0.2)
    val plausible = groups.forall(_.length >= minShare) &&
      groups.sliding(2).forall {
        case Seq(a, b) =>
          val (aLo, aHi) = (a.map(_.y).min, a.map(_.y).max)
          val (bLo, bHi) = (b.map(_.y).min, b.map(_.y).max)
          val overlap = math.min(aHi, bHi) - math.max(aLo, bLo)
          overlap >= 0.5 * math.min(aHi - aLo, bHi - bLo)
        case _ => true
      }
    if (plausible) groups else Seq(runs)
  }

  private val ObjRe: Regex =
    """(?s)(\d+) 0 obj\s*(.*?)\s*endobj""".r
  private val StreamRe: Regex = """(?s)^<<(.*?)>>\s*stream\r?\n""".r
  private val BfCharRe: Regex = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRangeRe: Regex = """(?s)beginbfrange(.*?)endbfrange""".r
  private val HexPairRe: Regex = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
  private val HexTripleRe: Regex =
    """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r

  def extract(bytes: Array[Byte]): Seq[Block] = {
    val latin = new String(bytes, "ISO-8859-1")
    require(latin.startsWith("%PDF-"), "not a PDF")

    // --- objects: number → (dict/source text, raw stream bytes or null)
    val objects = scala.collection.mutable.Map.empty[Int, (String, Array[Byte])]
    for (m <- ObjRe.findAllMatchIn(latin)) {
      val num = m.group(1).toInt
      val body = m.group(2)
      StreamRe.findFirstMatchIn(body) match {
        case Some(sm) =>
          val streamStartInBody = sm.end
          val absStart = m.start(2) + streamStartInBody
          val endIdx = latin.indexOf("endstream", absStart)
          val raw = java.util.Arrays.copyOfRange(bytes, absStart,
            if (endIdx >= 0) endIdx else absStart)
          objects(num) = (sm.group(1), raw)
        case None => objects(num) = (body, null)
      }
    }

    def inflate(raw: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    }

    def streamData(num: Int): Array[Byte] = {
      val (dict, raw) = objects(num)
      // strip trailing newline before endstream
      val trimmed = if (raw.nonEmpty && raw.last == '\n'.toByte)
        java.util.Arrays.copyOfRange(raw, 0, raw.length -
          (if (raw.length > 1 && raw(raw.length - 2) == '\r'.toByte) 2 else 1))
      else raw
      if (dict.contains("/FlateDecode")) inflate(trimmed) else trimmed
    }

    // --- PDF 1.5 COMPRESSED OBJECTS: expand /ObjStm streams so their
    // member dicts (catalog/pages/page/fonts) join the object map like
    // top-level ones. An object stream's payload is `/N` pairs of
    // "objnum offset" followed by the bodies at `/First`+offset
    // (PDF 32000-1:2008 §7.5.7). Streams themselves may NOT live inside
    // an ObjStm, so content/ToUnicode streams are always found by the
    // top-level scan above — and the /Type /XRef compressed
    // cross-reference needs no parsing at all, because this extractor
    // resolves objects by scanning, not by xref offsets. A malformed
    // ObjStm leaves its members unresolved → the page scan below fails
    // loudly → an `error` element row upstream, never a task abort.
    val objStmN = """/N\s+(\d+)""".r
    val objStmFirst = """/First\s+(\d+)""".r
    for (num <- objects.keys.toSeq.sorted
        if objects(num)._2 != null && objects(num)._1.contains("/ObjStm")) {
      val dict = objects(num)._1
      (objStmN.findFirstMatchIn(dict), objStmFirst.findFirstMatchIn(dict))
        match {
        case (Some(nm), Some(fm)) =>
          val n = nm.group(1).toInt
          val first = fm.group(1).toInt
          val text = new String(streamData(num), "ISO-8859-1")
          val pairs = text.take(first).trim.split("\\s+")
            .filter(_.nonEmpty).grouped(2).take(n)
            .collect { case Array(o, off) => (o.toInt, off.toInt) }.toSeq
          pairs.zipWithIndex.foreach { case ((objNum, off), i) =>
            val end = if (i + 1 < pairs.length) first + pairs(i + 1)._2
              else text.length
            // NEVER overwrite a top-level object: in an incrementally
            // updated PDF a later top-level revision supersedes an
            // ObjStm member of the same number, and the top-level scan
            // already recorded the newest body (file order). The
            // converse (an incremental update whose ObjStm supersedes
            // a top-level object) needs real xref-revision ordering
            // and is outside this extractor's envelope — such a file
            // reads its older top-level body, or fails the no-pages
            // check loudly.
            if (!objects.contains(objNum))
              objects(objNum) = (text.substring(first + off, end).trim, null)
          }
        case _ => // malformed: see the fail-loudly note above
      }
    }

    // --- ToUnicode CMaps per font object; resource name → code map.
    // Font objects carry /ToUnicode N 0 R; page /Resources /Font dicts map
    // names (/F1) to font objects.
    val toUnicodeRefRe = """/ToUnicode (\d+) 0 R""".r
    val fontCmaps: Map[Int, Map[Int, String]] = objects.flatMap {
      case (num, (dict, _)) =>
        toUnicodeRefRe.findFirstMatchIn(dict).map { fm =>
          num -> parseCmap(new String(streamData(fm.group(1).toInt),
            "ISO-8859-1"))
        }
    }.toMap
    val anyCmap: Map[Int, String] =
      if (fontCmaps.size == 1) fontCmaps.head._2 else Map.empty

    // --- pages in document order
    val pageObjs = objects.toSeq
      .filter { case (_, (d, s)) => s == null && d.contains("/Type /Page") &&
        !d.contains("/Type /Pages") }
      .sortBy(_._1)
    // FAIL LOUDLY, never a silent empty document: a structure this
    // extractor can't see (encryption, an exotic layout, a compression
    // scheme beyond FlateDecode/ObjStm) yields no page objects; the
    // honest outcome is an exception the source layer turns into an
    // `error` element row — not zero rows masquerading as an empty PDF.
    require(pageObjs.nonEmpty,
      "no /Type /Page objects found (encrypted, unsupported structure, " +
        "or not a document PDF)")
    // /Contents may be a single ref or an array of refs.
    val contentsRefRe = """/Contents\s*\[?\s*((?:\d+ 0 R\s*)+)\]?""".r
    val resourcesRefRe = """/Resources (\d+) 0 R""".r
    val fontResRe = """/(\w+) (\d+) 0 R""".r
    val refRe = """(\d+) 0 R""".r

    val blocks = ArrayBuffer.empty[Block]
    pageObjs.zipWithIndex.foreach { case ((_, (dict, _)), pageIdx) =>
      // Resources may be inline (<< /Font << /F1 11 0 R >> >>) or an
      // indirect reference to a resources dict object.
      val resDict = resourcesRefRe.findFirstMatchIn(dict) match {
        case Some(rm) => objects.get(rm.group(1).toInt).map(_._1).getOrElse("")
        case None => dict
      }
      val fontSection = {
        val i = resDict.indexOf("/Font")
        if (i >= 0) resDict.substring(i) else resDict
      }
      val fontsByName: Map[String, Map[Int, String]] =
        fontResRe.findAllMatchIn(fontSection)
          .map(m => m.group(1) -> fontCmaps.getOrElse(m.group(2).toInt, anyCmap))
          .toMap
      contentsRefRe.findFirstMatchIn(dict).foreach { cm =>
        val content = refRe.findAllMatchIn(cm.group(1))
          .map(r => new String(streamData(r.group(1).toInt), "ISO-8859-1"))
          .mkString("\n")
        blocks ++= extractPage(content, pageIdx + 1, fontsByName, anyCmap)
      }
    }
    blocks.toSeq
  }

  /** Parse beginbfchar/beginbfrange sections of a ToUnicode CMap. */
  def parseCmap(s: String): Map[Int, String] = {
    val m = scala.collection.mutable.Map.empty[Int, String]
    for (sec <- BfCharRe.findAllMatchIn(s); p <- HexPairRe.findAllMatchIn(sec.group(1)))
      m(Integer.parseInt(p.group(1), 16)) = hexToString(p.group(2))
    for (sec <- BfRangeRe.findAllMatchIn(s);
         t <- HexTripleRe.findAllMatchIn(sec.group(1))) {
      val lo = Integer.parseInt(t.group(1), 16)
      val hi = Integer.parseInt(t.group(2), 16)
      val dst = Integer.parseInt(t.group(3), 16)
      (lo to hi).foreach(c => m(c) = new String(
        Character.toChars(dst + (c - lo))))
    }
    m.toMap
  }

  private def hexToString(hex: String): String = {
    val codes = hex.grouped(4).filter(_.length == 4)
      .map(h => Integer.parseInt(h, 16)).toArray
    new String(codes.flatMap(Character.toChars))
  }

  /** Interpret one page's content stream: collect (x, y, text) runs,
    * split into columns, then group each column's lines into blocks by
    * y-gap.
    */
  private def extractPage(content: String, page: Int,
      fonts: Map[String, Map[Int, String]],
      fallback: Map[Int, String]): Seq[Block] = {
    // Tokens we care about: Tf (font select), Tm (6 args), Td/TD (2 args),
    // TJ (array), Tj (string).
    val runs = ArrayBuffer.empty[Run]
    var curFont: Map[Int, String] = fallback
    // Full text matrix [a b c d e f] (r19): rotation/scale components
    // were previously dropped (only e/f tracked), which mis-positioned
    // any Tm carrying rotation or scale and applied Td translations
    // unscaled. a/b/c/d now participate: Td/TD translate in TEXT space
    // (tx·a + ty·c, tx·b + ty·d — PDF 32000-1 §9.4.2), and each run
    // carries its rotation QUADRANT from (a, b) so 90°/180°/270°
    // rotated text assembles in its own reading frame below. Arbitrary
    // (non-quadrant) skew and the graphics-state CTM (cm) remain
    // outside the envelope, documented above.
    var ta = 1.0; var tb = 0.0; var tc = 0.0; var td = 1.0
    var x = 0.0
    var y = 0.0
    def quadrant: Int =
      if (math.abs(ta) >= math.abs(tb)) { if (ta >= 0) 0 else 2 }
      else { if (tb > 0) 1 else 3 }

    def decodeHex(hex: String): String =
      hex.grouped(4).filter(_.length == 4)
        .map(h => curFont.getOrElse(Integer.parseInt(h, 16), "")).mkString

    def decodeLiteral(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case 'r' => sb += '\r'
              case c@('(' | ')' | '\\') => sb += c
              case d if d.isDigit => // octal
                val oct = s.drop(i + 1).take(3).takeWhile(_.isDigit)
                sb += oct.foldLeft(0)((a, c) => a * 8 + (c - '0')).toChar
                i += oct.length - 1
              case c => sb += c
            }
            i += 2
          case c => sb += c; i += 1
        }
      }
      sb.toString
    }

    // Tokenize operator stream line-ish: scan tokens.
    val opRe =
      """(?s)\[((?:<[0-9A-Fa-f]*>|\([^)]*\)|[-0-9.eE\s])*)\]\s*TJ|<([0-9A-Fa-f]*)>\s*Tj|\(((?:[^()\\]|\\.)*)\)\s*Tj|/(\w+)\s+[-0-9.]+\s+Tf|([-0-9.eE]+(?:\s+[-0-9.eE]+){5})\s+Tm|([-0-9.eE]+\s+[-0-9.eE]+)\s+T[dD]\s""".r
    for (m <- opRe.findAllMatchIn(content)) {
      if (m.group(4) != null) { // Tf
        curFont = fonts.getOrElse(m.group(4), fallback)
      } else if (m.group(5) != null) { // Tm
        val nums = m.group(5).trim.split("\\s+").map(_.toDouble)
        ta = nums(0); tb = nums(1); tc = nums(2); td = nums(3)
        x = nums(4)
        y = nums(5)
      } else if (m.group(6) != null) { // Td/TD: text-space line move
        val nums = m.group(6).trim.split("\\s+").map(_.toDouble)
        x += nums(0) * ta + nums(1) * tc
        y += nums(0) * tb + nums(1) * td
      } else if (m.group(1) != null) { // TJ array
        val sb = new StringBuilder
        val itemRe = """<([0-9A-Fa-f]*)>|\(((?:[^()\\]|\\.)*)\)""".r
        for (im <- itemRe.findAllMatchIn(m.group(1))) {
          if (im.group(1) != null) sb ++= decodeHex(im.group(1))
          else sb ++= decodeLiteral(im.group(2))
        }
        runs += Run(x, y, sb.toString, quadrant)
      } else if (m.group(2) != null) { // hex Tj
        runs += Run(x, y, decodeHex(m.group(2)), quadrant)
      } else if (m.group(3) != null) { // literal Tj
        runs += Run(x, y, decodeLiteral(m.group(3)), quadrant)
      }
    }
    if (runs.isEmpty) return Seq.empty

    val out = ArrayBuffer.empty[Block]
    // Each rotation quadrant assembles in ITS reading frame: map page
    // coords to (along-baseline, line-stacking) axes, then run the
    // unchanged column/line/block machinery. Quadrant order (0°, 90°,
    // 180°, 270°) is the deterministic output order; unrotated pages
    // are a single quad-0 group and behave exactly as before.
    val byQuad = runs.groupBy(_.quad).toSeq.sortBy(_._1).map(_._2)
    for (quadRuns <- byQuad;
         oriented = quadRuns.map { r => r.quad match {
           case 0 => r
           case 1 => r.copy(x = r.y, y = -r.x)
           case 2 => r.copy(x = -r.x, y = -r.y)
           case _ => r.copy(x = -r.y, y = r.x)
         }};
         colRuns <- splitColumns(oriented.toIndexedSeq)) {
      // Line assembly within a column: stream order, y tolerance 0.5 —
      // the exact pre-column behavior when the page is one column.
      final case class Line(y: Double, sb: StringBuilder)
      val lines = ArrayBuffer.empty[Line]
      def lineFor(yPos: Double): Line =
        lines.find(l => math.abs(l.y - yPos) < 0.5).getOrElse {
          val l = Line(yPos, new StringBuilder); lines += l; l
        }
      colRuns.foreach(r => lineFor(r.y).sb ++= r.text)
      // Reading order is direction-aware (r11): standard PDF user space
      // is y-UP (the first line of a page has the LARGEST y), while
      // generator-style top-left coordinate systems emit y increasing
      // downward. The content stream's emission order votes: if line y's
      // mostly DECREASE in stream order the page is y-up and lines sort
      // descending; otherwise ascending (the corpus fixtures' convention
      // — their output is bit-identical to the pre-r11 ascending sort).
      // The vote requires a STRICT majority of decreasing pairs
      // (downVotes*2 > n), so a jumbled emission order with no majority
      // — including an exact half-half split — deterministically falls
      // back to the pre-r11 ascending sort rather than flipping on a
      // single pair. PdfLayoutSpec pins both fixture conventions and
      // the jumbled-order fallback.
      val appear = lines.filter(_.sb.nonEmpty).toIndexedSeq
      val downVotes = (1 until appear.length)
        .count(i => appear(i).y < appear(i - 1).y)
      val yUp = downVotes * 2 > appear.length - 1
      val ordered = if (yUp) appear.sortBy(-_.y) else appear.sortBy(_.y)
      if (ordered.nonEmpty) {
        // Dominant line pitch = median |gap|; block break at >1.5×.
        val gaps = (1 until ordered.length)
          .map(i => math.abs(ordered(i).y - ordered(i - 1).y))
          .filter(_ > 0.01).sorted
        val pitch = if (gaps.isEmpty) 0.0 else gaps(gaps.length / 2)
        var cur = new StringBuilder(ordered.head.sb.toString)
        (1 until ordered.length).foreach { i =>
          val gap = math.abs(ordered(i).y - ordered(i - 1).y)
          if (pitch > 0 && gap > pitch * 1.5) {
            out += Block(page, cur.toString.trim); cur = new StringBuilder
          } else if (cur.nonEmpty) cur += ' '
          cur ++= ordered(i).sb.toString
        }
        if (cur.nonEmpty) out += Block(page, cur.toString.trim)
      }
    }
    out.filter(_.text.nonEmpty).toSeq
  }
}
