package graft.parse

import graft.model.ElementRow

import java.util.Base64
import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Pure-Scala markdown → element-row parser (SURVEY.md §2.2, P1–P10).
  *
  * Reproduces the observable semantics of the reference's Markdig-based
  * parser (reference `Readers/Markdown/MarkdownParser.cs`):
  *   - ATX headings → header rows with level (P2, cs:97-101)
  *   - a paragraph immediately after a thematic break → footer (P3, cs:48-56,102-105)
  *   - image paragraphs with `data:<type>;base64,` URLs → decoded image rows (P4, cs:118-155)
  *   - paragraphs and code blocks → paragraph rows (P5, cs:107-114)
  *   - lists flatten item leaf blocks into one nested section (P6, cs:157-181)
  *   - quotes recurse as nested sections (P7, cs:183-197)
  *   - pipe tables → one row per (table_row, table_col) cell, replicating
  *     short rows across remaining columns (colspan artifact, cs:265-269),
  *     dropping phantom extra columns (cs:248-249) and skipping an all-blank
  *     first data row (MarkItDown artifact, cs:275-296) (P8)
  *   - inline text: literals concatenated, emphasis flattened, code spans
  *     kept, line breaks → newline (P9, cs:199-240)
  *   - empty blocks / thematic breaks themselves are skipped (P10)
  *
  * Where the reference throws on unsupported constructs (cs:88,115,234,262)
  * this parser emits an `error` element row instead — per-document fault
  * isolation without task aborts (SURVEY §2.2). Every block row keeps its
  * raw markdown substring (P1, cs:80).
  *
  * CommonMark-complete is an explicit non-goal (SURVEY §7.4).
  */
object MarkdownParser {

  private val HeadingRe: Regex = """^(#{1,6})\s+(.*?)\s*#*\s*$""".r
  private val SetextRe: Regex = """^ {0,3}(=+|-+)\s*$""".r
  private val BreakRe: Regex = """^ {0,3}((\* *){3,}|(- *){3,}|(_ *){3,})$""".r
  private val ListItemRe: Regex = """^(\s*)([-*+]|\d{1,9}[.)])\s+(.*)$""".r
  private val TableDelimRe: Regex = """^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?\s*$""".r
  private val ImageRe: Regex = """^!\[([^\]]*)\]\(([^)\s]*)[^)]*\)\s*$""".r
  private val DataUrlRe: Regex = """^data:([^;,]+);base64,(.*)$""".r

  /** Parse one document; never throws — malformed constructs become
    * `element_type = "error"` rows.
    */
  def parse(docId: String, input: String): Seq[ElementRow] = {
    val out = ArrayBuffer.empty[ElementRow]
    var seq = 0
    def nextSeq(): Int = { val s = seq; seq += 1; s }

    // One nested-section child counter per parent path, so section_path
    // values are stable and dense (root document section = path Seq(0)).
    val childCounters = scala.collection.mutable.Map.empty[Seq[Int], Int]
    def childPath(parent: Seq[Int]): Seq[Int] = {
      val k = childCounters.getOrElse(parent, 0)
      childCounters(parent) = k + 1
      parent :+ k
    }

    def emit(row: ElementRow): Unit = out += row

    def parseBlocks(lines: Array[String], path: Seq[Int]): Unit = {
      var i = 0
      var previousWasBreak = false
      while (i < lines.length) {
        val line = lines(i)
        if (line.trim.isEmpty) { i += 1 }
        else if (BreakRe.findFirstIn(line).isDefined) {
          previousWasBreak = true
          i += 1
        } else {
          val wasBreak = previousWasBreak
          previousWasBreak = false
          line match {
            case HeadingRe(hashes, title) =>
              emit(ElementRow(docId, path, None, nextSeq(), "header",
                Some(hashes.length), Some(extractInline(title)), Some(line),
                None, None, None, None, None))
              i += 1
            case _ if line.trim.startsWith("```") || line.trim.startsWith("~~~") =>
              val fence = line.trim.take(3)
              val start = i
              i += 1
              val body = ArrayBuffer.empty[String]
              while (i < lines.length && !lines(i).trim.startsWith(fence)) {
                body += lines(i); i += 1
              }
              if (i < lines.length) i += 1 // closing fence
              // Code block → paragraph with the literal code text (P5).
              emit(ElementRow(docId, path, None, nextSeq(), "paragraph", None,
                Some(body.mkString("\n")),
                Some(lines.slice(start, i).mkString("\n")),
                None, None, None, None, None))
            case _ if (line.startsWith("    ") || line.startsWith("\t")) &&
                line.trim.nonEmpty =>
              // Indented code block (4-space / tab indent) → paragraph with
              // the literal code text, like fenced code (P5; the reference's
              // Markdig dispatch handles CodeBlock alongside FencedCodeBlock,
              // cs:78-92,107-114). Interior blank lines stay part of the
              // block; trailing blanks do not.
              val start = i
              while (i < lines.length && (lines(i).trim.isEmpty ||
                  lines(i).startsWith("    ") || lines(i).startsWith("\t"))) {
                i += 1
              }
              var end = i
              while (end > start && lines(end - 1).trim.isEmpty) end -= 1
              def dedent(l: String): String =
                if (l.startsWith("    ")) l.drop(4)
                else if (l.startsWith("\t")) l.drop(1)
                else l // interior blank
              emit(ElementRow(docId, path, None, nextSeq(), "paragraph", None,
                Some(lines.slice(start, end).map(dedent).mkString("\n")),
                Some(lines.slice(start, end).mkString("\n")),
                None, None, None, None, None))
              i = end
            case _ if line.trim.startsWith(">") =>
              val inner = ArrayBuffer.empty[String]
              while (i < lines.length && lines(i).trim.startsWith(">")) {
                val l = lines(i).trim
                inner += (if (l.startsWith("> ")) l.drop(2)
                          else l.drop(1))
                i += 1
              }
              parseBlocks(inner.toArray, childPath(path)) // recursion (P7)
            case ListItemRe(_, _, _) =>
              i = parseList(lines, i, path)
            case _ if isTableStart(lines, i) =>
              i = parseTable(lines, i, path, nextSeq())
            case _ =>
              // Paragraph: contiguous non-blank, non-structural lines —
              // unless terminated by a setext underline (`===` → h1,
              // `---` → h2), which turns the run into a heading (Markdig
              // maps setext through the same HeadingBlock case, cs:97-101;
              // an underline needs a blank line before it to count as a
              // thematic break instead, per CommonMark precedence).
              val start = i
              val buf = ArrayBuffer.empty[String]
              var setextLevel = 0
              while (setextLevel == 0 && i < lines.length &&
                  lines(i).trim.nonEmpty && !isStructural(lines, i)) {
                lines(i) match {
                  case SetextRe(u) if buf.nonEmpty =>
                    setextLevel = if (u.startsWith("=")) 1 else 2
                    i += 1
                  case _ => buf += lines(i); i += 1
                }
              }
              // A `---` underline also matches the thematic-break pattern,
              // so it stopped the loop as structural; reclaim it as the
              // setext h2 it is when it directly follows paragraph text.
              if (setextLevel == 0 && buf.nonEmpty && i < lines.length &&
                  SetextRe.findFirstIn(lines(i)).isDefined &&
                  lines(i).trim.startsWith("-")) {
                setextLevel = 2
                i += 1
              }
              val raw = lines.slice(start, i).mkString("\n")
              val joined = buf.mkString("\n")
              if (setextLevel > 0) {
                emit(ElementRow(docId, path, None, nextSeq(), "header",
                  Some(setextLevel), Some(extractInline(joined)), Some(raw),
                  None, None, None, None, None))
              } else joined.trim match {
                case ImageRe(alt, url) => emitImage(path, alt, url, raw)
                case _ =>
                  val tpe = if (wasBreak) "footer" else "paragraph" // P3
                  emit(ElementRow(docId, path, None, nextSeq(), tpe, None,
                    Some(extractInline(joined)), Some(raw),
                    None, None, None, None, None))
              }
          }
        }
      }

      def emitImage(p: Seq[Int], alt: String, url: String, raw: String): Unit =
        url match {
          case DataUrlRe(mediaType, b64) =>
            try {
              val bytes = Base64.getDecoder.decode(b64)
              emit(ElementRow(docId, p, None, nextSeq(), "image", None, None,
                Some(raw), Some(alt), Some(mediaType), Some(bytes), None, None))
            } catch {
              case _: IllegalArgumentException =>
                emit(ElementRow(docId, p, None, nextSeq(), "error", None,
                  Some(s"invalid base64 in data URL image"), Some(raw),
                  Some(alt), None, None, None, None))
            }
          case _ =>
            // The reference only supports data URLs (cs:128-151, throws
            // otherwise); we keep the alt text and record no bytes.
            emit(ElementRow(docId, p, None, nextSeq(), "image", None, None,
              Some(raw), Some(alt), None, None, None, None))
        }
    }

    /** List → nested section (P6, cs:157-181): each item's leaf content is
      * flattened into the list's section; a deeper-indented run of items
      * (a sub-list) recurses as a CHILD section of the list — mirroring
      * the reference's ListBlock-inside-item → nested Section mapping.
      * Returns the index after the list.
      */
    def parseList(lines: Array[String], start: Int, parent: Seq[Int]): Int = {
      val lPath = childPath(parent)
      val base = lines(start) match {
        case ListItemRe(ws, _, _) => ws.length
        case _ => 0
      }
      var k = start
      var done = false
      while (k < lines.length && !done) {
        lines(k) match {
          case ListItemRe(ws, _, content) =>
            if (ws.length >= base + 2) k = parseList(lines, k, lPath)
            else if (ws.length < base) done = true
            else {
              if (content.trim.nonEmpty)
                // Item leaf blocks flattened into the list section (P6);
                // empties skipped.
                emit(ElementRow(docId, lPath, None, nextSeq(), "paragraph",
                  None, Some(extractInline(content)), Some(lines(k)),
                  None, None, None, None, None))
              k += 1
            }
          case cont if cont.startsWith("  ") && cont.trim.nonEmpty =>
            // Lazy continuation of the previous item.
            emit(ElementRow(docId, lPath, None, nextSeq(), "paragraph",
              None, Some(extractInline(cont.trim)), Some(cont),
              None, None, None, None, None))
            k += 1
          case _ => done = true
        }
      }
      k
    }

    def isStructural(lines: Array[String], i: Int): Boolean = {
      val l = lines(i)
      HeadingRe.findFirstIn(l).isDefined ||
        BreakRe.findFirstIn(l).isDefined ||
        l.trim.startsWith(">") || l.trim.startsWith("```") ||
        ListItemRe.findFirstIn(l).isDefined ||
        isTableStart(lines, i)
    }

    def isTableStart(lines: Array[String], i: Int): Boolean =
      lines(i).contains("|") && i + 1 < lines.length &&
        TableDelimRe.findFirstIn(lines(i + 1)).isDefined &&
        lines(i + 1).contains("|")

    /** Pipe table → cell rows sharing one element_seq (one logical table
      * element). Returns the index after the table.
      */
    def parseTable(lines: Array[String], start: Int, path: Seq[Int],
        tableSeq: Int): Int = {
      def cells(l: String): Array[String] = {
        val t = l.trim
        val stripped = t.stripPrefix("|").stripSuffix("|")
        stripped.split("""(?<!\\)\|""", -1).map(_.trim.replace("\\|", "|"))
      }
      val nCols = cells(lines(start + 1)).length
      var i = start + 2
      val dataRows = ArrayBuffer[Array[String]](cells(lines(start)))
      while (i < lines.length && lines(i).contains("|") && lines(i).trim.nonEmpty) {
        dataRows += cells(lines(i)); i += 1
      }
      // Blank-first-data-row skip (cs:275-296): if the row right after the
      // header is entirely blank, drop it.
      if (dataRows.length > 1 && dataRows(1).forall(_.isEmpty)) {
        dataRows.remove(1); ()
      }
      val raw = lines.slice(start, i).mkString("\n")
      var r = 0
      dataRows.foreach { row =>
        var c = 0
        while (c < nCols) {
          // Phantom extra columns dropped (c >= nCols ignored, cs:248-249);
          // short rows replicate their last cell across the span (cs:265-269).
          val v = if (c < row.length) row(c)
                  else if (row.nonEmpty) row(row.length - 1) else ""
          emit(ElementRow(docId, path, None, tableSeq, "table_cell", None,
            Some(extractInline(v)), Some(raw),
            None, None, None, Some(r), Some(c)))
          c += 1
        }
        r += 1
      }
      i
    }

    parseBlocks(input.replace("\r\n", "\n").replace('\r', '\n').split("\n", -1),
      Seq(0))
    out.toSeq
  }

  /** Inline text extraction (P9, cs:199-240): emphasis flattened to its
    * literal text, code spans keep content, links keep their text, hard/soft
    * line breaks become newlines.
    */
  def extractInline(s: String): String = {
    var t = s
    t = t.replaceAll("""!\[([^\]]*)\]\([^)]*\)""", "$1") // inline images → alt
    t = t.replaceAll("""\[([^\]]*)\]\([^)]*\)""", "$1") // links → text
    t = t.replaceAll("`([^`]*)`", "$1") // code spans
    t = t.replaceAll("""\*\*\*(.+?)\*\*\*""", "$1")
    t = t.replaceAll("""\*\*(.+?)\*\*""", "$1")
    t = t.replaceAll("""\*(\S(?:[^*]*\S)?)\*""", "$1")
    t = t.replaceAll("""__(.+?)__""", "$1")
    t = t.replaceAll("""(?<![\w])_([^_\s](?:[^_]*[^_\s])?)_(?![\w])""", "$1")
    t = t.replaceAll("""\\\n""", "\n").replaceAll(""" {2,}\n""", "\n")
    t.split("\n", -1).map(_.trim).mkString("\n").trim
  }
}
