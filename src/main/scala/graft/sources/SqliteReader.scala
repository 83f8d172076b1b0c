package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal read-only SQLite 3 table reader (SURVEY.md §7.4 "SQLite reading").
  *
  * Enough of the public SQLite file format (header, table B-trees, record
  * serial types) to scan a small single-table database like the reference's
  * `Content/Database/CMS.DB` fixture without a driver dependency. Supports
  * interior/leaf table pages and the first overflow-free payloads only —
  * adequate for the 10-row fixture; anything unsupported throws, and callers
  * convert that into error rows (per-document fault isolation).
  */
object SqliteReader {

  final case class Row(values: Seq[Any]) {
    def long(i: Int): Long = values(i) match {
      case l: Long => l
      case null => 0L
      case o => o.toString.toLong
    }
    def string(i: Int): String = values(i) match {
      case null => ""
      case o => o.toString
    }
  }

  def readTable(path: String, table: String): Seq[Row] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(new String(bytes, 0, 15, "ISO-8859-1") == "SQLite format 3",
      "not a sqlite3 file")
    val pageSizeRaw = buf.getShort(16) & 0xffff
    val pageSize = if (pageSizeRaw == 1) 65536 else pageSizeRaw

    def pageOffset(pageNo: Int): Int = (pageNo - 1) * pageSize

    // Walk a table b-tree, yielding (rowid, record bytes).
    def walk(pageNo: Int): Seq[(Long, Array[Byte])] = {
      val off = pageOffset(pageNo)
      val hdrOff = if (pageNo == 1) off + 100 else off
      val pageType = bytes(hdrOff) & 0xff
      val nCells = ((bytes(hdrOff + 3) & 0xff) << 8) | (bytes(hdrOff + 4) & 0xff)
      val cellPtrBase = hdrOff + (if (pageType == 0x05) 12 else 8)
      def cellPtr(i: Int): Int =
        off + (((bytes(cellPtrBase + 2 * i) & 0xff) << 8) |
          (bytes(cellPtrBase + 2 * i + 1) & 0xff))
      pageType match {
        case 0x05 => // interior table page
          val kids = (0 until nCells).flatMap { i =>
            val p = cellPtr(i)
            val child = buf.getInt(p)
            walk(child)
          }
          val rightMost = buf.getInt(hdrOff + 8)
          kids ++ walk(rightMost)
        case 0x0d => // leaf table page
          (0 until nCells).map { i =>
            var p = cellPtr(i)
            val (payloadLen, p1) = varint(bytes, p); p = p1
            val (rowid, p2) = varint(bytes, p); p = p2
            val usable = pageSize // no reserved space assumed
            val maxLocal = usable - 35
            require(payloadLen <= maxLocal,
              s"overflow payloads unsupported (len=$payloadLen)")
            (rowid, java.util.Arrays.copyOfRange(bytes, p, p + payloadLen.toInt))
          }
        case t => throw new IllegalStateException(f"unexpected page type 0x$t%02x")
      }
    }

    // sqlite_master lives in the page-1 b-tree:
    // (type, name, tbl_name, rootpage, sql)
    val master = walk(1).map { case (_, rec) => decode(rec) }
    val root = master.collectFirst {
      case r if r.string(0) == "table" && r.string(1).equalsIgnoreCase(table) =>
        r.long(3).toInt
    }.getOrElse(throw new NoSuchElementException(s"table $table not found"))

    walk(root).map { case (rowid, rec) =>
      val d = decode(rec)
      // A NULL INTEGER PRIMARY KEY column is the rowid alias.
      Row(d.values.zipWithIndex.map {
        case (null, 0) => rowid
        case (v, _) => v
      })
    }
  }

  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, off + i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xff), off + 9) // 9th byte uses all 8 bits
  }

  /** Decode one record: serial-type header then values. */
  private def decode(rec: Array[Byte]): Row = {
    val (hdrLen, afterHdrLen) = varint(rec, 0)
    var p = afterHdrLen
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (p < hdrLen) {
      val (t, np) = varint(rec, p); types += t; p = np
    }
    var dp = hdrLen.toInt
    val values = types.map { t =>
      val (v, size) = t match {
        case 0 => (null, 0)
        case 1 => (rec(dp).toLong, 1)
        case 2 => (((rec(dp) & 0xffL) << 8 | (rec(dp + 1) & 0xffL)) match {
          case x => ((x << 48) >> 48) // sign-extend 16-bit
        }, 2)
        case 3 =>
          var x = 0L
          (0 until 3).foreach(i => x = (x << 8) | (rec(dp + i) & 0xffL))
          (((x << 40) >> 40), 3)
        case 4 =>
          var x = 0L
          (0 until 4).foreach(i => x = (x << 8) | (rec(dp + i) & 0xffL))
          (((x << 32) >> 32), 4)
        case 5 =>
          var x = 0L
          (0 until 6).foreach(i => x = (x << 8) | (rec(dp + i) & 0xffL))
          (((x << 16) >> 16), 6)
        case 6 =>
          var x = 0L
          (0 until 8).foreach(i => x = (x << 8) | (rec(dp + i) & 0xffL))
          (x, 8)
        case 7 =>
          var x = 0L
          (0 until 8).foreach(i => x = (x << 8) | (rec(dp + i) & 0xffL))
          (java.lang.Double.longBitsToDouble(x), 8)
        case 8 => (0L, 0)
        case 9 => (1L, 0)
        case t if t >= 12 && t % 2 == 0 =>
          val n = ((t - 12) / 2).toInt
          (java.util.Arrays.copyOfRange(rec, dp, dp + n), n)
        case t if t >= 13 =>
          val n = ((t - 13) / 2).toInt
          (new String(rec, dp, n, "UTF-8"), n)
        case t => throw new IllegalStateException(s"serial type $t")
      }
      dp += size
      v
    }
    Row(values.toSeq)
  }
}
