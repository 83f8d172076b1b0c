package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class AsofEnrichSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  private def ev(id: Long, user: Long, tpe: String, t: Timestamp, v: Double) =
    Streams.Ev(id, user, tpe, t, v)

  private def collectMatches(table: String): Map[Long, Option[(Long, Double)]] =
    spark.table(table).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getDouble(4))))
    }.toMap

  test("stream as-of: left emits after watermark with the latest prior right") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[Streams.Ev]
    val rights = MemoryStream[Streams.Ev]
    val q = Streams.asofEnrich(lefts.toDS(), rights.toDS(), "5 minutes")
      .writeStream.format("memory").queryName("asof1")
      .outputMode("append").start()
    try {
      rights.addData(ev(100, 1, "r", ts(0), 10.0),
        ev(101, 1, "r", ts(20), 20.0))
      lefts.addData(ev(1, 1, "l", ts(5), 0.0), // after r100 -> 10.0
        ev(2, 1, "l", ts(20), 0.0), // exact tie -> r101 visible
        ev(3, 2, "l", ts(5), 0.0)) // no rights for user 2 -> null
      q.processAllAvailable()
      // advance the watermark far past every left so they all flush
      rights.addData(ev(999, 9, "r", ts(59), 0.0))
      q.processAllAvailable()
      lefts.addData(ev(998, 9, "l", Timestamp.valueOf("2026-01-01 11:30:00"), 0.0))
      q.processAllAvailable()
      val m = collectMatches("asof1")
      assert(m(1L) == Some((100L, 10.0)))
      assert(m(2L) == Some((101L, 20.0)))
      assert(m(3L) == None)
    } finally q.stop()
  }

  test("stream as-of: a late right arriving after the left still matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[Streams.Ev]
    val rights = MemoryStream[Streams.Ev]
    val q = Streams.asofEnrich(lefts.toDS(), rights.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("asof2")
      .outputMode("append").start()
    try {
      // Left arrives FIRST; the right it should match arrives in a later
      // trigger but with an earlier event time (admitted by the
      // watermark). Because lefts only emit once the watermark passes
      // them, the match is still exact.
      lefts.addData(ev(1, 1, "l", ts(8), 0.0))
      q.processAllAvailable()
      rights.addData(ev(100, 1, "r", ts(6), 6.0))
      q.processAllAvailable()
      // push the watermark past ts(8): left 1 flushes with the match
      rights.addData(ev(101, 2, "r", ts(40), 0.0))
      q.processAllAvailable()
      lefts.addData(ev(2, 2, "l", ts(40), 0.0))
      q.processAllAvailable()
      rights.addData(ev(102, 3, "r", Timestamp.valueOf("2026-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val m = collectMatches("asof2")
      assert(m(1L) == Some((100L, 6.0)))
      assert(m(2L) == Some((101L, 0.0)))
    } finally q.stop()
  }

  test("batch dispatch agrees with AsOfJoin.backward on random data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val users = 5
    val all = (1 to 300).map { i =>
      val tpe = if (rnd.nextBoolean()) "l" else "r"
      ev(i.toLong, rnd.nextInt(users).toLong, tpe,
        new Timestamp(ts(0).getTime + rnd.nextInt(3600) * 1000L),
        rnd.nextInt(100).toDouble)
    }
    val lefts = all.filter(_.event_type == "l")
    val rights = all.filter(_.event_type == "r")
    val batch = Streams.asofEnrich(lefts.toDS(), rights.toDS())
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
          else Some((r.getLong(3), r.getDouble(4))))
      }.toMap

    val lmem = MemoryStream[Streams.Ev]
    val rmem = MemoryStream[Streams.Ev]
    val q = Streams.asofEnrich(lmem.toDS(), rmem.toDS(), "1 minute")
      .writeStream.format("memory").queryName("asof3")
      .outputMode("append").start()
    try {
      // Chunks advance in event time (so the watermark admits everything),
      // but WITHIN each chunk arrival order is shuffled — left rows only
      // emit after the watermark passes them, so local disorder must not
      // change any match.
      val sorted = all.sortBy(e => (e.ts.getTime, e.event_id))
      val shuf = new scala.util.Random(13)
      sorted.grouped(40).foreach { chunk0 =>
        val chunk = shuf.shuffle(chunk0)
        val (ls, rs) = chunk.partition(_.event_type == "l")
        if (rs.nonEmpty) rmem.addData(rs: _*)
        if (ls.nonEmpty) lmem.addData(ls: _*)
        q.processAllAvailable()
      }
      // flush the tail
      rmem.addData(ev(9999, 99, "r", Timestamp.valueOf("2026-01-01 23:00:00"), 0.0))
      q.processAllAvailable()
      lmem.addData(ev(9998, 99, "l", Timestamp.valueOf("2026-01-01 23:30:00"), 0.0))
      q.processAllAvailable()
      val stream = collectMatches("asof3") - 9998L
      assert(stream.size == lefts.size, s"${stream.size} vs ${lefts.size}")
      val diffs = batch.keySet.filter(k => batch(k) != stream.getOrElse(k, None))
      assert(diffs.isEmpty, diffs.take(5).map(k =>
        s"$k: batch=${batch(k)} stream=${stream.get(k)}").mkString("; "))
    } finally q.stop()
  }
}
