package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("windowed counts with watermark over a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp, Double)]
    val events = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val q = Streams.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, "click", ts(1), 1.0),
        (2L, 1L, "click", ts(4), 2.0),
        (3L, 2L, "view", ts(7), 3.0))
      q.processAllAvailable()
      // advance watermark far past the first windows so they close+emit
      mem.addData((9L, 9L, "late", Timestamp.valueOf("2026-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("window_start", "event_type", "c", "sv").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(rows.contains(("2026-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2026-01-01 10:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("windowed counts work identically on a batch DataFrame") {
    import spark.implicits._
    val batch = Seq(
      (1L, 1L, "click", ts(1), 1.0),
      (2L, 1L, "click", ts(4), 2.0),
      (3L, 2L, "view", ts(17), 3.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val rows = Streams.windowedCounts(batch, "10 minutes", "5 minutes")
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("click", 2L), ("view", 1L)))
  }

  test("sessionization: gap splits sessions, totals are correct (batch)") {
    import spark.implicits._
    val evs = Seq(
      Streams.Ev(1, 1, "a", ts(0), 1.0),
      Streams.Ev(2, 1, "a", ts(10), 2.0), // same session (gap 10m < 30m)
      Streams.Ev(3, 1, "a", ts(55), 4.0), // new session (gap 45m)
      Streams.Ev(4, 2, "b", ts(5), 8.0)).toDS()
    val sessions = Streams.sessionize(evs, gapMs = 30 * 60 * 1000L)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    val s1 = sessions(0)
    assert(s1.user_id == 1 && s1.n_events == 2 && s1.total_value == 3.0)
    assert(s1.session_start == ts(0) && s1.session_end == ts(10))
    assert(sessions(1).n_events == 1 && sessions(1).total_value == 4.0)
    assert(sessions(2).user_id == 2 && sessions(2).n_events == 1)
  }

  test("sessionization on a stream: closed sessions emit incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(Streams.Ev(1, 1, "a", ts(0), 1.0),
        Streams.Ev(2, 1, "a", ts(10), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open
      mem.addData(Streams.Ev(3, 1, "a", ts(55), 4.0)) // gap closes it
      q.processAllAvailable()
      val closed = spark.table("sess").as[Streams.Session].collect()
      assert(closed.length == 1)
      assert(closed.head.n_events == 2 && closed.head.total_value == 3.0)
    } finally q.stop()
  }
}
