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

  test("stream timeout: idle user's trailing session emits via watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      // User 1 opens a session and then goes idle forever.
      mem.addData(Streams.Ev(1, 1, "a", ts(0), 1.0),
        Streams.Ev(2, 1, "a", ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 0)
      // ONLY user 2 events advance the watermark past
      // user1.last + gap + delay (10:05 + 30m + 10m = 10:45).
      mem.addData(Streams.Ev(3, 2, "b",
        Timestamp.valueOf("2026-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // The watermark computed from that batch applies to the NEXT batch;
      // another user-2 event triggers it and fires the timeout.
      mem.addData(Streams.Ev(4, 2, "b",
        Timestamp.valueOf("2026-01-01 12:01:00"), 1.0))
      q.processAllAvailable()
      val u1 = spark.table("sess_timeout").as[Streams.Session].collect()
        .filter(_.user_id == 1)
      assert(u1.length == 1, s"expected user 1's trailing session, got ${u1.toSeq}")
      assert(u1.head.session_start == ts(0) && u1.head.session_end == ts(5))
      assert(u1.head.n_events == 2 && u1.head.total_value == 3.0)
      // State for user 1 was removed: further watermark advances emit
      // nothing more for it.
      mem.addData(Streams.Ev(5, 2, "b",
        Timestamp.valueOf("2026-01-01 14:00:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").as[Streams.Session].collect()
        .count(_.user_id == 1) == 1)
    } finally q.stop()
  }

  test("cross-trigger late events: min/max merge + early-orphan, batch ≡ stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 30 * 60 * 1000L
    // Trigger 1: 10:10, 10:14 (watermark after batch = 10:14 − 10m = 10:04).
    // Trigger 2 (late but admitted): 10:06 — BEFORE session start 10:10 →
    //   must merge with start := 10:06 (the old code regressed `last`
    //   instead and never lowered `start`).
    // Trigger 3: 11:30 closes the session (70m > gap).
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gapMs = gap)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData(Streams.Ev(1, 1, "a", ts(10), 1.0),
        Streams.Ev(2, 1, "a", ts(14), 2.0))
      q.processAllAvailable()
      mem.addData(Streams.Ev(3, 1, "a", ts(6), 4.0)) // late, in-gap
      q.processAllAvailable()
      mem.addData(Streams.Ev(4, 1, "a",
        Timestamp.valueOf("2026-01-01 11:30:00"), 8.0))
      q.processAllAvailable()
      val stream = spark.table("sess_late").as[Streams.Session].collect()
      assert(stream.length == 1)
      val s = stream.head
      assert(s.session_start == ts(6), s"start not lowered: $s")
      assert(s.session_end == ts(14) && s.n_events == 3 && s.total_value == 7.0)
      // Batch over the SAME events (sorted by time, as batch sees them)
      // produces the identical first session.
      val batch = Streams.sessionize(Seq(
        Streams.Ev(1, 1, "a", ts(10), 1.0),
        Streams.Ev(2, 1, "a", ts(14), 2.0),
        Streams.Ev(3, 1, "a", ts(6), 4.0),
        Streams.Ev(4, 1, "a",
          Timestamp.valueOf("2026-01-01 11:30:00"), 8.0)).toDS(), gap)
        .collect().sortBy(_.session_start.getTime)
      assert(batch.length == 2)
      assert(batch.head == s, s"batch ${batch.head} != stream $s")
    } finally q.stop()
  }

  test("very-late events beyond gap-before-start form their own MERGED session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    // Large watermark delay so 90-minutes-late events are still admitted.
    val q = Streams.sessionizeStream(mem.toDS(), gapMs = 30 * 60 * 1000L,
        watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("sess_orphan")
      .outputMode("append").start()
    try {
      mem.addData(Streams.Ev(1, 1, "a",
        Timestamp.valueOf("2026-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // Both lates precede the open session by more than the gap, and are
      // within gap of EACH OTHER: they must merge into ONE earlier
      // session (the batch plan merges them too), not two singletons.
      mem.addData(
        Streams.Ev(2, 1, "a", Timestamp.valueOf("2026-01-01 10:30:00"), 4.0),
        Streams.Ev(3, 1, "a", Timestamp.valueOf("2026-01-01 10:35:00"), 2.0))
      q.processAllAvailable()
      val out = spark.table("sess_orphan").as[Streams.Session].collect()
      assert(out.length == 1, out.toSeq)
      assert(out.head.session_start ==
        Timestamp.valueOf("2026-01-01 10:30:00"))
      assert(out.head.session_end ==
        Timestamp.valueOf("2026-01-01 10:35:00"))
      assert(out.head.n_events == 2 && out.head.total_value == 6.0)
    } finally q.stop()
  }

  test("stream dedup: duplicates dropped within watermark, state evicted after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp, Double)]
    val events = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val q = Streams.dedupe(events, Seq("user_id", "event_type"),
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, "click", ts(0), 1.0),
        (2L, 1L, "click", ts(2), 2.0), // dup key within watermark → dropped
        (3L, 2L, "view", ts(3), 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
      assert(spark.table("dedup").select("event_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L))
      // Advance the watermark far past the keys' event times: their dedup
      // state is evicted, so the SAME key re-emits — the documented
      // bounded-state tradeoff (state = lateness horizon, not history).
      mem.addData((4L, 9L, "z", Timestamp.valueOf("2026-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData((5L, 1L, "click", Timestamp.valueOf("2026-01-01 13:01:00"), 5.0))
      q.processAllAvailable()
      assert(spark.table("dedup").select("event_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attach only to in-window purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, String, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Long, String, Timestamp, Double)]
    def df(m: MemoryStream[(Long, Long, String, Timestamp, Double)]) =
      m.toDF().toDF("event_id", "user_id", "event_type", "ts", "value")
    val q = Streams.attributionJoin(df(purchases), df(clicks),
        windowMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, 1L, "click", ts(0), 0.0), // in window of the 10:20 purchase
        (2L, 1L, "click", Timestamp.valueOf("2026-01-01 09:30:00"), 0.0),
        (3L, 2L, "click", ts(5), 0.0)) // wrong user
      purchases.addData((10L, 1L, "purchase", ts(20), 9.0))
      q.processAllAvailable()
      val pairs = spark.table("attr").select("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // click 2 is 50 min before the purchase (outside the 30-min window);
      // click 3 is another user — only click 1 attributes.
      assert(pairs == Set((10L, 1L)), pairs)
    } finally q.stop()
  }

  test("stream-static enrichment join: events join a dimension table per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long, String, Timestamp, Double)]
    val events = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    // Static side needs no watermark and is broadcast per micro-batch —
    // the standard streaming dimension-enrichment shape.
    val q = events.join(dim, Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("tier"), lit("unknown")).as("tier"))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, "click", ts(0), 1.0),
        (2L, 2L, "click", ts(1), 1.0),
        (3L, 9L, "click", ts(2), 1.0)) // no dimension row
      q.processAllAvailable()
      val rows = spark.table("enrich").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(rows == Set((1L, "gold"), (2L, "basic"), (3L, "unknown")))
    } finally q.stop()
  }

  test("rounding equivalence: batch ≡ stream totals incl. negative .xx5") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Seeded pseudo-random event set over 4 users; values are multiples of
    // 0.125 (exactly representable), so session sums regularly land on
    // .xx5 — where HALF_UP (batch round()) and floor(x+0.5) (the old
    // stream math.round) disagree for negatives.
    val rnd = new scala.util.Random(42)
    val evs = (1 to 40).map { i =>
      val user = 1L + rnd.nextInt(4)
      val t = new Timestamp(ts(0).getTime + i * 7 * 60 * 1000L +
        rnd.nextInt(3) * 60 * 1000L)
      val v = (rnd.nextInt(33) - 16) * 0.125
      Streams.Ev(i.toLong, user, "a", t, v)
    }
    val gap = 20 * 60 * 1000L
    val batch = Streams.sessionize(evs.toDS(), gap).collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
        s.total_value)).toSet

    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sess_round")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // Sentinel far-future event advances the watermark; the extra batch
      // fires every idle user's timeout so ALL real sessions close.
      mem.addData(Streams.Ev(998, 99, "z",
        Timestamp.valueOf("2026-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(Streams.Ev(999, 99, "z",
        Timestamp.valueOf("2026-01-02 12:01:00"), 0.0))
      q.processAllAvailable()
      val stream = spark.table("sess_round").as[Streams.Session].collect()
        .filter(_.user_id != 99)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
          s.total_value)).toSet
      assert(stream == batch,
        s"diff: stream-only=${stream -- batch}, batch-only=${batch -- stream}")
    } finally q.stop()
  }

  test("file-source multi-microbatch replay equals the one-shot batch answer") {
    // q84's claim, isolated: split input across TWO files, force one file
    // per microbatch, run the windowed aggregate in complete mode — the
    // final sink table must equal the batch plan over the union.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-files")
    val part1 = (1 to 40).map(i =>
      (i.toLong, i.toLong % 5, s"t${i % 3}", ts(i % 50), i * 0.5))
    val part2 = (41 to 90).map(i =>
      (i.toLong, i.toLong % 5, s"t${i % 3}", ts(i % 50), i * 0.5))
    part1.toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/f1")
    part2.toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*/part-*.parquet")
    val q = Streams.windowedCounts(stream, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("mb_replay")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "expected at least two non-empty microbatches")
      val got = spark.table("mb_replay").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val want = Streams.windowedCounts(
          (part1 ++ part2).toDF("event_id", "user_id", "event_type", "ts",
            "value"), "10 minutes", "5 minutes")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == want, s"stream-only=${got -- want}, batch-only=${want -- got}")
    } finally q.stop()
  }
}
