package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q45–q47: the streaming transforms executed as batch plans (Structured
  * Streaming's unified-plan property makes them oracle-checkable), plus a
  * TPC-H Q5-shaped multi-join.
  *
  * q46's sessionization is the `flatMapGroupsWithState` operator itself —
  * its per-user fold is replayed in the oracle via the classic
  * gaps-and-islands SQL (lag + cumulative boundary sum), certifying the
  * custom-state logic against an independent formulation.
  */
object StreamBatchQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // q45: the streaming tumbling-window aggregate on batch input.
  def q45(s: SparkSession, dir: String): DataFrame =
    Streams.windowedCounts(t(s, dir, "events"), "1 hour", "10 minutes")
      .orderBy(col("window_start"), col("event_type"))

  // q46: sessionization (30-minute gap) via flatMapGroupsWithState.
  // Session timestamps are truncated to seconds for oracle comparison
  // (events.ts is ns in DuckDB, µs in Spark — FIXTURES.md).
  def q46(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val evs = t(s, dir, "events")
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type").cast("string"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .as[Streams.Ev]
    Streams.sessionize(evs, gapMs = 30 * 60 * 1000L)
      .toDF()
      .select(col("user_id"),
        date_trunc("second", col("session_start")).as("session_start"),
        date_trunc("second", col("session_end")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // q47: TPC-H Q5 shape — region-filtered multi-join revenue per nation.
  // Dims (region/nation/customer/supplier) broadcast; the only big
  // shuffle is orders⋈lineitem on orderkey.
  def q47(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  // q53: streaming dedup's batch plan — event-time-first row per
  // (user_id, event_type); the stream path (dropDuplicatesWithinWatermark,
  // bounded state) is certified in StreamsSpec.
  def q53(s: SparkSession, dir: String): DataFrame =
    Streams.dedupe(t(s, dir, "events"), Seq("user_id", "event_type"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"),
        round(col("value"), 2).as("v"))
      .orderBy(col("event_id"))

  // q58: the stream-stream interval join's batch plan — clicks attributed
  // to same-user purchases within the preceding 30 minutes; the stream
  // path (watermarked state eviction) is certified in StreamsSpec.
  def q58(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    Streams.attributionJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        windowMs = 30 * 60 * 1000L)
      .groupBy(col("p_id").as("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  // q59: SLIDING window counts (1 h window, 30 min slide) — each event
  // lands in exactly two windows; the oracle replays that as a two-bucket
  // union. Same watermark/eviction story as q45 on streams.
  def q59(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col("event_type"), col("c"))
      .orderBy(col("window_start"), col("event_type"))

  // q60: Spark's NATIVE session_window (gap 30 min) — the declarative
  // sessionizer the planner can optimize freely, certified against the
  // same gaps-and-islands oracle as the custom-state q46. (session_window
  // end = last event + gap, so only start/count/value are compared.)
  def q60(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        date_trunc("second", col("w.start")).as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  // q62: backward as-of join — every 'view' event enriched with the value
  // of the user's most recent prior-or-equal 'purchase' (union + single
  // window pass, no range join; operator in operators/AsOfJoin.scala).
  // Tie/visibility rule is lexicographic on (ts, event_id), replayed
  // identically by the oracle's last(.. IGNORE NULLS) window.
  def q62(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        round(col("value"), 2).as("purchase_value"),
        col("event_id").as("purchase_id"))
    graft.operators.AsOfJoin.backward(views, purchases, Seq("user_id"),
        "ts", Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        col("purchase_value"))
      .orderBy(col("event_id"))
  }

  // q84: the SAME windowed aggregate as q45 but executed as an ACTUAL
  // Structured Streaming query — file-source stream over the events
  // parquet, watermark, Trigger.AvailableNow, complete-mode memory sink —
  // then the sink table is returned for the oracle compare. Certifies the
  // unified-plan property end to end: the streaming runtime (source
  // listing, microbatch planner, stateful agg, sink commit) produces
  // bit-identical results to the batch plan under the batch oracle.
  // (Complete mode: the watermark drives state mgmt but drops nothing,
  // so multi-batch replays still equal the one-shot batch answer.)
  def q84(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    // The file stream source wants a directory basePath; the testdata
    // table is a single FILE, so glob it — a glob in the path makes the
    // source take the parent directory as base.
    val stream = graft.Tables.normalizeTs(
      s.readStream.schema(raw.schema).parquet(s"$dir/events.parque*"))
    val sink = "graft_q84_" + java.util.UUID.randomUUID().toString
      .replace("-", "")
    val query = Streams.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(sink).orderBy(col("window_start"), col("event_type"))
  }

  // q107: the q58 interval join executed as an ACTUAL stream-stream join
  // — two watermarked file-source streams (purchases ⋈ clicks within
  // [p_ts − 30 min, p_ts]), append-mode memory sink, then the per-purchase
  // click counts aggregated from the sink and replayed under q58's batch
  // oracle. Certifies the streaming join runtime (dual watermarks, join
  // state store, append emission) against the batch answer — the
  // stream-stream analogue of what q84 certifies for stateful aggregation.
  // State bound at scale: both sides evict once the watermark passes
  // `ts + 30 min + delay`; state is O(events in the lateness+window
  // horizon), not stream history.
  def q107(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    def stream(): DataFrame = graft.Tables.normalizeTs(
      s.readStream.schema(raw.schema).parquet(s"$dir/events.parque*"))
    val joined = Streams.attributionJoin(
      stream().filter(col("event_type") === "purchase"),
      stream().filter(col("event_type") === "click"),
      windowMs = 30 * 60 * 1000L)
    val sink = "graft_q107_" + java.util.UUID.randomUUID().toString
      .replace("-", "")
    // The join's state-store count = shuffle partitions AT STREAM START;
    // 32 stores × (commit + delta file) per micro-batch is pure fixed
    // cost at this volume, so the stream runs at 8 and the session
    // setting is restored after. A real deployment sizes this to state
    // volume / executor count, not to the batch shuffle default.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // Restore only after the stream DRAINS: micro-batches capture the
      // shuffle setting when each batch plans, not at start().
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.table(sink)
      .groupBy(col("p_id").as("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  // q117: q46's sessionization executed as an ACTUAL custom-state stream
  // — flatMapGroupsWithState with event-time timeouts over a file-source
  // events stream, replayed under the same gaps-and-islands batch
  // oracle. Completes the streaming-runtime certificates: q84 stateful
  // aggregation, q107 stream-stream join, q117 arbitrary user state.
  // Append-mode sessions only emit when the watermark passes
  // `last + gap`, so two far-future sentinel rows (written as SEPARATE
  // parquet files; the data file enters as a symlink keeping its older
  // mtime, and the source processes files in mtime order one per
  // micro-batch) advance the watermark and fire every idle user's
  // timeout — the same flush technique StreamsSpec uses with
  // MemoryStream, here through the real file source.
  def q117(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val raw = s.read.parquet(s"$dir/events.parquet")
    val isNanos = raw.schema.exists(f => f.name == "ts" &&
      f.dataType == org.apache.spark.sql.types.LongType)
    val tmp = Files.createTempDirectory("graft-q117").toString
    Files.createSymbolicLink(Paths.get(tmp, "data.parquet"),
      Paths.get(dir, "events.parquet"))
    // Sentinel files must carry the SAME ts convention as the original
    // file they sit beside (the file source reads both under one
    // declared schema), so the NTZ case writes NTZ sentinels; the
    // normalize-to-UTC cast happens once on the stream below.
    val isNtz = raw.schema.exists(f => f.name == "ts" &&
      f.dataType == org.apache.spark.sql.types.TimestampNTZType)
    val maxNs: Long =
      if (isNanos) raw.agg(max(col("ts"))).head().getLong(0)
      else graft.Tables.normalizeTs(raw)
        .agg(max(unix_micros(col("ts")))).head().getLong(0) * 1000L
    val scratch = Files.createTempDirectory("graft-q117-s").toString
    def writeSentinel(name: String, offsetNs: Long): Unit = {
      val ns = maxNs + offsetNs
      val row = raw.limit(1)
        .withColumn("event_id", lit(-1L))
        .withColumn("user_id", lit(-1L))
        .withColumn("event_type", lit("sentinel"))
        .withColumn("value", lit(0.0))
        .withColumn("ts",
          if (isNanos) lit(ns)
          else if (isNtz) timestamp_micros(lit(ns / 1000L))
            .cast(org.apache.spark.sql.types.TimestampNTZType)
          else timestamp_micros(lit(ns / 1000L)))
      val d = s"$scratch/$name"
      row.coalesce(1).write.mode("overwrite").parquet(d)
      val part = new java.io.File(d).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(tmp, name))
    }
    // Two sentinels: watermark advancement lags a micro-batch; the
    // second one triggers the timeout sweep that closes every session.
    writeSentinel("sentinel1.parquet", 2L * 24 * 3600 * 1000000000L)
    writeSentinel("sentinel2.parquet", 3L * 24 * 3600 * 1000000000L)
    val st = graft.Tables.normalizeTs(s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp))
    import s.implicits._
    val ev = st.select(col("event_id"), col("user_id"), col("event_type"),
      col("ts"), col("value")).as[Streams.Ev]
    val sink = "graft_q117_" + java.util.UUID.randomUUID().toString
      .replace("-", "")
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = Streams.sessionize(ev)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.table(sink).filter(col("user_id") >= 0)
      .select(col("user_id"),
        date_trunc("second", col("session_start")).as("session_start"),
        date_trunc("second", col("session_end")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // q231: q222's CUSUM monitor fed by an ACTUAL streaming aggregation
  // — the deployment shape of a drift monitor (the counts accumulate
  // in a live stateful agg; the CUSUM read runs on each snapshot):
  // file-source stream → per-(type, day) counts, complete-mode memory
  // sink (bounded: types × days rows, NOT the event stream — the r15
  // memory-sink caveat doesn't bite an aggregate), Trigger.AvailableNow
  // — then [[graft.operators.Drift.cusum]] over the sink table. The
  // oracle is q222's verbatim (the layout-invisibility rule from
  // q205): streamed counts must equal batch counts bit-for-bit, so the
  // whole certificate rides the q222 replay. Bench tier: exec (real
  // micro-batch runtime vs a single-statement replay).
  def q231(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val stream = graft.Tables.normalizeTs(
      s.readStream.schema(raw.schema).parquet(s"$dir/events.parque*"))
    val sink = "graft_q231_" + java.util.UUID.randomUUID().toString
      .replace("-", "")
    val daily = stream.groupBy(col("event_type"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
    val q = daily.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Drift.cusum(s.table(sink), "event_type", "day", "n")
      .orderBy(col("event_type"), col("day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q231_stream_cusum" -> (q231 _),
    "q117_stream_sessions" -> (q117 _),
    "q107_stream_join" -> (q107 _),
    "q84_stream_e2e" -> (q84 _),
    "q62_asof_join" -> (q62 _),
    "q45_stream_window" -> (q45 _),
    "q46_sessionize" -> (q46 _),
    "q47_tpch_q5" -> (q47 _),
    "q53_stream_dedup" -> (q53 _),
    "q58_interval_join" -> (q58 _),
    "q59_sliding_window" -> (q59 _),
    "q60_session_window" -> (q60 _)
  )

  val oracle: Map[String, String] = Map(
    // q231: stream ≡ batch — the streamed aggregate must reproduce the
    // batch daily counts exactly, so q222's oracle certifies both.
    "q231_stream_cusum" ->
      EventQueries.oracle("q222_cusum_changepoint"),
    "q62_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 1 AS side, event_id,
        |    CAST(NULL AS BIGINT) AS pid, CAST(NULL AS DOUBLE) AS pv
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 0 AS side, event_id,
        |    event_id AS pid, ROUND(value, 2) AS pv
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT user_id, side, event_id,
        |    last_value(pid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, side, pid NULLS FIRST
        |      ROWS UNBOUNDED PRECEDING) AS purchase_id,
        |    last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, side, pid NULLS FIRST
        |      ROWS UNBOUNDED PRECEDING) AS purchase_value
        |  FROM u)
        |SELECT event_id, user_id, purchase_id, purchase_value
        |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin,
    "q45_stream_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS c, ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q84_stream_e2e" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS c, ROUND(SUM(value), 2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q46_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |g AS (
        |  SELECT *, SUM(CASE WHEN pts IS NULL
        |      OR ts - pts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |  CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start,
        |  CAST(date_trunc('second', MAX(ts)) AS TIMESTAMP) AS session_end,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q53_stream_dedup" ->
      """WITH r AS (
        |  SELECT event_id, user_id, event_type, ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_id, user_id, event_type,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
        |  ROUND(value, 2) AS v
        |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q59_sliding_window" ->
      """WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b0,
        |                  event_type FROM events),
        |w AS (SELECT b0 AS ws, event_type FROM b
        |      UNION ALL
        |      SELECT b0 - INTERVAL 30 MINUTE, event_type FROM b)
        |SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type,
        |  COUNT(*) AS c
        |FROM w GROUP BY ws, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q60_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |g AS (
        |  -- session_window merges on STRICT diff < gap (windows [t, t+gap)
        |  -- must overlap), unlike q46's custom sessionizer (diff <= gap):
        |  -- split on >=.
        |  SELECT *, SUM(CASE WHEN pts IS NULL
        |      OR ts - pts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |  CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q117_stream_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |g AS (
        |  SELECT *, SUM(CASE WHEN pts IS NULL
        |      OR ts - pts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |  CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start,
        |  CAST(date_trunc('second', MAX(ts)) AS TIMESTAMP) AS session_end,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q107_stream_join" ->
      """SELECT p.event_id, COUNT(*) AS n_clicks
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q58_interval_join" ->
      """SELECT p.event_id, COUNT(*) AS n_clicks
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q47_tpch_q5" ->
      """SELECT n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  )
}
