package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (north-star: streams as unbounded
  * DataFrames; the reference is batch-only — SURVEY.md §2.9 — so this is
  * the engine's forward-looking half).
  *
  * Both transforms take the events-shaped schema
  * `(event_id, user_id, event_type, ts TIMESTAMP, value DOUBLE)` and work
  * identically on a batch DataFrame or a `readStream` source — the same
  * declarative plan, which is the point of Structured Streaming.
  *
  * Scale: the windowed aggregate is a streaming shuffle keyed by
  * (window, event_type) with watermark-driven state eviction; sessionization
  * keys state by user_id — state size is O(active users), and the
  * ProcessingTimeTimeout closes idle sessions so state can't grow without
  * bound.
  */
object Streams {

  /** Tumbling-window event counts with a watermark: late rows beyond
    * `watermarkDelay` are dropped, on-time state is evicted once the
    * watermark passes the window end.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("sv"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("c"), col("sv"))

  final case class Ev(event_id: Long, user_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Event-time sessionization with a gap timeout: a user's consecutive
    * events ≤ `gapMs` apart form one session; a gap (or state timeout on
    * the stream) closes it. `flatMapGroupsWithState` — the custom-state
    * escape hatch the built-in windowed aggs can't express.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val isStreaming = events.isStreaming // captured by value, not the Dataset
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          // Batch mode / per-trigger: sort this group's new events by time,
          // fold into sessions, emit every closed session; keep the open one
          // in state (stream) or close it at end (batch: state never
          // times out, so also emit the trailing open session).
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          evs.foreach { e =>
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.last <= gapMs)
              st = SessionState(st.start, t, st.n + 1, st.sum + e.value)
            else {
              out += Session(userId, new java.sql.Timestamp(st.start),
                new java.sql.Timestamp(st.last), st.n,
                math.round(st.sum * 100).toDouble / 100)
              st = SessionState(t, t, 1, e.value)
            }
          }
          if (state.hasTimedOut || !isStreaming) {
            if (st != null) {
              out += Session(userId, new java.sql.Timestamp(st.start),
                new java.sql.Timestamp(st.last), st.n,
                math.round(st.sum * 100).toDouble / 100)
              st = null
            }
            state.remove()
          } else if (st != null) state.update(st)
          out.iterator
      }
  }
}
