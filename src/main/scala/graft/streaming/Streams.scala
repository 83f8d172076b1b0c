package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (north-star: streams as unbounded
  * DataFrames; the reference is batch-only — SURVEY.md §2.9 — so this is
  * the engine's forward-looking half).
  *
  * Both transforms take the events-shaped schema
  * `(event_id, user_id, event_type, ts TIMESTAMP, value DOUBLE)` and work
  * identically on a batch DataFrame or a `readStream` source.
  *
  * Scale: the windowed aggregate is a streaming shuffle keyed by
  * (window, event_type) with watermark-driven state eviction. Sessionization
  * dispatches on `isStreaming`:
  *   - batch compiles to the lag + cumulative-sum window plan — per-user
  *     work is a sort within the shuffle partition, nothing materializes a
  *     whole user's history on the heap (a hot user with 10^8 events sorts
  *     and spills, it does not OOM);
  *   - streams use `flatMapGroupsWithState` with an **event-time timeout**:
  *     state is keyed by user_id (O(active users)), and when the watermark
  *     passes `last_event + gap` the idle session is emitted and its state
  *     removed — trailing sessions are never stuck open and state cannot
  *     grow without bound.
  * The two paths are certified against each other in StreamsSpec.
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

  /** Exact event deduplication with the streams-as-tables duality:
    *   - batch keeps the EVENT-TIME-first row per key (total order
    *     (ts, event_id)) via a ranking window — deterministic and
    *     oracle-checkable (q53);
    *   - streams use `dropDuplicatesWithinWatermark`: state holds a key
    *     only until the watermark passes its event time, so dedup state is
    *     bounded by the lateness horizon, not stream history (a key seen
    *     again after eviction re-emits — the documented tradeoff of
    *     bounded-state streaming dedup).
    * The two agree when duplicate arrivals are in event-time order
    * (streams keep the first ARRIVAL).
    */
  def dedupe(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols)
    else {
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("ts"), col("event_id"))
      events.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

  /** Stream-stream (and batch) time-interval attribution join: each left
    * event pairs with right events of the same user whose timestamp falls
    * in `[left.ts − windowMs, left.ts]` (click-to-purchase attribution).
    * Output columns: (p_id, p_user, p_ts, c_id, c_ts).
    *
    * On streams both sides carry watermarks and the join condition is a
    * bounded event-time range, which is exactly what lets Spark EVICT
    * join state: a right-side row older than
    * `watermark − windowMs` can never match a future left row, so state
    * is bounded by the window + lateness horizon, not stream history.
    * On batch the same plan is a plain range join (oracle-checked, q58).
    */
  def attributionJoin(left: DataFrame, right: DataFrame,
      windowMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p0 = left.select(col("event_id").as("p_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c0 = right.select(col("event_id").as("c_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
    val (p, c) =
      if (left.isStreaming)
        (p0.withWatermark("p_ts", watermarkDelay),
          c0.withWatermark("c_ts", watermarkDelay))
      else (p0, c0)
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - make_dt_interval(
            lit(0), lit(0), lit(0), lit(windowMs / 1000.0)) &&
          col("c_ts") <= col("p_ts"))
      .drop("c_user")
  }

  final case class Ev(event_id: Long, user_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)

  final case class AsofMatch(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, matched_id: java.lang.Long,
      matched_value: java.lang.Double)
  /** rights: (ts_ms, event_id, value) ascending; pending: unemitted lefts. */
  final case class AsofState(rights: List[(Long, Long, Double)],
      pending: List[(Long, Long, Double)])

  /** Streaming as-of enrichment (event-time temporal join): each left
    * event is matched to the latest right event of the same user with
    * `right.ts <= left.ts` — the stream counterpart of
    * [[graft.operators.AsOfJoin.backward]] (which handles the batch path
    * and is what this dispatches to on batch input).
    *
    * Correctness + bounded state, both from the watermark:
    *   - a left event is EMITTED only once the watermark passes its
    *     timestamp, so every right event that could precede it (any with
    *     `ts <= left.ts`, admissible only while `ts >= watermark`) has
    *     been seen — results are exact, not arrival-order-dependent;
    *   - right history is pruned to "the latest row at-or-before the
    *     watermark, plus everything after": older rows are superseded for
    *     every still-unemittable left. State is O(lateness horizon), not
    *     stream history.
    * Pending lefts flush via event-time timeout when no new events arrive.
    */
  def asofEnrich(left: Dataset[Ev], right: Dataset[Ev],
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    require(left.isStreaming == right.isStreaming,
      "asofEnrich needs both sides batch or both sides streaming " +
        "(a stream-batch union is not plannable); wrap the static side " +
        "in a stream or collect the stream first")
    if (!left.isStreaming) {
      val l = left.toDF().select(col("event_id"), col("user_id"), col("ts"))
      val r = right.toDF().select(col("user_id"), col("ts"),
        col("event_id").as("matched_id"), col("value").as("matched_value"))
      return graft.operators.AsOfJoin.backward(l, r, Seq("user_id"), "ts",
        Seq("matched_id", "matched_value"))
    }
    val tagged = right.map(e => e.copy(event_type = "__r"))
      .union(left.map(e => e.copy(event_type = "__l")))
    tagged
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Ev], state: GroupState[AsofState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(AsofState(Nil, Nil))
          if (!state.hasTimedOut) {
            // Rights merge into the (ascending, event-id-tiebroken)
            // history; lefts join the pending buffer.
            val evs = it.toSeq
            val newRights = evs.filter(_.event_type == "__r")
              .map(e => (e.ts.getTime, e.event_id, e.value))
            val newLefts = evs.filter(_.event_type == "__l")
              .map(e => (e.ts.getTime, e.event_id, e.value))
            st = AsofState(
              (st.rights ++ newRights).sortBy(r => (r._1, r._2)),
              st.pending ++ newLefts)
          }
          // Emit every pending left the watermark has passed; keep the rest.
          val (ready, stillPending) = st.pending.partition(_._1 <= wm)
          val out = ready.sortBy(l => (l._1, l._2)).map { case (lts, lid, _) =>
            val m = st.rights.takeWhile(r => r._1 <= lts).lastOption
            AsofMatch(lid, userId, new java.sql.Timestamp(lts),
              m.map(r => java.lang.Long.valueOf(r._2)).orNull,
              m.map(r => java.lang.Double.valueOf(r._3)).orNull)
          }
          // Prune rights: drop all but the newest row at-or-before the
          // watermark — no remaining or future left can match the older
          // ones (their ts is > watermark).
          val (old, live) = st.rights.partition(_._1 <= wm)
          val pruned = old.lastOption.toList ++ live
          if (stillPending.isEmpty && pruned.isEmpty) state.remove()
          else {
            state.update(AsofState(pruned, stillPending))
            // Wake as soon as the watermark can pass a pending left so it
            // flushes even if the user goes quiet. Rights-only state sets
            // NO timeout: it is already pruned to O(lateness horizon) and
            // only a future left (a fresh invocation) can consume it.
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                stillPending.map(_._1).min, wm + 1))
          }
          out.iterator
      }
      .toDF()
  }
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Event-time sessionization with a gap: a user's consecutive events
    * ≤ `gapMs` apart form one session. Dispatches to the window plan for
    * batch and to stateful `flatMapGroupsWithState` for streams (same
    * session semantics, certified against each other in StreamsSpec).
    * Timestamps are compared at millisecond precision on both paths.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] =
    if (events.isStreaming) sessionizeStream(events, gapMs)
    else sessionizeBatch(events, gapMs)

  /** Batch path: classic gaps-and-islands — lag to flag session starts,
    * running sum to number sessions, one aggregate per session. Scales by
    * (user_id) shuffle + in-partition sort; no per-user materialization.
    */
  private[graft] def sessionizeBatch(events: Dataset[Ev], gapMs: Long)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("__ms"), col("event_id"))
    val running = byUser
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("__ms"), 1).over(byUser)
    events.toDF()
      .withColumn("__ms", unix_millis(col("ts")))
      .withColumn("__new",
        when(prev.isNull || col("__ms") - prev > gapMs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(running))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        timestamp_millis(min(col("__ms"))).as("session_start"),
        timestamp_millis(max(col("__ms"))).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[Session]
  }

  /** Stream path: per-user state + event-time timeout. When the watermark
    * passes `session_end + gapMs` the open session is emitted and state
    * removed — idle users do not leak state. Late events beyond
    * `watermarkDelay` are dropped by the watermark.
    */
  private[graft] def sessionizeStream(events: Dataset[Ev], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          def close(st: SessionState): Unit =
            out += Session(userId, new java.sql.Timestamp(st.start),
              new java.sql.Timestamp(st.last), st.n,
              // Same rounding as the batch path's round(): HALF_UP away
              // from zero — math.round (floor(x+0.5)) disagrees on
              // negative totals ending in .xx5.
              BigDecimal(st.sum)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          if (state.hasTimedOut) {
            // Watermark passed last + gap with no new events: the session
            // is definitively closed — emit it and free the state.
            state.getOption.foreach(close)
            state.remove()
          } else {
            // This trigger's new events for the user (bounded by trigger
            // size, not by the user's history — state carries the past).
            // Sorting covers in-trigger ordering; a cross-trigger late
            // event (admitted by the watermark, t < st.last) merges with
            // start = min, last = max so the session bounds and later gap
            // checks track the TRUE extremes — not a regressed `last`.
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            // Late events more than a gap BEFORE the open session form
            // their own earlier session(s). Consecutive such events MERGE
            // with each other (matching the batch plan) — `early`
            // accumulates them; since events are sorted and merging never
            // raises `early.last` past `st.start - gap`, an early session
            // can never rejoin the open one and is emitted closed.
            // Limitation (documented): early events split across separate
            // TRIGGERS cannot merge — the first trigger's session is
            // already emitted; exact replay of arbitrarily interleaved
            // late data would need a multi-session state list.
            var early: SessionState = null
            def closeEarly(): Unit =
              if (early != null) { close(early); early = null }
            evs.foreach { e =>
              val t = e.ts.getTime
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t < st.start - gapMs) {
                if (early == null) early = SessionState(t, t, 1, e.value)
                else if (t - early.last <= gapMs)
                  early = SessionState(math.min(early.start, t),
                    math.max(early.last, t), early.n + 1, early.sum + e.value)
                else {
                  closeEarly()
                  early = SessionState(t, t, 1, e.value)
                }
              } else if (t - st.last <= gapMs)
                // In-gap (possibly out-of-order: t may be < st.last).
                st = SessionState(math.min(st.start, t),
                  math.max(st.last, t), st.n + 1, st.sum + e.value)
              else {
                close(st)
                st = SessionState(t, t, 1, e.value)
              }
            }
            closeEarly()
            if (st != null) {
              state.update(st)
              // Fire once the watermark passes the gap after the last
              // event; the max() keeps the timestamp legal (it must be
              // beyond the current watermark) for stragglers.
              state.setTimeoutTimestamp(
                math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }
}
