package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream.
  *
  * The reference is batch-only (SURVEY §2.7), so these are the engine's
  * forward-looking stream surface: watermarked tumbling-window aggregation and
  * custom sessionization state via flatMapGroupsWithState. Batch/stream parity
  * is locked by EngineSpec ("streaming window agg matches batch q27").
  */
object EventWindows {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long, total_value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Watermarked tumbling-window aggregation (streaming analog of q27). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), min("value").as("min_value"), max("value").as("max_value"))
      .select(col("window.start").as("hr"), col("event_type"), col("cnt"),
        col("min_value"), col("max_value"))

  /** Per-user OPEN candidate sessions (disjoint, none emitted yet). */
  final case class OpenSessions(sessions: List[SessionState])

  /** Streaming per-user sessionization: candidate sessions ride the group
    * state across micro-batches and a session is emitted ONLY once the
    * event-time watermark passes its gap deadline (end + gap) — never on an
    * in-batch gap. That makes the append-mode output correct for
    * out-of-order data within the watermark: a late event that bridges two
    * candidate sessions (or extends one backward, lowering its start) merges
    * in state before anything is emitted, so each final session is emitted
    * exactly once. State is bounded by the watermark: only sessions whose
    * gap deadline is still above it are held, expired by EventTimeTimeout
    * (the batch-mode [[sessionize]] below flushes eagerly instead, correct
    * there because batch delivers each group once, fully).
    */
  def sessionizeStream(events: Dataset[Event], watermarkDelay: String,
                       gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def toSession(userId: Long, st: SessionState): Session =
      Session(userId, new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.end), st.n, st.total)

    // coalesce sessions/events (sorted sweep) — reproduces the canonical
    // "chain events whose successive gaps are ≤ gap" definition exactly
    def merge(all: Seq[SessionState]): List[SessionState] = {
      val sorted = all.sortBy(s => (s.start, s.end))
      // ArrayBuffer: last-element read/replace is O(1), so a hot user whose
      // batch chains into one session merges in O(m), not O(m²)
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionState]
      for (s <- sorted) {
        if (out.nonEmpty && s.start - out.last.end <= gapMs) {
          val l = out.last
          out(out.length - 1) = SessionState(math.min(l.start, s.start),
            math.max(l.end, s.end), l.n + s.n, l.total + s.total)
        } else out += s
      }
      out.toList
    }

    // emit every session the watermark has sealed (no admissible event can
    // reach ts ≤ end+gap < wm any more); hold and re-arm the rest
    def flushSealed(userId: Long, state: GroupState[OpenSessions],
                    sessions: List[SessionState], wm: Long): Iterator[Session] = {
      val (closed, open) = sessions.partition(s => wm > s.end + gapMs)
      if (open.isEmpty) state.remove()
      else {
        state.update(OpenSessions(open))
        state.setTimeoutTimestamp(math.max(open.map(_.end + gapMs).min, wm + 1))
      }
      closed.sortBy(_.start).iterator.map(toSession(userId, _))
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSessions]) => {
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.map(_.sessions).getOrElse(Nil)
          if (state.hasTimedOut) flushSealed(userId, state, prev, wm)
          else {
            val evs = it.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq
            flushSealed(userId, state, merge(prev ++ evs), wm)
          }
        })
  }

  /** Per-user sessionization with a gap timeout: events within `gapMinutes` of
    * each other belong to one session. Batch mode (each group delivered once,
    * fully); the streaming analog with cross-batch state is [[sessionizeStream]].
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.end), st.n, st.total)

    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
        // batch mode delivers each group once, fully — sort and split on gaps
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[Session]
        var cur: SessionState = state.getOption.orNull
        for (e <- sorted) {
          val t = e.ts.getTime
          if (cur == null) cur = SessionState(t, t, 1, e.value)
          else if (t - cur.end > gapMs) { out += flush(userId, cur); cur = SessionState(t, t, 1, e.value) }
          else cur = SessionState(cur.start, math.max(cur.end, t), cur.n + 1, cur.total + e.value)
        }
        if (cur != null) { out += flush(userId, cur); state.remove() }
        out.iterator
      })
  }
}
