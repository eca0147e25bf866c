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

  /** Streaming per-user sessionization: an OPEN session rides the group state
    * across micro-batches and closes only when the event-time watermark
    * passes its gap deadline — so a session split across arbitrarily many
    * micro-batches is emitted exactly once. State is bounded by the
    * watermark: one open-session record per active user, expired by
    * EventTimeTimeout (the batch-mode [[sessionize]] below flushes eagerly
    * instead, correct there because batch delivers each group once).
    */
  def sessionizeStream(events: Dataset[Event], watermarkDelay: String,
                       gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def toSession(userId: Long, st: SessionState): Session =
      Session(userId, new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.end), st.n, st.total)

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // the watermark passed the open session's gap deadline: close it
            val st = state.get
            state.remove()
            Iterator.single(toSession(userId, st))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur: SessionState = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(t, t, 1, e.value)
              else if (t - cur.end > gapMs) {
                out += toSession(userId, cur) // in-batch gap: close immediately
                cur = SessionState(t, t, 1, e.value)
              } else cur = SessionState(cur.start, math.max(cur.end, t), cur.n + 1, cur.total + e.value)
            }
            if (cur != null) {
              state.update(cur)
              // close when the watermark reaches end+gap (strictly after the
              // current watermark, as EventTimeTimeout requires)
              state.setTimeoutTimestamp(math.max(cur.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
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
