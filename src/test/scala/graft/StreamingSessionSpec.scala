package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch streaming sessionization: a session spanning micro-batches is
  * emitted once (state carries the open session), closes only when the
  * watermark passes its gap deadline, and in-batch gaps still split.
  */
class StreamingSessionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(min: Long) = new java.sql.Timestamp(3600_000L + min * 60000L)

  test("session spanning three micro-batches emits once, on watermark passing the gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[streaming.EventWindows.Event]
    val q = streaming.EventWindows.sessionizeStream(in.toDS(), "10 minutes", gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    def emitted() = spark.table("sess_out")
      .as[streaming.EventWindows.Session].collect().sortBy(s => (s.user_id, s.session_start.getTime))
    try {
      in.addData(streaming.EventWindows.Event(1, ts(0), 7, "a", 1.0),
        streaming.EventWindows.Event(2, ts(10), 7, "a", 2.0))
      q.processAllAvailable()
      in.addData(streaming.EventWindows.Event(3, ts(20), 7, "a", 3.0))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session must not flush mid-stream")
      // batch 3: unrelated user far in the future advances the watermark past
      // user 7's gap deadline (20 + 30 min); user 7's session closes via timeout
      in.addData(streaming.EventWindows.Event(4, ts(120), 8, "b", 4.0))
      q.processAllAvailable()
      // one more empty-ish batch so the timeout (evaluated against the new
      // watermark) fires
      in.addData(streaming.EventWindows.Event(5, ts(121), 8, "b", 5.0))
      q.processAllAvailable()
      val s = emitted()
      assert(s.length === 1, s.mkString(","))
      assert(s(0).user_id === 7 && s(0).n_events === 3 && s(0).total_value === 6.0)
      assert(s(0).session_start === ts(0) && s(0).session_end === ts(20))
    } finally q.stop()
  }

  test("in-batch gap splits immediately; second session stays open") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[streaming.EventWindows.Event]
    val q = streaming.EventWindows.sessionizeStream(in.toDS(), "10 minutes", gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out2").start()
    try {
      in.addData(streaming.EventWindows.Event(1, ts(0), 9, "a", 1.0),
        streaming.EventWindows.Event(2, ts(100), 9, "a", 2.0)) // 100 > 30 gap
      q.processAllAvailable()
      import spark.implicits._
      val s = spark.table("sess_out2").as[streaming.EventWindows.Session].collect()
      assert(s.length === 1 && s(0).n_events === 1 && s(0).session_end === ts(0))
    } finally q.stop()
  }
}
