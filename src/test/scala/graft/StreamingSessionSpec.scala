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

  test("in-batch gap splits but emits nothing until the watermark seals each side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[streaming.EventWindows.Event]
    val q = streaming.EventWindows.sessionizeStream(in.toDS(), "10 minutes", gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out2").start()
    try {
      in.addData(streaming.EventWindows.Event(1, ts(0), 9, "a", 1.0),
        streaming.EventWindows.Event(2, ts(35), 9, "a", 2.0)) // 35 > 30 gap
      q.processAllAvailable()
      val s0 = spark.table("sess_out2").as[streaming.EventWindows.Session].collect()
      // a closed-looking session may still be bridged by a late event — no
      // emission while the watermark (ts(25)) is below end+gap (ts(30))
      assert(s0.isEmpty, s"premature emission: ${s0.mkString(",")}")
      // advance the watermark to ts(60): seals only [0,0] (30 < 60);
      // [35,35] stays open (65 > 60)
      in.addData(streaming.EventWindows.Event(3, ts(70), 10, "b", 4.0))
      q.processAllAvailable()
      val s = spark.table("sess_out2").as[streaming.EventWindows.Session].collect()
      assert(s.length === 1 && s(0).n_events === 1 && s(0).session_end === ts(0))
      // and ts(100) → watermark ts(90) seals the second half too
      in.addData(streaming.EventWindows.Event(4, ts(100), 10, "b", 5.0))
      q.processAllAvailable()
      val s2 = spark.table("sess_out2").as[streaming.EventWindows.Session].collect()
        .filter(_.user_id == 9).sortBy(_.session_start.getTime)
      assert(s2.length === 2 && s2(1).session_start === ts(35))
    } finally q.stop()
  }

  test("out-of-order event above the watermark bridges an in-batch gap (one merged session)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[streaming.EventWindows.Event]
    // gap 30, watermark delay 60: the ADVICE counterexample
    val q = streaming.EventWindows.sessionizeStream(in.toDS(), "60 minutes", gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out3").start()
    try {
      // batch 1: t=50 and t=100 — a 50-min in-batch gap (two candidates)
      in.addData(streaming.EventWindows.Event(1, ts(50), 11, "a", 1.0),
        streaming.EventWindows.Event(2, ts(100), 11, "a", 2.0))
      q.processAllAvailable()
      // batch 2: t=70, above the watermark (100-60=40) — bridges both sides
      in.addData(streaming.EventWindows.Event(3, ts(70), 11, "a", 3.0))
      q.processAllAvailable()
      // batch 3: another user far ahead advances the watermark past 100+30
      in.addData(streaming.EventWindows.Event(4, ts(300), 12, "b", 4.0))
      q.processAllAvailable()
      in.addData(streaming.EventWindows.Event(5, ts(301), 12, "b", 5.0))
      q.processAllAvailable()
      val s = spark.table("sess_out3").as[streaming.EventWindows.Session].collect()
        .filter(_.user_id == 11)
      assert(s.length === 1, s"expected one merged session, got ${s.mkString(",")}")
      assert(s(0).session_start === ts(50) && s(0).session_end === ts(100))
      assert(s(0).n_events === 3 && s(0).total_value === 6.0)

      // and an out-of-order event must also extend a session BACKWARD: user
      // 13 at t=280 then t=260 (above the ts(241) watermark) in the next
      // batch → one session [260,280] with the lowered start
      in.addData(streaming.EventWindows.Event(6, ts(280), 13, "a", 1.0))
      q.processAllAvailable()
      in.addData(streaming.EventWindows.Event(7, ts(260), 13, "a", 2.0))
      q.processAllAvailable()
      in.addData(streaming.EventWindows.Event(8, ts(500), 12, "b", 1.0))
      q.processAllAvailable()
      in.addData(streaming.EventWindows.Event(9, ts(501), 12, "b", 1.0))
      q.processAllAvailable()
      val s13 = spark.table("sess_out3").as[streaming.EventWindows.Session].collect()
        .filter(_.user_id == 13)
      assert(s13.length === 1 && s13(0).session_start === ts(260) && s13(0).session_end === ts(280),
        s"backward extension broke: ${s13.mkString(",")}")
      assert(s13(0).n_events === 2 && s13(0).total_value === 3.0)
    } finally q.stop()
  }
}
