package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The ordered-file replay contract behind the driver-checkable streaming
  * rows (q75/q76): staged ranges replay in event-time order, sentinels force
  * the final watermark flush, and the streamed append output equals the
  * batch answer exactly.
  */
class StreamingReplaySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def hasData = new java.io.File(s"$sfDir/events.parquet").exists()

  test("staged replay: strictly increasing mtimes, event-time-ordered ranges, sentinels last") {
    assume(hasData)
    val staged = streaming.Replay.stageEventReplay(spark, sfDir, slices = 4)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(staged.dataDir))
      .filter(_.getFileName.toString.endsWith(".parquet")).sorted()
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    val mtimes = files.map(java.nio.file.Files.getLastModifiedTime(_).toMillis)
    assert(mtimes.sliding(2).forall(w => w(0) < w(1)), "mtimes must strictly increase in path order")
    assert(files.takeRight(2).forall(_.getFileName.toString.startsWith("zz-sentinel-")),
      "sentinel files must sort (and therefore replay) last")
    // range files are event-time ordered: max ts of file i <= min ts of file i+1
    val ranges = files.dropRight(2).map { p =>
      val r = spark.read.parquet(p.toString)
        .agg(min(col("ts").cast("long")), max(col("ts").cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) => assert(hi <= lo2) }
    val sent = spark.read.parquet(files.last.toString).head()
    assert(sent.getAs[Long]("user_id") === -1L && sent.getAs[String]("event_type") === "sentinel")
  }

  test("streamed sessionization over the replay equals batch sessionize (full set, no dupes)") {
    assume(hasData)
    import spark.implicits._
    val staged = streaming.Replay.stageEventReplay(spark, sfDir, slices = 4)
    val evSchema = org.apache.spark.sql.Encoders.product[streaming.EventWindows.Event].schema
    val in = spark.readStream.schema(evSchema).option("maxFilesPerTrigger", "1")
      .parquet(staged.dataDir).as[streaming.EventWindows.Event]
    val streamed = streaming.Replay.runToParquet(spark,
        streaming.EventWindows.sessionizeStream(in, "30 minutes", gapMinutes = 30).toDF, staged.root)
      .filter(col("user_id") >= 0)
      .select("user_id", "session_start", "session_end", "n_events")

    val batch = streaming.EventWindows.sessionize(
        spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[streaming.EventWindows.Event], gapMinutes = 30)
      .toDF.select("user_id", "session_start", "session_end", "n_events")

    assert(streamed.count() === batch.count(), "session counts differ")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed session set must equal the batch gap-split exactly")
  }
}
