package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic file-based replay of the `events` table as a multi-batch
  * stream, for driver-checkable (CORRECTNESS-row) streaming queries.
  *
  * The staging contract makes the streamed result equal the batch answer,
  * bitwise, so a plain SQL oracle can check a genuinely streamed execution:
  *
  *  - the table is staged as `repartitionByRange(ts)` parquet files, and each
  *    file's mtime is set strictly increasing in path order — the file source
  *    (`maxFilesPerTrigger=1`) then replays one event-time range per
  *    micro-batch, in order, so no event ever arrives below the watermark
  *    (batch N's min ts ≥ batch N−1's max ts ≥ the watermark) and nothing is
  *    late-dropped regardless of the watermark delay;
  *  - two sentinel files (user_id −1, event_type "sentinel", far-future ts,
  *    later mtimes) replay last: the first advances the event-time watermark
  *    past every real group's deadline, the second drives the micro-batch in
  *    which those EventTimeTimeouts fire — so every real session/window is
  *    sealed and emitted exactly once before `processAllAvailable` returns,
  *    and the append-mode output is complete and deterministic;
  *  - the sink is a parquet **file** sink (distributed write, bounded driver
  *    memory at any scale — the memory sink would be a driver-side collect).
  *
  * Callers filter the sentinel rows back out (`user_id >= 0` /
  * `event_type != 'sentinel'`).
  */
object Replay {

  final case class Staged(root: Path, dataDir: String)

  private val SentinelOffsetMs = 100L * 24 * 3600 * 1000 // 100 days

  /** Stage `$dir/events.parquet` for ordered replay; see object doc. */
  def stageEventReplay(s: SparkSession, dir: String, slices: Int = 8): Staged = {
    val root = Files.createTempDirectory("graft-replay")
    val dataDir = root.resolve("data")
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    ev.repartitionByRange(slices, col("ts"))
      .write.mode("overwrite").parquet(dataDir.toString)

    val maxTsMs = ev.agg(max(col("ts").cast("long"))).head().getLong(0) * 1000L
    for (i <- 1 to 2) {
      val tmp = root.resolve(s"sent$i")
      import s.implicits._
      Seq((-i.toLong, new java.sql.Timestamp(maxTsMs + SentinelOffsetMs + i * 60000L),
        -1L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, dataDir.resolve(s"zz-sentinel-$i.parquet"))
    }

    // strictly increasing mtimes in path order: range files first (already
    // event-time-ordered by name from repartitionByRange), then sentinels
    val base = System.currentTimeMillis()
    val files = Files.list(dataDir).filter(_.getFileName.toString.endsWith(".parquet"))
      .sorted().toArray.map(_.asInstanceOf[Path])
    files.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(base + i * 2000L))
    }
    Staged(root, dataDir.toString)
  }

  /** Run an append-mode streaming DataFrame to completion into a parquet file
    * sink under `root`, and read the result back as a batch DataFrame.
    */
  def runToParquet(s: SparkSession, stream: DataFrame, root: Path): DataFrame = {
    val sink = root.resolve("sink").toString
    val q = stream.writeStream.outputMode("append").format("parquet")
      .option("path", sink)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(sink)
  }
}
