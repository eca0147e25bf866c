package graft.streaming

import java.nio.file.{Files, Path}
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

  // staged replicas are full copies of the events table — cache them per
  // (source dir, slices) so q75+q76 in one Verify/Bench run stage ONCE, and
  // delete everything on JVM exit so repeated runs can't fill the host disk
  private val stagedCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Staged]()
  private val cleanupRoots =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())
  sys.addShutdownHook {
    cleanupRoots.forEach { root =>
      try deleteRecursively(root) catch { case _: Throwable => () }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = listDir(p)
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p); ()
  }

  private def listDir(p: Path): Seq[Path] = {
    val st = Files.list(p)
    try st.toArray.toSeq.map(_.asInstanceOf[Path]) finally st.close()
  }

  /** Stage `$dir/events.parquet` for ordered replay (cached per dir within
    * the JVM; removed on exit); see object doc.
    */
  def stageEventReplay(s: SparkSession, dir: String, slices: Int = 8): Staged =
    stagedCache.computeIfAbsent((dir, slices), { case (d, sl) => doStage(s, d, sl) })

  private def doStage(s: SparkSession, dir: String, slices: Int): Staged = {
    val root = Files.createTempDirectory("graft-replay")
    cleanupRoots.add(root)
    val dataDir = root.resolve("data")
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    ev.repartitionByRange(slices, col("ts"))
      .write.mode("overwrite").parquet(dataDir.toString)

    val maxRow = ev.agg(max(col("ts").cast("long"))).head()
    require(!maxRow.isNullAt(0), s"$dir/events.parquet is empty — nothing to replay")
    val maxTsMs = maxRow.getLong(0) * 1000L
    for (i <- 1 to 2) {
      val tmp = root.resolve(s"sent$i")
      import s.implicits._
      Seq((-i.toLong, new java.sql.Timestamp(maxTsMs + SentinelOffsetMs + i * 60000L),
        -1L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(tmp.toString)
      val part = listDir(tmp).find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, dataDir.resolve(s"zz-sentinel-$i.parquet"))
    }

    // strictly increasing mtimes in path order: range files first (already
    // event-time-ordered by name from repartitionByRange), then sentinels
    val base = System.currentTimeMillis()
    val files = listDir(dataDir)
      .filter(_.getFileName.toString.endsWith(".parquet")).sorted
    files.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(base + i * 2000L))
    }
    Staged(root, dataDir.toString)
  }

  /** Run an append-mode streaming DataFrame to completion into a parquet file
    * sink in a fresh subdirectory of `root` (so several queries can share one
    * staged replay), and read the result back as a batch DataFrame.
    */
  def runToParquet(s: SparkSession, stream: DataFrame, root: Path): DataFrame = {
    val runDir = Files.createTempDirectory(root, "run")
    val sink = runDir.resolve("sink").toString
    val q = stream.writeStream.outputMode("append").format("parquet")
      .option("path", sink)
      .option("checkpointLocation", runDir.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(sink)
  }
}
