package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Iceberg-style snapshot checkpointing emulated over Parquet (no Iceberg jar in
  * /opt/spark/jars — SURVEY §4): a stage output is a Parquet directory plus a
  * `_graft_manifest.json` with per-partition row counts + extent metrics
  * (north_rule: "resumable from checkpoint with per-partition lineage +
  * metrics"). A snapshot is complete iff the manifest exists and row counts
  * match; `resumable` replays from the snapshot instead of recomputing.
  */
object Snapshots {

  final case class PartStat(partition: Int, rows: Long)

  def write(df: DataFrame, path: String, stage: String): Unit = {
    val out = df.cache()
    out.write.mode("overwrite").parquet(path)
    // per-partition lineage: row counts always; extent metrics whenever the
    // stage carries bbox columns (min/max per partition — the Iceberg
    // column-stats analog, enabling partition pruning decisions on resume)
    val hasExtent = Seq("min_lon", "min_lat", "max_lon", "max_lat").forall(out.columns.contains)
    val parts =
      if (hasExtent)
        out.groupBy(spark_partition_id().as("partition")).agg(count(lit(1)).as("rows"),
            min("min_lon"), min("min_lat"), max("max_lon"), max("max_lat"))
          .collect().map(r =>
            s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)},""" +
              s""""extent":[${r.get(2)},${r.get(3)},${r.get(4)},${r.get(5)}]}""")
      else
        out.groupBy(spark_partition_id().as("partition")).agg(count(lit(1)).as("rows"))
          .collect().map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
    val total = out.count()
    out.unpersist()
    val cols = out.columns.map(c => "\"" + c + "\"").mkString(",")
    val manifest =
      s"""{"stage":"$stage","total_rows":$total,"columns":[$cols],"partitions":[${parts.mkString(",")}]}"""
    Files.writeString(Paths.get(path, "_graft_manifest.json"), manifest)
  }

  def isComplete(spark: SparkSession, path: String): Boolean = {
    val mf = Paths.get(path, "_graft_manifest.json")
    if (!Files.exists(mf)) return false
    try {
      val json = Files.readString(mf)
      val total = """"total_rows":(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
      total.exists(t => spark.read.parquet(path).count() == t)
    } catch { case _: Exception => false }
  }

  /** Run `compute` with snapshot resume: if a complete snapshot exists at
    * `path`, read it; otherwise compute, checkpoint, and return the snapshot
    * read (so downstream stages consume the durable copy — kill-and-restart
    * resumes here instead of recomputing upstream).
    */
  def resumable(spark: SparkSession, path: String, stage: String)(compute: => DataFrame): DataFrame = {
    if (isComplete(spark, path)) spark.read.parquet(path)
    else {
      write(compute, path, stage)
      spark.read.parquet(path)
    }
  }
}
