package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Resumable end-to-end pipeline main (north_rule: "resumable from checkpoint
  * with per-partition lineage + metrics").
  *
  * Stages: synthesize/ingest pages → extract (snapshot) → merge (snapshot) →
  * PIP join (snapshot) → tile rollup (snapshot). Each stage writes a Parquet
  * snapshot with a `_graft_manifest.json` (total + per-partition row counts);
  * re-running the main after a kill resumes from the last complete snapshot
  * instead of recomputing upstream stages.
  *
  * Usage: runMain graft.Pipeline <sfDir> <workDir>
  */
object Pipeline {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, workDir)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, workDir: String): Unit = {
    import table.Snapshots.resumable

    // z-order the s1 snapshot on the extent centroid: the stage's manifest
    // then carries tight per-file extents (table.ZOrder), so any later bbox
    // consumer can skip most files from the manifest alone; null-extent rows
    // cluster together and never match a bbox predicate. The raw extract is
    // persisted for the duration of the stage because repartitionByRange runs
    // a SAMPLING job before the shuffle — uncached, the extraction kernel
    // (the pipeline's dominant cost) would execute twice.
    var rawExtract: org.apache.spark.sql.DataFrame = null
    val extracted =
      try resumable(spark, s"$workDir/s1_extracted", "extract") {
        rawExtract = operators.Extractor.extract(table.Pages.pages(spark, sfDir)).toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        table.ZOrder.cluster(rawExtract,
          (col("min_lat") + col("max_lat")) / 2, (col("min_lon") + col("max_lon")) / 2)
      } finally if (rawExtract != null) rawExtract.unpersist()

    val merged = resumable(spark, s"$workDir/s2_merged", "bbox_tbox_merge") {
      // tbox via the typed Aggregator: signed-ISO deep-time strings mis-order
      // under plain lexicographic min/max (R3 semantics, same as q05)
      extracted.filter(col("min_lon").isNotNull)
        .groupBy((col("d") % 97).as("g"))
        .agg(count(lit(1)).as("n_ext"),
          min("min_lon").as("min_lon"), min("min_lat").as("min_lat"),
          max("max_lon").as("max_lon"), max("max_lat").as("max_lat"),
          agg.Aggregators.tboxMerge(col("tbox_start"), col("tbox_end")).as("tm"))
        .select(col("g"), col("n_ext"), col("min_lon"), col("min_lat"),
          col("max_lon"), col("max_lat"),
          col("tm.tbox_start").as("tbox_start"), col("tm.tbox_end").as("tbox_end"))
    }

    val pip = resumable(spark, s"$workDir/s3_pip", "pip_join") {
      val pts = extracted.filter(col("min_lon").isNotNull && col("cell").isNotNull)
        .withColumn("lon", (col("min_lon") + col("max_lon")) / 2)
        .withColumn("lat", (col("min_lat") + col("max_lat")) / 2)
        .select(col("d").as("doc_id"), col("lon"), col("lat"), col("cell"))
      join.SpatialJoins.pipJoin(pts, table.Pages.polygons(spark, sfDir))
        .select("doc_id", "poly_id")
    }

    val tilesOut = resumable(spark, s"$workDir/s4_tiles", "tile_rollup") {
      graft.tiles.Tiler.tileSummaries(extracted, table.Pages.TileZoom)
    }

    println(s"""{"pipeline":"complete","extracted":${extracted.count()},"merged":${merged.count()},""" +
      s""""pip_pairs":${pip.count()},"tiles":${tilesOut.count()}}""")
  }
}
