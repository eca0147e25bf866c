package graft.table

import graft.functions.CellEncode
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order clustering + manifest-stats file skipping — the storage-layout
  * half of Iceberg, from scratch on top of [[Snapshots]].
  *
  * A bbox query over an unclustered corpus reads every file: row order is
  * random, so every parquet footer spans the whole world and no stat can
  * exclude anything. Clustering the write on the Morton z-curve (the quadkey
  * cell IS a z-value — `(1<<2z)|morton(x,y)`, QuadKey.scala) makes each file
  * cover a compact spatial rectangle, and the per-file extents that
  * [[Snapshots]] already records from the parquet footers become a data-
  * skipping index: a bbox read consults the manifest (O(files), no data I/O)
  * and opens only the files whose recorded extent intersects the box. This is
  * Delta/Iceberg `OPTIMIZE ZORDER BY` + manifest min/max pruning (public
  * techniques: Morton 1966; the Iceberg spec's manifest stats), rebuilt on
  * the engine's own snapshot layer — at 100 TB it is the difference between
  * a spatial scan reading the corpus and reading the touched tiles.
  */
object ZOrder {

  /** Write `df` clustered on the z-curve of (lat, lon): range-partition by
    * the codegen'd quadkey Morton value (one sampling pass — Spark's
    * RangePartitioner — then one shuffle), sort within partitions so row
    * groups are tight too, and snapshot with footer-derived per-file extents.
    * `zoom` sets curve granularity (12 → 4096² grid, sub-file-size cells at
    * any realistic file count).
    */
  def writeClustered(df: DataFrame, path: String, stage: String, lat: Column, lon: Column,
                     zoom: Int = 12, partitions: Int = 0): Unit =
    Snapshots.write(cluster(df, lat, lon, zoom, partitions), path, stage)

  /** The clustering transformation alone (range-partition + in-partition sort
    * on the z-value), for callers that hand the result to their own snapshot
    * writer — e.g. a `Snapshots.resumable` stage whose output should be
    * prunable. Rows with null lat/lon get a null z-value and cluster
    * together at the front; they never match a bbox predicate, so pruning
    * stays sound.
    */
  def cluster(df: DataFrame, lat: Column, lon: Column,
              zoom: Int = 12, partitions: Int = 0): DataFrame = {
    val z = CellEncode(lat, lon, zoom)
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, z).sortWithinPartitions(z)
  }

  /** Manifest-pruned bbox read: open only files whose recorded extent
    * intersects [minLon,maxLon]×[minLat,maxLat], then apply the exact
    * intersection filter. Pruning is CORRECT for any layout (per-file bounds
    * are true bounds; a file with no extent stat — stats-less or
    * NaN-poisoned footers — is read conservatively, a 0-row file is skipped)
    * and EFFECTIVE for clustered ones. Manifest parsing is
    * [[Snapshots.readManifest]], the same parser completeness checking uses.
    * Returns (rows, filesRead, filesTotal) so callers can assert
    * effectiveness.
    */
  def readBbox(spark: SparkSession, path: String,
               minLon: Double, minLat: Double, maxLon: Double, maxLat: Double)
      : (DataFrame, Int, Int) = {
    val entries = Snapshots.readManifest(spark, path).getOrElse(
      throw new IllegalStateException(s"no readable snapshot manifest under $path"))
    val keep = entries.filter { f =>
      f.rows > 0 && f.extent.forall { case (lo0, la0, lo1, la1) =>
        lo1 >= minLon && lo0 <= maxLon && la1 >= minLat && la0 <= maxLat
      }
    }.map(f => s"$path/${f.name}")
    val pred =
      col("max_lon") >= minLon && col("min_lon") <= maxLon &&
        col("max_lat") >= minLat && col("min_lat") <= maxLat
    // zero intersecting files still needs a schema: read the snapshot root —
    // the filter returns empty by the same bounds argument
    val df = if (keep.isEmpty) spark.read.parquet(path) else spark.read.parquet(keep: _*)
    (df.filter(pred), keep.size, entries.size)
  }
}
