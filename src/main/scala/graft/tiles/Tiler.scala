package graft.tiles

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cells.QuadKey
import graft.geo.Extent

/** Raster↔vector quadkey tiler (north_rule: per-extent quadkey cover, per-tile
  * extent merge → tile assignments as join-output rows).
  *
  * `cover` is a generator-style array UDF + `explode` (SURVEY §2.7 — no custom
  * Generator class needed); the per-tile merge is a plain partial+final hash
  * aggregation, so the tiler is two narrow stages + one shuffle on the tile id.
  */
object Tiler {

  val coverUdf = udf((minLon: Double, minLat: Double, maxLon: Double, maxLat: Double, z: Int) =>
    QuadKey.cover(Extent(minLon, minLat, maxLon, maxLat), z))

  /** Codegen cover — same values as [[coverUdf]] (CellCover property-tests
    * against it), but stays inside whole-stage codegen and emits the cell
    * array without per-cell boxing. Preferred on hot paths.
    */
  def cover(minLon: org.apache.spark.sql.Column, minLat: org.apache.spark.sql.Column,
            maxLon: org.apache.spark.sql.Column, maxLat: org.apache.spark.sql.Column,
            zoom: Int): org.apache.spark.sql.Column =
    graft.functions.CellCover(minLon, minLat, maxLon, maxLat, zoom)

  val txUdf = udf((cell: Long) => QuadKey.decodeX(cell))
  val tyUdf = udf((cell: Long) => QuadKey.decodeY(cell))

  /** extents(d, min_lon, min_lat, max_lon, max_lat) → one row per (tile, page),
    * with tile coords materialized.
    */
  def tileAssignments(extents: DataFrame, zoom: Int): DataFrame =
    extents
      .filter(col("min_lon").isNotNull)
      .withColumn("tile", explode(cover(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"), zoom)))
      .withColumn("tx", txUdf(col("tile")))
      .withColumn("ty", tyUdf(col("tile")))

  /** Per-tile rollup: page count + merged extent (clipped nothing — the merge is
    * the envelope of member extents, matching R1 semantics per tile).
    */
  def tileSummaries(extents: DataFrame, zoom: Int): DataFrame =
    tileAssignments(extents, zoom)
      .groupBy("tx", "ty")
      .agg(count(lit(1)).as("cnt"),
        min("min_lon").as("min_lon"), min("min_lat").as("min_lat"),
        max("max_lon").as("max_lon"), max("max_lat").as("max_lat"))
}
