package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster-header fixture table (SURVEY §2 S4/P5/P11): the engine's raster
  * sources are header structs — (geotransform, width, height, crs) plus the
  * temporal metadata fields — mirroring the reference's header-only reads
  * (reference: geoextent/lib/handle_raster.py:181-341, never pixels).
  * Synthesized in closed form from `part` so the DuckDB oracle can recompute
  * expected extents/tboxes; temporal mode m = p%4 exercises the 4-step
  * priority chain (CF → ACDD → TIFFTAG_DATETIME → ACQUISITIONDATETIME).
  */
object RasterTable {

  def rasters(spark: SparkSession, sfDir: String): DataFrame = {
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").cast("long").as("p"))
    p.select(
      col("p").as("raster_id"),
      ((col("p") * 11 % 300) - 150).cast("double").as("gt0"),
      lit(0.03125).as("gt1"), lit(0.0).as("gt2"),
      ((col("p") * 13 % 140) - 70).cast("double").as("gt3"),
      lit(0.0).as("gt4"), lit(-0.015625).as("gt5"),
      (lit(64) + (col("p") % 5) * 32).cast("long").as("width"),
      (lit(64) + (col("p") % 7) * 32).cast("long").as("height"),
      lit(4326).as("epsg"),
      (col("p") % 4).as("m"),
      when(col("p") % 4 === 0, lit("days since 2000-01-01")).as("time_units"),
      when(col("p") % 4 === 0,
        array((col("p") % 50).cast("double"), (col("p") % 50 + col("p") % 20).cast("double"))).as("time_values"),
      when(col("p") % 4 === 1,
        date_format(date_add(to_date(lit("2010-01-01")), (col("p") % 100).cast("int")), "yyyy-MM-dd")).as("acdd_start"),
      when(col("p") % 4 === 1,
        date_format(date_add(to_date(lit("2010-01-01")), (col("p") % 100 + 5).cast("int")), "yyyy-MM-dd")).as("acdd_end"),
      when(col("p") % 4 === 2,
        date_format(date_add(to_date(lit("2020-01-01")), (col("p") % 200).cast("int")), "yyyy:MM:dd HH:mm:ss")).as("tifftag_datetime"),
      when(col("p") % 4 === 3,
        array(date_format(date_add(to_date(lit("2021-01-01")), (col("p") % 30).cast("int")), "yyyy:MM:dd HH:mm:ss"))).as("acquisition_datetimes"))
  }

  /** Extent from header — pure column expressions, no UDF (SURVEY §2 P5:
    * "corner math … pure column expressions"). Corner formulas per
    * reference handle_raster.py:99-106, orientation-normalized.
    */
  def extents(rasters: DataFrame): DataFrame = {
    val maxX = col("gt0") + col("width") * col("gt1") + col("height") * col("gt2")
    val minY = col("gt3") + col("width") * col("gt4") + col("height") * col("gt5")
    rasters.select(
      col("raster_id"),
      least(col("gt0"), maxX).as("min_lon"),
      least(col("gt3"), minY).as("min_lat"),
      greatest(col("gt0"), maxX).as("max_lon"),
      greatest(col("gt3"), minY).as("max_lat"))
      // WGS84 plausibility gate (reference handle_raster.py:169-174)
      .filter(col("min_lon") >= -180 && col("max_lon") <= 180 &&
        col("min_lat") >= -90 && col("max_lat") <= 90)
  }

  /** TBox via the 4-step priority chain (reference handle_raster.py:344-398). */
  def tboxes(rasters: DataFrame): DataFrame = {
    val tboxUdf = udf((units: String, values: Seq[Double], as: String, ae: String,
                       tt: String, acq: Seq[String]) =>
      graft.parse.RasterHeader.tbox(units,
        if (values == null) null else values.toArray, as, ae, tt,
        if (acq == null) null else acq.toArray))
    rasters.select(col("raster_id"),
        tboxUdf(col("time_units"), col("time_values"), col("acdd_start"), col("acdd_end"),
          col("tifftag_datetime"), col("acquisition_datetimes")).as("tb"))
      .select(col("raster_id"), col("tb._1").as("tbox_start"), col("tb._2").as("tbox_end"))
      .filter(col("tbox_start").isNotNull)
  }
}
