package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-cloud header fixture table (SURVEY §2 S5/P6/P12): LAS-style headers
  * reduced to typed structs — coordinate mins/maxs, CRS, creation year/day —
  * matching the reference's header-only reads
  * (reference: geoextent/lib/handle_pointcloud.py:58-150, tbox 153-207; the
  * reference never loads points, only `header.mins/maxs`). Synthesized in
  * closed form from `supplier` for the DuckDB oracle.
  */
object PointCloudTable {

  def headers(spark: SparkSession, sfDir: String): DataFrame = {
    val s = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").cast("long").as("k"))
    s.select(
      col("k").as("cloud_id"),
      ((col("k") * 17 % 320) - 160).cast("double").as("min_x"),
      ((col("k") * 19 % 150) - 75).cast("double").as("min_y"),
      (((col("k") * 17 % 320) - 160) + (col("k") % 4 + 1)).cast("double").as("max_x"),
      (((col("k") * 19 % 150) - 75) + (col("k") % 3 + 1)).cast("double").as("max_y"),
      lit(4326).as("epsg"),
      // LAS header creation year/day-of-year; the reference guards against
      // laspy's default 0/0 (reference: handle_pointcloud.py:153-207) —
      // modeled as every 10th header missing its date
      when(col("k") % 10 =!= 0, (lit(2018) + col("k") % 5).cast("int")).as("create_year"),
      when(col("k") % 10 =!= 0, (col("k") % 300 + 1).cast("int")).as("create_doy"))
  }

  /** Extent from header mins/maxs with the WGS84 plausibility gate
    * (reference: handle_pointcloud.py:58-150).
    */
  def extents(headers: DataFrame): DataFrame =
    headers.select(
        col("cloud_id"),
        col("min_x").as("min_lon"), col("min_y").as("min_lat"),
        col("max_x").as("max_lon"), col("max_y").as("max_lat"))
      .filter(col("min_lon") >= -180 && col("max_lon") <= 180 &&
        col("min_lat") >= -90 && col("max_lat") <= 90)

  /** TBox from LAS creation (year, day-of-year); 0/absent year → no tbox. */
  def tboxes(headers: DataFrame): DataFrame =
    headers.filter(col("create_year").isNotNull && col("create_doy").isNotNull)
      .select(col("cloud_id"),
        date_format(date_add(
          to_date(concat(col("create_year"), lit("-01-01"))), col("create_doy") - 1), "yyyy-MM-dd").as("tbox_start"))
      .withColumn("tbox_end", col("tbox_start"))
}
