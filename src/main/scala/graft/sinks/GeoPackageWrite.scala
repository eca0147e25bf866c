package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}

import graft.geo.{Extent, Wkt}

/** GeoPackage WRITER — the reference's gpkg export re-expressed on the
  * from-scratch SQLite writer (reference: create_geopackage,
  * geoextent/lib/helpfunctions.py:1268-1301, which delegates to OGR's GPKG
  * driver): one `files` feature layer (POLYGON, EPSG:4326) with the
  * reference's exact attribute schema — filename, handler, format, tbox,
  * crs — plus the three mandatory GeoPackage system tables. Geometries are
  * standard GPB blobs (envelope indicator 1, little-endian) wrapping the
  * engine's own WKB layouts.
  *
  * Like the reference's export, this is a driver-side summary sink: the
  * input is the final extraction summary (one row per input file), small by
  * construction — NOT a corpus-scale path (a 100 TB corpus's per-page
  * extents leave via parquet/WKB sinks; the .gpkg is the human-facing
  * artifact of a run). `write` enforces that contract with a row cap.
  */
object GeoPackageWrite {

  /** GeoPackage application id "GPKG" and 1.2 user version. */
  private val AppId = 0x47504B47
  private val UserVersion = 10200

  final case class Feature(filename: String, extent: Option[Extent],
                           handler: String, format: String,
                           tbox: Option[(String, String)], crs: String)

  /** GPB geometry blob: magic GP, version 0, flags 0x03 (little-endian,
    * envelope [minx maxx miny maxy]), srs 4326, envelope, WKB body.
    */
  def gpbBlob(e: Extent, srsId: Int = 4326): Array[Byte] = {
    val wkb = Wkt.extentToWkbBytes(e)
    val bb = ByteBuffer.allocate(8 + 32 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0x03.toByte)
    bb.putInt(srsId)
    bb.putDouble(e.minLon); bb.putDouble(e.maxLon)
    bb.putDouble(e.minLat); bb.putDouble(e.maxLat)
    bb.put(wkb)
    bb.array()
  }

  /** Build the complete .gpkg file image. `lastChange` is the ISO timestamp
    * stamped into gpkg_contents (passed in, never read from a clock — the
    * output must be byte-deterministic for a given input).
    */
  def buildGpkg(features: Seq[Feature], lastChange: String): Array[Byte] = {
    val withGeom = features.filter(_.extent.isDefined)
    val env = withGeom.flatMap(_.extent).reduceOption(_ merge _)

    val srs = SqliteWrite.Table("gpkg_spatial_ref_sys",
      """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)""",
      Seq(
        Array[Any]("Undefined cartesian SRS", null, "NONE", -1L, "undefined", null),
        Array[Any]("Undefined geographic SRS", null, "NONE", 0L, "undefined", null),
        Array[Any]("WGS 84 geodetic", null, "EPSG", 4326L,
          """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]""",
          "longitude/latitude coordinates in decimal degrees on the WGS 84 spheroid")),
      // srs_id is the INTEGER PRIMARY KEY → rowid
      rowids = Some(Seq(-1L, 0L, 4326L)))

    val contents = SqliteWrite.Table("gpkg_contents",
      """CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', last_change DATETIME NOT NULL, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""",
      Seq(Array[Any]("files", "features", "files", "", lastChange,
        env.map(_.minLon).orNull, env.map(_.minLat).orNull,
        env.map(_.maxLon).orNull, env.map(_.maxLat).orNull, 4326L)))

    val geomCols = SqliteWrite.Table("gpkg_geometry_columns",
      """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""",
      Seq(Array[Any]("files", "geom", "POLYGON", 4326L, 0L, 0L)))

    val files = SqliteWrite.Table("files",
      """CREATE TABLE files (fid INTEGER PRIMARY KEY, geom POLYGON, filename TEXT, handler TEXT, format TEXT, tbox TEXT, crs TEXT)""",
      features.map { f =>
        Array[Any](null, // fid = rowid
          f.extent.map(e => gpbBlob(e)).orNull,
          f.filename, f.handler, f.format,
          f.tbox.map { case (a, b) => s"$a/$b" }.orNull,
          f.crs)
      })

    SqliteWrite.build(Seq(srs, contents, geomCols, files), AppId, UserVersion)
  }

  /** Write a summary DataFrame (columns: filename, handler, format,
    * tbox_start, tbox_end, crs, min_lon, min_lat, max_lon, max_lat) to a
    * .gpkg file. Driver-side by design (see class doc); `maxRows` guards
    * against accidentally pointing it at a corpus.
    */
  def write(df: DataFrame, path: String, lastChange: String,
            maxRows: Int = 1000000): Unit = {
    val cols = Seq("filename", "handler", "format", "tbox_start", "tbox_end",
      "crs", "min_lon", "min_lat", "max_lon", "max_lat")
    val rows = df.selectExpr(cols: _*).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"GeoPackage sink is a summary artifact; got > $maxRows rows — write parquet instead")
    def str(r: Row, i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
    def dbl(r: Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val feats = rows.map { r =>
      val ext = for (a <- dbl(r, 6); b <- dbl(r, 7); c <- dbl(r, 8); d <- dbl(r, 9))
        yield Extent(a, b, c, d)
      val tb = (Option(str(r, 3)), Option(str(r, 4))) match {
        case (Some(a), Some(b)) => Some((a, b))
        case _ => None
      }
      Feature(str(r, 0), ext, str(r, 1), str(r, 2), tb, str(r, 5))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buildGpkg(feats.toSeq, lastChange))
  }
}
