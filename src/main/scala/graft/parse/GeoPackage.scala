package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import graft.geo.{Extent, Wkt}

/** GeoPackage reader on the minimal SQLite parser: feature-table extent from
  * the actual geometries (GPB envelope, or WKB when the envelope flag is
  * absent) with the declared gpkg_contents box as fallback — matching the
  * reference's OGR layer-extent semantics (geoextent/lib/handle_vector.py)
  * rather than trusting the container's (rounded, possibly stale) declared
  * values. Temporal extent: the feature table's date-named columns through
  * the DateGuess ladder. Golden-tested against the reference's own .gpkg
  * fixtures (tests/test_api.py expectations).
  */
object GeoPackage {

  final case class GpkgResult(extent: Option[Extent], tbox: Option[(String, String)],
                              srsId: Long, table: String, nFeatures: Int)

  /** Envelope (or WKB-derived envelope) of one GeoPackage geometry blob. */
  def gpbEnvelope(blob: Array[Byte]): Option[Extent] = {
    if (blob == null || blob.length < 8 || blob(0) != 'G' || blob(1) != 'P') return None
    val flags = blob(3) & 0xff
    val envInd = (flags >> 1) & 0x7
    val little = (flags & 1) == 1
    val order = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(blob).order(order)
    if (envInd >= 1 && envInd <= 4) {
      // envelope: minx, maxx, miny, maxy (+ optional z/m ranges after)
      Some(Extent(bb.getDouble(8), bb.getDouble(24), bb.getDouble(16), bb.getDouble(32)))
    } else {
      // no envelope: the WKB starts right after the 8-byte GPB header
      Wkt.wkbEnvelope(java.util.Arrays.copyOfRange(blob, 8, blob.length))
    }
  }

  def read(bytes: Array[Byte]): Option[GpkgResult] =
    // malformed-input contract: corrupt cell pointers / record headers in the
    // B-tree walk fail the row (None), never the task
    try readImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def readImpl(bytes: Array[Byte]): Option[GpkgResult] = {
    SqliteRead.open(bytes).flatMap { db =>
      val tabs = SqliteRead.tables(db)
      for {
        (gcRoot, _) <- tabs.get("gpkg_contents")
        (ggRoot, _) <- tabs.get("gpkg_geometry_columns")
      } yield {
        // gpkg_contents: table_name, data_type, identifier, description,
        // last_change, min_x, min_y, max_x, max_y, srs_id
        val contents = SqliteRead.scanTable(db, gcRoot)
          .find(r => r(1) == "features")
        val declared = contents.flatMap { r =>
          (r(5), r(6), r(7), r(8)) match {
            case (a: Double, b: Double, c: Double, d: Double) => Some(Extent(a, b, c, d))
            case _ => None
          }
        }
        val srs = contents.map(r => r(9) match {
          case l: Long => l
          case d: Double => d.toLong
          case _ => 0L
        }).getOrElse(0L)
        val tableName = contents.map(_(0).asInstanceOf[String]).getOrElse("")
        // gpkg_geometry_columns: table_name, column_name, geometry_type_name, srs_id, z, m
        val geomCol = SqliteRead.scanTable(db, ggRoot)
          .find(_(0) == tableName).map(_(1).asInstanceOf[String])
        val featRow = tabs.get(tableName)
        val (computed, tbox, n) = featRow match {
          case Some((root, sql)) =>
            val cols = SqliteRead.columnNames(sql)
            val gIdx = geomCol.flatMap(g => cols.indexOf(g) match { case -1 => None; case i => Some(i) })
            val dateIdx = cols.zipWithIndex
              .filter { case (c, _) => CsvGeo.isDateColumnName(c) }.map(_._2)
            val rows = SqliteRead.scanTable(db, root)
            var ext: Option[Extent] = None
            val dates = Seq.newBuilder[java.time.LocalDate]
            for (row <- rows) {
              for (gi <- gIdx; if gi < row.length) row(gi) match {
                case blob: Array[Byte] =>
                  for (e <- gpbEnvelope(blob))
                    ext = Some(ext.fold(e)(_.merge(e)))
                case _ => ()
              }
              for (di <- dateIdx; if di < row.length) row(di) match {
                case s: String => DateGuess.parseOne(s).foreach(dates += _)
                case _ => ()
              }
            }
            val ds = dates.result()
            (ext, if (ds.isEmpty) None else Some((ds.min.toString, ds.max.toString)), rows.length)
          case None => (None, None, 0)
        }
        GpkgResult(computed.orElse(declared), tbox, srs, tableName, n)
      }
    }
  }
}
