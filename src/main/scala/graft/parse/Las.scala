package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import graft.geo.{Extent, Geo}

/** LAS point-cloud header reader (ASPRS LAS 1.x) — the reference reads these
  * with laspy, header-only (handle_pointcloud.py: bbox from the header
  * min/max, tbox from the header creation year/day-of-year — the same
  * semantics the engine's PointCloudTable models). CRS: without parsing VLR
  * GeoTIFF keys, the reference's own fallback applies — coordinates inside
  * WGS84 bounds are assumed 4326 (test_api_pointcloud.py::test_las_no_crs).
  */
object Las {

  final case class LasResult(extent: Extent, minZ: Double, maxZ: Double,
                             nPoints: Long, tbox: Option[(String, String)], crs: String)

  def readLas(bytes: Array[Byte]): Option[LasResult] = {
    if (bytes.length < 227) return None
    if (!(bytes(0) == 'L' && bytes(1) == 'A' && bytes(2) == 'S' && bytes(3) == 'F')) return None
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val doy = le.getShort(90) & 0xffff
    val year = le.getShort(92) & 0xffff
    val legacy = le.getInt(107).toLong & 0xffffffffL
    // LAS 1.4 moves the real count to a 64-bit field at 247 (legacy often 0)
    val nPoints =
      if (legacy == 0 && (bytes(25) & 0xff) >= 4 && bytes.length >= 255) le.getLong(247)
      else legacy
    // header max/min are real (already scaled+offset) coordinates:
    // maxX minX maxY minY maxZ minZ as doubles from offset 179
    val maxX = le.getDouble(179); val minX = le.getDouble(187)
    val maxY = le.getDouble(195); val minY = le.getDouble(203)
    val maxZ = le.getDouble(211); val minZ = le.getDouble(219)
    val ext = Extent(minX, minY, maxX, maxY)
    val tbox =
      if (year >= 1990 && year <= 2100 && doy >= 1 && doy <= 366) {
        val d = java.time.LocalDate.ofYearDay(year, doy).toString
        Some((d, d))
      } else None
    val crs = if (Geo.plausibleWgs84(ext)) "4326" else "unknown"
    Some(LasResult(ext, minZ, maxZ, nPoints, tbox, crs))
  }
}
