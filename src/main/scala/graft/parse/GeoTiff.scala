package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import graft.geo.Extent

/** GeoTIFF tag reader — extent from ModelTiepoint+ModelPixelScale (or the
  * affine ModelTransformation), CRS from the GeoKey directory, temporal from
  * TIFFTAG_DATETIME; no pixel data is touched (the reference reads these
  * through GDAL, handle_raster.py — bbox via the geotransform, tbox via the
  * TIFFTAG_DATETIME → ACQUISITIONDATETIME chain the engine's RasterHeader
  * already models over struct fixtures).
  */
object GeoTiff {

  final case class TifResult(extent: Option[Extent], width: Int, height: Int,
                             epsg: Option[Int], datetime: Option[String])

  def readTiff(bytes: Array[Byte]): Option[TifResult] =
    // malformed-input contract: declared counts/value offsets outside the
    // buffer fail the row (None), never the task
    try readTiffImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def readTiffImpl(bytes: Array[Byte]): Option[TifResult] = {
    if (bytes.length < 8) return None
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => return None
    }
    val bb = ByteBuffer.wrap(bytes).order(order)
    if ((bb.getShort(2) & 0xffff) != 42) return None
    val ifd = bb.getInt(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = bb.getShort(ifd) & 0xffff
    var width = 0; var height = 0
    var scale: Array[Double] = null
    var tiepoint: Array[Double] = null
    var transform: Array[Double] = null
    var geoKeys: Array[Int] = null
    var geoAscii: String = ""
    var datetime: Option[String] = None
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      val tag = bb.getShort(e) & 0xffff
      val typ = bb.getShort(e + 2) & 0xffff
      val cnt = bb.getInt(e + 4)
      def valueOff = if (sizeOf(typ) * cnt <= 4) e + 8 else bb.getInt(e + 8)
      def shortOrLong: Int = if (typ == 3) bb.getShort(e + 8) & 0xffff else bb.getInt(e + 8)
      def doubles: Array[Double] = {
        val off = valueOff
        Array.tabulate(cnt)(k => bb.getDouble(off + 8 * k))
      }
      def shorts: Array[Int] = {
        val off = valueOff
        Array.tabulate(cnt)(k => bb.getShort(off + 2 * k) & 0xffff)
      }
      tag match {
        case 256 => width = shortOrLong
        case 257 => height = shortOrLong
        case 306 if typ == 2 => // DateTime, ASCII "YYYY:MM:DD HH:MM:SS"
          val off = valueOff
          val len = math.max(0, cnt - 1)
          datetime = Some(new String(bytes, off, len, "US-ASCII").trim)
        case 33550 => scale = doubles
        case 33922 => tiepoint = doubles
        case 34264 => transform = doubles
        case 34735 => geoKeys = shorts
        case 34737 if typ == 2 =>
          geoAscii = new String(bytes, valueOff, math.max(0, cnt - 1), "US-ASCII")
        case _ => ()
      }
      i += 1
    }
    val extent =
      if (tiepoint != null && tiepoint.length >= 6 && scale != null && scale.length >= 2 &&
        width > 0 && height > 0 && scale(0) != 0 && scale(1) != 0) {
        val minX = tiepoint(3) - tiepoint(0) * scale(0)
        val maxY = tiepoint(4) + tiepoint(1) * scale(1)
        Some(Extent(minX, maxY - height * scale(1), minX + width * scale(0), maxY))
      } else if (transform != null && transform.length >= 16 && width > 0 && height > 0) {
        // affine: x = t0*c + t1*r + t3 ; y = t4*c + t5*r + t7 — envelope of corners
        val xs = for (c <- Seq(0.0, width.toDouble); r <- Seq(0.0, height.toDouble))
          yield transform(0) * c + transform(1) * r + transform(3)
        val ys = for (c <- Seq(0.0, width.toDouble); r <- Seq(0.0, height.toDouble))
          yield transform(4) * c + transform(5) * r + transform(7)
        Some(Extent(xs.min, ys.min, xs.max, ys.max))
      } else None
    // GeoKey directory: header (4 shorts) + keys of 4 shorts each;
    // 2048 = GeographicTypeGeoKey, 3072 = ProjectedCSTypeGeoKey
    val epsg = {
      val keys = Option(geoKeys).toSeq
        .flatMap(_.drop(4).grouped(4).filter(_.length == 4).toSeq)
      // 32767 = user-defined: resolve named UTM CRSs from the ASCII citation
      // (e.g. "PCS Name = ETRS_1989_UTM_Zone_32N|…" → 25832)
      def resolve(v: Int): Option[Int] = v match {
        case 32767 =>
          "UTM[ _]?ZONE[ _]?(\\d{1,2})\\s*([NS])".r
            .findFirstMatchIn(geoAscii.toUpperCase).map { m =>
              val zone = m.group(1).toInt
              if (geoAscii.toUpperCase.contains("ETRS")) 25800 + zone
              else if (m.group(2) == "S") 32700 + zone
              else 32600 + zone
            }
        case v2 => Some(v2)
      }
      // an unresolvable projected key falls back to the geographic key —
      // GDAL likewise consults every key it can use
      keys.collectFirst { case Array(3072, 0, _, v) => v }.flatMap(resolve)
        .orElse(keys.collectFirst { case Array(2048, 0, _, v) => v }.flatMap(resolve))
    }
    Some(TifResult(extent, width, height, epsg, datetime))
  }

  private def sizeOf(typ: Int): Int = typ match {
    case 1 | 2 | 6 | 7 => 1
    case 3 | 8 => 2
    case 4 | 9 | 11 => 4
    case 5 | 10 | 12 => 8
    case _ => 1
  }

  /** TIFFTAG_DATETIME "YYYY:MM:DD HH:MM:SS" → ISO date (reference tbox). */
  def datetimeToIso(dt: String): Option[String] = {
    val m = "^(\\d{4}):(\\d{2}):(\\d{2})".r.findFirstMatchIn(dt.trim)
    m.flatMap { g =>
      try Some(java.time.LocalDate.of(g.group(1).toInt, g.group(2).toInt, g.group(3).toInt).toString)
      catch { case _: Exception => None }
    }
  }
}
