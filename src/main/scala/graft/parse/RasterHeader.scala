package graft.parse

import graft.geo.{Extent, Geo}

/** Raster-header kernels over (geotransform, width, height, crs) structs.
  *
  * The corpus carries raster *headers* as typed struct fixtures (never pixels —
  * the reference also only reads headers, geoextent/lib/handle_raster.py:181-341).
  *
  * Corner math per reference: geoextent/lib/handle_raster.py:99-106:
  *   min_x = gt0 ;  min_y = gt3 + w·gt4 + h·gt5
  *   max_x = gt0 + w·gt1 + h·gt2 ;  max_y = gt3
  * CRS: EPSG:4326 identity or EPSG:3857 exact inverse-mercator; ungeoreferenced
  * rasters pass only if plausibly WGS84 (reference: handle_raster.py:136-174).
  */
object RasterHeader {

  def extent(gt: Array[Double], width: Long, height: Long, epsg: Int): Option[Extent] = {
    if (gt == null || gt.length < 6) return None
    val minX = gt(0)
    val maxY = gt(3)
    val maxX = gt(0) + width * gt(1) + height * gt(2)
    val minY = gt(3) + width * gt(4) + height * gt(5)
    val raw = Extent(math.min(minX, maxX), math.min(minY, maxY), math.max(minX, maxX), math.max(minY, maxY))
    epsg match {
      case 4326 => Some(raw).filter(Geo.plausibleWgs84)
      case 3857 => Some(Geo.extentFromMercator(raw)).filter(Geo.plausibleWgs84)
      case 0 => Some(raw).filter(Geo.plausibleWgs84) // assume-wgs84 gate
      case _ => None
    }
  }

  /** Temporal priority chain (reference: geoextent/lib/handle_raster.py:344-398):
    * NetCDF CF time#units → ACDD time_coverage_start/end → TIFFTAG_DATETIME
    * ("%Y:%m:%d %H:%M:%S") → band ACQUISITIONDATETIME.
    */
  def tbox(timeUnits: String, timeValues: Array[Double],
           acddStart: String, acddEnd: String,
           tifftagDatetime: String, acquisitionDatetimes: Array[String]): Option[(String, String)] = {
    cfTime(timeUnits, timeValues)
      .orElse(acdd(acddStart, acddEnd))
      .orElse(tifftag(tifftagDatetime))
      .orElse(acquisition(acquisitionDatetimes))
  }

  /** CF "days|hours|minutes|seconds since <ref>" + offsets list → min/max dates
    * (reference: handle_raster.py:181-262).
    */
  def cfTime(units: String, values: Array[Double]): Option[(String, String)] = {
    if (units == null || values == null || values.isEmpty) return None
    val m = "(?i)^\\s*(days?|hours?|minutes?|seconds?)\\s+since\\s+(.+)$".r.findFirstMatchIn(units)
    m.flatMap { mm =>
      val unit = mm.group(1).toLowerCase
      val refStr = mm.group(2).trim
      DateGuess.parseOne(refStr.take(10)).map { refDate =>
        val perDay = unit match {
          case u if u.startsWith("day") => 1.0
          case u if u.startsWith("hour") => 24.0
          case u if u.startsWith("minute") => 1440.0
          case _ => 86400.0
        }
        val days = values.map(v => math.floor(v / perDay).toLong)
        (refDate.plusDays(days.min).toString, refDate.plusDays(days.max).toString)
      }
    }
  }

  def acdd(start: String, end: String): Option[(String, String)] =
    for {
      s <- Option(start).filter(_.nonEmpty).flatMap(v => DateGuess.parseOne(v.take(10)))
      e <- Option(end).filter(_.nonEmpty).flatMap(v => DateGuess.parseOne(v.take(10)))
    } yield (s.toString, e.toString)

  /** "%Y:%m:%d %H:%M:%S" (reference: handle_raster.py:310-341). */
  def tifftag(v: String): Option[(String, String)] = {
    if (v == null || v.isEmpty) return None
    "^(\\d{4}):(\\d{2}):(\\d{2})".r.findFirstMatchIn(v.trim).flatMap { m =>
      try {
        val d = java.time.LocalDate.of(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt).toString
        Some((d, d))
      } catch { case _: Exception => None }
    }
  }

  def acquisition(vs: Array[String]): Option[(String, String)] = {
    if (vs == null || vs.isEmpty) return None
    val dates = vs.flatMap(v => DateGuess.parseOne(v.take(10).replace(':', '-')))
    if (dates.isEmpty) None else Some((dates.min.toString, dates.max.toString))
  }
}
