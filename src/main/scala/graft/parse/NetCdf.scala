package graft.parse

import graft.geo.{Extent, Geo}

/** NetCDF-4 (HDF5 container) extent + temporal extraction on top of [[Hdf5]].
  *
  * Reproduces the reference's NetCDF semantics (geoextent/lib/handle_raster.py,
  * goldens in tests/test_api.py:34-39 and tests/test_raster_temporal.py):
  *
  *   - bbox: the lat/lon coordinate VARIABLES (units `degrees_north`/
  *     `degrees_east`, standard_name, or canonical names) hold cell-center
  *     arrays; the envelope pads a half step on each side — the same
  *     convention the Zarr reader implements (GDAL's netCDF geotransform).
  *   - crs: a `spatial_ref`/`crs` grid-mapping variable carrying a WKT with
  *     a final EPSG authority, a `latitude_longitude` grid mapping, or the
  *     WGS84-plausibility gate.
  *   - tbox: CF `time#units` ("days|hours|minutes|seconds since <ref>") over
  *     the time variable's values (NaNs skipped) with priority over the
  *     ACDD `time_coverage_start/end` global attributes; start-only ACDD
  *     degenerates to [start, start]; invalid CF units fall through to ACDD.
  *     All via the already-golden [[RasterHeader]] chain.
  */
object NetCdf {

  final case class NcResult(extent: Option[Extent], crs: String,
                            tbox: Option[(String, String)],
                            width: Int, height: Int)

  def read(bytes: Array[Byte]): Option[NcResult] =
    Hdf5.read(bytes).map(interpret)

  def interpret(f: Hdf5.H5File): NcResult = {
    def isLat(v: Hdf5.H5Var): Boolean =
      v.attrs.get("units").exists(_.startsWith("degrees_north")) ||
        v.attrs.get("standard_name").contains("latitude") ||
        v.name.toLowerCase == "lat" || v.name.toLowerCase == "latitude"
    def isLon(v: Hdf5.H5Var): Boolean =
      v.attrs.get("units").exists(_.startsWith("degrees_east")) ||
        v.attrs.get("standard_name").contains("longitude") ||
        v.name.toLowerCase == "lon" || v.name.toLowerCase == "longitude"
    val lat = f.vars.find(isLat).flatMap(_.data).filter(_.nonEmpty)
    val lon = f.vars.find(isLon).flatMap(_.data).filter(_.nonEmpty)
    def halfStep(a: Array[Double]): Double =
      if (a.length > 1) math.abs(a(1) - a(0)) / 2 else 0.0
    val rawExtent = for (la <- lat; lo <- lon) yield
      Extent(lo.min - halfStep(lo), la.min - halfStep(la),
        lo.max + halfStep(lo), la.max + halfStep(la))

    // CRS: last EPSG authority in a grid-mapping WKT, or latitude_longitude
    val epsgRe = "AUTHORITY\\[\"EPSG\",\"(\\d+)\"\\]".r
    val crsVar = f.vars.find(v =>
      v.attrs.contains("spatial_ref") || v.attrs.contains("grid_mapping_name"))
    val epsg: Option[Int] =
      crsVar.flatMap(_.attrs.get("spatial_ref"))
        .flatMap(w => epsgRe.findAllMatchIn(w).map(_.group(1).toInt).toSeq.lastOption)
        .orElse(crsVar.flatMap(_.attrs.get("grid_mapping_name"))
          .filter(_ == "latitude_longitude").map(_ => 4326))

    val (extent, crs) = (rawExtent, epsg) match {
      case (Some(e), Some(4326)) => (Some(e).filter(Geo.plausibleWgs84), "4326")
      case (Some(e), Some(3857)) => (Some(Geo.mercExtentToWgs84(e)).filter(Geo.plausibleWgs84), "4326")
      case (Some(e), Some(code)) => Geo.utmExtentToWgs84(code, e) match {
        case Some(t) => (Some(t).filter(Geo.plausibleWgs84), "4326")
        case None => (None, code.toString)
      }
      case (Some(e), None) =>
        if (Geo.plausibleWgs84(e)) (Some(e), "4326") else (None, "unknown")
      case _ => (None, "unknown")
    }

    // temporal: CF time variable first, then ACDD (start-only → [s, s])
    val timeVar = f.vars.find(v =>
      v.attrs.get("units").exists(_.toLowerCase.contains(" since ")) ||
        (v.name.toLowerCase == "time" && v.attrs.contains("units")))
    val cf = timeVar.flatMap { tv =>
      val vals = tv.data.getOrElse(Array.empty).filterNot(_.isNaN)
      RasterHeader.cfTime(tv.attrs.getOrElse("units", ""), vals)
    }
    val acddStart = f.rootAttrs.get("time_coverage_start").getOrElse("")
    val acddEnd = f.rootAttrs.get("time_coverage_end")
      .orElse(f.rootAttrs.get("time_coverage_start")).getOrElse("")
    val tbox = cf.orElse(RasterHeader.acdd(acddStart, acddEnd))

    NcResult(extent, crs, tbox, lon.map(_.length).getOrElse(0), lat.map(_.length).getOrElse(0))
  }
}
