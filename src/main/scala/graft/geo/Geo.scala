package graft.geo

/** Spatial extent in WGS84, GeoJSON-internal axis order (lon first).
  *
  * Mirrors the reference's internal bbox contract
  * (reference: geoextent/lib/extent.py:1147-1155 — `[minlon,minlat,maxlon,maxlat]`),
  * re-expressed as a typed struct so it maps to a Spark `StructType` column.
  */
final case class Extent(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double) {
  def merge(o: Extent): Extent =
    Extent(math.min(minLon, o.minLon), math.min(minLat, o.minLat),
           math.max(maxLon, o.maxLon), math.max(maxLat, o.maxLat))
  def centroidLon: Double = (minLon + maxLon) / 2
  def centroidLat: Double = (minLat + maxLat) / 2
  def isPoint(tol: Double = 1e-6): Boolean =
    math.abs(maxLon - minLon) <= tol && math.abs(maxLat - minLat) <= tol
  def isNullIsland: Boolean =
    minLon == 0.0 && minLat == 0.0 && maxLon == 0.0 && maxLat == 0.0
  def corners: Array[(Double, Double)] =
    Array((minLon, minLat), (maxLon, minLat), (maxLon, maxLat), (minLon, maxLat))
  def intersects(o: Extent): Boolean =
    minLon <= o.maxLon && o.minLon <= maxLon && minLat <= o.maxLat && o.minLat <= maxLat
}

object Geo {

  /** WGS84 plausibility gate (reference: geoextent/lib/helpfunctions.py:366-383 —
    * lat must be in [-90,90], lon in [-180,180]).
    */
  def plausibleWgs84(e: Extent): Boolean =
    e.minLon >= -180 && e.maxLon <= 180 && e.minLat >= -90 && e.maxLat <= 90 &&
      e.minLon <= e.maxLon && e.minLat <= e.maxLat

  /** Envelope of a flat interleaved coordinate array [lon0,lat0,lon1,lat1,…].
    * Returns None for empty input or non-finite coords.
    */
  def envelope(coords: Array[Double]): Option[Extent] = {
    if (coords == null || coords.length < 2) return None
    var minLon = Double.MaxValue; var minLat = Double.MaxValue
    var maxLon = -Double.MaxValue; var maxLat = -Double.MaxValue
    var i = 0
    while (i + 1 < coords.length) {
      val lon = coords(i); val lat = coords(i + 1)
      if (lon.isNaN || lat.isNaN || lon.isInfinite || lat.isInfinite) return None
      if (lon < minLon) minLon = lon
      if (lon > maxLon) maxLon = lon
      if (lat < minLat) minLat = lat
      if (lat > maxLat) maxLat = lat
      i += 2
    }
    if (minLon > maxLon) None else Some(Extent(minLon, minLat, maxLon, maxLat))
  }

  /** Ray-casting (even–odd crossing) point-in-polygon on a ring given as a flat
    * interleaved [lon0,lat0,…] array. Ring need not be explicitly closed. Uses the
    * standard half-open crossing rule, so points exactly on an edge are
    * implementation-defined — the engine's synthetic polygon tables keep bounds off
    * the data lattice (see graft.table.PayloadSpec) so the rule never matters for
    * verified results. Semantics source: the reference attaches admin-boundary
    * polygons from gazetteer GeoJSON (reference: geoextent/lib/gazetteer.py:219-250).
    */
  def pointInRing(lon: Double, lat: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Monotone-chain convex hull over (lon,lat) points; output ring is in
    * counter-clockwise order starting from the lexicographically smallest vertex
    * (canonical ordering → deterministic across partition orders, SURVEY §7
    * "known-hard items" #1). Degenerate inputs: 0 pts → empty; 1 pt → that point;
    * collinear set → the two end points.
    */
  def convexHull(points: Array[(Double, Double)]): Array[(Double, Double)] = {
    val pts = points.distinct.sortBy(p => (p._1, p._2))
    if (pts.length <= 2) return pts
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts.reverseIterator) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    (lower.dropRight(1) ++ upper.dropRight(1)).toArray
  }

  /** Shoelace area of a ring (not closed); positive for CCW rings. */
  def ringArea(ring: Array[(Double, Double)]): Double = {
    if (ring.length < 3) return 0.0
    var s = 0.0
    var i = 0
    while (i < ring.length) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    s / 2
  }

  // ---- Web Mercator (EPSG:3857 <-> EPSG:4326), exact closed form ----
  // The engine supports exactly the two CRSs its corpus carries (SURVEY §2 P4):
  // identity 4326 and spherical Web Mercator.

  val EarthRadius = 6378137.0
  val MercMaxLat  = 85.05112878 // atan(sinh(pi)) — standard tile clamp

  def lonToMercX(lon: Double): Double = EarthRadius * math.toRadians(lon)
  def latToMercY(lat: Double): Double = {
    val s = math.sin(math.toRadians(lat))
    EarthRadius / 2.0 * math.log((1 + s) / (1 - s))
  }
  def mercXToLon(x: Double): Double = math.toDegrees(x / EarthRadius)
  def mercYToLat(y: Double): Double =
    math.toDegrees(2 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2)

  def extentToMercator(e: Extent): Extent =
    Extent(lonToMercX(e.minLon), latToMercY(e.minLat), lonToMercX(e.maxLon), latToMercY(e.maxLat))
  def extentFromMercator(e: Extent): Extent =
    Extent(mercXToLon(e.minLon), mercYToLat(e.minLat), mercXToLon(e.maxLon), mercYToLat(e.maxLat))

  /** Quantize a reprojected coordinate to the 2^-20-degree grid (~0.1 m at the
    * equator — beneath any reprojection's physical precision). The scale is a
    * power of two, so the snap is exact binary arithmetic: a forward+inverse
    * Mercator round trip (a few ulp of transcendental error) lands back on the
    * source coordinate exactly whenever that coordinate sits on the grid,
    * making transformed extents reproducible across engines and libms.
    */
  def snapDeg(x: Double): Double = math.rint(x * 1048576.0) / 1048576.0

  /** EPSG:3857 → WGS84 for a flat interleaved [x,y,…] meter array, grid-snapped. */
  def mercArrayToWgs84(coords: Array[Double]): Array[Double] = {
    if (coords == null) return coords
    // an interleaved [x,y,…] array must have even length — a stray trailing
    // element would otherwise come back as a fabricated 0.0 coordinate
    require(coords.length % 2 == 0, s"odd-length interleaved coordinate array: ${coords.length}")
    val out = new Array[Double](coords.length)
    var i = 0
    while (i + 1 < coords.length) {
      out(i) = snapDeg(mercXToLon(coords(i)))
      out(i + 1) = snapDeg(mercYToLat(coords(i + 1)))
      i += 2
    }
    out
  }

  /** EPSG:3857 → WGS84 extent (Mercator is monotone per axis, so corners map
    * to corners), grid-snapped.
    */
  def mercExtentToWgs84(e: Extent): Extent =
    Extent(snapDeg(mercXToLon(e.minLon)), snapDeg(mercYToLat(e.minLat)),
      snapDeg(mercXToLon(e.maxLon)), snapDeg(mercYToLat(e.maxLat)))

  // ---- UTM (Transverse Mercator inverse, Snyder series) ----
  // Round-3 widening of P4: the reference's own fixtures carry EPSG:25832 /
  // 326xx UTM coordinates (shapefile, GeoTIFF, LAS). The classical Snyder
  // inverse series on the WGS84 ellipsoid is accurate to ~1 cm — orders of
  // magnitude inside the reference tests' 1e-3-degree tolerance. (ETRS89's
  // GRS80 ellipsoid differs from WGS84 by ~0.1 mm of flattening; 258xx zones
  // are treated as their 326xx WGS84 twins, like every practical pipeline.)

  private val UtmA = 6378137.0
  private val UtmF = 1.0 / 298.257223563
  private val UtmK0 = 0.9996

  /** EPSG code of a supported UTM CRS → (zone, northern)? 326xx = WGS84 N,
    * 327xx = WGS84 S, 258xx = ETRS89 N (zones 28-38).
    */
  def utmZoneOf(epsg: Int): Option[(Int, Boolean)] = {
    if (epsg >= 32601 && epsg <= 32660) Some((epsg - 32600, true))
    else if (epsg >= 32701 && epsg <= 32760) Some((epsg - 32700, false))
    else if (epsg >= 25828 && epsg <= 25838) Some((epsg - 25800, true))
    else None
  }

  /** Inverse Transverse Mercator: UTM easting/northing → (lon, lat) degrees. */
  def utmToLonLat(zone: Int, northern: Boolean, easting: Double, northing: Double): (Double, Double) = {
    val e2 = UtmF * (2 - UtmF)
    val ep2 = e2 / (1 - e2)
    val lon0 = math.toRadians(zone * 6.0 - 183.0)
    val n0 = if (northern) 0.0 else 10000000.0
    val m = (northing - n0) / UtmK0
    val mu = m / (UtmA * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = math.tan(phi1)
    val c1 = ep2 * cos1 * cos1
    val t1 = tan1 * tan1
    val n1 = UtmA / math.sqrt(1 - e2 * sin1 * sin1)
    val r1 = UtmA * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
    val d = (easting - 500000.0) / (n1 * UtmK0)
    val lat = phi1 - (n1 * tan1 / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lon = lon0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cos1
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  /** Extent in a supported UTM CRS → WGS84, RASTER contract: the reference's
    * raster path transforms exactly the two corners (min,min)/(max,max) and
    * reports them verbatim (verified against its GeoTIFF expectations) — the
    * true envelope can bulge past this mid-edge, but reproducing the
    * reference means reproducing its two-corner semantics. Grid-snapped.
    */
  def utmExtentToWgs84(epsg: Int, e: Extent): Option[Extent] =
    utmZoneOf(epsg).map { case (zone, north) =>
      val (lo0, la0) = utmToLonLat(zone, north, e.minLon, e.minLat)
      val (lo1, la1) = utmToLonLat(zone, north, e.maxLon, e.maxLat)
      Extent(snapDeg(math.min(lo0, lo1)), snapDeg(math.min(la0, la1)),
        snapDeg(math.max(lo0, lo1)), snapDeg(math.max(la0, la1)))
    }

  /** Extent in a supported UTM CRS → WGS84, VECTOR contract: the reference's
    * vector path goes through pyproj `transform_bounds`, which DENSIFIES each
    * edge (21 points) before taking the envelope — graticule lines curve
    * under TM, so a box straddling the central meridian reaches its extreme
    * longitudes mid-edge. Verified against the reference's shapefile
    * expectations. Grid-snapped.
    */
  def utmExtentToWgs84Densified(epsg: Int, e: Extent, pts: Int = 21): Option[Extent] =
    utmZoneOf(epsg).map { case (zone, north) =>
      var minLon = Double.MaxValue; var minLat = Double.MaxValue
      var maxLon = Double.MinValue; var maxLat = Double.MinValue
      for (i <- 0 to pts) {
        val fx = e.minLon + (e.maxLon - e.minLon) * i / pts
        val fy = e.minLat + (e.maxLat - e.minLat) * i / pts
        for ((x, y) <- Seq((fx, e.minLat), (fx, e.maxLat), (e.minLon, fy), (e.maxLon, fy))) {
          val (lo, la) = utmToLonLat(zone, north, x, y)
          if (lo < minLon) minLon = lo; if (lo > maxLon) maxLon = lo
          if (la < minLat) minLat = la; if (la > maxLat) maxLat = la
        }
      }
      Extent(snapDeg(minLon), snapDeg(minLat), snapDeg(maxLon), snapDeg(maxLat))
    }
}
