package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden-value tests against the reference's own fixture files (read-only at
  * /root/reference, tolerance 1e-3 per reference tests/help_functions_test.py:6).
  * Each test is cancelled, not failed, if the fixture tree is absent.
  */
class GoldenFixtureSpec extends AnyFunSuite {

  private val base = "/root/reference/tests/testdata"
  private def fixture(rel: String): String = {
    val p = Paths.get(base, rel)
    assume(Files.exists(p), s"reference fixture $rel not available")
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
  }
  private val tol = 1e-3

  private def assertBBox(got: Option[graft.geo.Extent],
                         minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): Unit = {
    assert(got.isDefined, "no extent extracted")
    val e = got.get
    assert(math.abs(e.minLon - minLon) < tol, s"minLon ${e.minLon}")
    assert(math.abs(e.minLat - minLat) < tol, s"minLat ${e.minLat}")
    assert(math.abs(e.maxLon - maxLon) < tol, s"maxLon ${e.maxLon}")
    assert(math.abs(e.maxLat - maxLat) < tol, s"maxLat ${e.maxLat}")
  }

  test("muenster ring GeoJSON bbox golden (reference tests/test_api.py:125-129)") {
    val s = fixture("geojson/muenster_ring_zeit.geojson")
    // published [minlat,minlon,maxlat,maxlon] = [51.948814, 7.601680, 51.974624, 7.647256]
    assertBBox(GeoJson.envelope(s), 7.601680, 51.948814, 7.647256, 51.974624)
  }

  test("muenster ring GeoJSON tbox golden 2018-11-14 (reference tests/test_api.py:125-129)") {
    val s = fixture("geojson/muenster_ring_zeit.geojson")
    val dates = DateGuess.parseColumn(GeoJson.timeValues(s))
    assert(dates.nonEmpty)
    assert(dates.min.toString === "2018-11-14")
    assert(dates.max.toString === "2018-11-14")
  }

  test("aasee KML bbox golden (reference tests/test_api.py:42-49)") {
    val s = fixture("kml/aasee.kml")
    // published [51.942465, 7.594213, 51.957278, 7.618246] lat-lon order
    assertBBox(XmlGeo.kmlEnvelope(s), 7.594213, 51.942465, 7.618246, 51.957278)
  }

  test("KML TimeStamp golden 2007-01-14 (reference tests/test_api.py:55-58)") {
    val s = fixture("kml/TimeStamp_example.kml")
    val dates = DateGuess.parseColumn(XmlGeo.timeValues(s))
    assert(dates.nonEmpty)
    assert(dates.min.toString === "2007-01-14")
  }

  test("GPX bbox+tbox golden (reference tests/test_api.py:85-100)") {
    val s = fixture("gpx/gpx1.1_with_all_fields.gpx")
    // published bbox [10.0, -20.2, 14.0, 46.7] lat-lon order
    assertBBox(XmlGeo.gpxEnvelope(s), -20.2, 10.0, 46.7, 14.0)
    val dates = DateGuess.parseColumn(XmlGeo.timeValues(s))
    assert(dates.nonEmpty && dates.min.toString === "2013-01-01")
  }

  test("null island point skipped; empty/invalid GeoJSON yield no extent") {
    val ni = fixture("geojson/null_island_point.geojson")
    val e = GeoJson.envelope(ni)
    // extraction-level gate drops [0,0,0,0]
    assert(e.forall(_.isNullIsland))
    val extract = Extract.extract(ni.getBytes("UTF-8"), "", "en")
    assert(extract.minLon.isEmpty)
    assert(GeoJson.envelope(fixture("geojson/empty.geojson")).isEmpty)
  }

  test("one-point GeoJSON gives degenerate point extent (reference point detection helpfunctions.py:1339-1405)") {
    val s = fixture("geojson/onePoint.geojson")
    val e = GeoJson.envelope(s)
    assert(e.isDefined && e.get.isPoint())
  }

  test("cities_NL CSV golden envelope (reference tests/testdata/csv/cities_NL.csv)") {
    val p = Paths.get(base, "csv/cities_NL.csv")
    assume(Files.exists(p))
    val s = new String(Files.readAllBytes(p), "UTF-8")
    assert(CsvGeo.isSupported(s))
    val r = CsvGeo.extract(s).get
    assert(r.extent.isDefined)
    val e = r.extent.get
    // NL envelope: all cities within [3.3,50.7]x[7.3,53.6]
    assert(e.minLon > 3.0 && e.maxLon < 7.5 && e.minLat > 50.5 && e.maxLat < 53.7, e)
  }

  // ---- per-payload convex hull (reference convex_hull=True mode) ----

  /** CCW-convexity membership: p is inside-or-on a CCW ring iff it is
    * left-of-or-on every edge (robust where ray casting is edge-ambiguous).
    */
  private def insideOrOnHull(p: (Double, Double), ring: Array[(Double, Double)]): Boolean = {
    val n = ring.length
    (0 until n).forall { i =>
      val a = ring(i); val b = ring((i + 1) % n)
      (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1) >= -1e-12
    }
  }

  test("cities_NL CSV convex hull: >4 vertices, vertices ⊆ points, hull contains all points " +
    "(reference tests/test_api_csv.py TestCSVConvexHull)") {
    val p = Paths.get(base, "csv/cities_NL.csv")
    assume(Files.exists(p))
    val s = new String(Files.readAllBytes(p), "UTF-8")
    val r = CsvGeo.extract(s).get
    assert(r.verts.length >= 6)
    val pts = r.verts.grouped(2).map(a => (a(0), a(1))).toArray
    val hull = graft.geo.Geo.convexHull(pts)
    // scattered NL cities: a real hull, not a 4-corner rectangle
    assert(hull.length > 4, s"hull has ${hull.length} vertices")
    assert(hull.forall(pts.contains), "hull vertices must be input points")
    assert(pts.forall(insideOrOnHull(_, hull)), "all points inside hull")
    // and the end-to-end Extract path carries the same hull
    val ex = Extract.extract(s.getBytes("UTF-8"), "", "en")
    assert(ex.hull.isDefined)
    assert(ex.hull.get.grouped(2).map(a => (a(0), a(1))).toArray === hull)
  }

  test("muenster ring hull: end-to-end Extract hull matches ring geometry " +
    "(reference handle_vector.py:257-456)") {
    val s = fixture("geojson/muenster_ring_zeit.geojson")
    val ex = Extract.extract(s.getBytes("UTF-8"), "", "en")
    assert(ex.hull.isDefined)
    val hull = ex.hull.get.grouped(2).map(a => (a(0), a(1))).toArray
    val pts = GeoJson.coords(s).grouped(2).map(a => (a(0), a(1))).toArray
    assert(hull.length >= 3)
    assert(hull.forall(pts.contains), "hull vertices from the payload's actual vertices")
    assert(pts.forall(insideOrOnHull(_, hull)))
    // hull envelope == published bbox golden
    val he = graft.geo.Geo.envelope(ex.hull.get)
    assertBBox(he, 7.601680, 51.948814, 7.647256, 51.974624)
  }

  test("OSM Overpass XML: node-set envelope + timestamp tbox + dispatch " +
    "(reference testdata/osm/overpass.xml, read via OGR's OSM driver)") {
    val s = fixture("osm/overpass.xml")
    assert(XmlGeo.looksLikeOsm(s))
    // expected envelope derived from the fixture's own 123 <node> elements
    // (closed-form over the fixture bytes, the ASC-golden style): lon
    // [-1.55849, -1.5342794], lat [53.795194, 53.8096008]
    assertBBox(XmlGeo.osmEnvelope(s), -1.55849, 53.795194, -1.5342794, 53.8096008)
    val dates = DateGuess.parseColumn(XmlGeo.osmTimeValues(s))
    assert(dates.nonEmpty)
    assert(dates.min.toString === "2007-09-15" && dates.max.toString === "2016-12-28")
    // end-to-end dispatch: the full chain must route it to the vector handler
    val ex = Extract.extract(s.getBytes("UTF-8"), "", "en")
    assert(ex.handler === "vector")
    assert(math.abs(ex.minLon.get - -1.55849) < tol && math.abs(ex.maxLat.get - 53.8096008) < tol)
    assert(ex.tboxStart === Some("2007-09-15") && ex.tboxEnd === Some("2016-12-28"))
    // <bounds> widening + malformed tolerance
    val b = XmlGeo.osmCoordArray("""<osm><bounds minlat="1.0" minlon="2.0" maxlat="3.0" maxlon="4.0"/><node lat="x" lon="y"/></osm>""")
    assert(b.toSeq === Seq(2.0, 1.0, 4.0, 3.0))
    assert(XmlGeo.osmCoordArray("<osm></osm>").isEmpty)
  }
}
