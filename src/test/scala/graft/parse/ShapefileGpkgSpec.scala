package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the pure-JVM Shapefile/DBF and GeoPackage(SQLite) readers
  * against the reference's OWN fixtures, with the expected values taken from
  * the reference's test suite (tests/test_api_shapefile.py, tests/test_api.py).
  */
class ShapefileGpkgSpec extends AnyFunSuite {

  private val td = "/root/reference/tests/testdata"
  private def bytes(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
  private def have(p: String): Boolean = new java.io.File(p).exists()

  test("shapefile bbox golden: gis_osm_buildings (WGS84, header envelope == record envelope)") {
    assume(have(s"$td/shapefile/gis_osm_buildings_a_free_1.shp"))
    val r = Shapefile.readShp(bytes(s"$td/shapefile/gis_osm_buildings_a_free_1.shp")).get
    // reference expectation (test_api_shapefile.py, [minlat, minlon, maxlat, maxlon]):
    // [-89.998844, -167.400123, -60.708069, 166.700078]
    assert(math.abs(r.extent.minLon - -167.400123) < 1e-4)
    assert(math.abs(r.extent.minLat - -89.998844) < 1e-4)
    assert(math.abs(r.extent.maxLon - 166.700078) < 1e-4)
    assert(math.abs(r.extent.maxLat - -60.708069) < 1e-4)
    assert(Shapefile.prjToEpsg(new String(bytes(s"$td/shapefile/gis_osm_buildings_a_free_1.prj"), "UTF-8")) === "4326")
    // the header envelope must equal the envelope of the parsed record vertices
    assert(r.verts.nonEmpty && r.verts.length % 2 == 0)
    val lons = r.verts.indices.collect { case i if i % 2 == 0 => r.verts(i) }
    val lats = r.verts.indices.collect { case i if i % 2 == 1 => r.verts(i) }
    assert(math.abs(lons.min - r.extent.minLon) < 1e-9 && math.abs(lons.max - r.extent.maxLon) < 1e-9)
    assert(math.abs(lats.min - r.extent.minLat) < 1e-9 && math.abs(lats.max - r.extent.maxLat) < 1e-9)
  }

  test("shapefile tbox golden: ifgi_denkpause .dbf date field") {
    assume(have(s"$td/shapefile/ifgi_denkpause.dbf"))
    // reference expectation: ["2021-01-01", "2021-01-01"]
    assert(Shapefile.dbfTbox(bytes(s"$td/shapefile/ifgi_denkpause.dbf")) ===
      Some(("2021-01-01", "2021-01-01")))
  }

  test("shapefile non-4326 CRS passes through (Abgrabungen, EPSG:25832 projected meters)") {
    assume(have(s"$td/shapefile/Abgrabungen_Kreis_Kleve_Shape.prj"))
    val crs = Shapefile.prjToEpsg(new String(bytes(s"$td/shapefile/Abgrabungen_Kreis_Kleve_Shape.prj"), "UTF-8"))
    assert(crs !== "4326") // engine restriction: 4326/3857 only; others carry through
    val r = Shapefile.readShp(bytes(s"$td/shapefile/Abgrabungen_Kreis_Kleve_Shape.shp")).get
    assert(!graft.geo.Geo.plausibleWgs84(r.extent)) // projected meters fail the WGS84 gate
  }

  test("gpkg bbox golden: nc.gpkg (envelope union of actual geometries)") {
    assume(have(s"$td/nc/nc.gpkg"))
    val r = GeoPackage.read(bytes(s"$td/nc/nc.gpkg")).get
    // reference expectation (test_api.py, [minlat, minlon, maxlat, maxlon]):
    // [33.882102, -84.323835, 36.589757, -75.456585] (NAD27≈WGS84 at this tolerance)
    val e = r.extent.get
    assert(math.abs(e.minLon - -84.323835) < 1e-3)
    assert(math.abs(e.minLat - 33.882102) < 1e-3)
    assert(math.abs(e.maxLon - -75.456585) < 1e-3)
    assert(math.abs(e.maxLat - 36.589757) < 1e-3)
    assert(r.nFeatures > 0)
  }

  test("gpkg tbox golden: wandelroute_maastricht date column") {
    assume(have(s"$td/geopackage/wandelroute_maastricht.gpkg"))
    val r = GeoPackage.read(bytes(s"$td/geopackage/wandelroute_maastricht.gpkg")).get
    // reference expectation: ["2021-01-05", "2021-01-05"]
    assert(r.tbox === Some(("2021-01-05", "2021-01-05")))
    assert(r.srsId === 4326L)
  }

  test("malformed-input contract: truncated/corrupted payloads fail the row (None), never throw") {
    assume(have(s"$td/shapefile/gis_osm_buildings_a_free_1.shp"))
    val shp = bytes(s"$td/shapefile/gis_osm_buildings_a_free_1.shp")
    // truncation at several depths, incl. mid-record
    for (n <- Seq(101, 150, shp.length / 2, shp.length - 3)) {
      Shapefile.readShp(shp.take(n)) // must not throw (None or partial both fine)
    }
    // corrupted point count: make the first record claim an absurd numPoints
    val corrupt = shp.clone()
    java.nio.ByteBuffer.wrap(corrupt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(148, Int.MaxValue / 8)
    assert(Shapefile.readShp(corrupt).isEmpty)
    // zero-length record must not stall the walk (loop-advance guard)
    val stall = shp.clone()
    java.nio.ByteBuffer.wrap(stall).order(java.nio.ByteOrder.BIG_ENDIAN).putInt(104, 0)
    Shapefile.readShp(stall) // terminates
    assert(Shapefile.readDbf("dBASE?".getBytes ++ Array.fill[Byte](40)(0x7f)).isEmpty
      || true) // no-throw is the contract
    if (have(s"$td/geopackage/nc.gpkg")) {
      val gpkg = bytes(s"$td/geopackage/nc.gpkg")
      for (n <- Seq(120, 4096, gpkg.length / 3)) GeoPackage.read(gpkg.take(n)) // no-throw
    }
    if (have(s"$td/flatgeobuf/countries.fgb")) {
      val fgb = bytes(s"$td/flatgeobuf/countries.fgb")
      for (n <- Seq(17, 40, fgb.length / 2)) FlatGeobuf.readEnvelope(fgb.take(n)) // no-throw
    }
    if (have(s"$td/tif/wf_100m_klas.tif")) {
      val tif = bytes(s"$td/tif/wf_100m_klas.tif")
      for (n <- Seq(9, 64, tif.length / 2)) GeoTiff.readTiff(tif.take(n)) // no-throw
    }
  }
}
