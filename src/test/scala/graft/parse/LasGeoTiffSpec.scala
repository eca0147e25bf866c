package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the LAS and GeoTIFF header readers against the reference's
  * fixtures (expectations from tests/test_api_pointcloud.py,
  * tests/test_api_geotiff.py, tests/test_api.py).
  */
class LasGeoTiffSpec extends AnyFunSuite {

  private val td = "/root/reference/tests/testdata"
  private def bytes(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
  private def have(p: String): Boolean = new java.io.File(p).exists()

  test("las golden: wgs84.las header bbox [7.5, 51.9, 7.7, 52.0], crs 4326") {
    assume(have(s"$td/pointcloud/wgs84.las"))
    val r = Las.readLas(bytes(s"$td/pointcloud/wgs84.las")).get
    assert(math.abs(r.extent.minLon - 7.5) < 1e-6)
    assert(math.abs(r.extent.minLat - 51.9) < 1e-6)
    assert(math.abs(r.extent.maxLon - 7.7) < 1e-6)
    assert(math.abs(r.extent.maxLat - 52.0) < 1e-6)
    assert(r.crs === "4326")
    assert(r.nPoints > 0)
  }

  test("las: projected UTM coordinates do not masquerade as WGS84") {
    assume(have(s"$td/pointcloud/utm32n.las"))
    val r = Las.readLas(bytes(s"$td/pointcloud/utm32n.las")).get
    assert(r.crs === "unknown") // meters-scale values fail the WGS84 gate
  }

  test("geotiff golden: wf_100m_klas.tif EPSG:25832 extent transforms to the reference WGS84 bbox") {
    assume(have(s"$td/tif/wf_100m_klas.tif"))
    val r = GeoTiff.readTiff(bytes(s"$td/tif/wf_100m_klas.tif")).get
    assert(r.epsg === Some(25832))
    // reference expectation post-transform ([minlat, minlon, maxlat, maxlon]):
    // [50.310251, 5.915300, 52.530775, 9.468398]
    val e = graft.geo.Geo.utmExtentToWgs84(r.epsg.get, r.extent.get).get
    assert(math.abs(e.minLon - 5.915300) < 1e-3)
    assert(math.abs(e.minLat - 50.310251) < 1e-3)
    assert(math.abs(e.maxLon - 9.468398) < 1e-3)
    assert(math.abs(e.maxLat - 52.530775) < 1e-3)
  }

  test("utm inverse: shapefile Abgrabungen (25832) transforms to the reference WGS84 bbox") {
    assume(have(s"$td/shapefile/Abgrabungen_Kreis_Kleve_Shape.shp"))
    val r = Shapefile.readShp(bytes(s"$td/shapefile/Abgrabungen_Kreis_Kleve_Shape.shp")).get
    // reference expectation (test_api_shapefile.py):
    // [51.36725472, 6.03730547, 51.84792000, 6.49978676]
    // vector contract: pyproj transform_bounds densifies edges
    val e = graft.geo.Geo.utmExtentToWgs84Densified(25832, r.extent).get
    assert(math.abs(e.minLon - 6.0373054738033725) < 1e-3)
    assert(math.abs(e.minLat - 51.36725472296136) < 1e-3)
    assert(math.abs(e.maxLon - 6.499786759861303) < 1e-3)
    assert(math.abs(e.maxLat - 51.847920000368205) < 1e-3)
  }

  test("geotiff golden: TIFFTAG_DATETIME -> tbox 2019-03-21") {
    assume(have(s"$td/tif/tif_tifftag_datetime.tif"))
    val r = GeoTiff.readTiff(bytes(s"$td/tif/tif_tifftag_datetime.tif")).get
    assert(r.datetime.flatMap(GeoTiff.datetimeToIso) === Some("2019-03-21"))
  }

  test("geotiff: invalid TIFFTAG_DATETIME yields no date") {
    assume(have(s"$td/tif/tif_tifftag_invalid.tif"))
    val r = GeoTiff.readTiff(bytes(s"$td/tif/tif_tifftag_invalid.tif")).get
    assert(r.datetime.flatMap(GeoTiff.datetimeToIso) === None)
  }
}
