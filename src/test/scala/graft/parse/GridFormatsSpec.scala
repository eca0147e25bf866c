package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the ESRI ASCII grid and FlatGeobuf readers against the
  * reference's fixtures (expectations from tests/test_api.py /
  * tests/test_api_flatgeobuf.py).
  */
class GridFormatsSpec extends AnyFunSuite {

  private val td = "/root/reference/tests/testdata"
  private def have(p: String): Boolean = new java.io.File(p).exists()

  test("asc golden: Churfirsten header arithmetic; projected CRS fails the WGS84 gate") {
    assume(have(s"$td/asc/Churfirsten_30m.asc"))
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$td/asc/Churfirsten_30m.asc")), "UTF-8")
    val r = GridAscii.readAsc(text).get
    assert(r.ncols === 2 && r.nrows === 2 && r.cellsize === 30.0)
    assert(math.abs(r.extent.minLon - -41404.534638399433) < 1e-9)
    assert(math.abs(r.extent.minLat - -34323.166541740298) < 1e-9)
    assert(math.abs(r.extent.maxLon - (-41404.534638399433 + 60.0)) < 1e-9)
    // Bonne-projected meters (the reference transforms via proj; the engine's
    // 4326/3857 restriction means this extent carries through and is gated)
    assert(!graft.geo.Geo.plausibleWgs84(r.extent))
  }

  test("fgb golden: countries.fgb header envelope equals the reference's OGR extent") {
    assume(have(s"$td/flatgeobuf/countries.fgb"))
    val e = FlatGeobuf.readEnvelope(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$td/flatgeobuf/countries.fgb"))).get
    // reference expectation: [minlat, minlon, maxlat, maxlon] =
    // [-85.609038, -180.0, 83.645130, 180.0]
    assert(e.minLon === -180.0 && e.maxLon === 180.0)
    assert(math.abs(e.minLat - -85.609038) < 1e-6)
    assert(math.abs(e.maxLat - 83.645130) < 1e-6)
  }

  test("worldfile: ungeotagged tif + .tfw sidecar georeferences via the affine") {
    assume(have(s"$td/worldfile/test_with_world.tif"))
    val tif = GeoTiff.readTiff(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$td/worldfile/test_with_world.tif"))).get
    assert(tif.extent === None) // no ModelTiepoint: the tif alone is ungeoreferenced
    val w = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$td/worldfile/test_with_world.tfw")), "UTF-8")
    val e = WorldFile.extent(w, tif.width, tif.height).get
    // sidecar: 0.001/-0.001 deg pixels, top-left center (13.4, 52.502) — Berlin
    assert(math.abs(e.minLon - (13.4 - 0.0005)) < 1e-9)
    assert(math.abs(e.maxLat - (52.502 + 0.0005)) < 1e-9)
    assert(math.abs(e.maxLon - (13.4 - 0.0005 + 0.001 * tif.width)) < 1e-9)
    assert(graft.geo.Geo.plausibleWgs84(e))
  }

  test("asc: center-registered origin shifts by half a cell; malformed input rejected") {
    val r = GridAscii.readAsc(
      "ncols 10\nnrows 5\nxllcenter 100.5\nyllcenter 20.5\ncellsize 1.0\n1 2 3").get
    assert(r.extent.minLon === 100.0 && r.extent.minLat === 20.0)
    assert(r.extent.maxLon === 110.0 && r.extent.maxLat === 25.0)
    assert(GridAscii.readAsc("not a grid at all") === None)
    assert(FlatGeobuf.readEnvelope("nope".getBytes) === None)
  }
}
