package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the minimal-HDF5 NetCDF reader against the reference's own
  * fixtures; expectations from tests/test_api.py:34-39 (zeroes.nc bbox) and
  * tests/test_raster_temporal.py TestNetCDFTemporalExtent (CF/ACDD tboxes).
  * zeroes.nc exercises the superblock-v0 + dense-link (fractal heap) path;
  * the nc_* fixtures exercise superblock v2 with compact OHDR links.
  */
class NetCdfSpec extends AnyFunSuite {

  private val td = "/root/reference/tests/testdata/nc"
  private def have(p: String): Boolean = new java.io.File(p).exists()
  private def nc(name: String): NetCdf.NcResult = {
    assume(have(s"$td/$name"), s"fixture $name absent")
    NetCdf.read(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$td/$name"))).get
  }
  private val tol = 1e-3

  test("zeroes.nc bbox golden: cell-center axes + half-step padding, EPSG:4326 from WKT") {
    val r = nc("zeroes.nc")
    // reference: [minlat, minlon, maxlat, maxlon] = [-52.63157, 19.86842, 52.63157, 25.13157]
    val e = r.extent.get
    assert(math.abs(e.minLon - -52.63157) < tol, s"minLon ${e.minLon}")
    assert(math.abs(e.minLat - 19.86842) < tol, s"minLat ${e.minLat}")
    assert(math.abs(e.maxLon - 52.63157) < tol, s"maxLon ${e.maxLon}")
    assert(math.abs(e.maxLat - 25.13157) < tol, s"maxLat ${e.maxLat}")
    assert(r.crs === "4326")
    assert(r.width === 20 && r.height === 20)
  }

  test("CF time units goldens: days/seconds/minutes since, hours-CF priority over ACDD") {
    assert(nc("nc_days_since.nc").tbox === Some(("2015-01-01", "2016-01-01")))
    assert(nc("nc_seconds_since.nc").tbox === Some(("2000-06-01", "2000-06-02")))
    assert(nc("nc_minutes_since.nc").tbox === Some(("2010-12-25", "2010-12-26")))
    // CF wins over the ACDD attributes also present in this file
    assert(nc("nc_cf_and_acdd.nc").tbox === Some(("2005-01-01", "2006-01-01")))
  }

  test("ACDD goldens: coverage pair, start-only degenerate, invalid-CF fallback, none") {
    assert(nc("nc_acdd_coverage.nc").tbox === Some(("2018-04-01", "2018-09-30")))
    assert(nc("nc_acdd_start_only.nc").tbox === Some(("2022-11-15", "2022-11-15")))
    // "not a valid string" CF units → ACDD fallback
    assert(nc("nc_invalid_time_units.nc").tbox === Some(("2019-01-01", "2019-01-01")))
    assert(nc("nc_no_temporal.nc").tbox === None)
  }

  test("NaN time values are skipped, not propagated") {
    // values [nan, 10, nan, 30] days since 2020-01-01
    assert(nc("nc_nan_time_values.nc").tbox === Some(("2020-01-11", "2020-01-31")))
  }

  test("nc_* bbox path: degrees_north/east axes with half-step padding") {
    val r = nc("nc_days_since.nc")
    val e = r.extent.get
    // lat 47.0..47.9 step 0.1, lon 10.0..10.9 step 0.1 → padded ±0.05
    assert(math.abs(e.minLat - 46.95) < tol && math.abs(e.maxLat - 47.95) < tol)
    assert(math.abs(e.minLon - 9.95) < tol && math.abs(e.maxLon - 10.95) < tol)
    assert(r.crs === "4326") // latitude_longitude grid mapping
  }

  test("synth round-trip: Hdf5Synth writes what the reader parses (q69 plumbing)") {
    val b = graft.table.Hdf5Synth.ncBytes(
      lat = Array(10.0625, 10.1875, 10.3125), lon = Array(20.125, 20.375, 20.625, 20.875),
      time = Array(0.0, 14.0), timeUnits = "days since 2015-03-01",
      rootAttrs = Seq("Conventions" -> "CF-1.6"))
    assert(Hdf5.looksLikeHdf5(b))
    val r = NetCdf.read(b).get
    val e = r.extent.get
    assert(e.minLat === 10.0 && e.maxLat === 10.375)
    assert(e.minLon === 20.0 && e.maxLon === 21.0)
    assert(r.width === 4 && r.height === 3)
    assert(r.tbox === Some(("2015-03-01", "2015-03-15")))
    val f = Hdf5.read(b).get
    assert(f.rootAttrs.get("Conventions") === Some("CF-1.6"))
  }

  test("chunked + shuffle + deflate time axis round-trips (unlimited-dim layout)") {
    val time = Array.tabulate(20)(i => i * 3.0) // 0..57 days
    val b = graft.table.Hdf5Synth.ncBytesChunkedTime(
      lat = Array(10.25, 10.75), lon = Array(20.5, 21.5, 22.5),
      time = time, timeUnits = "days since 2015-03-01", chunkElems = 7) // 3 chunks, edge partial
    val f = Hdf5.read(b).get
    val tvar = f.vars.find(_.name == "time").get
    assert(tvar.data.get.toSeq === time.toSeq, "chunk scatter must reassemble exactly")
    val r = NetCdf.read(b).get
    assert(r.tbox === Some(("2015-03-01", "2015-04-27"))) // +57 days
    assert(r.extent.get.minLon === 20.0 && r.extent.get.maxLon === 23.0)
  }

  test("zeroes.nc golden: the chunked (uncompressed) data variable reads as all zeros") {
    val r = Hdf5.read(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$td/zeroes.nc"))).get
    val z = r.vars.find(_.name == "rsl").get
    assert(z.dims === Seq(1L, 20L, 20L))
    assert(z.data.get.length === 400 && z.data.get.forall(_ == 0.0))
  }

  test("malformed chunked HDF5: truncated chunks/trees and corrupt filters fail the row, never throw") {
    val time = Array.tabulate(20)(i => i * 3.0)
    val b = graft.table.Hdf5Synth.ncBytesChunkedTime(
      lat = Array(10.25, 10.75), lon = Array(20.5, 21.5, 22.5),
      time = time, timeUnits = "days since 2015-03-01", chunkElems = 7)
    // truncations at every region boundary-ish point
    for (n <- Seq(60, 200, b.length / 4, b.length / 2, b.length - 40, b.length - 4))
      Hdf5.read(b.take(n)) // no-throw is the assertion
    // corrupt the deflate streams / tree interior: flip bytes across the tail
    for (off <- 100 until (b.length - 8) by 97) {
      val c = b.clone(); c(off) = (c(off) ^ 0xff).toByte
      Hdf5.read(c) // may parse or fail, must never throw
    }
  }

  test("malformed HDF5: truncations and junk fail the row, never throw") {
    assume(have(s"$td/zeroes.nc"))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$td/zeroes.nc"))
    for (n <- Seq(8, 60, 100, 2000, b.length / 2)) Hdf5.read(b.take(n)) // no-throw
    assert(Hdf5.read("not hdf5 at all".getBytes).isEmpty)
    assert(Hdf5.read(Array.emptyByteArray).isEmpty)
    assert(NetCdf.read(b.take(500)).forall(_.extent.isEmpty)) // truncated: no extent claimed
  }
}
