package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the Zarr store reader against the reference's fixtures
  * (expectations from tests/test_api_zarr.py).
  */
class ZarrSpec extends AnyFunSuite {

  private val td = "/root/reference/tests/testdata/zarr"
  private def have(p: String): Boolean = new java.io.File(p).exists()

  /** Store directory → (relative path, bytes) members. */
  private def store(dir: String): Seq[(String, Array[Byte])] = {
    val root = java.nio.file.Paths.get(dir)
    val out = Seq.newBuilder[(String, Array[Byte])]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p))
        out += ((root.relativize(p).toString, java.nio.file.Files.readAllBytes(p)))
    }
    out.result()
  }

  test("zarr v2 golden: wgs84_v2 bbox [7,51,8,52] (cell centers + half step)") {
    assume(have(s"$td/wgs84_v2.zarr"))
    val r = Zarr.readStore(store(s"$td/wgs84_v2.zarr")).get
    assert(r.crs === "4326")
    assert(math.abs(r.extent.minLon - 7.0) < 1e-6)
    assert(math.abs(r.extent.minLat - 51.0) < 1e-6)
    assert(math.abs(r.extent.maxLon - 8.0) < 1e-6)
    assert(math.abs(r.extent.maxLat - 52.0) < 1e-6)
  }

  test("zarr v2 golden: utm32n_v2 transforms through the UTM inverse to the Muenster bbox") {
    assume(have(s"$td/utm32n_v2.zarr"))
    val r = Zarr.readStore(store(s"$td/utm32n_v2.zarr")).get
    // reference expectation ([minlat, minlon, maxlat, maxlon]):
    // [51.8878, 7.2563, 51.9798, 7.3984]
    assert(r.crs === "4326")
    assert(math.abs(r.extent.minLon - 7.2563) < 1e-3)
    assert(math.abs(r.extent.minLat - 51.8878) < 1e-3)
    assert(math.abs(r.extent.maxLon - 7.3984) < 1e-3)
    assert(math.abs(r.extent.maxLat - 51.9798) < 1e-3)
  }

  test("zarr v3 golden: wgs84_v3 bbox [7,51,8,52]") {
    assume(have(s"$td/wgs84_v3.zarr"))
    val r = Zarr.readStore(store(s"$td/wgs84_v3.zarr")).get
    assert(r.crs === "4326")
    assert(math.abs(r.extent.minLon - 7.0) < 1e-6)
    assert(math.abs(r.extent.maxLat - 52.0) < 1e-6)
  }

  test("zarr v2: zlib chunks, multi-chunk concatenation, and shape-trimmed fill tail") {
    def zlib(d: Array[Double]): Array[Byte] = {
      val raw = java.nio.ByteBuffer.allocate(d.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      d.foreach(raw.putDouble)
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw.array()); defl.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    }
    def meta(shape: Int, chunk: Int) =
      s"""{"chunks":[$chunk],"compressor":{"id":"zlib"},"dtype":"<f8","shape":[$shape],"zarr_format":2}"""
        .getBytes("UTF-8")
    // X: shape 5, chunks of 4 -> last chunk padded with a poison fill value
    // that MUST be trimmed away
    val files = Seq(
      "X/.zarray" -> meta(5, 4),
      "X/0" -> zlib(Array(10.0, 10.1, 10.2, 10.3)),
      "X/1" -> zlib(Array(10.4, -9999.0, -9999.0, -9999.0)),
      "Y/.zarray" -> meta(2, 2),
      "Y/0" -> zlib(Array(50.0, 50.1)))
    val r = Zarr.readStore(files).get
    assert(r.nx === 5 && r.ny === 2)
    assert(math.abs(r.extent.minLon - (10.0 - 0.05)) < 1e-9) // fill NOT in the extent
    assert(math.abs(r.extent.maxLon - (10.4 + 0.05)) < 1e-9)
    assert(r.crs === "4326") // plausible-WGS84 heuristic
    // unsupported compressor must fail loudly, not decode garbage
    val bad = files.map { case (k, v) =>
      if (k == "X/.zarray")
        k -> """{"chunks":[4],"compressor":{"id":"blosc"},"dtype":"<f8","shape":[5],"zarr_format":2}""".getBytes("UTF-8")
      else k -> v
    }
    intercept[IllegalArgumentException](Zarr.readStore(bad))
  }

  test("zarr no-crs golden: implausible coordinates do not masquerade as WGS84") {
    assume(have(s"$td/no_crs_v2.zarr"))
    val r = Zarr.readStore(store(s"$td/no_crs_v2.zarr")).get
    assert(r.crs === "unknown")
  }
}
