package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class WktSignedIsoSpec extends AnyFunSuite {

  test("WKT parse: all geometry types") {
    assert(Wkt.envelope("POINT (7.5 51.25)") === Some(Extent(7.5, 51.25, 7.5, 51.25)))
    assert(Wkt.envelope("LINESTRING (0 0, 10 5, -2 3)") === Some(Extent(-2, 0, 10, 5)))
    assert(Wkt.envelope("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))") === Some(Extent(0, 0, 4, 3)))
    assert(Wkt.envelope("POLYGON ((0 0, 4 0, 4 3, 0 0), (1 1, 2 1, 2 2, 1 1))") === Some(Extent(0, 0, 4, 3)))
    assert(Wkt.envelope("MULTIPOINT ((1 2), (3 4))") === Some(Extent(1, 2, 3, 4)))
    assert(Wkt.envelope("MULTIPOINT (1 2, 3 4)") === Some(Extent(1, 2, 3, 4)))
    assert(Wkt.envelope("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))") === Some(Extent(0, 0, 6, 6)))
    assert(Wkt.envelope("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (3 4, 5 6))") === Some(Extent(1, 2, 5, 6)))
    assert(Wkt.envelope("POINT Z (1 2 3)") === Some(Extent(1, 2, 1, 2)))
  }

  test("WKT parse: malformed inputs rejected") {
    assert(Wkt.envelope("POINT ()").isEmpty)
    assert(Wkt.envelope("NOTAGEOM (1 2)").isEmpty)
    assert(Wkt.envelope("POLYGON ((0 0, 1 1)").isEmpty) // unbalanced
    assert(Wkt.envelope("").isEmpty)
    assert(Wkt.envelope(null).isEmpty)
    assert(Wkt.envelope("POINT EMPTY").isEmpty)
  }

  test("WKT writer: polygon and degenerate point (reference helpfunctions.py:1684-1703)") {
    assert(Wkt.extentToWkt(Extent(-1.5, 2.0, 3.0, 4.0)) ===
      "POLYGON ((-1.500000 2.000000, 3.000000 2.000000, 3.000000 4.000000, -1.500000 4.000000, -1.500000 2.000000))")
    assert(Wkt.extentToWkt(Extent(7.5, 51.5, 7.5, 51.5)) === "POINT (7.500000 51.500000)")
  }

  test("WKB hex roundtrip: extent → wkb → envelope (reference helpfunctions.py:1706-1729 layouts)") {
    val e = Extent(-12.25, 3.5, 44.75, 60.0)
    val hex = Wkt.extentToWkbHex(e)
    assert(hex.length === 93 * 2)
    assert(hex.startsWith("01" + "03000000")) // NDR polygon
    assert(Wkt.wkbHexEnvelope(hex) === Some(e))
    val p = Extent(5.5, -7.25, 5.5, -7.25)
    val hexP = Wkt.extentToWkbHex(p)
    assert(hexP.length === 21 * 2)
    assert(Wkt.wkbHexEnvelope(hexP) === Some(p))
  }

  test("WKB parse rejects garbage") {
    assert(Wkt.wkbHexEnvelope("zzzz").isEmpty)
    assert(Wkt.wkbHexEnvelope("01").isEmpty)
    assert(Wkt.wkbHexEnvelope("").isEmpty)
  }

  test("GeoJSON writer") {
    assert(Wkt.extentToGeoJson(Extent(1.0, 2.0, 1.0, 2.0)) ===
      """{"type":"Point","coordinates":[1.000000,2.000000]}""")
    assert(Wkt.extentToGeoJson(Extent(0, 0, 1, 1)).startsWith("""{"type":"Polygon""""))
  }

  test("signed-ISO deep time compare (reference helpfunctions.py:66-118)") {
    assert(SignedIso.parse("-9750-01-01") === Some((-9750L, 1, 1)))
    assert(SignedIso.parse("2015-03-04") === Some((2015L, 3, 4)))
    assert(SignedIso.parse("garbage").isEmpty)
    assert(SignedIso.min("-9750-01-01", "2015-01-01") === "-9750-01-01")
    assert(SignedIso.max("-9750-01-01", "1950-01-01") === "1950-01-01")
    assert(SignedIso.min("-144998050-01-01", "-9750-01-01") === "-144998050-01-01")
    assert(SignedIso.min(null, "2015-01-01") === "2015-01-01")
    assert(SignedIso.max("2015-01-01", null) === "2015-01-01")
  }

  test("Holocene envelope golden (reference periods.json / README.md:81-84)") {
    val (s, e) = graft.parse.TextGeo.periods("Holocene")
    assert(s === "-9750-01-01" && e === "1950-01-01")
  }

  test("geojson.io URL sink: fragment round-trips the FeatureCollection with inputs (reference help_functions_test.py:130-180)") {
    val e = Extent(-74.0059, 40.7128, -73.9352, 40.7589)
    val url = Wkt.geojsonIoUrl(e, Seq("tests/testdata/geojson/muenster_ring_zeit.geojson")).get
    assert(url.startsWith("https://geojson.io/#data=data:application/json,"))
    val frag = url.split("data=data:application/json,")(1)
    val json = java.net.URLDecoder.decode(frag, "UTF-8")
    val node = graft.parse.GeoJson.parseJson(json).get
    val feat = node.get("features").get(0)
    assert(feat.get("properties").get("inputs").get(0).asText()
      === "tests/testdata/geojson/muenster_ring_zeit.geojson")
    // geometry envelope round-trips to the extent
    assert(graft.geo.Geo.envelope({
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      graft.parse.GeoJson.collectCoords(feat, b); b.toArray
    }).get === Extent(-74.005900, 40.712800, -73.935200, 40.758900))
    // no inputs → no inputs key
    val u2 = Wkt.geojsonIoUrl(e).get
    val j2 = java.net.URLDecoder.decode(u2.split("data=data:application/json,")(1), "UTF-8")
    assert(!j2.contains("inputs"))
  }
}
