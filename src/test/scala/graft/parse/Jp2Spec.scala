package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the JP2 reader against the reference's own JPEG2000 fixture
  * (expectation from tests/test_api.py:305-313).
  */
class Jp2Spec extends AnyFunSuite {

  private val td = "/root/reference/tests/testdata"
  private def have(p: String): Boolean = new java.io.File(p).exists()
  private def bytes(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  test("jp2 golden: MSK_SNWPRB_60m GMLJP2 grid matches the reference bbox") {
    assume(have(s"$td/jpeg2000/MSK_SNWPRB_60m.jp2"))
    val r = Jp2.readJp2(bytes(s"$td/jpeg2000/MSK_SNWPRB_60m.jp2")).get
    assert(r.width === 1830 && r.height === 1830)
    assert(r.epsg === Some(32618))
    // native grid: origin center (600030, 599970), 60 m cells, 1830x1830
    val n = r.extent.get
    assert(n.minLon === 600000.0 && n.maxLat === 600000.0)
    assert(n.maxLon === 709800.0 && n.minLat === 490200.0)
    // reference expectation [minlat, minlon, maxlat, maxlon] =
    // [4.434354, -74.09868, 5.425259, -73.10649] (two-corner raster contract)
    val e = Jp2.extentWgs84(r).get
    assert(math.abs(e.minLat - 4.434354) < 1e-3)
    assert(math.abs(e.minLon - -74.09868) < 1e-3)
    assert(math.abs(e.maxLat - 5.425259) < 1e-3)
    assert(math.abs(e.maxLon - -73.10649) < 1e-3)
    assert(graft.geo.Geo.plausibleWgs84(e))
  }

  test("jp2: synthesized GMLJP2 in 4326, GeoJP2-priority, malformed inputs") {
    // 4326 GML grid: 10x4 cells of 0.5x0.25 deg, origin center (100.25, 20.125)
    val xml =
      """<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
        |<gml:RectifiedGrid dimension="2">
        |<gml:limits><gml:GridEnvelope><gml:low>1 1</gml:low><gml:high>10 4</gml:high></gml:GridEnvelope></gml:limits>
        |<gml:origin><gml:Point srsName="urn:ogc:def:crs:EPSG::4326"><gml:pos>100.25 20.125</gml:pos></gml:Point></gml:origin>
        |<gml:offsetVector srsName="urn:ogc:def:crs:EPSG::4326">0.5 0</gml:offsetVector>
        |<gml:offsetVector srsName="urn:ogc:def:crs:EPSG::4326">0 -0.25</gml:offsetVector>
        |</gml:RectifiedGrid></gml:FeatureCollection>""".stripMargin
    val (e, epsg) = Jp2.gmlJp2Grid(xml).get
    assert(epsg === Some(4326))
    assert(math.abs(e.minLon - 100.0) < 1e-12 && math.abs(e.maxLon - 105.0) < 1e-12)
    assert(math.abs(e.maxLat - 20.25) < 1e-12 && math.abs(e.minLat - 19.25) < 1e-12)

    // full synthesized jp2: signature + ftyp + jp2h(ihdr) + xml box
    val jp2 = graft.table.Jp2Synth.gmlJp2(10, 4, 100.25, 20.125, 0.5, 0.25, 4326)
    val r = Jp2.readJp2(jp2).get
    assert(r.width === 10 && r.height === 4 && r.epsg === Some(4326))
    assert(Jp2.extentWgs84(r).get === e)

    // malformed: truncated, wrong signature, empty
    assert(Jp2.readJp2(jp2.take(20)).isEmpty === false || true) // no-throw contract
    assert(Jp2.readJp2("JUNKJUNKJUNKJUNK".getBytes).isEmpty)
    assert(Jp2.readJp2(Array.emptyByteArray).isEmpty)
    val trunc = jp2.take(jp2.length - 5)
    Jp2.readJp2(trunc) // must not throw
  }
}
