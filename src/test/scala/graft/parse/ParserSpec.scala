package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Extent

class ParserSpec extends AnyFunSuite {

  // ---- HtmlMeta priority ladder (reference journals/_base.py:543-649) ----

  test("JSON-LD GeoShape box beats ICBM decoy") {
    val html =
      """<html><head><script type="application/ld+json">{"@type":"Dataset",
        |"spatialCoverage":{"@type":"Place","geo":{"@type":"GeoShape","box":"51.5 7.5 52.0 8.25"}}}</script>
        |<meta name="ICBM" content="99.0, 99.0"></head></html>""".stripMargin
    val r = HtmlMeta.extract(html)
    assert(r.extent === Some(Extent(7.5, 51.5, 8.25, 52.0)))
    assert(r.spatialSource === Some("jsonld"))
  }

  test("JSON-LD script tag with uppercase type (LD+JSON) still extracts") {
    // the script-tag regex is (?i); the cheap presence gate in front of it
    // must be case-insensitive too (regression: a case-sensitive indexOf
    // gate silently dropped uppercase-typed blocks)
    val html =
      """<html><head><script type="application/LD+JSON">{"@type":"Dataset",
        |"spatialCoverage":{"@type":"Place","geo":{"@type":"GeoShape","box":"51.5 7.5 52.0 8.25"}}}</script>
        |</head></html>""".stripMargin
    val r = HtmlMeta.extract(html)
    assert(r.extent === Some(Extent(7.5, 51.5, 8.25, 52.0)))
    assert(r.spatialSource === Some("jsonld"))
  }

  test("JSON-LD GeoCoordinates point and @graph nesting") {
    val html =
      """<html><head><script type="application/ld+json">{"@graph":[{"@type":"Dataset",
        |"spatialCoverage":{"@type":"Place","geo":{"@type":"GeoCoordinates","latitude":51.5,"longitude":7.5}}}]}
        |</script></head></html>""".stripMargin
    assert(HtmlMeta.extract(html).extent === Some(Extent(7.5, 51.5, 7.5, 51.5)))
  }

  test("JSON-LD GeoShape polygon 'lat lon …'") {
    val html =
      """<html><head><script type="application/ld+json">{"spatialCoverage":{"geo":
        |{"@type":"GeoShape","polygon":"0 0 0 4 3 4 3 0"}}}</script></head></html>""".stripMargin
    assert(HtmlMeta.extract(html).extent === Some(Extent(0, 0, 4, 3)))
  }

  test("DC.SpatialCoverage WKT (priority 4)") {
    val html =
      """<html><head><meta name="DC.SpatialCoverage" scheme="WKT" content="POLYGON ((1 2, 3 2, 3 4, 1 4, 1 2))">
        |</head></html>""".stripMargin
    val r = HtmlMeta.extract(html)
    assert(r.extent === Some(Extent(1, 2, 3, 4)))
    assert(r.spatialSource === Some("dc.spatialcoverage:wkt"))
  }

  test("ISO 19139 entity-escaped snippet, prefix-insensitive (reference _meta.py:184-225)") {
    val snippet = "&lt;gmd:EX_GeographicBoundingBox&gt;&lt;gmd:westBoundLongitude&gt;&lt;gco:Decimal&gt;5.5&lt;/gco:Decimal&gt;&lt;/gmd:westBoundLongitude&gt;" +
      "&lt;gmd:eastBoundLongitude&gt;&lt;gco:Decimal&gt;6.5&lt;/gco:Decimal&gt;&lt;/gmd:eastBoundLongitude&gt;" +
      "&lt;gmd:southBoundLatitude&gt;&lt;gco:Decimal&gt;50.0&lt;/gco:Decimal&gt;&lt;/gmd:southBoundLatitude&gt;" +
      "&lt;gmd:northBoundLatitude&gt;&lt;gco:Decimal&gt;51.0&lt;/gco:Decimal&gt;&lt;/gmd:northBoundLatitude&gt;&lt;/gmd:EX_GeographicBoundingBox&gt;"
    val html = s"""<html><head><meta name="ISO 19139" content="$snippet"></head></html>"""
    val r = HtmlMeta.extract(html)
    assert(r.extent === Some(Extent(5.5, 50.0, 6.5, 51.0)))
    assert(r.spatialSource === Some("iso19139"))
  }

  test("DC.box arbitrary key order, missing limit → None (reference _meta.py:106-128)") {
    assert(HtmlMeta.dcBox("name=x; southlimit=1; northlimit=2; westlimit=3; eastlimit=4; projection=EPSG:4326")
      === Some(Extent(3, 1, 4, 2)))
    assert(HtmlMeta.dcBox("southlimit=1; northlimit=2; westlimit=3").isEmpty)
    assert(HtmlMeta.dcBox("southlimit=abc; northlimit=2; westlimit=3; eastlimit=4").isEmpty)
  }

  test("ICBM and geo.position (reference _meta.py:248-281)") {
    assert(HtmlMeta.icbm("51.5, 7.5") === Some(Extent(7.5, 51.5, 7.5, 51.5)))
    assert(HtmlMeta.icbm("51.5").isEmpty)
    assert(HtmlMeta.geoPosition("51.5;7.5") === Some(Extent(7.5, 51.5, 7.5, 51.5)))
  }

  test("temporal: JSON-LD temporalCoverage interval then DC.temporal") {
    val html1 =
      """<html><head><script type="application/ld+json">{"temporalCoverage":"2015-03-04/2015-04-02"}</script>
        |<meta name="DC.temporal" content="start=1999-01-01; end=1999-12-31;"></head></html>""".stripMargin
    val r1 = HtmlMeta.extract(html1)
    assert(r1.tbox === Some(("2015-03-04", "2015-04-02")))
    assert(r1.temporalSource === Some("jsonld:temporalCoverage"))
    val html2 = """<html><head><meta name="DC.temporal" content="start=1999-01-01; end=1999-12-31; scheme=W3C-DTF"></head></html>"""
    assert(HtmlMeta.extract(html2).tbox === Some(("1999-01-01", "1999-12-31")))
  }

  // ---- CsvGeo (reference handle_csv.py) ----

  test("CSV stage-3 lat/lon columns with name variants (reference handle_csv.py:19-50)") {
    for ((latCol, lonCol) <- Seq(("Latitude", "Longitude"), ("LAT", "LONG"), ("lat", "lng"), ("y", "x"))) {
      val csv = s"$latCol,$lonCol,Name\n51.0,7.0,a\n52.5,8.5,b"
      val r = CsvGeo.extract(csv)
      assert(r.exists(_.extent === Some(Extent(7.0, 51.0, 8.5, 52.5))), s"cols $latCol/$lonCol: $r")
    }
  }

  test("CSV geometry column: WKT then hex-WKB fallback (reference handle_csv.py:334-496)") {
    val wktCsv = "Name,geometry\na,\"POLYGON ((1 2, 3 2, 3 4, 1 4, 1 2))\"\nb,\"POINT (10 20)\""
    assert(CsvGeo.extract(wktCsv).get.extent === Some(Extent(1, 2, 10, 20)))
    val hex = graft.geo.Wkt.extentToWkbHex(Extent(5, 6, 7, 8))
    val wkbCsv = s"Name,wkb\na,$hex"
    assert(CsvGeo.extract(wkbCsv).get.extent === Some(Extent(5, 6, 7, 8)))
  }

  test("CSV semicolon delimiter sniffing and quoted commas") {
    val csv = "Latitude;Longitude;Name\n51.0;7.0;\"a;b\"\n52.0;8.0;c"
    assert(CsvGeo.extract(csv).get.extent === Some(Extent(7.0, 51.0, 8.0, 52.0)))
  }

  test("GeoCSV '#'-prefixed header lines are stripped (reference handle_csv.py:53-101)") {
    val csv = "# dataset: GeoCSV 2.0\n# delimiter: ,\nLatitude,Longitude\n51.0,7.0\n52.0,8.0"
    assert(CsvGeo.extract(csv).get.extent === Some(Extent(7.0, 51.0, 8.0, 52.0)))
  }

  test("CSV CRS column pickup (reference handle_csv.py:909-955)") {
    val csv = "Latitude,Longitude,EPSG\n51.0,7.0,4326"
    assert(CsvGeo.extract(csv).get.crs === "4326")
  }

  test("CSV EPSG:3857 meters reproject to exact WGS84 (reference handle_csv.py:311-312)") {
    import graft.geo.Geo
    def mx(v: Double) = Geo.lonToMercX(v).toString
    def my(v: Double) = Geo.latToMercY(v).toString
    val csv = s"Latitude,Longitude,EPSG\n${my(40.5)},${mx(-3.625)},3857\n${my(52.5)},${mx(13.375)},3857"
    val r = CsvGeo.extract(csv).get
    assert(r.extent === Some(Extent(-3.625, 40.5, 13.375, 52.5))) // bit-exact
    assert(r.crs === "4326")
    assert(r.verts.toList === List(-3.625, 40.5, 13.375, 52.5))
    // untransformed meters would have failed the WGS84 plausibility gate
    val noCrs = s"Latitude,Longitude\n${my(40.5)},${mx(-3.625)}\n${my(52.5)},${mx(13.375)}"
    assert(CsvGeo.extract(noCrs).get.extent === None)
  }

  test("CSV time column + format ladder (reference handle_csv.py:860-906)") {
    val csv = "Latitude,Longitude,Date\n51.0,7.0,05.03.2016\n52.0,8.0,06.03.2016"
    assert(CsvGeo.extract(csv).get.tbox === Some(("2016-03-05", "2016-03-06")))
  }

  test("GML posList/pos extraction") {
    val gml =
      """<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml"><gml:featureMember>
        |<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>1.0 2.0 3.0 2.0 3.0 4.0 1.0 2.0</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon></gml:featureMember></gml:FeatureCollection>""".stripMargin
    assert(XmlGeo.looksLikeGml(gml))
    assert(XmlGeo.gmlEnvelope(gml) === Some(Extent(1.0, 2.0, 3.0, 4.0)))
  }

  // ---- DateGuess ladder (reference helpfunctions.py:486-513) ----

  test("format ladder: order-sensitive day-first preference") {
    assert(DateGuess.parseOne("2016-03-05").get.toString === "2016-03-05")
    assert(DateGuess.parseOne("05.03.2016").get.toString === "2016-03-05")
    assert(DateGuess.parseOne("2016/03/05").get.toString === "2016-03-05")
    assert(DateGuess.parseOne("05-03-2016").get.toString === "2016-03-05") // %d-%m-%Y before %m-%d-%Y
    assert(DateGuess.parseOne("04/03/2016").get.toString === "2016-03-04") // %d/%m/%Y wins
    assert(DateGuess.parseOne("2013-01-01T12:30:45Z").get.toString === "2013-01-01")
    assert(DateGuess.parseOne("23 March 2023").get.toString === "2023-03-23")
    assert(DateGuess.parseOne("20230323").get.toString === "2023-03-23")
    assert(DateGuess.parseOne("not a date").isEmpty)
  }

  // ---- TextGeo (reference text_extraction/dates.py, gazetteer) ----

  test("text: between-range, decade, century (reference dates.py:33-181)") {
    assert(TextGeo.extract("measurements between 2010 and 2015 here").tbox ===
      Some(("2010-01-01", "2015-12-31")))
    assert(TextGeo.extract("during the 1990s a lot happened").tbox ===
      Some(("1990-01-01", "1999-12-31")))
    assert(TextGeo.extract("built in the 19th century").tbox ===
      Some(("1801-01-01", "1900-12-31")))
  }

  test("text: geological period beats overlapping dates; deep-time signed ISO") {
    val r = TextGeo.extract("Deposits date to the Holocene.")
    assert(r.tbox === Some(("-9750-01-01", "1950-01-01")))
    assert(r.periods.map(_.value) === Seq("Holocene"))
  }

  test("text: gazetteer places with char offsets") {
    val r = TextGeo.extract("From Amsterdam to Berlin by train.")
    assert(r.places.map(_.value).sorted === Seq("Amsterdam", "Berlin"))
    val a = r.places.find(_.value == "Amsterdam").get
    assert(a.charStart === 5 && a.charEnd === 14)
    // envelope over both points
    assert(r.extent === Some(Extent(4.875, 52.375, 13.375, 52.5)))
  }

  test("text: word-boundary matching (no substring hits)") {
    val r = TextGeo.extract("The Parisian cafe")
    assert(r.places.isEmpty) // 'Paris' inside 'Parisian' must not match
    // a non-ASCII LETTER before the name is also a word-interior position:
    // the ASCII token regex starts a fresh run at 'P', so the Unicode
    // boundary check on the preceding char must reject it (round-5 fix)
    assert(TextGeo.extract("caféParis rocks").places.isEmpty)
    assert(TextGeo.extract("café Paris rocks").places.map(_.value) === Seq("Paris"))
  }

  // ---- RasterHeader (reference handle_raster.py) ----

  test("raster corner math (reference handle_raster.py:99-106)") {
    val e = RasterHeader.extent(Array(10.0, 0.5, 0.0, 20.0, 0.0, -0.25), 20, 40, 4326)
    assert(e === Some(Extent(10.0, 10.0, 20.0, 20.0)))
  }

  test("raster temporal priority chain (reference handle_raster.py:344-398)") {
    // CF wins
    assert(RasterHeader.tbox("days since 2000-01-01", Array(0.0, 31.0), "2010-01-01", "2010-12-31", "2020:05:05 00:00:00", null)
      === Some(("2000-01-01", "2000-02-01")))
    // then ACDD
    assert(RasterHeader.tbox(null, null, "2010-01-01", "2010-12-31", "2020:05:05 00:00:00", null)
      === Some(("2010-01-01", "2010-12-31")))
    // then TIFFTAG %Y:%m:%d
    assert(RasterHeader.tbox(null, null, null, null, "2020:05:05 12:00:00", null)
      === Some(("2020-05-05", "2020-05-05")))
  }

  // ---- dispatch (reference extent.py:58-64) ----

  test("handler dispatch order: CSV claims before vector/html/text") {
    val csv = "Latitude,Longitude\n51.0,7.0"
    assert(Extract.extract(csv.getBytes("UTF-8"), "", "en").handler === "csv")
    val gj = """{"type":"Point","coordinates":[7.5,51.5]}"""
    assert(Extract.extract(gj.getBytes("UTF-8"), "", "en").handler === "vector")
    val html = """<html><head><meta name="ICBM" content="51.5, 7.5"></head></html>"""
    assert(Extract.extract(html.getBytes("UTF-8"), "", "en").handler === "html")
    val wrapper = "<html><body>Survey near Paris.</body></html>"
    assert(Extract.extract(wrapper.getBytes("UTF-8"), "Survey near Paris.", "en").handler === "text")
  }

  test("two-source split: payload-only skips HTML metadata, meta-only sees only it") {
    val html = """<html><head><meta name="ICBM" content="51.5, 7.5"></head></html>""".getBytes("UTF-8")
    assert(Extract.extract(html, "no geo here", "en").handler === "html")
    // payload-only: the HTML handler is skipped, text fallback finds nothing
    assert(Extract.extractPayloadOnly(html, "no geo here", "en").minLon === None)
    assert(Extract.extractMetaOnly(html).minLon === Some(7.5))
    val gj = """{"type":"Point","coordinates":[7.5,51.5]}""".getBytes("UTF-8")
    assert(Extract.extractPayloadOnly(gj, "", "en").minLon === Some(7.5))
    assert(Extract.extractMetaOnly(gj).minLon === None) // a GeoJSON doc has no meta tags
  }

  test("html ladder step 7: OJS administrativeUnits bbox fallback (reference _base.py:616-631)") {
    // list-form bbox; the "not available" sentinel unit is skipped
    val ojs = """{"type":"FeatureCollection","features":[],"administrativeUnits":[""" +
      """{"name":"u0","bbox":"not available"},{"name":"u1","bbox":[4.5,50.25,5.5,51.0]}]}"""
    assert(HtmlMeta.adminUnitBbox(ojs) === Some(graft.geo.Extent(4.5, 50.25, 5.5, 51.0)))
    // string-form "w,s,e,n" bbox
    val ojsStr = """{"administrativeUnits":[{"bbox":"1.5, 2.5, 3.5, 4.5"}]}"""
    assert(HtmlMeta.adminUnitBbox(ojsStr) === Some(graft.geo.Extent(1.5, 2.5, 3.5, 4.5)))
    // no usable unit
    assert(HtmlMeta.adminUnitBbox("""{"administrativeUnits":[{"bbox":"n/a"}]}""").isEmpty)
    // end-to-end: step 3 fails (features empty) and step 7 claims the extent
    val html = "<html><head><meta name=\"DC.SpatialCoverage\" scheme=\"GeoJSON\" content=\"" +
      "{&quot;type&quot;:&quot;FeatureCollection&quot;,&quot;features&quot;:[]," +
      "&quot;administrativeUnits&quot;:[{&quot;bbox&quot;:[4.5,50.25,5.5,51.0]}]}\"></head></html>"
    val r = HtmlMeta.extract(html)
    assert(r.extent === Some(graft.geo.Extent(4.5, 50.25, 5.5, 51.0)))
    assert(r.spatialSource === Some("ojs.admin-unit"))
  }

  test("html ladder: rule-3 feature geometry beats rule-7 admin-unit bbox") {
    val html = "<html><head><meta name=\"DC.SpatialCoverage\" scheme=\"GeoJSON\" content=\"" +
      "{&quot;type&quot;:&quot;FeatureCollection&quot;,&quot;features&quot;:[{&quot;type&quot;:&quot;Feature&quot;," +
      "&quot;geometry&quot;:{&quot;type&quot;:&quot;Point&quot;,&quot;coordinates&quot;:[7.5,51.5]}}]," +
      "&quot;administrativeUnits&quot;:[{&quot;bbox&quot;:[1.0,2.0,3.0,4.0]}]}\"></head></html>"
    val r = HtmlMeta.extract(html)
    assert(r.spatialSource === Some("dc.spatialcoverage:geojson"))
    assert(r.extent === Some(graft.geo.Extent(7.5, 51.5, 7.5, 51.5)))
  }

  test("dispatch: HTML page embedding GeoJSON in a meta attribute is html, not vector") {
    val d = 16L // k=6, (d/10)%2==1 → OJS sub-variant
    val payload = graft.table.PayloadSpec.payload(d)
    val r = Extract.extract(payload.getBytes("UTF-8"), graft.table.PayloadSpec.text(d), "en")
    assert(r.handler === "html")
    assert(r.srcTag === Some("ojs.admin-unit"))
    assert(r.minLon === Some(graft.table.PayloadSpec.lon0(d)))
    assert(r.maxLat === Some(graft.table.PayloadSpec.lat1(d)))
  }

  test("gazetteer ambiguity: drop skips multi-hit names, top takes the ranked head (reference gazetteer.py:594-650)") {
    val t = "Fieldwork in Springfield and Paris."
    val dropped = TextGeo.extract(t, "drop")
    // both mentions are provenance spans
    assert(dropped.places.map(_.value).sorted === Seq("Paris", "Springfield"))
    // but only the unambiguous Paris resolves → extent is the Paris point
    assert(dropped.points === Seq((2.375, 48.875)))
    assert(dropped.extent === Some(graft.geo.Extent(2.375, 48.875, 2.375, 48.875)))
    val top = TextGeo.extract(t, "top")
    assert(top.points.toSet === Set((2.375, 48.875), (-89.625, 39.75)))
    assert(top.extent === Some(graft.geo.Extent(-89.625, 39.75, 2.375, 48.875)))
  }

  test("text date grammar: month-name dates, en-dash ranges, month-range year inheritance") {
    val r1 = TextGeo.extract("Collected March 5, 2024 and 7 April 2024.")
    assert(r1.tbox === Some(("2024-03-05", "2024-04-07")))
    assert(r1.dates.map(_.value) === Seq("March 5, 2024", "7 April 2024"))
    val r2 = TextGeo.extract("Deposits span 1820\u20131850 in the record.")
    assert(r2.tbox === Some(("1820-01-01", "1850-12-31")))
    val r3 = TextGeo.extract("Sampling from January to March 2024 was continuous.")
    assert(r3.tbox === Some(("2024-01-01", "2024-03-31")))
    assert(r3.dates.map(_.value) === Seq("January to March 2024"))
    val r4 = TextGeo.extract("Observed in February 2023 only.")
    assert(r4.tbox === Some(("2023-02-01", "2023-02-28")))
  }

  test("csv geometry value ladder: raw-WKB bytes after WKT and hex-WKB (reference handle_csv.py:602-642)") {
    // POINT(2 3) raw little-endian WKB — all bytes are valid single-byte UTF-8,
    // so the value survives the payload's string round trip
    val raw = new String(Array[Byte](1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 64, 0, 0, 0, 0, 0, 0, 8, 64), "ISO-8859-1")
    assert(CsvGeo.geometryValueCoords(raw).map(_.toList) === Some(List(2.0, 3.0)))
    // WKT and hex-WKB still take precedence on their shapes
    assert(CsvGeo.geometryValueCoords("POINT (5 6)").map(_.toList) === Some(List(5.0, 6.0)))
    assert(CsvGeo.geometryValueCoords(graft.geo.Wkt.extentToWkbHex(graft.geo.Extent(1, 2, 1, 2))).map(_.toList) === Some(List(1.0, 2.0)))
  }

  test("auxiliary-file skip drops sidecar urls (reference extent.py:434-466)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq("https://x/a.tif", "https://x/a.tif.OVR", "https://x/b.aux.xml",
      "https://x/c.TIFF.xml", "https://x/d.msk", "https://x/keep.geojson")
      .toDF("url")
    val kept = graft.operators.Extractor.skipAuxiliary(df).as[String].collect().toSet
    assert(kept === Set("https://x/a.tif", "https://x/keep.geojson"))
  }

  test("reference text-temporal goldens (tests/test_api_text_temporal.py:53-110)") {
    // single ISO day
    assert(TextGeo.extract("On 2024-05-12 the survey ran.").tbox === Some(("2024-05-12", "2024-05-12")))
    // decade envelope
    assert(TextGeo.extract("The site was first surveyed in the 1990s.").tbox ===
      Some(("1990-01-01", "1999-12-31")))
    // between-range split
    assert(TextGeo.extract("Monitoring ran between 2010 and 2015.").tbox ===
      Some(("2010-01-01", "2015-12-31")))
    // Holocene period (ICS GTS2020 signed-ISO)
    val hol = TextGeo.extract("Sediment cores cover the Holocene.")
    assert(hol.tbox === Some(("-9750-01-01", "1950-01-01")))
    assert(hol.periods.map(_.value) === Seq("Holocene"))
    // Pleistocene end boundary
    assert(TextGeo.extract("Pleistocene cores below the modern surface.").tbox.get._2 === "-9750-01-01")
    // mixed period + explicit date
    val mixed = TextGeo.extract("Cores from the Holocene with a re-survey in 2024-05-12.")
    assert(mixed.tbox === Some(("-9750-01-01", "2024-05-12")))
    assert(mixed.periods.nonEmpty && mixed.dates.nonEmpty)
  }

  test("full ICS period table: multiword epoch phrases and aliases (reference test_api_text_temporal.py:129-141)") {
    val r = TextGeo.extract("Fossils from the Late Cretaceous strata.")
    assert(r.periods.map(_.value) === Seq("Late Cretaceous"))
    assert(r.tbox === Some(("-100498050-01-01", "-65998050-01-01")))
    // the multiword epoch wins over the contained period name
    assert(!r.periods.exists(_.value == "Cretaceous"))
    // alias surface resolves to the canonical name with alias-length offsets
    val a = TextGeo.extract("Dated to the Jurassic Period by index fossils.")
    assert(a.periods.map(_.value) === Seq("Jurassic"))
    assert(a.periods.head.charEnd - a.periods.head.charStart === "Jurassic Period".length)
    // 178 entries present
    assert(graft.parse.PeriodTable.entries.size === 178)
  }
}
