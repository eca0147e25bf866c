package graft.table

import java.time.LocalDate

/** Deterministic closed-form payload specification for the synthetic
  * Common-Crawl-style pages corpus (BASELINE.json `input_hint`).
  *
  * Every page is derived from a single integer `d` (from the driver's testdata:
  * `d = l_orderkey*8 + l_linenumber`, unique per lineitem row). All coordinates
  * are exact binary fractions (halves/quarters/64ths) so that parse → extract →
  * aggregate round-trips are float-exact and the DuckDB oracle can recompute
  * expected values with plain SQL arithmetic.
  *
  * Payload families mirror the reference's fixture families (FIXTURES.md §1):
  * k = d%10 → 0 geojson, 1 kml, 2 gpx, 3 csv lat/lon (EPSG:4326 for
  * (d/10)%2==0, projected EPSG:3857 meters for (d/10)%2==1 — the parser must
  * reproject), 4 csv wkt/wkb geometry,
  * 5 html JSON-LD GeoShape (+ decoy ICBM, exercises the priority ladder),
  * 6 html DC.box ((d/10)%2==0) or OJS DC.SpatialCoverage administrativeUnits
  * bbox ((d/10)%2==1, ladder step 7) + DC.temporal, 7 html ICBM/geo.position
  * point, 8 text with gazetteer place + a date phrase in one of 4 grammar
  * variants (d%4: ISO dates / month-name dates / en-dash year range / month
  * range with year inheritance; + geological period on d%3==0), 9 plain text.
  *
  * Skew (north_rule): rows with d%100>=80 — 20 % of the corpus — all land on one
  * hot location (7.5, 51.5), producing hot cells that the salted join must handle.
  */
object PayloadSpec {

  val Epoch: LocalDate = LocalDate.of(2015, 1, 1)

  def kind(d: Long): Int = (d % 10).toInt
  def hot(d: Long): Boolean = d % 100 >= 80
  def lon0(d: Long): Double = if (hot(d)) 7.5 else (d * 7 % 680).toDouble / 2.0 - 170.0
  def lat0(d: Long): Double = if (hot(d)) 51.5 else (d * 3 % 320).toDouble / 2.0 - 80.0
  def w(d: Long): Double = if (hot(d)) 1.0 else (d % 5).toDouble / 2.0 + 0.5
  def h(d: Long): Double = if (hot(d)) 0.5 else (d % 7).toDouble / 4.0 + 0.25
  def lon1(d: Long): Double = lon0(d) + w(d)
  def lat1(d: Long): Double = lat0(d) + h(d)
  def dateD(d: Long): LocalDate = Epoch.plusDays(d % 1000)
  def dateEnd(d: Long): LocalDate = dateD(d).plusDays(d % 30)
  def warcTsMicros(d: Long): Long = {
    // 2020-01-01T00:00:00Z + d minutes, in epoch microseconds
    val base = java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond
    (base + d * 60L) * 1000000L
  }

  val placeNames: Array[String] = Array("Amsterdam", "Berlin", "Paris", "Madrid", "Rome")
  def placeIdx(d: Long): Int = ((d / 10) % 5).toInt
  def place(d: Long): String = placeNames(placeIdx(d))

  val periodNames: Array[String] = Array("Holocene", "Pleistocene", "Jurassic", "Cretaceous")
  def hasPeriod(d: Long): Boolean = d % 3 == 0
  def periodIdx(d: Long): Int = ((d / 10) % 4).toInt
  def period(d: Long): String = periodNames(periodIdx(d))

  private val csvDateFmts = Array(
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd"),
    java.time.format.DateTimeFormatter.ofPattern("dd.MM.uuuu"),
    java.time.format.DateTimeFormatter.ofPattern("uuuu/MM/dd"),
    java.time.format.DateTimeFormatter.ofPattern("dd-MM-uuuu"))
  def csvDateFmtIdx(d: Long): Int = ((d / 10) % 4).toInt

  private def n(v: Double): String = v.toString // exact shortest repr, round-trips via parseDouble

  /** Build the page payload document for id d (the bytes of the `html` column). */
  def payload(d: Long): String = {
    val (x0, y0, x1, y1) = (lon0(d), lat0(d), lon1(d), lat1(d))
    val dd = dateD(d).toString
    val de = dateEnd(d).toString
    kind(d) match {
      case 0 =>
        s"""{"type":"FeatureCollection","features":[{"type":"Feature","properties":{"date":"$dd"},""" +
          s""""geometry":{"type":"Polygon","coordinates":[[[${n(x0)},${n(y0)}],[${n(x1)},${n(y0)}],""" +
          s"""[${n(x1)},${n(y1)}],[${n(x0)},${n(y1)}],[${n(x0)},${n(y0)}]]]}}]}"""
      case 1 =>
        s"""<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2"><Placemark>""" +
          s"""<TimeStamp><when>$dd</when></TimeStamp><Polygon><outerBoundaryIs><LinearRing><coordinates>""" +
          s"""${n(x0)},${n(y0)},0 ${n(x1)},${n(y0)},0 ${n(x1)},${n(y1)},0 ${n(x0)},${n(y1)},0 ${n(x0)},${n(y0)},0""" +
          s"""</coordinates></LinearRing></outerBoundaryIs></Polygon></Placemark></kml>"""
      case 2 =>
        s"""<?xml version="1.0"?><gpx version="1.1" creator="graft"><metadata><time>${dd}T00:00:00Z</time></metadata>""" +
          s"""<wpt lat="${n(y0)}" lon="${n(x0)}"></wpt><wpt lat="${n(y0)}" lon="${n(x1)}"></wpt>""" +
          s"""<wpt lat="${n(y1)}" lon="${n(x1)}"></wpt><wpt lat="${n(y1)}" lon="${n(x0)}"></wpt></gpx>"""
      case 3 =>
        val ds = csvDateFmts(csvDateFmtIdx(d)).format(dateD(d))
        if ((d / 10) % 2 == 1) {
          // EPSG:3857 sub-family: the same corners as projected meters — the
          // parser must reproject (exact inverse Mercator + grid snap) before
          // the WGS84 gate; expected extent in EXT is unchanged (lon0..lat1)
          def mx(v: Double) = n(graft.geo.Geo.lonToMercX(v))
          def my(v: Double) = n(graft.geo.Geo.latToMercY(v))
          s"""Latitude,Longitude,EPSG,Name,Date
${my(y0)},${mx(x0)},3857,P0,$ds
${my(y0)},${mx(x1)},3857,P1,$ds
${my(y1)},${mx(x1)},3857,P2,$ds
${my(y1)},${mx(x0)},3857,P3,$ds"""
        } else
          s"""Latitude,Longitude,EPSG,Name,Date
${n(y0)},${n(x0)},4326,P0,$ds
${n(y0)},${n(x1)},4326,P1,$ds
${n(y1)},${n(x1)},4326,P2,$ds
${n(y1)},${n(x0)},4326,P3,$ds"""
      case 4 =>
        val geom =
          if (d % 2 == 0)
            s"POLYGON ((${n(x0)} ${n(y0)}, ${n(x1)} ${n(y0)}, ${n(x1)} ${n(y1)}, ${n(x0)} ${n(y1)}, ${n(x0)} ${n(y0)}))"
          else graft.geo.Wkt.extentToWkbHex(graft.geo.Extent(x0, y0, x1, y1))
        s"""Name,geometry
G0,"$geom""""
      case 5 =>
        // JSON-LD GeoShape box wins over the decoy ICBM per the priority ladder
        s"""<html><head><script type="application/ld+json">{"@context":"https://schema.org",""" +
          s""""@type":"Dataset","spatialCoverage":{"@type":"Place","geo":{"@type":"GeoShape",""" +
          s""""box":"${n(y0)} ${n(x0)} ${n(y1)} ${n(x1)}"}},"temporalCoverage":"$dd/$de"}</script>""" +
          s"""<meta name="ICBM" content="${n(y0 + 5.0)}, ${n(x0 + 5.0)}"></head><body>dataset page</body></html>"""
      case 6 =>
        // two sub-variants, same extent/tbox: DC.box DCSV (ladder step 6) and
        // the OJS administrativeUnits[].bbox fallback (step 7 — the
        // DC.SpatialCoverage GeoJSON wrapper has no features, so step 3 fails)
        val spatialMeta =
          if ((d / 10) % 2 == 0)
            s"""<meta name="DC.box" content="name=Study area; northlimit=${n(y1)}; """ +
              s"""southlimit=${n(y0)}; westlimit=${n(x0)}; eastlimit=${n(x1)}; projection=EPSG:4326">"""
          else
            s"""<meta name="DC.SpatialCoverage" scheme="GeoJSON" content="{&quot;type&quot;:&quot;FeatureCollection&quot;,""" +
              s"""&quot;features&quot;:[],&quot;administrativeUnits&quot;:[{&quot;name&quot;:&quot;unit0&quot;,&quot;bbox&quot;:&quot;not available&quot;},""" +
              s"""{&quot;name&quot;:&quot;unit1&quot;,&quot;bbox&quot;:[${n(x0)},${n(y0)},${n(x1)},${n(y1)}]}]}">"""
        s"""<html><head>$spatialMeta""" +
          s"""<meta name="DC.temporal" content="start=$dd; end=$de; scheme=W3C-DTF"></head><body>article</body></html>"""
      case 7 =>
        val meta =
          if ((d / 10) % 2 == 0) s"""<meta name="ICBM" content="${n(y0)}, ${n(x0)}">"""
          else s"""<meta name="geo.position" content="${n(y0)};${n(x0)}">"""
        s"""<html><head>$meta</head><body>geotagged page</body></html>"""
      case 8 =>
        s"<html><body>${text(d)}</body></html>"
      case _ =>
        s"<html><body>${text(d)}</body></html>"
    }
  }

  private val monthNameFmt =
    java.time.format.DateTimeFormatter.ofPattern("MMMM d, uuuu", java.util.Locale.ENGLISH)

  /** Date-phrase variant of a k=8 text page: 0 ISO dates, 1 month-name dates,
    * 2 en-dash year range, 3 month range with year-context inheritance —
    * exercising the reference date grammar (dates.py:33-181). Expected tbox per
    * variant is mirrored in SparkEntry.EXT (ds8/de8).
    */
  def textVariant(d: Long): Int = (d % 4).toInt

  /** The `text` column (extracted plain text; byte-identical invariant). */
  def text(d: Long): String = kind(d) match {
    case 8 =>
      val phrase = textVariant(d) match {
        case 0 => s"from ${dateD(d)} to ${dateEnd(d)}"
        case 1 => s"from ${monthNameFmt.format(dateD(d))} to ${monthNameFmt.format(dateEnd(d))}"
        case 2 => s"over ${dateD(d).getYear}–${dateEnd(d).getYear}"
        case _ => s"from January to March ${dateD(d).getYear}"
      }
      val base = s"Survey near ${place(d)} conducted $phrase."
      if (hasPeriod(d)) base + s" Deposits date to the ${period(d)}." else base
    case 9 =>
      // no digits/places/periods: the text handler must find nothing here
      "plain page with no spatial or temporal payload content at all"
    case _ =>
      s"page ${d} embeds a machine readable payload in its markup"
  }
}
