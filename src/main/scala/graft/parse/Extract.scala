package graft.parse

import graft.geo.{Extent, Geo}

/** Per-page extraction: ordered handler dispatch → (handler, extent, tbox, source).
  *
  * Probe order preserves the reference's short-circuit dispatch, cheapest sniff
  * first (reference: geoextent/lib/extent.py:58-64 + loop 1094-1103 —
  * CSV → pointcloud → raster → vector → text; pointcloud/raster are struct
  * fixtures, not embeddable payloads, so the payload chain here is
  * CSV → vector(GeoJSON/KML/GPX/GML) → HTML-meta → text).
  *
  * Gates applied to every extracted extent:
  *   - WGS84 plausibility (reference: geoextent/lib/helpfunctions.py:366-383)
  *   - null-island skip `[0,0,0,0]` (reference: geoextent/lib/handle_vector.py:222-228)
  */
object Extract {

  /** Flat, Spark-encodable extraction record (nullable fields → None).
    * `hull` is the per-payload convex hull of the payload's actual geometry
    * vertices (flat interleaved [lon,lat,…], open CCW ring / single point),
    * mirroring the reference's convex_hull=True mode
    * (reference: geoextent/lib/handle_vector.py:257-456, handle_csv.py:645-857);
    * payloads that only carry an extent (HTML metadata) promote it to its
    * corner set, matching the merge-side degenerate promotion rules
    * (reference: geoextent/lib/helpfunctions.py:778-871).
    */
  final case class ExtractOut(
      handler: String,
      minLon: Option[Double], minLat: Option[Double],
      maxLon: Option[Double], maxLat: Option[Double],
      tboxStart: Option[String], tboxEnd: Option[String],
      srcTag: Option[String],
      crs: String,
      hull: Option[Array[Double]])

  private val none = ExtractOut("none", None, None, None, None, None, None, None, "4326", None)

  private def gate(e: Option[Extent]): Option[Extent] =
    e.filter(Geo.plausibleWgs84).filterNot(_.isNullIsland)

  private def hullOf(verts: Array[Double], e: Extent): Array[Double] = {
    val src =
      if (verts != null && verts.length >= 2) verts
      else if (e.isPoint(0.0)) Array(e.minLon, e.minLat)
      else Array(e.minLon, e.minLat, e.maxLon, e.minLat, e.maxLon, e.maxLat, e.minLon, e.maxLat)
    val pts = new Array[(Double, Double)](src.length / 2)
    var i = 0
    while (i < pts.length) { pts(i) = (src(2 * i), src(2 * i + 1)); i += 1 }
    val h = Geo.convexHull(pts)
    val out = new Array[Double](h.length * 2)
    i = 0
    while (i < h.length) { out(2 * i) = h(i)._1; out(2 * i + 1) = h(i)._2; i += 1 }
    out
  }

  private def out(handler: String, e: Option[Extent], t: Option[(String, String)],
                  src: Option[String] = None, crs: String = "4326",
                  verts: Array[Double] = null): ExtractOut = {
    val g = gate(e)
    ExtractOut(handler, g.map(_.minLon), g.map(_.minLat), g.map(_.maxLon), g.map(_.maxLat),
      t.map(_._1), t.map(_._2), src, crs, g.map(hullOf(verts, _)))
  }

  /** Payload-source-only extraction: the full dispatch chain MINUS the HTML
    * landing-page metadata handler — the "download the resource" side of the
    * reference's two-source preference (reference: extent.py:1881-1999, where
    * the remote path extracts from the downloaded payload first and falls back
    * to landing-page metadata). Pairs with [[extractMetaOnly]] under a
    * per-row coalesce (SparkEntry q53).
    */
  def extractPayloadOnly(htmlBytes: Array[Byte], text: String, lang: String): ExtractOut =
    extract(htmlBytes, text, lang, useHtmlMeta = false)

  /** Metadata-source-only extraction: the HTML landing-page handler alone
    * (same plausibility/null-island gates as the full chain).
    */
  def extractMetaOnly(htmlBytes: Array[Byte]): ExtractOut = {
    if (htmlBytes == null || htmlBytes.isEmpty) return none
    val payload = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    if (!HtmlMeta.looksLikeHtml(payload)) return none
    val r = HtmlMeta.extract(payload)
    if (r.extent.isDefined || r.tbox.isDefined) out("html", r.extent, r.tbox, r.spatialSource)
    else none
  }

  def extract(htmlBytes: Array[Byte], text: String, lang: String): ExtractOut =
    extract(htmlBytes, text, lang, useHtmlMeta = true)

  private def extract(htmlBytes: Array[Byte], text: String, lang: String,
                      useHtmlMeta: Boolean): ExtractOut = {
    val payload =
      if (htmlBytes != null && htmlBytes.nonEmpty) new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
      else if (text != null) text
      else return none

    // 1. CSV — cheap pre-gate first: a payload opening with markup/JSON can
    // never satisfy the CSV support probe (its header must match coordinate
    // column names), so skip the tokenizer for those instead of paying a full
    // line-split per page. Preserves the reference's CSV-first claim order for
    // every payload CSV could actually claim.
    val head = firstNonWs(payload)
    if (head != '<' && head != '{') {
      CsvGeo.extractIfSupported(payload) match {
        case Some(r) => return out("csv", r.extent, r.tbox, None, r.crs, r.verts)
        case None =>
      }
    }
    // 2. vector payloads (a GeoJSON document starts with its JSON value — an
    // HTML page merely EMBEDDING GeoJSON in a meta attribute must fall through
    // to the HTML handler, mirroring the reference where journal pages never
    // reach the vector handler)
    if ((head == '{' || head == '[') && GeoJson.looksLikeGeoJson(payload)) {
      val cs = GeoJson.coords(payload)
      val dates = DateGuess.parseColumn(GeoJson.timeValues(payload))
      val t = if (dates.isEmpty) None else Some((dates.min.toString, dates.max.toString))
      return out("vector", Geo.envelope(cs), t, verts = cs)
    }
    if (XmlGeo.looksLikeKml(payload)) {
      val cs = XmlGeo.kmlCoordArray(payload)
      return out("vector", Geo.envelope(cs), timesOf(XmlGeo.timeValues(payload)), verts = cs)
    }
    if (XmlGeo.looksLikeGpx(payload)) {
      val cs = XmlGeo.gpxCoordArray(payload)
      return out("vector", Geo.envelope(cs), timesOf(XmlGeo.timeValues(payload)), verts = cs)
    }
    if (XmlGeo.looksLikeOsm(payload)) {
      val cs = XmlGeo.osmCoordArray(payload)
      return out("vector", Geo.envelope(cs), timesOf(XmlGeo.osmTimeValues(payload)), verts = cs)
    }
    if (XmlGeo.looksLikeGml(payload)) {
      val cs = XmlGeo.gmlCoordArray(payload)
      return out("vector", Geo.envelope(cs), timesOf(XmlGeo.timeValues(payload)), verts = cs)
    }
    // 3. HTML landing-page metadata
    if (useHtmlMeta && HtmlMeta.looksLikeHtml(payload)) {
      val r = HtmlMeta.extract(payload)
      if (r.extent.isDefined || r.tbox.isDefined)
        return out("html", r.extent, r.tbox, r.spatialSource)
      // fall through: an HTML wrapper with no metadata defers to the text handler
    }
    // 4. text (language-gated like the reference's opt-in text path,
    //    reference: geoextent/lib/handle_text.py:59-81)
    if (lang == null || lang.isEmpty || lang.startsWith("en")) {
      val body = if (text != null && text.nonEmpty) text else payload
      val r = TextGeo.extract(body)
      // vertex set = the resolved gazetteer hit points (polygon boundaries
      // would contribute their envelope corners, reference: handle_text.py:165-186)
      val pts = r.points.flatMap { case (lon, lat) => Seq(lon, lat) }.toArray
      return out("text", r.extent, r.tbox, verts = pts)
    }
    none
  }

  private def firstNonWs(s: String): Char = {
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i < s.length) s.charAt(i) else ' '
  }

  private def timesOf(values: Seq[String]): Option[(String, String)] = {
    val dates = DateGuess.parseColumn(values)
    if (dates.isEmpty) None else Some((dates.min.toString, dates.max.toString))
  }
}
