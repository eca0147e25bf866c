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

  /** Flat, Spark-encodable extraction record (nullable fields → None). */
  final case class ExtractOut(
      handler: String,
      minLon: Option[Double], minLat: Option[Double],
      maxLon: Option[Double], maxLat: Option[Double],
      tboxStart: Option[String], tboxEnd: Option[String],
      srcTag: Option[String],
      crs: String)

  private val none = ExtractOut("none", None, None, None, None, None, None, None, "4326")

  private def gate(e: Option[Extent]): Option[Extent] =
    e.filter(Geo.plausibleWgs84).filterNot(_.isNullIsland)

  private def out(handler: String, e: Option[Extent], t: Option[(String, String)],
                  src: Option[String] = None, crs: String = "4326"): ExtractOut = {
    val g = gate(e)
    ExtractOut(handler, g.map(_.minLon), g.map(_.minLat), g.map(_.maxLon), g.map(_.maxLat),
      t.map(_._1), t.map(_._2), src, crs)
  }

  def extract(htmlBytes: Array[Byte], text: String, lang: String): ExtractOut = {
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
    if (head != '<' && head != '{' && CsvGeo.isSupported(payload)) {
      CsvGeo.extract(payload) match {
        case Some(r) => return out("csv", r.extent, r.tbox, None, r.crs)
        case None =>
      }
    }
    // 2. vector payloads
    if (GeoJson.looksLikeGeoJson(payload)) {
      val e = GeoJson.envelope(payload)
      val dates = DateGuess.parseColumn(GeoJson.timeValues(payload))
      val t = if (dates.isEmpty) None else Some((dates.min.toString, dates.max.toString))
      return out("vector", e, t)
    }
    if (XmlGeo.looksLikeKml(payload))
      return out("vector", XmlGeo.kmlEnvelope(payload), timesOf(XmlGeo.timeValues(payload)))
    if (XmlGeo.looksLikeGpx(payload))
      return out("vector", XmlGeo.gpxEnvelope(payload), timesOf(XmlGeo.timeValues(payload)))
    if (XmlGeo.looksLikeGml(payload))
      return out("vector", XmlGeo.gmlEnvelope(payload), timesOf(XmlGeo.timeValues(payload)))
    // 3. HTML landing-page metadata
    if (HtmlMeta.looksLikeHtml(payload)) {
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
      return out("text", r.extent, r.tbox)
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
