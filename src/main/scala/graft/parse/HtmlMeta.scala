package graft.parse

import com.fasterxml.jackson.databind.JsonNode
import graft.geo.{Extent, Geo, Wkt}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Landing-page (`html` column) metadata extent parser — the engine's flagship
  * payload kernel (SURVEY §2 P8/S8).
  *
  * Reproduces the reference's 8-source spatial priority ladder and its temporal
  * resolver (reference: geoextent/lib/content_providers/journals/_base.py:543-685):
  *   1. JSON-LD spatialCoverage/contentLocation (GeoCoordinates point, GeoShape
  *      box "lat1 lon1 lat2 lon2", GeoShape polygon "lat lon …", nested GeoJSON)
  *   2. link rel=alternate geo+json                (network fetch — N/A in-corpus)
  *   3. DC.SpatialCoverage scheme=GeoJSON
  *   4. DC.SpatialCoverage scheme=WKT
  *   5. inlined ISO 19139 EX_GeographicBoundingBox (entity-escaped XML,
  *      prefix-insensitive)
  *   6. DC.box DCSV (northlimit=…;southlimit=…)
  *   7. OJS administrativeUnits[].bbox
  *   8. ICBM "lat, lon" / geo.position "lat;lon"
  * Temporal: JSON-LD temporalCoverage ISO interval, then DC.temporal /
  * DC.PeriodOfTime "start=…; end=…" (publication dates deliberately excluded,
  * reference: _base.py:676-685).
  */
object HtmlMeta {

  final case class HtmlResult(extent: Option[Extent], spatialSource: Option[String],
                              tbox: Option[(String, String)], temporalSource: Option[String])

  def looksLikeHtml(s: String): Boolean =
    headContainsIc(s, "<html") || headContainsIc(s, "<head") ||
      headContainsIc(s, "<meta") || headContainsIc(s, "<!doctype html")

  /** Case-insensitive bounded search replacing take(4096).toLowerCase.contains
    * without the two head-sized copies. regionMatches(true) folds per char
    * with toUpperCase-then-toLowerCase, which accepts every char toLowerCase
    * maps onto these ASCII needles (the needles contain no char produced by a
    * multi-char lowercase expansion), so acceptance is unchanged.
    */
  private def headContainsIc(s: String, needle: String): Boolean =
    containsIcBounded(s, needle, 4096)

  /** Case-insensitive unbounded substring gate (superset of an ASCII-(?i)
    * regex's folding — a gate pass never skips a matchable page).
    */
  private def containsIc(s: String, needle: String): Boolean =
    containsIcBounded(s, needle, s.length)

  private def containsIcBounded(s: String, needle: String, limit: Int): Boolean = {
    val max = math.min(s.length, limit) - needle.length
    // first-char prefilter: positions that can't start a match cost one char
    // compare, not a regionMatches call (the gates run on every page)
    val c0 = needle.charAt(0)
    val c0u = Character.toUpperCase(c0)
    val c0l = Character.toLowerCase(c0u)
    var i = 0
    while (i <= max) {
      val c = s.charAt(i)
      // exact mirror of regionMatches(true)'s per-char fold (upper, then
      // lower-of-upper) so the prefilter never rejects a matchable start
      if ((c == c0l || c == c0u || Character.toUpperCase(c) == c0u ||
            Character.toLowerCase(Character.toUpperCase(c)) == c0l) &&
          s.regionMatches(true, i, needle, 0, needle.length)) return true
      i += 1
    }
    false
  }

  private val jsonLdScript =
    "(?is)<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>".r
  private val metaTag = "(?is)<meta\\s+[^>]*>".r
  private val nameAttr = "(?i)name\\s*=\\s*[\"']([^\"']+)[\"']".r
  private val contentAttr = "(?i)content\\s*=\\s*[\"']([^\"']*)[\"']".r
  private val schemeAttr = "(?i)scheme\\s*=\\s*[\"']([^\"']+)[\"']".r

  /** (name-lowercased, scheme, content) triples of all meta tags. */
  def metaTags(html: String): Seq[(String, String, String)] =
    metaTag.findAllIn(html).toSeq.flatMap { tag =>
      for {
        n <- nameAttr.findFirstMatchIn(tag).map(_.group(1).trim.toLowerCase)
        c <- contentAttr.findFirstMatchIn(tag).map(_.group(1))
      } yield (n, schemeAttr.findFirstMatchIn(tag).map(_.group(1)).getOrElse(""), unescape(c))
    }

  /** Minimal HTML entity unescape (the entities landing pages actually use for
    * inlined XML/JSON payloads, reference: _meta.py html.unescape usage).
    */
  def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&apos;", "'").replace("&amp;", "&")

  def extract(html: String): HtmlResult = {
    // gate: the script-tag regex requires "ld+json" (in SOME case — the
    // regex is (?i), so the gate must be case-insensitive too: an
    // "application/LD+JSON" page yields blocks); a page without it can't
    // match — skip the full-page regex scan
    val blocks =
      if (!containsIc(html, "ld+json")) Seq.empty[JsonNode]
      else jsonLdScript.findAllMatchIn(html).flatMap(m => GeoJson.parseJson(m.group(1))).toSeq
    // meta tags are scanned LAZILY: a page whose JSON-LD resolves both ladder
    // steps 1 (spatial) and temporal never pays the full-page meta-tag regex
    var metasCache: Seq[(String, String, String)] = null
    def metas(): Seq[(String, String, String)] = {
      if (metasCache == null) metasCache = metaTags(html)
      metasCache
    }
    val spatial = resolveSpatial(blocks, metas _)
    val temporal = resolveTemporal(blocks, metas _)
    HtmlResult(spatial.map(_._1), spatial.map(_._2), temporal.map(_._1), temporal.map(_._2))
  }

  // ---- spatial ladder ----

  private def resolveSpatial(blocks: Seq[JsonNode],
                             metasF: () => Seq[(String, String, String)]): Option[(Extent, String)] = {
    lazy val metas = metasF()
    // 1. JSON-LD
    jsonLdExtent(blocks).foreach(e => return Some((e, "jsonld")))
    // 3. DC.SpatialCoverage GeoJSON
    for ((_, scheme, c) <- metas.filter(_._1 == "dc.spatialcoverage") if scheme.equalsIgnoreCase("GeoJSON"))
      GeoJson.envelope(c).foreach(e => return Some((e, "dc.spatialcoverage:geojson")))
    // 4. DC.SpatialCoverage WKT
    for ((_, scheme, c) <- metas.filter(_._1 == "dc.spatialcoverage") if scheme.equalsIgnoreCase("WKT"))
      Wkt.envelope(c).foreach(e => return Some((e, "dc.spatialcoverage:wkt")))
    // 5. ISO 19139 snippet
    for ((n, _, c) <- metas if n.startsWith("iso 19139") || n == "iso19139")
      iso19139Bbox(c).foreach(e => return Some((e, "iso19139")))
    // 6. DC.box
    for ((n, _, c) <- metas if n == "dc.box")
      dcBox(c).foreach(e => return Some((e, "dc.box")))
    // 7. OJS administrativeUnits[].bbox fallback: the DC.SpatialCoverage
    // GeoJSON wrapper yielded no geometry at rule 3 but may still carry an
    // admin-unit bbox (reference: _base.py:616-631, _meta.py admin_unit_bbox)
    for ((_, scheme, c) <- metas.filter(_._1 == "dc.spatialcoverage") if scheme.equalsIgnoreCase("GeoJSON"))
      adminUnitBbox(c).foreach(e => return Some((e, "ojs.admin-unit")))
    // 8. ICBM / geo.position
    for ((n, _, c) <- metas if n == "icbm")
      icbm(c).foreach(e => return Some((e, "icbm")))
    for ((n, _, c) <- metas if n == "geo.position")
      geoPosition(c).foreach(e => return Some((e, "geo.position")))
    None
  }

  /** JSON-LD walk: @graph-aware node iteration, spatialCoverage/contentLocation/
    * location keys, Place → geometry coercion (reference: _base.py:253-403).
    */
  private def jsonLdExtent(blocks: Seq[JsonNode]): Option[Extent] = {
    val buf = ArrayBuffer.empty[Double]
    def iterNodes(n: JsonNode): Iterator[JsonNode] =
      if (n == null) Iterator.empty
      else if (n.isArray) n.elements().asScala.flatMap(iterNodes)
      else if (n.isObject) {
        val g = n.get("@graph")
        Iterator(n) ++ (if (g != null) iterNodes(g) else Iterator.empty)
      } else Iterator.empty
    for (block <- blocks; node <- iterNodes(block); key <- Seq("spatialCoverage", "contentLocation", "location")) {
      val target = node.get(key)
      if (target != null) {
        val places = if (target.isArray) target.elements().asScala.toSeq else Seq(target)
        places.foreach(placeCoords(_, buf))
      }
    }
    Geo.envelope(buf.toArray)
  }

  private def placeCoords(place: JsonNode, out: ArrayBuffer[Double]): Unit = {
    if (place == null || !place.isObject) return
    // direct GeoJSON geometry / wrapper
    val t = Option(place.get("type")).map(_.asText("")).getOrElse("")
    if (t.nonEmpty && (place.has("coordinates") || t == "Feature" || t == "FeatureCollection" || t == "GeometryCollection")) {
      GeoJson.collectCoords(place, out)
      return
    }
    var geo = place.get("geo")
    if (geo != null && geo.isArray) geo = if (geo.size() > 0) geo.get(0) else null
    if (geo != null && geo.isObject) {
      val gt = Option(geo.get("@type")).orElse(Option(geo.get("type"))).map(_.asText("").trim).getOrElse("")
      gt match {
        case "GeoCoordinates" =>
          (numeric(geo.get("latitude")), numeric(geo.get("longitude"))) match {
            case (Some(lat), Some(lon)) => out += lon; out += lat
            case _ =>
          }
          return
        case "GeoShape" =>
          val box = Option(geo.get("box")).map(_.asText("")).getOrElse("")
          if (box.nonEmpty) {
            val parts = XmlGeo.Ws.split(box.replace(",", " ")).filter(_.nonEmpty)
            if (parts.length == 4) {
              try {
                // schema.org GeoShape.box = "lat1 lon1 lat2 lon2"
                val lat1 = parts(0).toDouble; val lon1 = parts(1).toDouble
                val lat2 = parts(2).toDouble; val lon2 = parts(3).toDouble
                out += lon1; out += lat1; out += lon2; out += lat2
                return
              } catch { case _: NumberFormatException => }
            }
          }
          val poly = Option(geo.get("polygon")).map(_.asText("")).getOrElse("")
          if (poly.nonEmpty) {
            val parts = XmlGeo.Ws.split(poly.replace(",", " ")).filter(_.nonEmpty)
            if (parts.length >= 6 && parts.length % 2 == 0) {
              try {
                var i = 0
                while (i < parts.length) {
                  val lat = parts(i).toDouble; val lon = parts(i + 1).toDouble
                  out += lon; out += lat
                  i += 2
                }
                return
              } catch { case _: NumberFormatException => }
            }
          }
        case "Point" | "Polygon" | "MultiPolygon" | "LineString" =>
          if (geo.has("coordinates")) { GeoJson.collectCoords(geo, out); return }
        case _ =>
      }
    }
    // bare latitude/longitude on the place
    (numeric(place.get("latitude")), numeric(place.get("longitude"))) match {
      case (Some(lat), Some(lon)) => out += lon; out += lat
      case _ =>
    }
  }

  private def numeric(n: JsonNode): Option[Double] =
    if (n == null) None
    else if (n.isNumber) Some(n.asDouble())
    else if (n.isTextual) { try Some(n.asText().trim.toDouble) catch { case _: NumberFormatException => None } }
    else None

  /** ISO 19139 EX_GeographicBoundingBox — entity-escaped XML snippet, matched by
    * local element name regardless of namespace prefix (reference: _meta.py:184-225).
    * Regex-based (the snippet shape is fixed: 4 limit elements wrapping a Decimal).
    */
  def iso19139Bbox(value: String): Option[Extent] = {
    val text = unescape(value)
    def limit(name: String): Option[Double] = {
      val m = s"(?is)<(?:\\w+:)?$name[^>]*>(.*?)</(?:\\w+:)?$name>".r.findFirstMatchIn(text)
      m.flatMap { mm =>
        val inner = mm.group(1)
        val num = "[-+]?\\d+(?:\\.\\d+)?(?:[eE][-+]?\\d+)?".r.findFirstIn(inner)
        num.flatMap(s => try Some(s.toDouble) catch { case _: NumberFormatException => None })
      }
    }
    for {
      w <- limit("westBoundLongitude"); e <- limit("eastBoundLongitude")
      s <- limit("southBoundLatitude"); n <- limit("northBoundLatitude")
    } yield Extent(w, s, e, n)
  }

  /** DCMI Box: arbitrary key order, extra fields tolerated; None if any of the
    * four limits is missing or malformed (reference: _meta.py:106-128).
    */
  def dcBox(value: String): Option[Extent] = {
    val bag = scala.collection.mutable.Map.empty[String, Double]
    for (part <- value.split(";")) {
      val kv = part.split("=", 2)
      if (kv.length == 2) {
        val k = kv(0).trim.toLowerCase
        if (Set("northlimit", "southlimit", "eastlimit", "westlimit").contains(k)) {
          try bag(k) = kv(1).trim.toDouble
          catch { case _: NumberFormatException => return None }
        }
      }
    }
    for {
      n <- bag.get("northlimit"); s <- bag.get("southlimit")
      e <- bag.get("eastlimit"); w <- bag.get("westlimit")
    } yield Extent(w, s, e, n)
  }

  /** OJS `administrativeUnits[].bbox`: first unit with a usable bbox wins;
    * bbox is either a 4-number list [w,s,e,n] or a "w,s,e,n" string; the
    * "not available"-style sentinels are skipped
    * (reference: _meta.py:365-396, sentinel set _meta.py:288).
    */
  def adminUnitBbox(value: String): Option[Extent] = {
    val notAvailable = Set("not available", "n/a", "none", "null", "")
    GeoJson.parseJson(value).flatMap { root =>
      val units = if (root.isObject) root.get("administrativeUnits") else null
      if (units == null || !units.isArray) return None
      for (u <- units.elements().asScala if u.isObject) {
        val b = u.get("bbox")
        if (b != null && b.isArray && b.size() == 4) {
          try {
            val v = (0 until 4).map(i => b.get(i).asText().trim.toDouble)
            return Some(Extent(v(0), v(1), v(2), v(3)))
          } catch { case _: NumberFormatException => }
        } else if (b != null && b.isTextual && !notAvailable.contains(b.asText().trim.toLowerCase)) {
          val parts = b.asText().split(",").map(_.trim)
          if (parts.length == 4) {
            try return Some(Extent(parts(0).toDouble, parts(1).toDouble, parts(2).toDouble, parts(3).toDouble))
            catch { case _: NumberFormatException => }
          }
        }
      }
      None
    }
  }

  def icbm(value: String): Option[Extent] = {
    val parts = value.split(",").map(_.trim)
    if (parts.length != 2) return None
    try {
      val lat = parts(0).toDouble; val lon = parts(1).toDouble
      Some(Extent(lon, lat, lon, lat))
    } catch { case _: NumberFormatException => None }
  }

  def geoPosition(value: String): Option[Extent] = {
    val parts = value.split(";").map(_.trim)
    if (parts.length != 2) return None
    try {
      val lat = parts(0).toDouble; val lon = parts(1).toDouble
      Some(Extent(lon, lat, lon, lat))
    } catch { case _: NumberFormatException => None }
  }

  // ---- temporal ----

  private def resolveTemporal(blocks: Seq[JsonNode],
                              metasF: () => Seq[(String, String, String)]): Option[((String, String), String)] = {
    lazy val metas = metasF()
    // 1. JSON-LD temporalCoverage (ISO interval "start/end" or single date)
    def iterNodes(n: JsonNode): Iterator[JsonNode] =
      if (n == null) Iterator.empty
      else if (n.isArray) n.elements().asScala.flatMap(iterNodes)
      else if (n.isObject) {
        val g = n.get("@graph")
        Iterator(n) ++ (if (g != null) iterNodes(g) else Iterator.empty)
      } else Iterator.empty
    for (b <- blocks; node <- iterNodes(b)) {
      val tc = node.get("temporalCoverage")
      if (tc != null && tc.isTextual) {
        isoInterval(tc.asText()).foreach(t => return Some((t, "jsonld:temporalCoverage")))
      }
    }
    // 2/3. DC.temporal / DC.PeriodOfTime — DCMI period "start=…; end=…;" or ISO interval
    for (name <- Seq("dc.temporal", "dc.periodoftime"); (n, _, c) <- metas if n == name) {
      dcPeriod(c).orElse(isoInterval(c)).foreach(t => return Some((t, name)))
    }
    None
  }

  /** "2015-03-04/2015-04-02" (or a single date) → (startDate, endDate) as
    * ISO date strings; datetime values are truncated to their date part
    * (the reference's tbox date format, geoextent/lib/helpfunctions.py:40).
    */
  def isoInterval(value: String): Option[(String, String)] = {
    val v = value.trim
    if (v.isEmpty) return None
    val parts = v.split("/").map(_.trim)
    def datePart(s: String): Option[String] = {
      val d = if (s.length >= 10) s.substring(0, 10) else s
      DateGuess.parseOne(d).map(_.toString)
    }
    parts match {
      case Array(a) => datePart(a).map(d => (d, d))
      case Array(a, b) =>
        for (da <- datePart(a); db <- datePart(b)) yield (da, db)
      case _ => None
    }
  }

  /** DCMI period encoding "start=2015-03-04; end=2015-04-02; scheme=W3C-DTF". */
  def dcPeriod(value: String): Option[(String, String)] = {
    var start: Option[String] = None
    var end: Option[String] = None
    for (part <- value.split(";")) {
      val kv = part.split("=", 2)
      if (kv.length == 2) {
        kv(0).trim.toLowerCase match {
          case "start" => start = DateGuess.parseOne(kv(1).trim).map(_.toString)
          case "end" => end = DateGuess.parseOne(kv(1).trim).map(_.toString)
          case _ =>
        }
      }
    }
    for (s <- start; e <- end) yield (s, e)
  }
}
