package graft.parse

import graft.geo.{Extent, Geo}

import scala.collection.mutable.ArrayBuffer

/** KML / GPX / GML coordinate extraction via targeted regex scanning (no DOM —
  * the payloads are embedded snippets inside page bodies, and a streaming regex
  * scan keeps the kernel allocation-light for the hot mapPartitions path).
  *
  * Coordinate semantics mirror the reference's vector handler output
  * (reference: geoextent/lib/handle_vector.py:206-254 — layer envelope over all
  * geometry vertices): KML `<coordinates>` holds comma-separated lon,lat[,alt]
  * tuples; GPX carries lat/lon attributes on wpt/trkpt/rtept; GML posList holds
  * space-separated pairs.
  */
object XmlGeo {

  private val kmlCoords = "(?s)<coordinates>(.*?)</coordinates>".r
  private[parse] val Ws = java.util.regex.Pattern.compile("\\s+")
  private val WsComma = java.util.regex.Pattern.compile("[\\s,]+")
  private val gpxPt = """<(?:wpt|trkpt|rtept)\s+[^>]*>""".r
  private val latAttr = """lat\s*=\s*["']([-+0-9.eE]+)["']""".r
  private val lonAttr = """lon\s*=\s*["']([-+0-9.eE]+)["']""".r
  private val gmlPos = "(?s)<(?:gml:)?(?:posList|pos|coordinates)[^>]*>(.*?)</(?:gml:)?(?:posList|pos|coordinates)>".r
  private val whenTag = "(?s)<when>(.*?)</when>".r
  private val timeTag = "(?s)<time>(.*?)</time>".r

  /** take(4096).contains(needle) without the up-to-8KB substring copy: true
    * iff an occurrence lies entirely within the first 4096 chars (if the
    * FIRST occurrence ends past the bound, every later one does too).
    */
  private[parse] def containsHead(s: String, needle: String): Boolean = {
    val i = s.indexOf(needle)
    i >= 0 && i + needle.length <= 4096
  }

  def looksLikeKml(s: String): Boolean =
    containsHead(s, "<kml") || (containsHead(s, "<Placemark") && containsHead(s, "<coordinates>"))
  def looksLikeGpx(s: String): Boolean = containsHead(s, "<gpx")
  def looksLikeGml(s: String): Boolean =
    containsHead(s, "<gml:") || containsHead(s, "FeatureCollection xmlns:gml")

  def kmlCoordArray(s: String): Array[Double] = {
    val buf = ArrayBuffer.empty[Double]
    for (m <- kmlCoords.findAllMatchIn(s)) {
      // tuples separated by whitespace; within a tuple lon,lat[,alt]
      Ws.split(m.group(1)).foreach { tuple =>
        val parts = tuple.split(",")
        if (parts.length >= 2) {
          try { buf += parts(0).trim.toDouble; buf += parts(1).trim.toDouble }
          catch { case _: NumberFormatException => }
        }
      }
    }
    buf.toArray
  }

  def gpxCoordArray(s: String): Array[Double] = {
    val buf = ArrayBuffer.empty[Double]
    for (m <- gpxPt.findAllMatchIn(s)) {
      val tag = m.matched
      (latAttr.findFirstMatchIn(tag), lonAttr.findFirstMatchIn(tag)) match {
        case (Some(la), Some(lo)) =>
          try { buf += lo.group(1).toDouble; buf += la.group(1).toDouble }
          catch { case _: NumberFormatException => }
        case _ =>
      }
    }
    buf.toArray
  }

  /** OSM / Overpass-API XML (reference: testdata/osm/overpass.xml, read
    * through OGR's OSM driver): geometry lives exclusively on `<node lat=
    * lon=>` elements (ways/relations reference nodes by id), so the envelope
    * over all node coordinates IS the layer envelope; `<bounds>` boxes, when
    * present, widen it the same way OGR's spatial filter reports them.
    */
  def looksLikeOsm(s: String): Boolean =
    containsHead(s, "<osm") &&
      (containsHead(s, "generator=") || containsHead(s, "<node") || containsHead(s, "<way"))

  private val osmNode = """<node\s+[^>]*>""".r
  private val osmBounds = """<bounds\s+[^>]*>""".r
  private val minLatAttr = """minlat\s*=\s*["']([-+0-9.eE]+)["']""".r
  private val minLonAttr = """minlon\s*=\s*["']([-+0-9.eE]+)["']""".r
  private val maxLatAttr = """maxlat\s*=\s*["']([-+0-9.eE]+)["']""".r
  private val maxLonAttr = """maxlon\s*=\s*["']([-+0-9.eE]+)["']""".r

  def osmCoordArray(s: String): Array[Double] = {
    val buf = ArrayBuffer.empty[Double]
    for (m <- osmNode.findAllMatchIn(s)) {
      val tag = m.matched
      (latAttr.findFirstMatchIn(tag), lonAttr.findFirstMatchIn(tag)) match {
        case (Some(la), Some(lo)) =>
          try { buf += lo.group(1).toDouble; buf += la.group(1).toDouble }
          catch { case _: NumberFormatException => }
        case _ =>
      }
    }
    for (m <- osmBounds.findAllMatchIn(s)) {
      val tag = m.matched
      (minLonAttr.findFirstMatchIn(tag), minLatAttr.findFirstMatchIn(tag),
        maxLonAttr.findFirstMatchIn(tag), maxLatAttr.findFirstMatchIn(tag)) match {
        case (Some(a), Some(b), Some(c), Some(d)) =>
          try {
            buf += a.group(1).toDouble; buf += b.group(1).toDouble
            buf += c.group(1).toDouble; buf += d.group(1).toDouble
          } catch { case _: NumberFormatException => }
        case _ =>
      }
    }
    buf.toArray
  }

  def osmEnvelope(s: String): Option[Extent] = Geo.envelope(osmCoordArray(s))

  /** OSM element `timestamp=` attributes (ISO dateTime). */
  private val osmTimestamp = """timestamp\s*=\s*["']([^"']+)["']""".r
  def osmTimeValues(s: String): Seq[String] =
    osmTimestamp.findAllMatchIn(s).map(_.group(1).trim).toSeq

  def gmlCoordArray(s: String): Array[Double] = {
    val buf = ArrayBuffer.empty[Double]
    for (m <- gmlPos.findAllMatchIn(s)) {
      val nums = WsComma.split(m.group(1).trim).flatMap { t =>
        try Some(t.toDouble) catch { case _: NumberFormatException => None }
      }
      var i = 0
      while (i + 1 < nums.length) { buf += nums(i); buf += nums(i + 1); i += 2 }
    }
    buf.toArray
  }

  def kmlEnvelope(s: String): Option[Extent] = Geo.envelope(kmlCoordArray(s))
  def gpxEnvelope(s: String): Option[Extent] = Geo.envelope(gpxCoordArray(s))
  def gmlEnvelope(s: String): Option[Extent] = Geo.envelope(gmlCoordArray(s))

  /** KML TimeStamp `<when>` / GPX `<time>` values (date or dateTime; the date
    * part is what the reference's tbox keeps, format "%Y-%m-%d",
    * reference: geoextent/lib/helpfunctions.py:40 + handle_vector.py:114-203).
    */
  def timeValues(s: String): Seq[String] =
    (whenTag.findAllMatchIn(s).map(_.group(1).trim) ++
      timeTag.findAllMatchIn(s).map(_.group(1).trim)).toSeq
}
