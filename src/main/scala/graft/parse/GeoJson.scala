package graft.parse

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.geo.{Extent, Geo}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** GeoJSON coordinate walker.
  *
  * Semantics per the reference's bbox-from-GeoJSON walk
  * (reference: geoextent/lib/journals/_meta.py:291-362 — recurse
  * FeatureCollection → Feature → geometry, fold every [lon,lat] leaf into a
  * running envelope) and its vector-layer extent merge
  * (reference: geoextent/lib/handle_vector.py:206-254).
  */
object GeoJson {

  private val mapper = new ObjectMapper()

  def parseJson(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s)) catch { case _: Exception => None }

  def looksLikeGeoJson(s: String): Boolean = {
    val t = s.take(4096)
    t.contains("\"type\"") &&
      (t.contains("FeatureCollection") || t.contains("\"Feature\"") ||
        t.contains("\"Point\"") || t.contains("\"Polygon\"") || t.contains("\"LineString\"") ||
        t.contains("MultiPoint") || t.contains("MultiPolygon") || t.contains("MultiLineString") ||
        t.contains("GeometryCollection"))
  }

  /** Fold every coordinate leaf of any GeoJSON node into a flat [lon,lat,…] array. */
  def collectCoords(node: JsonNode, out: ArrayBuffer[Double]): Unit = {
    if (node == null) return
    if (node.isObject) {
      val coords = node.get("coordinates")
      if (coords != null) collectCoordArray(coords, out)
      val geom = node.get("geometry")
      if (geom != null) collectCoords(geom, out)
      val geoms = node.get("geometries")
      if (geoms != null && geoms.isArray) geoms.elements().asScala.foreach(collectCoords(_, out))
      val feats = node.get("features")
      if (feats != null && feats.isArray) feats.elements().asScala.foreach(collectCoords(_, out))
    }
  }

  /** A coordinates node is either a position [lon,lat,(z)] or nested arrays of them. */
  private def collectCoordArray(node: JsonNode, out: ArrayBuffer[Double]): Unit = {
    if (!node.isArray || node.size() == 0) return
    if (node.get(0).isNumber) {
      if (node.size() >= 2) { out += node.get(0).asDouble(); out += node.get(1).asDouble() }
    } else {
      node.elements().asScala.foreach(collectCoordArray(_, out))
    }
  }

  /** Every coordinate leaf of the payload as a flat [lon,lat,…] array (the
    * vertex set the reference's convex-hull mode collects,
    * reference: geoextent/lib/handle_vector.py:257-456).
    */
  def coords(s: String): Array[Double] =
    parseJson(s).map { n =>
      val buf = ArrayBuffer.empty[Double]
      collectCoords(n, buf)
      buf.toArray
    }.getOrElse(Array.empty)

  def envelope(s: String): Option[Extent] = Geo.envelope(coords(s))

  /** Temporal properties: the reference's GeoJSON fixtures carry per-feature
    * `properties.date`-style fields; collect values of property keys matching the
    * vector temporal regex (reference: geoextent/lib/handle_vector.py:9-18 —
    * `timestamp|datetime|time|date$|^date|^begin|^end`).
    */
  private val timeKey =
    java.util.regex.Pattern.compile("(timestamp|datetime|time|date$|^date|^begin|^end)",
      java.util.regex.Pattern.CASE_INSENSITIVE)

  def timeValues(s: String): Seq[String] =
    parseJson(s).map { root =>
      val buf = ArrayBuffer.empty[String]
      def walk(n: JsonNode): Unit = {
        if (n == null) return
        if (n.isObject) {
          val props = n.get("properties")
          if (props != null && props.isObject) {
            props.properties().asScala.foreach { e =>
              if (timeKey.matcher(e.getKey).find() && e.getValue.isTextual)
                buf += e.getValue.asText()
            }
          }
          val feats = n.get("features")
          if (feats != null && feats.isArray) feats.elements().asScala.foreach(walk)
        }
      }
      walk(root)
      buf.toSeq
    }.getOrElse(Seq.empty)
}
