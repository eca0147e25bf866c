package graft.geo

import scala.collection.mutable.ArrayBuffer

/** WKT / WKB codecs, from scratch (no JTS in /opt/spark/jars).
  *
  * Parser grammar follows the subset the reference consumes
  * (reference: geoextent/lib/journals/_meta.py:31-91 — POINT/LINESTRING/POLYGON/
  * MULTI-variants/GEOMETRYCOLLECTION, optional Z/M dims ignored beyond lon/lat).
  * Writers mirror bbox_to_wkt / bbox_to_wkb
  * (reference: geoextent/lib/helpfunctions.py:1684-1729 — NDR little-endian,
  * 21-byte point / 93-byte polygon layouts).
  */
object Wkt {

  /** Parse WKT, returning every coordinate as a flat [lon,lat,…] array, or None. */
  def coords(wkt: String): Option[Array[Double]] = {
    if (wkt == null) return None
    val s = wkt.trim
    if (s.isEmpty) return None
    val p = new Parser(s)
    try {
      val out = ArrayBuffer.empty[Double]
      p.geometry(out)
      p.skipWs()
      if (out.isEmpty || !p.atEnd) None else Some(out.toArray)
    } catch { case _: ParseError => None }
  }

  def envelope(wkt: String): Option[Extent] = coords(wkt).flatMap(Geo.envelope)

  private final class ParseError extends RuntimeException
  private final class Parser(s: String) {
    private var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def fail(): Nothing = throw new ParseError
    private def expect(c: Char): Unit = { skipWs(); if (atEnd || s.charAt(pos) != c) fail(); pos += 1 }
    private def peek: Char = { skipWs(); if (atEnd) fail(); s.charAt(pos) }

    private def ident(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetter)) pos += 1
      if (pos == start) fail()
      s.substring(start, pos).toUpperCase
    }

    private def number(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start) fail()
      try s.substring(start, pos).toDouble catch { case _: NumberFormatException => fail() }
    }

    /** point: two or more numbers; only first two (lon lat) kept. */
    private def point(out: ArrayBuffer[Double]): Unit = {
      out += number()
      out += number()
      // swallow optional Z / M ordinates
      skipWs()
      while (!atEnd && "+-0123456789.".indexOf(s.charAt(pos)) >= 0) { number(); skipWs() }
    }

    private def pointList(out: ArrayBuffer[Double]): Unit = {
      expect('(')
      point(out)
      while (peek == ',') { pos += 1; point(out) }
      expect(')')
    }

    private def ringList(out: ArrayBuffer[Double]): Unit = {
      expect('(')
      pointList(out)
      while (peek == ',') { pos += 1; pointList(out) }
      expect(')')
    }

    private def maybeDims(): Unit = {
      skipWs()
      val save = pos
      if (!atEnd && s.charAt(pos).isLetter) {
        val d = ident()
        if (d != "Z" && d != "M" && d != "ZM") { pos = save }
      }
    }

    private def maybeEmpty(): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, "EMPTY", 0, 5)) { pos += 5; true } else false
    }

    def geometry(out: ArrayBuffer[Double]): Unit = ident() match {
      case "POINT" =>
        maybeDims(); if (!maybeEmpty()) { expect('('); point(out); expect(')') }
      case "LINESTRING" | "MULTIPOINT" =>
        maybeDims()
        if (!maybeEmpty()) {
          // MULTIPOINT accepts both (1 2, 3 4) and ((1 2),(3 4))
          expect('(')
          if (peek == '(') {
            pointList(out)
            while (peek == ',') { pos += 1; pointList(out) }
          } else {
            point(out)
            while (peek == ',') { pos += 1; point(out) }
          }
          expect(')')
        }
      case "POLYGON" | "MULTILINESTRING" =>
        maybeDims(); if (!maybeEmpty()) ringList(out)
      case "MULTIPOLYGON" =>
        maybeDims()
        if (!maybeEmpty()) {
          expect('(')
          ringList(out)
          while (peek == ',') { pos += 1; ringList(out) }
          expect(')')
        }
      case "GEOMETRYCOLLECTION" =>
        maybeDims()
        if (!maybeEmpty()) {
          expect('(')
          geometry(out)
          while (peek == ',') { pos += 1; geometry(out) }
          expect(')')
        }
      case _ => fail()
    }
  }

  // ---- writers ----

  private def fmt(v: Double): String = f"$v%.6f"

  /** Extent → WKT: degenerate-point extents emit POINT, otherwise the envelope
    * POLYGON ring, closed, CCW from the min corner (reference semantics:
    * geoextent/lib/helpfunctions.py:1684-1703 + point detection 1339-1405).
    */
  def extentToWkt(e: Extent): String =
    if (e.isPoint()) s"POINT (${fmt(e.minLon)} ${fmt(e.minLat)})"
    else
      s"POLYGON ((${fmt(e.minLon)} ${fmt(e.minLat)}, ${fmt(e.maxLon)} ${fmt(e.minLat)}, " +
        s"${fmt(e.maxLon)} ${fmt(e.maxLat)}, ${fmt(e.minLon)} ${fmt(e.maxLat)}, " +
        s"${fmt(e.minLon)} ${fmt(e.minLat)}))"

  // ---- WKB (NDR / little-endian), hex-string form ----

  private def putLe(bb: java.nio.ByteBuffer, d: Double): Unit = bb.putDouble(d)

  /** Extent → hex WKB. Point extents → 21-byte WKB Point; else 93-byte WKB
    * Polygon (1 ring, 5 points), both NDR (byte order 01), matching the layouts
    * at reference: geoextent/lib/helpfunctions.py:1706-1729.
    */
  def extentToWkbHex(e: Extent): String = {
    val a = extentToWkbBytes(e)
    val sb = new StringBuilder(a.length * 2)
    a.foreach(b => sb.append(f"${b & 0xff}%02X"))
    sb.toString
  }

  /** Extent → raw WKB bytes (same layouts as [[extentToWkbHex]]); also the
    * geometry body of the GeoPackage GPB blobs written by sinks.GeoPackageWrite.
    */
  def extentToWkbBytes(e: Extent): Array[Byte] = {
    val isPt = e.isPoint()
    val size = if (isPt) 21 else 93
    val bb = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // NDR
    if (isPt) {
      bb.putInt(1) // wkbPoint
      putLe(bb, e.minLon); putLe(bb, e.minLat)
    } else {
      bb.putInt(3) // wkbPolygon
      bb.putInt(1) // 1 ring
      bb.putInt(5) // 5 points
      putLe(bb, e.minLon); putLe(bb, e.minLat)
      putLe(bb, e.maxLon); putLe(bb, e.minLat)
      putLe(bb, e.maxLon); putLe(bb, e.maxLat)
      putLe(bb, e.minLon); putLe(bb, e.maxLat)
      putLe(bb, e.minLon); putLe(bb, e.minLat)
    }
    bb.array()
  }

  /** Hex-WKB → coordinate envelope. Supports NDR/XDR Point, LineString, Polygon,
    * and Multi/collection nesting (the shapes the reference's CSV geometry-column
    * scan accepts, reference: geoextent/lib/handle_csv.py:602-642).
    */
  def wkbHexEnvelope(hex: String): Option[Extent] = {
    if (hex == null) return None
    val h = hex.trim
    if (h.isEmpty || h.length % 2 != 0 || !h.forall(c => Character.digit(c, 16) >= 0)) return None
    val bytes = new Array[Byte](h.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = ((Character.digit(h.charAt(2 * i), 16) << 4) | Character.digit(h.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    wkbEnvelope(bytes)
  }

  /** Hex-WKB → flat [lon,lat,…] vertex array (for per-payload convex hulls). */
  def wkbHexCoords(hex: String): Option[Array[Double]] = {
    if (hex == null) return None
    val h = hex.trim
    if (h.isEmpty || h.length % 2 != 0 || !h.forall(c => Character.digit(c, 16) >= 0)) return None
    val bytes = new Array[Byte](h.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = ((Character.digit(h.charAt(2 * i), 16) << 4) | Character.digit(h.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    wkbCoords(bytes)
  }

  /** Raw-WKB bytes → flat vertex array. */
  def wkbCoords(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 5) return None
    val out = ArrayBuffer.empty[Double]
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      readWkbGeom(bb, out)
      if (out.isEmpty) None else Some(out.toArray)
    } catch { case _: Exception => None }
  }

  /** Raw-WKB bytes → coordinate envelope (the reference's CSV geometry-column
    * scan also accepts raw binary WKB values, reference:
    * geoextent/lib/handle_csv.py:602-642 — WKT → hex-WKB → raw-WKB ladder).
    */
  def wkbEnvelope(bytes: Array[Byte]): Option[Extent] = wkbCoords(bytes).flatMap(Geo.envelope)

  private def readWkbGeom(bb: java.nio.ByteBuffer, out: ArrayBuffer[Double]): Unit = {
    val order = bb.get()
    if (order != 0 && order != 1) throw new IllegalArgumentException(s"wkb byte order $order")
    bb.order(if (order == 1) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    val rawType = bb.getInt()
    // dimensionality can be flagged two ways (both appear in the wild):
    //   EWKB: Z = 0x80000000, M = 0x40000000, SRID present = 0x20000000
    //   ISO:  type = base + 1000·k with k ∈ {1 (Z), 2 (M), 3 (ZM)}
    val ewkbZ = (rawType & 0x80000000) != 0
    val ewkbM = (rawType & 0x40000000) != 0
    val hasSrid = (rawType & 0x20000000) != 0
    val isoK = (rawType & 0x1fffffff) / 1000
    if (isoK > 3) throw new IllegalArgumentException(s"wkb iso dim code $isoK")
    val isoZ = isoK == 1 || isoK == 3
    val isoM = isoK == 2 || isoK == 3
    val geomType = (rawType & 0x1fffffff) % 1000
    val dims = 2 + (if (ewkbZ || isoZ) 1 else 0) + (if (ewkbM || isoM) 1 else 0)
    if (hasSrid) bb.getInt() // skip the EWKB SRID
    def readPoint(): Unit = {
      out += bb.getDouble(); out += bb.getDouble()
      var k = 2
      while (k < dims) { bb.getDouble(); k += 1 }
    }
    geomType match {
      case 1 => readPoint()
      case 2 =>
        val n = bb.getInt(); (0 until n).foreach(_ => readPoint())
      case 3 =>
        val rings = bb.getInt()
        (0 until rings).foreach { _ =>
          val n = bb.getInt(); (0 until n).foreach(_ => readPoint())
        }
      case 4 | 5 | 6 | 7 =>
        val n = bb.getInt(); (0 until n).foreach(_ => readWkbGeom(bb, out))
      case _ => throw new IllegalArgumentException(s"wkb type $geomType")
    }
  }

  /** S12 geojson.io URL sink — the URL-fragment encoding path of the
    * reference's generate_geojsonio_url (reference:
    * geoextent/lib/helpfunctions.py:2173-2325 + the fragment contract locked
    * by tests/help_functions_test.py:130-180): a FeatureCollection rendering
    * the extent geometry, percent-encoded into
    * `https://geojson.io/#data=data:application/json,…`; optional `inputs`
    * provenance list in the Feature properties. Payloads above the library's
    * 150 KB fragment limit would need the (network) gist fallback → None.
    */
  def geojsonIoUrl(e: Extent, inputs: Seq[String] = Nil): Option[String] = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val props =
      if (inputs.isEmpty) "{}"
      else s"""{"inputs":[${inputs.map(jstr).mkString(",")}]}"""
    val fc = s"""{"type":"FeatureCollection","features":[{"type":"Feature",""" +
      s""""properties":$props,"geometry":${extentToGeoJson(e)}}]}"""
    if (fc.length > 150000) None
    else {
      // percent-encoding (urllib.parse.quote semantics: %20 for spaces)
      val enc = java.net.URLEncoder.encode(fc, "UTF-8").replace("+", "%20")
      Some("https://geojson.io/#data=data:application/json," + enc)
    }
  }

  /** Extent → GeoJSON geometry string (Point for degenerate, Polygon otherwise),
    * matching bbox_to_geojson semantics (reference: geoextent/lib/helpfunctions.py:1732-1755).
    */
  def extentToGeoJson(e: Extent): String =
    if (e.isPoint())
      s"""{"type":"Point","coordinates":[${fmt(e.minLon)},${fmt(e.minLat)}]}"""
    else
      s"""{"type":"Polygon","coordinates":[[[${fmt(e.minLon)},${fmt(e.minLat)}],""" +
        s"""[${fmt(e.maxLon)},${fmt(e.minLat)}],[${fmt(e.maxLon)},${fmt(e.maxLat)}],""" +
        s"""[${fmt(e.minLon)},${fmt(e.maxLat)}],[${fmt(e.minLon)},${fmt(e.minLat)}]]]}"""
}
