package graft.parse

import graft.geo.{Extent, Geo, Wkt}

import scala.collection.mutable.ArrayBuffer

/** CSV payload extent extraction — the reference's 3-stage fallback re-expressed
  * as one deterministic Scala kernel (reference: geoextent/lib/handle_csv.py:499-599):
  *   stage 1/2: a geometry column (name-matched) parsed as WKT, then hex-WKB
  *              (reference: handle_csv.py:334-496, value parser 602-642);
  *   stage 3:   lat/lon columns matched by the column-name regex tables
  *              (reference: handle_csv.py:19-50, copied verbatim below) with
  *              numeric coercion min/max.
  * Temporal: time column by regex + format-guess ladder, min/max
  * (reference: handle_csv.py:860-906).
  */
object CsvGeo {

  // Column-name regex tables, order-sensitive (reference: handle_csv.py:19-50).
  private def rx(p: String) = java.util.regex.Pattern.compile(p, java.util.regex.Pattern.CASE_INSENSITIVE)
  private val lonPatterns = Array(
    "(.)*longitude", "(.)*long(.)*", "^lon", "lon$", "(.)*lng(.)*", "^x", "x$").map(rx)
  private val latPatterns = Array(
    "(.)*latitude(.)*", "^lat", "lat$", "^y", "y$").map(rx)
  private val geomPatterns = Array(
    "^geometry$", "(.)*geometry(.)*", "^wkt$", "(.)*wkt(.)*", "^wkb$", "(.)*wkb(.)*",
    "^coordinates$", "^coordinates", "coordinates$", "(.)*coordinates(.)*",
    "^coords$", "^coords", "coords$", "(.)*coords(.)*", "(.)*geom(.)*").map(rx)
  private val timePatterns = Array(
    "(.)*timestamp(.)*", "(.)*datetime(.)*", "(.)*time(.)*", "date$", "^date").map(rx)
  private val crsPatterns = Array("^crs$", "^srsid$", "^epsg$").map(rx)

  /** Does a column NAME look temporal (shared with the .dbf attribute-table
    * reader — same reference name-pattern semantics)?
    */
  def isDateColumnName(name: String): Boolean =
    timePatterns.exists(_.matcher(name.trim).find())

  private def findColumn(header: Array[String], patterns: Array[java.util.regex.Pattern]): Option[Int] = {
    for (p <- patterns; (h, i) <- header.zipWithIndex)
      if (p.matcher(h.trim).find()) return Some(i)
    None
  }

  /** ALL columns matching any pattern, in pattern-priority order — the
    * reference pools every matching column's values before min/max
    * (reference: geoextent/lib/helpfunctions.py:216-236 search_for_parameters
    * concatenates all matches, e.g. both "Centroid time (JST)" and "(UTC)").
    */
  private def findColumns(header: Array[String], patterns: Array[java.util.regex.Pattern]): Seq[Int] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[Int]
    for (p <- patterns; (h, i) <- header.zipWithIndex)
      if (p.matcher(h.trim).find()) out += i
    out.toSeq
  }

  /** Minimal CSV tokenizer: quoted fields (RFC4180 double-quote escape),
    * delimiter sniffed from the header among [,;\t|] by max count
    * (reference sniffs via csv.Sniffer, geoextent/lib/helpfunctions.py:394-398).
    */
  def parseCsv(payload: String): Option[(Array[String], Array[Array[String]])] = {
    val lines = payload.split("\r?\n").iterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toArray
    if (lines.length < 2) return None
    val delim = Array(',', ';', '\t', '|').maxBy(d => lines(0).count(_ == d))
    if (lines(0).count(_ == delim) == 0) return None
    def splitLine(l: String): Array[String] = {
      val out = ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inQ = false
      var i = 0
      while (i < l.length) {
        val c = l.charAt(i)
        if (inQ) {
          if (c == '"') {
            if (i + 1 < l.length && l.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
            else inQ = false
          } else sb.append(c)
        } else if (c == '"') inQ = true
        else if (c == delim) { out += sb.toString; sb.clear() }
        else sb.append(c)
        i += 1
      }
      out += sb.toString
      out.toArray
    }
    val header = splitLine(lines(0))
    val rows = lines.drop(1).map(splitLine)
    Some((header, rows))
  }

  /** Does the payload look like a coordinate-bearing CSV? Supported iff a header
    * row exists and either a geometry column or both lat+lon columns match
    * (reference support probe: geoextent/lib/handle_csv.py:113-165).
    */
  def isSupported(payload: String): Boolean =
    parseCsv(payload).exists { case (header, _) => headerSupported(header) }

  private def headerSupported(header: Array[String]): Boolean =
    findColumn(header, geomPatterns).isDefined ||
      (findColumn(header, latPatterns).isDefined && findColumn(header, lonPatterns).isDefined)

  final case class CsvResult(extent: Option[Extent], tbox: Option[(String, String)], crs: String,
                             verts: Array[Double])

  /** Support probe + extraction in ONE tokenizer pass (the hot mapPartitions
    * dispatch path would otherwise tokenize every CSV payload twice).
    */
  def extractIfSupported(payload: String): Option[CsvResult] =
    parseCsv(payload).filter { case (header, _) => headerSupported(header) }
      .map { case (header, rows) => extractParsed(header, rows) }

  def extract(payload: String): Option[CsvResult] =
    parseCsv(payload).map { case (header, rows) => extractParsed(header, rows) }

  private def extractParsed(header: Array[String], rows: Array[Array[String]]): CsvResult = {
    val (extent0, verts0) = extractExtent(header, rows)
    val tbox = extractTbox(header, rows)
    val crsRaw = findColumn(header, crsPatterns).flatMap { ci =>
      rows.headOption.map(_.lift(ci).getOrElse("4326").trim)
    }.filter(_.nonEmpty).getOrElse("4326")
    // CRS carry-through + transform: projected EPSG:3857 coordinates are
    // reprojected to WGS84 (exact spherical inverse + 2^-20-degree grid snap,
    // see graft.geo.Geo), mirroring the reference's to-4326 transform path
    // (reference: geoextent/lib/handle_csv.py:311-312, helpfunctions.py:239-363);
    // other CRSs pass through untransformed and face the plausibility gate.
    val epsg = crsRaw.toUpperCase.stripPrefix("EPSG:")
    val (extent, verts, crs) =
      if (epsg == "3857")
        (extent0.map(Geo.mercExtentToWgs84), Geo.mercArrayToWgs84(verts0), "4326")
      else (extent0, verts0, crsRaw)
    CsvResult(extent.filter(Geo.plausibleWgs84), tbox, crs, verts)
  }

  private val wktPrefixes = Array("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")

  /** One geometry value → vertex array via the reference's parse ladder
    * (reference: geoextent/lib/handle_csv.py:602-642): WKT-prefixed values as
    * WKT; else hex-WKB; else the value's bytes as raw WKB; last resort WKT.
    */
  def geometryValueCoords(v: String): Option[Array[Double]] = {
    val t = v.trim
    if (t.isEmpty) return None
    val up = t.toUpperCase
    if (wktPrefixes.exists(up.startsWith)) Wkt.coords(t)
    else Wkt.wkbHexCoords(t)
      // raw WKB must see the UNtrimmed value: its byte-order marker byte 0x01
      // is a control character that trim would strip
      .orElse(Wkt.wkbCoords(v.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .orElse(Wkt.coords(t))
  }

  /** Extent + the vertex set it came from (vertices feed per-payload hulls,
    * reference CSV hull mode: geoextent/lib/handle_csv.py:645-857).
    */
  private def extractExtent(header: Array[String], rows: Array[Array[String]]): (Option[Extent], Array[Double]) = {
    // stage 1/2: geometry column (WKT → hex-WKB → raw-WKB), running envelope
    findColumn(header, geomPatterns) match {
      case Some(gi) =>
        val verts = ArrayBuffer.empty[Double]
        for (r <- rows; v <- r.lift(gi); c <- geometryValueCoords(v)) verts ++= c
        if (verts.nonEmpty) return (Geo.envelope(verts.toArray), verts.toArray)
      case None =>
    }
    // stage 3: lat/lon columns (ALL matches pooled), numeric coercion min/max
    val latIdx = findColumns(header, latPatterns)
    val lonIdx = findColumns(header, lonPatterns)
    if (latIdx.isEmpty || lonIdx.isEmpty) return (None, Array.empty)
    def pool(idxs: Seq[Int]): Array[Double] =
      (for (r <- rows; i <- idxs; v <- r.lift(i);
            d <- try Some(v.trim.toDouble) catch { case _: NumberFormatException => None })
        yield d).toArray
    val lons = pool(lonIdx)
    val lats = pool(latIdx)
    if (lons.isEmpty || lats.isEmpty) (None, Array.empty)
    else {
      // row-wise (lon,lat) points from the first matching column pair — the
      // vertex set of the reference's CSV hull path (the pooled min/max above
      // remains the envelope contract when several columns match)
      val li = latIdx.head; val lo = lonIdx.head
      val verts = ArrayBuffer.empty[Double]
      for (r <- rows) {
        val p = for {
          vLon <- r.lift(lo); vLat <- r.lift(li)
          dLon <- try Some(vLon.trim.toDouble) catch { case _: NumberFormatException => None }
          dLat <- try Some(vLat.trim.toDouble) catch { case _: NumberFormatException => None }
        } yield (dLon, dLat)
        p.foreach { case (x, y) => verts += x; verts += y }
      }
      (Some(Extent(lons.min, lats.min, lons.max, lats.max)), verts.toArray)
    }
  }

  private def extractTbox(header: Array[String], rows: Array[Array[String]]): Option[(String, String)] = {
    // all time-matching columns pooled, per the reference (per-column format
    // guess, union min/max — helpfunctions.py:216-236 + handle_csv.py:860-906)
    val cols = findColumns(header, timePatterns)
    if (cols.isEmpty) return None
    val dates = cols.flatMap { ti =>
      val values = rows.flatMap(_.lift(ti)).filter(_.trim.nonEmpty).toSeq
      DateGuess.parseColumn(values)
    }
    if (dates.isEmpty) None
    else Some((dates.min.toString, dates.max.toString))
  }
}
