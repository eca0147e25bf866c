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

  // Column-name pattern tables, order-sensitive (reference: handle_csv.py:19-50).
  // The reference's regexes are all literal shapes — `(.)*name(.)*` under
  // `find()` is substring containment, `^name`/`name$` are prefix/suffix,
  // `^name$` is equality — so they are matched here with direct string ops on
  // an ASCII-lowercased header (the regexes used CASE_INSENSITIVE without
  // UNICODE_CASE, i.e. ASCII-only folding; identical acceptance by
  // construction, ~10× cheaper than 35 regex probes per header cell on the
  // kernel's hottest branch).
  private final val C = 0 // contains
  private final val P = 1 // prefix
  private final val S = 2 // suffix
  private final val E = 3 // equals
  private val lonPatterns: Array[(Int, String)] = Array(
    (C, "longitude"), (C, "long"), (P, "lon"), (S, "lon"), (C, "lng"), (P, "x"), (S, "x"))
  private val latPatterns: Array[(Int, String)] = Array(
    (C, "latitude"), (P, "lat"), (S, "lat"), (P, "y"), (S, "y"))
  private val geomPatterns: Array[(Int, String)] = Array(
    (E, "geometry"), (C, "geometry"), (E, "wkt"), (C, "wkt"), (E, "wkb"), (C, "wkb"),
    (E, "coordinates"), (P, "coordinates"), (S, "coordinates"), (C, "coordinates"),
    (E, "coords"), (P, "coords"), (S, "coords"), (C, "coords"), (C, "geom"))
  private val timePatterns: Array[(Int, String)] = Array(
    (C, "timestamp"), (C, "datetime"), (C, "time"), (S, "date"), (P, "date"))
  private val crsPatterns: Array[(Int, String)] = Array((E, "crs"), (E, "srsid"), (E, "epsg"))

  /** ASCII-only lowercase (the CASE_INSENSITIVE regex fold the tables used). */
  private def asciiLower(s: String): String = {
    var i = 0
    var needs = false
    while (i < s.length && !needs) { val c = s.charAt(i); if (c >= 'A' && c <= 'Z') needs = true; i += 1 }
    if (!needs) s
    else {
      val a = s.toCharArray
      var j = 0
      while (j < a.length) { val c = a(j); if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar; j += 1 }
      new String(a)
    }
  }

  private def matches(p: (Int, String), h: String): Boolean = p._1 match {
    case C => h.contains(p._2)
    case P => h.startsWith(p._2)
    case S => h.endsWith(p._2)
    case _ => h == p._2
  }

  /** Does a column NAME look temporal (shared with the .dbf attribute-table
    * reader — same reference name-pattern semantics)?
    */
  def isDateColumnName(name: String): Boolean = {
    val h = asciiLower(name.trim)
    timePatterns.exists(matches(_, h))
  }

  private def normHeader(header: Array[String]): Array[String] =
    header.map(h => asciiLower(h.trim))

  private def findColumn(norm: Array[String], patterns: Array[(Int, String)]): Option[Int] = {
    for (p <- patterns; i <- norm.indices)
      if (matches(p, norm(i))) return Some(i)
    None
  }

  /** ALL columns matching any pattern, in pattern-priority order — the
    * reference pools every matching column's values before min/max
    * (reference: geoextent/lib/helpfunctions.py:216-236 search_for_parameters
    * concatenates all matches, e.g. both "Centroid time (JST)" and "(UTC)").
    */
  private def findColumns(norm: Array[String], patterns: Array[(Int, String)]): Seq[Int] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[Int]
    for (p <- patterns; i <- norm.indices)
      if (matches(p, norm(i))) out += i
    out.toSeq
  }

  /** Minimal CSV tokenizer: quoted fields (RFC4180 double-quote escape),
    * delimiter sniffed from the header among [,;\t|] by max count
    * (reference sniffs via csv.Sniffer, geoextent/lib/helpfunctions.py:394-398).
    */
  private val LineSplit = java.util.regex.Pattern.compile("\r?\n")

  def parseCsv(payload: String): Option[(Array[String], Array[Array[String]])] = {
    val lines = LineSplit.split(payload).iterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toArray
    if (lines.length < 2) return None
    val delim = Array(',', ';', '\t', '|').maxBy(d => lines(0).count(_ == d))
    if (lines(0).count(_ == delim) == 0) return None
    def splitLine(l: String): Array[String] = {
      // quote-free fast path (the overwhelmingly common row shape): plain
      // substring splits, no per-char StringBuilder — identical output to
      // the quoted branch below when no '"' is present
      if (l.indexOf('"') < 0) {
        val out = ArrayBuffer.empty[String]
        var start = 0
        var i = l.indexOf(delim)
        while (i >= 0) {
          out += l.substring(start, i)
          start = i + 1
          i = l.indexOf(delim, start)
        }
        out += l.substring(start)
        return out.toArray
      }
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
    parseCsv(payload).exists { case (header, _) => headerSupported(normHeader(header)) }

  private def headerSupported(norm: Array[String]): Boolean =
    findColumn(norm, geomPatterns).isDefined ||
      (findColumn(norm, latPatterns).isDefined && findColumn(norm, lonPatterns).isDefined)

  final case class CsvResult(extent: Option[Extent], tbox: Option[(String, String)], crs: String,
                             verts: Array[Double])

  /** Support probe + extraction in ONE tokenizer pass (the hot mapPartitions
    * dispatch path would otherwise tokenize every CSV payload twice).
    */
  def extractIfSupported(payload: String): Option[CsvResult] =
    parseCsv(payload).flatMap { case (header, rows) =>
      // normalize the header ONCE; the support probe and every role lookup
      // in the extraction share it (the old path re-ran the probe's pattern
      // sweep inside extraction — two full sweeps per payload on the hot path)
      val norm = normHeader(header)
      if (headerSupported(norm)) Some(extractParsed(norm, rows)) else None
    }

  def extract(payload: String): Option[CsvResult] =
    parseCsv(payload).map { case (header, rows) => extractParsed(normHeader(header), rows) }

  private def extractParsed(norm: Array[String], rows: Array[Array[String]]): CsvResult = {
    val (extent0, verts0) = extractExtent(norm, rows)
    val tbox = extractTbox(norm, rows)
    val crsRaw = findColumn(norm, crsPatterns).flatMap { ci =>
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
  private def extractExtent(norm: Array[String], rows: Array[Array[String]]): (Option[Extent], Array[Double]) = {
    // stage 1/2: geometry column (WKT → hex-WKB → raw-WKB), running envelope
    findColumn(norm, geomPatterns) match {
      case Some(gi) =>
        val verts = ArrayBuffer.empty[Double]
        for (r <- rows; v <- r.lift(gi); c <- geometryValueCoords(v)) verts ++= c
        if (verts.nonEmpty) return (Geo.envelope(verts.toArray), verts.toArray)
      case None =>
    }
    // stage 3: lat/lon columns (ALL matches pooled), numeric coercion min/max
    val latIdx = findColumns(norm, latPatterns)
    val lonIdx = findColumns(norm, lonPatterns)
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

  private def extractTbox(norm: Array[String], rows: Array[Array[String]]): Option[(String, String)] = {
    // all time-matching columns pooled, per the reference (per-column format
    // guess, union min/max — helpfunctions.py:216-236 + handle_csv.py:860-906)
    val cols = findColumns(norm, timePatterns)
    if (cols.isEmpty) return None
    val dates = cols.flatMap { ti =>
      val values = rows.flatMap(_.lift(ti)).filter(_.trim.nonEmpty).toSeq
      DateGuess.parseColumn(values)
    }
    if (dates.isEmpty) None
    else Some((dates.min.toString, dates.max.toString))
  }
}
