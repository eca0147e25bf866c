package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import graft.geo.Extent

/** ESRI Shapefile (.shp) and dBASE (.dbf) readers — pure JVM, no GDAL.
  *
  * The reference reads shapefiles through fiona/OGR
  * (geoextent/lib/handle_vector.py); the semantics reproduced here are the
  * layer envelope (the .shp header carries it directly, and it is re-derivable
  * from the record geometries) and the temporal extent from the .dbf attribute
  * table (dBASE 'D' fields, plus character fields matching the CSV date-column
  * name patterns, parsed with the same DateGuess ladder). Golden-tested
  * against the reference's own fixtures
  * (tests/testdata/shapefile/, expectations from tests/test_api_shapefile.py).
  */
object Shapefile {

  final case class ShpResult(extent: Extent, verts: Array[Double], shapeType: Int, nRecords: Int)

  /** Parse a .shp payload: header envelope + all record vertices.
    * Supported record types: 0 null, 1 point, 3 polyline, 5 polygon,
    * 8 multipoint (+ their Z/M variants 11/13/15/18, whose XY block layout is
    * identical up front).
    */
  def readShp(bytes: Array[Byte]): Option[ShpResult] =
    // malformed-input contract (matches the WAV/tar readers): a payload whose
    // declared counts/offsets point outside the buffer fails the ROW (None),
    // never the task — these readers meet untrusted archive members
    try readShpImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def readShpImpl(bytes: Array[Byte]): Option[ShpResult] = {
    if (bytes.length < 100) return None
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (be.getInt(0) != 9994) return None // file code
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = le.getInt(32)
    val ext = Extent(le.getDouble(36), le.getDouble(44), le.getDouble(52), le.getDouble(60))
    val verts = Array.newBuilder[Double]
    var off = 100
    var n = 0
    while (off + 12 <= bytes.length) {
      val contentWords = be.getInt(off + 4) // record content length in 16-bit words
      val content = off + 8
      val recType = le.getInt(content)
      recType match {
        case 1 | 11 | 21 => // point (+Z/M): x,y first
          verts += le.getDouble(content + 4) += le.getDouble(content + 12)
        case 8 | 18 | 28 => // multipoint: box(32) + numPoints + points
          val np = le.getInt(content + 36)
          var i = 0
          while (i < np) {
            verts += le.getDouble(content + 40 + 16 * i) += le.getDouble(content + 48 + 16 * i)
            i += 1
          }
        case 3 | 5 | 13 | 15 | 23 | 25 => // polyline/polygon: box + numParts + numPoints + parts[] + points
          val nParts = le.getInt(content + 36)
          val np = le.getInt(content + 40)
          val ptsOff = content + 44 + 4 * nParts
          var i = 0
          while (i < np) {
            verts += le.getDouble(ptsOff + 16 * i) += le.getDouble(ptsOff + 8 + 16 * i)
            i += 1
          }
        case _ => () // null / unsupported: contributes no vertices
      }
      n += 1
      // a non-positive content length would stall the walk — treat as
      // truncation and stop (partial records already collected stand)
      if (contentWords <= 0) off = bytes.length
      else off = content + contentWords * 2
    }
    Some(ShpResult(ext, verts.result(), shapeType, n))
  }

  final case class DbfField(name: String, ftype: Char, length: Int)

  /** Parse a .dbf attribute table into (fields, rows-of-strings). */
  def readDbf(bytes: Array[Byte]): Option[(Array[DbfField], Array[Array[String]])] =
    try readDbfImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def readDbfImpl(bytes: Array[Byte]): Option[(Array[DbfField], Array[Array[String]])] = {
    if (bytes.length < 32) return None
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8) & 0xffff
    val recSize = le.getShort(10) & 0xffff
    val fields = Array.newBuilder[DbfField]
    var off = 32
    while (off + 32 <= headerSize - 1 && bytes(off) != 0x0d) {
      var end = off
      while (end < off + 11 && bytes(end) != 0) end += 1
      val name = new String(bytes, off, end - off, "US-ASCII")
      fields += DbfField(name, bytes(off + 11).toChar, bytes(off + 16) & 0xff)
      off += 32
    }
    val fs = fields.result()
    val rows = Array.newBuilder[Array[String]]
    var r = 0
    var rOff = headerSize
    while (r < nRec && rOff + recSize <= bytes.length) {
      if (bytes(rOff) != '*') { // '*' = deleted record
        var fOff = rOff + 1
        rows += fs.map { f =>
          val v = new String(bytes, fOff, f.length, "US-ASCII").trim
          fOff += f.length
          v
        }
      }
      rOff += recSize
      r += 1
    }
    Some((fs, rows.result()))
  }

  /** Temporal extent of a .dbf table: dBASE 'D' fields (YYYYMMDD) always
    * qualify; character fields qualify when their name matches the CSV
    * date-column patterns. Values parse through the DateGuess ladder.
    */
  def dbfTbox(bytes: Array[Byte]): Option[(String, String)] = {
    readDbf(bytes).flatMap { case (fields, rows) =>
      val dateCols = fields.zipWithIndex.filter { case (f, _) =>
        f.ftype == 'D' || (f.ftype == 'C' && CsvGeo.isDateColumnName(f.name))
      }.map(_._2)
      val dates = for {
        row <- rows.iterator
        ci <- dateCols.iterator
        v = row(ci) if v.nonEmpty
        d <- DateGuess.parseOne(v)
      } yield d
      val ds = dates.toSeq
      if (ds.isEmpty) None
      else Some((ds.min.toString, ds.max.toString))
    }
  }

  /** CRS from a .prj sidecar: WGS84 well-known text → 4326; Web Mercator →
    * 3857; anything else passes through as the raw name (plausibility-gated
    * downstream, same as CSV CRS carry-through).
    */
  def prjToEpsg(prj: String): String = {
    val p = if (prj == null) "" else prj.toUpperCase
    if (p.contains("WGS_1984_WEB_MERCATOR") || p.contains("3857")) "3857"
    else if (p.contains("GCS_WGS_1984") || p.contains("WGS 84") || p.contains("WGS_1984")) "4326"
    else if (p.isEmpty) "4326"
    else p.take(64)
  }
}
