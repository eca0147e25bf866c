package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

import graft.geo.Extent

/** ESRI ASCII grid (.asc) header reader — the text raster format the
  * reference handles through GDAL (tests/testdata/asc). The six header lines
  * give the extent in closed form: (xll, yll) + (ncols, nrows)·cellsize.
  */
object GridAscii {

  final case class AscResult(extent: Extent, ncols: Int, nrows: Int, cellsize: Double)

  private val HeaderKeys = Set("ncols", "nrows", "xllcorner", "yllcorner",
    "xllcenter", "yllcenter", "cellsize", "nodata_value")

  def readAsc(text: String): Option[AscResult] = {
    if (text == null) return None
    val kv = scala.collection.mutable.Map.empty[String, Double]
    val it = text.linesIterator
    var parsed = 0
    while (it.hasNext && parsed < 6) {
      val line = it.next().trim
      val parts = XmlGeo.Ws.split(line)
      if (parts.length == 2) {
        val k = parts(0).toLowerCase
        if (HeaderKeys(k)) {
          try { kv(k) = parts(1).toDouble; parsed += 1 } catch { case _: Exception => return None }
        } else return if (parsed >= 5) build(kv) else None
      } else return if (parsed >= 5) build(kv) else None
    }
    build(kv)
  }

  private def build(kv: collection.Map[String, Double]): Option[AscResult] =
    for {
      nc <- kv.get("ncols"); nr <- kv.get("nrows"); cs <- kv.get("cellsize")
      // corner-registered or center-registered origin (center shifts by cs/2)
      xll <- kv.get("xllcorner").orElse(kv.get("xllcenter").map(_ - cs / 2))
      yll <- kv.get("yllcorner").orElse(kv.get("yllcenter").map(_ - cs / 2))
    } yield AscResult(Extent(xll, yll, xll + nc * cs, yll + nr * cs), nc.toInt, nr.toInt, cs)
}

/** ESRI world file (.tfw/.wld/.pngw) — the 6-line affine sidecar that
  * georeferences a raster whose own format carries no geo tags
  * (A, D, B, E = pixel scales/rotations; C, F = CENTER of the top-left
  * pixel). Extent needs the raster's pixel dims from the paired image.
  */
object WorldFile {

  /** (extent, pixel sizes) from the sidecar + raster dims. */
  def extent(worldFile: String, width: Int, height: Int): Option[Extent] = {
    val vals = worldFile.trim.split("\\s+").take(6).flatMap(v =>
      try Some(v.toDouble) catch { case _: Exception => None })
    if (vals.length < 6 || width <= 0 || height <= 0) return None
    val Array(a, d, b, e, c, f) = vals
    if (d != 0 || b != 0) return None // rotated worldfiles out of scope
    // C/F are the top-left pixel CENTER: shift by half a pixel to the edge
    val minX = c - a / 2
    val maxY = f - e / 2 // e is negative for north-up rasters
    Some(Extent(math.min(minX, minX + a * width), math.min(maxY, maxY + e * height),
      math.max(minX, minX + a * width), math.max(maxY, maxY + e * height)))
  }
}

/** FlatGeobuf header-envelope reader: 8-byte magic (fgb\x03 fgb\x01), a
  * length-prefixed flatbuffer Header whose field 1 is the layer envelope
  * [minx, miny, maxx, maxy] — the same layer extent OGR reports (the
  * reference reads .fgb through fiona). Hand-walked flatbuffer (root offset →
  * vtable → field slot → f64 vector); no flatbuffers dependency.
  */
object FlatGeobuf {

  def readEnvelope(bytes: Array[Byte]): Option[Extent] =
    // malformed-input contract: out-of-range flatbuffer offsets → None
    try readEnvelopeImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def readEnvelopeImpl(bytes: Array[Byte]): Option[Extent] = {
    if (bytes == null || bytes.length < 16) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'g' && bytes(2) == 'b' &&
      bytes(4) == 'f' && bytes(5) == 'g' && bytes(6) == 'b')) return None
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val hLen = le.getInt(8)
    val base = 12
    if (base + hLen > bytes.length || hLen < 8) return None
    val root = base + le.getInt(base)
    val vt = root - le.getInt(root)
    val vtSize = le.getShort(vt) & 0xffff
    if (vtSize < 8) return None // envelope is field 1 → needs slot 4+2
    val fOff = le.getShort(vt + 6) & 0xffff
    if (fOff == 0) return None // envelope absent
    val vecRef = root + fOff
    val vec = vecRef + le.getInt(vecRef)
    val n = le.getInt(vec)
    if (n < 4) return None
    Some(Extent(le.getDouble(vec + 4), le.getDouble(vec + 12),
      le.getDouble(vec + 20), le.getDouble(vec + 28)))
  }
}
