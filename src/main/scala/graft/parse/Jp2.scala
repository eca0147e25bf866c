package graft.parse

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.geo.{Extent, Geo}

/** JPEG2000 (JP2) extent reader — round-4 widening of S4/P5.
  *
  * The reference reads `.jp2` through GDAL's JP2 driver
  * (geoextent/lib/handle_raster.py; golden: tests/test_api.py:305-313,
  * `testdata/jpeg2000/MSK_SNWPRB_60m.jp2` → bbox
  * [4.434354, -74.09868, 5.425259, -73.10649], crs 4326). This engine reads
  * the two public georeferencing conventions directly from the box stream —
  * no codestream decode, headers only, like every reader here:
  *
  *   - GeoJP2 (a `uuid` box carrying UUID b14bf8bd-083d-4b43-a5ae-8cd7d5a6ce03
  *     whose payload is a degenerate GeoTIFF) — parsed by reusing
  *     [[GeoTiff.readTiff]] verbatim;
  *   - GMLJP2 (an `asoc`/`xml ` box tree carrying a gml:RectifiedGrid:
  *     cell-center origin + two offset vectors + a GridEnvelope) — the
  *     convention the reference fixture actually uses.
  *
  * Box framing is ISO/IEC 15444-1 Annex I: 4-byte big-endian length +
  * 4-byte type; length 1 = 8-byte extended length follows; length 0 = box
  * runs to end of file. All reads are bounds-guarded: malformed or truncated
  * payloads return None (the malformed-input contract the WAV/tar readers
  * set), never throw.
  */
object Jp2 {

  final case class Jp2Result(extent: Option[Extent], epsg: Option[Int],
                             width: Int, height: Int)

  private val GeoJp2Uuid: Array[Byte] =
    Array(0xb1, 0x4b, 0xf8, 0xbd, 0x08, 0x3d, 0x4b, 0x43,
      0xa5, 0xae, 0x8c, 0xd7, 0xd5, 0xa6, 0xce, 0x03).map(_.toByte)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off, 4, StandardCharsets.US_ASCII)

  def looksLikeJp2(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      (bytes(0) & 0xff) == 0 && bytes(1) == 0 && bytes(2) == 0 && (bytes(3) & 0xff) == 12 &&
      boxType(bytes, 4) == "jP  "

  def readJp2(bytes: Array[Byte]): Option[Jp2Result] = {
    if (!looksLikeJp2(bytes)) return None
    var width = 0; var height = 0
    var tiffGeo: Option[GeoTiff.TifResult] = None
    val xmlDocs = scala.collection.mutable.ArrayBuffer.empty[String]

    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 8) return // malformed self-nesting guard
      var off = start
      while (off + 8 <= end) {
        val bb = ByteBuffer.wrap(bytes)
        val l32 = bb.getInt(off.toInt).toLong & 0xffffffffL
        val typ = boxType(bytes, off.toInt + 4)
        var hdr = 8L
        var len = l32
        if (l32 == 1) {
          if (off + 16 > end) return
          len = bb.getLong(off.toInt + 8); hdr = 16
        } else if (l32 == 0) len = end - off
        if (len < hdr || off + len > end) return // truncated box: stop walking
        val pOff = off + hdr; val pLen = len - hdr
        typ match {
          case "jp2h" | "asoc" => walk(pOff, off + len, depth + 1)
          case "ihdr" if pLen >= 8 =>
            height = bb.getInt(pOff.toInt)
            width = bb.getInt(pOff.toInt + 4)
          case "uuid" if pLen > 16 =>
            val u = java.util.Arrays.copyOfRange(bytes, pOff.toInt, pOff.toInt + 16)
            if (java.util.Arrays.equals(u, GeoJp2Uuid))
              tiffGeo = GeoTiff.readTiff(
                java.util.Arrays.copyOfRange(bytes, pOff.toInt + 16, (pOff + pLen).toInt))
          case "xml " if pLen > 0 =>
            xmlDocs += new String(bytes, pOff.toInt, pLen.toInt, StandardCharsets.UTF_8)
          case _ => ()
        }
        off += len
      }
    }
    walk(0, bytes.length.toLong, 0)

    // GeoJP2 outranks GMLJP2 (GDAL's probe order); fall through when the
    // degenerate TIFF carries no usable geotransform
    val fromUuid = tiffGeo.filter(_.extent.isDefined)
      .map(t => Jp2Result(t.extent, t.epsg, math.max(width, t.width), math.max(height, t.height)))
    fromUuid
      .orElse(xmlDocs.iterator.flatMap(gmlJp2Grid).nextOption()
        .map { case (e, epsg) => Jp2Result(Some(e), epsg, width, height) })
      .orElse(if (width > 0 && height > 0) Some(Jp2Result(None, None, width, height)) else None)
  }

  private val PosRe = "(?s)<gml:origin>.*?<gml:pos>([^<]+)</gml:pos>".r
  private val OffRe = "<gml:offsetVector[^>]*>([^<]+)<".r
  private val LowRe = "<gml:low>([^<]+)<".r
  private val HighRe = "<gml:high>([^<]+)<".r
  private val SrsRe = "srsName=[\"']([^\"']+)".r
  private val EpsgRe = "EPSG:+(\\d+)".r

  private def nums(s: String): Array[Double] =
    XmlGeo.Ws.split(s.trim).flatMap(t => t.toDoubleOption)

  /** GMLJP2 RectifiedGrid → (native-CRS envelope, epsg). The origin is the
    * CENTER of the first cell; the extent corner backs off half of each
    * offset vector, then spans w/h cells — the envelope of the four affine
    * corners (general, not just axis-aligned vectors). Axes are read in
    * (x, y) order as GDAL's traditional data-axis mapping does.
    */
  def gmlJp2Grid(xml: String): Option[(Extent, Option[Int])] = {
    if (!xml.contains("RectifiedGrid")) return None
    for {
      pos <- PosRe.findFirstMatchIn(xml).map(m => nums(m.group(1))) if pos.length >= 2
      offs = OffRe.findAllMatchIn(xml).map(m => nums(m.group(1))).filter(_.length >= 2).toSeq
      if offs.length >= 2
      low <- LowRe.findFirstMatchIn(xml).map(m => nums(m.group(1))) if low.length >= 2
      high <- HighRe.findFirstMatchIn(xml).map(m => nums(m.group(1))) if high.length >= 2
    } yield {
      val (v1x, v1y) = (offs(0)(0), offs(0)(1))
      val (v2x, v2y) = (offs(1)(0), offs(1)(1))
      val w = high(0) - low(0) + 1
      val h = high(1) - low(1) + 1
      val c00x = pos(0) - (v1x + v2x) / 2; val c00y = pos(1) - (v1y + v2y) / 2
      val xs = Seq(c00x, c00x + v1x * w, c00x + v2x * h, c00x + v1x * w + v2x * h)
      val ys = Seq(c00y, c00y + v1y * w, c00y + v2y * h, c00y + v1y * w + v2y * h)
      val epsg = SrsRe.findFirstMatchIn(xml).map(_.group(1))
        .flatMap(s => EpsgRe.findFirstMatchIn(s).map(_.group(1).toInt))
      (Extent(xs.min, ys.min, xs.max, ys.max), epsg)
    }
  }

  /** Native-CRS result → WGS84 extent under the reference's RASTER contract
    * (two-corner transform, see [[Geo.utmExtentToWgs84]]); unsupported CRSs
    * yield None, matching the engine's documented 4326/3857/UTM surface.
    */
  def extentWgs84(r: Jp2Result): Option[Extent] = r.extent.flatMap { e =>
    r.epsg match {
      case Some(4326) | None => Some(e)
      case Some(3857) => Some(Geo.mercExtentToWgs84(e))
      case Some(code) => Geo.utmExtentToWgs84(code, e)
    }
  }
}
