package graft.table

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic JPEG2000 corpus: one minimal GMLJP2-georeferenced .jp2 per page
  * id (signature + ftyp + jp2h/ihdr + gml:RectifiedGrid xml box — headers
  * only, no codestream, which the extent reader never touches). Cell sizes
  * are exact binary fractions (0.25/0.125 steps) over the same closed-form
  * testdata domain as the pages table, so the q68 oracle can rebuild every
  * extent with bit-identical IEEE arithmetic (see PayloadSpec's contract).
  */
object Jp2Synth {

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    ByteBuffer.wrap(out).putInt(payload.length + 8)
    System.arraycopy(typ.getBytes("US-ASCII"), 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** Minimal GMLJP2 .jp2: (cx, cy) is the CENTER of the top-left cell
    * (the GML origin convention), csx/csy the positive cell sizes.
    */
  def gmlJp2(w: Int, h: Int, cx: Double, cy: Double,
             csx: Double, csy: Double, epsg: Int): Array[Byte] =
    gmlJp2Vectors(w, h, cx, cy, (csx, 0.0), (0.0, -csy), epsg)

  /** General-affine GMLJP2 .jp2: arbitrary (possibly rotated/sheared) offset
    * vectors — the full gml:RectifiedGrid surface, not just the axis-aligned
    * sub-case gmlJp2 emits.
    */
  def gmlJp2Vectors(w: Int, h: Int, cx: Double, cy: Double,
                    v1: (Double, Double), v2: (Double, Double), epsg: Int): Array[Byte] = {
    val sig = box("jP  ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte))
    val ftypP = new Array[Byte](12)
    System.arraycopy("jp2 ".getBytes("US-ASCII"), 0, ftypP, 0, 4)
    System.arraycopy("jp2 ".getBytes("US-ASCII"), 0, ftypP, 8, 4)
    val ftyp = box("ftyp", ftypP)
    val ihdrP = new Array[Byte](14)
    val ib = ByteBuffer.wrap(ihdrP)
    ib.putInt(h); ib.putInt(w); ib.putShort(1.toShort)
    ib.put(7.toByte); ib.put(7.toByte); ib.put(0.toByte); ib.put(0.toByte)
    val jp2h = box("jp2h", box("ihdr", ihdrP))
    val srs = s"urn:ogc:def:crs:EPSG::$epsg"
    val xml =
      s"""<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml"><gml:RectifiedGrid dimension="2">""" +
        s"<gml:limits><gml:GridEnvelope><gml:low>1 1</gml:low><gml:high>$w $h</gml:high></gml:GridEnvelope></gml:limits>" +
        s"""<gml:origin><gml:Point srsName="$srs"><gml:pos>$cx $cy</gml:pos></gml:Point></gml:origin>""" +
        s"""<gml:offsetVector srsName="$srs">${v1._1} ${v1._2}</gml:offsetVector>""" +
        s"""<gml:offsetVector srsName="$srs">${v2._1} ${v2._2}</gml:offsetVector>""" +
        "</gml:RectifiedGrid></gml:FeatureCollection>"
    val xmlB = box("xml ", xml.getBytes("UTF-8"))
    sig ++ ftyp ++ jp2h ++ xmlB
  }

  /** GeoJP2 .jp2: the same box stream georeferenced via a degenerate-GeoTIFF
    * `uuid` box instead of GMLJP2 — tags 256/257 (size), 34264 (4x4 affine
    * ModelTransformation, row-major: x = t0·c + t1·r + t3, y = t4·c + t5·r
    * + t7 over pixel-EDGE corners) and a geographic GeoKey. This is the
    * other public JP2 georeferencing convention; synthesizing both lets the
    * grid math be property-tested one against the other.
    */
  def geoJp2Affine(w: Int, h: Int, transform: Array[Double], epsg: Int): Array[Byte] = {
    require(transform.length == 16, "4x4 row-major ModelTransformation expected")
    val sig = box("jP  ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte))
    val ftypP = new Array[Byte](12)
    System.arraycopy("jp2 ".getBytes("US-ASCII"), 0, ftypP, 0, 4)
    System.arraycopy("jp2 ".getBytes("US-ASCII"), 0, ftypP, 8, 4)
    val ftyp = box("ftyp", ftypP)
    val ihdrP = new Array[Byte](14)
    val ib = ByteBuffer.wrap(ihdrP)
    ib.putInt(h); ib.putInt(w); ib.putShort(1.toShort)
    ib.put(7.toByte); ib.put(7.toByte); ib.put(0.toByte); ib.put(0.toByte)
    val jp2h = box("jp2h", box("ihdr", ihdrP))
    // degenerate little-endian TIFF: header + 4-entry IFD + value areas
    val ifdOff = 8
    val transOff = ifdOff + 2 + 4 * 12 + 4
    val geoOff = transOff + 16 * 8
    val tiff = new Array[Byte](geoOff + 8 * 2)
    val tb = ByteBuffer.wrap(tiff).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff(0) = 'I'; tiff(1) = 'I'; tb.putShort(2, 42.toShort); tb.putInt(4, ifdOff)
    tb.putShort(ifdOff, 4.toShort)
    def entry(i: Int, tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      val e = ifdOff + 2 + 12 * i
      tb.putShort(e, tag.toShort); tb.putShort(e + 2, typ.toShort)
      tb.putInt(e + 4, cnt); tb.putInt(e + 8, value)
    }
    entry(0, 256, 3, 1, w)
    entry(1, 257, 3, 1, h)
    entry(2, 34264, 12, 16, transOff)
    entry(3, 34735, 3, 8, geoOff)
    for (i <- 0 until 16) tb.putDouble(transOff + 8 * i, transform(i))
    for ((v, i) <- Array(1, 1, 0, 1, 2048, 0, 1, epsg).zipWithIndex)
      tb.putShort(geoOff + 2 * i, v.toShort)
    // GeoJP2 UUID b14bf8bd-083d-4b43-a5ae-8cd7d5a6ce03 + the TIFF payload
    val uuid = Array(0xb1, 0x4b, 0xf8, 0xbd, 0x08, 0x3d, 0x4b, 0x43,
      0xa5, 0xae, 0x8c, 0xd7, 0xd5, 0xa6, 0xce, 0x03).map(_.toByte)
    sig ++ ftyp ++ jp2h ++ box("uuid", uuid ++ tiff)
  }

  /** jp2s(doc_id, jp2) over the pages id domain: a 4x3 grid anchored at the
    * page's closed-form corner; csx = (d%5+1)*0.25, csy = (d%7+1)*0.125.
    */
  def jp2s(spark: SparkSession, sfDir: String): DataFrame = {
    val jp2Udf = udf((d: Long) => {
      val csx = (d % 5 + 1) * 0.25
      val csy = (d % 7 + 1) * 0.125
      // origin = center of the TOP-LEFT cell of a grid whose envelope is
      // [lon0, lat0, lon0+4*csx, lat0+3*csy]
      gmlJp2(4, 3, PayloadSpec.lon0(d) + csx / 2, PayloadSpec.lat0(d) + 3 * csy - csy / 2,
        csx, csy, 4326)
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .withColumn("jp2", jp2Udf(col("doc_id")))
  }
}
