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
             csx: Double, csy: Double, epsg: Int): Array[Byte] = {
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
        s"""<gml:offsetVector srsName="$srs">$csx 0</gml:offsetVector>""" +
        s"""<gml:offsetVector srsName="$srs">0 ${-csy}</gml:offsetVector>""" +
        "</gml:RectifiedGrid></gml:FeatureCollection>"
    val xmlB = box("xml ", xml.getBytes("UTF-8"))
    sig ++ ftyp ++ jp2h ++ xmlB
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
