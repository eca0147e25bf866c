package graft.table

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic shapefile corpus: one multipoint .shp (the payload rectangle's
  * four corners) + one .dbf (a 'timestamp' dBASE date field holding the
  * payload's date range) per page id — closed forms over the same testdata
  * domain as the pages table, so the q66 oracle can rebuild every extent and
  * tbox exactly.
  */
object ShapeTable {

  /** Minimal .shp writer: header + ONE multipoint record. */
  def shpBytes(pts: Array[(Double, Double)]): Array[Byte] = {
    val contentBytes = 4 + 32 + 4 + 16 * pts.length // type + box + n + points
    val fileBytes = 100 + 8 + contentBytes
    val out = new Array[Byte](fileBytes)
    val be = ByteBuffer.wrap(out).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    be.putInt(0, 9994)
    be.putInt(24, fileBytes / 2) // file length in 16-bit words
    le.putInt(28, 1000) // version
    le.putInt(32, 8) // multipoint
    val minX = pts.map(_._1).min; val minY = pts.map(_._2).min
    val maxX = pts.map(_._1).max; val maxY = pts.map(_._2).max
    le.putDouble(36, minX); le.putDouble(44, minY)
    le.putDouble(52, maxX); le.putDouble(60, maxY)
    be.putInt(100, 1) // record number
    be.putInt(104, contentBytes / 2)
    le.putInt(108, 8) // shape type
    le.putDouble(112, minX); le.putDouble(120, minY)
    le.putDouble(128, maxX); le.putDouble(136, maxY)
    le.putInt(144, pts.length)
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      le.putDouble(148 + 16 * i, x); le.putDouble(156 + 16 * i, y)
    }
    out
  }

  /** Minimal .dbf writer: one 'timestamp' date field, one record per date. */
  def dbfBytes(dates: Seq[java.time.LocalDate]): Array[Byte] = {
    val headerSize = 32 + 32 + 1
    val recSize = 1 + 8
    val out = new Array[Byte](headerSize + dates.length * recSize + 1)
    val le = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    out(0) = 0x03
    le.putInt(4, dates.length)
    le.putShort(8, headerSize.toShort)
    le.putShort(10, recSize.toShort)
    val name = "timestamp".getBytes("US-ASCII")
    System.arraycopy(name, 0, out, 32, name.length)
    out(32 + 11) = 'D'
    out(32 + 16) = 8
    out(headerSize - 1) = 0x0d
    dates.zipWithIndex.foreach { case (d, i) =>
      val off = headerSize + i * recSize
      out(off) = ' '
      val s = f"${d.getYear}%04d${d.getMonthValue}%02d${d.getDayOfMonth}%02d".getBytes("US-ASCII")
      System.arraycopy(s, 0, out, off + 1, 8)
    }
    out(out.length - 1) = 0x1a
    out
  }

  /** shapes(doc_id, shp, dbf) over the pages id domain. */
  def shapes(spark: SparkSession, sfDir: String): DataFrame = {
    val shpUdf = udf((d: Long) => {
      val (x0, y0, x1, y1) = (PayloadSpec.lon0(d), PayloadSpec.lat0(d), PayloadSpec.lon1(d), PayloadSpec.lat1(d))
      shpBytes(Array((x0, y0), (x1, y0), (x1, y1), (x0, y1)))
    })
    val dbfUdf = udf((d: Long) =>
      dbfBytes(Seq(PayloadSpec.dateD(d), PayloadSpec.dateEnd(d))))
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .withColumn("shp", shpUdf(col("doc_id")))
      .withColumn("dbf", dbfUdf(col("doc_id")))
  }
}
