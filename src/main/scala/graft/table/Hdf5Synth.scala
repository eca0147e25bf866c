package graft.table

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic NetCDF-4 corpus: one minimal HDF5 file per page id carrying
  * lat/lon cell-center axes (degrees_north/east) and a CF time variable —
  * superblock v2 + OHDR v2 compact links + contiguous f64 data, the same
  * public-spec structures the reader's reference-fixture goldens cover
  * (NetCdfSpec), so q69 proves the Spark-side plumbing end-to-end while the
  * reader's correctness rests on the reference's own bytes.
  *
  * Closed forms over the testdata domain (exact binary fractions, see
  * PayloadSpec): a 4×3 grid with csx=(d%5+1)*0.25, csy=(d%7+1)*0.125
  * anchored at (lon0, lat0); time = days since dateD with values [0, d%30].
  */
object Hdf5Synth {

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le8(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n).array()
  private def le2(n: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(n.toShort).array()

  /** Attribute message (v3) with a fixed-string scalar value. */
  private def strAttr(name: String, value: String): Array[Byte] = {
    val nb = name.getBytes("US-ASCII") :+ 0.toByte
    val vb = value.getBytes("US-ASCII")
    val dt = Array[Byte](0x13, 0, 0, 0) ++ le(vb.length) // class 3 string, ver 1
    val ds = Array[Byte](2, 0, 0, 0) // dataspace v2, scalar
    val body = Array[Byte](3, 0) ++ le2(nb.length) ++ le2(dt.length) ++ le2(ds.length) ++
      Array[Byte](0) ++ nb ++ dt ++ ds ++ vb
    msg(0x0C, body)
  }

  private def msg(typ: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte](typ.toByte) ++ le2(body.length) ++ Array[Byte](0) ++ body

  /** OHDR v2 with 2-byte chunk0 (flags=0x01), trailing 4-byte checksum slot. */
  private def ohdr(messages: Array[Byte]): Array[Byte] =
    "OHDR".getBytes("US-ASCII") ++ Array[Byte](2, 0x01) ++
      le2(messages.length) ++ messages ++ Array[Byte](0, 0, 0, 0)

  /** 1-D f64 dataset object header: dataspace + datatype + contiguous layout
    * at `dataAddr` + unit/name attributes.
    */
  private def dataset(n: Int, dataAddr: Long, attrs: Seq[(String, String)]): Array[Byte] = {
    val ds = msg(0x01, Array[Byte](2, 1, 0, 1) ++ le8(n.toLong))
    val dt = msg(0x03, Array[Byte](0x11, 0x20, 0, 0) ++ le(8)) // class 1 float, size 8
    val lay = msg(0x08, Array[Byte](3, 1) ++ le8(dataAddr) ++ le8(8L * n))
    val at = attrs.map { case (k, v) => strAttr(k, v) }.fold(Array.emptyByteArray)(_ ++ _)
    ohdr(ds ++ dt ++ lay ++ at)
  }

  private def link(name: String, addr: Long): Array[Byte] = {
    val nb = name.getBytes("US-ASCII")
    msg(0x06, Array[Byte](1, 0, nb.length.toByte) ++ nb ++ le8(addr))
  }

  // ---- chunked + filtered storage (the unlimited-dimension layout) ----

  /** Shuffle filter: byte plane j of every element gathered together. */
  private def shuffleBytes(raw: Array[Byte], elemSize: Int): Array[Byte] = {
    val nEl = raw.length / elemSize
    val out = new Array[Byte](raw.length)
    var j = 0
    while (j < elemSize) {
      var e = 0
      while (e < nEl) { out(j * nEl + e) = raw(e * elemSize + j); e += 1 }
      j += 1
    }
    out
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  /** 1-D f64 dataset stored CHUNKED (chunkElems per chunk, edge chunk padded
    * to full size per the spec) behind a shuffle+deflate pipeline and a
    * single-leaf v1 B-tree chunk index. Returns (object header, file tail
    * blocks to append at `tailAddr`): tail = stored chunks ++ TREE node.
    */
  private[table] def chunkedDataset(values: Array[Double], chunkElems: Int, tailAddr: Long,
                                    attrs: Seq[(String, String)]): (Array[Byte], Array[Byte]) = {
    val nChunks = (values.length + chunkElems - 1) / chunkElems
    val stored = (0 until nChunks).map { c =>
      val slice = new Array[Double](chunkElems) // edge chunk zero-padded to full size
      var i = 0
      while (i < chunkElems && c * chunkElems + i < values.length) {
        slice(i) = values(c * chunkElems + i); i += 1
      }
      val bb = ByteBuffer.allocate(8 * chunkElems).order(ByteOrder.LITTLE_ENDIAN)
      slice.foreach(bb.putDouble)
      deflateBytes(shuffleBytes(bb.array(), 8))
    }
    val chunkAddrs = stored.scanLeft(tailAddr)(_ + _.length).init
    val btreeAddr = tailAddr + stored.map(_.length).sum
    // v1 B-tree leaf: TREE, type 1, level 0, entries, siblings, key/child pairs
    val tree = new ByteArrayOutputStream()
    tree.write("TREE".getBytes("US-ASCII"))
    tree.write(Array[Byte](1, 0)); tree.write(le2(nChunks))
    tree.write(le8(-1L)); tree.write(le8(-1L))
    for (c <- 0 until nChunks) {
      tree.write(le(stored(c).length)); tree.write(le(0)) // size, filter mask
      tree.write(le8(c.toLong * chunkElems)); tree.write(le8(0L)) // offsets (elem, elem-size dim)
      tree.write(le8(chunkAddrs(c)))
    }
    tree.write(le(0)); tree.write(le(0)); tree.write(le8(values.length.toLong)); tree.write(le8(0L))
    val ds = msg(0x01, Array[Byte](2, 1, 0, 1) ++ le8(values.length.toLong))
    val dt = msg(0x03, Array[Byte](0x11, 0x20, 0, 0) ++ le(8))
    val lay = msg(0x08, Array[Byte](3, 2, 2) ++ le8(btreeAddr) ++ le(chunkElems) ++ le(8))
    // filter pipeline v1: shuffle (client [8]) then deflate (client [6])
    val filt = msg(0x0B, Array[Byte](1, 2, 0, 0, 0, 0, 0, 0) ++
      (le2(2) ++ le2(0) ++ le2(0) ++ le2(1) ++ le(8) ++ le(0)) ++ // id 2, pad to even client count
      (le2(1) ++ le2(0) ++ le2(0) ++ le2(1) ++ le(6) ++ le(0)))
    val at = attrs.map { case (k, v) => strAttr(k, v) }.fold(Array.emptyByteArray)(_ ++ _)
    (ohdr(ds ++ dt ++ lay ++ filt ++ at),
      stored.fold(Array.emptyByteArray)(_ ++ _) ++ tree.toByteArray)
  }

  /** Minimal .nc whose TIME axis is chunked+shuffle+deflate (lat/lon stay
    * contiguous) — the layout netCDF produces for unlimited dimensions.
    */
  def ncBytesChunkedTime(lat: Array[Double], lon: Array[Double],
                         time: Array[Double], timeUnits: String,
                         chunkElems: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val sbSize = 48L
    val dataLat = sbSize
    val dataLon = dataLat + 8L * lat.length
    val tailAddr = dataLon + 8L * lon.length
    val dsLat = dataset(lat.length, dataLat,
      Seq("units" -> "degrees_north", "standard_name" -> "latitude"))
    val dsLon = dataset(lon.length, dataLon,
      Seq("units" -> "degrees_east", "standard_name" -> "longitude"))
    val (dsTime, timeTail) = chunkedDataset(time, chunkElems, tailAddr,
      Seq("units" -> timeUnits, "calendar" -> "standard"))
    val hLat = tailAddr + timeTail.length
    val hLon = hLat + dsLat.length
    val hTime = hLon + dsLon.length
    val rootMsgs = link("lat", hLat) ++ link("lon", hLon) ++ link("time", hTime)
    val root = ohdr(rootMsgs)
    val rootAddr = hTime + dsTime.length
    val eof = rootAddr + root.length
    out.write(Array(0x89, 72, 68, 70, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(Array[Byte](2, 8, 8, 0))
    out.write(le8(0L)); out.write(le8(-1L)); out.write(le8(eof)); out.write(le8(rootAddr))
    out.write(Array[Byte](0, 0, 0, 0))
    def writeDoubles(a: Array[Double]): Unit = {
      val bb = ByteBuffer.allocate(8 * a.length).order(ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putDouble)
      out.write(bb.array())
    }
    writeDoubles(lat); writeDoubles(lon)
    out.write(timeTail)
    out.write(dsLat); out.write(dsLon); out.write(dsTime)
    out.write(root)
    out.toByteArray
  }

  /** Build a minimal .nc: lat/lon/time f64 axes + root string attributes. */
  def ncBytes(lat: Array[Double], lon: Array[Double],
              time: Array[Double], timeUnits: String,
              rootAttrs: Seq[(String, String)] = Nil): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def pos: Long = out.size().toLong
    // plan: superblock(48) | data blocks | dataset headers | root header
    val sbSize = 48L
    val dataLat = sbSize
    val dataLon = dataLat + 8L * lat.length
    val dataTime = dataLon + 8L * lon.length
    val afterData = dataTime + 8L * time.length
    val dsLat = dataset(lat.length, dataLat,
      Seq("units" -> "degrees_north", "standard_name" -> "latitude"))
    val dsLon = dataset(lon.length, dataLon,
      Seq("units" -> "degrees_east", "standard_name" -> "longitude"))
    val dsTime = dataset(time.length, dataTime,
      Seq("units" -> timeUnits, "calendar" -> "standard"))
    val hLat = afterData
    val hLon = hLat + dsLat.length
    val hTime = hLon + dsLon.length
    val rootMsgs =
      rootAttrs.map { case (k, v) => strAttr(k, v) }.fold(Array.emptyByteArray)(_ ++ _) ++
        link("lat", hLat) ++ link("lon", hLon) ++ link("time", hTime)
    val root = ohdr(rootMsgs)
    val rootAddr = hTime + dsTime.length
    val eof = rootAddr + root.length
    // superblock v2: root object header address at byte 36
    out.write(Array(0x89, 72, 68, 70, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)) // \x89HDF\r\n\x1a\n
    out.write(Array[Byte](2, 8, 8, 0))
    out.write(le8(0L)); out.write(le8(-1L)); out.write(le8(eof)); out.write(le8(rootAddr))
    out.write(Array[Byte](0, 0, 0, 0)) // checksum slot
    require(pos == sbSize)
    def writeDoubles(a: Array[Double]): Unit = {
      val bb = ByteBuffer.allocate(8 * a.length).order(ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putDouble)
      out.write(bb.array())
    }
    writeDoubles(lat); writeDoubles(lon); writeDoubles(time)
    out.write(dsLat); out.write(dsLon); out.write(dsTime)
    require(pos == rootAddr)
    out.write(root)
    out.toByteArray
  }

  /** ncs(doc_id, nc) over the pages id domain. */
  def ncs(spark: SparkSession, sfDir: String): DataFrame = {
    val ncUdf = udf((d: Long) => {
      val csx = (d % 5 + 1) * 0.25
      val csy = (d % 7 + 1) * 0.125
      val lat = Array.tabulate(3)(i => PayloadSpec.lat0(d) + csy / 2 + i * csy)
      val lon = Array.tabulate(4)(j => PayloadSpec.lon0(d) + csx / 2 + j * csx)
      val time = Array(0.0, (d % 30).toDouble)
      ncBytes(lat, lon, time, s"days since ${PayloadSpec.dateD(d)}")
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .withColumn("nc", ncUdf(col("doc_id")))
  }
}
