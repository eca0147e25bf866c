package graft.parse

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal HDF5 reader — just enough of the public HDF5 File Format
  * Specification (support.hdfgroup.org/documentation) to open the NetCDF-4
  * files the reference exercises (the tests/testdata/nc fixtures, read there through
  * GDAL/netCDF): superblock v0 and v2/v3, object headers v1 and v2 ("OHDR"),
  * compact link messages and densely-stored links (fractal heap root
  * direct/one-level indirect blocks), attribute messages v1/v3 with
  * fixed-string / numeric / vlen-string (global heap "GCOL") values,
  * dataspace v1/v2, CONTIGUOUS dataset layout (v1/v2/v3 messages), and —
  * since round 4 — CHUNKED layout via the v1 B-tree chunk index with the
  * shuffle/deflate/fletcher32 filter pipeline (the storage netCDF always
  * uses for unlimited dimensions, time axes above all). Paths beyond these
  * (v4 chunk indexes, szip, compound types) return None fields rather than
  * failing.
  *
  * Pixel payloads are never needed — like every reader in this engine the
  * target is coordinate axes, CF/ACDD attributes, and small 1-D arrays.
  * Malformed input contract: any out-of-range offset fails the parse (None),
  * never the task.
  */
object Hdf5 {

  final case class H5Var(name: String, dims: Seq[Long], dtClass: Int,
                         attrs: Map[String, String],
                         data: Option[Array[Double]])
  final case class H5File(rootAttrs: Map[String, String], vars: Seq[H5Var])

  private val Undef = -1L // 0xffffffffffffffff
  private val MaxElems = 1 << 20

  def looksLikeHdf5(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'H' && b(2) == 'D' && b(3) == 'F' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a

  def read(bytes: Array[Byte]): Option[H5File] =
    try readImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private final class P(val b: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    def u8(o: Long): Int = b(o.toInt) & 0xff
    def u16(o: Long): Int = bb.getShort(o.toInt) & 0xffff
    def u32(o: Long): Long = bb.getInt(o.toInt).toLong & 0xffffffffL
    def u64(o: Long): Long = bb.getLong(o.toInt)
    def sig(o: Long, s: String): Boolean =
      o >= 0 && o + 4 <= b.length && new String(b, o.toInt, 4, StandardCharsets.US_ASCII) == s
    def str(o: Long, len: Int): String = {
      val raw = new String(b, o.toInt, math.max(0, math.min(len, b.length - o.toInt)), StandardCharsets.UTF_8)
      val z = raw.indexOf('\u0000')
      if (z >= 0) raw.substring(0, z) else raw
    }
  }

  private final case class Dt(cls: Int, size: Int, signed: Boolean)

  private final class Obj {
    var attrs = Map.empty[String, String]
    var dims: Seq[Long] = null
    var dt: Dt = null
    var layoutAddr: Long = Undef
    var layoutSize: Long = 0L
    var chunkBtree: Long = Undef
    var chunkDims: Array[Int] = null // incl. the trailing element-size dim
    var filters: List[(Int, Array[Long])] = Nil // (filter id, client data)
    var links = Vector.empty[(String, Long)]
    var denseLinkHeap: Long = Undef
    var symBtree: Long = Undef
    var symHeap: Long = Undef
  }

  private def readImpl(bytes: Array[Byte]): Option[H5File] = {
    if (!looksLikeHdf5(bytes)) return None
    val p = new P(bytes)
    val sbVer = p.u8(8)
    val rootAddr: Long = sbVer match {
      case 0 | 1 =>
        if (p.u8(13) != 8 || p.u8(14) != 8) return None // only 8-byte offsets/lengths
        // v0: root group symbol-table entry at 56 (after base/fs/eof/driver);
        // its object header address is the second 8-byte field
        p.u64(64)
      case 2 | 3 =>
        if (p.u8(9) != 8 || p.u8(10) != 8) return None
        p.u64(36)
      case _ => return None
    }
    if (rootAddr < 0 || rootAddr >= bytes.length) return None
    val root = parseObject(p, rootAddr)
    val children: Seq[(String, Long)] =
      root.links ++
        (if (root.denseLinkHeap != Undef) fractalLinks(p, root.denseLinkHeap) else Nil) ++
        (if (root.symBtree != Undef && root.symHeap != Undef) symTableLinks(p, root.symBtree, root.symHeap) else Nil)
    val vars = children.flatMap { case (name, addr) =>
      if (addr < 0 || addr >= bytes.length) None
      else {
        val o = parseObject(p, addr)
        val data =
          if (o.dt != null && o.dims != null &&
            (o.layoutAddr != Undef || o.chunkBtree != Undef) &&
            (o.dt.cls == 0 || o.dt.cls == 1)) readNumeric(p, o)
          else None
        Some(H5Var(name, if (o.dims == null) Nil else o.dims,
          if (o.dt == null) -1 else o.dt.cls, o.attrs, data))
      }
    }
    Some(H5File(root.attrs, vars))
  }

  // ------------------------------------------------------------ object headers

  private def parseObject(p: P, addr: Long): Obj = {
    val o = new Obj
    if (p.sig(addr, "OHDR")) parseOhdrV2(p, addr, o) else parseOhdrV1(p, addr, o)
    o
  }

  private def parseOhdrV2(p: P, addr: Long, o: Obj): Unit = {
    val flags = p.u8(addr + 5)
    var q = addr + 6
    if ((flags & 0x20) != 0) q += 16
    if ((flags & 0x10) != 0) q += 4
    val cs = 1 << (flags & 0x3)
    var chunk0 = 0L
    var i = 0
    while (i < cs) { chunk0 |= (p.u8(q + i).toLong << (8 * i)); i += 1 }
    q += cs
    val track = (flags & 0x04) != 0
    messagesV2(p, q, q + chunk0, track, o, 0)
  }

  private def messagesV2(p: P, start: Long, end: Long, track: Boolean, o: Obj, depth: Int): Unit = {
    if (depth > 8) return
    var q = start
    while (q + 4 <= end) {
      val typ = p.u8(q); val sz = p.u16(q + 1); q += 4
      if (track) q += 2
      if (q + sz > end + 4) return // truncated
      handleMessage(p, typ, q, o, v2 = true, track, depth)
      q += sz
    }
  }

  private def parseOhdrV1(p: P, addr: Long, o: Obj): Unit = {
    if (p.u8(addr) != 1) return
    val nmsg = p.u16(addr + 2)
    val hsize = p.u32(addr + 8)
    // v1: 12-byte prefix + 4-byte pad, messages 8-byte aligned
    var blocks = List((addr + 16, addr + 16 + hsize))
    var count = 0
    val cont = scala.collection.mutable.Queue.empty[(Long, Long)]
    while (blocks.nonEmpty && count < nmsg) {
      val (s, e) = blocks.head; blocks = blocks.tail
      var q = s
      while (q + 8 <= e && count < nmsg) {
        val typ = p.u16(q); val sz = p.u16(q + 2)
        val body = q + 8
        if (typ == 0x10) cont.enqueue((p.u64(body), p.u64(body + 8)))
        else handleMessage(p, typ, body, o, v2 = false, track = false, 0)
        count += 1
        q = body + ((sz + 7) / 8) * 8
      }
      if (blocks.isEmpty && cont.nonEmpty) {
        val (co, cl) = cont.dequeue()
        if (co > 0 && co + cl <= p.b.length) blocks = List((co, co + cl))
      }
    }
  }

  private def handleMessage(p: P, typ: Int, body: Long, o: Obj,
                            v2: Boolean, track: Boolean, depth: Int): Unit = typ match {
    case 0x01 => o.dims = parseDataspace(p, body)
    case 0x02 => // Link Info: dense links live in a fractal heap
      val lf = p.u8(body + 1)
      var q = body + 2
      if ((lf & 0x1) != 0) q += 8
      val fh = p.u64(q)
      if (fh != Undef) o.denseLinkHeap = fh
    case 0x03 => o.dt = parseDatatype(p, body)
    case 0x06 => parseLinkBody(p, body).foreach(l => o.links :+= (l._1, l._2))
    case 0x08 => // Data Layout
      val ver = p.u8(body)
      if (ver == 3) {
        p.u8(body + 1) match {
          case 1 => o.layoutAddr = p.u64(body + 2); o.layoutSize = p.u64(body + 10)
          case 2 => // chunked: dimensionality, v1 B-tree address, chunk dims (u32 each)
            val nd = p.u8(body + 2)
            o.chunkBtree = p.u64(body + 3)
            o.chunkDims = (0 until nd).map(i => p.u32(body + 11 + 4L * i).toInt).toArray
          case _ => ()
        }
      } else if (ver == 1 || ver == 2) {
        val nd = p.u8(body + 1); val cls = p.u8(body + 2)
        if (cls == 1) { o.layoutAddr = p.u64(body + 8); o.layoutSize = 0L }
      } else if (ver == 4) {
        if (p.u8(body + 1) == 1) { o.layoutAddr = p.u64(body + 2); o.layoutSize = p.u64(body + 10) }
      }
    case 0x0B => // Filter Pipeline (applied to chunked raw data)
      val ver = p.u8(body)
      val nf = p.u8(body + 1)
      var q = if (ver == 1) body + 8 else body + 2
      var i = 0
      while (i < nf && q + 8 <= p.b.length) {
        val id = p.u16(q)
        val hasName = ver == 1 || id >= 256
        val nameLen = if (hasName) p.u16(q + 2) else 0
        val off = if (hasName) 2 else 0
        val nClient = p.u16(q + 4 + off)
        q += 6 + off
        q += (if (ver == 1) ((nameLen + 7) / 8) * 8 else nameLen) // padded name (v1)
        val client = (0 until nClient).map(j => p.u32(q + 4L * j)).toArray
        q += 4L * nClient
        if (ver == 1 && nClient % 2 == 1) q += 4 // v1 pads client data to 8 bytes
        o.filters ::= ((id, client))
        i += 1
      }
      o.filters = o.filters.reverse // pipeline order as stored
    case 0x0C => parseAttr(p, body).foreach { case (k, v) => o.attrs += (k -> v) }
    case 0x10 if v2 => // continuation: "OCHK" + messages + checksum
      val co = p.u64(body); val cl = p.u64(body + 8)
      if (p.sig(co, "OCHK")) messagesV2(p, co + 4, co + cl - 4, track, o, depth + 1)
    case 0x11 => o.symBtree = p.u64(body); o.symHeap = p.u64(body + 8)
    case _ => ()
  }

  // ------------------------------------------------------------ messages

  private def parseDataspace(p: P, off: Long): Seq[Long] = {
    val ver = p.u8(off)
    val nd = p.u8(off + 1)
    val base = if (ver == 1) off + 8 else off + 4
    (0 until nd).map(i => p.u64(base + 8L * i))
  }

  private def parseDatatype(p: P, off: Long): Dt = {
    val cv = p.u8(off)
    val cls = cv & 0x0f
    val bits0 = p.u8(off + 1)
    val size = p.u32(off + 4).toInt
    Dt(cls, size, (bits0 & 0x08) != 0)
  }

  /** Link message body (v1): returns (name, objectHeaderAddress, bytesConsumed). */
  private def parseLinkBody(p: P, off: Long): Option[(String, Long, Long)] = {
    if (off >= p.b.length || p.u8(off) != 1) return None
    val lf = p.u8(off + 1)
    var q = off + 2
    var ltype = 0
    if ((lf & 0x08) != 0) { ltype = p.u8(q); q += 1 }
    if ((lf & 0x04) != 0) q += 8
    if ((lf & 0x10) != 0) q += 1
    val lsz = 1 << (lf & 0x3)
    var nlen = 0L
    var i = 0
    while (i < lsz) { nlen |= (p.u8(q + i).toLong << (8 * i)); i += 1 }
    q += lsz
    if (ltype != 0 || nlen <= 0 || nlen > 1024 || q + nlen + 8 > p.b.length) return None
    val name = p.str(q, nlen.toInt)
    if (name.isEmpty || !name.forall(c => c >= 32 && c < 127)) return None
    Some((name, p.u64(q + nlen), q + nlen + 8 - off))
  }

  private def parseAttr(p: P, off: Long): Option[(String, String)] = {
    val ver = p.u8(off)
    var nameOff = 0L; var name = ""; var dtOff = 0L; var dsOff = 0L; var dataOff = 0L
    var dt: Dt = null; var dims: Seq[Long] = Nil
    if (ver == 3) {
      val nsz = p.u16(off + 2); val dtsz = p.u16(off + 4); val dssz = p.u16(off + 6)
      nameOff = off + 9
      name = p.str(nameOff, nsz)
      dtOff = nameOff + nsz
      dt = parseDatatype(p, dtOff)
      dsOff = dtOff + dtsz
      dims = parseDataspace(p, dsOff)
      dataOff = dsOff + dssz
    } else if (ver == 1) {
      val nsz = p.u16(off + 2); val dtsz = p.u16(off + 4); val dssz = p.u16(off + 6)
      def pad8(x: Int): Int = ((x + 7) / 8) * 8
      nameOff = off + 8
      name = p.str(nameOff, nsz)
      dtOff = nameOff + pad8(nsz)
      dt = parseDatatype(p, dtOff)
      dsOff = dtOff + pad8(dtsz)
      dims = parseDataspace(p, dsOff)
      dataOff = dsOff + pad8(dssz)
    } else return None
    if (name.isEmpty) return None
    var n = 1L
    dims.foreach(d => n *= d)
    if (n < 0 || n > 4096) return None
    val value: String = dt.cls match {
      case 3 => p.str(dataOff, dt.size) // fixed string (scalar)
      case 9 => // variable-length (string) via global heap
        if (dataOff + 16 > p.b.length) return None
        val len = p.u32(dataOff).toInt
        val gaddr = p.u64(dataOff + 4)
        val gidx = p.u32(dataOff + 12).toInt
        globalHeapObj(p, gaddr, gidx).map(s => s.take(len)).getOrElse(return None)
      case 0 =>
        (0L until math.min(n, 16L)).map { i =>
          val o2 = dataOff + i * dt.size
          dt.size match {
            case 1 => p.u8(o2).toString
            case 2 => p.u16(o2).toString
            case 4 => p.bb.getInt(o2.toInt).toString
            case _ => p.u64(o2).toString
          }
        }.mkString(",")
      case 1 =>
        (0L until math.min(n, 16L)).map { i =>
          val o2 = dataOff + i * dt.size
          if (dt.size == 4) p.bb.getFloat(o2.toInt).toString else p.bb.getDouble(o2.toInt).toString
        }.mkString(",")
      case _ => return None // references, compounds: not needed
    }
    Some((name, value))
  }

  private def globalHeapObj(p: P, addr: Long, idx: Int): Option[String] = {
    if (!p.sig(addr, "GCOL")) return None
    var off = addr + 16
    var guard = 0
    while (guard < 10000 && off + 16 <= p.b.length) {
      val oidx = p.u16(off)
      val sz = p.u64(off + 8)
      if (oidx == idx) return Some(p.str(off + 16, sz.toInt))
      if (oidx == 0) return None
      off += 16 + ((sz + 7) / 8) * 8
      guard += 1
    }
    None
  }

  // ------------------------------------------------------------ dense links

  /** Fractal heap (FRHP) holding link messages: root direct block, or a
    * one-level indirect block of direct blocks — covers netCDF-written files.
    */
  private def fractalLinks(p: P, fh: Long): Seq[(String, Long)] = {
    if (!p.sig(fh, "FRHP")) return Nil
    val flags = p.u8(fh + 9)
    val tableWidth = p.u16(fh + 110)
    val maxHeapBits = p.u16(fh + 128)
    val rootAddr = p.u64(fh + 132)
    val curRows = p.u16(fh + 140)
    val offSz = (maxHeapBits + 7) / 8
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def direct(addr: Long): Unit = {
      if (!p.sig(addr, "FHDB")) return
      var q = addr + 5 + 8 + offSz
      if ((flags & 0x02) != 0) q += 4 // checksummed direct blocks
      var more = true
      while (more) {
        parseLinkBody(p, q) match {
          case Some((name, oaddr, consumed)) => out += ((name, oaddr)); q += consumed
          case None => more = false
        }
      }
    }
    if (rootAddr == Undef) return Nil
    if (curRows == 0) direct(rootAddr)
    else if (p.sig(rootAddr, "FHIB")) {
      var q = rootAddr + 5 + 8 + offSz
      var i = 0
      while (i < curRows * tableWidth) {
        val a = p.u64(q + 8L * i)
        if (a != Undef) direct(a)
        i += 1
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------ v1 groups

  /** Symbol-table groups (v1 B-tree "TREE" + local heap "HEAP" + "SNOD"). */
  private def symTableLinks(p: P, btree: Long, heap: Long): Seq[(String, Long)] = {
    if (!p.sig(heap, "HEAP")) return Nil
    val dataAddr = p.u64(heap + 24)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def node(addr: Long, depth: Int): Unit = {
      if (depth > 16) return
      if (p.sig(addr, "TREE")) {
        val n = p.u16(addr + 6)
        var i = 0
        while (i < n) { node(p.u64(addr + 24 + 8 + 16L * i), depth + 1); i += 1 }
      } else if (p.sig(addr, "SNOD")) {
        val n = p.u16(addr + 6)
        var q = addr + 8
        var i = 0
        while (i < n) {
          val nameOff = p.u64(q); val oaddr = p.u64(q + 8)
          out += ((p.str(dataAddr + nameOff, 256), oaddr))
          q += 40; i += 1
        }
      }
    }
    node(btree, 0)
    out.toSeq
  }

  // ------------------------------------------------------------ data

  private def elemAt(b: Array[Byte], off: Int, dt: Dt): Double = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    (dt.cls, dt.size) match {
      case (1, 4) => bb.getFloat(off).toDouble
      case (1, 8) => bb.getDouble(off)
      case (0, 1) => if (dt.signed) b(off).toDouble else (b(off) & 0xff).toDouble
      case (0, 2) => if (dt.signed) bb.getShort(off).toDouble else (bb.getShort(off) & 0xffff).toDouble
      case (0, 4) => if (dt.signed) bb.getInt(off).toDouble else (bb.getInt(off).toLong & 0xffffffffL).toDouble
      case (0, 8) => bb.getLong(off).toDouble
      case _ => Double.NaN
    }
  }

  private def supportedElem(dt: Dt): Boolean = (dt.cls, dt.size) match {
    case (1, 4) | (1, 8) | (0, 1) | (0, 2) | (0, 4) | (0, 8) => true
    case _ => false
  }

  private def readNumeric(p: P, o: Obj): Option[Array[Double]] = {
    var n = 1L
    o.dims.foreach(d => n *= d)
    if (n < 0 || n > MaxElems) return None
    if (!supportedElem(o.dt)) return None
    if (o.chunkBtree != Undef) return readChunked(p, o, n.toInt)
    if (o.layoutAddr == Undef || o.layoutAddr + n * o.dt.size > p.b.length) return None
    val out = new Array[Double](n.toInt)
    var i = 0
    while (i < n) {
      out(i) = elemAt(p.b, (o.layoutAddr + i.toLong * o.dt.size).toInt, o.dt)
      i += 1
    }
    Some(out)
  }

  // ------------------------------------------------------------ chunked data

  /** Undo the pipeline for one raw chunk, last-applied filter first:
    * fletcher32 (id 3) strips its trailing checksum, shuffle (id 2)
    * de-interleaves byte planes, deflate (id 1) inflates — the three filters
    * the netCDF-4 library writes. An unknown filter fails the read (None)
    * unless the chunk's filter mask bit says it was skipped at write time.
    */
  private def defilter(raw: Array[Byte], filters: List[(Int, Array[Long])],
                       mask: Long, elemSize: Int): Option[Array[Byte]] = {
    var buf = raw
    for (((id, _), idx) <- filters.zipWithIndex.reverse) {
      if ((mask & (1L << idx)) == 0) id match {
        case 1 =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(buf)
          val outStream = new java.io.ByteArrayOutputStream(math.max(64, buf.length * 4))
          val tmp = new Array[Byte](8192)
          while (!inf.finished() && !inf.needsInput()) {
            val k = inf.inflate(tmp)
            if (k == 0 && !inf.finished()) return None // truncated/corrupt stream
            outStream.write(tmp, 0, k)
            if (outStream.size() > (MaxElems.toLong * 8)) return None
          }
          inf.end()
          buf = outStream.toByteArray
        case 2 =>
          if (elemSize > 1 && buf.length % elemSize == 0) {
            val nEl = buf.length / elemSize
            val un = new Array[Byte](buf.length)
            var j = 0
            while (j < elemSize) {
              var e = 0
              while (e < nEl) { un(e * elemSize + j) = buf(j * nEl + e); e += 1 }
              j += 1
            }
            buf = un
          }
        case 3 =>
          if (buf.length < 4) return None
          buf = java.util.Arrays.copyOfRange(buf, 0, buf.length - 4)
        case _ => return None
      }
    }
    Some(buf)
  }

  /** Chunked dataset via the v1 B-tree index (node type 1): walk interior
    * levels to the chunk leaves, de-filter each chunk, scatter its elements
    * into the row-major output by n-dimensional offset arithmetic (covers
    * the unlimited-dimension coordinate variables netCDF always stores
    * chunked, compressed or not).
    */
  private def readChunked(p: P, o: Obj, n: Int): Option[Array[Double]] = {
    val nd = o.dims.length
    if (o.chunkDims == null || o.chunkDims.length != nd + 1) return None
    if (o.chunkDims(nd) != o.dt.size) return None
    val out = new Array[Double](n)
    java.util.Arrays.fill(out, Double.NaN) // unwritten chunks surface as NaN
    val rowStride = new Array[Long](nd) // row-major strides of the dataset
    var s = 1L
    for (d <- (nd - 1) to 0 by -1) { rowStride(d) = s; s *= o.dims(d) }
    var guard = 0

    def walk(addr: Long): Boolean = {
      guard += 1
      if (guard > 100000 || !p.sig(addr, "TREE")) return false
      if (p.u8(addr + 4) != 1) return false // node type 1 = raw-data chunks
      val level = p.u8(addr + 5)
      val used = p.u16(addr + 6)
      // key: chunk byte size (u32), filter mask (u32), nd+1 offsets (u64)
      val keySz = 8L + 8L * (nd + 1)
      var q = addr + 24
      var i = 0
      while (i < used) {
        val chunkBytes = p.u32(q)
        val mask = p.u32(q + 4)
        val offs = (0 until nd).map(d => p.u64(q + 8 + 8L * d))
        val child = p.u64(q + keySz)
        if (level > 0) {
          if (!walk(child)) return false
        } else {
          if (child < 0 || child + chunkBytes > p.b.length) return false
          val raw = java.util.Arrays.copyOfRange(p.b, child.toInt, (child + chunkBytes).toInt)
          val data = defilter(raw, o.filters, mask, o.dt.size).getOrElse(return false)
          // scatter the chunk (row-major within the chunk) into the output
          val cd = o.chunkDims
          var ce = 1
          for (d <- 0 until nd) ce *= cd(d)
          if (data.length < ce.toLong * o.dt.size) return false
          var e = 0
          while (e < ce) {
            // local coords of element e within the chunk
            var gIdx = 0L; var inBounds = true
            var d = nd - 1; var stride = 1
            while (d >= 0) {
              val loc = (e / stride) % cd(d)
              val g = offs(d) + loc
              if (g >= o.dims(d)) inBounds = false
              gIdx += g * rowStride(d)
              stride *= cd(d)
              d -= 1
            }
            if (inBounds && gIdx >= 0 && gIdx < n)
              out(gIdx.toInt) = elemAt(data, e * o.dt.size, o.dt)
            e += 1
          }
        }
        q += keySz + 8
        i += 1
      }
      true
    }

    if (walk(o.chunkBtree)) Some(out) else None
  }
}
