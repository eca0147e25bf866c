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
  * dataspace v1/v2, and CONTIGUOUS dataset layout (v1/v2/v3 messages).
  * Chunked/compressed data, v1 B-tree chunk indexes, and group-symbol-table
  * files beyond these paths return None fields rather than failing.
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
          if (o.dt != null && o.dims != null && o.layoutAddr != Undef &&
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
        if (p.u8(body + 1) == 1) { o.layoutAddr = p.u64(body + 2); o.layoutSize = p.u64(body + 10) }
      } else if (ver == 1 || ver == 2) {
        val nd = p.u8(body + 1); val cls = p.u8(body + 2)
        if (cls == 1) { o.layoutAddr = p.u64(body + 8); o.layoutSize = 0L }
      } else if (ver == 4) {
        if (p.u8(body + 1) == 1) { o.layoutAddr = p.u64(body + 2); o.layoutSize = p.u64(body + 10) }
      }
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

  private def readNumeric(p: P, o: Obj): Option[Array[Double]] = {
    var n = 1L
    o.dims.foreach(d => n *= d)
    if (n < 0 || n > MaxElems) return None
    if (o.layoutAddr == Undef || o.layoutAddr + n * o.dt.size > p.b.length) return None
    val out = new Array[Double](n.toInt)
    var i = 0
    while (i < n) {
      val off = o.layoutAddr + i.toLong * o.dt.size
      out(i) = (o.dt.cls, o.dt.size) match {
        case (1, 4) => p.bb.getFloat(off.toInt).toDouble
        case (1, 8) => p.bb.getDouble(off.toInt)
        case (0, 1) => if (o.dt.signed) p.b(off.toInt).toDouble else p.u8(off).toDouble
        case (0, 2) => if (o.dt.signed) p.bb.getShort(off.toInt).toDouble else p.u16(off).toDouble
        case (0, 4) => if (o.dt.signed) p.bb.getInt(off.toInt).toDouble else p.u32(off).toDouble
        case (0, 8) => p.u64(off).toDouble
        case _ => return None
      }
      i += 1
    }
    Some(out)
  }
}
