package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal SQLite database WRITER — the inverse of `parse.SqliteRead`, built
  * from the same documented file format (sqlite.org/fileformat2): rowid-table
  * B-trees (leaf + interior levels to any depth), record serial types,
  * overflow-page chains for oversized cells, and the 100-byte header with an
  * application id / user version (what makes the output a GeoPackage).
  * Legacy journaling mode, UTF-8 text, no indices, no freelist — a freshly
  * created single-writer database needs none of them. Every structure emitted
  * here is round-trippable by SqliteRead, which is itself golden-tested
  * against the reference's fixture .gpkg bytes.
  */
object SqliteWrite {

  /** One rowid table: `rows(i)` are column values (Long / Double / String /
    * Array[Byte] / null); `rowids` defaults to 1..n. An INTEGER PRIMARY KEY
    * column must be passed as null in the row — SQLite stores it as the
    * rowid, which is exactly how readers (ours included) resolve it.
    */
  final case class Table(name: String, createSql: String, rows: Seq[Array[Any]],
                         rowids: Option[Seq[Long]] = None)

  private val PageSize = 4096

  def build(tables: Seq[Table], applicationId: Int, userVersion: Int): Array[Byte] = {
    val pages = ArrayBuffer[Array[Byte]](null) // index p-1 → page p; page 1 reserved
    def alloc(): Int = { pages += null; pages.length }
    val u = PageSize // usable size (0 reserved bytes)

    // ---- record encoding (serial types) ----
    def varint(v: Long): Array[Byte] = {
      if (v == 0) return Array(0)
      if (v < 0) {
        // full 9-byte form: 8 leading 7-bit groups + trailing whole byte
        val out = new Array[Byte](9)
        var i = 0
        while (i < 8) { out(i) = (((v >>> (8 + 7 * (7 - i))) & 0x7f) | 0x80).toByte; i += 1 }
        out(8) = (v & 0xff).toByte
        return out
      }
      val groups = ArrayBuffer.empty[Int]
      var x = v
      while (x != 0) { groups += (x & 0x7f).toInt; x >>>= 7 }
      val out = groups.reverse.map(_ | 0x80).toArray
      out(out.length - 1) &= 0x7f
      out.map(_.toByte)
    }

    def record(row0: Array[Any]): Array[Byte] = {
      val row = row0.map { case i: Int => i.toLong; case o => o }
      val bodies = ArrayBuffer.empty[Array[Byte]]
      val types = row.map {
        case null => bodies += Array.emptyByteArray; 0L
        case v: Long =>
          if (v == 0) { bodies += Array.emptyByteArray; 8L }
          else if (v == 1) { bodies += Array.emptyByteArray; 9L }
          else {
            val n = if (v >= Byte.MinValue && v <= Byte.MaxValue) 1
                    else if (v >= Short.MinValue && v <= Short.MaxValue) 2
                    else if (v >= -8388608L && v <= 8388607L) 3
                    else if (v >= Int.MinValue && v <= Int.MaxValue) 4 else 8
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = (v >>> (8 * (n - 1 - i))).toByte; i += 1 }
            bodies += b
            n match { case 1 => 1L; case 2 => 2L; case 3 => 3L; case 4 => 4L; case _ => 6L }
          }
        case v: Double =>
          val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(v).array()
          bodies += b; 7L
        case s: String =>
          val b = s.getBytes("UTF-8"); bodies += b; 13L + 2 * b.length
        case a: Array[Byte] => bodies += a; 12L + 2 * a.length
        case other => throw new IllegalArgumentException(s"unsupported value $other")
      }
      val typeBytes = types.map(varint)
      // header length varint includes itself — 1 byte unless huge
      var hdrLen = 1 + typeBytes.map(_.length).sum
      if (hdrLen > 127) hdrLen = varint(hdrLen + 1).length + typeBytes.map(_.length).sum
      val out = ArrayBuffer.empty[Byte]
      out ++= varint(hdrLen)
      typeBytes.foreach(out ++= _)
      bodies.foreach(out ++= _)
      out.toArray
    }

    // ---- leaf cell (with overflow spill, mirroring SqliteRead.payload) ----
    def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val p = payload.length
      val x = u - 35
      val head = varint(p.toLong) ++ varint(rowid)
      if (p <= x) head ++ payload
      else {
        val m = (u - 12) * 32 / 255 - 23
        val k = m + (p - m) % (u - 4)
        val local = if (k <= x) k else m
        // spill the tail to a chain of overflow pages, 4-byte next pointer each
        var rest = java.util.Arrays.copyOfRange(payload, local, p)
        val chain = ArrayBuffer.empty[Int]
        while (rest.nonEmpty) {
          chain += alloc()
          rest = rest.drop(u - 4)
        }
        var tail = java.util.Arrays.copyOfRange(payload, local, p)
        for ((pg, idx) <- chain.zipWithIndex) {
          val page = new Array[Byte](PageSize)
          val next = if (idx + 1 < chain.length) chain(idx + 1) else 0
          ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN).putInt(0, next)
          val take = math.min(u - 4, tail.length)
          System.arraycopy(tail, 0, page, 4, take)
          tail = tail.drop(take)
          pages(pg - 1) = page
        }
        val ptr = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(chain.head).array()
        head ++ payload.take(local) ++ ptr
      }
    }

    // ---- page assembly ----
    /** Pack cells into a b-tree page image. `hdrOff` is 100 on page 1. */
    def makePage(ptype: Int, cells: Seq[Array[Byte]], rightmost: Int, hdrOff: Int): Array[Byte] = {
      val page = new Array[Byte](PageSize)
      val be = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
      val hdrLen = if (ptype == 0x05) 12 else 8
      page(hdrOff) = ptype.toByte
      be.putShort(hdrOff + 3, cells.length.toShort)
      if (ptype == 0x05) be.putInt(hdrOff + 8, rightmost)
      var off = PageSize
      val ptrs = cells.map { c => off -= c.length; System.arraycopy(c, 0, page, off, c.length); off }
      be.putShort(hdrOff + 5, off.toShort) // cell content start (0 would mean 65536)
      var pa = hdrOff + hdrLen
      for (p <- ptrs) { be.putShort(pa, p.toShort); pa += 2 }
      require(pa <= off, s"page overflow: pointer array $pa > content $off")
      page
    }

    def leafCapacityOk(sizes: Seq[Int], hdrOff: Int): Boolean =
      hdrOff + 8 + 2 * sizes.length + sizes.sum <= u

    /** Build a table b-tree bottom-up; returns the root page number.
      * `rootAt1` pins the root onto page 1 (sqlite_master).
      */
    def buildTree(rowidAndCells: Seq[(Long, Array[Byte])], rootAt1: Boolean): Int = {
      val rootHdrOff = if (rootAt1) 100 else 0
      // single-leaf fast path (empty table included)
      if (leafCapacityOk(rowidAndCells.map(_._2.length), rootHdrOff)) {
        val pg = if (rootAt1) 1 else alloc()
        pages(pg - 1) = makePage(0x0d, rowidAndCells.map(_._2), 0, rootHdrOff)
        return pg
      }
      // pack leaves greedily
      val leaves = ArrayBuffer.empty[(Int, Long)] // (page, max rowid)
      var cur = ArrayBuffer.empty[(Long, Array[Byte])]
      def flushLeaf(): Unit = if (cur.nonEmpty) {
        val pg = alloc()
        pages(pg - 1) = makePage(0x0d, cur.map(_._2).toSeq, 0, 0)
        leaves += ((pg, cur.last._1))
        cur.clear()
      }
      for ((rid, c) <- rowidAndCells) {
        if (!leafCapacityOk(cur.map(_._2.length).toSeq :+ c.length, 0)) flushLeaf()
        cur += ((rid, c))
      }
      flushLeaf()
      // interior levels until a single root remains; the root of a rootAt1
      // tree goes on page 1 (with the 100-byte header offset)
      var level: Seq[(Int, Long)] = leaves.toSeq
      if (rootAt1 && level.length == 1) {
        // the page-1 capacity check (100-byte header) failed but greedy
        // packing fit every cell into one offset-0 leaf: page 1 must still
        // hold the root, so give it a one-child interior root — otherwise
        // the file ships with a zeroed page 1 and an unreadable schema
        pages(0) = makePage(0x05, Nil, level.head._1, 100)
        return 1
      }
      while (level.length > 1) {
        val next = ArrayBuffer.empty[(Int, Long)]
        var group = ArrayBuffer.empty[(Int, Long)]
        def flushInterior(): Unit = if (group.nonEmpty) {
          val cells = group.dropRight(1).map { case (pg, key) =>
            ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(pg).array() ++ varint(key)
          }
          val isRoot = next.isEmpty && group.length == level.length
          val onPage1 = isRoot && rootAt1
          val pg = if (onPage1) 1 else alloc()
          pages(pg - 1) = makePage(0x05, cells.toSeq, group.last._1, if (onPage1) 100 else 0)
          next += ((pg, group.last._2))
          group.clear()
        }
        for (child <- level) {
          // conservative capacity check (64-byte slack covers the root's
          // 100-byte offset never being hit below ~300 children per page)
          val trial = (group :+ child).dropRight(1).map { case (_, k) => 4 + varint(k).length }
          if (12 + 2 * trial.length + trial.sum > u - 112) flushInterior()
          group += child
        }
        flushInterior()
        level = next.toSeq
      }
      level.head._1
    }

    // ---- build table trees, then sqlite_master on page 1 ----
    val masterRows = ArrayBuffer.empty[Array[Any]]
    for (t <- tables) {
      val rowids = t.rowids.getOrElse((1L to t.rows.length.toLong))
      require(rowids.length == t.rows.length, s"${t.name}: rowids/rows length mismatch")
      val cells = rowids.zip(t.rows).map { case (rid, row) => (rid, leafCell(rid, record(row))) }
      val root = buildTree(cells, rootAt1 = false)
      masterRows += Array[Any]("table", t.name, t.name, root.toLong, t.createSql)
    }
    val masterCells = masterRows.zipWithIndex.map { case (row, i) =>
      ((i + 1).toLong, leafCell((i + 1).toLong, record(row)))
    }
    buildTree(masterCells.toSeq, rootAt1 = true)

    // ---- header + file image ----
    val nPages = pages.length
    val out = new Array[Byte](nPages * PageSize)
    for ((pg, i) <- pages.zipWithIndex; if pg != null)
      System.arraycopy(pg, 0, out, i * PageSize, PageSize)
    val h = ByteBuffer.wrap(out).order(ByteOrder.BIG_ENDIAN)
    System.arraycopy("SQLite format 3\u0000".getBytes("US-ASCII"), 0, out, 0, 16)
    h.putShort(16, PageSize.toShort)
    out(18) = 1; out(19) = 1 // legacy write/read version
    out(20) = 0 // reserved bytes
    out(21) = 64; out(22) = 32; out(23) = 32 // payload fractions (fixed by spec)
    h.putInt(24, 1) // file change counter
    h.putInt(28, nPages)
    h.putInt(40, 1) // schema cookie
    h.putInt(44, 4) // schema format (supports serial types 8/9)
    h.putInt(56, 1) // UTF-8
    h.putInt(60, userVersion)
    h.putInt(68, applicationId)
    h.putInt(92, 1) // version-valid-for = change counter
    h.putInt(96, 3045000) // sqlite version number stamp
    out
  }
}
