package graft.parse

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal read-only SQLite file parser — just enough of the documented file
  * format (sqlite.org/fileformat2) to scan rowid tables: header, table
  * B-trees (interior + leaf pages), record serial types, and overflow-page
  * chains. No indices, no WAL, no freelist reuse, UTF-8 text only. This is
  * what makes GeoPackage READING possible in a sandbox with no SQLite driver
  * (the writer side remains out of scope — see COVERAGE.md).
  */
object SqliteRead {

  final case class Db(bytes: Array[Byte], pageSize: Int, usable: Int)

  def open(bytes: Array[Byte]): Option[Db] = {
    if (bytes.length < 100) return None
    if (!new String(bytes, 0, 16, "US-ASCII").startsWith("SQLite format 3")) return None
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val raw = be.getShort(16) & 0xffff
    val pageSize = if (raw == 1) 65536 else raw
    // format rule (fileformat2 §1.3): page size is a power of two in
    // [512, 65536] and the usable size is ≥ 480. Rejecting anything else up
    // front means no downstream size arithmetic (overflow-chain local/k/m)
    // can go non-positive on a flipped header byte.
    if (pageSize < 512 || (pageSize & (pageSize - 1)) != 0) return None
    val reserved = bytes(20) & 0xff
    if (pageSize - reserved < 480) return None
    Some(Db(bytes, pageSize, pageSize - reserved))
  }

  /** (value, bytesConsumed) of a SQLite varint at `off`. */
  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xff), 9)
  }

  /** Assemble a cell payload, following the overflow chain when spilled.
    * Malformed-input contract: a corrupt length varint must raise a NonFatal
    * error, not allocate multi-GB (a payload can never exceed the file size).
    */
  private def payload(db: Db, page: Int, cellOff: Int): Array[Byte] = {
    val b = db.bytes
    val (pLen0, n1) = varint(b, cellOff)
    require(pLen0 >= 0 && pLen0 <= b.length, s"corrupt payload length $pLen0")
    val pLen = pLen0.toInt
    val (_, n2) = varint(b, cellOff + n1) // rowid
    val local0 = cellOff + n1 + n2
    val u = db.usable
    val x = u - 35
    if (pLen <= x) java.util.Arrays.copyOfRange(b, local0, local0 + pLen)
    else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + (pLen - m) % (u - 4)
      val local = if (k <= x) k else m
      val out = new Array[Byte](pLen)
      System.arraycopy(b, local0, out, 0, local)
      var written = local
      var next = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN).getInt(local0 + local)
      while (next != 0 && written < pLen) {
        val pOff = (next - 1) * db.pageSize
        val take = math.min(pLen - written, u - 4)
        System.arraycopy(b, pOff + 4, out, written, take)
        written += take
        next = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN).getInt(pOff)
      }
      out
    }
  }

  /** Decode a record payload into column values (Long / Double / String /
    * Array[Byte] / null).
    */
  def decodeRecord(p: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(p, 0)
    var hOff = n0
    val types = Array.newBuilder[Long]
    while (hOff < hdrLen) {
      val (t, n) = varint(p, hOff)
      types += t
      hOff += n
    }
    val bb = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    var off = hdrLen.toInt
    types.result().map { t =>
      def intN(n: Int): Long = {
        var v = if ((p(off) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < n) { v = (v << 8) | (p(off + i) & 0xff); i += 1 }
        off += n
        v
      }
      t match {
        case 0 => null
        case 1 => intN(1)
        case 2 => intN(2)
        case 3 => intN(3)
        case 4 => intN(4)
        case 5 => intN(6)
        case 6 => intN(8)
        case 7 => val v = bb.getDouble(off); off += 8; v
        case 8 => 0L
        case 9 => 1L
        case 10 | 11 => null // reserved serial types: no payload bytes, treat as null
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(p, off, len, "UTF-8"); off += len; s
        case n if n >= 12 =>
          val len = ((n - 12) / 2).toInt
          val a = java.util.Arrays.copyOfRange(p, off, off + len); off += len; a
      }
    }
  }

  /** All records of the table b-tree rooted at `rootPage` (1-based).
    * Malformed-input contract: corrupt bytes raise NonFatal errors only —
    * a page cycle or out-of-range child pointer from a bit flip must not
    * become a StackOverflowError (fatal: it would kill the task, not the
    * row), so visited pages and depth are checked explicitly.
    */
  def scanTable(db: Db, rootPage: Int): Seq[Array[Any]] = {
    val out = Seq.newBuilder[Array[Any]]
    val nPages = db.bytes.length / db.pageSize
    val visited = scala.collection.mutable.HashSet.empty[Int]
    def walk(page: Int, depth: Int): Unit = {
      require(depth < 64, "b-tree deeper than any valid SQLite file")
      require(page >= 1 && page <= nPages, s"child page $page outside file (1..$nPages)")
      require(visited.add(page), s"b-tree page cycle at page $page")
      val base = (page - 1) * db.pageSize
      val hdr = base + (if (page == 1) 100 else 0)
      val be = ByteBuffer.wrap(db.bytes).order(ByteOrder.BIG_ENDIAN)
      val ptype = db.bytes(hdr) & 0xff
      val nCells = be.getShort(hdr + 3) & 0xffff
      ptype match {
        case 0x0d => // table leaf
          var i = 0
          while (i < nCells) {
            val cellOff = base + (be.getShort(hdr + 8 + 2 * i) & 0xffff)
            out += decodeRecord(payload(db, page, cellOff))
            i += 1
          }
        case 0x05 => // table interior
          var i = 0
          while (i < nCells) {
            val cellOff = base + (be.getShort(hdr + 12 + 2 * i) & 0xffff)
            walk(be.getInt(cellOff), depth + 1)
            i += 1
          }
          walk(be.getInt(hdr + 8), depth + 1) // rightmost child
        case _ => () // index pages: not scanned
      }
    }
    walk(rootPage, 0)
    out.result()
  }

  /** (name → (rootpage, create-sql)) of every table in sqlite_master. */
  def tables(db: Db): Map[String, (Int, String)] =
    scanTable(db, 1).flatMap { r =>
      // sqlite_master: type, name, tbl_name, rootpage, sql
      (r(0), r(1), r(3), r(4)) match {
        case ("table", name: String, root: Long, sql: String) => Some(name -> ((root.toInt, sql)))
        case _ => None
      }
    }.toMap

  /** Column names from a CREATE TABLE statement (top-level comma split). */
  def columnNames(createSql: String): Array[String] = {
    val open = createSql.indexOf('(')
    val close = createSql.lastIndexOf(')')
    if (open < 0 || close <= open) return Array.empty
    val body = createSql.substring(open + 1, close)
    val parts = Array.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    for (c <- body) c match {
      case '(' => depth += 1; cur += c
      case ')' => depth -= 1; cur += c
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case _ => cur += c
    }
    parts += cur.toString
    parts.result()
      .map(_.trim)
      .filterNot(p => Seq("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
        .exists(k => p.toUpperCase.startsWith(k + " ") || p.toUpperCase.startsWith(k + "(")))
      .map(_.split("\\s+")(0).stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
        .stripPrefix("[").stripSuffix("]"))
  }
}
