package graft.cells

import graft.geo.{Extent, Geo}

/** Hierarchical quadkey cell index on Web-Mercator tiles, from scratch
  * (no H3/S2 jar available — SURVEY §7). This is the engine's spatial
  * partitioning key for cell-equi joins, PIP prefilters, kNN grids, and the
  * raster↔vector tiler.
  *
  * Key layout: a cell at zoom z with tile coords (x,y) is encoded as
  * `(1L << (2*z)) | morton(x,y)` — the leading 1-bit acts as a level marker so
  * keys are unique across levels, `parent(key) = key >> 2`, and the 4 children
  * of k are `(k<<2)|0..3`. Supports z ≤ 29.
  */
object QuadKey {

  val MaxZoom = 29

  /** Web-Mercator normalized y in [0,1] (tile space). */
  @inline def mercY(lat: Double): Double = {
    val s = math.sin(math.toRadians(lat))
    0.5 - math.log((1 + s) / (1 - s)) / (4 * math.Pi)
  }
  @inline def mercX(lon: Double): Double = (lon + 180.0) / 360.0

  @inline private def clampTile(t: Long, z: Int): Int = {
    val n = 1L << z
    if (t < 0) 0 else if (t >= n) (n - 1).toInt else t.toInt
  }

  def tileX(lon: Double, z: Int): Int = clampTile(math.floor(mercX(lon) * (1L << z)).toLong, z)
  def tileY(lat: Double, z: Int): Int = clampTile(math.floor(mercY(lat) * (1L << z)).toLong, z)

  /** Interleave x (even bits) and y (odd bits). */
  def morton(x: Int, y: Int): Long = split(x) | (split(y) << 1)

  // Constant-time Morton spread/compact (the standard parallel-prefix bit
  // twiddles) — replaces the former bit-by-bit loops on the per-row hot path
  // (CellEncode runs one morton per corpus row). Bit i ↔ bit 2i exactly as
  // before; property-tested round-trip in QuadKeySpec.
  private def split(v: Int): Long = {
    var x = v.toLong & 0x3fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def compact(v: Long): Int = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >>> 16)) & 0x00000000ffffffffL
    x.toInt
  }

  def encodeXY(x: Int, y: Int, z: Int): Long = (1L << (2 * z)) | morton(x, y)

  def encode(lat: Double, lon: Double, z: Int): Long = encodeXY(tileX(lon, z), tileY(lat, z), z)

  def level(key: Long): Int = (63 - java.lang.Long.numberOfLeadingZeros(key)) / 2

  def decodeX(key: Long): Int = {
    val z = level(key)
    compact(key & ((1L << (2 * z)) - 1))
  }
  def decodeY(key: Long): Int = {
    val z = level(key)
    compact((key & ((1L << (2 * z)) - 1)) >>> 1)
  }

  def parent(key: Long): Long = key >>> 2
  def parentAt(key: Long, z: Int): Long = {
    val cur = level(key)
    require(z <= cur, s"parentAt: $z > $cur")
    key >>> (2 * (cur - z))
  }

  /** Tile extent in WGS84 (lat via inverse mercator). */
  def tileExtent(key: Long): Extent = {
    val z = level(key); val x = decodeX(key); val y = decodeY(key)
    val n = (1L << z).toDouble
    def lat(yy: Double): Double = {
      val v = math.Pi * (1 - 2 * yy / n)
      math.toDegrees(math.atan(math.sinh(v)))
    }
    Extent(x / n * 360.0 - 180.0, lat(y + 1.0), (x + 1) / n * 360.0 - 180.0, lat(y.toDouble))
  }

  /** All cells at zoom z covering an extent (inclusive tile-range cover).
    * Cover of a degenerate point is the single containing cell. Result count is
    * bounded by the caller's zoom choice; the tiler picks z so covers stay small.
    */
  def cover(e: Extent, z: Int): Array[Long] = {
    val x0 = tileX(e.minLon, z); val x1 = tileX(e.maxLon, z)
    val y0 = tileY(e.maxLat, z); val y1 = tileY(e.minLat, z) // y grows southward
    val out = new Array[Long]((x1 - x0 + 1) * (y1 - y0 + 1))
    var i = 0
    var y = y0
    while (y <= y1) {
      var x = x0
      while (x <= x1) { out(i) = encodeXY(x, y, z); i += 1; x += 1 }
      y += 1
    }
    out
  }

  /** [[cover]] with unpacked corner args — the static entry the codegen'd
    * CellCover expression calls from generated Java.
    */
  def coverArray(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
                 z: Int): Array[Long] =
    cover(Extent(minLon, minLat, maxLon, maxLat), z)

  /** Chebyshev ring of cells at distance r around a key's tile (clamped at the
    * antimeridian/pole edges rather than wrapping — the synthetic corpus stays
    * inside the mercator frame). r=0 → the cell itself.
    */
  def ring(key: Long, r: Int): Array[Long] = {
    val z = level(key); val x = decodeX(key); val y = decodeY(key)
    val n = (1L << z).toInt
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (r == 0) return Array(key)
    var dx = -r
    while (dx <= r) {
      var dy = -r
      while (dy <= r) {
        if (math.max(math.abs(dx), math.abs(dy)) == r) {
          val nx = x + dx; val ny = y + dy
          if (nx >= 0 && nx < n && ny >= 0 && ny < n) buf += encodeXY(nx, ny, z)
        }
        dy += 1
      }
      dx += 1
    }
    buf.toArray
  }

  /** All cells within Chebyshev distance r (disk = rings 0..r). */
  def disk(key: Long, r: Int): Array[Long] =
    (0 to r).flatMap(ring(key, _)).toArray

  /** Cell width in degrees longitude at zoom z (lat height varies with mercator). */
  def cellLonWidth(z: Int): Double = 360.0 / (1L << z)
}
