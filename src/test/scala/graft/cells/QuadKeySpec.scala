package graft.cells

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Extent

class QuadKeySpec extends AnyFunSuite {

  test("encode/decode roundtrip across zooms (seeded random)") {
    val r = new java.util.Random(7)
    for (_ <- 1 to 500) {
      val z = 1 + r.nextInt(16)
      val x = r.nextInt(1 << z)
      val y = r.nextInt(1 << z)
      val key = QuadKey.encodeXY(x, y, z)
      assert(QuadKey.level(key) === z)
      assert(QuadKey.decodeX(key) === x)
      assert(QuadKey.decodeY(key) === y)
    }
  }

  test("keys unique across levels; parent relation") {
    val k = QuadKey.encode(51.5, 7.5, 10)
    val p = QuadKey.parent(k)
    assert(QuadKey.level(p) === 9)
    assert(QuadKey.parentAt(k, 4) === QuadKey.encode(51.5, 7.5, 4))
    // a point's cell at z is always a descendant of its cell at z-1
    val r = new java.util.Random(11)
    for (_ <- 1 to 200) {
      val lat = r.nextDouble() * 160 - 80
      val lon = r.nextDouble() * 340 - 170
      assert(QuadKey.parent(QuadKey.encode(lat, lon, 8)) === QuadKey.encode(lat, lon, 7))
    }
  }

  test("tileExtent contains the encoded point") {
    val r = new java.util.Random(13)
    for (_ <- 1 to 200) {
      val lat = r.nextDouble() * 160 - 80
      val lon = r.nextDouble() * 340 - 170
      val ext = QuadKey.tileExtent(QuadKey.encode(lat, lon, 9))
      assert(lon >= ext.minLon - 1e-9 && lon <= ext.maxLon + 1e-9)
      assert(lat >= ext.minLat - 1e-9 && lat <= ext.maxLat + 1e-9)
    }
  }

  test("cover ⊇ extent: every point's cell is in the cover of any extent containing it") {
    val r = new java.util.Random(17)
    for (_ <- 1 to 200) {
      val lon0 = r.nextDouble() * 300 - 160
      val lat0 = r.nextDouble() * 130 - 70
      val e = Extent(lon0, lat0, lon0 + 1 + r.nextDouble() * 8, lat0 + 1 + r.nextDouble() * 8)
      val cover = QuadKey.cover(e, 6).toSet
      // sample interior points
      for (_ <- 1 to 10) {
        val px = e.minLon + r.nextDouble() * (e.maxLon - e.minLon)
        val py = e.minLat + r.nextDouble() * (e.maxLat - e.minLat)
        assert(cover.contains(QuadKey.encode(py, px, 6)), s"point ($px,$py) cell not covered")
      }
    }
  }

  test("ring/disk sizes away from world edges") {
    val k = QuadKey.encode(40.0, 10.0, 8)
    assert(QuadKey.ring(k, 0).length === 1)
    assert(QuadKey.ring(k, 1).length === 8)
    assert(QuadKey.ring(k, 2).length === 16)
    assert(QuadKey.disk(k, 2).length === 25)
  }

  test("CellCover Catalyst expression equals QuadKey.cover / the cover UDF, incl. world edges") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val r = new java.util.Random(41)
    val rows = Seq.fill(300) {
      val lon0 = r.nextDouble() * 340 - 170
      val lat0 = r.nextDouble() * 160 - 80
      (lon0, lat0, lon0 + r.nextDouble() * 30, lat0 + r.nextDouble() * 15)
    } ++ Seq( // clamped extremes: antimeridian / mercator cut corners
      (-180.0, -85.06, -179.0, -84.0), (179.0, 84.0, 180.0, 85.06),
      (-180.0, -90.0, 180.0, 90.0), (7.5, 51.5, 7.5, 51.5))
    for (zoom <- Seq(4, 6, 7)) {
      val df = rows.toDF("a", "b", "c", "d")
      val expr = df.select(graft.tiles.Tiler.cover(col("a"), col("b"), col("c"), col("d"), zoom))
        .collect().map(_.getSeq[Long](0).toVector)
      val viaUdf = df.select(graft.tiles.Tiler.coverUdf(col("a"), col("b"), col("c"), col("d"), lit(zoom)))
        .collect().map(_.getSeq[Long](0).toVector)
      assert(expr.toSeq === viaUdf.toSeq, s"zoom $zoom")
      expr.zip(rows).foreach { case (cells, (a, b, c, d)) =>
        assert(cells === QuadKey.cover(graft.geo.Extent(a, b, c, d), zoom).toVector)
      }
    }
  }

  test("PipContains Catalyst expression equals pointInRing, incl. degenerate rings") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = new java.util.Random(53)
    def ring(k: Int): Seq[Double] = Seq.fill(k * 2)(r.nextDouble() * 40 - 20)
    val rows = Seq.fill(300) {
      (r.nextDouble() * 40 - 20, r.nextDouble() * 40 - 20, ring(3 + r.nextInt(6)))
    } ++ Seq(
      (0.0, 0.0, Seq(-1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0)), // inside rect
      (5.0, 5.0, Seq(-1.0, -1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0)), // outside rect
      (0.0, 0.0, Seq(0.0, 0.0)), (0.0, 0.0, Seq.empty[Double]))    // degenerate
    val df = rows.toDF("lon", "lat", "ring")
    val expr = df.select(graft.functions.PipContains(col("lon"), col("lat"), col("ring")))
      .collect().map(_.getBoolean(0))
    val viaUdf = df.select(graft.join.SpatialJoins.pipUdf(col("lon"), col("lat"), col("ring")))
      .collect().map(_.getBoolean(0))
    assert(expr.toSeq === viaUdf.toSeq)
    assert(expr.exists(identity) && expr.exists(!_)) // both outcomes exercised
  }

  test("CellEncode Catalyst expression equals QuadKey.encode") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = new java.util.Random(23)
    val rows = Seq.fill(200)((r.nextDouble() * 160 - 80, r.nextDouble() * 340 - 170))
    val got = rows.toDF("lat", "lon")
      .withColumn("cell", graft.functions.CellEncode(col("lat"), col("lon"), 7))
      .collect().map(x => (x.getDouble(0), x.getDouble(1), x.getLong(2)))
    got.foreach { case (lat, lon, cell) =>
      assert(cell === QuadKey.encode(lat, lon, 7))
    }
  }
}
