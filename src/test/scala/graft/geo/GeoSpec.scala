package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {

  private def rng = new java.util.Random(42)

  test("envelope folds all coords") {
    assert(Geo.envelope(Array(1.0, 2.0, -3.0, 4.0, 5.0, -6.0)) ===
      Some(Extent(-3.0, -6.0, 5.0, 4.0)))
    assert(Geo.envelope(Array.empty[Double]).isEmpty)
    assert(Geo.envelope(Array(Double.NaN, 1.0)).isEmpty)
  }

  test("plausibility gate rejects out-of-range coords (reference helpfunctions.py:366-383)") {
    assert(Geo.plausibleWgs84(Extent(-180, -90, 180, 90)))
    assert(!Geo.plausibleWgs84(Extent(-181, 0, 0, 0)))
    assert(!Geo.plausibleWgs84(Extent(0, 0, 400, 10)))
    assert(!Geo.plausibleWgs84(Extent(10, 0, 0, 10))) // inverted
  }

  test("null island detection (reference handle_vector.py:222-228)") {
    assert(Extent(0, 0, 0, 0).isNullIsland)
    assert(!Extent(0, 0, 0.1, 0).isNullIsland)
  }

  test("PIP: rectangle membership matches bounds check (1000 random points)") {
    val ring = Array(0.0, 0.0, 10.0, 0.0, 10.0, 5.0, 0.0, 5.0, 0.0, 0.0)
    val r = rng
    (1 to 1000).foreach { _ =>
      val x = r.nextDouble() * 24 - 12
      val y = r.nextDouble() * 24 - 12
      val expected = x > 0 && x < 10 && y > 0 && y < 5
      assert(Geo.pointInRing(x, y, ring) === expected, s"at ($x,$y)")
    }
  }

  test("PIP: concave polygon") {
    // U-shape: notch from above between x=4..6
    val ring = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 6.0, 10.0, 6.0, 4.0, 4.0, 4.0, 4.0, 10.0, 0.0, 10.0)
    assert(Geo.pointInRing(5.0, 2.0, ring))   // in the base
    assert(!Geo.pointInRing(5.0, 7.0, ring))  // in the notch
    assert(Geo.pointInRing(1.0, 7.0, ring))   // left arm
  }

  test("hull contains all input points and is idempotent (100 random sets)") {
    val r = rng
    (1 to 100).foreach { _ =>
      val pts = Array.fill(3 + r.nextInt(30))((r.nextDouble() * 100 - 50, r.nextDouble() * 100 - 50))
      val hull = Geo.convexHull(pts)
      if (hull.length >= 3) {
        val ring = hull.flatMap(p => Array(p._1, p._2))
        for ((x, y) <- pts) {
          val inside = Geo.pointInRing(x, y, ring) || hull.contains((x, y)) || onAnyEdge(x, y, hull)
          assert(inside, s"($x,$y) escaped hull ${hull.toList}")
        }
      }
      assert(Geo.convexHull(hull).toList === hull.toList) // idempotent
    }
  }

  private def onAnyEdge(x: Double, y: Double, hull: Array[(Double, Double)]): Boolean = {
    hull.indices.exists { i =>
      val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.length)
      val cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
      math.abs(cross) < 1e-9 &&
        x >= math.min(x1, x2) - 1e-12 && x <= math.max(x1, x2) + 1e-12 &&
        y >= math.min(y1, y2) - 1e-12 && y <= math.max(y1, y2) + 1e-12
    }
  }

  test("hull canonical ordering is permutation-invariant") {
    val pts = Array((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (2.0, 1.0))
    val h1 = Geo.convexHull(pts)
    val h2 = Geo.convexHull(pts.reverse)
    assert(h1.toList === h2.toList)
    assert(h1.head === ((0.0, 0.0))) // starts at lexicographic min
    assert(h1.length === 4)          // interior point dropped
  }

  test("hull degenerate cases") {
    assert(Geo.convexHull(Array.empty).isEmpty)
    assert(Geo.convexHull(Array((1.0, 2.0))).toList === List((1.0, 2.0)))
    assert(Geo.convexHull(Array((1.0, 1.0), (3.0, 3.0), (2.0, 2.0))).length === 2) // collinear
  }

  test("ring area: unit square") {
    assert(Geo.ringArea(Array((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))) === 1.0)
  }

  test("web-mercator roundtrip (500 random points)") {
    val r = rng
    (1 to 500).foreach { _ =>
      val lat = r.nextDouble() * 170 - 85
      val lon = r.nextDouble() * 360 - 180
      assert(math.abs(Geo.mercYToLat(Geo.latToMercY(lat)) - lat) < 1e-9)
      assert(math.abs(Geo.mercXToLon(Geo.lonToMercX(lon)) - lon) < 1e-9)
    }
  }

  test("web-mercator roundtrip on the 2^-20 grid is EXACT after snap") {
    // the 3857 payload-family contract: any grid coordinate survives a
    // forward (generator) + inverse (parser) + snap trip bit-exactly
    val r = rng
    (1 to 2000).foreach { _ =>
      val lat = math.rint((r.nextDouble() * 160 - 80) * 1048576.0) / 1048576.0
      val lon = math.rint((r.nextDouble() * 360 - 180) * 1048576.0) / 1048576.0
      assert(Geo.snapDeg(Geo.mercYToLat(Geo.latToMercY(lat))) === lat)
      assert(Geo.snapDeg(Geo.mercXToLon(Geo.lonToMercX(lon))) === lon)
    }
    val e = Geo.mercExtentToWgs84(Geo.extentToMercator(Extent(-3.625, 40.5, 13.375, 52.5)))
    assert(e === Extent(-3.625, 40.5, 13.375, 52.5))
  }
}
