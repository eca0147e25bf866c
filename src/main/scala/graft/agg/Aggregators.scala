package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.geo.{Geo, SignedIso}

/** Typed merge aggregators (SURVEY §2.4 R1/R2/R3).
  *
  * All three are algebraic (commutative + associative reduce with a neutral
  * buffer), so Spark runs them as partial (map-side) + final aggregations —
  * the hierarchy merge of the reference (geoextent/lib/extent.py:700-921)
  * becomes an ordinary two-phase hash aggregation that scales with executors.
  */
object Aggregators {

  final case class BBoxIn(min_lon: Double, min_lat: Double, max_lon: Double, max_lat: Double)
  final case class BBoxBuf(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double, any: Boolean)

  /** R1 bbox_merge (reference: geoextent/lib/helpfunctions.py:592-713 —
    * rectangle union → envelope; children without a bbox are skipped; all-null
    * group → null).
    */
  class BBoxMerge extends Aggregator[BBoxIn, BBoxBuf, BBoxIn] {
    def zero: BBoxBuf = BBoxBuf(Double.MaxValue, Double.MaxValue, -Double.MaxValue, -Double.MaxValue, any = false)
    def reduce(b: BBoxBuf, a: BBoxIn): BBoxBuf =
      if (a == null) b
      else BBoxBuf(math.min(b.minLon, a.min_lon), math.min(b.minLat, a.min_lat),
        math.max(b.maxLon, a.max_lon), math.max(b.maxLat, a.max_lat), any = true)
    def merge(x: BBoxBuf, y: BBoxBuf): BBoxBuf =
      BBoxBuf(math.min(x.minLon, y.minLon), math.min(x.minLat, y.minLat),
        math.max(x.maxLon, y.maxLon), math.max(x.maxLat, y.maxLat), x.any || y.any)
    def finish(b: BBoxBuf): BBoxIn =
      if (!b.any) null else BBoxIn(b.minLon, b.minLat, b.maxLon, b.maxLat)
    def bufferEncoder: Encoder[BBoxBuf] = Encoders.product[BBoxBuf]
    def outputEncoder: Encoder[BBoxIn] = Encoders.product[BBoxIn]
  }

  final case class TBoxIn(tbox_start: String, tbox_end: String)
  final case class TBoxBuf(start: String, end: String)

  /** R3 tbox_merge with mixed CE / signed-ISO deep-time compare semantics
    * (reference: geoextent/lib/helpfunctions.py:1017-1108 — any deep-time child
    * switches the group to signed-ISO comparison; output is the raw strings).
    */
  class TBoxMerge extends Aggregator[TBoxIn, TBoxBuf, TBoxIn] {
    def zero: TBoxBuf = TBoxBuf(null, null)
    def reduce(b: TBoxBuf, a: TBoxIn): TBoxBuf =
      if (a == null || a.tbox_start == null) b
      else TBoxBuf(SignedIso.min(b.start, a.tbox_start), SignedIso.max(b.end, a.tbox_end))
    def merge(x: TBoxBuf, y: TBoxBuf): TBoxBuf =
      TBoxBuf(SignedIso.min(x.start, y.start), SignedIso.max(x.end, y.end))
    def finish(b: TBoxBuf): TBoxIn = if (b.start == null) null else TBoxIn(b.start, b.end)
    def bufferEncoder: Encoder[TBoxBuf] = Encoders.product[TBoxBuf]
    def outputEncoder: Encoder[TBoxIn] = Encoders.product[TBoxIn]
  }

  /** R2 convex_hull_merge (reference: geoextent/lib/helpfunctions.py:716-1014).
    * Input: interleaved [lon,lat,…] vertex arrays (a bbox contributes its 4
    * corners — the degenerate-promotion analog: a point is its own corner set).
    * Buffer: the running hull's vertices only (hull-of-hulls keeps buffers
    * bounded regardless of group size — SURVEY §4 spill note). Output: closed
    * canonical CCW ring, or the degenerate point/segment vertex list.
    */
  class HullMerge extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    def zero: Array[Double] = Array.empty[Double]
    private def hullOf(coords: Array[Double]): Array[Double] = {
      val pts = new Array[(Double, Double)](coords.length / 2)
      var i = 0
      while (i < pts.length) { pts(i) = (coords(2 * i), coords(2 * i + 1)); i += 1 }
      val h = Geo.convexHull(pts)
      val out = new Array[Double](h.length * 2)
      i = 0
      while (i < h.length) { out(2 * i) = h(i)._1; out(2 * i + 1) = h(i)._2; i += 1 }
      out
    }
    def reduce(b: Array[Double], a: Array[Double]): Array[Double] =
      if (a == null || a.isEmpty) b else hullOf(b ++ a)
    def merge(x: Array[Double], y: Array[Double]): Array[Double] =
      if (x.isEmpty) y else if (y.isEmpty) x else hullOf(x ++ y)
    /** Degenerate promotion on output (reference: helpfunctions.py:778-871):
      * a single point → ε-square, a 2-vertex segment → thin rectangle
      * (ε = 1e-10), so the merged hull is always a valid 2-D ring.
      */
    def finish(b: Array[Double]): Array[Double] = {
      val eps = 1e-10
      if (b.length == 2) {
        val (x, y) = (b(0), b(1))
        Array(x - eps, y - eps, x + eps, y - eps, x + eps, y + eps, x - eps, y + eps)
      } else if (b.length == 4) {
        // thin rectangle around the segment: offset both endpoints by ±ε along
        // the perpendicular so the promoted ring is genuinely 2-D
        val (x1, y1, x2, y2) = (b(0), b(1), b(2), b(3))
        val len = math.max(math.hypot(x2 - x1, y2 - y1), 1e-300)
        val px = -(y2 - y1) / len * eps
        val py = (x2 - x1) / len * eps
        hullOf(Array(x1 + px, y1 + py, x1 - px, y1 - py, x2 + px, y2 + py, x2 - px, y2 - py))
      } else b
    }
    def bufferEncoder: Encoder[Array[Double]] = ExprEnc.arrayDouble
    def outputEncoder: Encoder[Array[Double]] = ExprEnc.arrayDouble
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** R6 hull-fallback cascade (reference: geoextent/lib/extent.py:845-892): if
    * the hull column is null/degenerate, fall back to the bbox-envelope ring.
    */
  def hullOrEnvelope(hull: Column, minLon: Column, minLat: Column,
                     maxLon: Column, maxLat: Column): Column = {
    import org.apache.spark.sql.functions.{array, coalesce, size, when}
    coalesce(when(size(hull) >= 6, hull),
      array(minLon, minLat, maxLon, minLat, maxLon, maxLat, minLon, maxLat))
  }

  // Column-level entry points (product input encoders flatten to N columns)
  def bboxMerge(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column): Column =
    udaf(new BBoxMerge()).apply(minLon, minLat, maxLon, maxLat)
  def tboxMerge(start: Column, end: Column): Column =
    udaf(new TBoxMerge()).apply(start, end)
  def hullMerge(coords: Column): Column = udaf(new HullMerge()).apply(coords)
}
