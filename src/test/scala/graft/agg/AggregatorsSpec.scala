package graft.agg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AggregatorsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("BBoxMerge equals min/max envelope and is partitioning-invariant") {
    val r = new java.util.Random(5L)
    val rows = (1 to 500).map { i =>
      val x0 = r.nextDouble() * 300 - 160; val y0 = r.nextDouble() * 140 - 75
      (i % 7, x0, y0, x0 + r.nextDouble() * 5, y0 + r.nextDouble() * 5)
    }
    def run(parts: Int) = rows.toDF("g", "min_lon", "min_lat", "max_lon", "max_lat")
      .repartition(parts)
      .groupBy("g")
      .agg(Aggregators.bboxMerge(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")).as("bm"))
      .select(col("g"), col("bm.min_lon"), col("bm.min_lat"), col("bm.max_lon"), col("bm.max_lat"))
      .as[(Int, Double, Double, Double, Double)].collect().sortBy(_._1)
    val got = run(3)
    assert(got.toList === run(11).toList) // partitioning invariance
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      (g, rs.map(_._2).min, rs.map(_._3).min, rs.map(_._4).max, rs.map(_._5).max)
    }.toList.sortBy(_._1)
    assert(got.toList === expected)
  }

  test("TBoxMerge: deep-time signed ISO dominates CE dates (reference helpfunctions.py:1087-1100)") {
    val rows = Seq(
      (1, "2015-03-04", "2015-04-02"),
      (1, "-9750-01-01", "1950-01-01"),
      (1, "2016-01-01", "2016-06-01"),
      (2, "2015-01-01", "2015-02-01"))
    val got = rows.toDF("g", "tbox_start", "tbox_end")
      .groupBy("g").agg(Aggregators.tboxMerge(col("tbox_start"), col("tbox_end")).as("tm"))
      .select(col("g"), col("tm.tbox_start"), col("tm.tbox_end"))
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(got(0) === ((1, "-9750-01-01", "2016-06-01")))
    assert(got(1) === ((2, "2015-01-01", "2015-02-01")))
  }

  test("HullMerge degenerate promotion: point → ε-square, segment → thin rect (reference helpfunctions.py:778-871)") {
    val point = Seq((1, Array(5.0, 6.0))).toDF("g", "coords")
      .groupBy("g").agg(Aggregators.hullMerge(col("coords")).as("hull"))
      .as[(Int, Array[Double])].head()._2
    assert(point.length === 8) // 4-vertex ε-square
    assert(point.grouped(2).forall(p => math.abs(p(0) - 5.0) <= 1e-9 && math.abs(p(1) - 6.0) <= 1e-9))
    val seg = Seq((1, Array(0.0, 0.0)), (1, Array(2.0, 2.0))).toDF("g", "coords")
      .groupBy("g").agg(Aggregators.hullMerge(col("coords")).as("hull"))
      .as[(Int, Array[Double])].head()._2
    assert(seg.length >= 6) // promoted to a real 2-D ring
  }

  test("hullOrEnvelope falls back to the bbox ring for degenerate hulls (R6)") {
    val got = Seq((Array(1.0, 2.0), 0.0, 0.0, 4.0, 3.0))
      .toDF("hull", "min_lon", "min_lat", "max_lon", "max_lat")
      .select(Aggregators.hullOrEnvelope(col("hull"), col("min_lon"), col("min_lat"),
        col("max_lon"), col("max_lat")).as("h"))
      .as[Array[Double]].head()
    assert(got.toList === List(0.0, 0.0, 4.0, 0.0, 4.0, 3.0, 0.0, 3.0))
  }

  test("HullMerge: hull of group vertex arrays, partitioning-invariant, contains all inputs") {
    val r = new java.util.Random(6L)
    val rows = (1 to 200).map { i =>
      (i % 3, Array(r.nextDouble() * 100 - 50, r.nextDouble() * 100 - 50,
        r.nextDouble() * 100 - 50, r.nextDouble() * 100 - 50))
    }
    def run(parts: Int) = rows.toDF("g", "coords").repartition(parts)
      .groupBy("g").agg(Aggregators.hullMerge(col("coords")).as("hull"))
      .as[(Int, Array[Double])].collect().sortBy(_._1)
    val got = run(2)
    assert(got.map(_._2.toList).toList === run(9).map(_._2.toList).toList)
    // containment
    for ((g, hull) <- got) {
      val pts = rows.filter(_._1 == g).flatMap(_._2.grouped(2).map(a => (a(0), a(1))))
      val expected = graft.geo.Geo.convexHull(pts.toArray)
      val gotPts = hull.grouped(2).map(a => (a(0), a(1))).toArray
      assert(gotPts.toList === expected.toList)
    }
  }
}
