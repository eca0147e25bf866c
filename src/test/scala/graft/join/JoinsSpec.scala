package graft.join

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cells.QuadKey

class JoinsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def randomPoints(n: Int, seed: Long) = {
    val r = new java.util.Random(seed)
    Seq.fill(n) {
      val lon = r.nextDouble() * 340 - 170
      val lat = r.nextDouble() * 160 - 80
      (r.nextLong().abs, lon, lat, QuadKey.encode(lat, lon, 4))
    }
  }

  test("bucketed tables join with ZERO shuffle exchange (co-located join path)") {
    val a = randomPoints(3000, 11L).toDF("doc_id", "lon", "lat", "cell")
    val b = randomPoints(3000, 12L).toDF("doc_id", "lon", "lat", "cell")
      .withColumnRenamed("doc_id", "other_id").select("other_id", "cell")
    graft.table.Bucketing.writeBucketed(a, "bkt_a", "cell", 8)
    graft.table.Bucketing.writeBucketed(b, "bkt_b", "cell", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "cell")
      val n = joined.count()
      // same result as the unbucketed join
      assert(n === a.join(b, "cell").count())
      // the join consumed bucket layout: no exchange anywhere in the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("pipJoin equals brute-force rectangle membership") {
    val pts = randomPoints(2000, 1L).toDF("doc_id", "lon", "lat", "cell")
    val polys = Seq(
      (1L, "a", -50.0, -20.0, 10.0, 15.0),
      (2L, "b", 100.0, 40.0, 130.0, 70.0),
      (3L, "c", -170.0, -80.0, -100.0, -40.0))
    val polyDf = polys.map { case (id, name, x0, y0, x1, y1) =>
      (id, name, Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0),
        QuadKey.cover(graft.geo.Extent(x0, y0, x1, y1), 4))
    }.toDF("poly_id", "name", "ring", "cells")
    val got = SpatialJoins.pipJoin(pts, polyDf)
      .select("doc_id", "poly_id").as[(Long, Long)].collect().toSet
    val raw = pts.select("doc_id", "lon", "lat").as[(Long, Double, Double)].collect()
    val expected = (for {
      (id, lon, lat) <- raw
      (pid, _, x0, y0, x1, y1) <- polys
      if lon > x0 && lon < x1 && lat > y0 && lat < y1
    } yield (id, pid)).toSet
    assert(got === expected)
  }

  test("saltedCellJoin equals plain cell join (north_rule skew handling)") {
    // skew: 40% of points in one hot cell
    val r = new java.util.Random(2L)
    val pts = (1 to 1000).map { i =>
      val hot = i % 5 < 2
      val lon = if (hot) 7.5 else r.nextDouble() * 340 - 170
      val lat = if (hot) 51.5 else r.nextDouble() * 160 - 80
      (i.toLong, QuadKey.encode(lat, lon, 4))
    }.toDF("doc_id", "cell")
    val dim = pts.select("cell").distinct().withColumn("tag", col("cell") % 7)
    val plain = pts.join(dim, Seq("cell")).select("doc_id", "tag").as[(Long, Long)].collect().toSet
    val salted = SpatialJoins.saltedCellJoin(pts, dim, "doc_id", 8)
      .select("doc_id", "tag").as[(Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("knnJoin equals brute-force top-k (exactness of disk expansion)") {
    val pts = randomPoints(3000, 3L)
    val ptsDf = pts.toDF("pid", "lon", "lat", "cell")
    val queries = Seq((1L, 0.0, 0.0), (2L, -160.0, -70.0), (3L, 150.0, 75.0), (4L, 7.5, 51.5))
    val got = SpatialJoins.knnJoin(queries, ptsDf, 7)
      .select("qid", "rank", "pid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    val expected = queries.map { case (qid, qlon, qlat) =>
      qid -> pts.map { case (pid, lon, lat, _) =>
        (pid, (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat))
      }.sortBy { case (pid, d) => (d, pid) }.take(7).map(_._1).toList
    }.toMap
    assert(got === expected)
  }

  test("SkewPlanner: histogram-salted join equals plain join; only hot keys salted") {
    val r = new java.util.Random(9L)
    // 60% of rows on key 42, the rest spread over 200 keys
    val big = (1 to 5000).map { i =>
      val key = if (i % 5 < 3) 42L else (r.nextInt(200) + 100).toLong
      (i.toLong, key)
    }.toDF("doc_id", "cell")
    val dim = big.select("cell").distinct().withColumn("tag", col("cell") * 3)
    val hot = SkewPlanner.hotKeySalts(big, "cell", rowsPerTask = 500)
    assert(hot.contains(42L) && hot(42L) > 1, s"hot keys: $hot")
    assert(hot.keySet.forall(k => k == 42L || hot(k) <= 7)) // cold keys absent or tiny
    val plain = big.join(dim, Seq("cell")).select("doc_id", "tag").as[(Long, Long)].collect().toSet
    val salted = SkewPlanner.skewJoin(big, dim, "cell", rowsPerTask = 500)
      .select("doc_id", "tag").as[(Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("bucketedRangeJoin equals plain interval overlap join") {
    val r = new java.util.Random(4L)
    def iv(n: Int, seed: Int) = (1 to n).map { i =>
      val s = java.sql.Date.valueOf(java.time.LocalDate.of(2015, 1, 1).plusDays(r.nextInt(700)))
      val e = java.sql.Date.valueOf(s.toLocalDate.plusDays(r.nextInt(40)))
      (i.toLong * seed, s, e)
    }
    val a = iv(150, 1).toDF("a_id", "a_start", "a_end")
    val b = iv(40, 1000).toDF("b_id", "b_start", "b_end")
    val plain = a.join(b, col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val bucketed = SpatialJoins.bucketedRangeJoin(a, b, "a_start", "a_end", "b_start", "b_end", 30)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(bucketed === plain)
  }

  test("knnJoinBig (DataFrame query side) equals brute-force top-k and the driver-side knnJoin") {
    val pts = randomPoints(3000, 3L)
    val ptsDf = pts.toDF("pid", "lon", "lat", "cell")
    // a larger query set incl. sparse corners and the hot cell
    val queries = (0 until 40).map { i =>
      (i.toLong, (i * 17 % 340).toDouble - 170.0, (i * 11 % 160).toDouble - 80.0)
    } ++ Seq((100L, -179.9, -84.9), (101L, 7.5, 51.5))
    val qDf = queries.toDF("qid", "qlon", "qlat")
    // cache hygiene: the call must release every per-round cache it creates;
    // only the checkpointed result frame may remain persisted
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val gotDf = SpatialJoins.knnJoinBig(qDf, ptsDf, 5)
    val got = gotDf
      .select("qid", "rank", "pid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.size <= 1, s"knnJoinBig left ${leaked.size} cached RDDs behind")
    val expected = queries.map { case (qid, qlon, qlat) =>
      qid -> pts.map { case (pid, lon, lat, _) =>
        (pid, (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat))
      }.sortBy { case (pid, d) => (d, pid) }.take(5).map(_._1).toList
    }.toMap
    assert(got === expected)
    // and the two planners agree
    val driver = SpatialJoins.knnJoin(queries, ptsDf, 5)
      .select("qid", "rank", "pid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(got === driver)
  }

  test("knnJoinBig: fewer than k corpus points yields partial top-k; empty corpus yields empty frame") {
    val tiny = Seq((1L, 0.0, 0.0, graft.cells.QuadKey.encode(0.0, 0.0, 4)),
      (2L, 10.0, 10.0, graft.cells.QuadKey.encode(10.0, 10.0, 4)))
      .toDF("pid", "lon", "lat", "cell")
    val q = Seq((7L, 5.0, 5.0)).toDF("qid", "qlon", "qlat")
    val partial = SpatialJoins.knnJoinBig(q, tiny, 5).select("qid", "pid").as[(Long, Long)].collect()
    assert(partial.length === 2)
    val empty = SpatialJoins.knnJoinBig(q, tiny.filter(col("pid") < 0), 5)
    assert(empty.count() === 0)
  }

  test("distanceJoin equals brute-force radius filter, incl. world-edge probes and boundary ties") {
    val ptsSeq = randomPoints(4000, 21L).map { case (_, lon, lat, _) => (lon, lat) }
      .zipWithIndex.map { case ((lon, lat), i) => (i.toLong, lon, lat) }
    val pts = ptsSeq.toDF("pid", "lon", "lat")
    // probes include world corners/edges (disk clamping) and a pole-adjacent
    // probe (Mercator cell heights shrink, so the required disk grows)
    val qSeq = Seq(
      (0L, 0.0, 0.0), (1L, -169.9, -79.9), (2L, 169.9, 79.9),
      (3L, 7.5, 51.5), (4L, -120.0, 70.0))
    val qs = qSeq.toDF("qid", "qlon", "qlat")
    val r = 8.0
    val got = SpatialJoins.distanceJoin(qs, pts, radiusDeg = r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val expected = (for {
      (qid, qlon, qlat) <- qSeq
      (pid, lon, lat) <- ptsSeq
      if (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat) <= r * r
    } yield (qid, pid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)

    // exact boundary tie: a point at dist2 == r² must be kept
    val tiePts = Seq((100L, 3.0, 0.0)).toDF("pid", "lon", "lat")
    val tieQ = Seq((0L, 0.0, 0.0)).toDF("qid", "qlon", "qlat")
    val tie = SpatialJoins.distanceJoin(tieQ, tiePts, radiusDeg = 3.0).collect()
    assert(tie.length === 1 && tie.head.getDouble(2) === 9.0)
  }

  test("extentOverlapJoin equals brute-force rect intersection with EXACTLY one row per pair") {
    // wide rects force multi-cell covers, so pairs meet in several shared
    // cells — the reporting-cell dedup must still emit each pair once; the
    // set includes touching edges (closed overlap) and world-edge rects
    def rects(n: Int, seed: Int) = (0 until n).map { i =>
      val lon0 = ((i * 7919 + seed) % 3300) / 10.0 - 170.0
      val lat0 = ((i * 104729 + seed) % 1400) / 10.0 - 75.0
      (i.toLong, lon0, lat0, lon0 + 1 + (i % 30), lat0 + 1 + (i % 10))
    }
    val aSeq = rects(120, 0)
    val bSeq = rects(80, 17) ++ Seq(
      (900L, 10.0, 10.0, 20.0, 20.0),
      (901L, 20.0, 10.0, 30.0, 20.0)) // 901 touches 900-overlappers at lon=20 exactly
    val a = aSeq.toDF("aid", "min_lon", "min_lat", "max_lon", "max_lat")
    val b = bSeq.toDF("bid", "min_lon", "min_lat", "max_lon", "max_lat")
    val rows = SpatialJoins.extentOverlapJoin(a, "aid", b, "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ai, a0, a1, a2, a3) <- aSeq
      (bi, b0, b1, b2, b3) <- bSeq
      if a0 <= b2 && b0 <= a2 && a1 <= b3 && b1 <= a3
    } yield (ai, bi)).toSet
    assert(rows.toSet === expected)
    assert(rows.length === expected.size, "a pair was emitted in more than one cell")
    assert(expected.nonEmpty)
  }

  test("extentOverlapJoin at antimeridian/pole clamps: min corner exactly on the world edge") {
    // the reporting-cell dedup argument relies on cover and CellEncode
    // sharing floor+clamp at world edges; generate extents whose min corner
    // sits EXACTLY on ±180 lon / ±85.05 lat (the Mercator cut) and beyond
    // (clamped poles), crossed with interior rects that reach the same edges
    val edgeLons = Seq(-180.0, -179.9999999, 179.0, 7.5)
    val edgeLats = Seq(-85.05112877980659, -85.05, 84.9, 85.05112877980659, -90.0, 51.5)
    val aSeq = (for ((lon0, i) <- edgeLons.zipWithIndex; (lat0, j) <- edgeLats.zipWithIndex)
      yield ((i * 10 + j).toLong, lon0, lat0, math.min(180.0, lon0 + 1.5),
        math.min(90.0, lat0 + 1.5))).toSeq
    val bSeq = (for ((lon0, i) <- edgeLons.zipWithIndex; (lat0, j) <- edgeLats.zipWithIndex)
      yield ((1000 + i * 10 + j).toLong, math.max(-180.0, lon0 - 2.0),
        math.max(-90.0, lat0 - 2.0), lon0 + 0.5, lat0 + 0.5)).toSeq
    val a = aSeq.toDF("aid", "min_lon", "min_lat", "max_lon", "max_lat")
    val b = bSeq.toDF("bid", "min_lon", "min_lat", "max_lon", "max_lat")
    val rows = SpatialJoins.extentOverlapJoin(a, "aid", b, "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ai, a0, a1, a2, a3) <- aSeq
      (bi, b0, b1, b2, b3) <- bSeq
      if a0 <= b2 && b0 <= a2 && a1 <= b3 && b1 <= a3
    } yield (ai, bi)).toSet
    assert(rows.toSet === expected)
    assert(rows.length === expected.size,
      "a world-edge pair was emitted in more than one reporting cell (or lost)")
    assert(expected.size > 50, "edge battery degenerate — too few overlapping pairs")
  }

  test("salted extentOverlapJoin / distanceJoin equal their unsalted plans; detector fires on the hot cell") {
    // planted skew: 60% of the extents pile onto one location (one cover
    // cell), the rest spread world-wide — the q87-shaped hot-cell scenario
    val aSeq = (0 until 300).map { i =>
      if (i % 5 < 3) (i.toLong, 7.5, 51.5, 8.0, 52.0) // hot
      else {
        val lon0 = ((i * 7919) % 3200) / 10.0 - 160.0
        val lat0 = ((i * 104729) % 1300) / 10.0 - 70.0
        (i.toLong, lon0, lat0, lon0 + 2.0, lat0 + 2.0)
      }
    }
    val bSeq = (0 until 60).map { i =>
      val lon0 = ((i * 37) % 320).toDouble - 165.0
      val lat0 = ((i * 23) % 130).toDouble - 68.0
      (1000L + i, math.min(lon0, 7.0), math.min(lat0, 51.0),
        math.min(lon0, 7.0) + 12.0, math.min(lat0, 51.0) + 12.0)
    }
    val a = aSeq.toDF("aid", "min_lon", "min_lat", "max_lon", "max_lat")
    val b = bSeq.toDF("bid", "min_lon", "min_lat", "max_lon", "max_lat")
    val plain = SpatialJoins.extentOverlapJoin(a, "aid", b, "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val skewAware = SpatialJoins.extentOverlapJoinSkewAware(a, "aid", b, "bid")
    val salted = skewAware.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.toSet === plain.toSet, "salting changed the pair set")
    assert(salted.length === plain.length, "salting duplicated or dropped a pair")
    // the detector must measure the planted hot cell and the salted plan must
    // actually fan it out (salt expression present = hot cell spread over >1
    // reducer instead of one)
    val aCells = a.filter(col("min_lon").isNotNull)
      .select(explode(graft.tiles.Tiler.coverUdf(col("min_lon"), col("min_lat"),
        col("max_lon"), col("max_lat"), lit(graft.table.Pages.JoinZoom + 3))).as("cell"))
    val salts = SpatialJoins.hotCellSalts(aCells, 32, 64)
    assert(salts.nonEmpty, "detector missed the planted hot cell")
    assert(salts.values.max > 1, "hot cell not fanned out")
    assert(skewAware.queryExecution.executedPlan.toString.contains("pmod"),
      "skew-aware plan does not carry the salt expression")

    // distanceJoin: same equivalence under forced salts on every cell
    val pts = randomPoints(2000, 31L).map(p => (p._1, 7.5 + (p._2 % 2) / 10.0, 51.5 + (p._3 % 2) / 10.0))
      .toDF("pid", "lon", "lat")
    val qs = Seq((1L, 7.5, 51.5), (2L, 8.0, 52.0), (3L, -170.0, -80.0)).toDF("qid", "qlon", "qlat")
    val plainD = SpatialJoins.distanceJoin(qs, pts, radiusDeg = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val saltedD = SpatialJoins.distanceJoinSkewAware(qs, pts, radiusDeg = 1.0, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saltedD === plainD, "distance-join salting changed the result")
  }
}
