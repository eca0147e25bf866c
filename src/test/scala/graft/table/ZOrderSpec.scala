package graft.table

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ZOrder: clustering must tighten per-file extents, and manifest-stats file
  * skipping must be output-invisible and effective.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Deterministic world-spread points: 4000 rows over lon [-170,170),
    * lat [-75,75), with bbox width/height up to 2×1 degrees.
    */
  private def world = {
    import spark.implicits._
    (0 until 4000).map { i =>
      val lon = ((i * 7919) % 3400) / 10.0 - 170.0
      val lat = ((i * 104729) % 1500) / 10.0 - 75.0
      (i.toLong, lon, lat, lon + (i % 3), lat + (i % 2) * 0.5)
    }.toDF("d", "min_lon", "min_lat", "max_lon", "max_lat")
  }

  test("clustered files cover compact rectangles; unclustered files span the world") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeClustered(world, s"$dir/z", "z",
      (col("min_lat") + col("max_lat")) / 2, (col("min_lon") + col("max_lon")) / 2,
      zoom = 12, partitions = 16)
    Snapshots.write(world.repartition(16), s"$dir/plain", "plain")

    def lonSpans(path: String): Seq[Double] = {
      val json = Files.readString(java.nio.file.Paths.get(path, "_graft_manifest.json"))
      """"extent":\[([^\]]*)\]""".r.findAllMatchIn(json).map { m =>
        val e = m.group(1).split(",").map(_.toDouble)
        e(2) - e(0)
      }.toSeq
    }
    val zSpan = lonSpans(s"$dir/z")
    val pSpan = lonSpans(s"$dir/plain")
    assert(zSpan.nonEmpty && pSpan.nonEmpty)
    // round-robin files all span ~the whole world; z-ordered files average
    // far tighter (the z-curve has a few long seam jumps, so compare means)
    assert(pSpan.min > 300.0, s"unclustered spans unexpectedly tight: $pSpan")
    // mean, not max: a z-curve has a few long seam jumps, so a handful of
    // boundary partitions legitimately straddle quadrants
    val zMean = zSpan.sum / zSpan.size
    val pMean = pSpan.sum / pSpan.size
    assert(zMean * 2 < pMean, s"z-ordered mean lon span $zMean not compact vs $pMean: $zSpan")
  }

  test("manifest-pruned bbox read equals the plain filter and skips most files") {
    val dir = Files.createTempDirectory("graft-zorder2").toString
    ZOrder.writeClustered(world, s"$dir/z", "z",
      (col("min_lat") + col("max_lat")) / 2, (col("min_lon") + col("max_lon")) / 2,
      zoom = 12, partitions = 16)
    val (pruned, read, total) = ZOrder.readBbox(spark, s"$dir/z", 10.0, 20.0, 40.0, 45.0)
    assert(read < total, s"nothing pruned: $read/$total")
    assert(read * 2 < total, s"pruning ineffective: $read/$total")
    val expected = world.filter(
      col("max_lon") >= 10.0 && col("min_lon") <= 40.0 &&
        col("max_lat") >= 20.0 && col("min_lat") <= 45.0)
      .collect().map(_.getLong(0)).toSet
    val got = pruned.collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("NaN bbox values suppress the file extent; the file is read conservatively, never pruned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zorder4").toString
    // one file whose min_lon column contains a NaN alongside real rows far
    // from the probe box — if an extent were recorded with NaN (or from the
    // non-NaN subset only), the box below could wrongly prune the file
    val df = Seq(
      (1L, Double.NaN, 1.0, 2.0, 2.0),
      (2L, 100.0, 40.0, 101.0, 41.0)
    ).toDF("d", "min_lon", "min_lat", "max_lon", "max_lat").repartition(1)
    Snapshots.write(df, s"$dir/z", "nan")
    val stats = Snapshots.readManifest(spark, s"$dir/z").get
    assert(stats.exists(_.rows > 0))
    assert(stats.forall(_.extent.isEmpty), s"NaN file must carry no extent: $stats")
    val (rows, read, total) = ZOrder.readBbox(spark, s"$dir/z", 100.0, 40.0, 101.0, 41.0)
    assert(read === total, "stat-less file must be read conservatively")
    assert(rows.collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("a box intersecting nothing returns empty through the no-file fallback path") {
    val dir = Files.createTempDirectory("graft-zorder3").toString
    // all points in the eastern hemisphere
    import spark.implicits._
    val east = (0 until 100).map(i => (i.toLong, 10.0 + i % 50, 0.0 + i % 40, 11.0 + i % 50, 1.0 + i % 40))
      .toDF("d", "min_lon", "min_lat", "max_lon", "max_lat")
    ZOrder.writeClustered(east, s"$dir/z", "z",
      (col("min_lat") + col("max_lat")) / 2, (col("min_lon") + col("max_lon")) / 2,
      zoom = 12, partitions = 4)
    val (rows, read, _) = ZOrder.readBbox(spark, s"$dir/z", -160.0, -40.0, -150.0, -30.0)
    assert(read === 0)
    assert(rows.collect().isEmpty)
  }
}
