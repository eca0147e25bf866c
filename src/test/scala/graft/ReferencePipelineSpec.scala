package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The north-rule fidelity check: the reference's own test-suite fixtures,
  * embedded as pages, must come out of the full pipeline as the reference's
  * published extents — and those extents must land in the right quadkey tiles
  * and PIP-join rows (reference goldens: tests/test_api.py, tolerance 1e-3).
  */
class ReferencePipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val base = "/root/reference/tests/testdata"

  private def fixturePages: Option[org.apache.spark.sql.DataFrame] = {
    val files = Seq(
      1L -> s"$base/geojson/muenster_ring_zeit.geojson",
      2L -> s"$base/kml/aasee.kml",
      3L -> s"$base/gpx/gpx1.1_with_all_fields.gpx")
    if (!files.forall(f => Files.exists(Paths.get(f._2)))) return None
    val rows = files.map { case (id, path) =>
      (id, s"https://example.org/fixture/$id",
        new java.sql.Timestamp(1577836800000L + id * 60000L),
        Files.readAllBytes(Paths.get(path)), "", "en")
    }
    Some(rows.toDF("d", "url", "warc_ts", "html", "text", "lang"))
  }

  test("reference fixtures → extraction → tile assignments → PIP join rows") {
    val pages = fixturePages.getOrElse { cancel("reference fixtures unavailable") }
    val extracted = operators.Extractor.extract(pages).toDF().cache()
    try {
      val byId = extracted.collect().map(r => r.getAs[Long]("d") -> r).toMap

      // 1. published extents (lat-lon order in the reference API; internal lon-lat here)
      val goldens = Map(
        1L -> (7.601680, 51.948814, 7.647256, 51.974624), // muenster ring, test_api.py:125-129
        2L -> (7.594213, 51.942465, 7.618246, 51.957278), // aasee, test_api.py:42-49
        3L -> (-20.2, 10.0, 46.7, 14.0))                  // gpx, test_api.py:85-100
      for ((id, (x0, y0, x1, y1)) <- goldens) {
        val r = byId(id)
        assert(math.abs(r.getAs[Double]("min_lon") - x0) < 1e-3, s"id=$id min_lon")
        assert(math.abs(r.getAs[Double]("min_lat") - y0) < 1e-3, s"id=$id min_lat")
        assert(math.abs(r.getAs[Double]("max_lon") - x1) < 1e-3, s"id=$id max_lon")
        assert(math.abs(r.getAs[Double]("max_lat") - y1) < 1e-3, s"id=$id max_lat")
      }

      // 2. directory-merge golden: muenster tbox 2018-11-14 (test_api.py:125-129)
      assert(byId(1L).getAs[String]("tbox_start") === "2018-11-14")
      assert(byId(1L).getAs[String]("tbox_end") === "2018-11-14")

      // 3. tile assignments: engine cover == cover of the golden extents
      val tiles = graft.tiles.Tiler.tileAssignments(extracted, zoom = 10)
        .select("d", "tile").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for ((id, (x0, y0, x1, y1)) <- goldens) {
        val expected = cells.QuadKey.cover(geo.Extent(x0, y0, x1, y1), 10).toSet
        assert(tiles(id) === expected, s"tile cover mismatch for fixture $id")
      }
      // both Münster fixtures share a z=10 tile (they overlap spatially)
      assert((tiles(1L) & tiles(2L)).nonEmpty)

      // 4. PIP join rows: a Münster-area polygon must catch fixtures 1+2, not 3
      val ring = Array(7.0, 51.5, 8.0, 51.5, 8.0, 52.5, 7.0, 52.5, 7.0, 51.5)
      val polys = Seq((100L, "muenster-box", ring,
        cells.QuadKey.cover(geo.Extent(7.0, 51.5, 8.0, 52.5), table.Pages.JoinZoom)))
        .toDF("poly_id", "name", "ring", "cells")
      val pts = extracted.filter(col("min_lon").isNotNull)
        .withColumn("lon", (col("min_lon") + col("max_lon")) / 2)
        .withColumn("lat", (col("min_lat") + col("max_lat")) / 2)
        .select(col("d"), col("lon"), col("lat"), col("cell"))
      val joined = join.SpatialJoins.pipJoin(pts, polys).select("d").as[Long].collect().toSet
      assert(joined === Set(1L, 2L))
    } finally extracted.unpersist()
  }

  test("nested_folder merge golden: 3DCMT CSV + muenster (test_api.py:170-181)") {
    val p1 = Paths.get(s"$base/folders/nested_folder/Folder_1/3DCMTcatalog_TakemuraEPS.csv")
    val p2 = Paths.get(s"$base/folders/nested_folder/Folder_2/muenster_ring_zeit.geojson")
    assume(Files.exists(p1) && Files.exists(p2), "fixtures unavailable")
    val pages = Seq(
      (1L, "u1", new java.sql.Timestamp(0L), Files.readAllBytes(p1), "", "en"),
      (2L, "u2", new java.sql.Timestamp(0L), Files.readAllBytes(p2), "", "en"))
      .toDF("d", "url", "warc_ts", "html", "text", "lang")
    val merged = operators.Extractor.extract(pages).toDF()
      .agg(min("min_lon"), min("min_lat"), max("max_lon"), max("max_lat"),
        min("tbox_start"), max("tbox_end")).collect().head
    // published: bbox [34.7, 7.601680, 51.974624, 142.0] (lat-lon), tbox 2017-04-08..2020-02-06
    // (tbox start is the UTC column: the reference pools ALL time-matching columns)
    assert(math.abs(merged.getDouble(0) - 7.601680) < 1e-3)
    assert(math.abs(merged.getDouble(1) - 34.7) < 1e-3)
    assert(math.abs(merged.getDouble(2) - 142.0) < 1e-3)
    assert(math.abs(merged.getDouble(3) - 51.974624) < 1e-3)
    assert(merged.getString(4) === "2017-04-08")
    assert(merged.getString(5) === "2020-02-06")
  }

  test("folder_two_files merge golden: muenster + barcelona districts (test_api.py:156-167)") {
    val p1 = Paths.get(s"$base/geojson/muenster_ring_zeit.geojson")
    val p2 = Paths.get(s"$base/folders/folder_two_files/districtes.geojson")
    assume(Files.exists(p1) && Files.exists(p2), "fixtures unavailable")
    val pages = Seq(
      (1L, "u1", new java.sql.Timestamp(0L), Files.readAllBytes(p1), "", "en"),
      (2L, "u2", new java.sql.Timestamp(0L), Files.readAllBytes(p2), "", "en"))
      .toDF("d", "url", "warc_ts", "html", "text", "lang")
    val merged = operators.Extractor.extract(pages).toDF()
      .agg(min("min_lon"), min("min_lat"), max("max_lon"), max("max_lat"),
        min("tbox_start"), max("tbox_end")).collect().head
    // published: bbox [41.317038, 2.052333, 51.974624, 7.647256] (lat-lon), tbox 2018-11-14..2019-09-11
    assert(math.abs(merged.getDouble(0) - 2.052333) < 1e-3)
    assert(math.abs(merged.getDouble(1) - 41.317038) < 1e-3)
    assert(math.abs(merged.getDouble(2) - 7.647256) < 1e-3)
    assert(math.abs(merged.getDouble(3) - 51.974624) < 1e-3)
    assert(merged.getString(4) === "2018-11-14")
    assert(merged.getString(5) === "2019-09-11")
  }
}
