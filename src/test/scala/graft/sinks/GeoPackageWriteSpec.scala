package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Extent
import graft.parse.{GeoPackage, SqliteRead}

/** Round-trips for the from-scratch SQLite/GeoPackage writer through the
  * independently golden-tested reader (SqliteRead/GeoPackage are validated
  * against the reference's own fixture bytes, so agreeing with them is
  * agreeing with the format).
  */
class GeoPackageWriteSpec extends AnyFunSuite {

  private def feat(i: Int): GeoPackageWrite.Feature =
    GeoPackageWrite.Feature(s"file_$i.geojson",
      Some(Extent(i * 1.0, 10.0 + i * 0.5, i * 1.0 + 2.0, 11.0 + i * 0.5)),
      "vector", "application/geo+json", Some((s"2020-01-0${i % 9 + 1}", "2021-06-30")), "4326")

  test("gpkg round-trip: extent, srs, feature count, attribute values") {
    val feats = (0 until 5).map(feat) :+
      GeoPackageWrite.Feature("no_geom.txt", None, "text", "text/plain", None, "4326")
    val bytes = GeoPackageWrite.buildGpkg(feats, "2024-01-01T00:00:00.000Z")
    val r = GeoPackage.read(bytes).get
    assert(r.table === "files")
    assert(r.srsId === 4326L)
    assert(r.nFeatures === 6)
    // computed extent = merge of the 5 real envelopes: x 0..6, y 10..13
    val e = r.extent.get
    assert(e.minLon === 0.0 && e.maxLon === 6.0 && e.minLat === 10.0 && e.maxLat === 13.0)

    // raw attribute round-trip via the SQLite layer
    val db = SqliteRead.open(bytes).get
    val tabs = SqliteRead.tables(db)
    assert(tabs.keySet === Set("gpkg_spatial_ref_sys", "gpkg_contents",
      "gpkg_geometry_columns", "files"))
    val rows = SqliteRead.scanTable(db, tabs("files")._1)
    assert(rows.length === 6)
    val r0 = rows.head
    assert(r0(0) === null) // fid lives in the rowid
    assert(r0(2) === "file_0.geojson" && r0(3) === "vector")
    assert(r0(5) === "2020-01-01/2021-06-30" && r0(6) === "4326")
    assert(rows.last(1) === null) // geometry-less feature
    // GPB blob decodes to the exact envelope
    val env = GeoPackage.gpbEnvelope(r0(1).asInstanceOf[Array[Byte]]).get
    assert(env === Extent(0.0, 10.0, 2.0, 11.0))
    // gpkg_spatial_ref_sys: srs_id rides the rowid incl. the negative one
    val srsRows = SqliteRead.scanTable(db, tabs("gpkg_spatial_ref_sys")._1)
    assert(srsRows.length === 3)
  }

  test("application id and user version mark the file as GeoPackage 1.2") {
    val bytes = GeoPackageWrite.buildGpkg(Seq(feat(1)), "2024-01-01T00:00:00.000Z")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(bb.getInt(68) === 0x47504B47) // "GPKG"
    assert(bb.getInt(60) === 10200)
    assert(new String(bytes, 0, 15, "US-ASCII") === "SQLite format 3")
    assert(bytes(15) === 0)
  }

  test("multi-level b-tree: 20k features split over interior pages and read back intact") {
    val feats = (0 until 20000).map(feat)
    val bytes = GeoPackageWrite.buildGpkg(feats, "2024-01-01T00:00:00.000Z")
    val r = GeoPackage.read(bytes).get
    assert(r.nFeatures === 20000)
    val e = r.extent.get
    assert(e.minLon === 0.0 && e.maxLon === 20001.0)
    // spot-check a middle row survived the leaf packing
    val db = SqliteRead.open(bytes).get
    val rows = SqliteRead.scanTable(db, SqliteRead.tables(db)("files")._1)
    assert(rows(12345)(2) === "file_12345.geojson")
  }

  test("capped writer entry: a DataFrame over maxRows is refused, not collected") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    val df = spark.range(25).select(
      concat(lit("f_"), col("id")).as("filename"), lit("vector").as("handler"),
      lit("x").as("format"), lit(null).cast("string").as("tbox_start"),
      lit(null).cast("string").as("tbox_end"), lit("4326").as("crs"),
      lit(0.0).as("min_lon"), lit(0.0).as("min_lat"),
      lit(1.0).as("max_lon"), lit(1.0).as("max_lat"))
    val tmp = java.nio.file.Files.createTempFile("graft_cap_", ".gpkg")
    try {
      val e = intercept[IllegalArgumentException](
        GeoPackageWrite.write(df, tmp.toString, "2024-01-01T00:00:00.000Z", maxRows = 10))
      assert(e.getMessage.contains("write parquet instead"))
      GeoPackageWrite.write(df, tmp.toString, "2024-01-01T00:00:00.000Z", maxRows = 25)
      assert(graft.parse.GeoPackage.read(
        java.nio.file.Files.readAllBytes(tmp)).get.nFeatures === 25)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("rootAt1 boundary: sqlite_master payload sweep across the one-page capacity window") {
    // the window where the page-1 capacity check (100-byte header offset)
    // fails but greedy packing still fits everything into a single offset-0
    // leaf used to leave page 1 zeroed (unreadable schema); sweep CREATE-SQL
    // padding across and beyond it — every size must round-trip
    for (pad <- 3700 to 4300 by 7) {
      val sql = "CREATE TABLE t (a TEXT) /* " + ("x" * pad) + " */"
      val bytes = SqliteWrite.build(
        Seq(SqliteWrite.Table("t", sql, Seq(Array[Any]("v")))), 0, 0)
      val db = SqliteRead.open(bytes).get
      val tabs = SqliteRead.tables(db)
      assert(tabs.contains("t"), s"pad=$pad: schema page unreadable")
      val rows = SqliteRead.scanTable(db, tabs("t")._1)
      assert(rows.length === 1 && rows.head(0) === "v", s"pad=$pad")
    }
  }

  test("overflow chain: a cell larger than one page round-trips byte-exact") {
    val big = "x" * 10000 + "END"
    val t = SqliteWrite.Table("blobs", "CREATE TABLE blobs (id INTEGER PRIMARY KEY, data TEXT)",
      Seq(Array[Any](null, big), Array[Any](null, "small")))
    val bytes = SqliteWrite.build(Seq(t), 0, 0)
    val db = SqliteRead.open(bytes).get
    val rows = SqliteRead.scanTable(db, SqliteRead.tables(db)("blobs")._1)
    assert(rows.length === 2)
    assert(rows(0)(1) === big)
    assert(rows(1)(1) === "small")
  }

  test("property: random tables round-trip through SqliteRead (seeded)") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 0 until 20) {
      val nCols = 1 + rnd.nextInt(6)
      val nRows = rnd.nextInt(300)
      val rows = Seq.tabulate(nRows) { _ =>
        Array.tabulate[Any](nCols) { _ =>
          rnd.nextInt(6) match {
            case 0 => null
            case 1 => rnd.nextLong() >> rnd.nextInt(48) // mixed widths, signs
            case 2 => rnd.nextDouble() * 1e6 - 5e5
            case 3 => rnd.alphanumeric.take(rnd.nextInt(40)).mkString + "é✓"
            case 4 => Array.fill[Byte](rnd.nextInt(60))(rnd.nextInt(256).toByte)
            case _ => rnd.nextInt(2).toLong // exercises serial types 8/9
          }
        }
      }
      val cols = (0 until nCols).map(i => s"c$i").mkString(",")
      val t = SqliteWrite.Table(s"t$trial", s"CREATE TABLE t$trial ($cols)", rows)
      val db = SqliteRead.open(SqliteWrite.build(Seq(t), 0, 0)).get
      val got = SqliteRead.scanTable(db, SqliteRead.tables(db)(s"t$trial")._1)
      assert(got.length === nRows, s"trial $trial row count")
      for ((exp, act) <- rows.zip(got); (e, a) <- exp.zip(act)) (e, a) match {
        case (x: Array[Byte], y: Array[Byte]) => assert(x.toSeq === y.toSeq)
        case (x, y) => assert(x === y, s"trial $trial")
      }
    }
  }

  test("serial-type coverage: null, 0/1 constants, multi-width ints, double, blob") {
    val row = Array[Any](null, 0L, 1L, 7L, 300L, 70000L, 3000000000L, 1234567890123L,
      -5L, 2.5, "téxt", Array[Byte](1, 2, 3))
    val t = SqliteWrite.Table("vals",
      "CREATE TABLE vals (a,b,c,d,e,f,g,h,i,j,k,l)", Seq(row))
    val db = SqliteRead.open(SqliteWrite.build(Seq(t), 0, 0)).get
    val got = SqliteRead.scanTable(db, SqliteRead.tables(db)("vals")._1).head
    assert(got(0) === null)
    assert(Seq(1, 2, 3, 4, 5, 6, 7).map(got(_)) === Seq(0L, 1L, 7L, 300L, 70000L, 3000000000L, 1234567890123L))
    assert(got(8) === -5L)
    assert(got(9) === 2.5)
    assert(got(10) === "téxt")
    assert(got(11).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](1, 2, 3))
  }
}
