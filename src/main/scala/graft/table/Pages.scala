package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesis of the Common-Crawl-style `pages` corpus and the admin-boundary
  * `polygons` dim table, both deterministic closed forms over the driver's
  * testdata (TESTDATA.md) — no external data, per-row reproducible in SQL.
  */
object Pages {

  /** Quadkey zoom used for join/partitioning cells (coarse — polygon covers and
    * page extents stay a handful of cells each; see graft.cells.QuadKey).
    */
  val JoinZoom = 4
  /** Quadkey zoom for the raster↔vector tiler. */
  val TileZoom = 6

  /** pages(d, url, warc_ts, html, text, lang) — schema per BASELINE.json
    * input_hint, derived from lineitem (`d = l_orderkey*8 + l_linenumber`).
    */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    // lineitem is a single small parquet file → 1-2 input splits; spread the
    // payload-build + downstream parse across all cores (round-robin keeps
    // sizes uniform; d is carried in the rows so results are order-free)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("d"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val payloadUdf = udf((d: Long) => PayloadSpec.payload(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val textUdf = udf((d: Long) => PayloadSpec.text(d))
    li.select(
      col("d"),
      concat(lit("https://example.org/p/"), col("d")).as("url"),
      (timestamp_micros(lit(java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond * 1000000L) +
        col("d") * 60000000L)).as("warc_ts"),
      payloadUdf(col("d")).as("html"),
      textUdf(col("d")).as("text"),
      lit("en").as("lang"))
  }

  /** Admin-boundary polygon dim (broadcast side of the PIP join, FIXTURES.md §3):
    * one rectangle ring per nation, bounds offset by 1/64° so they never touch
    * the page-coordinate lattice (PIP edge rule never decides a verified result).
    */
  def polygons(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.cells.QuadKey
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n"), col("n_name"))
    val ringUdf = udf((n: Long) => {
      val (x0, y0, x1, y1) = polyBounds(n)
      Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0) // closed ring, interleaved
    })
    val cellsUdf = udf((n: Long) => {
      val (x0, y0, x1, y1) = polyBounds(n)
      QuadKey.cover(graft.geo.Extent(x0, y0, x1, y1), JoinZoom)
    })
    nation.select(
      col("n").as("poly_id"), col("n_name").as("name"),
      ringUdf(col("n")).as("ring"), cellsUdf(col("n")).as("cells"))
  }

  /** Bench-scale corpus: `mult` deterministic shifted copies of the base id
    * space (d + k·10^9 keeps every copy inside PayloadSpec's closed forms while
    * giving distinct payload/extent values). Used to amortize fixed per-job
    * costs when measuring throughput; correctness queries use `pages`.
    */
  def pagesScaled(spark: SparkSession, sfDir: String, mult: Int): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("d0"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .select(col("d0"), explode(sequence(lit(0), lit(mult - 1))).as("k"))
      .select((col("d0") + col("k") * 1000000000L).as("d"))
    val payloadUdf = udf((d: Long) => PayloadSpec.payload(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val textUdf = udf((d: Long) => PayloadSpec.text(d))
    li.select(
      col("d"),
      concat(lit("https://example.org/p/"), col("d")).as("url"),
      (timestamp_micros(lit(java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond * 1000000L) +
        col("d") % 1000000L * 60000000L)).as("warc_ts"),
      payloadUdf(col("d")).as("html"),
      textUdf(col("d")).as("text"),
      lit("en").as("lang"))
  }

  /** Closed-form polygon bounds (mirrored in the DuckDB oracle SQL). */
  def polyBounds(n: Long): (Double, Double, Double, Double) = {
    val minLon = (n * 37 % 300).toDouble - 150.0 + 0.015625
    val minLat = (n * 23 % 130).toDouble - 65.0 + 0.015625
    (minLon, minLat, minLon + 24.0, minLat + 18.0)
  }
}
