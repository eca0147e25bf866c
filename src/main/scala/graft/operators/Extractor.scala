package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.cells.QuadKey
import graft.parse.Extract
import graft.table.Pages

/** Typed page record (input slice of the pages table the extractor needs). */
final case class PageIn(d: Long, warc_ts: java.sql.Timestamp, html: Array[Byte], text: String, lang: String)

/** One extracted page: handler + extent + tbox + lineage + join cell.
  * Flat nullable fields → clean Parquet/DuckDB-comparable schema.
  */
final case class ExtractedPage(
    d: Long,
    warc_ts: java.sql.Timestamp,
    handler: String,
    min_lon: Option[Double], min_lat: Option[Double],
    max_lon: Option[Double], max_lat: Option[Double],
    tbox_start: Option[String], tbox_end: Option[String],
    src_tag: Option[String],
    crs: String,
    cell: Option[Long],
    hull: Option[Array[Double]]) {
  def lonC: Option[Double] = for (a <- min_lon; b <- max_lon) yield (a + b) / 2
  def latC: Option[Double] = for (a <- min_lat; b <- max_lat) yield (a + b) / 2
}

/** The extraction stage: one narrow mapPartitions pass fusing handler dispatch,
  * payload parsing, bbox+tbox extraction and batched cell encoding (north_star:
  * "batched cell encode via mapPartitions") — the Spark analog of the
  * reference's per-file thread pair (reference: geoextent/lib/extent.py:1115-1224,
  * bbox ∥ tbox threads fused into one projection per SURVEY §3.1).
  *
  * Scale notes: embarrassingly parallel, no shuffle; upstream column pruning
  * still applies (only d, warc_ts, html, text, lang are read); the html payload
  * is decoded once per row and never retained.
  */
object Extractor {

  /** F1 auxiliary-file suffixes (reference: geoextent/lib/extent.py:434-466 —
    * sidecar files that must never be parsed as payloads).
    */
  val AuxiliarySuffixes: Seq[String] = Seq(".ovr", ".aux.xml", ".tif.xml", ".tiff.xml", ".msk")

  /** Drop rows whose url names an auxiliary sidecar file. */
  def skipAuxiliary(pages: DataFrame, urlCol: String = "url"): DataFrame = {
    import org.apache.spark.sql.functions.{col, lower}
    AuxiliarySuffixes.foldLeft(pages)((df, suf) => df.filter(!lower(col(urlCol)).endsWith(suf)))
  }

  def extract(pages: DataFrame, joinZoom: Int = Pages.JoinZoom): Dataset[ExtractedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select("d", "warc_ts", "html", "text", "lang").as[PageIn].mapPartitions { it =>
      it.map { p =>
        val r = Extract.extract(p.html, p.text, p.lang)
        val cell = for (lo0 <- r.minLon; la0 <- r.minLat; lo1 <- r.maxLon; la1 <- r.maxLat)
          yield QuadKey.encode((la0 + la1) / 2, (lo0 + lo1) / 2, joinZoom)
        ExtractedPage(p.d, p.warc_ts, r.handler,
          r.minLon, r.minLat, r.maxLon, r.maxLat,
          r.tboxStart, r.tboxEnd, r.srcTag, r.crs, cell, r.hull)
      }
    }
  }
}
