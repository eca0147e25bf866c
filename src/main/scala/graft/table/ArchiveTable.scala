package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Archives

/** Synthetic archive corpus for S9: one archive per order (archive_id = d/8,
  * i.e. l_orderkey), containing every page of that order as TWO member files —
  * `p<d>.html` (the payload bytes) and `p<d>.txt` (the extracted text) — the
  * shape of a real crawled-site bundle. Format rotates zip/tar/tar.gz by
  * archive_id so all three codecs are exercised. Deterministic: a pure
  * function of the pages table, which is itself a closed form over testdata.
  */
object ArchiveTable {

  def archives(spark: SparkSession, sfDir: String): DataFrame = {
    val buildUdf = udf((fmt: String, members: Seq[org.apache.spark.sql.Row]) => {
      // the driver's synthetic lineitem repeats (orderkey, linenumber) pairs,
      // so d repeats with byte-identical content — one member pair per d
      val files = members.sortBy(_.getLong(0)).distinctBy(_.getLong(0)).flatMap { r =>
        val d = r.getLong(0)
        val html = r.getAs[Array[Byte]](1)
        val text = r.getAs[String](2)
        Seq((s"p$d.html", html), (s"p$d.txt", text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      fmt match {
        case "zip" => Archives.zipBuild(files)
        case "tar" => Archives.tarBuild(files)
        case _ => Archives.gzip(Archives.tarBuild(files))
      }
    })
    Pages.pages(spark, sfDir)
      .groupBy((col("d") / 8).cast("long").as("archive_id"))
      .agg(collect_list(struct(col("d"), col("html"), col("text"))).as("members"))
      .withColumn("fmt",
        when(col("archive_id") % 3 === 0, "zip")
          .when(col("archive_id") % 3 === 1, "tar").otherwise("tgz"))
      .select(col("archive_id"), col("fmt"),
        buildUdf(col("fmt"), col("members")).as("bytes"),
        (size(array_distinct(transform(col("members"), m => m.getField("d")))) * 2)
          .cast("long").as("n_members"))
  }
}
