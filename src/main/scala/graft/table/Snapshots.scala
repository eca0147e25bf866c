package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot checkpointing emulated over Parquet (no Iceberg jar
  * in /opt/spark/jars — SURVEY §4): a stage output is a Parquet directory plus
  * a `_graft_manifest.json` recording per-FILE lineage — row counts, byte
  * sizes, and bbox extent metrics read from the Parquet FOOTERS only
  * (north_rule: "resumable from checkpoint with per-partition lineage +
  * metrics"; the footer min/max stats are the same column-stats Iceberg keeps
  * in its manifests, enabling partition-pruning decisions on resume).
  *
  * Scale contract (the part that matters at 100 TB):
  *   - everything goes through the Hadoop FileSystem API, so snapshots work
  *     on hdfs:///s3a:// paths exactly like local ones — a manifest layer
  *     that only speaks java.nio would be unusable on a real cluster.
  *   - `write` never caches the stage and never re-scans it: the parquet job
  *     runs once, then stats come from O(files) footer reads.
  *   - `isComplete` is metadata-only: manifest parse + per-file existence and
  *     byte-size equality, requiring a non-empty file list (Spark always
  *     commits at least one — possibly empty — part file). Resuming a 100 TB
  *     pipeline must not re-read 100 TB to decide what is already done.
  *   - the manifest is committed AFTER the parquet job commits, via
  *     tmp-write + rename; a crash anywhere leaves either no manifest (stage
  *     recomputes) or a manifest describing a fully-committed snapshot.
  *   - `resumableBatched` adds Iceberg file-group commit granularity: a
  *     killed run resumes at the first incomplete batch instead of
  *     recomputing the whole stage.
  */
object Snapshots {

  final case class FileStat(name: String, bytes: Long, rows: Long,
      extent: Option[(Double, Double, Double, Double)])

  private val ExtentCols = Seq("min_lon", "min_lat", "max_lon", "max_lat")

  private def hconf(spark: SparkSession): Configuration = spark.sessionState.newHadoopConf()
  private def fsFor(p: HPath, conf: Configuration): FileSystem = p.getFileSystem(conf)

  private def partFiles(dir: String, conf: Configuration): Seq[(HPath, Long)] = {
    val d = new HPath(dir)
    val fs = fsFor(d, conf)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && n.startsWith("part-") && n.endsWith(".parquet")
      }
      .sortBy(_.getPath.getName)
      .map(st => (st.getPath, st.getLen))
  }

  /** Footer-only per-file stats: record count always; bbox extent min/max
    * from the parquet column statistics when the stage carries bbox columns.
    * Cost is O(files) footer reads — no row of data is scanned. The extent is
    * recorded ONLY when every non-empty row group has valid stats for all
    * four bbox columns (parquet-mr drops double min/max when it sees NaN, and
    * writers may disable stats) — a partial extent would make downstream
    * file pruning unsound, so absence is the conservative answer.
    */
  private def footerStats(spark: SparkSession, dir: String, wantExtent: Boolean): Seq[FileStat] = {
    val conf = hconf(spark)
    partFiles(dir, conf).map { case (p, bytes) =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val rows = reader.getRecordCount
        val blocks = reader.getFooter.getBlocks.asScala.toSeq.filter(_.getRowCount > 0)
        def stat(colName: String, takeMin: Boolean): Option[Double] = {
          val vals = blocks.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == colName).flatMap { c =>
              val st: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) None
              else Some((if (takeMin) st.genericGetMin else st.genericGetMax)
                .asInstanceOf[Number].doubleValue())
            }
          }
          // every non-empty block must report the stat, else no file extent
          if (vals.exists(_.isEmpty) || vals.isEmpty) None
          else {
            val vs = vals.flatten
            Some(if (takeMin) vs.min else vs.max)
          }
        }
        val extent =
          (if (!wantExtent || rows == 0) None
           else for {
             lo0 <- stat("min_lon", takeMin = true); la0 <- stat("min_lat", takeMin = true)
             lo1 <- stat("max_lon", takeMin = false); la1 <- stat("max_lat", takeMin = false)
           } yield (lo0, la0, lo1, la1))
            // a NaN bound compares false against everything — downstream
            // pruning would silently drop the file; no extent is the sound
            // answer (parquet-mr may or may not suppress stats on NaN input)
            .filterNot { case (a, b, c, d) => a.isNaN || b.isNaN || c.isNaN || d.isNaN }
        FileStat(p.getName, bytes, rows, extent)
      } finally reader.close()
    }
  }

  private[table] def manifestJson(stage: String, columns: Seq[String], stats: Seq[FileStat]): String = {
    val cols = columns.map(c => "\"" + c + "\"").mkString(",")
    val files = stats.map { f =>
      val ext = f.extent.map { case (a, b, c, d) => s""","extent":[$a,$b,$c,$d]""" }.getOrElse("")
      s"""{"file":"${f.name}","bytes":${f.bytes},"rows":${f.rows}$ext}"""
    }.mkString(",")
    s"""{"stage":"$stage","total_rows":${stats.map(_.rows).sum},"columns":[$cols],"files":[$files]}"""
  }

  /** Manifest commit: write to a tmp name, then rename over the final name.
    * HDFS/local rename is atomic; when a previous manifest exists it is
    * deleted first — a crash in that window leaves NO manifest, which reads
    * as incomplete and recomputes (fail-safe, never fail-wrong).
    */
  private def commitManifest(spark: SparkSession, dir: String, json: String): Unit = {
    val conf = hconf(spark)
    val dst = new HPath(dir, "_graft_manifest.json")
    val tmp = new HPath(dir, "_graft_manifest.json.tmp")
    val fs = fsFor(dst, conf)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"manifest rename failed for $dst")
  }

  /** Parse a snapshot manifest into per-file stats; None when absent or
    * unreadable. The single parser shared by completeness checking and
    * ZOrder's file pruning, so the format cannot drift between readers.
    */
  def readManifest(spark: SparkSession, path: String): Option[Seq[FileStat]] = {
    val conf = hconf(spark)
    val mf = new HPath(path, "_graft_manifest.json")
    val fs = fsFor(mf, conf)
    if (!fs.exists(mf)) return None
    try {
      val in = fs.open(mf)
      val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      if (!json.contains("\"total_rows\"")) return None
      val entries =
        """"file":"([^"]+)","bytes":(\d+),"rows":(\d+)(?:,"extent":\[([^\]]*)\])?""".r
          .findAllMatchIn(json).map { m =>
            val extent = Option(m.group(4)).map { s =>
              val e = s.split(",").map(_.toDouble)
              (e(0), e(1), e(2), e(3))
            }
            FileStat(m.group(1), m.group(2).toLong, m.group(3).toLong, extent)
          }.toVector
      Some(entries)
    } catch { case _: Exception => None }
  }

  def write(df: DataFrame, path: String, stage: String): Unit = {
    df.write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val wantExtent = ExtentCols.forall(df.columns.contains)
    val stats = footerStats(spark, path, wantExtent)
    // Spark commits at least one part file even for an empty stage; zero
    // files means the listing and the write disagree (wrong FS view) — fail
    // loudly rather than commit a manifest nothing can validate
    if (stats.isEmpty)
      throw new IllegalStateException(s"no part files visible under $path after write")
    commitManifest(spark, path, manifestJson(stage, df.columns.toSeq, stats))
  }

  /** Metadata-only completeness: the manifest exists, parses to a NON-EMPTY
    * file list, and every listed file is present with the recorded byte
    * size. O(files), zero data read — the snapshot content itself is trusted
    * because the manifest is only committed after the parquet job commits
    * and file sizes pin the committed bytes.
    */
  def isComplete(spark: SparkSession, path: String): Boolean =
    readManifest(spark, path).exists { listed =>
      val conf = hconf(spark)
      listed.nonEmpty && listed.forall { f =>
        val p = new HPath(path, f.name)
        val fs = fsFor(p, conf)
        try fs.exists(p) && fs.getFileStatus(p).getLen == f.bytes
        catch { case _: Exception => false }
      }
    }

  /** Run `compute` with snapshot resume: if a complete snapshot exists at
    * `path`, read it; otherwise compute, checkpoint, and return the snapshot
    * read (so downstream stages consume the durable copy — kill-and-restart
    * resumes here instead of recomputing upstream).
    */
  def resumable(spark: SparkSession, path: String, stage: String)(compute: => DataFrame): DataFrame = {
    if (!isComplete(spark, path)) write(compute, path, stage)
    spark.read.parquet(path)
  }

  /** Batched resume — Iceberg file-group commit granularity. Each batch key
    * gets its own sub-snapshot under `path/part_<key>`; a killed-and-
    * restarted run skips every batch whose sub-snapshot is complete and
    * recomputes only the rest, then (re)commits a root manifest aggregating
    * the per-batch lineage. Batches must partition the input (the caller's
    * contract — e.g. key = d % nBatches) so the union of sub-snapshots is the
    * stage output. Returns the union read over the durable copies.
    *
    * Cost contract: `compute(b)` runs once per incomplete batch, so at
    * cluster scale the batch key must PRUNE the input read (a partition
    * column, a file-group manifest, a date directory) — filtering one full
    * scan per batch multiplies the read by the batch count and is only
    * acceptable when the upstream is cached or trivially small (the q81 gate
    * shape). With pruned inputs this is the difference between losing a
    * 100 TB stage to a driver crash and losing only the in-flight batch:
    * completed file groups are never touched again (their manifests pin
    * name+size), and the root manifest gives the whole-stage row count +
    * extent without any scan.
    */
  def resumableBatched(spark: SparkSession, path: String, stage: String, batches: Seq[String])
      (compute: String => DataFrame): DataFrame = {
    require(batches.nonEmpty, "resumableBatched needs at least one batch key")
    require(batches.distinct.size == batches.size, s"duplicate batch keys in $batches")
    val dirs = batches.map(b => b -> s"$path/part_$b")
    dirs.foreach { case (b, bp) =>
      if (!isComplete(spark, bp)) write(compute(b), bp, s"$stage/$b")
    }
    // root manifest: aggregate per-batch lineage (rows per batch + total)
    val rootJson = {
      val parts = dirs.map { case (b, bp) =>
        val rows = readManifest(spark, bp).map(_.map(_.rows).sum).getOrElse(0L)
        s"""{"batch":"$b","rows":$rows}"""
      }.mkString(",")
      s"""{"stage":"$stage","batches":[$parts]}"""
    }
    commitManifest(spark, path, rootJson)
    spark.read.parquet(dirs.map(_._2): _*)
  }
}
