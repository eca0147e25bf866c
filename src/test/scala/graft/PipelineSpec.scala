package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.util.Comparator

/** Kill-and-restart resumability of the snapshot pipeline (north_rule). */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  test("pipeline resumes mid-run: earlier snapshots are reused, missing stages recomputed") {
    assume(Files.exists(java.nio.file.Paths.get(sf, "lineitem.parquet")))
    val work = Files.createTempDirectory("graft-pipe").toString
    Pipeline.run(spark, sf, work)
    for (stage <- Seq("s1_extracted", "s2_merged", "s3_pip", "s4_tiles"))
      assert(table.Snapshots.isComplete(spark, s"$work/$stage"), s"$stage incomplete")
    val pipCount = spark.read.parquet(s"$work/s3_pip").count()
    val s1Mtime = Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$work/s1_extracted/_graft_manifest.json"))

    // simulate a crash after stage 2: stages 3+4 lost
    deleteRec(java.nio.file.Paths.get(s"$work/s3_pip"))
    deleteRec(java.nio.file.Paths.get(s"$work/s4_tiles"))
    Pipeline.run(spark, sf, work)

    // stage 1 untouched (resumed, not recomputed); stage 3 rebuilt identically
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$work/s1_extracted/_graft_manifest.json")) === s1Mtime)
    assert(spark.read.parquet(s"$work/s3_pip").count() === pipCount)
    assert(table.Snapshots.isComplete(spark, s"$work/s4_tiles"))

    // the z-ordered s1 snapshot is prunable from its manifest alone, and
    // pruning is output-invisible vs the plain predicate over the full read
    import org.apache.spark.sql.functions.col
    val (zRows, zRead, zTotal) =
      table.ZOrder.readBbox(spark, s"$work/s1_extracted", 0.0, 40.0, 20.0, 55.0)
    assert(zRead < zTotal, s"no file skipped: $zRead/$zTotal")
    val pred = col("max_lon") >= 0.0 && col("min_lon") <= 20.0 &&
      col("max_lat") >= 40.0 && col("min_lat") <= 55.0
    val full = spark.read.parquet(s"$work/s1_extracted").filter(pred)
    assert(zRows.count() === full.count())
    assert(zRows.count() > 0)
  }

  test("completeness is metadata-only and tamper-evident: a size-mismatched file fails the check") {
    assume(Files.exists(java.nio.file.Paths.get(sf, "lineitem.parquet")))
    val work = Files.createTempDirectory("graft-pipe3").toString
    val df = table.Pages.pages(spark, sf).select("d", "url")
    table.Snapshots.write(df, s"$work/st", "x")
    assert(table.Snapshots.isComplete(spark, s"$work/st"))
    // truncate one committed part file: the manifest's byte size no longer
    // matches, so the snapshot must be treated as incomplete (recompute), and
    // the check must catch it WITHOUT scanning data
    val ls = Files.list(java.nio.file.Paths.get(s"$work/st"))
    val victim =
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      } finally ls.close()
    val bytes = Files.readAllBytes(victim)
    Files.write(victim, bytes.dropRight(1))
    assert(!table.Snapshots.isComplete(spark, s"$work/st"))
    // resumable recomputes and the snapshot is whole again
    val re = table.Snapshots.resumable(spark, s"$work/st", "x")(df)
    assert(re.count() === df.count())
    assert(table.Snapshots.isComplete(spark, s"$work/st"))
  }

  test("resumableBatched: a mid-run failure resumes at the first incomplete batch") {
    assume(Files.exists(java.nio.file.Paths.get(sf, "lineitem.parquet")))
    val work = Files.createTempDirectory("graft-pipe4").toString
    val base = table.Pages.pages(spark, sf).select("d", "url")
    val keys = (0 until 4).map(_.toString)
    def batch(b: String) = base.filter(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("d"), org.apache.spark.sql.functions.lit(4)) === b.toInt)
    // first run dies after committing two batches
    val computed1 = scala.collection.mutable.ArrayBuffer[String]()
    val boom = intercept[RuntimeException] {
      table.Snapshots.resumableBatched(spark, s"$work/m", "merge", keys) { b =>
        if (computed1.size == 2) throw new RuntimeException("injected-kill")
        computed1 += b; batch(b)
      }
    }
    assert(boom.getMessage === "injected-kill")
    assert(computed1.toList === List("0", "1"))
    // restart: batches 0/1 are skipped (their sub-snapshots are complete),
    // only 2/3 compute, and the union equals the clean full answer
    val computed2 = scala.collection.mutable.ArrayBuffer[String]()
    val out = table.Snapshots.resumableBatched(spark, s"$work/m", "merge", keys) { b =>
      computed2 += b; batch(b)
    }
    assert(computed2.toList === List("2", "3"))
    assert(out.count() === base.count())
    // root manifest aggregates per-batch lineage
    val root = Files.readString(java.nio.file.Paths.get(s"$work/m", "_graft_manifest.json"))
    assert(root.contains("\"batches\"") && root.contains("\"rows\""))
  }

  test("incomplete snapshot (missing manifest) is recomputed, not trusted") {
    assume(Files.exists(java.nio.file.Paths.get(sf, "lineitem.parquet")))
    val work = Files.createTempDirectory("graft-pipe2").toString
    val df = table.Pages.pages(spark, sf).select("d")
    table.Snapshots.write(df, s"$work/st", "x")
    Files.delete(java.nio.file.Paths.get(s"$work/st/_graft_manifest.json"))
    assert(!table.Snapshots.isComplete(spark, s"$work/st"))
    val re = table.Snapshots.resumable(spark, s"$work/st", "x")(df)
    assert(re.count() === df.count())
    assert(table.Snapshots.isComplete(spark, s"$work/st"))
  }
}
