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
