package graft.table

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The manifest writer and the shared parser are a mirrored pair; this pins
  * their round trip so a writer change that the parser cannot read fails CI
  * instead of silently disabling completeness checks and ZOrder pruning
  * (readManifest degrading to empty/None reads as "incomplete" and causes
  * permanent recompute — fail-safe but a real regression).
  */
class SnapshotsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("manifestJson round-trips through readManifest for any stats shape") {
    // deterministic pseudo-random stats: extents present/absent, zero-row
    // files, extreme doubles, many files
    val stats = (0 until 40).map { i =>
      val extent =
        if (i % 3 == 0) None
        else Some((
          -180.0 + (i * 7919 % 3600) / 10.0,
          -90.0 + (i * 104729 % 1800) / 10.0,
          (i * 31 % 1800) / 10.0,
          (i * 17 % 900) / 10.0))
      Snapshots.FileStat(f"part-$i%05d-abc.snappy.parquet", i * 1031L, (i % 5) * 211L, extent)
    }
    val dir = Files.createTempDirectory("graft-manifest-rt")
    Files.writeString(dir.resolve("_graft_manifest.json"),
      Snapshots.manifestJson("rt-stage", Seq("a", "min_lon", "max_lon"), stats))
    val parsed = Snapshots.readManifest(spark, dir.toString)
    assert(parsed === Some(stats.toVector))
  }

  test("extreme double extents (negative, scientific notation) survive the round trip") {
    val stats = Seq(
      Snapshots.FileStat("part-00000.parquet", 10L, 1L, Some((-179.999999999, -89.5, 1.0e-7, 4.5e2))),
      Snapshots.FileStat("part-00001.parquet", 20L, 2L, Some((0.0, 0.0, 0.0, 0.0))))
    val dir = Files.createTempDirectory("graft-manifest-rt2")
    Files.writeString(dir.resolve("_graft_manifest.json"),
      Snapshots.manifestJson("rt", Seq("min_lon"), stats))
    assert(Snapshots.readManifest(spark, dir.toString) === Some(stats.toVector))
  }

  test("a garbage manifest parses to None, never to a wrong non-empty answer") {
    val dir = Files.createTempDirectory("graft-manifest-rt3")
    Files.writeString(dir.resolve("_graft_manifest.json"), "{not json at all")
    assert(Snapshots.readManifest(spark, dir.toString) === None)
    assert(!Snapshots.isComplete(spark, dir.toString))
    assert(Snapshots.readManifest(spark, Paths.get(dir.toString, "missing").toString) === None)
  }
}
