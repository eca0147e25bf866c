package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries into plans/<tag>/ —
  * evidence artifacts for the optimization rounds (judge-checkable plan
  * claims). Usage: runMain graft.PlanDump <tag> <suffix> [q1,q2,...]
  * writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
  * the Bench headline set).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "r06"
    val suffix = if (args.length > 1) args(1) else "before"
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("q01_extract_extent", "q04_bbox_merge", "q07_pip_join",
        "q08_knn_join", "q10_tiles", "q17_dedup_exact", "q22_ann_topk",
        "q23_minhash_pairs", "q39_media_features")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    for (name <- names) {
      try {
        // q08/q48-style queries run driver-side iterative plans; the explain
        // captured here is the FINAL returned frame's physical plan
        val df = SparkEntry.queries(name)(s, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"wrote plans/$tag/${name}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    s.stop()
  }
}
