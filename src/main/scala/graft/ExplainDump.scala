package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: write `explain("formatted")` for the named SparkEntry
  * queries (all of them by default) to an output directory, for checking that
  * filters push down, small sides broadcast, and aggregates stay hash-based.
  *
  * Usage: runMain graft.ExplainDump [outDir [query ...]]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/explain")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    new java.io.File(outDir).mkdirs()
    for (q <- names) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$q.txt"), plan)
    }
    spark.stop()
  }
}
