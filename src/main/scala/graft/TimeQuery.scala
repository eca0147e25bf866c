package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: wall-time one or more SparkEntry queries (count() action),
  * k runs each, min reported. Usage: runMain graft.TimeQuery q23_minhash_pairs [q...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_RUNS (default 3).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        (t, n)
      }
      println(f"[time] $q rows=${ts.head._2} min=${ts.map(_._1).min}%.2fs runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
