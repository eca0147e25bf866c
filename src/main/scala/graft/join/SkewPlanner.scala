package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Measured-histogram skew salting (SURVEY §4: "detect heavy keys via
  * groupBy(cell).count sample, salt factor per key, explode broadcast side").
  *
  * Unlike `SpatialJoins.saltedCellJoin` (uniform salts, simple and correct),
  * this planner salts only the keys that are actually hot: it measures the key
  * histogram (optionally on a sample), assigns each hot key a salt factor
  * proportional to its frequency, and explodes the dim side only for those
  * keys. Cold keys keep salt 0 — no dim-side blowup, no extra shuffle width.
  * At 10^12 rows the histogram runs on a driver-bounded top-k (hot keys are by
  * definition few), and result equality with the unsalted join is
  * property-tested in JoinsSpec.
  */
object SkewPlanner {

  /** Hot keys and their salt factors: every key whose row count exceeds
    * `rowsPerTask` gets ceil(count / rowsPerTask) salts (capped).
    *
    * The histogram runs on a SAMPLE of the big side (hot keys are by
    * definition frequent, so a 1 % sample still sees them) — a full
    * groupBy(key).count over 10^12 rows would be an extra full shuffle pass
    * just to plan the real one. Sampled counts are scaled back up by 1/fraction
    * before the threshold test; the deterministic seed keeps plans reproducible.
    */
  def hotKeySalts(big: DataFrame, keyCol: String, rowsPerTask: Long,
                  maxSalts: Int = 64, topK: Int = 1000,
                  sampleFraction: Double = 0.01): Map[Long, Int] = {
    big.sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(col(keyCol)).agg((count(lit(1)) / sampleFraction).cast("long").as("n"))
      .filter(col("n") > rowsPerTask)
      .orderBy(col("n").desc).limit(topK)
      .collect()
      .map(r => r.getLong(0) -> math.min(maxSalts, math.ceil(r.getLong(1).toDouble / rowsPerTask).toInt))
      .toMap
  }

  /** Equi-join `big ⋈ small` on `keyCol` with per-key salting from a measured
    * histogram. `small` must be the (broadcastable-or-not) dim side; each of
    * its rows is replicated only `salts(key)` times for hot keys, once
    * otherwise.
    */
  def skewJoin(big: DataFrame, small: DataFrame, keyCol: String,
               rowsPerTask: Long = 500000L): DataFrame = {
    val spark = big.sparkSession
    val salts = hotKeySalts(big, keyCol, rowsPerTask)
    if (salts.isEmpty) return big.join(small, Seq(keyCol))
    val saltsCol: Column = typedLit(salts)
    val nSaltsOf: Column => Column = k => coalesce(element_at(saltsCol, k), lit(1))
    val bigS = big.withColumn("_salt",
      pmod(hash(monotonicallyNotUsed(big, keyCol)), nSaltsOf(col(keyCol))))
    val smallS = small
      .withColumn("_salt", explode(sequence(lit(0), nSaltsOf(col(keyCol)) - 1)))
    bigS.join(smallS, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Deterministic per-row salt source: prefer an existing unique row key if
    * present, else a stable hash of all columns.
    */
  private def monotonicallyNotUsed(df: DataFrame, keyCol: String): Column = {
    val candidates = Seq("d", "doc_id", "pid", "event_id")
    candidates.find(df.columns.contains) match {
      case Some(c) => col(c)
      case None => hash(df.columns.map(col): _*)
    }
  }
}
