package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact frequent-items at scale (Misra–Gries candidates + exact verify).
  *
  * Finding every key with global count > n/(k+1) by a plain groupBy shuffles
  * EVERY key — at 100 TB with billions of distinct keys (urls, hosts, cells)
  * that is the single most expensive shuffle a skew probe can take. The
  * two-phase shape here never does it:
  *
  *   1. candidate generation: one narrow scan running Misra–Gries(k) per
  *      partition, O(k) memory per task. The MG deficit bound (a counter is
  *      short by at most n_p/(k+1)) keeps every key with LOCAL count
  *      > n_p/(k+1); by pigeonhole a key with GLOBAL count > n/(k+1) exceeds
  *      that local threshold in at least one partition — so the union of
  *      per-partition candidate keys is a SUPERSET of the true heavy keys
  *      (≤ k·partitions keys total, broadcastable).
  *   2. exact verify: re-scan with a broadcast semi-join on the candidate
  *      set, exact groupBy over the few surviving rows, keep keys with
  *      cnt·(k+1) > n — integer arithmetic, no division, so an external SQL
  *      oracle reproduces the OUTPUT exactly even though phase 1 is a sketch.
  *
  * This is the detector that justifies skew handling (join/SkewPlanner's
  * salting decision = "does any key exceed a frequency bound?") — here as a
  * first-class relational operator.
  *
  * Reference semantics analog: the reference has no frequent-items op; this
  * is pipeline-grade infrastructure (Misra & Gries 1982, public).
  */
object HeavyHitters {

  /** Keys with exact count · (k+1) > total rows, over `key` cast to long.
    * Output: (key, cnt, n_total). Requires a non-null integral key column
    * (cells, ids, hashes); callers hash arbitrary keys to 64-bit first.
    *
    * Exactly TWO scans of the key stream: pass 1 emits each partition's MG
    * candidate keys plus its row count (the total rides the same scan), and
    * the driver folds that bounded summary — ≤ (k+1)·partitions rows, the
    * same bounded-by-contract collect as the skew histogram — into the
    * candidate set + n; pass 2 is the exact verify.
    */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(key.cast("long").as("key")).filter(col("key").isNotNull)

    // phase 1: per-partition Misra–Gries(k). Decrement-all is amortized O(1)
    // per row (every decrement cancels a prior increment), so the scan is
    // linear with an O(k) map per task. Each partition also emits its row
    // count as an (isTotal=true) row so n_total needs no second scan.
    val summary = keys.as[Long].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Long, Long]
      var n = 0L
      it.foreach { t =>
        n += 1
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            counters.mapValuesInPlace((_, v) => v - 1)
            counters.filterInPlace((_, v) => v > 0)
        }
      }
      counters.keysIterator.map(kk => (false, kk, 0L)) ++ Iterator.single((true, 0L, n))
    }.collect() // bounded: ≤ (k+1) rows per partition
    val nTotal = summary.iterator.filter(_._1).map(_._3).sum
    val candidates = summary.iterator.filterNot(_._1).map(_._2).toVector.distinct

    // phase 2: exact verify — count only candidate keys (tiny shuffle), then
    // the exact threshold on true counts.
    keys.join(broadcast(candidates.toDF("key")), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k + 1L) > lit(nTotal))
      .select(col("key"), col("cnt"), lit(nTotal).as("n_total"))
  }
}
