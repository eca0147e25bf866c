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
  *      (≤ k·partitions keys, a bounded driver summary).
  *   2. exact verify: one aggregation scan where every non-candidate key is
  *      collapsed into a single null bucket (map-side partial agg, so the
  *      shuffle carries ≤ candidates+1 rows per map task). Both the exact
  *      per-candidate counts AND the total row count come out of this SAME
  *      scan, so they are mutually consistent even if the source recomputes
  *      differently between jobs; keys with cnt·(k+1) > n survive — integer
  *      arithmetic, no division, so an external SQL oracle reproduces the
  *      OUTPUT exactly even though phase 1 is a sketch.
  *
  * The superset property (phase 1 vs phase 2) additionally requires the
  * input to be deterministic under recomputation — the standard assumption
  * of every multi-pass Spark algorithm; cache the input when it is not.
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
    * Output: (key, cnt, n_total) — materialized, since a heavy-hitter result
    * is ≤ k+1 rows by definition. Requires a non-null integral key column
    * (cells, ids, hashes); callers hash arbitrary keys to 64-bit first.
    */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // defensively persist the projected key column for the duration of the
    // two scans: the candidate-superset property assumes the input is
    // deterministic under recomputation, which a general caller's source may
    // not be — pinning the single-long column (evictable, spillable) makes
    // the property hold unconditionally
    val keys = df.select(key.cast("long").as("key")).filter(col("key").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val candidates = mgCandidates(keys, k)
      val counts = exactCounts(keys, candidates)
        .collect() // bounded: ≤ candidates+1 rows
      val nTotal = counts.iterator.map(_.getLong(1)).sum
      val heavy = counts.iterator
        .filter(r => !r.isNullAt(0) && r.getLong(1) * (k + 1L) > nTotal)
        .map(r => (r.getLong(0), r.getLong(1), nTotal))
        .toSeq.sortBy(_._1)
      heavy.toDF("key", "cnt", "n_total")
    } finally keys.unpersist(false)
  }

  /** Phase 1: per-partition Misra–Gries(k). Decrement-all is amortized O(1)
    * per row (every decrement cancels a prior increment), so the scan is
    * linear with an O(k) map per task. Returns the deduplicated candidate
    * union — a bounded ≤ k·partitions driver summary, the same
    * bounded-by-contract collect as the skew histogram.
    */
  private[graft] def mgCandidates(keys: DataFrame, k: Int): Seq[Long] = {
    import keys.sparkSession.implicits._
    keys.as[Long].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Long, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            counters.mapValuesInPlace((_, v) => v - 1)
            counters.filterInPlace((_, v) => v > 0)
        }
      }
      counters.keysIterator
    }.collect().toVector.distinct
  }

  /** Phase 2 plan: one scan, non-candidates collapsed into the null bucket
    * by the partial aggregation — the shuffle carries ≤ candidates+1 rows
    * per map task and the full key set is never exchanged.
    */
  private[graft] def exactCounts(keys: DataFrame, candidates: Seq[Long]): DataFrame =
    keys
      .withColumn("ckey",
        if (candidates.isEmpty) lit(null).cast("long")
        else when(col("key").isInCollection(candidates), col("key")))
      .groupBy("ckey").agg(count(lit(1)).as("cnt"))
}
