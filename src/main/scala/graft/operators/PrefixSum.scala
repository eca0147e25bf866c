package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed running sum over a global total order.
  *
  * `Window.orderBy(...)` with no partition spec is a scale trap: Spark moves
  * the ENTIRE input to a single partition to honor the global order (the
  * "No Partition Defined for Window operation" warning), so a corpus-scale
  * cumulative sum serializes on one task. This is the textbook two-pass
  * prefix-sum instead:
  *
  *  1. range-partition on the order key (equal keys co-locate, partitions are
  *     globally ordered) and pin the partitioning with a localCheckpoint so
  *     both passes see identical partitions;
  *  2. per-partition totals → driver-side prefix offsets (≤ numPartitions
  *     rows — bounded by config, never by data);
  *  3. per-partition ordered windows run in PARALLEL, each shifted by its
  *     partition's offset.
  *
  * Semantics are identical to the global window for any total order the
  * `order` columns define (ties that the order leaves ambiguous are co-located
  * by the range partitioner, so they resolve exactly as the single-partition
  * window would).
  */
object PrefixSum {

  /** Append `cumName` = running sum of `value` in the total order given by
    * `order`. Internal columns are dropped on output.
    *
    * `value` must be an integral column (sizes/counts — the F5 domain): the
    * running sum accumulates exactly in long; a fractional column would be
    * silently truncated per row, so it is rejected instead.
    *
    * Lifecycle notes: CONSTRUCTION IS EAGER — the range partitioning is
    * pinned with a localCheckpoint and the per-partition totals are
    * collected before the result plan exists (inherent to a two-pass prefix
    * sum: re-executing `repartitionByRange` resamples its bounds, so the
    * offsets must be taken from the same materialization the final pass
    * reads). The checkpoint cannot be FIFO-unpersisted like the LSH stage
    * caches (truncated lineage ⇒ an evicted block fails late consumers
    * instead of recomputing); it is released by Spark's ContextCleaner once
    * the returned DataFrame becomes unreachable.
    */
  def withRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                     cumName: String): DataFrame = {
    val spark = df.sparkSession
    val vType = df.select(value.as("_v")).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(vType.typeName),
      s"PrefixSum sums integral size columns exactly; got $vType")
    val n = spark.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(n, order: _*)
      .withColumn("_ps_pid", spark_partition_id())
      .localCheckpoint() // pin partition bounds across the two passes
    val totals = parted.groupBy("_ps_pid")
      .agg(sum(value.cast("long")).as("_t"))
      .collect().filterNot(_.isNullAt(1)) // all-NULL partition contributes 0
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L) {
      case (acc, pid) => acc + totals.getOrElse(pid, 0L)
    }
    val offDf = spark.createDataFrame(
      (0 until n).map(pid => (pid, offsets(pid)))).toDF("_ps_pid", "_ps_off")
    val w = Window.partitionBy("_ps_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offDf), Seq("_ps_pid"))
      .withColumn(cumName, col("_ps_off") + sum(value.cast("long")).over(w))
      .drop("_ps_pid", "_ps_off")
  }
}
