package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication: first-seen wins per content hash, dedup
  * state bounded by the event-time watermark (`dropDuplicatesWithinWatermark`)
  * so a 100 TB/day ingest never accumulates unbounded hash state — the
  * streaming face of the batch `TextOps.exactDupGroups` (q17). Emits the
  * surviving rows with their content hash.
  */
object StreamingDedup {

  def dedupStream(docs: DataFrame, tsCol: String, watermarkDelay: String): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(to_binary(col("text"), lit("utf-8"))))
    // null-text rows all hash to null; deduping them against each other would
    // silently collapse distinct (unparseable) documents — pass them through
    val deduped = hashed.filter(col("text").isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
    deduped.unionByName(hashed.filter(col("text").isNull))
  }
}
