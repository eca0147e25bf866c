package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (backward) join — for every left row, the latest right row with the
  * same key and right.ts <= left.ts (the trades-vs-quotes shape; here:
  * events vs the most recent preceding crawl/observation).
  *
  * Spark has no asof operator and the naive forms do not scale: a range
  * join (l.ts >= r.ts) explodes to O(|L|·|R|) per key before the top-1, and
  * a per-row LATERAL probe is a driver loop. The canonical distributed shape
  * used here is the UNION trick: tag both sides, hash-partition by key ONCE,
  * sort each partition by (ts, side) with right-before-left on ties, and
  * carry the matched right row forward with a running `last(ignoreNulls)` —
  * a single shuffle + sort, linear scan, no row explosion. This is how
  * kdb+/Flink/QuestDB-style engines distribute asof; at 100 TB it inherits
  * every property of a plain shuffle (AQE handles partition sizing; a skewed
  * key can be salted upstream like any other join key).
  *
  * The carry is ONE struct per right row, not per-column carries: a right
  * row whose payload value is NULL must still be "the match" (SQL semantics)
  * — independent per-column last(ignoreNulls) would stitch together values
  * from different right rows. The struct itself is never null for a right
  * row, so ignoreNulls skips exactly the left rows.
  *
  * Null semantics match SQL ASOF: right rows with a null key or null ts can
  * never match and are filtered; left rows with a null key or null ts are
  * kept with null right columns (they sort before every right row of their
  * partition, or into the all-left null-key partition, so the carry is
  * naturally null for them).
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate it
  * (e.g. groupBy(key, ts).agg(...)) so tie-breaking is deterministic; left
  * rows with no preceding right row get nulls (left-outer semantics).
  */
object AsOfJoin {

  /** Backward as-of join on `key`/`ts` (same column names on both sides).
    * Output: every left column, then `<ts>_right` (the matched right
    * timestamp) and every right payload column; right payload names must not
    * collide with left names.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(c => c == key || c == ts)
    val rTs = s"${ts}_right"
    val reserved = Seq(rTs, "_side", "_r")
    val clashes = (rPayload ++ reserved).filter(lCols.contains) ++ reserved.filter(rPayload.contains)
    require(clashes.isEmpty, s"column names ${clashes.distinct} collide with generated/left columns")

    val rStructType = StructType(
      StructField("rts", right.schema(ts).dataType) +:
        rPayload.map(c => StructField(c, right.schema(c).dataType)))

    val lTagged = left.select(
      lCols.map(col) ++
        Seq(lit(1).as("_side"), lit(null).cast(rStructType).as("_r")): _*)
    val rTagged = right
      .filter(col(key).isNotNull && col(ts).isNotNull) // null key/ts never matches in SQL asof
      .select(
        lCols.map(c =>
          if (c == key || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(lit(0).as("_side"),
            struct(col(ts).as("rts") +: rPayload.map(col): _*).as("_r")): _*)

    // ties: right (side 0) sorts before left (side 1) at equal ts, so a left
    // row sees a same-timestamp right row — the `ts >= right.ts` convention
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++
        (col("_r.rts").as(rTs) +: rPayload.map(c => col(s"_r.$c").as(c))): _*)
  }
}
