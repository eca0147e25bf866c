package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row, the latest right row with the
  * same key and right.ts <= left.ts (the trades-vs-quotes shape; here:
  * events vs the most recent preceding crawl/observation).
  *
  * Spark has no asof operator and the naive forms do not scale: a range
  * join (l.ts >= r.ts) explodes to O(|L|·|R|) per key before the top-1, and
  * a per-row LATERAL probe is a driver loop. The canonical distributed shape
  * used here is the UNION trick: tag both sides, hash-partition by key ONCE,
  * sort each partition by (ts, side) with right-before-left on ties, and
  * carry the right payload forward with a running `last(ignoreNulls)` —
  * a single shuffle + sort, linear scan, no row explosion. This is how
  * kdb+/Flink/QuestDB-style engines distribute asof; at 100 TB it inherits
  * every property of a plain shuffle (AQE handles partition sizing; a skewed
  * key can be salted upstream like any other join key).
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
    require(lCols.intersect(rPayload).isEmpty,
      s"right payload columns ${rPayload.intersect(lCols)} collide with left columns")
    val rTs = s"${ts}_right"

    val lTagged = left.select(
      lCols.map(col) ++
        Seq(lit(1).as("_side"), lit(null).cast(right.schema(ts).dataType).as(rTs)) ++
        rPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      lCols.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), col(ts).as(rTs)) ++
        rPayload.map(col): _*)

    // ties: right (side 0) sorts before left (side 1) at equal ts, so a left
    // row sees a same-timestamp right row — the `ts >= right.ts` convention
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rTs +: rPayload).foldLeft(lTagged.unionByName(rTagged)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }
}
