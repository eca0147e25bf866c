package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextOps

/** Streaming face of the MinHash-LSH near-duplicate candidate generator —
  * the micro-batch analog of [[TextOps.minhashCandidatePairs]] (q23), closing
  * the batch/streaming symmetry started by [[StreamingDedup]] (exact dedup).
  *
  * Shape: signature + band explode run as ordinary narrow column work using
  * the SAME expressions as the batch operator (identical `minhashUdf` and
  * exact `TextOps.bandSig` band keys, so a replayed corpus lands in
  * identical buckets);
  * the bucket self-join becomes per-bucket state in ONE
  * `flatMapGroupsWithState` keyed by (band, band signature). Each arriving document
  * is paired against the bucket members already in state, so a near-dup pair
  * split across micro-batches is still emitted. State is bounded two ways:
  *   - event-time watermark: members older than the watermark are pruned on
  *     every invocation and by an EventTimeTimeout sweep, so a 100 TB/day
  *     ingest holds only the watermark window's bucket membership;
  *   - bucket occupancy cap: a bucket that exceeds `bucketCap` members stops
  *     emitting and drops its member list (a saturated-flag tombstone
  *     remains until the watermark clears it). The batch operator drops
  *     overfull buckets wholesale; a stream cannot retract already-emitted
  *     pairs, so saturation-stop is the closest prefix-consistent semantics
  *     (documented deviation — pairs emitted before saturation stay).
  *
  * Deviations from the batch plan, on purpose:
  *   - the 64-hash signature rides into bucket state (~0.5 KB/member) so
  *     `est_jaccard` is computed in-state; the batch trick of joining
  *     signatures back after pair dedup would be a second stateful operator
  *     (stream-stream join) with its own unbounded-ish state — strictly worse
  *     than carrying 512 bytes per watermarked member.
  *   - a pair sharing several bucket keys is emitted once per sharing band
  *     (the batch op ends with dropDuplicates). Cross-band dedup is a
  *     watermarked `dropDuplicatesWithinWatermark` on (doc_a, doc_b) in the
  *     NEXT query of the pipeline (chaining it here would stack a second
  *     stateful operator behind flatMapGroupsWithState, which Structured
  *     Streaming rejects) — each emitted pair carries the event time the
  *     downstream dedup needs; StreamingPipelineSpec runs the full
  *     three-query chain and parity-checks it against batch q23.
  *   - exact duplicates are collapsed upstream by [[StreamingDedup]] in a
  *     real pipeline (batch: `collapseExactDups`) — same chaining rule.
  *
  * Reference: the batch-only reference has no streaming surface (SURVEY
  * §2.7); this is engine-native, like EventWindows.
  */
object StreamingLsh {

  final case class Banded(band: Int, bandsig: String, doc_id: Long,
                          ts: java.sql.Timestamp, sig: Array[Long])
  /** `ts` is the pair's event time — the LATER of the two members' event
    * times (the moment the pair became knowable), which is what a downstream
    * watermarked operator (the cross-band `dropDuplicatesWithinWatermark`
    * stage of a chained pipeline) needs to bound its state.
    */
  final case class CandidatePair(doc_a: Long, doc_b: Long, est_jaccard: Double,
                                 ts: java.sql.Timestamp)
  /** saturated=true ⇒ members is empty and stays empty until the watermark
    * passes `lastTs`. lastTs = max event time ever seen in this bucket —
    * late members of a flooded bucket extend it, so the mute outlives the
    * stragglers instead of dying on the first watermark advance.
    */
  final case class BucketState(members: List[(Long, Long, Array[Long])],
                               saturated: Boolean, lastTs: Long)

  def minhashCandidatePairs(docs: DataFrame, tsCol: String, watermarkDelay: String,
                            bands: Int = 16, rowsPerBand: Int = 4,
                            bucketCap: Int = 1000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val numHashes = bands * rowsPerBand
    val banded = docs
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), TextOps.minhashUdf(col("text"), lit(numHashes)).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          TextOps.bandSig(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*)).as(Seq("band", "bandsig")))
      .select(col("band"), col("bandsig"), col("doc_id"), col("ts"), col("sig"))
      .as[Banded]

    def estJaccard(a: Array[Long], b: Array[Long]): Double = {
      var eq = 0; var i = 0
      while (i < numHashes) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / numHashes
    }

    banded.groupByKey(r => (r.band, r.bandsig)).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (_: (Int, String), it: Iterator[Banded], state: GroupState[BucketState]) => {
        val wm = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else Long.MinValue
        if (state.hasTimedOut) {
          val st = state.get
          if (st.saturated) {
            // the tombstone only expires once the watermark passes the
            // bucket's last-seen event time — not on the first advance
            if (wm > st.lastTs) state.remove()
            else armSaturated(state, st)
          } else {
            // sweep: drop expired members; clear the whole bucket when empty
            val kept = st.members.filter(_._2 >= wm)
            if (kept.isEmpty) state.remove()
            else { state.update(st.copy(members = kept)); armTimeout(state, kept) }
          }
          Iterator.empty
        } else {
          val prev = state.getOption.getOrElse(
            BucketState(Nil, saturated = false, lastTs = Long.MinValue))
          if (prev.saturated) { drainArm(state, prev, it); Iterator.empty }
          else {
            // deterministic pairing order within the micro-batch
            val fresh = it.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
            var members = prev.members.filter(_._2 >= wm)
            val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
            var saturated = false
            for (r <- fresh if !saturated) {
              if (members.length + 1 > bucketCap) saturated = true
              else {
                for ((oid, ots, osig) <- members if oid != r.doc_id)
                  out += CandidatePair(math.min(oid, r.doc_id), math.max(oid, r.doc_id),
                    estJaccard(osig, r.sig),
                    new java.sql.Timestamp(math.max(ots, r.ts.getTime)))
                members = (r.doc_id, r.ts.getTime, r.sig) :: members
              }
            }
            // skipped post-saturation arrivals still count toward lastTs
            val lastTs = (prev.lastTs +: fresh.map(_.ts.getTime)).max
            val next = BucketState(if (saturated) Nil else members, saturated, lastTs)
            state.update(next)
            if (saturated) armSaturated(state, next) else armTimeout(state, next.members)
            out.iterator
          }
        }
      })
  }

  /** Saturated tombstone: late members of the flooded bucket are swallowed,
    * but their event times extend the tombstone's life.
    */
  private def drainArm(state: GroupState[BucketState], prev: BucketState,
                       it: Iterator[Banded]): Unit = {
    var last = prev.lastTs
    for (r <- it) last = math.max(last, r.ts.getTime)
    val next = prev.copy(lastTs = last)
    state.update(next)
    armSaturated(state, next)
  }

  /** Arm a saturated tombstone's expiry from its last-seen event time. */
  private def armSaturated(state: GroupState[BucketState], st: BucketState): Unit = {
    state.update(st)
    state.setTimeoutTimestamp(math.max(st.lastTs, state.getCurrentWatermarkMs()) + 1)
  }

  private def armTimeout(state: GroupState[BucketState],
                         members: List[(Long, Long, Array[Long])]): Unit = {
    // expire when the newest member falls out of the watermark window: timing
    // out any earlier would forget members that could still pair with on-time
    // arrivals; the per-invocation prune handles partial expiry
    val newest = if (members.isEmpty) 0L else members.map(_._2).max
    val wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(math.max(newest, wm) + 1)
  }
}
