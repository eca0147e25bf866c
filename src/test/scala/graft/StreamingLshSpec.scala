package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch/streaming parity for the MinHash-LSH candidate generator: the same
  * corpus replayed through micro-batches must produce exactly the batch
  * operator's candidate set (identical signatures + band hashes ⇒ identical
  * buckets), near pairs split across micro-batches must still be emitted
  * (bucket state carries earlier members), and members outside the watermark
  * window must be forgotten. Fully deterministic: minhash seeds are fixed and
  * the texts are fixed, so bucket collisions are reproducible.
  */
class StreamingLshSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // disjoint token universes per doc (zero natural cross-doc shingle overlap);
  // the near-dup clone of doc i is doc 1000+i with one token changed
  private def docText(i: Long): String = (0 until 40).map(j => s"t${i}_$j").mkString(" ")
  private def nearText(i: Long): String =
    ((0 until 39).map(j => s"t${i}_$j") :+ "CHANGED").mkString(" ")

  private def t(m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("streaming LSH parity with batch + cross-batch near pair + watermark expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = streaming.StreamingLsh.minhashCandidatePairs(docs, "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("lsh_out").start()

    def emitted(): Set[(Long, Long)] =
      spark.table("lsh_out").select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet

    val mainCorpus = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    try {
      // batch 1: docs 0-9 (doc 3's near clone arrives two micro-batches later)
      val b1 = (0L until 10L).map(i => (i, t(0), docText(i)))
      // batch 2: docs 10-19 plus the near clone of doc 7 (same-adjacent-batch pair)
      val b2 = (10L until 20L).map(i => (i, t(2), docText(i))) :+ ((1007L, t(2), nearText(7L)))
      // batch 3: near clone of doc 3 — the CROSS-batch pair (state from batch 1)
      val b3 = Seq((1003L, t(4), nearText(3L)))
      for (b <- Seq(b1, b2, b3)) { in.addData(b); q.processAllAvailable() }
      mainCorpus ++= (b1 ++ b2 ++ b3).map(r => (r._1, r._3))

      val streamed = emitted()
      assert(streamed.contains((3L, 1003L)), s"cross-batch near pair missing: $streamed")
      assert(streamed.contains((7L, 1007L)), s"near pair missing: $streamed")

      // parity: identical candidate set and est_jaccard values vs the batch op
      val batchDf = mainCorpus.toSeq.toDF("doc_id", "text")
      val batch = graft.text.TextOps.minhashCandidatePairs(batchDf)
        .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("j"))
        .as[(Long, Long, Double)].collect().toSet
      val streamedFull = spark.table("lsh_out")
        .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("j"))
        .distinct().as[(Long, Long, Double)].collect().toSet
      assert(streamedFull === batch,
        s"parity broke: stream-only=${streamedFull -- batch}, batch-only=${batch -- streamedFull}")

      // watermark expiry: advance the watermark past the main corpus (event at
      // 11:30 → watermark 11:20), then replay a near clone of doc 5 — its
      // bucket members from 10:00 are expired state, so no pair may appear
      in.addData(Seq((2000L, t(90), docText(2000L))))
      q.processAllAvailable()
      in.addData(Seq((1005L, t(91), nearText(5L))))
      q.processAllAvailable()
      val late = emitted().filter(p => p._1 == 5L || p._2 == 1005L)
      assert(late.isEmpty, s"expired bucket members still pairing: $late")
    } finally q.stop()
  }

  test("saturated bucket stays muted until the watermark passes its last-seen event") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // identical texts ⇒ identical signatures ⇒ all bands collide in one bucket
    val same = (0 until 40).map(j => s"flood_$j").mkString(" ")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = streaming.StreamingLsh.minhashCandidatePairs(docs, "ts", "10 minutes", bucketCap = 2)
      .writeStream.outputMode("append").format("memory").queryName("lsh_sat").start()
    def emitted(): Set[(Long, Long)] =
      spark.table("lsh_sat").select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
    try {
      // b1: three members at 10:00 saturate the cap-2 bucket after (0,1) pairs
      in.addData((0L until 3L).map(i => (i, t(0), same))); q.processAllAvailable()
      // b2: straggler at 10:01 — swallowed, extends the tombstone to 10:01
      in.addData(Seq((3L, t(1), same))); q.processAllAvailable()
      // b3: two more at 10:05 (watermark is now 09:51 — the first advance past
      // the arm-time watermark, where the old Nil-armed tombstone died and the
      // bucket resumed pairing) — must STILL be muted
      in.addData(Seq((4L, t(5), same), (5L, t(5), same))); q.processAllAvailable()
      assert(emitted() === Set((0L, 1L)), s"tombstone leaked pairs: ${emitted()}")
      // advance the watermark past the bucket's last-seen 10:05 → tombstone
      // legitimately expires; a fresh pair in the same bucket key then emits
      in.addData(Seq((100L, t(30), docText(100L)))); q.processAllAvailable()
      in.addData(Seq((101L, t(40), docText(101L)))); q.processAllAvailable()
      in.addData(Seq((6L, t(35), same), (7L, t(35), same))); q.processAllAvailable()
      assert(emitted() === Set((0L, 1L), (6L, 7L)),
        s"post-expiry bucket did not resume cleanly: ${emitted()}")
    } finally q.stop()
  }
}
