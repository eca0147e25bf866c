package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end chained streaming dedup pipeline — the three-stage shape a real
  * corpus ingest runs, as three SEPARATE streaming queries handing off through
  * file sinks (Structured Streaming rejects a second stateful operator behind
  * flatMapGroupsWithState in one query, so the stage boundary IS the design):
  *
  *   stage 1  StreamingDedup.dedupStream      exact dedup (first-seen wins)
  *   stage 2  StreamingLsh.minhashCandidatePairs   per-bucket LSH state
  *   stage 3  dropDuplicatesWithinWatermark(doc_a, doc_b)  cross-band dedup
  *
  * Parity: the final pair set must equal batch q23's candidate pipeline
  * (collapse exact dups, then TextOps.minhashCandidatePairs) over the same
  * corpus — including a pair split across micro-batches and an exact
  * duplicate that stage 1 must swallow before LSH ever sees it.
  */
class StreamingPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docText(i: Long): String = (0 until 40).map(j => s"t${i}_$j").mkString(" ")
  private def nearText(i: Long): String =
    ((0 until 39).map(j => s"t${i}_$j") :+ "CHANGED").mkString(" ")
  private def t(m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("chained dedup -> LSH -> cross-band pair-dedup: three queries, batch q23 parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft_chain_").toString
    val (dedupDir, pairDir) = (s"$root/deduped", s"$root/pairs")

    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")

    val q1 = streaming.StreamingDedup.dedupStream(docs, "ts", "10 minutes")
      .writeStream.outputMode("append").format("parquet")
      .option("path", dedupDir).option("checkpointLocation", s"$root/cp1").start()

    val dedupSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType), StructField("content_hash", StringType)))
    val q2 = streaming.StreamingLsh.minhashCandidatePairs(
        spark.readStream.schema(dedupSchema).parquet(dedupDir), "ts", "10 minutes")
      .toDF()
      .writeStream.outputMode("append").format("parquet")
      .option("path", pairDir).option("checkpointLocation", s"$root/cp2").start()

    val pairSchema = StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType),
      StructField("est_jaccard", DoubleType), StructField("ts", TimestampType)))
    val q3 = spark.readStream.schema(pairSchema).parquet(pairDir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
      .writeStream.outputMode("append").format("memory").queryName("chain_out").start()

    def drain(): Unit = { q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable() }

    try {
      // batch 1: base docs 0-9
      in.addData((0L until 10L).map(i => (i, t(0), docText(i))))
      // batch 2: an EXACT duplicate of doc 0 (stage 1 must swallow it — the
      // (0,50) pair must never exist) plus the near clone of doc 7
      in.addData(Seq((50L, t(2), docText(0L)), (1007L, t(2), nearText(7L))))
      // batch 3: near clone of doc 3 — pairs against stage-2 state from batch 1
      in.addData(Seq((1003L, t(4), nearText(3L))))
      drain(); drain() // second sweep: files written by qN are input to qN+1

      val streamed = spark.table("chain_out")
        .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("j"))
        .as[(Long, Long, Double)].collect()

      // stage 3 really deduped: the raw pair stream has one row per sharing
      // band (near-identical docs share many of the 16 bands), the final
      // table exactly one row per pair
      val raw = spark.read.schema(pairSchema).parquet(pairDir)
      assert(raw.count() > streamed.length,
        s"cross-band dedup had nothing to do: raw=${raw.count()} final=${streamed.length}")
      assert(streamed.length === streamed.toSet.size, "duplicate pairs survived stage 3")

      // batch q23 parity: first-seen exact-dup collapse, then the batch LSH op
      val corpus = ((0L until 10L).map(i => (i, docText(i)))
        ++ Seq((50L, docText(0L)), (1007L, nearText(7L)), (1003L, nearText(3L)))).toDF("doc_id", "text")
      val collapsed = corpus.withColumn("content_hash", md5(to_binary(col("text"), lit("utf-8"))))
        .groupBy("content_hash").agg(min("doc_id").as("doc_id"), first("text").as("text"))
      val batch = graft.text.TextOps.minhashCandidatePairs(collapsed)
        .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("j"))
        .as[(Long, Long, Double)].collect().toSet
      assert(batch.exists(p => p._1 == 3L && p._2 == 1003L), "batch side lost the planted pair")
      assert(streamed.toSet === batch,
        s"parity broke: stream-only=${streamed.toSet -- batch}, batch-only=${batch -- streamed.toSet}")
      assert(!streamed.exists(p => p._1 == 0L && p._2 == 50L),
        "exact duplicate leaked past stage 1 into a pair")
    } finally { q1.stop(); q2.stop(); q3.stop() }
  }
}
