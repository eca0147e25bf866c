package graft.join

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin.asofBackward vs a brute-force per-row maximum — the union+window
  * shape must be semantics-invisible, including tie and no-match cases.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward matches brute-force latest-at-or-before on a deterministic random set") {
    import spark.implicits._
    // deterministic pseudo-random rows: 3 keys, 40 left + 25 right rows with
    // colliding and interleaved timestamps (i*7%50 vs j*11%50 share values)
    val left = (0 until 40).map { i =>
      (i.toLong, i % 3L, ts(f"2020-01-01 00:${i * 7 % 50}%02d:00"))
    }.toDF("event_id", "k", "ts")
    val right = (0 until 25).map { j =>
      (j % 3L, ts(f"2020-01-01 00:${j * 11 % 50}%02d:00"), j * 1.5)
    }.toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max("v").as("v"))

    val got = AsOfJoin.asofBackward(left, right, key = "k", ts = "ts")
      .select("event_id", "ts_right", "v")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2)))).sortBy(_._1)

    val rRows = right.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val expected = left.collect().map { l =>
      val (id, k, t) = (l.getLong(0), l.getLong(1), l.getTimestamp(2))
      val best = rRows.filter(r => r._1 == k && !r._2.after(t)).sortBy(_._2.getTime).lastOption
      (id, best.map(_._2), best.map(_._3: Any))
    }.sortBy(_._1)

    assert(got.toList === expected.toList)
    // sanity: both matched and unmatched (null) rows occur
    assert(got.exists(_._2.isEmpty) && got.exists(_._2.nonEmpty))
  }

  test("equal timestamps: a right row at exactly left.ts is visible (ts >= right.ts)") {
    import spark.implicits._
    val left = Seq((1L, 0L, ts("2020-01-01 10:00:00"))).toDF("event_id", "k", "ts")
    val right = Seq((0L, ts("2020-01-01 10:00:00"), 42.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "ts").select("v").collect()
    assert(out.map(_.getDouble(0)).toList === List(42.0))
  }

  test("a matched right row with a NULL payload yields NULL, never an older row's value") {
    import spark.implicits._
    // right rows: (t1, v=5.0) then (t2, v=NULL); the t2 row IS the match for
    // a left row at t3 — per-column ignoreNulls carries would stitch
    // (ts=t2, v=5.0), a row that never existed (SQL asof returns v=NULL)
    val left = Seq((1L, 0L, ts("2020-01-01 12:00:00"))).toDF("event_id", "k", "ts")
    val right = Seq(
      (0L, ts("2020-01-01 10:00:00"), Some(5.0)),
      (0L, ts("2020-01-01 11:00:00"), None: Option[Double])
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "ts")
      .select("ts_right", "v").collect().head
    assert(out.getTimestamp(0) === ts("2020-01-01 11:00:00"))
    assert(out.isNullAt(1), "NULL payload of the matched row must survive as NULL")
  }

  test("null keys and timestamps follow SQL asof semantics: never match, left rows kept") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(0L), Some(ts("2020-01-01 12:00:00"))), // normal: matches
      (2L, None: Option[Long], Some(ts("2020-01-01 12:00:00"))), // null key: no match
      (3L, Some(0L), None: Option[java.sql.Timestamp]) // null ts: no match
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (Some(0L), Some(ts("2020-01-01 10:00:00")), 1.0),
      (None: Option[Long], Some(ts("2020-01-01 09:00:00")), 2.0), // null key right: inert
      (Some(0L), None: Option[java.sql.Timestamp], 3.0) // null ts right: inert
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "ts")
      .select("event_id", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("payload column collision is rejected") {
    import spark.implicits._
    val left = Seq((1L, 0L, ts("2020-01-01 10:00:00"))).toDF("v", "k", "ts")
    val right = Seq((0L, ts("2020-01-01 09:00:00"), 1.0)).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(left, right, "k", "ts")
    }
    assert(e.getMessage.contains("collide"))
  }
}
