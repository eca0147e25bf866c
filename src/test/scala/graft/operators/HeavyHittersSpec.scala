package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HeavyHitters: the Misra–Gries candidate stage must be output-invisible —
  * the result always equals the exact groupBy answer, for any partitioning
  * and any k, including k far below the distinct-key count (decrement churn).
  */
class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def exact(keys: Seq[Long], k: Int): Set[(Long, Long)] = {
    val n = keys.size.toLong
    keys.groupBy(identity).map { case (key, v) => (key, v.size.toLong) }
      .filter { case (_, c) => c * (k + 1) > n }.toSet
  }

  private def run(keys: Seq[Long], k: Int, parts: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = keys.toDF("key").repartition(parts)
    HeavyHitters.heavyHitters(df, col("key"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("equals the exact answer with a planted hot key (k below distinct count)") {
    // 1000 rows: 300 copies of key 7 (30 %), the rest spread over 70 keys —
    // k=8 counters vs 71 distinct keys forces heavy decrement churn
    val keys = Seq.fill(300)(7L) ++ (0 until 700).map(i => 100L + i % 70)
    for (parts <- Seq(1, 3, 8)) {
      val k = 8
      assert(run(keys, k, parts) === exact(keys, k), s"parts=$parts")
    }
    assert(exact(keys, 8).map(_._1) === Set(7L)) // the planted key, nothing else
  }

  test("near-uniform input with no qualifying key returns empty (not false positives)") {
    val keys = (0 until 900).map(i => (i % 30).toLong) // every key exactly 3.3%
    assert(run(keys, 20, 4) === exact(keys, 20))
    assert(exact(keys, 20).isEmpty)
  }

  test("all keys qualify when k exceeds the distinct count") {
    val keys = (0 until 90).map(i => (i % 3).toLong) // 3 keys, 33% each
    assert(run(keys, 50, 2) === exact(keys, 50))
    assert(exact(keys, 50).size === 3)
  }

  test("adversarial ordering: hot key arrives last, after counters are saturated") {
    val keys = (0 until 800).map(i => 100L + i % 60) ++ Seq.fill(400)(7L)
    val k = 10
    assert(run(keys, k, 1) === exact(keys, k)) // single partition = worst case for MG state
    assert(exact(keys, k).map(_._1) === Set(7L))
  }

  test("null keys are ignored; empty input yields empty output") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(1L), None, Some(1L), None).toDF("key")
    val out = HeavyHitters.heavyHitters(df, col("key"), 5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList === List((1L, 2L, 2L)))
    val empty = HeavyHitters.heavyHitters(Seq.empty[Long].toDF("key"), col("key"), 5)
    assert(empty.collect().isEmpty)
  }
}
