package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** JaccardJoin: the prefix-filter stage must be output-invisible (exact
  * brute-force parity for any partitioning) and the integer threshold must
  * keep exact-boundary ties.
  */
class JaccardJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def shingles(text: String): Set[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(3)
      .filter(_.length == 3).map(_.mkString(" ")).toSet

  private def brute(docs: Seq[(Long, String)], num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    val sh = docs.map { case (id, t) => (id, shingles(t)) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      i = (sa & sb).size.toLong; u = (sa | sb).size.toLong
      if i * den >= u * num
    } yield (a, b, i, u)).toSet
  }

  private def run(docs: Seq[(Long, String)], num: Int, den: Int, parts: Int): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text").repartition(parts)
    JaccardJoin.jaccardJoin(df, num, den).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("brute-force parity on a deterministic random corpus, any partitioning") {
    // 120 docs of 8-14 tokens over a 25-word vocab — enough shingle collisions
    // to exercise candidates, verify, and rejection
    val vocab = (0 until 25).map(i => s"w$i")
    val docs = (0 until 120).map { i =>
      val n = 8 + (i * 7) % 7
      val toks = (0 until n).map(j => vocab((i * 31 + j * 17) % 25))
      (i.toLong, toks.mkString(" "))
    } ++ Seq( // planted near pair: one-token trailer
      (500L, (0 until 12).map(j => vocab(j % 25)).mkString(" ")),
      (501L, ((0 until 12).map(j => vocab(j % 25)) :+ "zzz").mkString(" ")))
    val expected = brute(docs, 4, 5)
    for (parts <- Seq(1, 4, 8))
      assert(run(docs, 4, 5, parts) === expected, s"parts=$parts")
    assert(expected.exists(p => p._1 == 500L && p._2 == 501L), "planted pair must qualify")
    assert(expected.nonEmpty)
  }

  test("exact-boundary tie J = 4/5 is kept; just below is dropped") {
    // distinct-token docs so shingle counts are exact: A has 8 shingles,
    // B = A + 2 tokens shares all 8 and adds 2 (i=8, u=10 -> J=0.8 exactly);
    // C = A + 3 tokens gives i=8, u=11 -> J<0.8
    val base = (0 until 10).map(i => s"t$i")
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, (base ++ Seq("x1", "x2")).mkString(" ")),
      (3L, (base ++ Seq("y1", "y2", "y3")).mkString(" ")))
    val got = run(docs, 4, 5, 2)
    assert(got.contains((1L, 2L, 8L, 10L)), s"boundary tie missing: $got")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L), s"sub-threshold pair kept: $got")
    assert(got === brute(docs, 4, 5))
  }

  test("sub-3-token docs never pair; empty input yields empty output") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, ""))
    assert(run(docs, 4, 5, 2).isEmpty)
    assert(run(Seq.empty, 4, 5, 1).isEmpty)
  }
}
