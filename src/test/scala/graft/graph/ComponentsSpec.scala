package graft.graph

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("connected components: chains, stars, singles-by-absence, orientation-free") {
    // component A: chain 10-11-12-13-14 (diameter 4, needs real propagation)
    // component B: star 20-{21,22,23} given in MIXED orientations
    // component C: pair 30-31; node 40 appears in no edge -> absent from output
    val edges = Seq(
      (11L, 10L), (11L, 12L), (13L, 12L), (13L, 14L),
      (20L, 21L), (22L, 20L), (20L, 23L),
      (31L, 30L)
    ).toDF("src", "dst")
    val got = Components.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("connected components: non-convergence fails loudly instead of returning split clusters") {
    val chain = (0L until 12L).map(i => (500L + i, 501L + i))
    val e = intercept[IllegalStateException](
      Components.connectedComponents(chain.toDF("src", "dst"), maxIter = 1).collect())
    assert(e.getMessage.contains("did not converge"))
    val e2 = intercept[IllegalStateException](
      Components.connectedComponentsMinLabel(chain.toDF("src", "dst"), maxIter = 3).collect())
    assert(e2.getMessage.contains("did not converge"))
  }

  test("star scheme ≡ min-label on chain/star/ring/random graphs (parity property)") {
    val rnd = new java.util.Random(4242)
    val graphs: Seq[Seq[(Long, Long)]] = Seq(
      (0L until 9L).map(i => (700L + i, 701L + i)),            // chain
      (1L to 8L).map(i => (800L, 800L + i)),                   // star
      (0L until 10L).map(i => (900L + i, 900L + (i + 1) % 10)), // ring
      Seq.fill(40)((1000L + rnd.nextInt(25), 1000L + rnd.nextInt(25))), // random multigraph, self-loops kept
      Seq((1100L, 1100L), (1101L, 1102L), (1102L, 1102L))      // self-loop-only node + loop inside a pair
    )
    for (g <- graphs) {
      val df = g.toDF("src", "dst")
      val a = Components.connectedComponents(df).as[(Long, Long)].collect().toMap
      val b = Components.connectedComponentsMinLabel(df).as[(Long, Long)].collect().toMap
      assert(a === b, s"star vs min-label disagreement on ${g.take(5)}...")
    }
  }

  test("chain of 1000 converges in O(log n) star rounds, not O(diameter)") {
    val chain = (0L until 999L).map(i => (5000L + i, 5001L + i))
    val (stars, rounds) = Components.starRounds(chain.toDF("src", "dst"), maxIter = 50)
    // diameter is 999; log2(1000) ≈ 10 — the alternation must land well under
    // any diameter-proportional count
    assert(rounds <= 20, s"took $rounds rounds")
    val labels = stars.select(col("u").as("node"), col("v").as("label"))
      .unionByName(stars.select(col("v").as("node"), col("v").as("label")))
      .distinct().as[(Long, Long)].collect()
    assert(labels.length === 1000)
    assert(labels.forall(_._2 === 5000L))
  }

  test("self-loop-only nodes keep a self-label (match the min-label variant)") {
    // node 60 has ONLY a self-loop; node 71 has a self-loop plus a real edge
    val edges = Seq((60L, 60L), (70L, 71L), (71L, 71L)).toDF("src", "dst")
    val got = Components.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got === Map(60L -> 60L, 70L -> 70L, 71L -> 70L))
  }

  test("connected components: two big rings merge to their min label") {
    // ring of 60 nodes (diameter 30): stresses iteration count over maxIter default
    val ring = (0L until 60L).map(i => (100L + i, 100L + (i + 1) % 60))
    val got = Components.connectedComponents(ring.toDF("src", "dst"), maxIter = 40)
      .as[(Long, Long)].collect()
    assert(got.length === 60)
    assert(got.forall(_._2 === 100L))
  }
}
