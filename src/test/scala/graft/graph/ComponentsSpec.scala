package graft.graph

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
      Components.connectedComponents(chain.toDF("src", "dst"), maxIter = 3).collect())
    assert(e.getMessage.contains("did not converge"))
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
