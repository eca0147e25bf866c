package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns a
  * dedup pipeline's candidate PAIRS into duplicate CLUSTERS (one canonical
  * document per component survives).
  *
  * Default algorithm (round 4): alternating large-star / small-star — the
  * published MapReduce connected-components scheme (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14; public algorithm) that
  * converges in O(log n) rounds regardless of component DIAMETER. A web-scale
  * near-dup graph has long transitive similarity chains; min-label propagation
  * (kept below for parity testing) needs O(diameter) driver-synchronized
  * rounds there, which is the wrong shape at 100 TB.
  *
  * Distributed shape per round: each star step is a groupBy(min) + same-key
  * equi join (both shuffle on the node id), the round's result is lazily
  * localCheckpoint'ed, and ONE action per round both materializes it and
  * computes a (count, hash-sum) convergence signature — no separate
  * convergence job. Signature equality is verified with an exact set
  * comparison before the loop exits, so a hash collision can only cost one
  * extra round, never a wrong answer.
  */
object Components {

  /** Large-star: every neighbor v > u links to min(N(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("nu"), least(col("mn"), col("u")).as("nv"))
      .filter(col("nu") =!= col("nv"))
      .select(col("nu").as("u"), col("nv").as("v"))
      .distinct()
  }

  /** Small-star: orient u > v; u and every smaller neighbor link to min(N⁻(u)). */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = or.groupBy("u").agg(min("v").as("mn"))
    or.join(mins, "u")
      .select(col("v").as("n"), col("mn").as("m"))
      .unionAll(mins.select(col("u").as("n"), col("mn").as("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Star iteration with the round count exposed (tests assert O(log n)). */
  private[graph] def starRounds(edges: DataFrame, maxIter: Int): (DataFrame, Int) = {
    var cur = edges.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    def signature(df: DataFrame): (Long, Long) = {
      // bit_xor: commutative/associative and overflow-free under ANSI mode
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(cur)
    var it = 0
    var converged = sig._1 == 0L
    while (!converged && it < maxIter) {
      // lazy checkpoint: the signature action below is the ONE job of the
      // round — it materializes the checkpoint blocks and computes the stats
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val nsig = signature(next)
      if (nsig == sig) {
        // exact verification (counts equal + next ⊆ cur ⇒ sets equal):
        // a colliding hash can cost this one extra job, never a wrong answer
        converged = next.exceptAll(cur).isEmpty
      }
      sig = nsig
      cur.unpersist(false)
      cur = next
      it += 1
    }
    if (!converged && sig._1 > 0L)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star rounds (raise maxIter)")
    (cur, it)
  }

  /** @param edges (src, dst) long ids, undirected (either orientation).
    * @return (node, label) — label = min node id of the component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val (stars, _) = starRounds(edges, maxIter)
    // at the fixpoint every edge is (node → component-min): labels are the
    // edges themselves plus a self-label per root
    val labeled = stars.select(col("u").as("node"), col("v").as("label"))
      .unionByName(stars.select(col("v").as("node"), col("v").as("label")))
      .distinct()
    // a node whose only incident edges are self-loops is filtered out of the
    // star iteration entirely — re-attach it with a self-label so the output
    // node set matches the input node set (and the min-label variant)
    val selfOnly = edges.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()
      .join(labeled.select("node"), Seq("node"), "left_anti")
    labeled.unionByName(selfOnly.withColumn("label", col("node")))
  }

  /** Iterative min-label propagation — O(component diameter) rounds; kept as
    * the parity reference for property tests (clone-star graphs converge in 2
    * rounds, where its per-round cost is lower than the star scheme's).
    */
  def connectedComponentsMinLabel(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // joined every round
    var labels = sym.select(explode(array(col("src"), col("dst"))).as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    try {
      while (changed > 0 && it < maxIter) {
        val prop = sym.join(labels.withColumnRenamed("node", "src").select("src", "label"), "src")
          .groupBy(col("dst").as("node")).agg(min("label").as("nlabel"))
        val next = labels.join(prop, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .localCheckpoint(true)
        changed = next.join(labels.select(col("node"), col("label").as("_old")), "node")
          .filter(col("label") =!= col("_old")).count()
        // only the newest generation is live: drop the superseded checkpoint
        // so long runs hold 2 generations of blocks, not O(rounds)
        labels.unpersist(false)
        labels = next
        it += 1
      }
    } finally sym.unpersist(false)
    // silently returning a half-propagated labeling would keep several
    // "canonical" docs per true duplicate cluster — fail loudly instead
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(component diameter exceeds maxIter; raise it)")
    labels
  }
}
