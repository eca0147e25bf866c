package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns a
  * dedup pipeline's candidate PAIRS into duplicate CLUSTERS (one canonical
  * document per component survives).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled with
  * itself; each round propagates the minimum label across edges; fixpoint in
  * O(component diameter) rounds. Distributed shape per round: one equi join
  * edges⋈labels + a partial-aggregating min — both shuffles on the node id,
  * so consecutive rounds reuse the same partitioning. Lineage is truncated
  * every round with an eager localCheckpoint (iterative self-joins otherwise
  * grow the plan exponentially — the classic iterative-Spark trap).
  */
object Components {

  /** @param edges (src, dst) long ids, undirected (either orientation).
    * @return (node, label) — label = min node id of the component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
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
