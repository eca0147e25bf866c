package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextOps

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (probe set broadcast; one
  * narrow pass over the corpus + a top-k per probe). The LSH-bucketed variant
  * (random-hyperplane signs with deterministic planes) is the 100 TB scale
  * path: candidates come only from matching sign-buckets.
  */
object Ann {

  /** Sequential-order dot/cosine (accumulation order fixed = index order, so
    * results are reproducible across partitionings).
    */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) => cosine(a, b))

  /** Exact top-k neighbors for each probe (brute force; probes broadcast). */
  def cosineTopK(vectors: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val pairs = vectors.select(col("vec_id").as("nid"), col("embedding").as("v"))
      .join(broadcast(probes.select(col("vec_id").as("pid"), col("embedding").as("p"))),
        col("pid") =!= col("nid"))
      .withColumn("cos", graft.functions.CosineSim(col("p"), col("v")))
    val w = Window.partitionBy("pid").orderBy(col("cos").desc, col("nid").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("pid", "rank", "nid", "cos")
  }

  /** Deterministic hyperplane component for (plane j, dim i): a fixed hash folded
    * into [-1,1]. No Math.random — reproducible across runs and executors.
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = TextOps.fnv1a(s"ann-plane-$plane-$dim")
    (h & 0xffffffffL).toDouble / 0x7fffffffL.toDouble - 1.0
  }

  // plane components cached per plane (extended on demand to the widest
  // embedding seen): the old path re-derived fnv1a("ann-plane-j-i") — a
  // string build + hash — per COMPONENT per VECTOR, ~256 string hashes per
  // row at 32 planes × 8 dims on every ANN/SemDeDup/streaming-LSH scan
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def planeRow(plane: Int, dims: Int): Array[Double] = {
    val cur = planeCache.get(plane)
    if (cur != null && cur.length >= dims) cur
    else planeCache.compute(plane, (_, old) =>
      if (old != null && old.length >= dims) old
      else Array.tabulate(dims)(i => planeComponent(plane, i)))
  }

  def signBits(v: Seq[Float], numPlanes: Int): Long = {
    var bits = 0L
    var j = 0
    while (j < numPlanes) {
      val row = planeRow(j, v.length)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * row(i); i += 1 }
      if (dot > 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  val signBitsUdf = udf((v: Seq[Float], planes: Int) => signBits(v, planes))

  /** Embedding-cosine near-duplicate pairs, in two structurally different
    * halves (mirroring `TextOps.minhashCandidatePairs`' exact-dup collapse):
    *
    *  1. **Identity pairs are exact, not probabilistic.** Byte-identical
    *     embeddings are grouped (hash aggregation keyed on the vector itself
    *     — no hash-collision risk) and each group emits canonical→member
    *     *star* pairs at cos 1.0: linear in group size, so a mass-duplicated
    *     embedding (boilerplate images, empty docs) can neither blow up
    *     O(n²) nor lose its own duplicate pairs. Before this split, identity
    *     recall depended on LSH bucket survival — at 10× the gate scale, hot
    *     clusters overflowed `bucketCap` and over half the planted identical
    *     pairs vanished (caught by the sf1 oracle replay).
    *  2. **Near-dup candidates come from LSH sign-buckets over one
    *     representative per identity group** (occupancy-capped — a bucket
    *     above `bucketCap` is a degenerate near-clone cluster whose pair
    *     count grows quadratically; the cap now gates only approximate
    *     near-dup recall, never identity recall), exact cosine re-check
    *     against the threshold. Embeddings are joined back AFTER pair dedup,
    *     so the bucket shuffle carries only ids — never the vectors, and
    *     never the corpus cross product.
    *
    * The halves are disjoint by construction: a non-canonical member never
    * reaches the LSH side, and two distinct representatives are never
    * byte-identical.
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
                         tables: Int = 4, bitsPerTable: Int = 8,
                         bucketCap: Int = 1000): DataFrame = {
    val numPlanes = tables * bitsPerTable
    // identity half: group on the vector value, star from the min id
    val canon = vectors.groupBy(col("embedding"))
      .agg(min("vec_id").as("_canon"))
    val idPairs = vectors.join(canon, Seq("embedding"))
      .filter(col("vec_id") =!= col("_canon"))
      .select(col("_canon").as("vec_a"), col("vec_id").as("vec_b"),
        lit(1.0).as("cos"))
    // near-dup half: LSH over one representative per identity group
    val reps = vectors
      .join(canon.select(col("_canon").as("vec_id")), Seq("vec_id"), "left_semi")
    val withBits = reps.select(col("vec_id"),
      signBitsUdf(col("embedding"), lit(numPlanes)).as("_bits"))
    val buckets = withBits.select(col("vec_id"),
      posexplode(array((0 until tables).map(t =>
        shiftrightunsigned(col("_bits"), t * bitsPerTable)
          .bitwiseAND(lit((1L << bitsPerTable) - 1))): _*)).as(Seq("_table", "_bucket")))
    val sizes = buckets.groupBy("_table", "_bucket").agg(count(lit(1)).as("_bucket_n"))
    val kept = buckets.join(sizes.filter(col("_bucket_n") <= bucketCap), Seq("_table", "_bucket"))
      .drop("_bucket_n")
    val l = kept.select(col("_table"), col("_bucket"), col("vec_id").as("vec_a"))
    val r = kept.select(col("_table"), col("_bucket"), col("vec_id").as("vec_b"))
    val pairs = l.join(r, Seq("_table", "_bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .dropDuplicates("vec_a", "vec_b")
    pairs
      .join(vectors.select(col("vec_id").as("vec_a"), col("embedding").as("e_a")), Seq("vec_a"))
      .join(vectors.select(col("vec_id").as("vec_b"), col("embedding").as("e_b")), Seq("vec_b"))
      .withColumn("cos", graft.functions.CosineSim(col("e_a"), col("e_b")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
      .unionByName(idPairs)
  }

  /** IVF coarse-quantizer index: the driver-side centroid list plus the
    * cell-assigned corpus. Splitting index BUILD from query time matters at
    * scale: the corpus count + centroid collect + assignment pass happen ONCE
    * per corpus (and the assigned index would be persisted partitioned by
    * `ivf_cell`, so a probe's scan reads nProbe/nCentroids of the data);
    * queries never re-derive any of it.
    */
  final case class IvfIndex(centroids: Array[(Int, Seq[Float])], assigned: DataFrame)

  /** Build the IVF index: a coarse quantizer partitions the corpus into
    * `nCentroids` cells. Centroids are a tiny driver-side list (broadcast via
    * closure), chosen deterministically (every corpus/nCentroids-th vector by
    * id — a seeded-sample stand-in for k-means training); cell assignment is
    * one narrow pass over the corpus.
    */
  def ivfBuild(vectors: DataFrame, nCentroids: Int = 16): IvfIndex = {
    val n = vectors.count()
    val stride = math.max(1L, n / nCentroids)
    val cents: Array[(Int, Seq[Float])] = vectors
      .filter(col("vec_id") % stride === 0).orderBy("vec_id").limit(nCentroids)
      .select("embedding").collect()
      .map(_.getSeq[Float](0)).zipWithIndex.map { case (v, i) => (i, v) }
    val assignUdf = udf((v: Seq[Float]) =>
      cents.maxBy { case (_, c) => cosine(v, c) }._1)
    IvfIndex(cents, vectors.select(col("vec_id").as("nid"), col("embedding").as("v"),
      assignUdf(col("embedding")).as("ivf_cell")))
  }

  /** Query an IVF index: each probe searches only its `nProbe` nearest cells
    * (an equi-join on cell id — the corpus is never cross-joined), with exact
    * cosine re-rank inside the candidate set.
    */
  def ivfQuery(index: IvfIndex, probes: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val cents = index.centroids
    val probeCellsUdf = udf((v: Seq[Float]) =>
      cents.sortBy { case (i, c) => (-cosine(v, c), i) }.take(nProbe).map(_._1))
    val probeCells = probes.select(col("vec_id").as("pid"), col("embedding").as("p"),
      explode(probeCellsUdf(col("embedding"))).as("ivf_cell"))
    val cand = index.assigned.join(broadcast(probeCells), Seq("ivf_cell"))
      .filter(col("pid") =!= col("nid"))
      .withColumn("cos", graft.functions.CosineSim(col("p"), col("v")))
    val w = Window.partitionBy("pid").orderBy(col("cos").desc, col("nid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("pid", "rank", "nid", "cos")
  }

  /** IVF ANN, build + query composed (the one-shot convenience form). */
  def ivfTopK(vectors: DataFrame, probes: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
    ivfQuery(ivfBuild(vectors, nCentroids), probes, k, nProbe)

  /** SemDeDup (Abbas et al. 2023, public): semantic deduplication via a
    * coarse quantizer. Embeddings are clustered with the IVF build's
    * cosine-based assignment (direction-only, so a vector and any positive
    * scaling of it land in the same cluster — power-of-two scalings assign
    * bit-identically because IEEE rounding commutes with exact 2^k factors),
    * then within each cluster a vector is DROPPED when an earlier (lower-id)
    * cluster-mate sits within the cosine-`tau` ball. "Earlier-similar
    * dominates" is the order-free distributed variant of the paper's
    * keep-one-per-ball greedy scan: one within-cluster self-join + one
    * id-only aggregation, no sequential pass over cluster members (the two
    * variants agree whenever similarity is transitive inside the ball, which
    * holds for the clone/near-clone clusters the operator exists to kill).
    *
    * Output: (vec_id, kept) for EVERY input vector.
    *
    * Scale shape: the self-join is per-cluster (never the corpus cross
    * product) and costs Σ cluster² — the published SemDeDup cost — so
    * `nCentroids` must grow ~√n with the corpus; pairs carry ids + the two
    * vectors only inside one codegen'd cosine filter, and the dominated set
    * is an id-only distinct.
    */
  def semDedup(vectors: DataFrame, tau: Double, nCentroids: Int = 0): DataFrame = {
    // nCentroids ≤ 0 derives ~√n from a cheap count (one column-pruned scan):
    // the Σ cluster² self-join cost is then ~n·(n/√n)/√n = O(n) expected —
    // the scale guidance the doc promised but nothing enforced. Callers with
    // an explicit value (q79's oracle-pinned 16) are unchanged.
    val k =
      if (nCentroids > 0) nCentroids
      else {
        val n = vectors.count()
        math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
      }
    val assigned = ivfBuild(vectors, k).assigned // nid, v, ivf_cell
    val l = assigned.select(col("ivf_cell"), col("nid").as("vec_a"), col("v").as("e_a"))
    val r = assigned.select(col("ivf_cell"), col("nid").as("vec_b"), col("v").as("e_b"))
    val dominated = l.join(r, Seq("ivf_cell"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(graft.functions.CosineSim(col("e_a"), col("e_b")) >= tau)
      .select(col("vec_b").as("vec_id")).distinct()
    vectors.select(col("vec_id"))
      .join(dominated.withColumn("_dom", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), not(coalesce(col("_dom"), lit(false))).as("kept"))
  }

  /** LSH-bucketed ANN: candidates share at least one of `tables` sign-bucket
    * keys (each key = `bitsPerTable` hyperplane signs); exact cosine re-rank
    * inside the candidate set. `multiprobe` ≥ 1 additionally probes every
    * Hamming-1 neighbor bucket, ≥ 2 every Hamming-2 neighbor — PROBE-side
    * only, so the corpus index stays one bucket per table (the standard
    * multiprobe trade: ×(1+bits+C(bits,2)) probe lookups buy large recall
    * with zero index growth; at 8 bits that's 37 lookups/table, recall
    * ~0.6 → ~0.8 on structureless random vectors).
    */
  def lshTopK(vectors: DataFrame, probes: DataFrame, k: Int,
              tables: Int = 4, bitsPerTable: Int = 8, multiprobe: Int = 2): DataFrame = {
    val numPlanes = tables * bitsPerTable
    def withBuckets(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(col("vec_id").as(idCol), col("embedding").as(vecCol),
          signBitsUdf(col("embedding"), lit(numPlanes)).as("_bits"))
        .select(col(idCol), col(vecCol),
          posexplode(array((0 until tables).map(t =>
            shiftrightunsigned(col("_bits"), t * bitsPerTable)
              .bitwiseAND(lit((1L << bitsPerTable) - 1))): _*)).as(Seq("_table", "_bucket")))
    val flipUdf = udf((bucket: Long) => {
      val out = scala.collection.mutable.ArrayBuffer(bucket)
      if (multiprobe >= 1)
        for (i <- 0 until bitsPerTable) out += bucket ^ (1L << i)
      if (multiprobe >= 2)
        for (i <- 0 until bitsPerTable; j <- i + 1 until bitsPerTable)
          out += bucket ^ (1L << i) ^ (1L << j)
      out.toArray
    })
    val v = withBuckets(vectors, "nid", "v")
    val p = withBuckets(probes, "pid", "p")
      .withColumn("_bucket", explode(flipUdf(col("_bucket"))))
    // score per bucket collision, then hash-aggregate by (pid, nid): a
    // dropDuplicates carrying both embedding arrays would fall back to
    // SortAggregate (array agg buffers aren't hash-mutable) — a full sort of
    // the candidate set; cos is identical across a pair's collisions so
    // max() is exact, and the double-typed buffer keeps the agg hash-based
    // with map-side partials
    val cand = v.join(broadcast(p), Seq("_table", "_bucket"))
      .filter(col("pid") =!= col("nid"))
      .withColumn("cos", graft.functions.CosineSim(col("p"), col("v")))
      .groupBy("pid", "nid").agg(max("cos").as("cos"))
    val w = Window.partitionBy("pid").orderBy(col("cos").desc, col("nid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("pid", "rank", "nid", "cos")
  }
}
