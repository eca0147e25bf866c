package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dedup-layer behavior on corpora that actually contain duplicates: planted
  * exact/near duplicates must be found, and degenerate clone clusters must not
  * blow the bucket self-joins up to O(n²) (the 100 TB scale-killer flagged in
  * round 1 — exact dups pre-collapsed, buckets occupancy-capped).
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Deterministic word soup (seeded) of n tokens. */
  private def words(seed: Long, n: Int): String = {
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")
    val rnd = new java.util.Random(seed)
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  test("exact dedup groups: planted copies found with correct canonical/count") {
    val base = (0L until 40L).map(i => (i, words(i, 30)))
    val dups = (0L until 40L by 10L).map(i => (i + 1000L, words(i, 30)))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val groups = TextOps.exactDupGroups(docs).collect()
    assert(groups.length === 4)
    assert(groups.forall(_.getAs[Long]("cnt") === 2L))
    assert(groups.map(_.getAs[Long]("canonical_doc")).sorted.toSeq === Seq(0L, 10L, 20L, 30L))
  }

  test("minhash candidates: planted near-dups recalled; exact dups collapsed away") {
    val base = (0L until 60L).map(i => (i, words(i * 7 + 1, 60)))
    val near = (0L until 60L by 12L).map(i => (i + 2000L, words(i * 7 + 1, 60) + " extra trailer token appended here"))
    val exact = (0L until 60L by 15L).map(i => (i + 1000L, words(i * 7 + 1, 60)))
    val docs = (base ++ near ++ exact).toDF("doc_id", "text")
    val pairs = TextOps.minhashCandidatePairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every planted near-dup pair is a candidate (high jaccard ⇒ some band collides)
    val planted = (0L until 60L by 12L).map(i => (i, i + 2000L)).toSet
    val found = planted.intersect(pairs)
    assert(found.size >= (planted.size * 0.8).toInt, s"recall ${found.size}/${planted.size}")
    // exact duplicates are pre-collapsed: no candidate pair joins a doc to its copy
    val exactPairs = (0L until 60L by 15L).map(i => (i, i + 1000L)).toSet
    assert(pairs.intersect(exactPairs).isEmpty)
  }

  test("simhash candidates: planted near-dups recalled") {
    val base = (0L until 60L).map(i => (i, words(i * 13 + 5, 80)))
    val near = (0L until 60L by 12L).map(i => (i + 2000L, words(i * 13 + 5, 80) + " zz"))
    val docs = (base ++ near).toDF("doc_id", "text")
    val pairs = TextOps.simhashCandidatePairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 60L by 12L).map(i => (i, i + 2000L)).toSet
    assert(planted.intersect(pairs).size >= (planted.size * 0.8).toInt)
  }

  test("simhash repetition invariance: doubled text has Hamming distance 0 (always a candidate)") {
    // the q24 containment-oracle guarantee: SimHash is sign-invariant under
    // uniform token-count scaling, so text || ' ' || text hashes identically
    for (i <- 0L until 40L) {
      val t = words(i * 13 + 5, 20 + (i % 60).toInt)
      assert(TextOps.simhash(t) === TextOps.simhash(t + " " + t))
    }
    val base = (0L until 40L).map(i => (i, words(i * 13 + 5, 80)))
    val rep = (0L until 40L by 8L).map(i => (i + 3000L, { val t = words(i * 13 + 5, 80); t + " " + t }))
    val docs = (base ++ rep).toDF("doc_id", "text")
    val pairs = TextOps.simhashCandidatePairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 40L by 8L).map(i => (i, i + 3000L)).toSet
    assert(planted.subsetOf(pairs), s"missing ${planted -- pairs}") // recall 1.0, not a floor
  }

  test("bucket cap: a planted hot cluster produces bounded pairs and the join completes") {
    // 120 identical docs (one degenerate bucket pre-collapse would be 7140
    // pairs) + 100 docs of a near-clone family (mutual jaccard ≈ 1, all in the
    // same band buckets) + background docs
    val identical = (0L until 120L).map(i => (i, "the same boilerplate page content repeated verbatim across the crawl " * 3))
    val cloneFam = (1000L until 1100L).map(i => (i, words(42, 100) + s" tail$i"))
    val background = (5000L until 5040L).map(i => (i, words(i, 50)))
    val docs = (identical ++ cloneFam ++ background).toDF("doc_id", "text")
    // capped run: the 100-member clone family exceeds cap=20 in every band
    val capped = TextOps.minhashCandidatePairs(docs, bucketCap = 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // identical docs collapse to one representative → zero identical-pair output
    assert(!capped.exists { case (a, b) => a < 120 && b < 120 })
    // clone-family pairs are capped out (their buckets all exceed 20)
    val famPairs = capped.count { case (a, b) => a >= 1000 && a < 1100 && b >= 1000 && b < 1100 }
    assert(famPairs === 0, s"hot-bucket pairs leaked: $famPairs")
    // an uncapped run on the same input DOES produce the quadratic family —
    // the cap is what bounds it
    val uncapped = TextOps.minhashCandidatePairs(docs, bucketCap = 1000000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val famUncapped = uncapped.count { case (a, b) => a >= 1000 && a < 1100 && b >= 1000 && b < 1100 }
    assert(famUncapped > 4000, s"expected quadratic family without cap, got $famUncapped")
    // results on cold buckets are unchanged by the cap
    val coldCapped = capped.filter { case (a, b) => a >= 5000 && b >= 5000 }.toSet
    val coldUncapped = uncapped.filter { case (a, b) => a >= 5000 && b >= 5000 }.toSet
    assert(coldCapped === coldUncapped)
  }

  test("q43 oracle precondition: base embeddings are pairwise distinct at every sf") {
    // The q43 star-pair oracle is exact only if no two base vec_ids carry
    // byte-identical embeddings (a collision would make a different id the
    // identity-group canonical, so the planted (a, a+1e6) pair would emit as
    // (other, a)/(other, a+1e6) instead). Deterministic data ⇒ assert it.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/root/repo/.tmp/sf1")
      .filter(d => new java.io.File(s"$d/embeddings.parquet").exists())
    assume(dirs.nonEmpty, "fixture tables absent — precondition checked where they exist")
    for (d <- dirs) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val n = emb.count()
      val distinct = emb.select("embedding").distinct().count()
      assert(distinct === n, s"$d: $n rows but only $distinct distinct embeddings")
    }
  }

  test("embedding identity pairs are linear star pairs, exact at any bucketCap") {
    val dim = 8
    def vec(seed: Int): Array[Float] = {
      val r = new java.util.Random(seed)
      Array.fill(dim)(r.nextFloat() * 2 - 1)
    }
    val clones = (0L until 80L).map(i => (i, vec(7))) // identical embeddings
    val rest = (1000L until 1040L).map(i => (i, vec(i.toInt)))
    val emb = (clones ++ rest).toDF("vec_id", "embedding")
    // identity recall is structural: the 80-clone cluster emits exactly its
    // 79 canonical→member star pairs (cos 1.0) — linear, never O(n²) — and
    // the result is byte-identical whether the LSH buckets are saturated
    // (cap 10 « cluster 80) or unbounded. Before the identity/near split,
    // a saturated bucket silently dropped the cluster's own duplicate pairs
    // (the sf1-replay q43 failure).
    for (cap <- Seq(10, 1000000)) {
      val got = graft.sim.Ann.cosineNearDupPairs(emb, threshold = 0.9, bucketCap = cap)
        .filter("vec_a < 80 AND vec_b < 80").collect()
      assert(got.length === 79, s"cap=$cap: expected 79 star pairs, got ${got.length}")
      assert(got.forall(r => r.getLong(0) === 0L), "star pairs must come from the canonical (min) id")
      assert(got.forall(r => r.getDouble(2) === 1.0))
      assert(got.map(_.getLong(1)).toSet === (1L until 80L).toSet)
    }
  }

  test("groupedSizeSelect: groups are atomic, limit respected, strategies order correctly") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 100L).map(i => (i, 100L + (i % 7) * 50L)).toDF("doc_id", "n_chars")
    for (strategy <- Seq("ordered", "random", "smallest", "largest")) {
      val sel = TextOps.groupedSizeSelect(docs, "n_chars", floor(col("doc_id") / 10).cast("long"),
        strategy, 3000L).collect()
      // atomicity: every selected group is complete (10 members)
      val byGroup = sel.groupBy(_.getAs[Long]("grp")).view.mapValues(_.length).toMap
      assert(byGroup.values.forall(_ === 10), s"$strategy split a group: $byGroup")
      // the running group cumsum never exceeds the limit
      assert(sel.forall(_.getAs[Long]("grp_cum") <= 3000L))
      assert(sel.nonEmpty, s"$strategy selected nothing")
    }
    // smallest picks the lightest groups first; largest the heaviest
    def groupsOf(strategy: String): Set[Long] =
      TextOps.groupedSizeSelect(docs, "n_chars", floor(col("doc_id") / 10).cast("long"),
        strategy, 3000L).select("grp").distinct().as[Long].collect().toSet
    val sizes = docs.withColumn("g", floor(col("doc_id") / 10).cast("long"))
      .groupBy("g").agg(sum("n_chars").as("s")).as[(Long, Long)].collect().toMap
    val small = groupsOf("smallest"); val large = groupsOf("largest")
    assert(small.map(sizes).max <= (sizes.keySet -- small).map(sizes).min)
    assert(large.map(sizes).min >= (sizes.keySet -- large).map(sizes).max)
  }

  test("semDedup: derived centroid default scales ~sqrt(n) and bounds cluster-squared work") {
    import spark.implicits._
    val r = new java.util.Random(7L)
    val n = 900
    val emb = (0 until n).map(i =>
      (i.toLong, Array.fill(8)(r.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    // derived default (nCentroids <= 0) must produce a full-coverage answer...
    val kept = graft.sim.Ann.semDedup(emb, tau = 0.999)
    assert(kept.count() === n)
    // ...and the ~sqrt(n) centroid count bounds expected per-cluster size to
    // ~sqrt(n): assert sum(cluster^2) stays well under the single-cluster n^2
    // blowup the fixed-16 default would approach at scale
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val sizes = graft.sim.Ann.ivfBuild(emb, k).assigned
      .groupBy("ivf_cell").count().collect().map(_.getLong(1))
    val sumSq = sizes.map(s => s * s).sum
    assert(sumSq < n.toLong * n / 4,
      s"cluster-squared work $sumSq not bounded vs n^2=${n.toLong * n}")
  }

  test("semDedup: identical and positively-scaled clones drop, distinct bases survive") {
    val dim = 16
    def vec(seed: Int): Array[Float] = {
      val r = new java.util.Random(seed * 7919 + 13)
      Array.fill(dim)(r.nextFloat() * 2 - 1)
    }
    val bases = (0L until 60L).map(i => (i, vec(i.toInt)))
    val exact = (0L until 60L by 10L).map(i => (i + 1000L, vec(i.toInt)))
    val scaled = (5L until 60L by 10L).map(i => (i + 2000L, vec(i.toInt).map(_ * 4.0f)))
    val emb = (bases ++ exact ++ scaled).toDF("vec_id", "embedding")
    val kept = graft.sim.Ann.semDedup(emb, tau = 0.95, nCentroids = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept.size === 72)
    for (i <- 0L until 60L) assert(kept(i), s"base $i must survive")
    for (i <- 0L until 60L by 10L) assert(!kept(i + 1000L), s"exact clone of $i must drop")
    for (i <- 5L until 60L by 10L) assert(!kept(i + 2000L), s"scaled clone of $i must drop")
  }

  test("semDedup: power-of-two scaling assigns to the same cluster bit-for-bit") {
    // IEEE rounding commutes with exact 2^k factors, so cosine(2^k * v, c) ==
    // cosine(v, c) exactly — the doc claim semDedup's clone-dropping rests on
    val r = new java.util.Random(42)
    for (_ <- 0 until 200) {
      val v = Array.fill(32)(r.nextFloat() * 2 - 1)
      val c = Array.fill(32)(r.nextFloat() * 2 - 1).toSeq.map(_.toFloat)
      val s = math.pow(2, r.nextInt(7) - 3).toFloat // 2^-3 .. 2^3
      val a = graft.sim.Ann.cosine(v.toSeq, c)
      val b = graft.sim.Ann.cosine(v.map(_ * s).toSeq, c)
      assert(a === b, s"cosine not invariant under *$s")
    }
  }

  test("q79 oracle precondition: natural pairwise cosine stays far below tau=0.8 at every sf") {
    // The structural SemDeDup oracle ('all bases kept') is exact only while
    // no natural base pair reaches tau. Planted clones sit at ~1.0; assert
    // the margin on the real tables (brute force at the two gate scales).
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(s"$d/embeddings.parquet").exists())
    assume(dirs.nonEmpty, "fixture tables absent — precondition checked where they exist")
    for (d <- dirs) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
      val emb2 = emb.select(col("vec_a").as("vec_b"), col("e_a").as("e_b"))
      val maxCos = emb.join(emb2, col("vec_a") < col("vec_b"))
        .select(max(graft.functions.CosineSim(col("e_a"), col("e_b"))).as("m"))
        .collect().head.getDouble(0)
      assert(maxCos < 0.7, s"$d: natural max cosine $maxCos erodes the tau=0.8 margin")
    }
  }
}
