package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed cardinality sketches for corpus statistics.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002) rather than HLL: the sketch
  * is just the k smallest hash values of the distinct keys, so it is exactly
  * reproducible by any engine that shares the hash function — an external
  * oracle can recompute the whole sketch with plain SQL, which HLL's
  * register-merge layout does not allow. Accuracy is the standard
  * ~1/√(k−2) relative error.
  */
object Sketches {

  /** 2^52 — the hash-prefix space of 13 hex digits: big enough to make ties
    * astronomically unlikely, small enough that the prefix integer (< 2^52)
    * and the estimator arithmetic stay EXACT in both long and double, so a
    * SQL oracle reproduces the estimate bit-for-bit.
    */
  val PrefixSpace: Double = 4503599627370496.0

  /** Per-group KMV distinct-count sketch of `key`.
    *
    * Output per group: `n_minima` (= min(k, true distinct)), `kth_hash`
    * (max of the retained minima, hex md5 — the serialized sketch), and
    * `est_distinct`: exact when the group has fewer than k distinct keys,
    * else the KMV estimator (k−1)/frac(kth) with frac taken from the first
    * 13 hex digits.
    *
    * Scale shape: one hash-distinct shuffle on (group, 128-bit hash) with
    * map-side partials, then a rank-k window that Spark 4 rewrites to
    * WindowGroupLimit — a per-partition top-k BEFORE the exchange, so the
    * sort never sees more than k·partitions rows per group. The sketch rows
    * themselves are k per group — mergeable downstream by re-taking the k
    * minima of a union (the KMV merge rule).
    */
  def kmvDistinct(df: DataFrame, key: Column, group: Column, k: Int = 32): DataFrame =
    kmvFinish(kmvMinima(df, key, group, k), k)

  /** The serialized sketch itself: one row per retained minimum,
    * `(grp, _h)` — the k smallest md5 values of the group's distinct keys.
    * This is the shard-local artifact a 100 TB pipeline persists: sketches
    * of disjoint shards MERGE with `kmvMerge` (union the minima ROWS — which
    * are already hashes, never re-hash them — and re-take the k smallest),
    * and `kmvFinish` turns any such merge back into estimates. Exactness of
    * the merge is the KMV theorem: the k smallest over a union of per-shard
    * k-smallest sets equals the k smallest over the union of the raw sets.
    * NULL keys are excluded (COUNT DISTINCT semantics; also keeps the rank
    * identical to an ORDER BY in engines that sort NULLs last).
    */
  def kmvMinima(df: DataFrame, key: Column, group: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df.filter(key.isNotNull).select(group.as("grp"),
      md5(to_binary(key, lit("utf-8"))).as("_h")).distinct()
    val w = Window.partitionBy("grp").orderBy("_h")
    hashed.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("grp", "_h")
  }

  /** Merge previously-computed sketch rows (`(grp, _h)` from `kmvMinima`,
    * possibly from many shards, possibly with duplicate hashes) into the
    * canonical k-minima sketch of the union. Pure sketch-space: never
    * touches raw keys, so merging S shards costs O(S·k) rows per group.
    */
  def kmvMerge(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val w = Window.partitionBy("grp").orderBy("_h")
    sketches.select("grp", "_h").distinct()
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("grp", "_h")
  }

  /** Deterministic sampled quantiles: the portable way to report value
    * distributions (doc lengths, quality scores) over an arbitrarily large
    * corpus. Rows enter the sample by a lexicographic md5-prefix threshold on
    * a salted row id — the same seeded-sample idiom as stratified sampling
    * (q56): any engine sharing the hash draws the IDENTICAL sample, so the
    * quantiles are exactly reproducible, unlike percentile_approx sketches
    * whose merge order is engine-internal. Quantiles are percentile_disc
    * (the sample element at rank ceil(p·n), ties broken by the hash), so no
    * interpolation arithmetic enters the contract.
    *
    * Output: (grp, p, q_value, n_sample) — one row per group × prob, absent
    * for groups with an empty sample.
    *
    * Scale shape: the threshold prunes BEFORE the shuffle (a narrow filter on
    * a codegen'd md5), so the per-group window sort sees only the sample —
    * `thresholdHex` is the knob that bounds the sorted set at any corpus
    * size. Accuracy is the standard sampling error ~1/√(p(1−p)·n_sample).
    */
  def sampledQuantiles(df: DataFrame, value: Column, group: Column, id: Column,
                       salt: String, thresholdHex: String,
                       probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      s"probs must lie in (0, 1], got $probs")
    require(thresholdHex.nonEmpty && thresholdHex.forall("0123456789abcdef".contains(_)),
      s"thresholdHex must be lowercase hex, got '$thresholdHex'")
    val sampled = df
      .select(group.as("grp"), value.cast("long").as("_v"),
        md5(concat(lit(s"$salt:"), id)).as("_hk"))
      .filter(col("_v").isNotNull &&
        substring(col("_hk"), 1, thresholdHex.length) < lit(thresholdHex))
    val byGrp = Window.partitionBy("grp")
    val ranked = sampled
      .withColumn("_rn", row_number().over(byGrp.orderBy(col("_v"), col("_hk"))))
      .withColumn("_n", count(lit(1)).over(byGrp))
    ranked.withColumn("p", explode(array(probs.map(lit): _*)))
      .filter(col("_rn") === ceil(col("p") * col("_n")).cast("long"))
      .select(col("grp"), col("p"), col("_v").as("q_value"),
        col("_n").cast("long").as("n_sample"))
  }

  /** Estimator over sketch rows: exact below k minima, else (k−1)/frac(kth)
    * with frac read from the first 13 hex digits (exact in double).
    */
  def kmvFinish(minima: DataFrame, k: Int): DataFrame =
    minima.groupBy("grp")
      .agg(count(lit(1)).as("n_minima"), max("_h").as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_minima") < k, col("n_minima").cast("double"))
          .otherwise(lit((k - 1).toDouble * PrefixSpace) /
            conv(substring(col("kth_hash"), 1, 13), 16, 10).cast("long").cast("double")))
}
