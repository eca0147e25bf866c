package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT all-pairs Jaccard-threshold self-join via prefix filtering — the
  * exact counterpart to the MinHash-LSH candidate generator (q23): no false
  * negatives by construction, no bands/signatures to tune, cost that grows
  * with (1−τ) instead of with a recall target.
  *
  * Algorithm (AllPairs prefix, Bayardo et al. WWW'07; PPJoin family, Xiao et
  * al. — public literature):
  *   1. per-doc DISTINCT word-3-gram shingle sets (native transform/sequence
  *      exprs, no UDF);
  *   2. one dictionary aggregation for global shingle document-frequency;
  *      docs sort their shingles by (df asc, shingle asc) — a consistent
  *      global total order with the RAREST shingles first;
  *   3. prefix emit: the first p = n − ⌈τ·n⌉ + 1 shingles per doc (exact
  *      integer arithmetic, τ = num/den — a float ⌈τ·n⌉ can round the wrong
  *      way and silently shorten the prefix below the guarantee);
  *   4. candidates: equi-join on the prefix shingle + the length filter
  *      (J ≥ τ ⟹ den·min(n) ≥ num·max(n));
  *   5. exact verify on candidates only: intersection counts by joining the
  *      full shingle sets, keep den·i ≥ num·(na+nb−i) — all-integer, so an
  *      external SQL oracle reproduces the output bit-for-bit.
  *
  * Prefix-filter guarantee: if J(A,B) ≥ τ then A and B share at least one
  * shingle inside both prefixes under any shared total order — so step 4 is
  * a candidate SUPERSET and step 5 makes the answer exact.
  *
  * 100 TB shape: the dictionary is one hash aggregation over shingles
  * (O(vocab) shuffle — the same dictionary any tf-idf/frequency-order build
  * pays); the prefix index carries only ≈ (1−τ)·Σ|doc| + D rows; and the
  * candidate join is naturally skew-resistant because a document's prefix
  * holds its RAREST shingles — globally hot shingles sort last and never
  * enter a prefix unless a doc consists almost entirely of hot shingles.
  * Positional/suffix filtering (PPJoin's extra pruning) is omitted: it cuts
  * candidates by a constant factor without changing the asymptotics, and the
  * plain prefix form stays auditable. Callers should pre-collapse byte-exact
  * duplicate texts first (q17 idiom) — exact-dup cliques would otherwise
  * emit quadratically many J=1 pairs.
  */
object JaccardJoin {

  /** All ordered pairs (doc_a < doc_b) with shingle Jaccard ≥ tauNum/tauDen.
    * Input: (doc_id, text); docs with fewer than 3 tokens have no shingles
    * and never pair. Output: (doc_a, doc_b, n_inter, n_union).
    */
  def jaccardJoin(docs: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen, s"need 0 < tau <= 1, got $tauNum/$tauDen")
    // the ONE shingle definition shared with the rest of the dedup family —
    // a second tokenizer here would have to be kept in sync with the DuckDB
    // oracle contract by hand (explode drops sub-3-token docs: empty array)
    val sh = docs.select(col("doc_id"),
      explode(TextOps.ngramStrings(col("text"), 3)).as("s"))

    val dict = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val prefix = sh.join(dict, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("sorted"),
        count(lit(1)).as("n"))
      .select(col("doc_id"), col("n"),
        explode(expr(
          s"slice(sorted, 1, CAST(n - (($tauNum * n + ${tauDen - 1}) div $tauDen) + 1 AS INT))"))
          .as("ps"))
      .select(col("doc_id"), col("n"), col("ps.s").as("s"))

    val cand = prefix.select(col("doc_id").as("doc_a"), col("n").as("na"), col("s"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) * tauDen >= greatest(col("na"), col("nb")) * tauNum)
      .select("doc_a", "doc_b", "na", "nb")
      .distinct()

    // exact verify: count shared shingles per candidate pair (candidates
    // shared a prefix shingle, so the intersection is never empty and inner
    // joins lose nothing)
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("n_inter"))
      .filter(col("n_inter") * tauDen >= (col("na") + col("nb") - col("n_inter")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"))
  }
}
