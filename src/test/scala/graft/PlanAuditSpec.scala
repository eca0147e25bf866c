package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties that make the 100 TB plans
  * viable are asserted here, so a refactor that silently reintroduces a
  * cartesian product, an unexpected shuffle, or a full-width parquet scan
  * fails CI instead of surviving until a scale run.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def hasData = new java.io.File(s"$sf/lineitem.parquet").exists()

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // queries whose DEFINITION is a broadcast non-equi join: q09 joins on a
  // broadcast interval-overlap predicate; q22 is the brute-force exact ANN
  // baseline (broadcast probes x corpus IS the operator). Everything else
  // must be equi/broadcast-hash — including q50, whose reverse-geocode moved
  // from a crossJoin-window to the cell-prefiltered PIP + grid kNN join when
  // the gazetteer scaled to ~300 entries. ... and q55 broadcasts the 1-row
  // corpus-size scalar to every line (the scalar-broadcast idiom).
  private val nonEquiByDesign =
    Set("q09_temporal_join", "q22_ann_topk", "q55_boilerplate_strip")

  test("no query plans a cartesian product or unplanned nested-loop join") {
    assume(hasData)
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin") || nonEquiByDesign(name),
        s"$name plans a nested-loop join")
    }
  }

  test("narrow per-doc operators stay exchange-free (q57 PII, q58 repetition, q63 budget)") {
    assume(hasData)
    for (name <- Seq("q57_pii_redact", "q58_repetition", "q63_budget_partial")) {
      // the only allowed exchange is the deliberate round-robin repartition
      // of the synthesized pages input (spreads payload building); no
      // aggregation/join exchange may appear
      val p = planOf(name)
      val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllIn(p).size
      assert(exchanges === 0, s"$name has a keyed shuffle:\n$p")
    }
  }

  test("big sides broadcast the small side (PIP polygons, contamination eval set)") {
    assume(hasData)
    assert(planOf("q07_pip_join").contains("BroadcastHashJoin"))
    assert(planOf("q59_contamination").contains("BroadcastHashJoin"))
  }

  test("extraction reads only the needed page columns (column pruning reaches the source)") {
    assume(hasData)
    val e = operators.Extractor.extract(table.Pages.pages(spark, sf)).toDF()
    val scan = e.queryExecution.executedPlan.toString
    // lineitem parquet feeds the synthesized pages: only the two id columns
    // may be read, never the full lineitem width
    assert(scan.contains("l_orderkey") && !scan.contains("l_extendedprice"),
      s"extraction reads more of lineitem than the id columns:\n$scan")
  }

  test("aggregations on the merge paths are hash-based, not sort-based") {
    assume(hasData)
    for (name <- Seq("q04_bbox_merge", "q10_tiles", "q17_dedup_exact", "q13_export_union")) {
      val p = planOf(name)
      assert(!p.contains("SortAggregate"), s"$name fell back to SortAggregate:\n$p")
    }
  }

  test("LSH verification joins hash-build, never sort the corpus (round-4 fix)") {
    assume(hasData)
    // the exact-Jaccard verification stage lives in q25 (q23 is the candidate
    // stage since the round-5 exact-band redesign); its shingle semi join
    // must stay hash-build
    val p = planOf("q25_jaccard_verify")
    assert(!p.contains("SortMergeJoin"), s"q25 sorts a join side:\n$p")
    assert(p.contains("ShuffledHashJoin"), "expected the hinted hash semi join")
    assert(!planOf("q23_minhash_pairs").contains("SortMergeJoin"),
      "q23 sorts a join side")
  }

  test("no query plans an unpartitioned (single-partition) window") {
    assume(hasData)
    // Window.orderBy with no partition spec funnels the whole input through
    // ONE task — the F5 cumulative-size selections did this until round 5's
    // distributed prefix sum (operators.PrefixSum). Assert it never returns.
    // Checked on the OPTIMIZED LOGICAL plan: with AQE on (the default),
    // executedPlan is an AdaptiveSparkPlanExec LEAF whose collect() never
    // descends into the real plan, so a physical-plan match is vacuous.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if !name.endsWith("_stream")) { // streaming queries execute on build
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans an unpartitioned window:\n${bad.headOption.getOrElse("")}")
    }
  }

  test("the unpartitioned-window audit actually detects an unpartitioned window") {
    // guard against the check itself going vacuous again (AQE wrapping was
    // exactly that): a deliberately global window must be caught
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("v")
      .withColumn("s",
        org.apache.spark.sql.functions.sum("v").over(W.orderBy("v")))
    val found = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(found.nonEmpty, "audit failed to see a global window — check is vacuous")
  }

  test("span-dedup aggregates hash-based; KMV rank-k becomes a WindowGroupLimit") {
    assume(hasData)
    // q77's shuffles carry (16-byte md5, doc_id) through hash aggregations —
    // a SortAggregate would sort the corpus-scale window set
    val p77 = planOf("q77_span_dedup")
    assert(!p77.contains("SortAggregate"), s"q77 fell back to SortAggregate:\n$p77")
    // q78's row_number<=k filter must be pushed to a per-partition top-k
    // (WindowGroupLimit) so no executor ever sorts a full group
    val p78 = planOf("q78_kmv_distinct")
    assert(p78.contains("WindowGroupLimit"), s"q78 rank filter not pushed down:\n$p78")
  }

  test("embedding identity grouping is hash-based on the vector key (round-5 fix)") {
    assume(hasData)
    // the identity half of cosineNearDupPairs groups on the raw
    // array<float> column; Spark must plan that as a HashAggregate (array
    // grouping keys are UnsafeRow-encodable) — a SortAggregate here would
    // mean sorting the full corpus by vector bytes at 100 TB
    val p = planOf("q43_embed_neardup")
    assert(!p.contains("SortAggregate"), s"q43 identity groupBy fell back to SortAggregate:\n$p")
    assert(p.contains("HashAggregate"), s"expected a hash aggregation in q43:\n$p")
  }

  test("as-of join is the union+window shape: one collapsed window, no join operator (q83)") {
    assume(hasData)
    val p = planOf("q83_asof_join")
    // the carried right-payload columns must collapse into a SINGLE Window
    // exec (CollapseWindow) — N windows would mean N sorts of the event set
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows === 1, s"expected exactly one Window exec, got $windows:\n$p")
    // no join operator of any kind: the asof IS a union + window
    for (j <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!p.contains(j), s"q83 unexpectedly plans $j:\n$p")
  }

  test("heavy-hitter verify never shuffles the full key set (q82 phase-2 plan)") {
    assume(hasData)
    // phase 2 collapses non-candidates into the null bucket BEFORE the
    // exchange: the plan must be a partial HashAggregate on ckey (map-side
    // collapse) + exchange + final HashAggregate, with no join and no raw
    // key exchange. The operator's returned frame is the materialized ≤ k+1
    // result, so audit the internal phase-2 plan directly.
    val keys = spark.range(0, 1000).selectExpr("id % 7 as key")
    val p = operators.HeavyHitters.exactCounts(keys, Seq(0L, 1L))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), s"phase 2 not hash-aggregated:\n$p")
    assert(!p.contains("Join"), s"phase 2 unexpectedly plans a join:\n$p")
    assert("Exchange hashpartitioning\\(ckey".r.findFirstIn(p).isDefined,
      s"phase 2 must exchange on the collapsed ckey, not the raw key:\n$p")
    assert(!"Exchange hashpartitioning\\(key".r.findFirstIn(p).isDefined,
      s"phase 2 exchanges the raw key set:\n$p")
  }
}
