package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.agg.Aggregators
import graft.functions.CellEncode
import graft.join.SpatialJoins
import graft.operators.Extractor
import graft.sim.Ann
import graft.table.Pages
import graft.text.TextOps
import graft.tiles.Tiler

/** Driver contract — queries + DuckDB oracle SQL (see SURVEY.md §2 for the
  * operator inventory each query covers).
  *
  * Oracle strategy: the pages corpus is synthesized in closed form from
  * `d = l_orderkey*8 + l_linenumber` (graft.table.PayloadSpec) using only exact
  * binary fractions, so DuckDB can recompute every expected extent/tbox with
  * plain SQL arithmetic while the Spark side actually parses the embedded
  * GeoJSON/KML/GPX/CSV/HTML payloads — a true end-to-end parser check.
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  /** Extraction stage shared by most queries. With `-Dgraft.cacheExtracted=true`
    * (set by graft.Verify) the result is cached per (session, dir) so a batch
    * of queries scans+parses the corpus once — the engine-level analog of a
    * shared scan; results are identical either way.
    */
  private val extractedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  // sessions that already carry the eviction listener — one listener per
  // session, not per (session, dir) cache entry
  private val evictionHooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())
  private def extracted(s: SparkSession, dir: String): DataFrame =
    if (sys.props.get("graft.cacheExtracted").contains("true"))
      extractedCache.getOrElseUpdate((s, dir), {
        // evict with the owning session — a long-lived multi-session service
        // would otherwise accumulate cached plans for stopped sessions
        if (evictionHooked.add(s))
          s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              extractedCache.filterInPlace { case ((sess, _), _) => sess != s }
              evictionHooked.remove(s)
            }
          })
        Extractor.extract(Pages.pages(s, dir)).toDF().cache()
      })
    else Extractor.extract(Pages.pages(s, dir)).toDF()

  private def withCentroid(df: DataFrame): DataFrame =
    df.filter(col("min_lon").isNotNull)
      .withColumn("lonc", (col("min_lon") + col("max_lon")) / 2)
      .withColumn("latc", (col("min_lat") + col("max_lat")) / 2)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Dedup-target corpus: the documents table plus closed-form planted
    * duplicates — exact copies for every doc_id % 20 == 0 (id + 1000000),
    * near-duplicates (a fixed trailer appended) for doc_id % 25 == 0
    * (id + 2000000), and repetition near-duplicates (text doubled — SimHash
    * is sign-invariant under token-count scaling, so these have Hamming
    * distance 0 by construction) for doc_id % 25 == 5 (id + 3000000).
    * Mirrored verbatim in the DUP oracle CTE so the dedup operators are
    * checked against group structure that actually exists.
    */
  private def docsDup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val exact = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    // ONE appended token, not several: a k=3 shingle set of a T-token doc
    // grows by exactly one shingle, so even the shortest corpus doc (10
    // tokens) keeps pair jaccard ≥ ~0.89 and the 16×4 LSH miss probability
    // per planted pair stays ≤ ~2e-7 — the containment oracle's "every near
    // pair emitted" claim then holds to sf1+ (a 5-token trailer put short
    // docs at jaccard ~0.6 with an 8% miss chance, seen once at sf0.1)
    val near = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" neartrailer")).as("text"))
    val rep = d.filter(col("doc_id") % 25 === 5)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    d.unionByName(exact).unionByName(near).unionByName(rep)
  }

  /** Planted near/rep pair expectations, exact-dup-collapse aware: when a
    * planted base doc's text occurs on several doc_ids (natural corpus
    * collisions exist from sf0.1 up), the pre-collapse keeps only the text
    * group's canonical doc — and collapses the clones of co-planted twins
    * into one — so the emittable pair is (min doc_id of the text group,
    * min planted doc_id + offset), one row per text group with planted
    * members. At sf0.01 (no collisions) this degenerates to (d, d+offset).
    */
  private def plantedPairs(s: SparkSession, dir: String, residue: Long,
                           offset: Long, kind: String): DataFrame =
    docs(s, dir).select("doc_id", "text")
      .groupBy("text")
      .agg(min("doc_id").as("doc_a"),
        min(when(col("doc_id") % 25 === residue, col("doc_id"))).as("_minp"))
      .filter(col("_minp").isNotNull)
      .select(col("doc_a"), (col("_minp") + offset).as("doc_b"), lit(kind).as("kind"))

  /** Oracle mirror of [[docsDup]]. */
  private val DUP: String =
    """WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL SELECT doc_id + 2000000, text || ' neartrailer' FROM documents WHERE doc_id % 25 = 0
  UNION ALL SELECT doc_id + 3000000, text || ' ' || text FROM documents WHERE doc_id % 25 = 5
)
"""

  /** Flagship query on sf=0.001: full extract → merge pipeline. */
  def entry(spark: SparkSession): DataFrame = {
    val e = extracted(spark, "/root/testdata/sf0.001")
    e.groupBy("handler").agg(
      count(lit(1)).as("n_pages"),
      count(col("min_lon")).as("n_with_extent"),
      min("min_lon").as("min_lon"), max("max_lon").as("max_lon"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1/P2/P5(payload analogs)/P8/S1..S8: per-page extraction
    "q01_extract_extent" -> ((s, dir) =>
      extracted(s, dir).select(col("d").as("doc_id"), col("handler"),
        col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))),

    // P9/P10/P13 temporal extraction
    "q02_extract_tbox" -> ((s, dir) =>
      extracted(s, dir).select(col("d").as("doc_id"), col("tbox_start"), col("tbox_end"))),

    // S1 handler dispatch statistics
    "q03_handler_counts" -> ((s, dir) =>
      extracted(s, dir).groupBy("handler").agg(count(lit(1)).as("cnt"))),

    // R1 bbox_merge via typed Aggregator
    "q04_bbox_merge" -> ((s, dir) =>
      extracted(s, dir).filter(col("min_lon").isNotNull)
        .groupBy((col("d") % 97).as("g"))
        .agg(count(lit(1)).as("n_ext"),
          Aggregators.bboxMerge(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")).as("bm"))
        .select(col("g"), col("n_ext"),
          col("bm.min_lon").as("min_lon"), col("bm.min_lat").as("min_lat"),
          col("bm.max_lon").as("max_lon"), col("bm.max_lat").as("max_lat"))),

    // R3 tbox_merge via typed Aggregator (signed-ISO deep time aware)
    "q05_tbox_merge" -> ((s, dir) =>
      extracted(s, dir).filter(col("tbox_start").isNotNull)
        .groupBy((col("d") % 97).as("g"))
        .agg(Aggregators.tboxMerge(col("tbox_start"), col("tbox_end")).as("tm"))
        .select(col("g"), col("tm.tbox_start").as("tbox_start"), col("tm.tbox_end").as("tbox_end"))),

    // J2 cell encode — native Catalyst expression (whole-stage codegen)
    "q06_cell_encode" -> ((s, dir) =>
      withCentroid(extracted(s, dir))
        .withColumn("cell2", CellEncode(col("latc"), col("lonc"), Pages.JoinZoom))
        .select(col("d").as("doc_id"),
          Tiler.txUdf(col("cell2")).cast("long").as("tx"),
          Tiler.tyUdf(col("cell2")).cast("long").as("ty"))),

    // J1 broadcast PIP join (cell prefilter + ray casting)
    "q07_pip_join" -> ((s, dir) => {
      val pts = withCentroid(extracted(s, dir))
        .select(col("d").as("doc_id"), col("lonc").as("lon"), col("latc").as("lat"), col("cell"))
      SpatialJoins.pipJoin(pts, Pages.polygons(s, dir))
        .select(col("doc_id"), col("poly_id").cast("long").as("poly_id"))
    }),

    // J3 grid-partitioned kNN join (exact, expanding cell disks)
    "q08_knn_join" -> ((s, dir) => {
      val pts = withCentroid(extracted(s, dir))
        .select(col("d").as("pid"), col("lonc").as("lon"), col("latc").as("lat"), col("cell"))
      // driver-side query-point list: nation is a 25-row dim, but cap the
      // collect explicitly — the driver-side knnJoin is only valid for small
      // query sets (the distributed path is knnJoinBig, q48)
      val qrows = s.read.parquet(s"$dir/nation.parquet").limit(10001).collect()
      require(qrows.length <= 10000, "kNN query side exceeds driver cap; use knnJoinBig")
      val qs = qrows.map { r =>
        val n = r.getAs[Int]("n_nationkey").toLong
        val (x0, y0, _, _) = Pages.polyBounds(n)
        (n, x0 + 12.0, y0 + 9.0)
      }.toSeq
      SpatialJoins.knnJoin(qs, pts, 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("pid"), col("dist2"))
    }),

    // J4 temporal interval-overlap join against quarter dims
    "q09_temporal_join" -> ((s, dir) => {
      val quarters = s.sql(
        "SELECT explode(sequence(to_date('2015-01-01'), to_date('2017-10-01'), interval 3 month)) AS q_start")
        .withColumn("q_end", date_add(add_months(col("q_start"), 3), -1))
      val t = extracted(s, dir)
        .filter(col("tbox_start").isNotNull && !col("tbox_start").startsWith("-"))
        .select(to_date(col("tbox_start")).as("t_start"), to_date(col("tbox_end")).as("t_end"))
      SpatialJoins.intervalOverlapJoin(t, quarters, "t_start", "t_end", "q_start", "q_end")
        .groupBy(date_format(col("q_start"), "yyyy-MM-dd").as("q_start"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // north_rule tiler: per-extent quadkey cover + per-tile merge
    "q10_tiles" -> ((s, dir) =>
      Tiler.tileSummaries(extracted(s, dir), Pages.TileZoom)
        .select(col("tx").cast("long").as("tx"), col("ty").cast("long").as("ty"),
          col("cnt"), col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))),

    // R2 convex-hull merge over REAL per-payload hull vertices, under a
    // BOUNDS oracle (round-4; the closed-form sibling q52 stays value-exact):
    // the merged hull's area/vertices are not SQL-expressible, but three
    // mathematical invariants of a correct hull-of-union ARE predictable —
    //   (a) area ∈ [max member hull area, group envelope area],
    //   (b) every output vertex ∈ union of member hull vertices (convex hull
    //       never synthesizes points — except the documented ±1e-10 degenerate
    //       promotion, excused by the area≤1e-18 escape),
    //   (c) a group with a 2-D envelope yields a ring of ≥3 vertices —
    // so the query emits the booleans and the oracle predicts all-TRUE per
    // group. The numeric hull values themselves stay covered by q44/q52 and
    // AggregatorsSpec.
    "q11_hull_merge" -> ((s, dir) => {
      val areaUdf = udf((ring: Seq[Double]) => {
        val pts = ring.grouped(2).map(p => (p(0), p(1))).toArray
        graft.geo.Geo.ringArea(pts)
      })
      val base = extracted(s, dir).filter(col("min_lon").isNotNull)
        .select((col("d") % 97).as("g"), col("hull"),
          col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
      val merged = base.groupBy("g")
        .agg(Aggregators.hullMerge(col("hull")).as("mhull"),
          max(areaUdf(col("hull"))).as("max_member_area"),
          min("min_lon").as("e0"), min("min_lat").as("e1"),
          max("max_lon").as("e2"), max("max_lat").as("e3"))
      def vertsOf(df: DataFrame, hullCol: String) = df.select(col("g"),
        explode(transform(sequence(lit(0), (size(col(hullCol)) / 2).cast("int") - 1),
          i => struct(element_at(col(hullCol), i * 2 + 1).as("x"),
            element_at(col(hullCol), i * 2 + 2).as("y")))).as("v"))
        .select(col("g"), col("v.x").as("x"), col("v.y").as("y"))
      // hull vertices are verbatim copies of input vertices → exact-equality
      // anti join; distinct first so the join is duplicate-proof
      val missing = vertsOf(merged, "mhull")
        .join(vertsOf(base, "hull").distinct(), Seq("g", "x", "y"), "left_anti")
        .groupBy("g").agg(count(lit(1)).as("n_missing"))
      merged.join(missing, Seq("g"), "left")
        .select(col("g"),
          (areaUdf(col("mhull")) >= col("max_member_area") - 1e-9 &&
            areaUdf(col("mhull")) <=
              (col("e2") - col("e0")) * (col("e3") - col("e1")) + 1e-9).as("area_in_bounds"),
          (coalesce(col("n_missing"), lit(0L)) === 0 ||
            areaUdf(col("mhull")) <= 1e-18).as("verts_subset"),
          when(col("e2") > col("e0") && col("e3") > col("e1"), size(col("mhull")) / 2 >= 3)
            .otherwise(size(col("mhull")) / 2 >= 1).as("n_vertices_ok"))
    }),

    // X1/X4 WKT rendering (point detection R8 included)
    "q12_wkt" -> ((s, dir) => {
      val wktUdf = udf((a: Double, b: Double, c: Double, dd: Double) =>
        graft.geo.Wkt.extentToWkt(graft.geo.Extent(a, b, c, dd)))
      extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"),
          wktUdf(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")).as("wkt"))
    }),

    // S10/S11 export union + summary-row filter
    "q13_export_union" -> ((s, dir) => {
      val e = extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"), col("handler"))
      val vec = e.filter(col("handler") === "vector")
      val csv = e.filter(col("handler") === "csv")
      // the summary row's values are constants — emit it as a one-row literal
      // frame rather than aggregating the corpus into constants (the old
      // first(lit(...)) agg cost a full scan + exchange per export branch and
      // planned as SortAggregate, the only one on the surface)
      def withSummary(df: DataFrame): DataFrame =
        df.unionByName(s.range(1).select(lit(-1L).as("doc_id"), lit("graft:0.1").as("handler")))
      withSummary(vec).unionByName(withSummary(csv))
        .filter(!col("handler").startsWith("graft:"))
    }),

    // J5 anti join
    "q14_anti_join" -> ((s, dir) => {
      val d = docs(s, dir)
      val skip = d.filter(col("doc_id") % 13 === 0).select("doc_id")
      d.join(skip, Seq("doc_id"), "left_anti").select("doc_id")
    }),

    // F5/W1 cumulative-size selection window
    "q15_cumsum_select" -> ((s, dir) =>
      TextOps.sizeLimitedSelect(docs(s, dir), "n_chars", "doc_id", 50000L)
        .select(col("doc_id"), col("n_chars"), col("cum_size"))),

    // W2 top-k per group
    "q16_topk" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id").asc)
      docs(s, dir).withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"))
    }),

    // dedup: exact (hash-groupBy) over the corpus with planted duplicates —
    // the oracle checks real group structure (cnt=2 groups), not an empty set
    "q17_dedup_exact" -> ((s, dir) =>
      TextOps.exactDupGroups(docsDup(s, dir))),

    // doc fingerprinting
    "q18_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        substring(md5(to_binary(col("text"), lit("utf-8"))), 1, 15).as("fp_hex"))),

    // text quality scoring
    "q19_quality" -> ((s, dir) =>
      TextOps.qualityMetrics(docs(s, dir))),

    // language id heuristic
    "q20_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextOps.langIdCol(col("text")).as("lang_pred"))),

    // BPE-ish regex token counting
    "q21_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long").as("n_tokens"))),

    // ANN: brute-force cosine top-k (exact baseline)
    "q22_ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.cosineTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .select(col("pid"), col("rank").cast("long").as("rank"), col("nid"))
    }),

    // dedup: MinHash-LSH over the planted-dup corpus, CONTAINMENT-checked —
    // two-sided like q24: (a) every planted near pair must be emitted,
    // (b) planted exact pairs must NOT be (pre-collapsed into
    // exactDupGroups' domain), (c) every emitted pair must honor LSH's
    // ADVERTISED contract — its recomputed full signatures agree on ≥
    // rowsPerBand rows (est_jaccard ≥ 4/64, derived from the signatures
    // independently of the bucket-join/capping/dedup plumbing); violations
    // surface as 'badpair' rows (oracle red). A token-Jaccard floor is the
    // WRONG precision metric at scale: MinHash-LSH legitimately emits a
    // quadratically-growing tail of low-similarity candidates whose band
    // rows genuinely agree (measured: 0 at sf0.1, 36 at sf1 — the S-curve
    // tail), and published pipelines remove them downstream with exact
    // verification, which is q25's oracle-checked job here. Raw candidate
    // recall behavior stays in DedupSpec.
    "q23_minhash_pairs" -> ((s, dir) => {
      val emitted = TextOps.minhashCandidatePairs(docsDup(s, dir))
      val base = docs(s, dir).select("doc_id")
      val planted = base.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1000000L).as("doc_b"), lit("exact").as("kind"))
        .unionByName(plantedPairs(s, dir, residue = 0, offset = 2000000L, kind = "near"))
      emitted
        .join(planted, Seq("doc_a", "doc_b"), "left")
        .filter(col("kind").isNotNull || col("est_jaccard") < 0.0625)
        .select(col("doc_a"), col("doc_b"), coalesce(col("kind"), lit("badpair")).as("kind"))
    }),

    // dedup: SimHash near-dup pairs, CONTAINMENT-checked against the planted
    // repetition pairs (doubled text ⇒ identical SimHash ⇒ guaranteed
    // candidate+emission) — trailer-near pairs flip too many sign margins for
    // a Hamming≤3 guarantee and stay a DedupSpec recall property instead.
    // Also asserts exact pairs are absent (pre-collapse contract).
    "q24_simhash_pairs" -> ((s, dir) => {
      val emitted = TextOps.simhashCandidatePairs(docsDup(s, dir)).select("doc_a", "doc_b")
      val base = docs(s, dir).select("doc_id")
      val planted = base.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1000000L).as("doc_b"), lit("exact").as("kind"))
        .unionByName(plantedPairs(s, dir, residue = 5, offset = 3000000L, kind = "rep"))
      // two-sided like q23 (round-4): planted rep pairs must be emitted AND
      // every emitted pair must honor SimHash's ADVERTISED contract — the
      // recomputed (independent of the bucket-join path) hash distance is
      // ≤ maxHamming. A Jaccard/cosine floor is the wrong metric here: the
      // synthetic corpus draws from a small vocabulary, so random doc pairs
      // reach token-cosine 0.80 — legitimately inside SimHash's similarity
      // regime — while a broken bucket join flooding arbitrary pairs WOULD
      // violate the hamming bound and surface as 'badpair' rows (oracle red)
      val sha = docsDup(s, dir).select(col("doc_id"), TextOps.simhashUdf(col("text")).as("sh"))
      emitted
        .join(sha.select(col("doc_id").as("doc_a"), col("sh").as("_sa")), Seq("doc_a"))
        .join(sha.select(col("doc_id").as("doc_b"), col("sh").as("_sb")), Seq("doc_b"))
        .withColumn("_h", bit_count(col("_sa").bitwiseXOR(col("_sb"))))
        .join(planted, Seq("doc_a", "doc_b"), "left")
        .filter(col("kind").isNotNull || col("_h") > 3)
        .select(col("doc_a"), col("doc_b"), coalesce(col("kind"), lit("badpair")).as("kind"))
    }),

    // dedup: exact n-gram Jaccard over a closed-form candidate-pair set
    // (planted exact-dup pairs → 1.0, near-dup pairs → high, shifted control
    // pairs → low); fully recomputed by the DuckDB oracle via string 3-shingles
    "q25_jaccard_verify" -> ((s, dir) => {
      val d2 = docsDup(s, dir)
      val base = docs(s, dir).select("doc_id")
      val exactPairs = base.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1000000L).as("doc_b"))
      val nearPairs = base.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 2000000L).as("doc_b"))
      val controlPairs = base.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1L).as("doc_b"))
        .join(base.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      TextOps.exactJaccard(exactPairs.unionByName(nearPairs).unionByName(controlPairs), d2)
    }),

    // shingle statistics (distinct word-3-grams per doc)
    "q26_shingles" -> ((s, dir) => {
      val nUdf = udf((text: String) => TextOps.shingleHashes(text).length.toLong)
      docs(s, dir)
        .filter(size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")) >= 3)
        .select(col("doc_id"), nUdf(col("text")).as("n_shingles"))
    }),

    // streaming-shaped windowed aggregation (batch form; streaming variant in tests)
    "q27_events_window" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), min("value").as("min_value"), max("value").as("max_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("event_type"), col("cnt"), col("min_value"), col("max_value"))),

    // X6 signed-ISO geological periods from text
    "q28_periods" -> ((s, dir) => {
      val perUdf = udf((text: String) => {
        val r = graft.parse.TextGeo.extract(text)
        r.periods.map(_.value).distinct.toArray
      })
      Pages.pages(s, dir)
        .select(col("d").as("doc_id"), explode(perUdf(col("text"))).as("period_name"))
        .withColumn("p_start", element_at(typedLit(graft.parse.TextGeo.periods.map { case (k, v) => k -> v._1 }), col("period_name")))
        .withColumn("p_end", element_at(typedLit(graft.parse.TextGeo.periods.map { case (k, v) => k -> v._2 }), col("period_name")))
    }),

    // P7/P13 provenance surface: standoff annotation spans (places, dates,
    // periods) with char offsets (reference contract: handle_text.py:368-390,
    // tests/test_api_text_offsets.py); offsets are closed-form for the
    // synthetic texts so the oracle recomputes them by string arithmetic
    "q29_annotations" -> ((s, dir) => {
      val annUdf = udf((text: String) => {
        val r = graft.parse.TextGeo.extract(text)
        r.places.map(sp => ("place", sp.value, sp.charStart, sp.charEnd)) ++
          r.dates.map(sp => ("date", sp.value, sp.charStart, sp.charEnd)) ++
          r.periods.map(sp => ("period", sp.value, sp.charStart, sp.charEnd))
      })
      Pages.pages(s, dir).filter(col("d") % 10 === 8)
        .select(col("d").as("doc_id"), explode(annUdf(col("text"))).as("a"))
        .select(col("doc_id"), col("a._1").as("kind"), col("a._2").as("value"),
          col("a._3").cast("long").as("char_start"), col("a._4").cast("long").as("char_end"))
    }),

    // annotated-text rendering (reference handle_text.py:368-390,
    // tests/test_api_text_annotate.py): the standoff spans of q29 rendered
    // inline as [kind:surface] markers, inserted right-to-left so offsets
    // stay valid; the oracle rebuilds the full annotated string in SQL
    "q54_annotated_text" -> ((s, dir) => {
      val renderUdf = udf((text: String) => {
        val r = graft.parse.TextGeo.extract(text)
        val spans = (r.places.map(sp => ("place", sp)) ++
          r.dates.map(sp => ("date", sp)) ++ r.periods.map(sp => ("period", sp)))
          .sortBy(-_._2.charStart)
        spans.foldLeft(text) { case (acc, (kind, sp)) =>
          acc.substring(0, sp.charStart) + s"[$kind:" +
            acc.substring(sp.charStart, sp.charEnd) + "]" + acc.substring(sp.charEnd)
        }
      })
      Pages.pages(s, dir).filter(col("d") % 10 === 8)
        .select(col("d").as("doc_id"), renderUdf(col("text")).as("annotated"))
    }),

    // R7 extraction statistics
    "q30_stats" -> ((s, dir) =>
      extracted(s, dir).groupBy("handler")
        .agg(count(lit(1)).as("n_pages"), count(col("min_lon")).as("n_with_extent"))),

    // byte-identical text passthrough invariant (north_star per-row invariant)
    "q31_text_passthrough" -> ((s, dir) =>
      Pages.pages(s, dir).select(col("d").as("doc_id"),
        md5(to_binary(col("text"), lit("utf-8"))).as("text_md5"))),

    // ANN LSH, CONTAINMENT-checked: the corpus is augmented with an identical
    // clone of every probe vector (vec_id+1e6). An identical vector shares
    // every sign-bucket in every table, so LSH MUST retrieve it, and its
    // cosine 1.0 ranks first — emitted ∩ planted is therefore exactly one
    // rank-1 row per probe, deterministically. (Raw top-k quality is the
    // EngineSpec recall-floor property; approximate output beyond the planted
    // witnesses is not SQL-predictable.)
    "q32_ann_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 10)
      val clones = probes.withColumn("vec_id", col("vec_id") + 1000000L)
      Ann.lshTopK(emb.unionByName(clones), probes, 5)
        .filter(col("nid") === col("pid") + 1000000L)
        .select(col("pid"), col("rank").cast("long").as("rank"), col("nid"))
    }),

    // P5 raster extent — pure column corner math, no UDF
    "q33_raster_extent" -> ((s, dir) =>
      graft.table.RasterTable.extents(graft.table.RasterTable.rasters(s, dir))),

    // P11 raster temporal priority chain (CF → ACDD → TIFFTAG → ACQUISITION)
    "q34_raster_tbox" -> ((s, dir) =>
      graft.table.RasterTable.tboxes(graft.table.RasterTable.rasters(s, dir))),

    // R9 shared-placename reduction: split candidates, keep components seen >1
    "q35_placename_shared" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey").cast("long").as("custkey"),
          concat(lit("N"), col("o_orderkey") % 5, lit("/M"), col("o_orderkey") % 3).as("name"))
        .select(col("custkey"), explode(split(col("name"), "[,;/|]")).as("comp"))
        .groupBy("custkey", "comp").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)),

    // X5 DOI normalisation
    "q36_doi_normalize" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("doc_id"))
        .withColumn("url", concat(lit("https://doi.org/10."), col("doc_id") % 90 + 10,
          lit("/item."), col("doc_id")))
        .select(col("doc_id"), graft.functions.Scalars.doiNormalize(col("url")).as("doi"))),

    // X9 size-string parse
    "q37_size_parse" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.functions.Scalars.sizeToBytes(concat(col("n_chars"),
          when(col("doc_id") % 3 === 0, "B").when(col("doc_id") % 3 === 1, "KB").otherwise("MB")))
          .as("n_bytes"))),

    // F5 'smallest' selection strategy (cumulative-size prefix over size
    // order) — distributed prefix sum, never a single-partition window
    "q38_select_smallest" -> ((s, dir) =>
      operators.PrefixSum.withRunningSum(docs(s, dir),
          Seq(col("n_chars").asc, col("doc_id").asc), col("n_chars"), "cum_size")
        .filter(col("cum_size") <= 30000)
        .select(col("doc_id"), col("n_chars"), col("cum_size"))),

    // multimodal: binary media columns → batched REAL decode (JDK PNG codec,
    // WAV PCM16 parse, frame-container demux) → pooled feature statistics.
    // Pixel/sample content is closed-form, so the oracle recomputes every
    // feature sum exactly — a true encode→decode→pool end-to-end check.
    "q39_media_features" -> ((s, dir) =>
      graft.multimodal.Media.featureTable(s, dir)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          aggregate(col("features"), lit(0.0), (a, x) => a + x).as("feature_sum"))),

    // multimodal metadata surface: kind/dims/encoded sizes, all closed-form
    // (PNG stored-deflate size = 68 + h*(w+1); WAV = 44 + 2n; GFV0 = 8 + 344·nf)
    "q51_media_meta" -> ((s, dir) =>
      graft.multimodal.Media.media(s, dir).toDF()
        .select(col("media_id"), col("kind"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          length(col("bytes")).cast("long").as("n_bytes"), col("format"))),

    // R4 hierarchy rollup: multi-level merge in one pass (cube/rollup built-in)
    "q40_rollup" -> ((s, dir) =>
      extracted(s, dir)
        .withColumn("bucket", col("d") % 10)
        .rollup(col("handler"), col("bucket"))
        .agg(count(lit(1)).as("n_pages"), count(col("min_lon")).as("n_with_extent"))),

    // S5/P6 point-cloud header extent (struct arithmetic, no UDF)
    "q41_pointcloud_extent" -> ((s, dir) =>
      graft.table.PointCloudTable.extents(graft.table.PointCloudTable.headers(s, dir))),

    // P12 point-cloud creation-date tbox (year/day-of-year, laspy-default guard)
    "q42_pointcloud_tbox" -> ((s, dir) =>
      graft.table.PointCloudTable.tboxes(graft.table.PointCloudTable.headers(s, dir))),

    // dedup: embedding-cosine near-dup pairs, CONTAINMENT-checked: identical
    // embeddings are planted (vec_id+1000000 clones for vec_id % 20 == 0)
    // and the oracle asserts every planted clone pair is emitted with cosine
    // 1.0. Identity recall is STRUCTURAL, not probabilistic: byte-identical
    // vectors emit exact canonical→member star pairs independent of the LSH
    // bucket caps (the sf1 replay caught hot sign-buckets overflowing the
    // cap and silently dropping 508/1000 planted pairs under the old
    // buckets-only design). The star pair (a, a+1e6) equals the planted pair
    // because base embeddings are pairwise distinct at every sf (asserted in
    // DedupSpec — a base-level byte collision would make a different id the
    // group canonical), and the ≥threshold floor on the near-dup half stays
    // structural (exact cosine re-check before emitting).
    "q43_embed_neardup" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val embDup = emb.select("vec_id", "embedding")
        .unionByName(emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      val planted = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("vec_a"), (col("vec_id") + 1000000L).as("vec_b"))
      Ann.cosineNearDupPairs(embDup, threshold = 0.15)
        .join(planted, Seq("vec_a", "vec_b"))
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
    }),

    // J3 at corpus scale on BOTH sides: kNN with a large DataFrame query set
    // (every k=7 point page probes the whole corpus; queries include
    // themselves — rank 1 is the self-match at dist 0)
    "q48_knn_big" -> ((s, dir) => {
      val e = withCentroid(extracted(s, dir))
      val pts = e.select(col("d").as("pid"), col("lonc").as("lon"), col("latc").as("lat"), col("cell"))
      val qs = e.filter(col("d") % 100 === 7)
        .select(col("d").as("qid"), col("lonc").as("qlon"), col("latc").as("qlat"))
      SpatialJoins.knnJoinBig(qs, pts, 3)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("pid"), col("dist2"))
    }),

    // ANN: IVF coarse-quantizer variant (rows-only; recall vs exact checked in
    // EngineSpec) — the nProbe/nCentroids partial-scan scale path
    "q47_ann_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .select(col("pid"), col("rank").cast("long").as("rank"), col("nid"))
    }),

    // F5 'random(seed)' strategy with shapefile-style group atomicity: groups
    // of 10 docs selected/skipped together, group order = deterministic
    // md5-of-key (the engine's portable seed-42 shuffle analog)
    "q45_select_random" -> ((s, dir) =>
      TextOps.groupedSizeSelect(docs(s, dir), "n_chars",
        floor(col("doc_id") / 10).cast("long"), "random", 30000L)
        .select(col("doc_id"), col("n_chars"), col("grp"), col("grp_cum"))),

    // F5 'largest' strategy over the same atomic groups
    "q46_select_largest" -> ((s, dir) =>
      TextOps.groupedSizeSelect(docs(s, dir), "n_chars",
        floor(col("doc_id") / 10).cast("long"), "largest", 30000L)
        .select(col("doc_id"), col("n_chars"), col("grp"), col("grp_cum"))),

    // north_rule raster↔vector bridge: raster extents and page extents meet in
    // the same quadkey tile space — rasters explode to their tile cover and
    // join the per-tile page rollup on the tile id (an equi join, no geometry
    // predicate at join time)
    "q49_raster_tile_bridge" -> ((s, dir) => {
      val rext = graft.table.RasterTable.extents(graft.table.RasterTable.rasters(s, dir))
      val rTiles = Tiler.tileAssignments(rext, Pages.TileZoom)
        .select(col("raster_id"), col("tx").cast("long").as("tx"), col("ty").cast("long").as("ty"))
      val pTiles = Tiler.tileSummaries(extracted(s, dir), Pages.TileZoom)
        .select(col("tx").cast("long").as("tx"), col("ty").cast("long").as("ty"), col("cnt"))
      rTiles.join(pTiles, Seq("tx", "ty"))
        .groupBy("raster_id")
        .agg(count(lit(1)).as("n_tiles_hit"), sum("cnt").as("n_pages"))
    }),

    // reference `placename` decoration (extent.py:930-957 + gazetteer.py:
    // 219-250 boundary polygons): each group's European-window footprint
    // centroid reverse-geocodes against the ~300-entry bundled gazetteer —
    // a region whose admin-boundary ring CONTAINS the centroid wins
    // (cell-prefiltered broadcast PIP, smallest area then name on overlap);
    // otherwise the nearest point entry via the engine's grid kNN join
    // (cell-equi candidate rounds with certified exactness — the 12-row-era
    // crossJoin-window shape would be quadratic against a real gazetteer)
    "q50_placename" -> ((s, dir) => {
      import graft.parse.GazetteerTable
      val cent = extracted(s, dir)
        .filter(col("min_lon") >= -15 && col("max_lon") <= 25 &&
          col("min_lat") >= 35 && col("max_lat") <= 60)
        .groupBy((col("d") % 97).as("g"))
        .agg(((min("min_lon") + max("max_lon")) / 2).as("cx"),
          ((min("min_lat") + max("max_lat")) / 2).as("cy"))
        .localCheckpoint(true) // consumed 3x (PIP, kNN queries, final join)
      // (a) region containment: probes carry a join-zoom cell, ring covers
      //     prefilter the broadcast PIP to same-cell candidates
      val rings = GazetteerTable.regions.sortBy(_.name).map { en =>
        (en.name, en.ring.get.toSeq,
          graft.cells.QuadKey.cover(graft.geo.Geo.envelope(en.ring.get).get,
            Pages.JoinZoom).toSeq,
          graft.geo.Geo.ringArea(en.ring.get.grouped(2).map(p => (p(0), p(1))).toArray))
      }
      val ringDf = s.createDataFrame(rings).toDF("poly_id", "ring", "cells", "area")
      val probes = cent.select(col("g"), col("cx").as("lon"), col("cy").as("lat"),
        graft.functions.CellEncode(col("cy"), col("cx"), Pages.JoinZoom).as("cell"))
      val pipW = Window.partitionBy("g").orderBy(col("area").asc, col("poly_id").asc)
      val pip = join.SpatialJoins.pipJoin(probes, ringDf)
        .join(broadcast(ringDf.select("poly_id", "area")), Seq("poly_id"))
        .withColumn("rk", row_number().over(pipW)).filter(col("rk") === 1)
        .select(col("g"), col("poly_id").as("region"))
      // (b) nearest point entry: pid in name-sorted order so the kNN
      //     (dist2, pid) tie-break mirrors the oracle's (dist2, pname)
      val gazPts = GazetteerTable.entries.sortBy(_.name).zipWithIndex.map {
        case (en, i) => (i.toLong, en.name, en.hits.head._1, en.hits.head._2)
      }
      val gazDf = s.createDataFrame(gazPts).toDF("pid", "pname", "plat", "plon")
      val queries = cent.select("g", "cx", "cy").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq // ≤97 by construction (d % 97)
      val knn = join.SpatialJoins.knnJoin(queries,
          gazDf.select(col("pid"), col("plon").as("lon"), col("plat").as("lat")), k = 1)
        .join(broadcast(gazDf.select("pid", "pname")), Seq("pid"))
        .select(col("qid").as("g"), col("pname"))
      cent.join(pip, Seq("g"), "left")
        .join(knn, Seq("g"))
        .select(col("g"), coalesce(col("region"), col("pname")).as("placename"))
    }),

    // R2 hull MERGE with a closed-form oracle: the hot-cell pages (d%100>=80,
    // north_rule skew cluster) all carry the same rect (7.5,51.5)-(8.5,52.0)
    // — k≤6 payloads as its 4-corner hull, k=7 points as its SW corner — so
    // every group's merged hull is exactly that rect: 4 vertices, area 0.5,
    // canonical CCW ring starting at the lexicographic min. A true
    // multi-member merge (rect hulls + degenerate point hulls) the oracle can
    // recompute; the general data-dependent case stays rows-only in q11.
    "q52_hull_merge_rect" -> ((s, dir) => {
      val areaUdf = udf((ring: Seq[Double]) => {
        val pts = ring.grouped(2).map(p => (p(0), p(1))).toArray
        graft.geo.Geo.ringArea(pts)
      })
      extracted(s, dir)
        .filter(col("min_lon").isNotNull && col("d") % 100 >= 80 && col("d") % 10 <= 7)
        .groupBy((col("d") % 97).as("g"))
        .agg(count(lit(1)).as("n_pages"), Aggregators.hullMerge(col("hull")).as("hull"))
        .select(col("g"), col("n_pages"),
          (size(col("hull")) / 2).cast("long").as("n_vertices"),
          areaUdf(col("hull")).as("area"),
          element_at(col("hull"), 1).as("h_lon0"), element_at(col("hull"), 2).as("h_lat0"))
    }),

    // reference two-source preference (extent.py:1881-1999): per page, the
    // payload-extraction extent wins; the landing-page-metadata extent is the
    // fallback — both sides genuinely attempted per row, then coalesced.
    "q53_extent_coalesce" -> ((s, dir) => {
      import graft.parse.Extract
      val payloadUdf = udf((html: Array[Byte], text: String, lang: String) => {
        val r = Extract.extractPayloadOnly(html, text, lang)
        (r.minLon, r.minLat, r.maxLon, r.maxLat)
      })
      val metaUdf = udf((html: Array[Byte]) => {
        val r = Extract.extractMetaOnly(html)
        (r.minLon, r.minLat, r.maxLon, r.maxLat)
      })
      Pages.pages(s, dir)
        .select(col("d"), payloadUdf(col("html"), col("text"), col("lang")).as("p"),
          metaUdf(col("html")).as("m"))
        .select(col("d").as("doc_id"),
          coalesce(col("p._1"), col("m._1")).as("min_lon"),
          coalesce(col("p._2"), col("m._2")).as("min_lat"),
          coalesce(col("p._3"), col("m._3")).as("max_lon"),
          coalesce(col("p._4"), col("m._4")).as("max_lat"),
          when(col("p._1").isNotNull, "payload")
            .when(col("m._1").isNotNull, "metadata").as("source"))
    }),

    // line-frequency boilerplate removal (CCNet/RefinedWeb-style): planted
    // footer lines — one in 100 % of docs (stripped), one per doc_id%100
    // cohort at ~1-2 % (kept, below the 5 % threshold) — plus the unique body
    // line; the oracle recomputes the whole frequency→strip→rejoin algorithm
    "q55_boilerplate_strip" -> ((s, dir) => {
      val withBoiler = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nCopyright Example Corp\nAll rights reserved to doc "),
          col("doc_id") % 100).as("text"))
      TextOps.stripBoilerplate(withBoiler, maxDocFrac = 0.05)
        .select(col("doc_id"), md5(to_binary(col("clean_text"), lit("utf-8"))).as("clean_md5"),
          col("n_lines_kept"))
    }),

    // deterministic hash-based stratified sampling: per-language keep rates
    // applied via a lexicographic md5-prefix threshold — the portable seeded
    // sample (identical in any engine that can md5 a string), the corpus-scale
    // analog of the reference's seeded selection (helpfunctions.py:2012-2150)
    "q56_sample_stratified" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("_h", substring(md5(concat(lit("sample-42:"), col("doc_id"))), 1, 2))
        .filter(col("_h") < when(col("lang") === "en", "80")
          .when(col("lang") === "de", "4d").otherwise("1a"))
        .select(col("doc_id"), col("lang"))),

    // PII redaction over a corpus with planted emails/phones/IPv4s on every
    // third doc; counts + redacted-text md5, fully recomputed by the oracle
    "q57_pii_redact" -> ((s, dir) => {
      val withPii = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit("\nContact: user"), col("doc_id"),
            lit("@example.com or call +4930555"), col("doc_id") % 90 + 10,
            lit(" node 10.0."), col("doc_id") % 250, lit("."), col("doc_id") % 100))
          .otherwise(col("text")).as("text"))
      TextOps.redactPii(withPii)
    }),

    // Gopher-style repetition metrics over a corpus with planted duplicated
    // lines on every sixth doc; line/char duplicate fractions + top-bigram share
    "q58_repetition" -> ((s, dir) => {
      val withRep = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 6 === 1,
          concat(col("text"), lit("\nrepeat line alpha\nrepeat line alpha\ntail "),
            col("doc_id")))
          .otherwise(col("text")).as("text"))
      TextOps.repetitionMetrics(withRep)
    }),

    // benchmark-contamination scan: eval set = doc_id%50==0 (plus a planted
    // shared benchmark sentence on eval docs and on train docs with
    // doc_id%11==3); training docs sharing any word-8-gram with eval are
    // flagged with shared-n-gram and eval-doc counts
    "q59_contamination" -> ((s, dir) => {
      val sentence = " benchmark heldout sentence alpha beta gamma delta epsilon zeta eta theta"
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 50 === 0 || col("doc_id") % 11 === 3,
          concat(col("text"), lit(sentence))).otherwise(col("text")).as("text"))
      TextOps.contamination(
        aug.filter(col("doc_id") % 50 =!= 0),
        aug.filter(col("doc_id") % 50 === 0), n = 8)
    }),

    // S9 archive expansion end-to-end: build per-order zip/tar/tar.gz archives
    // (each page = p<d>.html payload + p<d>.txt text members), expand with the
    // pure-JVM codecs, re-extract every member pair, merge extents per archive
    // (reference semantics: an archive's extent = merge of member extents,
    // helpfunctions.py:1565-1650) — the oracle rebuilds the merge per d//8
    "q60_archive_expand" -> ((s, dir) => {
      val arch = graft.table.ArchiveTable.archives(s, dir)
      // expand + member re-pairing in ONE narrow flatMap (the archive's
      // members are co-resident in the expanding task; see Archives.expandPages)
      val rebuilt = graft.sources.Archives.expandPages(arch).toDF()
        .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .withColumn("lang", lit("en"))
      Extractor.extract(rebuilt).toDF()
        .groupBy((col("d") / 8).cast("long").as("archive_id"))
        .agg(count(lit(1)).as("n_pages"), count(col("min_lon")).as("n_with_extent"),
          min("min_lon").as("min_lon"), min("min_lat").as("min_lat"),
          max("max_lon").as("max_lon"), max("max_lat").as("max_lat"))
        .withColumn("fmt", when(col("archive_id") % 3 === 0, "zip")
          .when(col("archive_id") % 3 === 1, "tar").otherwise("tgz"))
    }),

    // URL canonicalization (web-pipeline URL-level dedup key): planted
    // mixed-case/www/port/fragment/trailing-slash variants, canonicalized by
    // the fixed 5-rule contract; the oracle mirrors every rule verbatim
    "q61_url_canonical" -> ((s, dir) => {
      val urls = Pages.pages(s, dir).select(col("d").as("doc_id"),
        concat(lit("HTTPS://WWW.Example-"), col("d") % 7, lit(".ORG"),
          when(col("d") % 3 === 0, ":443").otherwise(""),
          lit("/Pages/p"), col("d"),
          when(col("d") % 4 === 1, "#section-2")
            .when(col("d") % 4 === 2, "/").otherwise("")).as("url"))
      urls.select(col("doc_id"), graft.functions.Scalars.canonicalizeUrl(col("url")).as("canon_url"))
        .withColumn("host", graft.functions.Scalars.urlHost(col("canon_url")))
    }),

    // domain-reweighted sampling (DoReMi-style mixing weights, deterministic):
    // per-host keep rates applied via the md5-prefix threshold — the portable
    // seeded sample keyed by domain instead of language
    "q62_host_sample" -> ((s, dir) =>
      Pages.pages(s, dir)
        .select(col("d").as("doc_id"), concat(lit("example-"), col("d") % 7, lit(".org")).as("host"))
        .withColumn("_h", substring(md5(concat(lit("mix-7:"), col("doc_id"))), 1, 2))
        .filter(col("_h") < when(col("host") === "example-0.org", "e6")
          .when(col("host") === "example-1.org", "cc")
          .when(col("host") === "example-2.org", "99")
          .when(col("host") === "example-3.org", "66")
          .when(col("host") === "example-4.org", "4d")
          .when(col("host") === "example-5.org", "33").otherwise("1a"))
        .select(col("doc_id"), col("host"))),

    // F6 deadline-partial analog (deviation, documented): the reference
    // processes files in a random.seed(0) order until the wall-clock deadline
    // and flags the run `timeout` with partial results (extent.py:569-572,
    // 683-712). Wall-clock is not reproducible, so the engine's analog is a
    // deterministic WORK BUDGET: pages are admitted in md5-keyed order via a
    // hash-prefix threshold (~25 % here); admitted pages extract normally,
    // the remainder is emitted with handler='timeout' and null extents — the
    // same user-visible contract (partial results + explicit flag), oracle-able
    "q63_budget_partial" -> ((s, dir) => {
      val admitted = col("_p") < "40"
      val flagged = extracted(s, dir)
        .withColumn("_p", substring(md5(concat(lit("deadline-0:"), col("d"))), 1, 2))
      flagged.select(col("d").as("doc_id"),
        when(admitted, col("handler")).otherwise("timeout").as("handler"),
        when(admitted, col("min_lon")).as("min_lon"),
        when(admitted, col("min_lat")).as("min_lat"),
        when(admitted, col("max_lon")).as("max_lon"),
        when(admitted, col("max_lat")).as("max_lat"),
        (!admitted).as("timed_out"))
    }),

    // dedup clusters: connected components over the planted duplicate-pair
    // graph (pairs → clusters, the step that picks one canonical doc per
    // component). The ALGORITHM is the real iterative min-label propagation;
    // the planted components are closed-form (base doc ∪ its clones), so the
    // oracle can predict every (node, label) row
    "q64_dedup_clusters" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id")
      val e1 = base.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 1000000L).as("dst"))
      val e2 = base.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 2000000L).as("dst"))
      graft.graph.Components.connectedComponents(e1.unionByName(e2))
        .select(col("node"), col("label"))
    }),

    // training-window chunking: overlapping 20-token windows, 5-token overlap;
    // the oracle recomputes every window's token count and content md5
    "q65_chunking" -> ((s, dir) =>
      TextOps.chunkDocs(docs(s, dir), chunkTokens = 20, overlap = 5)),

    // shapefile scan end-to-end: synthesized .shp (multipoint corners) +
    // .dbf (dBASE 'D' date field) binary columns parsed by the pure-JVM
    // readers (reference: shapefiles via fiona, handle_vector.py; goldens vs
    // the reference's own fixtures in ShapefileGpkgSpec); the oracle rebuilds
    // every extent and tbox from the closed forms
    "q66_shapefile_extent" -> ((s, dir) => {
      val parseUdf = udf((shp: Array[Byte], dbf: Array[Byte]) => {
        val r = graft.parse.Shapefile.readShp(shp).get
        val tb = graft.parse.Shapefile.dbfTbox(dbf)
        (r.extent.minLon, r.extent.minLat, r.extent.maxLon, r.extent.maxLat,
          r.verts.length / 2, tb.map(_._1).orNull, tb.map(_._2).orNull)
      })
      graft.table.ShapeTable.shapes(s, dir)
        .select(col("doc_id"), parseUdf(col("shp"), col("dbf")).as("r"))
        .select(col("doc_id"),
          col("r._1").as("min_lon"), col("r._2").as("min_lat"),
          col("r._3").as("max_lon"), col("r._4").as("max_lat"),
          col("r._5").cast("long").as("n_verts"),
          col("r._6").as("tbox_start"), col("r._7").as("tbox_end"))
    }),

    // ESRI ASCII grid scan end-to-end: synthesized .asc text payloads
    // (4×3 grid anchored at the page's closed-form corner, cellsize from d)
    // parsed by the header reader; oracle rebuilds the corner arithmetic.
    // (Goldens for the real-world fixture incl. projected-CRS gating live in
    // GridFormatsSpec; FlatGeobuf likewise golden-only — synthesizing
    // flatbuffers would mean writing the format, which extraction never does.)
    "q67_asc_extent" -> ((s, dir) => {
      val buildUdf = udf((d: Long) => {
        val cs = (d % 5 + 1) * 0.1
        s"ncols 4\nnrows 3\nxllcorner ${graft.table.PayloadSpec.lon0(d)}\nyllcorner ${graft.table.PayloadSpec.lat0(d)}\ncellsize $cs\nNODATA_value -9999\n" +
          (0 until 3).map(_ => "1 2 3 4").mkString("\n")
      })
      val parseUdf = udf((text: String) => {
        val r = graft.parse.GridAscii.readAsc(text).get
        (r.extent.minLon, r.extent.minLat, r.extent.maxLon, r.extent.maxLat, r.ncols, r.nrows)
      })
      s.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("doc_id"))
        .select(col("doc_id"), parseUdf(buildUdf(col("doc_id"))).as("r"))
        .select(col("doc_id"),
          col("r._1").as("min_lon"), col("r._2").as("min_lat"),
          col("r._3").as("max_lon"), col("r._4").as("max_lat"),
          col("r._5").cast("long").as("ncols"), col("r._6").cast("long").as("nrows"))
    }),

    // JPEG2000 scan end-to-end: synthesized GMLJP2 .jp2 binary payloads
    // (4×3 grid anchored at the page's closed-form corner, exact-binary cell
    // sizes) parsed by the pure-JVM box-walk reader (reference: .jp2 via
    // GDAL, handle_raster.py; golden vs the reference's own
    // jpeg2000/MSK_SNWPRB_60m.jp2 incl. the UTM 32618 → 4326 two-corner
    // transform in Jp2Spec); the oracle rebuilds the grid arithmetic
    "q68_jp2_extent" -> ((s, dir) => {
      val parseUdf = udf((jp2: Array[Byte]) => {
        val r = graft.parse.Jp2.readJp2(jp2).get
        val e = graft.parse.Jp2.extentWgs84(r).get
        (e.minLon, e.minLat, e.maxLon, e.maxLat, r.width, r.height, r.epsg.get)
      })
      graft.table.Jp2Synth.jp2s(s, dir)
        .select(col("doc_id"), parseUdf(col("jp2")).as("r"))
        .select(col("doc_id"),
          col("r._1").as("min_lon"), col("r._2").as("min_lat"),
          col("r._3").as("max_lon"), col("r._4").as("max_lat"),
          col("r._5").cast("long").as("width"), col("r._6").cast("long").as("height"),
          col("r._7").cast("long").as("epsg"))
    }),

    // NetCDF scan end-to-end: synthesized minimal-HDF5 .nc binary payloads
    // (lat/lon cell-center axes + CF time var) parsed by the pure-JVM HDF5
    // reader (reference: .nc via GDAL/netCDF, handle_raster.py; goldens vs
    // the reference's own nc fixtures — incl. the superblock-v0 fractal-heap
    // zeroes.nc — in NetCdfSpec); the oracle rebuilds the half-step envelope
    // and the CF day arithmetic
    "q69_netcdf_extent" -> ((s, dir) => {
      val parseUdf = udf((nc: Array[Byte]) => {
        val r = graft.parse.NetCdf.read(nc).get
        val e = r.extent.get
        val tb = r.tbox.get
        (e.minLon, e.minLat, e.maxLon, e.maxLat, r.width, r.height, tb._1, tb._2)
      })
      graft.table.Hdf5Synth.ncs(s, dir)
        .select(col("doc_id"), parseUdf(col("nc")).as("r"))
        .select(col("doc_id"),
          col("r._1").as("min_lon"), col("r._2").as("min_lat"),
          col("r._3").as("max_lon"), col("r._4").as("max_lat"),
          col("r._5").cast("long").as("width"), col("r._6").cast("long").as("height"),
          col("r._7").as("tbox_start"), col("r._8").as("tbox_end"))
    }),

    // P3 per-payload convex hull from the payload's actual geometry vertices
    // (rect payloads → 4-corner hull with area=bw*bh; point payloads → 1 vertex)
    "q44_hull_extract" -> ((s, dir) => {
      val areaUdf = udf((ring: Seq[Double]) => {
        val pts = ring.grouped(2).map(p => (p(0), p(1))).toArray
        graft.geo.Geo.ringArea(pts)
      })
      extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"),
          (size(col("hull")) / 2).cast("long").as("n_vertices"),
          areaUdf(col("hull")).as("area"))
    }),

    // X3 bbox_to_geojson sink: extent → GeoJSON geometry string (Point for
    // degenerate extents, 5-vertex closed Polygon ring otherwise); the oracle
    // rebuilds the exact string with printf (reference:
    // geoextent/lib/helpfunctions.py:1732-1755)
    "q70_bbox_geojson" -> ((s, dir) => {
      val gjUdf = udf((a: Double, b: Double, c: Double, dd: Double) =>
        graft.geo.Wkt.extentToGeoJson(graft.geo.Extent(a, b, c, dd)))
      extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"),
          gjUdf(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")).as("gj"))
    }),

    // X8 axis-order swap: the reference's public API presents EPSG:4326 as
    // [lat, lon] while computing in GeoJSON [lon, lat] internally (reference:
    // geoextent/lib/extent.py:149-183) — presentation projection via
    // functions.Scalars.swapToLatLon
    "q71_axis_swap" -> ((s, dir) =>
      extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"),
          graft.functions.Scalars.swapToLatLon(
            col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")).as("sw"))
        .select(col("doc_id"), col("sw.min_lat"), col("sw.min_lon"),
          col("sw.max_lat"), col("sw.max_lon"))),

    // S10 GeoPackage sink ROUND-TRIP: the extraction summary written to an
    // actual .gpkg file by the from-scratch SQLite writer
    // (sinks.GeoPackageWrite; reference: create_geopackage,
    // geoextent/lib/helpfunctions.py:1268-1301), then re-read by the
    // golden-tested reader — the emitted rows are what a GeoPackage consumer
    // would see, oracle-checked against the closed-form extents. Driver-side
    // single-file sink by design (the reference's export is the same shape);
    // corpus-scale extents leave via parquet, not .gpkg.
    "q73_gpkg_roundtrip" -> ((s, dir) => {
      import s.implicits._
      // through the CAPPED writer entry (GeoPackageWrite.write refuses more
      // than maxRows): the only driver-side materialization in the query set
      // is bounded by construction — pointing this sink at a corpus fails
      // loudly with "write parquet instead" rather than OOMing the driver.
      // The exported slice is the first 50k extent-bearing pages by id
      // (orderBy+limit = TakeOrdered, a distributed top-k, never a full
      // sort-collect), so the summary artifact stays the same size at any sf
      val summary = extracted(s, dir).filter(col("min_lon").isNotNull)
        .orderBy(col("d")).limit(50000)
        .select(concat(lit("page_"), col("d")).as("filename"), col("handler"),
          lit("text/html").as("format"),
          lit(null).cast("string").as("tbox_start"),
          lit(null).cast("string").as("tbox_end"),
          lit("4326").as("crs"),
          col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
      val path = java.nio.file.Files.createTempFile("graft_q73_", ".gpkg")
      try {
        sinks.GeoPackageWrite.write(summary, path.toString, "2024-01-01T00:00:00.000Z")
        val bytes = java.nio.file.Files.readAllBytes(path)
        val db = parse.SqliteRead.open(bytes).get
        val rows = parse.SqliteRead.scanTable(db, parse.SqliteRead.tables(db)("files")._1)
        val out = rows.map { row =>
          val e = parse.GeoPackage.gpbEnvelope(row(1).asInstanceOf[Array[Byte]]).get
          (row(2).asInstanceOf[String].stripPrefix("page_").toLong,
            row(3).asInstanceOf[String], e.minLon, e.minLat, e.maxLon, e.maxLat)
        }
        s.createDataset(out.toSeq)
          .toDF("doc_id", "handler", "min_lon", "min_lat", "max_lon", "max_lat")
      } finally java.nio.file.Files.deleteIfExists(path)
    }),

    // S7 remote-provider dispatch (offline face): classify synthesized
    // identifiers through the full 38-rung ladder (providers.Dispatch,
    // golden-locked to the reference's own offline find_provider) — the
    // narrow classification pass a link-corpus run performs before any
    // fetch. Oracle rebuilds each family's expected (provider, record id)
    // with plain SQL string ops.
    "q74_provider_dispatch" -> ((s, dir) => {
      val dispatchUdf = udf((ref: String) => {
        graft.providers.Dispatch.validateOffline(ref) match {
          case Some(m) => (m.provider, m.ids.filter(_._1 != "instance").values.toSeq.sorted.headOption.orNull)
          case None => (null, null)
        }
      })
      val idUdf = udf((d: Long) => (d % 8) match {
        case 0 => s"https://zenodo.org/records/$d"
        case 1 => s"10.1594/PANGAEA.$d"
        case 2 => s"10.17632/abc$d.2"
        case 3 => s"https://github.com/user/repo$d"
        case 4 => s"https://example.com/tiles/$d.tif"
        case 5 => s"Q$d"
        case 6 => s"10.17882/$d"
        case _ => s"https://unknown.example.org/page/$d"
      })
      s.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("doc_id"))
        .select(col("doc_id"), dispatchUdf(idUdf(col("doc_id"))).as("r"))
        .select(col("doc_id"), col("r._1").as("provider"), col("r._2").as("rid"))
    }),

    // S12 geojson.io URL sink: FeatureCollection percent-encoded into a
    // data-URI fragment (urllib.parse.quote semantics); the oracle rebuilds
    // the full URL with an explicit replace chain over the JSON's closed
    // character set (reference: geoextent/lib/helpfunctions.py:2173-2325)
    "q72_geojsonio_url" -> ((s, dir) => {
      val urlUdf = udf((a: Double, b: Double, c: Double, dd: Double) =>
        graft.geo.Wkt.geojsonIoUrl(graft.geo.Extent(a, b, c, dd)).orNull)
      extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"),
          urlUdf(col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")).as("url"))
    }),

    // Streaming sessionization, driver-checkable: the events table replayed
    // as an ordered multi-batch file stream (streaming.Replay staging
    // contract — no late drops, sentinel-driven final flush) through
    // sessionizeStream's watermark-sealed cross-batch state, into a parquet
    // file sink. The emitted set equals the canonical batch gap-split, which
    // the oracle computes with lag/sum window SQL — so this row checks the
    // genuinely streamed execution path end-to-end. total_value is omitted
    // from the compared projection (a cross-engine double SUM is not
    // bit-reproducible; n_events/min/max are).
    "q75_sessions_stream" -> ((s, dir) => {
      import s.implicits._
      val staged = streaming.Replay.stageEventReplay(s, dir)
      val evSchema = org.apache.spark.sql.Encoders.product[streaming.EventWindows.Event].schema
      val in = s.readStream.schema(evSchema).option("maxFilesPerTrigger", "1")
        .parquet(staged.dataDir).as[streaming.EventWindows.Event]
      val sessions = streaming.EventWindows.sessionizeStream(in, "30 minutes", gapMinutes = 30)
      streaming.Replay.runToParquet(s, sessions.toDF, staged.root)
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))
    }),

    // Streaming watermarked tumbling-window aggregation over the same
    // ordered replay: the sealed-window append output must equal the batch
    // q27 answer row-for-row (same oracle SQL), moving the windowed-agg
    // stream surface from ScalaTest parity onto a CORRECTNESS row.
    "q76_window_stream" -> ((s, dir) => {
      val staged = streaming.Replay.stageEventReplay(s, dir)
      val evSchema = org.apache.spark.sql.Encoders.product[streaming.EventWindows.Event].schema
      val in = s.readStream.schema(evSchema).option("maxFilesPerTrigger", "1")
        .parquet(staged.dataDir)
      streaming.Replay.runToParquet(s, streaming.EventWindows.windowedCounts(in), staged.root)
        .filter(col("event_type") =!= "sentinel")
        .select(date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("event_type"), col("cnt"), col("min_value"), col("max_value"))
    }),

    // substring-level (window) dedup over the planted-dup corpus: per doc,
    // how many of its sliding 8-token windows occur verbatim in ≥2 distinct
    // docs — the hash-window analog of exact-substring training-data dedup
    // (Lee et al. 2022); planted exact copies duplicate EVERY window, the
    // near/rep trailers duplicate all but the boundary-crossing ones, and the
    // oracle recomputes the whole thing from the text
    "q77_span_dedup" -> ((s, dir) =>
      TextOps.spanDupStats(docsDup(s, dir), w = 8)),

    // corpus cardinality sketch: per-language KMV (k=32) distinct-text count
    // — the sketch (k minima of md5) and its estimator are deterministic, so
    // the oracle reproduces est_distinct bit-for-bit; languages with < k
    // distinct texts exercise the exact branch, the rest the estimator branch
    "q78_kmv_distinct" -> ((s, dir) =>
      text.Sketches.kmvDistinct(docs(s, dir), col("text"), col("lang"), k = 32)
        .withColumnRenamed("grp", "lang")),

    // SemDeDup (semantic dedup over embedding clusters): planted byte-exact
    // clones AND 2x-scaled clones (cos exactly ~1.0, different bytes — they
    // exercise the non-identity path) must be dropped; every base vector must
    // survive (natural pairwise cosines measure <= 0.61 at every sf vs
    // tau=0.8 — margin asserted in DedupSpec so the oracle stays exact)
    "q79_semdedup" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val scaled = emb.filter(col("vec_id") % 20 === 10)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
      val embDup = emb.select("vec_id", "embedding")
        .unionByName(emb.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
        .unionByName(scaled)
      Ann.semDedup(embDup, tau = 0.8, nCentroids = 16)
        .select(col("vec_id"), col("kept").cast("long").as("kept"))
    }),

    // deterministic sampled quantiles of per-language doc byte-length: the
    // md5-threshold sample (q56 idiom) is drawn identically by the oracle, so
    // the percentile_disc values match exactly — the portable replacement for
    // percentile_approx when corpus distribution reports must be auditable
    "q80_quantile_sketch" -> ((s, dir) =>
      text.Sketches.sampledQuantiles(docs(s, dir),
          octet_length(col("text")), col("lang"), col("doc_id"),
          salt = "quant-7", thresholdHex = "55", probs = Seq(0.25, 0.5, 0.75, 0.95))
        .withColumnRenamed("grp", "lang")),

    // north_rule resumability as a CORRECTNESS row: the extent merge runs
    // through Snapshots.resumableBatched (8 deterministic d%8 file-group
    // batches; batch 0 is structurally empty — d%8 = l_linenumber ∈ 1..7 —
    // and exercises the empty-snapshot path) with a kill injected after 3
    // committed batches on the first pass. The restart MUST skip the
    // committed batches (asserted below — the query errors if resume
    // recomputes them) and the union of the durable sub-snapshots must equal
    // the plain one-pass group-by, which the oracle computes directly.
    "q81_resume_merge" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-q81").toString
      val keys = (0 until 8).map(_.toString)
      def batchMerge(b: String): DataFrame =
        extracted(s, dir)
          .filter(col("min_lon").isNotNull && col("d") % 8 === b.toInt)
          .groupBy((col("d") % 8).as("batch"), (col("d") % 97).as("g"))
          .agg(count(lit(1)).as("n_ext"),
            min("min_lon").as("min_lon"), min("min_lat").as("min_lat"),
            max("max_lon").as("max_lon"), max("max_lat").as("max_lat"))
      var calls = 0
      try {
        table.Snapshots.resumableBatched(s, root, "resume_merge", keys) { b =>
          calls += 1
          if (calls > 3) throw new IllegalStateException("injected-kill")
          batchMerge(b)
        }
        ()
      } catch { case e: IllegalStateException if e.getMessage == "injected-kill" => () }
      val recomputed = scala.collection.mutable.ArrayBuffer.empty[String]
      val out = table.Snapshots.resumableBatched(s, root, "resume_merge", keys) { b =>
        recomputed += b; batchMerge(b)
      }
      require(recomputed.toList == keys.drop(3).toList,
        s"resume must skip the 3 committed batches; recomputed=${recomputed.toList}")
      out.select(col("batch"), col("g"), col("n_ext"),
        col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
    }),

    // skew detection as a first-class operator: exact frequent cells via
    // per-partition Misra–Gries(20) candidates + exact verify (operators.
    // HeavyHitters) — keys with count·21 > n. The corpus plants a genuine
    // hot cell (20 % of pages share one location, the salting test bed), so
    // this is the detector that justifies SkewPlanner's salting decision,
    // never shuffling the full key set. The MG sketch is output-invisible
    // (superset property); the oracle recomputes the exact answer directly.
    "q82_heavy_cells" -> ((s, dir) => {
      val cells = withCentroid(extracted(s, dir))
        .withColumn("cell2", CellEncode(col("latc"), col("lonc"), Pages.JoinZoom))
      operators.HeavyHitters.heavyHitters(cells, col("cell2"), k = 20)
        .select(Tiler.txUdf(col("key")).cast("long").as("tx"),
          Tiler.tyUdf(col("key")).cast("long").as("ty"),
          col("cnt"), col("n_total"))
    }),

    // as-of join (join.AsOfJoin, the union+window one-shuffle shape): every
    // click event matched to the latest same-user view event at or before
    // it, left-outer. The right side is pre-aggregated to one row per
    // (user_id, ts) so tie-breaking is deterministic; the oracle is DuckDB's
    // NATIVE ASOF LEFT JOIN — an independent implementation of the same
    // semantics, not a mirror of the union trick.
    "q83_asof_join" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("value").as("view_value"))
      join.AsOfJoin.asofBackward(clicks, views, key = "user_id", ts = "ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("ts_right"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
          col("view_value"))
    }),

    // storage-layout optimization as a CORRECTNESS row (table.ZOrder): the
    // extent table is written clustered on the Morton z-curve, then a bbox
    // query is answered by MANIFEST-stats file skipping (the per-file
    // footer extents Snapshots records) + the exact intersection filter.
    // Pruning must be output-invisible — the oracle is the plain bbox
    // predicate — and effective: the query fails unless more than half the
    // files were skipped (asserted in-query; the Europe box touches ~21 % of
    // rows but a compact z-range of files).
    "q84_zorder_scan" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-q84").toString
      val ext = extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d"), col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
      table.ZOrder.writeClustered(ext, root, "zorder_extents",
        (col("min_lat") + col("max_lat")) / 2, (col("min_lon") + col("max_lon")) / 2,
        zoom = 12, partitions = 64)
      // pruning EFFECTIVENESS (read*2 < total) is a performance property,
      // asserted in ZOrderSpec — embedding it here made a partition-count or
      // file-sizing change throw instead of surfacing as an oracle diff; the
      // CORRECTNESS row verifies only output-invisibility of the pruned read
      val (rows, _, _) = table.ZOrder.readBbox(s, root, 0.0, 40.0, 20.0, 55.0)
      rows.select(col("d").as("doc_id"),
        col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
    }),

    // EXACT Jaccard-threshold self-join (text.JaccardJoin, AllPairs prefix
    // filtering + exact verify) over the exact-dup-pre-collapsed planted
    // corpus at τ = 4/5 — the exact counterpart of q23's LSH: no false
    // negatives by construction, all-integer threshold test, so the oracle
    // recomputes the full answer from scratch with no candidate stage at all.
    // The planted near pairs (1-token trailer) land at J ≈ 0.89+ and the
    // repetition pairs (text doubled) at n/(n+2) ≥ 0.8 — including the
    // exact-boundary 8-shingle docs, where 5·8 ≥ 4·10 ties are kept.
    "q85_jaccard_join" -> ((s, dir) => {
      val canon = docsDup(s, dir).groupBy("text").agg(min("doc_id").as("doc_id"))
      text.JaccardJoin.jaccardJoin(canon.select("doc_id", "text"), tauNum = 4, tauDen = 5)
    }),

    // distance-threshold spatial join (join.SpatialJoins.distanceJoin): all
    // page centroids within 6 planar degrees of each nation probe — one grid
    // pass where each probe certifies its own cell-disk radius via
    // diskBound2 before exploding, so the join is cell-equi and candidates
    // are disk-proportional (never a cross join). Same probe construction
    // and squared-degree metric as q08, so the oracle is the plain predicate.
    "q86_distance_join" -> ((s, dir) => {
      val pts = withCentroid(extracted(s, dir))
        .select(col("d").as("pid"), col("lonc").as("lon"), col("latc").as("lat"))
      val qrows = s.read.parquet(s"$dir/nation.parquet").limit(10001).collect()
      require(qrows.length <= 10000, "probe side exceeds driver cap; distribute the query side")
      import s.implicits._
      val qs = qrows.toSeq.map { r =>
        val n = r.getAs[Int]("n_nationkey").toLong
        val (x0, y0, _, _) = Pages.polyBounds(n)
        (n, x0 + 12.0, y0 + 9.0)
      }.toDF("qid", "qlon", "qlat")
      // skew-aware: the planted 20%-hot location makes one grid cell own a
      // fifth of the corpus — the Misra–Gries detector measures it and the
      // hot cell's candidates fan out over salted reducers; the result set
      // is identical to the unsalted join (JoinsSpec property)
      join.SpatialJoins.distanceJoinSkewAware(qs, pts, radiusDeg = 6.0)
    }),

    // big×big extent-overlap join (join.SpatialJoins.extentOverlapJoin):
    // every page extent intersecting every 97th raster extent — grid
    // cell-equi join + exact rect residual, pairs deduplicated by PBSM
    // reporting-cell (emitted only where the overlap's min corner lands), so
    // there is NO distinct shuffle. The oracle computes the same pair set
    // through an independent 10°-lon-band bucketing + DISTINCT.
    "q87_extent_overlap" -> ((s, dir) => {
      // the synthetic lineitem duplicates some (orderkey, linenumber) pairs
      // (60k rows, 45,832 distinct d at sf0.01) — dedup the extent rows so a
      // page pairs once however many corpus rows carry it (oracle mirrors)
      val pext = extracted(s, dir).filter(col("min_lon").isNotNull)
        .select(col("d").as("doc_id"),
          col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
        .distinct()
      val rext = graft.table.RasterTable.extents(graft.table.RasterTable.rasters(s, dir))
        .filter(col("raster_id") % 97 === 0)
        .select(col("raster_id"), col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat"))
      // skew-aware (VERDICT r5 task 3): detector → salt factor → salted
      // cover-cell join; the planted hot cell fans out, the pair set is
      // unchanged (salting commutes with the residual + reporting-cell dedup)
      join.SpatialJoins.extentOverlapJoinSkewAware(pext, "doc_id", rext, "raster_id")
        .select(col("doc_id"), col("raster_id").cast("long").as("raster_id"))
    }),
  )

  // ---------------------------------------------------------------- oracles

  /** Shared closed-form CTE: per-page expected kind/extent/tbox (mirrors
    * graft.table.PayloadSpec exactly — see that file for the contract).
    */
  /** q50 oracle VALUES, serialized from the bundled gazetteer: point entries
    * (top-ranked hit) and region rectangle rings (ring corners 0/1 and 4/5 of
    * the closed interleaved rect). Data mirroring, same contract as the EXT
    * closed forms.
    */
  private def gazPointValuesSql: String =
    graft.parse.GazetteerTable.entries.sortBy(_.name)
      .map(en => s"('${en.name}', ${en.hits.head._1}, ${en.hits.head._2})")
      .mkString(",\n  ")
  private def gazRegionValuesSql: String =
    graft.parse.GazetteerTable.regions.sortBy(_.name)
      .map { en =>
        val r = en.ring.get
        s"('${en.name}', ${r(0)}, ${r(1)}, ${r(4)}, ${r(5)})"
      }.mkString(",\n  ")

  private val EXT: String =
    """WITH p0 AS (SELECT (l_orderkey*8 + l_linenumber) AS d FROM lineitem),
p1 AS (SELECT d, (d % 10) AS k,
  CASE WHEN (d % 100) >= 80 THEN 7.5 ELSE ((d*7) % 680)/2.0 - 170.0 END AS lon0,
  CASE WHEN (d % 100) >= 80 THEN 51.5 ELSE ((d*3) % 320)/2.0 - 80.0 END AS lat0,
  CASE WHEN (d % 100) >= 80 THEN 1.0 ELSE (d % 5)/2.0 + 0.5 END AS bw,
  CASE WHEN (d % 100) >= 80 THEN 0.5 ELSE (d % 7)/4.0 + 0.25 END AS bh,
  DATE '2015-01-01' + CAST(d % 1000 AS INTEGER) AS dd,
  DATE '2015-01-01' + CAST(d % 1000 AS INTEGER) + CAST(d % 30 AS INTEGER) AS de,
  CASE CAST((d//10) % 5 AS INTEGER) WHEN 0 THEN 4.875 WHEN 1 THEN 13.375 WHEN 2 THEN 2.375 WHEN 3 THEN -3.625 ELSE 12.5 END AS plon,
  CASE CAST((d//10) % 5 AS INTEGER) WHEN 0 THEN 52.375 WHEN 1 THEN 52.5 WHEN 2 THEN 48.875 WHEN 3 THEN 40.5 ELSE 41.875 END AS plat,
  (d % 3 = 0) AS hasper,
  CAST((d//10) % 4 AS INTEGER) AS peri
  FROM p0),
p2 AS (SELECT *, lon0+bw AS lon1, lat0+bh AS lat1,
  CASE WHEN k IN (0,1,2) THEN 'vector' WHEN k IN (3,4) THEN 'csv' WHEN k IN (5,6,7) THEN 'html' ELSE 'text' END AS handler,
  CASE CAST(d % 4 AS INTEGER) WHEN 2 THEN CAST(date_trunc('year', dd) AS DATE)
       WHEN 3 THEN CAST(date_trunc('year', dd) AS DATE) ELSE dd END AS ds8,
  CASE CAST(d % 4 AS INTEGER) WHEN 2 THEN make_date(CAST(year(de) AS INTEGER), 12, 31)
       WHEN 3 THEN make_date(CAST(year(dd) AS INTEGER), 3, 31) ELSE de END AS de8
  FROM p1),
ext AS (SELECT d, k, handler, dd, de, hasper, peri, plon, plat,
  CASE WHEN k <= 6 THEN lon0 WHEN k = 7 AND NOT (lon0 = 0 AND lat0 = 0) THEN lon0 WHEN k = 8 THEN plon END AS min_lon,
  CASE WHEN k <= 6 THEN lat0 WHEN k = 7 AND NOT (lon0 = 0 AND lat0 = 0) THEN lat0 WHEN k = 8 THEN plat END AS min_lat,
  CASE WHEN k <= 6 THEN lon1 WHEN k = 7 AND NOT (lon0 = 0 AND lat0 = 0) THEN lon0 WHEN k = 8 THEN plon END AS max_lon,
  CASE WHEN k <= 6 THEN lat1 WHEN k = 7 AND NOT (lon0 = 0 AND lat0 = 0) THEN lat0 WHEN k = 8 THEN plat END AS max_lat,
  CASE WHEN k IN (0,1,2,3,5,6) THEN strftime(dd, '%Y-%m-%d')
       WHEN k = 8 AND hasper THEN (CASE peri WHEN 0 THEN '-9750-01-01' WHEN 1 THEN '-2578050-01-01' WHEN 2 THEN '-201298050-01-01' ELSE '-144998050-01-01' END)
       WHEN k = 8 THEN strftime(ds8, '%Y-%m-%d') END AS tbox_start,
  CASE WHEN k IN (0,1,2,3) THEN strftime(dd, '%Y-%m-%d')
       WHEN k IN (5,6) THEN strftime(de, '%Y-%m-%d')
       WHEN k = 8 THEN strftime(de8, '%Y-%m-%d') END AS tbox_end
  FROM p2)
"""

  private val MERC16 =
    "CAST(floor((0.5 - ln((1.0+sin(radians(%s)))/(1.0-sin(radians(%s))))/(4.0*pi()))*16.0) AS BIGINT)"
  private val MERC64 =
    "CAST(floor((0.5 - ln((1.0+sin(radians(%s)))/(1.0-sin(radians(%s))))/(4.0*pi()))*64.0) AS BIGINT)"

  def oracleSql: Map[String, String] = Map(
    "q01_extract_extent" -> (EXT +
      "SELECT d AS doc_id, handler, min_lon, min_lat, max_lon, max_lat FROM ext"),

    "q02_extract_tbox" -> (EXT +
      "SELECT d AS doc_id, tbox_start, tbox_end FROM ext"),

    "q03_handler_counts" -> (EXT +
      "SELECT handler, CAST(count(*) AS BIGINT) AS cnt FROM ext GROUP BY 1"),

    // each planted component = {base, base+1e6?, base+2e6?} with min = base
    "q64_dedup_clusters" ->
      """SELECT doc_id AS node, doc_id AS label FROM documents WHERE doc_id % 20 = 0 OR doc_id % 25 = 0
UNION ALL SELECT doc_id + 1000000 AS node, doc_id AS label FROM documents WHERE doc_id % 20 = 0
UNION ALL SELECT doc_id + 2000000 AS node, doc_id AS label FROM documents WHERE doc_id % 25 = 0""",

    "q65_chunking" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws FROM documents),
n AS (SELECT doc_id, ws, len(ws) AS n FROM w),
c AS (SELECT doc_id, ws, n,
  CASE WHEN n <= 20 THEN 1 ELSE ((n - 20 + 14) // 15) + 1 END AS nc FROM n),
e AS (SELECT doc_id, ws, n, g.i - 1 AS chunk_idx
  FROM c, LATERAL unnest(generate_series(1, nc)) AS g(i)),
s AS (SELECT doc_id, chunk_idx,
  ws[chunk_idx * 15 + 1 : least(chunk_idx * 15 + 20, n)] AS toks FROM e)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  md5(array_to_string(toks, ' ')) AS chunk_md5 FROM s""",

    "q67_asc_extent" -> (EXT +
      """SELECT d AS doc_id, lon0 AS min_lon, lat0 AS min_lat,
  lon0 + CAST(4 AS DOUBLE) * ((d % 5 + 1) * CAST(0.1 AS DOUBLE)) AS max_lon,
  lat0 + CAST(3 AS DOUBLE) * ((d % 5 + 1) * CAST(0.1 AS DOUBLE)) AS max_lat,
  CAST(4 AS BIGINT) AS ncols, CAST(3 AS BIGINT) AS nrows
FROM p1"""),

    // bounds oracle: every invariant boolean must be TRUE for every group
    // that has at least one extent-bearing member (see q11's query comment)
    "q11_hull_merge" -> (EXT +
      """SELECT DISTINCT d % 97 AS g, TRUE AS area_in_bounds,
  TRUE AS verts_subset, TRUE AS n_vertices_ok
FROM ext WHERE min_lon IS NOT NULL"""),

    "q68_jp2_extent" -> (EXT +
      """SELECT d AS doc_id, lon0 AS min_lon, lat0 AS min_lat,
  lon0 + CAST(4 AS DOUBLE) * ((d % 5 + 1) * CAST(0.25 AS DOUBLE)) AS max_lon,
  lat0 + CAST(3 AS DOUBLE) * ((d % 7 + 1) * CAST(0.125 AS DOUBLE)) AS max_lat,
  CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
  CAST(4326 AS BIGINT) AS epsg
FROM p1"""),

    "q69_netcdf_extent" -> (EXT +
      """SELECT d AS doc_id, lon0 AS min_lon, lat0 AS min_lat,
  lon0 + CAST(4 AS DOUBLE) * ((d % 5 + 1) * CAST(0.25 AS DOUBLE)) AS max_lon,
  lat0 + CAST(3 AS DOUBLE) * ((d % 7 + 1) * CAST(0.125 AS DOUBLE)) AS max_lat,
  CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
  strftime(dd, '%Y-%m-%d') AS tbox_start, strftime(de, '%Y-%m-%d') AS tbox_end
FROM p1"""),

    "q66_shapefile_extent" -> (EXT +
      """SELECT d AS doc_id, lon0 AS min_lon, lat0 AS min_lat,
  lon0 + bw AS max_lon, lat0 + bh AS max_lat, CAST(4 AS BIGINT) AS n_verts,
  strftime(dd, '%Y-%m-%d') AS tbox_start, strftime(de, '%Y-%m-%d') AS tbox_end
FROM p1"""),

    "q63_budget_partial" -> (EXT +
      """SELECT d AS doc_id,
  CASE WHEN substr(md5('deadline-0:' || d), 1, 2) < '40' THEN handler ELSE 'timeout' END AS handler,
  CASE WHEN substr(md5('deadline-0:' || d), 1, 2) < '40' THEN min_lon END AS min_lon,
  CASE WHEN substr(md5('deadline-0:' || d), 1, 2) < '40' THEN min_lat END AS min_lat,
  CASE WHEN substr(md5('deadline-0:' || d), 1, 2) < '40' THEN max_lon END AS max_lon,
  CASE WHEN substr(md5('deadline-0:' || d), 1, 2) < '40' THEN max_lat END AS max_lat,
  substr(md5('deadline-0:' || d), 1, 2) >= '40' AS timed_out
FROM ext"""),

    "q61_url_canonical" ->
      """WITH u AS (SELECT (l_orderkey*8 + l_linenumber) AS d FROM lineitem),
u2 AS (SELECT d, 'HTTPS://WWW.Example-' || (d % 7) || '.ORG'
  || CASE WHEN d % 3 = 0 THEN ':443' ELSE '' END
  || '/Pages/p' || d
  || CASE WHEN d % 4 = 1 THEN '#section-2' WHEN d % 4 = 2 THEN '/' ELSE '' END AS url FROM u),
c1 AS (SELECT d, regexp_replace(url, '#.*$', '') AS nofrag FROM u2),
c2 AS (SELECT d,
  lower(regexp_extract(nofrag, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) AS auth,
  regexp_replace(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS rest FROM c1),
c3 AS (SELECT d,
  CASE WHEN regexp_matches(auth, '^https://.*:443$') THEN regexp_replace(auth, ':443$', '')
       WHEN regexp_matches(auth, '^http://.*:80$') THEN regexp_replace(auth, ':80$', '')
       ELSE auth END AS auth1, rest FROM c2),
c4 AS (SELECT d,
  regexp_replace(regexp_replace(auth1, '://www\.', '://') || rest, '/$', '') AS canon FROM c3)
SELECT d AS doc_id, canon AS canon_url,
  regexp_extract(canon, '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1) AS host FROM c4""",

    "q62_host_sample" ->
      """WITH u AS (SELECT (l_orderkey*8 + l_linenumber) AS d FROM lineitem)
SELECT d AS doc_id, 'example-' || (d % 7) || '.org' AS host FROM u
WHERE substr(md5('mix-7:' || d), 1, 2) <
  CASE (d % 7) WHEN 0 THEN 'e6' WHEN 1 THEN 'cc' WHEN 2 THEN '99'
    WHEN 3 THEN '66' WHEN 4 THEN '4d' WHEN 5 THEN '33' ELSE '1a' END""",

    "q60_archive_expand" -> (EXT +
      """SELECT archive_id, n_pages, n_with_extent, min_lon, min_lat, max_lon, max_lat,
  CASE WHEN archive_id % 3 = 0 THEN 'zip' WHEN archive_id % 3 = 1 THEN 'tar' ELSE 'tgz' END AS fmt
FROM (SELECT (d // 8) AS archive_id, CAST(count(*) AS BIGINT) AS n_pages,
  CAST(count(min_lon) AS BIGINT) AS n_with_extent,
  min(min_lon) AS min_lon, min(min_lat) AS min_lat,
  max(max_lon) AS max_lon, max(max_lat) AS max_lat
  FROM (SELECT DISTINCT * FROM ext) GROUP BY 1)"""),

    "q04_bbox_merge" -> (EXT +
      """SELECT (d % 97) AS g, CAST(count(min_lon) AS BIGINT) AS n_ext,
min(min_lon) AS min_lon, min(min_lat) AS min_lat, max(max_lon) AS max_lon, max(max_lat) AS max_lat
FROM ext WHERE min_lon IS NOT NULL GROUP BY 1"""),

    "q05_tbox_merge" -> (EXT +
      """, t AS (SELECT (d % 97) AS g, tbox_start, tbox_end,
  CASE WHEN tbox_start LIKE '-%' THEN (CASE peri WHEN 0 THEN -97499899 WHEN 1 THEN -25780499899 WHEN 2 THEN -2012980499899 ELSE -1449980499899 END)
       ELSE CAST(strftime(CAST(tbox_start AS DATE), '%Y%m%d') AS BIGINT) END AS skey,
  CAST(strftime(CAST(tbox_end AS DATE), '%Y%m%d') AS BIGINT) AS ekey
FROM ext WHERE tbox_start IS NOT NULL)
SELECT g, arg_min(tbox_start, skey) AS tbox_start, arg_max(tbox_end, ekey) AS tbox_end FROM t GROUP BY g"""),

    "q06_cell_encode" -> (EXT +
      s""", c AS (SELECT d, (min_lon+max_lon)/2 AS lonc, (min_lat+max_lat)/2 AS latc FROM ext WHERE min_lon IS NOT NULL)
SELECT d AS doc_id, CAST(floor((lonc+180.0)/360.0*16.0) AS BIGINT) AS tx,
${MERC16.format("latc", "latc")} AS ty FROM c"""),

    "q07_pip_join" -> (EXT +
      """SELECT e.d AS doc_id, CAST(n.n_nationkey AS BIGINT) AS poly_id
FROM ext e JOIN nation n ON
  (e.min_lon+e.max_lon)/2 > ((n.n_nationkey*37) % 300) - 150 + 0.015625 AND
  (e.min_lon+e.max_lon)/2 < ((n.n_nationkey*37) % 300) - 150 + 0.015625 + 24.0 AND
  (e.min_lat+e.max_lat)/2 > ((n.n_nationkey*23) % 130) - 65 + 0.015625 AND
  (e.min_lat+e.max_lat)/2 < ((n.n_nationkey*23) % 130) - 65 + 0.015625 + 18.0
WHERE e.min_lon IS NOT NULL"""),

    "q08_knn_join" -> (EXT +
      """, nat AS (SELECT CAST(n_nationkey AS BIGINT) AS qid,
  ((n_nationkey*37) % 300) - 150 + 0.015625 + 12.0 AS qlon,
  ((n_nationkey*23) % 130) - 65 + 0.015625 + 9.0 AS qlat FROM nation),
c AS (SELECT qid, e.d AS pid,
  ((e.min_lon+e.max_lon)/2 - qlon)*((e.min_lon+e.max_lon)/2 - qlon) +
  ((e.min_lat+e.max_lat)/2 - qlat)*((e.min_lat+e.max_lat)/2 - qlat) AS dist2
  FROM nat, ext e WHERE e.min_lon IS NOT NULL),
r AS (SELECT qid, pid, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, pid) AS rank FROM c)
SELECT qid, CAST(rank AS BIGINT) AS rank, pid, dist2 FROM r WHERE rank <= 5"""),

    "q09_temporal_join" -> (EXT +
      """, qs AS (SELECT unnest(generate_series(DATE '2015-01-01', DATE '2017-10-01', INTERVAL 3 MONTH)) AS q0),
q2 AS (SELECT CAST(q0 AS DATE) AS q_start, CAST(q0 + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS q_end FROM qs),
t AS (SELECT CAST(tbox_start AS DATE) AS t_start, CAST(tbox_end AS DATE) AS t_end FROM ext
      WHERE tbox_start IS NOT NULL AND tbox_start NOT LIKE '-%')
SELECT strftime(q.q_start, '%Y-%m-%d') AS q_start, CAST(count(*) AS BIGINT) AS cnt
FROM q2 q JOIN t ON t.t_start <= q.q_end AND q.q_start <= t.t_end GROUP BY 1"""),

    "q10_tiles" -> (EXT +
      s""", e AS (SELECT d, min_lon, min_lat, max_lon, max_lat,
  CAST(floor((min_lon+180.0)/360.0*64.0) AS BIGINT) AS tx0,
  CAST(floor((max_lon+180.0)/360.0*64.0) AS BIGINT) AS tx1,
  ${MERC64.format("max_lat", "max_lat")} AS ty0,
  ${MERC64.format("min_lat", "min_lat")} AS ty1
  FROM ext WHERE min_lon IS NOT NULL),
a AS (SELECT d, min_lon, min_lat, max_lon, max_lat, gx.tx AS tx, gy.ty AS ty
  FROM e, LATERAL unnest(generate_series(tx0, tx1)) AS gx(tx), LATERAL unnest(generate_series(ty0, ty1)) AS gy(ty))
SELECT tx, ty, CAST(count(*) AS BIGINT) AS cnt,
  min(min_lon) AS min_lon, min(min_lat) AS min_lat, max(max_lon) AS max_lon, max(max_lat) AS max_lat
FROM a GROUP BY 1,2"""),

    "q12_wkt" -> (EXT +
      """SELECT d AS doc_id,
CASE WHEN max_lon - min_lon <= 0.000001 AND max_lat - min_lat <= 0.000001
  THEN 'POINT (' || printf('%.6f', min_lon) || ' ' || printf('%.6f', min_lat) || ')'
  ELSE 'POLYGON ((' || printf('%.6f', min_lon) || ' ' || printf('%.6f', min_lat) || ', ' ||
       printf('%.6f', max_lon) || ' ' || printf('%.6f', min_lat) || ', ' ||
       printf('%.6f', max_lon) || ' ' || printf('%.6f', max_lat) || ', ' ||
       printf('%.6f', min_lon) || ' ' || printf('%.6f', max_lat) || ', ' ||
       printf('%.6f', min_lon) || ' ' || printf('%.6f', min_lat) || '))'
END AS wkt FROM ext WHERE min_lon IS NOT NULL"""),

    "q13_export_union" -> (EXT +
      "SELECT d AS doc_id, handler FROM ext WHERE min_lon IS NOT NULL AND handler IN ('vector','csv')"),

    "q14_anti_join" ->
      "SELECT doc_id FROM documents WHERE doc_id % 13 <> 0",

    "q15_cumsum_select" ->
      """SELECT doc_id, n_chars, cum_size FROM (
SELECT doc_id, n_chars, CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_size
FROM documents) WHERE cum_size <= 50000""",

    "q16_topk" ->
      """SELECT lang, rank, doc_id, n_chars FROM (
SELECT lang, doc_id, n_chars, CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
FROM documents) WHERE rank <= 3""",

    "q17_dedup_exact" -> (DUP +
      """SELECT md5(text) AS content_hash, CAST(count(*) AS BIGINT) AS cnt, min(doc_id) AS canonical_doc
FROM docs2 GROUP BY 1 HAVING count(*) > 1"""),

    "q25_jaccard_verify" -> (DUP +
      """, toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM docs2),
tn AS (SELECT doc_id, t, len(t) AS n FROM toks),
sh AS (SELECT DISTINCT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
  FROM tn, LATERAL unnest(generate_series(1, n-2)) AS g(i) WHERE n >= 3),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b FROM documents WHERE doc_id % 20 = 0
  UNION ALL SELECT doc_id, doc_id + 2000000 FROM documents WHERE doc_id % 25 = 0
  UNION ALL SELECT doc_id, doc_id + 1 FROM documents WHERE doc_id % 10 = 5 AND (doc_id + 1) IN (SELECT doc_id FROM documents)
),
inter AS (SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p JOIN sh a ON a.doc_id = p.doc_a JOIN sh b ON b.doc_id = p.doc_b AND a.s = b.s
  GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
  CAST(coalesce(i.i, 0) AS DOUBLE) / (ca.n + cb.n - coalesce(i.i, 0)) AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
JOIN cnt ca ON ca.doc_id = p.doc_a
JOIN cnt cb ON cb.doc_id = p.doc_b"""),

    "q18_fingerprint" ->
      "SELECT doc_id, substr(md5(text), 1, 15) AS fp_hex FROM documents",

    // containment contract: every planted trailer-near pair must be emitted,
    // no planted exact pair may be (pre-collapsed), and every emitted pair
    // must honor the structural band contract — recomputed signature
    // agreement >= rowsPerBand (any violation adds a 'badpair' row the
    // oracle doesn't have)
    // exact-dup-collapse-aware expectation (see plantedPairs): one pair per
    // text group with planted members — (group canonical, min planted + off)
    "q23_minhash_pairs" ->
      """WITH g AS (SELECT min(doc_id) AS doc_a,
  min(CASE WHEN doc_id % 25 = 0 THEN doc_id END) AS minp
  FROM documents GROUP BY text)
SELECT doc_a, minp + 2000000 AS doc_b, 'near' AS kind FROM g WHERE minp IS NOT NULL""",

    "q24_simhash_pairs" ->
      """WITH g AS (SELECT min(doc_id) AS doc_a,
  min(CASE WHEN doc_id % 25 = 5 THEN doc_id END) AS minp
  FROM documents GROUP BY text)
SELECT doc_a, minp + 3000000 AS doc_b, 'rep' AS kind FROM g WHERE minp IS NOT NULL""",

    "q43_embed_neardup" ->
      "SELECT vec_id AS vec_a, vec_id + 1000000 AS vec_b, CAST(1.0 AS DOUBLE) AS cos FROM embeddings WHERE vec_id % 20 = 0",

    // containment contract: an identical planted clone shares every LSH
    // bucket, so it must be retrieved and must rank first
    "q32_ann_lsh" ->
      "SELECT vec_id AS pid, CAST(1 AS BIGINT) AS rank, vec_id + 1000000 AS nid FROM embeddings WHERE vec_id < 10",

    "q52_hull_merge_rect" -> (EXT +
      """SELECT (d % 97) AS g, CAST(count(*) AS BIGINT) AS n_pages,
CAST(4 AS BIGINT) AS n_vertices, 0.5 AS area, 7.5 AS h_lon0, 51.5 AS h_lat0
FROM ext WHERE min_lon IS NOT NULL AND (d % 100) >= 80 AND k <= 7 GROUP BY 1"""),

    "q53_extent_coalesce" -> (EXT +
      """SELECT d AS doc_id, min_lon, min_lat, max_lon, max_lat,
CASE WHEN min_lon IS NULL THEN NULL WHEN k IN (5,6,7) THEN 'metadata' ELSE 'payload' END AS source
FROM ext"""),

    "q55_boilerplate_strip" ->
      """WITH b AS (SELECT doc_id,
  text || chr(10) || 'Copyright Example Corp' || chr(10) || 'All rights reserved to doc ' || (doc_id % 100) AS text
  FROM documents),
sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM b),
l AS (SELECT doc_id, g.i AS pos, ls[g.i] AS line FROM sp, LATERAL unnest(generate_series(1, len(ls))) AS g(i)),
n AS (SELECT count(*) AS nd FROM b),
f AS (SELECT line FROM l, n GROUP BY line, nd HAVING count(DISTINCT doc_id) > nd * 0.05),
k AS (SELECT doc_id, pos, line FROM l WHERE line NOT IN (SELECT line FROM f)),
agg AS (SELECT doc_id, md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5,
  CAST(count(*) AS BIGINT) AS n_lines_kept FROM k GROUP BY 1)
SELECT b.doc_id, coalesce(agg.clean_md5, md5('')) AS clean_md5,
  coalesce(agg.n_lines_kept, 0) AS n_lines_kept
FROM b LEFT JOIN agg ON b.doc_id = agg.doc_id""",

    "q56_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
WHERE substr(md5('sample-42:' || doc_id), 1, 2) <
  CASE WHEN lang = 'en' THEN '80' WHEN lang = 'de' THEN '4d' ELSE '1a' END""",

    "q57_pii_redact" ->
      """WITH p AS (SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || 'Contact: user' || doc_id
    || '@example.com or call +4930555' || (doc_id % 90 + 10)
    || ' node 10.0.' || (doc_id % 250) || '.' || (doc_id % 100)
  ELSE text END AS text FROM documents)
, p1 AS (SELECT doc_id, text,
  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
  FROM p),
p2 AS (SELECT doc_id, text, after_email,
  regexp_replace(after_email, '\+[0-9]{7,15}', '<PHONE>', 'g') AS after_phone FROM p1)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(after_email, '\+[0-9]{7,15}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(after_phone, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
  md5(regexp_replace(after_phone,
    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS redacted_md5
FROM p2""",

    "q58_repetition" ->
      """WITH r AS (SELECT doc_id,
  CASE WHEN doc_id % 6 = 1 THEN text || chr(10) || 'repeat line alpha'
    || chr(10) || 'repeat line alpha' || chr(10) || 'tail ' || doc_id
  ELSE text END AS text FROM documents),
sp AS (SELECT doc_id, list_filter(string_split(text, chr(10)), x -> x <> '') AS ls FROM r),
l AS (SELECT doc_id, ls[g.i] AS line FROM sp, LATERAL unnest(generate_series(1, len(ls))) AS g(i)),
lc AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2),
la AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
  sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE) AS dup_line_frac,
  sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) / CAST(sum(c * length(line)) AS DOUBLE) AS dup_line_char_frac
  FROM lc GROUP BY 1),
w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM r),
bg AS (SELECT doc_id, ws[g.i] || ' ' || ws[g.i + 1] AS b
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS g(i) WHERE len(ws) >= 2),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
ba AS (SELECT doc_id, max(c) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac FROM bc GROUP BY 1)
SELECT la.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
  coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
FROM la LEFT JOIN ba ON la.doc_id = ba.doc_id""",

    "q59_contamination" ->
      """WITH aug AS (SELECT doc_id,
  CASE WHEN doc_id % 50 = 0 OR doc_id % 11 = 3
    THEN text || ' benchmark heldout sentence alpha beta gamma delta epsilon zeta eta theta'
  ELSE text END AS text FROM documents),
w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM aug),
ng AS (SELECT DISTINCT doc_id,
    ws[g.i] || ' ' || ws[g.i+1] || ' ' || ws[g.i+2] || ' ' || ws[g.i+3] || ' '
      || ws[g.i+4] || ' ' || ws[g.i+5] || ' ' || ws[g.i+6] || ' ' || ws[g.i+7] AS ng
  FROM w, LATERAL unnest(generate_series(1, len(ws) - 7)) AS g(i) WHERE len(ws) >= 8),
tr AS (SELECT doc_id, ng FROM ng WHERE doc_id % 50 <> 0),
ev AS (SELECT doc_id AS eval_id, ng FROM ng WHERE doc_id % 50 = 0)
SELECT tr.doc_id, CAST(count(DISTINCT tr.ng) AS BIGINT) AS n_shared,
  CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
FROM tr JOIN ev ON tr.ng = ev.ng GROUP BY 1""",

    "q19_quality" ->
      """SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
  (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio,
  (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS upper_ratio,
  CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', '')))//5
     + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', '')))//5
     + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', '')))//4
     + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' to ', '')))//4
     + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' a ', '')))//3 AS DOUBLE)
   / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio
FROM documents""",

    "q20_lang_id" ->
      """WITH s AS (SELECT doc_id,
  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', '')))//5
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', '')))//5
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', '')))//4 AS s_en,
  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' der ', '')))//5
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' und ', '')))//5
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' die ', '')))//5 AS s_de,
  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' le ', '')))//4
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' et ', '')))//4
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' les ', '')))//5 AS s_fr,
  (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' el ', '')))//4
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' y ', '')))//3
+ (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' los ', '')))//5 AS s_es
FROM documents)
SELECT doc_id, CASE
  WHEN s_en >= greatest(s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
  WHEN s_de >= greatest(s_en, s_fr, s_es) AND s_de > 0 THEN 'de'
  WHEN s_fr >= greatest(s_en, s_de, s_es) AND s_fr > 0 THEN 'fr'
  WHEN s_es >= greatest(s_en, s_de, s_fr) AND s_es > 0 THEN 'es'
  ELSE 'und' END AS lang_pred FROM s""",

    "q21_token_count" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
FROM documents""",

    "q22_ann_topk" ->
      """WITH pr AS (SELECT vec_id AS pid, embedding AS p FROM embeddings WHERE vec_id < 10),
c AS (SELECT pid, e.vec_id AS nid,
  list_dot_product(p, e.embedding) / (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(e.embedding, e.embedding))) AS cos
  FROM pr, embeddings e WHERE e.vec_id <> pid),
r AS (SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rank FROM c)
SELECT pid, CAST(rank AS BIGINT) AS rank, nid FROM r WHERE rank <= 5""",

    "q26_shingles" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 3),
sh AS (SELECT doc_id, toks[g.i] || ' ' || toks[g.i+1] || ' ' || toks[g.i+2] AS sh
  FROM s, LATERAL unnest(generate_series(1, n-2)) AS g(i))
SELECT doc_id, CAST(count(DISTINCT sh) AS BIGINT) AS n_shingles FROM sh GROUP BY 1""",

    "q27_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr, event_type,
CAST(count(*) AS BIGINT) AS cnt, min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1,2""",

    "q29_annotations" ->
      """WITH p0 AS (SELECT (l_orderkey*8 + l_linenumber) AS d FROM lineitem),
b AS (SELECT d,
  CASE CAST((d//10) % 5 AS INTEGER) WHEN 0 THEN 'Amsterdam' WHEN 1 THEN 'Berlin' WHEN 2 THEN 'Paris' WHEN 3 THEN 'Madrid' ELSE 'Rome' END AS place,
  DATE '2015-01-01' + CAST(d % 1000 AS INTEGER) AS dd,
  DATE '2015-01-01' + CAST(d % 1000 AS INTEGER) + CAST(d % 30 AS INTEGER) AS de,
  (d % 3 = 0) AS hasper,
  CASE CAST((d//10) % 4 AS INTEGER) WHEN 0 THEN 'Holocene' WHEN 1 THEN 'Pleistocene' WHEN 2 THEN 'Jurassic' ELSE 'Cretaceous' END AS period,
  CAST(d % 4 AS INTEGER) AS v
  FROM p0 WHERE d % 10 = 8),
b2 AS (SELECT *,
  strftime(dd, '%Y-%m-%d') AS i1, strftime(de, '%Y-%m-%d') AS i2,
  strftime(dd,'%B') || ' ' || CAST(day(dd) AS VARCHAR) || ', ' || CAST(year(dd) AS VARCHAR) AS m1,
  strftime(de,'%B') || ' ' || CAST(day(de) AS VARCHAR) || ', ' || CAST(year(de) AS VARCHAR) AS m2,
  CAST(year(dd) AS VARCHAR) AS y1, CAST(year(de) AS VARCHAR) AS y2,
  CAST(12 + len(place) + 11 AS BIGINT) AS ppos FROM b),
b3 AS (SELECT *,
  CASE v WHEN 0 THEN 'from ' || i1 || ' to ' || i2
         WHEN 1 THEN 'from ' || m1 || ' to ' || m2
         WHEN 2 THEN 'over ' || y1 || '–' || y2
         ELSE 'from January to March ' || y1 END AS phrase,
  CASE v WHEN 0 THEN i1 WHEN 1 THEN m1 WHEN 2 THEN y1 || '–' || y2 ELSE 'January to March ' || y1 END AS date1,
  CASE v WHEN 0 THEN i2 WHEN 1 THEN m2 END AS date2
  FROM b2)
SELECT d AS doc_id, 'place' AS kind, place AS value,
  CAST(12 AS BIGINT) AS char_start, CAST(12 + len(place) AS BIGINT) AS char_end FROM b3
UNION ALL
SELECT d, 'date', date1, ppos + 5, ppos + 5 + len(date1) FROM b3
UNION ALL
SELECT d, 'date', date2, ppos + 5 + len(date1) + 4, ppos + 5 + len(date1) + 4 + len(date2)
FROM b3 WHERE v IN (0, 1)
UNION ALL
SELECT d, 'period', period, ppos + len(phrase) + 1 + 22, ppos + len(phrase) + 1 + 22 + len(period)
FROM b3 WHERE hasper""",

    "q54_annotated_text" ->
      """WITH p0 AS (SELECT (l_orderkey*8 + l_linenumber) AS d FROM lineitem),
b AS (SELECT d,
  CASE CAST((d//10) % 5 AS INTEGER) WHEN 0 THEN 'Amsterdam' WHEN 1 THEN 'Berlin' WHEN 2 THEN 'Paris' WHEN 3 THEN 'Madrid' ELSE 'Rome' END AS place,
  DATE '2015-01-01' + CAST(d % 1000 AS INTEGER) AS dd,
  DATE '2015-01-01' + CAST(d % 1000 AS INTEGER) + CAST(d % 30 AS INTEGER) AS de,
  (d % 3 = 0) AS hasper,
  CASE CAST((d//10) % 4 AS INTEGER) WHEN 0 THEN 'Holocene' WHEN 1 THEN 'Pleistocene' WHEN 2 THEN 'Jurassic' ELSE 'Cretaceous' END AS period,
  CAST(d % 4 AS INTEGER) AS v
  FROM p0 WHERE d % 10 = 8),
b2 AS (SELECT *,
  strftime(dd, '%Y-%m-%d') AS i1, strftime(de, '%Y-%m-%d') AS i2,
  strftime(dd,'%B') || ' ' || CAST(day(dd) AS VARCHAR) || ', ' || CAST(year(dd) AS VARCHAR) AS m1,
  strftime(de,'%B') || ' ' || CAST(day(de) AS VARCHAR) || ', ' || CAST(year(de) AS VARCHAR) AS m2,
  CAST(year(dd) AS VARCHAR) AS y1, CAST(year(de) AS VARCHAR) AS y2 FROM b)
SELECT d AS doc_id,
  'Survey near [place:' || place || '] conducted ' ||
  CASE v WHEN 0 THEN 'from [date:' || i1 || '] to [date:' || i2 || ']'
         WHEN 1 THEN 'from [date:' || m1 || '] to [date:' || m2 || ']'
         WHEN 2 THEN 'over [date:' || y1 || '–' || y2 || ']'
         ELSE 'from [date:January to March ' || y1 || ']' END
  || '.' || CASE WHEN hasper THEN ' Deposits date to the [period:' || period || '].' ELSE '' END AS annotated
FROM b2""",

    "q28_periods" -> (EXT +
      """SELECT d AS doc_id,
CASE peri WHEN 0 THEN 'Holocene' WHEN 1 THEN 'Pleistocene' WHEN 2 THEN 'Jurassic' ELSE 'Cretaceous' END AS period_name,
CASE peri WHEN 0 THEN '-9750-01-01' WHEN 1 THEN '-2578050-01-01' WHEN 2 THEN '-201298050-01-01' ELSE '-144998050-01-01' END AS p_start,
CASE peri WHEN 0 THEN '1950-01-01' WHEN 1 THEN '-9750-01-01' WHEN 2 THEN '-144998050-01-01' ELSE '-65998050-01-01' END AS p_end
FROM ext WHERE k = 8 AND hasper"""),

    "q30_stats" -> (EXT +
      """SELECT handler, CAST(count(*) AS BIGINT) AS n_pages, CAST(count(min_lon) AS BIGINT) AS n_with_extent
FROM ext GROUP BY 1"""),

    "q31_text_passthrough" -> (EXT +
      """SELECT d AS doc_id, md5(CASE
  WHEN k = 8 THEN 'Survey near ' ||
    (CASE CAST((d//10) % 5 AS INTEGER) WHEN 0 THEN 'Amsterdam' WHEN 1 THEN 'Berlin' WHEN 2 THEN 'Paris' WHEN 3 THEN 'Madrid' ELSE 'Rome' END) ||
    ' conducted ' ||
    (CASE CAST(d % 4 AS INTEGER)
      WHEN 0 THEN 'from ' || strftime(dd, '%Y-%m-%d') || ' to ' || strftime(de, '%Y-%m-%d')
      WHEN 1 THEN 'from ' || strftime(dd, '%B') || ' ' || CAST(day(dd) AS VARCHAR) || ', ' || CAST(year(dd) AS VARCHAR) ||
        ' to ' || strftime(de, '%B') || ' ' || CAST(day(de) AS VARCHAR) || ', ' || CAST(year(de) AS VARCHAR)
      WHEN 2 THEN 'over ' || CAST(year(dd) AS VARCHAR) || '–' || CAST(year(de) AS VARCHAR)
      ELSE 'from January to March ' || CAST(year(dd) AS VARCHAR) END) || '.' ||
    (CASE WHEN hasper THEN ' Deposits date to the ' ||
      (CASE peri WHEN 0 THEN 'Holocene' WHEN 1 THEN 'Pleistocene' WHEN 2 THEN 'Jurassic' ELSE 'Cretaceous' END) || '.'
     ELSE '' END)
  WHEN k = 9 THEN 'plain page with no spatial or temporal payload content at all'
  ELSE 'page ' || d || ' embeds a machine readable payload in its markup'
END) AS text_md5 FROM ext"""),

    "q33_raster_extent" ->
      """WITH x AS (SELECT p_partkey AS raster_id,
  CAST(((p_partkey*11) % 300) - 150 AS DOUBLE) AS gt0,
  CAST(((p_partkey*13) % 140) - 70 AS DOUBLE) AS gt3,
  (64 + (p_partkey % 5)*32) AS width, (64 + (p_partkey % 7)*32) AS height FROM part)
SELECT raster_id,
  least(gt0, gt0 + width*0.03125) AS min_lon,
  least(gt3, gt3 + height*(-0.015625)) AS min_lat,
  greatest(gt0, gt0 + width*0.03125) AS max_lon,
  greatest(gt3, gt3 + height*(-0.015625)) AS max_lat
FROM x""",

    "q34_raster_tbox" ->
      """WITH x AS (SELECT p_partkey AS raster_id, (p_partkey % 4) AS m, p_partkey AS p FROM part)
SELECT raster_id,
  CASE m
    WHEN 0 THEN strftime(DATE '2000-01-01' + CAST(p % 50 AS INTEGER), '%Y-%m-%d')
    WHEN 1 THEN strftime(DATE '2010-01-01' + CAST(p % 100 AS INTEGER), '%Y-%m-%d')
    WHEN 2 THEN strftime(DATE '2020-01-01' + CAST(p % 200 AS INTEGER), '%Y-%m-%d')
    ELSE strftime(DATE '2021-01-01' + CAST(p % 30 AS INTEGER), '%Y-%m-%d') END AS tbox_start,
  CASE m
    WHEN 0 THEN strftime(DATE '2000-01-01' + CAST(p % 50 + p % 20 AS INTEGER), '%Y-%m-%d')
    WHEN 1 THEN strftime(DATE '2010-01-01' + CAST(p % 100 + 5 AS INTEGER), '%Y-%m-%d')
    WHEN 2 THEN strftime(DATE '2020-01-01' + CAST(p % 200 AS INTEGER), '%Y-%m-%d')
    ELSE strftime(DATE '2021-01-01' + CAST(p % 30 AS INTEGER), '%Y-%m-%d') END AS tbox_end
FROM x""",

    "q35_placename_shared" ->
      """WITH n AS (SELECT CAST(o_custkey AS BIGINT) AS custkey,
  'N' || (o_orderkey % 5) || '/M' || (o_orderkey % 3) AS name FROM orders),
c AS (SELECT custkey, unnest(string_split_regex(name, '[,;/|]')) AS comp FROM n)
SELECT custkey, comp, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1,2 HAVING count(*) > 1""",

    "q36_doi_normalize" ->
      """SELECT (l_orderkey*8 + l_linenumber) AS doc_id,
regexp_extract('https://doi.org/10.' || ((l_orderkey*8 + l_linenumber) % 90 + 10) || '/item.' || (l_orderkey*8 + l_linenumber),
  '(10\.\d{2,9}/[^\s]+)', 1) AS doi
FROM lineitem""",

    "q37_size_parse" ->
      """SELECT doc_id, CAST(n_chars * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 1000 ELSE 1000000 END) AS BIGINT) AS n_bytes
FROM documents""",

    "q38_select_smallest" ->
      """SELECT doc_id, n_chars, cum_size FROM (
SELECT doc_id, n_chars, CAST(sum(n_chars) OVER (ORDER BY n_chars, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_size
FROM documents) WHERE cum_size <= 30000""",

    "q40_rollup" -> (EXT +
      """SELECT handler, (d % 10) AS bucket, CAST(count(*) AS BIGINT) AS n_pages,
CAST(count(min_lon) AS BIGINT) AS n_with_extent
FROM ext GROUP BY ROLLUP(handler, (d % 10))"""),

    "q41_pointcloud_extent" ->
      """SELECT s_suppkey AS cloud_id,
  CAST(((s_suppkey*17) % 320) - 160 AS DOUBLE) AS min_lon,
  CAST(((s_suppkey*19) % 150) - 75 AS DOUBLE) AS min_lat,
  CAST(((s_suppkey*17) % 320) - 160 + (s_suppkey % 4 + 1) AS DOUBLE) AS max_lon,
  CAST(((s_suppkey*19) % 150) - 75 + (s_suppkey % 3 + 1) AS DOUBLE) AS max_lat
FROM supplier""",

    "q42_pointcloud_tbox" ->
      """SELECT s_suppkey AS cloud_id,
  strftime(CAST((2018 + s_suppkey % 5) || '-01-01' AS DATE) + CAST(s_suppkey % 300 AS INTEGER), '%Y-%m-%d') AS tbox_start,
  strftime(CAST((2018 + s_suppkey % 5) || '-01-01' AS DATE) + CAST(s_suppkey % 300 AS INTEGER), '%Y-%m-%d') AS tbox_end
FROM supplier WHERE s_suppkey % 10 <> 0""",

    "q51_media_meta" ->
      """SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id % 8) * 16 WHEN 1 THEN 0 ELSE 16 END AS BIGINT) AS width,
  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id % 5) * 16 WHEN 1 THEN 0 ELSE 16 END AS BIGINT) AS height,
  CAST(CASE doc_id % 3
    WHEN 0 THEN 68 + (16 + (doc_id % 5) * 16) * (16 + (doc_id % 8) * 16 + 1)
    WHEN 1 THEN 44 + 2 * (256 + (doc_id % 7) * 128)
    ELSE 8 + 344 * (2 + doc_id % 4) END AS BIGINT) AS n_bytes,
  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'gfv' END AS format
FROM documents""",

    "q39_media_features" ->
      """WITH m AS (SELECT doc_id AS media_id, CAST(doc_id % 3 AS INTEGER) AS k3,
  16 + (doc_id % 8) * 16 AS w, 16 + (doc_id % 5) * 16 AS h,
  256 + (doc_id % 7) * 128 AS n, 2 + (doc_id % 4) AS nf FROM documents),
ip AS (SELECT media_id, w, h, (gx.x + 3*gy.y + media_id) % 256 AS p
  FROM m, LATERAL unnest(generate_series(0, w-1)) AS gx(x),
          LATERAL unnest(generate_series(0, h-1)) AS gy(y)
  WHERE k3 = 0),
img AS (SELECT media_id, 'image' AS kind,
  CAST(68 + max(h)*(max(w)+1) AS BIGINT) AS n_bytes,
  CAST(sum(p) + min(p) + max(p) + max(w) + max(h) AS DOUBLE) AS feature_sum
  FROM ip GROUP BY 1),
ap AS (SELECT media_id, n, ((g.i*37 + media_id*11) % 65536) - 32768 AS s
  FROM m, LATERAL unnest(generate_series(0, n-1)) AS g(i) WHERE k3 = 1),
aud AS (SELECT media_id, 'audio' AS kind,
  CAST(44 + 2*max(n) AS BIGINT) AS n_bytes,
  CAST(sum(s) + min(s) + max(s) + max(n) + 8000 AS DOUBLE) AS feature_sum
  FROM ap GROUP BY 1),
vp AS (SELECT media_id, nf, (gx.x + 3*gy.y + 7*gf.f + media_id) % 256 AS p
  FROM m, LATERAL unnest(generate_series(0, nf-1, 2)) AS gf(f),
          LATERAL unnest(generate_series(0, 15)) AS gx(x),
          LATERAL unnest(generate_series(0, 15)) AS gy(y)
  WHERE k3 = 2),
vid AS (SELECT media_id, 'video' AS kind,
  CAST(8 + 344*max(nf) AS BIGINT) AS n_bytes,
  CAST(max(nf) + sum(p) + min(p) + max(p) + ((max(nf)+1)//2) AS DOUBLE) AS feature_sum
  FROM vp GROUP BY 1)
SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid""",

    "q49_raster_tile_bridge" -> (EXT +
      s""", e AS (SELECT d, min_lon, min_lat, max_lon, max_lat,
  CAST(floor((min_lon+180.0)/360.0*64.0) AS BIGINT) AS tx0,
  CAST(floor((max_lon+180.0)/360.0*64.0) AS BIGINT) AS tx1,
  ${MERC64.format("max_lat", "max_lat")} AS ty0,
  ${MERC64.format("min_lat", "min_lat")} AS ty1
  FROM ext WHERE min_lon IS NOT NULL),
a AS (SELECT d, gx.tx, gy.ty FROM e, LATERAL unnest(generate_series(tx0, tx1)) AS gx(tx), LATERAL unnest(generate_series(ty0, ty1)) AS gy(ty)),
pt AS (SELECT tx, ty, CAST(count(*) AS BIGINT) AS cnt FROM a GROUP BY 1, 2),
rx AS (SELECT p_partkey AS raster_id,
  CAST(((p_partkey*11) % 300) - 150 AS DOUBLE) AS gt0,
  CAST(((p_partkey*13) % 140) - 70 AS DOUBLE) AS gt3,
  (64 + (p_partkey % 5)*32) AS width, (64 + (p_partkey % 7)*32) AS height FROM part),
re AS (SELECT raster_id,
  least(gt0, gt0 + width*0.03125) AS min_lon,
  least(gt3, gt3 + height*(-0.015625)) AS min_lat,
  greatest(gt0, gt0 + width*0.03125) AS max_lon,
  greatest(gt3, gt3 + height*(-0.015625)) AS max_lat FROM rx),
rt AS (SELECT raster_id, gx.tx, gy.ty FROM (
  SELECT raster_id,
    CAST(floor((min_lon+180.0)/360.0*64.0) AS BIGINT) AS tx0,
    CAST(floor((max_lon+180.0)/360.0*64.0) AS BIGINT) AS tx1,
    ${MERC64.format("max_lat", "max_lat")} AS ty0,
    ${MERC64.format("min_lat", "min_lat")} AS ty1 FROM re) r,
  LATERAL unnest(generate_series(tx0, tx1)) AS gx(tx), LATERAL unnest(generate_series(ty0, ty1)) AS gy(ty))
SELECT rt.raster_id, CAST(count(*) AS BIGINT) AS n_tiles_hit, CAST(sum(pt.cnt) AS BIGINT) AS n_pages
FROM rt JOIN pt ON pt.tx = rt.tx AND pt.ty = rt.ty GROUP BY 1"""),

    // gaz/reg VALUES are serialized from GazetteerTable (data, not logic —
    // the containment/nearest rules themselves are hand-mirrored): region
    // rings are rectangles so SQL containment is a strict range check (probes
    // on the 1/128° grid can never touch the 1/256°-offset edges), and the
    // kNN tie-break (dist2, pname) matches the engine's (dist2, pid) because
    // pids are assigned in name order
    "q50_placename" -> (EXT +
      s""", cent AS (SELECT (d % 97) AS g, (min(min_lon)+max(max_lon))/2 AS cx, (min(min_lat)+max(max_lat))/2 AS cy
FROM ext WHERE min_lon >= -15 AND max_lon <= 25 AND min_lat >= 35 AND max_lat <= 60 GROUP BY 1),
gaz(pname, plat, plon) AS (VALUES $gazPointValuesSql),
reg(rname, rx0, ry0, rx1, ry1) AS (VALUES $gazRegionValuesSql),
pip AS (SELECT g, rname, row_number() OVER (PARTITION BY g ORDER BY (rx1-rx0)*(ry1-ry0), rname) AS rk
  FROM cent JOIN reg ON cx > rx0 AND cx < rx1 AND cy > ry0 AND cy < ry1),
knn AS (SELECT g, pname, row_number() OVER (PARTITION BY g ORDER BY
  (cx - plon)*(cx - plon) + (cy - plat)*(cy - plat), pname) AS rk FROM cent, gaz)
SELECT c.g, coalesce(p.rname, k.pname) AS placename
FROM cent c LEFT JOIN (SELECT g, rname FROM pip WHERE rk = 1) p USING (g)
JOIN (SELECT g, pname FROM knn WHERE rk = 1) k USING (g)"""),

    // Cell-bucketed certified kNN, the third form of this oracle — each one
    // forced by running it at 10× the previous scale. The window-over-cross-
    // join OOMed DuckDB at sf0.1 (2.3 B rows); its LATERAL top-3 replacement
    // was memory-bounded but DuckDB decorrelates LATERAL into that same
    // quadratic join, which at sf1 (52 k probes × 5.2 M points = 2.7e11
    // candidates) needs TBs of spill. This form is linear and EXACT BY
    // CONSTRUCTION, not by mirroring the engine: candidates come from an
    // equi-join on a coarse R-cell grid (probe's 3×3 cell block ⊇ the closed
    // R-box ⊇ the closed R-ball), ranked per probe, and every probe's result
    // is CERTIFIED in-SQL — rank 3 must exist with dist2 ≤ R² (a point
    // outside the R-box has dist2 > R² strictly, so nothing outside the
    // candidate set can displace a certified top-3; ties break on (dist2,
    // pid) inside a set that provably contains all contenders). A probe that
    // fails certification poisons its rank to −1, which can never match the
    // engine's output — the compare turns red instead of silently passing a
    // truncated answer. R adapts to corpus density (~0.1–100 points/deg²
    // across sf0.001→sf1) so the certified ball always holds ≫3 points.
    "q48_knn_big" -> (EXT +
      """, c AS (SELECT d, (min_lon+max_lon)/2 AS lon, (min_lat+max_lat)/2 AS lat FROM ext WHERE min_lon IS NOT NULL),
q AS (SELECT d AS qid, lon AS qlon, lat AS qlat FROM c WHERE d % 100 = 7),
rr AS (SELECT CASE WHEN n >= 1000000 THEN 2.0 WHEN n >= 100000 THEN 6.0
              WHEN n >= 10000 THEN 16.0 ELSE 400.0 END AS rad
       FROM (SELECT count(*) AS n FROM c)),
cc AS (SELECT c.d, c.lon, c.lat, CAST(floor(c.lon/rr.rad) AS BIGINT) AS cx,
              CAST(floor(c.lat/rr.rad) AS BIGINT) AS cy FROM c, rr),
qn AS (SELECT q.qid, q.qlon, q.qlat,
              CAST(floor(q.qlon/rr.rad) AS BIGINT) + dx.v AS cx,
              CAST(floor(q.qlat/rr.rad) AS BIGINT) + dy.v AS cy
       FROM q, rr, (VALUES (-1),(0),(1)) dx(v), (VALUES (-1),(0),(1)) dy(v)),
cand AS (SELECT qn.qid, cc.d AS pid,
    (cc.lon - qn.qlon)*(cc.lon - qn.qlon) + (cc.lat - qn.qlat)*(cc.lat - qn.qlat) AS dist2
  FROM qn JOIN cc ON cc.cx = qn.cx AND cc.cy = qn.cy),
r AS (SELECT qid, pid, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, pid) AS rank FROM cand),
top AS (SELECT * FROM r WHERE rank <= 3),
cert AS (SELECT qid, (count(*) = 3 AND max(dist2) <= (SELECT rad*rad FROM rr)) AS ok FROM top GROUP BY qid)
SELECT t.qid, CAST(CASE WHEN cert.ok THEN t.rank ELSE -1 END AS BIGINT) AS rank, t.pid, t.dist2
FROM top t JOIN cert USING (qid)"""),

    "q47_ann_ivf" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings),
cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, embedding AS c
  FROM v WHERE vec_id % greatest(1, (SELECT count(*) FROM v) // 16) = 0
  ORDER BY vec_id LIMIT 16),
ac AS (SELECT v.vec_id, v.embedding, c.cid,
    list_dot_product(v.embedding, c.c) / (sqrt(list_dot_product(v.embedding, v.embedding)) * sqrt(list_dot_product(c.c, c.c))) AS cos
  FROM v CROSS JOIN cents c),
assign AS (SELECT vec_id, embedding, cid FROM (
    SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS r FROM ac)
  WHERE r = 1),
pr AS (SELECT vec_id AS pid, embedding AS p FROM v WHERE vec_id < 10),
pc AS (SELECT pid, p, cid FROM (
    SELECT pr.pid, pr.p, c.cid,
      row_number() OVER (PARTITION BY pr.pid ORDER BY
        list_dot_product(pr.p, c.c) / (sqrt(list_dot_product(pr.p, pr.p)) * sqrt(list_dot_product(c.c, c.c))) DESC, c.cid) AS r
    FROM pr CROSS JOIN cents c)
  WHERE r <= 4),
cand AS (SELECT pc.pid, a.vec_id AS nid,
    list_dot_product(pc.p, a.embedding) / (sqrt(list_dot_product(pc.p, pc.p)) * sqrt(list_dot_product(a.embedding, a.embedding))) AS cos
  FROM pc JOIN assign a ON a.cid = pc.cid WHERE a.vec_id <> pc.pid),
rk AS (SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rank FROM cand)
SELECT pid, CAST(rank AS BIGINT) AS rank, nid FROM rk WHERE rank <= 5""",

    "q45_select_random" ->
      """WITH g AS (SELECT doc_id // 10 AS grp, CAST(sum(n_chars) AS BIGINT) AS gsize FROM documents GROUP BY 1),
c AS (SELECT grp, gsize, CAST(sum(gsize) OVER (ORDER BY md5(CAST(grp AS VARCHAR)), grp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM g)
SELECT d.doc_id, d.n_chars, c.grp, c.cum AS grp_cum
FROM documents d JOIN c ON d.doc_id // 10 = c.grp WHERE c.cum <= 30000""",

    "q46_select_largest" ->
      """WITH g AS (SELECT doc_id // 10 AS grp, CAST(sum(n_chars) AS BIGINT) AS gsize FROM documents GROUP BY 1),
c AS (SELECT grp, gsize, CAST(sum(gsize) OVER (ORDER BY gsize DESC, grp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM g)
SELECT d.doc_id, d.n_chars, c.grp, c.cum AS grp_cum
FROM documents d JOIN c ON d.doc_id // 10 = c.grp WHERE c.cum <= 30000""",

    "q44_hull_extract" -> (EXT +
      """SELECT d AS doc_id,
  CAST(CASE WHEN k <= 6 THEN 4 ELSE 1 END AS BIGINT) AS n_vertices,
  (max_lon - min_lon) * (max_lat - min_lat) AS area
FROM ext WHERE min_lon IS NOT NULL"""),

    "q70_bbox_geojson" -> (EXT +
      """SELECT d AS doc_id,
CASE WHEN max_lon - min_lon <= 0.000001 AND max_lat - min_lat <= 0.000001
  THEN '{"type":"Point","coordinates":[' || printf('%.6f', min_lon) || ',' || printf('%.6f', min_lat) || ']}'
  ELSE '{"type":"Polygon","coordinates":[[[' ||
       printf('%.6f', min_lon) || ',' || printf('%.6f', min_lat) || '],[' ||
       printf('%.6f', max_lon) || ',' || printf('%.6f', min_lat) || '],[' ||
       printf('%.6f', max_lon) || ',' || printf('%.6f', max_lat) || '],[' ||
       printf('%.6f', min_lon) || ',' || printf('%.6f', max_lat) || '],[' ||
       printf('%.6f', min_lon) || ',' || printf('%.6f', min_lat) || ']]]}'
END AS gj FROM ext WHERE min_lon IS NOT NULL"""),

    "q71_axis_swap" -> (EXT +
      "SELECT d AS doc_id, min_lat, min_lon, max_lat, max_lon FROM ext WHERE min_lon IS NOT NULL"),

    "q73_gpkg_roundtrip" -> (EXT +
      "SELECT d AS doc_id, handler, min_lon, min_lat, max_lon, max_lat FROM ext WHERE min_lon IS NOT NULL ORDER BY d LIMIT 50000"),

    "q74_provider_dispatch" ->
      """SELECT (l_orderkey*8 + l_linenumber) AS doc_id,
CASE (l_orderkey*8 + l_linenumber) % 8
  WHEN 0 THEN 'Zenodo' WHEN 1 THEN 'Pangaea' WHEN 2 THEN 'MendeleyData'
  WHEN 3 THEN 'GitHub' WHEN 4 THEN 'RemoteRaster' WHEN 5 THEN 'Wikidata'
  WHEN 6 THEN 'SEANOE' ELSE NULL END AS provider,
CASE (l_orderkey*8 + l_linenumber) % 8
  WHEN 0 THEN CAST(l_orderkey*8 + l_linenumber AS VARCHAR)
  WHEN 1 THEN CAST(l_orderkey*8 + l_linenumber AS VARCHAR)
  WHEN 2 THEN 'abc' || CAST(l_orderkey*8 + l_linenumber AS VARCHAR)
  WHEN 3 THEN NULL
  WHEN 4 THEN 'https://example.com/tiles/' || CAST(l_orderkey*8 + l_linenumber AS VARCHAR) || '.tif'
  WHEN 5 THEN 'Q' || CAST(l_orderkey*8 + l_linenumber AS VARCHAR)
  WHEN 6 THEN CAST(l_orderkey*8 + l_linenumber AS VARCHAR)
  ELSE NULL END AS rid
FROM lineitem""",

    // percent-encode with an explicit replace chain: the JSON's character set
    // outside [A-Za-z0-9.-] is exactly { } " : , [ ] (no inputs provenance in
    // this query), and no replacement output contains another's input, so the
    // chain is order-independent — urllib.parse.quote / java URLEncoder
    // (with +→%20, no spaces present) agree on this alphabet
    "q72_geojsonio_url" -> (EXT +
      """SELECT d AS doc_id,
'https://geojson.io/#data=data:application/json,' ||
replace(replace(replace(replace(replace(replace(replace(
  '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},"geometry":' ||
  CASE WHEN max_lon - min_lon <= 0.000001 AND max_lat - min_lat <= 0.000001
    THEN '{"type":"Point","coordinates":[' || printf('%.6f', min_lon) || ',' || printf('%.6f', min_lat) || ']}'
    ELSE '{"type":"Polygon","coordinates":[[[' ||
         printf('%.6f', min_lon) || ',' || printf('%.6f', min_lat) || '],[' ||
         printf('%.6f', max_lon) || ',' || printf('%.6f', min_lat) || '],[' ||
         printf('%.6f', max_lon) || ',' || printf('%.6f', max_lat) || '],[' ||
         printf('%.6f', min_lon) || ',' || printf('%.6f', max_lat) || '],[' ||
         printf('%.6f', min_lon) || ',' || printf('%.6f', min_lat) || ']]]}'
  END || '}]}',
  '{', '%7B'), '}', '%7D'), '"', '%22'), ':', '%3A'), ',', '%2C'), '[', '%5B'), ']', '%5D')
AS url FROM ext WHERE min_lon IS NOT NULL"""),

    // canonical gap-split sessionization (30-min gap): break on gap > 30min,
    // running sum of breaks = session id, one row per (user, session). The
    // streamed path must emit exactly this set (Replay staging guarantees
    // every session is watermark-sealed before the stream drains).
    "q75_sessions_stream" ->
      """WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s2 GROUP BY user_id, sid""",

    // identical to the batch q27 oracle: the streamed sealed-window append
    // output must reproduce the batch tumbling-window aggregation exactly
    "q76_window_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr, event_type,
CAST(count(*) AS BIGINT) AS cnt, min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1,2""",

    // full recompute of the window-hash span dedup from the raw text: same
    // tokenization (whitespace split, empties dropped), same 8-token windows
    "q77_span_dedup" -> (DUP +
      """, sp AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts FROM docs2),
w AS (SELECT doc_id, array_to_string(ts[p.i:p.i+7], ' ') AS win
      FROM sp, LATERAL unnest(generate_series(1, len(ts) - 7)) AS p(i)
      WHERE len(ts) >= 8),
o AS (SELECT win, doc_id, count(*) AS occ FROM w GROUP BY 1, 2),
dw AS (SELECT win FROM o GROUP BY win HAVING count(*) >= 2),
pd AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_dup FROM o
       WHERE win IN (SELECT win FROM dw) GROUP BY 1)
SELECT sp.doc_id, CAST(greatest(len(ts) - 7, 0) AS BIGINT) AS n_windows,
  coalesce(pd.n_dup, 0) AS n_dup_windows
FROM sp LEFT JOIN pd USING (doc_id)"""),

    // exact recompute of the KMV sketch: same hash (md5 of utf-8 text), same
    // k=32 minima, same estimator arithmetic — 31 * 2^52 and the 13-hex-digit
    // prefix (< 2^52) are both exact in double, so est_distinct matches
    // bit-for-bit
    "q78_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT lang, md5(text) AS h FROM documents),
r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
k AS (SELECT lang, h FROM r WHERE rn <= 32)
SELECT lang, CAST(count(*) AS BIGINT) AS n_minima, max(h) AS kth_hash,
  CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)
       ELSE (CAST(31 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)) / CAST(concat('0x', substr(max(h), 1, 13)) AS BIGINT)
  END AS est_distinct
FROM k GROUP BY lang""",

    // structural SemDeDup contract (q43 pattern): every planted clone —
    // byte-identical (+1e6) and 2x-scaled (+2e6) — is semantically dominated
    // by its lower-id base inside the same cosine-assigned cluster and must
    // drop; every base vector survives because no natural pair reaches
    // tau=0.8 (measured max 0.61; precondition asserted in DedupSpec)
    "q79_semdedup" ->
      """SELECT vec_id, CAST(1 AS BIGINT) AS kept FROM embeddings
UNION ALL SELECT vec_id + 1000000, CAST(0 AS BIGINT) FROM embeddings WHERE vec_id % 20 = 0
UNION ALL SELECT vec_id + 2000000, CAST(0 AS BIGINT) FROM embeddings WHERE vec_id % 20 = 10""",

    // identical md5-threshold sample, identical rank arithmetic: ceil(p*n)
    // is one IEEE multiply + ceil in both engines, so even non-dyadic probs
    // (0.95) pick the same rank; ties in v break on the hash both sides
    "q80_quantile_sketch" ->
      """WITH s AS (SELECT lang, CAST(octet_length(encode(text)) AS BIGINT) AS v,
  md5('quant-7:' || doc_id) AS hk FROM documents
  WHERE substr(md5('quant-7:' || doc_id), 1, 2) < '55' AND text IS NOT NULL),
r AS (SELECT lang, v, hk,
  row_number() OVER (PARTITION BY lang ORDER BY v, hk) AS rn,
  count(*) OVER (PARTITION BY lang) AS n FROM s)
SELECT lang, p, v AS q_value, CAST(n AS BIGINT) AS n_sample
FROM r, (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
  (CAST(0.75 AS DOUBLE)), (CAST(0.95 AS DOUBLE))) AS pr(p)
WHERE rn = CAST(ceil(p * n) AS BIGINT)""",

    // the resume machinery must be output-invisible: the batched, killed-and-
    // resumed merge equals the plain one-pass group-by (batch 0 is empty on
    // both sides — d%8 = l_linenumber never hits 0)
    "q81_resume_merge" -> (EXT +
      """SELECT (d % 8) AS batch, (d % 97) AS g, CAST(count(min_lon) AS BIGINT) AS n_ext,
min(min_lon) AS min_lon, min(min_lat) AS min_lat, max(max_lon) AS max_lon, max(max_lat) AS max_lat
FROM ext WHERE min_lon IS NOT NULL GROUP BY 1, 2"""),

    // exact heavy-hitter answer (the MG candidate stage is a superset, so it
    // cannot change the output): cells whose exact count · 21 exceeds the
    // total — integer arithmetic only, same q06 cell closed form
    "q82_heavy_cells" -> (EXT +
      s""", c AS (SELECT d, (min_lon+max_lon)/2 AS lonc, (min_lat+max_lat)/2 AS latc FROM ext WHERE min_lon IS NOT NULL),
k AS (SELECT CAST(floor((lonc+180.0)/360.0*16.0) AS BIGINT) AS tx, ${MERC16.format("latc", "latc")} AS ty FROM c),
g AS (SELECT tx, ty, CAST(count(*) AS BIGINT) AS cnt FROM k GROUP BY 1, 2),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM k)
SELECT tx, ty, cnt, n_total FROM g, t WHERE cnt * 21 > n_total"""),

    // independent asof implementation: DuckDB's native ASOF LEFT JOIN picks
    // the greatest view ts <= click ts per user — exactly the union+window
    // carry; timestamps compared at full microsecond precision on both
    // sides, formatted only in the output projection
    "q83_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
views AS (SELECT user_id, ts, max(value) AS view_value FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts, v.view_value
FROM clicks c ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts""",

    // the z-order write + manifest file skipping must be output-invisible:
    // plain bbox intersection over the closed form
    "q84_zorder_scan" -> (EXT +
      """SELECT d AS doc_id, min_lon, min_lat, max_lon, max_lat FROM ext
WHERE min_lon IS NOT NULL
  AND max_lon >= 0.0 AND min_lon <= 20.0 AND max_lat >= 40.0 AND min_lat <= 55.0"""),

    // full from-scratch recompute — no prefix stage, no candidates: every
    // co-shingle pair's exact intersection, integer threshold 5·i ≥ 4·(u)
    "q85_jaccard_join" -> (DUP +
      """, canon AS (SELECT min(doc_id) AS doc_id, text FROM docs2 GROUP BY text),
toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM canon),
tn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 3),
sh AS (SELECT DISTINCT doc_id, t[g.i] || ' ' || t[g.i+1] || ' ' || t[g.i+2] AS s
  FROM tn, LATERAL unnest(generate_series(1, n-2)) AS g(i)),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, i AS n_inter, (ca.n + cb.n - i) AS n_union
FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
WHERE 5 * i >= 4 * (ca.n + cb.n - i)"""),

    // the grid prefilter must be output-invisible: plain all-pairs distance
    // predicate (q08's probe closed form, radius² = 36 in squared degrees)
    "q86_distance_join" -> (EXT +
      """, nat AS (SELECT CAST(n_nationkey AS BIGINT) AS qid,
  ((n_nationkey*37) % 300) - 150 + 0.015625 + 12.0 AS qlon,
  ((n_nationkey*23) % 130) - 65 + 0.015625 + 9.0 AS qlat FROM nation),
c AS (SELECT qid, e.d AS pid,
  ((e.min_lon+e.max_lon)/2 - qlon)*((e.min_lon+e.max_lon)/2 - qlon) +
  ((e.min_lat+e.max_lat)/2 - qlat)*((e.min_lat+e.max_lat)/2 - qlat) AS dist2
  FROM nat, ext e WHERE e.min_lon IS NOT NULL)
SELECT qid, pid, dist2 FROM c WHERE dist2 <= 36.0"""),

    // independent bucketing: 10°-lon bands + DISTINCT (the engine dedups by
    // reporting cell instead — both must land on the same pair set); raster
    // closed form = q33's
    "q87_extent_overlap" -> (EXT +
      """, x AS (SELECT p_partkey AS raster_id,
  CAST(((p_partkey*11) % 300) - 150 AS DOUBLE) AS gt0,
  CAST(((p_partkey*13) % 140) - 70 AS DOUBLE) AS gt3,
  (64 + (p_partkey % 5)*32) AS width, (64 + (p_partkey % 7)*32) AS height
  FROM part WHERE p_partkey % 97 = 0),
r AS (SELECT CAST(raster_id AS BIGINT) AS raster_id,
  least(gt0, gt0 + width*0.03125) AS rl0,
  least(gt3, gt3 + height*(-0.015625)) AS rl1,
  greatest(gt0, gt0 + width*0.03125) AS rl2,
  greatest(gt3, gt3 + height*(-0.015625)) AS rl3 FROM x),
rb AS (SELECT r.*, g.b FROM r,
  LATERAL unnest(generate_series(CAST(floor(rl0/10) AS INT), CAST(floor(rl2/10) AS INT))) AS g(b)),
pd AS (SELECT DISTINCT d, min_lon, min_lat, max_lon, max_lat FROM ext WHERE min_lon IS NOT NULL),
pb AS (SELECT d, min_lon, min_lat, max_lon, max_lat, g.b FROM pd,
  LATERAL unnest(generate_series(CAST(floor(min_lon/10) AS INT), CAST(floor(max_lon/10) AS INT))) AS g(b))
SELECT DISTINCT d AS doc_id, raster_id FROM pb JOIN rb USING (b)
WHERE pb.min_lon <= rb.rl2 AND rb.rl0 <= pb.max_lon
  AND pb.min_lat <= rb.rl3 AND rb.rl1 <= pb.max_lat"""),
  )
}
