package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.cells.QuadKey
import graft.geo.Geo

/** Spatial join planners (SURVEY §2.5 J1–J5) — explicit API-level rewrites of
  * theta joins into cell-equi joins + residual predicates (SURVEY §4: a Catalyst
  * rule adds no capability here; the planner function is simpler and testable).
  */
object SpatialJoins {

  val pipUdf = udf((lon: Double, lat: Double, ring: Seq[Double]) =>
    Geo.pointInRing(lon, lat, ring.toArray))

  /** J1: point-in-polygon join. `points` needs (lon, lat, cell) columns; `polys`
    * needs (poly_id, ring, cells). The polygon side is small (admin boundaries)
    * → broadcast; the equi-prefilter on the cell id keeps the residual ray-cast
    * to same-cell candidates only. At 10^12 pages this is a map-side join: no
    * shuffle of the big side at all.
    */
  def pipJoin(points: DataFrame, polys: DataFrame): DataFrame = {
    val polyCells = polys.select(col("poly_id"), col("ring"), explode(col("cells")).as("cell"))
    points.join(broadcast(polyCells), Seq("cell"), "inner")
      // codegen'd ray cast over the ring ArrayData (no per-candidate
      // Seq/toArray copy); booleans identical to pipUdf (JoinsSpec property)
      .filter(graft.functions.PipContains(col("lon"), col("lat"), col("ring")))
      .drop("ring")
  }

  /** J2: salted cell-equi join for the big/big case with hot cells (north_rule).
    * The big side appends a deterministic salt from its row key; the (smaller,
    * but not broadcastable) side explodes all S salts. Result equals the plain
    * cell join — verified by property test — while hot cells fan out over S
    * reducers instead of one.
    */
  def saltedCellJoin(big: DataFrame, small: DataFrame, keyCol: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(col(keyCol)), lit(salts)))
    val saltedSmall = small.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq("cell", "_salt"), "inner").drop("_salt")
  }

  /** J3: grid-partitioned kNN join with exact-result guarantee.
    *
    * `queries`(qid, qlon, qlat) is small; `points`(pid, lon, lat, cell at `zoom`)
    * is the corpus. Each round covers a (2r+1)² cell disk around every remaining
    * query, joins candidates through an exploded (cell → qid) broadcast map, and
    * keeps a query's top-k only when the kth distance is ≤ the distance to the
    * disk's boundary (no closer point can live outside the disk); otherwise the
    * query goes to the next round with r doubled. Distances are squared degrees
    * (the reference compares raw lon/lat, geoextent/lib/handle_text.py:129-135).
    */
  /** Squared-degree lower bound on the distance from (qlon,qlat) to anything
    * OUTSIDE its Chebyshev-`rr` disk of cells; MaxValue when every binding
    * side of the disk is clamped at the world edge (nothing exists beyond).
    */
  def diskBound2(qcell: Long, qlon: Double, qlat: Double, rr: Int): Double = {
    val z = QuadKey.level(qcell)
    val n = 1 << z
    val x = QuadKey.decodeX(qcell); val y = QuadKey.decodeY(qcell)
    val lo = QuadKey.tileExtent(QuadKey.encodeXY(math.max(0, x - rr), math.max(0, y - rr), z))
    val hi = QuadKey.tileExtent(QuadKey.encodeXY(math.min(n - 1, x + rr), math.min(n - 1, y + rr), z))
    val ext = lo.merge(hi)
    val left = if (x - rr <= 0) Double.MaxValue else qlon - ext.minLon
    val right = if (x + rr >= n - 1) Double.MaxValue else ext.maxLon - qlon
    val bot = if (y + rr >= n - 1) Double.MaxValue else qlat - ext.minLat
    val top = if (y - rr <= 0) Double.MaxValue else ext.maxLat - qlat
    val b = Seq(left, right, bot, top).min
    if (b == Double.MaxValue) Double.MaxValue else b * b
  }

  /** J3 at corpus scale on BOTH sides: kNN where the query set is itself a
    * large DataFrame (millions of probes) — nothing query-related ever lives
    * on the driver. Each round explodes the remaining queries to their
    * (2r+1)² disk cells, equi-joins candidates on the cell id (grid-
    * partitioned shuffle join, never a cross join), takes per-query top-k,
    * and finalizes queries whose kth distance is certified exact by
    * `diskBound2`; unfinished queries continue with r doubled (≤ zoom+1
    * rounds to the world disk). Distances are squared degrees, matching
    * `knnJoin`.
    */
  def knnJoinBig(queries: DataFrame, points: DataFrame, k: Int,
                 zoom: Int = graft.table.Pages.JoinZoom + 3): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // The kNN grid must be FINER than the join/tiling grid: with c points per
    // cell, round 1 materializes ~9c candidates per query through the top-k
    // window, so coarse cells turn a dense corpus into a quadratic-ish
    // candidate flood (measured: zoom 4 over 530k points = ~18k candidates/
    // query, 100M+ windowed rows; zoom 7 ≈ 60× less). Pick zoom so cells hold
    // O(10²) points; the result is zoom-invariant (exactness is certified by
    // diskBound2 every round) — only the plan's shape changes. The corpus is
    // re-encoded here (one narrow codegen'd pass) so callers can hand in any
    // cell column without it constraining the kNN grid.
    val pts = points.select(col("pid"), col("lon"), col("lat"),
      graft.functions.CellEncode(col("lat"), col("lon"), zoom).as("cell")).cache()
    val qcellUdf = udf((lat: Double, lon: Double) => QuadKey.encode(lat, lon, zoom))
    var remaining = queries.select(col("qid"), col("qlon"), col("qlat"))
      .withColumn("_qcell", qcellUdf(col("qlat"), col("qlon"))).cache()
    val maxR = 1 << zoom
    var acc: DataFrame = null
    // per-round doneRows caches are bounded by ≤ zoom+1 rounds, but they must
    // not outlive the call: collect them and release after the final union is
    // materialized (round-4 cleanup)
    val doneCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 1
    var done = remaining.isEmpty
    while (!done) {
      val rr = math.min(r, maxR)
      val diskUdf = udf((cell: Long) => QuadKey.disk(cell, rr))
      val boundUdf = udf((cell: Long, qlon: Double, qlat: Double) => diskBound2(cell, qlon, qlat, rr))
      val q = remaining.withColumn("_b2", boundUdf(col("_qcell"), col("qlon"), col("qlat")))
        .withColumn("cell", explode(diskUdf(col("_qcell"))))
      val cand = pts.join(q, Seq("cell"))
        .withColumn("dist2",
          (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
            (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("dist2").asc, col("pid").asc)
      val topk = cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("pid"), col("dist2"), col("_b2"))
      val finals = topk.groupBy("qid")
        .agg(count(lit(1)).as("_cnt"), max("dist2").as("_kth"), first("_b2").as("_b"))
        .filter(lit(rr >= maxR) || (col("_cnt") >= k && col("_kth") <= col("_b")))
        .select("qid")
      val doneRows = topk.join(finals, Seq("qid"), "left_semi")
        .select("qid", "rank", "pid", "dist2").cache()
      doneRows.count() // materialize before remaining/pts caches churn
      doneCaches += doneRows
      acc = if (acc == null) doneRows else acc.unionByName(doneRows)
      val next = remaining.join(finals, Seq("qid"), "left_anti").cache()
      val nLeft = next.count()
      if (System.getProperty("graft.knnDebug") != null)
        System.err.println(s"[knnJoinBig] r=$rr remaining_after=$nLeft")
      done = rr >= maxR || nLeft == 0
      remaining.unpersist()
      remaining = next
      r *= 2
    }
    remaining.unpersist()
    pts.unpersist()
    if (acc == null) Seq.empty[(Long, Int, Long, Double)].toDF("qid", "rank", "pid", "dist2")
    else {
      // materialize the union into ONE checkpoint, then release every
      // per-round cache — callers get a lineage-free result and the call
      // leaves no lingering cached RDDs behind (asserted in JoinsSpec)
      val out = acc.localCheckpoint(true)
      doneCaches.foreach(_.unpersist(false))
      out
    }
  }

  def knnJoin(queries: Seq[(Long, Double, Double)], points: DataFrame, k: Int,
              zoom: Int = graft.table.Pages.JoinZoom + 3): DataFrame = {
    // Contract: the query set is driver-resident and broadcast each round —
    // right for "nearest reference dataset" workloads (tens to thousands of
    // probes against a huge corpus). A million-query kNN needs a different
    // plan (cell-partitioned two-sided join), so fail loudly instead of
    // silently melting the driver.
    require(queries.size <= 100000,
      s"knnJoin is designed for small driver-side query sets; got ${queries.size} queries")
    val spark = points.sparkSession
    import spark.implicits._
    // the corpus side is re-joined every round — materialize it once, cell-
    // encoded at the kNN grid zoom (NOT the caller's cell column: the kNN
    // grid must match `zoom` and wants finer cells than the join/tiling
    // grid — see knnJoinBig)
    val pts = points.select(col("pid"), col("lon"), col("lat"),
      graft.functions.CellEncode(col("lat"), col("lon"), zoom).as("cell")).cache()
    var remaining = queries
    var r = 1
    var acc: DataFrame = null
    val roundCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val maxR = (1 << zoom) // disk covers the world → guaranteed final
    while (remaining.nonEmpty && r <= maxR) {
      val cellMap = remaining.flatMap { case (qid, qlon, qlat) =>
        QuadKey.disk(QuadKey.encode(qlat, qlon, zoom), math.min(r, maxR))
          .map(c => (qid, qlon, qlat, c))
      }.toDF("qid", "qlon", "qlat", "cell")
      // disk bound: min distance from the query point to the covered rectangle's
      // border; sides clamped at the world edge are unbounded (nothing beyond)
      val bounds = remaining.map { case (qid, qlon, qlat) =>
        (qid, diskBound2(QuadKey.encode(qlat, qlon, zoom), qlon, qlat, math.min(r, maxR)))
      }.toMap
      val cand = pts.join(broadcast(cellMap), Seq("cell"), "inner")
        .withColumn("dist2",
          (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
            (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("dist2").asc, col("pid").asc)
      // topk is ≤ k·|remaining| rows — cache it so the perQ collect below and
      // the `done` slice feeding the result read it once; without the cache
      // the broadcast-join + window pass over the corpus ran TWICE per round
      // (once for the certification collect, once when the result
      // materialized). Values are unchanged — the same plan, evaluated once.
      val topk = cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("qid", "rank", "pid", "dist2").cache()
      roundCaches += topk
      val perQ = topk.groupBy("qid").agg(count(lit(1)).as("cnt"), max("dist2").as("kth")).collect()
        .map(row => (row.getLong(0), (row.getLong(1), row.getDouble(2)))).toMap
      // at the world-disk radius the candidate set IS the whole corpus, so a
      // query with fewer than k candidates is final with its partial top-k
      // (fewer than k corpus points exist at all)
      val worldDisk = r >= maxR
      val satisfied = remaining.filter { case (qid, _, _) =>
        (worldDisk && perQ.contains(qid)) ||
          perQ.get(qid).exists { case (cnt, kth) => cnt >= k && kth <= bounds(qid) }
      }.map(_._1).toSet
      val done = topk.filter(col("qid").isin(satisfied.toSeq: _*))
      acc = if (acc == null) done else acc.unionByName(done)
      remaining = remaining.filterNot(q => satisfied.contains(q._1))
      r *= 2
    }
    // any stragglers at world-disk radius are exact by construction; an empty
    // corpus yields an empty result frame (never null)
    val out =
      if (acc != null) acc.cache()
      else {
        import spark.implicits._
        Seq.empty[(Long, Int, Long, Double)].toDF("qid", "rank", "pid", "dist2")
      }
    out.count() // materialize before releasing the corpus + per-round caches
    roundCaches.foreach(_.unpersist(false))
    pts.unpersist()
    out
  }

  /** J4: temporal interval overlap join. The dim side (time buckets/quarters) is
    * broadcast; the overlap predicate runs map-side. For big-big interval joins
    * use `bucketedRangeJoin` (equi-prefilter on overlapping coarse buckets).
    */
  def intervalOverlapJoin(facts: DataFrame, dims: DataFrame,
                          fStart: String, fEnd: String, dStart: String, dEnd: String): DataFrame =
    facts.join(broadcast(dims),
      col(fStart) <= col(dEnd) && col(dStart) <= col(fEnd), "inner")

  /** Big-big interval join: explode both sides to coarse buckets (days/`bucketDays`),
    * equi-join on bucket, then apply the exact overlap residual and dedup.
    */
  def bucketedRangeJoin(a: DataFrame, b: DataFrame,
                        aStart: String, aEnd: String, bStart: String, bEnd: String,
                        bucketDays: Int): DataFrame = {
    def withBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bucket",
        explode(sequence(floor(unix_date(col(s)) / bucketDays),
          floor(unix_date(col(e)) / bucketDays))))
    withBuckets(a, aStart, aEnd)
      .join(withBuckets(b, bStart, bEnd), Seq("_bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .drop("_bucket").dropDuplicates()
  }

  /** Distance-threshold (range) spatial join: every (query, point) pair
    * within `radiusDeg` planar degrees (squared-degree metric, same as kNN —
    * the reference compares raw lon/lat). ONE grid pass, no iteration:
    * each query computes up front the smallest cell-disk radius whose
    * [[diskBound2]] certifies that nothing OUTSIDE the disk can lie within
    * `radiusDeg` (Mercator cell heights shrink toward the poles, so the
    * required disk is per-query, not a constant), explodes exactly that
    * disk, cell-equi-joins the corpus on the grid, and keeps
    * dist² ≤ radius². A point lives in exactly one cell, so no pair is
    * produced twice. Candidates are disk-proportional and the join is the
    * same grid-partitioned shuffle as kNN/PIP — never a cross join; hot
    * cells salt like any other cell-equi join.
    */
  def distanceJoin(queries: DataFrame, points: DataFrame, radiusDeg: Double,
                   zoom: Int = graft.table.Pages.JoinZoom + 3,
                   cellSalts: Map[Long, Int] = Map.empty): DataFrame = {
    require(radiusDeg > 0, s"radius must be positive, got $radiusDeg")
    val r2 = radiusDeg * radiusDeg
    val pts = points.select(col("pid"), col("lon"), col("lat"),
      graft.functions.CellEncode(col("lat"), col("lon"), zoom).as("cell"))
    val maxR = 1 << zoom
    val diskUdf = udf((qlat: Double, qlon: Double) => {
      val qcell = QuadKey.encode(qlat, qlon, zoom)
      // rr = 0 keeps single-cell disks when the query's own cell certifies
      // the radius; <= (not <) because the kept predicate is CLOSED
      // (dist² ≤ r²) — at bound² == r² a point exactly on the disk's
      // boundary line encodes into the first cell outside and would be lost
      var rr = 0
      while (rr < maxR && diskBound2(qcell, qlon, qlat, rr) <= r2) rr += 1
      QuadKey.disk(qcell, rr)
    })
    val q = queries.select(col("qid"), col("qlon"), col("qlat"))
      .withColumn("cell", explode(diskUdf(col("qlat"), col("qlon"))))
    // per-hot-cell salting (detector-driven, see distanceJoinSkewAware): a
    // pair (q,p) sharing cell c meets exactly once at salt hash(pid) %
    // salts(c), so the result set is identical to the unsalted join
    // (JoinsSpec property) while a hot cell's candidates fan out over
    // salts(c) reducers instead of one.
    saltedCellEquiJoin(pts, col("pid"), q, cellSalts)
      .withColumn("dist2",
        (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
          (col("lat") - col("qlat")) * (col("lat") - col("qlat")))
      .filter(col("dist2") <= lit(r2))
      .select(col("qid"), col("pid"), col("dist2"))
  }

  /** Detector → salt-factor → salted grid join (the skew wiring): runs the
    * exact Misra–Gries heavy-hitter detector over the point side's cell ids
    * (never shuffles the full key set) and salts every cell whose share
    * exceeds 1/(k+1) proportionally to its share of the parallelism. With no
    * hot cell this is byte-for-byte the plain [[distanceJoin]] plan.
    */
  def distanceJoinSkewAware(queries: DataFrame, points: DataFrame, radiusDeg: Double,
                            zoom: Int = graft.table.Pages.JoinZoom + 3,
                            k: Int = 32, maxSalts: Int = 64): DataFrame = {
    val cells = points.select(
      graft.functions.CellEncode(col("lat"), col("lon"), zoom).as("cell"))
    distanceJoin(queries, points, radiusDeg, zoom,
      hotCellSalts(cells, k, maxSalts))
  }

  /** The one correctness-critical salted-equi-join construction, shared by
    * both skew-aware grid joins: `big` salts deterministically by its unique
    * `saltKey`, `other` replicates a row only for cells in the salt map
    * (absent cells default to 1 — unsalted). Every (big, other) pair sharing
    * cell c meets exactly once, at salt hash(saltKey) % salts(c); with an
    * empty map this is byte-for-byte the plain cell join.
    */
  private def saltedCellEquiJoin(big: DataFrame, saltKey: Column, other: DataFrame,
                                 cellSalts: Map[Long, Int]): DataFrame =
    if (cellSalts.isEmpty) big.join(other, Seq("cell"))
    else {
      val nOf: Column => Column =
        c => coalesce(element_at(typedLit(cellSalts), c), lit(1))
      val bigS = big.withColumn("_salt", pmod(hash(saltKey), nOf(col("cell"))))
      val otherS = other.withColumn("_salt", explode(sequence(lit(0), nOf(col("cell")) - 1)))
      bigS.join(otherS, Seq("cell", "_salt")).drop("_salt")
    }

  /** Hot cover cells → salt factors: share-proportional spread, bounded.
    * A cell owning share s of the rows fans out over ~s·parallelism reducers
    * (at least 2, at most `maxSalts`).
    */
  private[graft] def hotCellSalts(cells: DataFrame, k: Int, maxSalts: Int): Map[Long, Int] = {
    val par = cells.sparkSession.sparkContext.defaultParallelism
    graft.operators.HeavyHitters.heavyHitters(cells, col("cell"), k)
      .collect()
      .map { r =>
        val cnt = r.getLong(1); val n = math.max(1L, r.getLong(2))
        r.getLong(0) -> math.min(maxSalts,
          math.max(2, math.ceil(cnt.toDouble * par / n).toInt))
      }.toMap
  }

  /** Extent-overlap (rectangle-intersection) join for two BIG extent tables
    * — the exact-geometry complement of the q49 tile bridge (which joins in
    * rolled-up tile space). Both sides explode to their zoom-z cover cells
    * (the Tiler's generator), cell-equi join on the grid, exact closed
    * rect-overlap residual, and pairs that meet in several shared cells are
    * deduplicated WITHOUT a distinct shuffle: a pair is emitted only in its
    * REPORTING CELL — the cell containing the overlap region's min corner
    * (PBSM's reporting-point dedup, Patel & DeWitt SIGMOD'96, public). The
    * corner (max of min_lons, max of min_lats) lies inside both rects, so
    * its cell is in both covers and every overlapping pair meets there
    * exactly once; the codegen'd CellEncode recomputes it with the same
    * floor+clamp as the cover, so boundary corners agree by construction.
    * For a self-join, alias one side's id column first — identical id names
    * are rejected (the output would be ambiguous).
    */
  def extentOverlapJoin(a: DataFrame, aId: String, b: DataFrame, bId: String,
                        zoom: Int = graft.table.Pages.JoinZoom + 3,
                        cellSalts: Map[Long, Int] = Map.empty): DataFrame = {
    require(aId != bId,
      s"id columns must have distinct names (got '$aId' twice) — alias one side for self-joins")
    val pa = coverPrep(a, aId, "a", zoom)
    val pb = coverPrep(b, bId, "b", zoom)
    // per-hot-cell salting (detector-driven, see extentOverlapJoinSkewAware):
    // salting commutes with the rect residual AND the reporting-cell filter
    // — both are pure per-pair predicates, and a pair meeting in cell c
    // meets exactly once at salt hash(aId) % salts(c) — so the output pair
    // set is identical (JoinsSpec property) while the planted hot cell fans
    // out over salts(c) reducers.
    saltedCellEquiJoin(pa, col(aId), pb, cellSalts)
      .filter(col("a0") <= col("b2") && col("b0") <= col("a2") &&
        col("a1") <= col("b3") && col("b1") <= col("a3"))
      .filter(graft.functions.CellEncode(
        greatest(col("a1"), col("b1")), greatest(col("a0"), col("b0")), zoom) === col("cell"))
      .select(col(aId), col(bId))
  }

  private def coverPrep(df: DataFrame, id: String, p: String, zoom: Int): DataFrame =
    df.filter(col("min_lon").isNotNull)
      .select(col(id), col("min_lon").as(s"${p}0"), col("min_lat").as(s"${p}1"),
        col("max_lon").as(s"${p}2"), col("max_lat").as(s"${p}3"))
      .withColumn("cell", explode(graft.tiles.Tiler.cover(
        col(s"${p}0"), col(s"${p}1"), col(s"${p}2"), col(s"${p}3"), zoom)))

  /** Detector → salt-factor → salted cover-cell join (VERDICT r5 task 3
    * wiring): the Misra–Gries detector measures the a side's cover-cell
    * distribution (one narrow scan + a bounded verify scan — the full key
    * set is never shuffled) and hot cells are salted share-proportionally.
    * With no hot cell the plan is byte-for-byte the plain join.
    */
  def extentOverlapJoinSkewAware(a: DataFrame, aId: String, b: DataFrame, bId: String,
                                 zoom: Int = graft.table.Pages.JoinZoom + 3,
                                 k: Int = 32, maxSalts: Int = 64): DataFrame =
    extentOverlapJoin(a, aId, b, bId, zoom,
      hotCellSalts(coverPrep(a, aId, "a", zoom).select("cell"), k, maxSalts))
}
