package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Planar geospatial operators over an INTEGER grid — the spatial-join /
  * neighborhood family (Sedona / PostGIS territory) re-expressed as
  * grid-bucketed equi-joins so Catalyst plans them like any other join.
  *
  * Contract: coordinates are integers (projected microdegrees, meters, or
  * any fixed-point grid — at 100 TB you project once at ingest and never
  * carry float lat/lon through joins). Integer squared-Euclidean
  * distance makes every predicate exact on both engines: no haversine/trig
  * in the join path (trig is not bit-stable across engines, and a
  * fixed-point planar projection is how production spatial joins avoid it
  * anyway — the projection step is a per-row scalar map left to ingest).
  *
  * Scale design (all three operators share it):
  *   - candidate generation is a GRID-CELL EQUI-JOIN: cell width = the
  *     query radius, the probe side expands to its 3×3 neighbor cells
  *     (bounded 9× fanout, repartitioned to explicit N first per the
  *     row-expansion ground rule), the build side keys by its single home
  *     cell — every true pair shares a probe cell exactly once, so there
  *     is no post-join distinct;
  *   - the exact d² ≤ r² filter runs inside the join stage (codegen'd
  *     integer arithmetic), so shuffle volume is cells, never all-pairs;
  *   - a hot cell (urban-core skew) is an ordinary skewed join key: AQE
  *     skew-join or the salting operators apply unchanged — which is the
  *     point of spelling spatial candidates as a plain equi-join.
  */
object Geo {

  /** Distance-threshold spatial join: all (left, right) pairs with
    * squared Euclidean distance ≤ radius² on the integer grid. Output:
    * every left column, every right column, plus `d2` (exact BIGINT).
    * Column names must be disjoint.
    *
    * `probePartitions`: explicit repartition width for the probe side
    * BEFORE its 9× neighbor-cell expansion — AQE coalesces by INPUT bytes
    * and is blind to the fanout (the q115 lesson), so the width is a
    * visible knob, not an inferred one. */
  def gridDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      lx: String, ly: String,
      rx: String, ry: String,
      radius: Long,
      probePartitions: Int = 32): DataFrame = {
    require(radius >= 1, s"gridDistanceJoin: radius must be >= 1, got $radius")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"gridDistanceJoin: overlapping columns $overlap")
    // FLOOR division for the cell key (subtract the non-negative pmod
    // remainder first): both engines' integer division TRUNCATES toward
    // zero (Spark `div` and DuckDB `//` alike — measured round 12), which
    // would mis-cell negative coordinates; subtracting the pmod remainder
    // makes the numerator exactly divisible, so the quotient is the true
    // floor on both engines and negative grids are correct
    def cell(c: String): Column =
      expr(s"(CAST($c AS BIGINT) - pmod($c, $radius)) div $radius")
    // home cell of the build side; 3x3 neighborhood of the probe side —
    // any pair within `radius` differs by at most one cell per axis, so
    // the probe's 9 cells cover every true partner and each (probe cell =
    // build home cell) match occurs exactly once.
    val probe = left
      .repartition(probePartitions)
      .withColumn("__geo_hx", cell(lx))
      .withColumn("__geo_hy", cell(ly))
      .withColumn("__geo_c", explode(expr(
        "flatten(transform(sequence(-1L, 1L), dx -> " +
          "transform(sequence(-1L, 1L), dy -> " +
          "struct(__geo_hx + dx AS cx, __geo_hy + dy AS cy))))")))
      .withColumn("__geo_cx", col("__geo_c.cx"))
      .withColumn("__geo_cy", col("__geo_c.cy"))
      .drop("__geo_c", "__geo_hx", "__geo_hy")
    val build = right
      .withColumn("__geo_cx", cell(rx))
      .withColumn("__geo_cy", cell(ry))
    val d2 = (col(lx) - col(rx)) * (col(lx) - col(rx)) +
      (col(ly) - col(ry)) * (col(ly) - col(ry))
    probe
      .join(build, Seq("__geo_cx", "__geo_cy"))
      .drop("__geo_cx", "__geo_cy")
      .withColumn("d2", d2.cast("long"))
      .filter(col("d2") <= lit(radius * radius))
  }

  /** k nearest right-side neighbors within `radius` of each left row —
    * the bounded-radius kNN every geo feature pipeline runs ("closest k
    * depots within 50 km"). Exact: grid candidates (above) ranked by
    * (d², rIdCol) through the bounded-heap TopK physical operator — at
    * most k rows per (group, input partition) cross the shuffle, vs the
    * window spelling's full candidate sort. The rIdCol tiebreak makes the
    * boundary deterministic. Left rows with NO neighbor in range are
    * absent (it is a join, not a gap-fill — LEFT-join a spine afterwards
    * if the zero rows matter). */
  def knnWithinRadius(
      left: DataFrame,
      right: DataFrame,
      lIdCol: String, rIdCol: String,
      lx: String, ly: String,
      rx: String, ry: String,
      radius: Long,
      k: Int,
      probePartitions: Int = 32): DataFrame = {
    require(k >= 1, s"knnWithinRadius: k must be >= 1, got $k")
    val cand = gridDistanceJoin(left, right, lx, ly, rx, ry, radius, probePartitions)
    TopK.perGroup(cand, Seq(lIdCol), Seq("d2" -> true, rIdCol -> true), k)
  }

  /** Grid DBSCAN (Ester et al. KDD'96 semantics, exact): density clusters
    * on the integer grid — core points have ≥ `minPts` neighbors within
    * `eps` (the point itself counts, per the paper's |N_eps(p)|), clusters
    * are connected components of core points under eps-adjacency, border
    * points (non-core with a core neighbor) attach to their MINIMUM core
    * neighbor's cluster (the paper leaves multi-assignment ambiguous;
    * minimum makes it deterministic), everything else is noise.
    *
    * Exactness makes this oracle-replayable — the usual DBSCAN
    * non-determinism is entirely in border tie-breaks, pinned here.
    *
    * Shape: ONE grid self-join for eps-neighbor pairs (cells = eps wide),
    * a count for core-ness, checkpointed min-label CC with pointer jumping
    * over core-core edges (O(log diameter) rounds), one broadcast-friendly
    * join for border attachment. Cluster id = min point id in the
    * component. Returns (idCol, role 'core'|'border'|'noise',
    * cluster BIGINT, NULL for noise). Ids must be unique and non-null.
    *
    * At 100 TB: the neighbor join is the dominant cost and is exactly the
    * gridDistanceJoin scale story (cell equi-join, AQE-skewable); the CC
    * fixpoint runs over core EDGES (density-bounded: ≤ minPts-dense
    * neighborhoods by definition of the clusters one cares about), and
    * everything after is metadata-shaped per cluster. */
  def gridDbscan(
      points: DataFrame,
      idCol: String, xCol: String, yCol: String,
      eps: Long,
      minPts: Int,
      probePartitions: Int = 32): DataFrame = {
    require(minPts >= 1, s"gridDbscan: minPts must be >= 1, got $minPts")
    val base = points.select(col(idCol), col(xCol), col(yCol)).localCheckpoint(true)
    // SELF-join specialization of gridDistanceJoin (r18 opt, guide §2.3/§2.1):
    // probe only the HALF-PLANE neighbor cells {(0,0),(1,0),(-1,1),(0,1),
    // (1,1)} — 5x fanout instead of 9x — so each unordered pair's distance
    // is evaluated ONCE (same-cell pairs deduped by id order, cross-cell
    // pairs unique because exactly one endpoint sees the other in its
    // positive half-plane), then symmetrize by projection and add the
    // self-pairs (d2 = 0 — |N_eps(p)| counts p itself). Candidate rows and
    // the d² filter work halve; the symmetrized result is what the
    // original 9-cell ordered join produced, row for row.
    def cell(c: String): Column =
      expr(s"(CAST($c AS BIGINT) - pmod($c, $eps)) div $eps")
    val pts = base.select(
      col(idCol).as("__db_aid"), col(xCol).as("__db_ax"), col(yCol).as("__db_ay"))
      .withColumn("__db_hx", cell("__db_ax"))
      .withColumn("__db_hy", cell("__db_ay"))
    val probe = pts
      .repartition(probePartitions)
      .withColumn("__db_c", explode(array(
        struct(col("__db_hx").as("cx"), col("__db_hy").as("cy")),
        struct((col("__db_hx") + 1L).as("cx"), col("__db_hy").as("cy")),
        struct((col("__db_hx") - 1L).as("cx"), (col("__db_hy") + 1L).as("cy")),
        struct(col("__db_hx").as("cx"), (col("__db_hy") + 1L).as("cy")),
        struct((col("__db_hx") + 1L).as("cx"), (col("__db_hy") + 1L).as("cy")))))
      .select(col("__db_aid"), col("__db_ax"), col("__db_ay"),
        col("__db_hx"), col("__db_hy"),
        col("__db_c.cx").as("__db_cx"), col("__db_c.cy").as("__db_cy"))
    val build = pts.select(
      col("__db_aid").as("__db_bid"), col("__db_ax").as("__db_bx"),
      col("__db_ay").as("__db_by"),
      col("__db_hx").as("__db_cx"), col("__db_hy").as("__db_cy"))
    val half = probe
      .join(build, Seq("__db_cx", "__db_cy"))
      .filter(
        (col("__db_ax") - col("__db_bx")) * (col("__db_ax") - col("__db_bx")) +
          (col("__db_ay") - col("__db_by")) * (col("__db_ay") - col("__db_by"))
          <= lit(eps * eps))
      .filter(col("__db_hx") =!= col("__db_cx") ||
        col("__db_hy") =!= col("__db_cy") || col("__db_aid") < col("__db_bid"))
      .select(col("__db_aid"), col("__db_bid"))
    val pairs = half
      .unionAll(half.select(col("__db_bid").as("__db_aid"), col("__db_aid").as("__db_bid")))
      .unionAll(base.select(col(idCol).as("__db_aid"), col(idCol).as("__db_bid")))
      .localCheckpoint(true)
    val core = pairs.groupBy(col("__db_aid"))
      .agg(count(lit(1)).as("__db_n"))
      .filter(col("__db_n") >= minPts)
      .select(col("__db_aid").as("__db_core"))
      .localCheckpoint(true)
    val coreEdges = pairs
      .filter(col("__db_aid") < col("__db_bid"))
      .join(core.withColumnRenamed("__db_core", "__db_aid"), Seq("__db_aid"), "left_semi")
      .join(core.withColumnRenamed("__db_core", "__db_bid"), Seq("__db_bid"), "left_semi")
      .select(col("__db_aid").as("id1"), col("__db_bid").as("id2"))
    // min-id components over core-core adjacency; isolated cores (no core
    // neighbor) are their own singleton cluster via the coalesce below
    val roots = Dedup.duplicateClusters(coreEdges)
      .select(col("id").as("__db_core"), col("root").as("__db_root"))
    val coreLabeled = core
      .join(roots, Seq("__db_core"), "left")
      .select(col("__db_core"),
        coalesce(col("__db_root"), col("__db_core")).as("__db_cluster"))
      .localCheckpoint(true)
    // border: non-core with >= 1 core neighbor -> min core-neighbor cluster
    val borderLabel = pairs
      .join(core.withColumnRenamed("__db_core", "__db_aid"), Seq("__db_aid"), "left_anti")
      .join(coreLabeled.withColumnRenamed("__db_core", "__db_bid"), Seq("__db_bid"))
      .groupBy(col("__db_aid"))
      .agg(min(col("__db_cluster")).as("__db_cluster"))
    base
      .join(coreLabeled.withColumnRenamed("__db_core", idCol)
          .withColumnRenamed("__db_cluster", "__db_corecl"), Seq(idCol), "left")
      .join(borderLabel.withColumnRenamed("__db_aid", idCol)
          .withColumnRenamed("__db_cluster", "__db_bordercl"), Seq(idCol), "left")
      .select(
        col(idCol),
        when(col("__db_corecl").isNotNull, lit("core"))
          .when(col("__db_bordercl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__db_corecl"), col("__db_bordercl")).cast("long").as("cluster"))
  }


  /** Big-big RECTANGLE overlap join — the 2-D face of the 1-D interval
    * bin join (q313) and the bbox prefilter behind every real polygon
    * join: both sides are rectangle RELATIONS (half-open
    * [x1,x2)×[y1,y2)), a pair matches when the boxes intersect.
    * Candidates come from exploding each box to the fixed-width TILES it
    * covers and equi-joining on the tile — hash(tile) turns spatial
    * locality into partition locality, AQE skew split applies — and each
    * matching pair emits EXACTLY ONCE: in the tile containing the
    * intersection's min corner (the 2-D first-bucket trick), so there is
    * no distinct over the output. Degenerate boxes (x2 ≤ x1 or y2 ≤ y1)
    * drop before the explode; floor-div tiling via the pmod-subtract
    * idiom keeps negative coordinates correct.
    *
    * Tile width trades explode fanout (⌈w/tile⌉·⌈h/tile⌉ per box) against
    * candidate selectivity — size it near the median box edge. Explicit-N
    * repartitions guard both explosions (the q115 rule). Column names
    * must be disjoint. */
  def bboxOverlapJoin(
      left: DataFrame, right: DataFrame,
      lx1: String, lx2: String, ly1: String, ly2: String,
      rx1: String, rx2: String, ry1: String, ry2: String,
      tile: Long,
      probePartitions: Int = 32): DataFrame = {
    require(tile >= 1, s"bboxOverlapJoin: tile must be >= 1, got $tile")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"bboxOverlapJoin: overlapping columns $overlap")
    def tiled(df: DataFrame, x1: String, x2: String, y1: String, y2: String) = df
      .filter(col(x2) > col(x1) && col(y2) > col(y1))
      .repartition(probePartitions)
      .withColumn("__geo_t", explode(expr(
        s"flatten(transform(sequence(($x1 - pmod($x1, $tile)) div $tile, " +
          s"($x2 - 1 - pmod($x2 - 1, $tile)) div $tile), tx -> " +
          s"transform(sequence(($y1 - pmod($y1, $tile)) div $tile, " +
          s"($y2 - 1 - pmod($y2 - 1, $tile)) div $tile), ty -> " +
          "struct(tx, ty))))")))
      .withColumn("__geo_tx", col("__geo_t.tx"))
      .withColumn("__geo_ty", col("__geo_t.ty"))
      .drop("__geo_t")
    val l = tiled(left, lx1, lx2, ly1, ly2)
    val r = tiled(right, rx1, rx2, ry1, ry2)
    l.join(r, Seq("__geo_tx", "__geo_ty"))
      .filter(col(lx1) < col(rx2) && col(rx1) < col(lx2) &&
        col(ly1) < col(ry2) && col(ry1) < col(ly2))
      // emit-once: only in the tile holding the intersection's min corner
      // (integral `div` on the materialized corner — floor via pmod)
      .withColumn("__geo_mx", greatest(col(lx1), col(rx1)))
      .withColumn("__geo_my", greatest(col(ly1), col(ry1)))
      .filter(col("__geo_tx") ===
          expr(s"(__geo_mx - pmod(__geo_mx, $tile)) div $tile") &&
        col("__geo_ty") ===
          expr(s"(__geo_my - pmod(__geo_my, $tile)) div $tile"))
      .drop("__geo_tx", "__geo_ty", "__geo_mx", "__geo_my")
  }

  /** Multi-resolution tile pyramid (the map-tile / H3-style zoom
    * aggregation every geo dashboard and spatial index needs): points
    * bucket into Morton cells at the FINEST level (`bits` per axis —
    * 2^bits × 2^bits tiles over [0, 2^coordBits)² non-negative
    * coordinates), and every coarser level derives from the census below
    * it by `z div 4` — dropping one Morton bit-pair merges the 4 children
    * into their parent tile, exactly. ONE data-wide shuffle total (the
    * finest groupBy); the pyramid above it is census-sized aggregations —
    * at 100 TB the zoom stack costs one scan, not one scan per level.
    * Returns (level 1..bits, z, cnt). */
  def tilePyramid(
      points: DataFrame,
      xCol: String, yCol: String,
      bits: Int,
      coordBits: Int): DataFrame = {
    require(bits >= 1 && bits <= 16, s"tilePyramid: bits in [1,16], got $bits")
    require(coordBits >= bits && coordBits <= 31,
      s"tilePyramid: coordBits in [$bits,31], got $coordBits")
    val shiftN = coordBits - bits
    val finest = points
      .select(
        Zorder.interleave(
          shiftright(col(xCol).cast("long"), shiftN),
          shiftright(col(yCol).cast("long"), shiftN), bits).as("z"))
      .groupBy("z").agg(count(lit(1)).as("cnt"))
      .withColumn("level", lit(bits))
      .localCheckpoint(true) // root of the census chain, reused per level
    (bits - 1 to 1 by -1)
      .scanLeft(finest) { (child, lvl) =>
        child.select(expr("z div 4").as("z"), col("cnt"))
          .groupBy("z").agg(sum(col("cnt")).as("cnt"))
          .withColumn("level", lit(lvl))
          .localCheckpoint(true)
      }
      .reduce(_ unionByName _)
      .select(col("level").cast("int").as("level"), col("z").cast("long").as("z"),
        col("cnt").cast("long").as("cnt"))
  }

  /** Point-in-convex-polygon test as a pure codegen'd Column: inside (or
    * on the boundary) iff the point is on the non-negative side of every
    * edge of the COUNTER-CLOCKWISE vertex ring — one exact integer cross
    * product per edge, no trig, no floats, trivially oracle-replayable.
    * Refuses vertex rings that are not strictly convex CCW (a concave or
    * clockwise ring would silently test the wrong region). The convex
    * restriction is the honest contract: arbitrary polygons need ray
    * casting with edge-case handling that has no exact-SQL twin; convex
    * cells (tiles, fences, viewports) are the overwhelmingly common
    * filter shape. */
  def pointInConvexPolygon(
      x: Column, y: Column, vertices: Seq[(Long, Long)]): Column = {
    require(vertices.size >= 3, s"pointInConvexPolygon: need >= 3 vertices")
    val n = vertices.size
    val crossSigns = (0 until n).map { i =>
      val (x1, y1) = vertices(i)
      val (x2, y2) = vertices((i + 1) % n)
      val (x3, y3) = vertices((i + 2) % n)
      (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
    }
    require(crossSigns.forall(_ > 0),
      "pointInConvexPolygon: vertices must form a strictly convex CCW ring")
    (0 until n).map { i =>
      val (x1, y1) = vertices(i)
      val (x2, y2) = vertices((i + 1) % n)
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0L
    }.reduce(_ && _)
  }
}
