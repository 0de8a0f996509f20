package graft

import org.apache.spark.sql.functions._

import graft.QueryDsl._

/** Catalog chunk q313+ — round-11: big-big interval algebra and further
  * pipeline primitives. Registration + docs in [[graft.Queries]]. */
private[graft] object Catalog12 {

  /** Big-big interval OVERLAP join
    * ([[graft.operators.RangeJoin.intervalOverlapJoin]] — the shuffled
    * bin-join counterpart of the broadcast interval lookup: both sides are
    * interval RELATIONS, neither fits in memory, a pair matches when the
    * half-open intervals intersect; candidates from a plain (key, bucket)
    * equi-join, each pair emitted exactly once in the intersection's first
    * bucket — no distinct over the output). Per-customer order fulfillment
    * windows from key arithmetic: even orders vs odd orders, window length
    * 1..14 / 1..10 days; output is the one-row pair census with an
    * exact-integer overlap-hours checksum. Oracle replays the windows in
    * epoch-microsecond arithmetic and joins on the raw overlap predicate
    * (DuckDB's IEJoin); durations are positive, where truncating and
    * flooring division coincide (both engines truncate — measured r12). */
  val q313_interval_overlap = Q(
    "q313_interval_overlap",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def side(parity: Int, maxDays: Int, idc: String, sc: String, ec: String) = o
        .filter(pmod(col("o_orderkey"), lit(2)) === parity)
        .select(
          col("o_custkey").as("k"),
          col("o_orderkey").as(idc),
          col("o_orderdate").as(sc),
          timestamp_micros(unix_micros(col("o_orderdate")) +
            (pmod(col("o_orderkey"), lit(maxDays)) + 1L) * 86400000000L).as(ec))
      val l = side(0, 14, "lid", "ls", "le")
      val r = side(1, 10, "rid", "rs", "re")
      graft.operators.RangeJoin
        .intervalOverlapJoin(l, r, Seq("k"), "ls", "le", "rs", "re",
          bucketWidthSeconds = 7L * 86400L)
        .agg(
          count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("k")).cast("long").as("n_keys"),
          sum(col("lid")).cast("long").as("sum_lid"),
          sum(col("rid")).cast("long").as("sum_rid"),
          sum(expr("(least(unix_micros(le), unix_micros(re)) - " +
            "greatest(unix_micros(ls), unix_micros(rs))) div 3600000000"))
            .cast("long").as("sum_overlap_hours"))
    },
    Some("""WITH iv AS (
              SELECT o_custkey AS k, o_orderkey AS id, o_orderkey % 2 AS par,
                     epoch_us(o_orderdate) AS s,
                     epoch_us(o_orderdate) +
                       (o_orderkey % (CASE WHEN o_orderkey % 2 = 0 THEN 14 ELSE 10 END) + 1)
                         * 86400000000 AS e
              FROM orders),
            pairs AS (
              SELECT l.k, l.id AS lid, r.id AS rid,
                     LEAST(l.e, r.e) - GREATEST(l.s, r.s) AS ov
              FROM (SELECT * FROM iv WHERE par = 0) l
              JOIN (SELECT * FROM iv WHERE par = 1) r
                ON l.k = r.k AND l.s < r.e AND r.s < l.e)
            SELECT COUNT(*)::BIGINT AS n_pairs,
                   COUNT(DISTINCT k)::BIGINT AS n_keys,
                   SUM(lid)::BIGINT AS sum_lid,
                   SUM(rid)::BIGINT AS sum_rid,
                   SUM(ov // 3600000000)::BIGINT AS sum_overlap_hours
            FROM pairs"""))

  /** Pareto frontier / skyline ([[graft.operators.Skyline.paretoFrontier]]
    * — multi-objective selection without a weight vector: rows not
    * strictly dominated in (all dims ≥, one dim >); the grid-prune
    * two-phase keeps the exact test on the staircase band, and pruning
    * never changes the answer — correctness is bucket-count-independent,
    * which the spec pins and which lets the oracle compute the skyline
    * directly). Orders on (floor-dollar total ↑, order-day ↑): "largest
    * order AND most recent" trade-off rows. Oracle = the 2-D cummax
    * formulation: dominated iff max(v2 | v1 > mine) ≥ mine OR
    * max(v2 | v1 ≥ mine) > mine, two RANGE-frame windows. FLOOR of a
    * shared double is bit-stable; day = positive integral div. */
  val q314_pareto_frontier = Q(
    "q314_pareto_frontier",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("id"),
        floor(col("o_totalprice")).cast("long").as("v1"),
        expr("CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)").as("v2"))
      graft.operators.Skyline.paretoFrontier(o, Seq("v1", "v2"))
        .orderBy("id")
    },
    Some("""WITH p AS (
              SELECT o_orderkey AS id,
                     CAST(FLOOR(o_totalprice) AS BIGINT) AS v1,
                     (epoch_us(o_orderdate) // 86400000000)::BIGINT AS v2
              FROM orders),
            w AS (
              SELECT id, v1, v2,
                     MAX(v2) OVER (ORDER BY v1
                       RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m_strict,
                     MAX(v2) OVER (ORDER BY v1
                       RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m_weak
              FROM p)
            SELECT id, v1, v2 FROM w
            WHERE NOT (COALESCE(m_strict, -1) >= v2 OR m_weak > v2)
            ORDER BY id"""))

  /** Weighted multi-source shortest paths
    * ([[graft.operators.Graph.weightedSssp]] — the WEIGHTED rung above
    * q303's BFS: exact min-COST distances, distributed Bellman-Ford with
    * delta-frontier relaxation, refusal on round exhaustion). The graph
    * is CONSTRUCTED from part keys (q304 discipline — the oracle derives
    * every distance independently from the arithmetic): the 10-ary digit
    * tree (edge k→k div 10, weight k%7+1) plus grandparent SHORTCUTS
    * (k→k div 100, weight 13) that win exactly when the two tree hops
    * they bypass sum to 14 — so the min-fold is genuinely exercised, and
    * a bug that ignores (or always prefers) shortcuts moves the census.
    * dist(seed, v) = a ≤5-term LEAST over the {1,2}-step compositions of
    * the ancestor chain; reached(seed) = seed's digit subtree. */
  val q315_weighted_sssp = Q(
    "q315_weighted_sssp",
    (s, dir) => {
      val keys = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("k"))
        .filter(col("k") < 100000L) // depth <= 4 below the single-digit roots
      val tree = keys.filter(col("k") >= 10L).select(
        expr("CAST(k div 10 AS BIGINT)").as("src"), col("k").as("dst"),
        (pmod(col("k"), lit(7L)) + 1L).as("w"))
      val cuts = keys.filter(col("k") >= 100L).select(
        expr("CAST(k div 100 AS BIGINT)").as("src"), col("k").as("dst"),
        lit(13L).as("w"))
      graft.operators.Graph
        .weightedSssp(tree.unionByName(cuts), Seq(1L, 2L, 3L), maxRounds = 16)
        .groupBy("seed")
        .agg(count(lit(1)).cast("long").as("n_reached"),
          max(col("dist")).cast("long").as("max_dist"),
          sum(col("dist")).cast("long").as("sum_dist"),
          sum(col("node") * col("dist")).cast("long").as("checksum"))
        .orderBy("seed")
    },
    Some("""WITH n AS (SELECT CAST(p_partkey AS BIGINT) AS v FROM part
                       WHERE p_partkey < 100000),
            b AS (SELECT v, v // 10 AS a1, v // 100 AS a2,
                         v // 1000 AS a3, v // 10000 AS a4,
                         v % 7 + 1 AS w0, (v // 10) % 7 + 1 AS w1,
                         (v // 100) % 7 + 1 AS w2, (v // 1000) % 7 + 1 AS w3
                  FROM n),
            d AS (
              SELECT s.seed, b.v AS node,
                CASE
                  WHEN b.v = s.seed THEN 0
                  WHEN b.a1 = s.seed THEN w0
                  WHEN b.a2 = s.seed THEN LEAST(w0 + w1, 13)
                  WHEN b.a3 = s.seed THEN LEAST(w0 + w1 + w2, 13 + w2, w0 + 13)
                  ELSE LEAST(w0 + w1 + w2 + w3, w0 + w1 + 13, w0 + 13 + w3,
                             13 + w2 + w3, 26)
                END AS dist
              FROM b CROSS JOIN (SELECT unnest([1, 2, 3]) AS seed) s
              WHERE b.v = s.seed OR b.a1 = s.seed OR b.a2 = s.seed
                 OR b.a3 = s.seed OR b.a4 = s.seed)
            SELECT seed::BIGINT AS seed, COUNT(*)::BIGINT AS n_reached,
                   MAX(dist)::BIGINT AS max_dist, SUM(dist)::BIGINT AS sum_dist,
                   SUM(node * dist)::BIGINT AS checksum
            FROM d GROUP BY 1 ORDER BY 1"""))

  /** Stream-stream FULL OUTER interval join
    * ([[graft.streaming.StreamOps.intervalJoin]] joinType=full_outer —
    * completing the streaming join matrix after q154 inner and q295 left
    * outer: BOTH sides' unmatched rows are results, each emitted
    * null-padded only once the global watermark proves no partner can
    * arrive; key columns resolve via coalesce since either side can be
    * the null one). Disjoint sparse slices of the event stream so both
    * sides produce null emissions; q295's deterministic drain (event-
    * time-monotone chunks, AvailableNow, memory sink). Oracle replays
    * pairs + BOTH NOT-EXISTS null sets under the exact watermark cutoff
    * min(max_l, max_r) − delay. */
  val q316_stream_full_outer = Q(
    "q316_stream_full_outer",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id").cast("long").as("user_id"), col("event_id"), col("ts"))
        .withColumn("day", expr("CAST(ts AS LONG) div 86400"))
      val minDay = ev.agg(min(col("day"))).head().getLong(0)
      val inDir = java.nio.file.Files.createTempDirectory("graft-q316-in")
      (0 to 2).foreach { c =>
        val stage = java.nio.file.Files.createTempDirectory(s"graft-q316-c$c").toString
        ev.filter(expr(s"(day - $minDay) div 10") === c)
          .drop("day").coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath
        val target = inDir.resolve(f"chunk$c%03d.parquet")
        java.nio.file.Files.move(part, target)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + c * 60000L))
      }
      val schema = s.read.parquet(inDir.toString).schema
      val stream = normalizeTs(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString))
      val left = stream.filter(col("event_id") % 10 === 0).drop("event_id")
      val right = stream.filter(col("event_id") % 10 === 5).drop("event_id")
      val joined = graft.streaming.StreamOps.intervalJoin(
        left, right, Seq("user_id"), "ts", within = "10 minutes",
        watermark = "1 minute", joinType = "full_outer")
      val qname = s"graft_q316_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(
        joined.writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
      q.awaitTermination()
      s.table(qname)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts_l").isNotNull && col("ts_r").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_pairs"),
          sum(when(col("ts_r").isNull, 1L).otherwise(0L)).cast("long").as("n_left_nulls"),
          sum(when(col("ts_l").isNull, 1L).otherwise(0L)).cast("long").as("n_right_nulls"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_id, ts FROM events WHERE user_id < 50),
            l AS (SELECT user_id, ts FROM ev WHERE event_id % 10 = 0),
            r AS (SELECT user_id, ts FROM ev WHERE event_id % 10 = 5),
            wm AS (SELECT LEAST((SELECT MAX(ts) FROM l), (SELECT MAX(ts) FROM r))
                          - INTERVAL 1 MINUTE AS w),
            pairs AS (
              SELECT l.user_id, COUNT(*)::BIGINT AS n
              FROM l JOIN r ON l.user_id = r.user_id
                AND r.ts BETWEEN l.ts - INTERVAL 10 MINUTE AND l.ts + INTERVAL 10 MINUTE
              GROUP BY 1),
            lnulls AS (
              SELECT l.user_id, COUNT(*)::BIGINT AS n
              FROM l
              WHERE NOT EXISTS (
                  SELECT 1 FROM r WHERE r.user_id = l.user_id
                    AND r.ts BETWEEN l.ts - INTERVAL 10 MINUTE AND l.ts + INTERVAL 10 MINUTE)
                AND l.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)
              GROUP BY 1),
            rnulls AS (
              SELECT r.user_id, COUNT(*)::BIGINT AS n
              FROM r
              WHERE NOT EXISTS (
                  SELECT 1 FROM l WHERE l.user_id = r.user_id
                    AND l.ts BETWEEN r.ts - INTERVAL 10 MINUTE AND r.ts + INTERVAL 10 MINUTE)
                AND r.ts + INTERVAL 10 MINUTE < (SELECT w FROM wm)
              GROUP BY 1),
            users AS (SELECT DISTINCT user_id FROM (
              SELECT user_id FROM pairs
              UNION ALL SELECT user_id FROM lnulls
              UNION ALL SELECT user_id FROM rnulls))
            SELECT u.user_id::BIGINT AS user_id,
                   COALESCE(p.n, 0)::BIGINT AS n_pairs,
                   COALESCE(a.n, 0)::BIGINT AS n_left_nulls,
                   COALESCE(b.n, 0)::BIGINT AS n_right_nulls
            FROM users u
            LEFT JOIN pairs p ON p.user_id = u.user_id
            LEFT JOIN lnulls a ON a.user_id = u.user_id
            LEFT JOIN rnulls b ON b.user_id = u.user_id
            ORDER BY 1"""))

  // ------------------------------------------------------------------
  // Geospatial family (operators/Geo.scala) — integer-grid planar points
  // derived from key arithmetic so every oracle replays the construction.
  // Customers form 40 dense BLOBS (8×5 centers, ±11 jitter), suppliers
  // scatter uniformly — blobs exercise density clustering and give the
  // spatial joins realistic hot cells.
  // ------------------------------------------------------------------

  /** Shared customer blob points: (id, nk, x, y). */
  private def custBlobPoints(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "customer").select(
      col("c_custkey").as("id"),
      col("c_nationkey").cast("long").as("nk"),
      (pmod(pmod(col("c_custkey"), lit(40L)), lit(8L)) * 125L + 62L +
        pmod(col("c_custkey") * 48271L, lit(23L)) - 11L).as("x"),
      (expr("(c_custkey % 40) div 8") * 200L + 100L +
        pmod(col("c_custkey") * 16807L, lit(23L)) - 11L).as("y"))

  private val custBlobSql =
    """SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nk,
              (c_custkey % 40) % 8 * 125 + 62 + (c_custkey * 48271) % 23 - 11 AS x,
              (c_custkey % 40) // 8 * 200 + 100 + (c_custkey * 16807) % 23 - 11 AS y
       FROM customer"""

  /** Shared uniform supplier points: (sid, sx, sy). */
  private def suppPoints(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "supplier").select(
      col("s_suppkey").as("sid"),
      pmod(col("s_suppkey") * 48271L, lit(1000L)).as("sx"),
      pmod(col("s_suppkey") * 16807L, lit(1000L)).as("sy"))

  private val suppSql =
    """SELECT s_suppkey AS sid, (s_suppkey * 48271) % 1000 AS sx,
              (s_suppkey * 16807) % 1000 AS sy
       FROM supplier"""

  /** Distance-threshold spatial join
    * ([[graft.operators.Geo.gridDistanceJoin]] — the Sedona-shape spatial
    * join as a grid-cell EQUI-join: cell width = radius, probe side
    * expands to its 3×3 neighbor cells (bounded 9× fanout behind an
    * explicit repartition), build side keys by its home cell, exact
    * integer d² ≤ r² inside the join stage — no all-pairs, no distinct,
    * and a hot cell is an ordinary AQE-skewable join key). Customers
    * within 50 grid units of a supplier; one-row pair census. The oracle
    * is the RAW distance join — the grid is invisible to semantics. */
  val q317_spatial_join = Q(
    "q317_spatial_join",
    (s, dir) => {
      val cust = custBlobPoints(s, dir).drop("nk")
      val supp = suppPoints(s, dir)
      graft.operators.Geo.gridDistanceJoin(cust, supp, "x", "y", "sx", "sy", 50L)
        .agg(
          count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("id")).cast("long").as("n_cust"),
          countDistinct(col("sid")).cast("long").as("n_supp"),
          sum(col("d2")).cast("long").as("sum_d2"),
          sum(col("id") * col("sid")).cast("long").as("checksum"))
    },
    Some(s"""WITH cp AS ($custBlobSql),
            sp AS ($suppSql),
            pr AS (
              SELECT cp.id, sp.sid,
                     (cp.x - sp.sx) * (cp.x - sp.sx) + (cp.y - sp.sy) * (cp.y - sp.sy) AS d2
              FROM cp JOIN sp
                ON (cp.x - sp.sx) * (cp.x - sp.sx) + (cp.y - sp.sy) * (cp.y - sp.sy) <= 2500)
            SELECT COUNT(*)::BIGINT AS n_pairs,
                   COUNT(DISTINCT id)::BIGINT AS n_cust,
                   COUNT(DISTINCT sid)::BIGINT AS n_supp,
                   SUM(d2)::BIGINT AS sum_d2,
                   SUM(id * sid)::BIGINT AS checksum
            FROM pr"""))

  /** Bounded-radius k-nearest-neighbors
    * ([[graft.operators.Geo.knnWithinRadius]] — grid candidates ranked by
    * (d², neighbor id) through the bounded-heap TopK physical operator: at
    * most k rows per (customer, partition) cross the shuffle, vs the
    * window spelling's full candidate sort; the id tiebreak pins the
    * boundary). 3 nearest suppliers within 150 units per customer;
    * customers with no supplier in range are absent by join contract. */
  val q318_geo_knn = Q(
    "q318_geo_knn",
    (s, dir) => {
      val cust = custBlobPoints(s, dir).drop("nk")
      val supp = suppPoints(s, dir)
      graft.operators.Geo
        .knnWithinRadius(cust, supp, "id", "sid", "x", "y", "sx", "sy", 150L, 3)
        .groupBy(col("id").as("custkey"))
        .agg(
          count(lit(1)).cast("long").as("n_nb"),
          min(col("d2")).cast("long").as("min_d2"),
          sum(col("sid")).cast("long").as("sum_supp"))
        .orderBy("custkey")
    },
    Some(s"""WITH cp AS ($custBlobSql),
            sp AS ($suppSql),
            pr AS (
              SELECT cp.id, sp.sid,
                     (cp.x - sp.sx) * (cp.x - sp.sx) + (cp.y - sp.sy) * (cp.y - sp.sy) AS d2
              FROM cp JOIN sp
                ON (cp.x - sp.sx) * (cp.x - sp.sx) + (cp.y - sp.sy) * (cp.y - sp.sy) <= 22500),
            rk AS (
              SELECT id, sid, d2,
                     ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, sid) AS rn
              FROM pr)
            SELECT id AS custkey, COUNT(*)::BIGINT AS n_nb,
                   MIN(d2)::BIGINT AS min_d2, SUM(sid)::BIGINT AS sum_supp
            FROM rk WHERE rn <= 3 GROUP BY 1 ORDER BY 1"""))

  /** Grid DBSCAN ([[graft.operators.Geo.gridDbscan]] — KDD'96 semantics
    * made EXACT and deterministic: core = ≥ minPts eps-neighbors counting
    * self, clusters = min-id connected components of core adjacency
    * (checkpointed pointer-jumping CC), border points attach to their
    * MINIMUM core neighbor's cluster — the one ambiguity the paper leaves
    * open, pinned so the oracle can replay it; neighbor pairs come from
    * the q317 grid join, never all-pairs). Customer blobs plus the
    * uniform supplier scatter (ids offset 10M — isolated points that MUST
    * come out noise) at eps=4, minPts=8: all three roles populated
    * (1039/452/109 at sf0.01) so the census pins core, border AND noise
    * semantics. Oracle: raw-distance pairs + recursive-CTE components. */
  val q319_grid_dbscan = Q(
    "q319_grid_dbscan",
    (s, dir) => {
      val pts = custBlobPoints(s, dir).drop("nk").unionByName(
        suppPoints(s, dir).select(
          (col("sid") + 10000000L).as("id"),
          col("sx").as("x"), col("sy").as("y")))
      graft.operators.Geo.gridDbscan(pts, "id", "x", "y", eps = 4L, minPts = 8)
        .groupBy(col("role"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          countDistinct(col("cluster")).cast("long").as("n_clusters"),
          coalesce(sum(col("cluster")), lit(0L)).cast("long").as("sum_cluster"))
        .orderBy("role")
    },
    Some(s"""WITH RECURSIVE pts AS (
              $custBlobSql
              UNION ALL
              SELECT s_suppkey + 10000000 AS id,
                     NULL::BIGINT AS nk,
                     (s_suppkey * 48271) % 1000 AS x,
                     (s_suppkey * 16807) % 1000 AS y
              FROM supplier),
            pr AS (
              SELECT a.id AS aid, b.id AS bid
              FROM pts a JOIN pts b
                ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 16),
            core AS (SELECT aid AS id FROM pr GROUP BY 1 HAVING COUNT(*) >= 8),
            ce AS (
              SELECT p.aid AS a, p.bid AS b
              FROM pr p JOIN core c1 ON p.aid = c1.id JOIN core c2 ON p.bid = c2.id
              WHERE p.aid <> p.bid),
            walk(id, reach) AS (
              SELECT id, id FROM core
              UNION
              SELECT w.id, e.b FROM walk w JOIN ce e ON w.reach = e.a),
            corelab AS (SELECT id, MIN(reach) AS cluster FROM walk GROUP BY 1),
            borderlab AS (
              SELECT p.aid AS id, MIN(c.cluster) AS cluster
              FROM pr p JOIN corelab c ON p.bid = c.id
              WHERE p.aid NOT IN (SELECT id FROM core)
              GROUP BY 1),
            lab AS (
              SELECT pts.id,
                     CASE WHEN cl.id IS NOT NULL THEN 'core'
                          WHEN bl.id IS NOT NULL THEN 'border'
                          ELSE 'noise' END AS role,
                     COALESCE(cl.cluster, bl.cluster) AS cluster
              FROM pts
              LEFT JOIN corelab cl ON pts.id = cl.id
              LEFT JOIN borderlab bl ON pts.id = bl.id)
            SELECT role, COUNT(*)::BIGINT AS n,
                   COUNT(DISTINCT cluster)::BIGINT AS n_clusters,
                   COALESCE(SUM(cluster), 0)::BIGINT AS sum_cluster
            FROM lab GROUP BY 1 ORDER BY 1"""))

  /** Point-in-convex-polygon filter
    * ([[graft.operators.Geo.pointInConvexPolygon]] — one exact integer
    * cross product per edge of a CCW convex ring, pure codegen'd
    * boolean, no trig/floats; the geofence/viewport/tile filter shape).
    * Uniform customer points against a hexagonal fence, tallied per
    * nation. Boundary points count as inside on both engines (≥ 0). */
  val q320_point_in_polygon = Q(
    "q320_point_in_polygon",
    (s, dir) => {
      val hex = Seq((500L, 50L), (900L, 300L), (900L, 700L),
        (500L, 950L), (100L, 700L), (100L, 300L))
      val pts = t(s, dir, "customer").select(
        col("c_nationkey").cast("long").as("nk"),
        pmod(col("c_custkey") * 16807L, lit(1000L)).as("x"),
        pmod(col("c_custkey") * 69621L, lit(1000L)).as("y"))
      pts
        .withColumn("inside",
          graft.operators.Geo.pointInConvexPolygon(col("x"), col("y"), hex))
        .groupBy(col("nk"))
        .agg(
          count(lit(1)).cast("long").as("n_total"),
          sum(when(col("inside"), 1L).otherwise(0L)).cast("long").as("n_inside"))
        .orderBy("nk")
    },
    Some {
      val hex = Seq((500L, 50L), (900L, 300L), (900L, 700L),
        (500L, 950L), (100L, 700L), (100L, 300L))
      val tests = hex.indices.map { i =>
        val (x1, y1) = hex(i)
        val (x2, y2) = hex((i + 1) % hex.size)
        s"(${x2 - x1}) * (y - ($y1)) - (${y2 - y1}) * (x - ($x1)) >= 0"
      }.mkString(" AND ")
      s"""WITH p AS (
            SELECT CAST(c_nationkey AS BIGINT) AS nk,
                   (c_custkey * 16807) % 1000 AS x,
                   (c_custkey * 69621) % 1000 AS y
            FROM customer)
          SELECT nk, COUNT(*)::BIGINT AS n_total,
                 SUM(CASE WHEN $tests THEN 1 ELSE 0 END)::BIGINT AS n_inside
          FROM p GROUP BY 1 ORDER BY 1"""
    })

  // ------------------------------------------------------------------
  // Rank-statistics family (operators/RankStats.scala) — distribution
  // tests with EXACT integer numerators via the distinct-value census
  // (rank2 = doubled tie-averaged ranks), never a global per-row sort.
  // ------------------------------------------------------------------

  /** Two-sample Kolmogorov–Smirnov drift test
    * ([[graft.operators.RankStats.ksTest]] — D carried as the exact
    * integer max|cumA·nB − cumB·nA| over the merged distinct-value
    * census; the ECDF gap peaks at a data point, so the census sweep IS
    * the test; d_ppm via positive integer division). click-vs-purchase
    * value distributions per user cohort. */
  val q321_ks_test = Q(
    "q321_ks_test",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cohort", pmod(col("user_id"), lit(4L)))
      graft.operators.RankStats
        .ksTest(ev, "value", "event_type", "click", "purchase", Seq("cohort"))
        .orderBy("cohort")
    },
    Some("""WITH e AS (
              SELECT user_id % 4 AS cohort, value, event_type
              FROM events WHERE event_type IN ('click', 'purchase')),
            cen AS (
              SELECT cohort, value,
                     SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
                     SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
              FROM e GROUP BY 1, 2),
            sw AS (
              SELECT cohort,
                     SUM(ca) OVER (PARTITION BY cohort ORDER BY value) AS cuma,
                     SUM(cb) OVER (PARTITION BY cohort ORDER BY value) AS cumb,
                     SUM(ca) OVER (PARTITION BY cohort) AS na,
                     SUM(cb) OVER (PARTITION BY cohort) AS nb
              FROM cen)
            SELECT cohort::BIGINT AS cohort, MAX(na)::BIGINT AS n_a,
                   MAX(nb)::BIGINT AS n_b,
                   MAX(ABS(cuma * nb - cumb * na))::BIGINT AS d_num,
                   ((MAX(ABS(cuma * nb - cumb * na)) * 1000000)
                      // (MAX(na) * MAX(nb)))::BIGINT AS d_ppm
            FROM sw GROUP BY 1 ORDER BY 1"""))

  /** Mann–Whitney U ([[graft.operators.RankStats.mannWhitney]] — U doubled
    * so tie-averaged ranks stay integer: u2 = 2ΣR_A − n_a(n_a+1) over the
    * pooled rank2 census; u_ppm = the common-language effect size
    * P(A>B)+½P(A=B)). view-vs-signup values per cohort. */
  val q322_mann_whitney = Q(
    "q322_mann_whitney",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cohort", pmod(col("user_id"), lit(4L)))
      graft.operators.RankStats
        .mannWhitney(ev, "value", "event_type", "view", "signup", Seq("cohort"))
        .orderBy("cohort")
    },
    Some("""WITH e AS (
              SELECT user_id % 4 AS cohort, value, event_type
              FROM events WHERE event_type IN ('view', 'signup')),
            cen AS (
              SELECT cohort, value, COUNT(*) AS cnt,
                     SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca
              FROM e GROUP BY 1, 2),
            rk AS (
              SELECT cohort, cnt, ca,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY cohort ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2
              FROM cen),
            ag AS (
              SELECT cohort, SUM(ca) AS na, SUM(cnt - ca) AS nb,
                     SUM(ca * rank2) AS sr
              FROM rk GROUP BY 1)
            SELECT cohort::BIGINT AS cohort, na::BIGINT AS n_a, nb::BIGINT AS n_b,
                   (sr - na * (na + 1))::BIGINT AS u2,
                   (((sr - na * (na + 1)) * 1000000) // (2 * na * nb))::BIGINT AS u_ppm
            FROM ag WHERE na > 0 AND nb > 0 ORDER BY 1"""))

  /** Spearman rank correlation ([[graft.operators.RankStats.spearman]] —
    * tie-averaged Σd² form with d2sum4 = Σ(rank2_x − rank2_y)² exact;
    * rho_ppm = (2D − 3·d2sum4)·10⁶ / 2D, D = n(n²−1), in sign-magnitude
    * DECIMAL/HUGEINT division; plus the r13 tie completion rho_b_ppm =
    * full Pearson-on-ranks from exact BIGINT moment sums and
    * identically-spelled IEEE SQRT). quantity-vs-price monotone
    * association per (returnflag, ship month). */
  val q323_spearman = Q(
    "q323_spearman",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        month(col("l_shipdate")).cast("long").as("mo"),
        col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
      graft.operators.RankStats.spearman(li, "x", "y", Seq("l_returnflag", "mo"))
        .orderBy("l_returnflag", "mo")
    },
    Some("""WITH li AS (
              SELECT l_returnflag, CAST(month(l_shipdate) AS BIGINT) AS mo,
                     l_quantity AS x, l_extendedprice AS y
              FROM lineitem),
            cx AS (SELECT l_returnflag, mo, x, COUNT(*) AS cnt FROM li GROUP BY 1, 2, 3),
            rx AS (
              SELECT l_returnflag, mo, x,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY l_returnflag, mo ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS r2x
              FROM cx),
            cy AS (SELECT l_returnflag, mo, y, COUNT(*) AS cnt FROM li GROUP BY 1, 2, 3),
            ry AS (
              SELECT l_returnflag, mo, y,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY l_returnflag, mo ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS r2y
              FROM cy),
            j AS (
              SELECT li.l_returnflag, li.mo, rx.r2x, ry.r2y
              FROM li
              JOIN rx ON li.l_returnflag = rx.l_returnflag AND li.mo = rx.mo AND li.x = rx.x
              JOIN ry ON li.l_returnflag = ry.l_returnflag AND li.mo = ry.mo AND li.y = ry.y),
            ag AS (
              SELECT l_returnflag, mo, COUNT(*) AS n,
                     SUM((r2x - r2y) * (r2x - r2y)) AS d2sum4,
                     CAST(SUM(r2x * r2y) AS BIGINT) AS sxy,
                     CAST(SUM(r2x * r2x) AS BIGINT) AS sxx,
                     CAST(SUM(r2y * r2y) AS BIGINT) AS syy
              FROM j GROUP BY 1, 2),
            mm AS (
              SELECT l_returnflag, mo, n, d2sum4,
                     n * sxy - (n * (n + 1)) * (n * (n + 1)) AS pnum,
                     n * sxx - (n * (n + 1)) * (n * (n + 1)) AS dx,
                     n * syy - (n * (n + 1)) * (n * (n + 1)) AS dy
              FROM ag)
            SELECT l_returnflag, mo, n::BIGINT AS n, d2sum4::BIGINT AS d2sum4,
                   ((CASE WHEN 2 * n * (n * n - 1) - 3 * d2sum4 < 0 THEN -1 ELSE 1 END)
                    * ((ABS(2 * n * (n * n - 1) - 3 * d2sum4)::HUGEINT * 1000000)
                       // (2 * n * (n * n - 1))))::BIGINT AS rho_ppm,
                   CASE WHEN dx = 0 OR dy = 0 THEN NULL
                        ELSE CAST(FLOOR((CAST(pnum AS DOUBLE) * 1000000.0)
                          / (SQRT(CAST(dx AS DOUBLE)) * SQRT(CAST(dy AS DOUBLE))))
                          AS BIGINT) END AS rho_b_ppm
            FROM mm WHERE n >= 2 ORDER BY 1, 2"""))

  /** ROC-AUC as the Mann–Whitney effect size
    * ([[graft.operators.RankStats.rocAuc]] — AUC = P(s⁺>s⁻)+½P(=) exactly,
    * so the rank2 census gives the exact integer u2 and auc_ppm without a
    * single float; the model-eval operator every filter-training loop
    * needs). Planted discrete classifier over lineitem: label from
    * partkey residue, score = 7·label + hash noise in 0..12 → overlapping
    * but separable, per returnflag. */
  val q324_roc_auc = Q(
    "q324_roc_auc",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        (pmod(col("l_partkey"), lit(5L)) === 0L).as("lab"),
        (when(pmod(col("l_partkey"), lit(5L)) === 0L, 7L).otherwise(0L) +
          pmod(col("l_orderkey") * 48271L, lit(13L))).as("score"))
      graft.operators.RankStats.rocAuc(li, "score", "lab", Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },
    Some("""WITH d AS (
              SELECT l_returnflag,
                     (l_partkey % 5 = 0) AS lab,
                     (CASE WHEN l_partkey % 5 = 0 THEN 7 ELSE 0 END)
                       + (l_orderkey * 48271) % 13 AS score
              FROM lineitem),
            cen AS (
              SELECT l_returnflag, score, COUNT(*) AS cnt,
                     SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS ca
              FROM d GROUP BY 1, 2),
            rk AS (
              SELECT l_returnflag, cnt, ca,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2
              FROM cen),
            ag AS (
              SELECT l_returnflag, SUM(ca) AS np, SUM(cnt - ca) AS nn,
                     SUM(ca * rank2) AS sr
              FROM rk GROUP BY 1)
            SELECT l_returnflag, np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
                   (sr - np * (np + 1))::BIGINT AS u2,
                   (((sr - np * (np + 1)) * 1000000) // (2 * np * nn))::BIGINT AS auc_ppm
            FROM ag WHERE np > 0 AND nn > 0 ORDER BY 1"""))

  /** Exact multiple regression via distributed normal equations
    * ([[graft.ml.Regress.olsFitPpm]] — ONE map-side-combinable pass builds
    * XᵀX/Xᵀy (metadata-sized), the solve is exact BigInt Cramer on the
    * driver, coefficients emerge as floor-divided ppm rationals —
    * bit-identical under any partitioning, no gradient iterations, no
    * float order-dependence; HUGEINT replays the determinants in SQL).
    * Planted linear target y = 3x₁ − 2x₂ + 7 + uniform-ish hash noise:
    * the fit recovers the plan within the noise floor, r2_ppm included. */
  val q325_normal_equations = Q(
    "q325_normal_equations",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        pmod(col("l_partkey"), lit(17L)).as("x1"),
        pmod(col("l_suppkey"), lit(13L)).as("x2"),
        (lit(3L) * pmod(col("l_partkey"), lit(17L))
          - lit(2L) * pmod(col("l_suppkey"), lit(13L)) + 7L
          + pmod(col("l_orderkey") * 48271L, lit(11L)) - 5L).as("y"))
      graft.ml.Regress.olsFitPpm(li, Seq("x1", "x2"), "y")
    },
    Some("""WITH d AS (
              SELECT l_partkey % 17 AS x1, l_suppkey % 13 AS x2,
                     3 * (l_partkey % 17) - 2 * (l_suppkey % 13) + 7
                       + (l_orderkey * 48271) % 11 - 5 AS y
              FROM lineitem),
            m AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                     CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
                     CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
                     CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
                     CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
                     CAST(SUM(y) AS HUGEINT) AS sy,
                     CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
                     CAST(SUM(x2 * y) AS HUGEINT) AS s2y,
                     CAST(SUM(y * y) AS HUGEINT) AS syy
              FROM d),
            c AS (
              SELECT n, sy, syy,
                     s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1)
                       + s1 * (s12 * s2 - s22 * s1) AS det,
                     s1y * (s22 * n - s2 * s2) - s12 * (s2y * n - s2 * sy)
                       + s1 * (s2y * s2 - s22 * sy) AS det1,
                     s11 * (s2y * n - s2 * sy) - s1y * (s12 * n - s2 * s1)
                       + s1 * (s12 * sy - s2y * s1) AS det2,
                     s11 * (s22 * sy - s2y * s2) - s12 * (s12 * sy - s2y * s1)
                       + s1y * (s12 * s2 - s22 * s1) AS det3,
                     s1y AS b1, s2y AS b2
              FROM m),
            r AS (
              SELECT n, det, det1, det2, det3,
                     det * syy - (det1 * b1 + det2 * b2 + det3 * sy) AS ssenum,
                     n * syy - sy * sy AS sstnum
              FROM c)
            SELECT n::BIGINT AS n,
                   ((det1 * 1000000) // det)::BIGINT AS ppm_x1,
                   ((det2 * 1000000) // det)::BIGINT AS ppm_x2,
                   ((det3 * 1000000) // det)::BIGINT AS ppm_intercept,
                   (((sstnum * det - ssenum * n) * 1000000)
                      // (sstnum * det))::BIGINT AS r2_ppm
            FROM r"""))

  /** Poisson bootstrap confidence interval
    * ([[graft.operators.Resample.bootstrapMeanCi]] — the resampling that
    * distributes: deterministic Poisson(1) weights from
    * xxhash64(id·B + rep) cut against cumulative-ppm thresholds, all B
    * replicates riding ONE aggregation pass as 2B partial-agg columns —
    * no row explosion, no extra shuffle; CI = exact order statistics of
    * the B replicate means in ppm). 95%-ish band (ranks 2/63 of 64) for
    * mean event value in cents, per event type. The oracle replays every
    * draw through the XXH64 stages. */
  val q326_bootstrap_ci = Q(
    "q326_bootstrap_ci",
    (s, dir) => {
      // the even-user slice halves the ORACLE's 64-replicate hash replay
      // (its only superlinear consumer); the operator itself is one scan
      val ev = t(s, dir, "events").filter(pmod(col("user_id"), lit(2L)) === 0L)
        .select(
          col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.operators.Resample
        .bootstrapMeanCi(ev, "event_id", "cents", reps = 64,
          loRank = 2, hiRank = 63, groupCols = Seq("event_type"))
        .orderBy("event_type")
    },
    Some {
      val hashed = graft.tools.OracleSql.xxhash64LongStages(
        """SELECT event_type, cents, r AS rep, event_id * 64 + r AS hk
           FROM (SELECT event_id, event_type,
                        CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
                 WHERE user_id % 2 = 0)
           CROSS JOIN (SELECT unnest(range(0, 64)) AS r)""",
        "hk", "h", pfx = "__bs")
      s"""WITH hh AS ($hashed),
            ww AS (
              SELECT event_type, cents, rep,
                     CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                          WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                          WHEN u < 996340 THEN 4 ELSE 5 END AS w
              FROM (SELECT *, ((h % 1000000) + 1000000) % 1000000 AS u FROM hh)),
            rs AS (
              SELECT event_type, rep, SUM(w) AS n_w, SUM(w * cents) AS sum_w
              FROM ww GROUP BY 1, 2),
            rm AS (
              SELECT event_type, rep,
                     CAST((CASE WHEN sum_w < 0 THEN -1 ELSE 1 END)
                       * ((ABS(sum_w)::HUGEINT * 1000000) // n_w) AS BIGINT) AS mean_ppm
              FROM rs WHERE n_w > 0),
            rk AS (
              SELECT event_type, mean_ppm,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY mean_ppm, rep) AS rk
              FROM rm),
            band AS (
              SELECT event_type,
                     MAX(CASE WHEN rk = 2 THEN mean_ppm END) AS lo_ppm,
                     MAX(CASE WHEN rk = 63 THEN mean_ppm END) AS hi_ppm
              FROM rk GROUP BY 1),
            pt AS (
              SELECT event_type, COUNT(*)::BIGINT AS n,
                     CAST((SUM(CAST(ROUND(value * 100) AS BIGINT))::HUGEINT * 1000000)
                       // COUNT(*) AS BIGINT) AS mean_ppm
              FROM events WHERE user_id % 2 = 0 GROUP BY 1)
            SELECT pt.event_type, pt.n, pt.mean_ppm, band.lo_ppm, band.hi_ppm
            FROM pt JOIN band ON pt.event_type = band.event_type
            ORDER BY 1"""
    })

  /** Kendall rank correlation ([[graft.operators.RankStats.kendallPairs]]
    * — concordant/discordant pair counts via the joint-value-census
    * self-join: cost is census², row count never enters the join;
    * explicit-N repartition before the census² expansion per the q115
    * rule; τ_a in sign-magnitude ppm with exact C/D/n alongside, plus
    * the r13 tie completion: exact marginal tie-pair sums n1/n2 from two
    * census aggregates and tie-corrected τ_b via identically-spelled
    * IEEE SQRT on both engines). quantity vs 10k-dollar price bucket per
    * returnflag. */
  val q327_kendall = Q(
    "q327_kendall",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") / 10000.0).cast("long").as("y"))
      graft.operators.RankStats.kendallPairs(li, "x", "y", Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },
    Some("""WITH li AS (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                     CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS y
              FROM lineitem),
            cen AS (SELECT l_returnflag, x, y, COUNT(*) AS c FROM li GROUP BY 1, 2, 3),
            pairs AS (
              SELECT a.l_returnflag,
                     SUM(CASE WHEN b.x > a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END) AS cp,
                     SUM(CASE WHEN b.x > a.x AND b.y < a.y THEN a.c * b.c ELSE 0 END) AS dp
              FROM cen a JOIN cen b ON a.l_returnflag = b.l_returnflag
              GROUP BY 1),
            tot AS (SELECT l_returnflag, COUNT(*) AS n FROM li GROUP BY 1),
            tx AS (
              SELECT l_returnflag, CAST(SUM((t * (t - 1)) // 2) AS BIGINT) AS n1
              FROM (SELECT l_returnflag, x, SUM(c) AS t FROM cen GROUP BY 1, 2)
              GROUP BY 1),
            ty AS (
              SELECT l_returnflag, CAST(SUM((t * (t - 1)) // 2) AS BIGINT) AS n2
              FROM (SELECT l_returnflag, y, SUM(c) AS t FROM cen GROUP BY 1, 2)
              GROUP BY 1)
            SELECT t.l_returnflag, n::BIGINT AS n, cp::BIGINT AS c_pairs,
                   dp::BIGINT AS d_pairs,
                   CAST((CASE WHEN cp - dp < 0 THEN -1 ELSE 1 END)
                     * ((ABS(cp - dp)::HUGEINT * 1000000) // ((n * (n - 1)) // 2))
                     AS BIGINT) AS tau_a_ppm,
                   n1 AS tie_x_pairs, n2 AS tie_y_pairs,
                   CASE WHEN (n * (n - 1)) // 2 = n1 OR (n * (n - 1)) // 2 = n2
                        THEN NULL
                        ELSE CAST(FLOOR((CAST(CAST(cp - dp AS BIGINT) AS DOUBLE)
                            * 1000000.0)
                          / (SQRT(CAST((n * (n - 1)) // 2 - n1 AS DOUBLE))
                           * SQRT(CAST((n * (n - 1)) // 2 - n2 AS DOUBLE))))
                          AS BIGINT) END AS tau_b_ppm
            FROM pairs p
            JOIN tot t ON p.l_returnflag = t.l_returnflag
            JOIN tx ON t.l_returnflag = tx.l_returnflag
            JOIN ty ON t.l_returnflag = ty.l_returnflag
            WHERE n >= 2 ORDER BY 1"""))

  /** Multi-resolution tile pyramid ([[graft.operators.Geo.tilePyramid]] —
    * the map-tile zoom stack in ONE data-wide shuffle: finest-level
    * Morton census, then each coarser level is `z div 4` over the census
    * below — dropping a Morton bit-pair merges 4 children into their
    * parent exactly; 100 TB cost = one scan, not one per level).
    * Customer blob points at 6..1 bits over the 1024-grid; per-level
    * census with a point-count invariant across every level. */
  val q328_tile_pyramid = Q(
    "q328_tile_pyramid",
    (s, dir) => {
      val pts = custBlobPoints(s, dir)
      graft.operators.Geo.tilePyramid(pts, "x", "y", bits = 6, coordBits = 10)
        .groupBy(col("level"))
        .agg(
          count(lit(1)).cast("long").as("n_cells"),
          sum(col("cnt")).cast("long").as("n_points"),
          max(col("cnt")).cast("long").as("max_cnt"),
          sum(col("z") * col("cnt")).cast("long").as("checksum"))
        .orderBy("level")
    },
    Some {
      val zterms = (0 until 6)
        .map(b => s"((xs >> $b) & 1) * ${1L << (2 * b)} + ((ys >> $b) & 1) * ${1L << (2 * b + 1)}")
        .mkString(" + ")
      val levels = (5 to 1 by -1).map { lvl =>
        val child = s"l${lvl + 1}"
        s"""l$lvl AS (
              SELECT z // 4 AS z, SUM(cnt) AS cnt FROM $child GROUP BY 1)"""
      }.mkString(",\n            ")
      val union = (6 to 1 by -1)
        .map(lvl => s"SELECT $lvl AS level, z, cnt FROM l$lvl")
        .mkString("\n              UNION ALL ")
      s"""WITH cp AS ($custBlobSql),
            g AS (SELECT x >> 4 AS xs, y >> 4 AS ys FROM cp),
            l6 AS (
              SELECT CAST($zterms AS BIGINT) AS z, COUNT(*) AS cnt
              FROM g GROUP BY 1),
            $levels,
            pyr AS (
              $union)
            SELECT level::INT AS level, COUNT(*)::BIGINT AS n_cells,
                   SUM(cnt)::BIGINT AS n_points, MAX(cnt)::BIGINT AS max_cnt,
                   SUM(z * cnt)::BIGINT AS checksum
            FROM pyr GROUP BY 1 ORDER BY 1"""
    })

  /** Population Stability Index drift monitor
    * ([[graft.operators.Drift.psiLog2]] — THE production score/feature
    * drift metric beside the rank-based KS q321, in 1/16 fixed-point LOG2
    * (libm ln is not bit-stable; floor-log2 is) with Laplace smoothing
    * over the per-group bucket union; every term >= 0 exactly like true
    * PSI; one census aggregation + a group-total window over the census).
    * click-vs-error value distributions in fixed-width 50-unit buckets
    * per user cohort. */
  val q329_psi = Q(
    "q329_psi",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cohort", pmod(col("user_id"), lit(3L)))
        .withColumn("bucket", least(floor(col("value") / 50.0), lit(9.0)).cast("long"))
      graft.operators.Drift
        .psiLog2(ev, "bucket", "event_type", "click", "error", Seq("cohort"))
        .orderBy("cohort")
    },
    Some {
      def flog(x: String) =
        s"(16 * (length(bin($x)) - 1) - 16 + (($x) * 16) // (1::BIGINT << (length(bin($x)) - 1)))"
      s"""WITH e AS (
              SELECT user_id % 3 AS cohort,
                     CAST(LEAST(FLOOR(value / 50.0), 9) AS BIGINT) AS bucket,
                     event_type
              FROM events WHERE event_type IN ('click', 'error')),
            cen AS (
              SELECT cohort, bucket,
                     SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
                     SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS cb
              FROM e GROUP BY 1, 2),
            sm AS (
              SELECT cohort, ca, cb,
                     COUNT(*) OVER (PARTITION BY cohort) AS nb,
                     SUM(ca) OVER (PARTITION BY cohort)
                       + COUNT(*) OVER (PARTITION BY cohort) AS na2,
                     SUM(cb) OVER (PARTITION BY cohort)
                       + COUNT(*) OVER (PARTITION BY cohort) AS nb2
              FROM cen),
            tt AS (
              SELECT cohort, nb, na2, nb2,
                     (ca + 1) * nb2 AS xa, (cb + 1) * na2 AS xb
              FROM sm WHERE na2 > nb AND nb2 > nb),
            ag AS (
              SELECT cohort, MAX(na2) - MAX(nb) AS n_a, MAX(nb2) - MAX(nb) AS n_b,
                     MAX(nb) AS n_buckets,
                     SUM((xa - xb) * (${flog("xa")} - ${flog("xb")})) AS psi_num,
                     16 * MAX(na2) * MAX(nb2) AS den
              FROM tt GROUP BY 1)
            SELECT cohort::BIGINT AS cohort, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   n_buckets::BIGINT AS n_buckets, psi_num::BIGINT AS psi_num,
                   CAST((CASE WHEN psi_num < 0 THEN -1 ELSE 1 END)
                     * ((ABS(psi_num)::HUGEINT * 1000000) // den) AS BIGINT) AS psi_ppm
            FROM ag ORDER BY 1"""
    })

  /** Exponential time-decay attribution
    * ([[graft.operators.EventAnalytics.timeDecayAttribution]] — the
    * recency-weighted credit model completing the attribution family
    * (last-touch q182, U-shaped q255): credit halves per day of gap as an
    * exact integer SHIFT (10^6 >> gap_days, clamped past 20 — a shift
    * >= 64 would WRAP under Java's mod-64 semantics, which the clamp
    * prevents); one per-user equi-join of touches x conversions). */
  val q330_time_decay = Q(
    "q330_time_decay",
    (s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.EventAnalytics
        .timeDecayAttribution(ev, "user_id", "event_type", "ts",
          Seq("click", "view", "signup"), "purchase", windowDays = 30)
        .orderBy("channel")
    },
    Some("""WITH tch AS (
              SELECT user_id AS k, event_type AS ty, epoch_us(ts) AS tts
              FROM events WHERE event_type IN ('click', 'view', 'signup')),
            cv AS (
              SELECT user_id AS k, epoch_us(ts) AS cts
              FROM events WHERE event_type = 'purchase'),
            p AS (
              SELECT ty, (cts - tts) // 86400000000 AS gap
              FROM tch JOIN cv ON tch.k = cv.k
              WHERE tts <= cts AND cts - tts <= 30 * 86400000000)
            SELECT ty AS channel, COUNT(*)::BIGINT AS n_touches,
                   SUM(CASE WHEN gap >= 20 THEN 0
                            ELSE 1000000 // (1::BIGINT << gap::INT) END)::BIGINT AS credit_ppm
            FROM p GROUP BY 1 ORDER BY 1"""))

  /** Commutative table digest ([[graft.operators.TableDigest.reconcile]]
    * — cross-replica content verification: (count, XOR of row hashes,
    * SUM of row hashes mod 2^40), identical under ANY row order /
    * partitioning / layout, so replicas compare by exchanging six numbers
    * — which is the whole point at 100 TB; XOR alone is duplicate-pair
    * blind, the modular sum covers it). A repartitioned copy matches; a
    * single-value tamper (min orderkey's custkey + 1) does not. The
    * oracle replays the chained two-column xxhash64 and both folds. */
  val q331_table_digest = Q(
    "q331_table_digest",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val cols = Seq("o_orderkey", "o_custkey")
      val minKey = o.agg(min(col("o_orderkey"))).head().getLong(0)
      val tampered = o.withColumn("o_custkey",
        when(col("o_orderkey") === minKey, col("o_custkey") + 1L)
          .otherwise(col("o_custkey")))
      val same = graft.operators.TableDigest.reconcile(o, o.repartition(7), cols)
        .withColumn("variant", lit("shuffled"))
      val tamper = graft.operators.TableDigest.reconcile(o, tampered, cols)
        .withColumn("variant", lit("tampered"))
      same.unionByName(tamper)
        .select(col("variant"), col("n_a"), col("n_b"), col("xor_a"),
          col("sum_a"), col("matches"))
        .orderBy("variant")
    },
    Some {
      import graft.tools.OracleSql
      def hashed(rel: String, pfx: String) = {
        val h1 = OracleSql.xxhash64LongStages(rel, "o_orderkey", "h1", pfx = s"${pfx}a")
        OracleSql.xxhash64LongStages(s"SELECT * FROM ($h1)", "o_custkey", "h",
          pfx = s"${pfx}b", seed = OracleSql.unsignedOf("h1"))
      }
      def dig(rel: String, pfx: String) =
        s"""SELECT COUNT(*)::BIGINT AS n, bit_xor(h)::BIGINT AS xh,
                   (SUM(((h % 1099511627776) + 1099511627776) % 1099511627776)
                    % 1099511627776)::BIGINT AS sh
            FROM (${hashed(rel, pfx)})"""
      val base = dig("SELECT o_orderkey, o_custkey FROM orders", "__g1")
      val tam = dig(
        """SELECT o_orderkey,
                  CASE WHEN o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
                       THEN o_custkey + 1 ELSE o_custkey END AS o_custkey
           FROM orders""", "__g2")
      s"""WITH d AS ($base), td AS ($tam)
          SELECT 'shuffled' AS variant, d.n AS n_a, d.n AS n_b, d.xh AS xor_a,
                 d.sh AS sum_a, TRUE AS matches
          FROM d
          UNION ALL
          SELECT 'tampered', d.n, td.n, d.xh, d.sh,
                 (d.n = td.n AND d.xh = td.xh AND d.sh = td.sh)
          FROM d, td
          ORDER BY 1"""
    })

  /** Incremental JOIN-view maintenance
    * ([[graft.operators.Incremental.joinDelta]] — the DBSP / differential
    * delta identity Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, three joins with
    * delta-sized left inputs so refresh cost tracks the CHANGE; the
    * verdict column comes from [[graft.operators.TableDigest.reconcile]]
    * comparing (old view ∪ Δ) against the full re-join — operators
    * composing, which is the point). Orders/customers split 80/20 and
    * 90/10 by key residue; the oracle derives every census count from
    * the same residue arithmetic and the verdict from the identity. */
  val q332_join_mv_delta = Q(
    "q332_join_mv_delta",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_custkey").as("k"), col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("price_fl"))
      val c = t(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_nationkey").cast("long").as("nk"))
      val (aOld, aDelta) = (o.filter(pmod(col("o_orderkey"), lit(10L)) < 8),
        o.filter(pmod(col("o_orderkey"), lit(10L)) >= 8))
      val (bOld, bDelta) = (c.filter(pmod(col("k"), lit(10L)) < 9),
        c.filter(pmod(col("k"), lit(10L)) >= 9))
      val delta = graft.operators.Incremental.joinDelta(aOld, aDelta, bOld, bDelta, Seq("k"))
      val oldView = aOld.join(bOld, Seq("k"))
      val full = o.join(c, Seq("k"))
      val cols = Seq("k", "o_orderkey", "price_fl", "nk")
      val verdict = graft.operators.TableDigest
        .reconcile(oldView.unionByName(delta), full, cols)
        .select(col("n_a").as("n_maintained"), col("n_b").as("n_full"), col("matches"))
      val counts = delta.agg(
        count(lit(1)).cast("long").as("n_delta"),
        sum(col("o_orderkey")).cast("long").as("delta_checksum"))
      counts.crossJoin(verdict)
    },
    Some("""WITH o AS (
              SELECT o_custkey AS k, o_orderkey,
                     CAST(FLOOR(o_totalprice) AS BIGINT) AS price_fl
              FROM orders),
            c AS (SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS nk FROM customer),
            ao AS (SELECT * FROM o WHERE o_orderkey % 10 < 8),
            ad AS (SELECT * FROM o WHERE o_orderkey % 10 >= 8),
            bo AS (SELECT * FROM c WHERE k % 10 < 9),
            bd AS (SELECT * FROM c WHERE k % 10 >= 9),
            delta AS (
              SELECT ad.o_orderkey FROM ad JOIN bo ON ad.k = bo.k
              UNION ALL SELECT ao.o_orderkey FROM ao JOIN bd ON ao.k = bd.k
              UNION ALL SELECT ad.o_orderkey FROM ad JOIN bd ON ad.k = bd.k),
            nold AS (SELECT COUNT(*) AS n FROM ao JOIN bo ON ao.k = bo.k),
            nfull AS (SELECT COUNT(*) AS n FROM o JOIN c ON o.k = c.k)
            SELECT COUNT(*)::BIGINT AS n_delta,
                   SUM(o_orderkey)::BIGINT AS delta_checksum,
                   ((SELECT n FROM nold) + COUNT(*))::BIGINT AS n_maintained,
                   (SELECT n FROM nfull)::BIGINT AS n_full,
                   ((SELECT n FROM nold) + COUNT(*) = (SELECT n FROM nfull)) AS matches
            FROM delta"""))

  /** Streaming geofence enter/exit detection
    * ([[graft.streaming.StreamOps.flagTransitions]] — per-key boolean
    * TRANSITION events via flatMapGroupsWithState, the 0..n-outputs-per-
    * group state shape the matrix was missing (map-state q:runningPeak
    * emits exactly one); state = ONE boolean per key; within-batch rows
    * sort by (ts, tie) because GroupState iterators are unordered, and
    * the q316 monotone-chunk drain orders batches). Event coordinates
    * from key arithmetic against the q320 hexagon; the oracle is the
    * batch LAG replay with initial-state false. */
  val q333_geofence_stream = Q(
    "q333_geofence_stream",
    (s, dir) => {
      val hex = Seq((500L, 50L), (900L, 300L), (900L, 700L),
        (500L, 950L), (100L, 700L), (100L, 300L))
      val ev = t(s, dir, "events").filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("day", expr("CAST(ts AS LONG) div 86400"))
      // chunk range DERIVED from the day span — the events fixture's span
      // changes between rounds (CLAUDE.md), so a hardcoded chunk count
      // would silently drop late events the oracle still replays
      val dayRow = ev.agg(min(col("day")), max(col("day"))).head()
      val minDay = dayRow.getLong(0)
      val maxChunk = ((dayRow.getLong(1) - minDay) / 10L).toInt
      val inDir = java.nio.file.Files.createTempDirectory("graft-q333-in")
      (0 to maxChunk).foreach { ch =>
        val stage = java.nio.file.Files.createTempDirectory(s"graft-q333-c$ch").toString
        ev.filter(expr(s"(day - $minDay) div 10") === ch)
          .drop("day").coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath
        val target = inDir.resolve(f"chunk$ch%03d.parquet")
        java.nio.file.Files.move(part, target)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + ch * 60000L))
      }
      val schema = s.read.parquet(inDir.toString).schema
      val stream = normalizeTs(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString))
        .withColumn("x", pmod(col("event_id") * 48271L, lit(1000L)))
        .withColumn("y", pmod(col("event_id") * 16807L, lit(1000L)))
        .withColumn("inside",
          graft.operators.Geo.pointInConvexPolygon(col("x"), col("y"), hex))
        .select(col("user_id"), unix_micros(col("ts")).as("tms"),
          col("event_id"), col("inside"))
      val trans = graft.streaming.StreamOps
        .flagTransitions(stream, "user_id", "tms", "event_id", "inside")
      val qname = s"graft_q333_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(
        trans.writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
      q.awaitTermination()
      s.table(qname)
        .groupBy(col("direction"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          countDistinct(col("user_id")).cast("long").as("n_users"),
          sum(col("user_id")).cast("long").as("checksum"))
        .orderBy("direction")
    },
    Some {
      val hex = Seq((500L, 50L), (900L, 300L), (900L, 700L),
        (500L, 950L), (100L, 700L), (100L, 300L))
      val tests = hex.indices.map { i =>
        val (x1, y1) = hex(i)
        val (x2, y2) = hex((i + 1) % hex.size)
        s"(${x2 - x1}) * (y - ($y1)) - (${y2 - y1}) * (x - ($x1)) >= 0"
      }.mkString(" AND ")
      s"""WITH e AS (
              SELECT user_id, event_id, ts,
                     (event_id * 48271) % 1000 AS x,
                     (event_id * 16807) % 1000 AS y
              FROM events WHERE user_id < 30),
            f AS (SELECT user_id, event_id, ts, ($tests) AS inside FROM e),
            w AS (
              SELECT user_id, inside,
                     LAG(inside, 1, FALSE) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM f),
            tr AS (
              SELECT user_id,
                     CASE WHEN inside THEN 'enter' ELSE 'exit' END AS direction
              FROM w WHERE inside <> prev)
            SELECT direction, COUNT(*)::BIGINT AS n,
                   COUNT(DISTINCT user_id)::BIGINT AS n_users,
                   SUM(user_id)::BIGINT AS checksum
            FROM tr GROUP BY 1 ORDER BY 1"""
    })

  /** Per-column Shannon entropy profile
    * ([[graft.operators.TableStats.columnEntropy]] — information content
    * in fixed-point log₂ micro-bits beside the ndv/encoding profile rows:
    * H = log₂n − (1/n)Σc·log₂c carried exactly as n·flog2fp(n) −
    * Σc·flog2fp(c); NULL is its own value, so a mostly-NULL column reads
    * LOW; one stack-unpivot scan + census fold). Orders' status/priority/
    * custkey plus a 25%-NULLed status variant spanning the range from
    * near-constant to near-unique. */
  val q334_column_entropy = Q(
    "q334_column_entropy",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderstatus"), col("o_orderpriority"), col("o_custkey"),
        when(pmod(col("o_orderkey"), lit(4L)) === 0L, lit(null))
          .otherwise(col("o_orderstatus")).as("status_nulled"))
      graft.operators.TableStats
        .columnEntropy(o,
          Seq("o_orderstatus", "o_orderpriority", "o_custkey", "status_nulled"))
        .orderBy("column")
    },
    Some {
      def flog(x: String) =
        s"(16 * (length(bin($x)) - 1) - 16 + (($x) * 16) // (1::BIGINT << (length(bin($x)) - 1)))"
      s"""WITH src AS (
              SELECT CAST(o_orderstatus AS VARCHAR) AS o_orderstatus,
                     CAST(o_orderpriority AS VARCHAR) AS o_orderpriority,
                     CAST(o_custkey AS VARCHAR) AS o_custkey,
                     CASE WHEN o_orderkey % 4 = 0 THEN NULL
                          ELSE CAST(o_orderstatus AS VARCHAR) END AS status_nulled
              FROM orders),
            up AS (
              SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM src
              UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM src
              UNION ALL SELECT 'o_custkey', o_custkey FROM src
              UNION ALL SELECT 'status_nulled', status_nulled FROM src),
            cen AS (SELECT col, val, COUNT(*) AS c FROM up GROUP BY 1, 2),
            ag AS (
              SELECT col, SUM(c) AS n, COUNT(*) AS ndv,
                     SUM(c * ${flog("c")}) AS sc
              FROM cen GROUP BY 1)
            SELECT col AS "column", n::BIGINT AS n, ndv::BIGINT AS ndv,
                   (n * ${flog("n")} - sc)::BIGINT AS h_num,
                   CAST((CASE WHEN n * ${flog("n")} - sc < 0 THEN -1 ELSE 1 END)
                     * ((ABS(n * ${flog("n")} - sc)::HUGEINT * 1000000)
                        // (16 * n)) AS BIGINT) AS entropy_ubits
            FROM ag ORDER BY 1"""
    })

  /** Mutual information between column pairs
    * ([[graft.operators.TableStats.mutualInformation]] — the dependence
    * row of the profile in fixed-point log₂ micro-bits, the soft sibling
    * of FD discovery q309 and the pairing of entropy q334: three censuses
    * + a joint-census-sized join, rows never pair). A dependent pair
    * (returnflag ↔ linestatus) against an independent-by-construction
    * pair (partkey%10 ↔ suppkey%10) — the contrast IS the demo. */
  val q335_mutual_info = Q(
    "q335_mutual_info",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        pmod(col("l_partkey"), lit(10L)).as("pk10"),
        pmod(col("l_suppkey"), lit(10L)).as("sk10"))
      val dep = graft.operators.TableStats
        .mutualInformation(li, "l_returnflag", "l_linestatus")
        .withColumn("pair", lit("flag_status"))
      val ind = graft.operators.TableStats
        .mutualInformation(li, "pk10", "sk10")
        .withColumn("pair", lit("pk_sk"))
      dep.unionByName(ind).select(col("pair"), col("n"), col("ndv_joint"),
        col("mi_num"), col("mi_ubits")).orderBy("pair")
    },
    Some {
      def flog(x: String) =
        s"(16 * (length(bin($x)) - 1) - 16 + (($x) * 16) // (1::BIGINT << (length(bin($x)) - 1)))"
      def mi(xExpr: String, yExpr: String, label: String) =
        s"""SELECT '$label' AS pair, n::BIGINT AS n, ndv_joint::BIGINT AS ndv_joint,
                   mi_num::BIGINT AS mi_num,
                   CAST((CASE WHEN mi_num < 0 THEN -1 ELSE 1 END)
                     * ((ABS(mi_num)::HUGEINT * 1000000) // (16 * n)) AS BIGINT) AS mi_ubits
            FROM (
              SELECT MAX(n) AS n, COUNT(*) AS ndv_joint,
                     SUM(cxy * (${flog("cxy * n")} - ${flog("cx * cy")})) AS mi_num
              FROM (
                SELECT cxy, SUM(cxy) OVER (PARTITION BY x) AS cx,
                       SUM(cxy) OVER (PARTITION BY y) AS cy,
                       SUM(cxy) OVER () AS n
                FROM (SELECT $xExpr AS x, $yExpr AS y, COUNT(*) AS cxy
                      FROM lineitem GROUP BY 1, 2)))"""
      s"""${mi("l_returnflag", "l_linestatus", "flag_status")}
          UNION ALL
          ${mi("CAST(l_partkey % 10 AS VARCHAR)", "CAST(l_suppkey % 10 AS VARCHAR)", "pk_sk")}
          ORDER BY 1"""
    })

  /** TextRank keyword extraction — text × graph COMPOSITION, no new
    * operator: adjacent-token co-occurrence edges (count ≥ 3 prune) over
    * the normalized document corpus feed the integer fixed-point
    * PageRank ([[graft.operators.Graph.pageRankFixedPoint]], q119's
    * bit-stable arithmetic), word ids are dense ranks over the surviving
    * vocabulary (a census-sized window), top-15 keywords by (rank, word).
    * The oracle replays tokenization, pair census, id assignment, and
    * the 5-round integer chain. */
  val q336_textrank = Q(
    "q336_textrank",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          split(graft.text.TextFunctions.normalize(col("text")), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val pairs = toks
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS a, ws[i + 1] AS b))"))
          .as("p"))
        .select(col("p.a"), col("p.b"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
        .localCheckpoint(true)
      val vocab = pairs.select(col("a").as("w")).unionByName(pairs.select(col("b").as("w")))
        .distinct()
        .withColumn("id", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("w"))).cast("long"))
        .localCheckpoint(true)
      val ida = vocab.select(col("w").as("a"), col("id").as("src"))
      val idb = vocab.select(col("w").as("b"), col("id").as("dst"))
      val edges = pairs.join(ida, Seq("a")).join(idb, Seq("b")).select(col("src"), col("dst"))
      val sym = edges.unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      graft.operators.Graph.pageRankFixedPoint(sym, iterations = 5)
        .join(vocab.select(col("id").as("node"), col("w")), Seq("node"))
        .select(col("w").as("word"), col("rank").cast("long").as("rank"))
        .orderBy(col("rank").desc, col("word"))
        .limit(15)
    },
    Some {
      val iters = (1 to 5).map { i =>
        val prev = s"r${i - 1}"
        s"""r$i AS (
              SELECT nodes.node,
                     (SELECT (1000000000::BIGINT * 15) // (100 * n) FROM consts)
                     + (85 * COALESCE(sm.s, 0)) // 100 AS rank
              FROM nodes LEFT JOIN (
                SELECT ed.dst AS node, SUM($prev.rank // ed.outdeg) AS s
                FROM ed JOIN $prev ON ed.src = $prev.node GROUP BY 1) sm USING (node))"""
      }.mkString(",\n          ")
      s"""WITH tk AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array($normSql, $wsSql), x -> x <> '') AS ws
            FROM documents),
          pr0 AS (
            SELECT u.p.a AS a, u.p.b AS b
            FROM (SELECT list_transform(range(1, len(ws)), i ->
                    {'a': ws[i], 'b': ws[i + 1]}) AS prs
                  FROM tk WHERE len(ws) >= 2) t,
                 UNNEST(t.prs) AS u(p)),
          pairs AS (
            SELECT a, b, COUNT(*) AS c FROM pr0 WHERE a <> b
            GROUP BY 1, 2 HAVING COUNT(*) >= 3),
          vocab AS (
            SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS id
            FROM (SELECT DISTINCT a AS w FROM pairs
                  UNION SELECT DISTINCT b FROM pairs)),
          e0 AS (
            SELECT va.id AS src, vb.id AS dst
            FROM pairs JOIN vocab va ON pairs.a = va.w
                       JOIN vocab vb ON pairs.b = vb.w),
          e AS (SELECT DISTINCT src, dst FROM
                  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
          nodes AS (
            SELECT DISTINCT node
            FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
          deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
          ed AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d USING (src)),
          r0 AS (SELECT node, (SELECT 1000000000::BIGINT // n FROM consts) AS rank FROM nodes),
          $iters
          SELECT v.w AS word, CAST(r5.rank AS BIGINT) AS rank
          FROM r5 JOIN vocab v ON r5.node = v.id
          ORDER BY r5.rank DESC, v.w
          LIMIT 15"""
    })

  /** Theil–Sen robust trend ([[graft.operators.EventAnalytics
    * .theilSenSlope]] — the outlier-immune counterpart of q197's exact
    * OLS: median of pairwise slopes, < 29% breakdown; the median is a
    * PICK — pairs sort by IEEE slope with a total integer tie-break and
    * the ⌈m/2⌉-th pair's EXACT (dy, dx) is the answer, so the rational
    * never touches float rounding). Per-event-type daily-count series. */
  val q337_theil_sen = Q(
    "q337_theil_sen",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
        .withColumn("x", datediff(col("day"),
          min(col("day")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")))).cast("long"))
      graft.operators.EventAnalytics
        .theilSenSlope(daily, "event_type", "x", "y")
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
              FROM events GROUP BY 1, 2),
            ser AS (
              SELECT event_type,
                     datediff('day', MIN(day) OVER (PARTITION BY event_type), day) AS x,
                     y
              FROM daily),
            pr AS (
              SELECT a.event_type,
                     b.y - a.y AS dy, b.x - a.x AS dx, a.x AS xi, b.x AS xj,
                     CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl
              FROM ser a JOIN ser b
                ON a.event_type = b.event_type AND a.x < b.x),
            rk AS (
              SELECT event_type, dy, dx,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY sl, dy, dx, xi, xj) AS r,
                     COUNT(*) OVER (PARTITION BY event_type) AS m
              FROM pr),
            np AS (SELECT event_type, COUNT(*) AS n_points FROM ser GROUP BY 1)
            SELECT rk.event_type, n_points::BIGINT AS n_points, m::BIGINT AS n_pairs,
                   dy::BIGINT AS dy, dx::BIGINT AS dx,
                   CAST((CASE WHEN dy < 0 THEN -1 ELSE 1 END)
                     * ((ABS(dy)::HUGEINT * 1000000) // dx) AS BIGINT) AS slope_ppm
            FROM rk JOIN np ON rk.event_type = np.event_type
            WHERE r = (m + 1) // 2
            ORDER BY 1"""))

  /** Hampel rolling-median outlier filter
    * ([[graft.operators.Drift.hampelOutliers]] — the ROLLING counterpart
    * of the global MAD q99: ±3-day window, median and MAD are PICKS from
    * the bounded sorted window array (no percentile interpolation),
    * threshold |x−med|·kDen > MAD·kNum in pure integer cross-multiply;
    * incomplete edge windows are never flagged). Daily event counts on
    * the dense zero-filled spine, census per type. */
  val q338_hampel = Q(
    "q338_hampel",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"))).as("day"), col("lo"))
        .crossJoin(daily.select("event_type").distinct())
      val series = spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"),
          datediff(col("day"), col("lo")).cast("long").as("x"),
          coalesce(col("n"), lit(0L)).as("y"))
      graft.operators.Drift
        .hampelOutliers(series, "event_type", "x", "y", half = 3, kNum = 3L, kDen = 1L)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n_days"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).cast("long").as("n_outliers"),
          sum(when(col("is_outlier"), col("x")).otherwise(0L)).cast("long").as("day_checksum"),
          max(col("dev")).cast("long").as("max_dev"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT t.event_type, d.day, (SELECT lo FROM bounds) AS lo
              FROM (SELECT DISTINCT event_type FROM daily) t
              CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 DAY))::DATE AS day) d),
            ser AS (
              SELECT s.event_type, datediff('day', s.lo, s.day) AS x,
                     COALESCE(d.n, 0) AS y
              FROM spine s LEFT JOIN daily d
                ON s.event_type = d.event_type AND s.day = d.day),
            win AS (
              SELECT event_type, x, y,
                     list(y) OVER (PARTITION BY event_type ORDER BY x
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
              FROM ser),
            med AS (
              SELECT event_type, x, y, len(w) = 7 AS wfull,
                     list_sort(w)[4] AS med
              FROM win),
            dev AS (
              SELECT event_type, x, y, wfull, med,
                     CASE WHEN wfull THEN ABS(y - med) END AS dev,
                     list_sort(list_transform(
                       list(y) OVER (PARTITION BY event_type ORDER BY x
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
                       v -> ABS(v - med)))[4] AS mad
              FROM med),
            fl AS (
              SELECT event_type, x, dev,
                     CASE WHEN NOT wfull THEN FALSE
                          ELSE dev * 1 > mad * 3 END AS is_outlier
              FROM dev)
            SELECT event_type, COUNT(*)::BIGINT AS n_days,
                   SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
                   SUM(CASE WHEN is_outlier THEN x ELSE 0 END)::BIGINT AS day_checksum,
                   MAX(dev)::BIGINT AS max_dev
            FROM fl GROUP BY 1 ORDER BY 1"""))

  /** Isotonic calibration ([[graft.ml.Regress.isotonicFitPpm]] — PAVA's
    * result WITHOUT sequential pooling: the minimax identity
    * f(i) = max_{j≤i} min_{k≥i} avg(y[j..k]) distributes as two window
    * passes over the positions² pair table; floor commutes with min/max,
    * so fit_ppm = floor(10⁶·f_true) EXACTLY with zero floats, and the
    * output is provably nondecreasing). Calibrating q324's planted
    * classifier: per returnflag, empirical P(positive | score) made
    * monotone over the 20 discrete scores. */
  val q339_isotonic = Q(
    "q339_isotonic",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        (when(pmod(col("l_partkey"), lit(5L)) === 0L, 7L).otherwise(0L) +
          pmod(col("l_orderkey") * 48271L, lit(13L))).as("score"),
        when(pmod(col("l_partkey"), lit(5L)) === 0L, 1L).otherwise(0L).as("pos"))
      graft.ml.Regress.isotonicFitPpm(li, "score", "pos", Seq("l_returnflag"))
        .orderBy("l_returnflag", "score")
    },
    Some("""WITH d AS (
              SELECT l_returnflag,
                     (CASE WHEN l_partkey % 5 = 0 THEN 7 ELSE 0 END)
                       + (l_orderkey * 48271) % 13 AS score,
                     CASE WHEN l_partkey % 5 = 0 THEN 1 ELSE 0 END AS pos
              FROM lineitem),
            cen AS (
              SELECT l_returnflag, score, COUNT(*) AS nx, SUM(pos) AS sx
              FROM d GROUP BY 1, 2),
            pos AS (
              SELECT l_returnflag, score, nx,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY score) AS r,
                     SUM(sx) OVER (PARTITION BY l_returnflag ORDER BY score
                       ROWS UNBOUNDED PRECEDING) AS s,
                     SUM(nx) OVER (PARTITION BY l_returnflag ORDER BY score
                       ROWS UNBOUNDED PRECEDING) AS cn,
                     COALESCE(SUM(sx) OVER (PARTITION BY l_returnflag ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ps,
                     COALESCE(SUM(nx) OVER (PARTITION BY l_returnflag ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pn
              FROM cen),
            pairs AS (
              SELECT a.l_returnflag, a.r AS j, b.r AS k, b.score, b.nx,
                     ((b.s - a.ps) * 1000000) // (b.cn - a.pn) AS key
              FROM pos a JOIN pos b
                ON a.l_returnflag = b.l_returnflag AND a.r <= b.r),
            sufmin AS (
              SELECT l_returnflag, j, k, score, nx,
                     MIN(key) OVER (PARTITION BY l_returnflag, j ORDER BY k DESC
                       ROWS UNBOUNDED PRECEDING) AS mk
              FROM pairs)
            SELECT l_returnflag, score::BIGINT AS score, nx::BIGINT AS n_x,
                   MAX(mk)::BIGINT AS fit_ppm
            FROM sufmin GROUP BY 1, 2, 3 ORDER BY 1, 2"""))

  /** Kruskal–Wallis H ([[graft.operators.RankStats.kruskalWallis]] — the
    * k-sample rung above Mann–Whitney q322: does ANY of the k event types
    * differ in value distribution? pooled rank2 census joined back to the
    * per-side census, dev_g = S2_g − n_g(n+1) zero-mean by construction,
    * H via the defined two-floor DECIMAL/HUGEINT recipe). Five event
    * types per user cohort. */
  val q340_kruskal_wallis = Q(
    "q340_kruskal_wallis",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cohort", pmod(col("user_id"), lit(4L)))
      graft.operators.RankStats
        .kruskalWallis(ev, "value", "event_type", Seq("cohort"))
        .orderBy("cohort")
    },
    Some("""WITH e AS (SELECT user_id % 4 AS cohort, value, event_type FROM events),
            vc AS (SELECT cohort, value, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
            rk AS (
              SELECT cohort, value,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY cohort ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2
              FROM vc),
            ps AS (
              SELECT cohort, event_type, value, COUNT(*) AS scnt
              FROM e GROUP BY 1, 2, 3),
            ag AS (
              SELECT ps.cohort, ps.event_type,
                     SUM(scnt) AS ng, SUM(scnt * rank2) AS s2
              FROM ps JOIN rk ON ps.cohort = rk.cohort AND ps.value = rk.value
              GROUP BY 1, 2),
            tot AS (
              SELECT cohort, COUNT(*) AS k_sides, SUM(ng) AS n
              FROM ag GROUP BY 1),
            dev AS (
              SELECT ag.cohort, k_sides, n,
                     ((s2 - ng * (n + 1))::HUGEINT
                       * (s2 - ng * (n + 1)) * 1000000) // ng AS t
              FROM ag JOIN tot ON ag.cohort = tot.cohort
              WHERE k_sides >= 2)
            SELECT cohort::BIGINT AS cohort, k_sides::BIGINT AS k_sides,
                   n::BIGINT AS n,
                   ((3 * SUM(t)) // (n * (n + 1)))::BIGINT AS h_uppm
            FROM dev GROUP BY cohort, k_sides, n ORDER BY 1"""))

  /** Big-big rectangle overlap join ([[graft.operators.Geo
    * .bboxOverlapJoin]] — the 2-D face of the q313 interval bin join and
    * the bbox prefilter behind every real polygon join: both sides
    * explode to fixed-width tiles, candidates from a plain tile
    * equi-join, each intersecting pair emitted EXACTLY ONCE in the tile
    * holding the intersection's min corner — no distinct; degenerate
    * boxes drop, floor tiling survives negative coordinates). Even-vs-odd
    * order boxes from key arithmetic; census with an exact integer
    * overlap-area checksum. Oracle = the raw 4-inequality join. */
  val q341_bbox_overlap = Q(
    "q341_bbox_overlap",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def side(parity: Int, idc: String, p: String) = o
        .filter(pmod(col("o_orderkey"), lit(2L)) === parity)
        .select(
          col("o_orderkey").as(idc),
          pmod(col("o_orderkey") * 48271L, lit(1000L)).as(s"${p}x1"),
          (pmod(col("o_orderkey") * 48271L, lit(1000L)) +
            pmod(col("o_orderkey"), lit(30L)) + 5L).as(s"${p}x2"),
          pmod(col("o_orderkey") * 16807L, lit(1000L)).as(s"${p}y1"),
          (pmod(col("o_orderkey") * 16807L, lit(1000L)) +
            pmod(col("o_orderkey"), lit(23L)) + 5L).as(s"${p}y2"))
      val l = side(0, "lid", "l")
      val r = side(1, "rid", "r")
      graft.operators.Geo
        .bboxOverlapJoin(l, r, "lx1", "lx2", "ly1", "ly2",
          "rx1", "rx2", "ry1", "ry2", tile = 32L)
        .agg(
          count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("lid")).cast("long").as("n_left"),
          countDistinct(col("rid")).cast("long").as("n_right"),
          sum((least(col("lx2"), col("rx2")) - greatest(col("lx1"), col("rx1"))) *
            (least(col("ly2"), col("ry2")) - greatest(col("ly1"), col("ry1"))))
            .cast("long").as("sum_area"),
          sum(col("lid") + col("rid")).cast("long").as("checksum"))
    },
    Some("""WITH b AS (
              SELECT o_orderkey AS id, o_orderkey % 2 AS par,
                     (o_orderkey * 48271) % 1000 AS x1,
                     (o_orderkey * 48271) % 1000 + o_orderkey % 30 + 5 AS x2,
                     (o_orderkey * 16807) % 1000 AS y1,
                     (o_orderkey * 16807) % 1000 + o_orderkey % 23 + 5 AS y2
              FROM orders),
            pr AS (
              SELECT l.id AS lid, r.id AS rid,
                     (LEAST(l.x2, r.x2) - GREATEST(l.x1, r.x1)) *
                     (LEAST(l.y2, r.y2) - GREATEST(l.y1, r.y1)) AS area
              FROM (SELECT * FROM b WHERE par = 0) l
              JOIN (SELECT * FROM b WHERE par = 1) r
                ON l.x1 < r.x2 AND r.x1 < l.x2 AND l.y1 < r.y2 AND r.y1 < l.y2)
            SELECT COUNT(*)::BIGINT AS n_pairs,
                   COUNT(DISTINCT lid)::BIGINT AS n_left,
                   COUNT(DISTINCT rid)::BIGINT AS n_right,
                   SUM(area)::BIGINT AS sum_area,
                   SUM(lid + rid)::BIGINT AS checksum
            FROM pr"""))

  /** Subtree rollup over an implicit hierarchy
    * ([[graft.operators.Graph.subtreeRollup]] — "aggregate every node's
    * whole subtree" WITHOUT a mapping table and WITHOUT iteration: the
    * ancestor chain is key arithmetic (parent = key div 10), each row
    * explodes to its ≤ depth+1 ancestors and ONE partial-agg fold rolls
    * the tree up — a scan plus one bounded-fanout shuffle, never a
    * fixpoint). Order totals per 1–2-digit key prefix; the oracle derives
    * each prefix's subtree membership from the same arithmetic (for
    * p ≥ 1 a key matches at most one ancestor level, so a plain OR never
    * double-counts). */
  val q342_subtree_rollup = Q(
    "q342_subtree_rollup",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        floor(col("o_totalprice")).cast("long").as("v"))
      graft.operators.Graph.subtreeRollup(o, "k", "v", fanout = 10L, maxDepth = 6)
        .filter(col("node").between(1L, 99L))
        .orderBy("node")
    },
    Some("""WITH o AS (
              SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice) AS BIGINT) AS v
              FROM orders),
            nodes AS (SELECT unnest(range(1, 100)) AS node)
            SELECT node::BIGINT AS node, COUNT(*)::BIGINT AS n_rows,
                   SUM(v)::BIGINT AS total
            FROM o JOIN nodes
              ON k = node OR k // 10 = node OR k // 100 = node
                OR k // 1000 = node OR k // 10000 = node
                OR k // 100000 = node OR k // 1000000 = node
            GROUP BY 1 ORDER BY 1"""))

  /** Bootstrap CI for a RATIO metric
    * ([[graft.operators.Resample.bootstrapRatioCi]] — the A/B workhorse
    * the mean CI cannot cover: Poisson weights resample numerator and
    * denominator TOGETHER, preserving their per-row correlation; same
    * one-pass 3B-column aggregation, rank-band CI). Share of event value
    * carried by big-ticket (> $100) events per type, 95%-ish band. Odd
    * users — the q326 slice discipline for the oracle's 64× hash replay. */
  val q343_bootstrap_ratio = Q(
    "q343_bootstrap_ratio",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(pmod(col("user_id"), lit(2L)) === 1L)
        .select(
          col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("big", when(col("cents") > 10000L, col("cents")).otherwise(0L))
      graft.operators.Resample
        .bootstrapRatioCi(ev, "event_id", "big", "cents", reps = 64,
          loRank = 2, hiRank = 63, groupCols = Seq("event_type"))
        .orderBy("event_type")
    },
    Some {
      val hashed = graft.tools.OracleSql.xxhash64LongStages(
        """SELECT event_type, cents,
                  CASE WHEN cents > 10000 THEN cents ELSE 0 END AS big,
                  r AS rep, event_id * 64 + r AS hk
           FROM (SELECT event_id, event_type,
                        CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
                 WHERE user_id % 2 = 1)
           CROSS JOIN (SELECT unnest(range(0, 64)) AS r)""",
        "hk", "h", pfx = "__br")
      s"""WITH hh AS ($hashed),
            ww AS (
              SELECT event_type, cents, big, rep,
                     CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                          WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                          WHEN u < 996340 THEN 4 ELSE 5 END AS w
              FROM (SELECT *, ((h % 1000000) + 1000000) % 1000000 AS u FROM hh)),
            rs AS (
              SELECT event_type, rep, SUM(w * big) AS sn, SUM(w * cents) AS sd
              FROM ww GROUP BY 1, 2),
            rm AS (
              SELECT event_type, rep,
                     CAST((CASE WHEN sn < 0 THEN -1 ELSE 1 END)
                       * ((ABS(sn)::HUGEINT * 1000000) // sd) AS BIGINT) AS ratio_ppm
              FROM rs WHERE sd > 0),
            rk AS (
              SELECT event_type, ratio_ppm,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY ratio_ppm, rep) AS rk
              FROM rm),
            band AS (
              SELECT event_type,
                     MAX(CASE WHEN rk = 2 THEN ratio_ppm END) AS lo_ppm,
                     MAX(CASE WHEN rk = 63 THEN ratio_ppm END) AS hi_ppm
              FROM rk GROUP BY 1),
            pt AS (
              SELECT event_type, COUNT(*)::BIGINT AS n,
                     CAST((SUM(CASE WHEN cents > 10000 THEN cents ELSE 0 END)::HUGEINT
                       * 1000000) // SUM(cents) AS BIGINT) AS ratio_ppm
              FROM (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
                    FROM events WHERE user_id % 2 = 1)
              GROUP BY 1 HAVING SUM(cents) > 0)
            SELECT pt.event_type, pt.n, pt.ratio_ppm, band.lo_ppm, band.hi_ppm
            FROM pt JOIN band ON pt.event_type = band.event_type
            ORDER BY 1"""
    })

  /** Join-key skew report ([[graft.operators.SkewJoin.skewReport]] — the
    * "should I salt?" advisor pairing the salting operators (q105/q116)
    * and the pinned AQE skew contract: exact Gini concentration of the
    * key census (rank-weighted, tie-invariant) plus the hottest key's
    * row share, in sign-magnitude ppm; the only ordered pass runs over
    * the census, never rows). A planted 30%-hot key over order keys —
    * the report says SALT; the oracle replays census, ranks, and both
    * ratios. */
  val q344_skew_report = Q(
    "q344_skew_report",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        when(pmod(col("l_orderkey"), lit(10L)) < 3L, 1L)
          .otherwise(pmod(col("l_orderkey"), lit(1000L))).as("jk"))
      graft.operators.SkewJoin.skewReport(li, Seq("jk"))
    },
    Some("""WITH d AS (
              SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1
                          ELSE l_orderkey % 1000 END AS jk
              FROM lineitem),
            cen AS (SELECT jk, COUNT(*) AS c FROM d GROUP BY 1),
            rk AS (
              SELECT c, ROW_NUMBER() OVER (ORDER BY c, jk) AS i FROM cen),
            ag AS (
              SELECT SUM(c) AS n_rows, COUNT(*) AS n_keys,
                     SUM(2 * i * c) AS wsum, MAX(c) AS top1
              FROM rk)
            SELECT n_rows::BIGINT AS n_rows, n_keys::BIGINT AS n_keys,
                   CAST((CASE WHEN wsum - (n_keys + 1) * n_rows < 0 THEN -1 ELSE 1 END)
                     * ((ABS(wsum - (n_keys + 1) * n_rows)::HUGEINT * 1000000)
                        // (n_keys * n_rows)) AS BIGINT) AS gini_ppm,
                   ((top1::HUGEINT * 1000000) // n_rows)::BIGINT AS top1_ppm
            FROM ag"""))

  val all: Seq[Q] =
    Seq(q313_interval_overlap, q314_pareto_frontier, q315_weighted_sssp,
      q316_stream_full_outer, q317_spatial_join, q318_geo_knn,
      q319_grid_dbscan, q320_point_in_polygon, q321_ks_test,
      q322_mann_whitney, q323_spearman, q324_roc_auc, q325_normal_equations,
      q326_bootstrap_ci, q327_kendall, q328_tile_pyramid, q329_psi,
      q330_time_decay, q331_table_digest, q332_join_mv_delta,
      q333_geofence_stream, q334_column_entropy, q335_mutual_info,
      q336_textrank, q337_theil_sen, q338_hampel, q339_isotonic,
      q340_kruskal_wallis, q341_bbox_overlap, q342_subtree_rollup,
      q343_bootstrap_ratio, q344_skew_report)
}
