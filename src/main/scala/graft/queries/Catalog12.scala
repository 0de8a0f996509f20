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
    * (DuckDB's IEJoin); positive durations make Spark's truncating div and
    * DuckDB's flooring `//` agree. */
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

  val all: Seq[Q] =
    Seq(q313_interval_overlap, q314_pareto_frontier, q315_weighted_sssp,
      q316_stream_full_outer)
}
