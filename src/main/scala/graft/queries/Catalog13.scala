package graft

import org.apache.spark.sql.functions._

import graft.QueryDsl._

/** Catalog chunk q345+ — round-13: ranking-metric eval, retention cohorts,
  * interval islands, survival curves, Borůvka MSF, join-size advisory, and
  * exact ECDF. Registration + docs in [[graft.Queries]]. */
private[graft] object Catalog13 {

  /** The DuckDB replay of [[graft.operators.Linkage.flog2fp]] — the
    * established fixed-point floor-log₂ macro (q90/q237/q329/q334). */
  private def flog(x: String) =
    s"(16 * (length(bin($x)) - 1) - 16 + (($x) * 16) // (1::BIGINT << (length(bin($x)) - 1)))"

  /** Ranking-quality metrics ([[graft.operators.RankingEval.metricsAtK]]
    * — precision@k / recall@k / reciprocal rank / NDCG@k per query in
    * exact integers, the retrieval-eval surface beside ROC-AUC: the log₂
    * discount rides the library's 1/16 fixed-point floor-log₂, the ideal
    * DCG is a k-element literal prefix-sum array, and everything else is
    * integral division — no float anywhere). Synthetic retrieval over
    * orders: 200 queries by custkey residue, hash-ranked candidates,
    * planted relevance on a 1/13 residue; the oracle derives the ideal-DCG
    * table independently from the same flog macro over range(1, k+1). */
  val q345_ranking_eval = Q(
    "q345_ranking_eval",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders").select(
        pmod(col("o_custkey"), lit(200L)).as("qid"),
        col("o_orderkey").as("id"),
        pmod(col("o_orderkey") * 48271L, lit(100000L)).as("score"),
        (pmod(col("o_orderkey"), lit(13L)) === 0L).as("rel"))
      val ranked = o.withColumn("rk",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("score"), col("id"))))
      graft.operators.RankingEval.metricsAtK(ranked, "rk", "rel", k = 10, Seq("qid"))
        .orderBy("qid")
    },
    Some {
      s"""WITH d AS (
              SELECT o_custkey % 200 AS qid, o_orderkey AS id,
                     (o_orderkey * 48271) % 100000 AS score,
                     (o_orderkey % 13 = 0) AS rel
              FROM orders),
            r AS (
              SELECT qid, rel,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score, id) AS rk
              FROM d),
            iw AS (
              SELECT r, 16000000 // ${flog("r + 1")} AS w
              FROM (SELECT unnest(range(1, 11)) AS r)),
            icum AS (
              SELECT r AS j,
                     CAST(SUM(w) OVER (ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS idcg
              FROM iw),
            ag AS (
              SELECT qid, COUNT(*) AS n_ranked,
                     SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS n_rel,
                     SUM(CASE WHEN rel AND rk <= 10 THEN 1 ELSE 0 END) AS hits,
                     MIN(CASE WHEN rel THEN rk END) AS fr,
                     SUM(CASE WHEN rel AND rk <= 10
                              THEN 16000000 // ${flog("rk + 1")} ELSE 0 END) AS dcg
              FROM r GROUP BY 1)
            SELECT qid::BIGINT AS qid, n_ranked::BIGINT AS n_ranked,
                   n_rel::BIGINT AS n_rel, hits::BIGINT AS hits_at_k,
                   dcg::BIGINT AS dcg_upm,
                   ((hits * 1000000) // 10)::BIGINT AS prec_at_k_ppm,
                   CASE WHEN n_rel > 0
                        THEN ((hits * 1000000) // n_rel)::BIGINT END AS recall_at_k_ppm,
                   (CASE WHEN fr IS NOT NULL THEN 1000000 // fr ELSE 0 END)::BIGINT AS rr_ppm,
                   CASE WHEN n_rel > 0
                        THEN ((dcg * 1000000) // icum.idcg)::BIGINT END AS ndcg_ppm
            FROM ag LEFT JOIN icum
              ON icum.j = LEAST(GREATEST(n_rel, 1), 10)
            ORDER BY 1"""
    })

  /** Retention cohort triangle
    * ([[graft.operators.EventAnalytics.retentionCohorts]] — users cohort
    * by first-activity week, cell (cohort, offset) = active users offset
    * weeks later over the deduped (user, week) census, retention in exact
    * ppm of cohort size; offset 0 is 10⁶ by construction — a built-in
    * self-check the oracle replays). Weekly cohorts over events. */
  val q346_retention = Q(
    "q346_retention",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("day", expr("CAST(ts AS LONG) div 86400"))
      graft.operators.EventAnalytics.retentionCohorts(ev, "user_id", "day", periodDays = 7)
        .orderBy("cohort", "offset")
    },
    Some("""WITH e AS (
              SELECT DISTINCT user_id AS u,
                     (epoch_us(ts) // 86400000000) // 7 AS p
              FROM events),
            coh AS (SELECT u, MIN(p) AS c FROM e GROUP BY 1),
            cells AS (
              SELECT c AS cohort, p - c AS off, COUNT(*) AS n_active
              FROM e JOIN coh USING (u) GROUP BY 1, 2),
            sz AS (SELECT c AS cohort, COUNT(*) AS cohort_size FROM coh GROUP BY 1)
            SELECT cohort::BIGINT AS cohort, off::BIGINT AS offset,
                   n_active::BIGINT AS n_active, cohort_size::BIGINT AS cohort_size,
                   ((n_active * 1000000) // cohort_size)::BIGINT AS retention_ppm
            FROM cells JOIN sz USING (cohort)
            ORDER BY 1, 2"""))

  /** Gaps-and-islands interval merge
    * ([[graft.operators.RangeJoin.mergeIntervals]] — coalesce each key's
    * overlapping/touching half-open intervals into maximal islands via
    * ONE key-partitioned prefix-max window over integer endpoints, then
    * summarize coverage; the uptime/coverage operator beside the interval
    * joins). Per-customer order-fulfillment windows (1..14 days from key
    * arithmetic); output is the per-customer island summary. */
  val q347_interval_islands = Q(
    "q347_interval_islands",
    (s, dir) => {
      val iv = t(s, dir, "orders").select(
        col("o_custkey").as("k"),
        unix_micros(col("o_orderdate")).as("s"),
        (unix_micros(col("o_orderdate")) +
          (pmod(col("o_orderkey"), lit(14L)) + 1L) * 86400000000L).as("e"))
      graft.operators.RangeJoin.mergeIntervals(iv, Seq("k"), "s", "e")
        .groupBy("k")
        .agg(
          count(lit(1)).cast("long").as("n_islands"),
          sum(col("n_intervals")).cast("long").as("n_intervals"),
          sum(col("island_end") - col("island_start")).cast("long").as("covered_us"),
          max(col("island_end") - col("island_start")).cast("long").as("max_island_us"))
        .orderBy("k")
    },
    Some("""WITH iv AS (
              SELECT o_custkey AS k, epoch_us(o_orderdate) AS s,
                     epoch_us(o_orderdate) + (o_orderkey % 14 + 1) * 86400000000 AS e
              FROM orders),
            w AS (
              SELECT k, s, e,
                     MAX(e) OVER (PARTITION BY k ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
              FROM iv),
            fl AS (
              SELECT k, s, e,
                     CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS op
              FROM w),
            isl AS (
              SELECT k, s, e,
                     SUM(op) OVER (PARTITION BY k ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
              FROM fl),
            g AS (
              SELECT k, island, MIN(s) AS i_s, MAX(e) AS i_e, COUNT(*) AS ni
              FROM isl GROUP BY 1, 2)
            SELECT k::BIGINT AS k, COUNT(*)::BIGINT AS n_islands,
                   SUM(ni)::BIGINT AS n_intervals,
                   SUM(i_e - i_s)::BIGINT AS covered_us,
                   MAX(i_e - i_s)::BIGINT AS max_island_us
            FROM g GROUP BY 1 ORDER BY 1"""))

  /** Kaplan–Meier survival curve
    * ([[graft.operators.Survival.kaplanMeierLog2]] — right-censored
    * time-to-event estimation with the product carried as a SUM in the
    * 1/16 fixed-point log₂ domain: at-risk counts from a suffix-sum
    * window over the per-time census, per-step contribution
    * flog2fp(n−d) − flog2fp(n), sticky NULL once the curve hits exact 0;
    * census-sized windows only). Synthetic cohorts by order priority:
    * time = key%30+1, 25% right-censored by key residue. */
  val q348_survival = Q(
    "q348_survival",
    (s, dir) => {
      val d = t(s, dir, "orders").select(
        col("o_orderpriority").as("grp"),
        (pmod(col("o_orderkey"), lit(30L)) + 1L).as("tt"),
        (pmod(col("o_orderkey"), lit(4L)) =!= 0L).as("ev"))
      graft.operators.Survival.kaplanMeierLog2(d, "tt", "ev", Seq("grp"))
        .orderBy("grp", "t")
    },
    Some {
      s"""WITH d AS (
              SELECT o_orderpriority AS grp, o_orderkey % 30 + 1 AS t,
                     (o_orderkey % 4 <> 0) AS ev
              FROM orders),
            cen AS (
              SELECT grp, t,
                     SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS d_events,
                     SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS c_censored
              FROM d GROUP BY 1, 2),
            rk AS (
              SELECT grp, t, d_events, c_censored,
                     CAST(SUM(d_events + c_censored) OVER (PARTITION BY grp ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
              FROM cen),
            st AS (
              SELECT grp, t, d_events, c_censored, n_risk,
                     CASE WHEN d_events = 0 THEN 0
                          WHEN n_risk > d_events
                          THEN ${flog("n_risk - d_events")} - ${flog("n_risk")} END AS step,
                     CASE WHEN d_events > 0 AND n_risk = d_events THEN 1 ELSE 0 END AS dead
              FROM rk),
            run AS (
              SELECT grp, t, d_events, c_censored, n_risk,
                     SUM(step) OVER (PARTITION BY grp ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     MAX(dead) OVER (PARTITION BY grp ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anydead
              FROM st)
            SELECT grp, t::BIGINT AS t, n_risk, d_events::BIGINT AS d_events,
                   c_censored::BIGINT AS c_censored,
                   CASE WHEN anydead = 1 THEN NULL
                        ELSE CAST(cum AS BIGINT) END AS logs_fp16
            FROM run WHERE d_events > 0 ORDER BY 1, 2"""
    })

  /** Borůvka minimum spanning forest ([[graft.operators.Graph.boruvkaMsf]]
    * — the distributed MST: per round every component picks its cheapest
    * outgoing edge under the (w, a, b) total order (ties in w break by
    * endpoint ids — the unique-MSF perturbation trick) and the selected
    * component graph contracts through the pointer-jumping components;
    * components at least halve per round, so O(log n) rounds of linear
    * edge joins. The graph: a ring over n = |orders| nodes with cheap
    * jittered weights plus expensive chords — by the cycle property the
    * MSF is EXACTLY the ring minus its (w, a, b)-maximal edge and no
    * chord ever enters, so the oracle derives edge count, total weight,
    * and an id checksum from the ring arithmetic alone, independent of
    * the algorithm. */
  val q349_boruvka_msf = Q(
    "q349_boruvka_msf",
    (s, dir) => {
      val m = t(s, dir, "orders").count()
      val ids = s.range(m).select(col("id").as("i"))
      val ring = ids.select(
        col("i").as("u"),
        pmod(col("i") + 1L, lit(m)).as("v"),
        (lit(1000L) + pmod(col("i") * 48271L, lit(997L))).as("w"))
      val chords = ids.filter(pmod(col("i"), lit(5L)) === 0L).select(
        col("i").as("u"),
        pmod(col("i") + 7L, lit(m)).as("v"),
        (lit(10000L) + pmod(col("i") * 16807L, lit(9973L))).as("w"))
      val forest = graft.operators.Graph
        .boruvkaMsf(ring.unionByName(chords), "u", "v", "w")
      forest.agg(
        count(lit(1)).cast("long").as("n_edges"),
        sum(col("w")).cast("long").as("total_w"),
        max(col("w")).cast("long").as("max_w"),
        sum(col("a") + col("b")).cast("long").as("id_checksum"))
    },
    Some("""WITH m AS (SELECT COUNT(*) AS m FROM orders),
            ring AS (
              SELECT i,
                     LEAST(i, (i + 1) % (SELECT m FROM m)) AS a,
                     GREATEST(i, (i + 1) % (SELECT m FROM m)) AS b,
                     1000 + (i * 48271) % 997 AS w
              FROM (SELECT unnest(range(0, (SELECT m FROM m))) AS i)),
            dropped AS (
              SELECT a, b, w FROM ring ORDER BY w DESC, a DESC, b DESC LIMIT 1)
            SELECT ((SELECT m FROM m) - 1)::BIGINT AS n_edges,
                   (SELECT SUM(w) FROM ring)::BIGINT
                     - (SELECT w FROM dropped)::BIGINT AS total_w,
                   (SELECT MAX(w) FROM
                      (SELECT w FROM ring EXCEPT ALL SELECT w FROM dropped))::BIGINT AS max_w,
                   (SELECT SUM(a + b) FROM ring)::BIGINT
                     - (SELECT a + b FROM dropped)::BIGINT AS id_checksum"""))

  /** Exact join-size advisory ([[graft.operators.SkewJoin.joinSizeEstimate]]
    * — |A ⋈ B| = Σ c_A(k)·c_B(k) over the key censuses: metadata-scale
    * work that prices a join's output BEFORE the shuffle exists, beside
    * the Gini skew report; DECIMAL(38,0) accumulation because per-key
    * census products overflow BIGINT exactly when the answer matters).
    * Two advisories: lineitem ⋈ part (FK lookup) and the lineitem
    * partkey self-join (the quadratic one the advisor exists to flag);
    * the oracle replays both censuses and checks against the true
    * COUNT(*) of the joins themselves. */
  val q350_join_size = Q(
    "q350_join_size",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_partkey").as("k"))
      val pt = t(s, dir, "part").select(col("p_partkey").as("k"))
      val a = graft.operators.SkewJoin.joinSizeEstimate(li, pt, Seq("k"))
        .withColumn("which", lit("li_part"))
      val b = graft.operators.SkewJoin.joinSizeEstimate(li, li.select(col("k")), Seq("k"))
        .withColumn("which", lit("li_self"))
      a.unionByName(b)
        .withColumn("join_rows", col("join_rows").cast("long"))
        .orderBy("which")
    },
    Some("""WITH la AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
            pa AS (SELECT p_partkey AS k, COUNT(*) AS c FROM part GROUP BY 1)
            SELECT (SELECT SUM(c) FROM la)::BIGINT AS n_left,
                   (SELECT SUM(c) FROM pa)::BIGINT AS n_right,
                   COUNT(*)::BIGINT AS n_keys_common,
                   SUM(la.c * pa.c)::BIGINT AS join_rows,
                   MAX(la.c * pa.c)::BIGINT AS max_key_rows,
                   'li_part' AS which
            FROM la JOIN pa USING (k)
            UNION ALL
            SELECT (SELECT SUM(c) FROM la)::BIGINT,
                   (SELECT SUM(c) FROM la)::BIGINT,
                   COUNT(*)::BIGINT,
                   SUM(la.c * lb.c)::BIGINT,
                   MAX(la.c * lb.c)::BIGINT,
                   'li_self'
            FROM la JOIN la lb USING (k)
            ORDER BY 6"""))

  /** Exact per-group ECDF ([[graft.operators.RankStats.ecdf]] — the
    * percentile table from the value census: distinct value, count,
    * cumulative ≤-count, group total, pct_le_ppm, all exact integers;
    * a p50/p99 lookup is a census-side filter. No per-row sort — the
    * window runs over the census only). Quantity ECDF per returnflag. */
  val q351_ecdf = Q(
    "q351_ecdf",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("qty"))
      graft.operators.RankStats.ecdf(li, "qty", Seq("l_returnflag"))
        .orderBy("l_returnflag", "qty")
    },
    Some("""WITH cen AS (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2),
            w AS (
              SELECT l_returnflag, qty, cnt,
                     SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le,
                     SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
              FROM cen)
            SELECT l_returnflag, qty, cnt::BIGINT AS cnt, cum_le::BIGINT AS cum_le,
                   n::BIGINT AS n, ((cum_le * 1000000) // n)::BIGINT AS pct_le_ppm
            FROM w ORDER BY 1, 2"""))

  val all: Seq[Q] =
    Seq(q345_ranking_eval, q346_retention, q347_interval_islands,
      q348_survival, q349_boruvka_msf, q350_join_size, q351_ecdf)
}
