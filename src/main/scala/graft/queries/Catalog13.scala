package graft

import org.apache.spark.sql.functions._

import graft.QueryDsl._

/** Catalog chunk q345+ — round-13: ranking-metric eval (metrics@k, AP/PR,
  * gains), retention cohorts, interval islands, survival curves, Borůvka
  * MSF, join-size advisory, exact ECDF, calibration (ECE bins, split
  * conformal), sequential testing (SPRT, BH-FDR), Markov transitions,
  * seed-sampled betweenness, double-sweep diameter, and the streaming
  * CUSUM monitor. Registration + docs in [[graft.Queries]]. */
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

  /** Average precision per group ([[graft.operators.RankingEval.averagePrecision]]
    * — threshold-sweep AP over the score CENSUS in exact truncating ppm:
    * the imbalanced-label / retrieval metric pairing ROC-AUC q324. Planted
    * +300 score shift on the 1/7-residue positives over orders. */
  val q352_avg_precision = Q(
    "q352_avg_precision",
    (s, dir) => {
      val d = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        (pmod(col("o_orderkey") * 48271L, lit(1000L)) +
          when(pmod(col("o_orderkey"), lit(7L)) === 0L, 300L).otherwise(0L)).as("score"),
        (pmod(col("o_orderkey"), lit(7L)) === 0L).as("lbl"))
      graft.operators.RankingEval.averagePrecision(d, "score", "lbl", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     (o_orderkey * 48271) % 1000
                       + CASE WHEN o_orderkey % 7 = 0 THEN 300 ELSE 0 END AS score,
                     (o_orderkey % 7 = 0) AS lbl
              FROM orders),
            cen AS (
              SELECT g, score, COUNT(*) AS n_at,
                     SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS pos_at
              FROM d GROUP BY 1, 2),
            w AS (
              SELECT g, n_at, pos_at,
                     SUM(n_at) OVER (PARTITION BY g ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                     SUM(pos_at) OVER (PARTITION BY g ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
              FROM cen)
            SELECT g, SUM(n_at)::BIGINT AS n, SUM(pos_at)::BIGINT AS n_pos,
                   (SUM(pos_at * ((cum_pos * 1000000) // cum_n))
                      // SUM(pos_at))::BIGINT AS ap_ppm
            FROM w GROUP BY 1 ORDER BY 1"""))

  /** Reliability bins + exact ECE ([[graft.ml.Calibrate.reliabilityBins]]
    * — per-bucket accuracy vs claimed confidence, and the integer ECE
    * identity Σ|pos_b·10⁶ − Σscore_b| div n where the n_b denominators
    * cancel so the scalar has NO intermediate rounding). The score is a
    * hash in ppm and the label an INDEPENDENT hash cut at that score —
    * calibrated by construction, so deviations measure finite-sample
    * noise and the bins read sane. */
  val q353_calibration_ece = Q(
    "q353_calibration_ece",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        pmod(col("o_orderkey") * 48271L, lit(1000000L)).as("score_ppm"),
        (pmod(col("o_orderkey") * 16807L, lit(1000000L)) <
          pmod(col("o_orderkey") * 48271L, lit(1000000L))).as("lbl"))
      val bins = graft.ml.Calibrate.reliabilityBins(d, "score_ppm", "lbl",
        bucketWidthPpm = 100000L, groupCols = Seq("g"))
      val wg = Window.partitionBy(col("g"))
      graft.operators.RankStats.withPpm(
          bins.withColumn("__q_dev", sum(col("abs_dev")).over(wg))
            .withColumn("__q_n", sum(col("n_b")).over(wg) * 1000000L),
          col("__q_dev"), col("__q_n"), "ece_ppm")
        .drop("__q_dev", "__q_n")
        .orderBy("g", "bucket")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     (o_orderkey * 48271) % 1000000 AS s,
                     ((o_orderkey * 16807) % 1000000 < (o_orderkey * 48271) % 1000000) AS lbl
              FROM orders),
            b AS (
              SELECT g, s // 100000 AS bucket, COUNT(*) AS n_b,
                     SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS pos_b,
                     SUM(s) AS sum_score
              FROM d GROUP BY 1, 2),
            w AS (
              SELECT g, bucket, n_b, pos_b, sum_score,
                     (pos_b * 1000000) // n_b AS acc_ppm,
                     sum_score // n_b AS conf_ppm,
                     ABS(pos_b * 1000000 - sum_score) AS abs_dev,
                     SUM(ABS(pos_b * 1000000 - sum_score)) OVER (PARTITION BY g) AS gdev,
                     SUM(n_b) OVER (PARTITION BY g) AS gn
              FROM b)
            SELECT g, bucket::BIGINT AS bucket, n_b::BIGINT AS n_b,
                   pos_b::BIGINT AS pos_b, sum_score::BIGINT AS sum_score,
                   acc_ppm::BIGINT AS acc_ppm, conf_ppm::BIGINT AS conf_ppm,
                   abs_dev::BIGINT AS abs_dev,
                   ((gdev * 1000000) // (gn * 1000000))::BIGINT AS ece_ppm
            FROM w ORDER BY 1, 2"""))

  /** Wald SPRT over batch censuses ([[graft.operators.Sequential.sprt]]
    * — anytime-valid sequential decision with the log-likelihood ratio as
    * an exact BIGINT sum of two micro-log₂ driver constants (the oracle
    * carries the SAME inlined literals — the replay contract is the
    * constants, not libm; the 1/16 fixed point was measurably too coarse
    * here: it flipped the H₁ drift sign and 1-URGENT wrongly accepted).
    * The 1-URGENT group carries a planted elevated success rate (extra
    * 1/11 residue) so the catalog exercises reject, while baseline groups
    * drift toward accept. p0 = 76923 ppm (1/13), p1 = 150000 ppm, Wald
    * boundaries ±log₂(19)·10⁶ ≈ ±4.25e6 at α = β = 0.05. */
  val q354_sprt = Q(
    "q354_sprt",
    (s, dir) => {
      val cen = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        pmod(col("o_orderkey"), lit(50L)).as("t"),
        (pmod(col("o_orderkey"), lit(13L)) === 0L ||
          (col("o_orderpriority") === "1-URGENT" &&
            pmod(col("o_orderkey"), lit(11L)) === 0L)).as("succ"))
        .groupBy("g", "t")
        .agg(sum(when(col("succ"), 1L).otherwise(0L)).as("s"),
          count(lit(1)).cast("long").as("n"))
      graft.operators.Sequential.sprt(cen, "t", "s", "n",
          p0Ppm = 76923L, p1Ppm = 150000L,
          upperMicro = 4247927L, lowerMicro = -4247927L,
          groupCols = Seq("g"))
        .orderBy("g")
    },
    Some {
      val (lsW, lfW) = graft.operators.Sequential.llrWeightsMicroLog2(76923L, 150000L)
      val ls = s"($lsW)"
      val lf = s"($lfW)"
      s"""WITH d AS (
              SELECT o_orderpriority AS g, o_orderkey % 50 AS t,
                     (o_orderkey % 13 = 0 OR (o_orderpriority = '1-URGENT'
                        AND o_orderkey % 11 = 0)) AS succ
              FROM orders),
            cen AS (
              SELECT g, t, SUM(CASE WHEN succ THEN 1 ELSE 0 END) AS s,
                     COUNT(*) AS n
              FROM d GROUP BY 1, 2),
            w AS (
              SELECT g, t, s, n,
                     CAST(SUM(s * $ls + (n - s) * $lf) OVER (PARTITION BY g ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS llr
              FROM cen),
            x AS (
              SELECT g, t, s, n, llr,
                     CASE WHEN llr >= 4247927 THEN 'reject_h0'
                          WHEN llr <= -4247927 THEN 'accept_h0' END AS cr
              FROM w),
            fst AS (
              SELECT g, MIN(t) AS decided_t FROM x WHERE cr IS NOT NULL GROUP BY 1)
            SELECT x.g, COUNT(*)::BIGINT AS n_steps, SUM(n)::BIGINT AS n_trials,
                   SUM(s)::BIGINT AS n_successes,
                   MAX(t)::BIGINT AS last_t,
                   (MAX_BY(llr, t))::BIGINT AS final_llr,
                   COALESCE(MAX(CASE WHEN t = fst.decided_t THEN cr END),
                     'continue') AS decision,
                   (MAX(fst.decided_t))::BIGINT AS decided_t,
                   (MAX(CASE WHEN t = fst.decided_t THEN llr END))::BIGINT AS llr_at_decision
            FROM x LEFT JOIN fst ON x.g = fst.g
            GROUP BY 1 ORDER BY 1"""
    })

  /** Markov transition matrix + 2-step composition
    * ([[graft.operators.EventAnalytics.markovTransitions]] /
    * [[graft.operators.EventAnalytics.composeTransitions]] — per-user
    * LEAD-window transition census row-normalized to exact ppm, then the
    * defined truncating matrix square over the 25-row census). Ordering
    * tie-broken by event_id (window iteration order is not a contract). */
  val q355_markov = Q(
    "q355_markov",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val t1 = graft.operators.EventAnalytics
        .markovTransitions(ev, "user_id", "ts", "event_id", "event_type")
      t1.join(graft.operators.EventAnalytics.composeTransitions(t1, t1),
          Seq("from_state", "to_state"), "left")
        .orderBy("from_state", "to_state")
    },
    Some("""WITH seq AS (
              SELECT event_type AS f,
                     LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nx
              FROM events),
            cen AS (
              SELECT f AS from_state, nx AS to_state, COUNT(*) AS n_trans
              FROM seq WHERE nx IS NOT NULL GROUP BY 1, 2),
            t1 AS (
              SELECT from_state, to_state, n_trans,
                     SUM(n_trans) OVER (PARTITION BY from_state) AS row_total,
                     (n_trans * 1000000) //
                       SUM(n_trans) OVER (PARTITION BY from_state) AS p_ppm
              FROM cen),
            t2 AS (
              SELECT a.from_state, b.to_state,
                     SUM(a.p_ppm * b.p_ppm) // 1000000 AS p2_ppm
              FROM t1 a JOIN t1 b ON a.to_state = b.from_state
              GROUP BY 1, 2)
            SELECT t1.from_state, t1.to_state, t1.n_trans::BIGINT AS n_trans,
                   t1.row_total::BIGINT AS row_total, t1.p_ppm::BIGINT AS p_ppm,
                   t2.p2_ppm::BIGINT AS p2_ppm
            FROM t1 LEFT JOIN t2 USING (from_state, to_state)
            ORDER BY 1, 2"""))

  /** Split-conformal prediction interval + coverage
    * ([[graft.ml.Calibrate.splitConformal]] — the radius is a RANK PICK
    * of the ⌈(n+1)(1−α)⌉-th calibration residual from the residual census
    * (quantiles that must hash-match are picks, never interpolations);
    * test-half coverage then verifies the ≥ 90% guarantee empirically).
    * Residuals: order cents against a crude per-residue linear proxy —
    * the point is the machinery, the guarantee holds for ANY model. */
  val q356_conformal = Q(
    "q356_conformal",
    (s, dir) => {
      val d = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        abs(floor(col("o_totalprice") * 100).cast("long") -
          (lit(15000000L) + pmod(col("o_orderkey"), lit(7L)) * 100000L)).as("resid"),
        (pmod(col("o_orderkey"), lit(2L)) === 0L).as("is_cal"))
      graft.ml.Calibrate.splitConformal(d, "resid", "is_cal",
          alphaPpm = 100000L, groupCols = Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     ABS(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                       - (15000000 + (o_orderkey % 7) * 100000)) AS resid,
                     (o_orderkey % 2 = 0) AS is_cal
              FROM orders),
            sz AS (
              SELECT g, COUNT(*) AS n_cal,
                     ((COUNT(*) + 1) * 900000 + 999999) // 1000000 AS k_rank
              FROM d WHERE is_cal GROUP BY 1),
            cen AS (
              SELECT g, resid, COUNT(*) AS c FROM d WHERE is_cal GROUP BY 1, 2),
            cum AS (
              SELECT g, resid,
                     SUM(c) OVER (PARTITION BY g ORDER BY resid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl
              FROM cen),
            qh AS (
              SELECT cum.g, MIN(resid) AS qhat
              FROM cum JOIN sz ON cum.g = sz.g AND cum.cl >= sz.k_rank
              GROUP BY 1),
            tst AS (
              SELECT g, COUNT(*) AS n_test,
                     SUM(CASE WHEN resid <= (SELECT qhat FROM qh WHERE qh.g = d.g)
                         THEN 1 ELSE 0 END) AS cov
              FROM d WHERE NOT is_cal GROUP BY 1)
            SELECT sz.g, n_cal::BIGINT AS n_cal, n_test::BIGINT AS n_test,
                   k_rank::BIGINT AS k_rank, qhat::BIGINT AS qhat,
                   CAST(CASE WHEN qhat IS NULL THEN NULL
                        ELSE (cov * 1000000) // n_test END AS BIGINT) AS coverage_ppm
            FROM sz LEFT JOIN qh ON sz.g = qh.g LEFT JOIN tst ON sz.g = tst.g
            ORDER BY 1"""))

  /** Cumulative gains / lift table
    * ([[graft.operators.RankingEval.cumulativeGains]] — the decile chart:
    * per descending score bucket, the exact ppm share of positives
    * captured and the lift over random via a DECIMAL(38,0) cross-product;
    * census-sized). Planted +200 score shift on 1/5-residue positives
    * over lineitem, 100-wide buckets per returnflag. */
  val q357_gains = Q(
    "q357_gains",
    (s, dir) => {
      val d = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        (pmod(col("l_orderkey") * 48271L, lit(1000L)) +
          when(pmod(col("l_orderkey"), lit(5L)) === 0L, 200L).otherwise(0L)).as("score"),
        (pmod(col("l_orderkey"), lit(5L)) === 0L).as("lbl"))
      graft.operators.RankingEval.cumulativeGains(d, "score", "lbl",
          bucketWidth = 100L, groupCols = Seq("g"))
        .orderBy("g", "bucket")
    },
    Some("""WITH d AS (
              SELECT l_returnflag AS g,
                     ((l_orderkey * 48271) % 1000
                       + CASE WHEN l_orderkey % 5 = 0 THEN 200 ELSE 0 END) // 100 AS bucket,
                     (l_orderkey % 5 = 0) AS lbl
              FROM lineitem),
            cen AS (
              SELECT g, bucket, COUNT(*) AS n_at,
                     SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS pos_at
              FROM d GROUP BY 1, 2),
            w AS (
              SELECT g, bucket, n_at, pos_at,
                     SUM(n_at) OVER (PARTITION BY g ORDER BY bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                     SUM(pos_at) OVER (PARTITION BY g ORDER BY bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
                     SUM(n_at) OVER (PARTITION BY g) AS tn,
                     SUM(pos_at) OVER (PARTITION BY g) AS tp
              FROM cen)
            SELECT g, bucket::BIGINT AS bucket, n_at::BIGINT AS n_at,
                   pos_at::BIGINT AS pos_at, cum_n::BIGINT AS cum_n,
                   cum_pos::BIGINT AS cum_pos,
                   CASE WHEN tp > 0 THEN ((cum_pos * 1000000) // tp)::BIGINT END AS gain_ppm,
                   CASE WHEN tp > 0 AND cum_n > 0
                        THEN ((cum_pos::HUGEINT * tn * 1000000)
                              // (cum_n::HUGEINT * tp))::BIGINT END AS lift_ppm
            FROM w ORDER BY 1, 2"""))

  /** Seed-sampled betweenness centrality
    * ([[graft.operators.Graph.betweennessApprox]] — Brandes restricted to
    * 2 seeds and horizon 6 over the co-purchase graph: forward BFS with
    * exact BIGINT path counts, backward dependency accumulation in the
    * defined truncating micro variant δ(v) = Σ σ_v·(10⁶+δ_w) div σ_w;
    * the oracle replays BOTH phases as a generated materialized
    * level-chain — the LPA-chain convention). Top 20 by (bc, node). */
  val q358_betweenness = Q(
    "q358_betweenness",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = os.select(col("l_orderkey"), col("l_partkey").as("pa"))
      val b = os.select(col("l_orderkey"), col("l_partkey").as("pb"))
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("pa").cast("long").as("src"), col("pb").cast("long").as("dst"))
        .localCheckpoint(true)
      val seeds = edges.select(col("src").as("n")).union(edges.select(col("dst").as("n")))
        .distinct().orderBy("n").limit(2)
        .collect().map(_.getLong(0)).toSeq
      graft.operators.Graph.betweennessApprox(edges, seeds, horizon = 6)
        .orderBy(col("bc_upm").desc, col("node")).limit(20)
    },
    Some {
      val h = 6
      val fwd = (0 until h).map { k =>
        s"""lev${k + 1} AS MATERIALIZED (
              SELECT l.seed, s.b AS node, CAST(SUM(l.sigma) AS BIGINT) AS sigma
              FROM lev$k l JOIN sym s ON s.a = l.node
              WHERE NOT EXISTS (SELECT 1 FROM all$k x
                                WHERE x.seed = l.seed AND x.node = s.b)
              GROUP BY 1, 2),
            all${k + 1} AS MATERIALIZED (
              SELECT * FROM all$k UNION ALL SELECT seed, node FROM lev${k + 1})"""
      }.mkString(",\n")
      val bwd = (h - 1 to 0 by -1).map { k =>
        s"""bd$k AS MATERIALIZED (
              SELECT seed, node, sigma, COALESCE(CAST(SUM(term) AS BIGINT), 0) AS delta
              FROM (
                SELECT l.seed, l.node, l.sigma,
                       (l.sigma::HUGEINT * (1000000 + w.delta)) // w.sigma AS term
                FROM lev$k l
                LEFT JOIN sym s ON s.a = l.node
                LEFT JOIN bd${k + 1} w ON w.seed = l.seed AND w.node = s.b
              ) t GROUP BY 1, 2, 3)"""
      }.mkString(",\n")
      s"""WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
                   FROM os a JOIN os b
                     ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                   GROUP BY 1, 2),
            e AS (SELECT pa::BIGINT AS u, pb::BIGINT AS v FROM e0 WHERE w >= 2),
            sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
            seeds AS (SELECT DISTINCT a AS seed FROM sym ORDER BY 1 LIMIT 2),
            lev0 AS MATERIALIZED (SELECT seed, seed AS node, 1::BIGINT AS sigma FROM seeds),
            all0 AS MATERIALIZED (SELECT seed, node FROM lev0),
            $fwd,
            bd$h AS MATERIALIZED (SELECT seed, node, sigma, 0::BIGINT AS delta FROM lev$h),
            $bwd,
            allbd AS (${(0 to h).map(k => s"SELECT * FROM bd$k").mkString(" UNION ALL ")})
            SELECT node::BIGINT AS node, SUM(delta)::BIGINT AS bc_upm,
                   COUNT(*)::BIGINT AS n_seeds
            FROM allbd WHERE node <> seed
            GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20"""
    })

  /** Diameter lower bound by double sweep (the classic two-BFS
    * estimator: sweep 1 from the minimum node finds a peripheral node —
    * max distance, min-id tie-break — sweep 2 from there measures the
    * bound; pure COMPOSITION over [[graft.operators.Graph.multiSourceBfs]],
    * zero new operator code, the TextRank convention). */
  val q359_double_sweep = Q(
    "q359_double_sweep",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = os.select(col("l_orderkey"), col("l_partkey").as("pa"))
      val b = os.select(col("l_orderkey"), col("l_partkey").as("pb"))
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("pa").cast("long").as("src"), col("pb").cast("long").as("dst"))
        .localCheckpoint(true)
      val start = edges.select(col("src").as("n")).union(edges.select(col("dst").as("n")))
        .distinct().orderBy("n").limit(1).collect()(0).getLong(0)
      val sweep1 = graft.operators.Graph.multiSourceBfs(edges, Seq(start), horizon = 20)
      val far = sweep1.orderBy(col("dist").desc, col("node")).limit(1)
        .collect()(0).getAs[Long]("node")
      val sweep2 = graft.operators.Graph.multiSourceBfs(edges, Seq(far), horizon = 20)
      sweep2.agg(
        min(col("seed")).cast("long").as("peripheral"),
        lit(start).cast("long").as("start"),
        max(col("dist")).cast("long").as("diameter_lb"),
        count(lit(1)).cast("long").as("n_reached"))
    },
    Some("""WITH RECURSIVE os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
                   FROM os a JOIN os b
                     ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                   GROUP BY 1, 2),
            e AS (SELECT pa::BIGINT AS u, pb::BIGINT AS v FROM e0 WHERE w >= 2),
            sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
            s1 AS (SELECT MIN(a) AS seed FROM sym),
            bfs1(node, d) AS (
              SELECT seed, 0 FROM s1
              UNION
              SELECT s.b, b.d + 1 FROM bfs1 b JOIN sym s ON s.a = b.node
              WHERE b.d < 20),
            md1 AS (SELECT node, MIN(d) AS dist FROM bfs1 GROUP BY 1),
            far AS (SELECT node FROM md1 ORDER BY dist DESC, node LIMIT 1),
            bfs2(node, d) AS (
              SELECT node, 0 FROM far
              UNION
              SELECT s.b, b.d + 1 FROM bfs2 b JOIN sym s ON s.a = b.node
              WHERE b.d < 20),
            md2 AS (SELECT node, MIN(d) AS dist FROM bfs2 GROUP BY 1)
            SELECT (SELECT node FROM far)::BIGINT AS peripheral,
                   (SELECT seed FROM s1)::BIGINT AS start,
                   MAX(dist)::BIGINT AS diameter_lb,
                   COUNT(*)::BIGINT AS n_reached
            FROM md2"""))

  /** Benjamini–Hochberg FDR control ([[graft.operators.Sequential.bhFdr]]
    * — the step-up cut k* = max{k : p₍ₖ₎·m ≤ k·α} decided by exact
    * integer cross-multiplication over the per-group hypothesis table;
    * ties on p break by id so the cut is total-order deterministic).
    * 40 hypotheses per priority group, each cell's p the MAX over its
    * ~75 member rows (the max keeps null cells near 10⁶ — a min would
    * drive every cell's p to ~1/cell-size and reject everything); the
    * planted 1/8 slice divides by 500, landing under the rank-1 BH
    * threshold α/m for every draw, so rejected = exactly the planted
    * hypotheses; α = 10%. */
  val q360_bh_fdr = Q(
    "q360_bh_fdr",
    (s, dir) => {
      val hyp = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        pmod(col("o_orderkey"), lit(40L)).as("h"),
        expr("CASE WHEN (o_orderkey % 40) % 8 = 0" +
          " THEN pmod(o_orderkey * 48271, 1000000) div 500" +
          " ELSE pmod(o_orderkey * 48271, 1000000) END").as("p0"))
        .groupBy("g", "h").agg(max(col("p0")).cast("long").as("p_ppm"))
      graft.operators.Sequential.bhFdr(hyp, "p_ppm", "h", alphaPpm = 100000L, Seq("g"))
        .orderBy("g", "rank")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g, o_orderkey % 40 AS h,
                     CASE WHEN (o_orderkey % 40) % 8 = 0
                          THEN ((o_orderkey * 48271) % 1000000) // 500
                          ELSE (o_orderkey * 48271) % 1000000 END AS p0
              FROM orders),
            hyp AS (SELECT g, h, MAX(p0) AS p_ppm FROM d GROUP BY 1, 2),
            r AS (
              SELECT g, h, p_ppm,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY p_ppm, h) AS rank,
                     COUNT(*) OVER (PARTITION BY g) AS m
              FROM hyp),
            ks AS (
              SELECT g, COALESCE(MAX(CASE WHEN p_ppm * m <= rank * 100000
                                          THEN rank END), 0) AS k_star
              FROM r GROUP BY 1)
            SELECT r.g, r.h::BIGINT AS h, r.p_ppm::BIGINT AS p_ppm,
                   r.rank::BIGINT AS rank, ks.k_star::BIGINT AS k_star,
                   (r.rank <= ks.k_star) AS rejected
            FROM r JOIN ks ON r.g = ks.g
            ORDER BY 1, 4"""))

  /** Streaming CUSUM monitor ([[graft.streaming.StreamOps.cusumMonitor]]
    * — per-key online change-point detection with TWO-integer state via
    * the prefix-min identity S = P − min prefix P; emits alarm raise /
    * clear transitions only; q316 monotone-chunk drain, q333 harness).
    * Event value cents per type, drift 5500, threshold 100000; oracle =
    * the batch window replay of the same identity. */
  val q361_cusum_stream = Q(
    "q361_cusum_stream",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("day", expr("CAST(ts AS LONG) div 86400"))
      val dayRow = ev.agg(min(col("day")), max(col("day"))).head()
      val minDay = dayRow.getLong(0)
      val maxChunk = ((dayRow.getLong(1) - minDay) / 10L).toInt
      val inDir = java.nio.file.Files.createTempDirectory("graft-q361-in")
      (0 to maxChunk).foreach { ch =>
        val stage = java.nio.file.Files.createTempDirectory(s"graft-q361-c$ch").toString
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
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
        .select(col("event_type"), unix_micros(col("ts")).as("tms"),
          col("event_id"), col("cents"))
      val mon = graft.streaming.StreamOps.cusumMonitor(
        stream, "event_type", "tms", "event_id", "cents",
        drift = 5500L, threshold = 100000L)
      val qname = s"graft_q361_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(
        mon.writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
      q.awaitTermination()
      s.table(qname)
        .groupBy(col("event_type"), col("direction"))
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("s")).cast("long").as("min_s"),
          max(col("s")).cast("long").as("max_s"),
          sum(col("event_id")).cast("long").as("checksum"))
        .orderBy("event_type", "direction")
    },
    Some("""WITH e AS (
              SELECT event_type, ts, event_id,
                     CAST(FLOOR(value * 100) AS BIGINT) AS c
              FROM events),
            p AS (
              SELECT event_type, ts, event_id,
                     SUM(c - 5500) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
              FROM e),
            sv AS (
              SELECT event_type, ts, event_id,
                     p - LEAST(0, MIN(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
              FROM p),
            a AS (
              SELECT event_type, event_id, s, s > 100000 AS al,
                     LAG(s > 100000, 1, FALSE) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id) AS pr
              FROM sv),
            tr AS (
              SELECT event_type, event_id, s,
                     CASE WHEN al THEN 'raise' ELSE 'clear' END AS direction
              FROM a WHERE al <> pr)
            SELECT event_type, direction, COUNT(*)::BIGINT AS n,
                   MIN(s)::BIGINT AS min_s, MAX(s)::BIGINT AS max_s,
                   SUM(event_id)::BIGINT AS checksum
            FROM tr GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] =
    Seq(q345_ranking_eval, q346_retention, q347_interval_islands,
      q348_survival, q349_boruvka_msf, q350_join_size, q351_ecdf,
      q352_avg_precision, q353_calibration_ece, q354_sprt, q355_markov,
      q356_conformal, q357_gains, q358_betweenness, q359_double_sweep,
      q360_bh_fdr, q361_cusum_stream)
}
