package graft

import org.apache.spark.sql.functions._

import graft.QueryDsl._

/** Catalog chunk q362+ — round-14: the composed monitoring stack
  * (per-slice χ² drift p-values → BH-FDR → alarms), inter-annotator
  * agreement (Cohen/Fleiss κ), paired tests (McNemar, Wilcoxon
  * signed-rank), ordinal effect size (Cliff's δ), Brier decomposition,
  * survival comparison (log-rank, Nelson–Aalen), CUPED variance
  * reduction, binary-segmentation changepoint, per-node clustering
  * coefficient, Bradley–Terry preference fitting, and census Gini.
  * Registration + docs in [[graft.Queries]]. */
private[graft] object Catalog14 {

  /** Monitoring-stack composition ([[graft.operators.Drift.chi2Homogeneity]]
    * → [[graft.operators.Sequential.bhFdr]] — the r13 verdict's item 6:
    * the drift, multiple-testing and alarm pieces exist as separate
    * queries; a real pipeline CHAINS them. Per (returnflag, partkey-slice)
    * the two order-parity windows are compared by exact-integer Pearson
    * χ² over 10 value bins; the conservative Markov p-values then ride
    * BH-FDR per returnflag across the 8 slices. ONE slice is planted
    * drifted (returnflag R, slice 3: the current window's values collapse
    * into the low bins) — it and only it alarms; the spec pins that, the
    * oracle replays the whole chain). */
  val q362_drift_fdr_monitor = Q(
    "q362_drift_fdr_monitor",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        pmod(col("l_partkey"), lit(8L)).as("h"),
        (pmod(col("l_orderkey"), lit(2L)) === 1L).as("cur"),
        pmod(col("l_orderkey") * 48271L + col("l_linenumber") * 1009L, lit(1000L))
          .as("__v"))
        .withColumn("bin",
          expr("CASE WHEN g = 'R' AND h = 3 AND cur THEN (__v % 200) div 100 " +
            "ELSE __v div 100 END"))
      val pvals = graft.operators.Drift.chi2Homogeneity(li, "bin", "cur", Seq("g", "h"))
      graft.operators.Sequential.bhFdr(pvals, "p_ppm", "h", alphaPpm = 100000L, Seq("g"))
        .orderBy("g", "rank")
    },
    Some("""WITH d AS (
              SELECT l_returnflag AS g, l_partkey % 8 AS h,
                     (l_orderkey % 2 = 1) AS cur,
                     (l_orderkey * 48271 + l_linenumber * 1009) % 1000 AS v
              FROM lineitem),
            binned AS (
              SELECT g, h, cur,
                     CASE WHEN g = 'R' AND h = 3 AND cur THEN (v % 200) // 100
                          ELSE v // 100 END AS bin
              FROM d),
            cen AS (
              SELECT g, h, bin,
                     SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS oref,
                     SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS ocur
              FROM binned GROUP BY 1, 2, 3),
            cells AS (
              SELECT g, h, bin, oref, ocur,
                     SUM(oref) OVER (PARTITION BY g, h) AS rref,
                     SUM(ocur) OVER (PARTITION BY g, h) AS rcur,
                     oref + ocur AS c,
                     SUM(oref + ocur) OVER (PARTITION BY g, h) AS n,
                     COUNT(*) OVER (PARTITION BY g, h) AS nb
              FROM cen),
            terms AS (
              SELECT g, h, rref, rcur, nb,
                CASE WHEN rref = 0 THEN 0 ELSE
                  CAST((CAST(n AS HUGEINT) * oref - CAST(rref AS HUGEINT) * c)
                     * (CAST(n AS HUGEINT) * oref - CAST(rref AS HUGEINT) * c)
                     * 1000000 // (CAST(n AS HUGEINT) * rref * c) AS BIGINT) END +
                CASE WHEN rcur = 0 THEN 0 ELSE
                  CAST((CAST(n AS HUGEINT) * ocur - CAST(rcur AS HUGEINT) * c)
                     * (CAST(n AS HUGEINT) * ocur - CAST(rcur AS HUGEINT) * c)
                     * 1000000 // (CAST(n AS HUGEINT) * rcur * c) AS BIGINT) END AS t
              FROM cells),
            chi AS (
              SELECT g, h, MAX(rref) AS n_ref, MAX(rcur) AS n_cur,
                     MAX(nb) AS n_bins, SUM(t) AS chi2_upm
              FROM terms GROUP BY 1, 2),
            pv AS (
              SELECT g, h, n_ref, n_cur, n_bins, chi2_upm,
                     CASE WHEN chi2_upm <= 0 OR n_ref = 0 OR n_cur = 0 THEN 1000000
                          ELSE LEAST(1000000,
                            (2 * (n_bins - 1) * 1000000000000) // chi2_upm) END AS p_ppm
              FROM chi),
            r AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY p_ppm, h) AS rank,
                     COUNT(*) OVER (PARTITION BY g) AS m
              FROM pv),
            ks AS (
              SELECT g, COALESCE(MAX(CASE WHEN p_ppm * m <= rank * 100000
                                          THEN rank END), 0) AS k_star
              FROM r GROUP BY 1)
            SELECT r.g, r.h::BIGINT AS h, r.n_ref::BIGINT AS n_ref,
                   r.n_cur::BIGINT AS n_cur, r.n_bins::BIGINT AS n_bins,
                   r.chi2_upm::BIGINT AS chi2_upm, r.p_ppm::BIGINT AS p_ppm,
                   r.rank::BIGINT AS rank, ks.k_star::BIGINT AS k_star,
                   (r.rank <= ks.k_star) AS rejected
            FROM r JOIN ks ON r.g = ks.g
            ORDER BY 1, 8"""))

  /** Cohen's κ ([[graft.operators.Agreement.cohenKappa]] — two synthetic
    * annotators over documents: both start from the residue-derived true
    * label, A flips every 10th doc by +1, B every 7th by +2, so agreement
    * is high but imperfect and the marginals differ; per language). */
  val q363_cohen_kappa = Q(
    "q363_cohen_kappa",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("lang"),
        pmod(col("doc_id"), lit(4L)).as("__t"),
        col("doc_id"))
        .withColumn("ra", when(pmod(col("doc_id"), lit(10L)) === 0L,
          pmod(col("__t") + 1L, lit(4L))).otherwise(col("__t")))
        .withColumn("rb", when(pmod(col("doc_id"), lit(7L)) === 0L,
          pmod(col("__t") + 2L, lit(4L))).otherwise(col("__t")))
      graft.operators.Agreement.cohenKappa(d, "ra", "rb", Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
              SELECT lang,
                     CASE WHEN doc_id % 10 = 0 THEN (doc_id % 4 + 1) % 4
                          ELSE doc_id % 4 END AS ra,
                     CASE WHEN doc_id % 7 = 0 THEN (doc_id % 4 + 2) % 4
                          ELSE doc_id % 4 END AS rb
              FROM documents),
            base AS (
              SELECT lang, COUNT(*) AS n,
                     SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS agree
              FROM d GROUP BY 1),
            ca AS (SELECT lang, ra AS k, COUNT(*) AS r FROM d GROUP BY 1, 2),
            cb AS (SELECT lang, rb AS k, COUNT(*) AS c FROM d GROUP BY 1, 2),
            pe AS (
              SELECT COALESCE(ca.lang, cb.lang) AS lang,
                     SUM(COALESCE(r, 0) * COALESCE(c, 0)) AS pe_num
              FROM ca FULL OUTER JOIN cb ON ca.lang = cb.lang AND ca.k = cb.k
              GROUP BY 1)
            SELECT base.lang, n::BIGINT AS n, agree::BIGINT AS agree,
                   pe_num::BIGINT AS pe_num,
                   CAST(CASE WHEN n * n - pe_num = 0 THEN NULL ELSE
                     (CASE WHEN n * agree - pe_num < 0 THEN -1 ELSE 1 END) *
                     ((ABS(CAST(n AS HUGEINT) * agree - pe_num) * 1000000)
                       // (CAST(n AS HUGEINT) * n - pe_num)) END AS BIGINT) AS kappa_ppm
            FROM base JOIN pe ON base.lang = pe.lang
            ORDER BY 1"""))

  /** Fleiss' κ ([[graft.operators.Agreement.fleissKappa]] — three synthetic
    * raters per document: each rater echoes the residue-true label except
    * on its own rater-specific residue, where it drifts by its rater
    * index; per language, exact A/B/E/D integer census identity). */
  val q364_fleiss_kappa = Q(
    "q364_fleiss_kappa",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("lang"), col("doc_id"), pmod(col("doc_id"), lit(3L)).as("__t"))
        .select(col("lang"), col("doc_id"), explode(array(
          (0 until 3).map(r =>
            when(pmod(col("doc_id") * (r + 1), lit(5L)) === 0L,
              pmod(col("__t") + r, lit(3L))).otherwise(col("__t"))): _*)).as("cat"))
      graft.operators.Agreement.fleissKappa(d, "doc_id", "cat", Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH ratings AS (
              SELECT lang, doc_id,
                     CASE WHEN (doc_id * 1) % 5 = 0 THEN (doc_id % 3 + 0) % 3
                          ELSE doc_id % 3 END AS cat FROM documents
              UNION ALL
              SELECT lang, doc_id,
                     CASE WHEN (doc_id * 2) % 5 = 0 THEN (doc_id % 3 + 1) % 3
                          ELSE doc_id % 3 END FROM documents
              UNION ALL
              SELECT lang, doc_id,
                     CASE WHEN (doc_id * 3) % 5 = 0 THEN (doc_id % 3 + 2) % 3
                          ELSE doc_id % 3 END FROM documents),
            pic AS (
              SELECT lang, doc_id, cat, COUNT(*) AS nic
              FROM ratings GROUP BY 1, 2, 3),
            pit AS (
              SELECT lang, doc_id, SUM(nic * (nic - 1)) AS pairs
              FROM pic GROUP BY 1, 2),
            sz AS (
              SELECT lang, COUNT(*) AS m, SUM(pairs) AS a
              FROM pit GROUP BY 1),
            ct AS (
              SELECT lang, SUM(CAST(cc AS HUGEINT) * cc) AS e
              FROM (SELECT lang, cat, SUM(nic) AS cc FROM pic GROUP BY 1, 2)
              GROUP BY 1),
            -- D = m*n = 3m, B = m*n*(n-1) = 6m; kappa = (A*D^2 - E*B)/(B*(D^2 - E))
            kd AS (
              SELECT sz.lang, m, a, e,
                     CAST(3 AS HUGEINT) * m * (3 * m) AS d2,
                     CAST(6 AS HUGEINT) * m AS b
              FROM sz JOIN ct ON sz.lang = ct.lang)
            SELECT lang, m::BIGINT AS n_items, 3::BIGINT AS n_raters,
                   a::BIGINT AS po_pair_num, e::BIGINT AS pe_sq_num,
                   CAST(CASE WHEN d2 - e = 0 THEN NULL
                     ELSE (CASE WHEN a * d2 - e * b < 0 THEN -1 ELSE 1 END) *
                       ((ABS(a * d2 - e * b) * 1000000) // (b * (d2 - e)))
                     END AS BIGINT) AS kappa_ppm
            FROM kd ORDER BY 1"""))

  /** McNemar ([[graft.operators.Agreement.mcnemar]] — two deterministic
    * classifiers over orders with different error residues, so the
    * discordance is asymmetric; per priority, exact χ² and the 96/25
    * rational 5% decision). */
  val q365_mcnemar = Q(
    "q365_mcnemar",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        (pmod(col("o_orderkey") * 7L, lit(10L)) < 8L).as("ca"),
        (pmod(col("o_orderkey") * 11L, lit(10L)) < 7L).as("cb"))
      graft.operators.Agreement.mcnemar(o, "ca", "cb", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     ((o_orderkey * 7) % 10 < 8) AS ca,
                     ((o_orderkey * 11) % 10 < 7) AS cb
              FROM orders),
            ag AS (
              SELECT g, COUNT(*) AS n,
                     SUM(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END) AS b,
                     SUM(CASE WHEN cb AND NOT ca THEN 1 ELSE 0 END) AS c
              FROM d GROUP BY 1)
            SELECT g, n::BIGINT AS n, b::BIGINT AS n_only_a, c::BIGINT AS n_only_b,
                   CAST(CASE WHEN b + c = 0 THEN NULL ELSE
                     (CAST(b - c AS HUGEINT) * (b - c) * 1000000) // (b + c)
                     END AS BIGINT) AS chi2_upm,
                   (b + c > 0 AND 25 * (b - c) * (b - c) >= 96 * (b + c)) AS significant
            FROM ag ORDER BY 1"""))

  /** Wilcoxon signed-rank ([[graft.operators.RankStats.wilcoxonSignedRank]]
    * — paired before/after scores per order with a planted +50 lift on a
    * third of rows, so W⁺ dominates; per priority; |d| census ranks, zero
    * differences dropped by the standard convention). */
  val q366_wilcoxon = Q(
    "q366_wilcoxon",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        (pmod(col("o_orderkey") * 48271L, lit(1000L)) +
          when(pmod(col("o_orderkey"), lit(3L)) === 0L, 50L)
            .otherwise(when(pmod(col("o_orderkey"), lit(7L)) === 1L,
              -(pmod(col("o_orderkey"), lit(20L)) + 10L)).otherwise(0L))).as("x"),
        pmod(col("o_orderkey") * 48271L, lit(1000L)).as("y"))
      graft.operators.RankStats.wilcoxonSignedRank(o, "x", "y", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     CASE WHEN o_orderkey % 3 = 0 THEN 50
                          WHEN o_orderkey % 7 = 1 THEN -(o_orderkey % 20 + 10)
                          ELSE 0 END AS dd
              FROM orders),
            nz AS (SELECT g, dd FROM d WHERE dd <> 0),
            cen AS (
              SELECT g, ABS(dd) AS ad, COUNT(*) AS cnt,
                     SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS pos
              FROM nz GROUP BY 1, 2),
            rk AS (
              SELECT g, cnt, pos,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY ad
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2
              FROM cen),
            ag AS (
              SELECT g, SUM(cnt) AS n, SUM(pos * rank2) AS w2
              FROM rk GROUP BY 1)
            SELECT g, n::BIGINT AS n, w2::BIGINT AS w2_plus,
                   CAST((CASE WHEN 2 * w2 - n * (n + 1) < 0 THEN -1 ELSE 1 END) *
                     ((ABS(CAST(2 AS HUGEINT) * w2 - n * (n + 1)) * 1000000)
                       // (CAST(n AS HUGEINT) * (n + 1))) AS BIGINT) AS rb_ppm
            FROM ag WHERE n >= 1 ORDER BY 1"""))

  /** Cliff's δ ([[graft.operators.RankStats.cliffsDelta]] — ordinal effect
    * size of a planted +3 quantity shift on the even-orderkey side, per
    * returnflag; δ = 2·AUC − 1 from the doubled Mann–Whitney U). */
  val q367_cliffs_delta = Q(
    "q367_cliffs_delta",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        when(pmod(col("l_orderkey"), lit(2L)) === 0L, "a").otherwise("b").as("side"),
        (col("l_quantity").cast("long") +
          when(pmod(col("l_orderkey"), lit(2L)) === 0L &&
            pmod(col("l_orderkey"), lit(5L)) === 0L, 3L).otherwise(0L)).as("v"))
      graft.operators.RankStats.cliffsDelta(li, "v", "side", "a", "b", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT l_returnflag AS g,
                     CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS side,
                     CAST(l_quantity AS BIGINT) +
                       CASE WHEN l_orderkey % 2 = 0 AND l_orderkey % 5 = 0
                            THEN 3 ELSE 0 END AS v
              FROM lineitem),
            cen AS (
              SELECT g, v, COUNT(*) AS cnt,
                     SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca
              FROM d GROUP BY 1, 2),
            rk AS (
              SELECT g, cnt, ca,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2
              FROM cen),
            ag AS (
              SELECT g, SUM(ca) AS na, SUM(cnt - ca) AS nb, SUM(ca * rank2) AS sr
              FROM rk GROUP BY 1),
            u AS (
              SELECT g, na, nb, sr - na * (na + 1) AS u2 FROM ag
              WHERE na > 0 AND nb > 0)
            SELECT g, na::BIGINT AS n_a, nb::BIGINT AS n_b, u2::BIGINT AS u2,
                   CAST((CASE WHEN u2 - na * nb < 0 THEN -1 ELSE 1 END) *
                     ((ABS(CAST(u2 AS HUGEINT) - CAST(na AS HUGEINT) * nb) * 1000000)
                       // (CAST(na AS HUGEINT) * nb)) AS BIGINT) AS delta_ppm
            FROM u ORDER BY 1"""))

  /** Brier / Murphy decomposition ([[graft.ml.Calibrate.brierDecomposition]]
    * — a deliberately well-calibrated synthetic scorer (label drawn below
    * its own score residue) decomposed into reliability / resolution /
    * uncertainty over 10 score bins, per priority; brier ≈ rel − res +
    * unc up to the within-bin score variance — see the operator doc). */
  val q368_brier = Q(
    "q368_brier",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        pmod(col("o_orderkey") * 48271L, lit(1000001L)).as("score"),
        (pmod(col("o_orderkey") * 16807L, lit(1000000L)) <
          pmod(col("o_orderkey") * 48271L, lit(1000001L))).as("lbl"))
      graft.ml.Calibrate.brierDecomposition(o, "score", "lbl", 100000L, Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     (o_orderkey * 48271) % 1000001 AS s,
                     ((o_orderkey * 16807) % 1000000 <
                      (o_orderkey * 48271) % 1000001) AS lbl
              FROM orders),
            bins AS (
              SELECT g, s // 100000 AS b, COUNT(*) AS nb,
                     SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS pb,
                     SUM(s) AS sb,
                     SUM(CAST(s - CASE WHEN lbl THEN 1000000 ELSE 0 END AS HUGEINT)
                       * (s - CASE WHEN lbl THEN 1000000 ELSE 0 END)) AS bsq
              FROM d GROUP BY 1, 2),
            tot AS (
              SELECT g, SUM(nb) AS n, SUM(pb) AS pos FROM bins GROUP BY 1),
            terms AS (
              SELECT bins.g, n, pos, bsq,
                     (CAST(sb - 1000000 * pb AS HUGEINT)
                       * (sb - 1000000 * pb)) // nb AS relt,
                     ((CAST(pb AS HUGEINT) * n - CAST(pos AS HUGEINT) * nb)
                       * (CAST(pb AS HUGEINT) * n - CAST(pos AS HUGEINT) * nb)
                       * 1000000000000)
                       // (CAST(nb AS HUGEINT) * n * n) AS rest
              FROM bins JOIN tot ON bins.g = tot.g)
            SELECT g, n::BIGINT AS n, pos::BIGINT AS n_pos,
                   CAST(SUM(bsq) // n AS BIGINT) AS brier_upm2,
                   CAST(SUM(relt) // n AS BIGINT) AS rel_upm2,
                   CAST(SUM(rest) // n AS BIGINT) AS res_upm2,
                   CAST((CAST(pos AS HUGEINT) * (n - pos) * 1000000000000)
                     // (CAST(n AS HUGEINT) * n) AS BIGINT) AS unc_upm2
            FROM terms GROUP BY g, n, pos
            ORDER BY 1"""))

  /** Log-rank test ([[graft.operators.Survival.logRank]] — planted longer
    * survival on a third of the odd-orderkey arm, 25% right-censoring;
    * per priority; exact O/E/V with per-time micro truncation and the
    * 96/25 rational 5% decision). */
  val q369_log_rank = Q(
    "q369_log_rank",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        when(pmod(col("o_orderkey"), lit(2L)) === 0L, "a").otherwise("b").as("side"),
        (pmod(col("o_orderkey") * 48271L, lit(100L)) + 1L +
          when(pmod(col("o_orderkey"), lit(2L)) === 1L &&
            pmod(col("o_orderkey"), lit(3L)) === 0L, 30L).otherwise(0L)).as("t"),
        (pmod(col("o_orderkey"), lit(4L)) =!= 0L).as("ev"))
      graft.operators.Survival.logRank(o, "t", "ev", "side", "a", "b", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     CASE WHEN o_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS side,
                     (o_orderkey * 48271) % 100 + 1 +
                       CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 3 = 0
                            THEN 30 ELSE 0 END AS t,
                     (o_orderkey % 4 <> 0) AS ev
              FROM orders),
            cen AS (
              SELECT g, t,
                     SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS dd,
                     SUM(CASE WHEN ev AND side = 'a' THEN 1 ELSE 0 END) AS d1,
                     COUNT(*) AS alln,
                     SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS all1
              FROM d GROUP BY 1, 2),
            risk AS (
              SELECT g, t, dd, d1,
                     SUM(alln) OVER (PARTITION BY g ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
                     SUM(all1) OVER (PARTITION BY g ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1
              FROM cen),
            terms AS (
              SELECT g, dd, d1, n, n1,
                     CAST((CAST(dd AS HUGEINT) * n1 * 1000000) // n AS BIGINT) AS e1,
                     CASE WHEN n <= 1 THEN 0 ELSE
                       CAST((CAST(dd AS HUGEINT) * n1 * (n - n1) * (n - dd) * 1000000)
                         // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT) END AS v
              FROM risk WHERE dd > 0),
            ag AS (
              SELECT g, MAX(n1) AS n_a, MAX(n) - MAX(n1) AS n_b,
                     SUM(d1) AS o1, SUM(e1) AS e1_micro, SUM(v) AS v_upm
              FROM terms GROUP BY 1)
            SELECT g, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b, o1::BIGINT AS o1,
                   e1_micro::BIGINT AS e1_micro, v_upm::BIGINT AS v_upm,
                   CAST(CASE WHEN v_upm = 0 THEN NULL ELSE
                     (CAST(o1 * 1000000 - e1_micro AS HUGEINT)
                       * (o1 * 1000000 - e1_micro)) // v_upm END AS BIGINT) AS chi2_upm,
                   (v_upm > 0 AND
                    25 * (CAST(o1 * 1000000 - e1_micro AS HUGEINT)
                      * (o1 * 1000000 - e1_micro))
                      >= 96000000 * CAST(v_upm AS HUGEINT)) AS significant
            FROM ag ORDER BY 1"""))

  /** Nelson–Aalen cumulative hazard ([[graft.operators.Survival
    * .nelsonAalenMicro]] — the sum-form hazard curve over the same
    * time-to-event fixture, per priority; per-step d·10⁶ div n truncation
    * contract, census windows only). */
  val q370_nelson_aalen = Q(
    "q370_nelson_aalen",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        (pmod(col("o_orderkey") * 48271L, lit(100L)) + 1L).as("t"),
        (pmod(col("o_orderkey"), lit(4L)) =!= 0L).as("ev"))
      graft.operators.Survival.nelsonAalenMicro(o, "t", "ev", Seq("g"))
        .orderBy("g", "t")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g, (o_orderkey * 48271) % 100 + 1 AS t,
                     (o_orderkey % 4 <> 0) AS ev
              FROM orders),
            cen AS (
              SELECT g, t, SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS dd,
                     COUNT(*) AS alln
              FROM d GROUP BY 1, 2),
            risk AS (
              SELECT g, t, dd,
                     SUM(alln) OVER (PARTITION BY g ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
              FROM cen),
            hz AS (
              SELECT g, t, dd, n_risk, (dd * 1000000) // n_risk AS h
              FROM risk)
            SELECT g, t::BIGINT AS t, n_risk::BIGINT AS n_risk,
                   dd::BIGINT AS d_events, h::BIGINT AS hazard_step_micro,
                   CAST(SUM(h) OVER (PARTITION BY g ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS chaz_micro
            FROM hz WHERE dd > 0
            ORDER BY 1, 2"""))

  /** CUPED ([[graft.ml.Regress.cuped]] — a planted +20 arm effect on a
    * metric that is mostly its pre-period covariate plus noise: the
    * adjusted arm means recover the effect with the covariate variance
    * removed; per priority, pooled exact moments, sign-magnitude micro
    * chain replayed verbatim). */
  val q371_cuped = Q(
    "q371_cuped",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        when(pmod(col("o_custkey"), lit(2L)) === 0L, "a").otherwise("b").as("arm"),
        pmod(col("o_custkey") * 48271L, lit(1000L)).as("x"))
        .withColumn("y", col("x") +
          when(col("arm") === "b", 20L).otherwise(0L))
      graft.ml.Regress.cuped(o, "y", "x", "arm", Seq("g"))
        .orderBy("g", "arm")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     CASE WHEN o_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                     (o_custkey * 48271) % 1000 AS x,
                     (o_custkey * 48271) % 1000 +
                       CASE WHEN o_custkey % 2 = 1 THEN 20 ELSE 0 END AS y
              FROM orders),
            pooled AS (
              SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx,
                     SUM(CAST(x AS HUGEINT) * y) AS sxy
              FROM d GROUP BY 1),
            th AS (
              SELECT g, n, sx,
                     n * sxx - CAST(sx AS HUGEINT) * sx AS varn,
                     n * sxy - CAST(sx AS HUGEINT) * sy AS covn
              FROM pooled),
            theta AS (
              SELECT g, (sx * 1000000) // n AS xbar,
                     CAST(CASE WHEN varn = 0 THEN NULL ELSE
                       (CASE WHEN covn < 0 THEN -1 ELSE 1 END) *
                       ((ABS(covn) * 1000000) // varn) END AS BIGINT) AS theta_ppm
              FROM th),
            arms AS (
              SELECT g, arm, COUNT(*) AS n,
                     (SUM(y) * 1000000) // COUNT(*) AS my,
                     (SUM(x) * 1000000) // COUNT(*) AS mx
              FROM d GROUP BY 1, 2)
            SELECT arms.g, arm, n::BIGINT AS n, my::BIGINT AS mean_y_micro,
                   mx::BIGINT AS mean_x_micro, theta_ppm,
                   CAST(CASE WHEN theta_ppm IS NULL THEN my ELSE
                     my - (CASE WHEN (theta_ppm < 0) <> (mx < xbar)
                                 AND theta_ppm <> 0 AND mx <> xbar
                                THEN -1 ELSE 1 END) *
                       (ABS(CAST(theta_ppm AS HUGEINT) * (mx - xbar)) // 1000000)
                     END AS BIGINT) AS adj_mean_micro
            FROM arms JOIN theta ON arms.g = theta.g
            ORDER BY 1, 2"""))

  /** Binary-segmentation changepoint ([[graft.operators.Drift
    * .binarySegmentOne]] — a daily order-count series whose last 20 days
    * absorb every 4th key, planting a level shift at the day-39/40
    * boundary; per priority; exact-tuple argmax over the series census). */
  val q372_changepoint = Q(
    "q372_changepoint",
    (s, dir) => {
      val series = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        when(pmod(col("o_orderkey"), lit(4L)) === 0L,
          lit(40L) + pmod(col("o_orderkey") * 48271L, lit(20L)))
          .otherwise(pmod(col("o_orderkey") * 48271L, lit(60L))).as("day"))
        .groupBy("g", "day").agg(count(lit(1)).as("v"))
      graft.operators.Drift.binarySegmentOne(series, "day", "v", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     CASE WHEN o_orderkey % 4 = 0
                          THEN 40 + (o_orderkey * 48271) % 20
                          ELSE (o_orderkey * 48271) % 60 END AS day
              FROM orders),
            series AS (SELECT g, day, COUNT(*) AS v FROM d GROUP BY 1, 2),
            scan AS (
              SELECT g, day, v,
                     COUNT(*) OVER (PARTITION BY g ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k,
                     SUM(v) OVER (PARTITION BY g ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
                     COUNT(*) OVER (PARTITION BY g) AS n,
                     SUM(v) OVER (PARTITION BY g) AS tt
              FROM series),
            stats AS (
              SELECT g, day, k, p, n, tt,
                     CAST(((CAST(n AS HUGEINT) * p - CAST(k AS HUGEINT) * tt)
                       * (CAST(n AS HUGEINT) * p - CAST(k AS HUGEINT) * tt)
                       * 1000000)
                       // (CAST(n AS HUGEINT) * k * (n - k)) AS BIGINT) AS gup
              FROM scan WHERE n >= 2 AND k < n),
            best AS (
              SELECT g, day, k, p, n, tt, gup,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY gup DESC, k) AS rn
              FROM stats)
            SELECT g, n::BIGINT AS n, day::BIGINT AS split_pos,
                   gup::BIGINT AS g_upm,
                   ((p * 1000000) // k)::BIGINT AS mean_left_micro,
                   (((tt - p) * 1000000) // (n - k))::BIGINT AS mean_right_micro
            FROM best WHERE rn = 1
            ORDER BY 1"""))

  /** Per-node clustering coefficient ([[graft.operators.Graph
    * .localClusteringPpm]] — the q129 supplier co-purchase graph's node-
    * level refinement: triangles owned by degree orientation, credited to
    * all three corners, lcc = 2·tri/(deg·(deg−1)) in ppm, NULL for
    * degree-1 nodes; the oracle enumerates a<b<c triangles directly). */
  val q373_clustering_coeff = Q(
    "q373_clustering_coeff",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      val a = os.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = os.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val edges = a
        .join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
        .select(col("sa").as("src"), col("sb").as("dst"))
      graft.operators.Graph.localClusteringPpm(edges)
        .orderBy("node")
    },
    Some("""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
            e0 AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS w
                   FROM os a JOIN os b
                     ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
                   GROUP BY 1, 2),
            e AS MATERIALIZED (SELECT sa, sb FROM e0 WHERE w >= 5),
            deg AS (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT sa AS node FROM e UNION ALL SELECT sb FROM e)
              GROUP BY 1),
            tri AS (
              SELECT e1.sa AS a, e1.sb AS b, e2.sb AS c
              FROM e e1 JOIN e e2 ON e1.sb = e2.sa
              JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb),
            pn AS (
              SELECT node, COUNT(*) AS tri FROM (
                SELECT unnest([a, b, c]) AS node FROM tri)
              GROUP BY 1)
            SELECT deg.node::BIGINT AS node, deg::BIGINT AS deg,
                   COALESCE(pn.tri, 0)::BIGINT AS tri,
                   CAST(CASE WHEN deg < 2 THEN NULL ELSE
                     (2000000 * COALESCE(pn.tri, 0)) // (deg * (deg - 1))
                     END AS BIGINT) AS lcc_ppm
            FROM deg LEFT JOIN pn ON deg.node = pn.node
            ORDER BY 1"""))

  /** Bradley–Terry ([[graft.ml.Preference.bradleyTerryMM]] — 12 items with
    * planted monotone quality (the higher-id item of each synthetic
    * judgment wins with probability (12+(j−i))/24), fit by 3 integer MM
    * rounds; the oracle replays the round chain as materialized CTE
    * stages). */
  val q374_bradley_terry = Q(
    "q374_bradley_terry",
    (s, dir) => {
      // i, j, r come from DISJOINT base-12 digits of the key: a shared
      // factor between the judge residue and the item residues plants
      // zero-win items (the first fixture's r%24 vs i%12 correlation made
      // items 0-2 literally never win — caught by the planted-signal
      // sanity check, not the hash gate, which passed on the broken fit)
      val prefs = t(s, dir, "orders").select(
        pmod(col("o_orderkey"), lit(12L)).as("i"),
        pmod(expr("o_orderkey div 12"), lit(12L)).as("j"),
        pmod(expr("o_orderkey div 144") * 48271L, lit(24L)).as("r"))
        .filter(col("i") =!= col("j"))
        .select(
          when(col("r") < lit(12L) + col("j") - col("i"), col("j"))
            .otherwise(col("i")).as("w"),
          when(col("r") < lit(12L) + col("j") - col("i"), col("i"))
            .otherwise(col("j")).as("l"))
      graft.ml.Preference.bradleyTerryMM(prefs, "w", "l", rounds = 3)
        .orderBy("item")
    },
    Some {
      val rounds = 3
      val sb = new StringBuilder
      sb ++= """WITH base AS (
              SELECT o_orderkey % 12 AS i, (o_orderkey // 12) % 12 AS j,
                     ((o_orderkey // 144) * 48271) % 24 AS r
              FROM orders WHERE o_orderkey % 12 <> (o_orderkey // 12) % 12),
            jd AS (
              SELECT CASE WHEN r < 12 + j - i THEN j ELSE i END AS w,
                     CASE WHEN r < 12 + j - i THEN i ELSE j END AS l
              FROM base),
            nij AS MATERIALIZED (
              SELECT i, j, SUM(c) AS n_ij FROM (
                SELECT w AS i, l AS j, COUNT(*) AS c FROM jd GROUP BY 1, 2
                UNION ALL
                SELECT l, w, COUNT(*) FROM jd GROUP BY 1, 2)
              GROUP BY 1, 2),
            wins AS MATERIALIZED (SELECT w AS i, COUNT(*) AS wins FROM jd GROUP BY 1),
            items AS MATERIALIZED (
              SELECT DISTINCT nij.i, COALESCE(wins, 0) AS wins
              FROM nij LEFT JOIN wins ON nij.i = wins.i),
            s0 AS MATERIALIZED (SELECT i, wins, 1000000 AS s FROM items),"""
      for (r <- 1 to rounds) {
        sb ++= s"""
            s$r AS MATERIALIZED (
              SELECT it.i, it.wins,
                     CASE WHEN den.d IS NULL OR den.d = 0 THEN 0
                          ELSE (it.wins * 1000000) // den.d END AS s
              FROM s${r - 1} it LEFT JOIN (
                SELECT nij.i,
                       SUM(CASE WHEN si.s + sj.s = 0 THEN 0
                                ELSE (n_ij * 1000000) // (si.s + sj.s) END) AS d
                FROM nij
                JOIN s${r - 1} si ON nij.i = si.i
                JOIN s${r - 1} sj ON nij.j = sj.i
                GROUP BY 1) den ON it.i = den.i)${if (r < rounds) "," else ""}"""
      }
      sb ++= s"""
            SELECT i::BIGINT AS item, wins::BIGINT AS wins,
                   s::BIGINT AS score_micro
            FROM s$rounds ORDER BY 1"""
      sb.toString
    })

  /** Census Gini ([[graft.operators.RankStats.giniPpm]] — document-length
    * concentration per language via the exact mean-difference identity on
    * tie-averaged ranks; the inequality one-number a token-budget mixer
    * reads before reweighting sources). */
  val q375_gini = Q(
    "q375_gini",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"), col("n_chars"))
      graft.operators.RankStats.giniPpm(d, "n_chars", Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH cen AS (
              SELECT lang, CAST(n_chars AS BIGINT) AS v, COUNT(*) AS cnt
              FROM documents GROUP BY 1, 2),
            rk AS (
              SELECT lang, v, cnt,
                     2 * COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2,
                     SUM(cnt) OVER (PARTITION BY lang) AS n
              FROM cen),
            ag AS (
              SELECT lang, MAX(n) AS n, SUM(cnt * v) AS sum_v,
                     SUM(CAST(cnt AS HUGEINT) * (rank2 - n - 1) * v) AS gn
              FROM rk GROUP BY 1)
            SELECT lang, n::BIGINT AS n, sum_v::BIGINT AS sum_v,
                   gn::BIGINT AS gini_num,
                   CAST(CASE WHEN sum_v = 0 THEN NULL ELSE
                     (gn * 1000000) // (CAST(n AS HUGEINT) * sum_v)
                     END AS BIGINT) AS gini_ppm
            FROM ag ORDER BY 1"""))

  /** Paired text eval ([[graft.text.EvalText.ngramOverlapEval]] — ROUGE-2
    * recall / BLEU-2 clipped precision / brevity over candidate =
    * 200-char prefix vs reference = 300-char prefix of each document, per
    * language; the clip is a per-document (id, gram) census join, exact
    * ppm, no libm). */
  val q376_text_eval = Q(
    "q376_text_eval",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("lang"), col("doc_id"),
        substring(col("text"), 1, 200).as("cand"),
        substring(col("text"), 1, 300).as("ref"))
      graft.text.EvalText.ngramOverlapEval(d, "doc_id", "cand", "ref", 2, Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
              SELECT lang, doc_id,
                     substr(text, 1, 200) AS cand, substr(text, 1, 300) AS ref
              FROM documents),
            ct AS (SELECT lang, doc_id, string_split(cand, ' ') AS t FROM d),
            rt AS (SELECT lang, doc_id, string_split(ref, ' ') AS t FROM d),
            cg AS (
              SELECT lang, doc_id, g, COUNT(*) AS cc FROM (
                SELECT lang, doc_id,
                       unnest([t[j] || ' ' || t[j + 1] FOR j IN range(1, len(t))]) AS g
                FROM ct) GROUP BY 1, 2, 3),
            rg AS (
              SELECT lang, doc_id, g, COUNT(*) AS rc FROM (
                SELECT lang, doc_id,
                       unnest([t[j] || ' ' || t[j + 1] FOR j IN range(1, len(t))]) AS g
                FROM rt) GROUP BY 1, 2, 3),
            clip AS (
              SELECT COALESCE(cg.lang, rg.lang) AS lang,
                     SUM(COALESCE(cc, 0)) AS cand_grams,
                     SUM(COALESCE(rc, 0)) AS ref_grams,
                     SUM(LEAST(COALESCE(cc, 0), COALESCE(rc, 0))) AS matched
              FROM cg FULL OUTER JOIN rg
                ON cg.lang = rg.lang AND cg.doc_id = rg.doc_id AND cg.g = rg.g
              GROUP BY 1),
            lens AS (
              SELECT lang, COUNT(*) AS n_docs,
                     SUM(len(string_split(cand, ' '))) AS ctok,
                     SUM(len(string_split(ref, ' '))) AS rtok
              FROM d GROUP BY 1)
            SELECT lens.lang, n_docs::BIGINT AS n_docs,
                   COALESCE(cand_grams, 0)::BIGINT AS cand_grams,
                   COALESCE(ref_grams, 0)::BIGINT AS ref_grams,
                   COALESCE(matched, 0)::BIGINT AS matched_grams,
                   CAST((COALESCE(matched, 0) * 1000000)
                     // NULLIF(COALESCE(ref_grams, 0), 0) AS BIGINT)
                     AS rouge_recall_ppm,
                   CAST((COALESCE(matched, 0) * 1000000)
                     // NULLIF(COALESCE(cand_grams, 0), 0) AS BIGINT)
                     AS bleu_precision_ppm,
                   CAST((ctok * 1000000) // NULLIF(rtok, 0) AS BIGINT) AS brevity_ppm
            FROM lens LEFT JOIN clip ON lens.lang = clip.lang
            ORDER BY 1"""))

  /** Majority vote + per-annotator reliability ([[graft.operators
    * .Agreement.majorityVote]] — the q364 three-rater fixture scored
    * against its own per-item majority: rater 0 echoes the majority almost
    * everywhere, raters 1-2 drift on their residues; ties pick the
    * smallest label, the total-order discipline). */
  val q377_majority_vote = Q(
    "q377_majority_vote",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("lang"), col("doc_id"), pmod(col("doc_id"), lit(3L)).as("__t"))
        .select(col("lang"), col("doc_id"), posexplode(array(
          (0 until 3).map(r =>
            when(pmod(col("doc_id") * (r + 1), lit(5L)) === 0L,
              pmod(col("__t") + r, lit(3L))).otherwise(col("__t"))): _*)))
        .select(col("lang"), col("doc_id"),
          col("pos").cast("long").as("rater"), col("col").as("lbl"))
      graft.operators.Agreement.majorityVote(d, "doc_id", "rater", "lbl", Seq("lang"))
        .orderBy("lang", "rater")
    },
    Some("""WITH ratings AS (
              SELECT lang, doc_id, 0 AS rater,
                     CASE WHEN (doc_id * 1) % 5 = 0 THEN (doc_id % 3 + 0) % 3
                          ELSE doc_id % 3 END AS lbl FROM documents
              UNION ALL
              SELECT lang, doc_id, 1,
                     CASE WHEN (doc_id * 2) % 5 = 0 THEN (doc_id % 3 + 1) % 3
                          ELSE doc_id % 3 END FROM documents
              UNION ALL
              SELECT lang, doc_id, 2,
                     CASE WHEN (doc_id * 3) % 5 = 0 THEN (doc_id % 3 + 2) % 3
                          ELSE doc_id % 3 END FROM documents),
            cnts AS (
              SELECT lang, doc_id, lbl, COUNT(*) AS c
              FROM ratings GROUP BY 1, 2, 3),
            maj AS (
              SELECT lang, doc_id, lbl AS mlbl
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, doc_id
                      ORDER BY c DESC, lbl) AS rn FROM cnts)
              WHERE rn = 1)
            SELECT r.lang, r.rater::BIGINT AS rater, COUNT(*)::BIGINT AS n_rated,
                   SUM(CASE WHEN r.lbl = maj.mlbl THEN 1 ELSE 0 END)::BIGINT
                     AS n_match,
                   CAST((SUM(CASE WHEN r.lbl = maj.mlbl THEN 1 ELSE 0 END) * 1000000)
                     // COUNT(*) AS BIGINT) AS match_ppm
            FROM ratings r JOIN maj ON r.lang = maj.lang AND r.doc_id = maj.doc_id
            GROUP BY 1, 2
            ORDER BY 1, 2"""))

  /** Krippendorff's α, nominal ([[graft.operators.Agreement
    * .krippendorffAlphaNominal]] — the agreement coefficient for VARYING
    * rater counts: even docs get 2 ratings, odd docs 3 (exactly the shape
    * Fleiss refuses); per-item micro disagreement quotients, pooled
    * margins, per language). */
  val q378_krippendorff = Q(
    "q378_krippendorff",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("lang"), col("doc_id"), pmod(col("doc_id"), lit(3L)).as("__t"))
        .select(col("lang"), col("doc_id"), explode(slice(array(
          (0 until 3).map(r =>
            when(pmod(col("doc_id") * (r + 1), lit(5L)) === 0L,
              pmod(col("__t") + r, lit(3L))).otherwise(col("__t"))): _*),
          lit(1), lit(2L) + pmod(col("doc_id"), lit(2L)))).as("cat"))
      graft.operators.Agreement.krippendorffAlphaNominal(d, "doc_id", "cat", Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH ratings AS (
              SELECT lang, doc_id,
                     CASE WHEN (doc_id * 1) % 5 = 0 THEN (doc_id % 3 + 0) % 3
                          ELSE doc_id % 3 END AS cat FROM documents
              UNION ALL
              SELECT lang, doc_id,
                     CASE WHEN (doc_id * 2) % 5 = 0 THEN (doc_id % 3 + 1) % 3
                          ELSE doc_id % 3 END FROM documents
              UNION ALL
              SELECT lang, doc_id,
                     CASE WHEN (doc_id * 3) % 5 = 0 THEN (doc_id % 3 + 2) % 3
                          ELSE doc_id % 3 END FROM documents
              WHERE doc_id % 2 = 1),
            pic AS (
              SELECT lang, doc_id, cat, COUNT(*) AS nic
              FROM ratings GROUP BY 1, 2, 3),
            pi AS (
              SELECT lang, doc_id, SUM(nic) AS ni FROM pic GROUP BY 1, 2),
            dot AS (
              SELECT pic.lang, pic.doc_id, pi.ni,
                     SUM(nic * (ni - nic)) AS dis
              FROM pic JOIN pi ON pic.lang = pi.lang AND pic.doc_id = pi.doc_id
              WHERE ni >= 2 GROUP BY 1, 2, 3),
            dsum AS (
              SELECT lang, COUNT(*) AS n_items, SUM(ni) AS n_ratings,
                     SUM((dis * 1000000) // (ni - 1)) AS do_micro
              FROM dot GROUP BY 1),
            marg AS (
              SELECT pic.lang, pic.cat, SUM(nic) AS nc
              FROM pic JOIN pi ON pic.lang = pi.lang AND pic.doc_id = pi.doc_id
              WHERE pi.ni >= 2 GROUP BY 1, 2),
            de AS (
              SELECT lang, SUM(nc) AS n, SUM(CAST(nc AS HUGEINT) * nc) AS sq
              FROM marg GROUP BY 1),
            desum AS (
              SELECT lang,
                     CAST(CASE WHEN n <= 1 THEN 0 ELSE
                       ((CAST(n AS HUGEINT) * n - sq) * 1000000) // (n - 1)
                       END AS BIGINT) AS de_micro
              FROM de)
            SELECT dsum.lang, n_items::BIGINT AS n_items,
                   n_ratings::BIGINT AS n_ratings, do_micro::BIGINT AS do_micro,
                   de_micro::BIGINT AS de_micro,
                   CAST(CASE WHEN de_micro = 0 THEN NULL ELSE
                     (CASE WHEN de_micro - do_micro < 0 THEN -1 ELSE 1 END) *
                     ((ABS(CAST(de_micro AS HUGEINT) - do_micro) * 1000000)
                       // de_micro) END AS BIGINT) AS alpha_ppm
            FROM dsum JOIN desum ON dsum.lang = desum.lang
            ORDER BY 1"""))

  /** Winsorized mean ([[graft.operators.RankStats.winsorizedMeanMicro]] —
    * robust revenue-per-line location at 5% each side over extended-price
    * cents per returnflag: rank-pick cuts from the value census, census
    * clamp fold, micro truncation). */
  val q379_winsorized = Q(
    "q379_winsorized",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      graft.operators.RankStats.winsorizedMeanMicro(li, "cents", 50000L, Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT l_returnflag AS g,
                     CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
              FROM lineitem),
            cen AS (SELECT g, v, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
            sw AS (
              SELECT g, v, cnt,
                     SUM(cnt) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     SUM(cnt) OVER (PARTITION BY g) AS n
              FROM cen),
            kk AS (SELECT g, MAX(n) AS n, (MAX(n) * 50000) // 1000000 AS k FROM sw GROUP BY 1),
            lo AS (
              SELECT sw.g, MIN(v) AS lo FROM sw JOIN kk ON sw.g = kk.g
              WHERE cum >= k + 1 GROUP BY 1),
            hi AS (
              SELECT sw.g, MIN(v) AS hi FROM sw JOIN kk ON sw.g = kk.g
              WHERE cum >= kk.n - k GROUP BY 1)
            SELECT sw.g, kk.n::BIGINT AS n, kk.k::BIGINT AS k_each_side,
                   lo.lo::BIGINT AS lo, hi.hi::BIGINT AS hi,
                   CAST((SUM(cnt * GREATEST(LEAST(v, hi.hi), lo.lo)) * 1000000) // kk.n
                     AS BIGINT) AS wmean_micro
            FROM sw JOIN kk ON sw.g = kk.g
            JOIN lo ON sw.g = lo.g JOIN hi ON sw.g = hi.g
            GROUP BY sw.g, kk.n, kk.k, lo.lo, hi.hi
            ORDER BY 1"""))

  /** ANN-graph hubness audit — embedding-quality COMPOSITION, zero new
    * operator code (the TextRank convention): IVF top-10 retrieval over
    * the whole corpus (centroid count ∝ corpus, the q85 k-derivation, so
    * the scan stays linear), then the retrieval graph's IN-DEGREE census
    * summarized by [[graft.operators.RankStats.giniPpm]] + anti-hub count
    * (points NO query retrieves — invisible to any kNN-based dedup or
    * retrieval) + the hottest point's in-degree. High Gini / many
    * anti-hubs is the classic curse-of-dimensionality hubness signature
    * (Radovanović et al. JMLR'10). Oracle replays assignment (the
    * NearestCentroidIndex dot/|c| similarity, ties to the LARGER centroid
    * id), 2-cell probing (cosine, ties to the smaller centroid id),
    * ranking, and the census fold. */
  val q380_hubness = Q(
    "q380_hubness",
    (s, dir) => {
      import graft.ml.Similarity
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      // centroids ∝ corpus (footer count, the q85 contract): fixed cells
      // would make each cell grow with the data and the probed scan
      // quadratic; k stays 8 at the driver SFs so results don't churn
      val kc = math.max(8L, emb.count() / 125L)
      val cents = emb.filter(col("vec_id") < kc)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      val cells = Similarity.assignToCentroids(emb, cents)
      val knn = Similarity.ivfTopK(emb, cells, cents, k = 10, probes = 2)
      val indeg = knn.groupBy(col("neighbor_id").as("vec_id"))
        .agg(count(lit(1)).as("indeg"))
      // materialized ONCE: `full` feeds BOTH the gini census and the
      // antihub aggregate — without this each branch re-runs the whole
      // IVF retrieval pipeline (the plan showed two complete ivfTopK
      // subtrees; r18 plan-lint finding)
      val full = emb.select(col("vec_id")).join(indeg, Seq("vec_id"), "left")
        .select(lit("all").as("g"), col("vec_id"),
          coalesce(col("indeg"), lit(0L)).as("indeg"))
        .localCheckpoint(true)
      val gini = graft.operators.RankStats.giniPpm(full, "indeg", Seq("g"))
      val extras = full.groupBy("g").agg(
        sum(when(col("indeg") === 0L, 1L).otherwise(0L)).as("n_antihub"),
        max(col("indeg")).as("max_indeg"))
      // both sides are one row (g is a constant group), and Catalyst
      // constant-folds the g = g condition away — broadcast the build side
      // so the degenerate join plans as the bounded BNLJ, not a cartesian
      gini.join(broadcast(extras), "g")
        .select(col("g"), col("n"), col("sum_v"), col("gini_num"),
          col("gini_ppm"), col("n_antihub"), col("max_indeg"))
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
            kc AS (SELECT GREATEST(8, COUNT(*) // 125) AS kc FROM e),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e
                      WHERE vec_id < (SELECT kc FROM kc)),
            -- cell assignment: dot/|c| similarity, ties to the LARGER cid
            -- (the NearestCentroidIndex contract)
            asg AS (
              SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                         list_dot_product(e.v, c.cv)
                           / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                         c.cid DESC) AS rn
                FROM e CROSS JOIN cents c)
              WHERE rn = 1),
            -- probe selection: full cosine, ties to the SMALLER cid
            probes AS (
              SELECT vec_id AS qid, cid FROM (
                SELECT e.vec_id, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                         list_dot_product(e.v, c.cv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                         c.cid ASC) AS rn
                FROM e CROSS JOIN cents c)
              WHERE rn <= 2),
            cand AS (
              SELECT p.qid, a.vec_id AS nid,
                     list_dot_product(eq.v, en.v)
                       / (sqrt(list_dot_product(eq.v, eq.v))
                          * sqrt(list_dot_product(en.v, en.v))) AS cos
              FROM probes p
              JOIN asg a ON p.cid = a.cid
              JOIN e eq ON p.qid = eq.vec_id
              JOIN e en ON a.vec_id = en.vec_id
              WHERE p.qid <> a.vec_id),
            knn AS (
              SELECT qid, nid FROM (
                SELECT qid, nid,
                       ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY cos DESC, nid ASC) AS rn
                FROM cand)
              WHERE rn <= 10),
            indeg AS (
              SELECT e.vec_id, COALESCE(d.c, 0) AS indeg
              FROM e LEFT JOIN (SELECT nid, COUNT(*) AS c FROM knn GROUP BY 1) d
                ON e.vec_id = d.nid),
            cen AS (SELECT indeg AS iv, COUNT(*) AS cnt FROM indeg GROUP BY 1),
            rk AS (
              SELECT iv, cnt,
                     2 * COALESCE(SUM(cnt) OVER (ORDER BY iv
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS rank2,
                     SUM(cnt) OVER () AS n
              FROM cen),
            ag AS (
              SELECT MAX(n) AS n, SUM(cnt * iv) AS sum_v,
                     SUM(CAST(cnt AS HUGEINT) * (rank2 - n - 1) * iv) AS gn
              FROM rk)
            SELECT 'all' AS g, n::BIGINT AS n, sum_v::BIGINT AS sum_v,
                   gn::BIGINT AS gini_num,
                   CAST(CASE WHEN sum_v = 0 THEN NULL ELSE
                     (gn * 1000000) // (CAST(n AS HUGEINT) * sum_v)
                     END AS BIGINT) AS gini_ppm,
                   (SELECT COUNT(*) FROM indeg WHERE indeg = 0)::BIGINT AS n_antihub,
                   (SELECT MAX(indeg) FROM indeg)::BIGINT AS max_indeg
            FROM ag"""))

  /** Post-stratified ATE ([[graft.ml.Regress.postStratifiedAte]] — arm
    * assignment PLANTED to correlate with the stratum (arm-b share rises
    * 3/10 → 7/10 across strata) while the metric baseline also rises with
    * the stratum, so the naive arm difference is badly biased upward; the
    * within-stratum weighted contrast recovers the planted +15 effect.
    * Per order-status group). */
  val q381_post_strat_ate = Q(
    "q381_post_strat_ate",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderstatus").as("g"),
        pmod(col("o_orderkey"), lit(5L)).as("s"),
        col("o_orderkey"), col("o_custkey"))
        .withColumn("arm",
          when(pmod(col("o_custkey") * 31L + col("s") * 7L, lit(10L)) <
            lit(3L) + col("s"), "b").otherwise("a"))
        .withColumn("y",
          col("s") * 100L + when(col("arm") === "b", 15L).otherwise(0L) +
            pmod(col("o_orderkey") * 7L, lit(10L)))
      graft.ml.Regress.postStratifiedAte(o, "y", "arm", "a", "b", "s", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderstatus AS g, o_orderkey % 5 AS s,
                     CASE WHEN (o_custkey * 31 + (o_orderkey % 5) * 7) % 10
                               < 3 + o_orderkey % 5
                          THEN 'b' ELSE 'a' END AS arm,
                     o_orderkey
              FROM orders),
            d2 AS (
              SELECT g, s, arm,
                     s * 100 + CASE WHEN arm = 'b' THEN 15 ELSE 0 END +
                       (o_orderkey * 7) % 10 AS y
              FROM d),
            cells AS (
              SELECT g, s,
                     SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS na,
                     SUM(CASE WHEN arm = 'a' THEN y ELSE 0 END) AS ya,
                     SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS nb,
                     SUM(CASE WHEN arm = 'b' THEN y ELSE 0 END) AS yb
              FROM d2 GROUP BY 1, 2),
            kept AS (
              SELECT g, na, ya, nb, yb, na + nb AS w,
                     (yb * 1000000) // nb - (ya * 1000000) // na AS dy
              FROM cells WHERE na > 0 AND nb > 0),
            ag AS (
              SELECT g, COUNT(*) AS n_strata_used, SUM(w) AS n_used,
                     SUM(na) AS tna, SUM(ya) AS tya,
                     SUM(nb) AS tnb, SUM(yb) AS tyb,
                     SUM(CAST(w AS HUGEINT) * dy) AS wd
              FROM kept GROUP BY 1)
            SELECT g, n_strata_used::BIGINT AS n_strata_used,
                   n_used::BIGINT AS n_used,
                   CAST((tyb * 1000000) // tnb - (tya * 1000000) // tna AS BIGINT)
                     AS naive_diff_micro,
                   CAST(CASE WHEN n_used = 0 THEN NULL ELSE
                     (CASE WHEN wd < 0 THEN -1 ELSE 1 END) *
                     (ABS(wd) // n_used) END AS BIGINT) AS ate_micro
            FROM ag ORDER BY 1"""))

  /** Quantile treatment effects — the DISTRIBUTIONAL A/B readout beside
    * the mean contrasts (ATE q381, CUPED q371): a treatment that helps the
    * tail but not the median is invisible to a mean diff. Pure COMPOSITION
    * over [[graft.operators.RankStats.ecdf]] (zero new operator code): per
    * arm the exact ECDF census, per probability p the RANK-PICK quantile
    * (smallest value with pct_le_ppm ≥ p — the q261/q337 hash-match
    * discipline, never interpolation), QTE(p) = q_B(p) − q_A(p). The
    * planted effect ADDS +40 only above the b-arm's 70th percentile
    * residue, so qte is ~0 at p≤0.5 and ~+40 at p=0.9 — the exact shape a
    * mean test blurs. */
  val q382_qte = Q(
    "q382_qte",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        when(pmod(col("o_custkey"), lit(2L)) === 0L, "a").otherwise("b").as("arm"),
        pmod(col("o_orderkey") * 48271L, lit(1000L)).as("base"))
        .withColumn("y", col("base") +
          when(col("arm") === "b" && col("base") >= 700L, 40L).otherwise(0L))
      val cdf = graft.operators.RankStats.ecdf(o, "y", Seq("g", "arm"))
      val probs = Seq(250000L, 500000L, 750000L, 900000L).toDF("p")
      def pick(arm: String, out: String) = cdf.filter(col("arm") === arm)
        .crossJoin(probs)
        .filter(col("pct_le_ppm") >= col("p"))
        .groupBy(col("g"), col("p"))
        .agg(min(col("y")).as(out))
      pick("a", "qa").join(pick("b", "qb"), Seq("g", "p"))
        .withColumn("qte", col("qb") - col("qa"))
        .orderBy("g", "p")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g,
                     CASE WHEN o_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                     (o_orderkey * 48271) % 1000 AS base
              FROM orders),
            d2 AS (
              SELECT g, arm,
                     base + CASE WHEN arm = 'b' AND base >= 700 THEN 40 ELSE 0 END AS y
              FROM d),
            cen AS (
              SELECT g, arm, y, COUNT(*) AS cnt FROM d2 GROUP BY 1, 2, 3),
            cdf AS (
              SELECT g, arm, y,
                     SUM(cnt) OVER (PARTITION BY g, arm ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     SUM(cnt) OVER (PARTITION BY g, arm) AS n
              FROM cen),
            pct AS (SELECT g, arm, y, (cum * 1000000) // n AS pct FROM cdf),
            probs AS (SELECT unnest([250000, 500000, 750000, 900000]) AS p),
            qa AS (
              SELECT g, p, MIN(y) AS qa FROM pct CROSS JOIN probs
              WHERE arm = 'a' AND pct >= p GROUP BY 1, 2),
            qb AS (
              SELECT g, p, MIN(y) AS qb FROM pct CROSS JOIN probs
              WHERE arm = 'b' AND pct >= p GROUP BY 1, 2)
            SELECT qa.g, qa.p::BIGINT AS p, qa::BIGINT AS qa, qb::BIGINT AS qb,
                   (qb - qa)::BIGINT AS qte
            FROM qa JOIN qb ON qa.g = qb.g AND qa.p = qb.p
            ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(
    q362_drift_fdr_monitor, q363_cohen_kappa, q364_fleiss_kappa, q365_mcnemar,
    q366_wilcoxon, q367_cliffs_delta, q368_brier, q369_log_rank,
    q370_nelson_aalen, q371_cuped, q372_changepoint, q373_clustering_coeff,
    q374_bradley_terry, q375_gini, q376_text_eval, q377_majority_vote,
    q378_krippendorff, q379_winsorized, q380_hubness, q381_post_strat_ate,
    q382_qte)
}
