package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Graph, RangeJoin, RankingEval, RankStats, SkewJoin, Survival}

/** Round-13 operator contracts: ranking-eval metrics against hand-computed
  * fixed-point values, Kaplan–Meier census/at-risk/sticky-zero semantics,
  * retention cohort dedup + self-check, interval-island merging (touching,
  * swallowed, degenerate), Borůvka MSF vs a driver Kruskal under the same
  * tie-break order, the exact join-size advisory vs the real join, the
  * census ECDF, and the stats-resetting checkpoint that keeps iterative
  * loops' planning cost constant. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- ranking

  test("metricsAtK: hand case — prec/recall/rr/dcg/ndcg in exact fixed point") {
    // one query, ranks 1..5, relevant at ranks 2 and 4, k = 3
    val df = viaParquet(Seq(
      ("q", 1L, false), ("q", 2L, true), ("q", 3L, false),
      ("q", 4L, true), ("q", 5L, false)).toDF("qid", "rk", "rel"))
    val r = RankingEval.metricsAtK(df, "rk", "rel", 3, Seq("qid")).collect()(0)
    // flog16(2)=16, flog16(3)=24 -> w(1)=10^6, w(2)=666666
    assert(r.getAs[Long]("n_ranked") == 5L)
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("hits_at_k") == 1L)
    assert(r.getAs[Long]("prec_at_k_ppm") == 333333L)
    assert(r.getAs[Long]("recall_at_k_ppm") == 500000L)
    assert(r.getAs[Long]("rr_ppm") == 500000L)
    assert(r.getAs[Long]("dcg_upm") == 666666L)
    // idcg(min(2,3)) = 10^6 + 666666 = 1666666
    assert(r.getAs[Long]("ndcg_ppm") == 666666L * 1000000L / 1666666L)
  }

  test("metricsAtK: no relevant -> recall/ndcg NULL, rr 0; driver flog16 matches expr") {
    val df = viaParquet(Seq(("q", 1L, false), ("q", 2L, false)).toDF("qid", "rk", "rel"))
    val r = RankingEval.metricsAtK(df, "rk", "rel", 2, Seq("qid")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("recall_at_k_ppm")))
    assert(r.isNullAt(r.fieldIndex("ndcg_ppm")))
    assert(r.getAs[Long]("rr_ppm") == 0L)
    // the literal ideal-DCG table and the codegen discount share one flog
    val expr = viaParquet((1L to 64L).toDF("x"))
      .select(col("x"), graft.operators.Linkage.flog2fp(col("x")).as("f"))
      .orderBy("x").collect().map(_.getAs[Long]("f"))
    val drv = (1L to 64L).map(RankingEval.flog16)
    assert(expr.toSeq == drv)
  }

  // --------------------------------------------------------------- survival

  test("kaplanMeierLog2: at-risk suffix counts, censoring convention, sticky zero") {
    // 7 subjects: t1 2 events + 1 censored; t2 1 event; t3 1 censored;
    // t4 2 events (n = d -> S = 0)
    val df = viaParquet(Seq(
      ("g", 1L, true), ("g", 1L, true), ("g", 1L, false),
      ("g", 2L, true), ("g", 3L, false),
      ("g", 4L, true), ("g", 4L, true)).toDF("g", "tt", "ev"))
    val got = Survival.kaplanMeierLog2(df, "tt", "ev", Seq("g"))
      .orderBy("t").collect()
    // pure-censoring t=3 emits no row; flog16: 5->36 7->44 3->24 4->32
    assert(got.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L, 4L))
    assert(got.map(_.getAs[Long]("n_risk")).toSeq == Seq(7L, 4L, 2L))
    assert(got.map(_.getAs[Long]("d_events")).toSeq == Seq(2L, 1L, 2L))
    assert(got.map(_.getAs[Long]("c_censored")).toSeq == Seq(1L, 0L, 0L))
    assert(got(0).getAs[Long]("logs_fp16") == -8L) // flog(5)-flog(7)
    assert(got(1).getAs[Long]("logs_fp16") == -16L) // + flog(3)-flog(4)
    assert(got(2).isNullAt(got(2).fieldIndex("logs_fp16"))) // n = d -> 0
  }

  // -------------------------------------------------------------- retention

  test("retentionCohorts: period dedup, cohort = first period, offset-0 self-check") {
    val df = viaParquet(Seq(
      ("u1", 0L), ("u1", 1L), ("u1", 8L), ("u1", 21L), // w0 (deduped), w1, w3
      ("u2", 7L), ("u2", 14L), // w1, w2
      ("u3", 0L)).toDF("user_id", "day"))
    val got = EventAnalytics.retentionCohorts(df, "user_id", "day", 7)
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset"),
        r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
        r.getAs[Long]("retention_ppm")))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1000000L), (0L, 1L, 1L, 2L, 500000L),
      (0L, 3L, 1L, 2L, 500000L),
      (1L, 0L, 1L, 1L, 1000000L), (1L, 1L, 1L, 1L, 1000000L)))
    // offset 0 is the whole cohort for EVERY input (built-in self-check)
    assert(got.filter(_._2 == 0L).forall(_._5 == 1000000L))
  }

  // ---------------------------------------------------------------- islands

  test("mergeIntervals: touching merge, swallowed interval, degenerate drop, keys") {
    val df = viaParquet(Seq(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 15L, 20L), // one island [0,20)
      ("a", 30L, 40L), ("a", 32L, 35L), // swallowed -> island [30,40)
      ("a", 50L, 50L), // degenerate, dropped
      ("b", 0L, 1L)).toDF("k", "s", "e"))
    val got = RangeJoin.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("k", "island_start")
      .collect().map(r => (r.getString(0), r.getAs[Long]("island_start"),
        r.getAs[Long]("island_end"), r.getAs[Long]("n_intervals")))
    assert(got.toSeq == Seq(
      ("a", 0L, 20L, 3L), ("a", 30L, 40L, 2L), ("b", 0L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      RangeJoin.mergeIntervals(df, Seq.empty, "s", "e")
    }
  }

  // ---------------------------------------------------------------- boruvka

  /** Driver Kruskal under the SAME (w, a, b) total order — the unique-MSF
    * comparison oracle. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((u, v, w) <- edges.filter(e => e._1 != e._2)
        .map { case (u, v, w) => (math.min(u, v), math.max(u, v), w) }
        .sortBy { case (a, b, w) => (w, a, b) }) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; picked += ((u, v, w)) }
    }
    picked.toSeq
  }

  test("boruvkaMsf: hand case — chord outside the MST by the cycle property") {
    val df = viaParquet(Seq(
      (1L, 2L, 1L), (2L, 3L, 5L), (3L, 4L, 2L), (1L, 3L, 10L)).toDF("u", "v", "w"))
    val got = Graph.boruvkaMsf(df, "u", "v", "w")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L), (2L, 3L, 5L), (3L, 4L, 2L)).sorted)
  }

  test("boruvkaMsf: fuzz vs driver Kruskal on a random multi-component graph") {
    val rnd = new scala.util.Random(13)
    // two rings (disconnected forest case) + random chords, duplicate edges
    val ring1 = (0L until 40L).map(i => (i, (i + 1) % 40, 100L + rnd.nextInt(50)))
    val ring2 = (100L until 130L).map(i => (i, 100L + (i + 1 - 100L) % 30, 100L + rnd.nextInt(50)))
    val chords = (1 to 30).map { _ =>
      val side = rnd.nextBoolean()
      val (lo, n) = if (side) (0L, 40L) else (100L, 30L)
      (lo + rnd.nextInt(n.toInt), lo + rnd.nextInt(n.toInt), 100L + rnd.nextInt(50))
    }
    val all = ring1 ++ ring2 ++ chords ++ chords.take(5) // dup edges fine
    val got = Graph.boruvkaMsf(viaParquet(all.toDF("u", "v", "w")), "u", "v", "w")
      .select("a", "b", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = kruskal(all).toSet
    assert(got == want) // unique MSF under the tie-broken order
  }

  // ------------------------------------------------------------ betweenness

  /** Driver replay of the defined truncating Brandes variant. */
  private def brandesMicro(
      edges: Seq[(Long, Long)], seeds: Seq[Long], horizon: Int): Map[Long, (Long, Long)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1))).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (s <- seeds) {
      var levels = Vector(Map(s -> 1L)) // node -> sigma per level
      var seen = Set(s)
      var done = false
      while (!done && levels.length <= horizon) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
        for ((v, sv) <- levels.last; w <- adj.getOrElse(v, Set.empty) if !seen(w))
          nxt(w) = nxt.getOrElse(w, 0L) + sv
        if (nxt.isEmpty) done = true
        else { levels :+= nxt.toMap; seen ++= nxt.keySet }
      }
      val deltas = new Array[Map[Long, Long]](levels.length)
      deltas(levels.length - 1) = levels.last.keys.map(_ -> 0L).toMap
      for (k <- levels.length - 2 to 0 by -1) {
        val down = levels(k + 1)
        val dNext = deltas(k + 1)
        deltas(k) = levels(k).map { case (v, sv) =>
          v -> adj.getOrElse(v, Set.empty).toSeq.sorted.collect {
            case w if down.contains(w) => sv * (1000000L + dNext(w)) / down(w)
          }.sum
        }
      }
      for (k <- levels.indices; (v, _) <- levels(k) if v != s) {
        val (b, n) = acc.getOrElse(v, (0L, 0L))
        acc(v) = (b + deltas(k).getOrElse(v, 0L), n + 1)
      }
    }
    acc.toMap
  }

  test("betweennessApprox: path and diamond hand cases") {
    val path = viaParquet(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val gotP = Graph.betweennessApprox(path, Seq(1L, 3L), 4)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Long]("bc_upm"),
        r.getAs[Long]("n_seeds")))).toMap
    assert(gotP == Map(1L -> ((0L, 1L)), 2L -> ((2000000L, 2L)), 3L -> ((0L, 1L))))
    // diamond: two shortest paths to 4 split the dependency 500000/500000
    val dia = viaParquet(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst"))
    val gotD = Graph.betweennessApprox(dia, Seq(1L), 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bc_upm")).toMap
    assert(gotD == Map(2L -> 500000L, 3L -> 500000L, 4L -> 0L))
  }

  test("betweennessApprox: fuzz vs a driver Brandes with identical truncation") {
    val rnd = new scala.util.Random(17)
    val edges = ((0L until 30L).map(i => (i, (i + 1) % 30)) ++
      (1 to 25).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)))
      .filter(e => e._1 != e._2)
    val seeds = Seq(0L, 7L, 19L)
    val got = Graph.betweennessApprox(
        viaParquet(edges.toDF("src", "dst")), seeds, 10)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Long]("bc_upm"),
        r.getAs[Long]("n_seeds")))).toMap
    assert(got == brandesMicro(edges, seeds, 10))
  }

  // -------------------------------------------------------------- join size

  test("joinSizeEstimate: exact against the real join, decimal accumulation") {
    val l = viaParquet(Seq(1L, 1L, 2L, 3L).toDF("k"))
    val r = viaParquet(Seq(1L, 2L, 2L, 4L).toDF("k"))
    val est = SkewJoin.joinSizeEstimate(l, r, Seq("k")).collect()(0)
    assert(est.getAs[Long]("n_left") == 4L)
    assert(est.getAs[Long]("n_right") == 4L)
    assert(est.getAs[Long]("n_keys_common") == 2L)
    assert(est.getAs[java.math.BigDecimal]("join_rows").longValueExact() ==
      l.join(r, "k").count())
    assert(est.getAs[Long]("max_key_rows") == 2L)
    intercept[IllegalArgumentException] {
      SkewJoin.joinSizeEstimate(l, r, Seq.empty)
    }
  }

  // ------------------------------------------------------------------- ecdf

  test("ecdf: census rows, cumulative counts, exact ppm; empty-group refusal") {
    val df = viaParquet(Seq(("g", 1L), ("g", 1L), ("g", 2L), ("g", 5L)).toDF("g", "v"))
    val got = RankStats.ecdf(df, "v", Seq("g")).orderBy("v")
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("cnt"),
        r.getAs[Long]("cum_le"), r.getAs[Long]("n"), r.getAs[Long]("pct_le_ppm")))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 4L, 500000L), (2L, 1L, 3L, 4L, 750000L),
      (5L, 1L, 4L, 4L, 1000000L)))
    intercept[IllegalArgumentException] { RankStats.ecdf(df, "v", Seq.empty) }
  }

  // ---------------------------------------------------------- pr curve / ap

  test("prCurve + averagePrecision: hand case with score ties") {
    // desc sweep: s=3 (1,1P) prec 1e6; s=2 (+2,1P) cum 3/2 prec 666666;
    // s=1 (+1,0P) cum 4/2 prec 500000; AP = (1e6 + 666666) div 2
    val df = viaParquet(Seq(
      ("g", 3L, true), ("g", 2L, false), ("g", 2L, true), ("g", 1L, false))
      .toDF("g", "score", "lbl"))
    val curve = graft.operators.RankingEval.prCurve(df, "score", "lbl", Seq("g"))
      .orderBy(col("score").desc).collect()
    assert(curve.map(r => (r.getAs[Long]("score"), r.getAs[Long]("cum_n"),
      r.getAs[Long]("cum_pos"), r.getAs[Long]("prec_ppm"),
      r.getAs[Long]("recall_ppm"))).toSeq ==
      Seq((3L, 1L, 1L, 1000000L, 500000L), (2L, 3L, 2L, 666666L, 1000000L),
        (1L, 4L, 2L, 500000L, 1000000L)))
    val ap = graft.operators.RankingEval.averagePrecision(df, "score", "lbl", Seq("g"))
      .collect()(0)
    assert(ap.getAs[Long]("ap_ppm") == (1000000L + 666666L) / 2L)
  }

  test("cumulativeGains: lift of the top bucket, exact cross-product") {
    // buckets (w=10): b2 = {20P,21P}, b1 = {10P,11F}, b0 = {0F,1F}
    val df = viaParquet(Seq(20L -> true, 21L -> true, 10L -> true,
      11L -> false, 0L -> false, 1L -> false)
      .map { case (s, l) => ("g", s, l) }.toDF("g", "score", "lbl"))
    val got = graft.operators.RankingEval
      .cumulativeGains(df, "score", "lbl", 10L, Seq("g"))
      .orderBy(col("bucket").desc).collect()
    assert(got.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cum_n"),
      r.getAs[Long]("cum_pos"), r.getAs[Long]("gain_ppm"),
      r.getAs[Long]("lift_ppm"))).toSeq == Seq(
      (2L, 2L, 2L, 666666L, 2000000L), // top third captures 2/3 pos, 2x lift
      (1L, 4L, 3L, 1000000L, 1500000L),
      (0L, 6L, 3L, 1000000L, 1000000L)))
  }

  // ----------------------------------------------------------- calibration

  test("reliabilityBins: exact ECE identity, calibrated bucket scores 0") {
    // bucket 0 (w=5e5): scores 200000/400000, 1 pos of 2 -> dev |1e6-6e5|=4e5
    // bucket 1: score 500000 twice, 1 pos -> dev |1e6-1e6| = 0
    val df = viaParquet(Seq(
      ("g", 200000L, false), ("g", 400000L, true),
      ("g", 500000L, true), ("g", 500000L, false)).toDF("g", "s", "l"))
    val bins = graft.ml.Calibrate.reliabilityBins(df, "s", "l", 500000L, Seq("g"))
      .orderBy("bucket").collect()
    assert(bins.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_b"),
      r.getAs[Long]("pos_b"), r.getAs[Long]("abs_dev"))).toSeq ==
      Seq((0L, 2L, 1L, 400000L), (1L, 2L, 1L, 0L)))
    // ECE with cancelled denominators: 400000 div 4 = 100000
    assert(bins.map(_.getAs[Long]("abs_dev")).sum / 4 == 100000L)
  }

  test("splitConformal: rank pick, coverage, tiny-calibration NULL refusal") {
    val cal = (1L to 10L).map(r => ("g", r, true))
    val tst = Seq(("g", 5L, false), ("g", 11L, false))
    val small = Seq(("h", 1L, true), ("h", 2L, true), ("h", 3L, true),
      ("h", 1L, false))
    val df = viaParquet((cal ++ tst ++ small).toDF("g", "resid", "is_cal"))
    val got = graft.ml.Calibrate.splitConformal(df, "resid", "is_cal",
      alphaPpm = 100000L, groupCols = Seq("g")).orderBy("g").collect()
    // g: k = ceil(11 * .9) = 10 -> qhat = 10; coverage 1/2
    assert((got(0).getAs[Long]("n_cal"), got(0).getAs[Long]("k_rank"),
      got(0).getAs[Long]("qhat"), got(0).getAs[Long]("coverage_ppm")) ==
      ((10L, 10L, 10L, 500000L)))
    // h: k = ceil(4 * .9) = 4 > n_cal = 3 -> no valid radius
    assert(got(1).isNullAt(got(1).fieldIndex("qhat")))
  }

  // ------------------------------------------------------------------ sprt

  test("sprt: crossing step, decision at FIRST boundary hit, refusals") {
    val (ls, lf) = graft.operators.Sequential.llrWeightsMicroLog2(100000L, 500000L)
    assert(ls > 0 && lf < 0)
    // batches of 10 trials: 9 successes each -> strong H1 drift
    val perBatch = 9L * ls + 1L * lf
    val cross = (4200000L + perBatch - 1) / perBatch // first t with cum >= 4.2e6
    val df = viaParquet((1L to 10L).map(t => ("g", t, 9L, 10L))
      .toDF("g", "t", "s", "n"))
    val r = graft.operators.Sequential.sprt(df, "t", "s", "n",
      100000L, 500000L, 4200000L, -4200000L, Seq("g")).collect()(0)
    assert(r.getAs[String]("decision") == "reject_h0")
    assert(r.getAs[Long]("decided_t") == cross)
    assert(r.getAs[Long]("llr_at_decision") == cross * perBatch)
    assert(r.getAs[Long]("final_llr") == 10L * perBatch)
    intercept[IllegalArgumentException] {
      graft.operators.Sequential.sprt(df, "t", "s", "n",
        100000L, 500000L, -1L, -2L, Seq("g"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sequential.sprt(df, "t", "s", "n",
        100000L, 500000L, 1L, -1L, Seq.empty)
    }
  }

  // ---------------------------------------------------------------- bh-fdr

  test("bhFdr: step-up rescue — a passing larger rank rejects failing smaller ones") {
    // m=4, alpha=1e5: thresholds k*25000. p=[20000, 60000, 70000, 900000]:
    // k1 pass, k2 FAIL, k3 pass -> k*=3 rejects ranks 1..3 incl. rank 2
    val df = viaParquet(Seq(
      ("g", 1L, 20000L), ("g", 2L, 60000L), ("g", 3L, 70000L), ("g", 4L, 900000L))
      .toDF("g", "h", "p"))
    val got = graft.operators.Sequential.bhFdr(df, "p", "h", 100000L, Seq("g"))
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("rank"),
        r.getAs[Long]("k_star"), r.getAs[Boolean]("rejected")))
    assert(got.toSeq == Seq((1L, 1L, 3L, true), (2L, 2L, 3L, true),
      (3L, 3L, 3L, true), (4L, 4L, 3L, false)))
    // all-large p -> k* = 0, nothing rejected
    val none = graft.operators.Sequential.bhFdr(
      viaParquet(Seq(("g", 1L, 999999L)).toDF("g", "h", "p")),
      "p", "h", 100000L, Seq("g")).collect()(0)
    assert(none.getAs[Long]("k_star") == 0L && !none.getAs[Boolean]("rejected"))
    intercept[IllegalArgumentException] {
      graft.operators.Sequential.bhFdr(df, "p", "h", 100000L, Seq.empty)
    }
  }

  // ---------------------------------------------------------------- markov

  test("markovTransitions + composeTransitions: hand chain, tie determinism") {
    val df = viaParquet(Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 3L, 30L, "A"), (1L, 4L, 40L, "B"),
      (2L, 5L, 10L, "B"), (2L, 6L, 10L, "B")) // tie on ts -> event_id orders
      .toDF("user_id", "event_id", "ts", "state"))
    val t1 = graft.operators.EventAnalytics
      .markovTransitions(df, "user_id", "ts", "event_id", "state")
    val got = t1.orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_trans"),
        r.getAs[Long]("p_ppm")))
    assert(got.toSeq == Seq(
      ("A", "B", 2L, 1000000L), ("B", "A", 1L, 500000L), ("B", "B", 1L, 500000L)))
    // T2: A->B via B: p(A,B)*p(B,B) div 1e6 = 500000; A->A via B: 500000
    val t2 = graft.operators.EventAnalytics.composeTransitions(t1, t1)
      .orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("p2_ppm")))
    assert(t2.toSeq == Seq(
      ("A", "A", 500000L), ("A", "B", 500000L),
      ("B", "A", 250000L), ("B", "B", 750000L)))
  }

  // ------------------------------------------------------------ globalOrder

  test("GlobalOrder.cumSum: exact global running sum, no SinglePartition window") {
    val rnd = new scala.util.Random(19)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(9)))
    val df = viaParquet(rows.toDF("id", "w"))
    val got = graft.operators.GlobalOrder
      .cumSum(df, Seq(col("id")), col("w"), "cum", partitions = 8)
    val collected = got.orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum"))
    val expect = rows.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (id, w)) => (id, acc + w)
    }.tail
    assert(collected.toSeq == expect)
    // the scale contract (the skewReport shape): the cumsum window runs
    // over the range-partition id, never a SinglePartition exchange
    val windows = graft.plans.PlanChecks.flatten(got)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected the cumsum window in the plan")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"cumsum window must partition:\n$w")
      assert(!w.child.treeString.contains("SinglePartition"),
        s"cumsum planned SinglePartition below the window:\n${w.child.treeString}")
    }
  }

  // ------------------------------------------------------- CheckpointFresh

  test("CheckpointFresh: content/schema preserved, stats do NOT compound across rounds") {
    import org.apache.spark.sql.graft.CheckpointFresh
    var d = viaParquet((0L until 100L).map(i => (i, i % 7)).toDF("id", "grp"))
    val before = sortedRows(d)
    // 6 rounds of the self-join shape that sent Dataset.localCheckpoint's
    // rewritten sizeInBytes to quarter-billion-bit BigInts (Borůvka bug)
    for (_ <- 1 to 6) {
      val r = d.select(col("id").as("rid"), col("grp").as("rgrp"))
      d = CheckpointFresh(
        d.join(r, col("id") === col("rid")).select(col("id"), col("grp")))
      val bits = d.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      assert(bits < 256, s"stats compounding: sizeInBytes at $bits bits")
    }
    assert(sortedRows(d) == before)
    assert(d.schema.map(_.name) == Seq("id", "grp"))
  }
}
