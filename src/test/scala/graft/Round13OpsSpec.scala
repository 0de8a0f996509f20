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
