package graft

import org.apache.spark.sql.functions._

import graft.operators.{Agreement, Drift, RankStats}

/** Round-15 operators: quadratically weighted Cohen's κ, Cochran's Q,
  * Friedman test, Mann–Kendall trend — hand-computed fixtures pinned to
  * the textbook formulas, plus the complete-design / duplicate-time
  * refusals. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedKappaQuadratic: hand case, constant-rater NULL, sign") {
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 2L))
      .toDF("a", "b").withColumn("g", lit("x"))
    val r = Agreement.weightedKappaQuadratic(df, "a", "b", Seq("g")).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("wo_num") == 4L) // only (0,2) disagrees, w = 4
    assert(r.getAs[Long]("we_num") == 26L)
    // kappa = (26 - 4*4)/26 = 10/26 -> 384615 ppm truncating
    assert(r.getAs[Long]("kappa_ppm") == 384615L)
    // both raters constant on the SAME label: we = 0 -> NULL (undefined)
    val const = Seq((1L, 1L), (1L, 1L)).toDF("a", "b").withColumn("g", lit("x"))
    assert(Agreement.weightedKappaQuadratic(const, "a", "b", Seq("g"))
      .collect().head.isNullAt(4))
    // systematic max-distance disagreement drives kappa negative
    val anti = Seq((0L, 4L), (4L, 0L), (0L, 4L), (4L, 0L))
      .toDF("a", "b").withColumn("g", lit("x"))
    assert(Agreement.weightedKappaQuadratic(anti, "a", "b", Seq("g"))
      .collect().head.getAs[Long]("kappa_ppm") < 0L)
  }

  test("cochranQ: textbook hand case, unanimity NULL, incomplete-design refusal") {
    // items x classifiers: C = [3,3,1], L = [2,3,1,1]
    val rows = Seq(
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 0L),
      (2L, 0L, 1L), (2L, 1L, 1L), (2L, 2L, 1L),
      (3L, 0L, 0L), (3L, 1L, 1L), (3L, 2L, 0L),
      (4L, 0L, 1L), (4L, 1L, 0L), (4L, 2L, 0L))
      .toDF("i", "j", "sc").withColumn("g", lit("x"))
    val r = Agreement.cochranQ(rows, "i", "j", "sc", Seq("g")).collect().head
    assert(r.getAs[Long]("n_items") == 4L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_success") == 7L)
    // Q = (k-1)(k*sumC2 - N^2)/(kN - sumL2) = 2*(57-49)/(21-15) = 16/6
    assert(r.getAs[Long]("q_upm") == 2666666L)
    assert(r.getAs[Long]("p_ppm") == 1000000L) // Markov 4/2.67 clamps
    // all items unanimous successes: den = kN - sumL2 = 0 -> NULL
    val unanimous = Seq((1L, 0L, 1L), (1L, 1L, 1L), (2L, 0L, 1L), (2L, 1L, 1L))
      .toDF("i", "j", "sc").withColumn("g", lit("x"))
    assert(Agreement.cochranQ(unanimous, "i", "j", "sc", Seq("g"))
      .collect().head.isNullAt(4))
    // an item missing one classifier refuses loudly
    val e = intercept[IllegalArgumentException](
      Agreement.cochranQ(rows.filter(!(col("i") === 4L && col("j") === 2L)),
        "i", "j", "sc", Seq("g")).collect())
    assert(e.getMessage.contains("complete block design"))
  }

  test("friedmanTest: textbook no-tie case, tie correction, refusal") {
    // 4 blocks x 3 treatments, C always ranked top except block 4 swaps A/B:
    // classic Friedman chi2 = 6.5
    val obs = Seq(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L),
      (2L, "A", 2L), (2L, "B", 3L), (2L, "C", 4L),
      (3L, "A", 1L), (3L, "B", 3L), (3L, "C", 5L),
      (4L, "A", 2L), (4L, "B", 1L), (4L, "C", 6L))
      .toDF("b", "tr", "v").withColumn("g", lit("x"))
    val r = RankStats.friedmanTest(obs, "b", "tr", "v", Seq("g")).collect().head
    assert(r.getAs[Long]("n_blocks") == 4L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("chi2_upm") == 6500000L)
    // Markov p = min(1, 2*2/6.5) = 615384 ppm
    assert(r.getAs[Long]("p_ppm") == 615384L)
    // every block fully tied: A4 = C4 -> NULL statistic, p = 1e6
    val tied = Seq(
      (1L, "A", 7L), (1L, "B", 7L), (1L, "C", 7L),
      (2L, "A", 9L), (2L, "B", 9L), (2L, "C", 9L))
      .toDF("b", "tr", "v").withColumn("g", lit("x"))
    val rt = RankStats.friedmanTest(tied, "b", "tr", "v", Seq("g")).collect().head
    assert(rt.isNullAt(3) && rt.getAs[Long]("p_ppm") == 1000000L)
    // partial ties still exact: block (A=1, B=1, C=2) gives rank2 (3,3,5)
    val partial = Seq(
      (1L, "A", 1L), (1L, "B", 1L), (1L, "C", 2L),
      (2L, "A", 1L), (2L, "B", 2L), (2L, "C", 3L))
      .toDF("b", "tr", "v").withColumn("g", lit("x"))
    val rp = RankStats.friedmanTest(partial, "b", "tr", "v", Seq("g")).collect().head
    // rank2 in block 1: (3, 3, 6); block 2: (2, 4, 6). R2: A=5, B=7, C=12;
    // n(k+1)=8 -> devs (-3,-1,4), num0=26; A4 = 9+9+36+4+16+36 = 110;
    // C4 = 2*3*16 = 96; T = 2*26/14 = 3.714285 (checked against Conover's
    // single-rank form: 2*6.5/3.5)
    assert(rp.getAs[Long]("chi2_upm") == 3714285L)
    val e = intercept[IllegalArgumentException](
      RankStats.friedmanTest(obs.filter(!(col("b") === 4L && col("tr") === "C")),
        "b", "tr", "v", Seq("g")).collect())
    assert(e.getMessage.contains("complete block design"))
  }

  test("mannKendall: monotone trends, constant series, duplicate-time refusal") {
    def series(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, t) => (t.toLong, v) }.toDF("t", "v").withColumn("g", lit("x"))
    val up = Drift.mannKendall(series(Seq(1L, 3L, 5L, 7L, 9L)), "t", "v", Seq("g"))
      .collect().head
    assert(up.getAs[Long]("s") == 10L && up.getAs[Long]("var18") == 300L)
    assert(up.getAs[Long]("trend") == 1L) // 11250*81 >= 2401*300
    val down = Drift.mannKendall(series(Seq(9L, 7L, 5L, 3L, 1L)), "t", "v", Seq("g"))
      .collect().head
    assert(down.getAs[Long]("s") == -10L && down.getAs[Long]("trend") == -1L)
    val flat = Drift.mannKendall(series(Seq(4L, 4L, 4L, 4L, 4L)), "t", "v", Seq("g"))
      .collect().head
    assert(flat.getAs[Long]("s") == 0L && flat.getAs[Long]("var18") == 0L &&
      flat.getAs[Long]("trend") == 0L)
    // a weak wiggle is NOT a trend (S small vs var)
    val wiggle = Drift.mannKendall(series(Seq(5L, 7L, 4L, 6L, 5L, 8L, 3L)), "t", "v", Seq("g"))
      .collect().head
    assert(wiggle.getAs[Long]("trend") == 0L)
    val dup = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("t", "v").withColumn("g", lit("x"))
    val e = intercept[IllegalArgumentException](
      Drift.mannKendall(dup, "t", "v", Seq("g")).collect())
    assert(e.getMessage.contains("duplicate time"))
  }

  test("kendallW: perfect concordance 1e6, reversal drops it, all-tied NULL") {
    // 3 judges, 4 items, identical rankings -> W = exactly 1
    def obs(rows: Seq[(Long, Long, Long)]) = rows.toDF("j", "i", "v").withColumn("g", lit("x"))
    val perfect = obs(for (j <- 0L to 2L; i <- 0L to 3L) yield (j, i, i * 10))
    val rp = RankStats.kendallW(perfect, "j", "i", "v", Seq("g")).collect().head
    assert(rp.getAs[Long]("n_judges") == 3L && rp.getAs[Long]("k") == 4L)
    assert(rp.getAs[Long]("w_ppm") == 1000000L)
    // one judge fully reversed: concordance drops strictly below 1
    val mixed = obs((for (j <- 0L to 1L; i <- 0L to 3L) yield (j, i, i * 10)) ++
      (for (i <- 0L to 3L) yield (2L, i, 30L - i * 10)))
    val rm = RankStats.kendallW(mixed, "j", "i", "v", Seq("g")).collect().head
    assert(rm.getAs[Long]("w_ppm") < 500000L && rm.getAs[Long]("w_ppm") > 0L)
    // every judge rates everything the same: no information -> NULL
    val tied = obs(for (j <- 0L to 1L; i <- 0L to 3L) yield (j, i, 7L))
    assert(RankStats.kendallW(tied, "j", "i", "v", Seq("g")).collect().head.isNullAt(3))
  }

  test("pageTrendTest: directional trends, tie and incomplete refusals") {
    def obs(rows: Seq[(Long, Long, Long)]) = rows.toDF("b", "sy", "v").withColumn("g", lit("x"))
    // 6 blocks in perfect hypothesized order: L2 = 6 * 2*(1+4+9+16) = 360,
    // d = 2*360 - 6*100 = 120; 22500*120^2 >= 9604*6*1200 holds -> +1
    val up = obs(for (b <- 0L to 5L; s <- 0L to 3L) yield (b, s, s + 1))
    val ru = RankStats.pageTrendTest(up, "b", "sy", "v", Seq("g")).collect().head
    assert(ru.getAs[Long]("l2") == 360L && ru.getAs[Long]("trend") == 1L)
    val down = obs(for (b <- 0L to 5L; s <- 0L to 3L) yield (b, s, 4L - s))
    assert(RankStats.pageTrendTest(down, "b", "sy", "v", Seq("g"))
      .collect().head.getAs[Long]("trend") == -1L)
    // a single perfectly-ordered block is not enough evidence
    val one = obs(for (s <- 0L to 3L) yield (0L, s, s + 1))
    assert(RankStats.pageTrendTest(one, "b", "sy", "v", Seq("g"))
      .collect().head.getAs[Long]("trend") == 0L)
    // tied values within a block refuse (the null moments assume tie-free)
    val tied = obs(Seq((0L, 0L, 5L), (0L, 1L, 5L), (0L, 2L, 6L), (0L, 3L, 7L)))
    val e = intercept[IllegalArgumentException](
      RankStats.pageTrendTest(tied, "b", "sy", "v", Seq("g")).collect())
    assert(e.getMessage.contains("tied values"))
    val e2 = intercept[IllegalArgumentException](
      RankStats.pageTrendTest(up.filter(!(col("b") === 5L && col("sy") === 3L)),
        "b", "sy", "v", Seq("g")).collect())
    assert(e2.getMessage.contains("complete block design"))
  }

  test("pageTrendTest: 1.96 boundary pinned (n=6, k=4 — r15 ADVICE fix)") {
    // n=6, k=4: E[L]=150, sd=sqrt(50); the 5% two-sided cut in exact
    // rationals is 22500*d^2 >= 9604*7200 with d = 4(L-E). Per-block L_b
    // is set by choosing which value sits at each order position.
    def obs(rows: Seq[(Long, Long, Long)]) = rows.toDF("b", "sy", "v").withColumn("g", lit("x"))
    val identity = (b: Long) => (0L to 3L).map(s => (b, s, s + 1))       // L_b = 30
    val lb24 = Seq((4L, 0L, 4L), (4L, 1L, 1L), (4L, 2L, 2L), (4L, 3L, 3L)) // L_b = 24
    val lb23 = Seq((4L, 0L, 3L), (4L, 1L, 2L), (4L, 2L, 4L), (4L, 3L, 1L)) // L_b = 23
    val lb20 = (0L to 3L).map(s => (5L, s, 4L - s))                      // L_b = 20
    // L = 4*30 + 24 + 20 = 164 -> z = 14/sqrt(50) = 1.9799 > 1.96: fires
    // (the pre-fix 38416 constant reported 0 here — the ADVICE repro)
    val just = obs((0L to 3L).flatMap(identity) ++ lb24 ++ lb20)
    val rj = RankStats.pageTrendTest(just, "b", "sy", "v", Seq("g")).collect().head
    assert(rj.getAs[Long]("l2") == 328L && rj.getAs[Long]("trend") == 1L)
    // L = 163 -> z = 13/sqrt(50) = 1.8385 < 1.96: stays 0
    val under = obs((0L to 3L).flatMap(identity) ++ lb23 ++ lb20)
    val ru2 = RankStats.pageTrendTest(under, "b", "sy", "v", Seq("g")).collect().head
    assert(ru2.getAs[Long]("l2") == 326L && ru2.getAs[Long]("trend") == 0L)
  }

  test("runsTest: clustering -1, alternation +1, small-n and one-sided 0, refusal") {
    def series(bs: Seq[Boolean]) = bs.zipWithIndex
      .map { case (b, t) => (t.toLong, b) }.toDF("t", "b").withColumn("g", lit("x"))
    def verdictOf(bs: Seq[Boolean]): (Long, Long) = {
      val r = Drift.runsTest(series(bs), "t", "b", Seq("g")).collect().head
      (r.getAs[Long]("runs"), r.getAs[Long]("verdict"))
    }
    // 10 trues then 10 falses: R = 2, d = -180, strongly clustered
    assert(verdictOf(Seq.fill(10)(true) ++ Seq.fill(10)(false)) == (2L, -1L))
    // perfect alternation over 20: R = 20, d = +180
    assert(verdictOf((0 until 20).map(_ % 2 == 0)) == (20L, 1L))
    // short mixed sequence: not enough evidence either way
    assert(verdictOf(Seq(true, true, false, true, false, false))._2 == 0L)
    // one-sided sequence: runs = 1, verdict 0 (nothing to order)
    assert(verdictOf(Seq.fill(6)(true)) == (1L, 0L))
    val dup = Seq((1L, true), (1L, false)).toDF("t", "b").withColumn("g", lit("x"))
    val e = intercept[IllegalArgumentException](
      Drift.runsTest(dup, "t", "b", Seq("g")).collect())
    assert(e.getMessage.contains("duplicate time"))
  }

  test("permutationTestHashed: planted effect floors, zero-diff fixture accepts, reps floor") {
    import graft.ml.Regress
    // planted: arm b shifted +500 on values ~ k%7 — overwhelming effect
    val planted = (1L to 400L).map(k =>
      (k, if (k % 2 == 1) "b" else "a", k % 7 + (if (k % 2 == 1) 500L else 0L)))
      .toDF("k", "arm", "v").withColumn("g", lit("x"))
    val rp = Regress.permutationTestHashed(planted, "k", "v", "arm", "a", "b", Seq("g"),
      reps = 32).collect().head
    assert(rp.getAs[Long]("p_ppm") == 1000000L / 33L) // the add-one floor
    assert(rp.getAs[Long]("n_a") == 200L && rp.getAs[Long]("n_b") == 200L)
    // a PERFECTLY balanced fixture (same multiset per arm, T_obs = 0):
    // every relabeling is at least as extreme -> p = 1e6
    // value keyed by the PAIR index so both arms hold identical multisets
    val zero = (1L to 400L).map(k => (k, if (k % 2 == 1) "b" else "a", ((k + 1) / 2) % 7))
      .toDF("k", "arm", "v").withColumn("g", lit("x"))
    val rz = Regress.permutationTestHashed(zero, "k", "v", "arm", "a", "b", Seq("g"),
      reps = 32).collect().head
    assert(rz.getAs[Long]("t_num") == 0L && rz.getAs[Long]("p_ppm") == 1000000L)
    // rows with other arm values are ignored
    val extra = planted.unionByName(
      Seq((9999L, "c", 12345L)).toDF("k", "arm", "v").withColumn("g", lit("x")))
    assert(Regress.permutationTestHashed(extra, "k", "v", "arm", "a", "b", Seq("g"), reps = 8)
      .collect().head.getAs[Long]("n_a") == 200L)
  }

  test("vocabularyRichness: hand census, chao1 and unseen mass exact") {
    import graft.text.TextFunctions
    val df = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
      .withColumn("g", lit("x"))
    val r = TextFunctions.vocabularyRichness(df, "text", Seq("g")).collect().head
    // census: a:2, b:1, c:1 -> N=4, D=3, f1=2, f2=1
    assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("f1") == 2L && r.getAs[Long]("f2") == 1L)
    // chao1 = 3e6 + (2*1*1e6) div (2*(1+1)) = 3_500_000
    assert(r.getAs[Long]("chao1_ppm") == 3500000L)
    // unseen = 2e6 div 4 = 500_000
    assert(r.getAs[Long]("unseen_mass_ppm") == 500000L)
    // no dis legomena: bias-corrected denominator stays defined (f2 = 0)
    val r2 = TextFunctions.vocabularyRichness(
      Seq((1L, "x y z")).toDF("doc_id", "text").withColumn("g", lit("x")),
      "text", Seq("g")).collect().head
    assert(r2.getAs[Long]("chao1_ppm") == 3000000L + (3L * 2L * 1000000L) / 2L)
  }

  test("nnDescentKnn: recall vs brute force improves over rounds; refusal on tiny corpus") {
    import graft.ml.Similarity
    // 60 vectors in 4 well-separated clusters, ids interleaved so the ring
    // init is deliberately bad (ring neighbors usually sit in other clusters)
    val vecs = (0 until 60).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 10.0f
      base(c * 2 + 1) = 3.0f + (i / 4) * 0.1f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val k = 3
    def resultSet(rounds: Int): Map[Long, Set[Long]] = Similarity
      .nnDescentKnn(vecs, k, rounds)
      .select("vec_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
    val truth = Similarity.bruteForceTopK(vecs, vecs, k)
    def truthSet = truth.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
    val t = truthSet
    def recall(got: Map[Long, Set[Long]]): Double =
      got.map { case (x, ys) => (ys & t(x)).size.toDouble / k }.sum / t.size
    val r0 = recall(resultSet(0))
    val r2 = recall(resultSet(2))
    assert(r0 < 0.5, s"ring init should be bad, got $r0") // interleaved clusters
    assert(r2 > r0, s"rounds must improve recall: $r0 -> $r2")
    assert(r2 >= 0.9, s"two local-join rounds should converge on clustered data, got $r2")
    // k >= n refuses loudly (the ring init needs more nodes than neighbors)
    val tiny = (0 until 3).map(i => (i.toLong, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Similarity.nnDescentKnn(tiny, 3, 1))
    assert(e.getMessage.contains("more than k"))
    // gapped/offset id space: the rank ring must keep every node in play
    // (r15 ADVICE — a raw-id ring seeded edges at nonexistent ids and the
    // scoring joins silently dropped whole nodes)
    val gapped = vecs.select((col("vec_id") * 1000L + 7L).as("vec_id"), col("embedding"))
    val g = Similarity.nnDescentKnn(gapped, k, 2)
      .select("vec_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
    assert(g.size == 60, s"every gapped-id node must appear, got ${g.size}")
    assert(g.forall(_._2.size == k))
    // rank order == id order, so the gapped result is the dense result relabeled
    val dense = resultSet(2)
    assert(g == dense.map { case (x, ys) =>
      (x * 1000L + 7L) -> ys.map(_ * 1000L + 7L) })
  }
}
