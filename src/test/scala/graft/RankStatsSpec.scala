package graft

import org.apache.spark.sql.functions._

import graft.operators.RankStats

/** Rank-statistics contracts: rank2 equals the doubled tie-averaged rank
  * from a driver sort under fuzz, hand-computed KS / Mann–Whitney /
  * Spearman / AUC cases (incl. the tie boundaries the doubled-rank trick
  * exists for), group handling, and the exact ppm arithmetic. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rank2Census equals doubled tie-averaged ranks from a driver sort (fuzz)") {
    val rnd = new scala.util.Random(11)
    val vals = (1 to 400).map(_ => rnd.nextInt(40).toLong) // heavy ties
    val df = viaParquet(vals.map(v => ("g", v)).toDF("g", "v"))
    val got = RankStats.rank2Census(df, "v", Seq("g"))
      .select("v", "rank2").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    val expect = vals.distinct.map { v =>
      val below = sorted.count(_ < v)
      val cnt = sorted.count(_ == v)
      // doubled average of ranks below+1 .. below+cnt
      v -> (2L * below + cnt + 1L)
    }.toMap
    assert(got == expect)
  }

  test("ksTest: disjoint supports give D = 1, hand case, one-sided groups dropped") {
    val df = viaParquet(Seq(
      ("g1", "a", 1.0), ("g1", "a", 2.0), ("g1", "b", 3.0), ("g1", "b", 4.0),
      // g2: A = {1,3}, B = {2,4} -> max gap at v=1: |1*2-0*2| = 2
      ("g2", "a", 1.0), ("g2", "a", 3.0), ("g2", "b", 2.0), ("g2", "b", 4.0),
      ("g3", "a", 9.0), // no b side -> dropped
      ("g1", "zzz", 99.0)) // foreign side value ignored
      .toDF("g", "side", "v"))
    val got = RankStats.ksTest(df, "v", "side", "a", "b", Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "g1" -> ((2L, 2L, 4L, 1000000L)),
      "g2" -> ((2L, 2L, 2L, 500000L))))
  }

  test("mannWhitney: hand case with a tie — u2 = 2U stays integer") {
    // A = {1,2,3}, B = {2,4}: U_A = 1.5 -> u2 = 3, u_ppm = 250000
    val df = viaParquet(Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .map { case (s, v) => ("g", s, v) }.toDF("g", "side", "v"))
    val r = RankStats.mannWhitney(df, "v", "side", "a", "b", Seq("g")).collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("u2"), r.getAs[Long]("u_ppm")) == ((3L, 2L, 3L, 250000L)))
  }

  test("spearman: perfect, inverted, tie-identical, and no-tie fuzz vs the exact formula") {
    def one(xy: Seq[(Long, Long)]): (Long, Long) = {
      val df = viaParquet(xy.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"))
      val r = RankStats.spearman(df, "x", "y", Seq("g")).collect()(0)
      (r.getAs[Long]("d2sum4"), r.getAs[Long]("rho_ppm"))
    }
    assert(one(Seq((1L, 10L), (2L, 20L), (3L, 30L))) == ((0L, 1000000L)))
    assert(one(Seq((1L, 30L), (2L, 20L), (3L, 10L))) == ((32L, -1000000L)))
    // identical tie structure in x and y -> rank vectors equal -> rho = 1
    assert(one(Seq((1L, 5L), (1L, 5L), (2L, 9L)))._2 == 1000000L)
    // no-tie fuzz: rho_ppm must equal the classical formula exactly
    val rnd = new scala.util.Random(23)
    val xs = rnd.shuffle((1L to 60L).toList)
    val ys = rnd.shuffle((1L to 60L).toList)
    val (d2sum4, rhoPpm) = one(xs.zip(ys))
    val rx = xs.zipWithIndex.sortBy(_._1).zipWithIndex
      .map { case ((_, i), r) => i -> (r + 1L) }.toMap
    val ry = ys.zipWithIndex.sortBy(_._1).zipWithIndex
      .map { case ((_, i), r) => i -> (r + 1L) }.toMap
    val sd2 = (0 until 60).map(i => { val d = rx(i) - ry(i); d * d }).sum
    assert(d2sum4 == 4L * sd2)
    val n = 60L
    val den = 2L * n * (n * n - 1L)
    val num = den - 3L * d2sum4
    val expectPpm = (if (num < 0) -1L else 1L) * (math.abs(num) * 1000000L / den)
    assert(rhoPpm == expectPpm)
  }

  test("rocAuc: hand case with score ties across labels") {
    // pos scores {3,5}, neg {1,3,4}: AUC = 4.5/6 = 0.75
    val df = viaParquet(Seq(
      (true, 3L), (true, 5L), (false, 1L), (false, 3L), (false, 4L))
      .map { case (l, s) => ("g", l, s) }.toDF("g", "lab", "score"))
    val r = RankStats.rocAuc(df, "score", "lab", Seq("g")).collect()(0)
    assert((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Long]("auc_ppm")) == ((2L, 3L, 750000L)))
    assert(r.getAs[Long]("u2") == 9L) // 2 * 4.5
  }

  test("kendallPairs: hand case, heavy-tie case, and fuzz vs brute-force pairs") {
    import graft.operators.RankStats.kendallPairs
    // perfect concordance: C = n(n-1)/2, D = 0, tau_a = 1
    val mono = viaParquet((1L to 5L).map(i => ("g", i, i * 10L)).toDF("g", "x", "y"))
    val rm = kendallPairs(mono, "x", "y", Seq("g")).collect()(0)
    assert((rm.getAs[Long]("c_pairs"), rm.getAs[Long]("d_pairs"),
      rm.getAs[Long]("tau_a_ppm")) == ((10L, 0L, 1000000L)))
    // fuzz with ties vs the O(n^2) definition
    val rnd = new scala.util.Random(17)
    val pts = (1 to 120).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
    val df = viaParquet(pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"))
    val r = kendallPairs(df, "x", "y", Seq("g")).collect()(0)
    var (c, d) = (0L, 0L)
    for (i <- pts.indices; j <- i + 1 until pts.size) {
      val s = (pts(j)._1 - pts(i)._1) * (pts(j)._2 - pts(i)._2)
      if (s > 0) c += 1 else if (s < 0) d += 1
    }
    assert((r.getAs[Long]("c_pairs"), r.getAs[Long]("d_pairs")) == ((c, d)))
    val n = 120L
    val num = c - d
    val expect = (if (num < 0) -1L else 1L) * (math.abs(num) * 1000000L / (n * (n - 1) / 2))
    assert(r.getAs[Long]("tau_a_ppm") == expect)
  }

  test("statistics are partitioning-invariant") {
    val rnd = new scala.util.Random(31)
    val base = (1 to 300).map(i =>
      ("g", if (i % 2 == 0) "a" else "b", rnd.nextInt(25).toDouble))
    val df1 = viaParquet(base.toDF("g", "side", "v")).repartition(1)
    val df7 = viaParquet(base.toDF("g", "side", "v")).repartition(7)
    assert(sortedRows(RankStats.ksTest(df1, "v", "side", "a", "b", Seq("g"))) ==
      sortedRows(RankStats.ksTest(df7, "v", "side", "a", "b", Seq("g"))))
    assert(sortedRows(RankStats.mannWhitney(df1, "v", "side", "a", "b", Seq("g"))) ==
      sortedRows(RankStats.mannWhitney(df7, "v", "side", "a", "b", Seq("g"))))
  }

  test("kruskalWallis: identical sides score 0; separated sides score big; driver replay") {
    import graft.operators.RankStats.kruskalWallis
    val same = viaParquet((1 to 60).map(i =>
      ("g", Seq("a", "b", "c")(i % 3), (i % 5).toDouble)).toDF("g", "side", "v"))
    val r0 = kruskalWallis(same, "v", "side", Seq("g")).collect()(0)
    assert(r0.getAs[Long]("k_sides") == 3L && r0.getAs[Long]("h_uppm") == 0L)
    // disjoint value ranges: near-maximal H (~ n-1 for k groups as n grows)
    val sep = viaParquet((1 to 60).map(i =>
      ("g", Seq("a", "b", "c")(i % 3), (i % 3) * 100 + i.toDouble)).toDF("g", "side", "v"))
    val r1 = kruskalWallis(sep, "v", "side", Seq("g")).collect()(0)
    // driver replay of the exact two-floor recipe
    val rows = (1 to 60).map(i => (Seq("a", "b", "c")(i % 3), (i % 3) * 100 + i))
    val sorted = rows.map(_._2).sorted
    def rank2(v: Int) = 2L * sorted.count(_ < v) + sorted.count(_ == v) + 1L
    val n = 60L
    val ts = rows.groupBy(_._1).values.map { g =>
      val ng = g.size.toLong
      val dev = g.map(r => rank2(r._2)).sum - ng * (n + 1)
      BigInt(dev) * dev * 1000000 / ng
    }
    val expect = (BigInt(3) * ts.sum / (n * (n + 1))).toLong
    assert(r1.getAs[Long]("h_uppm") == expect)
    assert(expect > 40000000L) // strongly separated: H in the tens
  }

  test("skewReport: uniform ~ 0, single-key = max concentration, exact Gini replay") {
    import graft.operators.SkewJoin
    // perfectly uniform keys: Gini exactly 0
    val uni = viaParquet((1 to 400).map(i => (i % 20).toLong).toDF("jk"))
    val r0 = SkewJoin.skewReport(uni, Seq("jk")).collect()(0)
    assert(r0.getAs[Long]("gini_ppm") == 0L)
    assert(r0.getAs[Long]("top1_ppm") == 50000L) // 20 per key / 400
    // one dominant key: driver replay of the rank-weighted formula
    val rnd = new scala.util.Random(47)
    val keys = (1 to 500).map(_ => if (rnd.nextInt(10) < 4) 7L else rnd.nextInt(50).toLong)
    val df = viaParquet(keys.toDF("jk"))
    val r1 = SkewJoin.skewReport(df, Seq("jk")).collect()(0)
    val census = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
    val m = census.size.toLong
    val n = census.sum
    val wsum = census.zipWithIndex.map { case (c, i) => 2L * (i + 1) * c }.sum
    val num = wsum - (m + 1) * n
    val expect = (if (num < 0) -1L else 1L) * (math.abs(num) * 1000000L / (m * n))
    assert(r1.getAs[Long]("gini_ppm") == expect)
    assert(r1.getAs[Long]("top1_ppm") == census.max * 1000000L / n)
    assert(expect > 500000L) // the 40%-hot key reads as strong concentration
  }

  test("skewReport: distributed rank is exact across partition boundaries and " +
    "plans no single-partition exchange") {
    import graft.operators.SkewJoin
    val rnd = new scala.util.Random(13)
    val keys = (1 to 800).map(_ => rnd.nextInt(97).toLong)
    val df = viaParquet(keys.toDF("jk"))
    // rankPartitions deliberately tiny and non-dividing: offsets must stitch
    // local ranks into the exact global order
    val reports = Seq(1, 3, 32).map { p =>
      SkewJoin.skewReport(df, Seq("jk"), rankPartitions = p).collect()(0)
    }
    val census = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
    val m = census.size.toLong
    val n = census.sum
    val wsum = census.zipWithIndex.map { case (c, i) => 2L * (i + 1) * c }.sum
    val expect = (wsum - (m + 1) * n) * 1000000L / (m * n)
    reports.foreach { r =>
      assert(r.getAs[Long]("gini_ppm") == expect)
      assert(r.getAs[Long]("n_keys") == m && r.getAs[Long]("n_rows") == n)
    }
    // the scale contract: the census RANK pass must never collapse to one
    // task — every Window in the plan runs over multiple partitions (the
    // final 4-number summary aggregate may legitimately collapse)
    val rep = SkewJoin.skewReport(df, Seq("jk"), rankPartitions = 8)
    rep.collect()
    val windows = graft.plans.PlanChecks.flatten(rep)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected the census rank window in the plan")
    // AQE may byte-coalesce the tiny TEST census — the planned exchange
    // shape below the window is the contract: hash partitioning on the
    // range-partition id, never the SinglePartition the old global
    // orderBy planned (the final 4-number summary agg above it may
    // legitimately collapse)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"census rank window must partition (by the range-partition id):\n$w")
      assert(!w.child.treeString.contains("SinglePartition"),
        s"census rank pass planned SinglePartition below the window:\n${w.child.treeString}")
    }
  }

  test("kendall tau_b: tie-pair sums and tau_b match a driver replay; " +
    "all-tied axis yields NULL") {
    import graft.operators.RankStats
    val rnd = new scala.util.Random(29)
    val xy = (1 to 300).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(6).toLong))
    val df = viaParquet(xy.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"))
    val r = RankStats.kendallPairs(df, "x", "y", Seq("g")).collect()(0)
    val n = xy.size.toLong
    val n0 = n * (n - 1) / 2
    val n1 = xy.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n2 = xy.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    var c = 0L; var d = 0L
    for (i <- xy.indices; j <- i + 1 until xy.size) {
      val ((xa, ya), (xb, yb)) = (xy(i), xy(j))
      val s = (xb - xa).sign * (yb - ya).sign
      if (s > 0) c += 1 else if (s < 0) d += 1
    }
    assert(r.getAs[Long]("c_pairs") == c && r.getAs[Long]("d_pairs") == d)
    assert(r.getAs[Long]("tie_x_pairs") == n1 && r.getAs[Long]("tie_y_pairs") == n2)
    val expect = math.floor((c - d).toDouble * 1000000.0 /
      (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))).toLong
    assert(r.getAs[Long]("tau_b_ppm") == expect)
    // sanity: tau_b magnitude exceeds tau_a (ties shrink the denominator)
    assert(math.abs(r.getAs[Long]("tau_b_ppm")) >= math.abs(r.getAs[Long]("tau_a_ppm")))
    // constant x: n0 == n1 -> NULL tau_b
    val const = viaParquet(Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 1L, 3L))
      .toDF("g", "x", "y"))
    val rc = RankStats.kendallPairs(const, "x", "y", Seq("g")).collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("tau_b_ppm")))
  }

  test("spearman rho_b: Pearson-on-ranks replay, ties make it differ from rho, " +
    "constant axis yields NULL") {
    import graft.operators.RankStats
    val rnd = new scala.util.Random(31)
    val xy = (1 to 250).map(_ => (rnd.nextInt(7).toLong, rnd.nextInt(9).toLong))
    val df = viaParquet(xy.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"))
    val r = RankStats.spearman(df, "x", "y", Seq("g")).collect()(0)
    // driver replay: doubled tie-averaged ranks, then Pearson
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        v -> (2L * sorted.count(_ < v) + sorted.count(_ == v) + 1L)
      }.toMap
    }
    val rx = rank2(xy.map(_._1)); val ry = rank2(xy.map(_._2))
    val n = xy.size.toLong
    val sxy = xy.map { case (x, y) => rx(x) * ry(y) }.sum
    val sxx = xy.map { case (x, _) => rx(x) * rx(x) }.sum
    val syy = xy.map { case (_, y) => ry(y) * ry(y) }.sum
    val ss = n * (n + 1)
    val (pnum, dx, dy) = (n * sxy - ss * ss, n * sxx - ss * ss, n * syy - ss * ss)
    val expect = math.floor(pnum.toDouble * 1000000.0 /
      (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))).toLong
    assert(r.getAs[Long]("rho_b_ppm") == expect)
    assert(r.getAs[Long]("rho_b_ppm") != r.getAs[Long]("rho_ppm")) // heavy ties separate them
    val const = viaParquet(Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L))
      .toDF("g", "x", "y"))
    val rc = RankStats.spearman(const, "x", "y", Seq("g")).collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("rho_b_ppm")))
  }

  test("empty groupCols refuse loudly across the census machinery") {
    import graft.operators.{RankStats, Resample}
    val df = viaParquet(Seq(("a", 1L, 2L), ("b", 2L, 3L)).toDF("s", "x", "y"))
    val cases: Seq[() => Any] = Seq(
      () => RankStats.rank2Census(df, "x", Nil),
      () => RankStats.ksTest(df, "x", "s", "a", "b", Nil),
      () => RankStats.mannWhitney(df, "x", "s", "a", "b", Nil),
      () => RankStats.kendallPairs(df, "x", "y", Nil),
      () => RankStats.spearman(df, "x", "y", Nil),
      () => RankStats.kruskalWallis(df, "x", "s", Nil),
      () => Resample.bootstrapMeanCi(df, "x", "y", 8, 1, 8, Nil),
      () => Resample.bootstrapRatioCi(df, "x", "y", "y", 8, 1, 8, Nil),
      () => graft.ml.Regress.isotonicFitPpm(df, "x", "y", Nil))
    cases.foreach { c =>
      val e = intercept[IllegalArgumentException](c())
      assert(e.getMessage.contains("group"), e.getMessage)
    }
  }
}
