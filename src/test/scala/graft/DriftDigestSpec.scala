package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drift, EventAnalytics, TableDigest}

/** Round-12 monitor/verification contracts: PSI fixed-point-log2 semantics
  * (zero on identical distributions, monotone in shift, smoothing keeps
  * one-sided buckets finite, driver-replay exactness), time-decay
  * attribution (shift credits, window/order/clamp edges), and the
  * commutative table digest (layout invariance, tamper sensitivity, and
  * the duplicate-pair attack XOR alone would miss). */
class DriftDigestSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- PSI

  private def psi(rows: Seq[(String, Long, String)]): Map[String, (Long, Long)] =
    Drift.psiLog2(viaParquet(rows.toDF("g", "bucket", "side")),
        "bucket", "side", "a", "b", Seq("g"))
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("psi_num"), r.getAs[Long]("psi_ppm"))))
      .toMap

  test("psiLog2: identical distributions score exactly zero; shift is monotone") {
    val same = (1 to 40).flatMap(i =>
      Seq(("g", (i % 4).toLong, "a"), ("g", (i % 4).toLong, "b")))
    assert(psi(same) == Map("g" -> ((0L, 0L))))
    // mild shift vs hard shift: b's mass moves one bucket vs all-to-one
    def shifted(hard: Boolean) = (1 to 40).map(i => ("g", (i % 4).toLong, "a")) ++
      (1 to 40).map(i => ("g", if (hard) 0L else ((i % 4) min 2).toLong, "b"))
    val mild = psi(shifted(hard = false))("g")._2
    val hard = psi(shifted(hard = true))("g")._2
    assert(mild > 0L && hard > mild)
  }

  test("psiLog2: one-sided buckets stay finite via smoothing; driver replay is exact") {
    // census: bucket 1 -> (ca=10, cb=20); bucket 9 -> (ca=20, cb=0) —
    // bucket 9 exists ONLY on side a (the case smoothing exists for)
    val rows = (1 to 10).map(_ => ("g", 1L, "a")) ++
      (1 to 20).map(_ => ("g", 1L, "b")) ++
      (1 to 20).map(_ => ("g", 9L, "a"))
    val got = psi(rows)("g")
    // driver replay with the same fixed-point floor-log2
    def flog(x: Long): Long = {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      16L * msb - 16L + x * 16L / (1L << msb)
    }
    val (na2, nb2) = (30L + 2L, 20L + 2L)
    val terms = Seq((10L, 20L), (20L, 0L)).map { case (ca, cb) =>
      val (xa, xb) = ((ca + 1) * nb2, (cb + 1) * na2)
      (xa - xb) * (flog(xa) - flog(xb))
    }
    assert(terms.forall(_ >= 0L))
    assert(got._1 == terms.sum)
    assert(got._2 == terms.sum * 1000000L / (16L * na2 * nb2))
  }

  test("psiLog2: groups missing a side are dropped") {
    val rows = Seq(("g1", 0L, "a"), ("g1", 0L, "b"), ("g2", 0L, "a"))
    assert(psi(rows).keySet == Set("g1"))
  }

  // ------------------------------------------------- time-decay credits

  test("timeDecayAttribution: shift credits, ordering, window, and >=20-day clamp") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-31 12:00:00")
    def ts(daysBefore: Double) = new java.sql.Timestamp(
      t0.getTime - (daysBefore * 86400000L).toLong)
    val ev = Seq(
      (1L, "conv", ts(0)),
      (1L, "x", ts(0.5)), // gap 0 days -> 1000000
      (1L, "x", ts(1.5)), // gap 1 day  -> 500000
      (1L, "y", ts(2.5)), // gap 2 days -> 250000
      (1L, "y", ts(25.0)), // gap 25 -> clamped to 0 (still counted as a touch)
      (1L, "x", ts(35.0)), // outside the 30-day window -> excluded
      (1L, "x", ts(-1.0)), // AFTER the conversion -> excluded
      (2L, "x", ts(3.0))) // no conversion for key 2 -> excluded
      .toDF("k", "ty", "ts")
    val got = EventAnalytics.timeDecayAttribution(viaParquet(ev), "k", "ty", "ts",
        Seq("x", "y"), "conv", windowDays = 30)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("x" -> ((2L, 1500000L)), "y" -> ((2L, 250000L))))
    assertThrows[IllegalArgumentException] {
      EventAnalytics.timeDecayAttribution(ev, "k", "ty", "ts", Seq("x", "conv"), "conv", 30)
    }
  }

  // ----------------------------------------------------- table digest

  test("digest is layout-invariant and value/row-count sensitive") {
    val base = viaParquet((1L to 300L).map(i => (i, i * 7L % 50L)).toDF("a", "b"))
    val d0 = TableDigest.digest(base, Seq("a", "b")).head()
    val d1 = TableDigest.digest(base.repartition(11).orderBy(desc("b")), Seq("a", "b")).head()
    assert(d0.toSeq == d1.toSeq)
    val tampered = base.withColumn("b", when(col("a") === 7L, col("b") + 1L).otherwise(col("b")))
    assert(TableDigest.reconcile(base, tampered, Seq("a", "b"))
      .head().getAs[Boolean]("matches") == false)
    assert(TableDigest.reconcile(base, base.filter(col("a") =!= 7L), Seq("a", "b"))
      .head().getAs[Boolean]("matches") == false)
    assert(TableDigest.reconcile(base, base.repartition(5), Seq("a", "b"))
      .head().getAs[Boolean]("matches") == true)
  }

  test("digest catches the duplicate-pair swap that XOR alone cannot") {
    // A = {r, r, s}, B = {s, u, u}: equal counts, equal XOR (pairs cancel),
    // different content -> the modular SUM must flag it
    val a = viaParquet(Seq((10L, 1L), (10L, 1L), (20L, 2L)).toDF("a", "b"))
    val b = viaParquet(Seq((20L, 2L), (30L, 3L), (30L, 3L)).toDF("a", "b"))
    val r = TableDigest.reconcile(a, b, Seq("a", "b")).head()
    assert(r.getAs[Long]("xor_a") == r.getAs[Long]("xor_b"))
    assert(r.getAs[Long]("n_a") == r.getAs[Long]("n_b"))
    assert(!r.getAs[Boolean]("matches"))
  }

  test("digest refusals") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    assertThrows[IllegalArgumentException] { TableDigest.digest(df, Seq.empty) }
    assertThrows[IllegalArgumentException] { TableDigest.digest(df, Seq("zz")) }
  }

  test("digest sum_h = (sum of per-row mods) mod 2^40 — decimal accumulation, " +
    "bounded output") {
    // the r13 overflow fix: terms average ~2^39, so a plain BIGINT sum dies
    // (ANSI) at ~2^24 rows; the decimal fold + final mod must equal the
    // BigInt replay and keep the reported digest inside [0, 2^40)
    val base = viaParquet((1L to 500L).map(i => (i, i * 13L % 97L)).toDF("a", "b"))
    val mod = BigInt(1099511627776L)
    val perRow = base.select(xxhash64(col("a"), col("b")).as("h"))
      .select(pmod(col("h"), lit(1099511627776L)).as("m"))
      .collect().map(r => BigInt(r.getLong(0)))
    val expect = (perRow.sum % mod).toLong
    val got = TableDigest.digest(base, Seq("a", "b")).head().getAs[Long]("sum_h")
    assert(got == expect)
    assert(got >= 0L && got < 1099511627776L)
  }

  // ------------------------------------------- join-delta MV + entropy

  test("joinDelta equals the full re-join under fuzzed splits; overlap refusal") {
    import graft.operators.Incremental
    val rnd = new scala.util.Random(29)
    val a = (1 to 400).map(i => (rnd.nextInt(60).toLong, i.toLong))
    val b = (1 to 80).map(i => (rnd.nextInt(60).toLong, (i * 100).toLong))
    val adf = viaParquet(a.toDF("k", "av"))
    val bdf = viaParquet(b.toDF("k", "bv"))
    val (aOld, aDelta) = (adf.filter(col("av") % 3 =!= 0), adf.filter(col("av") % 3 === 0))
    val (bOld, bDelta) = (bdf.filter(col("bv") % 2 =!= 0), bdf.filter(col("bv") % 2 === 0))
    val maintained = aOld.join(bOld, Seq("k"))
      .unionByName(Incremental.joinDelta(aOld, aDelta, bOld, bDelta, Seq("k")))
    assert(sortedRows(maintained) == sortedRows(adf.join(bdf, Seq("k"))))
    assertThrows[IllegalArgumentException] {
      Incremental.joinDelta(adf, adf, adf.toDF("k", "av"), adf.toDF("k", "av"), Seq("k"))
    }
  }

  test("columnEntropy: constant = 0, unique = flog(n)/16 bits, NULL is a value") {
    import graft.operators.TableStats
    val df = viaParquet((1L to 64L).map(i =>
      (i, "same", if (i <= 32) "x" else null)).toDF("uniq", "const", "half"))
    val got = TableStats.columnEntropy(df, Seq("uniq", "const", "half"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("ndv"), r.getAs[Long]("h_num"), r.getAs[Long]("entropy_ubits")))).toMap
    assert(got("const") == ((1L, 0L, 0L)))
    // 64 unique values: h_num = 64*flog(64) = 64*96; ubits = 96*1e6/16 = 6e6 (6 bits)
    assert(got("uniq") == ((64L, 64L * 96L, 6000000L)))
    // two equal halves (x / NULL): exactly 1 bit
    assert(got("half")._1 == 2L && got("half")._3 == 1000000L)
  }

  test("mutualInformation: MI(x,x) = H(x), independence = 0, NULL keys survive") {
    import graft.operators.TableStats
    val df = viaParquet((0L until 64L).map(i =>
      (i % 8, i / 8, if (i % 2 == 0) "e" else null)).toDF("x", "y", "par"))
    // x vs x: MI = H = exactly 3 bits on 8 uniform values
    val self = TableStats.mutualInformation(df, "x", "x").head()
    assert(self.getAs[Long]("mi_ubits") == 3000000L)
    // full factorial x (8 values) x y (8 values): exactly independent -> 0
    val ind = TableStats.mutualInformation(df, "x", "y").head()
    assert(ind.getAs[Long]("mi_num") == 0L && ind.getAs[Long]("ndv_joint") == 64L)
    // par is NULL half the time and determined by x's parity: MI = 1 bit,
    // and the NULL census rows must survive the null-safe joins
    val dep = TableStats.mutualInformation(df, "x", "par").head()
    assert(dep.getAs[Long]("ndv_joint") == 8L)
    assert(dep.getAs[Long]("mi_ubits") == 1000000L)
  }

  // ------------------------------------------ robust trend + Hampel

  test("theilSenSlope: median pick is outlier-immune and tie-deterministic") {
    import graft.operators.EventAnalytics
    // y = x except one wild point: OLS would bend, Theil-Sen says slope 1
    val ser = viaParquet(Seq(("g", 0L, 0L), ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 30L))
      .toDF("g", "x", "y"))
    val r = EventAnalytics.theilSenSlope(ser, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n_points") == 4L && r.getAs[Long]("n_pairs") == 6L)
    // rank-3 of [1,1,1,10,14.5,28] under the (slope, dy, dx, xi, xj) order
    assert((r.getAs[Long]("dy"), r.getAs[Long]("dx")) == ((2L, 2L)))
    assert(r.getAs[Long]("slope_ppm") == 1000000L)
    // partitioning invariance of the pick
    val r13 = EventAnalytics.theilSenSlope(ser.repartition(13), "g", "x", "y").collect()(0)
    assert(r.toSeq == r13.toSeq)
  }

  test("hampelOutliers: spike flagged, neighbors and edges not, constants never") {
    import graft.operators.Drift
    val ys = Seq(5L, 5L, 5L, 5L, 50L, 5L, 5L, 5L, 5L, 5L, 5L)
    val ser = viaParquet(ys.zipWithIndex.map { case (y, x) => ("g", x.toLong, y) }
      .toDF("g", "x", "y"))
    val got = Drift.hampelOutliers(ser, "g", "x", "y", half = 2, kNum = 3L, kDen = 1L)
      .filter(col("is_outlier")).select("x").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L))
    val const = viaParquet((0L to 10L).map(x => ("g", x, 7L)).toDF("g", "x", "y"))
    assert(Drift.hampelOutliers(const, "g", "x", "y", half = 2)
      .filter(col("is_outlier")).isEmpty)
    assertThrows[IllegalArgumentException] {
      Drift.hampelOutliers(const, "g", "x", "y", half = 0)
    }
  }

  test("hampelOutliers: duplicate x values stay deterministic across " +
    "partitionings (the (x, y) window order)") {
    import graft.operators.Drift
    // three rows share x=4 with different y — an x-only ORDER BY would make
    // the window contents depend on physical row order
    val rows = Seq((0L, 5L), (1L, 5L), (2L, 6L), (3L, 5L), (4L, 50L), (4L, 5L),
      (4L, 7L), (5L, 5L), (6L, 6L), (7L, 5L), (8L, 5L))
    def run(p: Int) = Drift.hampelOutliers(
      viaParquet(rows.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"))
        .repartition(p), "g", "x", "y", half = 2)
      .orderBy("x", "y").collect().map(_.toSeq).toSeq
    assert(run(1) == run(7) && run(7) == run(13))
    // the spike among the x=4 duplicates is flagged; its zero-deviation
    // twin at the same x is not (MAD-0 windows may flag small deviations
    // too — fine; the pinned contract is spike-in, twin-out)
    val flagged = Drift.hampelOutliers(
      viaParquet(rows.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")),
      "g", "x", "y", half = 2)
      .filter(col("is_outlier")).select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.contains((4L, 50L)) && !flagged.contains((4L, 5L)))
  }
}
