package graft

import graft.ml.Regress

/** Exact-OLS contracts: noise-free plans are recovered EXACTLY (ppm and
  * R² = 10⁶ on the nose — the point of BigInt Cramer over float solvers),
  * the truncating rational semantics on positive and negative thirds,
  * ridge shrinkage toward zero, singularity/arity refusals, and
  * partitioning invariance. */
class RegressSpec extends SparkSpec {
  import spark.implicits._

  test("noise-free plane is recovered exactly, r2 = 1e6") {
    val rows = for (x1 <- 0L to 4L; x2 <- 0L to 4L)
      yield (x1, x2, 2L * x1 - 3L * x2 + 5L)
    val df = viaParquet(rows.toDF("x1", "x2", "y"))
    val r = Regress.olsFitPpm(df, Seq("x1", "x2"), "y").collect()(0)
    assert(r.getAs[Long]("n") == 25L)
    assert(r.getAs[Long]("ppm_x1") == 2000000L)
    assert(r.getAs[Long]("ppm_x2") == -3000000L)
    assert(r.getAs[Long]("ppm_intercept") == 5000000L)
    assert(r.getAs[Long]("r2_ppm") == 1000000L)
  }

  test("truncating rational semantics: +-1/3 truncate toward zero (DuckDB // replay)") {
    val pos = viaParquet(Seq((0L, 0L), (3L, 1L)).toDF("x1", "y"))
    val rp = Regress.olsFitPpm(pos, Seq("x1"), "y").collect()(0)
    assert(rp.getAs[Long]("ppm_x1") == 333333L)
    assert(rp.getAs[Long]("ppm_intercept") == 0L)
    val neg = viaParquet(Seq((0L, 0L), (3L, -1L)).toDF("x1", "y"))
    val rn = Regress.olsFitPpm(neg, Seq("x1"), "y").collect()(0)
    assert(rn.getAs[Long]("ppm_x1") == -333333L) // NOT the floor -333334
  }

  test("ridge shrinks coefficients toward zero, intercept unpenalized") {
    val rows = for (x1 <- 0L to 9L) yield (x1, 4L * x1 + 2L)
    val df = viaParquet(rows.toDF("x1", "y"))
    val ols = Regress.olsFitPpm(df, Seq("x1"), "y").collect()(0)
    val ridge = Regress.olsFitPpm(df, Seq("x1"), "y", lambda = 20L).collect()(0)
    assert(ols.getAs[Long]("ppm_x1") == 4000000L)
    assert(math.abs(ridge.getAs[Long]("ppm_x1")) < 4000000L)
    // exact: slope = 4*825/(825+10*20) -> 3219512 ppm truncated
    assert(ridge.getAs[Long]("ppm_x1") == 3219512L)
    // intercept compensates upward when the slope shrinks on positive-mean x
    assert(ridge.getAs[Long]("ppm_intercept") > ols.getAs[Long]("ppm_intercept"))
  }

  test("constant target: r2_ppm is NULL, coefficients still solve") {
    val rows = for (x1 <- 0L to 5L) yield (x1, 7L)
    val r = Regress.olsFitPpm(viaParquet(rows.toDF("x1", "y")), Seq("x1"), "y").collect()(0)
    assert(r.getAs[Long]("ppm_x1") == 0L)
    assert(r.getAs[Long]("ppm_intercept") == 7000000L)
    assert(r.isNullAt(r.fieldIndex("r2_ppm")))
  }

  test("refusals: collinear design, too few rows, arity, negative lambda") {
    val collinear = viaParquet((0L to 5L).map(x => (x, 2L * x, x + 1L)).toDF("x1", "x2", "y"))
    assertThrows[IllegalArgumentException] {
      Regress.olsFitPpm(collinear, Seq("x1", "x2"), "y")
    }
    val tiny = viaParquet(Seq((1L, 1L)).toDF("x1", "y"))
    assertThrows[IllegalArgumentException] { Regress.olsFitPpm(tiny, Seq("x1"), "y") }
    val df = viaParquet(Seq((1L, 2L, 3L, 4L, 5L)).toDF("a", "b", "c", "d", "y"))
    assertThrows[IllegalArgumentException] {
      Regress.olsFitPpm(df, Seq("a", "b", "c", "d"), "y")
    }
    assertThrows[IllegalArgumentException] {
      Regress.olsFitPpm(df, Seq("a"), "y", lambda = -1L)
    }
  }

  test("partitioning invariance (exact integers make this a real identity)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map { _ =>
      val x1 = rnd.nextInt(20).toLong; val x2 = rnd.nextInt(10).toLong
      (x1, x2, 3L * x1 - x2 + rnd.nextInt(7).toLong)
    }
    val df = viaParquet(rows.toDF("x1", "x2", "y"))
    val a = Regress.olsFitPpm(df.repartition(1), Seq("x1", "x2"), "y").collect()(0)
    val b = Regress.olsFitPpm(df.repartition(13), Seq("x1", "x2"), "y").collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("isotonicFitPpm: pooling, monotone output, exact floor vs a driver PAVA") {
    // classic violator: pointwise means (4, 2, 3) -> PAVA (3, 3, 3)
    val v = viaParquet(Seq(("g", 0L, 4L), ("g", 1L, 2L), ("g", 2L, 3L))
      .toDF("g", "x", "y"))
    val f = Regress.isotonicFitPpm(v, "x", "y", Seq("g"))
      .orderBy("x").collect().map(_.getAs[Long]("fit_ppm")).toSeq
    assert(f == Seq(3000000L, 3000000L, 3000000L))
    // already monotone: fit = the pointwise averages, floored to ppm
    val m = viaParquet(Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 1L, 4L), ("g", 2L, 5L))
      .toDF("g", "x", "y"))
    val fm = Regress.isotonicFitPpm(m, "x", "y", Seq("g"))
      .orderBy("x").collect().map(_.getAs[Long]("fit_ppm")).toSeq
    assert(fm == Seq(1500000L, 4000000L, 5000000L))
    // fuzz: nondecreasing AND equal to a driver PAVA in exact rationals
    val rnd = new scala.util.Random(41)
    val pts = (0 until 30).map(x => (x.toLong, rnd.nextInt(50).toLong))
    val df = viaParquet(pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"))
    val got = Regress.isotonicFitPpm(df, "x", "y", Seq("g"))
      .orderBy("x").collect().map(_.getAs[Long]("fit_ppm")).toSeq
    assert(got == got.sorted, "fit must be nondecreasing")
    // driver PAVA with exact rational blocks
    case class Block(num: Long, den: Long)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    pts.foreach { case (_, y) =>
      var b = Block(y, 1)
      while (blocks.nonEmpty && blocks.last.num * b.den >= b.num * blocks.last.den) {
        val p = blocks.remove(blocks.size - 1)
        b = Block(p.num + b.num, p.den + b.den)
      }
      blocks += b
    }
    val expect = blocks.flatMap(b =>
      Seq.fill(b.den.toInt)(b.num * 1000000L / b.den)).toSeq
    assert(got == expect)
    // refusals: negative y; too many positions
    assertThrows[IllegalArgumentException] {
      Regress.isotonicFitPpm(viaParquet(Seq(("g", 0L, -1L)).toDF("g", "x", "y")),
        "x", "y", Seq("g"))
    }
    assertThrows[IllegalArgumentException] {
      Regress.isotonicFitPpm(df, "x", "y", Seq("g"), maxPositions = 10)
    }
  }
}
