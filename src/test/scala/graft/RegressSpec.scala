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
}
