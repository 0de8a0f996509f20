package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact multiple linear regression via distributed normal equations —
  * the "fit a trend/calibration over the whole table" operator done the
  * way a 100 TB engine must: ONE map-side-combinable aggregation builds
  * the d×d Gram matrix XᵀX and moment vector Xᵀy (d = features +
  * intercept, metadata-sized), the solve happens on the driver in EXACT
  * BigInt arithmetic (Cramer determinants — d ≤ 4 keeps that honest), and
  * coefficients come back as FLOOR-divided ppm fixed-point rationals, so
  * the result is bit-identical under any partitioning and replayable in
  * oracle SQL (HUGEINT + flooring `//`). No gradient iterations, no float
  * accumulation order, no per-row driver traffic.
  *
  * Contract: feature and target columns are INTEGERS (fixed-point-quantize
  * first — same grid discipline as the int8 Gram q294); the Gram entries
  * must fit BIGINT (n·max|x|² — ANSI mode fails loudly, never wraps).
  * Ridge (`lambda` > 0) adds λ to the non-intercept diagonal — the
  * intercept is never penalized.
  */
object Regress {

  /** Exact rational fit: p-element coefficient vector as (numerator det_i,
    * shared denominator det) plus R² ingredients. */
  final case class ExactFit(
      n: Long,
      det: BigInt,
      coefNums: Seq[BigInt], // one per feature, then intercept LAST
      sseNum: BigInt, // SSE·det (≥ 0)
      sstNum: BigInt // SST·n (≥ 0)
  )

  // BigInt `/` truncates toward zero — MEASURED to match DuckDB's `//`
  // on negative operands (-7 // 2 = -3 in DuckDB 1.x; the `//`-floors
  // folklore is wrong), so a plain quotient replays exactly.
  private def truncDiv(a: BigInt, b: BigInt): BigInt = a / b

  private def det(m: Vector[Vector[BigInt]]): BigInt =
    if (m.size == 1) m(0)(0)
    else (0 until m.size).map { j =>
      val minor = m.tail.map(row => row.take(j) ++ row.drop(j + 1))
      val s = if (j % 2 == 0) BigInt(1) else BigInt(-1)
      s * m(0)(j) * det(minor)
    }.sum

  /** One aggregation pass → exact normal-equation solve. Features
    * augmented with an intercept column (x_d = 1). */
  def olsFitExact(
      df: DataFrame,
      features: Seq[String],
      yCol: String,
      lambda: Long = 0L): ExactFit = {
    require(features.nonEmpty && features.size <= 3,
      s"olsFitExact: 1..3 features (exact Cramer stays driver-trivial), got ${features.size}")
    require(features.distinct.size == features.size, "olsFitExact: duplicate features")
    require(lambda >= 0L, s"olsFitExact: negative ridge lambda $lambda")
    val d = features.size + 1
    val xs = features.map(f => col(f).cast("long")) :+ lit(1L)
    val y = col(yCol).cast("long")
    // upper triangle of XᵀX, Xᵀy, and yᵀy in ONE pass (partial-agg folds
    // map-side; the shuffle carries d(d+1)/2 + d + 2 numbers per task)
    val aggs =
      (for (i <- 0 until d; j <- i until d) yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")) ++
        (0 until d).map(i => sum(xs(i) * y).as(s"b_$i")) :+
        sum(y * y).as("yy") :+ count(lit(1)).as("n")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    require(n >= d, s"olsFitExact: need >= $d rows, got $n")
    def g(i: Int, j: Int): BigInt = {
      val base = BigInt(row.getAs[Long](if (i <= j) s"g_${i}_$j" else s"g_${j}_$i"))
      if (i == j && i < d - 1) base + BigInt(lambda) else base // ridge: skip intercept
    }
    val a = Vector.tabulate(d, d)((i, j) => g(i, j))
    val b = Vector.tabulate(d)(i => BigInt(row.getAs[Long](s"b_$i")))
    val yy = BigInt(row.getAs[Long]("yy"))
    val sy = b(d - 1) // Σy = Σ(1·y)
    val detA = det(a)
    require(detA != 0,
      "olsFitExact: singular design matrix (collinear features or constant column)")
    val nums = (0 until d).map(i => det(Vector.tabulate(d, d)((r, c) =>
      if (c == i) b(r) else a(r)(c))))
    // SSE·det = det·yᵀy − Σ det_i·b_i  (exact; ≥ 0 when λ = 0)
    val sseNum = detA * yy - nums.zip(b).map { case (ni, bi) => ni * bi }.sum
    val sstNum = BigInt(n) * yy - sy * sy
    ExactFit(n, detA, nums, sseNum, sstNum)
  }

  /** The fit as a one-row DataFrame in ppm fixed point (truncating
    * division, which is what both BigInt `/` and DuckDB HUGEINT `//` do):
    * n, ppm_<feature>..., ppm_intercept, r2_ppm. r2_ppm is NULL when the
    * target is constant (SST = 0). */
  def olsFitPpm(
      df: DataFrame,
      features: Seq[String],
      yCol: String,
      lambda: Long = 0L): DataFrame = {
    val fit = olsFitExact(df, features, yCol, lambda)
    val sDet = if (fit.det < 0) -1 else 1 // normalize so the denominator is positive
    val detPos = fit.det * sDet
    val ppms = fit.coefNums.map(num => truncDiv(num * sDet * 1000000L, detPos).toLong)
    val r2 = if (fit.sstNum == 0) null
      else java.lang.Long.valueOf(
        truncDiv((fit.sstNum * detPos - fit.sseNum * sDet * fit.n) * 1000000L,
          fit.sstNum * detPos).toLong)
    val names = features.map(f => s"ppm_$f") :+ "ppm_intercept"
    val schema = StructType(
      StructField("n", LongType, nullable = false) +:
        names.map(StructField(_, LongType, nullable = false)) :+
        StructField("r2_ppm", LongType, nullable = true))
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(Row.fromSeq(fit.n +: ppms :+ r2)), schema)
  }
}
