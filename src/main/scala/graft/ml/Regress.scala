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
  * coefficients come back as truncating-division ppm fixed-point
  * rationals, so the result is bit-identical under any partitioning and
  * replayable in oracle SQL (HUGEINT `//` — truncates toward zero exactly
  * like BigInt `/`, measured r12). No gradient iterations, no float
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

  /** Isotonic regression (PAVA's result, no sequential pooling) — the
    * probability-calibration operator (isotonic calibration of classifier
    * scores, dose-response monotonization): the L2 nondecreasing fit at
    * position i is the MINIMAX f(i) = max_{j≤i} min_{k≥i} avg(y[j..k])
    * (Robertson/Wright/Dykstra §1.2), which distributes as two window
    * passes over the position-pair table — no driver loop, no sequential
    * PAVA state.
    *
    * Exactness: interval averages are rationals; the fit is reported in
    * ppm via floor((num·10⁶) div den) — and because floor is monotone it
    * COMMUTES with min and max, so fit_ppm is EXACTLY floor(10⁶·f_true):
    * no float enters the pipeline at all, both engines agree bit-for-bit,
    * and the output is still provably nondecreasing. Contract: y ≥ 0
    * (validated — floor-div of negative numerators would differ from the
    * true floor) and Σy per group ≤ ~9·10¹² (BIGINT headroom for ·10⁶).
    *
    * Scale: positions = DISTINCT x per group (quantize scores first —
    * calibration bins, not raw floats); the pair table is positions² per
    * group, window passes are pair-table-sized. Rows only touch the
    * census. Returns (groupCols*, x, n_x, fit_ppm). */
  def isotonicFitPpm(
      df: DataFrame,
      xCol: String, yCol: String,
      groupCols: Seq[String],
      maxPositions: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty,
      "isotonicFitPpm: empty groupCols would make the position pair " +
        "self-join an implicit cross join — inject a literal constant " +
        "group column for a whole-table calibration")
    val gs = groupCols.map(col)
    require(df.select(min(col(yCol))).head().get(0) match {
      case null => true
      case v => v.toString.toDouble >= 0
    }, "isotonicFitPpm: y must be >= 0 (floor-division exactness contract)")
    val census = df
      .groupBy((gs :+ col(xCol).as("__iso_x")): _*)
      .agg(count(lit(1)).as("__iso_n"), sum(col(yCol).cast("long")).as("__iso_s"))
      .localCheckpoint(true) // feeds the pair self-join twice
    val posCounts = census.groupBy(gs: _*).agg(count(lit(1)).as("__iso_p"))
    val tooWide = posCounts.filter(col("__iso_p") > maxPositions).limit(1).collect()
    require(tooWide.isEmpty,
      s"isotonicFitPpm: a group has > $maxPositions distinct x positions — " +
        "quantize the score axis first (the pair table is positions² per group)")
    val wOrd = Window.partitionBy(gs: _*).orderBy(col("__iso_x"))
    val pos = census
      .withColumn("__iso_r", row_number().over(wOrd))
      // cumulative columns get DISTINCT names, not case variants — Spark
      // resolves identifiers case-insensitively and __iso_s/__iso_S would
      // silently alias (the round-10 q291 lesson, re-learned here)
      .withColumn("__iso_cs", sum(col("__iso_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__iso_cn", sum(col("__iso_n")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__iso_PS", coalesce(sum(col("__iso_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__iso_PN", coalesce(sum(col("__iso_n")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val aJ = pos.select((gs :+ col("__iso_r").as("__iso_j") :+
      col("__iso_PS") :+ col("__iso_PN")): _*)
    val bK = pos.select((gs :+ col("__iso_r").as("__iso_k") :+ col("__iso_x") :+
      col("__iso_n") :+ col("__iso_cs") :+ col("__iso_cn")): _*)
    // greatest(den, 1): rows with j > k never SURVIVE the filter, but ANSI
    // division can still evaluate on them inside the joined stage before
    // the predicate lands — a semantically-free guard, not a semantics
    val pairs = aJ.join(bK, groupCols)
      .filter(col("__iso_j") <= col("__iso_k"))
      .withColumn("__iso_key", expr(
        "((__iso_cs - __iso_PS) * 1000000) div greatest(__iso_cn - __iso_PN, 1)"))
    // suffix-min over k' >= k per (group, j): ordered by k DESC, the
    // running min at row (j, k) is exactly min_{k' >= k} avg(j, k')
    val wSuf = Window.partitionBy((gs :+ col("__iso_j")): _*)
      .orderBy(col("__iso_k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairs
      .withColumn("__iso_mk", min(col("__iso_key")).over(wSuf))
      .groupBy((gs :+ col("__iso_k") :+ col("__iso_x").as(xCol) :+
        col("__iso_n").as("n_x")): _*)
      .agg(max(col("__iso_mk")).as("fit_ppm")) // max over j <= k
      .drop("__iso_k")
  }

  /** Post-stratified average treatment effect — the confounding-aware A/B
    * readout when arm assignment correlates with a known stratum (rollout
    * by region, traffic mix shift mid-experiment): the naive arm-mean
    * difference mixes the treatment effect with the strata's baseline
    * differences; post-stratification takes the WITHIN-stratum arm
    * difference and averages it weighted by stratum size,
    *   ATE = Σ_s N_s·(ȳ_B,s − ȳ_A,s) / Σ_s N_s.
    * Exact chain: per-stratum means truncate in micro, the weighted fold
    * rides DECIMAL(38,0), the final division is sign-magnitude. Strata
    * missing an arm are DROPPED (no within-stratum contrast exists) and
    * excluded from the weights — n_strata_used/n_used report the cut.
    * The unadjusted difference over the SAME kept strata is returned
    * beside it; the gap between the two is the measured confounding.
    * Returns (groupCols*, n_strata_used, n_used, naive_diff_micro,
    * ate_micro). */
  def postStratifiedAte(
      df: DataFrame,
      yCol: String, armCol: String, armA: String, armB: String,
      stratumCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "postStratifiedAte: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val cells = df
      .filter(col(armCol).isin(armA, armB))
      .groupBy((gs :+ col(stratumCol).as("__ps_s")): _*)
      .agg(
        sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("__ps_na"),
        sum(when(col(armCol) === armA, col(yCol).cast("long")).otherwise(0L))
          .as("__ps_ya"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("__ps_nb"),
        sum(when(col(armCol) === armB, col(yCol).cast("long")).otherwise(0L))
          .as("__ps_yb"))
      .filter(col("__ps_na") > 0L && col("__ps_nb") > 0L)
      .withColumn("__ps_dy",
        Idiv(col("__ps_yb") * 1000000L, col("__ps_nb")) -
          Idiv(col("__ps_ya") * 1000000L, col("__ps_na")))
      .withColumn("__ps_w", col("__ps_na") + col("__ps_nb"))
    def signMag(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0, lit(null).cast("long")).otherwise(
        (when(num < 0, -1L).otherwise(1L) * Idiv(abs(num), den)).cast("long"))
    cells
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_strata_used"),
        sum(col("__ps_w")).as("n_used"),
        sum(col("__ps_na")).as("__ps_tna"),
        sum(col("__ps_ya")).as("__ps_tya"),
        sum(col("__ps_nb")).as("__ps_tnb"),
        sum(col("__ps_yb")).as("__ps_tyb"),
        sum(col("__ps_w").cast("decimal(38,0)") * col("__ps_dy")).as("__ps_wd"))
      .withColumn("naive_diff_micro",
        Idiv(col("__ps_tyb") * 1000000L, col("__ps_tnb")) -
          Idiv(col("__ps_tya") * 1000000L, col("__ps_tna")))
      .withColumn("ate_micro",
        signMag(col("__ps_wd"), col("n_used").cast("decimal(38,0)")))
      .drop("__ps_tna", "__ps_tya", "__ps_tnb", "__ps_tyb", "__ps_wd")
  }

  /** CUPED variance reduction (Deng/Xu/Kohavi/Walker WSDM'13) — the
    * standard A/B readout adjustment: remove the part of the metric Y
    * predicted by a PRE-experiment covariate X, so arm means are compared
    * on Y − θ(X − X̄) with θ = cov(X,Y)/var(X) fit on the pooled data.
    * Randomization makes the adjustment unbiased for any θ; the variance
    * drop is cor². Exact-integer spelling: one pooled moment pass in
    * DECIMAL(38,0) gives θ_ppm = (n·Σxy − Σx·Σy)·10⁶ div (n·Σxx − Σx²)
    * sign-magnitude; per arm, means in micro units via truncating div,
    * adjusted mean = mean_y_micro − θ_ppm·(mean_x_micro − x̄_micro) div 10⁶
    * — a fixed-order integer chain both engines replay bit-for-bit.
    * Returns one row per (groupCols*, arm): (n, mean_y_micro,
    * mean_x_micro, theta_ppm, adj_mean_micro); θ_ppm NULL (adjusted =
    * raw) when X is constant. */
  def cuped(
      df: DataFrame,
      yCol: String, xCol: String, armCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "cuped: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val d = df.select((gs :+ col(armCol).as("arm") :+
      col(yCol).cast("long").as("__cu_y") :+ col(xCol).cast("long").as("__cu_x")): _*)
    val pooled = d.groupBy(gs: _*)
      .agg(
        count(lit(1)).as("__cu_n"),
        sum(col("__cu_x")).as("__cu_sx"),
        sum(col("__cu_y")).as("__cu_sy"),
        sum(col("__cu_x").cast("decimal(38,0)") * col("__cu_x")).as("__cu_sxx"),
        sum(col("__cu_x").cast("decimal(38,0)") * col("__cu_y")).as("__cu_sxy"))
      .withColumn("__cu_varn",
        col("__cu_n") * col("__cu_sxx") - col("__cu_sx").cast("decimal(38,0)") *
          col("__cu_sx"))
      .withColumn("__cu_covn",
        col("__cu_n") * col("__cu_sxy") - col("__cu_sx").cast("decimal(38,0)") *
          col("__cu_sy"))
      .withColumn("theta_ppm",
        when(col("__cu_varn") === 0, lit(null).cast("long"))
          .otherwise((when(col("__cu_covn") < 0, -1L).otherwise(1L) *
            Idiv(abs(col("__cu_covn")) * 1000000L, col("__cu_varn"))).cast("long")))
      .withColumn("__cu_xbar", Idiv(col("__cu_sx") * 1000000L, col("__cu_n")))
    val arms = d.groupBy((gs :+ col("arm")): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__cu_y")).as("__cu_ay"),
        sum(col("__cu_x")).as("__cu_ax"))
      .withColumn("mean_y_micro", Idiv(col("__cu_ay") * 1000000L, col("n")))
      .withColumn("mean_x_micro", Idiv(col("__cu_ax") * 1000000L, col("n")))
    arms.join(
        pooled.select((gs :+ col("theta_ppm") :+ col("__cu_xbar")): _*), groupCols)
      .withColumn("adj_mean_micro",
        when(col("theta_ppm").isNull, col("mean_y_micro")).otherwise(
          // sign via XOR of the factors' signs (a long product could
          // overflow under ANSI before the decimal branch ever runs)
          col("mean_y_micro") - (when(
            (col("theta_ppm") < 0L) =!= (col("mean_x_micro") < col("__cu_xbar")) &&
              col("theta_ppm") =!= 0L && col("mean_x_micro") =!= col("__cu_xbar"), -1L)
            .otherwise(1L) *
            Idiv(abs(col("theta_ppm").cast("decimal(38,0)") *
              (col("mean_x_micro") - col("__cu_xbar"))), lit(1000000L))
            .cast("long"))))
      .select((gs :+ col("arm") :+ col("n") :+ col("mean_y_micro") :+
        col("mean_x_micro") :+ col("theta_ppm") :+ col("adj_mean_micro")): _*)
  }

  /** Hash-derandomized permutation test per group — the assumption-free
    * A/B significance check beside CUPED/post-stratification: is the
    * observed arm mean difference larger than what `reps` random
    * relabelings produce? Randomness is DERANDOMIZED (the library's
    * content-keyed sampling discipline): rep i relabels row `key` to arm
    * A iff h² mod M < M/2 where h = ((key mod M)·2654435761 +
    * i·48271 + 1) mod M, M = 2³¹−1 — reproducible across runs,
    * partitionings, and engines, so the oracle replays every rep exactly.
    * The SQUARE is load-bearing: without it two reps' h differ by the
    * CONSTANT i·48271, so every "relabeling" is an interval shift of one
    * base draw and all reps pick near-identical subsets (measured: two
    * null groups pinned at the 1/65 floor on real data); squaring turns
    * the constant offset into the row-dependent 2·h·d + d²,
    * decorrelating reps — nulls then spread over 0.1–0.8 the way a
    * permutation distribution should (checked against live data before
    * shipping, the q374 discipline). ANSI-safe: h < 2³¹ so h² < 2⁶². The mean-difference
    * comparison is a pure integer cross-multiplication
    *   |SA_i·nB_i − SB_i·nA_i| · (nA·nB)  ≥  |SA·nB − SB·nA| · (nA_i·nB_i)
    * in DECIMAL(38,0) — no division anywhere; a rep that lands every row
    * on one side counts as extreme (conservative, vanishing for n ≫ 1).
    * p_ppm = (1 + #extreme)·10⁶ div (reps + 1), the add-one convention —
    * the floor is 10⁶/(reps+1), so pick reps for the α you need.
    *
    * Scale shape: one row-linear explode to reps copies with map-side
    * partial aggregation into a (group, rep) census — no shuffles beyond
    * one census groupBy, reps a small constant. Rows whose arm is
    * neither `armA` nor `armB` are ignored. */
  def permutationTestHashed(
      df: DataFrame,
      idCol: String, yCol: String,
      armCol: String, armA: String, armB: String,
      groupCols: Seq[String],
      reps: Int = 64): DataFrame = {
    require(groupCols.nonEmpty,
      "permutationTestHashed: empty groupCols — inject a literal constant group column")
    require(reps >= 1, s"permutationTestHashed: reps must be >= 1, got $reps")
    import org.apache.spark.sql.graft.Idiv
    val M = 2147483647L
    val gs = groupCols.map(col)
    val d = df
      .filter(col(armCol).isin(armA, armB))
      .select((gs :+ pmod(col(idCol).cast("long"), lit(M)).as("__pt_k") :+
        (col(armCol) === armA).as("__pt_a") :+ col(yCol).cast("long").as("__pt_v")): _*)
    val obs = d.groupBy(gs: _*).agg(
      sum(when(col("__pt_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__pt_a"), col("__pt_v")).otherwise(0L)).as("__pt_sa"),
      sum(when(!col("__pt_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__pt_a"), col("__pt_v")).otherwise(0L)).as("__pt_sb"))
    val perRep = d
      .select((gs :+ col("__pt_k") :+ col("__pt_v") :+
        explode(sequence(lit(0L), lit(reps.toLong - 1L))).as("__pt_i")): _*)
      .withColumn("__pt_h",
        pmod(col("__pt_k") * 2654435761L + col("__pt_i") * 48271L + 1L, lit(M)))
      .withColumn("__pt_pick", pmod(col("__pt_h") * col("__pt_h"), lit(M)) < lit(M / 2))
      .groupBy((gs :+ col("__pt_i")): _*)
      .agg(
        sum(when(col("__pt_pick"), 1L).otherwise(0L)).as("__pt_nai"),
        sum(when(col("__pt_pick"), col("__pt_v")).otherwise(0L)).as("__pt_sai"),
        count(lit(1)).as("__pt_ni"),
        sum(col("__pt_v")).as("__pt_si"))
    perRep.join(obs, groupCols)
      .withColumn("__pt_nbi", col("__pt_ni") - col("__pt_nai"))
      .withColumn("__pt_sbi", col("__pt_si") - col("__pt_sai"))
      .withColumn("__pt_extreme",
        when(col("__pt_nai") === 0L || col("__pt_nbi") === 0L, 1L).otherwise(
          when(
            abs(col("__pt_sai").cast("decimal(38,0)") * col("__pt_nbi") -
              col("__pt_sbi").cast("decimal(38,0)") * col("__pt_nai")) *
              (col("n_a").cast("decimal(38,0)") * col("n_b")) >=
              abs(col("__pt_sa").cast("decimal(38,0)") * col("n_b") -
                col("__pt_sb").cast("decimal(38,0)") * col("n_a")) *
                (col("__pt_nai").cast("decimal(38,0)") * col("__pt_nbi")),
            1L).otherwise(0L)))
      .groupBy(gs: _*)
      .agg(
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("__pt_sa").cast("decimal(38,0)") * col("n_b") -
          col("__pt_sb").cast("decimal(38,0)") * col("n_a")).cast("long")).as("t_num"),
        sum(col("__pt_extreme")).as("n_extreme"))
      .withColumn("p_ppm",
        Idiv((lit(1L) + col("n_extreme")).cast("decimal(38,0)") * 1000000L,
          lit(reps.toLong + 1L)).cast("long"))
  }
}
