package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RankStats

/** Probability-calibration measurement and distribution-free prediction
  * intervals — the eval surface that pairs the isotonic CALIBRATOR
  * (q339): does a score column mean what it claims, and what threshold
  * gives a coverage guarantee?
  *
  * Both operators are census-shaped (one groupBy over buckets / distinct
  * residuals, windows over the census only) and exact-integer end-to-end,
  * so results hash-match across engines and partitionings.
  */
object Calibrate {

  /** Reliability bins + expected calibration error, exactly.
    *
    * Scores arrive in ppm (0..10⁶ — calibrated probabilities ×10⁶).
    * Bucket b = score div bucketWidthPpm; per (group, bucket):
    * n_b, pos_b, acc_ppm = pos_b·10⁶ div n_b, conf_ppm = Σscore div n_b
    * (the mean claimed probability). The ECE identity that keeps
    * everything integer: with w_b = n_b/n,
    *   ECE = Σ_b w_b·|acc_b − conf_b| = (Σ_b |pos_b·10⁶ − Σscore_b|) / (n·10⁶)
    * — the n_b denominators CANCEL, so ece_ppm = Σ_b|pos_b·10⁶ − Σscore_b|
    * div n with no intermediate rounding at all (the per-bucket acc/conf
    * columns are reported truncated, but the ECE itself is exact).
    * Returns the bin table; fold [[RankStats.withPpm]] over
    * (Σ|dev|, n) for the scalar — the catalog query does both. */
  def reliabilityBins(
      df: DataFrame,
      scorePpmCol: String,
      labelCol: String,
      bucketWidthPpm: Long,
      groupCols: Seq[String]): DataFrame = {
    require(bucketWidthPpm >= 1 && bucketWidthPpm <= 1000000L,
      s"reliabilityBins: bucketWidthPpm in [1,1e6], got $bucketWidthPpm")
    require(groupCols.nonEmpty,
      "reliabilityBins: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    df.select((gs :+
        expr(s"CAST($scorePpmCol AS BIGINT) div $bucketWidthPpm").as("bucket") :+
        col(scorePpmCol).cast("long").as("__ca_s") :+
        col(labelCol).as("__ca_l")): _*)
      .groupBy((gs :+ col("bucket")): _*)
      .agg(
        count(lit(1)).as("n_b"),
        sum(when(col("__ca_l"), 1L).otherwise(0L)).as("pos_b"),
        sum(col("__ca_s")).as("sum_score"))
      .withColumn("acc_ppm", expr("(pos_b * 1000000) div n_b"))
      .withColumn("conf_ppm", expr("sum_score div n_b"))
      .withColumn("abs_dev", abs(col("pos_b") * 1000000L - col("sum_score")))
  }

  /** Murphy decomposition of the Brier score — the WHY behind ECE's
    * one-number (Murphy, J. Appl. Meteor. 1973): over score bins b,
    *   Brier = Reliability − Resolution + Uncertainty,
    * reliability Σ_b w_b(conf_b − acc_b)² (calibration badness),
    * resolution Σ_b w_b(acc_b − ȳ)² (how much the bins actually separate),
    * uncertainty ȳ(1−ȳ). All four reported as per-row means in ppm²·10⁰
    * units — "upm2" = the squared-ppm scale (a perfect-calibration score
    * 250000 vs outcome 0/1 contributes (250000)² or (750000)²):
    *   brier_upm2 = Σ(score − y·10⁶)² div n                   (exact sum),
    *   rel_upm2   = (Σ_b (sum_b − 10⁶·pos_b)² div n_b) div n  (per-bin div),
    *   res_upm2   = (Σ_b (pos_b·n − pos·n_b)²·10¹² div (n_b·n²)) div n,
    *   unc_upm2   = pos·(n − pos)·10¹² div n²,
    * each per-bin quotient an exact integer function of its cell (the
    * Nelson–Aalen truncation contract). The identity Brier = Rel − Res +
    * Unc is exact when predictions are CONSTANT within each bin; with
    * real scores spread inside a bin the gap equals the within-bin score
    * variance (≤ bucketWidth²/4 ≈ bucketWidth²/12 for uniform spread) —
    * callers reading the decomposition should bin at the resolution they
    * calibrated at. DECIMAL(38,0) everywhere a square meets a count.
    * Returns (groupCols*, n, n_pos, brier_upm2, rel_upm2, res_upm2,
    * unc_upm2). */
  def brierDecomposition(
      df: DataFrame,
      scorePpmCol: String,
      labelCol: String,
      bucketWidthPpm: Long,
      groupCols: Seq[String]): DataFrame = {
    require(bucketWidthPpm >= 1 && bucketWidthPpm <= 1000000L,
      s"brierDecomposition: bucketWidthPpm in [1,1e6], got $bucketWidthPpm")
    require(groupCols.nonEmpty,
      "brierDecomposition: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val bins = df.select((gs :+
        expr(s"CAST($scorePpmCol AS BIGINT) div $bucketWidthPpm").as("__ca_b") :+
        col(scorePpmCol).cast("long").as("__ca_s") :+
        col(labelCol).as("__ca_l")): _*)
      .groupBy((gs :+ col("__ca_b")): _*)
      .agg(
        count(lit(1)).as("__ca_nb"),
        sum(when(col("__ca_l"), 1L).otherwise(0L)).as("__ca_pb"),
        sum(col("__ca_s")).as("__ca_sb"),
        sum((col("__ca_s") - when(col("__ca_l"), 1000000L).otherwise(0L))
          .cast("decimal(38,0)") *
          (col("__ca_s") - when(col("__ca_l"), 1000000L).otherwise(0L)))
          .as("__ca_bsq"))
    val totals = bins.groupBy(gs: _*)
      .agg(sum(col("__ca_nb")).as("n"), sum(col("__ca_pb")).as("n_pos"))
    bins.join(totals, groupCols)
      .withColumn("__ca_relt", Idiv(
        (col("__ca_sb") - lit(1000000L) * col("__ca_pb")).cast("decimal(38,0)") *
          (col("__ca_sb") - lit(1000000L) * col("__ca_pb")),
        col("__ca_nb")))
      .withColumn("__ca_rest", Idiv(
        (col("__ca_pb").cast("decimal(38,0)") * col("n") -
          col("n_pos").cast("decimal(38,0)") * col("__ca_nb")) *
          (col("__ca_pb").cast("decimal(38,0)") * col("n") -
            col("n_pos").cast("decimal(38,0)") * col("__ca_nb")) * 1000000000000L,
        col("__ca_nb").cast("decimal(38,0)") * col("n") * col("n")))
      .groupBy((gs :+ col("n") :+ col("n_pos")): _*)
      .agg(
        sum(col("__ca_bsq")).as("__ca_bsum"),
        sum(col("__ca_relt").cast("decimal(38,0)")).as("__ca_rsum"),
        sum(col("__ca_rest").cast("decimal(38,0)")).as("__ca_qsum"))
      .withColumn("brier_upm2", Idiv(col("__ca_bsum"), col("n")).cast("long"))
      .withColumn("rel_upm2", Idiv(col("__ca_rsum"), col("n")).cast("long"))
      .withColumn("res_upm2", Idiv(col("__ca_qsum"), col("n")).cast("long"))
      .withColumn("unc_upm2", Idiv(
        col("n_pos").cast("decimal(38,0)") * (col("n") - col("n_pos")) *
          1000000000000L,
        col("n").cast("decimal(38,0)") * col("n")).cast("long"))
      .drop("__ca_bsum", "__ca_rsum", "__ca_qsum")
  }

  /** Split-conformal interval radius + empirical coverage — the
    * distribution-free "how wrong is this model, with a guarantee"
    * primitive (Vovk; Lei et al. JASA'18). Rows carry an integer
    * nonconformity `residCol` (|y − ŷ| on whatever integer grid) and a
    * boolean `calCol` marking the CALIBRATION split. The radius is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual — a RANK PICK from
    * the residual census (the q261/q337 discipline: quantiles that must
    * hash-match are picks of exact integers, never interpolations);
    * coverage on the test split then counts residuals ≤ radius. Returns
    * per group: (n_cal, n_test, k_rank, qhat, coverage_ppm) where
    * coverage_ppm ≥ (1−α) in expectation by the conformal guarantee.
    * Census-shaped: residual census + one cumulative window + one
    * census-side pick, one broadcast-friendly join back to test counts. */
  def splitConformal(
      df: DataFrame,
      residCol: String,
      calCol: String,
      alphaPpm: Long,
      groupCols: Seq[String]): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      s"splitConformal: alphaPpm in (0,1e6), got $alphaPpm")
    require(groupCols.nonEmpty,
      "splitConformal: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val cal = df.filter(col(calCol))
    // k = ceil((n_cal + 1) * (1 - alpha)): exact integer ceil-div
    val sizes = cal.groupBy(gs: _*).agg(count(lit(1)).as("n_cal"))
      .withColumn("k_rank",
        expr(s"((n_cal + 1) * ${1000000L - alphaPpm} + 999999) div 1000000"))
    val census = cal
      .groupBy((gs :+ col(residCol).cast("long").as("__ca_r")): _*)
      .agg(count(lit(1)).as("__ca_c"))
    val wLe = Window.partitionBy(gs: _*).orderBy(col("__ca_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // qhat = smallest residual whose cumulative count reaches k; a group
    // whose k exceeds n_cal (tiny calibration set) has NO valid radius —
    // reported as NULL qhat, the honest refusal
    val qhat = census
      .withColumn("__ca_cum", sum(col("__ca_c")).over(wLe))
      .join(sizes, groupCols)
      .filter(col("__ca_cum") >= col("k_rank"))
      .groupBy(gs: _*)
      .agg(min(col("__ca_r")).as("qhat"))
    val test = df.filter(!col(calCol))
      .groupBy(gs: _*).agg(count(lit(1)).as("n_test"))
    val covered = df.filter(!col(calCol))
      .join(qhat, groupCols)
      .groupBy(gs: _*)
      .agg(sum(when(col(residCol).cast("long") <= col("qhat"), 1L).otherwise(0L))
        .as("__ca_cov"))
    sizes
      .join(qhat, groupCols, "left")
      .join(test, groupCols, "left")
      .join(covered, groupCols, "left")
      .transform(d => RankStats.withPpm(d, col("__ca_cov"), col("n_test"), "coverage_ppm"))
      .select((gs :+ col("n_cal") :+ col("n_test") :+ col("k_rank") :+
        col("qhat") :+ col("coverage_ppm")): _*)
  }
}
