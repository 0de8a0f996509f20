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
