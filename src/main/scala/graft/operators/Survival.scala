package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation in fixed-point log₂ — time-to-event
  * analysis with right censoring (churn curves, time-to-failure,
  * time-to-conversion; in a data pipeline: how long does a crawled source
  * keep yielding documents?). The estimator
  * S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) is a PRODUCT of rationals whose exact
  * numerators overflow immediately, so the engine-stable spelling is the
  * library's 1/16-resolution fixed-point floor-log₂ ([[Linkage.flog2fp]],
  * the q237/q90/q329 idiom): log₂S in sixteenths,
  * logs_fp16(t) = Σ_{t_i ≤ t, d_i > 0} (flog2fp(n_i − d_i) − flog2fp(n_i))
  * — a SUM of exact integers, bit-identical on both engines, monotone
  * nonincreasing like the true curve. S hits exactly 0 when some step has
  * n_i = d_i (everyone at risk fails); from that step on logs_fp16 is
  * NULL (−∞), propagated stickily.
  *
  * Scale shape: everything derives from the per-(group, time) census —
  * groupBy(time) counting events/censored, then at-risk counts and the
  * running log-sum ride TWO window passes over the census only (one row
  * per distinct time per group), never rows. The standard large-scale KM
  * recipe (quantize event times first; the census is the quantizer
  * contract, exactly like RankStats).
  */
object Survival {

  /** Per-group KM curve at each distinct EVENT time (d > 0; pure-censoring
    * times contribute to n but emit no row, the KM convention). Input rows
    * are one subject each: integer `timeCol` ≥ 0, boolean `eventCol`
    * (true = event, false = right-censored at that time). Returns
    * (groupCols*, t, n_risk, d_events, c_censored, logs_fp16) where
    * n_risk counts subjects with time ≥ t (censored-at-t subjects are at
    * risk AT t — the standard convention: censoring happens after the
    * day's events). */
  def kaplanMeierLog2(
      df: DataFrame,
      timeCol: String,
      eventCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "kaplanMeierLog2: empty groupCols would plan a single-task global " +
        "window — inject a literal constant group column for one curve")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(timeCol).cast("long").as("t")): _*)
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("d_events"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("c_censored"))
    val wSuffix = Window.partitionBy(gs: _*).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRun = Window.partitionBy(gs: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census
      .withColumn("n_risk",
        sum(col("d_events") + col("c_censored")).over(wSuffix))
      // per-step log contribution; NULL marks S = 0 (n = d at this step)
      .withColumn("__sv_step",
        when(col("d_events") === 0L, lit(0L))
          .otherwise(when(col("n_risk") > col("d_events"),
            Linkage.flog2fp(col("n_risk") - col("d_events")) -
              Linkage.flog2fp(col("n_risk")))))
      // sticky zero: once any step had n = d, the curve is 0 forever —
      // a plain SUM window would SKIP the null instead of propagating it
      .withColumn("__sv_dead",
        max(when(col("d_events") > 0L && col("n_risk") === col("d_events"), 1L)
          .otherwise(0L)).over(wRun))
      .withColumn("logs_fp16",
        when(col("__sv_dead") === 1L, lit(null).cast("long"))
          .otherwise(sum(col("__sv_step")).over(wRun)))
      .filter(col("d_events") > 0L)
      .drop("__sv_step", "__sv_dead")
  }

  /** Nelson–Aalen cumulative hazard in micro units — the SUM-form partner
    * of [[kaplanMeierLog2]]'s product form (H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ; the
    * preferred estimator when hazard is the quantity of interest). Each
    * step contributes hazard_step_micro = dᵢ·10⁶ div nᵢ — a per-step
    * truncating division of exact census integers, deterministic and
    * engine-replayable (true rationals would need unbounded fractions;
    * per-step micro truncation is the documented contract, error < 1 micro
    * per step). Same census shape as KM: everything rides the per-(group,
    * time) census, two windows over it, never rows. Returns
    * (groupCols*, t, n_risk, d_events, hazard_step_micro, chaz_micro)
    * at each event time (d > 0). */
  def nelsonAalenMicro(
      df: DataFrame,
      timeCol: String,
      eventCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "nelsonAalenMicro: empty groupCols would plan a single-task global " +
        "window — inject a literal constant group column for one curve")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(timeCol).cast("long").as("t")): _*)
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("d_events"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("__sv_c"))
    val wSuffix = Window.partitionBy(gs: _*).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRun = Window.partitionBy(gs: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census
      .withColumn("n_risk", sum(col("d_events") + col("__sv_c")).over(wSuffix))
      .withColumn("hazard_step_micro",
        org.apache.spark.sql.graft.Idiv(col("d_events") * 1000000L, col("n_risk")))
      .withColumn("chaz_micro", sum(col("hazard_step_micro")).over(wRun))
      .filter(col("d_events") > 0L)
      .drop("__sv_c")
  }

  /** Log-rank test per group — are two survival curves the same (Mantel
    * 1966; the standard A/B readout over time-to-event metrics)? Per event
    * time with d total events, n at risk, n₁ at risk in side A:
    * observed O₁ = Σ d₁, expected E₁ = Σ d·n₁/n, variance
    * V = Σ d·(n₁/n)·(n₂/n)·(n−d)/(n−1) — each time's E/V term is a
    * truncating micro/upm division of exact census integers (the
    * Nelson–Aalen per-step contract; times with n = 1 contribute zero
    * variance). χ² = (O₁−E₁)²/V emitted as chi2_upm with the micro scales
    * cancelling exactly: (o1·10⁶ − e1_micro)² div v_upm; 5% significance
    * decided by the exact rational 25·(O−E)² ≥ 96·V, i.e.
    * 25·(o1·10⁶ − e1_micro)² ≥ 96·10⁶·v_upm (the q210 idiom). `sideCol`
    * must take the two values sideA/sideB (others refuse loudly — a third
    * arm would silently bias n). Returns (groupCols*, n_a, n_b, o1,
    * e1_micro, v_upm, chi2_upm, significant), with n_a/n_b the at-risk
    * counts AT THE FIRST EVENT TIME (the test's own n; subjects censored
    * before any event never enter a term). */
  def logRank(
      df: DataFrame,
      timeCol: String,
      eventCol: String,
      sideCol: String,
      sideA: String,
      sideB: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "logRank: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.Idiv
    require(df.filter(!col(sideCol).isin(sideA, sideB)).isEmpty,
      s"logRank: sideCol '$sideCol' carries values beyond '$sideA'/'$sideB' — " +
        "filter to the two arms first (silent exclusion would bias the at-risk sets)")
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(timeCol).cast("long").as("t")): _*)
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("__sv_d"),
        sum(when(col(eventCol) && col(sideCol) === sideA, 1L).otherwise(0L))
          .as("__sv_d1"),
        count(lit(1)).as("__sv_all"),
        sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("__sv_all1"))
    val wSuffix = Window.partitionBy(gs: _*).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = census
      .withColumn("__sv_n", sum(col("__sv_all")).over(wSuffix))
      .withColumn("__sv_n1", sum(col("__sv_all1")).over(wSuffix))
      .filter(col("__sv_d") > 0L)
      .withColumn("__sv_e1",
        Idiv(col("__sv_d").cast("decimal(38,0)") * col("__sv_n1") * 1000000L,
          col("__sv_n")).cast("long"))
      .withColumn("__sv_v",
        when(col("__sv_n") <= 1L, lit(0L)).otherwise(Idiv(
          col("__sv_d").cast("decimal(38,0)") * col("__sv_n1") *
            (col("__sv_n") - col("__sv_n1")) * (col("__sv_n") - col("__sv_d")) *
            1000000L,
          col("__sv_n").cast("decimal(38,0)") * col("__sv_n") * (col("__sv_n") - 1L))
          .cast("long")))
    terms
      .groupBy(gs: _*)
      .agg(
        max(col("__sv_n1")).as("n_a"),
        (max(col("__sv_n")) - max(col("__sv_n1"))).as("n_b"),
        sum(col("__sv_d1")).as("o1"),
        sum(col("__sv_e1")).as("e1_micro"),
        sum(col("__sv_v")).as("v_upm"))
      .withColumn("__sv_dev", col("o1") * 1000000L - col("e1_micro"))
      .withColumn("chi2_upm",
        when(col("v_upm") === 0L, lit(null).cast("long"))
          .otherwise(Idiv(col("__sv_dev").cast("decimal(38,0)") * col("__sv_dev"),
            col("v_upm")).cast("long")))
      .withColumn("significant",
        coalesce(lit(25L) * col("__sv_dev").cast("decimal(38,0)") * col("__sv_dev") >=
          lit(96000000L) * col("v_upm").cast("decimal(38,0)") && col("v_upm") > 0L,
          lit(false)))
      .drop("__sv_dev")
  }
}
