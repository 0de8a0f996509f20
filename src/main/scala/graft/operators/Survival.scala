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
}
