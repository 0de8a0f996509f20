package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clickstream/event-log analytics: first-order transition matrices and
  * seasonal-naive forecast monitoring. Both are window/aggregation
  * compositions keyed on (user, time) — one shuffle each, no iteration —
  * and both keep their derived metrics in FIXED-POINT integers so results
  * are bit-stable across engines and partitionings.
  */
object EventAnalytics {

  /** First-order Markov transition counts + fixed-point probabilities:
    * per user, events are ordered by (ts, tieCol) and each consecutive
    * pair (prev_type → cur_type) contributes one observation. Output per
    * ordered type pair: transition count and
    * `prob_ppm = (1e6 * count) div total-out-of-prev`.
    *
    * Scale shape: ONE shuffle on the user key for the lag window (per-user
    * sort only — never a global sort), then a map-side-partial aggregation
    * on the (prev, cur) pair; the per-prev totals come from re-aggregating
    * the pair counts (grouped rows, not events). The tie column makes the
    * within-user order total, so the pair multiset is deterministic even
    * with duplicate timestamps.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      scale: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("__graft_prev", lag(col(typeCol), 1).over(w))
      .filter(col("__graft_prev").isNotNull)
      .groupBy(col("__graft_prev").as("prev_type"), col(typeCol).as("cur_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("__graft_tot", sum(col("n")).over(totals))
      .select(
        col("prev_type"),
        col("cur_type"),
        col("n"),
        expr(s"($scale * n) div __graft_tot").as("prob_ppm"))
  }

  /** Seasonal-naive forecast error monitor: daily observation counts per
    * key over a DENSE date spine (missing days count 0 — a gap is real
    * signal, not absence of a row), forecast(d) = actual(d − period),
    * scored on every day with a defined forecast. Output per key:
    * days scored, total actual, total absolute error, and
    * `mae_ppm = (1e6 * Σ|err|) div Σ actual` (NULL when the actual total
    * is 0 — no volume to be wrong about).
    *
    * Scale shape: the raw events reduce to (key, day) counts FIRST
    * (map-side partials over the full volume), and everything after —
    * spine fill, lag, scoring — runs on keys × days rows only. The spine
    * bounds come from one global min/max aggregate (2 values broadcast,
    * not collected rows).
    */
  def seasonalNaiveError(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 1, s"seasonalNaiveError: period must be >= 1, got $period")
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .crossJoin(daily.select("key").distinct())
    val dense = spine
      .join(daily, Seq("key", "day"), "left")
      .withColumn("actual", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    dense
      .withColumn("fc", lag(col("actual"), period).over(w))
      .filter(col("fc").isNotNull)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("days_scored"),
        sum(col("actual")).as("total_actual"),
        sum(abs(col("actual") - col("fc"))).as("total_abs_err"))
      .withColumn(
        "mae_ppm",
        when(col("total_actual") > 0, expr("(1000000 * total_abs_err) div total_actual")))
  }
}
