package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-skyline (maximal-vector) selection — the multi-objective data
  * selection primitive: keep every row not dominated by another row
  * (dominated = some other row is at-least-as-good on BOTH objectives and
  * strictly better on at least one). The training-data framing: pick the
  * documents/configs on the quality-vs-cost frontier instead of thresholding
  * each axis independently.
  *
  * The 2-D skyline has a classical sort-based O(n log n) form (Börzsönyi
  * et al., ICDE '01 "The Skyline Operator", §3's sort-filter idea) that maps
  * onto relational ops with NO self-join:
  *
  *   1. collapse to one row per distinct x: `ymax(x) = max(y)` — a hash
  *      aggregate with map-side partial combine, so the window that follows
  *      sees |distinct x| rows, not n;
  *   2. prefix-scan the collapsed frame in x-order:
  *      `best_below(x) = max(ymax) over (order by x rows unbounded
  *      preceding .. 1 preceding)` — one range-partitioned sort of the
  *      (already tiny) distinct-x frame;
  *   3. a distinct x survives iff `ymax(x) > coalesce(best_below, −∞)`
  *      (any strictly-cheaper row with y' ≥ y dominates);
  *   4. join survivors back to the base (broadcast — the frontier of a
  *      monotone staircase is ≤ |distinct x| rows) and keep rows with
  *      `y = ymax(x)` (an equal-x row with strictly larger y dominates;
  *      exact (x, y) duplicates are mutually non-dominating and all kept).
  *
  * At 100 TB the full relation is touched exactly twice, both map-side
  * (the partial agg and the final broadcast-join filter); the only sort is
  * over distinct x values. The naive NOT-EXISTS spelling (the oracle) is a
  * quadratic self-join — fine for a few thousand rows in DuckDB, fatal at
  * scale.
  *
  * Orientation: minimizes `xCol`, maximizes `yCol`. Flip a sign in the
  * caller for other orientations.
  */
object Skyline {

  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df
      .groupBy(col(xCol))
      .agg(max(col(yCol)).as("__sky_ymax"))
    val scan = Window.orderBy(col(xCol)).rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__sky_best_below", max(col("__sky_ymax")).over(scan))
      .filter(col("__sky_best_below").isNull || col("__sky_ymax") > col("__sky_best_below"))
      .select(col(xCol).as("__sky_x"), col("__sky_ymax"))
    df.join(
        broadcast(frontier),
        col(xCol) === col("__sky_x") && col(yCol) === col("__sky_ymax"))
      .drop("__sky_x", "__sky_ymax")
  }
}
