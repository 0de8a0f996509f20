package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — turning an event/update
  * stream into validity-interval rows (SCD type 2), the standard shape for
  * dimension tables that change over time.
  *
  * The algorithm is gaps-and-islands: per key, order the observations,
  * flag rows where the tracked value differs from its predecessor
  * (`lag`), turn the flags into island ids with a running sum, and
  * collapse each island to one row with `valid_from` = its first
  * observation and `valid_to` = the next island's start (NULL for the
  * current row — the open interval).
  *
  * Scale design: everything is window functions over ONE
  * `partitionBy(key) orderBy(ts)` sort — Catalyst runs the lag, the
  * running sum, and the final lead over the same shuffle/sort (one
  * exchange total, spec-asserted); the island collapse is a groupBy on
  * (key, island) which reuses the same hash partitioning. No self-joins,
  * no driver-side state; keys are independent so 100 TB of history
  * parallelizes by key.
  */
object History {

  /** Compress an observation stream to SCD2 validity intervals.
    *
    * Ties on `orderCol` within a key are broken by `tieBreak` columns —
    * REQUIRED to cover the ordering fully, or lag/lead are
    * non-deterministic under partitioning (same rule as every windowed
    * operator here).
    *
    * Output: key columns, `valueCol`, `valid_from`, `valid_to` (same type
    * as `orderCol`; NULL `valid_to` = current), `n_observations`.
    */
  def scd2(
      df: DataFrame,
      keyColumns: Seq[String],
      orderColumn: String,
      valueColumn: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyColumns.nonEmpty, "scd2: at least one key column")
    val ord = (orderColumn +: tieBreak).map(col)
    val w = Window.partitionBy(keyColumns.map(col): _*).orderBy(ord: _*)
    val flagged = df
      .withColumn("__graft_prev", lag(col(valueColumn), 1).over(w))
      // null-safe inequality: a NULL tracked value is a real state
      .withColumn("__graft_chg",
        when(col(valueColumn) <=> col("__graft_prev"), lit(0L)).otherwise(lit(1L)))
      .withColumn("__graft_island",
        sum(col("__graft_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = flagged
      .groupBy((keyColumns.map(col) :+ col("__graft_island")): _*)
      .agg(
        first(col(valueColumn)).as(valueColumn),
        min(col(orderColumn)).as("valid_from"),
        count(lit(1)).as("n_observations"))
    val wIsl = Window.partitionBy(keyColumns.map(col): _*).orderBy(col("valid_from"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wIsl))
      .select((keyColumns.map(col) ++ Seq(
        col(valueColumn), col("valid_from"), col("valid_to"),
        col("n_observations").cast("long").as("n_observations"))): _*)
  }
}
