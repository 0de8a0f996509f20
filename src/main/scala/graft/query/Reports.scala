package graft.query

import org.apache.spark.sql.DataFrame
import graft.core.Constants.ValueColumn
import graft.operators.Aggregation

/** Result reports (ref: dsgrid/query/report_peak_load.py:36-70). */
object Reports {

  /** Peak-load rows: for each group, the full row(s) where value peaks.
    * The reference computes groupBy+max then joins back (keeps ties); the
    * window form is a single shuffle and deterministic — callers choose. */
  def peakLoad(
      df: DataFrame,
      groupColumns: Seq[String],
      valueColumn: String = ValueColumn,
      keepTies: Boolean = false,
      tieBreak: Seq[String] = Nil): DataFrame =
    if (keepTies) Aggregation.peakRowsPerGroupAllTies(df, groupColumns, valueColumn)
    else Aggregation.peakRowsPerGroup(df, groupColumns, valueColumn, tieBreak)
}
