package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Constants.ValueColumn

/** Pivot / unpivot between the stacked internal format and pivoted output
  * (ref: dsgrid/spark/functions.py:522-575; null-preserving unpivot
  * dsgrid/utils/dataset.py:761-780). Internal processing is always stacked;
  * pivot happens only at output time (query_submitter.py:992-994). */
object Reshape {

  /** Stacked → one column per record of the pivoted dimension, sum(value).
    * `values` fixes the output columns (skips the extra distinct scan Spark
    * needs otherwise and keeps output schema deterministic). */
  def pivot(
      df: DataFrame,
      pivotColumn: String,
      values: Seq[String] = Nil,
      valueColumn: String = ValueColumn): DataFrame = {
    val ids = df.columns.filterNot(c => c == pivotColumn || c == valueColumn)
    val grouped = df.groupBy(ids.map(col): _*)
    val p = if (values.nonEmpty) grouped.pivot(pivotColumn, values) else grouped.pivot(pivotColumn)
    p.sum(valueColumn)
  }

  /** Pivoted columns → (`variable`, `value`) rows. */
  def unpivot(
      df: DataFrame,
      idColumns: Seq[String],
      valueColumns: Seq[String],
      variableColumnName: String,
      valueColumnName: String = ValueColumn): DataFrame =
    df.unpivot(idColumns.map(col).toArray, valueColumns.map(col).toArray, variableColumnName, valueColumnName)

  /** Null-preserving unpivot: the reference splits rows whose value columns
    * are all-null (expected-missing associations carried as NULL-timestamp
    * rows), unpivots the rest, then re-attaches the null rows with a null
    * value (ref: dsgrid/utils/dataset.py:761-780). */
  def unpivotPreservingNulls(
      df: DataFrame,
      idColumns: Seq[String],
      valueColumns: Seq[String],
      variableColumnName: String,
      valueColumnName: String = ValueColumn): DataFrame = {
    val allNull = valueColumns.map(col(_).isNull).reduce(_ && _)
    val nullRows = df.filter(allNull)
    val rest = df.filter(!allNull)
    val unpivoted = unpivot(rest, idColumns, valueColumns, variableColumnName, valueColumnName)
    val nullAttached = nullRows
      .select(idColumns.map(col): _*)
      .withColumn(variableColumnName, explode(array(valueColumns.map(lit): _*)))
      .withColumn(valueColumnName, lit(null).cast("double"))
    unpivoted.unionByName(nullAttached)
  }
}
