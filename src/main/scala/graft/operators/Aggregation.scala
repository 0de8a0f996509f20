package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time aggregation: groupBy user-chosen columns, apply a whitelisted
  * aggregation to the value column (ref: dsgrid/dataset/unpivoted_table.py:31-109,
  * name validation dsgrid/query/models.py:64-76). The whitelist is an open
  * registry so extension operators can add their own aggregators. */
object Aggregation {

  type AggFn = Column => Column

  /** Built-in aggregation functions by name, mirroring the reference's use of
    * pyspark.sql.functions names. All are codegen'd built-ins. */
  val builtins: Map[String, AggFn] = Map(
    "sum" -> sum,
    "max" -> max,
    "min" -> min,
    "mean" -> avg,
    "avg" -> avg,
    "count" -> count,
    "count_distinct" -> (c => countDistinct(c)),
    "approx_count_distinct" -> (c => approx_count_distinct(c)),
    "stddev" -> stddev,
    "variance" -> variance,
    "median" -> median,
    "first" -> (c => first(c, ignoreNulls = true)),
    "collect_list" -> collect_list,
    "collect_set" -> collect_set)

  def resolve(name: String, registry: Map[String, AggFn] = builtins): AggFn =
    registry.getOrElse(name, throw new IllegalArgumentException(s"aggregation not allowed: $name"))

  /** groupBy + single agg over the value column. */
  def aggregate(
      df: DataFrame,
      groupColumns: Seq[String],
      aggName: String,
      valueColumn: String = graft.core.Constants.ValueColumn,
      as: Option[String] = None): DataFrame = {
    val fn = resolve(aggName)
    df.groupBy(groupColumns.map(col): _*)
      .agg(fn(col(valueColumn)).as(as.getOrElse(valueColumn)))
  }

  /** groupBy + several named aggs: Seq of (aggName, inputCol, outputCol). */
  def aggregateMany(df: DataFrame, groupColumns: Seq[String], aggs: Seq[(String, String, String)]): DataFrame = {
    val exprs = aggs.map { case (fn, in, out) => resolve(fn)(col(in)).as(out) }
    df.groupBy(groupColumns.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Peak rows per group: the reference computes groupBy+max then joins back
    * to recover the full peak rows (report_peak_load.py:36-70). The window
    * form is a single shuffle and is what we use; ties are broken
    * deterministically by the ordering columns so results are stable.
    */
  def peakRowsPerGroup(
      df: DataFrame,
      groupColumns: Seq[String],
      valueColumn: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = desc(valueColumn) +: tieBreak.map(asc)
    val w = Window.partitionBy(groupColumns.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** The reference's agg+join-back peak form (keeps ALL tied peak rows) —
    * semantics-exact variant for oracle comparison. */
  def peakRowsPerGroupAllTies(df: DataFrame, groupColumns: Seq[String], valueColumn: String): DataFrame = {
    val peaks = df
      .groupBy(groupColumns.map(col): _*)
      .agg(max(col(valueColumn)).as(valueColumn))
    df.join(peaks, groupColumns :+ valueColumn, "left_semi")
  }

  /** Validation: every group has the same count (used for identical-length
    * time arrays, ref: dataset_schema_handler_base.py:430-452). */
  def groupsHaveEqualCounts(df: DataFrame, groupColumns: Seq[String]): Boolean = {
    val counts = df.groupBy(groupColumns.map(col): _*).count().select("count").distinct()
    counts.limit(2).count() <= 1
  }
}

/** Set operations (thin wrappers; ref: dsgrid/spark/functions.py:156-205,
  * dataset_expression_handler.py:59-68). */
object SetOps {
  def union(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)
  def exceptAll(a: DataFrame, b: DataFrame): DataFrame = a.exceptAll(b)
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
}
