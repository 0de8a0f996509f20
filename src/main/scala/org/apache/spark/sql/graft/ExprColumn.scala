package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst `Expression` to a public `Column`.
  *
  * Spark 4 moved `Column` to the engine-agnostic sql-api module; the classic
  * engine's `ExpressionUtils.column` is the sanctioned conversion but is
  * `private[sql]`. Living inside `org.apache.spark.sql` (the usual pattern
  * for Spark-native libraries) lets graft's custom codegen expressions be
  * used on ANY session, instead of only sessions configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the extension
  * registration remains for SQL-text users.
  */
object ExprColumn {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge from a Catalyst `LogicalPlan` to a public `DataFrame` — the
  * classic engine's `Dataset.ofRows`, `private[sql]` for the same reason
  * as the expression bridge above. This is how graft's custom logical
  * nodes (e.g. `graft.plans.TopKPerGroup`) become user-facing frames. */
object PlanDataset {
  def apply(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a frame (for building nodes over its
    * resolved output attributes). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
}
