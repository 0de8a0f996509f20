package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed computations over a GLOBAL total order — the primitive
  * behind deterministic sampling, budget fills, and rank statistics that
  * must never plan Spark's unpartitioned-window shape: `Window.orderBy`
  * without partitionBy exchanges EVERYTHING into one task (the q344
  * skewReport lesson — at row scale that single task is the scale-killer,
  * and the plan even LOOKS fine until you read the Exchange).
  *
  * The two-pass recipe (the skewReport census discipline, factored out):
  * `repartitionByRange` on the order (N concurrent range partitions),
  * per-partition running sums under a partitionBy window, plus a
  * broadcast per-partition offset — N numbers collected once, never rows.
  * The range-partitioned frame is pinned with CheckpointFresh so the
  * offset pass and the value pass see identical partition boundaries
  * (RangePartitioner samples; two executions could split differently).
  *
  * `orderBy` must be a TOTAL order (ties make any cumulative ambiguous —
  * same contract as the single-task spelling it replaces).
  */
object GlobalOrder {

  /** `out` = running sum of `value` over the global `orderBy` order,
    * inclusive of the current row. Appends `out` to the frame (temp
    * partition columns dropped); the returned frame is range-partitioned
    * and materialized. */
  def cumSum(
      df: DataFrame,
      orderBy: Seq[Column],
      value: Column,
      out: String,
      partitions: Int = 32): DataFrame = {
    require(orderBy.nonEmpty, "GlobalOrder.cumSum: empty orderBy")
    require(partitions >= 1, s"GlobalOrder.cumSum: partitions $partitions < 1")
    val spark = df.sparkSession
    import spark.implicits._
    val part = df
      .withColumn("__go_v", value.cast("long"))
      .repartitionByRange(partitions, orderBy: _*)
      .withColumn("__go_pid", spark_partition_id())
      .transform(org.apache.spark.sql.graft.CheckpointFresh.apply)
    val sums = part.groupBy(col("__go_pid")).agg(sum(col("__go_v")).as("__go_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.map(_._1)
      .zip(sums.scanLeft(0L)((acc, s) => acc + s._2).dropRight(1))
    val offDf = offsets.toSeq.toDF("__go_pid", "__go_off")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__go_pid")).orderBy(orderBy: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    part
      .withColumn("__go_local", sum(col("__go_v")).over(wLocal))
      .join(broadcast(offDf), Seq("__go_pid"))
      .withColumn(out, col("__go_local") + col("__go_off"))
      .drop("__go_pid", "__go_v", "__go_local", "__go_off")
  }
}
