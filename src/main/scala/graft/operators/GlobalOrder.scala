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
    // NULL weights must replicate the single-task window-sum semantics this
    // replaces exactly: SUM skips nulls but is NULL while ZERO non-null
    // values have occurred so far — so the offset pass carries both the
    // per-partition sum (NULL-as-0, also the NPE guard the r13 advice
    // flagged) and the per-partition non-null COUNT, and a row is NULL iff
    // its global running non-null count is still zero. A partition whose
    // local prefix is all-NULL would otherwise emit NULL even though
    // earlier partitions contributed (local NULL + offset = NULL).
    val sums = part.groupBy(col("__go_pid"))
      .agg(sum(col("__go_v")).as("__go_s"), count(col("__go_v")).as("__go_c"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = sums.map(_._1)
      .zip(sums.scanLeft((0L, 0L)) { case ((accS, accC), (_, s, c)) =>
        (accS + s, accC + c) }.dropRight(1))
      .map { case (pid, (offS, offC)) => (pid, offS, offC) }
    val offDf = offsets.toSeq.toDF("__go_pid", "__go_off", "__go_offc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__go_pid")).orderBy(orderBy: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    part
      .withColumn("__go_local", sum(col("__go_v")).over(w))
      .withColumn("__go_localc", count(col("__go_v")).over(w))
      .join(broadcast(offDf), Seq("__go_pid"))
      .withColumn(out,
        when(col("__go_localc") + col("__go_offc") === 0L, lit(null).cast("long"))
          .otherwise(coalesce(col("__go_local"), lit(0L)) + col("__go_off")))
      .drop("__go_pid", "__go_v", "__go_local", "__go_localc", "__go_off", "__go_offc")
  }
}
