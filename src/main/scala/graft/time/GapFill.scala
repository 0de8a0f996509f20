package graft.time

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling: bucket events onto a fixed grid, materialize the
  * full (key × bucket) spine, and impute empty buckets with the last
  * observed value (LOCF — last observation carried forward). The metric is a
  * COUNT (exact integer) so imputed values are engine-deterministic;
  * leading gaps (no prior observation) stay NULL — imputing them would
  * invent data.
  *
  * Scale shape: one groupBy shuffle buckets the events (map-side partials);
  * the spine is distinct-keys × a driver-built bucket range (two scalar
  * collects for the bounds); the LOCF window sorts per key only. The
  * spine join shuffles on (key, bucket) — at 100 TB the bucketed counts are
  * already tiny relative to the raw events, so the join is dwarfed by the
  * first aggregation. */
object GapFill {

  /** Per-key bucketed counts on a `bucketSeconds` grid over the full
    * observed range, empty buckets LOCF-imputed. Output: key columns,
    * `bucket_start` (epoch seconds), `n_filled` (imputed count, NULL before
    * the first observation), `was_filled` (1 if imputed). */
  def locfCounts(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(keyCols.nonEmpty, "locfCounts needs key columns")
    // localCheckpoint: the bounds collect below materializes the
    // aggregation once; without it the spine join would re-run the whole
    // groupBy a second time (two full passes at scale)
    val bucketed = df
      .withColumn("__graft_b", expr(s"CAST($tsCol AS LONG) div $bucketSeconds"))
      .groupBy((keyCols :+ "__graft_b").map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .localCheckpoint()
    val bounds = bucketed.agg(min(col("__graft_b")), max(col("__graft_b"))).collect()(0)
    if (bounds.isNullAt(0)) { // empty input → empty grid
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          bucketed.schema.fields.dropRight(2).toSeq ++ Seq(
            org.apache.spark.sql.types.StructField("bucket_start", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n_filled", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("was_filled", org.apache.spark.sql.types.LongType))))
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // key set from the (tiny, already-materialized) aggregate — never a
    // second scan of the raw events; a key with zero rows anywhere would
    // not appear in the raw scan either, so the sets coincide
    val spine = bucketed.select(keyCols.map(col): _*).distinct()
      .withColumn("__graft_b", explode(sequence(lit(lo), lit(hi))))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(bucketed, keyCols :+ "__graft_b", "left")
      .select(
        keyCols.map(col) ++ Seq(
          (col("__graft_b") * bucketSeconds).as("bucket_start"),
          last(col("__graft_n"), ignoreNulls = true).over(w).cast("long").as("n_filled"),
          col("__graft_n").isNull.cast("long").as("was_filled")): _*)
  }
}
