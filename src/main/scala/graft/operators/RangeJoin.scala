package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: each left row matches the right intervals
  * containing its timestamp — `key equal AND start <= ts < end` — the other
  * classic time-series join Spark has no native operator for (a naive join
  * on the range predicate degenerates to a per-key nested loop).
  *
  * Spark-first formulation: bucketize time into fixed-width buckets, explode
  * each interval to the buckets it covers, tag each left row with its
  * bucket, equi-join on (key, bucket) — a plain shuffled hash join — and
  * apply the exact range predicate to the bounded candidate set. Candidate
  * fan-out per interval is ceil(length/width): pick `bucketWidthSeconds`
  * near the typical interval length. At 100 TB this keeps the join an
  * equi-join the planner can hash-partition, never a cartesian per key.
  * Intervals are half-open: ts == start matches, ts == end does not.
  */
object RangeJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyColumns: Seq[String],
      leftTimeColumn: String,
      startColumn: String,
      endColumn: String,
      bucketWidthSeconds: Long = 86400L): DataFrame = {
    require(bucketWidthSeconds > 0, "bucketWidthSeconds must be positive")
    // same contract as AsOfJoin: right payload columns (everything but the
    // join keys and the interval bounds) must not collide with left, or the
    // using-columns join emits duplicate names and downstream references
    // fail with AMBIGUOUS_REFERENCE (or silently bind to one side)
    val payload = right.columns
      .filterNot(c => keyColumns.contains(c) || c == startColumn || c == endColumn)
      .toSeq
    val collisions = payload.intersect(left.columns.toSeq)
    require(
      collisions.isEmpty,
      s"intervalJoin: right payload columns collide with left: ${collisions.mkString(",")}")
    require(
      !left.columns.contains(startColumn) && !left.columns.contains(endColumn),
      s"intervalJoin: left must not carry the interval bound columns ($startColumn, $endColumn)")
    val w = bucketWidthSeconds * 1000000L // microseconds
    val bucket = "__graft_range_bucket"
    val lb = left.withColumn(bucket, (unix_micros(col(leftTimeColumn)) / w).cast("long"))
    // half-open interval: the last covered bucket is the one holding end-1µs.
    // Degenerate intervals (end <= start) match nothing — dropping them here
    // matters because sequence(hi, lo) would otherwise generate a DESCENDING
    // bucket list, a per-row candidate explosion for corrupt rows
    val rb = right
      .filter(col(endColumn) > col(startColumn))
      .withColumn(
        bucket,
        explode(sequence(
          (unix_micros(col(startColumn)) / w).cast("long"),
          ((unix_micros(col(endColumn)) - 1) / w).cast("long"))))
    lb.join(rb, keyColumns :+ bucket)
      .filter(
        col(leftTimeColumn) >= col(startColumn) && col(leftTimeColumn) < col(endColumn))
      .drop(bucket)
  }
}
