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

  /** Interval OVERLAP join — both sides are interval relations and a pair
    * matches when the half-open intervals intersect:
    * `key equal AND lStart < rEnd AND rStart < lEnd`. The genomic /
    * temporal-overlap workhorse (shift overlaps, outage windows vs job
    * runs, span containment screens) and the BIG-BIG counterpart of the
    * broadcast [[IntervalLookup]] operator: neither side needs to fit in
    * memory.
    *
    * Spark-first formulation (the bin-join): both sides explode to the
    * fixed-width buckets they cover, a plain shuffled equi-join on
    * (key, bucket) bounds candidates, the exact overlap predicate
    * verifies. A pair whose overlap spans several shared buckets would
    * emit once per bucket — instead of a distinct (a second full shuffle
    * of the OUTPUT, the expensive relation here), each pair reports
    * exactly once in the bucket containing max(lStart, rStart), the first
    * bucket of the intersection, which both sides cover by construction.
    * At 100 TB: shuffle is hash(key, bucket) — time-locality becomes
    * partition-locality, a hot key spreads over its buckets, and the
    * planner sees an ordinary equi-join (AQE skew split applies). Pick
    * `bucketWidthSeconds` near the typical interval length: fan-out per
    * row is ceil(length/width) + 1.
    *
    * Degenerate intervals (end <= start) are empty sets — they match
    * nothing and are dropped before the explode. */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keyColumns: Seq[String],
      leftStartColumn: String,
      leftEndColumn: String,
      rightStartColumn: String,
      rightEndColumn: String,
      bucketWidthSeconds: Long = 86400L): DataFrame = {
    require(bucketWidthSeconds > 0, "bucketWidthSeconds must be positive")
    val rPayload = right.columns.filterNot(keyColumns.contains).toSeq
    val collisions = rPayload.intersect(left.columns.filterNot(keyColumns.contains).toSeq)
    require(
      collisions.isEmpty,
      s"intervalOverlapJoin: right columns collide with left: ${collisions.mkString(",")}")
    val w = bucketWidthSeconds * 1000000L // microseconds
    val bucket = "__graft_ovl_bucket"
    def bucketed(df: DataFrame, startCol: String, endCol: String) = df
      .filter(col(endCol) > col(startCol))
      .withColumn(
        bucket,
        explode(sequence(
          (unix_micros(col(startCol)) / w).cast("long"),
          ((unix_micros(col(endCol)) - 1) / w).cast("long"))))
    val lb = bucketed(left, leftStartColumn, leftEndColumn)
    val rb = bucketed(right, rightStartColumn, rightEndColumn)
    lb.join(rb, keyColumns :+ bucket)
      .filter(
        col(leftStartColumn) < col(rightEndColumn) &&
          col(rightStartColumn) < col(leftEndColumn))
      // emit-once: only the intersection's FIRST bucket reports the pair
      .filter(col(bucket) ===
        (greatest(unix_micros(col(leftStartColumn)), unix_micros(col(rightStartColumn))) / w)
          .cast("long"))
      .drop(bucket)
  }
}
