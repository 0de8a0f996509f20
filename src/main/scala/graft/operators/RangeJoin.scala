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

  /** Gaps-and-islands interval merge — coalesce each key's overlapping or
    * touching half-open [start, end) intervals into maximal ISLANDS (the
    * coverage operator behind uptime/session coverage, index-range
    * compaction, and the skipping manifests' range union). Integer
    * endpoints (epoch-us, days — quantize first).
    *
    * Mechanics: one key-partitioned window ordered by (start, end); a new
    * island opens when start > max(end) over all PRIOR intervals (running
    * prefix max — an interval swallowed by a longer predecessor extends
    * nothing), island id = running count of opens, then one groupBy
    * yields (keys*, island_start, island_end, n_intervals). Touching
    * intervals (start = prior end) MERGE — half-open adjacency is
    * continuous coverage; callers wanting strict-overlap semantics
    * subtract 1 from ends first. Deterministic under duplicates: rows
    * tying on (start, end) are interchangeable in every prefix.
    *
    * Scale shape: per-key windows (no global sort), one shuffle on the
    * keys + the groupBy reusing the same partitioning. Degenerate
    * intervals (end ≤ start) are dropped before the window. */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    require(keyCols.nonEmpty,
      "mergeIntervals: empty keyCols would plan a single-task global " +
        "window — inject a literal constant key for a whole-table merge")
    import org.apache.spark.sql.expressions.Window
    val gs = keyCols.map(col)
    val wOrd = Window.partitionBy(gs: _*)
      .orderBy(col(startCol), col(endCol))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(endCol) > col(startCol))
      .withColumn("__gi_pmax", max(col(endCol)).over(wPrev))
      .withColumn("__gi_open",
        when(col("__gi_pmax").isNull || col(startCol) > col("__gi_pmax"), 1L)
          .otherwise(0L))
      .withColumn("__gi_island", sum(col("__gi_open")).over(wRun))
      .groupBy((gs :+ col("__gi_island")): _*)
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__gi_island")
  }
}
