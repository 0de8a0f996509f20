package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (partition-selective) recomputation — the refresh pattern
  * that keeps a derived table current over a 100 TB source without
  * re-reading it: fingerprint each source partition, diff against the
  * previous snapshot's fingerprints, and recompute ONLY the partitions
  * whose content changed, stitching the rest through from the previous
  * derived result.
  *
  * Fingerprints are ORDER-INDEPENDENT: bit_xor of per-row xxhash64 over
  * the row's canonical string form. xor is commutative/associative and
  * can't overflow, so the fingerprint is stable under any partition
  * layout, shuffle order, or executor count — the property that lets two
  * independently-computed snapshots be compared at all. (A caveat xor
  * inherits: a partition whose multiset of rows changes by an EVEN number
  * of identical rows keeps its fingerprint; include a count alongside to
  * close that hole.)
  *
  * Scale shape: two map-side hash passes + two partition-count-sized
  * aggregations for the diff; the recompute touches only changed
  * partitions (filter pushes the partition predicate to the scan), and
  * the stitch is a partition-key anti-join of the (small) derived table.
  */
object Incremental {

  /** Per-partition content fingerprint: (partCols*, fp, n).
    *
    * NULLs are replaced by a per-column sentinel before hashing: Spark's
    * hash functions SKIP null arguments (leaving the accumulator
    * untouched), so without the sentinel ('x', NULL) and (NULL, 'x')
    * would fingerprint identically and a value shifting between columns
    * would be invisible to the diff. Remaining documented caveats: values
    * are compared in string form (a prev/next schema retype that
    * round-trips through the same string is invisible — schemas should
    * match anyway), and a real value equal to the NUL-prefixed sentinel would collide with NULL (control characters in data are
    * assumed absent). */
  def partitionFingerprints(df: DataFrame, partCols: Seq[String], hashCols: Seq[String]): DataFrame =
    df.groupBy(partCols.map(col): _*)
      .agg(
        bit_xor(xxhash64(hashCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000null:" + c))): _*)).as("fp"),
        count(lit(1)).cast("long").as("n"))

  /** Partition keys whose (fp, n) differ between snapshots — including
    * partitions only present on one side. */
  def changedPartitions(prevFp: DataFrame, nextFp: DataFrame, partCols: Seq[String]): DataFrame = {
    val p = prevFp.select(partCols.map(col) :+ col("fp").as("fp_prev") :+ col("n").as("n_prev"): _*)
    val nx = nextFp.select(partCols.map(col) :+ col("fp").as("fp_next") :+ col("n").as("n_next"): _*)
    p.join(nx, partCols, "full_outer")
      .filter(
        col("fp_prev").isNull || col("fp_next").isNull ||
          col("fp_prev") =!= col("fp_next") || col("n_prev") =!= col("n_next"))
      .select(partCols.map(col): _*)
  }

  /** Refresh a per-partition derived table: keep `prevDerived` rows for
    * unchanged partitions, recompute `derive` only over `next`'s changed
    * partitions. `changed` is the frame from [[changedPartitions]] —
    * broadcast on both sides (it is partition-count sized). The result
    * equals `derive(next)` exactly; the saving is that `next` is only
    * SCANNED where it changed. */
  def refresh(
      prevDerived: DataFrame,
      next: DataFrame,
      changed: DataFrame,
      partCols: Seq[String],
      derive: DataFrame => DataFrame): DataFrame = {
    val kept = prevDerived.join(broadcast(changed), partCols, "left_anti")
    val recomputed = derive(next.join(broadcast(changed), partCols, "left_semi"))
    kept.unionByName(recomputed)
  }

  /** Incremental JOIN-view maintenance — the delta algebra every
    * materialized-join refresher runs (differential-dataflow / DBSP
    * Δ(A⋈B) identity): with inserts ΔA and ΔB,
    * Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB — three joins whose LEFT inputs are
    * delta-sized, so refresh cost tracks the CHANGE, not the view
    * (the agg-MV counterpart lives in the txn-log registration; this is
    * the join shape). Insert-only by contract: deletes need the DV/CDF
    * machinery upstream to present retractions, and a silent delete here
    * would corrupt the view — callers REFUSE mixed feeds.
    *
    * At 100 TB: B₀ shuffles once against ΔA (delta-sized probe, AQE
    * broadcast when ΔA is small); A₀⋈ΔB symmetric; ΔA⋈ΔB is tiny. The
    * returned frame is the delta to APPEND to the stored view. */
  def joinDelta(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta: at least one join key")
    val overlap = aOld.columns.toSet.intersect(bOld.columns.toSet) -- keys
    require(overlap.isEmpty, s"joinDelta: non-key column overlap $overlap")
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }
}
