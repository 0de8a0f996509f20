package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two dataset snapshots — the
  * guardrail a continuously-refreshed training corpus needs: detect when a
  * feed's value distribution moves before it poisons a training run.
  *
  * The metric is total-variation distance over a fixed bucketing,
  * TVD = ½ · Σ_b |p_a(b) − p_b(b)|, reported as an EXACT integer
  * numerator Σ_b |n_a(b)·N_b − n_b(b)·N_a| with denominator 2·N_a·N_b —
  * no floating point anywhere, so the score is bit-reproducible in any
  * engine (PSI/KL need libm logs, which are not cross-engine stable).
  *
  * Scale shape: two bucket-count aggregations (map-side partials; output
  * is groups×buckets sized — tiny), a full-outer join of those counts, a
  * broadcast join of per-group totals, one final fold. Each snapshot is
  * scanned once; nothing row-sized shuffles.
  */
object Drift {

  /** Per-group TVD numerator between `a` and `b`.
    *
    * Inputs must already carry `bucketCol` (an integer bucket id from a
    * FIXED bucketing — same edges on both sides) plus `groupCols`.
    * Returns one row per group: groupCols*, n_a, n_b (totals),
    * `tvd_num` = Σ_b |n_a(b)·N_b − n_b(b)·N_a|; TVD itself is
    * tvd_num / (2·N_a·N_b), left to the caller (the exact-integer
    * numerator is the deterministic part worth shipping).
    *
    * DEGENERATE CASE — a group present in only ONE snapshot: the empty
    * side's total is 0, so every cross-product vanishes and the raw
    * formula yields tvd_num = 0 with denominator 0 — "no drift" for what
    * is actually an appearing/disappearing group, the worst drift there
    * is. Such groups are therefore special-cased to
    * `tvd_num = max(N_a, N_b)` (the nonzero side's total) so that with
    * the guarded denominator `2·max(N_a,1)·max(N_b,1)` they score
    * TVD = ½ — strictly positive, never silently "unchanged". Callers can
    * still detect the case exactly (n_a = 0 or n_b = 0 in the output). */
  def tvdNumerator(
      a: DataFrame,
      b: DataFrame,
      groupCols: Seq[String],
      bucketCol: String): DataFrame = {
    require(groupCols.nonEmpty, "tvdNumerator: no group columns")
    val keys = groupCols :+ bucketCol
    def counts(df: DataFrame, out: String) =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).cast("long").as(out))
    val joined = counts(a, "na").join(counts(b, "nb"), keys, "full_outer")
      .select(
        groupCols.map(col) ++ Seq(
          coalesce(col("na"), lit(0L)).as("na"),
          coalesce(col("nb"), lit(0L)).as("nb")): _*)
    val totals = joined.groupBy(groupCols.map(col): _*)
      .agg(sum(col("na")).cast("long").as("n_a"), sum(col("nb")).cast("long").as("n_b"))
    joined
      .join(broadcast(totals), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        first(col("n_a")).as("n_a"),
        first(col("n_b")).as("n_b"),
        sum(abs(col("na") * col("n_b") - col("nb") * col("n_a"))).cast("long").as("raw_num"))
      .withColumn("tvd_num",
        when(col("n_a") === 0 || col("n_b") === 0, greatest(col("n_a"), col("n_b")))
          .otherwise(col("raw_num")).cast("long"))
      .drop("raw_num")
  }
}
