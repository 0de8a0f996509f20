package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-gating privacy operators. Pseudonymization (keyed sha2 digests,
  * q147) hides direct identifiers; these guard the QUASI-identifiers — the
  * column combinations that re-identify a row by uniqueness (Sweeney's
  * k-anonymity model, the standard bar for tabular data releases).
  *
  * Scale shape: one hash aggregation over the quasi columns (map-side
  * partials absorb the hot groups) and one semi/anti join back — no
  * windows, no sort. */
object Privacy {

  /** Rows whose quasi-identifier group has at least `k` members — the
    * k-anonymity SUPPRESSION pass (rows in smaller groups are dropped;
    * generalize-then-retry is the caller's loop, coarsening a quasi column
    * between attempts). */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymitySuppress: no quasi columns")
    require(k >= 1, s"kAnonymitySuppress: k must be >= 1, got $k")
    val big = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") >= k)
      .drop("__graft_n")
      .select(quasiCols.map(c => col(c).as(s"__graft_$c")): _*)
    // NULL-SAFE equality (<=>): groupBy treats NULL as a real group, so the
    // audit and the suppression must agree about it — a null-unsafe semi
    // join would silently delete every NULL-quasi row however big its group
    val cond = quasiCols.map(c => col(c) <=> col(s"__graft_$c")).reduce(_ && _)
    df.join(big, cond, "left_semi")
  }

  /** Per-group audit: size and the distinct count of a sensitive column
    * (l-diversity — a k-anonymous group is still unsafe when everyone in
    * it shares the sensitive value). `suppressed` marks groups below k. */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        count_distinct(col(sensitiveCol)).cast("long").as("l_diversity"))
      .withColumn("suppressed", col("n") < k)
}
