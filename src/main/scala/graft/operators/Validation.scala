package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Registration-time dataset validation — the reference replaces DB
  * constraints with load-time checks (ref: dsgrid/utils/spark.py:436-470
  * null checks; dsgrid/dataset/dataset_schema_handler_base.py:171-222
  * completeness; anti-join dsgrid/utils/dataset.py:797-817).
  *
  * All checks are expressed as Spark plans over the data — distributed, no
  * driver-side loops; each returns a small "violations" DataFrame so callers
  * can surface samples without collecting the world.
  */
object Validation {

  /** Rows containing NULL in any of the given columns (ref NULL checks). */
  def nullViolations(df: DataFrame, columns: Seq[String]): DataFrame = {
    val anyNull = columns.map(col(_).isNull).reduce(_ || _)
    df.filter(anyNull)
  }

  /** Dimension values present in the data but absent from the dimension's
    * record table — a semi-join complement (ref record matching). */
  def unknownDimensionValues(df: DataFrame, dimColumn: String, records: DataFrame): DataFrame =
    df.select(col(dimColumn)).distinct()
      .join(broadcast(records.select(col("id"))), col(dimColumn) === col("id"), "left_anti")

  /** The completeness check: the stacked dimension columns must cover the
    * full cross product of their record sets, minus explicitly registered
    * expected-missing associations. Returns the missing combinations.
    *
    * Scale design: the expected side is built by cross-joining the (tiny)
    * record id sets — never the fact table; the comparison is one left-anti
    * join against the distinct dimension combos of the data
    * (ref: dataset_schema_handler_base.py:171-222, utils/dataset.py:797-817).
    */
  def missingAssociations(
      df: DataFrame,
      dimColumns: Seq[String],
      recordSets: Map[String, DataFrame],
      expectedMissing: Option[DataFrame] = None): DataFrame = {
    val expected = dimColumns
      .map(c => recordSets(c).select(col("id").as(c)))
      .reduce(_.crossJoin(_))
    val expectedMinus = expectedMissing match {
      case Some(em) => expected.join(em, dimColumns, "left_anti")
      case None => expected
    }
    val actual = df.select(dimColumns.map(col): _*).distinct()
    expectedMinus.join(actual, dimColumns, "left_anti")
  }

  /** Simple per-column diagnostic when the completeness check fails: for
    * each dimension column, the distinct values that appear in missing
    * combinations (the reference's Python fallback to its Rust pattern
    * miner — dsgrid/utils/dataset.py:302-311). */
  def missingValueCounts(missing: DataFrame, dimColumns: Seq[String]): Map[String, Long] =
    dimColumns.map(c => c -> missing.select(c).distinct().count()).toMap

  /** Values in `df1[c1]` with no counterpart in `df2[c2]` and vice versa
    * (ref intersect/except reconciliation in the two-table handler). */
  def idMismatches(df1: DataFrame, c1: String, df2: DataFrame, c2: String): (DataFrame, DataFrame) = {
    val a = df1.select(col(c1)).distinct()
    val b = df2.select(col(c2)).distinct()
    (a.join(b, a(c1) === b(c2), "left_anti"), b.join(a, b(c2) === a(c1), "left_anti"))
  }
}

/** Robust outlier detection for telemetry/metric columns — median/MAD
  * tagging (|x − median| > k·MAD), the standard robust alternative to
  * z-scores (mean/stddev are themselves dragged by the outliers they are
  * supposed to find).
  *
  * Exact path: two percentile aggregations per group (the median, then the
  * median of absolute deviations), each broadcast back — a 100 TB corpus
  * never globally sorts; each group's percentile is computed by the
  * aggregate. `approx = true` swaps in approx_percentile for both (the
  * approximation moves the THRESHOLD, never corrupts kept rows).
  */
object Outliers {

  /** Adds `is_outlier` (boolean). NULL values — and rows whose group key is
    * NULL (no group statistics exist for them) — are never outliers; every
    * input row is preserved (left joins, not inner). The two group-stat
    * frames are `localCheckpoint`ed: they are group-cardinality tiny and
    * each is joined against the data twice — without it the median
    * aggregation would re-run inside the MAD pass and again in the output
    * join. The three passes over `df` itself are inherent to exact
    * two-pass median/MAD (cache `df` upstream if it is re-scannable only
    * at cost). */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double,
      approx: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    def pct(c: Column): Column =
      if (approx) approx_percentile(c, lit(0.5), lit(10000)) else percentile(c, lit(0.5))
    val gcols = groupCols.map(col)
    val med = df.groupBy(gcols: _*).agg(pct(col(valueCol)).as("__graft_med")).localCheckpoint()
    val withMed = df.join(broadcast(med), groupCols, "left")
    val mad = withMed
      .groupBy(gcols: _*)
      .agg(pct(abs(col(valueCol) - col("__graft_med"))).as("__graft_mad"))
      .localCheckpoint()
    withMed
      .join(broadcast(mad), groupCols, "left")
      .withColumn(
        "is_outlier",
        coalesce(abs(col(valueCol) - col("__graft_med")) > col("__graft_mad") * k, lit(false)))
      .drop("__graft_med", "__graft_mad")
  }
}
