package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time aggregation: groupBy user-chosen columns, apply a whitelisted
  * aggregation to the value column (ref: dsgrid/dataset/unpivoted_table.py:31-109,
  * name validation dsgrid/query/models.py:64-76). The whitelist is an open
  * registry so extension operators can add their own aggregators. */
object Aggregation {

  type AggFn = Column => Column

  /** Built-in aggregation functions by name, mirroring the reference's use of
    * pyspark.sql.functions names. All are codegen'd built-ins. */
  val builtins: Map[String, AggFn] = Map(
    "sum" -> sum,
    "max" -> max,
    "min" -> min,
    "mean" -> avg,
    "avg" -> avg,
    "count" -> count,
    "count_distinct" -> (c => countDistinct(c)),
    "approx_count_distinct" -> (c => approx_count_distinct(c)),
    "stddev" -> stddev,
    "variance" -> variance,
    "median" -> median,
    "first" -> (c => first(c, ignoreNulls = true)),
    "collect_list" -> collect_list,
    "collect_set" -> collect_set)

  def resolve(name: String, registry: Map[String, AggFn] = builtins): AggFn =
    registry.getOrElse(name, throw new IllegalArgumentException(s"aggregation not allowed: $name"))

  /** groupBy + single agg over the value column. */
  def aggregate(
      df: DataFrame,
      groupColumns: Seq[String],
      aggName: String,
      valueColumn: String = graft.core.Constants.ValueColumn,
      as: Option[String] = None): DataFrame = {
    val fn = resolve(aggName)
    df.groupBy(groupColumns.map(col): _*)
      .agg(fn(col(valueColumn)).as(as.getOrElse(valueColumn)))
  }

  /** groupBy + several named aggs: Seq of (aggName, inputCol, outputCol). */
  def aggregateMany(df: DataFrame, groupColumns: Seq[String], aggs: Seq[(String, String, String)]): DataFrame = {
    val exprs = aggs.map { case (fn, in, out) => resolve(fn)(col(in)).as(out) }
    df.groupBy(groupColumns.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Peak rows per group: the reference computes groupBy+max then joins back
    * to recover the full peak rows (report_peak_load.py:36-70). The window
    * form is a single shuffle and is what we use; ties are broken
    * deterministically by the ordering columns so results are stable.
    */
  def peakRowsPerGroup(
      df: DataFrame,
      groupColumns: Seq[String],
      valueColumn: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = desc(valueColumn) +: tieBreak.map(asc)
    val w = Window.partitionBy(groupColumns.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** The reference's agg+join-back peak form (keeps ALL tied peak rows) —
    * semantics-exact variant for oracle comparison. */
  def peakRowsPerGroupAllTies(df: DataFrame, groupColumns: Seq[String], valueColumn: String): DataFrame = {
    val peaks = df
      .groupBy(groupColumns.map(col): _*)
      .agg(max(col(valueColumn)).as(valueColumn))
    df.join(peaks, groupColumns :+ valueColumn, "left_semi")
  }

  /** Two-stage salted aggregation for skewed group keys — the aggregation
    * twin of [[SkewJoin.saltedEquiJoin]]. When one hot group key would
    * concentrate a shuffle partition, stage 1 groups by (keys, salt) so the
    * hot key's rows land on `salts` different reducers, and stage 2 folds
    * the per-salt partials into the final value.
    *
    * Supports the algebraic aggregations whose partials compose exactly —
    * sum/count/min/max (count folds as a SUM of partial counts). The
    * result is row-identical to the plain `groupBy(keys)` spelling: sums
    * here are over exact types (integers/decimals) or accepted under the
    * same reordering caveat as any Spark shuffle.
    *
    * `saltSource` must vary WITHIN a hot key (a row id column); the salt is
    * deterministic (`pmod(xxhash64(saltSource), salts)`) so reruns place
    * rows identically.
    *
    * Note: Spark's own partial aggregation already combines map-side, so
    * salting only pays when the DISTINCT-KEY×salt cardinality is small and
    * the reduce-side per-key combine (e.g. huge collect buffers, or
    * extreme single-key row counts beyond what map-side combine absorbs)
    * is the bottleneck. */
  def saltedAggregate(
      df: DataFrame,
      groupColumns: Seq[String],
      aggs: Seq[(String, String, String)],
      salts: Int,
      saltSource: Column): DataFrame = {
    require(salts > 1, "salts must exceed 1 (1 would be a plain aggregation)")
    val allowed = Set("sum", "count", "min", "max")
    aggs.foreach { case (fn, _, _) =>
      require(allowed.contains(fn), s"saltedAggregate supports ${allowed.mkString("/")}, got $fn")
    }
    val salted = df.withColumn(
      "__graft_salt", pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val partials = aggs.map { case (fn, in, out) => resolve(fn)(col(in)).as(out) }
    val stage1 = salted
      .groupBy((groupColumns :+ "__graft_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val finals = aggs.map {
      case ("count", _, out) => sum(col(out)).as(out)
      case (fn, _, out) => resolve(fn)(col(out)).as(out)
    }
    stage1
      .groupBy(groupColumns.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Robust (trimmed) aggregation: per group, drop the lowest and highest
    * `trimPercent`% of rows by `valueCol` (k = floor(n·p/100) from EACH
    * end, the classic trimmed-mean definition) and aggregate the middle —
    * the outlier-immune mean for heavy-tailed metrics (complementing the
    * MAD-based outlier DETECTOR in Validation). Integer-exact given an
    * integral `valueCol`: the kept-set boundary is a pure row_number
    * comparison, and mean = exact-int sum ÷ exact-int count — one IEEE
    * division, engine-deterministic. Row_number ties on equal values are
    * broken by `tieBreak` (pass a unique id for full determinism); ties
    * do not affect the trimmed SUM/mean (equal values are interchangeable
    * at the boundary) but make the kept row SET reproducible.
    *
    * Shape: one window shuffle on the group key, then a hash aggregate —
    * scales with group size like any percentile-exact computation; use
    * [[graft.text.Sampling.filterAboveApproxQuantile]]-style sketch
    * bounds when an approximate trim suffices at corpus scale. */
  def trimmedStats(
      df: DataFrame,
      groupColumns: Seq[String],
      valueCol: String,
      trimPercent: Int,
      tieBreak: Column): DataFrame = {
    require(trimPercent >= 0 && trimPercent < 50,
      s"trimmedStats: trimPercent must be in [0,50), got $trimPercent")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupColumns.map(col): _*)
      .orderBy(col(valueCol).asc, tieBreak.asc)
    val wn = Window.partitionBy(groupColumns.map(col): _*)
    val ranked = df
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_n", count(lit(1)).over(wn))
      .withColumn("__graft_k", expr(s"(__graft_n * $trimPercent) div 100"))
    ranked
      .filter(col("__graft_rn") > col("__graft_k") &&
        col("__graft_rn") <= col("__graft_n") - col("__graft_k"))
      .groupBy(groupColumns.map(col): _*)
      .agg(
        first(col("__graft_n")).cast("long").as("n"),
        count(lit(1)).cast("long").as("n_kept"),
        sum(col(valueCol)).cast("long").as("trimmed_sum"),
        min(col(valueCol)).cast("long").as("kept_min"),
        max(col(valueCol)).cast("long").as("kept_max"))
      .withColumn("trimmed_mean",
        col("trimmed_sum").cast("double") / col("n_kept").cast("double"))
  }

  /** Validation: every group has the same count (used for identical-length
    * time arrays, ref: dataset_schema_handler_base.py:430-452). */
  def groupsHaveEqualCounts(df: DataFrame, groupColumns: Seq[String]): Boolean = {
    val counts = df.groupBy(groupColumns.map(col): _*).count().select("count").distinct()
    counts.limit(2).count() <= 1
  }
}

/** Set operations (thin wrappers; ref: dsgrid/spark/functions.py:156-205,
  * dataset_expression_handler.py:59-68). */
object SetOps {
  def union(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)
  def exceptAll(a: DataFrame, b: DataFrame): DataFrame = a.exceptAll(b)
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
}
