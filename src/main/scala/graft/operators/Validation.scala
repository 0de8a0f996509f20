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

  /** Minimal CLOSED patterns in a missing-combinations frame — the compact
    * "all of geography X × scenario Y is missing" diagnostics the
    * reference mines natively (ref: rust/src/lib.rs:298-612, surfaced via
    * dsgrid/utils/dataset.py:241-291). A pattern is a value assignment to
    * a subset of columns; it is CLOSED when the rows matching it cover the
    * FULL cross product of every other column's value dictionary (the
    * dictionaries come from the missing frame itself, as in the
    * reference's encoder) — i.e. the assignment alone explains a complete
    * missing slab. A closed pattern is MINIMAL when no proper
    * sub-assignment is itself closed; only minimal patterns are reported,
    * so a slab is named once by its smallest description.
    *
    * Enumeration mirrors the reference's levelwise prefix search, with the
    * per-pattern roaring-bitmap work re-expressed as whole-level Spark
    * plans: level k is ONE groupBy-count over the frame per visited column
    * set (every pattern of that set at once — no per-pattern state),
    * candidates are kept only when their prefix parent was open (semi-join)
    * and killed when any proper sub-assignment already closed (anti-joins
    * against the tiny recorded pattern frames, broadcast). The driver
    * iterates over COLUMN SETS only (≤ 2^d for d dimension columns — the
    * frame's width, never its row count); all row-scale work is
    * distributed, and sets are pruned exactly like the reference: a closed
    * pattern never expands, an empty candidate set never spawns children.
    * The closedness test itself is the reference's unique-input fast path
    * (`num_rows == expected_combinations`, rust/src/lib.rs:331) — the
    * frame is `.distinct()`-ed on entry to make that precondition hold by
    * construction.
    *
    * `maxDepth` 0 = unlimited (the reference default); otherwise patterns
    * stop growing at that many columns. Returns (columns ARRAY<STRING>,
    * values ARRAY<STRING>, num_rows BIGINT), one row per minimal closed
    * pattern, unordered (sort at the call site for presentation). */
  def minimalClosedPatterns(missing: DataFrame, maxDepth: Int = 0): DataFrame = {
    val spark = missing.sparkSession
    import spark.implicits._
    val names = missing.columns.toSeq
    val d = names.size
    require(d >= 1, "minimalClosedPatterns: need at least one column")
    // values compare as strings (the reference dictionary-encodes the
    // parquet's string columns); distinct both enforces the unique-input
    // closedness fast path and makes re-runs idempotent. The frame drives
    // a driver-side level iteration — checkpoint it once.
    val m = missing
      .select(names.map(c => col(c).cast("string").as(c)): _*)
      .na.drop() // a NULL is not a dimension value; reference input never has them
      .distinct()
      .localCheckpoint(true)
    val totalRows = m.count()
    val sizeRow = m.agg(
      countDistinct(col(names.head)).as(names.head),
      names.tail.map(c => countDistinct(col(c)).as(c)): _*).head()
    val dictSize: Map[Int, Long] = names.indices.map(i => i -> sizeRow.getLong(i)).toMap
    // expected combinations of the REMAINING columns; BigInt — the u64
    // saturation in the reference exists for the same overflow reason
    def expected(s: Seq[Int]): BigInt =
      names.indices.filterNot(s.contains).map(i => BigInt(dictSize(i))).product

    val emptyOut = Seq.empty[(Seq[String], Seq[String], Long)]
      .toDF("columns", "values", "num_rows")
    var out = emptyOut
    // minimal closed patterns recorded per column set, for subset kills;
    // (tiny by purpose — a diagnostic with millions of patterns explains
    // nothing — so they broadcast)
    val closedBySet = scala.collection.mutable.Map.empty[Seq[Int], DataFrame]
    // open (non-closed, non-empty) pattern frames awaiting expansion
    var level = scala.collection.immutable.Map.empty[Seq[Int], DataFrame]

    def process(s: Seq[Int], candidates: DataFrame): Unit = {
      val exp = expected(s)
      // a pattern can only be closed when the remaining cross product fits
      // inside the frame at all (the reference's fast rejection)
      val closable = exp <= BigInt(totalRows)
      val scols = s.map(i => col(names(i)))
      if (closable) {
        // kill candidates whose proper sub-assignment already closed —
        // levels run in size order, so every subset is already recorded
        var minimal = candidates.filter(col("__graft_n") === lit(exp.toLong))
        (1 until s.size).foreach { k =>
          s.combinations(k).foreach { sub =>
            closedBySet.get(sub).foreach { cf =>
              minimal = minimal.join(
                broadcast(cf.select(sub.map(i => col(names(i))): _*)),
                sub.map(names), "left_anti")
            }
          }
        }
        val kept = minimal.localCheckpoint(true)
        if (!kept.isEmpty) {
          closedBySet(s) = kept
          out = out.unionByName(kept.select(
            array(s.map(i => lit(names(i))): _*).as("columns"),
            array(scols: _*).cast("array<string>").as("values"),
            col("__graft_n").cast("long").as("num_rows")))
        }
      }
      val open =
        if (!closable) candidates
        else candidates.filter(col("__graft_n") =!= lit(exp.toLong))
      val expandable = s.max < d - 1 && (maxDepth <= 0 || s.size < maxDepth)
      if (expandable) {
        val o = open.localCheckpoint(true)
        if (!o.isEmpty) level = level.updated(s, o)
      }
    }

    (0 until d).foreach { i =>
      process(Seq(i), m.groupBy(col(names(i))).agg(count(lit(1)).as("__graft_n")))
    }
    while (level.nonEmpty) {
      val current = level
      level = Map.empty
      current.toSeq.sortBy(_._1.mkString(",")).foreach { case (s, openParent) =>
        ((s.max + 1) until d).foreach { j =>
          val t = s :+ j
          val grouped = m
            .groupBy(t.map(i => col(names(i))): _*)
            .agg(count(lit(1)).as("__graft_n"))
            // prefix-parent pruning: only tuples whose parent was open
            .join(openParent.select(s.map(i => col(names(i))): _*), s.map(names), "left_semi")
          process(t, grouped)
        }
      }
    }
    out
  }

  /** Values in `df1[c1]` with no counterpart in `df2[c2]` and vice versa
    * (ref intersect/except reconciliation in the two-table handler). */
  def idMismatches(df1: DataFrame, c1: String, df2: DataFrame, c2: String): (DataFrame, DataFrame) = {
    val a = df1.select(col(c1)).distinct()
    val b = df2.select(col(c2)).distinct()
    (a.join(b, a(c1) === b(c2), "left_anti"), b.join(a, b(c2) === a(c1), "left_anti"))
  }

  // ------------------------------------------------- expectation reports

  /** Declarative data-quality expectations (the dbt-test / Deequ shape):
    * each rule names a check; the report is one row per rule with its
    * violation count. The reference's registration-time checks are
    * hard-wired calls — this is the same machinery as a reusable,
    * user-composable surface. */
  sealed trait Expectation { def name: String }
  /** Any of `columns` NULL ⇒ the row violates. */
  final case class ExpectNotNull(name: String, columns: Seq[String]) extends Expectation
  /** Non-NULL value outside `values` ⇒ violation. */
  final case class ExpectAcceptedValues(name: String, column: String, values: Seq[String]) extends Expectation
  /** Non-NULL value outside [lo, hi] ⇒ violation. */
  final case class ExpectRange(name: String, column: String, lo: Double, hi: Double) extends Expectation
  /** Each extra row sharing a key beyond the first ⇒ one violation
    * (`violations = rows − distinct keys`; NULL key components count as a
    * key value, matching groupBy semantics). */
  final case class ExpectUnique(name: String, columns: Seq[String]) extends Expectation
  /** Non-NULL value with no match in `ref[refColumn]` ⇒ violation. */
  final case class ExpectReferential(name: String, column: String, ref: DataFrame, refColumn: String) extends Expectation

  /** Evaluate all expectations against `df` → (rule, violations BIGINT).
    *
    * Scale shape: every ROW-LEVEL rule (not-null / accepted-values /
    * range) is a `sum(when(violated, 1))` term fused into ONE aggregation
    * pass over the table — a 50-rule suite still scans 100 TB exactly
    * once. Uniqueness rules are each a groupBy on their key (their own
    * shuffle, unavoidable); referential rules are anti-join counts with
    * the reference side broadcast (dimension tables are small by
    * definition — for fact-to-fact RI pass a pre-distinct'd ref). Output
    * preserves rule order. */
  def expectationsReport(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectationsReport: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectationsReport: rule names must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    val rowTerms: Seq[(String, Column)] = rules.collect {
      case ExpectNotNull(n, cols) =>
        n -> cols.map(col(_).isNull).reduce(_ || _)
      case ExpectAcceptedValues(n, c, vs) =>
        n -> (col(c).isNotNull && !col(c).isInCollection(vs))
      case ExpectRange(n, c, lo, hi) =>
        n -> (col(c).isNotNull && !col(c).between(lo, hi))
    }
    val rowReport: Option[DataFrame] =
      if (rowTerms.isEmpty) None
      else {
        val sums = rowTerms.map { case (n, p) =>
          // sum over an empty table is NULL — an empty table has 0 violations
          coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(s"__graft_$n")
        }
        Some(df.agg(sums.head, sums.tail: _*)
          .select(explode(array(rowTerms.map { case (n, _) =>
            struct(lit(n).as("rule"), col(s"__graft_$n").as("violations"))
          }: _*)).as("r"))
          .select(col("r.rule").as("rule"), col("r.violations").as("violations")))
      }
    val otherReports: Seq[DataFrame] = rules.collect {
      case ExpectUnique(n, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__graft_c"))
          .agg(coalesce(sum(col("__graft_c") - 1L), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations").cast("long").as("violations"))
      case ExpectReferential(n, c, ref, refCol) =>
        df.filter(col(c).isNotNull)
          .join(broadcast(ref.select(col(refCol)).distinct()), col(c) === col(refCol), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
          .select(lit(n).as("rule"), col("violations"))
    }
    val all = rowReport.toSeq ++ otherReports
    val order = rules.map(_.name).zipWithIndex.toMap
    val orderDf = order.toSeq.toDF("rule", "__graft_ord")
    all.reduce(_.unionByName(_))
      .join(broadcast(orderDf), Seq("rule"), "left")
      .orderBy(col("__graft_ord"))
      .drop("__graft_ord")
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

  /** Ingest-volume anomaly detection: per group, flag days whose row count
    * falls below `dropNum/dropDen` of the TRAILING median over the
    * previous `windowDays` days — the "did yesterday's feed silently
    * halve" monitor every ingest pipeline runs. The trailing median is
    * EXACT: `sort_array(collect_list(...))` over a range frame of at most
    * `windowDays` tiny counts (bounded array — never a scalability risk),
    * lower-median element — all BIGINT, engine-replayable (no
    * approx_percentile row-order dependence). Days with fewer than
    * `minPrior` observed prior days are never flagged (cold start).
    *
    * `dayCol` must be an integral day number (e.g. `datediff(date, epoch)`
    * or `unix_date`); gaps in it are handled by the RANGE frame — a
    * missing day simply contributes no count to the trailing window.
    * Returns (group..., day, cnt, trailing_median, n_prior, is_anomaly). */
  def volumeAnomalies(
      counts: DataFrame,
      groupCols: Seq[String],
      dayCol: String,
      cntCol: String,
      windowDays: Int,
      dropNum: Int = 1,
      dropDen: Int = 2,
      minPrior: Int = 3): DataFrame = {
    require(windowDays >= 1, "volumeAnomalies: windowDays must be >= 1")
    require(dropNum >= 1 && dropDen > dropNum,
      s"volumeAnomalies: drop fraction must be in (0,1): $dropNum/$dropDen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(dayCol))
      .rangeBetween(-windowDays.toLong, -1L)
    val hist = sort_array(collect_list(col(cntCol).cast("long")).over(w))
    counts
      .withColumn("__graft_hist", hist)
      .withColumn("n_prior", size(col("__graft_hist")).cast("long"))
      .withColumn("trailing_median",
        when(col("n_prior") > 0,
          // `div`: Spark's `/` on ints is double division
          element_at(col("__graft_hist"),
            expr("cast((size(__graft_hist) + 1) div 2 as int)"))))
      .withColumn("is_anomaly",
        col("n_prior") >= minPrior &&
        col(cntCol).cast("long") * dropDen < col("trailing_median") * dropNum)
      .drop("__graft_hist")
  }
}
