package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) — multi-objective selection without a weight
  * vector. Two plans for two shapes:
  *
  *   - [[Skyline.pareto2d]] — the 2-D special case (Börzsönyi ICDE '01
  *     §3's sort-filter idea): per-x partial aggregate + a prefix-scan
  *     over the DISTINCT-x frame only + broadcast join back. No self-join
  *     at all; the full relation is touched twice, both map-side.
  *   - [[Skyline.paretoFrontier]] — the k-dim general case via
  *     grid-dominance pruning (below): cell census → driver suffix-OR →
  *     staircase band → exact broadcast anti-join among band survivors.
  *
  * Both: all dims maximize (pareto2d minimizes x — its doc) — negate a
  * column for the other orientation; exact duplicates are mutually
  * non-dominating and all kept.
  * vector: keep every row NOT strictly dominated by another (dominator ≥
  * in all dims, > in at least one; all dims maximize — negate a column to
  * minimize). The data-selection shape behind "best quality AND longest
  * AND least duplicated" curation calls, where any single score collapses
  * the trade-off the curator wants to see.
  *
  * Scale design (the grid-prune two-phase): a naive skyline is an
  * all-pairs dominance test. Instead:
  *   1. bucket each dim into `buckets` equal-width cells from the global
  *      min/max (one agg); the CELL census (≤ buckets^k rows) collects to
  *      the driver — metadata-sized like every skipping structure;
  *   2. on the driver, a suffix-OR sweep marks cell c pruned when some
  *      non-empty cell c' has every coordinate ≥ c+1 — every point of c'
  *      then strictly dominates every point of c in all dims (cell lower
  *      bounds exceed cell upper bounds), so c's rows can never be on the
  *      frontier. The surviving "staircase band" broadcasts as a filter —
  *      the full table is touched by exactly ONE scan + one tiny agg scan;
  *   3. the exact dominance test runs only among band survivors — a
  *      broadcast nested-loop LEFT ANTI join of the band against itself
  *      (self-joined frames get cached per the project ground rules).
  *
  * Pruning never changes the answer — phase 3 is exact over a superset of
  * the frontier — so correctness is bucket-count-independent (the spec
  * pins it) and the oracle can compute the skyline directly. Rows with a
  * NULL in any dim are excluded by contract (incomparable). Duplicate
  * points keep ALL copies: equality is not strict dominance.
  *
  * At 100 TB: phases 1-2 are scans; the band is frontier-shaped (for
  * independent dims E[skyline] = O(log^{k-1} n), and the band is the
  * cell-level staircase around it). Anti-correlated dims genuinely grow
  * the frontier — then the OUTPUT is large and no algorithm saves the
  * nested phase; `maxBandRows` refuses loudly instead of letting the
  * broadcast silently OOM an executor. */
object Skyline {

  /** 2-D sort-based skyline (minimize `xCol`, maximize `yCol` — flip a
    * sign in the caller for other orientations): collapse to one row per
    * distinct x (`ymax`), prefix-scan `best_below = max(ymax) over (order
    * by x rows unbounded preceding .. 1 preceding)` over the collapsed
    * frame only, survive iff `ymax > coalesce(best_below, −∞)`, broadcast
    * the staircase back and keep rows with `y = ymax(x)`. At 100 TB the
    * full relation is touched exactly twice, both map-side; the only sort
    * is over distinct x values. (Börzsönyi et al., ICDE '01 §3.) */
  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perX = df
      .groupBy(col(xCol))
      .agg(max(col(yCol)).as("__sky_ymax"))
    val scan = Window.orderBy(col(xCol)).rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__sky_best_below", max(col("__sky_ymax")).over(scan))
      .filter(col("__sky_best_below").isNull || col("__sky_ymax") > col("__sky_best_below"))
      .select(col(xCol).as("__sky_x"), col("__sky_ymax"))
    df.join(
        broadcast(frontier),
        col(xCol) === col("__sky_x") && col(yCol) === col("__sky_ymax"))
      .drop("__sky_x", "__sky_ymax")
  }

  def paretoFrontier(
      df: DataFrame,
      dims: Seq[String],
      buckets: Int = 32,
      maxBandRows: Long = 2000000L): DataFrame = {
    require(dims.size >= 2, s"paretoFrontier: need >= 2 dims, got ${dims.size}")
    require(dims.distinct.size == dims.size, "paretoFrontier: duplicate dims")
    require(dims.forall(df.columns.contains),
      s"paretoFrontier: missing dims in ${df.columns.mkString(",")}")
    require(buckets >= 2 && math.pow(buckets, dims.size) <= (1 << 20),
      s"paretoFrontier: buckets^k must stay driver-sized (got $buckets^${dims.size})")
    val k = dims.size
    val d = df.filter(dims.map(col(_).isNotNull).reduce(_ && _))
    val aggExprs = dims.flatMap(c => Seq(min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val statsRow = d.agg(aggExprs.head, aggExprs.tail: _*).head()
    if (statsRow.isNullAt(0)) return d // zero comparable rows
    val bounds = dims.zipWithIndex.map { case (c, i) =>
      c -> ((statsRow.getDouble(2 * i), statsRow.getDouble(2 * i + 1)))
    }.toMap
    def cellOf(c: String): Column = {
      val (mn, mx) = bounds(c)
      if (mx <= mn) lit(0)
      else least(floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(buckets)),
        lit(buckets - 1L)).cast("int")
    }
    val cellCols = dims.map(c => cellOf(c).as(s"__cell_$c"))
    val withCells = d.select(col("*") +: cellCols: _*)
    // cell census → driver (≤ buckets^k rows)
    val census = withCells
      .groupBy(dims.map(c => col(s"__cell_$c")): _*)
      .count()
      .collect()
      .map(r => (0 until k).map(r.getInt).toArray)
    // suffix-OR sweep over a DENSE flat grid (buckets^k <= 2^20 by the
    // require above): occ(c) = some non-empty cell >= c componentwise.
    // Dimension-by-dimension running OR turns the 2^k-neighbor recursion
    // into k linear passes over the array — no per-step set copies.
    val gridSize = math.pow(buckets, k).toInt
    val strides = Array.iterate(1, k)(_ * buckets)
    def flat(c: Array[Int]): Int = {
      var idx = 0; var i = 0
      while (i < k) { idx += c(i) * strides(i); i += 1 }
      idx
    }
    val occ = new Array[Boolean](gridSize)
    census.foreach(c => occ(flat(c)) = true)
    for (dim <- 0 until k) {
      val stride = strides(dim)
      // descending flat order: idx + stride (the b+1 neighbor) is always
      // visited before idx, so one linear pass per dim is exact
      var idx = gridSize - 1
      while (idx >= 0) {
        if (idx / stride % buckets < buckets - 1 && occ(idx + stride))
          occ(idx) = true
        idx -= 1
      }
    }
    // a census cell c is prunable iff every coordinate admits a strict +1
    // (not at the grid edge) and some non-empty cell >= c+1 componentwise —
    // that cell's points then strictly dominate all of c's in every dim
    val prunedCells = census.filter { c =>
      c.forall(_ < buckets - 1) && occ(flat(c.map(_ + 1)))
    }
    val spark = df.sparkSession
    val band0 =
      if (prunedCells.isEmpty) withCells
      else {
        // broadcast left_anti on the cell-key tuple — a literal `isin`
        // over up to ~10^6 cells blows up analysis/codegen (r11 advice)
        val schema = org.apache.spark.sql.types.StructType(
          dims.map(c => org.apache.spark.sql.types.StructField(s"__cell_$c",
            org.apache.spark.sql.types.IntegerType, nullable = false)))
        val rows = prunedCells.toSeq.map(c =>
          org.apache.spark.sql.Row.fromSeq(c.toSeq))
        val prunedDf = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
        withCells.join(broadcast(prunedDf), dims.map(c => s"__cell_$c"), "left_anti")
      }
    // eager local checkpoint: materialized once, lineage truncated, and the
    // blocks are reclaimed by the ContextCleaner when the plan is GC'd —
    // no session-lifetime cache leak (r11 advice)
    val band = band0.drop(dims.map(c => s"__cell_$c"): _*).localCheckpoint(true)
    val bandRows = band.count()
    require(bandRows <= maxBandRows,
      s"paretoFrontier: staircase band has $bandRows rows (> $maxBandRows) — " +
        "the frontier itself is near-table-sized (anti-correlated dims); " +
        "raise maxBandRows only if a broadcast of that size is acceptable")
    val a = band.as("a")
    val b = band.as("b")
    val dominates =
      dims.map(c => col(s"b.$c") >= col(s"a.$c")).reduce(_ && _) &&
        dims.map(c => col(s"b.$c") > col(s"a.$c")).reduce(_ || _)
    a.join(broadcast(b), dominates, "left_anti")
  }
}
