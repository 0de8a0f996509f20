package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Benford first-digit audit — the classic fabricated-data / unit-mixup
    * detector for scale-spanning positive quantities (prices, populations,
    * file sizes): the first significant digit of natural data follows
    * P(d) = log₁₀(1 + 1/d); uniform or hand-entered data does not. The
    * digit is extracted from the BIGINT's decimal rendering
    * (d = x div 10^(len−1)) — never from a double's string form, which is
    * engine-dependent. Expected shares are fixed ppm literals (the
    * irrational logs enter as constants both engines share); per digit the
    * deviation |n_d·10⁶ − benford_d·N| stays exact-integer. One count
    * aggregate over 9 groups; rows with x ≤ 0 are excluded (Benford is
    * undefined for them) and reported via the digit-0 row.
    *
    * Returns digit 1..9 rows with (n, obs_ppm, benford_ppm, dev_num),
    * plus a digit-0 row carrying the excluded count when any row had
    * x ≤ 0. */
  def benfordProfile(df: DataFrame, valueCol: Column): DataFrame = {
    // ⌊10⁶·log₁₀(1 + 1/d)⌋, d = 1..9
    val benfordPpm = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L)
    val x = valueCol.cast("long")
    val tagged = df.select(x.as("__graft_x"))
      .withColumn("digit",
        when(col("__graft_x") > 0L,
          expr("CAST(substring(CAST(__graft_x AS STRING), 1, 1) AS BIGINT)"))
          .otherwise(lit(0L)))
    val counts = tagged.groupBy("digit").agg(count(lit(1)).cast("long").as("n"))
    val session = df.sparkSession
    import session.implicits._
    val expected = benfordPpm.zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p) }
      .toDF("digit", "benford_ppm")
    val total = counts.filter(col("digit") > 0L)
      .agg(sum(col("n")).cast("long").as("__graft_N"))
    expected
      .join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("obs_ppm",
        when(col("__graft_N") > 0L, expr("(n * CAST(1000000 AS BIGINT)) div __graft_N"))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("dev_num",
        abs(col("n") * 1000000L - col("benford_ppm") * col("__graft_N")).cast("long"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("benford_ppm"), col("dev_num"))
      .unionByName(counts.filter(col("digit") === 0L)
        .select(col("digit"), col("n"), lit(0L).as("obs_ppm"),
          lit(0L).as("benford_ppm"), lit(0L).as("dev_num")))
  }

  /** Exact-integer autocorrelation function over per-key daily series —
    * the periodicity detector beside the seasonal-naive forecast and the
    * dyadic-EWMA monitor (a weekly-cyclic feed shows acf(7) ≫ acf(1); a
    * trending feed shows slow decay). Input rows are (keys, day, value)
    * with gaps allowed; the series is DENSIFIED on the global [min, max]
    * day spine with zeros (a missing day is a real zero for count
    * series), because ACF over a gappy index silently correlates
    * non-adjacent days.
    *
    * Exactness: with n days, sum S, the centered series is scaled by n —
    * dev_t = n·x_t − S (BIGINT) — so num(lag) = Σ dev_t·dev_{t+lag} and
    * den = Σ dev_t² are exact; the n² factor cancels in the ratio.
    * acf_ppm = sign(num)·((|num|·10⁶) div den) computed in DECIMAL(38,0)
    * (|num|·10⁶ can pass 2⁶³; DuckDB replays in HUGEINT) with
    * sign-magnitude division — both engines truncate toward zero (measured
    * round 12), and sign·(|num| div den) agrees under either truncating or
    * flooring semantics, so it stays the safe spelling. A constant series
    * (den = 0) yields NULL.
    *
    * Scale shape: spine = keys × days (broadcast bounds); per-key stats
    * fold from the spine; ALL lags ride ONE window pass (lead(dev, ℓ)
    * share the window spec) and the lag unpivot is a generator over
    * window-materialized attributes — no re-sort per lag. */
  def autocorrelation(
      df: DataFrame,
      keyCols: Seq[String],
      dayCol: String,
      valueCol: String,
      maxLag: Int): DataFrame = {
    require(keyCols.nonEmpty, "autocorrelation: at least one key column")
    require(maxLag >= 1 && maxLag <= 64, s"autocorrelation: maxLag $maxLag out of [1, 64]")
    import org.apache.spark.sql.expressions.Window
    val q = keyCols.map(col)
    val counts = df.select(q :+ col(dayCol).cast("long").as("__graft_day")
      :+ col(valueCol).cast("long").as("__graft_x"): _*)
    val bounds = counts.agg(
      min(col("__graft_day")).as("__graft_mn"), max(col("__graft_day")).as("__graft_mx"))
    val spine = counts.select(q: _*).distinct()
      .crossJoin(broadcast(bounds))
      .select(q :+ explode(sequence(col("__graft_mn"), col("__graft_mx"))).as("__graft_day"): _*)
      .join(counts, keyCols :+ "__graft_day", "left")
      .withColumn("__graft_xf", coalesce(col("__graft_x"), lit(0L)))
    val stats = spine.groupBy(q: _*)
      .agg(count(lit(1)).as("__graft_n"), sum(col("__graft_xf")).as("__graft_s"))
    val dev = spine.join(stats, keyCols)
      .withColumn("__graft_dev", col("__graft_n") * col("__graft_xf") - col("__graft_s"))
    val w = Window.partitionBy(q: _*).orderBy("__graft_day")
    val led = dev.select(q ++ Seq(col("__graft_n"), col("__graft_dev")) ++
      (1 to maxLag).map(l => lead(col("__graft_dev"), l).over(w).as(s"__graft_l$l")): _*)
    val den = dev.groupBy(q: _*)
      .agg(sum(col("__graft_dev") * col("__graft_dev")).as("__graft_den"),
        max(col("__graft_n")).as("n_days"))
    val stacked = led.select(q :+ col("__graft_dev") :+
      explode(array((1 to maxLag).map(l =>
        struct(lit(l.toLong).as("lag"), col(s"__graft_l$l").as("dl"))): _*)).as("__graft_e"): _*)
      .select(q ++ Seq(col("__graft_dev"), col("__graft_e.lag").as("lag"), col("__graft_e.dl").as("__graft_dl")): _*)
      .filter(col("__graft_dl").isNotNull)
    stacked
      .groupBy(q :+ col("lag"): _*)
      .agg(sum(col("__graft_dev") * col("__graft_dl")).as("__graft_num"))
      .join(den, keyCols)
      .withColumn("acf_ppm",
        when(col("__graft_den") === 0L, lit(null).cast("long")).otherwise(
          (when(col("__graft_num") < 0L, -1L).otherwise(1L) *
            expr("(CAST(abs(__graft_num) AS DECIMAL(38,0)) * 1000000) div __graft_den"))
            .cast("long")))
      .select(q ++ Seq(col("lag"), col("n_days").cast("long").as("n_days"), col("acf_ppm")): _*)
  }

  /** Population Stability Index in fixed-point log₂ — THE production
    * score/feature drift monitor (credit-risk heritage, now standard in
    * every ML feature store) beside the rank-based KS: per bucket b,
    * PSI = Σ (p_a − p_b)·log(p_a/p_b), every term ≥ 0, big = drifted.
    *
    * Engine-stable exactness: natural log is libm territory, so this is
    * the LOG₂ variant in 1/16-resolution fixed point (the q237/q288
    * idiom): with Laplace-smoothed counts c' = c + 1 over the per-group
    * bucket UNION, term_b = (c'_a·N'_b − c'_b·N'_a) ·
    * (flog2fp(c'_a·N'_b) − flog2fp(c'_b·N'_a)) — both factors share sign
    * (floor-log₂ is monotone), so terms stay ≥ 0 exactly like true PSI.
    * psi_ppm = Σterm·10⁶ div (16·N'_a·N'_b) puts it on the log₂-PSI
    * scale. Buckets are the caller's (quantize first — fixed-width or
    * quantile edges); smoothing keeps one-sided buckets finite, the
    * standard PSI practice.
    *
    * Scale: one census aggregation (groupBy group×bucket with conditional
    * sums), one group-total window over the census, one fold — no per-row
    * sort, no join. Returns (groupCols*, n_a, n_b, n_buckets, psi_num,
    * psi_ppm). Groups missing a side entirely are dropped. */
  def psiLog2(
      df: DataFrame,
      bucketCol: String,
      sideCol: String,
      sideA: String,
      sideB: String,
      groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val census = df
      .filter(col(sideCol).isin(sideA, sideB))
      .groupBy((gs :+ col(bucketCol).as("__dr_bucket")): _*)
      .agg(
        sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("__dr_ca"),
        sum(when(col(sideCol) === sideB, 1L).otherwise(0L)).as("__dr_cb"))
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val smoothed = census
      .withColumn("__dr_nb", count(lit(1)).over(wTot))
      .withColumn("__dr_na2", sum(col("__dr_ca")).over(wTot) + col("__dr_nb"))
      .withColumn("__dr_nb2", sum(col("__dr_cb")).over(wTot) + col("__dr_nb"))
      .filter(col("__dr_na2") > col("__dr_nb") && col("__dr_nb2") > col("__dr_nb"))
      .withColumn("__dr_xa", (col("__dr_ca") + 1L) * col("__dr_nb2"))
      .withColumn("__dr_xb", (col("__dr_cb") + 1L) * col("__dr_na2"))
    val term = (col("__dr_xa") - col("__dr_xb")) *
      (graft.operators.Linkage.flog2fp(col("__dr_xa")) -
        graft.operators.Linkage.flog2fp(col("__dr_xb")))
    val agg = smoothed
      .groupBy(gs: _*)
      .agg(
        (max(col("__dr_na2")) - max(col("__dr_nb"))).as("n_a"),
        (max(col("__dr_nb2")) - max(col("__dr_nb"))).as("n_b"),
        max(col("__dr_nb")).cast("long").as("n_buckets"),
        sum(term).as("psi_num"),
        (lit(16L) * max(col("__dr_na2")) * max(col("__dr_nb2"))).as("__dr_den"))
    RankStats.withPpm(agg, col("psi_num"), col("__dr_den"), "psi_ppm")
      .drop("__dr_den")
  }

  /** Hampel filter — rolling-median outlier tagging for time series (the
    * ROLLING counterpart of the global MAD q99: a level-shifting series
    * makes a global threshold useless; the local window adapts): each
    * point compares against the median of its ±half window, flagged when
    * |x − med| > k·rollingMAD. Exactness: the window is SMALL and ODD
    * (2·half+1), so median = element_at(array_sort(collect_list over the
    * window), half+1) — a PICK from a bounded sorted array, deterministic
    * on both engines, no percentile interpolation; the MAD recomputes the
    * same way over |x−med|. Series edges (incomplete windows) are not
    * flagged — no median to trust. k is a rational kNum/kDen so the
    * threshold test is pure integer cross-multiplication.
    *
    * Scale: one key-partitioned window pass carrying a (2·half+1)-element
    * array per row — rolling state, never a global sort. Input values
    * must be integers (quantize first). Returns the input plus
    * (med, dev, is_outlier).
    *
    * Determinism under duplicate x: the window orders by (x, y) — rows
    * that tie on BOTH are interchangeable (equal y contributes the same
    * multiset to every covering window), so med/MAD/is_outlier are
    * deterministic across runs and partitionings with no uniqueness
    * precondition. Callers replaying in SQL must mirror the same
    * two-column ORDER BY. */
  def hampelOutliers(
      series: DataFrame,
      keyCol: String, xCol: String, yCol: String,
      half: Int = 3,
      kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(half >= 1 && half <= 50, s"hampelOutliers: half in [1,50], got $half")
    require(kNum >= 0 && kDen >= 1, s"hampelOutliers: bad threshold $kNum/$kDen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(xCol), col(yCol).cast("long"))
      .rowsBetween(-half, half)
    val full = 2 * half + 1
    val withMed = series
      .withColumn("__dr_win", collect_list(col(yCol).cast("long")).over(w))
      .withColumn("__dr_full", size(col("__dr_win")) === full)
      .withColumn("med",
        when(col("__dr_full"),
          element_at(array_sort(col("__dr_win")), half + 1)).cast("long"))
    withMed
      .withColumn("__dr_devs",
        when(col("__dr_full"), expr(s"transform(__dr_win, v -> abs(v - med))")))
      .withColumn("dev", abs(col(yCol).cast("long") - col("med")))
      .withColumn("__dr_mad",
        when(col("__dr_full"),
          element_at(array_sort(col("__dr_devs")), half + 1)).cast("long"))
      .withColumn("is_outlier",
        when(!col("__dr_full"), lit(false))
          .otherwise(col("dev") * lit(kDen) > col("__dr_mad") * lit(kNum)))
      .drop("__dr_win", "__dr_devs", "__dr_full", "__dr_mad")
  }
  /** Two-window χ² homogeneity per slice, with a CONSERVATIVE integer
    * p-value — the drift-detection front half of the monitoring stack
    * (per-slice drift p-values feed [[Sequential.bhFdr]] across slices;
    * q362 composes exactly that). Rows carry an integer bin and a boolean
    * "current window" flag; per slice the 2×B contingency table yields the
    * exact Pearson statistic
    *   χ²·10⁶ = Σ_cells ((N·o − r·c)²·10⁶) div (N·r·c)
    * (per-cell truncating division of exact DECIMAL(38,0) integers — the
    * Nelson–Aalen truncation contract, order-independent because each term
    * is a pure cell function). The p-value is the MARKOV BOUND
    * p = min(1, 2·df/χ²) with df = bins−1 — conservative by construction
    * (E[χ²] ≈ df under H0; the factor 2 absorbs the fixed-margin
    * correction), exact-integer, and monotone in χ², which is all a
    * BH-FDR layer needs: a genuinely drifted slice's χ² grows ∝ N while
    * null slices sit at O(df), so planted signals cross any α. A slice
    * with an empty window reports p = 10⁶ (no evidence, never a division
    * error). Returns (sliceCols*, n_ref, n_cur, n_bins, chi2_upm, p_ppm).
    * Scale: one row-linear census groupBy, then census-sized windows. */
  def chi2Homogeneity(
      df: DataFrame,
      binCol: String,
      curCol: String,
      sliceCols: Seq[String]): DataFrame = {
    require(sliceCols.nonEmpty,
      "chi2Homogeneity: empty sliceCols — inject a literal constant slice column")
    import org.apache.spark.sql.graft.Idiv
    val gs = sliceCols.map(col)
    val census = df
      .groupBy((gs :+ col(binCol).cast("long").as("__dr_bin")): _*)
      .agg(
        sum(when(col(curCol), 0L).otherwise(1L)).as("__dr_oref"),
        sum(when(col(curCol), 1L).otherwise(0L)).as("__dr_ocur"))
    val wTot = Window.partitionBy(gs: _*)
    val cells = census
      .withColumn("__dr_rref", sum(col("__dr_oref")).over(wTot))
      .withColumn("__dr_rcur", sum(col("__dr_ocur")).over(wTot))
      .withColumn("__dr_c", col("__dr_oref") + col("__dr_ocur"))
      .withColumn("__dr_n", col("__dr_rref") + col("__dr_rcur"))
      .withColumn("__dr_b", count(lit(1)).over(wTot))
    def term(o: String, r: String) = when(col(r) === 0L, lit(0L)).otherwise(Idiv(
      (col("__dr_n").cast("decimal(38,0)") * col(o) -
        col(r).cast("decimal(38,0)") * col("__dr_c")) *
        (col("__dr_n").cast("decimal(38,0)") * col(o) -
          col(r).cast("decimal(38,0)") * col("__dr_c")) * 1000000L,
      col("__dr_n").cast("decimal(38,0)") * col(r) * col("__dr_c")).cast("long"))
    cells
      .withColumn("__dr_t",
        term("__dr_oref", "__dr_rref") + term("__dr_ocur", "__dr_rcur"))
      .groupBy(gs: _*)
      .agg(
        max(col("__dr_rref")).as("n_ref"),
        max(col("__dr_rcur")).as("n_cur"),
        max(col("__dr_b")).as("n_bins"),
        sum(col("__dr_t").cast("decimal(38,0)")).as("__dr_chi"))
      .withColumn("chi2_upm", col("__dr_chi").cast("long"))
      .withColumn("p_ppm",
        when(col("chi2_upm") <= 0L || col("n_ref") === 0L || col("n_cur") === 0L,
          lit(1000000L))
          .otherwise(least(lit(1000000L), Idiv(
            lit(2L) * (col("n_bins") - 1L).cast("decimal(38,0)") * 1000000000000L,
            col("__dr_chi")).cast("long"))))
      .drop("__dr_chi")
  }

  /** Single change-point by binary segmentation (the first split of the
    * classic CUSUM-of-means scan): per series, the position k maximizing
    * the between-segment statistic
    *   G_k·10⁶ = ((n·P_k − k·T)²·10⁶) div (n·k·(n−k))
    * (P_k = prefix sum, T = total — G is n·k(n−k)/n²·(mean_L − mean_R)²,
    * the variance explained by splitting at k). The pick is a MAX over the
    * exact integer tuple (g_upm, −k) — ties to the earliest position, the
    * Theil–Sen total-order discipline, so the argmax is engine-stable.
    * Positions are a per-group WINDOW over the series census (one row per
    * position — series are census-scale: daily/hourly aggregates, never
    * raw rows; the Hampel q338 contract). Returns per group:
    * (groupCols*, n, split_pos, g_upm, mean_left_micro, mean_right_micro).
    * Groups with n < 2 are dropped (no interior split exists). */
  def binarySegmentOne(
      df: DataFrame,
      posCol: String,
      valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "binarySegmentOne: empty groupCols would plan a single-task global " +
        "window — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val wRun = Window.partitionBy(gs: _*).orderBy(col("__dr_pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(gs: _*)
    val scanned = df
      .select((gs :+ col(posCol).cast("long").as("__dr_pos") :+
        col(valueCol).cast("long").as("__dr_v")): _*)
      .withColumn("__dr_k", count(lit(1)).over(wRun))
      .withColumn("__dr_p", sum(col("__dr_v")).over(wRun))
      .withColumn("__dr_n", count(lit(1)).over(wTot))
      .withColumn("__dr_t", sum(col("__dr_v")).over(wTot))
      .filter(col("__dr_n") >= 2L && col("__dr_k") < col("__dr_n"))
      .withColumn("__dr_g", Idiv(
        (col("__dr_n").cast("decimal(38,0)") * col("__dr_p") -
          col("__dr_k").cast("decimal(38,0)") * col("__dr_t")) *
          (col("__dr_n").cast("decimal(38,0)") * col("__dr_p") -
            col("__dr_k").cast("decimal(38,0)") * col("__dr_t")) * 1000000L,
        col("__dr_n").cast("decimal(38,0)") * col("__dr_k") *
          (col("__dr_n") - col("__dr_k"))).cast("long"))
    scanned
      .groupBy(gs: _*)
      .agg(
        max(col("__dr_n")).as("n"),
        max(col("__dr_t")).as("__dr_tt"),
        max(struct(col("__dr_g"), (-col("__dr_k")).as("negk"),
          col("__dr_pos").as("pos"), col("__dr_p").as("pfx"))).as("__dr_m"))
      .withColumn("split_pos", col("__dr_m.pos"))
      .withColumn("g_upm", col("__dr_m.__dr_g"))
      .withColumn("mean_left_micro",
        Idiv(col("__dr_m.pfx") * 1000000L, -col("__dr_m.negk")))
      .withColumn("mean_right_micro",
        Idiv((col("__dr_tt") - col("__dr_m.pfx")) * 1000000L,
          col("n") + col("__dr_m.negk")))
      .select((gs :+ col("n") :+ col("split_pos") :+ col("g_upm") :+
        col("mean_left_micro") :+ col("mean_right_micro")): _*)
  }

  /** Mann–Kendall trend test per series (Mann 1945 / Kendall 1975 — THE
    * nonparametric monotone-trend monitor for metric time series: no
    * distribution assumed, ties handled exactly). Input: ONE value per
    * (group, time) — duplicate times refuse loudly (aggregate to the
    * period grid first; series are census-scale by the Hampel contract).
    *   S = Σ_{t_i < t_j} sgn(x_j − x_i)                (exact integer)
    *   18·Var(S) = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)  (exact integer)
    * and the 5 % two-sided normal decision rides the exact rational
    * 11250·(|S|−1)² ≥ 2401·var18 (z ≥ 1.96 = 49/25 with the standard
    * continuity correction — cross-multiplied, no sqrt, no libm).
    * `trend` = sign(S) when significant, else 0. The pair sum is a
    * series-census self-join (n² census pairs, the kendallPairs shape),
    * checkpointed + explicitly repartitioned before the expansion.
    * Returns (groupCols*, n, s, var18, trend). */
  def mannKendall(
      df: DataFrame, timeCol: String, valueCol: String, groupCols: Seq[String],
      censusPartitions: Int = 32): DataFrame = {
    require(groupCols.nonEmpty,
      "mannKendall: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val series = df.select((gs :+ col(timeCol).as("__dr_t") :+
      col(valueCol).cast("long").as("__dr_v")): _*)
      .repartition(censusPartitions)
      .localCheckpoint(true) // self-joined + tie-censused below
    val dup = series.groupBy((gs :+ col("__dr_t")): _*).agg(count(lit(1)).as("__dr_c"))
      .filter(col("__dr_c") > 1L).limit(1).collect()
    require(dup.isEmpty,
      "mannKendall: duplicate time points in a series — aggregate to the " +
        "period grid first (one value per (group, time))")
    val a = series.select((gs :+ col("__dr_t").as("__dr_ta") :+
      col("__dr_v").as("__dr_va")): _*)
    val b = series.select((gs :+ col("__dr_t").as("__dr_tb") :+
      col("__dr_v").as("__dr_vb")): _*)
    val sAgg = a.join(b, groupCols)
      .filter(col("__dr_tb") > col("__dr_ta"))
      .groupBy(gs: _*)
      .agg(sum(signum(col("__dr_vb") - col("__dr_va")).cast("long")).as("s"))
    val ties = series.groupBy((gs :+ col("__dr_v")): _*).agg(count(lit(1)).as("__dr_tc"))
      .groupBy(gs: _*)
      .agg(
        sum(col("__dr_tc")).as("n"),
        sum(col("__dr_tc") * (col("__dr_tc") - 1L) * (lit(2L) * col("__dr_tc") + 5L))
          .as("__dr_tsum"))
    ties.join(sAgg, groupCols)
      .withColumn("var18",
        col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) - col("__dr_tsum"))
      .withColumn("__dr_sa", abs(col("s")) - 1L)
      .withColumn("trend",
        when(col("s") === 0L || col("n") < 2L, 0L)
          .otherwise(when(
            lit(11250L) * col("__dr_sa").cast("decimal(38,0)") * col("__dr_sa") >=
              lit(2401L) * col("var18"),
            signum(col("s")).cast("long")).otherwise(0L)))
      .select((gs :+ col("n") :+ col("s") :+ col("var18") :+ col("trend")): _*)
  }

  /** Wald–Wolfowitz runs test per series (Wald & Wolfowitz 1940) — is a
    * binary sequence RANDOMLY ordered, or does it cluster/alternate? The
    * residual-sign monitor beside [[mannKendall]]: a drifting metric
    * clusters its above-median days into few long runs. Input: one
    * boolean per (group, time), duplicate times refuse (the mannKendall
    * contract). With n₁ trues, n₀ falses, n = n₁+n₀ and R runs (maximal
    * same-value stretches in time order):
    *   E[R] = 1 + 2n₁n₀/n,   Var[R] = 2n₁n₀(2n₁n₀−n) / (n²(n−1))
    * and with d = R·n − (n + 2n₁n₀) = n·(R − E[R]) the 5 % two-sided
    * normal decision rides the exact rational cross-multiplication
    *   625 · d² · (n−1)  ≥  2401 · 2n₁n₀ · (2n₁n₀ − n)
    * (z² = d²(n−1)/(2n₁n₀(2n₁n₀−n)), 1.96 = 49/25) — no sqrt, no libm. `verdict` = −1 (too few runs: clustering/drift), +1
    * (too many: alternation), 0 (consistent with randomness). One-sided
    * sequences (n₁ = 0 or n₀ = 0) report verdict 0 with runs = 1 — there
    * is nothing to order. The run count is one census-sized LAG window.
    * Returns (groupCols*, n, n_true, runs, verdict). */
  def runsTest(
      df: DataFrame, timeCol: String, boolCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "runsTest: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val series = df.select((gs :+ col(timeCol).as("__dr_t") :+
      col(boolCol).cast("boolean").as("__dr_b")): _*)
    val dup = series.groupBy((gs :+ col("__dr_t")): _*).agg(count(lit(1)).as("__dr_c"))
      .filter(col("__dr_c") > 1L).limit(1).collect()
    require(dup.isEmpty,
      "runsTest: duplicate time points in a series — aggregate to the " +
        "period grid first (one value per (group, time))")
    val w = Window.partitionBy(gs: _*).orderBy(col("__dr_t"))
    series
      .withColumn("__dr_new",
        when(lag(col("__dr_b"), 1).over(w).isNull ||
          lag(col("__dr_b"), 1).over(w) =!= col("__dr_b"), 1L).otherwise(0L))
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__dr_b"), 1L).otherwise(0L)).as("n_true"),
        sum(col("__dr_new")).as("runs"))
      .withColumn("__dr_n0", col("n") - col("n_true"))
      .withColumn("__dr_p", lit(2L) * col("n_true") * col("__dr_n0"))
      .withColumn("__dr_d", col("runs") * col("n") - col("n") - col("__dr_p"))
      .withColumn("verdict",
        when(col("n_true") === 0L || col("__dr_n0") === 0L || col("n") < 2L, 0L)
          .otherwise(when(
            lit(625L) * col("__dr_d").cast("decimal(38,0)") * col("__dr_d") *
              (col("n") - 1L) >=
              lit(2401L) * col("__dr_p").cast("decimal(38,0)") *
                (col("__dr_p") - col("n")),
            signum(col("__dr_d")).cast("long")).otherwise(0L)))
      .select((gs :+ col("n") :+ col("n_true") :+ col("runs") :+ col("verdict")): _*)
  }
}
