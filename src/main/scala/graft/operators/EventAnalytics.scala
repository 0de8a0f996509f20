package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clickstream/event-log analytics: first-order transition matrices and
  * seasonal-naive forecast monitoring. Both are window/aggregation
  * compositions keyed on (user, time) — one shuffle each, no iteration —
  * and both keep their derived metrics in FIXED-POINT integers so results
  * are bit-stable across engines and partitionings.
  */
object EventAnalytics {

  /** First-order Markov transition counts + fixed-point probabilities:
    * per user, events are ordered by (ts, tieCol) and each consecutive
    * pair (prev_type → cur_type) contributes one observation. Output per
    * ordered type pair: transition count and
    * `prob_ppm = (1e6 * count) div total-out-of-prev`.
    *
    * Scale shape: ONE shuffle on the user key for the lag window (per-user
    * sort only — never a global sort), then a map-side-partial aggregation
    * on the (prev, cur) pair; the per-prev totals come from re-aggregating
    * the pair counts (grouped rows, not events). The tie column makes the
    * within-user order total, so the pair multiset is deterministic even
    * with duplicate timestamps.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      scale: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("__graft_prev", lag(col(typeCol), 1).over(w))
      .filter(col("__graft_prev").isNotNull)
      .groupBy(col("__graft_prev").as("prev_type"), col(typeCol).as("cur_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("__graft_tot", sum(col("n")).over(totals))
      .select(
        col("prev_type"),
        col("cur_type"),
        col("n"),
        expr(s"($scale * n) div __graft_tot").as("prob_ppm"))
  }

  /** Last-touch attribution: each conversion event credits the LATEST
    * preceding touch event (same key, touch strictly-or-equal before the
    * conversion under the (ts, tie) total order, within `windowDays`);
    * conversions with no in-window touch report as `unattributed`. Output:
    * (channel, n_conversions).
    *
    * Scale shape: ONE key-partitioned window pass — the last touch is
    * carried forward with `last(_, ignoreNulls)` over rows-unbounded-
    * preceding (the two carried columns are null on exactly the same
    * rows, so they always come from the same touch row). No self-join of
    * the event log, no per-conversion probe. */
  def lastTouchAttribution(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      touchTypes: Seq[String],
      conversionType: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"lastTouchAttribution: windowDays must be >= 1, got $windowDays")
    require(!touchTypes.contains(conversionType),
      "lastTouchAttribution: the conversion type cannot also be a touch type")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val horizonMicros = windowDays.toLong * 86400L * 1000000L
    events
      .withColumn("__graft_tts", last(when(isTouch, unix_micros(col(tsCol))), ignoreNulls = true).over(w))
      .withColumn("__graft_tty", last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("channel",
        when(col("__graft_tts").isNotNull &&
          unix_micros(col(tsCol)) - col("__graft_tts") <= horizonMicros, col("__graft_tty"))
          .otherwise(lit("unattributed")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Inter-arrival burstiness profile: per key-ordered consecutive event
    * gaps, bucketed by floor-log2 of the gap in seconds (bucket −1 =
    * sub-second), counted per (type, bucket) — the traffic-shape
    * fingerprint that separates steady feeds from bursty ones. Integer
    * end-to-end (floor-log2 via `length(bin(x)) − 1`, the q90/q151
    * spelling DuckDB mirrors exactly). One key-partitioned window, then a
    * bucket-sized aggregate. */
  def interArrivalProfile(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__graft_gap",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__graft_gap").isNotNull)
      .withColumn("bucket",
        when(col("__graft_gap") < 1000000L, lit(-1L))
          .otherwise(expr("CAST(length(bin(__graft_gap div 1000000)) - 1 AS BIGINT)")))
      .groupBy(col(typeCol), col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
  }

  /** Per-key daily-volume TREND via exact least squares: with x = day
    * index and y = daily count (both integers), the OLS slope is the
    * rational
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * whose numerator and denominator are EXACT BIGINTs — so the
    * growing/shrinking/flat classification (sign of the numerator; the
    * denominator is ≥ 0 always) is engine-portable without a single
    * double. Emits per key: days, numerator, denominator, slope_mppm
    * (slope in milli-ppm: (10⁹·num) div den, NULL for a single day).
    * Gap days count 0 — the dense spine again.
    *
    * Overflow envelope: |num| ≤ n²·max_day_count·max_x; with day indices
    * rebased to 0..n−1 (done here) and n ≤ 10⁴ days of ≤ 10⁹ rows/day,
    * products stay under 2⁶². */
  def dailyTrend(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("day"), col("lo"))
      .crossJoin(daily.select("key").distinct())
    spine
      .join(daily, Seq("key", "day"), "left")
      .select(
        col("key"),
        datediff(col("day"), col("lo")).cast("long").as("x"),
        coalesce(col("n"), lit(0L)).as("y"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(
        col("key"), col("days"),
        (col("days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("days") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope_mppm",
        when(col("slope_den") > 0, expr("(1000000000 * slope_num) div slope_den")))
      .withColumn("trend",
        when(col("slope_num") > 0, "growing")
          .when(col("slope_num") < 0, "shrinking").otherwise("flat"))
  }

  /** CUSUM change-point detection on a key's daily counts: with total T
    * over n days, the centered cumulative sum S_d = Σ_{i≤d} (n·y_i − T)
    * is EXACT in BIGINT (counts scaled by n instead of subtracting the
    * fractional mean); the change point is the day maximizing |S_d|
    * (ties → earliest day). Emits per key: the argmax day offset, the
    * peak |S| and its sign (level shift up vs down), and n·T for scale
    * context. One dense-spine window pass per key. */
  def cusumChangePoint(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("day"), col("lo"))
      .crossJoin(daily.select("key").distinct())
    val dense = spine
      .join(daily, Seq("key", "day"), "left")
      .select(
        col("key"),
        datediff(col("day"), col("lo")).cast("long").as("x"),
        coalesce(col("n"), lit(0L)).as("y"))
    val wk = Window.partitionBy(col("key"))
    val wcum = Window.partitionBy(col("key")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("nd", count(lit(1)).over(wk))
      .withColumn("tot", sum(col("y")).over(wk))
      .withColumn("s", sum(col("y") * col("nd") - col("tot")).over(wcum))
      .groupBy(col("key"))
      .agg(
        max(struct(abs(col("s")).as("a"), (-col("x")).as("nx"), col("s").as("sv")))
          .as("__graft_m"),
        max(col("nd")).as("days"),
        max(col("tot")).as("total"))
      .select(
        col("key"), col("days"), col("total"),
        (-col("__graft_m.nx")).as("change_day"),
        col("__graft_m.a").as("peak_abs"),
        when(col("__graft_m.sv") >= 0, "up_then_down").otherwise("down_then_up").as("shift"))
  }

  /** Seasonal-naive forecast error monitor: daily observation counts per
    * key over a DENSE date spine (missing days count 0 — a gap is real
    * signal, not absence of a row), forecast(d) = actual(d − period),
    * scored on every day with a defined forecast. Output per key:
    * days scored, total actual, total absolute error, and
    * `mae_ppm = (1e6 * Σ|err|) div Σ actual` (NULL when the actual total
    * is 0 — no volume to be wrong about).
    *
    * Scale shape: the raw events reduce to (key, day) counts FIRST
    * (map-side partials over the full volume), and everything after —
    * spine fill, lag, scoring — runs on keys × days rows only. The spine
    * bounds come from one global min/max aggregate (2 values broadcast,
    * not collected rows).
    */
  def seasonalNaiveError(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 1, s"seasonalNaiveError: period must be >= 1, got $period")
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .crossJoin(daily.select("key").distinct())
    val dense = spine
      .join(daily, Seq("key", "day"), "left")
      .withColumn("actual", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    dense
      .withColumn("fc", lag(col("actual"), period).over(w))
      .filter(col("fc").isNotNull)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("days_scored"),
        sum(col("actual")).as("total_actual"),
        sum(abs(col("actual") - col("fc"))).as("total_abs_err"))
      .withColumn(
        "mae_ppm",
        when(col("total_actual") > 0, expr("(1000000 * total_abs_err) div total_actual")))
  }

  /** Dyadic-weight exponential smoothing monitor: per key and day (dense
    * spine — gaps count 0), the PAST-only weighted history sum
    * `s_t = Σ_{j=1..depth} c_{t−j} · 2^{depth−j}` (yesterday weighs
    * 2^(depth−1), the oldest day 1; weight mass 2^depth − 1). Today is
    * deliberately excluded from its own baseline — a smoother containing
    * 128·c_t would dampen the very spike it is meant to flag. Dyadic
    * weights make the smoother EXACT BIGINT arithmetic — the float EWMA's
    * α-power products are libm territory and flap across engines; this
    * one is a fixed-depth integer window, the TVD/CUSUM move applied to
    * smoothing. Flags by cross-multiplication (never a division):
    * `spike` when (2^depth−1)·c_t > 2·s_t (today more than twice the
    * smoothed level), `drop` when 2·(2^depth−1)·c_t < s_t.
    * Only days with FULL depth-day history score — a partial window would
    * silently compare against a different weight mass.
    *
    * Scale shape: events reduce to (key, day) counts before any window
    * (the q172 spine pattern); the lag window shuffles once on key. */
  def dyadicEwma(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      depth: Int = 8): DataFrame = {
    require(depth >= 2 && depth <= 32, s"dyadicEwma: depth $depth must be in [2, 32]")
    val daily = events
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .crossJoin(daily.select("key").distinct())
    val dense = spine
      .join(daily, Seq("key", "day"), "left")
      .withColumn("cnt", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val sTerms = (1 to depth).map { j =>
      lag(col("cnt"), j).over(w) * lit(1L << (depth - j))
    }
    val mass = (1L << depth) - 1L
    dense
      .withColumn("oldest", lag(col("cnt"), depth).over(w))
      .withColumn("ewma_num", sTerms.reduce(_ + _))
      .filter(col("oldest").isNotNull)
      .select(
        col("key"), col("day"), col("cnt"), col("ewma_num"),
        when(lit(mass) * col("cnt") > lit(2L) * col("ewma_num"), "spike")
          .when(lit(2L * mass) * col("cnt") < col("ewma_num"), "drop")
          .otherwise("normal").as("flag"))
  }

  /** Frequent GAPPED event sequences (GSP / PrefixSpan family — the
    * sequential-pattern complement of the contiguous n-gram views q192
    * materializes and of the closed-pattern ASSOCIATION miner): a
    * sequence <a₁ … aₖ> is supported by a user when their event stream —
    * under the TOTAL (pos) order the caller supplies — contains the items
    * in order with arbitrary gaps; support is the DISTINCT-user count,
    * and every sequence with support ≥ minSupport up to maxLen is
    * returned.
    *
    * Levelwise with the EARLIEST-OCCURRENCE invariant: per (user,
    * prefix) only the minimal end position is carried — sufficient for
    * existence (a gapped subsequence embeds iff its greedy earliest
    * embedding does) and what keeps level state at one row per (user,
    * frequent prefix) instead of per embedding (embedding counts explode
    * combinatorially; existence does not). Each level is one equi-join on
    * user (events after the prefix's end) + one min-aggregation + one
    * support count — all node-key shuffles; anti-monotone pruning
    * (Apriori) cuts non-frequent prefixes before they expand, and the
    * expansion streams into a partial aggregate within the join stage, so
    * no materialized blow-up. State checkpointed per level.
    *
    * `ordered` needs (user, item, pos) with pos a TOTAL order per user —
    * ties in the underlying timestamp must be broken deterministically by
    * the caller (row_number over (ts, id)), or supports become
    * partitioning-dependent. Returns (seq, length, support), seq joined
    * with '>' in order. */
  def frequentSequences(
      ordered: DataFrame,
      minSupport: Long,
      maxLen: Int): DataFrame = {
    require(minSupport >= 1, s"frequentSequences: minSupport must be >= 1, got $minSupport")
    require(maxLen >= 1, s"frequentSequences: maxLen must be >= 1, got $maxLen")
    // loop-carried checkpoints go through CheckpointFresh (stats clamp) and
    // the level-emptiness probe rides the eager count — no isEmpty job
    val cf = org.apache.spark.sql.graft.CheckpointFresh
    val ev = cf(ordered.select(col("user"), col("item"), col("pos")))
    // level 1: earliest occurrence of each item per user
    var (occ, occCount) = cf.withCount(ev.groupBy(col("user"), col("item").as("seq"))
      .agg(min(col("pos")).as("__mp")))
    var results = Seq.empty[DataFrame]
    var level = 1
    while (level <= maxLen && occCount > 0L) {
      val support = cf(occ.groupBy(col("seq"))
        .agg(count(lit(1)).cast("long").as("support"))
        .filter(col("support") >= minSupport))
      results = results :+ support.withColumn("length", lit(level.toLong))
      if (level < maxLen) {
        val frequent = occ.join(support.select(col("seq")), Seq("seq"), "left_semi")
        val stepped = cf.withCount(frequent
          .join(ev, Seq("user"))
          .filter(col("pos") > col("__mp"))
          .groupBy(col("user"), concat(col("seq"), lit(">"), col("item")).as("seq"))
          .agg(min(col("pos")).as("__mp")))
        occ = stepped._1
        occCount = stepped._2
      }
      level += 1
    }
    results.reduce(_.unionByName(_)).select(col("seq"), col("length"), col("support"))
  }

  /** Exponential time-decay multi-touch attribution — the recency-weighted
    * credit model beside last-touch (q182) and U-shaped positional
    * (q255): every touch within the lookback window of a conversion earns
    * credit halving per day of gap. The half-life is a POWER OF TWO so
    * credit is an exact integer SHIFT — credit_ppm = 10⁶ >> gap_days,
    * floored at gap ≥ 20 days to 0 — no float decay, both engines agree
    * bit-for-bit (the "never libm in scored paths" discipline).
    *
    * Shape: one per-key equi-join of touches × conversions filtered to
    * the window — candidate volume is per-key activity-bounded, the same
    * join the funnel/interval operators run; at 100 TB the key is the
    * shuffle key and a hot user is an ordinary AQE-skewable key. Returns
    * per touch-type: n_touches (credited pairs) and credit_ppm (Σ of
    * shifted credits, exact BIGINT). */
  def timeDecayAttribution(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      touchTypes: Seq[String],
      conversionType: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 60,
      s"timeDecayAttribution: windowDays in [1,60], got $windowDays")
    require(!touchTypes.contains(conversionType),
      "timeDecayAttribution: the conversion type cannot also be a touch type")
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(keyCol).as("__ta_k"), col(typeCol).as("__ta_ty"),
        unix_micros(col(tsCol)).as("__ta_tts"))
    val convs = events.filter(col(typeCol) === conversionType)
      .select(col(keyCol).as("__ta_k"), unix_micros(col(tsCol)).as("__ta_cts"))
    val horizonMicros = windowDays.toLong * 86400L * 1000000L
    touches
      .join(convs, Seq("__ta_k"))
      .filter(col("__ta_tts") <= col("__ta_cts") &&
        col("__ta_cts") - col("__ta_tts") <= horizonMicros)
      .withColumn("__ta_gap",
        expr("(__ta_cts - __ta_tts) div 86400000000").cast("int"))
      .withColumn("__ta_credit",
        when(col("__ta_gap") >= 20, 0L)
          .otherwise(expr("shiftright(1000000L, __ta_gap)")))
      .groupBy(col("__ta_ty").as("channel"))
      .agg(
        count(lit(1)).cast("long").as("n_touches"),
        sum(col("__ta_credit")).cast("long").as("credit_ppm"))
  }

  /** Theil–Sen robust slope per key — the outlier-immune counterpart of
    * [[dailyTrend]]'s exact OLS (one corrupted day flips an OLS monitor;
    * the MEDIAN of pairwise slopes shrugs at < 29% contamination, the
    * best possible breakdown for a slope estimator): over a per-key
    * series (x, y), slope = median over all i<j of (y_j−y_i)/(x_j−x_i).
    *
    * Exactness discipline: the median is a PICK, not an aggregate — pairs
    * sort by their IEEE-double slope (the same two longs divide to the
    * same double on every engine) with a total (dy, dx, x_i, x_j)
    * tie-break, and the ⌈m/2⌉-th pair's EXACT integer (dy, dx) is the
    * result, so the reported rational never touches float rounding.
    * Pair volume is n²/2 per key with n = series LENGTH (days, not rows)
    * — quantize/bucket time first; the explicit-N repartition guards the
    * expansion (q115 rule). Returns (key, n_points, n_pairs, dy, dx,
    * slope_ppm = dy·10⁶ div dx sign-magnitude). */
  def theilSenSlope(
      series: DataFrame,
      keyCol: String, xCol: String, yCol: String,
      pairPartitions: Int = 32): DataFrame = {
    val base = series.select(col(keyCol).as("__th_k"),
        col(xCol).cast("long").as("__th_x"), col(yCol).cast("long").as("__th_y"))
      .repartition(pairPartitions)
      .localCheckpoint(true) // self-joined
    val a = base.select(col("__th_k"), col("__th_x").as("__th_xi"), col("__th_y").as("__th_yi"))
    val b = base.select(col("__th_k"), col("__th_x").as("__th_xj"), col("__th_y").as("__th_yj"))
    val pairs = a.join(b, Seq("__th_k"))
      .filter(col("__th_xi") < col("__th_xj"))
      .select(col("__th_k"),
        (col("__th_yj") - col("__th_yi")).as("__th_dy"),
        (col("__th_xj") - col("__th_xi")).as("__th_dx"),
        col("__th_xi"), col("__th_xj"))
      .withColumn("__th_slope", col("__th_dy").cast("double") / col("__th_dx").cast("double"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__th_k"))
      .orderBy(col("__th_slope"), col("__th_dy"), col("__th_dx"),
        col("__th_xi"), col("__th_xj"))
    val stats = series.groupBy(col(keyCol).as("__th_k"))
      .agg(count(lit(1)).as("n_points"))
    pairs
      .withColumn("__th_rk", row_number().over(w))
      .withColumn("__th_m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__th_k"))))
      .filter(col("__th_rk") === expr("(__th_m + 1) div 2"))
      .join(stats, Seq("__th_k"))
      .select(col("__th_k").as(keyCol), col("n_points"),
        col("__th_m").as("n_pairs"), col("__th_dy").as("dy"), col("__th_dx").as("dx"))
      .transform(d => RankStats.withPpm(d, col("dy"), col("dx"), "slope_ppm"))
  }

  /** Retention cohort triangle — THE product-analytics table (and the
    * data-pipeline health view: does a crawl/user/source keep producing?):
    * users cohort by their FIRST activity period, and cell (cohort,
    * offset) counts how many of that cohort were active `offset` periods
    * later, with retention as the exact ppm share of the cohort's size.
    *
    * Exactness: periods are integer `day div periodDays`; activity
    * dedupes to the (user, period) census FIRST (a user active twice in a
    * period counts once — the standard cohort convention), cohort = each
    * user's min period (one aggregation over the census), cells = one
    * groupBy over the census joined to cohorts. Offset 0 is the cohort
    * size by construction (every user is active in their first period),
    * so retention_ppm(0) = 10⁶ exactly — a built-in self-check.
    *
    * Scale shape: two shuffles over the (user, period) census (distinct +
    * min) and one broadcast-friendly cohort-size join; no windows, no
    * row-scale sort. Returns (cohort, offset, n_active, cohort_size,
    * retention_ppm) sorted upstream by the caller. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      dayCol: String,
      periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"retentionCohorts: periodDays must be >= 1, got $periodDays")
    val census = events
      .select(col(userCol).as("__ret_u"),
        expr(s"CAST($dayCol AS BIGINT) div $periodDays").as("__ret_p"))
      .distinct()
      .localCheckpoint(true) // cohorts + cells below
    val cohorts = census.groupBy(col("__ret_u"))
      .agg(min(col("__ret_p")).as("__ret_c"))
    val cells = census.join(cohorts, Seq("__ret_u"))
      .groupBy(col("__ret_c").as("cohort"),
        (col("__ret_p") - col("__ret_c")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohorts.groupBy(col("__ret_c").as("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("cohort"))
      .withColumn("retention_ppm", expr("(n_active * 1000000) div cohort_size"))
  }

  /** First-order Markov transition matrix over per-key event sequences —
    * the behavioral model behind next-action prediction, anomalous-flow
    * detection, and clickstream simulation: count consecutive (state →
    * next state) transitions per key's (orderCol, tieCol)-ordered stream,
    * then row-normalize to exact truncating ppm. The census IS the model:
    * |states|² rows regardless of event volume.
    *
    * Scale shape: one key-partitioned LEAD window (per-key, never global)
    * + one census-sized groupBy + a census window for row totals. The
    * tie column makes same-timestamp ordering deterministic (GroupState /
    * window iteration order is not a contract — the q333 lesson).
    * Returns (from_state, to_state, n_trans, row_total, p_ppm). */
  def markovTransitions(
      events: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val wRow = Window.partitionBy(col("from_state"))
    events
      .withColumn("__mk_next", lead(col(stateCol), 1).over(w))
      .filter(col("__mk_next").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__mk_next").as("to_state"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("row_total", sum(col("n_trans")).over(wRow))
      .withColumn("p_ppm", expr("(n_trans * 1000000) div row_total"))
  }

  /** k-step composition of a ppm transition matrix: (T²)(a,c) =
    * Σ_b T(a,b)·T(b,c) div 10⁶ — a DEFINED truncating composition
    * (documented fixed point, exact integers, engine-replayable) over the
    * states²-sized census: one equi-join on the middle state + one
    * groupBy. Input needs (from_state, to_state, p_ppm). */
  def composeTransitions(t1: DataFrame, t2: DataFrame): DataFrame = {
    val a = t1.select(col("from_state"), col("to_state").as("__mk_mid"),
      col("p_ppm").as("__mk_p1"))
    val b = t2.select(col("from_state").as("__mk_mid"), col("to_state"),
      col("p_ppm").as("__mk_p2"))
    a.join(b, "__mk_mid")
      .groupBy(col("from_state"), col("to_state"))
      .agg(sum(col("__mk_p1") * col("__mk_p2")).as("__mk_num"))
      .withColumn("p2_ppm", expr("__mk_num div 1000000"))
      .drop("__mk_num")
  }
}
