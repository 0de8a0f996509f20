package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rank-based (distribution-free) statistics — the drift / A-B / model-eval
  * tests that compare DISTRIBUTIONS, not means: two-sample
  * Kolmogorov–Smirnov, Mann–Whitney U, Spearman rank correlation, and
  * ROC-AUC. These complete the monitoring surface next to the parametric
  * chi-square (q210), MAD outliers (q99), and exact ACF (q293).
  *
  * Everything is EXACT INTEGER arithmetic end-to-end, which is what makes
  * rank statistics the right family for a cross-engine-verified pipeline:
  * ranks are integers, tie-averaged ranks are half-integers (so DOUBLED
  * ranks are integers — the `rank2` convention below), and every statistic
  * is a rational whose numerator/denominator we carry explicitly, emitting
  * a ppm fixed-point value via truncating sign-magnitude division. Both
  * engines truncate integer division toward zero (Spark `div` and DuckDB
  * `//` alike — measured round 12: −7 // 2 = −3); sign·(|num| div den) is
  * kept anyway because it is robust under EITHER semantics.
  *
  * Scale design: NO global per-row sort anywhere. All ranks derive from a
  * DISTINCT-VALUE CENSUS — groupBy(value) count, one shuffle whose width is
  * the number of distinct values, then a prefix-sum window over the census
  * only. Rank2 of a tie class of size c starting after r rows is
  * 2r + c + 1 (= twice the average rank), so every Σ-over-rows statistic is
  * a Σ-over-census weighted by c. A window over a census partitioned by
  * group keys scales with per-group distinct values; for continuous
  * measures at 100 TB you quantize first (the census IS the quantizer
  * contract), exactly like every production KS/PSI monitor.
  */
object RankStats {

  /** Truncating sign-magnitude ppm column `out` = sign(num)·((|num|·10⁶)
    * div den), exact in DECIMAL(38,0) so |num|·10⁶ can't overflow BIGINT
    * midway (the q293 pattern); materialized through fixed-name temp
    * columns so the integral `div` sees plain attributes. */
  private[graft] def withPpm(
      df: DataFrame, num: Column, den: Column, out: String): DataFrame =
    df.withColumn("__rs_num", num.cast("long"))
      .withColumn("__rs_den", den.cast("long"))
      .withColumn(out, (when(col("__rs_num") < 0, -1L).otherwise(1L) *
        expr("(CAST(abs(__rs_num) AS DECIMAL(38,0)) * 1000000) div __rs_den"))
        .cast("long"))
      .drop("__rs_num", "__rs_den")

  /** Distinct-value census with doubled average ranks, per group:
    * (groupCols*, value, cnt, rank2) where rank2 = 2·cumBelow + cnt + 1.
    * The only window runs over the census (one row per distinct value per
    * group), partitioned by the group columns. */
  def rank2Census(df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "rank2Census: empty groupCols would plan a single-task global window/join — " +
        "inject a literal constant group column for a whole-table statistic " +
        "(and quantize first: the census must stay census-sized)")
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    census.withColumn("rank2",
      lit(2L) * coalesce(sum(col("cnt")).over(w), lit(0L)) + col("cnt") + 1L)
  }

  /** Exact per-group ECDF / percentile table from the value census — the
    * "what fraction of rows is ≤ v" operator (latency percentile reports,
    * threshold calibration, PERCENT_RANK without a per-row sort): one row
    * per distinct value with its count, cumulative ≤-count, group total,
    * and pct_le_ppm = cum_le·10⁶ div n. Exact integers throughout; the
    * only window runs over the census, partitioned by group. A percentile
    * lookup (p50/p99) is then a census-side filter: the smallest value
    * with pct_le_ppm ≥ p — exact, tie-safe, engine-replayable. */
  def ecdf(df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "ecdf: empty groupCols would plan a single-task global window — " +
        "inject a literal constant group column for a whole-table ECDF")
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("cnt"))
    val wLe = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(gs: _*)
    census
      .withColumn("cum_le", sum(col("cnt")).over(wLe))
      .withColumn("n", sum(col("cnt")).over(wTot))
      .withColumn("pct_le_ppm", expr("(cum_le * 1000000) div n"))
  }

  /** Two-sample Kolmogorov–Smirnov per group: D = max_v |F_a(v) − F_b(v)|
    * carried as the exact integer numerator max|cumA·nB − cumB·nA| over
    * the merged distinct-value census (the max of the ECDF gap is attained
    * at a data point, so the census sweep is the whole test). Returns one
    * row per group: (groupCols*, n_a, n_b, d_num, d_ppm) with
    * d = d_num/(n_a·n_b). `sideCol` must take exactly the two values
    * `sideA`/`sideB` (others are ignored). Groups missing a side are
    * dropped (no distribution to compare). */
  def ksTest(
      df: DataFrame, valueCol: String, sideCol: String,
      sideA: String, sideB: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "ksTest: empty groupCols would plan a single-task global window/join — " +
        "inject a literal constant group column for a whole-table statistic")
    val gs = groupCols.map(col)
    val census = df
      .filter(col(sideCol).isin(sideA, sideB))
      .groupBy((gs :+ col(valueCol)): _*)
      .agg(
        sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("__rs_ca"),
        sum(when(col(sideCol) === sideB, 1L).otherwise(0L)).as("__rs_cb"))
    val w = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(gs: _*)
    val swept = census
      .withColumn("__rs_cuma", sum(col("__rs_ca")).over(w))
      .withColumn("__rs_cumb", sum(col("__rs_cb")).over(w))
      .withColumn("__rs_na", sum(col("__rs_ca")).over(wTot))
      .withColumn("__rs_nb", sum(col("__rs_cb")).over(wTot))
      .filter(col("__rs_na") > 0 && col("__rs_nb") > 0)
      .groupBy(gs: _*)
      .agg(
        max(col("__rs_na")).as("n_a"),
        max(col("__rs_nb")).as("n_b"),
        max(abs(col("__rs_cuma") * col("__rs_nb") - col("__rs_cumb") * col("__rs_na")))
          .as("d_num"))
    withPpm(swept, col("d_num"), col("n_a") * col("n_b"), "d_ppm")
  }

  /** Mann–Whitney U per group, doubled for tie exactness: returns
    * (groupCols*, n_a, n_b, u2, u_ppm) where u2 = 2·U_A =
    * 2·ΣR_A − n_a·(n_a+1) over tie-averaged ranks of the pooled sample and
    * u_ppm = u2·10⁶ div (2·n_a·n_b) — the common-language effect size
    * P(A > B) + ½P(A = B) in ppm (ROC-AUC when A = positives). */
  def mannWhitney(
      df: DataFrame, valueCol: String, sideCol: String,
      sideA: String, sideB: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "mannWhitney: empty groupCols would plan a single-task global window — " +
        "inject a literal constant group column for a whole-table statistic")
    val gs = groupCols.map(col)
    val filtered = df.filter(col(sideCol).isin(sideA, sideB))
    val census = filtered
      .groupBy((gs :+ col(valueCol)): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("__rs_ca"))
    val w = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("rank2",
        lit(2L) * coalesce(sum(col("cnt")).over(w), lit(0L)) + col("cnt") + 1L)
      .groupBy(gs: _*)
      .agg(
        sum(col("__rs_ca")).as("n_a"),
        sum(col("cnt") - col("__rs_ca")).as("n_b"),
        sum(col("__rs_ca") * col("rank2")).as("__rs_sumr2"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("u2", col("__rs_sumr2") - col("n_a") * (col("n_a") + 1L))
      .drop("__rs_sumr2")
      .transform(d => withPpm(d, col("u2"), lit(2L) * col("n_a") * col("n_b"), "u_ppm"))
  }

  /** ROC-AUC per group over an integer/discrete score column with a
    * boolean label: AUC = P(score_pos > score_neg) + ½P(=) — exactly the
    * Mann–Whitney effect size with A = positives. Returns
    * (groupCols*, n_pos, n_neg, u2, auc_ppm). */
  def rocAuc(
      df: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String]): DataFrame = {
    val sided = df.withColumn("__rs_side",
      when(col(labelCol), lit("p")).otherwise(lit("n")))
    mannWhitney(sided, scoreCol, "__rs_side", "p", "n", groupCols)
      .withColumnRenamed("n_a", "n_pos")
      .withColumnRenamed("n_b", "n_neg")
      .withColumnRenamed("u_ppm", "auc_ppm")
  }

  /** Kendall rank correlation per group, pair-census form: the joint
    * (x, y) value census self-joins within each group, so cost is
    * (distinct x · distinct y)² per group — QUANTIZE continuous measures
    * first (the same census-is-the-quantizer contract as the other rank
    * stats); the row count never enters the join. Returns
    * (groupCols*, n, c_pairs, d_pairs, tau_a_ppm, tie_x_pairs,
    * tie_y_pairs, tau_b_ppm): concordant / discordant unordered pair
    * counts as exact BIGINTs (each pair counted once via the strict b>a
    * orientation), Kendall's τ_a = (C − D)/(n(n−1)/2) in sign-magnitude
    * ppm, the exact tie-pair sums n1 = Σ_x t_x(t_x−1)/2 and
    * n2 = Σ_y u_y(u_y−1)/2 (two census-sized aggregates), and the
    * tie-corrected τ_b = (C − D)/√((n0−n1)(n0−n2)) in ppm. τ_b's √ rides
    * IEEE doubles: BIGINT→DOUBLE casts and SQRT are correctly rounded on
    * both engines (the Theil–Sen long÷long precedent), and the oracle
    * spells the identical expression — the exact integers C, D, n, n1,
    * n2 remain the engine-stable contract. τ_b is NULL when either axis
    * is entirely tied (n0 = n1 or n0 = n2). The census self-join
    * repartitions to explicit N first: the join OUTPUT is census²-shaped
    * and AQE only sees census-sized inputs (the q115 expansion rule). */
  def kendallPairs(
      df: DataFrame, xCol: String, yCol: String, groupCols: Seq[String],
      censusPartitions: Int = 32): DataFrame = {
    require(groupCols.nonEmpty,
      "kendallPairs: empty groupCols would make the census self-join an " +
        "implicit cross join — inject a literal constant group column")
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(xCol).as("__rs_x") :+ col(yCol).as("__rs_y")): _*)
      .agg(count(lit(1)).as("__rs_c"))
      .repartition(censusPartitions)
      .localCheckpoint(true) // self-joined below
    val a = census.select((gs :+ col("__rs_x").as("__rs_xa") :+
      col("__rs_y").as("__rs_ya") :+ col("__rs_c").as("__rs_ca")): _*)
    val b = census.select((gs :+ col("__rs_x").as("__rs_xb") :+
      col("__rs_y").as("__rs_yb") :+ col("__rs_c").as("__rs_cb")): _*)
    val joined = a.join(b, groupCols)
    val conc = sum(when(col("__rs_xb") > col("__rs_xa") && col("__rs_yb") > col("__rs_ya"),
      col("__rs_ca") * col("__rs_cb")).otherwise(0L))
    val disc = sum(when(col("__rs_xb") > col("__rs_xa") && col("__rs_yb") < col("__rs_ya"),
      col("__rs_ca") * col("__rs_cb")).otherwise(0L))
    val totals = df.groupBy(gs: _*).agg(count(lit(1)).as("n"))
    // exact tie-pair sums from the marginal censuses (census-sized aggs)
    def tiePairs(axis: String, out: String) = census
      .groupBy((gs :+ col(axis)): _*).agg(sum(col("__rs_c")).as("__rs_t"))
      .groupBy(gs: _*)
      .agg(sum(expr("(__rs_t * (__rs_t - 1)) div 2")).as(out))
    joined
      .groupBy(gs: _*)
      .agg(conc.as("c_pairs"), disc.as("d_pairs"))
      .join(totals, groupCols)
      .filter(col("n") >= 2)
      .transform(d => withPpm(d, col("c_pairs") - col("d_pairs"),
        expr("(n * (n - 1)) div 2"), "tau_a_ppm"))
      .join(tiePairs("__rs_x", "tie_x_pairs"), groupCols)
      .join(tiePairs("__rs_y", "tie_y_pairs"), groupCols)
      .withColumn("__rs_n0", expr("(n * (n - 1)) div 2"))
      .withColumn("tau_b_ppm",
        when(col("__rs_n0") === col("tie_x_pairs") ||
             col("__rs_n0") === col("tie_y_pairs"), lit(null).cast("long"))
          .otherwise(expr(
            "CAST(FLOOR((CAST(c_pairs - d_pairs AS DOUBLE) * 1000000.0) / " +
              "(SQRT(CAST(__rs_n0 - tie_x_pairs AS DOUBLE)) * " +
              "SQRT(CAST(__rs_n0 - tie_y_pairs AS DOUBLE)))) AS BIGINT)")))
      .drop("__rs_n0")
  }

  /** Spearman rank correlation per group (tie-averaged ranks): returns
    * (groupCols*, n, d2sum4, rho_ppm, rho_b_ppm) where
    * d2sum4 = Σ(rank2_x − rank2_y)² = 4·Σd² exactly,
    * rho_ppm = (2·n(n²−1) − 3·d2sum4)·10⁶ div (2·n(n²−1)) — the classical
    * 1 − 6Σd²/(n(n²−1)) in ppm (the no-tie-correction convention) — and
    * rho_b_ppm = the FULL tie-corrected Pearson-on-ranks: with
    * S = n(n+1) (= Σrank2, exact under tie-averaging),
    * num = n·Σ(r2x·r2y) − S², den_x = n·Σr2x² − S²,
    * den_y = n·Σr2y² − S², rho_b = num/√(den_x·den_y). The moment sums
    * are exact integers (three more aggregates in the same fold); the
    * final √ rides IEEE doubles spelled identically in the oracle
    * (correctly-rounded casts/SQRT — the τ_b precedent), NULL when an
    * axis is constant (den = 0). The ρ_b moment chain accumulates in
    * DECIMAL(38,0): n·Σ(r2·r2) ~ 4n⁴ passes BIGINT at ~5·10⁴ rows per
    * group — the 5× scale probe caught the BIGINT version overflowing
    * loudly under ANSI; decimal holds to ~10⁹ rows per group (HUGEINT
    * replays it). d2sum4 stays an exact BIGINT output (~4n³, loud ANSI
    * failure past ~1.3·10⁶ rows per group — quantize + census first). */
  def spearman(
      df: DataFrame, xCol: String, yCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "spearman: empty groupCols would plan single-task global windows — " +
        "inject a literal constant group column for a whole-table statistic")
    val gs = groupCols.map(col)
    val rx = rank2Census(df, xCol, groupCols)
      .select((gs :+ col(xCol).as("__rs_x") :+ col("rank2").as("__rs_r2x")): _*)
    val ry = rank2Census(df, yCol, groupCols)
      .select((gs :+ col(yCol).as("__rs_y") :+ col("rank2").as("__rs_r2y")): _*)
    // JOINT (x, y) census first: every Σ-over-rows moment is a
    // Σ-over-census weighted by the cell count, so the rank join-backs and
    // the DECIMAL(38,0) moment arithmetic run CENSUS-scale, not row-scale
    // (r13 added the ρ_b tie correction as three row-scale DECIMAL folds —
    // the round's one real slowdown, 1.90 → 2.92 s at sf0.1; the census
    // form keeps the row-scale pass a single codegen'd count aggregation)
    val joint = df
      .groupBy((gs :+ col(xCol).as("__rs_x") :+ col(yCol).as("__rs_y")): _*)
      .agg(count(lit(1)).as("__rs_jc"))
    joint
      .join(rx, groupCols :+ "__rs_x")
      .join(ry, groupCols :+ "__rs_y")
      .groupBy(gs: _*)
      .agg(
        sum(col("__rs_jc")).as("n"),
        sum(col("__rs_jc") *
          (col("__rs_r2x") - col("__rs_r2y")) * (col("__rs_r2x") - col("__rs_r2y")))
          .as("d2sum4"),
        // the ρ_b moment chain rides DECIMAL(38,0): n·Σ(r2·r2) ~ 4n⁴
        // overflows BIGINT at ~5·10⁴ rows per group — the 5× scale probe
        // caught exactly this (ARITHMETIC_OVERFLOW at a synthesized sf0.5)
        sum(col("__rs_jc").cast("decimal(38,0)") * col("__rs_r2x") * col("__rs_r2y"))
          .as("__rs_sxy"),
        sum(col("__rs_jc").cast("decimal(38,0)") * col("__rs_r2x") * col("__rs_r2x"))
          .as("__rs_sxx"),
        sum(col("__rs_jc").cast("decimal(38,0)") * col("__rs_r2y") * col("__rs_r2y"))
          .as("__rs_syy"))
      .filter(col("n") >= 2)
      .transform { d =>
        val den = lit(2L) * col("n") * (col("n") * col("n") - 1L)
        withPpm(d, den - lit(3L) * col("d2sum4"), den, "rho_ppm")
      }
      // Pearson on doubled ranks: Σrank2 = n(n+1) exactly, so the moment
      // identity needs no separate mean pass
      .withColumn("__rs_ss", (col("n") * (col("n") + 1L)).cast("decimal(38,0)"))
      .withColumn("__rs_pnum", col("n") * col("__rs_sxy") - col("__rs_ss") * col("__rs_ss"))
      .withColumn("__rs_dx", col("n") * col("__rs_sxx") - col("__rs_ss") * col("__rs_ss"))
      .withColumn("__rs_dy", col("n") * col("__rs_syy") - col("__rs_ss") * col("__rs_ss"))
      .withColumn("rho_b_ppm",
        when(col("__rs_dx") === 0L || col("__rs_dy") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(FLOOR((CAST(__rs_pnum AS DOUBLE) * 1000000.0) / " +
              "(SQRT(CAST(__rs_dx AS DOUBLE)) * SQRT(CAST(__rs_dy AS DOUBLE)))) AS BIGINT)")))
      .drop("__rs_sxy", "__rs_sxx", "__rs_syy", "__rs_ss", "__rs_pnum",
        "__rs_dx", "__rs_dy")
  }

  /** Kruskal–Wallis H — the k-sample generalization of Mann–Whitney
    * (does ANY of k variants differ in distribution?), rank-based so it
    * rides the same census machinery: with pooled doubled ranks,
    * S2_g = Σ_g rank2 and dev_g = S2_g − n_g·(n+1) (zero-mean by
    * construction), H = 3·Σ dev_g²/n_g / (n(n+1)).
    *
    * Engine-stable recipe (defined, not approximated): h_uppm =
    * (3 · Σ_g ((dev_g²·10⁶) div n_g)) div (n·(n+1)) with the squares in
    * DECIMAL(38,0) (dev can reach ~n·n_g — far past BIGINT when squared;
    * HUGEINT replays it). Both floors are spelled identically in the
    * oracle — bit-stable everywhere. Pooled ranks come from
    * [[rank2Census]] (value census, no per-row sort) joined back to the
    * per-side census. Returns (groupCols*, k_sides, n, h_uppm); groups
    * need ≥ 2 sides. */
  def kruskalWallis(
      df: DataFrame, valueCol: String, sideCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "kruskalWallis: empty groupCols would plan a single-task global " +
        "window/join — inject a literal constant group column")
    val gs = groupCols.map(col)
    val pooledRanks = rank2Census(df, valueCol, groupCols)
      .select((gs :+ col(valueCol) :+ col("rank2")): _*)
    val perSide = df
      .groupBy((gs :+ col(sideCol).as("__rs_side") :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__rs_scnt"))
    val agg = perSide
      .join(pooledRanks, groupCols :+ valueCol)
      .groupBy((gs :+ col("__rs_side")): _*)
      .agg(
        sum(col("__rs_scnt")).as("__rs_ng"),
        sum(col("__rs_scnt") * col("rank2")).as("__rs_s2"))
    val totals = agg.groupBy(gs: _*).agg(
      count(lit(1)).as("k_sides"), sum(col("__rs_ng")).as("n"))
    agg.join(totals, groupCols)
      .filter(col("k_sides") >= 2)
      .withColumn("__rs_dev", col("__rs_s2") - col("__rs_ng") * (col("n") + 1L))
      .withColumn("__rs_t", expr(
        "(CAST(__rs_dev AS DECIMAL(38,0)) * __rs_dev * 1000000) div __rs_ng"))
      .groupBy((gs :+ col("k_sides") :+ col("n")): _*)
      // decimal sum: the per-side terms can individually approach BIGINT
      .agg(sum(col("__rs_t").cast("decimal(38,0)")).as("__rs_tsum"))
      .withColumn("h_uppm",
        expr("CAST((3 * __rs_tsum) div (n * (n + 1)) AS BIGINT)"))
      .drop("__rs_tsum")
  }

  /** Wilcoxon signed-rank per group — the PAIRED cousin of Mann–Whitney
    * (did the new model score the SAME items higher?): nonzero differences
    * d = x − y are ranked by |d| (tie-averaged doubled ranks from the |d|
    * census — the rank2 convention), W⁺ doubled = Σ_{d>0} rank2. Since
    * Σ rank2 over all nonzero rows = n(n+1) exactly, the rank-biserial
    * effect size r = (W⁺ − W⁻)/(W⁺ + W⁻) is exactly
    * (2·w2_plus − n(n+1)) / (n(n+1)) in doubled units, emitted as
    * sign-magnitude rb_ppm. Zero differences are DROPPED
    * (the standard Wilcoxon convention). Returns
    * (groupCols*, n, w2_plus, rb_ppm). */
  def wilcoxonSignedRank(
      df: DataFrame, xCol: String, yCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "wilcoxonSignedRank: empty groupCols would plan a single-task global " +
        "window — inject a literal constant group column")
    val gs = groupCols.map(col)
    val diffs = df
      .withColumn("__rs_d", col(xCol).cast("long") - col(yCol).cast("long"))
      .filter(col("__rs_d") =!= 0L)
    val census = diffs
      .groupBy((gs :+ abs(col("__rs_d")).as("__rs_ad")): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("__rs_d") > 0L, 1L).otherwise(0L)).as("__rs_pos"))
    val w = Window.partitionBy(gs: _*).orderBy(col("__rs_ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("rank2",
        lit(2L) * coalesce(sum(col("cnt")).over(w), lit(0L)) + col("cnt") + 1L)
      .groupBy(gs: _*)
      .agg(
        sum(col("cnt")).as("n"),
        sum(col("__rs_pos") * col("rank2")).as("w2_plus"))
      .filter(col("n") >= 1)
      .transform(d => withPpm(d,
        lit(2L) * col("w2_plus") - col("n") * (col("n") + 1L),
        col("n") * (col("n") + 1L), "rb_ppm"))
  }

  /** Cliff's delta per group — the ordinal effect size
    * δ = P(a > b) − P(a < b) ∈ [−1, 1], the robust "how separated are the
    * two samples" companion to Mann–Whitney (δ = 2·AUC − 1): from the
    * doubled U, δ = (u2 − n_a·n_b)/(n_a·n_b) exactly. Same census shape as
    * [[mannWhitney]] (which it composes). Returns
    * (groupCols*, n_a, n_b, u2, delta_ppm). */
  def cliffsDelta(
      df: DataFrame, valueCol: String, sideCol: String,
      sideA: String, sideB: String, groupCols: Seq[String]): DataFrame =
    mannWhitney(df, valueCol, sideCol, sideA, sideB, groupCols)
      .transform(d => withPpm(d, col("u2") - col("n_a") * col("n_b"),
        col("n_a") * col("n_b"), "delta_ppm"))
      .drop("u_ppm")

  /** Winsorized mean per group — the outlier-robust location estimate a
    * metrics pipeline reports next to the raw mean (a single corrupt
    * sensor reading moves the mean arbitrarily; winsorizing clamps the
    * k = ⌊n·p⌋ most extreme values EACH side to the cut values instead of
    * dropping them). The cuts are RANK PICKS from the value census (the
    * q261/q337 hash-match discipline — never an interpolation): lo = the
    * (k+1)-th smallest value, hi = the (n−k)-th; the winsorized sum is a
    * pure census fold Σ cnt·clamp(v, lo, hi) and the mean truncates in
    * micro units. Returns (groupCols*, n, k_each_side, lo, hi,
    * wmean_micro); k = 0 (tiny groups or p = 0) degrades to the exact
    * plain mean. */
  def winsorizedMeanMicro(
      df: DataFrame, valueCol: String, pPpm: Long, groupCols: Seq[String]): DataFrame = {
    require(pPpm >= 0 && pPpm < 500000L,
      s"winsorizedMeanMicro: pPpm in [0, 5e5) (each side), got $pPpm")
    require(groupCols.nonEmpty,
      "winsorizedMeanMicro: empty groupCols would plan a single-task global " +
        "window — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(valueCol).cast("long").as("__rs_v")): _*)
      .agg(count(lit(1)).as("cnt"))
    val wLe = Window.partitionBy(gs: _*).orderBy(col("__rs_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(gs: _*)
    val swept = census
      .withColumn("__rs_cum", sum(col("cnt")).over(wLe))
      .withColumn("__rs_n", sum(col("cnt")).over(wTot))
      .withColumn("__rs_k", Idiv(col("__rs_n") * pPpm, lit(1000000L)))
    val lo = swept.filter(col("__rs_cum") >= col("__rs_k") + 1L)
      .groupBy(gs: _*).agg(min(col("__rs_v")).as("lo"))
    val hi = swept.filter(col("__rs_cum") >= col("__rs_n") - col("__rs_k"))
      .groupBy(gs: _*).agg(min(col("__rs_v")).as("hi"))
    swept
      .join(lo, groupCols).join(hi, groupCols)
      .groupBy(gs: _*)
      .agg(
        max(col("__rs_n")).as("n"),
        max(col("__rs_k")).as("k_each_side"),
        max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum(col("cnt") * greatest(least(col("__rs_v"), col("hi")), col("lo")))
          .as("__rs_ws"))
      .withColumn("wmean_micro", Idiv(col("__rs_ws") * 1000000L, col("n")))
      .drop("__rs_ws")
  }

  /** Gini concentration per group over a NON-NEGATIVE integer measure —
    * the inequality one-number (token-budget concentration across sources,
    * revenue concentration across keys; the general-measure cousin of the
    * skew report's key-count Gini). Exact mean-difference identity on
    * tie-averaged ranks: Σ_{i,j}|x_i − x_j| = 2·Σ_i (2·r̄_i − n − 1)·x_i
    * with r̄ the average rank — so the numerator is one census fold,
    * gini_num = Σ_cells cnt·(rank2 − n − 1)·v, and
    * G = gini_num / (n·Σx) (the population convention, diagonal included),
    * emitted as gini_ppm = gini_num·10⁶ div (n·Σx), NULL when Σx = 0.
    * Returns (groupCols*, n, sum_v, gini_num, gini_ppm). */
  def giniPpm(
      df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "giniPpm: empty groupCols would plan a single-task global window — " +
        "inject a literal constant group column")
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(valueCol).cast("long").as("__rs_v")): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(gs: _*).orderBy(col("__rs_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gs: _*)
    census
      .withColumn("rank2",
        lit(2L) * coalesce(sum(col("cnt")).over(w), lit(0L)) + col("cnt") + 1L)
      .withColumn("__rs_n", sum(col("cnt")).over(wTot))
      .groupBy(gs: _*)
      .agg(
        max(col("__rs_n")).as("n"),
        sum(col("cnt") * col("__rs_v")).as("sum_v"),
        sum(col("cnt").cast("decimal(38,0)") * (col("rank2") - col("__rs_n") - 1L) *
          col("__rs_v")).as("__rs_gn"))
      .withColumn("gini_num", col("__rs_gn").cast("long"))
      .withColumn("gini_ppm",
        when(col("sum_v") === 0L, lit(null).cast("long"))
          .otherwise(org.apache.spark.sql.graft.Idiv(
            col("__rs_gn") * 1000000L, col("n") * col("sum_v")).cast("long")))
      .drop("__rs_gn")
  }

  /** Friedman test per group — do k systems rank the same across n blocks?
    * (Friedman, JASA 1937; the repeated-measures cousin of Kruskal–Wallis
    * and THE multi-system eval test: one score per (query, system), blocks
    * = queries.) Every block must carry all k treatments exactly once
    * (complete block design — loud refusal otherwise). Within-block
    * tie-averaged ranks ride the doubled-rank convention (ρ = 2r exact
    * integers); with R2_j = Σ_blocks ρ_ij, A4 = Σ ρ², C4 = n·k·(k+1)², the
    * tie-corrected statistic (Conover 1999 eq. 5.3.8, cleared of the
    * /4 factors which cancel exactly under doubling) is
    *   T = (k−1)·Σ_j (R2_j − n(k+1))² / (A4 − C4)
    * — exact integers; chi2_upm = T·10⁶ truncating, NULL when A4 = C4
    * (every block fully tied — no information). p_ppm = Markov bound
    * min(1, 2·df/T), df = k−1 (the chi2Homogeneity convention). The rank
    * window partitions by (group, block) — blocks are k-sized, so the
    * partitioning is row-linear and skew-free by construction. Returns
    * (groupCols*, n_blocks, k, chi2_upm, p_ppm). */
  def friedmanTest(
      df: DataFrame, blockCol: String, treatmentCol: String, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "friedmanTest: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val k = df.groupBy(gs: _*).agg(countDistinct(col(treatmentCol)).as("k"))
    val perBlock = df.groupBy((gs :+ col(blockCol)): _*)
      .agg(count(lit(1)).as("__rs_cnt"),
        countDistinct(col(treatmentCol)).as("__rs_kd"))
      .join(k, groupCols)
    val bad = perBlock.filter(col("__rs_cnt") =!= col("k") ||
      col("__rs_kd") =!= col("k")).limit(1).collect()
    require(bad.isEmpty,
      "friedmanTest: every block needs exactly one observation per treatment " +
        "(complete block design) — found a block whose observation count or " +
        "distinct-treatment count differs from the group's k")
    // doubled tie-averaged rank within (group, block): 2·cumBelow + cnt + 1
    // over the block-local value census
    val blockCensus = df.groupBy((gs :+ col(blockCol) :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__rs_c"))
    val w = Window.partitionBy((gs :+ col(blockCol)): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = blockCensus.withColumn("__rs_r2",
      lit(2L) * coalesce(sum(col("__rs_c")).over(w), lit(0L)) + col("__rs_c") + 1L)
    val obs = df.select((gs :+ col(blockCol) :+ col(treatmentCol) :+ col(valueCol)): _*)
      .join(ranked, groupCols :+ blockCol :+ valueCol)
    val perTreatment = obs.groupBy((gs :+ col(treatmentCol)): _*)
      .agg(sum(col("__rs_r2")).as("__rs_R2"), count(lit(1)).as("__rs_n"),
        sum(col("__rs_r2") * col("__rs_r2")).as("__rs_a4j"))
    perTreatment
      .join(k, groupCols)
      .groupBy(gs: _*)
      .agg(
        max(col("__rs_n")).as("n_blocks"),
        max(col("k")).as("k"),
        sum((col("__rs_R2") - col("__rs_n") * (col("k") + 1L)).cast("decimal(38,0)") *
          (col("__rs_R2") - col("__rs_n") * (col("k") + 1L))).as("__rs_num0"),
        sum(col("__rs_a4j").cast("decimal(38,0)")).as("__rs_a4"))
      .withColumn("__rs_c4",
        col("n_blocks").cast("decimal(38,0)") * col("k") *
          (col("k") + 1L) * (col("k") + 1L))
      .withColumn("chi2_upm",
        when(col("__rs_a4") === col("__rs_c4"), lit(null).cast("long"))
          .otherwise(Idiv(
            (col("k") - 1L).cast("decimal(38,0)") * col("__rs_num0") * 1000000L,
            col("__rs_a4") - col("__rs_c4")).cast("long")))
      .withColumn("p_ppm",
        when(col("chi2_upm").isNull || col("chi2_upm") <= 0L, lit(1000000L))
          .otherwise(least(lit(1000000L), Idiv(
            lit(2L) * (col("k") - 1L).cast("decimal(38,0)") * 1000000000000L,
            col("chi2_upm")).cast("long"))))
      .select((gs :+ col("n_blocks") :+ col("k") :+ col("chi2_upm") :+ col("p_ppm")): _*)
  }

  /** Kendall's coefficient of concordance W per group — how strongly do m
    * judges agree on a ranking of k items? (Kendall & Babington Smith
    * 1939.) The tie-corrected W is EXACTLY the Friedman statistic
    * normalized by its maximum, W = T/(m·(k−1)) (Conover 1999 §5.3 —
    * identical ranks give T = m(k−1), so W = 1): this is a pure derived
    * output over [[friedmanTest]] with judges as blocks and items as
    * treatments, inheriting the complete-design refusal and the doubled-
    * rank tie handling. w_ppm = chi2_upm div (m·(k−1)), NULL when every
    * judge ranks everything tied (no information — the friedman NULL).
    * Returns (groupCols*, n_judges, k, w_ppm, chi2_upm, p_ppm). */
  def kendallW(
      df: DataFrame, judgeCol: String, itemCol: String, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    friedmanTest(df, judgeCol, itemCol, valueCol, groupCols)
      .withColumn("w_ppm",
        when(col("chi2_upm").isNull, lit(null).cast("long"))
          .otherwise(Idiv(col("chi2_upm"),
            col("n_blocks") * (col("k") - 1L)).cast("long")))
      .select((gs :+ col("n_blocks").as("n_judges") :+ col("k") :+
        col("w_ppm") :+ col("chi2_upm") :+ col("p_ppm")): _*)
  }

  /** Page's trend test for ORDERED alternatives per group (Page, JASA
    * 1963) — the directional Friedman: systems are hypothesized a-priori
    * to improve with `orderCol` (0-based), and L = Σ_j (j+1)·R_j rewards
    * agreement with that order. Spelled over doubled ranks
    * (L2 = Σ (j+1)·R2_j = 2L exactly) with the no-tie null moments
    *   E[L] = n·k(k+1)²/4,  Var[L] = n·k²(k+1)²(k−1)/144,
    * so the 5 % two-sided normal decision is the exact rational
    *   625·36·(L2 − 2E)² ≥ 2401·n·k²(k+1)²(k−1)
    * (z = (L−E)/√Var, 1.96 = 49/25, (L2−2E)² = 4(L−E)²). The classical
    * moments assume NO ties within a block, so tied blocks REFUSE loudly
    * (rank the fixture on a tie-free grid — the caller owns the grid,
    * the q339 quantize-first discipline). `trend` = +1 (improves with
    * the order), −1 (degrades), 0. Complete block design required.
    * Returns (groupCols*, n_blocks, k, l2, trend). */
  def pageTrendTest(
      df: DataFrame, blockCol: String, orderCol: String, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "pageTrendTest: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val k = df.groupBy(gs: _*).agg(countDistinct(col(orderCol)).as("k"))
    val perBlock = df.groupBy((gs :+ col(blockCol)): _*)
      .agg(count(lit(1)).as("__rs_cnt"),
        countDistinct(col(orderCol)).as("__rs_kd"),
        countDistinct(col(valueCol)).as("__rs_vd"))
      .join(k, groupCols)
    val bad = perBlock.filter(col("__rs_cnt") =!= col("k") ||
      col("__rs_kd") =!= col("k")).limit(1).collect()
    require(bad.isEmpty,
      "pageTrendTest: every block needs exactly one observation per order " +
        "position (complete block design)")
    val tied = perBlock.filter(col("__rs_vd") =!= col("__rs_cnt")).limit(1).collect()
    require(tied.isEmpty,
      "pageTrendTest: tied values within a block — Page's null moments assume " +
        "tie-free blocks; break ties on an explicit grid first")
    // tie-free doubled rank within (group, block): 2·(#lt) + 2 — one
    // census window over k-sized blocks
    val w = Window.partitionBy((gs :+ col(blockCol)): _*).orderBy(col(valueCol))
    val ranked = df
      .select((gs :+ col(blockCol) :+ col(orderCol).cast("long").as("__rs_j") :+
        col(valueCol)): _*)
      .withColumn("__rs_r2", lit(2L) * row_number().over(w))
    ranked
      .groupBy(gs: _*)
      .agg(
        countDistinct(col(blockCol)).as("n_blocks"),
        (countDistinct(col("__rs_j"))).as("k"),
        sum((col("__rs_j") + 1L) * col("__rs_r2")).as("l2"))
      // d = 2·L2 − n·k(k+1)² = 4·(L − E[L]) — doubled twice so everything
      // stays integer (no /2 anywhere). z² ≥ (49/25)² with d² = 16(L−E)²
      // is 625·144·d² ≥ 16·2401·Var-numerator, i.e. 22500·d² ≥ 9604·X
      // (r15 ADVICE: 38416 here fired only at |z| ≥ 3.92 — 4× too strict)
      .withColumn("__rs_d",
        lit(2L) * col("l2").cast("decimal(38,0)") -
          col("n_blocks").cast("decimal(38,0)") * col("k") *
            (col("k") + 1L) * (col("k") + 1L))
      .withColumn("trend",
        when(
          lit(22500L) * col("__rs_d") * col("__rs_d") >=
            lit(9604L) * col("n_blocks").cast("decimal(38,0)") * col("k") * col("k") *
              (col("k") + 1L) * (col("k") + 1L) * (col("k") - 1L),
          when(col("__rs_d") > 0, 1L).when(col("__rs_d") < 0, -1L).otherwise(0L))
          .otherwise(0L))
      .withColumn("l2", col("l2").cast("long"))
      .select((gs :+ col("n_blocks") :+ col("k") :+ col("l2") :+ col("trend")): _*)
  }
}
