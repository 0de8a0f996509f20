package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — the resampling scheme that actually distributes
  * (the classical bootstrap's multinomial draw needs global coordination;
  * Poisson(1) per-row weights need none, and at corpus n the replicate
  * size concentrates hard around n — the standard large-scale CI recipe).
  *
  * Replicate weights are DETERMINISTIC: w(id, rep) cuts
  * pmod(xxhash64(id·maxReps + rep), 10⁶) against the cumulative
  * Poisson(1) thresholds in ppm — so runs are reproducible, results are
  * partitioning-invariant, and the oracle can replay every draw (the
  * q300 derandomization discipline; swap the hash for a seeded RNG when
  * statistical independence across REUSED ids matters more than replay).
  *
  * Shape: all B replicates ride ONE aggregation pass as 2B partial-agg
  * columns (sum of w, sum of w·value) — no row explosion, no extra
  * shuffle; the per-group result is 2B numbers regardless of table size,
  * unpivoted to (rep, n_w, sum_w) rows for downstream order statistics.
  * At 100 TB this is a scan plus a B-wide rollup — the explode spelling
  * would be a B× shuffle instead. */
object Resample {

  /** Cumulative Poisson(1) in ppm: P(X ≤ k) for k = 0..4; weight 5 past
    * the tail (P ≈ 0.04% — the truncation bias is far below bootstrap
    * noise and keeps the weight column a tiny exact integer). */
  val poissonCumPpm: Seq[Long] = Seq(367879L, 735759L, 919699L, 981012L, 996340L)

  /** The deterministic Poisson(1)-ish weight for (id, rep). */
  def poissonWeight(idCol: Column, rep: Int, maxReps: Int): Column = {
    val u = pmod(xxhash64(idCol * lit(maxReps.toLong) + lit(rep.toLong)), lit(1000000L))
    poissonCumPpm.zipWithIndex.foldRight(lit(poissonCumPpm.size.toLong): Column) {
      case ((thr, k), rest) => when(u < thr, k.toLong).otherwise(rest)
    }
  }

  /** B bootstrap replicates of (count, sum) per group in one pass:
    * (groupCols*, rep, n_w, sum_w). `idCol` must be a BIGINT row identity
    * with id·reps + reps staying in range; `valueCol` an exact integer
    * measure (quantize floats first — cents, ppm — so replicate sums are
    * engine-stable). */
  def bootstrapReplicates(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      reps: Int,
      groupCols: Seq[String]): DataFrame = {
    require(reps >= 2 && reps <= 256, s"bootstrapReplicates: reps in [2,256], got $reps")
    val gs = groupCols.map(col)
    val aggs = (0 until reps).flatMap { b =>
      val w = poissonWeight(col(idCol), b, reps)
      Seq(sum(w).as(s"__bs_n_$b"), sum(w * col(valueCol).cast("long")).as(s"__bs_s_$b"))
    }
    val wide = df.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until reps)
      .map(b => s"$b, __bs_n_$b, __bs_s_$b")
      .mkString(", ")
    wide.select((gs :+
      expr(s"stack($reps, $stackArgs)").as(Seq("rep", "n_w", "sum_w"))): _*)
  }

  /** Rank-based bootstrap CI of the per-row mean: per group, each
    * replicate's mean in ppm (exact integer division), then the
    * order-statistic band [loRank-th, hiRank-th] of the B means plus the
    * full-sample point estimate. Returns one row per group:
    * (groupCols*, n, mean_ppm, lo_ppm, hi_ppm). Rank selection over B
    * metadata rows — exact, no interpolation grid. */
  def bootstrapMeanCi(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      reps: Int,
      loRank: Int,
      hiRank: Int,
      groupCols: Seq[String]): DataFrame = {
    require(1 <= loRank && loRank < hiRank && hiRank <= reps,
      s"bootstrapMeanCi: need 1 <= loRank < hiRank <= reps, got $loRank/$hiRank/$reps")
    require(groupCols.nonEmpty,
      "bootstrapMeanCi: empty groupCols would make the band join an " +
        "implicit cross join — inject a literal constant group column")
    val gs = groupCols.map(col)
    val repMeans = bootstrapReplicates(df, idCol, valueCol, reps, groupCols)
      .filter(col("n_w") > 0) // an empty replicate has no mean (possible only at tiny n)
      .transform(d => RankStats.withPpm(d, col("sum_w"), col("n_w"), "mean_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("mean_ppm"), col("rep"))
    val ranked = repMeans.withColumn("__bs_rk", row_number().over(w))
    val band = ranked
      .groupBy(gs: _*)
      .agg(
        max(when(col("__bs_rk") === loRank, col("mean_ppm"))).as("lo_ppm"),
        max(when(col("__bs_rk") === hiRank, col("mean_ppm"))).as("hi_ppm"))
    val point = df.groupBy(gs: _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("__bs_sum"))
      .transform(d => RankStats.withPpm(d, col("__bs_sum"), col("n"), "mean_ppm"))
      .drop("__bs_sum")
    point.join(band, groupCols)
  }

  /** Bootstrap CI for a RATIO metric — the A/B-testing workhorse the mean
    * CI cannot cover (CTR, revenue-per-session, share-above-threshold:
    * the ratio of two correlated sums has no per-row mean, so the
    * delta-method or the bootstrap is mandatory — and Poisson weights
    * resample the NUMERATOR AND DENOMINATOR together, preserving their
    * per-row correlation, which independent resamples would destroy).
    * Same one-pass shape as [[bootstrapReplicates]] with 3B agg columns;
    * replicates whose denominator is ≤ 0 carry no ratio and drop (small-n
    * corner; the full-sample point estimate keeps its own denominator
    * guard). Returns (groupCols*, n, ratio_ppm, lo_ppm, hi_ppm). */
  def bootstrapRatioCi(
      df: DataFrame,
      idCol: String,
      numCol: String,
      denCol: String,
      reps: Int,
      loRank: Int,
      hiRank: Int,
      groupCols: Seq[String]): DataFrame = {
    require(reps >= 2 && reps <= 256, s"bootstrapRatioCi: reps in [2,256], got $reps")
    require(1 <= loRank && loRank < hiRank && hiRank <= reps,
      s"bootstrapRatioCi: need 1 <= loRank < hiRank <= reps, got $loRank/$hiRank/$reps")
    require(groupCols.nonEmpty,
      "bootstrapRatioCi: empty groupCols would make the band join an " +
        "implicit cross join — inject a literal constant group column")
    val gs = groupCols.map(col)
    val aggs = (0 until reps).flatMap { b =>
      val w = poissonWeight(col(idCol), b, reps)
      Seq(
        sum(w * col(numCol).cast("long")).as(s"__bs_sn_$b"),
        sum(w * col(denCol).cast("long")).as(s"__bs_sd_$b"))
    }
    val wide = df.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until reps)
      .map(b => s"$b, __bs_sn_$b, __bs_sd_$b")
      .mkString(", ")
    val repRatios = wide
      .select((gs :+
        expr(s"stack($reps, $stackArgs)").as(Seq("rep", "s_num", "s_den"))): _*)
      .filter(col("s_den") > 0)
      .transform(d => RankStats.withPpm(d, col("s_num"), col("s_den"), "ratio_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("ratio_ppm"), col("rep"))
    val band = repRatios
      .withColumn("__bs_rk", row_number().over(w))
      .groupBy(gs: _*)
      .agg(
        max(when(col("__bs_rk") === loRank, col("ratio_ppm"))).as("lo_ppm"),
        max(when(col("__bs_rk") === hiRank, col("ratio_ppm"))).as("hi_ppm"))
    val point = df.groupBy(gs: _*)
      .agg(count(lit(1)).as("n"),
        sum(col(numCol).cast("long")).as("__bs_pn"),
        sum(col(denCol).cast("long")).as("__bs_pd"))
      .filter(col("__bs_pd") > 0)
      .transform(d => RankStats.withPpm(d, col("__bs_pn"), col("__bs_pd"), "ratio_ppm"))
      .drop("__bs_pn", "__bs_pd")
    point.join(band, groupCols)
  }
}
