package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — the retrieval/recommendation eval surface a
  * training-data pipeline needs next to ROC-AUC (q324): given per-query
  * ranked candidate lists with binary relevance, compute precision@k,
  * recall@k, reciprocal rank, and NDCG@k per query, all in EXACT integer
  * arithmetic (no float enters the pipeline, both engines agree
  * bit-for-bit).
  *
  * The log₂ discount in DCG is irrational, so NDCG uses the library's
  * 1/16-resolution fixed-point floor-log₂ ([[Linkage.flog2fp]], the
  * q237/q329 idiom): weight w(r) = (16·10⁶) div flog2fp(r + 1) — exact
  * integers, monotone decreasing in r, w(1) = 10⁶ like the true 1/log₂(2).
  * This is a DEFINED metric variant (documented fixed point), not an
  * approximation of convenience: the ideal DCG normalizer uses the same
  * weights, so NDCG@k stays in [0, 10⁶] ppm and ordering between queries
  * is preserved wherever the true metric's gaps exceed the 1/16-bit
  * resolution.
  *
  * Scale shape: input rows are (query, candidate, rank, relevant) — ranked
  * lists are top-k-bounded upstream (a retrieval system emits k rows per
  * query, never the corpus), so this is ONE partial-agg-friendly groupBy
  * over list-sized data; the ideal-DCG lookup is a k-element literal array
  * (driver constant), never a join.
  */
object RankingEval {

  /** Fixed-point floor-log₂ of a positive Long (driver-side twin of
    * [[Linkage.flog2fp]] for the literal ideal-DCG table). */
  private[graft] def flog16(x: Long): Long = {
    require(x >= 1, s"flog16: x must be >= 1, got $x")
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    16L * msb - 16L + (x * 16L) / (1L << msb)
  }

  /** Discount weight in micro-units: w(rank) = 16·10⁶ div flog2fp(rank+1). */
  private[graft] def w16(rank: Long): Long = 16000000L / flog16(rank + 1L)

  /** Per-query ranking metrics at cutoff `k` over binary relevance.
    *
    * Input: one row per ranked candidate with `rankCol` (1-based position
    * within its query group — compute with a group-partitioned
    * `row_number` if the retriever didn't emit it) and boolean `relCol`.
    * Returns one row per group: (groupCols*, n_ranked, n_rel, hits_at_k,
    * prec_at_k_ppm = hits·10⁶ div k, recall_at_k_ppm = hits·10⁶ div n_rel
    * (NULL when n_rel = 0), rr_ppm = 10⁶ div first-relevant-rank (0 when
    * none — the MRR convention), dcg_upm = Σ_{r ≤ k, rel} w(r),
    * ndcg_ppm = dcg·10⁶ div idcg(min(n_rel, k)) (NULL when n_rel = 0)).
    * Mean-of-queries aggregates (MRR, mean NDCG) are one exact
    * sum-div-count away. */
  def metricsAtK(
      df: DataFrame,
      rankCol: String,
      relCol: String,
      k: Int,
      groupCols: Seq[String]): DataFrame = {
    require(k >= 1 && k <= 1000, s"metricsAtK: k in [1,1000], got $k")
    require(groupCols.nonEmpty,
      "metricsAtK: empty groupCols — metrics are per query; inject a literal " +
        "constant group column for a single-list evaluation")
    val gs = groupCols.map(col)
    val rank = col(rankCol).cast("long")
    val rel = col(relCol)
    // literal ideal-DCG prefix sums: idcg(j) = Σ_{r=1..j} w(r), j = 1..k
    val idcgCum = (1 to k).map(_.toLong).scanLeft(0L)((acc, r) => acc + w16(r)).tail
    val idcgArr = array(idcgCum.map(lit): _*)
    df
      // integral `div` needs plain attributes (the withPpm rule), so the
      // discount materializes through fixed-name temp columns
      .withColumn("__re_flog", Linkage.flog2fp(rank + 1L))
      .withColumn("__re_w", expr("16000000 div __re_flog"))
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_ranked"),
        sum(when(rel, 1L).otherwise(0L)).as("n_rel"),
        sum(when(rel && rank <= k, 1L).otherwise(0L)).as("hits_at_k"),
        min(when(rel, rank)).as("__re_first"),
        sum(when(rel && rank <= k, col("__re_w")).otherwise(0L)).as("dcg_upm"))
      .withColumn("prec_at_k_ppm", expr(s"(hits_at_k * 1000000) div $k"))
      .withColumn("recall_at_k_ppm",
        when(col("n_rel") > 0, expr("(hits_at_k * 1000000) div n_rel")))
      .withColumn("rr_ppm",
        when(col("__re_first").isNotNull, expr("1000000 div __re_first"))
          .otherwise(0L))
      // greatest(…, 1): ANSI element_at(arr, 0) throws even on rows the
      // n_rel > 0 guard below discards — clamp the unused index
      .withColumn("__re_idcg",
        element_at(idcgArr,
          greatest(least(col("n_rel"), lit(k.toLong)), lit(1L)).cast("int")))
      .withColumn("ndcg_ppm",
        when(col("n_rel") > 0, expr("(dcg_upm * 1000000) div __re_idcg")))
      .drop("__re_first", "__re_idcg")
  }

  /** Precision–recall curve from the SCORE CENSUS (no per-row sort): one
    * row per distinct score per group, swept as a descending threshold —
    * (groupCols*, score, n_at, pos_at, cum_n, cum_pos, prec_ppm,
    * recall_ppm). Ties resolve the standard way: all rows at a score
    * enter together (the threshold semantics), so the curve is
    * deterministic under any partitioning and engine-replayable. The only
    * window runs over the census, partitioned by group. */
  def prCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "prCurve: empty groupCols would plan a single-task global window — " +
        "inject a literal constant group column for one curve")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val census = df
      .groupBy((gs :+ col(scoreCol).as("score")): _*)
      .agg(count(lit(1)).as("n_at"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos_at"))
    val wDesc = Window.partitionBy(gs: _*).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census
      .withColumn("cum_n", sum(col("n_at")).over(wDesc))
      .withColumn("cum_pos", sum(col("pos_at")).over(wDesc))
      .withColumn("prec_ppm", expr("(cum_pos * 1000000) div cum_n"))
      .transform(d => RankStats.withPpm(d, col("cum_pos"),
        sum(col("pos_at")).over(Window.partitionBy(gs: _*)), "recall_ppm"))
  }

  /** Average precision per group — the area under [[prCurve]] in the
    * threshold-sweep convention: AP = (Σ_s pos(s)·prec_ppm(s)) div n_pos,
    * every term an exact integer over the census (prec_ppm is the
    * truncating ppm at each threshold — a DEFINED exact variant of the
    * usual float AP, deterministic on both engines). Pairs ROC-AUC
    * (q324): AP is the metric that doesn't reward true negatives, the one
    * retrieval and imbalanced-label evaluation actually use. */
  def averagePrecision(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    prCurve(df, scoreCol, labelCol, groupCols)
      .groupBy(gs: _*)
      .agg(
        sum(col("n_at")).as("n"),
        sum(col("pos_at")).as("n_pos"),
        sum(col("pos_at") * col("prec_ppm")).as("__re_apnum"))
      .withColumn("ap_ppm",
        when(col("n_pos") > 0, expr("__re_apnum div n_pos")))
      .drop("__re_apnum")
  }

  /** Cumulative gains / lift table over score BUCKETS (the decile chart:
    * "contacting the top k% of scores captures what share of positives,
    * at what lift over random"): bucket = score div bucketWidth swept
    * descending; gain_ppm = cumPos·10⁶ div totPos, lift in ppm via the
    * exact cross-product (cumPos·totN)·10⁶ div (cumN·totPos) in
    * DECIMAL(38,0). Census-sized: one groupBy + two windows over it. */
  def cumulativeGains(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bucketWidth: Long,
      groupCols: Seq[String]): DataFrame = {
    require(bucketWidth >= 1, s"cumulativeGains: bucketWidth >= 1, got $bucketWidth")
    require(groupCols.nonEmpty,
      "cumulativeGains: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val census = df
      .select((gs :+ expr(s"CAST($scoreCol AS BIGINT) div $bucketWidth").as("bucket") :+
        col(labelCol).as("__re_l")): _*)
      .groupBy((gs :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("__re_l"), 1L).otherwise(0L)).as("pos_at"))
    val wDesc = Window.partitionBy(gs: _*).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(gs: _*)
    census
      .withColumn("cum_n", sum(col("n_at")).over(wDesc))
      .withColumn("cum_pos", sum(col("pos_at")).over(wDesc))
      .withColumn("__re_tn", sum(col("n_at")).over(wTot))
      .withColumn("__re_tp", sum(col("pos_at")).over(wTot))
      .withColumn("gain_ppm",
        when(col("__re_tp") > 0, expr("(cum_pos * 1000000) div __re_tp")))
      .withColumn("lift_ppm",
        when(col("__re_tp") > 0 && col("cum_n") > 0,
          expr("(CAST(cum_pos AS DECIMAL(38,0)) * __re_tn * 1000000) div " +
            "(CAST(cum_n AS DECIMAL(38,0)) * __re_tp)").cast("long")))
      .drop("__re_tn", "__re_tp")
  }
}
