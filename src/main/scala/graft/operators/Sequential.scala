package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential (anytime-valid) hypothesis testing — Wald's SPRT over a
  * Bernoulli rate, the monitor that decides DURING the experiment instead
  * of at a fixed horizon (guardrail metrics, canary analysis, data-quality
  * gates on a stream of batches). Complements the fixed-horizon tests
  * (χ² q210, bootstrap q326/q343, rank tests q321–q340): those answer
  * "different at n?", SPRT answers "stop now?" with controlled error.
  *
  * Exactness: the log-likelihood ratio is a SUM of per-observation
  * constants — after k successes in n trials,
  *   LLR = k·log₂(p₁/p₀) + (n−k)·log₂(q₁/q₀),  q = 1 − p
  * — so the two per-observation weights are DRIVER-SIDE integer
  * constants in MICRO-log₂ units (×10⁶, [[llrWeightsMicroLog2]]) and
  * every cumulative LLR is an exact BIGINT sum of them: bit-identical on
  * both engines because the replay contract is the two INLINED literals,
  * not libm (they're computed once, on the driver — the oracle carries
  * the same numbers). Micro precision matters: the library's 1/16
  * fixed-point floor-log₂ is the right tool for PER-ROW log spellings,
  * but here the per-failure weight for a small effect (p₀ = 7.7%,
  * p₁ = 15%) is −1.9 sixteenths — truncation to −3 flips the SIGN of the
  * drift under H₁ and the test can never reject (caught by the q354
  * planted-signal check).
  *
  * Sequencing: observations arrive pre-aggregated as a (group, t,
  * successes, trials) CENSUS (a per-batch/per-day summary — the standard
  * production shape; checking at batch boundaries preserves the error
  * control, it only delays decisions within a batch). One cumulative
  * window over the census, then one aggregation picks the FIRST boundary
  * crossing per group. Census-sized work only.
  */
object Sequential {

  /** The SPRT per-observation weights in micro-log₂ units:
    * (⌊10⁶·log₂(p₁/p₀)⌋, ⌊10⁶·log₂(q₁/q₀)⌋), computed ONCE driver-side —
    * inline these same literals into any replay. */
  def llrWeightsMicroLog2(p0Ppm: Long, p1Ppm: Long): (Long, Long) = {
    require(p0Ppm > 0 && p0Ppm < 1000000L, s"llrWeights: p0Ppm in (0,1e6), got $p0Ppm")
    require(p1Ppm > 0 && p1Ppm < 1000000L, s"llrWeights: p1Ppm in (0,1e6), got $p1Ppm")
    def ulog2(num: Long, den: Long): Long =
      math.floor(1e6 * math.log(num.toDouble / den) / math.log(2.0)).toLong
    (ulog2(p1Ppm, p0Ppm), ulog2(1000000L - p1Ppm, 1000000L - p0Ppm))
  }

  /** Per-group SPRT decision trace. Input: one row per (group, t) with
    * `succCol` successes out of `trialCol` trials at step t. Returns one
    * row per group: (groupCols*, n_steps, n_trials, n_successes, last_t,
    * final_llr, decision ∈ reject_h0|accept_h0|continue, decided_t =
    * first crossing step (NULL while continuing), llr_at_decision). All
    * llr values in micro-log₂ units.
    *
    * @param p0Ppm  null-hypothesis success rate in ppm (0 < p0 < 10⁶)
    * @param p1Ppm  alternative success rate in ppm (0 < p1 < 10⁶, ≠ p0)
    * @param upperMicro reject-H0 boundary in micro-log₂ units (> 0;
    *                   Wald: ≈ 10⁶·log₂((1−β)/α))
    * @param lowerMicro accept-H0 boundary in micro-log₂ units (< 0) */
  def sprt(
      df: DataFrame,
      tCol: String,
      succCol: String,
      trialCol: String,
      p0Ppm: Long,
      p1Ppm: Long,
      upperMicro: Long,
      lowerMicro: Long,
      groupCols: Seq[String]): DataFrame = {
    require(p1Ppm != p0Ppm, "sprt: p1 must differ from p0")
    require(upperMicro > 0 && lowerMicro < 0,
      s"sprt: need lowerMicro < 0 < upperMicro, got [$lowerMicro, $upperMicro]")
    require(groupCols.nonEmpty,
      "sprt: empty groupCols would plan a single-task global window — " +
        "inject a literal constant group column for one stream")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    // the two per-observation weights: driver-side exact integers
    val (ls, lf) = llrWeightsMicroLog2(p0Ppm, p1Ppm)
    val wRun = Window.partitionBy(gs: _*).orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val traced = df
      .withColumn("__sq_llr",
        sum(col(succCol) * lit(ls) +
          (col(trialCol) - col(succCol)) * lit(lf)).over(wRun))
      .withColumn("__sq_cross",
        when(col("__sq_llr") >= upperMicro, lit("reject_h0"))
          .when(col("__sq_llr") <= lowerMicro, lit("accept_h0")))
    traced
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_steps"),
        sum(col(trialCol)).as("n_trials"),
        sum(col(succCol)).as("n_successes"),
        max(struct(col(tCol), col("__sq_llr"))).as("__sq_last"),
        // earliest crossing under (t) order — a struct-min over crossing rows
        min(when(col("__sq_cross").isNotNull,
          struct(col(tCol).as("t"), col("__sq_cross").as("d"),
            col("__sq_llr").as("l")))).as("__sq_first"))
      .select((gs :+
        col("n_steps") :+ col("n_trials") :+ col("n_successes") :+
        col("__sq_last").getField(tCol).as("last_t") :+
        col("__sq_last").getField("__sq_llr").as("final_llr") :+
        coalesce(col("__sq_first.d"), lit("continue")).as("decision") :+
        col("__sq_first.t").as("decided_t") :+
        col("__sq_first.l").as("llr_at_decision")): _*)
  }

  /** Benjamini–Hochberg FDR control — the multiple-testing layer above
    * every per-hypothesis test in the library (χ², rank tests, SPRT,
    * bootstrap): given m hypotheses per group with p-values in ppm,
    * reject the k* smallest where k* = max{k : p₍ₖ₎·m ≤ k·α} (step-up),
    * guaranteeing E[false discoveries / discoveries] ≤ α for independent
    * or PRDS statistics. The comparison is the exact integer
    * cross-multiplication p·m·1 ≤ k·α (no division anywhere), ranks come
    * from one per-group window over the HYPOTHESIS table (hypothesis
    * count is census-scale by definition — thousands of metrics, never
    * rows), and k* is a per-group max — one more census window. Ties on p
    * break by `idCol` so the rank (and thus the cut) is total-order
    * deterministic. Returns the input plus (rank, k_star, rejected). */
  def bhFdr(
      df: DataFrame,
      pPpmCol: String,
      idCol: String,
      alphaPpm: Long,
      groupCols: Seq[String]): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      s"bhFdr: alphaPpm in (0,1e6), got $alphaPpm")
    require(groupCols.nonEmpty,
      "bhFdr: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val wTot = Window.partitionBy(gs: _*)
    df
      .withColumn("__bh_rank", row_number().over(wTot.orderBy(col(pPpmCol), col(idCol))))
      .withColumn("__bh_m", count(lit(1)).over(wTot))
      .withColumn("__bh_ok",
        when(col(pPpmCol).cast("long") * col("__bh_m") <=
          col("__bh_rank").cast("long") * alphaPpm, col("__bh_rank").cast("long")))
      .withColumn("k_star", coalesce(max(col("__bh_ok")).over(wTot), lit(0L)))
      .withColumn("rejected", col("__bh_rank") <= col("k_star"))
      .withColumnRenamed("__bh_rank", "rank")
      .withColumn("rank", col("rank").cast("long"))
      .drop("__bh_m", "__bh_ok")
  }
}
