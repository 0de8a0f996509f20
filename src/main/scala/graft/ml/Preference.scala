package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Idiv

/** Pairwise-preference strength fitting — the RLHF-data primitive: turn a
  * table of "A beat B" judgments into per-item strengths. Bradley–Terry
  * (Biometrika 1952) fit by Hunter's MM iteration (Ann. Stat. 2004),
  * re-expressed in integer fixed point so every round is a pure function
  * of exact integers — deterministic under any partitioning and
  * replayable as an iterated SQL CTE chain (one stage per round, the
  * oracle's `AS MATERIALIZED` convention).
  */
object Preference {

  /** `rounds` MM updates from the uniform start s⁰ = 10⁶:
    *
    *   s_i ← (W_i · 10⁶) div Σ_j ( (n_ij · 10⁶) div (s_i + s_j) )
    *
    * with W_i = i's total wins and n_ij = total comparisons between i and
    * j (both orientations folded). The true MM update is
    * W_i / Σ n_ij/(s_i+s_j); each inner quotient and the outer quotient
    * truncate in micro units (the per-step truncation contract —
    * deterministic, not a float in sight). BT strengths are scale-free;
    * this fixed-point variant pins the scale by the 10⁶ start and the
    * truncation, which both engines replay bit-for-bit. Items never on a
    * winning side still get rows (W = 0 → s = 0 after one round, the MM
    * boundary case — documented, standard for disconnected comparison
    * graphs). Convergence is geometric on connected graphs; `rounds` ≈ 4–8
    * suffices for demo-scale vocabularies and the round count is FIXED by
    * contract (a convergence test would make the oracle's stage count
    * data-dependent).
    *
    * Scale shape: the comparison census n_ij (items² at worst, pairs
    * actually compared in practice) drives each round — one join of the
    * census against the current score table on each endpoint + one groupBy
    * per round; scores are item-count-sized. Each round's table is
    * checkpointed via CheckpointFresh (loop-carried lineage).
    *
    * `pairs` needs (winner, loser) one row per judgment (or pre-counted
    * with a `w` count column — pass weightCol). Returns
    * (item, wins, score_micro). */
  def bradleyTerryMM(
      pairs: DataFrame,
      winnerCol: String,
      loserCol: String,
      rounds: Int,
      weightCol: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"bradleyTerryMM: rounds in [1,16] (fixed by contract), got $rounds")
    val cf = org.apache.spark.sql.graft.CheckpointFresh
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val judged = pairs.select(
      col(winnerCol).cast("long").as("__bt_w"),
      col(loserCol).cast("long").as("__bt_l"),
      w.as("__bt_c"))
    // n_ij folded symmetric (i, j) with i as the anchor: one row per
    // ORDERED pair so each item's fold scans its own census rows
    val nij = cf(judged
      .select(col("__bt_w").as("i"), col("__bt_l").as("j"), col("__bt_c"))
      .unionByName(judged
        .select(col("__bt_l").as("i"), col("__bt_w").as("j"), col("__bt_c")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("__bt_c")).as("n_ij")))
    val wins = cf(judged.groupBy(col("__bt_w").as("i"))
      .agg(sum(col("__bt_c")).as("wins")))
    val items = nij.select(col("i")).distinct()
      .join(wins, Seq("i"), "left")
      .select(col("i"), coalesce(col("wins"), lit(0L)).as("wins"))
    var scores = cf(items.withColumn("score_micro", lit(1000000L)))
    for (_ <- 1 to rounds) {
      val si = scores.select(col("i"), col("score_micro").as("__bt_si"))
      val sj = scores.select(col("i").as("j"), col("score_micro").as("__bt_sj"))
      val denom = nij
        .join(si, Seq("i"))
        .join(sj, Seq("j"))
        .withColumn("__bt_t",
          // two zero-strength endpoints (disconnected all-loser pockets)
          // contribute nothing rather than an ANSI division error
          when(col("__bt_si") + col("__bt_sj") === 0L, lit(0L))
            .otherwise(Idiv(col("n_ij") * 1000000L, col("__bt_si") + col("__bt_sj"))))
        .groupBy(col("i"))
        .agg(sum(col("__bt_t")).as("__bt_den"))
      scores = cf(scores.drop("score_micro")
        .join(denom, Seq("i"), "left")
        .withColumn("score_micro",
          when(col("__bt_den").isNull || col("__bt_den") === 0L, lit(0L))
            .otherwise(Idiv(col("wins") * 1000000L, col("__bt_den"))))
        .drop("__bt_den"))
    }
    scores.select(col("i").as("item"), col("wins"), col("score_micro"))
  }
}
