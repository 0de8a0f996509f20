package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Idiv

/** Inter-annotator / paired-classifier agreement statistics — the label-
  * quality layer an LLM training pipeline runs over every human- or
  * model-annotated corpus slice (are two labelers consistent? did the new
  * model actually change the errors, or just shuffle them?). All three
  * statistics are rationals of exact integer censuses, carried in
  * DECIMAL(38,0) and emitted as sign-magnitude ppm via truncating division
  * — the RankStats cross-engine discipline (Spark `div` ≡ DuckDB `//` on
  * the sign-magnitude spelling).
  *
  * Scale shape: everything is one row-linear groupBy into a CATEGORY
  * census (categories × groups rows), then census-sized joins/aggregates —
  * no windows over rows, no self-joins.
  */
object Agreement {

  /** Sign-magnitude ppm of num/den in DECIMAL(38,0), NULL when den = 0
    * (ANSI `div` by zero would throw; NULL is the honest "undefined"). */
  private def ppmOrNull(num: org.apache.spark.sql.Column,
      den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(den === 0, lit(null).cast("long")).otherwise(
      when(num < 0, -1L).otherwise(1L) *
        Idiv(abs(num).cast("decimal(38,0)") * 1000000L, den).cast("long"))

  /** Cohen's κ per group — chance-corrected agreement of TWO raters over
    * one categorical label per item (Cohen, Educ. Psychol. Meas. 1960).
    * One row per item with both raters' labels; κ = (p_o − p_e)/(1 − p_e)
    * spelled over exact integers as
    * (N·agree − Σ_k r_k·c_k) / (N² − Σ_k r_k·c_k), where r/c are the two
    * raters' marginal label censuses joined FULL-OUTER on the label (a
    * label used by only one rater contributes 0 to the product but must
    * not drop the other side's census row). Returns
    * (groupCols*, n, agree, pe_num, kappa_ppm); kappa_ppm NULL when both
    * raters are constant and identical (N² = pe_num — agreement is
    * undefined, not perfect). */
  def cohenKappa(
      df: DataFrame, aCol: String, bCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "cohenKappa: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val base = df.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      sum(when(col(aCol) === col(bCol), 1L).otherwise(0L)).as("agree"))
    val ra = df.groupBy((gs :+ col(aCol).as("__ag_k")): _*)
      .agg(count(lit(1)).as("__ag_r"))
    val rb = df.groupBy((gs :+ col(bCol).as("__ag_k")): _*)
      .agg(count(lit(1)).as("__ag_c"))
    val pe = ra.join(rb, groupCols :+ "__ag_k", "full_outer")
      .groupBy(gs: _*)
      .agg(sum(coalesce(col("__ag_r"), lit(0L)) * coalesce(col("__ag_c"), lit(0L)))
        .as("pe_num"))
    base.join(pe, groupCols)
      .withColumn("kappa_ppm", ppmOrNull(
        col("n") * col("agree") - col("pe_num"),
        col("n") * col("n") - col("pe_num")))
  }

  /** Fleiss' κ per group — chance-corrected agreement of n RATERS over a
    * categorical label (Fleiss, Psych. Bull. 1971). Input rows are
    * INDIVIDUAL ratings (item, category); every item in a group must carry
    * the same number of ratings n ≥ 2 (validated with a loud refusal —
    * Fleiss' P̄e is undefined under varying n). With M items, D = M·n,
    * A = Σ_items Σ_cat n_ic(n_ic−1), B = M·n(n−1), E = Σ_cat C_c²:
    * κ = (A·D² − E·B) / (B·(D² − E)) — exact integers throughout.
    * Returns (groupCols*, n_items, n_raters, po_pair_num, pe_sq_num,
    * kappa_ppm); NULL κ when every rating in the group is one category
    * (D² = E). */
  def fleissKappa(
      df: DataFrame, itemCol: String, catCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "fleissKappa: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val perItemCat = df
      .groupBy((gs :+ col(itemCol).as("__ag_i") :+ col(catCol).as("__ag_k")): _*)
      .agg(count(lit(1)).as("__ag_nic"))
    val perItem = perItemCat
      .groupBy((gs :+ col("__ag_i")): _*)
      .agg(sum(col("__ag_nic")).as("__ag_ni"),
        sum(col("__ag_nic") * (col("__ag_nic") - 1L)).as("__ag_pairs"))
    val sizes = perItem.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_items"),
        min(col("__ag_ni")).as("__ag_nmin"), max(col("__ag_ni")).as("__ag_nmax"),
        sum(col("__ag_pairs")).as("po_pair_num"))
    val catTotals = perItemCat
      .groupBy((gs :+ col("__ag_k")): _*)
      .agg(sum(col("__ag_nic")).as("__ag_cc"))
      .groupBy(gs: _*)
      .agg(sum(col("__ag_cc").cast("decimal(38,0)") * col("__ag_cc")).as("pe_sq_num"))
    val joined = sizes.join(catTotals, groupCols)
    val bad = joined.filter(col("__ag_nmin") =!= col("__ag_nmax") ||
      col("__ag_nmin") < 2L).limit(1).collect()
    require(bad.isEmpty,
      "fleissKappa: every item needs the SAME rating count n >= 2 per group " +
        s"(found a group with min/max ratings ${bad.headOption.map(r =>
          s"${r.getAs[Long]("__ag_nmin")}/${r.getAs[Long]("__ag_nmax")}").getOrElse("")}) — " +
        "Fleiss' chance term is undefined under varying n")
    joined
      .withColumn("n_raters", col("__ag_nmin"))
      .withColumn("__ag_d", (col("n_items") * col("n_raters")).cast("decimal(38,0)"))
      .withColumn("__ag_b", col("n_items") * col("n_raters") * (col("n_raters") - 1L))
      .withColumn("kappa_ppm", ppmOrNull(
        col("po_pair_num") * col("__ag_d") * col("__ag_d") -
          col("pe_sq_num") * col("__ag_b"),
        col("__ag_b") * (col("__ag_d") * col("__ag_d") - col("pe_sq_num"))))
      .withColumn("pe_sq_num", col("pe_sq_num").cast("long"))
      .select((gs :+ col("n_items") :+ col("n_raters") :+ col("po_pair_num") :+
        col("pe_sq_num") :+ col("kappa_ppm")): _*)
  }

  /** Majority vote + per-annotator reliability — the label-noise triage
    * step before any κ deep-dive: per item the majority label (ties to the
    * SMALLEST label id — a total-order pick, the Theil–Sen discipline), and
    * per annotator the share of their ratings that match it. The majority
    * includes the rater being scored (the plain convention; leave-one-out
    * changes per-rater majorities item-by-item and is a different, heavier
    * operator). Labels must be integer-castable so the tie-break is
    * engine-stable. Input rows are individual ratings (item, rater, label);
    * items rated once still count (their single rating IS the majority).
    * Returns (groupCols*, rater, n_rated, n_match, match_ppm). */
  def majorityVote(
      df: DataFrame, itemCol: String, raterCol: String, catCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "majorityVote: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val ratings = df.select((gs :+ col(itemCol).as("__ag_i") :+
      col(raterCol).as("__ag_r") :+ col(catCol).cast("long").as("__ag_k")): _*)
    val majority = ratings
      .groupBy((gs :+ col("__ag_i") :+ col("__ag_k")): _*)
      .agg(count(lit(1)).as("__ag_c"))
      .groupBy((gs :+ col("__ag_i")): _*)
      .agg(max(struct(col("__ag_c"), (-col("__ag_k")).as("negk"))).as("__ag_m"))
      .select((gs :+ col("__ag_i") :+ (-col("__ag_m.negk")).as("__ag_maj")): _*)
    ratings
      .join(majority, groupCols :+ "__ag_i")
      .groupBy((gs :+ col("__ag_r").as("rater")): _*)
      .agg(
        count(lit(1)).as("n_rated"),
        sum(when(col("__ag_k") === col("__ag_maj"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("match_ppm",
        Idiv(col("n_match") * 1000000L, col("n_rated")))
  }

  /** Krippendorff's α, nominal data — the agreement coefficient that
    * TOLERATES varying rater counts per item (the case [[fleissKappa]]
    * refuses): α = 1 − D_o/D_e with observed disagreement
    * D_o ∝ Σ_items (Σ_c n_ic(n_i − n_ic)) / (n_i − 1) and expected
    * D_e ∝ (Σ_c N_c(N − N_c)) / (N − 1) over the pooled margins of the
    * PAIRABLE items (n_i ≥ 2; single-rating items carry no pair
    * information and are dropped, the standard convention). The per-item
    * and pooled quotients truncate in micro units (the Nelson–Aalen
    * contract — exact rationals would need per-item LCMs), then
    * α_ppm = (D_e − D_o)·10⁶ div D_e sign-magnitude, NULL when D_e = 0
    * (every pooled rating one category). Returns
    * (groupCols*, n_items, n_ratings, do_micro, de_micro, alpha_ppm). */
  def krippendorffAlphaNominal(
      df: DataFrame, itemCol: String, catCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "krippendorffAlphaNominal: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val perItemCat = df
      .groupBy((gs :+ col(itemCol).as("__ag_i") :+ col(catCol).as("__ag_k")): _*)
      .agg(count(lit(1)).as("__ag_nic"))
    val perItem = perItemCat
      .groupBy((gs :+ col("__ag_i")): _*)
      .agg(sum(col("__ag_nic")).as("__ag_ni"))
      .filter(col("__ag_ni") >= 2L)
    val pairable = perItemCat.join(perItem, groupCols :+ "__ag_i")
    val doTerm = pairable
      .groupBy((gs :+ col("__ag_i") :+ col("__ag_ni")): _*)
      .agg(sum(col("__ag_nic") * (col("__ag_ni") - col("__ag_nic"))).as("__ag_dis"))
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("__ag_ni")).as("n_ratings"),
        sum(Idiv(col("__ag_dis") * 1000000L, col("__ag_ni") - 1L)).as("do_micro"))
    val deTerm = pairable
      .groupBy((gs :+ col("__ag_k")): _*)
      .agg(sum(col("__ag_nic")).as("__ag_nc"))
      .groupBy(gs: _*)
      .agg(sum(col("__ag_nc")).as("__ag_n"),
        sum(col("__ag_nc").cast("decimal(38,0)") * col("__ag_nc")).as("__ag_sq"))
      .withColumn("de_micro",
        when(col("__ag_n") <= 1L, lit(0L)).otherwise(Idiv(
          (col("__ag_n").cast("decimal(38,0)") * col("__ag_n") - col("__ag_sq")) *
            1000000L,
          col("__ag_n") - 1L).cast("long")))
      .select((gs :+ col("de_micro")): _*)
    doTerm.join(deTerm, groupCols)
      .withColumn("alpha_ppm", ppmOrNull(
        (col("de_micro") - col("do_micro")).cast("decimal(38,0)"), col("de_micro")))
  }

  /** McNemar's test per group — do two paired classifiers differ, judged
    * ONLY on the discordant pairs (McNemar, Psychometrika 1947)? One row
    * per item with each classifier's boolean correctness. With
    * b = #(A right, B wrong) and c = #(A wrong, B right):
    * χ² = (b−c)²/(b+c), emitted exact as chi2_upm = (b−c)²·10⁶ div (b+c)
    * (NULL when b = c = 0 — no discordance, no test), and the 5%
    * significance decided by the exact rational cross-multiplication
    * 25·(b−c)² ≥ 96·(b+c) (χ²₁ ≥ 3.84 = 96/25 — the q210 idiom, no libm).
    * Returns (groupCols*, n, n_only_a, n_only_b, chi2_upm, significant). */
  def mcnemar(
      df: DataFrame, aCorrectCol: String, bCorrectCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "mcnemar: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(aCorrectCol) && !col(bCorrectCol), 1L).otherwise(0L))
          .as("n_only_a"),
        sum(when(!col(aCorrectCol) && col(bCorrectCol), 1L).otherwise(0L))
          .as("n_only_b"))
      .withColumn("__ag_d", col("n_only_a") - col("n_only_b"))
      .withColumn("chi2_upm",
        when(col("n_only_a") + col("n_only_b") === 0L, lit(null).cast("long"))
          .otherwise(Idiv(
            col("__ag_d").cast("decimal(38,0)") * col("__ag_d") * 1000000L,
            col("n_only_a") + col("n_only_b")).cast("long")))
      .withColumn("significant",
        coalesce(lit(25L) * col("__ag_d") * col("__ag_d") >=
          lit(96L) * (col("n_only_a") + col("n_only_b")) &&
          (col("n_only_a") + col("n_only_b")) > 0L, lit(false)))
      .drop("__ag_d")
  }
}
