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

  /** Quadratically weighted Cohen's κ per group — the ORDINAL-label
    * agreement statistic (Cohen, Psych. Bull. 1968): a 1-vs-2 rating
    * disagreement is mild, 1-vs-5 severe, weighted w_ab = (a−b)². Labels
    * must be integer-castable. Exact integer spelling over the label
    * censuses:
    *   κ_w = (Σw·r_a·c_b − N·Σw·O_ab) / (Σw·r_a·c_b)
    * (the 1 − observed/expected form with the N denominators cleared) —
    * the expected term is a label-grid-sized cross join of the two
    * marginal censuses, never a row join. Returns
    * (groupCols*, n, wo_num = Σw·O, we_num = Σw·r·c, kappa_ppm);
    * kappa_ppm NULL when we_num = 0 (both raters constant on the same
    * label — agreement undefined, the cohenKappa convention). */
  def weightedKappaQuadratic(
      df: DataFrame, aCol: String, bCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "weightedKappaQuadratic: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    val base = df.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      sum((a - b) * (a - b)).as("wo_num"))
    val ra = df.groupBy((gs :+ a.as("__ag_a")): _*).agg(count(lit(1)).as("__ag_r"))
    val rb = df.groupBy((gs :+ b.as("__ag_b")): _*).agg(count(lit(1)).as("__ag_c"))
    val we = ra.join(rb, groupCols) // label-grid² rows per group, census-sized
      .groupBy(gs: _*)
      .agg(sum((col("__ag_a") - col("__ag_b")) * (col("__ag_a") - col("__ag_b")) *
        col("__ag_r").cast("decimal(38,0)") * col("__ag_c")).as("__ag_we"))
    base.join(we, groupCols)
      .withColumn("kappa_ppm", ppmOrNull(
        col("__ag_we") - col("n").cast("decimal(38,0)") * col("wo_num"),
        col("__ag_we")))
      .withColumn("we_num", col("__ag_we").cast("long"))
      .select((gs :+ col("n") :+ col("wo_num") :+ col("we_num") :+ col("kappa_ppm")): _*)
  }

  /** Cochran's Q per group — do k paired binary classifiers share one
    * success rate? (Cochran, Biometrika 1950; the k-way extension of
    * McNemar.) Input rows are individual outcomes (item, classifier,
    * success); every item must carry all k classifiers exactly once
    * (complete block design — validated with a loud refusal, the
    * fleissKappa convention). With column totals C_j, row totals L_i,
    * N = ΣC:
    *   Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣL_i²)
    * — exact integers throughout; q_upm = Q·10⁶ by truncating division,
    * NULL when the denominator is 0 (every item unanimous — no
    * discordance, no test). p_ppm is the Markov bound min(1, 2·df/Q),
    * df = k−1 (the chi2Homogeneity convention: conservative, exact,
    * monotone — all a BH layer needs). Returns
    * (groupCols*, n_items, k, n_success, q_upm, p_ppm). */
  def cochranQ(
      df: DataFrame, itemCol: String, raterCol: String, successCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "cochranQ: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    val s = col(successCol).cast("long")
    val rows = df.groupBy((gs :+ col(itemCol).as("__ag_i")): _*)
      .agg(count(lit(1)).as("__ag_cnt"),
        countDistinct(col(raterCol)).as("__ag_kd"),
        sum(s).as("__ag_li"))
    val k = df.groupBy(gs: _*).agg(countDistinct(col(raterCol)).as("k"))
    val sizes = rows.join(k, groupCols)
    val bad = sizes.filter(col("__ag_cnt") =!= col("k") ||
      col("__ag_kd") =!= col("k")).limit(1).collect()
    require(bad.isEmpty,
      "cochranQ: every item needs exactly one outcome from EACH classifier " +
        "(complete block design) — found an item whose rating count or distinct-" +
        "classifier count differs from the group's k")
    val rowAgg = sizes.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_items"),
        max(col("k")).as("k"),
        sum(col("__ag_li")).as("n_success"),
        sum(col("__ag_li") * col("__ag_li")).as("__ag_l2"))
    val colAgg = df.groupBy((gs :+ col(raterCol)): _*)
      .agg(sum(s).as("__ag_cj"))
      .groupBy(gs: _*)
      .agg(sum(col("__ag_cj").cast("decimal(38,0)") * col("__ag_cj")).as("__ag_c2"))
    rowAgg.join(colAgg, groupCols)
      .withColumn("__ag_num",
        (col("k") - 1L).cast("decimal(38,0)") *
          (col("k") * col("__ag_c2") -
            col("n_success").cast("decimal(38,0)") * col("n_success")))
      .withColumn("__ag_den",
        col("k").cast("decimal(38,0)") * col("n_success") - col("__ag_l2"))
      .withColumn("q_upm",
        when(col("__ag_den") === 0, lit(null).cast("long"))
          .otherwise(Idiv(col("__ag_num") * 1000000L, col("__ag_den")).cast("long")))
      .withColumn("p_ppm",
        when(col("q_upm").isNull || col("q_upm") <= 0L, lit(1000000L))
          .otherwise(least(lit(1000000L), Idiv(
            lit(2L) * (col("k") - 1L).cast("decimal(38,0)") * 1000000000000L,
            col("q_upm")).cast("long"))))
      .select((gs :+ col("n_items") :+ col("k") :+ col("n_success") :+
        col("q_upm") :+ col("p_ppm")): _*)
  }
}
