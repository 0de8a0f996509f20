package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Idiv

/** Paired text-generation eval — the reference-based metrics an LLM
  * pipeline scores candidate outputs with (summaries vs sources, model
  * outputs vs references): clipped n-gram overlap in both directions
  * (ROUGE-n recall / BLEU-n modified precision) plus the brevity ratio,
  * all exact-integer ppm. No libm: BLEU's geometric mean and exp brevity
  * penalty are deliberately NOT taken — the per-n precision, recall and
  * length ratio are the engine-stable primitives a report layer can
  * combine however it likes (the q90 "never libm in scored paths"
  * discipline).
  *
  * Scale shape: tokenization + n-gram construction are pure per-row map
  * work; the clip is one (id, gram) census join between the two sides —
  * row-linear, partial-agg friendly, no windows.
  */
object EvalText {

  /** Whitespace-token n-gram array of `c` (empty when fewer than n
    * tokens — `sequence` would otherwise DESCEND on start > stop). */
  private def gramArray(c: Column, n: Int): Column = {
    val toks = split(c, " ")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-group micro-averaged clipped n-gram overlap of candidate vs
    * reference text columns: per document, matched = Σ_g min(count_cand(g),
    * count_ref(g)) — the clip that stops a candidate repeating one
    * reference gram from farming credit. Returns one row per group:
    * (groupCols*, n_docs, cand_grams, ref_grams, matched_grams,
    * rouge_recall_ppm = matched·10⁶ div ref_grams,
    * bleu_precision_ppm = matched·10⁶ div cand_grams,
    * brevity_ppm = cand_tokens·10⁶ div ref_tokens); ratio columns NULL
    * when their denominator is 0. */
  def ngramOverlapEval(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      n: Int,
      groupCols: Seq[String]): DataFrame = {
    require(n >= 1 && n <= 8, s"ngramOverlapEval: n in [1,8], got $n")
    require(groupCols.nonEmpty,
      "ngramOverlapEval: empty groupCols — inject a literal constant group column")
    val gs = groupCols.map(col)
    def gramCensus(c: String, out: String) = df
      .select((gs :+ col(idCol).as("__ev_id") :+
        explode(gramArray(col(c), n)).as("__ev_g")): _*)
      .groupBy((gs :+ col("__ev_id") :+ col("__ev_g")): _*)
      .agg(count(lit(1)).as(out))
    val cand = gramCensus(candCol, "__ev_cc")
    val ref = gramCensus(refCol, "__ev_rc")
    val clipped = cand
      .join(ref, groupCols :+ "__ev_id" :+ "__ev_g", "full_outer")
      .groupBy(gs: _*)
      .agg(
        sum(coalesce(col("__ev_cc"), lit(0L))).as("cand_grams"),
        sum(coalesce(col("__ev_rc"), lit(0L))).as("ref_grams"),
        sum(least(coalesce(col("__ev_cc"), lit(0L)), coalesce(col("__ev_rc"), lit(0L))))
          .as("matched_grams"))
    val lens = df.groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(candCol), " ")).cast("long")).as("__ev_ct"),
        sum(size(split(col(refCol), " ")).cast("long")).as("__ev_rt"))
    def ratio(num: Column, den: Column) =
      when(den === 0L, lit(null).cast("long")).otherwise(Idiv(num * 1000000L, den))
    // Left join: a group whose documents all fall below n tokens produces
    // zero gram rows on BOTH sides and would vanish from an inner join;
    // the contract is one row per group, with gram counts 0 and the ratio
    // columns NULL (zero denominators).
    lens.join(clipped, groupCols, "left")
      .withColumn("cand_grams", coalesce(col("cand_grams"), lit(0L)))
      .withColumn("ref_grams", coalesce(col("ref_grams"), lit(0L)))
      .withColumn("matched_grams", coalesce(col("matched_grams"), lit(0L)))
      .withColumn("rouge_recall_ppm", ratio(col("matched_grams"), col("ref_grams")))
      .withColumn("bleu_precision_ppm", ratio(col("matched_grams"), col("cand_grams")))
      .withColumn("brevity_ppm", ratio(col("__ev_ct"), col("__ev_rt")))
      .drop("__ev_ct", "__ev_rt")
  }
}
