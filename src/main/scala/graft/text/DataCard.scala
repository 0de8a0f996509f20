package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus "data card": the per-slice summary table a training-data release
  * ships (Gebru et al. 2021 "Datasheets for Datasets" §3.2 — composition /
  * size / duplication; the quantitative rows of a model card's data
  * section). One row per `groupCols` cell:
  *
  *   n_docs, total_tokens, mean_tokens (exact integral mean),
  *   p50_tokens (LOWER-MEDIAN RANK PICK from the token-count census — the
  *     q261/q337 hash-match discipline, never interpolation),
  *   n_langs, top_lang + top_lang_ppm (the (count DESC, lang ASC)
  *     total-order pick over the language census),
  *   exact_dup_ppm (1 − distinct/total over the 64-bit normalized-content
  *     fingerprint — fixed-width keys shuffle instead of full texts, the
  *     dedup-family scale shape; identical to counting distinct normalized
  *     TEXT absent a 2⁻⁶⁴ collision, which is how an oracle replays it).
  *
  * Scale shape: one map-side projection (token count + fingerprint), one
  * main groupBy with map-side partials, plus two CENSUS aggregates
  * (token-count census for the median pick, language census for the top
  * pick) joined back on the group key — census sizes are value-grid ×
  * groups, never row-scale. No windows over raw rows. */
object DataCard {

  def dataCard(
      df: DataFrame,
      textCol: String,
      langCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "dataCard: need at least one group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val base = df.select(
      (gs :+ col(langCol).as("__dc_lang") :+
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__dc_tok") :+
        TextFunctions.fingerprint(col(textCol)).as("__dc_fp")): _*)
    val main = base.groupBy(gs: _*).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__dc_tok")).as("total_tokens"),
      Idiv(sum(col("__dc_tok")), count(lit(1))).cast("long").as("mean_tokens"),
      countDistinct(col("__dc_fp")).as("__dc_distinct"),
      countDistinct(col("__dc_lang")).as("n_langs"))
      .withColumn("exact_dup_ppm",
        Idiv((col("n_docs") - col("__dc_distinct")) * 1000000L, col("n_docs")).cast("long"))
    // lower-median rank pick from the token-count census: the smallest
    // token count whose cumulative census count reaches ceil(n/2)
    val census = base.groupBy((gs :+ col("__dc_tok")): _*).agg(count(lit(1)).as("__dc_c"))
    val cumW = Window.partitionBy(gs: _*).orderBy(col("__dc_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p50 = census
      .withColumn("__dc_cum", sum(col("__dc_c")).over(cumW))
      .withColumn("__dc_n", sum(col("__dc_c")).over(Window.partitionBy(gs: _*)))
      .filter(col("__dc_cum") * 2L >= col("__dc_n") + 1L)
      .groupBy(gs: _*)
      .agg(min(col("__dc_tok")).as("p50_tokens"))
    // top language by the (count DESC, lang ASC) total order
    val langCensus = base.groupBy((gs :+ col("__dc_lang")): _*).agg(count(lit(1)).as("__dc_lc"))
    val topW = Window.partitionBy(gs: _*).orderBy(desc("__dc_lc"), asc("__dc_lang"))
    val top = langCensus
      .withColumn("__dc_rn", row_number().over(topW))
      .filter(col("__dc_rn") === 1)
      .select((gs :+ col("__dc_lang").as("top_lang") :+ col("__dc_lc").as("__dc_topc")): _*)
    main
      .join(p50, groupCols)
      .join(top, groupCols)
      .withColumn("top_lang_ppm",
        Idiv(col("__dc_topc") * 1000000L, col("n_docs")).cast("long"))
      .select((gs :+ col("n_docs").cast("long").as("n_docs") :+
        col("total_tokens").cast("long").as("total_tokens") :+ col("mean_tokens") :+
        col("p50_tokens") :+ col("n_langs").cast("long").as("n_langs") :+
        col("top_lang") :+ col("top_lang_ppm") :+ col("exact_dup_ppm")): _*)
  }
}
