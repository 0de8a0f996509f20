package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised feature engineering primitives for training-data pipelines. */
object Features {

  /** Leakage-safe OUT-OF-FOLD target encoding (the K-fold mean-target
    * encoder of the Kaggle/CatBoost lineage): a high-cardinality
    * categorical column is replaced by the mean of the target computed
    * WITHOUT the row's own fold — encode(row in fold f, category c) =
    * (sum_c − sum_{c,f}) / (cnt_c − cnt_{c,f}) — so no row's target ever
    * contributes to its own feature value, the leak that makes naive
    * mean-encoding win validation and lose production.
    *
    * Exactness: the target must be integral (`targetCol` is cast to
    * BIGINT); encodings are exact rationals surfaced as `enc_num`/
    * `enc_den` plus an integral-div `enc_ppm`. A category seen ONLY in
    * the row's fold has no out-of-fold evidence — it falls back to the
    * global out-of-fold prior (same formula over the whole table), with
    * `enc_fallback` marking those rows.
    *
    * Scale shape (100 TB): one groupBy to (category, fold) partials;
    * category totals fold FROM the partials (delta-sized, no second
    * scan); the per-row join is keyed on (category, fold) — a hot
    * category is exactly the AQE-skew-join case and splits at runtime;
    * global fold priors are a ≤ #folds-row broadcast. */
  def targetEncodeOOF(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      foldCol: String): DataFrame = {
    require(df.columns.contains(catCol) && df.columns.contains(targetCol)
      && df.columns.contains(foldCol),
      s"targetEncodeOOF: need $catCol, $targetCol, $foldCol in ${df.columns.mkString(",")}")
    val partials = df
      .select(col(catCol).as("__graft_cat"), col(foldCol).as("__graft_fold"),
        col(targetCol).cast("long").as("__graft_t"))
      .groupBy("__graft_cat", "__graft_fold")
      .agg(sum(col("__graft_t")).as("__graft_sf"), count(lit(1)).as("__graft_nf"))
      .localCheckpoint(true) // feeds category totals, fold priors, and the row join
    val catTotals = partials.groupBy("__graft_cat")
      .agg(sum(col("__graft_sf")).as("__graft_sc"), sum(col("__graft_nf")).as("__graft_nc"))
    val foldPriors = partials.groupBy(col("__graft_fold").as("__graft_pfold"))
      .agg(sum(col("__graft_sf")).as("__graft_sfold"), sum(col("__graft_nf")).as("__graft_nfold"))
      .crossJoin(partials.agg(
        sum(col("__graft_sf")).as("__graft_sall"), sum(col("__graft_nf")).as("__graft_nall")))
    val enc = partials
      .join(catTotals, Seq("__graft_cat"))
      .select(col("__graft_cat"), col("__graft_fold"),
        (col("__graft_sc") - col("__graft_sf")).as("__graft_oof_s"),
        (col("__graft_nc") - col("__graft_nf")).as("__graft_oof_n"))
    df
      .join(enc, col(catCol) === col("__graft_cat") && col(foldCol) === col("__graft_fold"))
      .join(broadcast(foldPriors), col(foldCol) === col("__graft_pfold"))
      .withColumn("enc_fallback", col("__graft_oof_n") === 0L)
      .withColumn("enc_num",
        when(col("enc_fallback"), col("__graft_sall") - col("__graft_sfold"))
          .otherwise(col("__graft_oof_s")).cast("long"))
      .withColumn("enc_den",
        when(col("enc_fallback"), col("__graft_nall") - col("__graft_nfold"))
          .otherwise(col("__graft_oof_n")).cast("long"))
      .withColumn("enc_ppm",
        when(col("enc_den") > 0L, expr("(enc_num * CAST(1000000 AS BIGINT)) div enc_den"))
          .otherwise(lit(null).cast("long")))
      .drop("__graft_cat", "__graft_fold", "__graft_pfold", "__graft_oof_s", "__graft_oof_n",
        "__graft_sfold", "__graft_nfold", "__graft_sall", "__graft_nall")
  }
}
