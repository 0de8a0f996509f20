package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the classic fix when one hot key
  * concentrates a shuffle partition and AQE's skew-join split can't help
  * (e.g. the skew is in a join the optimizer planned as broadcast-less
  * sort-merge, or the runtime is pre-AQE).
  *
  * Mechanics: the BIG side appends `salt = pmod(xxhash64(saltSource), s)`
  * — `saltSource` must vary WITHIN a hot key (the big table's own row id
  * column is the usual choice) so the hot key's rows spread across `s`
  * sub-partitions; the SMALL side replicates each row `s` times via a
  * sequence explode. Joining on `keys :+ salt` then yields exactly the
  * plain equi-join's rows (each big row matches its small row at exactly
  * its own salt), with the hot key's work spread over `s` tasks.
  *
  * Inner and left_outer semantics are preserved (each big row still
  * matches, or not, exactly once per small match); right/full would count
  * unmatched small rows `s` times and are rejected.
  *
  * Cost model: ×s duplication of the small side's shuffle — worth it only
  * when the small side is modest and the hot key dominates a task. Prefer
  * `broadcast(small)` when the small side fits in memory; salting is for
  * the in-between regime. */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltSource: Column,
      joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must exceed 1 (1 would be a plain join)")
    require(keys.nonEmpty, "saltedEquiJoin needs join keys")
    require(
      Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedEquiJoin preserves inner/left semantics only, got $joinType")
    val b = big.withColumn(
      "__graft_salt", pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val sm = small.withColumn(
      "__graft_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keys :+ "__graft_salt", joinType).drop("__graft_salt")
  }

  /** Join-key skew report — the "should I salt?" advisor pairing the
    * salting operators and the AQE skew contract: per key-census, the
    * exact Gini concentration of the key distribution plus the top-k hot
    * keys with their shuffle shares. Gini over sorted counts c_(1..m) is
    * G = Σ(2i − m − 1)·c_(i) / (m·Σc) — exact integers throughout (the
    * rank weights are the census positions), reported in sign-magnitude
    * ppm. The only ordered pass runs over the KEY CENSUS (one row per
    * distinct key), never rows; top-k rides the bounded-heap TopK
    * operator. Returns one summary row (n_rows, n_keys, gini_ppm,
    * top1_ppm = hottest key's row share) — the numbers that decide
    * between a plain shuffle, AQE skew split, and explicit salting. */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "skewReport: at least one key column")
    val census = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__sk_c"))
      .localCheckpoint(true) // window + two aggregates below
    val w = org.apache.spark.sql.expressions.Window
      .orderBy((col("__sk_c") +: keyCols.map(col)): _*)
    val ranked = census.withColumn("__sk_i", row_number().over(w))
    val agg = ranked.agg(
      sum(col("__sk_c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      sum((lit(2L) * col("__sk_i")) * col("__sk_c")).as("__sk_wsum"),
      max(col("__sk_c")).as("__sk_top1"))
    agg
      .withColumn("__sk_num",
        col("__sk_wsum") - (col("n_keys") + 1L) * col("n_rows"))
      .transform(d => graft.operators.RankStats.withPpm(d,
        col("__sk_num"), col("n_keys") * col("n_rows"), "gini_ppm"))
      .transform(d => graft.operators.RankStats.withPpm(d,
        col("__sk_top1"), col("n_rows"), "top1_ppm"))
      .drop("__sk_wsum", "__sk_num", "__sk_top1")
  }
}
