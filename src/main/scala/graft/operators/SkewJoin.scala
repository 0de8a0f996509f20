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
    * exact Gini concentration of the key distribution plus the hottest
    * key's shuffle share. Gini over sorted counts c_(1..m) is
    * G = Σ(2i − m − 1)·c_(i) / (m·Σc) — exact integers throughout (the
    * rank weights are the census positions), reported in sign-magnitude
    * ppm.
    *
    * Scale shape: the advisor's own use case is a big join with a
    * high-cardinality key (user_id, url), where the key CENSUS is itself
    * row-scale — so the rank pass must be DISTRIBUTED, never a global
    * unpartitioned window (which would pull the whole census into one
    * task). Two-pass rank: `repartitionByRange` on the census order
    * (count, keys) — a total order, census keys are distinct — then
    * `row_number` within each range partition (a partitionBy window, N
    * concurrent tasks) plus a broadcast per-partition row-count offset.
    * The offsets are one bounded collect (`rankPartitions` numbers, never
    * census rows). Returns one summary row (n_rows, n_keys, gini_ppm,
    * top1_ppm = hottest key's row share) — the numbers that decide
    * between a plain shuffle, AQE skew split, and explicit salting. */
  def skewReport(
      df: DataFrame, keyCols: Seq[String], rankPartitions: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "skewReport: at least one key column")
    require(rankPartitions >= 1, s"skewReport: rankPartitions $rankPartitions < 1")
    val ord = col("__sk_c") +: keyCols.map(col)
    // localCheckpoint pins BOTH the census content and the range
    // partitioner's sampled boundaries: the offset pass and the rank pass
    // below must see identical partition ids
    val census = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__sk_c"))
      .repartitionByRange(rankPartitions, ord: _*)
      .withColumn("__sk_pid", spark_partition_id())
      .localCheckpoint(true)
    // RangePartitioner emits partitions in sorted order, so the global
    // rank of a row is its within-partition rank plus the total row count
    // of all lower partitions — `rankPartitions` numbers, collected once
    val counts = census.groupBy("__sk_pid").agg(count(lit(1)).as("__sk_pc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
    val offsetRows = counts.map(_._1).zip(offsets.map(_._2)).toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsetRows.toDF("__sk_pid", "__sk_off")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__sk_pid")).orderBy(ord: _*)
    val ranked = census
      .withColumn("__sk_li", row_number().over(wLocal))
      .join(broadcast(offDf), Seq("__sk_pid"))
      .withColumn("__sk_i", col("__sk_off") + col("__sk_li"))
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

  /** EXACT inner-equi-join output cardinality WITHOUT running the join —
    * the planning advisor beside [[skewReport]]: |A ⋈ B| = Σ_k c_A(k)·c_B(k)
    * over the key censuses, so the cost is two census aggregations plus a
    * census-sized join — metadata-scale work that tells you whether the
    * real join's output is 10⁶ or 10¹² rows BEFORE you commit a cluster to
    * it (the number AQE only discovers after the shuffle is built).
    * Returns one row: (n_left, n_right, n_keys_common, join_rows,
    * max_key_rows = the hottest key's output contribution — the
    * skew-aware tasks-will-die check, pairing the Gini report). join_rows
    * accumulates in DECIMAL(38,0): per-key products of two row-scale
    * censuses overflow BIGINT exactly when the answer matters. */
  def joinSizeEstimate(
      left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinSizeEstimate: at least one join key")
    val ca = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__sk_ca"))
    val cb = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__sk_cb"))
    val totals = ca.agg(sum(col("__sk_ca")).as("n_left"))
      .crossJoin(cb.agg(sum(col("__sk_cb")).as("n_right")))
    ca.join(cb, keys)
      .agg(
        count(lit(1)).as("n_keys_common"),
        expr("CAST(sum(CAST(__sk_ca AS DECIMAL(38,0)) * __sk_cb) AS DECIMAL(38,0))")
          .as("join_rows"),
        max(col("__sk_ca") * col("__sk_cb")).as("max_key_rows"))
      .crossJoin(totals)
      .select(col("n_left"), col("n_right"), col("n_keys_common"),
        col("join_rows"), col("max_key_rows"))
  }
}
