package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter decision model
  * (Fellegi & Sunter, JASA 1969) on top of the repo's candidate
  * generators (sorted-neighborhood / equal-block blocking in
  * [[graft.text.Dedup]]).
  *
  * Candidate pairs carry one BOOLEAN agreement column per compared field
  * (the γ comparison vector). Each field j gets a match weight
  * log₂(m_j/u_j) when it agrees and log₂((1−m_j)/(1−u_j)) when it
  * disagrees; the pair score is the sum. m_j (P(agree | true match)) is a
  * fixed prior; u_j (P(agree | non-match)) is ESTIMATED from the candidate
  * population itself — with matches rare among candidates, the population
  * agreement rate approximates u, the classical one-pass estimator.
  *
  * All arithmetic is exact-integer: probabilities stay rationals
  * (Laplace-smoothed counts over C+2) and logs use the 1/16-resolution
  * fixed-point floor-log₂ (16·msb + mantissa nibble; the mantissa division
  * is by a power of two, exact in doubles — the q237 idiom, bit-stable
  * across engines). Scores are BIGINT in 1/16-bit units.
  *
  * Scale shape (100 TB): the u-estimator is ONE global partial aggregate
  * over the pairs (map-side combine into a single row), broadcast back via
  * a 1-row cross join; scoring is then a pure map-side projection. Total
  * cost beyond candidate generation: one scan + one broadcast.
  */
object Linkage {

  /** 1/16-resolution fixed-point floor-log₂ over a BIGINT ≥ 1:
    * 16·msb − 16 + ⌊x·16 / 2^msb⌋ (exact — the divisor is a power of two,
    * and x·16 < 2^53 for any count this library aggregates). */
  private[graft] def flog2fp(c: Column): Column = {
    val msb = (length(bin(c)) - 1).cast("int")
    val nibble = floor(c.cast("double") * 16d / pow(lit(2.0), msb.cast("double")))
    (lit(16L) * msb - 16L + nibble.cast("long")).cast("long")
  }

  /** Score candidate pairs with Fellegi–Sunter log-odds.
    *
    * @param pairs  candidate pairs; must carry the `fields` columns
    * @param fields boolean agreement columns (the γ vector), one per field
    * @param mNum/mDen the fixed match-agreement prior m = mNum/mDen
    *                  (same for every field; 15/16 ≈ "a true duplicate
    *                  agrees on a field with P=0.9375")
    * @return `pairs` plus a BIGINT `score` column in 1/16-bit units
    */
  def fellegiSunterScores(
      pairs: DataFrame,
      fields: Seq[String],
      mNum: Long = 15L,
      mDen: Long = 16L): DataFrame = {
    require(fields.nonEmpty, "fellegiSunterScores: at least one comparison field")
    require(mNum > 0 && mNum < mDen, s"fellegiSunterScores: m must be in (0,1), got $mNum/$mDen")
    // one row: C (candidate count) and per-field agree counts A_j —
    // map-side partial aggregate, then broadcast back as a 1-row cross join
    val stats = pairs.agg(
      count(lit(1)).as("__graft_C"),
      fields.map(f => sum(when(col(f), 1L).otherwise(0L)).as(s"__graft_A_$f")): _*)
    // per-field weights on the 1-row frame: u_j = (A_j+1)/(C+2) smoothed;
    // wa_j = f(mNum·(C+2)) − f(mDen·(A_j+1))       [≈ 16·log2(m/u)]
    // wd_j = f((mDen−mNum)·(C+2)) − f(mDen·(C−A_j+1)) [≈ 16·log2((1−m)/(1−u))]
    val weighted = stats.select(
      fields.flatMap { f =>
        val a = col(s"__graft_A_$f")
        val cc = col("__graft_C")
        Seq(
          (flog2fp(lit(mNum) * (cc + 2L)) - flog2fp(lit(mDen) * (a + 1L)))
            .as(s"__graft_wa_$f"),
          (flog2fp(lit(mDen - mNum) * (cc + 2L)) - flog2fp(lit(mDen) * (cc - a + 1L)))
            .as(s"__graft_wd_$f"))
      }: _*)
    val score = fields
      .map(f => when(col(f), col(s"__graft_wa_$f")).otherwise(col(s"__graft_wd_$f")))
      .reduce(_ + _)
    pairs
      .crossJoin(broadcast(weighted))
      .withColumn("score", score.cast("long"))
      .drop(fields.flatMap(f => Seq(s"__graft_wa_$f", s"__graft_wd_$f")): _*)
  }

  /** Golden-record survivorship — the MERGE step of entity resolution
    * (after blocking finds candidates, scoring links them, and connected
    * components clusters them, something must produce THE record): per
    * cluster and field, the survivor is the MOST FREQUENT non-null value
    * ("majority rules", the standard MDM survivorship policy), ties
    * broken by the smallest value so the outcome is total-order
    * deterministic — never "whichever partition answered last".
    *
    * NULL semantics: nulls never vote; a field null in every member
    * survives as null (no vote ≠ a vote for null).
    *
    * Scale shape: per field, one groupBy (cluster, value) count and one
    * per-cluster argmin of struct(−count, value) — both delta-sized
    * after the first aggregate; fields then join back on the cluster key
    * (f cluster-sized joins, not row-sized). No collects, no windows. */
  def goldenRecords(
      records: DataFrame,
      clusterCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecords: at least one field")
    require(records.columns.contains(clusterCol),
      s"goldenRecords: missing cluster column $clusterCol")
    val sizes = records.groupBy(col(clusterCol).as("cluster"))
      .agg(count(lit(1)).cast("long").as("n_members"))
    fields.foldLeft(sizes) { (acc, f) =>
      val survivor = records
        .filter(col(f).isNotNull)
        .groupBy(col(clusterCol).as("cluster"), col(f))
        .agg(count(lit(1)).as("__graft_c"))
        .groupBy("cluster")
        .agg(min(struct((-col("__graft_c")).as("nc"), col(f).as("v"))).as("__graft_best"))
        .select(col("cluster"), col(s"__graft_best.v").as(f))
      acc.join(survivor, Seq("cluster"), "left")
    }
  }
}
