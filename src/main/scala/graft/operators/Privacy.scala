package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-gating privacy operators. Pseudonymization (keyed sha2 digests,
  * q147) hides direct identifiers; these guard the QUASI-identifiers — the
  * column combinations that re-identify a row by uniqueness (Sweeney's
  * k-anonymity model, the standard bar for tabular data releases).
  *
  * Scale shape: one hash aggregation over the quasi columns (map-side
  * partials absorb the hot groups) and one semi/anti join back — no
  * windows, no sort. */
object Privacy {

  /** Rows whose quasi-identifier group has at least `k` members — the
    * k-anonymity SUPPRESSION pass (rows in smaller groups are dropped;
    * generalize-then-retry is the caller's loop, coarsening a quasi column
    * between attempts). */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymitySuppress: no quasi columns")
    require(k >= 1, s"kAnonymitySuppress: k must be >= 1, got $k")
    val big = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") >= k)
      .drop("__graft_n")
      .select(quasiCols.map(c => col(c).as(s"__graft_$c")): _*)
    // NULL-SAFE equality (<=>): groupBy treats NULL as a real group, so the
    // audit and the suppression must agree about it — a null-unsafe semi
    // join would silently delete every NULL-quasi row however big its group
    val cond = quasiCols.map(c => col(c) <=> col(s"__graft_$c")).reduce(_ && _)
    df.join(big, cond, "left_semi")
  }

  /** Per-group audit: size and the distinct count of a sensitive column
    * (l-diversity — a k-anonymous group is still unsafe when everyone in
    * it shares the sensitive value). `suppressed` marks groups below k. */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        count_distinct(col(sensitiveCol)).cast("long").as("l_diversity"))
      .withColumn("suppressed", col("n") < k)

  /** t-closeness audit (Li/Li/Venkatasubramanian ICDE 2007 — the third
    * rung of the release-gate ladder after k-anonymity and l-diversity: a
    * group can be large AND diverse yet still leak because its sensitive
    * DISTRIBUTION differs from the table's). For an ORDERED sensitive
    * attribute pre-bucketed by `bucketCol`, the distance is the 1-D earth
    * mover's distance over the bucket order:
    * EMD = (1/(m−1))·Σ_i |cumP_g(i) − cumQ(i)|.
    *
    * All arithmetic is exact-integer: cumulative counts never become
    * fractions — |cumg_i·N − cumG_i·n_g| over the common denominator
    * n_g·N, reported as integral-div ppm (valid while n_g·N·10⁶ < 2⁶³,
    * i.e. group×table up to ~9·10¹²; past that, switch the numerator to
    * the fixed-bucket-order double sum, which is still
    * partitioning-deterministic because the spine fixes the add order).
    *
    * Scale shape: one groupBy to (group, bucket) counts; the global
    * bucket distribution folds from THOSE partials (no second scan) and
    * broadcasts — the per-group work is groups×m spine rows with one
    * window cumsum partitioned BY GROUP. The only unpartitioned window
    * orders the ≤ m global buckets (a bounded set by construction). */

  /** Format-preserving pseudonymization — a keyed Feistel PERMUTATION of
    * the 62-bit integer space (the FPE/FF1 construction shape): unlike the
    * one-way sha2 pseudonyms (q147), this token is INVERTIBLE by the key
    * holder — re-identification under legal order, cross-system joins on
    * tokens, referential integrity across pseudonymized tables — while
    * remaining a bijection (no collisions, ever, by construction).
    *
    * Balanced Feistel over 31-bit halves, `rounds` rounds, round function
    * F_i(R) = xxhash64(R + (i+1)·2³¹ + keyMod·2³⁶) mod 2³¹ — all inputs
    * stay < 2⁶² so ANSI BIGINT arithmetic never overflows, and XOR keeps
    * halves in range without carries. Pure column expressions, map-side,
    * engine-replayable (the oracle chains the hash stages per round).
    * Security note: xxhash64 is NOT a PRF — production swaps F for
    * HMAC/AES rounds (the FF1 standard); the permutation STRUCTURE,
    * domain handling, and inverse are what this operator pins. */
  def feistelPermute(id: Column, key: String, rounds: Int = 4): Column = {
    require(rounds >= 2 && rounds <= 16, s"feistelPermute: rounds $rounds out of [2, 16]")
    val keyMod = key.foldLeft(0L)((a, c) => (a * 31 + c) % 1024L)
    val half = 2147483648L // 2^31
    // split by SHIFTS, not division — a double quotient loses bits past
    // 2^53 (domain contract: 0 ≤ id < 2^62)
    var lc: Column = shiftright(id.cast("long"), 31)
    var rc: Column = id.cast("long").bitwiseAND(lit(half - 1L))
    (0 until rounds).foreach { i =>
      val f = pmod(xxhash64(rc + lit((i + 1).toLong * half) + lit(keyMod * 68719476736L)),
        lit(half))
      val newR = lc.bitwiseXOR(f)
      lc = rc
      rc = newR
    }
    (shiftleft(lc, 31) + rc).cast("long")
  }

  /** Inverse of [[feistelPermute]] under the same key and round count. */
  def feistelInvert(token: Column, key: String, rounds: Int = 4): Column = {
    require(rounds >= 2 && rounds <= 16, s"feistelInvert: rounds $rounds out of [2, 16]")
    val keyMod = key.foldLeft(0L)((a, c) => (a * 31 + c) % 1024L)
    val half = 2147483648L
    var lc: Column = shiftright(token.cast("long"), 31)
    var rc: Column = token.cast("long").bitwiseAND(lit(half - 1L))
    ((rounds - 1) to 0 by -1).foreach { i =>
      val f = pmod(xxhash64(lc + lit((i + 1).toLong * half) + lit(keyMod * 68719476736L)),
        lit(half))
      val newL = rc.bitwiseXOR(f)
      rc = lc
      lc = newL
    }
    (shiftleft(lc, 31) + rc).cast("long")
  }

  def tClosenessReport(
      df: DataFrame,
      quasiCols: Seq[String],
      bucketCol: Column,
      tPpm: Long): DataFrame = {
    require(quasiCols.nonEmpty, "tClosenessReport: at least one quasi-identifier column")
    require(tPpm >= 0, s"tClosenessReport: tPpm $tPpm must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val q = quasiCols.map(col)
    val counts = df
      .select(q :+ bucketCol.cast("long").as("__graft_b"): _*)
      .groupBy(q :+ col("__graft_b"): _*)
      .agg(count(lit(1)).as("__graft_c"))
      .localCheckpoint(true) // feeds global, groups, and the spine join
    // NOTE: column resolution is case-INSENSITIVE in Spark and DuckDB —
    // "cumg"/"cumG" are the SAME identifier (withColumn would silently
    // replace), so the two cumulative sums get unambiguous names
    val globalCum = counts
      .groupBy("__graft_b").agg(sum(col("__graft_c")).as("__graft_g"))
      .select(col("__graft_b"),
        sum(col("__graft_g")).over(Window.orderBy("__graft_b")).as("__graft_cum_all"))
      .crossJoin(counts.agg(
        sum(col("__graft_c")).cast("long").as("__graft_N"),
        count_distinct(col("__graft_b")).cast("long").as("__graft_m")))
    val groups = counts
      .groupBy(q: _*).agg(sum(col("__graft_c")).as("__graft_ng"))
    val spine = groups.crossJoin(broadcast(globalCum))
      .join(counts, quasiCols :+ "__graft_b", "left")
      .withColumn("__graft_cum_grp",
        sum(coalesce(col("__graft_c"), lit(0L)))
          .over(Window.partitionBy(q: _*).orderBy("__graft_b")))
    spine
      .groupBy(q :+ col("__graft_ng").as("n") :+ col("__graft_N") :+ col("__graft_m"): _*)
      .agg(sum(abs(col("__graft_cum_grp") * col("__graft_N") -
        col("__graft_cum_all") * col("__graft_ng"))).as("__graft_num"))
      .withColumn("emd_ppm",
        when(col("__graft_m") > 1L,
          expr("(__graft_num * CAST(1000000 AS BIGINT)) div ((__graft_m - 1) * n * __graft_N)"))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("breached", col("emd_ppm") > tPpm)
      .select(q ++ Seq(col("n").cast("long").as("n"), col("emd_ppm"), col("breached")): _*)
  }

  /** Noisy count release — the discrete-Laplace (two-sided geometric)
    * mechanism at ε = ln 2: P(noise = ±k) ∝ 2^−k, the integer-valued
    * Laplace that differential-privacy count releases use. The noise here
    * is DERANDOMIZED from xxhash64(group ‖ seed): magnitude = trailing
    * zeros of a 32-bit hash slice (exactly geometric with p = ½, capped
    * at 32), sign from the next hash bit — bit-replayable in any engine,
    * which is what makes the release pipeline TESTABLE end to end. A
    * production release swaps the hash for a CSPRNG draw per (group,
    * release-id); everything else — the mechanism, the cap, the
    * sensitivity-1 count — is unchanged. Pure map-side after one count
    * aggregate.
    *
    * Returns (groupCols*, n, noise, noisy_n) — callers drop `n`/`noise`
    * from the published artifact. */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], seed: String): DataFrame = {
    require(groupCols.nonEmpty, "noisyCounts: at least one group column")
    val h = xxhash64(concat_ws("\u0001", groupCols.map(col) :+ lit(seed): _*))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("__graft_h32", pmod(h, lit(4294967296L)))
      .withColumn("__graft_k",
        when(col("__graft_h32") === 0L, 32L)
          .otherwise((length(bin(col("__graft_h32").bitwiseAND(-col("__graft_h32")))) - 1)
            .cast("long")))
      .withColumn("__graft_b33", pmod(h, lit(8589934592L)))
      .withColumn("__graft_sign",
        lit(1L) - lit(2L) * expr("__graft_b33 div CAST(4294967296 AS BIGINT)"))
      .withColumn("noise", (col("__graft_sign") * col("__graft_k")).cast("long"))
      .withColumn("noisy_n", (col("n") + col("noise")).cast("long"))
      .drop("__graft_h32", "__graft_b33", "__graft_k", "__graft_sign")
  }
}
