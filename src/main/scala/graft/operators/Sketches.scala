package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.plans.{CountMinAgg, CountMinLookup}

/** Sketch summaries for corpus-scale frequency and cardinality questions —
  * the operators that answer "how often / how many distinct" over 100 TB
  * without shuffling the raw keys.
  *
  * Both sketches here are DETERMINISTIC under any partitioning (their
  * merges are commutative integer/max operations), which is what makes
  * them oracle-checkable: DuckDB replays the identical arithmetic from the
  * same xxhash64 values and must land on the same cells, registers, and
  * estimates bit-for-bit. That distinguishes them from sampling-based
  * summaries whose output depends on row order.
  *
  * Reference scope: the reference engine has no sketch family
  * (`/root/reference` exposes exact aggregation only) — this is part of the
  * training-data-pipeline extension surface, where per-key exact counting
  * at corpus scale is the canonical "accidentally quadratic shuffle".
  */
object Sketches {

  /** A built Count-Min sketch: row-major depth×width counter matrix.
    * Persist the one `array<long>` row to reuse across batches; the probe
    * derives everything else from (depth, width). */
  case class CountMinArtifact(counts: Array[Long], depth: Int, width: Int) {
    require(counts.length == depth * width, "count-min artifact shape mismatch")

    /** Total increments folded into the sketch (row 0 sees every key once). */
    def totalCount: Long = {
      var s = 0L
      var i = 0
      while (i < width) { s += counts(i); i += 1 }
      s
    }

    /** Merge with another sketch of the SAME shape: elementwise add, so the
      * merged sketch equals the sketch of the concatenated corpora — the
      * persistable-artifact property (build per ingest batch, add at query
      * time; the `estimate >= exact` guarantee survives merging). */
    def merge(other: CountMinArtifact): CountMinArtifact = {
      require(other.depth == depth && other.width == width,
        s"count-min merge: shape ${other.depth}x${other.width} != ${depth}x$width")
      val out = new Array[Long](counts.length)
      var i = 0
      while (i < counts.length) { out(i) = counts(i) + other.counts(i); i += 1 }
      CountMinArtifact(out, depth, width)
    }

    /** Equi-join-size estimate between this sketch's key multiset and
      * `other`'s (Cormode & Muthukrishnan '05 §4.2, the AGMS-style inner
      * product): per depth row d, `Σ_w a[d][w]·b[d][w]` ≥ `Σ_k n_a(k)·n_b(k)`
      * — hash collisions only ADD cross terms — so the MIN across rows is
      * the estimate and the one-sided `estimate ≥ exact` guarantee carries
      * over from point counts to join sizes. This is how a planner sizes
      * `A ⋈ B` from two 16-KiB artifacts without touching either table —
      * at 100 TB the sketches are built once per ingest batch (mergeable)
      * and every join-order decision reads them driver-side. Overflow: the
      * row inner product is bounded by N_a·N_b; callers joining > 3·10⁹-row
      * multisets should widen to BigInt. Same-shape sketches only. */
    def innerProduct(other: CountMinArtifact): Long = {
      require(other.depth == depth && other.width == width,
        s"count-min inner product: shape ${other.depth}x${other.width} != ${depth}x$width")
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        var s = 0L
        var w = 0
        while (w < width) { s += counts(d * width + w) * other.counts(d * width + w); w += 1 }
        if (s < best) best = s
        d += 1
      }
      best
    }
  }

  /** One-pass Count-Min build over a tokens column (`array<string>`, or
    * `array<long>` pre-hashed). The collect is the single 16-KiB-ish
    * artifact row — bounded by (depth, width), never by data size. */
  def buildCountMin(
      df: DataFrame,
      tokens: Column,
      depth: Int = 4,
      width: Int = 512): CountMinArtifact = {
    val agg = CountMinAgg(ExprColumn.expr(tokens), depth, width)
    val row = df.agg(ExprColumn(agg.toAggregateExpression()).as("counts")).head()
    CountMinArtifact(row.getSeq[Long](0).toArray, depth, width)
  }

  /** Map-side frequency estimate for a pre-hashed key column
    * (`xxhash64(token)` — the hash [[graft.plans.CountMinAgg]] applied).
    * Guarantee: estimate >= true count, always. */
  def countMinEstimate(art: CountMinArtifact, keyHash: Column): Column =
    ExprColumn(CountMinLookup(ExprColumn.expr(keyHash), art.counts, art.depth, art.width))

  /** HyperLogLog register table: per group, the observed register index
    * `j` (low p bits of the key hash) with its max rank `m` (leading-zero
    * count of the remaining 64-p bits, plus one — the classic rho).
    *
    * Spelled as plain DataFrame ops on purpose: `groupBy(group, j).max`
    * partial-aggregates map-side, so at most groups × 2^p tiny rows ever
    * shuffle — the sketch property — while staying inside whole-stage
    * codegen. The rank uses the integer floor-log2 spelling
    * (`length(bin(w)) - 1`) that is bit-stable across engines, unlike a
    * float log2.
    *
    * `keyHash` must be an xxhash64-style 64-bit hash column. */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      keyHash: Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p must be in [4,16], got $p")
    val m = 1 << p
    val maxRho = 64 - p + 1
    // unsigned split of the signed hash: low p bits index the register,
    // the remaining 64-p bits (via unsigned shift) carry the rank
    val w = shiftrightunsigned(keyHash, p)
    val rho = when(w === 0L, lit(maxRho)).otherwise(lit(maxRho) - length(bin(w)))
    df.select((groupCols.map(col) :+ keyHash.bitwiseAND(lit((m - 1).toLong)).as("j")) :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("j"): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Merge two HLL register tables (same groups/p): registers max-combine,
    * so the merged sketch equals the sketch of the UNION — the property
    * that makes per-batch register tables PERSISTABLE artifacts for
    * incremental cardinality (build per ingest, merge at query time;
    * nothing rescans old batches). Bit-exact: max is idempotent,
    * commutative, associative. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("j"): _*)
      .agg(max(col("m")).as("m"))

  /** Raw HLL cardinality estimate per group from a register table:
    * `alpha_m * m^2 / sum_j 2^-M_j` (Flajolet et al. 2007), with absent
    * registers contributing 2^0 = 1.
    *
    * Determinism contract: the harmonic sum folds the registers in
    * register-index order over EXACT dyadic terms (2^-M via element_at of
    * a precomputed table, never libm pow), so the resulting double is
    * bit-identical on any engine that replays the same fold — the oracle
    * does. Deliberately the RAW estimate: the small-range linear-counting
    * correction needs ln(), which is not bit-stable across engines. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p must be in [4,16], got $p")
    val m = 1 << p
    val maxRho = 64 - p + 1
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val scale = alpha * m.toDouble * m.toDouble
    // 2^-M for M in [0, maxRho]: exact dyadic doubles (M <= 61)
    val pow2neg = typedlit((0 to maxRho).map(i => 1.0 / (1L << i)))
    val sorted = sort_array(collect_list(struct(col("j"), col("m"))))
    val harmonic = aggregate(
      sorted,
      lit(m).cast("double") - size(sorted).cast("double"),
      (acc, x) => acc + element_at(pow2neg, x.getField("m").cast("int") + 1))
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("registers_used"),
        (lit(scale) / harmonic).as("hll_est"))
  }

  // ------------------------------------------- fixed-grid histogram quantiles

  /** Fixed-grid histogram sketch: per group, bucket = `value div width`
    * with its row count — the mergeable quantile summary (sum-combine, so
    * the merged histogram equals the histogram of the union; per-ingest
    * histograms are persistable artifacts like the CM/HLL ones). Exact on
    * the grid: quantiles read back from it are correct to one bucket
    * width, deterministically — unlike rank-error sketches (KLL/t-digest)
    * whose output depends on row order and so can never hash-match an
    * oracle. `valueCol` must be a non-negative BIGINT (BIGINT `div`
    * truncates toward zero, which is floor only for non-negatives).
    *
    * Scale shape: groups x (domain/width) tiny rows shuffle — never the
    * raw values; the groupBy partial-aggregates map-side. */
  def histogramSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      width: Long): DataFrame = {
    require(width >= 1, s"histogramSketch: width must be >= 1, got $width")
    df.select(groupCols.map(col) :+
        expr(s"cast($valueCol as bigint) div $width").as("bucket"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Merge histogram sketches over the same grid: counts add. */
  def histogramMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Grid quantiles from a histogram sketch: for each percentile `p` (an
    * integer, 0 < p <= 100), the LOWER EDGE (`bucket * width`) of the
    * first bucket whose cumulative count reaches `ceil(p * n / 100)` —
    * the inverted-CDF definition, spelled in pure BIGINT arithmetic
    * (`(n*p + 99) div 100`) so any engine replays it bit-for-bit. One
    * window cumsum per group plus one aggregate; cost scales with bucket
    * count, not row count. */
  def histogramQuantiles(
      hist: DataFrame,
      groupCols: Seq[String],
      percentiles: Seq[Int],
      width: Long): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p <= 100),
      s"histogramQuantiles: percentiles must be in (0,100], got $percentiles")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__graft_cum", sum(col("cnt")).over(w))
      .withColumn("__graft_n", sum(col("cnt")).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val qcols = percentiles.map { p =>
      min(when(expr(s"__graft_cum >= (__graft_n * $p + 99) div 100"),
        col("bucket") * width)).as(s"p$p")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(first(col("__graft_n")).cast("long").as("n"), qcols: _*)
  }

  /** KMV (k-minimum-values) theta sketch per group: the k smallest
    * `xxhash64(value)` hashes of the group's DISTINCT values (Bar-Yossef
    * et al. '02; the mergeable-set-sketch family DataSketches calls theta).
    * This is the sketch that answers what HLL cannot: SET OPERATIONS.
    * A KMV sketch of A∪B is the k smallest of the merged hash sets, and
    * the fraction of those union-minima present in both sides estimates
    * Jaccard — so bounded ~k·8-byte summaries give intersection/overlap
    * estimates between corpus-sized sets without ever joining the raw keys.
    *
    * Ordering is on the SIGNED hash value: any fixed total order over a
    * uniform 64-bit hash yields a uniform minimum sample, and signed order
    * is what both Spark's `xxhash64` and the DuckDB oracle replay natively
    * (no unsigned-compare gymnastics in ANSI mode). The k-smallest pass is
    * the custom [[TopK]] physical operator — map-side bounded heaps, ≤ k
    * rows per group per partition into one exchange; at 100 TB the shuffle
    * carries sketches, never keys. */
  def kmvSketches(df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"kmvSketches: k must be >= 1, got $k")
    val hashed = df
      .select(col(groupCol).as("g"), xxhash64(col(valueCol)).as("h"))
      .distinct()
    TopK.perGroup(hashed, Seq("g"), Seq(("h", true)), k)
  }

  /** Pairwise overlap report from KMV sketches: for every group pair
    * (g1 < g2), the union sketch (k smallest of the merged distinct
    * hashes), how many of those union-minima occur in BOTH sides
    * (`kmv_common`), the union sample size actually kept (`union_kept` =
    * min(k, |A∪B|) — smaller only when the true union is), and the
    * integer-exact Jaccard estimate `ppm = (10⁶ · common) div kept`.
    *
    * Everything here operates on the sketch frame, whose size is bounded
    * by groups×k regardless of corpus size — the pair join, the OR-shaped
    * membership join and the per-pair rank are all over that bounded frame
    * (broadcast-scale by construction), which is the entire point. */
  def kmvOverlap(sketches: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = sketches.cache()
    val groups = s.select(col("g")).distinct()
    val pairs = groups.as("a")
      .join(groups.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("g1"), col("b.g").as("g2"))
    val member = s.select(col("g").as("mg"), col("h"))
    val merged = pairs
      .join(broadcast(member), col("mg") === col("g1") || col("mg") === col("g2"))
      .groupBy(col("g1"), col("g2"), col("h"))
      .agg(countDistinct(col("mg")).as("sides"))
    val ranked = merged
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("g1"), col("g2")).orderBy(col("h"))))
      .filter(col("rk") <= k)
    val out = ranked
      .groupBy(col("g1"), col("g2"))
      .agg(
        sum(when(col("sides") === 2, 1L).otherwise(0L)).as("kmv_common"),
        count(lit(1)).as("union_kept"))
      .withColumn("jaccard_est_ppm", expr("(1000000 * kmv_common) div union_kept"))
    val materialized = out.localCheckpoint(true)
    s.unpersist()
    materialized
  }

  /** Two-pass GUARANTEED heavy hitters via a Misra–Gries candidate pass
    * ([[graft.plans.MisraGriesAgg]]) + exact verification: pass 1 folds
    * the corpus into one ≤ k-counter summary (map-side partials, merged by
    * the mergeable-summaries rule — the collect is 2k longs, bounded by k
    * never by data); pass 2 exactly counts ONLY the ≤ k candidate keys
    * and keeps those with `count · (k+1) > N`. The MG bound (undercount
    * ≤ N/(k+1)) makes the candidate set a SUPERSET of every key above the
    * threshold, so the verified output is deterministic under any
    * partitioning even though MG counter values are order-dependent — the
    * same two-pass candidates-then-verify discipline as the LSH dedup
    * family. Versus q113's Count-Min: MG carries the KEYS (nothing to
    * invert), Count-Min answers point queries for keys already in hand.
    *
    * Returns (key, exact, total_n) for each guaranteed heavy hitter. */
  def guaranteedHeavyHitters(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ExprColumn
    val agg = graft.plans.MisraGriesAgg(ExprColumn.expr(keyCol), k)
    val row = df.agg(
      ExprColumn(agg.toAggregateExpression()).as("mg"),
      count(lit(1)).as("n")).head()
    val pairs = row.getSeq[Long](0)
    val n = row.getLong(1)
    val candidates = pairs.grouped(2).map(_.head).toSeq
    val base = df.select(keyCol.cast("long").as("key"))
    val verified =
      if (candidates.isEmpty) base.limit(0).groupBy("key").agg(count(lit(1)).as("exact"))
      else base.filter(col("key").isin(candidates: _*))
        .groupBy("key").agg(count(lit(1)).as("exact"))
    verified
      .filter(col("exact") * (k + 1L) > n)
      .withColumn("total_n", lit(n))
  }

  /** Deterministic GRID-FREE quantile sketch (the Munro–Paterson '80
    * rank-sampling family): rows are deterministically sharded by
    * `xxhash64(shardKey)` into `shards` cells, each cell sorts LOCALLY
    * (one shuffle on the shard id — never a global sort) and keeps every
    * `step`-th value by local rank as a weighted sample `(v, w = step)`.
    *
    * This is the quantile summary [[histogramSketch]] cannot be: no value
    * grid or domain knowledge required, yet — unlike KLL/t-digest, whose
    * output depends on row order — fully deterministic, because selection
    * is by RANK in a sorted multiset (equal values are interchangeable, so
    * the sampled value at every rank is partitioning- and tie-order-
    * independent) and the shard assignment is a pure hash. Deterministic ⇒
    * oracle-hash-matchable, the house rule for every sketch here.
    *
    * Rank contract (what the sketch guarantees, pinned by q261/SketchSpec):
    * est_rank(x) = Σ w over sampled v ≤ x under-counts the true
    * count(v ≤ x) by < shards·step (each cell drops < step below any
    * rank plus a < step unsampled tail). Total sampled weight W satisfies
    * n − W < shards·step.
    *
    * Scale shape: one hash-partitioned sort (map-side size N/shards per
    * cell, spillable), output N/step rows — a 100 TB column folds to a
    * parquet-persistable artifact 1/step its size, tunable independent of
    * any value range. `valueCol` must be BIGINT-castable (the exactness
    * convention shared with the histogram sketch). */
  def rankSampleSketch(
      df: DataFrame,
      valueCol: String,
      shardKey: Column,
      shards: Int,
      step: Int): DataFrame = {
    require(shards >= 1, s"rankSampleSketch: shards must be >= 1, got $shards")
    require(step >= 1, s"rankSampleSketch: step must be >= 1, got $step")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__graft_shard")).orderBy(col("v"))
    df.select(
        col(valueCol).cast("long").as("v"),
        pmod(xxhash64(shardKey), lit(shards.toLong)).as("__graft_shard"))
      .withColumn("__graft_rn", row_number().over(w))
      .filter(pmod(col("__graft_rn"), lit(step.toLong)) === 0)
      .select(col("v"), lit(step.toLong).as("w"))
  }

  /** Munro–Paterson collapse: halve a (v, w) sketch by pairing consecutive
    * samples in v-order and keeping the LATER value of each pair carrying
    * both weights (rank estimates stay under-counts; the error bound grows
    * by the absorbed weight). `union two sketches → compress` is the merge
    * law — associative up to the declared bound, which is how shard- or
    * day-level artifacts fold into one without touching raw rows. The
    * window runs over SKETCH rows only (bounded by construction — the
    * documented bounded-input Window.orderBy set). */
  def rankSampleCompress(sketch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v"), col("w"))
    sketch
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_n", count(lit(1)).over(
        Window.orderBy(col("v"), col("w"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__graft_pw", lag(col("w"), 1).over(w))
      .filter(col("__graft_rn") % 2 === 0 ||
        (col("__graft_rn") === col("__graft_n") && col("__graft_n") % 2 === 1))
      .select(
        col("v"),
        when(col("__graft_rn") % 2 === 0, col("w") + coalesce(col("__graft_pw"), lit(0L)))
          .otherwise(col("w")).as("w"))
  }

  /** Inverted-CDF readback from a rank-sample sketch: for each integer
    * percentile p, the smallest sampled v whose cumulative weight reaches
    * t' = least(ceil(p·n/100), W) — clamping to the total sketch weight W
    * covers the tail the per-cell remainders dropped. Pure BIGINT
    * arithmetic, replayable bit-for-bit. Returns one row:
    * (n, w_total, p<p>…). `totalRows` is the exact corpus count (the
    * caller usually has it; the sketch alone cannot). */
  def rankSampleQuantiles(
      sketch: DataFrame,
      totalRows: Long,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p <= 100),
      s"rankSampleQuantiles: percentiles must be in (0,100], got $percentiles")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v"), col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("__graft_cum", sum(col("w")).over(w))
      .withColumn("__graft_wt", sum(col("w")).over(
        Window.orderBy(col("v"), col("w"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qcols = percentiles.map { p =>
      min(when(
        expr(s"__graft_cum >= least(($totalRows * $p + 99) div 100, __graft_wt)"),
        col("v"))).as(s"p$p")
    }
    cum.agg(first(col("__graft_wt")).cast("long").as("w_total"), qcols: _*)
      .withColumn("n", lit(totalRows))
  }
}
