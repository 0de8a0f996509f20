package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus-mixing operators for training-data
  * pipelines.
  *
  * All sampling here is CONTENT-keyed (a hash of the row's id), never
  * partition-keyed like `DataFrame.sample`: the kept set is reproducible
  * across runs, cluster sizes, partition layouts, and even engine versions —
  * the property a 100 TB corpus refresh needs so yesterday's sample and
  * today's differ only by the new rows. Every operator is a map-side
  * filter/projection (zero shuffle) unless stated otherwise.
  */
object Sampling {

  /** Uniform-in-[0,1) column derived deterministically from `key` (and a
    * seed), via xxhash64 — the default randomness source. */
  def uniformHash(key: Column, seed: String = ""): Column =
    pmod(xxhash64(concat(key.cast("string"), lit("|" + seed))), lit(1000000000L))
      .cast("double") / lit(1e9)

  /** Deterministic Bernoulli sample: keep each row iff its id-derived
    * uniform < fraction. Map-side, no shuffle, stable under repartitioning
    * (unlike `df.sample`, whose kept set changes with partition layout). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, seed: String = ""): DataFrame =
    sampleWith(df, uniformHash(col(idCol), seed), fraction)

  /** Bernoulli sample with a caller-supplied uniform column — for pipelines
    * that need a specific (e.g. cross-engine reproducible) mixing function
    * instead of xxhash64. */
  def sampleWith(df: DataFrame, uniform: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.filter(uniform < lit(fraction))
  }

  /** Stratified Bernoulli sample: per-stratum keep fractions (strata the
    * map doesn't name fall back to `defaultFraction`). Still one map-side
    * filter — the fraction lookup is a when-ladder over the (small by
    * definition) strata map, so nothing is joined or shuffled. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: String = "",
      uniform: (Column, String) => Column = uniformHash(_, _)): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "all fractions must be in [0,1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(uniform(col(idCol), seed) < frac)
  }

  /** EXACTLY `n` rows per stratum (or all rows of a smaller stratum),
    * chosen deterministically by id-hash order — the reproducible
    * equivalent of per-group reservoir sampling. One shuffle keyed by the
    * strata columns; the window's per-group state is a counter, so skewed
    * strata stream through without materializing the group. */
  def exactSamplePerStratum(
      df: DataFrame,
      idCol: String,
      strataCols: Seq[String],
      n: Int,
      seed: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(uniformHash(col(idCol), seed), col(idCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** Deterministic train/validation/test split: adds `splitColumn` naming
    * the slice each row falls in, by cumulative-threshold lookup of the
    * row's content-keyed uniform. Map-side, zero shuffle, and stable the
    * way a 100 TB corpus refresh needs: a document's split assignment
    * depends only on its id (never on partition layout, cluster size, or
    * the other rows), so yesterday's train set and today's differ only by
    * new/removed documents, and a document can never migrate between
    * train and test across refreshes (the leakage failure mode of
    * `randomSplit`, which is seed+layout dependent).
    *
    * `splits` are (name, weight) with positive weights summing to ≤ 1;
    * rows whose uniform lands past the last cumulative threshold (when
    * weights sum < 1) get NULL — "held out entirely". */
  def splitByHash(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      splitColumn: String = "split",
      seed: String = "",
      uniform: (Column, String) => Column = uniformHash(_, _)): DataFrame = {
    require(splits.nonEmpty, "splitByHash: no splits")
    require(splits.forall(_._2 > 0), "splitByHash: weights must be positive")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"splitByHash: weights sum to ${splits.map(_._2).sum} > 1")
    val u = uniform(col(idCol), seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // when-ladder in order: first threshold the uniform clears wins —
    // evaluated on one materialized uniform, not once per branch
    val ladder = splits.zip(cum).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), acc) => when(col("__graft_u") < lit(hi), lit(name)).otherwise(acc)
    }
    df.withColumn("__graft_u", u)
      .withColumn(splitColumn, ladder)
      .drop("__graft_u")
  }

  /** Weighted corpus mix: sample each source at its weight and union the
    * survivors, tagging provenance. Weights are KEEP fractions in [0,1]
    * (a training-mix recipe like "10% of CC, all of books"); sources must
    * share a schema (unionByName). Map-side per source. */
  def weightedMix(
      sources: Seq[(String, DataFrame, Double)],
      idCol: String,
      sourceColumn: String = "mix_source",
      seed: String = "",
      /** randomness source as (key, seedString) => uniform-in-[0,1) —
        * override when the keep decision must be replayable outside this
        * engine (xxhash64 is Spark-internal) */
      uniform: (Column, String) => Column = uniformHash(_, _)): DataFrame = {
    require(sources.nonEmpty, "weightedMix: no sources")
    sources.map { case (name, df, weight) =>
      // fold the source name into the seed so identical ids in different
      // sources make independent keep decisions
      sampleWith(df, uniform(col(idCol), s"$seed|$name"), weight)
        .withColumn(sourceColumn, lit(name))
    }.reduce(_ unionByName _)
  }

  /** Keep rows at or above the `q`-quantile of `valueCol` within each
    * stratum — "top quartile quality per language". Exact percent_rank
    * (one shuffle keyed by the strata); at corpus scale prefer
    * `filterAboveApproxQuantile`, which turns the window into a pre-computed
    * threshold + map-side filter. */
  def filterByQuantile(
      df: DataFrame,
      valueCol: String,
      minQuantile: Double,
      strataCols: Seq[String]): DataFrame = {
    require(minQuantile >= 0 && minQuantile <= 1, s"quantile must be in [0,1]: $minQuantile")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(col(valueCol))
    df.withColumn("__graft_pr", percent_rank().over(w))
      .filter(col("__graft_pr") >= lit(minQuantile))
      .drop("__graft_pr")
  }

  /** Temperature-based corpus rebalancing (mT5/XLM-R style): downsample
    * high-resource strata so sizes follow p^(1/τ) proportions without
    * duplicating rare-stratum rows — keep rate r_g = (n_min / n_g)^(1/τ)
    * with the rarest stratum kept whole.
    *
    * τ is fixed at 2, deliberately: the exponent becomes sqrt, which IEEE
    * requires to be correctly rounded — bit-identical across engines —
    * whereas a general pow() is libm-dependent — not bit-stable across
    * engines, so it breaks oracle hashing. One count aggregation broadcast back, then
    * a map-side content-keyed Bernoulli keep — no data shuffle. */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      seed: String = "",
      uniform: (Column, String) => Column = (c, s) => uniformHash(c, s)): DataFrame = {
    // localCheckpoint: counts is self-joined (its own min on the other
    // side of the crossJoin) — without it the full-corpus aggregation
    // would execute twice, once per side
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__graft_n")).localCheckpoint()
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("__graft_n")).as("__graft_nmin"))))
    val rates = withMin
      .select(
        col(strataCol),
        sqrt(col("__graft_nmin").cast("double") / col("__graft_n").cast("double"))
          .as("__graft_rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(uniform(col(idCol), seed) < col("__graft_rate"))
      .drop("__graft_rate")
  }

  /** Per-group document cap: keep at most `maxPerGroup` rows per group, in
    * the caller's deterministic order (pass a content-keyed hash column to
    * make the quota stable across corpus refreshes — the CommonCrawl
    * "domain quota" step). One window shuffle on the group columns; rank
    * computation streams over each sorted group, so a hot domain costs its
    * own sort, never a global one. */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      maxPerGroup: Int,
      orderBy: Seq[Column]): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    require(groupCols.nonEmpty, "capPerGroup needs group columns")
    require(orderBy.nonEmpty, "capPerGroup needs a deterministic order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= maxPerGroup)
      .drop("__graft_rn")
  }

  /** Scale path of `filterByQuantile`: one approx_percentile aggregation
    * computes a per-stratum threshold (broadcast back), then a map-side
    * filter — no global window, so the 100 TB corpus never sorts. The
    * approximation is on the THRESHOLD, not the kept rows' values. */
  def filterAboveApproxQuantile(
      df: DataFrame,
      valueCol: String,
      minQuantile: Double,
      strataCols: Seq[String],
      accuracy: Int = 10000): DataFrame = {
    require(minQuantile >= 0 && minQuantile <= 1, s"quantile must be in [0,1]: $minQuantile")
    val thresholds = df
      .groupBy(strataCols.map(col): _*)
      .agg(approx_percentile(col(valueCol), lit(minQuantile), lit(accuracy)).as("__graft_thr"))
    df.join(broadcast(thresholds), strataCols)
      .filter(col(valueCol) >= col("__graft_thr"))
      .drop("__graft_thr")
  }

  /** Systematic probability-proportional-to-size sampling (PPS): draw `k`
    * picks by laying the rows end to end along their cumulative weight axis
    * (in `orderBy` order — pass a content-keyed hash for a reproducible
    * "random" order) and selecting the row under each of k equally spaced
    * points p_i = (2i+1)·T/(2k), T the total weight. Classic survey-
    * sampling PPS (Madow 1949): inclusion probability exactly proportional
    * to weight, zero variance in the sample's weight coverage, and — unlike
    * exp-sort weighted reservoirs — every quantity is integer arithmetic,
    * so the pick set is bit-reproducible across engines.
    *
    * A row of weight w spanning [cum−w, cum) is picked once per point
    * inside its span: multiplicity = #{ i : 2k·(cum−w) ≤ (2i+1)·T < 2k·cum },
    * computed closed-form per row (rows heavier than the stride T/k can be
    * picked more than once — standard PPS-with-replacement semantics).
    *
    * Scale shape: ONE window cumsum over the global order (range-
    * partitioned sort — Spark's window over an unpartitioned ORDER BY is a
    * global sort, the same cost class as any deterministic global sample)
    * plus a broadcast 1-row total; selection itself is map-side integer
    * math. Weights must be positive integers (cast char/token counts). */
  def ppsSystematic(
      df: DataFrame,
      weightCol: String,
      k: Int,
      orderBy: Seq[Column],
      multiplicityColumn: String = "multiplicity"): DataFrame = {
    require(k > 0, "ppsSystematic: k must be positive")
    // T from a plain aggregate over df, NOT max(cum): the unpartitioned-
    // window global sort is the dominant cost and referencing cum twice
    // (total + selection) would execute it twice. The 1-row collect also
    // lets the 2k·T < 2^63 overflow precondition be ENFORCED, not just
    // documented. (sum == max cum because weights are positive — the
    // stated contract.)
    val totalW = Option(df.agg(sum(col(weightCol).cast("long"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (totalW <= 0L)
      return df.withColumn(multiplicityColumn, lit(0L)).limit(0)
    require(totalW <= Long.MaxValue / (2L * k),
      s"ppsSystematic: 2k·T = ${2L * k}·$totalW overflows 63-bit span arithmetic")
    // DISTRIBUTED global cumsum (GlobalOrder two-pass) — the unpartitioned
    // Window.orderBy this replaced planned a SinglePartition exchange of
    // the whole corpus into one task (the q344 skewReport shape)
    val cum = graft.operators.GlobalOrder
      .cumSum(df.withColumn("__graft_w", col(weightCol).cast("long")),
        orderBy, col("__graft_w"), "__graft_cum")
    // integer-only span test: with a = 2k(cum−w), b = 2k·cum, a point
    // (2i+1)·T lands in the span iff a ≤ (2i+1)·T < b, i.e. the odd
    // integer 2i+1 lies in [c, d] with c = ⌈a/T⌉, d = ⌊(b−1)/T⌋.
    // multiplicity = #odds in [c,d] = ⌊(d+1)/2⌋ − ⌊c/2⌋ — every term
    // nonnegative, so `div` (truncating) IS floor.
    val sel = cum.withColumn("__graft_T", lit(totalW))
      .withColumn("__graft_a", lit(2L * k) * (col("__graft_cum") - col("__graft_w")))
      .withColumn("__graft_b", lit(2L * k) * col("__graft_cum"))
      .withColumn("__graft_c",
        expr("(__graft_a + __graft_T - 1) div __graft_T"))
      .withColumn("__graft_d", expr("(__graft_b - 1) div __graft_T"))
      .withColumn(multiplicityColumn,
        greatest(lit(0L),
          expr("((__graft_d + 1) div 2) - (__graft_c div 2)")))
    sel
      .filter(col(multiplicityColumn) > 0)
      .withColumn(multiplicityColumn, col(multiplicityColumn).cast("long"))
      .drop("__graft_w", "__graft_cum", "__graft_T", "__graft_a", "__graft_b",
        "__graft_c", "__graft_d")
  }

  /** DSIR-style importance weighting (Xie et al. 2023, integer-quantized):
    * score every document by how much its hashed-unigram profile looks like
    * a TARGET slice of the corpus versus the corpus as a whole — the
    * data-selection signal behind "pick generalist web data that resembles
    * the high-quality target".
    *
    * Per token with feature bucket b (xxhash64 mod `buckets`), the
    * log-ratio log p_target(b) − p_raw(b) is quantized to INTEGER
    * floor-log₂ space: w(b) = ⌊log₂(t_b+1)⌋ − ⌊log₂(r_b+1)⌋ (the q90
    * discipline — libm logs are not bit-stable across engines; floor-log₂
    * over exact counts is). A document's weight is the sum of its tokens'
    * bucket weights — exact BIGINT arithmetic end to end.
    *
    * Scale shape: a profile pass (explode → `buckets`-sized aggregate,
    * map-side partials; target counted in the same pass via a conditional
    * sum) and a weighting pass (explode → broadcast 512-row table join →
    * per-document sum). Two corpus scans total — the alternative,
    * materializing the exploded tokens, costs more than the re-scan. */
  def dsirLogWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 512): DataFrame = {
    require(buckets > 0, "dsirLogWeights: buckets must be positive")
    val toks = df
      .select(col(idCol), isTarget.as("__graft_tgt"),
        TextFunctions.tokens(TextFunctions.normalize(col(textCol))).as("__graft_toks"))
      // array_compact is a semantic no-op (tokens() yields no null
      // elements) but keeps InferFiltersFromGenerate from inlining the
      // tokenize subtree into a pushed-down size()>0 filter (the q78 trap)
      .select(col(idCol), col("__graft_tgt"),
        explode(array_compact(col("__graft_toks"))).as("__graft_tok"))
      .withColumn("__graft_b", pmod(xxhash64(col("__graft_tok")), lit(buckets.toLong)))
    // ⌊log₂(x)⌋ for x ≥ 1 as length(bin(x)) − 1 — pure integer, and DuckDB's
    // bin() renders the same minimal binary string (the q90 trick)
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val table = toks
      .groupBy(col("__graft_b"))
      .agg(
        count(lit(1)).as("__graft_r"),
        sum(when(col("__graft_tgt"), 1L).otherwise(0L)).as("__graft_t"))
      .select(col("__graft_b"),
        (flog2(col("__graft_t") + 1) - flog2(col("__graft_r") + 1)).as("__graft_w"))
    toks
      .join(broadcast(table), Seq("__graft_b"))
      .groupBy(col(idCol))
      .agg(sum(col("__graft_w")).cast("long").as("dsir_weight"))
  }

  /** Leakage-safe train/val/test split: every near-duplicate CLUSTER lands
    * wholly in one split — the guard against train/test contamination that
    * a per-document split cannot give (a doc and its near-copy must never
    * straddle the eval boundary; Lee et al. 2022 measure the damage).
    *
    * Mechanics: connected components over `pairs` (checkpointed iterative
    * CC, see [[Dedup.duplicateClusters]]) give each clustered doc its
    * component root; singletons are their own root. The split key is the
    * ROOT's hash, so membership decides placement and the assignment
    * stays stable when new members join an existing cluster. One extra
    * broadcast-friendly left join over the per-doc split; everything else
    * is [[splitByHash]].
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      splitColumn: String = "split",
      seed: String = "",
      uniform: (Column, String) => Column = uniformHash(_, _),
      repColumn: Option[String] = None): DataFrame = {
    val roots = Dedup.duplicateClusters(pairs).select(col("id").as(idCol), col("root"))
    val keyed = df
      .join(roots, Seq(idCol), "left")
      .withColumn("__graft_rep", coalesce(col("root"), col(idCol)))
      .drop("root")
    val split = splitByHash(keyed, "__graft_rep", splits, splitColumn, seed, uniform)
    repColumn match {
      case Some(name) => split.withColumnRenamed("__graft_rep", name)
      case None => split.drop("__graft_rep")
    }
  }

  /** Token-budget corpus fill: take documents in `orderBy` priority order
    * (quality-first curation) until the cumulative token count reaches
    * `budget` — "give me the best B tokens", the selection step of every
    * pretraining-mix recipe. A row is kept iff its INCLUSIVE cumulative
    * sum stays ≤ budget (greedy prefix; no partial documents). Pure BIGINT
    * window arithmetic — deterministic given a total `orderBy` order
    * (callers append an id tiebreak).
    *
    * Scale: one global-sort window, same shape as ppsSystematic — at
    * corpus scale run it per stratum (partition the window) or pre-filter
    * with an approximate threshold ([[filterAboveApproxQuantile]]) so the
    * sorted set is budget-sized, not corpus-sized. */
  def fillTokenBudget(
      df: DataFrame,
      tokenCol: String,
      budget: Long,
      orderBy: Seq[Column]): DataFrame = {
    require(budget >= 0, s"fillTokenBudget: negative budget $budget")
    // distributed global cumsum (see ppsSystematic) — the candidate set is
    // budget-sized by the documented prefilter contract, but a single-task
    // window would make THAT contract the only thing standing at 100 TB
    graft.operators.GlobalOrder
      .cumSum(df, orderBy, col(tokenCol).cast("long"), "cum_tokens")
      .filter(col("cum_tokens") <= budget)
  }

  /** Per-key temporal holdout: within each key (user, device, series) the
    * LAST ceil(n·holdNum/holdDen) rows by (tsCol, tieCol) go to the
    * holdout split, the rest to train — the leakage-safe split for
    * sequence models, where a random split would let the model peek at a
    * user's future. The tie column makes the per-key order TOTAL, so the
    * assignment is deterministic under duplicate timestamps.
    *
    * Scale shape: one key-partitioned window (per-key sort only, never
    * global); the per-key count rides the same window partition. Returns
    * the input plus `split`.
    */
  def temporalHoldout(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      holdNum: Long = 1L,
      holdDen: Long = 5L): DataFrame = {
    require(holdDen >= 1 && holdNum >= 0 && holdNum <= holdDen,
      s"temporalHoldout: bad holdout fraction $holdNum/$holdDen")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieCol).desc)
    val wn = Window.partitionBy(col(keyCol))
    df.withColumn("__graft_rank", row_number().over(w))
      .withColumn("__graft_n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("__graft_rank") <= expr(s"(__graft_n * $holdNum + ${holdDen - 1}) div $holdDen"),
          lit("holdout")).otherwise(lit("train")))
      .drop("__graft_rank", "__graft_n")
  }

  /** Quota-balanced eval-set builder: `n` rows spread EQUALLY across the
    * (cellCols) cells — base = n div C per cell, the first n mod C cells
    * in deterministic cell order get one extra — then each cell filled by
    * deterministic content-keyed hash order. Cells with too small a pool
    * under-fill and report the shortfall instead of silently borrowing
    * (balanced eval sets must surface imbalance, not hide it). Returns
    * the SELECTED rows with `cell_pool`, `cell_quota` attached.
    *
    * Scale shape: quotas are computed on the aggregate cell table (one
    * row per cell — the only single-partition sort touches THAT, never
    * corpus rows); selection is one cell-partitioned window by (uniform,
    * id). The uniform is injectable for oracle replay, xxhash64-grade by
    * default in production callers. */
  def quotaBalancedSample(
      df: DataFrame,
      cellCols: Seq[String],
      idCol: String,
      n: Long,
      seed: String,
      uniform: (Column, String) => Column): DataFrame = {
    require(n >= 1, s"quotaBalancedSample: n must be >= 1, got $n")
    require(cellCols.nonEmpty, "quotaBalancedSample: need at least one cell column")
    val cells = df.groupBy(cellCols.map(col): _*).agg(count(lit(1)).as("cell_pool"))
    val cOrder = Window.orderBy(cellCols.map(col): _*) // cell-table-sized sort only
    val c = cells.count()
    val base = n / c
    val extra = n % c
    val quotas = cells
      .withColumn("__graft_ci", row_number().over(cOrder))
      .withColumn("cell_quota",
        lit(base) + when(col("__graft_ci") <= extra, 1L).otherwise(0L))
      .drop("__graft_ci")
    val w = Window.partitionBy(cellCols.map(col): _*)
      .orderBy(uniform(col(idCol), seed), col(idCol))
    df.join(broadcast(quotas), cellCols)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= col("cell_quota"))
      .drop("__graft_rn")
  }

  /** Two-stage domain quality gate (the RefinedWeb/CCNet shape): first
    * DOMAINS are admitted or rejected on aggregate evidence (enough
    * documents AND a high-enough median quality value — one bad page
    * shouldn't kill a domain, a bad median should), then within admitted
    * domains each DOCUMENT must clear its own domain's median. Medians are
    * carried as `med2 = 2×median` BIGINTs — exact for the interpolated
    * even-count case (x.5 doubles to an odd integer), so every comparison
    * is integer-exact on any engine.
    *
    * Returns the surviving rows with `med2` and `n_docs` attached.
    *
    * Scale shape: the stats aggregate reduces to one row per domain and
    * joins back BROADCAST — no shuffle of the corpus beyond the stats
    * groupBy itself. Exact per-domain medians sort domain-sized groups
    * (distributed across executors); for heavy-tailed domain sizes at
    * 100 TB swap in the mergeable histogram quantile (q153's operator) —
    * the gate's join shape is unchanged. */
  def domainMedianGate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      minDocs: Long,
      minMedian2: Long): DataFrame = {
    val stats = df
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        (expr(s"percentile($valueCol, 0.5)") * 2).cast("long").as("med2"))
      .filter(col("n_docs") >= minDocs && col("med2") >= minMedian2)
    df.join(broadcast(stats), Seq(groupCol))
      .filter(col(valueCol) * 2 >= col("med2"))
  }

  /** Water-filling budget allocation — the max-min-fair splitter for a
    * token budget over sources (the cap the mixture planners assume): find
    * the largest integer cap c with Σ_s min(n_s, c) ≤ B, allocate
    * a_s = min(n_s, c). Small sources keep everything; large sources are
    * clipped at a COMMON ceiling — proportional clipping would punish the
    * small sources the mix most needs.
    *
    * Exact integer derivation: sources sorted by n ascending; for each
    * "first r−1 sources saturate" hypothesis, the candidate cap is
    * (B − prefix_{r−1}) div (k − r + 1); every feasible-hypothesis
    * candidate yields a feasible allocation (over-segment candidates only
    * under-count), so cap = MAX over candidates — and when Σn ≤ B the cap
    * is max(n) and everything allocates. Windows order the SOURCE list
    * (bounded — one row per source, not per document).
    *
    * Returns (keyCol, n, cap, alloc) — alloc = min(n, cap), one row per
    * source. */
  def waterFillAllocation(
      counts: DataFrame,
      keyCol: String,
      nCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"waterFillAllocation: budget $budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__graft_n"), col(keyCol))
    val ranked = counts
      .select(col(keyCol), col(nCol).cast("long").as("__graft_n"))
      .withColumn("__graft_rn", row_number().over(w).cast("long"))
      .withColumn("__graft_pref",
        sum(col("__graft_n")).over(w) - col("__graft_n"))
    val caps = ranked
      .crossJoin(broadcast(counts.agg(
        count(lit(1)).cast("long").as("__graft_k"),
        sum(col(nCol).cast("long")).as("__graft_tot"),
        max(col(nCol).cast("long")).as("__graft_mx"))))
      .withColumn("__graft_cand",
        when(col("__graft_pref") <= budget,
          expr(s"(CAST($budget AS BIGINT) - __graft_pref) div (__graft_k - __graft_rn + 1)")))
      .agg(
        max(when(col("__graft_tot") <= budget, col("__graft_mx"))
          .otherwise(col("__graft_cand"))).cast("long").as("cap"))
    counts
      .select(col(keyCol), col(nCol).cast("long").as("n"))
      .crossJoin(broadcast(caps))
      .withColumn("alloc", least(col("n"), greatest(col("cap"), lit(0L))).cast("long"))
  }
}
