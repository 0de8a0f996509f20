package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), for near-dup detection and retrieval over
  * training-data corpora.
  *
  * Scale design: brute-force cosine is the exact baseline (O(Q×N) — fine
  * when the query set is small and broadcastable); the IVF variant assigns
  * corpus vectors to centroid cells once (map-side, broadcast centroids) so
  * a query only scans `probes` cells — the standard inverted-file layout,
  * here expressed as a pre-partitioned equi-join that Spark co-locates.
  */
object Similarity {

  /** Dot product of two float-array columns. Uses the native codegen
    * expression (graft.plans.FloatVectorDot) when GraftExtensions is active
    * in the session — the HOF spelling is interpreted and boxes per element,
    * ~an order of magnitude slower in ANN scoring loops. */
  def dot(a: Column, b: Column): Column =
    if (nativeDotAvailable) call_function("fvec_dot", a, b)
    else aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def nativeDotAvailable: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.conf.get("spark.sql.extensions", "").contains("graft.plans.GraftExtensions"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * `queries` and `corpus` both carry (idCol, vecCol). The query side is
    * small → broadcast, so the corpus is scanned exactly once with no
    * shuffle before the per-query top-k. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__graft_qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__graft_cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__graft_qv"), col("__graft_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("__graft_rn").as("rank"))
  }

  /** Embedding-corpus QA audit — the gate BEFORE building any ANN index
    * (a batch of zero vectors or a dimension drift silently poisons
    * centroid training and cosine ranking). Per group: vector count,
    * dimension min/max (drift shows as min != max), zero-vector count,
    * and the distribution of squared norms QUANTIZED to integers
    * (`floor(|v|² · scale)`) so the per-group sums are BIGINT — exact
    * under any row order, unlike a double sum, hence oracle-checkable.
    * Map-side projections + one hash aggregate; scan-speed at corpus
    * scale. */
  def embeddingAudit(
      df: DataFrame,
      groupCols: Seq[String],
      vecCol: String = "embedding",
      scale: Long = 1000L): DataFrame = {
    require(scale >= 1, "embeddingAudit: scale must be >= 1")
    val nsq = dot(col(vecCol), col(vecCol))
    df.select(groupCols.map(col) :+ size(col(vecCol)).cast("long").as("__graft_dim")
        :+ floor(nsq * scale).cast("long").as("__graft_q"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n_vecs"),
        min(col("__graft_dim")).as("dim_min"),
        max(col("__graft_dim")).as("dim_max"),
        sum(when(col("__graft_q") === 0L, 1L).otherwise(0L)).cast("long").as("n_zero"),
        sum(col("__graft_q")).cast("long").as("sum_q_normsq"),
        min(col("__graft_q")).as("min_q_normsq"),
        max(col("__graft_q")).as("max_q_normsq"))
  }

  /** Maximal-marginal-relevance (MMR) diversified selection: for each
    * query, greedily pick `k` of its `topN` nearest candidates maximizing
    *
    *   score = lambdaNum·rel − (lambdaDen−lambdaNum)·max-sim-to-selected
    *
    * (round 1 scores are pure relevance; ties break to the smaller id) —
    * the standard RAG re-ranking step that stops a result list from being
    * five paraphrases of the same passage. λ is carried as an integer
    * ratio so the score is a fixed two-term expression over doubles both
    * engines evaluate identically (never a re-associated sum).
    *
    * Scale shape: the candidate set is topN per query BY CONSTRUCTION
    * (the expensive part is [[bruteForceTopK]] / [[ivfTopK]], which
    * scans the corpus once); the greedy loop then runs k bounded rounds
    * over queries×topN-sized frames — each round one anti-join, one
    * pair-sim max, one per-query argmax via `max(struct(...))` (a
    * codegen'd aggregate, not a sort), all parallel across queries.
    * Candidate pair similarities are computed once and checkpointed.
    *
    * Returns (query_id, round, neighbor_id, relevance, score).
    */
  def mmrSelect(
      queries: DataFrame,
      corpus: DataFrame,
      topN: Int,
      k: Int,
      lambdaNum: Long = 7L,
      lambdaDen: Long = 10L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(topN >= k && k >= 1, s"mmrSelect: need topN >= k >= 1, got topN=$topN k=$k")
    require(lambdaDen >= lambdaNum && lambdaNum >= 0, s"mmrSelect: bad lambda $lambdaNum/$lambdaDen")
    val cands = bruteForceTopK(queries, corpus, topN, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"))
      .localCheckpoint(true) // consumed every greedy round
    val cv = corpus.select(col(idCol).as("__graft_pid"), col(vecCol).as("__graft_pv"))
    val pairSims = cands.select(col("query_id"), col("neighbor_id").as("a"))
      .join(cands.select(col("query_id"), col("neighbor_id").as("b")), Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .join(broadcast(cv.withColumnRenamed("__graft_pid", "a").withColumnRenamed("__graft_pv", "__graft_va")), Seq("a"))
      .join(broadcast(cv.withColumnRenamed("__graft_pid", "b").withColumnRenamed("__graft_pv", "__graft_vb")), Seq("b"))
      .select(col("query_id"), col("a"), col("b"),
        cosine(col("__graft_va"), col("__graft_vb")).as("sim"))
      .localCheckpoint(true) // consumed every greedy round
    def argmax(df: DataFrame, round: Int): DataFrame = df
      .groupBy(col("query_id"))
      .agg(max(struct(col("score"), (-col("neighbor_id")).as("negid"),
        col("rel"))).as("__graft_m"))
      .select(
        col("query_id"),
        lit(round.toLong).as("round"),
        (-col("__graft_m.negid")).as("neighbor_id"),
        col("__graft_m.rel").as("relevance"),
        col("__graft_m.score").as("score"))
    var acc = argmax(cands.withColumn("score", lit(lambdaNum) * col("rel")), 1)
      .localCheckpoint(true)
    var r = 2
    while (r <= k) {
      val rem = cands.join(acc.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val ms = rem
        .join(pairSims.withColumnRenamed("a", "neighbor_id"), Seq("query_id", "neighbor_id"))
        .join(acc.select(col("query_id"), col("neighbor_id").as("b")), Seq("query_id", "b"))
        .groupBy(col("query_id"), col("neighbor_id"), col("rel"))
        .agg(max(col("sim")).as("__graft_ms"))
      val scored = ms.withColumn("score",
        lit(lambdaNum) * col("rel") - lit(lambdaDen - lambdaNum) * col("__graft_ms"))
      acc = acc.unionByName(argmax(scored, r)).transform(org.apache.spark.sql.graft.CheckpointFresh.apply)
      r += 1
    }
    acc
  }

  /** Hard-negative mining for contrastive training data: for each query
    * (anchor) vector, the k most-cosine-similar corpus vectors whose
    * `labelCol` DIFFERS from the anchor's — the highest-loss negatives, the
    * standard positive-pair-poisoning guard being the label inequality in
    * the join condition itself (a same-label near-duplicate never becomes a
    * "negative"). Same scale shape as [[bruteForceTopK]]: anchors broadcast
    * (the anchor set is small by definition), corpus scanned exactly once
    * shuffle-free before the per-anchor top-k window; swap the corpus side
    * for IVF cells ([[ivfTopK]]) when the corpus outgrows a full scan per
    * mining pass. */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k > 0, "hardNegatives: k must be positive")
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__graft_qv"), col(labelCol).as("__graft_ql")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__graft_cv"), col(labelCol).as("__graft_cl"))
    val scored = q.join(c, col("__graft_ql") =!= col("__graft_cl"))
      .withColumn("cosine", cosine(col("__graft_qv"), col("__graft_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("__graft_cl").as("neighbor_label"), col("cosine"), col("__graft_rn").as("rank"))
  }

  /** Assign each vector to its nearest centroid (IVF cell) — a TRUE
    * map-side argmax with zero shuffle: the centroid table is tiny by
    * definition, so it is collected to the driver and unrolled into one
    * `array_max(array(struct(sim_i, id_i)…))` projection (each sim_i is a
    * codegen'd fvec_dot against a literal centroid, scaled by the centroid's
    * precomputed norm — the vector's own norm is a common positive factor
    * and cancels out of the argmax). N input rows → N output rows, no
    * exchange; the earlier crossJoin+window spelling shuffled N×C rows,
    * which is the scale-killer at 100 TB. Above `maxUnrolledCentroids` the
    * generated code would outgrow codegen limits, so it falls back to a
    * broadcast join + per-id `max_by` — one shuffle of N rows, never N×C.
    * Exact similarity ties break toward the larger centroid id. */
  /** Order centroids by id for deterministic tie-breaking. Integral ids
    * sort by longValue (doubleValue would collapse longs past 2^53 and
    * could invert the documented "larger id wins" tie-break), fractional
    * numbers by doubleValue, strings lexicographically; any other id type
    * keeps input order (tie-break then follows input order — documented
    * divergence from the exact struct comparison of the join fallback). */
  private def sortById(cents: Array[(Any, Array[Double], Double)]): Array[(Any, Array[Double], Double)] =
    if (cents.forall(c => c._1.isInstanceOf[java.lang.Long] || c._1.isInstanceOf[java.lang.Integer] ||
        c._1.isInstanceOf[java.lang.Short] || c._1.isInstanceOf[java.lang.Byte]))
      cents.sortBy(_._1.asInstanceOf[Number].longValue)
    else if (cents.forall(_._1.isInstanceOf[Number]))
      cents.sortBy(_._1.asInstanceOf[Number].doubleValue)
    else if (cents.forall(_._1.isInstanceOf[String]))
      cents.sortBy(_._1.asInstanceOf[String])
    else cents

  def assignToCentroids(
      df: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id",
      centroidVecCol: String = "centroid",
      maxUnrolledCentroids: Int = 256): DataFrame = {
    val cents = centroids.select(col(centroidIdCol), col(centroidVecCol)).collect().map { r =>
      val v = r.getSeq[Any](1).map { case n: Number => n.doubleValue }.toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      (r.get(0), v, if (n == 0) 1.0 else n)
    }
    require(cents.nonEmpty, "assignToCentroids: empty centroid table")
    if (cents.length <= maxUnrolledCentroids) {
      // Reference-object argmax (plans.NearestCentroidIndex): constant
      // codegen source regardless of the centroid set, so Lloyd iterations
      // and repeat assignments hit the codegen cache instead of recompiling
      // a C-term unrolled method (was ~10 s of cold q32). Ties break toward
      // the larger index; centroids are sorted by id ascending so that
      // matches the previous array_max(struct(sim, cid)) "larger id wins".
      val sorted = sortById(cents)
      import org.apache.spark.sql.graft.ExprColumn
      val idx = ExprColumn(graft.plans.NearestCentroidIndex(
        ExprColumn.expr(col(vecCol)), sorted.map(_._2.toSeq).toSeq))
      val ids = array(sorted.map { case (cid, _, _) => lit(cid) }.toIndexedSeq: _*)
      df.withColumn(centroidIdCol, element_at(ids, idx + 1))
    } else {
      // Division (not reciprocal-multiply): dot/|c| matches the unrolled
      // NearestCentroidIndex path bit-for-bit, so a near-tie assignment
      // cannot flip between the two branches (reciprocal-multiply can be
      // off by 1 ulp from the division IEEE mandates).
      val bc = broadcast(centroids.select(
        col(centroidIdCol).as("__graft_cid"),
        col(centroidVecCol).as("__graft_cv"),
        sqrt(dot(col(centroidVecCol), col(centroidVecCol))).as("__graft_cnorm")))
      val others = df.columns.filterNot(_ == idCol).toSeq
      val scored = df.crossJoin(bc)
        .withColumn("__graft_sim", dot(col(vecCol), col("__graft_cv")) / col("__graft_cnorm"))
      scored
        .groupBy(col(idCol))
        .agg(max_by(
          struct(others.map(col) :+ col("__graft_cid").as(centroidIdCol): _*),
          struct(col("__graft_sim"), col("__graft_cid"))).as("__graft_best"))
        .select(col(idCol) +: (others :+ centroidIdCol).map(c => col(s"__graft_best.$c")): _*)
    }
  }

  /** Lloyd-iteration k-means over the embedding column, expressed entirely
    * as DataFrame ops: deterministic hash-sample init, then per iteration a
    * zero-shuffle assignment (`assignToCentroids`) and an element-wise mean
    * via posexplode + (cell, position) average — k×dim rows per iteration,
    * never a driver-side vector loop. Cells that lose all members drop out
    * (standard Lloyd behavior; rerun with larger k if cell count matters).
    * Replaces the hash-sample stand-in as the IVF centroid source. */
  def kmeansCentroids(
      corpus: DataFrame,
      numCentroids: Int,
      iterations: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      /** seed with k-means|| (default) or the cheap hash sample */
      parallelInit: Boolean = true): DataFrame = {
    // The corpus is scanned by every k-means|| round, the weight pass, and
    // every Lloyd iteration's assignment collect — cache the projected
    // vectors ONCE for the whole run (at 100 TB this is the difference
    // between iterations reading cached blocks and re-reading the table
    // per driver action), and hand the cached frame to the seeding step.
    val vecs = corpus.select(col(idCol), col(vecCol)).cache()
    try {
      var cents =
        if (parallelInit) kmeansParallelInit(vecs, numCentroids, idCol = idCol, vecCol = vecCol)
        else sampleCentroids(vecs, numCentroids, idCol, vecCol)
      for (_ <- 0 until iterations) {
        cents = assignToCentroids(vecs, cents, idCol, vecCol)
          .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("__graft_pos", "__graft_x")))
          .groupBy(col("centroid_id"), col("__graft_pos"))
          .agg(avg(col("__graft_x")).as("__graft_m"))
          .groupBy(col("centroid_id"))
          .agg(
            transform(
              array_sort(collect_list(struct(col("__graft_pos"), col("__graft_m")))),
              s => s.getField("__graft_m").cast("float")).as("centroid"))
      }
      // Localize the k-row result: downstream consumers (cell assignment,
      // probe selection) each collect the centroid table, and without this
      // every collect would re-run the whole Lloyd cascade — the same
      // lineage-leak class as the duplicateClusters round-3 finding.
      val rows = cents.collect()
      vecs.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), cents.schema)
    } finally vecs.unpersist()
  }

  /** k-means|| seeding (Bahmani et al., "Scalable k-means++", VLDB 2012)
    * expressed as DataFrame ops with DETERMINISTIC hash-based sampling:
    *
    *   1. seed with the min-id-hash vector;
    *   2. per round, compute each point's squared distance to its nearest
    *      chosen candidate (map-side: candidates are driver-collected
    *      literals, `array_min` over unrolled codegen'd distances — no
    *      join, no shuffle; past 256 candidates a broadcast-join +
    *      per-id min takes over, shuffling N rows, never N×C),
    *      total cost φ in one agg, then keep each point
    *      independently with probability `l·d²/φ` — "randomness" is a
    *      per-(id, round) xxhash64 mapped to [0,1), so reruns pick the
    *      same candidates;
    *   3. weight every candidate by the corpus points nearest to it (one
    *      zero-shuffle assignment + a count), and reduce the ~l·rounds
    *      candidates to k on the driver with the weighted farthest-point
    *      heuristic (candidates are tiny by construction).
    *
    * Two passes over the corpus per round, never an N×C shuffle — the
    * cluster-scale seeding the sample init can't provide when a corpus has
    * far-apart modes that one hash sample misses.
    *
    * Callers should pass a CACHED corpus frame: every round and the weight
    * pass launch driver actions over it (`kmeansCentroids` does this). */
  def kmeansParallelInit(
      corpus: DataFrame,
      k: Int,
      rounds: Int = 2,
      oversampling: Int = 0, // l; 0 → 2k
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0, "kmeansParallelInit: k must be positive")
    val l = if (oversampling > 0) oversampling else 2 * k
    val vecs = corpus.select(col(idCol), col(vecCol))
    def asVec(r: org.apache.spark.sql.Row): (Any, Array[Double]) =
      (r.get(0), r.getSeq[Any](1).map { case n: Number => n.doubleValue }.toArray)

    var candidates = sampleCentroids(corpus, 1, idCol, vecCol).collect().map(asVec).toVector
    require(candidates.nonEmpty, "kmeansParallelInit: empty corpus")

    // same unroll discipline as assignToCentroids: a literal subtree per
    // candidate is codegen-friendly only up to a point — past the cap the
    // generated method outgrows whole-stage-codegen limits, so switch to a
    // broadcast join + per-id min (shuffles N rows, still never N×C)
    val maxUnrolled = 256
    def withSqDistToNearest(df: DataFrame): DataFrame =
      if (candidates.size <= maxUnrolled) {
        // Reference-object min-d² (plans.MinSquaredDistance): the candidate
        // set grows every round, so the unrolled array_min recompiled its
        // codegen each round — this form has constant source and compiles
        // once per JVM. Values bit-identical ((xx − 2·dot) + cc, min, clamp).
        import org.apache.spark.sql.graft.ExprColumn
        df.withColumn("__graft_d2", ExprColumn(graft.plans.MinSquaredDistance(
          ExprColumn.expr(col(vecCol)), candidates.map(_._2.toSeq))))
      } else {
        val cand = broadcast(
          doubleVecFrame(corpus, candidates, idCol).select(col("centroid")))
        val d2 = dot(col(vecCol), col(vecCol)) -
          lit(2.0) * dot(col(vecCol), col("centroid")) +
          dot(col("centroid"), col("centroid"))
        df.crossJoin(cand)
          .withColumn("__graft_cd2", greatest(d2, lit(0.0)))
          .groupBy(col(idCol))
          .agg(
            first(col(vecCol)).as(vecCol),
            min(col("__graft_cd2")).as("__graft_d2"))
      }

    for (r <- 0 until rounds) {
      val withCost = withSqDistToNearest(vecs)
      val phi = withCost.agg(sum(col("__graft_d2"))).collect()(0).getDouble(0)
      if (phi > 0) {
        // deterministic uniform in [0,1) from (id, round) — the same
        // hash-to-uniform recipe every sampling operator shares
        val u = graft.text.Sampling.uniformHash(col(idCol), s"kmpp$r")
        val sampled = withCost
          .filter(u < least(lit(l) * col("__graft_d2") / lit(phi), lit(1.0)))
          .select(col(idCol), col(vecCol))
          .orderBy(col(idCol)) // stable order; expected size ≈ l, hard-capped
          .limit(4 * l)
          .collect().map(asVec)
        val known = candidates.map(_._1).toSet
        candidates = candidates ++ sampled.filterNot(c => known.contains(c._1))
      }
    }

    // weight candidates by population, then reduce to k driver-side
    val weights = assignToCentroids(vecs, doubleVecFrame(corpus, candidates, idCol), idCol, vecCol)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("w"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap

    // weighted farthest-point: start at the heaviest candidate, then
    // repeatedly add the candidate maximizing weight × d² to the chosen set
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val ordered = candidates.sortBy { case (id, _) => (-weights.getOrElse(id, 0L), String.valueOf(id)) }
    var chosen = Vector(ordered.head)
    while (chosen.size < math.min(k, candidates.size)) {
      val chosenIds = chosen.map(_._1).toSet
      val next = ordered
        .filterNot(c => chosenIds.contains(c._1))
        .maxBy { case (id, v) =>
          (weights.getOrElse(id, 0L).toDouble * chosen.map(c => d2(v, c._2)).min, String.valueOf(id))
        }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
      chosen = chosen :+ next
    }
    val s = corpus.sparkSession
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      chosen.map { case (id, v) =>
        org.apache.spark.sql.Row(id, v.map(_.toFloat).toSeq)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id", corpus.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
  }

  /** (centroid_id, centroid: array<double>) frame from driver-side vectors;
    * the id column keeps the corpus id type so downstream joins line up. */
  private def doubleVecFrame(
      corpus: DataFrame,
      entries: Seq[(Any, Array[Double])],
      idCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    corpus.sparkSession.createDataFrame(
      entries.map { case (id, v) => org.apache.spark.sql.Row(id, v.toSeq) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id", corpus.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
  }

  /** Pick `numCentroids` deterministic pseudo-random "centroids" from the
    * corpus itself — the cheap seeding (see `kmeansParallelInit` for the
    * quality-first one); swap in MLlib KMeans offline for
    * production cells. Selection = top-k by id-hash: `orderBy(hash).limit`
    * compiles to TakeOrderedAndProject (per-partition top-k merged on the
    * driver), so no single-partition global sort at corpus scale. */
  def sampleCentroids(
      corpus: DataFrame,
      numCentroids: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("__graft_h", xxhash64(col(idCol).cast("string")))
      .orderBy(col("__graft_h"), col(idCol))
      .limit(numCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))

  /** IVF ANN: corpus pre-assigned to cells; each query probes its
    * `probes` nearest cells and scans only those corpus partitions. Returns
    * top-k per query — approximate (misses neighbors outside probed cells),
    * O(N/cells × probes) per query instead of O(N). */
  def ivfTopK(
      queries: DataFrame,
      corpusWithCells: DataFrame, // (idCol, vecCol, centroid_id)
      centroids: DataFrame, // (centroid_id, centroid)
      k: Int,
      probes: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(centroids)
    // per query: its `probes` nearest centroid ids
    val qScored = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__graft_qv"))
      .crossJoin(cents)
      .withColumn("__graft_sim", cosine(col("__graft_qv"), col("centroid")))
    val wq = Window.partitionBy(col("query_id")).orderBy(desc("__graft_sim"), asc("centroid_id"))
    val probed = qScored
      .withColumn("__graft_rn", row_number().over(wq))
      .filter(col("__graft_rn") <= probes)
      .select(col("query_id"), col("__graft_qv"), col("centroid_id"))
    // scan only probed cells: equi-join on centroid_id. Broadcasting the
    // probed query side is only safe when the query set is small relative
    // to the corpus — `probed` carries a full embedding per (query, probe)
    // row, so an all-corpus query set (q380's shape) would ship a
    // corpus-sized broadcast to every executor. Gate the hint on a cheap
    // planner statistic: respect it only when the query side's estimated
    // size is a sliver of the corpus side's; otherwise let the planner
    // pick a shuffle join (AQE still broadcasts at runtime if it turns out
    // tiny).
    val c = corpusWithCells.select(col(idCol).as("neighbor_id"), col(vecCol).as("__graft_cv"), col("centroid_id"))
    val qBytes = probed.queryExecution.optimizedPlan.stats.sizeInBytes
    val cBytes = c.queryExecution.optimizedPlan.stats.sizeInBytes
    val probedSide = if (qBytes * 8 <= cBytes) broadcast(probed) else probed
    val scored = probedSide
      .join(c, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__graft_qv"), col("__graft_cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("__graft_rn").as("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * partition the embedding space into centroid cells, treat same-cell
    * pairs with cosine above `threshold` as semantic duplicates, and keep,
    * per duplicate neighborhood, the item ranked LOWEST by
    * (centroid similarity, id) — the paper's keep-the-point-farthest-from-
    * the-centroid rule plus a deterministic id tie-break for exact copies.
    *
    * The drop decision is a pure per-item EXISTS — x drops iff some
    * same-cell y has cos(x, y) > threshold and (cent_sim_y, id_y) <
    * (cent_sim_x, id_x) — so no iterative connected components run and the
    * result is evaluation-order independent (a similarity chain keeps
    * exactly its minimal element).
    *
    * Scale shape: one zero-shuffle centroid assignment + a broadcast join
    * to reattach centroid vectors, then a per-cell self-join — the
    * quadratic term is bounded by the largest cell, which is exactly what
    * the centroid count controls (the paper runs k ≈ corpus/10k). The
    * assigned frame is cached for the self-join and unpersisted after the
    * result is checkpointed (no retained frames after return).
    *
    * Returns one row per input row: (idCol, cluster, centroid_sim, keep)
    * with keep = 1/0. Compose with a filter on keep to materialize the
    * deduplicated corpus. Centroids come from `kmeansCentroids` /
    * `sampleCentroids`, or any (centroid_id, centroid) frame. */
  def semanticDeduplicate(
      corpus: DataFrame,
      centroids: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = assignToCentroids(corpus.select(col(idCol), col(vecCol)), centroids, idCol, vecCol)
    val cents = broadcast(centroids.select(
      col("centroid_id"), col("centroid").as("__graft_centv")))
    val withSim = assigned.join(cents, Seq("centroid_id"))
      .select(
        col(idCol), col(vecCol),
        col("centroid_id").as("cluster"),
        cosine(col(vecCol), col("__graft_centv")).as("centroid_sim"))
      .cache()
    val a = withSim.select(
      col("cluster"), col(idCol).as("__graft_id1"), col(vecCol).as("__graft_v1"),
      col("centroid_sim").as("__graft_cs1"))
    val b = withSim.select(
      col("cluster"), col(idCol).as("__graft_id2"), col(vecCol).as("__graft_v2"),
      col("centroid_sim").as("__graft_cs2"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("__graft_id1") =!= col("__graft_id2"))
      .filter(cosine(col("__graft_v1"), col("__graft_v2")) > lit(threshold))
      .filter(col("__graft_cs2") < col("__graft_cs1") ||
        (col("__graft_cs2") === col("__graft_cs1") && col("__graft_id2") < col("__graft_id1")))
      .select(col("__graft_id1").as(idCol)).distinct()
      .withColumn("__graft_drop", lit(1L))
    val out = withSim.join(dropped, Seq(idCol), "left")
      .select(
        col(idCol), col("cluster"), col("centroid_sim"),
        col("__graft_drop").isNull.cast("long").as("keep"))
      .localCheckpoint(true) // anchor before releasing the cached input
    withSim.unpersist()
    out
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * restricted to LSH buckets from random-hyperplane signatures so the
    * cross product never materializes. Deterministic hyperplanes derived
    * from a seed via a hash mix. */
  def cosineNearDuplicates(
      df: DataFrame,
      threshold: Double,
      planesPerBand: Int = 8,
      bands: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dimension: Option[Int] = None): DataFrame = {
    // embedding dimensionality: pass it when known; otherwise inferred from
    // the first row (one tiny driver action). An empty corpus has no pairs.
    val dim = dimension.getOrElse {
      val first = df.select(size(col(vecCol))).limit(1).collect()
      if (first.isEmpty)
        return df.select(col(idCol).as("id1"), col(idCol).as("id2"), lit(0.0).as("cosine")).limit(0)
      first(0).getInt(0)
    }
    // deterministic pseudo-random hyperplanes: component = hash(b,p,i)
    // mapped to [-1,1]. Band buckets are computed MAP-SIDE by the
    // hyperplane_buckets codegen expression (plans.HyperplaneBuckets): the
    // previous posexplode → 32 sum-aggregates → join-back-to-vectors
    // spelling paid a shuffle for the projections and a second join to
    // reattach the vector; this keeps the vector on the row and emits
    // (band, bucket) pairs straight from the scan stage — zero shuffle
    // before the bucket self-join. Bit-identical buckets (spec-enforced).
    def plane(b: Int, p: Int): Seq[Double] =
      (0 until dim).map { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((b, p, i))
        (h.toDouble / Int.MaxValue)
      }
    val planes = for (b <- 0 until bands; p <- 0 until planesPerBand) yield plane(b, p)
    import org.apache.spark.sql.graft.ExprColumn
    val bucketArr = ExprColumn(graft.plans.HyperplaneBuckets(
      ExprColumn.expr(col(vecCol)), planes, planesPerBand))
    val buckets = df
      .select(col(idCol), col(vecCol), posexplode(bucketArr).as(Seq("band", "bucket")))
      .cache() // self-joined below: compute the band buckets once per vector
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("v1"), col("v2")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** Graph-based kNN construction by NN-Descent (Dong, Moses & Li,
    * WWW'11 "Efficient K-Nearest Neighbor Graph Construction for Generic
    * Similarity Measures") — the DEFINED deterministic variant:
    *
    *   - init: the RANK ring — order nodes by id, node of rank r first
    *     guesses the nodes of rank (r+1..r+k) mod n (the paper samples
    *     randomly; a fixed ring is reproducible and deliberately BAD, so
    *     the recall gain per round is visible). Ranks, not raw ids: a
    *     gapped/offset id space would otherwise seed edges at nonexistent
    *     ids that the scoring joins silently drop (r15 ADVICE). For dense
    *     0..n−1 ids rank == id, so the classic ring is unchanged. Ids
    *     must be UNIQUE (castable to long) — the rank order is total;
    *   - round: local join — every ordered pair of nodes adjacent to a
    *     common node through the UNDIRECTED current graph (B ∪ R in the
    *     paper's terms) becomes a candidate edge, unioned with the
    *     current edges;
    *   - select: per node the top-k candidates under the (cosine DESC,
    *     id ASC) total order — doubles ORDER here, they are never
    *     aggregated (the oracle-discipline rule).
    *
    * Scale shape: rounds are FIXED (the paper's early-termination is
    * data-dependent — a defined round count keeps the operator and any
    * replay engine in lockstep); each round is two census-sized unions,
    * one explicit-N repartitioned co-neighbor self-join (k² candidates
    * per node, never corpus²), two vector joins, and one per-node
    * window. The loop-carried edge frame goes through the
    * stats-clamping [[org.apache.spark.sql.graft.CheckpointFresh]] (the
    * Borůvka lesson: localCheckpoint compounds join statistics across
    * rounds). Returns (idCol, rank, neighbor_id, cosine). */
  def nnDescentKnn(
      corpus: DataFrame,
      k: Int,
      rounds: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"nnDescentKnn: k must be >= 1, got $k")
    require(rounds >= 0, s"nnDescentKnn: rounds must be >= 0, got $rounds")
    val spark = corpus.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val vecs = corpus
      .select(col(idCol).cast("long").as("__sim_id"), col(vecCol).as("__sim_v"))
      .cache()
    try {
      val n = vecs.count() // metadata-scale driver scalar (the ring modulus)
      require(n > k, s"nnDescentKnn: need more than k=$k rows, got $n")
      def xs = vecs.select(col("__sim_id").as("__sim_x"), col("__sim_v").as("__sim_vx"))
      def ys = vecs.select(col("__sim_id").as("__sim_y"), col("__sim_v").as("__sim_vy"))
      def topK(cand: DataFrame): DataFrame = {
        val scored = cand
          .join(xs, Seq("__sim_x"))
          .join(ys, Seq("__sim_y"))
          .withColumn("__sim_cos", cosine(col("__sim_vx"), col("__sim_vy")))
        val w = Window.partitionBy(col("__sim_x"))
          .orderBy(desc("__sim_cos"), asc("__sim_y"))
        scored
          .withColumn("__sim_rn", row_number().over(w))
          .filter(col("__sim_rn") <= k)
      }
      // 0-based global rank over the id order — two-pass range-partitioned
      // cumsum, never a single-task unpartitioned window (GlobalOrder's
      // contract); (rank, id) is metadata-per-row, cached only through init
      val ranked = graft.operators.GlobalOrder
        .cumSum(vecs.select(col("__sim_id")), Seq(col("__sim_id")), lit(1L),
          "__sim_rk1", par)
        .select(col("__sim_id"), (col("__sim_rk1") - 1L).as("__sim_rk"))
        .localCheckpoint(true) // consumed twice below (ring ends + rank→id)
      var edges = ranked
        .select(col("__sim_id").as("__sim_x"), col("__sim_rk"),
          explode(sequence(lit(1L), lit(k.toLong))).as("__sim_m"))
        .select(col("__sim_x"),
          pmod(col("__sim_rk") + col("__sim_m"), lit(n)).as("__sim_nrk"))
        .join(ranked.select(col("__sim_rk").as("__sim_nrk"),
          col("__sim_id").as("__sim_y")), Seq("__sim_nrk"))
        .select(col("__sim_x"), col("__sim_y"))
      for (_ <- 0 until rounds) {
        // CheckpointFresh: consumed three times below (forward, reverse,
        // union with candidates) AND loop-carried — cuts both the plan
        // growth and the compounding-stats hazard
        val cur = org.apache.spark.sql.graft.CheckpointFresh(edges)
        val undirected = cur
          .select(col("__sim_x").as("__sim_c"), col("__sim_y").as("__sim_v2"))
          .unionByName(cur.select(col("__sim_y").as("__sim_c"), col("__sim_x").as("__sim_v2")))
          .distinct()
          // the co-neighbor self-join EXPANDS ~ (2k)² per node — explicit-N
          // repartition sized to the OUTPUT, exempt from AQE's input-bytes
          // coalescing (the q115 rule); also co-partitions both join sides
          .repartition(par, col("__sim_c"))
          .localCheckpoint(true) // self-joined immediately below
        val cands = undirected
          .join(undirected.withColumnRenamed("__sim_v2", "__sim_w"), Seq("__sim_c"))
          .filter(col("__sim_v2") =!= col("__sim_w"))
          .select(col("__sim_v2").as("__sim_x"), col("__sim_w").as("__sim_y"))
        edges = topK(cur.unionByName(cands).distinct())
          .select(col("__sim_x"), col("__sim_y"))
      }
      topK(edges).select(
        col("__sim_x").as(idCol),
        col("__sim_rn").cast("long").as("rank"),
        col("__sim_y").as("neighbor_id"),
        col("__sim_cos").as("cosine"))
        // cut lineage so the result survives the unpersist below
        .localCheckpoint(true)
    } finally vecs.unpersist()
  }
}
