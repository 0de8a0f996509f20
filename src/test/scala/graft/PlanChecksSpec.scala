package graft

import org.apache.spark.sql.functions._
import graft.core.Constants._
import graft.operators.{DimensionFilter, MappingKernel}
import graft.plans.PlanChecks

/** Plan-quality contracts: these assert the physical properties the 100 TB
  * design depends on, so a regression that silently adds a shuffle or stops
  * a pushdown fails CI, not a cluster run. */
class PlanChecksSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("filter ADT predicates push into the parquet scan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = DimensionFilter.applyAll(li, Seq(
      DimensionFilter.ExpressionFilter("l_quantity", ">", 30),
      DimensionFilter.BetweenFilter("l_discount", 0.02, 0.08)))
    assert(PlanChecks.filterPushedFor(out, "l_quantity"))
    assert(PlanChecks.filterPushedFor(out, "l_discount"))
  }

  test("column selection prunes the scan schema") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    li.collect()
    val cols = PlanChecks.scanColumns(li)
    assert(cols.nonEmpty && cols.head.toSet == Set("l_returnflag", "l_quantity"))
  }

  test("mapping kernel: N mappings broadcast, exactly one shuffle to collapse") {
    val fact = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").cast("string").as("geography"), col("c_acctbal").as(ValueColumn))
    val m1 = Seq(("0", "A", 1.0), ("1", "A", 1.0), ("2", "B", 1.0)).toDF(FromIdColumn, ToIdColumn, FromFractionColumn)
    val m2 = Seq(("A", "X", 0.5), ("B", "X", 0.5)).toDF(FromIdColumn, ToIdColumn, FromFractionColumn)
    val out = MappingKernel.mapAndApply(fact, Seq("geography" -> m1, "geography" -> m2))
    out.collect() // materialize so AQE settles the final plan
    assert(PlanChecks.broadcastJoinCount(out) == 2)
    assert(PlanChecks.shuffleCount(out) == 1)
  }

  test("multi-table star join broadcasts the dimension tables") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val r = spark.read.parquet(s"$sf/region.parquet")
    val out = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name").agg(sum("c_acctbal"))
    out.collect()
    assert(PlanChecks.broadcastJoinCount(out) == 2)
    assert(PlanChecks.shuffleCount(out) == 1) // the groupBy only
  }
  test("sequence packing: exactly one shuffle up to the window (the group sort)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("n_tok", graft.text.TextFunctions.tokenCount(col("text")).cast("long"))
    val packed = graft.text.Sharding
      .packTrainingSequences(d, "doc_id", "n_tok", 256L, Seq("source"))
    packed.collect()
    // one exchange for the per-group window sort — nothing else
    assert(graft.plans.PlanChecks.shuffleCount(packed) == 1)
  }

  test("BPE encode is a pure map-side projection: zero shuffles to the token explode") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val enc = graft.text.Bpe.encode(d, "text", Seq(("e", "r"), ("o", "w")))
      .select("bpe_tokens")
    enc.collect()
    assert(graft.plans.PlanChecks.shuffleCount(enc) == 0, "encoding a corpus must be a scan")
  }

  test("quantization is a pure map-side projection over the parquet scan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = graft.ml.Quantize.int8(emb, "embedding")
    q.collect()
    assert(graft.plans.PlanChecks.shuffleCount(q) == 0)
  }

  test("HTML strip + PII-free text cleaning is a pure map-side projection") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val cleaned = d.select(graft.text.TextFunctions.stripHtml(
      org.apache.spark.sql.functions.col("text")).as("clean"))
    cleaned.collect()
    assert(graft.plans.PlanChecks.shuffleCount(cleaned) == 0,
      "cleaning a corpus must run in the scan stage")
  }

  test("embeddingAudit is one hash aggregate over a map-side projection") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val audit = graft.ml.Similarity.embeddingAudit(emb, Seq("label"))
    audit.collect()
    // exactly the aggregate's exchange — nothing else may shuffle
    assert(graft.plans.PlanChecks.shuffleCount(audit) == 1)
  }

  test("corpus novelty: df via gram-key window, no join back to text (2 shuffles to the score)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val plan = graft.text.Dedup.corpusNoveltyScores(d, "doc_id", "text")
    // one exchange for the gram-key window, one for the doc-id aggregate —
    // a join-based df lookup would add a third
    assert(PlanChecks.shuffleCount(plan) <= 2,
      s"novelty must not re-join the corpus: ${PlanChecks.shuffleCount(plan)} shuffles")
  }

  test("oov audit and domain gate broadcast their aggregate artifacts") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val oov = graft.text.TextFunctions.oovStats(d, "doc_id", "text", vocabSize = 50)
    assert(PlanChecks.broadcastExchangeCount(oov) >= 1, "vocab must broadcast")
    val gate = graft.text.Sampling.domainMedianGate(d, "source", "n_chars", 1L, 0L)
    assert(PlanChecks.broadcastExchangeCount(gate) >= 1, "domain stats must broadcast")
  }

  test("char entropy is a pure map-side projection (zero shuffles)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.text.TextFunctions.charEntropyBits(d, "text")
    assert(PlanChecks.shuffleCount(plan) == 0, "entropy must not explode or shuffle")
  }

  test("salted join does not broadcast the salted small side (the regime salting is for)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet").withColumnRenamed("l_partkey", "p_partkey")
    val p = spark.read.parquet(s"$sf/part.parquet")
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = graft.operators.SkewJoin
        .saltedEquiJoin(li, p, Seq("p_partkey"), 8, col("l_orderkey"))
      j.collect()
      assert(graft.plans.PlanChecks.broadcastJoinCount(j) == 0)
      // both sides shuffle on (key, salt); the explode adds no extra exchange
      assert(graft.plans.PlanChecks.shuffleCount(j) == 2)
    }
  }

  private def withSqlConf[A](kvs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("plan lint: noCartesian vetoes unconditioned cross joins, spares everything else") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(10L).toDF("y")
    val key = "spark.graft.lint.noCartesian"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val e = intercept[org.apache.spark.sql.AnalysisException](a.crossJoin(b).count())
      assert(e.getMessage.contains("noCartesian"))
      // joins with conditions are untouched
      assert(a.join(b, col("x") < col("y")).count() == 2)
      assert(a.join(b.withColumnRenamed("y", "x"), Seq("x"), "inner").count() == 0)
      // the documented escape hatch: a broadcast-hinted cross join passes
      // (the hint marks it a deliberate, bounded cartesian)
      assert(a.crossJoin(org.apache.spark.sql.functions.broadcast(b)).count() == 2)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // default off: cartesian allowed
    assert(a.crossJoin(b).count() == 2)
  }

  test("dynamic partition pruning measurably shrinks the fact scan's file count") {
    import spark.implicits._
    import graft.plans.PlanChecks
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // fact: 40 rows across 8 brand partitions; dim filter (on id, not brand)
    // survives only brands b0/b1 — DPP must cut the scan from 8 partitions
    (0 until 40).map(i => (i % 10, 1L, s"b${i % 8}"))
      .toDF("id", "qty", "brand")
      .repartition(1)
      .write.partitionBy("brand").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    // dim goes via parquet: a LocalRelation dim gets its filter constant-
    // folded away (ConvertToLocalRelation) and DPP sees no selective
    // predicate to prune with — the viaParquet trap this suite documents
    val dim = viaParquet((0 until 10).map(i => (i, s"b${i % 8}")).toDF("id", "brand"))
      .filter(col("id") < 2) // → brands b0, b1 only, knowable only at runtime
    def run(dppEnabled: Boolean): (Seq[Seq[Any]], Long) = {
      val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dppEnabled.toString)
      try {
        val j = fact.join(broadcast(dim), Seq("id", "brand"))
          .groupBy(col("brand")).agg(sum(col("qty")).as("q"))
        val out = sortedRows(j)
        // fact scan = the one reading qty; metric is populated post-action
        val files = PlanChecks.flatten(j).collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.output.exists(_.name == "qty") =>
            s.metrics("numFiles").value
        }.sum
        (out, files)
      } finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
    }
    val (withDpp, filesWith) = run(dppEnabled = true)
    val (without, filesWithout) = run(dppEnabled = false)
    assert(withDpp == without, "DPP must not change results")
    assert(filesWithout == 8, s"expected all 8 partition files without DPP, read $filesWithout")
    assert(filesWith == 2, s"expected only the 2 surviving brand files with DPP, read $filesWith")
  }

  test("AQE splits a skewed sort-merge-join partition at runtime (the built-in face of salting)") {
    import spark.implicits._
    // manual salting (q105/q116) is the explicit-control path; AQE's skew
    // join is the runtime re-plan that handles the same hot key without
    // code changes — worth a pinned contract so a conf regression can't
    // silently lose it. Thresholds scaled down to fixture size; broadcast
    // disabled so the join is a shuffle join AQE can re-plan.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 carries 20k rows with fat payloads; keys 1..50 one row each
      val left = viaParquet(
        ((1 to 20000).map(i => (0L, s"payload_$i" * 8)) ++
          (1L to 50L).map(k => (k, "x"))).toDF("k", "pay"))
      val right = viaParquet((0L to 50L).map(k => (k, k * 10)).toDF("k", "w"))
      // global (ungrouped) aggregate over the payload: keeps the fat column
      // in the shuffled rows (column pruning would otherwise shrink the hot
      // partition below threshold) and — crucially — requires NO downstream
      // hash partitioning on k, which would veto the skew split (splitting
      // a partition breaks the partitioning a following groupBy(k) needs)
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length(col("pay"))).as("chars"), max(col("w")).as("w"))
      val rows = sortedRows(joined)
      val expectedChars = (1 to 20000).map(i => s"payload_$i".length * 8L).sum + 50
      assert(rows == Seq(Seq(20050L, expectedChars, 500L)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("recursive CTE plans as UnionLoop and matches the closed-form walk") {
    import spark.implicits._
    // q287's shape on a small contiguous key range: parent(k) = k DIV 10.
    // The closed form of the recursion's path-dependent state is the base-10
    // prefix chain (root = leading digit, path_sum = sum of decimal
    // prefixes), so brute force needs no recursion — a disagreement means
    // UnionLoop produced a wrong frontier somewhere.
    viaParquet((1L to 487L).toDF("k")).createOrReplaceTempView("rec_nodes")
    val out = spark.sql("""
      WITH RECURSIVE walk(k, depth, root, path_sum) AS (
        SELECT k, CAST(0 AS BIGINT), k, k FROM rec_nodes WHERE k < 10
        UNION ALL
        SELECT n.k, w.depth + 1, w.root, w.path_sum + n.k
        FROM rec_nodes n JOIN walk w ON n.k DIV 10 = w.k
        WHERE n.k >= 10
      )
      SELECT k, depth, root, path_sum FROM walk""")
    val got = out.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def chain(k: Long): Seq[Long] = if (k < 10) Seq(k) else chain(k / 10) :+ k
    val expected = (1L to 487L).map { k =>
      val c = chain(k)
      k -> ((c.length - 1).toLong, c.head, c.sum)
    }.toMap
    assert(got == expected)
    assert(out.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "recursive CTE should plan as the UnionLoop operator")
  }

  test("round-12 plan contracts: spatial grid join broadcasts the small build side, no cartesian; bootstrap is one aggregation") {
    import graft.plans.PlanChecks
    import graft.operators.{Geo, Resample}
    val pts = viaParquet((1L to 2000L).map(i =>
      (i, i * 48271 % 1000, i * 16807 % 1000)).toDF("lid", "x", "y"))
    val build = viaParquet((1L to 50L).map(i =>
      (i, i * 13 % 1000, i * 29 % 1000)).toDF("rid", "rx", "ry"))
    val joined = Geo.gridDistanceJoin(pts, build, "x", "y", "rx", "ry", 40L,
      probePartitions = 4)
    val plans = PlanChecks.flatten(joined).map(_.getClass.getSimpleName)
    assert(!plans.exists(_.contains("CartesianProduct")),
      s"spatial join must never be a cartesian: $plans")
    // tiny build side: the cell equi-join collapses to a broadcast hash join
    assert(PlanChecks.broadcastJoinCount(joined) >= 1, s"expected broadcast: $plans")
    // bootstrap: all B replicates ride ONE aggregation — exactly one
    // shuffle (the groupBy exchange), never a B-times explode
    val ev = viaParquet((1L to 3000L).map(i => ("g", i, i % 17)).toDF("g", "id", "v"))
    val reps = Resample.bootstrapReplicates(ev, "id", "v", reps = 16, Seq("g"))
    assert(PlanChecks.shuffleCount(reps) == 1,
      s"bootstrap must be one aggregation pass: ${PlanChecks.shuffleCount(reps)} shuffles")
  }
}
