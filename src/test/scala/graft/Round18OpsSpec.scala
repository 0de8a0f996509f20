package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.plans.PlanChecks

/** Round-18 pins: the streaming bench warm-up and the plan-lint gate's
  * cartesian mechanics (the q380 finding). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("StreamOps.warmup runs clean, drops its view, restores shuffle conf") {
    // warmup is invoked from Bench inside a swallow-all catch — a broken
    // warmup would silently no-op and the isolated-streaming-bench numbers
    // would quietly regress to the unwarmed 2x band; this spec keeps it loud
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    graft.streaming.StreamOps.warmup(spark)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev,
      "warmup must restore the scoped shuffle-partition conf")
    assert(!spark.catalog.tableExists("graft_stream_warmup"),
      "warmup must drop its memory-sink view")
    // runs twice in one JVM (Bench children + parent may both call it)
    graft.streaming.StreamOps.warmup(spark)
  }

  test("constant-key scalar join: bare = cartesian, broadcast = BNLJ (q380 mechanism)") {
    // both sides aggregate under a LITERAL group key; Catalyst's foldable
    // propagation folds the g = g equi-condition to true and the join
    // degenerates. Bare: CartesianProductExec (the plan-lint fail shape).
    // With an explicit broadcast on the one-row side: the bounded
    // BroadcastNestedLoopJoin the lint accepts.
    val base = spark.range(100)
      .select(lit("all").as("g"), (col("id") % 7).as("v"))
    val a = base.groupBy("g").agg(sum("v").as("s"))
    val b = base.groupBy("g").agg(max("v").as("m"))
    val bare = a.join(b, "g")
    // in q380 the aggregate sides' size statistics were far above the
    // auto-broadcast threshold (checkpoint-truncated corpus pipeline), so
    // the planner fell through to the cartesian; tiny test frames would
    // auto-broadcast, so scope the threshold off to reproduce that state
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try
      assert(PlanChecks.flatten(bare).exists(_.isInstanceOf[CartesianProductExec]),
        "expected the folded constant-key join to plan as a cartesian")
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    // the explicit hint works regardless of the threshold — the q380 fix
    val hinted = a.join(broadcast(b), "g")
    val nodes = PlanChecks.flatten(hinted)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "broadcast build side must avoid CartesianProductExec")
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "expected the bounded BNLJ form")
    // values are identical either way
    assert(bare.collect().toSeq == hinted.collect().toSeq)
  }

  // ---- r18 optimization round: identity-first-round elisions ----
  // Round 1 of every iterative kernel starts from an identity/constant
  // vector, and the r18 optimization skips the then-no-op edge x state
  // joins (guide §2.4). A single-round call runs ONLY the elided path, so
  // these pins are the focused coverage for the rewrite; the multi-round
  // hand cases elsewhere cover elided + general rounds composing.

  test("labelPropagation iterations=1 == min neighbor (elided first round)") {
    import graft.operators.Graph
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (2L, 2L))
      .toDF("src", "dst")
    val got = Graph.labelPropagation(e, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // symmetrized neighbor sets: 1->{2,3}, 2->{1,3}, 3->{1,2}, 4->{5}, 5->{4}
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 5L, 5L -> 4L))
  }

  test("hits rounds=1: hub = out-degree, auth = in-sum of hub (elided first round)") {
    import graft.operators.Graph
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.hits(e, rounds = 1)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // hub: 1 -> 2 edges, 2 -> 1; auth: 3 <- hub(1)+hub(2)=3, 4 <- hub(1)=2
    assert(got == Set((1L, 2L, -1L), (2L, 1L, -1L), (3L, -1L, 3L), (4L, -1L, 2L)))
  }

  test("pageRankFixedPoint iterations=1 matches the hand fixed-point step") {
    import graft.operators.Graph
    // 1->2, 1->3, 2->3: n=3, scale/n = 333333333, base = 15*1e9/(100*3)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRankFixedPoint(e, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val base = (1000000000L * 15L) / (100L * 3L)
    val r2 = base + (85L * (333333333L / 2L)) / 100L
    val r3 = base + (85L * (333333333L / 2L + 333333333L / 1L)) / 100L
    assert(got == Map(1L -> base, 2L -> r2, 3L -> r3))
  }

  test("boruvkaMsf single-round graph (identity round elided) emits the edge") {
    import graft.operators.Graph
    val e = Seq((1L, 2L, 7L)).toDF("u", "v", "w")
    val got = Graph.boruvkaMsf(e, "u", "v", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 2L, 7L, 1)))
  }

  // ---- r18 optimization round: fused gram-TF kernel (q128 APSS) ----

  test("gram_tf_vector == explode+xxhash64(concat_ws)+groupBy, fuzz incl. nulls/multibyte") {
    import org.apache.spark.sql.graft.ExprColumn
    val rnd = new scala.util.Random(180128)
    // vocabulary stresses the byte-slice hash: multibyte UTF-8, empty-ish
    // strings, embedded-separator-free words of varied length
    val vocab = Vector("a", "bb", "ccc", "naïve", "κόσμος", "x1", "ZZ", "über", "日本語", "w")
    val docs: Seq[(Long, Seq[String])] = (0L until 60L).map { id =>
      val len = rnd.nextInt(9) // 0..8 tokens, many below/at/above n
      val toks = Seq.fill(len) {
        // ~8% null tokens exercise the concat_ws skip-null slow path
        if (rnd.nextInt(12) == 0) null else vocab(rnd.nextInt(vocab.size))
      }
      (id, toks)
    } :+ (999L, null) // NULL token array: both spellings drop the document
    val df = docs.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val old = df
        .select(col("id"),
          explode(graft.text.TextFunctions.wordShinglesFromTokens(col("toks"), n)).as("g"))
        .groupBy(col("id"), xxhash64(col("g")).as("gram"))
        .agg(count(lit(1)).as("tf"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fused = df
        .select(col("id"),
          explode(ExprColumn(graft.plans.GramTfVector(ExprColumn.expr(col("toks")), n))).as("p"))
        .select(col("id"), col("p.gram").as("gram"), col("p.tf").as("tf"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fused == old, s"gram_tf_vector diverged from the relational spelling at n=$n")
    }
  }

  test("gram_hashes == xxhash64_array(wordShinglesFromTokens), fuzz incl. nulls/multibyte") {
    import org.apache.spark.sql.graft.ExprColumn
    val rnd = new scala.util.Random(180129)
    val vocab = Vector("a", "bb", "ccc", "naïve", "κόσμος", "x1", "ZZ", "über", "日本語", "w")
    val docs: Seq[(Long, Seq[String])] = (0L until 60L).map { id =>
      val len = rnd.nextInt(9)
      val toks = Seq.fill(len) {
        if (rnd.nextInt(12) == 0) null else vocab(rnd.nextInt(vocab.size))
      }
      (id, toks)
    } :+ (999L, null)
    val df = docs.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val old = df.select(col("id"),
        ExprColumn(graft.plans.XxHash64Array(ExprColumn.expr(
          graft.text.TextFunctions.wordShinglesFromTokens(col("toks"), n)))).as("hs"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getSeq[Long](1))).toSeq
      val fused = df.select(col("id"),
        ExprColumn(graft.plans.GramHashes(ExprColumn.expr(col("toks")), n)).as("hs"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getSeq[Long](1))).toSeq
      assert(fused == old, s"gram_hashes diverged from the xxhash64_array spelling at n=$n")
    }
  }

  test("gram_tf_vector short/empty documents match the whole-text gram rule") {
    import org.apache.spark.sql.graft.ExprColumn
    // cnt <= n collapses to ONE gram = array_join(toks, ' '); cnt == 0
    // yields the single empty-string gram (wordShinglesFromTokens's
    // cnt<=n branch over an empty array)
    val df = Seq(
      (1L, Seq("solo")),
      (2L, Seq("two", "words")),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val got = df
      .select(col("id"),
        explode(ExprColumn(graft.plans.GramTfVector(ExprColumn.expr(col("toks")), 3))).as("p"))
      .select(col("id"), col("p.gram"), col("p.tf"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = df
      .select(col("id"), xxhash64(array_join(col("toks"), " ")).as("gram"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1L)).toSet
    assert(got == expect)
  }

  test("gramVectors: every exchange is gram-keyed and the census join is shuffled-hash") {
    // the r18 APSS restructure's plan contract: the fused kernel removed the
    // (id, gram) count aggregation, so the ONLY shuffle key left anywhere in
    // the gramVectors plan is `gram` (the explicit-N repartition both join
    // sides share), and the df-census joins back as a shuffled-hash build —
    // the posting list is never sorted
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 2} tail$i"))
      .toDF("id", "text")
    val vecs = graft.text.ApssJoin.gramVectors(docs, "id", "text", 3, 1000L)
    val nodes = PlanChecks.flatten(vecs)
    val shuffleKeys = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.map(_.references.map(_.name).mkString(","))
          case p => Seq(s"non-hash:$p")
        }
    }.flatten.distinct
    assert(shuffleKeys == Seq("gram"),
      s"expected every shuffle keyed on gram only, got $shuffleKeys")
    assert(nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "expected the df-census join to plan as ShuffledHashJoin")
  }
}
