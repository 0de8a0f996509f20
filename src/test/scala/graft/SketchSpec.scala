package graft

import org.apache.spark.sql.functions._

import graft.operators.{Aggregation, Sketches}
import graft.plans.{CountMinHash, PlanChecks}
import graft.text.Dedup

/** Count-Min / HyperLogLog sketches, salted aggregation, and blocked
  * edit-distance dedup (q113–q116). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 400).map { i =>
    // zipf-ish: key k appears ~400/k times
    val k = (1 to 20).find(k => i <= (1 to k).map(400 / _).sum).getOrElse(20)
    (i.toLong, s"key$k")
  }.toDF("id", "k")

  test("count-min estimate is never below the exact count, for every key") {
    val df = corpus
    val art = Sketches.buildCountMin(df, array(col("k")), depth = 4, width = 32)
    val out = df
      .groupBy("k")
      .agg(count(lit(1)).as("exact"))
      .withColumn("est", Sketches.countMinEstimate(art, xxhash64(col("k"))))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"), r.toString))
  }

  test("count-min matrix is deterministic under partitioning, and total mass is exact") {
    val df = corpus
    val a = Sketches.buildCountMin(df.repartition(1), array(col("k")), depth = 3, width = 64)
    val b = Sketches.buildCountMin(df.repartition(7, col("id")), array(col("k")), depth = 3, width = 64)
    assert(a.counts.sameElements(b.counts))
    assert(a.totalCount == 400L)
  }

  test("count-min pre-hashed array<long> path builds the identical matrix") {
    val df = corpus.groupBy("id").agg(collect_list(col("k")).as("toks"))
    val viaStrings = Sketches.buildCountMin(df, col("toks"), depth = 4, width = 32)
    val viaHashes = Sketches.buildCountMin(
      df, transform(col("toks"), t => xxhash64(t)), depth = 4, width = 32)
    assert(viaStrings.counts.sameElements(viaHashes.counts))
  }

  test("count-min lookup interpreted eval agrees with the codegen path") {
    val art = Sketches.buildCountMin(corpus, array(col("k")), depth = 4, width = 32)
    val keys = (1 to 20).map(k => s"key$k")
    val viaColumn = corpus
      .filter(col("id") <= 20)
      .withColumn("est", Sketches.countMinEstimate(art, xxhash64(col("k"))))
      .select("k", "est").distinct().as[(String, Long)].collect().toMap
    keys.foreach { k =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(org.apache.spark.unsafe.types.UTF8String.fromString(k), CountMinHash.Seed)
      val interpreted = CountMinHash.estimate(art.counts, h, 4, 32)
      viaColumn.get(k).foreach(est => assert(est == interpreted, s"key $k"))
    }
  }

  test("hll registers are deterministic under partitioning and estimate tracks exact") {
    val df = (1 to 5000).map(i => ("g", s"k$i")).toDF("g", "k")
    val regs1 = Sketches.hllRegisters(df.repartition(1), Seq("g"), xxhash64(col("k")), p = 8)
    val regs7 = Sketches.hllRegisters(df.repartition(7, col("k")), Seq("g"), xxhash64(col("k")), p = 8)
    assert(sortedRows(regs1) == sortedRows(regs7))
    val est = Sketches.hllEstimate(regs1, Seq("g"), p = 8).collect().head
    val e = est.getAs[Double]("hll_est")
    assert(est.getAs[Long]("registers_used") <= 256L)
    // raw HLL at m=256 has ~6.5% standard error; 25% is a safe determinism-
    // friendly bound for one draw
    assert(math.abs(e - 5000.0) / 5000.0 < 0.25, s"estimate $e too far from 5000")
  }

  test("hll register table never exceeds groups x m rows (the sketch property)") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"k$i")).toDF("g", "k")
    val regs = Sketches.hllRegisters(df, Seq("g"), xxhash64(col("k")), p = 4)
    assert(regs.count() <= 3L * 16)
  }

  test("salted aggregation equals the plain aggregation") {
    val df = viaParquet((1 to 300).map(i => (s"k${i % 3}", i.toLong, i.toLong * 2)).toDF("k", "id", "v"))
    val salted = Aggregation.saltedAggregate(
      df, Seq("k"),
      Seq(("sum", "v", "sv"), ("count", "v", "n"), ("min", "v", "mn"), ("max", "v", "mx")),
      salts = 5, saltSource = col("id"))
    val plain = df.groupBy("k")
      .agg(sum(col("v")).as("sv"), count(col("v")).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted aggregation spreads a hot key across two shuffles and refuses non-algebraic aggs") {
    val df = viaParquet((1 to 300).map(i => ("hot", i.toLong, i.toLong)).toDF("k", "id", "v"))
    val salted = Aggregation.saltedAggregate(
      df, Seq("k"), Seq(("sum", "v", "sv")), salts = 4, saltSource = col("id"))
    assert(PlanChecks.shuffleCount(salted) == 2)
    intercept[IllegalArgumentException] {
      Aggregation.saltedAggregate(df, Seq("k"), Seq(("median", "v", "m")), 4, col("id"))
    }
  }

  test("blocked edit-distance pairs match brute force within blocks, and unblocked is refused") {
    val df = Seq(
      (1L, "b1", "alpha"), (2L, "b1", "alphb"), (3L, "b1", "gamma"),
      (4L, "b2", "alpha"), (5L, "b1", "alpha"), (6L, "b1", "delta")).toDF("id", "blk", "s")
    val got = Dedup.editDistanceNearDuplicates(df, "id", "s", Seq("blk"), maxDistance = 1)
      .as[(Long, Long, Int)].collect().toSet
    // brute force: within b1 only — (1,2) dist1, (1,5) dist0, (2,5) dist1
    assert(got == Set((1L, 2L, 1), (1L, 5L, 0), (2L, 5L, 1)))
    intercept[IllegalArgumentException] {
      Dedup.editDistanceNearDuplicates(df, "id", "s", Nil, 1)
    }
  }

  test("qgramEditJoin is SOUND: equals brute force on a duplicate-gram-heavy corpus") {
    // alphabet {a,b} strings of length 6..10: grams repeat within and
    // across strings — exactly the regime where a both-prefix index can
    // lose a matched pair (the asymmetric probe-vs-full join's reason)
    val rnd = new scala.util.Random(13)
    val strs = (1 to 80).map(i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(5))(if (rnd.nextBoolean()) 'a' else 'b').mkString))
    val df = viaParquet(strs.toDF("id", "s"))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (maxD <- Seq(0, 1)) {
      val got = Dedup.qgramEditJoin(df, "id", "s", q = 2, maxDistance = maxD)
        .as[(Long, Long, Int)].collect().toSet
      val brute = (for {
        (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
        d = lev(s1, s2) if d <= maxD
      } yield (i1, i2, d)).toSet
      assert(got == brute, s"maxDistance=$maxD: prefix filter must lose nothing")
    }
    // micro-strings below q·(d+1) are excluded by contract
    val tiny = viaParquet(Seq((1L, "ab"), (2L, "ab"), (3L, "abcdef"), (4L, "abcdef"))
      .toDF("id", "s"))
    val t = Dedup.qgramEditJoin(tiny, "id", "s", 2, 1).as[(Long, Long, Int)].collect().toSet
    assert(t == Set((3L, 4L, 0)))
  }

  test("hll merged registers equal the registers of the union, bit-exact") {
    val a = (1 to 800).map(i => ("g", s"k$i")).toDF("g", "k")
    val b = (500 to 1200).map(i => ("g", s"k$i")).toDF("g", "k")
    val ra = Sketches.hllRegisters(a, Seq("g"), xxhash64(col("k")), p = 8)
    val rb = Sketches.hllRegisters(b, Seq("g"), xxhash64(col("k")), p = 8)
    val merged = Sketches.hllMergeRegisters(ra, rb, Seq("g"))
    val direct = Sketches.hllRegisters(a.unionByName(b), Seq("g"), xxhash64(col("k")), p = 8)
    assert(sortedRows(merged) == sortedRows(direct))
    val eMerged = Sketches.hllEstimate(merged, Seq("g"), p = 8).collect().head.getAs[Double]("hll_est")
    val eDirect = Sketches.hllEstimate(direct, Seq("g"), p = 8).collect().head.getAs[Double]("hll_est")
    assert(eMerged == eDirect, "estimates must agree to the last bit")
  }

  test("count-min artifact merge equals the concatenated build, and refuses shape mismatch") {
    val a = corpus.filter(col("id") <= 200)
    val b = corpus.filter(col("id") > 200)
    val sa = Sketches.buildCountMin(a, array(col("k")), depth = 4, width = 32)
    val sb = Sketches.buildCountMin(b, array(col("k")), depth = 4, width = 32)
    val whole = Sketches.buildCountMin(corpus, array(col("k")), depth = 4, width = 32)
    assert(sa.merge(sb).counts.sameElements(whole.counts))
    intercept[IllegalArgumentException] {
      sa.merge(Sketches.buildCountMin(b, array(col("k")), depth = 2, width = 32))
    }
  }

  test("edit-distance plan evaluates levenshtein exactly once per candidate pair") {
    val df = viaParquet(Seq(
      (1L, "b1", "alpha"), (2L, "b1", "alphb"), (3L, "b1", "gamma")).toDF("id", "blk", "s"))
    val plan = Dedup.editDistanceNearDuplicates(df, "id", "s", Seq("blk"), 1)
    // the project-then-filter spelling inlines the levenshtein into a
    // pushed-down filter and pays the O(len²) DP twice per pair
    assert(PlanChecks.exprOccurrences(plan, "levenshtein") == 1)
  }

  test("count-min inner product over-estimates the exact join size, never under") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val a = Seq.fill(400)(rnd.nextInt(60).toLong).toDF("k")
    val b = Seq.fill(300)(rnd.nextInt(80).toLong).toDF("k")
    val sa = Sketches.buildCountMin(a, array(xxhash64(col("k"))), depth = 4, width = 256)
    val sb = Sketches.buildCountMin(b, array(xxhash64(col("k"))), depth = 4, width = 256)
    val exact = a.groupBy("k").count().as("x")
      .join(b.groupBy("k").count().as("y"), col("x.k") === col("y.k"))
      .agg(sum(col("x.count") * col("y.count"))).head().getLong(0)
    val est = sa.innerProduct(sb)
    assert(est >= exact, s"est $est < exact $exact")
    // self-join: the F2 moment, same one-sided bound
    val exactF2 = a.groupBy("k").count().agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(sa.innerProduct(sa) >= exactF2)
    // wide sketch + few keys: no bucket collisions, the estimate is EXACT
    val tiny = Seq(1L, 1L, 2L, 3L).toDF("k")
    val st = Sketches.buildCountMin(tiny, array(xxhash64(col("k"))), depth = 4, width = 512)
    assert(st.innerProduct(st) == (4L + 1L + 1L)) // 2² + 1² + 1²
  }

  test("count-min inner product refuses mismatched shapes") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("k")
    val s1 = Sketches.buildCountMin(df, array(xxhash64(col("k"))), depth = 4, width = 32)
    val s2 = Sketches.buildCountMin(df, array(xxhash64(col("k"))), depth = 2, width = 32)
    assertThrows[IllegalArgumentException](s1.innerProduct(s2))
  }


  test("misra-gries guaranteed heavy hitters: exact set above N/(k+1), partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 300 hot rows of key 7 + 700 cold rows over ~200 keys: N=1000, k=9 → threshold 100
    val rows = Seq.fill(300)(7L) ++ Seq.fill(700)(100L + rnd.nextInt(200))
    val df = rnd.shuffle(rows).toDF("k")
    val a = graft.operators.Sketches.guaranteedHeavyHitters(df.repartition(1), col("k"), 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = graft.operators.Sketches.guaranteedHeavyHitters(df.repartition(13), col("k"), 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == Set((7L, 300L, 1000L)))
    assert(b == a) // deterministic despite MG's order-dependent counters
  }

  test("misra-gries candidate pass: a key above N/(k+1) always survives the raw summary") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ExprColumn
    // adversarial order: all hot rows FIRST, then a flood of distinct cold
    // keys (each block of 4 misses costs the hot counter one decrement —
    // the exact-bound case: 40 hot vs 160 colds drains to 0, 50 survives)
    val rows = Seq.fill(50)(1L) ++ (1L to 160L).map(_ + 1000L)
    val df = rows.toDF("k").repartition(1) // single partition = pure streaming MG
    val agg = graft.plans.MisraGriesAgg(ExprColumn.expr(col("k")), 4)
    val pairs = df.agg(ExprColumn(agg.toAggregateExpression()).as("mg")).head().getSeq[Long](0)
    val keys = pairs.grouped(2).map(_.head).toSet
    assert(keys.contains(1L)) // 50 > 210/5: the strict MG bound keeps it
    assert(pairs.length <= 8) // at most k (key, cnt) pairs
    assertThrows[IllegalArgumentException](graft.plans.MisraGriesAgg(ExprColumn.expr(col("k")), 0))
  }

  test("misra-gries verify pass drops sub-threshold candidates") {
    import spark.implicits._
    // uniform keys, none above N/(k+1) → empty result
    val df = (1L to 100L).toDF("k")
    assert(graft.operators.Sketches.guaranteedHeavyHitters(df, col("k"), 4).count() == 0)
  }

  test("rank-sample sketch is partitioning-invariant and honors its rank contract") {
    import spark.implicits._
    import graft.operators.Sketches
    val shards = 8
    val step = 16
    // values are a known permutation so exact ranks are arithmetic:
    // v = (k * 37) % 4096 over k = 0..4095 is a bijection → count(v <= x) = x + 1
    val n = 4096L
    val raw = (0L until n).map(k => (k * 37 % 4096, k)).toDF("v", "k")
    val sk = Sketches.rankSampleSketch(raw, "v", col("k"), shards, step)
    // partitioning-invariance: the sketch is a pure function of the multiset
    val sk2 = Sketches.rankSampleSketch(raw.repartition(13), "v", col("k"), shards, step)
    assert(sortedRows(sk) == sortedRows(sk2))
    // total weight bound: each cell drops < step remainder rows
    val wTotal = sk.agg(sum(col("w"))).as[Long].head()
    assert(n - wTotal < shards.toLong * step, s"dropped ${n - wTotal}")
    // rank contract at every decile: t' = least(target, W); the estimate's
    // exact rank brackets the target within shards*step
    val qrow = Sketches.rankSampleQuantiles(sk, n, Seq(10, 30, 50, 70, 90, 99)).head()
    for (p <- Seq(10, 30, 50, 70, 90, 99)) {
      val est = qrow.getAs[Long](s"p$p")
      val target = (n * p + 99) / 100
      val tp = math.min(target, wTotal)
      val exactLe = est + 1 // bijection: count(v <= est) = est + 1
      val exactLt = est
      assert(exactLe >= tp, s"p$p: est=$est exact_le=$exactLe < t'=$tp")
      assert(exactLt < tp + shards * step, s"p$p: est=$est exact_lt=$exactLt over bound")
    }
  }

  test("rank-sample compress halves the sketch and union+compress merges within the doubled bound") {
    import spark.implicits._
    import graft.operators.Sketches
    val shards = 8
    val step = 16
    val n = 4096L
    val raw = (0L until n).map(k => (k * 37 % 4096, k)).toDF("v", "k")
    // two disjoint halves sketched independently (e.g. two ingest days)...
    val a = raw.filter(col("k") < 2048)
    val b = raw.filter(col("k") >= 2048)
    val skA = Sketches.rankSampleSketch(a, "v", col("k"), shards, step)
    val skB = Sketches.rankSampleSketch(b, "v", col("k"), shards, step)
    // ...merged: union then collapse back to roughly the single-sketch size
    val merged = Sketches.rankSampleCompress(skA.unionByName(skB))
    val single = Sketches.rankSampleSketch(raw, "v", col("k"), shards, step)
    val mergedRows = merged.count()
    assert(mergedRows <= single.count() + 1, s"merged $mergedRows rows did not halve")
    // weight is conserved exactly by the collapse
    val wIn = skA.unionByName(skB).agg(sum(col("w"))).as[Long].head()
    assert(merged.agg(sum(col("w"))).as[Long].head() == wIn)
    // merged rank error: each half contributes < shards*step, the collapse
    // absorbs one sample's weight per kept row → < 2*shards*step + 2*step
    val bound = 2L * shards * step + 2L * step
    val wTotal = wIn
    val qrow = Sketches.rankSampleQuantiles(merged, n, Seq(25, 50, 75)).head()
    for (p <- Seq(25, 50, 75)) {
      val est = qrow.getAs[Long](s"p$p")
      val target = (n * p + 99) / 100
      val tp = math.min(target, wTotal)
      assert(est + 1 >= tp - bound && est < tp + bound,
        s"p$p: est=$est (exact rank ${est + 1}) outside [$tp - $bound, $tp + $bound)")
    }
    // odd-count collapse keeps the unpaired last sample (weight conserved)
    val odd = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("v", "w")
    val collapsed = Sketches.rankSampleCompress(odd).orderBy("v").as[(Long, Long)].collect()
    assert(collapsed.toSeq == Seq((2L, 8L), (3L, 4L)))
  }

}
