package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, History, Validation}
import graft.text.ApssJoin

/** APSS cosine pairs, degree-oriented triangle counting, SCD2 run
  * compression, and the expectations report (q128/q129/q131/q133). */
class ApssHistorySpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- APSS

  test("cosinePairs matches hand-computed integer cosine at n=1") {
    val docs = Seq(
      (1L, "a a b"), // v={a:2,b:1}, |v|²=5
      (2L, "a a b"), // identical → cos=1
      (3L, "a c"), // v={a:1,c:1}, |v|²=2; dot(1,3)=2 → cos²=4/10
      (4L, "d d d") // disjoint from all
    ).toDF("id", "text")
    // threshold 3/5: pair(1,3) has 25·4=100 ≥ 9·10=90 → kept
    val got = ApssJoin.cosinePairs(docs, "id", "text", n = 1, minCosNum = 3L, minCosDen = 5L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5L, 5L, 5L), (1L, 3L, 2L, 5L, 2L), (2L, 3L, 2L, 5L, 2L)))
    // threshold 4/5: 100 < 16·10 → only the identical pair survives
    val tight = ApssJoin.cosinePairs(docs, "id", "text", n = 1, minCosNum = 4L, minCosDen = 5L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(tight == Set((1L, 2L, 5L, 5L, 5L)))
  }

  test("cosinePairs dfCap drops stop-grams from vectors and norms") {
    // "x" appears in all 3 docs; cap=2 removes it entirely, leaving doc 3
    // with an empty vector and docs 1,2 identical on {y}
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("id", "text")
    val got = ApssJoin.cosinePairs(docs, "id", "text", n = 1, minCosNum = 1L, minCosDen = 2L, dfCap = 2L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L, 1L, 1L)))
  }

  test("cosinePairs short documents collapse to one whole-text gram") {
    // 2 tokens < n=3 → single gram = the joined text (wordShinglesFromTokens contract)
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "p r")).toDF("id", "text")
    val got = ApssJoin.cosinePairs(docs, "id", "text", n = 3, minCosNum = 9L, minCosDen = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L, 1L, 1L))) // "p q" == "p q"; "p r" shares nothing
  }

  test("prefix filter keeps exact recall and drops a saturating stop-gram from the index") {
    // every doc contains the stop-gram "the" (df = n+1) once plus a rare
    // gram nine times; doc 1000 duplicates doc 1. Unfiltered, the index
    // join fans out df² ≈ n² candidate rows on "the"; the prefix filter
    // must drop every "the" posting from the INDEX side while still
    // finding the (1, 1000) duplicate pair — exact recall.
    val n = 60
    val docs = ((1 to n).map(i => (i.toLong, s"the ${(s"w$i " * 9).trim}")) ++
      Seq((1000L, s"the ${("w1 " * 9).trim}"))).toDF("id", "text")
    val full = ApssJoin.gramVectors(docs, "id", "text", 1, 1000L).cache()
    try {
      // per doc: {the: 1, w_i: 9}, norm2 = 82; skip while csum·25 < 16·82
      // in DESC-df order: "the" first (csum=1, 25 < 1312 → skipped);
      // w_i (csum=82, 2050 ≥ 1312 → indexed).
      val idx = ApssJoin.prefixIndex(full, "id", 4L, 5L)
      assert(idx.count() == n.toLong + 1, "index must hold exactly the rare-gram postings")
      assert(idx.filter(col("gram") === xxhash64(lit("the"))).count() == 0,
        "stop-gram postings must drop out of the index")
      val got = ApssJoin.cosinePairs(docs, "id", "text", n = 1, minCosNum = 4L, minCosDen = 5L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1000L, 82L, 82L, 82L)),
        "the duplicate pair must survive prefix filtering")
    } finally full.unpersist()
  }

  test("prefix filter output identical to exhaustive join on a near-dup corpus") {
    // near-dup docs share the heavy grams; the prefix filter must still
    // find every qualifying pair (recall proof exercised end-to-end).
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "alpha beta gamma delta alpha zeta"),
      (3L, "alpha beta gamma delta alpha beta"), // identical to 1
      (4L, "omega psi chi phi upsilon tau"),
      (5L, "omega psi chi phi upsilon tau omega")
    ).toDF("id", "text")
    for ((num, den) <- Seq((1L, 2L), (4L, 5L), (9L, 10L), (1L, 1L))) {
      val got = ApssJoin.cosinePairs(docs, "id", "text", n = 1, minCosNum = num, minCosDen = den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // brute-force reference over the same integer vectors
      val vecs = ApssJoin.gramVectors(docs, "id", "text", 1, 1000L)
        .as[(Long, Long, Long, Long)].collect() // (gram, id, tf, df)
        .groupBy(_._2).view.mapValues(_.map(r => (r._1, r._3)).toMap).toMap
      val expected = (for {
        a <- vecs.keys; b <- vecs.keys; if a < b
        va = vecs(a); vb = vecs(b)
        dot = va.keysIterator.map(g => va(g) * vb.getOrElse(g, 0L)).sum
        n2a = va.valuesIterator.map(x => x * x).sum
        n2b = vb.valuesIterator.map(x => x * x).sum
        if den * den * dot * dot >= num * num * n2a * n2b
      } yield (a, b, dot, n2a, n2b)).toSet
      assert(got == expected, s"threshold $num/$den")
    }
  }

  test("prefix filter equals brute force on fuzzed corpora") {
    // randomized recall check: small vocab forces heavy gram sharing, so
    // the prefix filter actually skips postings; every output must still
    // equal the driver-side brute-force cosine over the same vectors
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val docs = (1 to 40).map { i =>
        val len = rng.nextInt(12) // includes empty documents
        (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.toDF("id", "text")
      val (num, den) = Seq((1L, 2L), (4L, 5L), (7L, 10L))(trial - 1)
      val got = ApssJoin.cosinePairs(docs, "id", "text", n = 1, minCosNum = num, minCosDen = den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val vecs = ApssJoin.gramVectors(docs, "id", "text", 1, 1000L)
        .as[(Long, Long, Long, Long)].collect() // (gram, id, tf, df)
        .groupBy(_._2).view.mapValues(_.map(r => (r._1, r._3)).toMap).toMap
      val expected = (for {
        a <- vecs.keys; b <- vecs.keys; if a < b
        va = vecs(a); vb = vecs(b)
        dot = va.keysIterator.map(g => va(g) * vb.getOrElse(g, 0L)).sum
        n2a = va.valuesIterator.map(x => x * x).sum
        n2b = vb.valuesIterator.map(x => x * x).sum
        if den * den * dot * dot >= num * num * n2a * n2b
      } yield (a, b, dot, n2a, n2b)).toSet
      assert(got == expected, s"trial $trial threshold $num/$den")
    }
  }

  test("cosinePairs refuses degenerate thresholds") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException](ApssJoin.cosinePairs(docs, "id", "text", minCosNum = 0L))
    intercept[IllegalArgumentException](ApssJoin.cosinePairs(docs, "id", "text", minCosNum = 6L, minCosDen = 5L))
  }

  // -------------------------------------------------------- triangles

  test("triangleCount on K4 is 4 and ignores direction/duplicates/loops") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L; if a != b) yield (a, b)
    val edges = (k4 ++ Seq((0L, 0L), (1L, 2L))).toDF("src", "dst")
    assert(Graph.triangleCount(edges).as[Long].head() == 4L)
  }

  test("triangleCount matches a brute-force driver count on a fuzzed graph") {
    val rng = new scala.util.Random(7)
    val n = 40
    val edgeSet = (1 to 260).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val expected = {
      val s = edgeSet.toSet
      (for {
        a <- 0L until n.toLong
        b <- a + 1 until n.toLong
        c <- b + 1 until n.toLong
        if s((a, b)) && s((b, c)) && s((a, c))
      } yield 1).size.toLong
    }
    val got = Graph.triangleCount(viaParquet(edgeSet.toDF("src", "dst"))).as[Long].head()
    assert(got == expected)
  }

  // ------------------------------------------------------------- SCD2

  test("scd2 compresses runs into validity intervals") {
    val obs = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 10L, "x")
    ).toDF("k", "ts", "v")
    val got = History.scd2(obs, Seq("k"), "ts", "v")
      .select("k", "v", "valid_from", "valid_to", "n_observations")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, Some(30L), 2L),
      (1L, "b", 30L, Some(40L), 1L),
      (1L, "a", 40L, None, 1L), // same value resurfacing is a NEW interval
      (2L, "x", 10L, None, 1L)))
  }

  test("scd2 treats NULL as a real state and runs on ONE exchange") {
    val obs = Seq(
      (1L, 1L, Some("a")), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some("a"))
    ).toDF("k", "ts", "v")
    val got = History.scd2(obs, Seq("k"), "ts", "v")
      .select("k", "v", "valid_from", "valid_to", "n_observations")
      .as[(Long, Option[String], Long, Option[Long], Long)].collect().toSet
    assert(got == Set(
      (1L, Some("a"), 1L, Some(2L), 1L),
      (1L, None, 2L, Some(4L), 2L),
      (1L, Some("a"), 4L, None, 1L)))
    // all three windows + the island collapse share the partitionBy(k)
    // hash exchange (subset-partitioning satisfies the wider clusterings)
    val plan = History.scd2(viaParquet(obs), Seq("k"), "ts", "v")
    assert(graft.plans.PlanChecks.shuffleCount(plan) == 1,
      "scd2 must reuse one partitionBy(key) exchange end to end")
  }

  // ----------------------------------------------------- expectations

  test("expectationsReport counts every rule class correctly, in rule order") {
    val df = Seq(
      (Some(1L), Some("A"), 0.5, 1L),
      (Some(1L), Some("A"), 1.5, 2L), // dup key (with row 1), range violation
      (None, Some("B"), 0.2, 3L), // null key, bad domain
      (Some(2L), None, -0.1, 9L) // range violation, ref violation (9 ∉ ref)
    ).toDF("k", "flag", "x", "ref_k")
    val ref = Seq(1L, 2L, 3L).toDF("id")
    val got = Validation.expectationsReport(df, Seq(
      Validation.ExpectNotNull("k_not_null", Seq("k")),
      Validation.ExpectAcceptedValues("flag_domain", "flag", Seq("A")),
      Validation.ExpectRange("x_range", "x", 0.0, 1.0),
      Validation.ExpectUnique("k_unique", Seq("k")),
      Validation.ExpectReferential("ref_exists", "ref_k", ref, "id")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("k_not_null", 1L),
      ("flag_domain", 1L), // NULL flag is not a domain violation
      ("x_range", 2L),
      ("k_unique", 1L), // 4 rows, 3 distinct keys (NULL is a key value)
      ("ref_exists", 1L)))
  }

  test("expectationsReport fuses row rules into one scan and refuses duplicates") {
    val df = viaParquet(Seq((1L, 2.0)).toDF("a", "b"))
    val report = Validation.expectationsReport(df, Seq(
      Validation.ExpectNotNull("r1", Seq("a")),
      Validation.ExpectRange("r2", "b", 0.0, 1.0),
      Validation.ExpectAcceptedValues("r3", "a", Seq("1"))))
    // one file scan feeds all three row rules
    val scans = graft.plans.PlanChecks.flatten(report)
      .count(_.getClass.getSimpleName.contains("FileSourceScan"))
    assert(scans == 1, s"row rules must fuse into one scan, saw $scans")
    intercept[IllegalArgumentException] {
      Validation.expectationsReport(df, Seq(
        Validation.ExpectNotNull("dup", Seq("a")),
        Validation.ExpectNotNull("dup", Seq("a"))))
    }
  }
}
