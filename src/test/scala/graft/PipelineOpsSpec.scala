package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Incremental}
import graft.text.{Dedup, Sampling}

/** Round-7 pipeline operators: CDC merge-apply, systematic PPS sampling,
  * small-file compaction, b-bit minhash, incremental refresh. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cdc applyChanges: upsert/delete/last-write-wins semantics") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "seg", "bal")
    val changes = Seq(
      (2L, "U", "b2", 21.0, 1L), // update existing
      (2L, "U", "b3", 22.0, 2L), // later write wins
      (3L, "D", null, 0.0, 1L), // delete existing
      (4L, "I", "d", 40.0, 1L), // insert new
      (5L, "D", null, 0.0, 1L), // delete of absent key: no-op
      (6L, "I", "e", 50.0, 1L), // insert then delete: gone
      (6L, "D", null, 0.0, 2L))
      .toDF("k", "op", "seg", "bal", "seqno")
    val out = Cdc.applyChanges(base, changes, Seq("k"), "op", Seq(col("seqno")))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b3", 22.0), (4L, "d", 40.0)))
  }

  test("ppsSystematic: hand-checked picks, multiplicity sums to k") {
    // weights 1,2,3,4 in id order, T=10, k=2 → points 2.5, 7.5 → rows 2 and 4
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "w")
    val got = Sampling.ppsSystematic(df, "w", 2, Seq(col("id")))
      .select(col("id"), col("multiplicity")).as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 4L -> 1L))
    // heavy row picked multiple times; total multiplicity is exactly k
    val heavy = Seq((1L, 8L), (2L, 1L), (3L, 1L)).toDF("id", "w")
    val h = Sampling.ppsSystematic(heavy, "w", 5, Seq(col("id")))
      .select(col("id"), col("multiplicity")).as[(Long, Long)].collect().toMap
    assert(h == Map(1L -> 4L, 3L -> 1L))
    // property: sum(multiplicity) == k on real data for several k
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("n_chars") > 0)
    for (k <- Seq(1, 7, 100)) {
      val total = Sampling.ppsSystematic(docs, "n_chars", k, Seq(col("doc_id")))
        .agg(sum("multiplicity")).as[Long].head()
      assert(total == k, s"k=$k")
    }
  }

  test("compactFiles: rewrites to the byte-targeted count, content identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.sources.Writers.parquet(docs.repartition(13), base)
    def files() = new java.io.File(base).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files() == 13)
    val before = docs.orderBy("doc_id").collect().toSeq
    graft.sources.Writers.compactFiles(spark, base, targetFileBytes = 1L << 30)
    assert(files() == 1) // total bytes far below 1 GiB → single file
    val after = spark.read.parquet(base).orderBy("doc_id").collect().toSeq
    assert(after == before)
  }

  test("b-bit minhash: identical docs estimate exactly 1.0, estimate bounded") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines at scale"))
      .toDF("id", "text")
    val sigs = Dedup.minhashSignaturesFromShingles(
      Dedup.shingleSets(d, "id", "text", 3), "id", 16)
    val b = Dedup.bbitCompress(sigs, "id", 16, 8)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val est = Dedup.bbitEstimate(b, pairs, "id", 16, 8)
      .select(col("id2"), col("matches"), col("jaccard_est"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(est(2L) == ((16L, 1.0)))
    assert(est(3L)._1 < 16L && est(3L)._2 < 1.0)
  }

  test("tvd drift: hand-checked numerator, identical snapshots score zero") {
    import graft.operators.Drift
    // group g: a = {b0:2, b1:2} (N=4), b = {b0:1, b1:3} (N=4)
    // tvd_num = |2*4-1*4| + |2*4-3*4| = 4 + 4 = 8 → TVD = 8/(2*16) = 0.25
    val a = Seq(("g", 0L), ("g", 0L), ("g", 1L), ("g", 1L)).toDF("k", "bucket")
    val b = Seq(("g", 0L), ("g", 1L), ("g", 1L), ("g", 1L)).toDF("k", "bucket")
    val got = Drift.tvdNumerator(a, b, Seq("k"), "bucket")
      .as[(String, Long, Long, Long)].head()
    assert(got == (("g", 4L, 4L, 8L)))
    // identical distributions → zero numerator
    val same = Drift.tvdNumerator(a, a, Seq("k"), "bucket")
      .as[(String, Long, Long, Long)].head()
    assert(same._4 == 0L)
    // bucket present on one side only still counts
    val c = Seq(("g", 9L)).toDF("k", "bucket")
    val oneSided = Drift.tvdNumerator(a, c, Seq("k"), "bucket")
      .as[(String, Long, Long, Long)].head()
    // |2*1-0*4| + |2*1-0*4| + |0*1-1*4| = 2+2+4 = 8 → TVD = 8/(2*4*1) = 1
    assert(oneSided == (("g", 4L, 1L, 8L)))
    // a GROUP present in only one snapshot must NOT read as "no drift":
    // the raw formula degenerates to 0/0, so the operator emits the
    // nonzero side's total (TVD = ½ under the guarded denominator)
    val other = Seq(("h", 0L)).toDF("k", "bucket")
    val groups = Drift.tvdNumerator(a, other, Seq("k"), "bucket")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(groups("g") == (("g", 4L, 0L, 4L)), "vanished group scores its own mass")
    assert(groups("h") == (("h", 0L, 1L, 1L)), "appeared group scores its own mass")
  }

  test("corpusSimilarity: identical groups estimate 1.0 and jaccard 1.0") {
    val docs = Seq(
      ("A", "alpha beta gamma delta epsilon zeta"),
      ("B", "alpha beta gamma delta epsilon zeta"),
      ("C", "one two three four five six seven"))
      .toDF("source", "text")
    val m = Dedup.corpusSimilarity(docs, "source", "text", 16, 3)
      .select(col("g1"), col("g2"), col("matches"), col("jaccard_est"), col("jaccard"))
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(m(("A", "B")) == ((16L, 1.0, 1.0)))
    assert(m(("A", "C"))._1 < 16L && m(("A", "C"))._3 == 0.0)
    assert(m.size == 3) // zero-overlap pairs included, not dropped
  }

  test("incremental refresh: only changed partitions recompute, result equals full") {
    val prev = Seq(
      ("d1", 1L, 1.0), ("d1", 2L, 2.0), ("d2", 3L, 3.0), ("d3", 4L, 4.0))
      .toDF("day", "id", "value")
    val next = prev.withColumn("value",
      when(col("day") === "d2", col("value") + 10).otherwise(col("value")))
    val fp = (df: org.apache.spark.sql.DataFrame) =>
      Incremental.partitionFingerprints(df, Seq("day"), Seq("id", "value"))
    val changed = Incremental.changedPartitions(fp(prev), fp(next), Seq("day"))
    assert(changed.as[String].collect().toSeq == Seq("d2"))
    val derive = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("day").agg(sum(col("value").cast("long")).as("s"))
    val got = Incremental.refresh(derive(prev), next, changed, Seq("day"), derive)
      .orderBy("day").as[(String, Long)].collect().toSeq
    val full = derive(next).orderBy("day").as[(String, Long)].collect().toSeq
    assert(got == full)
    // the count column closes xor's even-multiplicity blind spot: a row
    // duplicated twice keeps the fingerprint but changes n
    val dup = next.union(next.filter(col("day") === "d3"))
    val changed2 = Incremental.changedPartitions(fp(next), fp(dup), Seq("day"))
    assert(changed2.as[String].collect().toSeq == Seq("d3"))
    // a partition present on only one side is changed
    val dropped = next.filter(col("day") =!= "d1")
    val changed3 = Incremental.changedPartitions(fp(next), fp(dropped), Seq("day"))
    assert(changed3.as[String].collect().toSeq == Seq("d1"))
  }

  test("partition fingerprints see a value shifting between columns across NULL") {
    // Spark's hash skips NULL args, so without per-column null sentinels
    // ('x', NULL) and (NULL, 'x') would fingerprint identically
    val fpOf = (rows: Seq[(String, Option[String], Option[String])]) =>
      Incremental.partitionFingerprints(
        rows.toDF("day", "a", "b"), Seq("day"), Seq("a", "b"))
    val prev = fpOf(Seq(("d1", Some("x"), None)))
    val next = fpOf(Seq(("d1", None, Some("x"))))
    val changed = Incremental.changedPartitions(prev, next, Seq("day"))
    assert(changed.as[String].collect().toSeq == Seq("d1"),
      "null-shifted value must change the fingerprint")
  }

  test("acf: alternating series scores the hand-computed ±lags; constant series is NULL") {
    import graft.operators.Drift
    // x = 1,0,1,0,1,0,1,0 over days 0..7: n=8, S=4, dev=±4, den=128
    // num(1) = 7·(−16) = −112 → −875000 ppm; num(2) = 6·16 = 96 → 750000
    val alt = (0L to 7L).map(d => ("a", d, (1 - d % 2)))
    val const = (0L to 7L).map(d => ("c", d, 3L))
    val df = viaParquet((alt ++ const).toDF("k", "day", "x"))
    val out = Drift.autocorrelation(df, Seq("k"), "day", "x", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(out(("a", 1L)) == ((8L, Some(-875000L))))
    assert(out(("a", 2L)) == ((8L, Some(750000L))))
    assert(out(("c", 1L)) == ((8L, None))) // den = 0 → undefined, not 0
  }

  test("acf densifies gaps as zeros on the global spine") {
    import graft.operators.Drift
    // days 0,1,3 present; day 2 missing → series 2,2,0,2 (n=4, S=6)
    // dev = 4x−6 = (2,2,−6,2); den = 48; num(1) = 4 −12 −12 = −20 →
    // sign-magnitude: −((20e6) div 48) = −416666 (truncates the magnitude)
    val df = viaParquet(Seq(("g", 0L, 2L), ("g", 1L, 2L), ("g", 3L, 2L))
      .toDF("k", "day", "x"))
    val out = Drift.autocorrelation(df, Seq("k"), "day", "x", maxLag = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(out == ((4L, -416666L)))
  }

  test("waterFill: hand-computed caps — clipping, keep-all, zero and surplus budgets") {
    import graft.text.Sampling
    val c = viaParquet(Seq(("a", 10L), ("b", 100L), ("c", 1000L)).toDF("src", "n"))
    def run(b: Long) = Sampling.waterFillAllocation(c, "src", "n", b)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // B=200: a keeps 10; cap solves 10 + 2c = 200 → c = 95
    val m = run(200L)
    assert(m("a") == ((10L, 95L, 10L)) && m("b") == ((100L, 95L, 95L))
      && m("c") == ((1000L, 95L, 95L)))
    // B=60: 10 + 2c ≤ 60 → c = 25; a keeps all
    assert(run(60L).values.map(_._3).sum == 60L)
    // surplus budget: everything allocates, cap = max n
    val full = run(5000L)
    assert(full.values.map(_._3).toSeq.sorted == Seq(10L, 100L, 1000L) &&
      full("a")._2 == 1000L)
    // starvation: B < k → cap 0, nothing allocates
    assert(run(2L).values.forall(_._3 == 0L))
    // feasibility property on fuzzed inputs: Σ alloc ≤ B always, and the
    // cap is maximal (cap+1 would overshoot) whenever something is clipped
    val rnd = new scala.util.Random(9)
    val big = viaParquet((1 to 40).map(i => (s"s$i", rnd.nextInt(5000).toLong + 1))
      .toDF("src", "n"))
    for (b <- Seq(1000L, 17000L, 60000L)) {
      val rows = Sampling.waterFillAllocation(big, "src", "n", b)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val (ns, cap, allocs) = (rows.map(_._1), rows.head._2, rows.map(_._3))
      assert(allocs.sum <= b)
      if (ns.exists(_ > cap))
        assert(ns.map(n => math.min(n, cap + 1)).sum > b, s"cap $cap not maximal at B=$b")
    }
    intercept[IllegalArgumentException](Sampling.waterFillAllocation(c, "src", "n", -1L))
  }

  test("benford: hand-computed digits, exclusions reported, absent digits zero-filled") {
    import graft.operators.Drift
    val df = viaParquet(Seq(1L, 19L, 23L, 250L, 3L, 999L, 0L, -5L).toDF("x"))
    val out = Drift.benfordProfile(df, col("x"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    // digits over the 6 positive rows: 1,1,2,2,3,9; 0 and −5 excluded
    assert(out(1L) == ((2L, 333333L, math.abs(2000000L - 301029L * 6))))
    assert(out(2L)._1 == 2L && out(3L)._1 == 1L && out(9L)._1 == 1L)
    assert(out(4L) == ((0L, 0L, 96910L * 6))) // absent digit zero-fills
    assert(out(0L)._1 == 2L) // the excluded-row report
    assert(out.size == 10)
  }

  test("acf is partitioning-invariant and refuses bad lags") {
    import graft.operators.Drift
    val rnd = new scala.util.Random(3)
    val df = viaParquet((0 until 200).map(i =>
      (s"k${i % 3}", (i / 3).toLong, rnd.nextInt(50).toLong)).toDF("k", "day", "x"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Drift.autocorrelation(d, Seq("k"), "day", "x", 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(run(df.repartition(1)) == run(df.repartition(9, col("day"))))
    intercept[IllegalArgumentException](Drift.autocorrelation(df, Seq("k"), "day", "x", 0))
    intercept[IllegalArgumentException](Drift.autocorrelation(df, Nil, "day", "x", 1))
  }
}
