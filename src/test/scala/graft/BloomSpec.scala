package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.plans.{BloomBuildAgg, BloomContains, BloomHash, PlanChecks}
import graft.text.Dedup

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildBits(keys: Seq[Long], numBits: Long, k: Int, partitions: Int): Array[Long] = {
    val df = keys.toDF("k").repartition(partitions)
    val agg = BloomBuildAgg(ExprColumn.expr(col("k")), numBits, k)
    df.agg(ExprColumn(agg.toAggregateExpression()).as("bits"))
      .head().getSeq[Long](0).toArray
  }

  test("bloom build: never a false negative; fpp sane at the design point") {
    val rnd = new scala.util.Random(11)
    val members = Seq.fill(1000)(rnd.nextLong()).distinct
    val bits = buildBits(members, 1L << 14, 5, 4) // ~16 bits/key
    members.foreach(m => assert(BloomHash.contains(bits, m, 5), s"false negative for $m"))
    val nonMembers = Seq.fill(20000)(rnd.nextLong()).filterNot(members.toSet)
    val fp = nonMembers.count(BloomHash.contains(bits, _, 5))
    val fpp = fp.toDouble / nonMembers.size
    assert(fpp < 0.01, s"fpp $fpp too high for 16 bits/key, k=5") // theory ~5e-4
  }

  test("bloom merge: partition count does not change the filter") {
    val keys = (1L to 500L).map(i => i * 0x9E3779B97F4A7C15L)
    val one = buildBits(keys, 1L << 12, 4, 1)
    val many = buildBits(keys, 1L << 12, 4, 8)
    assert(one.toSeq == many.toSeq)
  }

  test("bloom probe: interpreted eval equals the codegen DataFrame path; NULL key yields NULL") {
    val rnd = new scala.util.Random(23)
    val members = Seq.fill(300)(rnd.nextLong())
    val bits = buildBits(members, 1L << 10, 3, 2) // small: real true/false mix
    val probes = members.take(50) ++ Seq.fill(200)(rnd.nextLong())
    val viaDf = probes.toDF("k")
      .select(col("k"), ExprColumn(BloomContains(ExprColumn.expr(col("k")), bits, 3)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      val interp = BloomContains(
        org.apache.spark.sql.catalyst.expressions.Literal(p), bits, 3).eval(null)
      assert(interp == viaDf(p), s"interpreted != codegen for $p")
    }
    val nullOut = Seq[Option[Long]](None).toDF("k")
      .select(ExprColumn(BloomContains(ExprColumn.expr(col("k")), bits, 3)).as("c"))
      .head()
    assert(nullOut.isNullAt(0))
  }

  test("bloomScreen is EXACT even when the filter saturates (every probe a false positive)") {
    val existing = (0L until 200L).map(i => (i, s"doc body number $i end")).toDF("doc_id", "text")
    val batch = (0L until 300L).map { i =>
      // 0..99 duplicate existing docs 0..99; 100..299 novel
      if (i < 100) (i + 5000, s"doc body number $i end")
      else (i + 5000, s"fresh content $i never seen")
    }.toDF("doc_id", "text")
    // 64 bits for 200 keys: filter is saturated, everything Bloom-positive —
    // the exact-verification joins must still produce the exact answer
    val out = Dedup.bloomScreen(batch, existing, "doc_id", "text", numBits = 64, numHashFuncs = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == (100L until 300L).map(_ + 5000))
  }

  test("bloomScreen plan: both verification joins broadcast; probe evaluated once") {
    val existing = (0L until 50L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val batch = (0L until 20L).map(i => (i + 900, s"text $i plus")).toDF("doc_id", "text")
    val out = Dedup.bloomScreen(batch, existing, "doc_id", "text", numBits = 1 << 12)
    assert(PlanChecks.broadcastJoinCount(out) == 2,
      "candidate-confirm semi join and final anti join must both broadcast the small side")
    assert(PlanChecks.exprOccurrences(out, "bloom_contains") == 1,
      "the Bloom probe (and the fingerprint pipeline under it) must not be duplicated by pushdown")
    val planText = out.queryExecution.executedPlan.toString
    assert(!planText.contains("SortMergeJoin"), "no shuffle join anywhere in the screen")
  }

  test("buildTextBloom fingerprints match dropExactDuplicates' identity (normalize + xxhash64)") {
    val df = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"), // normalizes identically to doc 1
      (3L, "something else")).toDF("doc_id", "text")
    val art = Dedup.buildTextBloom(df, "text", numBits = 1 << 10, numHashFuncs = 3)
    assert(art.numHashFuncs == 3, "the artifact must carry its probe parameter")
    val keys = df.select(xxhash64(
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "), "\\s+", " "))))
      .as[Long].collect()
    assert(keys(0) == keys(1), "normalization must collapse the two spellings")
    keys.foreach(k => assert(BloomHash.contains(art.bits, k, 3)))
  }

  test("a prebuilt artifact screens with ITS k, not the call-site default (no false negatives)") {
    val existing = (0L until 100L).map(i => (i, s"existing text $i")).toDF("doc_id", "text")
    val batch = (0L until 100L).map(i => (i + 900, s"existing text $i")).toDF("doc_id", "text")
    // build with k=2; the bloomScreen call site leaves numHashFuncs at its
    // default 5 — probing with 5 would false-negative every key and leak
    // all 100 duplicates through as "novel"
    val art = Dedup.buildTextBloom(existing, "text", numBits = 1 << 14, numHashFuncs = 2)
    val out = Dedup.bloomScreen(batch, existing, "doc_id", "text", prebuilt = Some(art))
    assert(out.count() == 0, "every batch row duplicates an existing doc and must drop")
  }

  test("bloomPrunedJoin equals the plain join and prunes non-matching fact rows map-side") {
    import spark.implicits._
    val fact = (1L to 1000L).map(i => (i % 50, i)).toDF("fk", "payload")
    val dim = Seq((3L, "a"), (7L, "b"), (11L, "c")).toDF("dk", "name")
    val viaBloom = graft.operators.RuntimeFilter.bloomPrunedJoin(fact, dim, "fk", "dk")
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(sortedRows(viaBloom) == sortedRows(plain))
    assert(viaBloom.count() == 60) // 3 matching keys × 20 rows each
    // empty dim: the filter rejects everything, join result empty
    val none = graft.operators.RuntimeFilter.bloomPrunedJoin(
      fact, dim.filter(col("dk") < 0), "fk", "dk")
    assert(none.count() == 0)
  }

  test("bloomPrunedJoin widens mismatched integral key types instead of false-negating") {
    import spark.implicits._
    // xxhash64 is type-sensitive: INT 7 and BIGINT 7 hash differently, so
    // without the common-type widening every probe would miss (false
    // negative) and the join would silently return 0 rows
    val fact = (1 to 100).map(i => (i % 10, i)).toDF("fk", "payload") // fk: INT
    val dim = Seq((3L, "a"), (7L, "b")).toDF("dk", "name") // dk: BIGINT
    val viaBloom = graft.operators.RuntimeFilter.bloomPrunedJoin(fact, dim, "fk", "dk")
    assert(viaBloom.count() == 20) // 2 matching keys × 10 rows each
    // non-integral mismatch refuses rather than risking silent drops
    val sdim = Seq(("3", "a")).toDF("dk", "name")
    assertThrows[IllegalArgumentException](
      graft.operators.RuntimeFilter.bloomPrunedJoin(fact, sdim, "fk", "dk"))
  }

}
