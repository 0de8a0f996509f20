package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityChecks
import graft.operators.QualityChecks._
import graft.plans.PlanChecks

/** One-pass declarative quality-suite contracts: exact metrics on a frame
  * with known defects, the single-scan plan property, NULL-predicate
  * semantics, and suite refusals. */
class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private def frame = viaParquet(Seq(
    (1L, Some("a"), 5.0),
    (2L, Some("b"), 15.0),
    (2L, None, 25.0), // duplicate id, null name
    (3L, Some("c"), -1.0) // bound violation
  ).toDF("id", "name", "v"))

  test("metrics and verdicts are exact on known defects") {
    val out = QualityChecks.verify(frame, Seq(
      Completeness("comp", "name", 3L, 4L),
      Uniqueness("uniq", col("id"), 1L, 1L),
      Satisfies("bounds", col("v") >= 0.0, 9L, 10L),
      MinSize("size", 4L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("comp", 3L, 4L, 750000L, true), // 3/4 ≥ 3/4
      ("uniq", 3L, 4L, 750000L, false), // 3 distinct of 4
      ("bounds", 3L, 4L, 750000L, false), // 3/4 < 9/10
      ("size", 4L, 1L, 4000000L, true)))
  }

  test("a NULL predicate row counts as a violation, not a pass") {
    val df = viaParquet(Seq((1L, Some(2.0)), (2L, None)).toDF("id", "v"))
    val out = QualityChecks.verify(df, Seq(Satisfies("p", col("v") > 0.0, 1L, 1L)))
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getBoolean(4)) == ((1L, 2L, false)))
  }

  test("the whole suite compiles to one scan of the input") {
    val suite = Seq(
      Completeness("comp", "name", 1L, 1L),
      Satisfies("bounds", col("v") >= 0.0, 1L, 1L),
      Uniqueness("uniq", col("id"), 1L, 1L),
      MinSize("size", 1L))
    val out = QualityChecks.verify(frame, suite)
    out.collect()
    assert(PlanChecks.scanColumns(out).size == 1,
      "a quality suite must audit the table in a single pass, not one job per check")
  }

  test("fdViolations: holds/violations exact, NULL rhs is a value, one scan") {
    import graft.operators.TableStats
    val df = viaParquet(Seq(
      (1L, "x", Some("p")),
      (2L, "x", Some("p")), // a=x maps only to p so far
      (3L, "x", None), // …but also to NULL → a->c violates
      (4L, "y", Some("q")),
      (5L, "y", Some("q"))).toDF("id", "a", "c"))
    val out = TableStats.fdViolations(df, Seq("id", "a", "c"))
    out.collect() // settle the plan for the scan assertion
    val m = out.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(m("id->a") == ((5L, 0L, true))) // id is the key
    assert(m("a->c") == ((2L, 1L, false))) // x → {p, NULL}: NULL is a value
    assert(m("a->id") == ((2L, 2L, false)))
    assert(m("c->a") == ((3L, 0L, true))) // p→x, q→y, NULL→x
    assert(graft.plans.PlanChecks.scanColumns(out).size == 1,
      "all FD pairs must audit in one pass")
    intercept[IllegalArgumentException](TableStats.fdViolations(df, Seq("id")))
  }

  test("encodingPlan: exact cost models, NULL as 0-byte dict entry, code-width edges") {
    import graft.operators.TableStats
    // lowcard: dictionary wins. 100 rows over {"aaaa","bbbb"} (4 bytes each):
    //   plain = 400; dict = 8 values + (100·1 bit + 7) div 8 = 13 → 21.
    val df = viaParquet(
      (0 until 100).map(i => if (i % 2 == 0) "aaaa" else "bbbb").toDF("lowcard"))
    val low = TableStats.encodingPlan(df, Seq("lowcard")).collect().head
    assert((low.getLong(1), low.getLong(2), low.getLong(3), low.getLong(4), low.getBoolean(5)) ==
      ((100L, 2L, 400L, 21L, true)))

    val nulls = viaParquet(Seq(Some("ab"), Some("ab"), Some("ab"), None, None).toDF("v"))
    val nr = TableStats.encodingPlan(nulls, Seq("v")).collect().head
    assert((nr.getLong(1), nr.getLong(2), nr.getLong(3), nr.getLong(4), nr.getBoolean(5)) ==
      ((5L, 2L, 6L, 3L, true)))

    // all-distinct stringified key: dictionary must lose (dict ⊇ plain + codes).
    val key = viaParquet((0 until 64).map(i => f"k$i%04d").toDF("k"))
    val kr = TableStats.encodingPlan(key, Seq("k")).collect().head
    assert((kr.getLong(1), kr.getLong(2), kr.getLong(3)) == ((64L, 64L, 320L)))
    assert(kr.getLong(4) == 320L + (64L * 6L + 7L) / 8L && !kr.getBoolean(5))

    // code-width edges: ndv ∈ {1,2,3,256,257} → bits {0,1,2,8,9}.
    for ((ndv, bits) <- Seq(1 -> 0L, 2 -> 1L, 3 -> 2L, 256 -> 8L, 257 -> 9L)) {
      val vals = viaParquet((0 until ndv).map(i => f"$i%03d").toDF("v"))
      val r = TableStats.encodingPlan(vals, Seq("v")).collect().head
      val n = ndv.toLong
      assert(r.getLong(2) == n, s"ndv=$ndv")
      assert(r.getLong(4) == 3L * n + (n * bits + 7L) / 8L,
        s"ndv=$ndv expects $bits-bit codes")
    }
    intercept[IllegalArgumentException](TableStats.encodingPlan(df, Nil))
    intercept[IllegalArgumentException](TableStats.encodingPlan(df, Seq("nope")))
  }

  test("suite refusals: empty, duplicate names, bad thresholds") {
    intercept[IllegalArgumentException](QualityChecks.verify(frame, Nil))
    intercept[IllegalArgumentException](QualityChecks.verify(frame,
      Seq(MinSize("a", 1L), MinSize("a", 2L))))
    intercept[IllegalArgumentException](QualityChecks.verify(frame,
      Seq(Completeness("c", "name", 1L, 0L))))
  }
}
