package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

/** Fellegi–Sunter scoring contracts: exact-integer equivalence against an
  * independent pure-Scala reimplementation, agreement monotonicity, and
  * partitioning determinism. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the same fixed-point floor-log₂ spelled with
    * bit ops (msb via numberOfLeadingZeros, nibble via right shift — floor
    * division by a power of two IS a right shift for non-negatives). */
  private def flog2Ref(x: Long): Long = {
    require(x >= 1)
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    16L * msb - 16L + ((x * 16L) >> msb)
  }

  private def weightsRef(c: Long, a: Long, mNum: Long, mDen: Long): (Long, Long) = (
    flog2Ref(mNum * (c + 2)) - flog2Ref(mDen * (a + 1)),
    flog2Ref((mDen - mNum) * (c + 2)) - flog2Ref(mDen * (c - a + 1)))

  test("scores match the pure-Scala reference on a seeded random pair set") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 500).map { i =>
      (i.toLong, rnd.nextInt(10) < 7, rnd.nextInt(10) < 3, rnd.nextInt(2) == 0)
    }
    val df = viaParquet(pairs.toDF("pid", "g_a", "g_b", "g_c"))
    val got = Linkage.fellegiSunterScores(df, Seq("g_a", "g_b", "g_c"))
      .select("pid", "score").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = pairs.size.toLong
    val fields = Seq[(String, ((Long, Boolean, Boolean, Boolean)) => Boolean)](
      ("g_a", _._2), ("g_b", _._3), ("g_c", _._4))
    val wts = fields.map { case (_, get) =>
      weightsRef(c, pairs.count(get).toLong, 15L, 16L)
    }
    val expected = pairs.map { p =>
      p._1 -> fields.zip(wts).map { case ((_, get), (wa, wd)) =>
        if (get(p)) wa else wd
      }.sum
    }.toMap
    assert(got == expected)
  }

  test("agreement is monotone: flipping any field to agree raises the score when u < m") {
    // u per field is far below 15/16 here, so wa_j > wd_j for every j;
    // a pair that agrees on a superset of fields must outscore the subset
    val pairs = viaParquet((
      (1 to 200).map(i => (i.toLong, i % 10 == 0, i % 7 == 0)) ++
        Seq((1001L, true, true), (1002L, true, false), (1003L, false, true),
          (1004L, false, false))).toDF("pid", "g_a", "g_b"))
    val s = Linkage.fellegiSunterScores(pairs, Seq("g_a", "g_b"))
      .filter(col("pid") >= 1000L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score")).toMap
    assert(s(1001L) > s(1002L) && s(1001L) > s(1003L))
    assert(s(1002L) > s(1004L) && s(1003L) > s(1004L))
  }

  test("scores are partitioning-invariant") {
    val pairs = (1 to 300).map(i => (i.toLong, i % 3 == 0, i % 5 == 0))
    val base = viaParquet(pairs.toDF("pid", "g_a", "g_b"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Linkage.fellegiSunterScores(df, Seq("g_a", "g_b"))
        .select("pid", "score").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(base.repartition(1)) == run(base.repartition(13, col("pid"))))
  }

  test("goldenRecords: majority wins, ties go to the smallest value, nulls never vote") {
    val recs = viaParquet(Seq(
      // cluster 1: majority "alice" (2 of 3); sz tie 5 vs 7 → 5
      (1L, Some("alice"), Some(5L)),
      (1L, Some("alice"), Some(7L)),
      (1L, Some("bob"), None),
      // cluster 2: name null in one member only — null must not outvote
      (2L, None, Some(9L)),
      (2L, Some("carol"), Some(9L)),
      // cluster 3: field null in EVERY member → survives as null
      (3L, None, Some(1L))).toDF("cluster", "nm", "sz"))
    val got = graft.operators.Linkage.goldenRecords(recs, "cluster", Seq("nm", "sz"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getString(2)), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got(1L) == ((3L, Some("alice"), Some(5L))))
    assert(got(2L) == ((2L, Some("carol"), Some(9L))))
    assert(got(3L) == ((1L, None, Some(1L))))
    intercept[IllegalArgumentException](
      graft.operators.Linkage.goldenRecords(recs, "cluster", Nil))
    intercept[IllegalArgumentException](
      graft.operators.Linkage.goldenRecords(recs, "nope", Seq("nm")))
  }

  test("degenerate m is refused") {
    val df = Seq((1L, true)).toDF("pid", "g_a")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunterScores(df, Seq("g_a"), mNum = 16L, mDen = 16L)
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunterScores(df, Nil)
    }
  }
}
