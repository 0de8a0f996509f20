package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Pareto-frontier contracts: exact dominance semantics on hand-built
  * points, brute-force equivalence under fuzz in 2/3/4 dims, the
  * bucket-count-independence of the grid prune (pruning is an
  * optimization, never a semantics), NULL-dim exclusion, duplicate
  * retention, band-size refusal, and argument refusals. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def frontierIds(df: DataFrame, dims: Seq[String], buckets: Int = 32): Set[Long] =
    Skyline.paretoFrontier(df, dims, buckets = buckets)
      .select("id").collect().map(_.getLong(0)).toSet

  private def bruteIds(rows: Seq[(Long, Seq[Long])]): Set[Long] =
    rows.filter { case (_, p) =>
      !rows.exists { case (_, q) =>
        q.zip(p).forall { case (a, b) => a >= b } &&
          q.zip(p).exists { case (a, b) => a > b }
      }
    }.map(_._1).toSet

  test("hand-built 2D: staircase survives, dominated and tied points resolve exactly") {
    val df = Seq(
      (1L, 10L, 1L), // frontier (best v1)
      (2L, 5L, 5L), // frontier
      (3L, 1L, 10L), // frontier (best v2)
      (4L, 5L, 4L), // dominated by 2 (tie v1, worse v2)
      (5L, 4L, 5L), // dominated by 2 (worse v1, tie v2)
      (6L, 3L, 3L), // dominated strictly
      (7L, 5L, 5L)) // duplicate of 2: kept (equality is not strict dominance)
      .toDF("id", "v1", "v2")
    assert(frontierIds(viaParquet(df), Seq("v1", "v2")) == Set(1L, 2L, 3L, 7L))
  }

  test("fuzzed 2/3/4-dim frontiers equal brute force, at every bucket count") {
    val rnd = new scala.util.Random(314)
    for (k <- 2 to 4) {
      val rows = (0 until 120).map(i =>
        (i.toLong, Seq.fill(k)(rnd.nextInt(20).toLong)))
      val df = viaParquet(rows.map { case (id, p) => (id, p(0), p.lift(1).getOrElse(0L),
        p.lift(2).getOrElse(0L), p.lift(3).getOrElse(0L)) }
        .toDF("id", "d1", "d2", "d3", "d4"))
      val dims = (1 to k).map(i => s"d$i")
      val want = bruteIds(rows)
      for (buckets <- Seq(2, 7, 32)) {
        assert(frontierIds(df, dims, buckets) == want, s"k=$k buckets=$buckets")
      }
    }
  }

  test("NULL dims are incomparable and excluded; degenerate inputs hold") {
    val df = viaParquet(Seq(
      (1L, Some(5L), Some(5L)),
      (2L, None, Some(9L)), // null dim → excluded
      (3L, Some(5L), None)) // null dim → excluded
      .toDF("id", "v1", "v2"))
    assert(frontierIds(df, Seq("v1", "v2")) == Set(1L))
    // all-identical rows: nothing strictly dominates anything → all kept
    val same = viaParquet(Seq((1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L)).toDF("id", "v1", "v2"))
    assert(frontierIds(same, Seq("v1", "v2")) == Set(1L, 2L, 3L))
    // constant dim (min == max collapses to one bucket): still exact
    val flat = viaParquet(Seq((1L, 7L, 1L), (2L, 7L, 2L), (3L, 7L, 3L)).toDF("id", "v1", "v2"))
    assert(frontierIds(flat, Seq("v1", "v2")) == Set(3L))
    // empty-after-null-filter input returns empty, not a crash
    val allNull = viaParquet(Seq((1L, Option.empty[Long], Option.empty[Long]))
      .toDF("id", "v1", "v2"))
    assert(frontierIds(allNull, Seq("v1", "v2")).isEmpty)
  }

  test("band-size guard and argument refusals") {
    val df = viaParquet(
      (0 until 50).map(i => (i.toLong, i.toLong, 49L - i)).toDF("id", "v1", "v2"))
    // perfectly anti-correlated: the frontier IS the table; a tiny cap refuses
    val e = intercept[IllegalArgumentException](
      Skyline.paretoFrontier(df, Seq("v1", "v2"), maxBandRows = 5L).collect())
    assert(e.getMessage.contains("band"))
    intercept[IllegalArgumentException](Skyline.paretoFrontier(df, Seq("v1")))
    intercept[IllegalArgumentException](Skyline.paretoFrontier(df, Seq("v1", "v1")))
    intercept[IllegalArgumentException](Skyline.paretoFrontier(df, Seq("v1", "nope")))
    intercept[IllegalArgumentException](Skyline.paretoFrontier(df, Seq("v1", "v2"), buckets = 1))
  }
}
