package graft

import org.apache.spark.sql.functions._

import graft.ml.Coreset

/** Greedy k-center coreset contracts (q209). */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("farthest-point traversal picks the known extremes first, ties to smallest id") {
    // 1-D points embedded in 2-D: 0, 10, 100, 101, 200 (id = index)
    val pts = Seq(0L, 10L, 100L, 101L, 200L).zipWithIndex
      .map { case (x, i) => (i.toLong, Seq(x, 0L)) }.toDF("id", "qv")
    val picks = Coreset.kCenterGreedy(pts, "id", "qv", 4)
    assert(picks.map(_._2) == Seq(0L, 4L, 2L, 1L))
    // round-1 distance: 200² from seed 0; round 2: id2 (x=100) at min(100², 100²)
    assert(picks(1)._3 == 200L * 200L)
    assert(picks(2)._3 == 100L * 100L)
    // the max-min radius is non-increasing round over round
    val ds = picks.drop(1).map(_._3)
    assert(ds == ds.sorted.reverse)
  }

  test("selection is deterministic under partitioning") {
    val pts = (0 until 120)
      .map(i => (i.toLong, Seq(((i * 37) % 50).toLong, ((i * 61) % 70).toLong)))
      .toDF("id", "qv")
    val a = Coreset.kCenterGreedy(pts, "id", "qv", 6)
    val b = Coreset.kCenterGreedy(pts.repartition(11, col("id")), "id", "qv", 6)
    assert(a == b)
  }
}
