package graft

import org.apache.spark.sql.functions._

import graft.ml.Projection
import graft.operators.TableStats

/** JL random projection and the table profiler (q124, q126). */
class ProjectionProfileSpec extends SparkSpec {
  import spark.implicits._

  private def hashVec(id: Long, dims: Int): Seq[Float] = {
    // per-vector PRNG: iid-ish components (a linear hash would make the
    // DIFFERENCE of two vectors nearly constant, which a +/-1 projection
    // legitimately annihilates — not what this test is probing)
    val rng = new scala.util.Random(id)
    (0 until dims).map(_ => (rng.nextDouble() - 0.5).toFloat)
  }

  test("projection matches a driver-side replay exactly") {
    val df = (1L to 20L).map(id => (id, hashVec(id, 16))).toDF("id", "v")
    val got = Projection.project(df, "v", inDims = 16, outDims = 4, seed = 3L)
      .select("id", "p0", "p1", "p2", "p3").as[(Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    (1L to 20L).foreach { id =>
      val v = hashVec(id, 16)
      val expect = (0 until 4).map { j =>
        val row = Projection.signRow(16, j, 4, 3L)
        var acc = 0.0
        var i = 0
        while (i < 16) { acc += v(i).toDouble * row(i); i += 1 }
        acc
      }
      assert(got(id) == expect, s"id $id")
    }
  }

  test("projection approximately preserves pairwise distances (the JL property)") {
    val dims = 64
    val df = (1L to 40L).map(id => (id, hashVec(id, dims))).toDF("id", "v")
    val proj = Projection.project(df, "v", inDims = dims, outDims = 32, seed = 11L)
      .select(col("id"), array((0 until 32).map(j => col(s"p$j")): _*).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = (1L to 40L).map(id => id -> hashVec(id, dims).map(_.toDouble)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- 1L to 20L; j <- (i + 1) to 20L) yield
      d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    // JL at k=32 over 190 pairs: sigma = sqrt(2/k) = 0.25, so worst-case
    // draws legitimately reach ~1 +/- 2.5 sigma — bounds follow theory,
    // not optimism
    assert(ratios.forall(r => r > 0.2 && r < 3.0), s"worst ratios: ${ratios.min}, ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.25, s"mean ratio $mean")
  }

  test("table profile reports counts, nulls, ndv, and integral min/max per column") {
    val df = Seq(
      (1L, Some("a"), Some(10)), (2L, None, Some(20)), (3L, Some("a"), None), (4L, Some("b"), Some(20)))
      .toDF("id", "s", "x")
    val prof = TableStats.profile(df, Seq("id", "s", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof("id").getLong(1) == 4 && prof("id").getLong(2) == 0 && prof("id").getLong(3) == 4)
    assert(prof("id").getLong(4) == 1L && prof("id").getLong(5) == 4L)
    assert(prof("s").getLong(2) == 1 && prof("s").getLong(3) == 2)
    assert(prof("s").isNullAt(4) && prof("s").isNullAt(5), "non-integral min/max must be null")
    assert(prof("x").getLong(2) == 1 && prof("x").getLong(3) == 2)
    assert(prof("x").getLong(4) == 10L && prof("x").getLong(5) == 20L)
    intercept[IllegalArgumentException] { TableStats.profile(df, Nil) }
  }
}
