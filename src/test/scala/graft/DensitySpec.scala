package graft

import org.apache.spark.sql.functions._

import graft.operators.Density

/** DBSCAN contracts: exact core/border/noise labels on a hand-built
  * scene, cross-cell cluster merging, deterministic border tie-break,
  * brute-force equivalence under fuzz, and refusals. */
class DensitySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Double)], eps: Double, minPts: Int) =
    Density.dbscan2d(viaParquet(rows.toDF("id", "x", "y")), "id", "x", "y", eps, minPts)
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2))))
      .toMap

  /** Reference DBSCAN on the driver. */
  private def brute(rows: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
    : Map[Long, (Option[Long], String)] = {
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) = {
      val (dx, dy) = (a._2 - b._2, a._3 - b._3); dx * dx + dy * dy <= eps * eps
    }
    val nbrs = rows.map(a => a._1 -> rows.filter(b => near(a, b)).map(_._1)).toMap
    val core = rows.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    // components over core-core eps-edges via union-find
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val root = core.map(c => c -> find(c)).toMap
    // component id = min core id in the component
    val comp = root.groupBy(_._2).flatMap { case (_, m) => val r = m.keys.min; m.keys.map(_ -> r) }
    rows.map { case (id, _, _) =>
      if (core(id)) id -> ((Some(comp(id)), "core"))
      else {
        val cn = nbrs(id).filter(core.contains)
        if (cn.nonEmpty) id -> ((Some(cn.map(comp).min), "border")) else id -> ((None, "noise"))
      }
    }.toMap
  }

  test("hand scene: two chained blobs merge across cells, border joins, stragglers are noise") {
    // blob A: chain 0..4 on the x axis (adjacent distance 1, eps 1.5 →
    // chain-connected across several eps-cells); blob B far away;
    // a border point 1.2 off blob A's end (1 core neighbor, not core itself);
    // one isolated noise point
    val rows = Seq[(Long, Double, Double)](
      (0L, 0.0, 0.0), (1L, 1.0, 0.0), (2L, 2.0, 0.0), (3L, 3.0, 0.0), (4L, 4.0, 0.0),
      (10L, 100.0, 0.0), (11L, 101.0, 0.0), (12L, 102.0, 0.0),
      (20L, 4.0, 1.2), // within 1.5 of id 4 only → border of A
      (30L, 50.0, 50.0)) // noise
    val got = run(rows, eps = 1.5, minPts = 3)
    // chain endpoints have only 2 eps-neighbors (self + one) → border;
    // id 4 is core BECAUSE the border point 20 is its third neighbor
    assert(got(1L) == ((Some(1L), "core")))
    assert(got(4L) == ((Some(1L), "core"))) // same cluster across cells
    assert(got(0L) == ((Some(1L), "border")))
    assert(got(11L) == ((Some(11L), "core")) && got(12L) == ((Some(11L), "border")))
    assert(got(20L) == ((Some(1L), "border")))
    assert(got(30L) == ((None, "noise")))
    assert(got == brute(rows, 1.5, 3)) // the reference agrees in full
  }

  test("fuzzed scenes equal the driver-side reference at several (eps, minPts)") {
    val rnd = new scala.util.Random(317)
    val rows = (0 until 160).map(i =>
      (i.toLong, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
    for ((eps, minPts) <- Seq((1.5, 3), (3.0, 5), (2.0, 1), (0.5, 2))) {
      assert(run(rows, eps, minPts) == brute(rows, eps, minPts), s"eps=$eps minPts=$minPts")
    }
  }

  test("minPts=1: every point is core (its ball holds itself); an isolated core is a singleton cluster") {
    val got = run(Seq((7L, 0.0, 0.0), (9L, 100.0, 100.0)), eps = 1.0, minPts = 1)
    assert(got == Map(7L -> ((Some(7L), "core")), 9L -> ((Some(9L), "core"))))
  }

  test("refusals and null coordinates") {
    val df = viaParquet(Seq((1L, Some(0.0), Some(0.0)), (2L, None, Some(1.0)))
      .toDF("id", "x", "y"))
    intercept[IllegalArgumentException](Density.dbscan2d(df, "id", "x", "y", 0.0, 3))
    intercept[IllegalArgumentException](Density.dbscan2d(df, "id", "x", "y", 1.0, 0))
    intercept[IllegalArgumentException](Density.dbscan2d(df, "id", "x", "nope", 1.0, 3))
    // a NULL-coordinate row is excluded (incomparable), not a crash
    val out = Density.dbscan2d(df, "id", "x", "y", 1.0, 1).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }
}
