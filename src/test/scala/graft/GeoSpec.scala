package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Geo

/** Geospatial contracts: grid-join equivalence to brute force under fuzz
  * (incl. NEGATIVE coordinates — the floor-cell arithmetic), exactly-once
  * pair emission, kNN boundary ties, full DBSCAN role/cluster semantics vs
  * a driver-side reference, and the convex-polygon orientation refusals. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def pts(seed: Int, n: Int, span: Int, shift: Int = 0): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, (rnd.nextInt(span) + shift).toLong,
      (rnd.nextInt(span) + shift).toLong))
  }

  private def brutePairs(
      l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)], rad: Long): Set[(Long, Long)] =
    (for {
      (li, lx, ly) <- l
      (ri, rx, ry) <- r
      if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= rad * rad
    } yield (li, ri)).toSet

  test("gridDistanceJoin equals brute force, each pair exactly once, negative coords included") {
    for ((shift, rad) <- Seq((0, 7L), (-50, 13L), (-200, 40L))) {
      val l = pts(1 + shift, 80, 100, shift)
      val r = pts(2 + shift, 60, 100, shift)
      val ldf = viaParquet(l.toDF("lid", "x", "y"))
      val rdf = viaParquet(r.toDF("rid", "rx", "ry"))
      val got = Geo.gridDistanceJoin(ldf, rdf, "x", "y", "rx", "ry", rad, probePartitions = 4)
        .select("lid", "rid").collect().map(t => (t.getLong(0), t.getLong(1))).toSeq
      val expect = brutePairs(l, r, rad)
      assert(got.toSet == expect, s"shift=$shift rad=$rad")
      assert(got.size == expect.size, s"duplicate emission at shift=$shift rad=$rad")
    }
  }

  test("knnWithinRadius: k bound, radius bound, (d2, id) tie order") {
    val l = Seq((1L, 0L, 0L)).toDF("lid", "x", "y")
    // ties at d2=4: ids 11,12; nearer: 10; outside radius: 13
    val r = Seq((10L, 1L, 0L), (11L, 2L, 0L), (12L, 0L, 2L), (13L, 9L, 0L))
      .toDF("rid", "rx", "ry")
    val got = Geo.knnWithinRadius(viaParquet(l), viaParquet(r),
        "lid", "rid", "x", "y", "rx", "ry", radius = 5L, k = 2)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L)) // 12 loses the d2=4 tie to 11 on id
    val all = Geo.knnWithinRadius(viaParquet(l), viaParquet(r),
        "lid", "rid", "x", "y", "rx", "ry", radius = 5L, k = 10)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(all == Set(10L, 11L, 12L)) // 13 beyond radius even with slack k
  }

  /** Driver-side DBSCAN reference with identical pinned semantics. */
  private def refDbscan(
      ps: Seq[(Long, Long, Long)], eps: Long, minPts: Int): Map[Long, (String, Option[Long])] = {
    def nbrs(p: (Long, Long, Long)) = ps.filter(q =>
      (p._2 - q._2) * (p._2 - q._2) + (p._3 - q._3) * (p._3 - q._3) <= eps * eps)
    val core = ps.filter(p => nbrs(p).size >= minPts).map(_._1).toSet
    // min-id components over core-core adjacency
    var label = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (p <- ps if core(p._1); q <- nbrs(p) if core(q._1)) {
        val m = math.min(label(p._1), label(q._1))
        if (label(p._1) != m) { label += p._1 -> m; changed = true }
        if (label(q._1) != m) { label += q._1 -> m; changed = true }
      }
    }
    ps.map { p =>
      if (core(p._1)) p._1 -> ("core", Some(label(p._1)))
      else {
        val coreNb = nbrs(p).map(_._1).filter(core)
        if (coreNb.nonEmpty) p._1 -> ("border", Some(coreNb.map(label).min))
        else p._1 -> ("noise", None)
      }
    }.toMap
  }

  test("gridDbscan matches the reference point-for-point on fuzzed blobs") {
    val rnd = new scala.util.Random(7)
    // three blobs + scattered noise
    val blob = for {
      (bx, by, base) <- Seq((20L, 20L, 0), (80L, 20L, 100), (50L, 90L, 200))
      i <- 1 to 25
    } yield ((base + i).toLong, bx + rnd.nextInt(7) - 3L, by + rnd.nextInt(7) - 3L)
    val scatter = (1 to 12).map(i =>
      (1000L + i, rnd.nextInt(120).toLong, 150L + rnd.nextInt(60)))
    val ps = blob ++ scatter
    val got = Geo.gridDbscan(viaParquet(ps.toDF("id", "x", "y")), "id", "x", "y",
        eps = 3L, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got == refDbscan(ps, 3L, 4))
  }

  test("gridDbscan hand case: every role and the min-id cluster labels, deterministically") {
    // chain 10..14 at spacing 1, eps=1, minPts=3: interior points have
    // self+2 neighbors -> core; the two ENDS have self+1 -> border,
    // attached to the chain's min core id; 99 is isolated -> noise
    val ps = Seq((10L, 0L, 0L), (11L, 1L, 0L), (12L, 2L, 0L),
      (13L, 3L, 0L), (14L, 4L, 0L), (99L, 100L, 100L))
    val got = Geo.gridDbscan(viaParquet(ps.toDF("id", "x", "y")), "id", "x", "y",
        eps = 1L, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got == Map(
      10L -> (("border", Some(11L))), 11L -> (("core", Some(11L))),
      12L -> (("core", Some(11L))), 13L -> (("core", Some(11L))),
      14L -> (("border", Some(11L))), 99L -> (("noise", None))))
  }

  test("pointInConvexPolygon: interior, boundary-inclusive, exterior, and ring refusals") {
    val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val df = viaParquet(Seq(
      (1L, 5L, 5L), // interior
      (2L, 0L, 0L), // vertex -> inside (>= 0)
      (3L, 10L, 5L), // edge -> inside
      (4L, 11L, 5L), // outside
      (5L, -1L, -1L)) // outside
      .toDF("id", "x", "y"))
    val in = df.filter(Geo.pointInConvexPolygon(col("x"), col("y"), square))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(in == Set(1L, 2L, 3L))
    // clockwise ring refused (would test the complement)
    assertThrows[IllegalArgumentException] {
      Geo.pointInConvexPolygon(col("x"), col("y"), square.reverse)
    }
    // concave ring refused
    assertThrows[IllegalArgumentException] {
      Geo.pointInConvexPolygon(col("x"), col("y"),
        Seq((0L, 0L), (10L, 0L), (5L, 5L), (10L, 10L), (0L, 10L)))
    }
    assertThrows[IllegalArgumentException] {
      Geo.pointInConvexPolygon(col("x"), col("y"), Seq((0L, 0L), (1L, 1L)))
    }
  }

  test("tilePyramid: point conservation, parent-of-4 rollup, interleave agreement") {
    val rnd = new scala.util.Random(19)
    val ps = (1 to 300).map(i => (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val pyr = Geo.tilePyramid(viaParquet(ps.toDF("id", "x", "y")), "x", "y",
        bits = 5, coordBits = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // every level conserves the point count
    val byLevel = pyr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byLevel == (1 to 5).map(_ -> 300L).toMap)
    // finest census equals the driver interleave
    val expect5 = ps.groupBy { case (_, x, y) =>
      graft.operators.Zorder.interleaveRef(x >> 5, y >> 5, 5)
    }.map { case (z, g) => z -> g.size.toLong }
    assert(pyr.filter(_._1 == 5).map(t => t._2 -> t._3).toMap == expect5)
    // each parent is the sum of its (at most 4) children
    val l4 = pyr.filter(_._1 == 4).map(t => t._2 -> t._3).toMap
    val fromChildren = pyr.filter(_._1 == 5).groupBy(_._2 / 4)
      .map { case (p, cs) => p -> cs.map(_._3).sum }
    assert(l4 == fromChildren)
  }

  test("argument refusals") {
    val df = Seq((1L, 2L, 3L)).toDF("id", "x", "y")
    assertThrows[IllegalArgumentException] {
      Geo.gridDistanceJoin(df, df, "x", "y", "x", "y", 5L) // overlapping columns
    }
    assertThrows[IllegalArgumentException] {
      Geo.gridDistanceJoin(df, df.toDF("i2", "x2", "y2"), "x", "y", "x2", "y2", 0L)
    }
    assertThrows[IllegalArgumentException] {
      Geo.gridDbscan(df, "id", "x", "y", eps = 3L, minPts = 0)
    }
  }

  test("bboxOverlapJoin: fuzzed brute-force equivalence, exactly-once, at 3 tile widths incl. negative coords") {
    def boxes(seed: Int, n: Int, shift: Int) = {
      val rnd = new scala.util.Random(seed)
      (1 to n).map { i =>
        val x1 = rnd.nextInt(200) + shift; val y1 = rnd.nextInt(200) + shift
        (i.toLong, x1.toLong, (x1 + 1 + rnd.nextInt(30)).toLong,
          y1.toLong, (y1 + 1 + rnd.nextInt(30)).toLong)
      }
    }
    for ((tile, shift) <- Seq((8L, 0), (32L, -150), (100L, -50))) {
      val l = boxes(1 + shift, 60, shift)
      val r = boxes(2 + shift, 60, shift)
      val ldf = viaParquet(l.toDF("lid", "lx1", "lx2", "ly1", "ly2"))
      val rdf = viaParquet(r.toDF("rid", "rx1", "rx2", "ry1", "ry2"))
      val got = Geo.bboxOverlapJoin(ldf, rdf, "lx1", "lx2", "ly1", "ly2",
          "rx1", "rx2", "ry1", "ry2", tile, probePartitions = 4)
        .select("lid", "rid").collect().map(t => (t.getLong(0), t.getLong(1))).toSeq
      val expect = (for {
        (li, lx1, lx2, ly1, ly2) <- l
        (ri, rx1, rx2, ry1, ry2) <- r
        if lx1 < rx2 && rx1 < lx2 && ly1 < ry2 && ry1 < ly2
      } yield (li, ri)).toSet
      assert(got.toSet == expect, s"tile=$tile shift=$shift")
      assert(got.size == expect.size, s"duplicate emission at tile=$tile shift=$shift")
    }
    // degenerate boxes never join
    val deg = viaParquet(Seq((1L, 5L, 5L, 0L, 10L)).toDF("lid", "lx1", "lx2", "ly1", "ly2"))
    val any = viaParquet(Seq((2L, 0L, 100L, 0L, 100L)).toDF("rid", "rx1", "rx2", "ry1", "ry2"))
    assert(Geo.bboxOverlapJoin(deg, any, "lx1", "lx2", "ly1", "ly2",
      "rx1", "rx2", "ry1", "ry2", 16L).isEmpty)
  }

  test("subtreeRollup: hand tree and fuzz vs a driver fold") {
    import graft.operators.Graph
    // keys 1..99 value=key: node 1's subtree = {1, 10..19} at fanout 10
    val df = viaParquet((1L to 99L).map(k => (k, k)).toDF("k", "v"))
    val got = Graph.subtreeRollup(df, "k", "v", fanout = 10L, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((11L, 1L + (10L to 19L).sum)))
    assert(got(99L) == ((1L, 99L)))
    assert(got(0L)._1 == 99L) // the root sees every row
    // driver fold over all ancestor levels
    val expect = (1L to 99L).flatMap(k =>
      Iterator.iterate(k)(_ / 10L).take(5).toSeq.distinct.map(a => a -> k))
      .groupBy(_._1).map { case (a, xs) =>
        a -> ((xs.size.toLong, xs.map(_._2).sum))
      }
    assert(got == expect)
  }
}
