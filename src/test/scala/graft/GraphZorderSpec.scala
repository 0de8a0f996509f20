package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Zorder}
import graft.text.Sampling

/** Z-order interleave, fixed-point PageRank, and the leakage-safe split
  * (q118–q120). */
class GraphZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder column expression matches the reference bit interleave") {
    val pts = for (x <- 0L until 64L by 7L; y <- 0L until 64L by 5L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Zorder.interleave(col("x"), col("y"), 6))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == Zorder.interleaveRef(x, y, 6), s"($x,$y)")
    }
  }

  test("zorder keeps an aligned tile in exactly one bucket") {
    // a 8x8-aligned tile under 6-bit interleave = one contiguous 64-point
    // z-range = exactly one bucket of 64 curve points
    val pts = for (x <- 16L until 24L; y <- 40L until 48L) yield (x, y)
    val buckets = pts.toDF("x", "y")
      .select((Zorder.interleave(col("x"), col("y"), 6) / 64).cast("long").as("b"))
      .distinct().count()
    assert(buckets == 1L)
  }

  test("optimizeTable rewrites the snapshot z-clustered, atomically, with a deterministic layout") {
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("zopt_spec").toString
    val log = s"$root/_log"
    def fileOf(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    // 32x32 grid scattered across 4 anti-clustered files
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val fs = (0 until 4).map(m => fileOf(pts.filter(pmod(col("x") + col("y"), lit(4)) === m), s"m$m"))
    TxnLog.commit(log, 0, fs, Nil)
    val v1 = graft.operators.Zorder.optimizeTable(spark, log, s"$root/opt", "x", "y", 5, 4)
    assert(v1 == 1L)
    // atomic swap: 4 new files live, old ones removed, rows preserved exactly
    val live = TxnLog.liveFiles(log, 1)
    assert(live.size == 4 && live.intersect(fs.toSet).isEmpty)
    assert(sortedRows(TxnLog.readAsOf(spark, log, 1)) == sortedRows(pts))
    assert(TxnLog.readAsOf(spark, log, 0).count() == 1024) // time travel intact
    // deterministic layout: each file holds one contiguous quarter of the
    // z-curve — for the full 32x32 grid that is one 16x16 quadrant, so per-
    // file x/y bounds are exact 16-wide boxes
    import org.apache.spark.sql.functions.input_file_name
    val boxes = spark.read.parquet(live.toSeq.sorted: _*)
      .groupBy(input_file_name())
      .agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(boxes == Set(
      (0L, 15L, 0L, 15L, 256L), (16L, 31L, 0L, 15L, 256L),
      (0L, 15L, 16L, 31L, 256L), (16L, 31L, 16L, 31L, 256L)))
  }

  test("optimizeTable rewrites the VISIBLE snapshot: DV-killed rows never resurrect, stale DVs drop") {
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("zopt_dv_spec").toString
    val log = s"$root/_log"
    val d0 = s"$root/base"
    (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
      .coalesce(1).write.mode("overwrite").parquet(d0)
    val f0 = new java.io.File(d0).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    TxnLog.commit(log, 0, Seq(f0), Nil)
    // bind a deletion vector: kill the x = 0 column of the grid (16 rows)
    val v1 = TxnLog.deleteMergeOnRead(spark, log, s"$root/dv", col("x") === 0L)
    assert(TxnLog.readAsOfWithDeletes(spark, log, v1).count() == 240)
    val v2 = graft.operators.Zorder.optimizeTable(spark, log, s"$root/opt", "x", "y", 4, 2)
    // the clustered rewrite holds exactly the visible 240 rows — a raw
    // live-file rewrite would resurrect the 16 DV-killed ones
    val after = TxnLog.readAsOfWithDeletes(spark, log, v2)
    assert(after.count() == 240 && after.filter(col("x") === 0L).count() == 0)
    // the stale DV was dropped with the commit (its file references are gone)
    assert(TxnLog.dvFiles(log, v2).isEmpty)
    // pre-optimize versions stay time-travelable with their DV semantics
    assert(TxnLog.readAsOfWithDeletes(spark, log, v1).count() == 240)
    assert(TxnLog.readAsOf(spark, log, 0).count() == 256)
  }

  test("pagerank concentrates rank on the star center and conserves bounded mass") {
    // star: every leaf points at node 0
    val edges = (1L to 20L).map(i => (i, 0L)).toDF("src", "dst")
    val ranks = Graph.pageRankFixedPoint(edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks(0L) > ranks(1L) * 10, s"center ${ranks(0L)} vs leaf ${ranks(1L)}")
    assert((1L to 20L).map(ranks).distinct.size == 1, "leaves must tie exactly")
    val total = ranks.values.sum
    assert(total <= 1000000000L, "floor divisions and dangling drop can only lose mass")
    // every node keeps at least the teleport base each round (the center is
    // DANGLING here — its mass drops by contract, so no higher bound holds)
    val base = (1000000000L * 15L) / (100L * 21L)
    assert(total >= 21L * base, "teleport base is the floor")
  }

  test("pagerank is deterministic under partitioning and matches a driver replay") {
    val base = (1L to 200L).map(i => (i % 17L, (i * 7L) % 17L)).distinct.toDF("src", "dst")
    val a = Graph.pageRankFixedPoint(viaParquet(base).repartition(1), iterations = 4)
    val b = Graph.pageRankFixedPoint(viaParquet(base).repartition(7, col("dst")), iterations = 4)
    assert(sortedRows(a) == sortedRows(b))
    // driver-side replay of the same fixed-point recurrence
    val edges = base.as[(Long, Long)].collect()
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val baseRank = (1000000000L * 15L) / (100L * n)
    var ranks = nodes.map(_ -> 1000000000L / n).toMap
    (1 to 4).foreach { _ =>
      val sums = edges
        .groupBy(_._2)
        .map { case (dst, es) => (dst, es.map(e => ranks(e._1) / outdeg(e._1)).sum) }
      ranks = nodes.map(v => v -> (baseRank + 85L * sums.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = a.as[(Long, Long)].collect().toMap
    assert(got == ranks)
  }

  test("pagerank refuses empty graphs and bad parameters") {
    intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(Seq.empty[(Long, Long)].toDF("src", "dst"), 3)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(Seq((1L, 2L)).toDF("src", "dst"), 0)
    }
  }

  test("kCore peels a tail and keeps the clique") {
    // K5 (a 4-core) with a pendant path 5-6-7 hanging off node 1:
    // peeling must remove the path in two rounds and keep exactly the clique
    val clique = for (u <- 1L to 5L; v <- (u + 1) to 5L) yield (u, v)
    val edges = (clique ++ Seq((1L, 6L), (6L, 7L))).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 4).as[(Long, Long)].collect().sorted
    assert(core.toSeq == (1L to 5L).map(n => (n, 4L)))
    // k above the clique degree empties the graph
    assert(Graph.kCore(edges, k = 5).count() == 0L)
  }

  test("kCore matches a driver-side peel on a fuzzed graph and ignores direction/dups") {
    val rnd = new scala.util.Random(7)
    val edgeSet = (1 to 260).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val df = (edgeSet ++ edgeSet.map(_.swap)).toDF("src", "dst") // dups + both directions
    val got = Graph.kCore(viaParquet(df), k = 3).as[(Long, Long)].collect().toMap
    // driver replay
    var live = edgeSet.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    var changed = true
    while (changed) {
      val deg = (live.map(_._1) ++ live.map(_._2)).groupBy(identity).map { case (k2, v) => (k2, v.size) }
      val keep = deg.filter(_._2 >= 3).keySet
      val pruned = live.filter { case (a, b) => keep(a) && keep(b) }
      changed = pruned.size != live.size
      live = pruned
    }
    val want = (live.map(_._1) ++ live.map(_._2)).groupBy(identity)
      .map { case (k2, v) => (k2, v.size.toLong) }
    assert(got == want)
  }

  test("deterministic walks are partition-independent and replayable") {
    val base = (1L to 120L).map(i => (i % 13L, (i * 5L) % 13L)).filter(e => e._1 != e._2)
      .distinct.toDF("src", "dst")
    val a = Graph.deterministicWalkVisits(viaParquet(base).repartition(1), steps = 3)
    val b = Graph.deterministicWalkVisits(viaParquet(base).repartition(5, col("dst")), steps = 3)
    assert(sortedRows(a) == sortedRows(b))
    // driver replay of the argmin walk
    val edges = base.as[(Long, Long)].collect()
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).distinct.sorted) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val m = 2147483647L
    def mix(cur: Long, step: Long, nb: Long) =
      ((cur % m) * 1048573L + step * 8191L + (nb % m) * 524287L) % m
    val visits = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    nodes.foreach { start =>
      var cur = start
      visits(cur) += 1
      var i = 1
      var alive = true
      while (i <= 3 && alive) {
        adj.get(cur) match {
          case Some(nbs) =>
            cur = nbs.minBy(nb => (mix(cur, i, nb), nb))
            visits(cur) += 1
          case None => alive = false
        }
        i += 1
      }
    }
    val got = a.as[(Long, Long)].collect().toMap
    assert(got == visits.toMap)
  }

  test("walks halt at sinks (visit mass shrinks, never grows)") {
    // chain 1->2->3, 3 is a sink: walk from 1 visits 1,2,3; from 2: 2,3; from 3: 3
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.deterministicWalkVisits(edges, steps = 5).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("label propagation converges to per-clique communities on two cliques") {
    // two triangles bridged by one edge: after a few synchronous rounds,
    // each triangle's labels collapse to its minimum node
    val t1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (t1 ++ t2 :+ ((3L, 10L))).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).map(got).distinct.size == 1, "triangle 1 is one community")
    assert(Seq(10L, 11L, 12L).map(got).distinct.size == 1, "triangle 2 is one community")
    assert(got(1L) != got(11L), "the bridge must not merge the cliques")
  }

  test("label propagation is synchronous and deterministic under partitioning") {
    val base = (1L to 300L).map(i => (i % 23L, (i * 7L) % 23L)).filter(e => e._1 != e._2)
      .distinct.toDF("src", "dst")
    val a = Graph.labelPropagation(viaParquet(base).repartition(1), iterations = 3)
    val b = Graph.labelPropagation(viaParquet(base).repartition(6, col("src")), iterations = 3)
    assert(sortedRows(a) == sortedRows(b))
    // driver replay of the synchronous (count desc, label asc) update
    val und = base.as[(Long, Long)].collect()
      .flatMap { case (s, d) => Seq((s, d), (d, s)) }.distinct
    val adj = und.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    var labels = adj.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      labels = adj.map { case (n, nbs) =>
        val freq = nbs.groupBy(labels).map { case (l, xs) => (l, xs.size) }
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(a.as[(Long, Long)].collect().toMap == labels)
  }

  test("directed 3-cycles counts each cycle once and excludes transitive triads") {
    // cycle 1->2->3->1, plus a TRANSITIVE triad 4->5, 5->6, 4->6 (no cycle),
    // plus a 2-cycle 7<->8 (not a triangle)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (7L, 8L), (8L, 7L)).toDF("src", "dst")
    assert(Graph.directedTriangleCycles(edges).as[Long].head() == 1L)
    // both rotations of a cycle pair: 1->2->3->1 and its reverse 1->3->2->1
    val both = edges.union(Seq((2L, 1L), (3L, 2L), (1L, 3L)).toDF("src", "dst"))
    assert(Graph.directedTriangleCycles(both).as[Long].head() == 2L)
  }

  test("directed 3-cycles equals the naive 3-way join on a random directed graph") {
    // 600 pseudo-random directed edges incl. mutual pairs — pins the
    // oriented-wedge classification to the brute-force definition: count
    // of (a,b,c) triples with a→b, b→c, c→a, each cycle once (÷3 rotations)
    val edges = (1L to 600L)
      .map(i => ((i * 37L) % 40L, (i * i * 11L + i) % 40L))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    val e = edges.as[(Long, Long)].collect().toSet
    val naive = (for {
      (a, b) <- e; c <- 0L until 40L
      if c != a && c != b && e.contains((b, c)) && e.contains((c, a))
    } yield ()).size / 3
    assert(Graph.directedTriangleCycles(edges).as[Long].head() == naive.toLong)
  }

  test("directed 3-cycles: a preference hub cannot blow up the wedge expansion") {
    // planted hub: node 0 judged against everyone — 1000 in-edges and 1000
    // out-edges. The naive in×out wedge join centered on the hub expands
    // 10^6 candidate wedges; the (degree, id) orientation gives the hub
    // out-degree 0 in the oriented support graph (every leaf has lower
    // degree), so the wedge count must be degree-bounded, not in·out.
    val hub = ((1L to 1000L).map(i => (i, 0L)) ++ (1001L to 2000L).map(i => (0L, i)))
      .toDF("src", "dst")
    val (oriented, _) = Graph.orientedDirectedSupport(hub)
    val wedgeCount = oriented.select(col("src").as("u"), col("dst").as("v"))
      .join(oriented.select(col("src").as("u"), col("dst").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .count()
    assert(wedgeCount == 0L, s"hub must own no oriented wedges, got $wedgeCount")
    assert(Graph.directedTriangleCycles(hub).as[Long].head() == 0L)
    // and the bound is the real O(m^1.5) one, not an artifact of a
    // triangle-free fixture: add a second tier so triangles exist
    val tiered = hub.union(Seq((1L, 2L), (2L, 1L), (1001L, 1L), (2L, 1001L)).toDF("src", "dst"))
    val (o2, _) = Graph.orientedDirectedSupport(tiered)
    val w2 = o2.select(col("src").as("u"), col("dst").as("v"))
      .join(o2.select(col("src").as("u"), col("dst").as("w")), Seq("u"))
      .filter(col("v") < col("w")).count()
    // m ≈ 2004 support edges → m^1.5 ≈ 9·10^4; the naive center-join form
    // would be ≥ 10^6 from the hub alone
    assert(w2 < 10000L, s"oriented wedge volume must stay O(m^1.5)-bounded, got $w2")
    assert(Graph.directedTriangleCycles(tiered).as[Long].head() == 2L,
      "exactly the planted cyclic triads: 0→1001→1→0 and 1→2→1001→1")
  }

  test("leakage-safe split never lets a cluster straddle splits") {
    val docs = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1..5}, {10..12}, {20,21}; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("id1", "id2")
    val split = Sampling.leakageSafeSplit(
      docs, "doc_id", pairs, Seq("train" -> 0.5, "test" -> 0.5),
      seed = "s", repColumn = Some("rep"))
    val spanning = split.groupBy("rep")
      .agg(countDistinct(col("split")).as("nsp"))
      .filter(col("nsp") > 1)
      .count()
    assert(spanning == 0L)
    // cluster members carry their component's min-id rep
    val reps = split.select("doc_id", "rep").as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(reps(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(reps(_) == 10L))
    assert(reps(33L) == 33L, "singletons are their own rep")
    assert(split.filter(col("split").isNull).count() == 0L)
  }

  test("hits: star hub dominates; bipartite sides get disjoint hub/auth; exact integer scores") {
    import spark.implicits._
    // suppliers s1 supplies p1,p2,p3; s2 supplies p1 only
    val e = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L)).toDF("src", "dst")
    val out = graft.operators.Graph.hits(e, rounds = 2).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) null else r.getLong(1),
                                  if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    // round 1: hub = outdeg → h(10)=3, h(20)=1; auth(p) = Σ hub over suppliers
    // a(1)=3+1=4, a(2)=3, a(3)=3
    // round 2: h2(10)=4+3+3=10, h2(20)=4; a2(1)=10+4=14, a2(2)=10, a2(3)=10
    assert(out(10L) == ((10L, null)) && out(20L) == ((4L, null)))
    assert(out(1L) == ((null, 14L)) && out(2L) == ((null, 10L)) && out(3L) == ((null, 10L)))
  }

  test("hits is deterministic under repartitioning and refuses zero rounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val e = Seq.fill(60)((rnd.nextInt(8).toLong, 100L + rnd.nextInt(8))).toDF("src", "dst")
    val a = sortedRows(graft.operators.Graph.hits(e.repartition(1), rounds = 2))
    val b = sortedRows(graft.operators.Graph.hits(e.repartition(7), rounds = 2))
    assert(a == b)
    assertThrows[IllegalArgumentException](graft.operators.Graph.hits(e, rounds = 0))
  }


  test("personalized PageRank: mass localizes at seeds, unreachable nodes score 0") {
    import spark.implicits._
    // chain 1→2→3 and an unreachable island 8→9; seed = {1}
    val e = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.operators.Graph.personalizedPageRank(e, seeds, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L)) // proximity ordering
    assert(out(8L) == 0L && out(9L) == 0L) // no teleport mass off-seed
    // determinism under partitioning
    val a = sortedRows(graft.operators.Graph.personalizedPageRank(
      e.repartition(1), seeds, iterations = 3))
    val b = sortedRows(graft.operators.Graph.personalizedPageRank(
      e.repartition(7), seeds, iterations = 3))
    assert(a == b)
    // seeds that are not graph nodes refuse
    assertThrows[IllegalArgumentException](
      graft.operators.Graph.personalizedPageRank(e, Seq(42L).toDF("node"), 2))
  }


  // --- strongly connected components ---

  /** Driver-side brute-force SCC: mutual reachability via boolean-matrix
    * closure — the oracle the distributed operator must match. */
  private def bruteScc(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    (0 until n).foreach(i => reach(i)(i) = true)
    (0 until n).foreach(k => (0 until n).foreach(i => (0 until n).foreach(j =>
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true)))
    (0 until n).map { v =>
      v.toLong -> (0 until n).filter(u => reach(v)(u) && reach(u)(v)).min.toLong
    }.toMap
  }

  test("scc: planted rings, chain DAG, bidirectional pair, singletons") {
    import spark.implicits._
    // ring 0-1-2-0, ring 10-11-10 (bidirectional pair), chain 2->10->20,
    // sink 20 (singleton), source 30 -> 0 (singleton)
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 10L),
      (2L, 10L), (10L, 20L), (30L, 0L)).toDF("src", "dst")
    val got = graft.operators.Graph.stronglyConnectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 30L -> 30L))
  }

  test("scc matches brute-force mutual reachability on a seeded random digraph") {
    import spark.implicits._
    val n = 36
    // deterministic pseudo-random edges: multiplicative-mix arithmetic
    val pairs = (0 until 150).map { i =>
      val a = (i * 2654435761L + 17) % n
      val b = (i * 40503L + 31) % n
      (a, b)
    }.filter { case (a, b) => a != b }.distinct
    val df = pairs.toDF("src", "dst")
    val got = graft.operators.Graph.stronglyConnectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = bruteScc(n, pairs)
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(got == expect.filter { case (v, _) => touched.contains(v) })
    // determinism under partitioning
    val got2 = graft.operators.Graph.stronglyConnectedComponents(df.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("scc: self-loops and duplicate edges are inert; exhaustion refuses") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 0L), (0L, 0L), (2L, 2L), (2L, 0L))
      .toDF("src", "dst")
    val got = graft.operators.Graph.stronglyConnectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    assertThrows[IllegalArgumentException](
      graft.operators.Graph.stronglyConnectedComponents(
        Seq((0L, 1L), (1L, 0L)).toDF("src", "dst"), maxOuterRounds = 16,
        maxFixpointRounds = 1))
  }

  test("link prediction matches a driver-side RA computation on a fuzzed graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val raw = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val edges = viaParquet(raw.toDF("src", "dst"))
    val got = graft.operators.Graph.predictLinks(edges, maxMiddleDegree = 64, k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // driver replay: adjacency sets, RA over common neighbors, existing
    // edges excluded, same (ra desc, a, b) top-k
    val und = raw.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val deg = adj.map { case (k2, v) => k2 -> v.size.toLong }
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      a <- nodes; b <- nodes if a < b && !und.contains((a, b))
      common = adj(a).intersect(adj(b)) if common.nonEmpty
    } yield (a, b, common.size.toLong, common.toSeq.map(z => 1000000L / deg(z)).sum))
      .sortBy { case (a, b, _, ra) => (-ra, a, b) }.take(15)
    assert(got == expected)
  }

  test("kTruss: clique survives, low-support structures peel, cascade converges") {
    import spark.implicits._
    // 5-clique (ids 1..5): every edge in 3 triangles; lone triangle 10-11-12
    // (support 1); staircase 20..27 (spine support ≤2, rungs 1); path 30-31-32
    val clique = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val stair = (20L to 26L).map(i => (i, i + 1)) ++ (20L to 25L).map(i => (i, i + 2))
    val path = Seq((30L, 31L), (31L, 32L))
    val edges = viaParquet((clique ++ tri ++ stair ++ path).toDF("src", "dst"))
    def truss(k: Int) = graft.operators.Graph.kTruss(edges, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truss(4) == clique.toSet, "4-truss = exactly the 5-clique")
    assert(truss(5) == clique.toSet, "5-clique edges sit in 3 triangles each")
    assert(truss(6).isEmpty, "nothing satisfies support >= 4")
    // at k=3 every edge in ≥ 1 triangle survives: the lone triangle AND
    // the whole staircase (its rungs have support 1) — only the path dies
    assert(truss(3) == clique.toSet ++ tri.toSet ++ stair.toSet)
    intercept[IllegalArgumentException](graft.operators.Graph.kTruss(edges, 2))
    intercept[IllegalArgumentException](
      graft.operators.Graph.kTruss(edges, 4, maxRounds = 1)) // cascade needs > 1 round
  }

  test("multiSourceBfs: exact distances on a path, horizon cut, disconnected absence") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a disconnected edge 100-101
    val edges = viaParquet(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (100L, 101L))
      .toDF("src", "dst"))
    val got = graft.operators.Graph.multiSourceBfs(edges, Seq(1L, 3L), horizon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = Map(
      (1L, 1L) -> 0L, (1L, 2L) -> 1L, (1L, 3L) -> 2L, // node 4 at dist 3 > horizon: absent
      (3L, 3L) -> 0L, (3L, 2L) -> 1L, (3L, 4L) -> 1L, (3L, 1L) -> 2L, (3L, 5L) -> 2L)
    assert(got == expected) // and never (seed, 100)/(seed, 101)
    // full horizon reaches the whole component with shortest distances
    val full = graft.operators.Graph.multiSourceBfs(edges, Seq(1L), horizon = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    intercept[IllegalArgumentException](
      graft.operators.Graph.multiSourceBfs(edges, Nil, 3))
  }

  test("weightedSssp: min-fold over a diamond, parallel-edge fold, refusals, unreachable absence") {
    import graft.operators.Graph
    // diamond: 1→2 (w 10) direct, but 1→3→2 costs 2+3=5; plus a tail 2→4 (w 1)
    val g = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L), (2L, 4L, 1L),
      (1L, 3L, 9L), // parallel edge: min(2, 9) = 2 must win
      (7L, 8L, 1L)) // disconnected: absent from seed 1
      .toDF("src", "dst", "w")
    val out = Graph.weightedSssp(viaParquet(g), Seq(1L), maxRounds = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 6L))
    // multi-seed: all seeds advance in the same rounds, per-seed tables
    val multi = Graph.weightedSssp(viaParquet(g), Seq(1L, 7L), maxRounds = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(multi((7L, 8L)) == 1L && !multi.contains((7L, 4L)) && multi((1L, 4L)) == 6L)
    // exhaustion refuses: the 1→3→2→4 wavefront needs 3 rounds
    val e = intercept[IllegalArgumentException](
      Graph.weightedSssp(viaParquet(g), Seq(1L), maxRounds = 2))
    assert(e.getMessage.contains("not converged"))
    // negative weight refuses up front
    val neg = viaParquet(Seq((1L, 2L, -1L)).toDF("src", "dst", "w"))
    intercept[IllegalArgumentException](Graph.weightedSssp(neg, Seq(1L)))
    intercept[IllegalArgumentException](Graph.weightedSssp(viaParquet(g), Nil))
  }

  test("weightedSssp matches a driver-side Dijkstra on a fuzzed weighted graph") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(315)
    val edges = (0 until 150).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong, (rnd.nextInt(9) + 1).toLong))
      .filter { case (a, b, _) => a != b }
    val want: Map[Long, Long] = {
      val adj = (edges.map { case (a, b, w) => (a, b, w) } ++
        edges.map { case (a, b, w) => (b, a, w) })
        .groupBy(_._1).map { case (k, es) => k -> es.map(e => (e._2, e._3)) }
      val dist = scala.collection.mutable.Map(0L -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(Ordering.by(-_._1))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (dist(u) == d) adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
        }
      }
      dist.toMap
    }
    val got = Graph.weightedSssp(viaParquet(edges.toDF("src", "dst", "w")), Seq(0L), maxRounds = 40)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("assortativity: hand-computed mixed graph, star is −1, regular graph is NULL") {
    import spark.implicits._
    def run(es: Seq[(Long, Long)]) =
      graft.operators.Graph.assortativity(viaParquet(es.toDF("src", "dst")))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).head
    // triangle a-b-c with pendant d on a: m=8, Σxy=38, Σx=18, Σxx=44
    // num = 8·38−324 = −20, den = 8·44−324 = 28 → −⌊20e6/28⌋ = −714285
    assert(run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))) == ((4L, Some(-714285L))))
    // star: perfectly disassortative
    assert(run(Seq((0L, 1L), (0L, 2L), (0L, 3L))) == ((3L, Some(-1000000L))))
    // 4-cycle: degree-regular → correlation undefined, not 0
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, None)))
  }

  test("clusteringDepth: hand-computed overlap profile with gaps and touching ranges") {
    import spark.implicits._
    // files: [0,9], [10,19] touch (no overlap); [15,24] overlaps the 2nd;
    // [40,49] leaves a gap 25..39 at depth 0
    val m = viaParquet(Seq((0L, 9L), (10L, 19L), (15L, 24L), (40L, 49L)).toDF("lo", "hi"))
    val out = graft.operators.Zorder.clusteringDepth(m, "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // segments: [0,10)=1, [10,15)=1, [15,20)=2, [20,25)=1, [25,40)=0, [40,50)=1
    // area = 10 + 5 + 10 + 5 + 0 + 10 = 40 over span 50 → 800000 ppm
    assert(out == ((4L, 2L, 800000L)))
    // a single file is depth 1 everywhere
    val one = graft.operators.Zorder.clusteringDepth(
      viaParquet(Seq((5L, 14L)).toDF("lo", "hi")), "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(one == ((1L, 1L, 1000000L)))
  }

  test("link prediction: the degree cap keeps a hub out of the wedge expansion") {
    import spark.implicits._
    // star: hub 0 adjacent to 1..50 (deg 50 > cap 8) plus a small clique
    // path 100-101-102; with the hub capped out, the only predicted link
    // is (100, 102) through middle 101
    val star = (1L to 50L).map(i => (0L, i))
    val edges = viaParquet((star ++ Seq((100L, 101L), (101L, 102L))).toDF("src", "dst"))
    val got = graft.operators.Graph.predictLinks(edges, maxMiddleDegree = 8, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((100L, 102L, 1L, 500000L)))
    assertThrows[IllegalArgumentException](
      graft.operators.Graph.predictLinks(edges, maxMiddleDegree = 1, k = 5))
  }
}
