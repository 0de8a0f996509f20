package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.operators.{Skyline, Sketches}
import graft.plans.{HashedLinearScore, Lineage, PlanChecks}

/** Pareto skyline, KMV theta-sketch overlap, hashed linear classifier, and
  * column lineage (q203–q207 component contracts). */
class SelectionLineageSpec extends SparkSpec {
  import spark.implicits._

  // deterministic scattered points with repeated x and exact (x, y) duplicates
  private def points = (1 to 300).map { i =>
    (i.toLong, ((i * 7919) % 50).toLong, ((i * 104729) % 40).toLong)
  }.toDF("id", "x", "y")

  test("skyline matches the quadratic dominance definition, ties and duplicates kept") {
    val pts = points.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.map(_._1).toSet
    val got = Skyline.pareto2d(points, "x", "y").select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("skyline plan: frontier joins back via broadcast, never a base self-join sort-merge") {
    val df = viaParquet(points)
    val out = Skyline.pareto2d(df, "x", "y")
    assert(PlanChecks.broadcastJoinCount(out) >= 1)
    val plans = PlanChecks.flatten(out).map(_.nodeName)
    assert(!plans.exists(_.contains("SortMergeJoin")), plans.mkString(", "))
  }

  test("KMV overlap is exact when k covers the union, and deterministic under partitioning") {
    // A = 1..60, B = 41..100 → |A∩B| = 20, |A∪B| = 100
    val df = ((1 to 60).map(("a", _)) ++ (41 to 100).map(("b", _)))
      .toDF("g", "v").withColumn("v", col("v").cast("long"))
    val k = 128
    val out = Sketches.kmvOverlap(Sketches.kmvSketches(df, "g", "v", k), k).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("kmv_common") == 20L)
    assert(r.getAs[Long]("union_kept") == 100L)
    assert(r.getAs[Long]("jaccard_est_ppm") == 200000L)
    val repart = Sketches.kmvOverlap(
      Sketches.kmvSketches(df.repartition(7, col("v")), "g", "v", k), k).collect()
    assert(repart.head.getAs[Long]("kmv_common") == 20L)
  }

  test("KMV estimate tracks true Jaccard within the sketch's error regime at small k") {
    val df = ((1 to 600).map(("a", _)) ++ (301 to 900).map(("b", _)))
      .toDF("g", "v").withColumn("v", col("v").cast("long"))
    // true Jaccard = 300/900 = 1/3
    val r = Sketches.kmvOverlap(Sketches.kmvSketches(df, "g", "v", 64), 64).collect().head
    val est = r.getAs[Long]("jaccard_est_ppm").toDouble / 1e6
    assert(r.getAs[Long]("union_kept") == 64L)
    assert(math.abs(est - 1.0 / 3.0) < 0.2, s"est=$est")
  }

  test("hashed linear score equals the explode+aggregate spelling; empty array is NULL") {
    val df = Seq(
      (1L, Seq("alpha", "beta", "alpha", "gamma")),
      (2L, Seq("delta")),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val viaExpr = df
      .withColumn("s", ExprColumn(HashedLinearScore(ExprColumn.expr(col("toks")), 4096)))
      .select("id", "s")
    val viaAgg = df
      .select(col("id"), explode(col("toks")).as("t"))
      .withColumn("w", expr("((xxhash64(t) % 4096 + 4096) % 4096) % 7 - 3"))
      .groupBy("id").agg(sum(col("w")).as("s"))
    val joined = viaExpr.join(viaAgg, Seq("id"), "left").collect()
    joined.foreach { r =>
      val a = if (r.isNullAt(1)) null else r.getLong(1)
      val b = if (r.isNullAt(2)) null else r.getLong(2)
      assert(a == b, s"id=${r.getLong(0)}: expr=$a agg=$b")
    }
    assert(joined.find(_.getLong(0) == 3L).exists(_.isNullAt(1)))
  }

  test("lineage folds projections, aggregates, joins and unions to leaf columns") {
    val dir = java.nio.file.Files.createTempDirectory("lineage_spec").toString
    Seq((1L, "x", 2.0)).toDF("k", "name", "v").write.mode("overwrite")
      .parquet(s"$dir/alpha.parquet")
    Seq((1L, 10L)).toDF("k", "m").write.mode("overwrite")
      .parquet(s"$dir/beta.parquet")
    val a = spark.read.parquet(s"$dir/alpha.parquet")
    val b = spark.read.parquet(s"$dir/beta.parquet")
    val out = a.join(b, "k")
      .filter(col("m") > 0)
      .groupBy(col("name").as("grp"))
      .agg(sum(col("v") * col("m")).as("wsum"), count(lit(1)).as("n"))
    val m = Lineage.columnSources(out).toMap
    assert(m("grp") == Seq("alpha.name"))
    assert(m("wsum") == Seq("alpha.v", "beta.m"))
    assert(m("n") == Seq.empty)

    val u = a.select(col("k"), col("v")).union(b.select(col("k"), col("m").cast("double")))
    val mu = Lineage.columnSources(u).toMap
    assert(mu("k") == Seq("alpha.k", "beta.k"))
    assert(mu("v") == Seq("alpha.v", "beta.m"))
  }
}
