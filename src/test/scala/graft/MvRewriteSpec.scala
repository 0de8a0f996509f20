package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MaterializedView

/** Materialized-view automatic query rewrite: soundness (exact groups,
  * roll-up, group-column filters, global agg), the blocking rules
  * (non-derivable aggregates, non-group filters, staleness, conf off),
  * and exprId preservation under downstream operators. */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkSource(): String = {
    val dir = java.nio.file.Files.createTempDirectory("mv_src").toString + "/t"
    (1L to 400L).map(i => (s"g${i % 4}", s"h${i % 2}", i, i * 3))
      .toDF("g", "h", "x", "y")
      .repartition(4).write.mode("overwrite").parquet(dir)
    dir
  }

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withRule[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption("spark.graft.mv.rewrite")
    spark.conf.set("spark.graft.mv.rewrite", on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.mv.rewrite", v)
      case None => spark.conf.unset("spark.graft.mv.rewrite")
    }
  }

  test("exact-group and roll-up rewrites read the MV and match the direct answer") {
    val src = mkSource()
    val mv = src + "_mv"
    MaterializedView.create(spark, src, mv,
      groupCols = Seq("g", "h"), sums = Seq("x"), count = true, maxs = Seq("y"))
    try {
      val q = spark.read.parquet(src).groupBy("g", "h")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"), max("y").as("my"))
      assert(scans(q).contains("_mv"))
      assert(!scans(q).contains("/t]")) // base table not scanned
      val direct = withRule(false)(sortedRows(
        spark.read.parquet(src).groupBy("g", "h")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"), max("y").as("my"))))
      assert(sortedRows(q) == direct)
      // roll-up: subset group + filter on a group column commutes
      val roll = spark.read.parquet(src).filter(col("h") === "h1")
        .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(roll).contains("_mv"))
      val rollDirect = withRule(false)(sortedRows(
        spark.read.parquet(src).filter(col("h") === "h1")
          .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))))
      assert(sortedRows(roll) == rollDirect)
      // global aggregate (no grouping) also derives
      val glob = spark.read.parquet(src).agg(sum("x").as("sx"), count(lit(1)).as("n"))
      assert(scans(glob).contains("_mv"))
      assert(rows(glob) == Seq(Seq((1L to 400L).sum, 400L)))
      // exprIds survive downstream operators above the aggregate
      val above = spark.read.parquet(src).groupBy("g")
        .agg(sum("x").as("sx")).filter(col("sx") > 0).orderBy("g")
        .select(concat(col("g"), lit(":")).as("k"), col("sx"))
      assert(scans(above).contains("_mv"))
      assert(rows(above).size == 4)
    } finally MaterializedView.unregister(src)
  }

  test("blocking rules: non-derivable aggs, non-group filters, avg, conf off") {
    val src = mkSource()
    val mv = src + "_mv"
    MaterializedView.create(spark, src, mv,
      groupCols = Seq("g", "h"), sums = Seq("x"), count = true)
    try {
      // sum over a column the MV does not carry
      assert(!scans(spark.read.parquet(src).groupBy("g").agg(sum("y"))).contains("_mv"))
      // filter over a NON-group column must not commute
      val f = spark.read.parquet(src).filter(col("x") > 100).groupBy("g").agg(sum("x"))
      assert(!scans(f).contains("_mv"))
      // avg is not decomposable from (sum, count) in this rule — blocked
      assert(!scans(spark.read.parquet(src).groupBy("g").agg(avg("x"))).contains("_mv"))
      // distinct count blocked
      assert(!scans(spark.read.parquet(src).groupBy("g").agg(countDistinct("x"))).contains("_mv"))
      // conf gate
      withRule(false) {
        assert(!scans(spark.read.parquet(src).groupBy("g", "h").agg(sum("x"))).contains("_mv"))
      }
      // grouping by a non-MV column
      assert(!scans(spark.read.parquet(src).groupBy("x").agg(count(lit(1)))).contains("_mv"))
    } finally MaterializedView.unregister(src)
  }

  test("staleness: a changed source disables the MV until it is rebuilt") {
    val src = mkSource()
    val mv = src + "_mv"
    MaterializedView.create(spark, src, mv,
      groupCols = Seq("g"), sums = Seq("x"), count = true)
    try {
      def q() = spark.read.parquet(src).groupBy("g").agg(sum("x").as("sx"))
      assert(scans(q()).contains("_mv"))
      // append new data to the source → listing mismatch → MV dark
      Seq(("g9", "h9", 1000L, 1L)).toDF("g", "h", "x", "y")
        .write.mode("append").parquet(src)
      assert(!scans(q()).contains("_mv"))
      // the un-rewritten query sees the new row (no stale serve)
      assert(rows(q().filter(col("g") === "g9")) == Seq(Seq("g9", 1000L)))
      // rebuild re-enables
      MaterializedView.create(spark, src, mv,
        groupCols = Seq("g"), sums = Seq("x"), count = true)
      assert(scans(q()).contains("_mv"))
      assert(rows(q().filter(col("g") === "g9")) == Seq(Seq("g9", 1000L)))
    } finally MaterializedView.unregister(src)
  }
}
