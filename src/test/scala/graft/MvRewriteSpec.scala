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

  test("txn-table MV: snapshot-keyed serving, incremental refresh, restore re-serves the old MV") {
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("mv_txn").toString
    val log = s"$root/_log"
    def fileOf(df: DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val base = (1L to 300L).map(i => (i % 5, i)).toDF("g", "v")
    TxnLog.commit(log, 0, Seq(fileOf(base, "f0")), Nil)
    MaterializedView.createForTxn(spark, log, s"$root/mv0", Seq("g"), sums = Seq("v"))
    try {
      def q(asOf: Long) = TxnLog.readAsOf(spark, log, asOf)
        .groupBy("g").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      assert(scans(q(0)).contains("mv0"))
      assert(sortedRows(q(0)) == withRule(false)(sortedRows(q(0))))
      // append a version: the head's file set no longer matches → base scan
      TxnLog.commit(log, 1, Seq(fileOf(Seq((7L, 1000L), (9L, 2000L)).toDF("g", "v"), "f1")), Nil)
      assert(!scans(q(1)).contains("mv0"))
      // incremental refresh: cost = the delta (2 rows), new MV serves head
      val (v, deltaRows) = MaterializedView.refreshIncremental(spark, log, s"$root/mv1")
      assert(v == 1L && deltaRows == 2L)
      assert(scans(q(1)).contains("mv1"))
      assert(sortedRows(q(1)) == withRule(false)(sortedRows(q(1))))
      // time travel: version 0 still serves its own MV
      assert(scans(q(0)).contains("mv0"))
      // RESTORE to 0: the head resolves to the old file set → mv0 serves again
      TxnLog.restore(spark, log, 0)
      assert(scans(q(2)).contains("mv0"))
      assert(sortedRows(q(2)) == withRule(false)(sortedRows(q(0))))
    } finally MaterializedView.clear()
  }

  test("incremental refresh folds a NULL group key instead of splitting it") {
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("mv_null").toString
    val log = s"$root/_log"
    def fileOf(df: DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val base = Seq((Some(1L), 10L), (None, 7L), (None, 3L)).toDF("g", "v")
    TxnLog.commit(log, 0, Seq(fileOf(base, "f0")), Nil)
    MaterializedView.createForTxn(spark, log, s"$root/mv0", Seq("g"), sums = Seq("v"))
    try {
      TxnLog.commit(log, 1,
        Seq(fileOf(Seq((Option.empty[Long], 5L), (Some(1L), 100L)).toDF("g", "v"), "f1")), Nil)
      MaterializedView.refreshIncremental(spark, log, s"$root/mv1")
      // the null-unsafe join left TWO rows for g = NULL (old side and delta
      // side never matched); the null-safe merge folds them into one
      val rows = spark.read.parquet(s"$root/mv1")
        .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(_._1.map(_.toString).getOrElse(""))
      assert(rows == Seq(
        (None, 15L, 3L), // 7 + 3 + 5, three NULL-keyed rows
        (Some(1L), 110L, 2L)))
    } finally MaterializedView.clear()
  }

  test("txn-table MV refresh under deletes: sums/counts fold, groups retire, min/max refuses") {
    import graft.sources.TxnLog
    val root = java.nio.file.Files.createTempDirectory("mv_txn_del").toString
    val log = s"$root/_log"
    def fileOf(df: DataFrame, name: String): String = {
      val d = s"$root/$name"
      df.coalesce(1).write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    }
    val base = (1L to 100L).map(i => (i % 4, i)).toDF("g", "v")
    TxnLog.commit(log, 0, Seq(fileOf(base, "f0")), Nil)
    MaterializedView.createForTxn(spark, log, s"$root/mv0", Seq("g"), sums = Seq("v"))
    try {
      // a CoW UPDATE (delete + insert pairs in the delta): rows keyed v%10==0
      // move to group 0
      TxnLog.mergeCopyOnWrite(spark, log, s"$root/m1",
        base.filter(col("v") % 10 === 0).select(lit(0L).as("g"), col("v")), "v")
      // and a pure DV delete wiping group 3 entirely
      TxnLog.deleteMergeOnRead(spark, log, s"$root/dv", col("g") === 3)
      val (_, _) = MaterializedView.refreshIncremental(spark, log, s"$root/mv2")
      val refreshed = spark.read.parquet(s"$root/mv2")
        .select("g", "sum_v", "cnt")
      val direct = TxnLog.readAsOfWithDeletes(spark, log, TxnLog.latestVersion(log).get)
        .groupBy("g").agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      assert(sortedRows(refreshed) == sortedRows(direct))
      // g=3 retired (all rows deleted; the merge's inserts were g=0)
      assert(refreshed.filter(col("g") === 3).isEmpty)
      // a min/max MV refuses to refresh across a delete delta
      MaterializedView.createForTxn(spark, log, s"$root/mvx", Seq("g"),
        sums = Nil, mins = Seq("v"))
      TxnLog.deleteMergeOnRead(spark, log, s"$root/dv2", col("v") === 2L)
      assertThrows[IllegalArgumentException](
        MaterializedView.refreshIncremental(spark, log, s"$root/mvy"))
    } finally MaterializedView.clear()
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
