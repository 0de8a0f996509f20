package graft

import org.apache.spark.sql.functions._

/** The DataSource V2 fixed-width source: schema from options, round-trip
  * fidelity, byte-level column pruning, scan-side filter skip (with Spark
  * re-checking — the returned-residual contract), and refusals. */
class FixedWidthSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): (String, org.apache.spark.sql.DataFrame) = {
    val df = Seq(
      (1L, 10L, 1234L, "alpha unit"),
      (2L, 20L, -55L, "beta"),
      (3L, 10L, 0L, "gamma ray"),
      (42L, 30L, 999999L, "delta")).toDF("id", "grp", "bal", "name")
    val dir = java.nio.file.Files.createTempDirectory("fw_spec").toString
    df.select(format_string("%6d%4d%10d%-12s", col("id"), col("grp"), col("bal"), col("name")).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    (dir, df)
  }

  private val fieldsOpt = "id:6:long,grp:4:long,bal:10:long,name:12:string"

  test("fixed-width round-trip: every typed value survives the format/parse cycle") {
    val (dir, df) = writeFixture()
    val back = spark.read.format("graft-fixedwidth").option("fields", fieldsOpt).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType.sql)).toSeq ==
      Seq(("id", "BIGINT"), ("grp", "BIGINT"), ("bal", "BIGINT"), ("name", "STRING")))
    assert(sortedRows(back) == sortedRows(df))
  }

  test("fixed-width column pruning reaches the scan (ReadSchema shows only requested slots)") {
    val (dir, _) = writeFixture()
    val q = spark.read.format("graft-fixedwidth").option("fields", fieldsOpt).load(dir)
      .select(col("name"))
    val plan = q.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints the pruned output attribute list
    assert(plan.contains("BatchScan graft-fixedwidth") && plan.contains("[name#"), plan)
    assert(!plan.contains("id#") && !plan.contains("bal#"), plan)
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha unit", "beta", "delta", "gamma ray"))
  }

  test("fixed-width filter pushdown: PushedFilters visible, results exact, residual re-checked") {
    val (dir, df) = writeFixture()
    val src = spark.read.format("graft-fixedwidth").option("fields", fieldsOpt).load(dir)
    val q = src.filter(col("grp") === 10L && col("bal") >= 0L).select(col("id"), col("name"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(grp,10"), plan)
    val expected = df.filter(col("grp") === 10L && col("bal") >= 0L).select(col("id"), col("name"))
    assert(sortedRows(q) == sortedRows(expected))
    // string comparison pushdown
    val s = src.filter(col("name") > "c").select(col("id"))
    assert(s.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 42L))
  }

  test("fixed-width refusals: missing fields option, bad type, bad width") {
    val (dir, _) = writeFixture()
    assertThrows[Exception](
      spark.read.format("graft-fixedwidth").load(dir).collect())
    assertThrows[Exception](
      spark.read.format("graft-fixedwidth").option("fields", "a:4:float").load(dir).collect())
    assertThrows[Exception](
      spark.read.format("graft-fixedwidth").option("fields", "a:0:long").load(dir).collect())
  }

  test("fixed-width DSv2 write: append round-trips exactly; over-wide values refuse") {
    import spark.implicits._
    val df = Seq((7L, "seven"), (-12L, "minus twelve")).toDF("k", "label")
    val dir = java.nio.file.Files.createTempDirectory("fw_write").toString + "/out"
    df.repartition(2).write.format("graft-fixedwidth")
      .option("fields", "k:6:long,label:14:string").mode("append").save(dir)
    val back = spark.read.format("graft-fixedwidth")
      .option("fields", "k:6:long,label:14:string").load(dir)
    assert(sortedRows(back) == sortedRows(df))
    // second append accumulates (append-only contract)
    df.limit(1).write.format("graft-fixedwidth")
      .option("fields", "k:6:long,label:14:string").mode("append").save(dir)
    assert(spark.read.format("graft-fixedwidth")
      .option("fields", "k:6:long,label:14:string").load(dir).count() == 3)
    // a value wider than its slot must refuse, not truncate
    val wide = Seq((1L, "this label is far wider than fourteen")).toDF("k", "label")
    assertThrows[Exception](
      wide.write.format("graft-fixedwidth")
        .option("fields", "k:6:long,label:14:string").mode("append").save(dir))
    // schema mismatch refuses before any file is touched
    val misnamed = Seq((1L, "x")).toDF("wrong", "label")
    assertThrows[Exception](
      misnamed.write.format("graft-fixedwidth")
        .option("fields", "k:6:long,label:14:string").mode("append").save(dir))
    // NULLs refuse: the format has no NULL marker, and silently writing a
    // NULL bigint as 0 / a NULL string as '' would corrupt the round-trip
    val withNullStr = Seq((1L, Option.empty[String]), (2L, Some("ok"))).toDF("k", "label")
    assertThrows[Exception](
      withNullStr.write.format("graft-fixedwidth")
        .option("fields", "k:6:long,label:14:string").mode("append").save(dir))
    val withNullLong = Seq((Option.empty[Long], "x")).toDF("k", "label")
    assertThrows[Exception](
      withNullLong.write.format("graft-fixedwidth")
        .option("fields", "k:6:long,label:14:string").mode("append").save(dir))
  }


  test("fixed-width aggregate pushdown: ungrouped count/min/max fold inside the scan") {
    val (dir, df) = writeFixture()
    val src = spark.read.format("graft-fixedwidth").option("fields", fieldsOpt).load(dir)
    val q = src.agg(count(lit(1)).as("n"), min(col("bal")).as("lo"), max(col("bal")).as("hi"))
    val plan = q.queryExecution.optimizedPlan.toString
    // partial-push shape: Spark's final merge over the scan's partial columns
    assert(plan.contains("count_star#") && plan.contains("min_bal#") &&
      plan.contains("sum(agg_func_0"), plan)
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, -55L, 999999L)))
    // grouped aggregates must NOT push (unsupported) and still be correct
    val g = src.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    assert(!g.queryExecution.optimizedPlan.toString.contains("count_star#"))
    assert(g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((10L, 2L), (20L, 1L), (30L, 1L)))
    // min over a string field must not push either
    val s = src.agg(min(col("name")))
    assert(!s.queryExecution.optimizedPlan.toString.contains("min_name#"))
    assert(s.head().getString(0) == "alpha unit")
  }

}
