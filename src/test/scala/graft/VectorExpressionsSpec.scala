package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native fvec_dot matches the HOF spelling exactly") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.5f, -1.5f), Seq(2.0f, 2.0f)))
      .toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val out = df.select(
      call_function("fvec_dot", col("a"), col("b")).as("native"),
      hof.as("hof"))
    assert(out.filter(abs(col("native") - col("hof")) > 1e-9).count() == 0)
    assert(out.select("native").as[Double].collect().toSeq == Seq(32.0, -2.0))
  }

  test("double arrays and mixed float/double arrays work") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0f, 4.0f))).toDF("d", "f")
    val out = df.select(
      call_function("fvec_dot", col("d"), col("d")).as("dd"),
      call_function("fvec_dot", col("d"), col("f")).as("df"))
      .collect().head
    assert(out.getDouble(0) == 5.0)
    assert(out.getDouble(1) == 11.0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]])).toDF("a", "b")
    val r = df.select(call_function("fvec_dot", col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("Similarity.dot routes through the native expression in this session") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val plan = df.select(Similarity.dot(col("a"), col("b"))).queryExecution.analyzed.toString
    assert(plan.contains("fvec_dot"))
    // and cosine of identical vectors is 1
    val c = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("graft_time_spine TVF: distributed Range-planned spine, exact bounds, refusals") {
    val r = spark.sql(
      """SELECT COUNT(*) AS n,
                MIN(unix_timestamp(ts)) AS lo, MAX(unix_timestamp(ts)) AS hi
         FROM graft_time_spine(TIMESTAMP'2024-01-01 00:00:00',
                               TIMESTAMP'2024-01-02 00:00:00', 3600)""").head()
    assert(r.getLong(0) == 24L) // [start, end) exclusive
    assert(r.getLong(1) == 1704067200L && r.getLong(2) == 1704067200L + 23 * 3600)
    // the spine is Range-planned (distributed generation), never a local relation
    val plan = spark.sql(
      "SELECT * FROM graft_time_spine(TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-01 01:00:00', 60)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Range"), plan)
    // empty spine when end <= start
    assert(spark.sql(
      "SELECT * FROM graft_time_spine(TIMESTAMP'2024-01-02 00:00:00', TIMESTAMP'2024-01-01 00:00:00', 60)")
      .count() == 0)
    // ragged step: ceil division covers the tail slot
    assert(spark.sql(
      "SELECT * FROM graft_time_spine(TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-01 00:01:30', 60)")
      .count() == 2)
    assertThrows[Exception](spark.sql(
      "SELECT * FROM graft_time_spine(TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-02 00:00:00', 0)").count())
  }

}
