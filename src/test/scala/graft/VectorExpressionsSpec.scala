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

  test("SQL-registered scoring trio matches the expression route; non-literal matrices refused") {
    import org.apache.spark.sql.graft.ExprColumn
    val df = Seq(
      (1L, Seq("the", "fox", "the"), Seq(1.0, 2.0)),
      (2L, Seq("lazy", "dog"), Seq(-3.0, 0.5)))
      .toDF("id", "toks", "vec")
    df.createOrReplaceTempView("graft_trio")
    // hashed_linear_score: SQL == expression route
    val viaSql = spark.sql(
      "SELECT id, hashed_linear_score(toks, 64) AS s FROM graft_trio ORDER BY id")
      .select("s").as[Long].collect().toSeq
    val viaExpr = df.orderBy("id")
      .select(ExprColumn(graft.plans.HashedLinearScore(ExprColumn.expr(col("toks")), 64)))
      .as[Long].collect().toSeq
    assert(viaSql == viaExpr)
    // nearest_centroid_idx with a literal matrix == expression route
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0))
    val idxSql = spark.sql(
      """SELECT id, nearest_centroid_idx(vec,
           array(array(1.0d, 0.0d), array(0.0d, 1.0d), array(-1.0d, 0.0d))) AS i
         FROM graft_trio ORDER BY id""").select("i").as[Int].collect().toSeq
    val idxExpr = df.orderBy("id")
      .select(ExprColumn(graft.plans.NearestCentroidIndex(ExprColumn.expr(col("vec")), cents)))
      .as[Int].collect().toSeq
    assert(idxSql == idxExpr && idxSql == Seq(1, 2))
    // hyperplane_buckets with a literal plane matrix == expression route
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val bSql = spark.sql(
      """SELECT id, hyperplane_buckets(vec, array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 2) AS b
         FROM graft_trio ORDER BY id""").select("b").as[Seq[Long]].collect().toSeq
    val bExpr = df.orderBy("id")
      .select(ExprColumn(graft.plans.HyperplaneBuckets(ExprColumn.expr(col("vec")), planes, 2)))
      .as[Seq[Long]].collect().toSeq
    assert(bSql == bExpr)
    // a data-dependent (non-foldable) matrix is rejected loudly: per-row
    // matrices would defeat the constant-codegen reference-object contract
    val e = intercept[Exception](spark.sql(
      "SELECT nearest_centroid_idx(vec, array(array(vec[0]))) FROM graft_trio").collect())
    assert(e.getMessage.contains("foldable") || e.getMessage.contains("literal"),
      e.getMessage)
  }
}
