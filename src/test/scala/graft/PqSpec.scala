package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.ml.Pq
import graft.plans.NearestCodewordL2

/** Product quantization component contracts (q208). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated integer clusters in 8 dims, 30 contiguous points each
  // (contiguous blocks so the rank-spread seeding lands one seed per cluster)
  private def cluster(i: Int): Long = i / 30L
  private def corpus = (0 until 90).map { i =>
    val center = cluster(i) * 100L
    val jitter = (i * 7) % 5 - 2L
    (i.toLong, Vector.tabulate(8)(d => center + jitter + d))
  }.toDF("vec_id", "qv")

  test("NearestCodewordL2 ties break to the smallest index; distances are exact-integer argmin") {
    val cb = Seq(Seq(5L, 5L), Seq(5L, 5L), Seq(0L, 0L))
    val df = Seq((1L, Seq(5L, 5L)), (2L, Seq(1L, 1L))).toDF("id", "v")
      .withColumn("c", ExprColumn(NearestCodewordL2(ExprColumn.expr(col("v")), cb)))
    val m = df.collect().map(r => r.getLong(0) -> r.getAs[Int]("c")).toMap
    assert(m(1L) == 0) // exact tie between codewords 0 and 1 → smallest index
    assert(m(2L) == 2)
  }

  test("training is deterministic under partitioning and separates the clusters") {
    val a = Pq.train(corpus, "vec_id", "qv", m = 2, k = 3, subDim = 4, iters = 2)
    val b = Pq.train(corpus.repartition(7, col("vec_id")), "vec_id", "qv",
      m = 2, k = 3, subDim = 4, iters = 2)
    assert(a.books == b.books)
    // after 2 rounds each codeword of subspace 0 should sit near one cluster center
    val firsts = a.books(0).map(_.head).sorted
    assert(firsts.zip(Seq(0L, 100L, 200L)).forall { case (got, want) =>
      math.abs(got - want) < 20
    }, firsts.toString)
  }

  test("ADC distance equals the sum of per-subspace table lookups of the encoded codes") {
    val cb = Pq.train(corpus, "vec_id", "qv", m = 2, k = 3, subDim = 4, iters = 2)
    val encoded = Pq.encode(corpus, "qv", cb).collect()
    val q = corpus.filter(col("vec_id") === 0L).collect().head.getSeq[Long](1)
    val tab = Pq.adcTable(q, cb)
    encoded.foreach { r =>
      val qv = r.getSeq[Long](1)
      val manual = (0 until cb.m).map { mi =>
        val code = r.getInt(2 + mi)
        val cw = cb.books(mi)(code)
        val qs = q.slice(mi * cb.subDim, (mi + 1) * cb.subDim)
        qs.zip(cw).map { case (x, y) => val d = x - y; d * d }.sum
      }.sum
      val viaTable = (0 until cb.m).map(mi => tab(mi)(r.getInt(2 + mi))).sum
      assert(manual == viaTable)
    }
  }

  test("PQ top-1 recalls the exact nearest cluster on separated data") {
    val cb = Pq.train(corpus, "vec_id", "qv", m = 2, k = 3, subDim = 4, iters = 2)
    val encoded = Pq.encode(corpus, "qv", cb)
    val q = corpus.filter(col("vec_id") === 5L).collect().head.getSeq[Long](1)
    val qdf = Seq((5L, Pq.adcTable(q, cb))).toDF("query_id", "tab")
    val top = encoded.crossJoin(broadcast(qdf))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", Pq.adcDistance(cb))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(1).collect().head
    // query 5 is in cluster 0; nearest neighbors share that cluster
    assert(cluster(top.getAs[Long]("vec_id").toInt) == cluster(5))
  }
}
