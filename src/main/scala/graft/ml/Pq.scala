package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.plans.NearestCodewordL2

/** Product quantization (Jégou et al., TPAMI '11) over integer-quantized
  * embeddings — the codes-in-memory ANN scale path beyond IVF (q32): a
  * D-dim vector becomes M sub-codes from per-subspace codebooks, and query
  * distances are M table lookups per candidate (ADC) instead of D
  * multiplies, over a corpus representation ~D·4/M bytes-per-vector smaller.
  *
  * graft's variant is INTEGER-EXACT end to end, which is what makes it
  * oracle-checkable: vectors are floor-quantized to a small integer grid
  * first (the same move as q108's int8 compression), codebook training is
  * Lloyd iterations whose means are `floor(sum/count)` of exact integers
  * (IEEE-deterministic: exact-int ÷ exact-int, then floor), assignment is
  * integer L2² with strict-< smallest-index tie-break
  * ([[graft.plans.NearestCodewordL2]] — a codegen expression with the
  * codebook as reference object), and ADC distances are BIGINT sums of
  * BIGINT table entries. DuckDB replays every stage bit-for-bit.
  *
  * Scale shape: TRAINING runs on a bounded sample (as in production PQ —
  * codebooks are KB-sized and converge on samples; here the driver loop
  * aggregates sums/counts per codeword, shuffling M·K·subDim longs, never
  * vectors). ENCODING — the 100 TB pass — is M map-side codegen argmin
  * columns, zero shuffle. ADC queries broadcast a (queries × M × K)
  * lookup table and scan codes map-side; top-k rides the custom TopK
  * physical operator (bounded heaps, one exchange).
  */
object Pq {

  /** M codebooks of K codewords each, subDim integers per codeword. */
  case class Codebooks(m: Int, k: Int, subDim: Int, books: Vector[Vector[Vector[Long]]])

  /** Floor-quantize a float/double vector column to the integer grid
    * `floor(x * scale)` as `array<long>` — exact in both engines. */
  def quantized(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  private def subvec(qv: Column, m: Int, subDim: Int): Column =
    slice(qv, m * subDim + 1, subDim)

  /** Train codebooks with `iters` integer-Lloyd rounds. Seeds are the
    * quantized subvectors of the rows at ranks 1 + c·(N div K) in `idCol`
    * order — deterministic and spread across the id range. Empty clusters
    * keep their previous codeword. `df` should be a bounded sample at
    * corpus scale; it is cached for the duration of the loop. */
  def train(
      df: DataFrame,
      idCol: String,
      qvCol: String,
      m: Int,
      k: Int,
      subDim: Int,
      iters: Int): Codebooks = {
    import org.apache.spark.sql.expressions.Window
    val corpus = df.select(col(idCol).as("__pq_id"), col(qvCol).as("__pq_qv")).cache()
    val n = corpus.count()
    require(n >= k, s"Pq.train: need at least k=$k rows, got $n")
    val step = n / k
    val seedRanks = (0 until k).map(c => 1L + c * step).toSet
    val seeds = corpus
      .withColumn("__pq_rk", row_number().over(Window.orderBy(col("__pq_id"))))
      .filter(col("__pq_rk").isin(seedRanks.toSeq: _*))
      .orderBy("__pq_rk")
      .select("__pq_qv")
      .collect()
      .map(_.getSeq[Long](0).toVector)
    var books: Vector[Vector[Vector[Long]]] =
      Vector.tabulate(m, k)((mi, c) => seeds(c).slice(mi * subDim, (mi + 1) * subDim))
    for (_ <- 1 to iters) {
      books = Vector.tabulate(m) { mi =>
        val assigned = corpus.withColumn(
          "__pq_code",
          ExprColumn(NearestCodewordL2(
            ExprColumn.expr(subvec(col("__pq_qv"), mi, subDim)), books(mi))))
        val sums = (0 until subDim).map(d =>
          sum(element_at(col("__pq_qv"), mi * subDim + d + 1)).as(s"s$d"))
        val stats = assigned
          .groupBy(col("__pq_code"))
          .agg(count(lit(1)).as("cnt"), sums: _*)
          .collect()
          .map(r => r.getInt(0) -> r)
          .toMap
        Vector.tabulate(k) { c =>
          stats.get(c) match {
            case Some(r) =>
              val cnt = r.getAs[Long]("cnt")
              Vector.tabulate(subDim)(d =>
                math.floor(r.getAs[Long](s"s$d").toDouble / cnt).toLong)
            case None => books(mi)(c) // empty cluster: keep previous codeword
          }
        }
      }
    }
    corpus.unpersist()
    Codebooks(m, k, subDim, books)
  }

  /** Append `code_0 … code_{M−1}` int columns — the map-side encode pass. */
  def encode(df: DataFrame, qvCol: String, cb: Codebooks): DataFrame =
    (0 until cb.m).foldLeft(df) { (acc, mi) =>
      acc.withColumn(
        s"code_$mi",
        ExprColumn(NearestCodewordL2(
          ExprColumn.expr(subvec(col(qvCol), mi, cb.subDim)), cb.books(mi))))
    }

  /** The ADC lookup table of one quantized query vector: T(m)(c) =
    * ‖q_m − codeword_{m,c}‖² as exact longs. */
  def adcTable(qv: Seq[Long], cb: Codebooks): Seq[Seq[Long]] =
    Vector.tabulate(cb.m, cb.k) { (mi, c) =>
      val q = qv.slice(mi * cb.subDim, (mi + 1) * cb.subDim)
      val w = cb.books(mi)(c)
      q.zip(w).map { case (a, b) => val d = a - b; d * d }.sum
    }

  /** ADC distance column over an encoded frame, given the broadcast
    * `tab` column (array<array<long>>, M × K): Σ_m tab[m][code_m]. A
    * fixed M-term codegen expression — no higher-order functions. */
  def adcDistance(cb: Codebooks): Column =
    (0 until cb.m)
      .map(mi => element_at(element_at(col("tab"), mi + 1), col(s"code_$mi") + 1))
      .reduce(_ + _)
}
