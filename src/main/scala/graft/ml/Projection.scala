package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.plans.FloatVectorDot

/** Random-projection dimensionality reduction (Johnson–Lindenstrauss):
  * project d-dim embeddings to k dims with a RADEMACHER (±1) matrix —
  * Achlioptas 2003 showed ±1 entries preserve pairwise distances with the
  * same JL guarantee as Gaussians while needing no float matrix at all.
  * The usual prelude to ANN indexing / clustering when d is large.
  *
  * Scale + determinism design:
  *   - the sign matrix is DERIVED (an integer hash of (i, j, seed)), never
  *     materialized or shuffled — executors rebuild it from three longs;
  *   - each output dim is one [[FloatVectorDot]] against a ±1/√k constant
  *     vector: codegen'd index-order accumulation, map-side, zero shuffle;
  *   - ±1/√k times a float-widened input is an EXACT double product, and
  *     the fold order is fixed, so outputs are bit-stable across engines —
  *     the oracle replays them to the last ulp (√k is computed once on the
  *     driver and embedded as the same literal on both sides).
  */
object Projection {

  /** Deterministic Rademacher sign for matrix cell (i, j): +1 or -1. A
    * full splitmix64 finalizer ([[graft.plans.BloomHash.mix]]), not a bare
    * linear-congruential parity — linear schemes leave the projection ROWS
    * correlated, which visibly widens the JL distortion (caught by
    * ProjectionProfileSpec). Only the driver evaluates this; executors and
    * the oracle see the materialized ±1/√k rows. */
  def sign(i: Int, j: Int, seed: Long): Int = {
    val h = graft.plans.BloomHash.mix(
      (i + 1).toLong * 2654435761L + (j + 1).toLong * 2246822519L + seed * 40503L)
    if ((h & 1L) == 0L) 1 else -1
  }

  /** The j-th projection row: ±1/√outDims per input dim. */
  def signRow(inDims: Int, j: Int, outDims: Int, seed: Long): Array[Double] = {
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    Array.tabulate(inDims)(i => sign(i, j, seed) * scale)
  }

  /** Append `outDims` projection columns `<prefix>0 .. <prefix>{k-1}`. */
  def project(
      df: DataFrame,
      vecCol: String,
      inDims: Int,
      outDims: Int,
      seed: Long = 42L,
      prefix: String = "p"): DataFrame = {
    require(inDims >= 1 && outDims >= 1, s"projection dims must be positive: $inDims -> $outDims")
    val cols = (0 until outDims).map { j =>
      val row = signRow(inDims, j, outDims, seed)
      dot(col(vecCol), typedlit(row.toSeq)).as(s"$prefix$j")
    }
    df.select(col("*") +: cols: _*)
  }

  private def dot(a: Column, b: Column): Column =
    ExprColumn(FloatVectorDot(ExprColumn.expr(a), ExprColumn.expr(b)))
}
