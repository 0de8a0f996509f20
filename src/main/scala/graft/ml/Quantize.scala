package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization of embedding columns — the 4×
  * storage/bandwidth cut that makes 100 TB of float32 vectors shippable to
  * an ANN index (FAISS-style scalar quantization).
  *
  * Determinism contract (oracle-friendly): the quantizer is
  * `floor(x/scale + 0.5)` clamped to ±127 — floor on identical doubles, not
  * a banker's-rounding `round()` whose half-even ties differ across
  * engines; float→double widening is exact; the reconstruction error is a
  * FIXED-ORDER left fold over the vector (never a row-order aggregate of
  * doubles), so both engines evaluate the identical floating-point tree.
  *
  * All pure map-side column expressions — quantizing a corpus is a scan.
  * The per-element fold uses a higher-order function (interpreted —
  * Catalyst does not compile lambda bodies): acceptable here because the
  * fold is 64 multiply-adds per row in a cold path, not a join key. */
object Quantize {

  /** Adds `q8` (array<int>, clamped ±127), `scale` (double), and
    * `recon_err` (double, Σ|x − q·scale|). Zero vectors quantize to zeros
    * with scale 1 and error 0. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val xd = (x: Column) => x.cast("double")
    val withScale = df
      .withColumn("__graft_maxabs", array_max(transform(col(vecCol), x => abs(xd(x)))))
      .withColumn(
        "scale",
        when(col("__graft_maxabs") > 0, col("__graft_maxabs") / 127.0).otherwise(lit(1.0)))
    val quant = (x: Column) =>
      least(lit(127L), greatest(lit(-127L), floor(xd(x) / col("scale") + lit(0.5))))
    withScale
      .withColumn("q8", transform(col(vecCol), x => quant(x).cast("int")))
      .withColumn(
        "recon_err",
        aggregate(
          col(vecCol), lit(0.0),
          (acc, x) => acc + abs(xd(x) - quant(x).cast("double") * col("scale"))))
      .drop("__graft_maxabs")
  }
}
