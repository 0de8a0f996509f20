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

  /** Exact Gram matrix XᵀX over an int8-quantized embedding column — the
    * d×d second-moment table that feeds PCA/whitening/feature-correlation
    * audits, computable EXACTLY (BIGINT) over quantized vectors where the
    * float original would be row-order-dependent.
    *
    * Plan shape (the part that matters at 100 TB): NO JOIN — each row
    * expands to its d² coordinate pairs via two chained generates and the
    * partial aggregate folds them map-side into ≤ d(d+1)/2 groups inside
    * the same stage, so the shuffle carries d² cells per task, not rows.
    * The input is repartitioned with an EXPLICIT N first: the expansion is
    * d²× and AQE sizes partitions by input bytes, blind to it (a 500 KB
    * scan would otherwise run 20M expanded rows on one core). Generator
    * children are array_compact-wrapped so InferFiltersFromGenerate cannot
    * inline an expensive upstream projection below the Generate (the q78
    * trap); vectors must have no NULL elements (positions would shift).
    *
    * Returns the upper triangle (i ≤ j, 0-based): (i, j, g). */
  def gramMatrix(df: DataFrame, q8Col: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val rows = df.select(col(q8Col).as("__graft_q")).repartition(par)
    rows
      .select(col("__graft_q"), posexplode(array_compact(col("__graft_q"))))
      .select(col("pos").as("i"), col("col").cast("long").as("__graft_qi"), col("__graft_q"))
      .select(col("i"), col("__graft_qi"), posexplode(array_compact(col("__graft_q"))))
      .select(col("i"), col("pos").as("j"),
        (col("__graft_qi") * col("col").cast("long")).as("__graft_p"))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(col("__graft_p")).cast("long").as("g"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"), col("g"))
  }
}
