package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Shared shape checks for the centroid-loop expressions. */
private[plans] trait VectorInput { self: UnaryExpression =>
  protected def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  protected def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Index of the cosine-nearest centroid (argmax of `x·c / ||c||` — the
  * row's own norm is a common positive factor and cancels out of the
  * argmax). Exact-similarity ties break toward the LARGER index, so callers
  * wanting the reference "larger centroid id wins" semantics must pass
  * centroids sorted by id ascending.
  *
  * Why a custom expression: the unrolled spelling (`array_max` over one
  * `struct(fvec_dot(x, lit(c)) / ||c||, id)` per centroid) generates source
  * whose size — and, for k-means, whose TEXT — changes with the centroid
  * set, so every Lloyd iteration and every k-means|| round forces a fresh
  * Janino compile of a large method (~10 s of the cold q32 run). Here the
  * matrix is a codegen REFERENCE object: the generated source is a small
  * constant double loop, identical for every centroid set, so Spark's
  * codegen cache compiles it exactly once per JVM. Same story at 100 TB:
  * assignment stays a zero-shuffle map-side argmax with O(1) plan size.
  *
  * Value contract (spec-enforced): bit-identical to the unrolled spelling —
  * same accumulation order as `fvec_dot`, same `dot / norm` division (not a
  * multiply by the inverse), zero-norm centroids score with norm 1.
  * Divergence: an all-NaN similarity row (NaN-containing vector) never
  * updates the running best, so the result is clamped to index 0 — a
  * defined, deterministic assignment — where the unrolled `array_max`
  * ranked NaN above everything (an arbitrary assignment) and an unclamped
  * -1 would crash the caller's `element_at(ids, idx + 1)` projection. */
case class NearestCentroidIndex(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with VectorInput {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!elemOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_idx requires array<float>/array<double>, got ${child.dataType.sql}")
    else if (centroids.isEmpty)
      TypeCheckResult.TypeCheckFailure("nearest_centroid_idx: empty centroid set")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_idx"

  @transient private lazy val matrix: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] = matrix.map { v =>
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) 1.0 else n
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = childIsFloat
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (isF) v.getFloat(i).toDouble else v.getDouble(i)) * cv(i)
        i += 1
      }
      val sim = acc / norms(c)
      if (sim >= bestSim) { bestSim = sim; best = c }
      c += 1
    }
    if (best < 0) 0 else best // all-NaN sims: defined assignment, not -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    val nm = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    val getV = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val sim = ctx.freshName("sim")
      val best = ctx.freshName("best"); val bestSim = ctx.freshName("bestSim")
      val cv = ctx.freshName("cv")
      s"""
         |int $best = -1;
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  final double[] $cv = $m[$c];
         |  final int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $v.$getV($i) * $cv[$i];
         |  }
         |  final double $sim = $acc / $nm[$c];
         |  if ($sim >= $bestSim) { $bestSim = $sim; $best = $c; }
         |}
         |${ev.value} = $best < 0 ? 0 : $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH band buckets: one packed sign-bit bucket value per
  * band, computed map-side from the row's own vector — `array<long>` of
  * length `planes.length / planesPerBand`, where bucket_b bit p is set iff
  * `dot(x, plane_{b,p}) >= 0`.
  *
  * Replaces the posexplode → 32 sum-aggregates → join-back-to-vectors
  * spelling (two shuffles) with a zero-shuffle scan-stage loop; the plane
  * matrix is a codegen reference object (constant source, compiled once).
  *
  * Value contract (spec-enforced): accumulation in index order, strict
  * `>= 0` sign rule — bit-identical to the aggregate spelling (posexplode
  * emits a document's components contiguously, so its partial sums also
  * accumulated in index order). NULL or EMPTY vectors yield NULL: the
  * aggregate form never emitted projection rows for them, so they must not
  * acquire buckets here either. */
case class HyperplaneBuckets(child: Expression, planes: Seq[Seq[Double]], planesPerBand: Int)
    extends UnaryExpression with VectorInput {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!elemOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets requires array<float>/array<double>, got ${child.dataType.sql}")
    else if (planes.isEmpty || planesPerBand <= 0 || planes.length % planesPerBand != 0)
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets: ${planes.length} planes not divisible into bands of $planesPerBand")
    else if (planesPerBand > 64)
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets: planesPerBand=$planesPerBand exceeds the 64 sign bits a long bucket holds")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true // empty vector → NULL
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val matrix: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    if (nv == 0) return null
    val isF = childIsFloat
    val bands = matrix.length / planesPerBand
    val out = new Array[Long](bands)
    var p = 0
    while (p < matrix.length) {
      val w = matrix(p)
      val n = math.min(nv, w.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (isF) v.getFloat(i).toDouble else v.getDouble(i)) * w(i)
        i += 1
      }
      if (acc >= 0) out(p / planesPerBand) |= 1L << (p % planesPerBand)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, "double[][]")
    val getV = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val nv = ctx.freshName("nv"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc"); val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      s"""
         |final int $nv = $v.numElements();
         |if ($nv == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $out = new long[${matrix.length / planesPerBand}];
         |  for (int $p = 0; $p < $m.length; $p++) {
         |    final double[] $w = $m[$p];
         |    final int $n = java.lang.Math.min($nv, $w.length);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $v.$getV($i) * $w[$i];
         |    }
         |    if ($acc >= 0) $out[$p / $planesPerBand] |= 1L << ($p % $planesPerBand);
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared euclidean distance to the nearest of a centroid/candidate set,
  * clamped at 0 — the k-means|| cost term `d²(x, C)`. Same
  * reference-object/codegen-cache rationale as [[NearestCentroidIndex]]:
  * the k-means|| candidate set grows every round, and the unrolled
  * `array_min` spelling recompiled per round.
  *
  * Value contract: bit-identical to
  * `greatest(array_min(array(xx - 2.0*dot(x,c) + cc, ...)), 0.0)` —
  * per-term `(xx - 2·acc) + cc` association, min over terms, single final
  * clamp. */
case class MinSquaredDistance(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with VectorInput {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!elemOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"min_sqdist requires array<float>/array<double>, got ${child.dataType.sql}")
    else if (centroids.isEmpty)
      TypeCheckResult.TypeCheckFailure("min_sqdist: empty centroid set")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def prettyName: String = "min_sqdist"

  @transient private lazy val matrix: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val sqNorms: Array[Double] = matrix.map(_.map(x => x * x).sum)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = childIsFloat
    val nv = v.numElements()
    var xx = 0.0
    var i = 0
    while (i < nv) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      xx += x * x
      i += 1
    }
    var best = Double.PositiveInfinity
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      val n = math.min(nv, cv.length)
      var acc = 0.0
      i = 0
      while (i < n) {
        acc += (if (isF) v.getFloat(i).toDouble else v.getDouble(i)) * cv(i)
        i += 1
      }
      val d2 = (xx - 2.0 * acc) + sqNorms(c)
      if (d2 < best) best = d2
      c += 1
    }
    if (best < 0.0) 0.0 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    val cc = ctx.addReferenceObj("centroidSqNorms", sqNorms, "double[]")
    val getV = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best"); val xx = ctx.freshName("xx")
      val nv = ctx.freshName("nv"); val x = ctx.freshName("x"); val cv = ctx.freshName("cv")
      s"""
         |final int $nv = $v.numElements();
         |double $xx = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  final double $x = (double) $v.$getV($i);
         |  $xx += $x * $x;
         |}
         |double $best = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  final double[] $cv = $m[$c];
         |  final int $n = java.lang.Math.min($nv, $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $v.$getV($i) * $cv[$i];
         |  }
         |  final double $d2 = ($xx - 2.0 * $acc) + $cc[$c];
         |  if ($d2 < $best) $best = $d2;
         |}
         |${ev.value} = $best < 0.0 ? 0.0 : $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer-exact L2² codeword argmin — the product-quantization assignment
  * kernel. Child is an `array<long>` (a QUANTIZED subvector); the codeword
  * table rides as a codegen REFERENCE OBJECT (never an iteration-varying
  * literal in the expression tree — same Janino-compile-stability rule as
  * [[NearestCentroidIndex]]), and the squared distances are plain JVM long
  * arithmetic, so assignment is bit-reproducible in any engine that
  * replays the same integers (the DuckDB oracle does, term by term).
  *
  * Tie-break: STRICT `<`, so equal distances keep the SMALLEST codeword
  * index — the oracle's `ORDER BY dist, c` replays it exactly. One
  * primitive (K × dims) loop per row in the scan stage: PQ encoding of a
  * 100 TB corpus is map-side, zero shuffle. */
case class NearestCodewordL2(child: Expression, codewords: Seq[Seq[Long]])
    extends UnaryExpression {

  require(codewords.nonEmpty, "nearest_codeword_l2: empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"nearest_codeword_l2 requires array<long>, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_codeword_l2"

  @transient private lazy val matrix: Array[Array[Long]] = codewords.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = v.getLong(i) - cv(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("codewordMatrix", matrix, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val cv = ctx.freshName("cv")
      s"""
         |int $best = 0;
         |long $bestD = Long.MAX_VALUE;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  final long[] $cv = $m[$c];
         |  final int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = $v.getLong($i) - $cv[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact-integer squared L2 distance from an `array<long>` column to ONE
  * fixed point — the inner kernel of the greedy k-center loop, where each
  * round updates a running min-distance with `least(d, sqdist(qv, newPick))`.
  * The point rides as a codegen reference object (it changes every round —
  * embedding it as a literal would Janino-recompile per round, the q57
  * lesson), and the arithmetic is plain JVM longs, bit-replayable in SQL
  * as an explicit term sum. */
case class SqDistL2(child: Expression, point: Seq[Long]) extends UnaryExpression {

  require(point.nonEmpty, "sqdist_l2: empty point")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sqdist_l2 requires array<long>, got ${t.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sqdist_l2"

  @transient private lazy val p: Array[Long] = point.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), p.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = v.getLong(i) - p(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pt = ctx.addReferenceObj("sqdistPoint", p, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $pt.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $d = $v.getLong($i) - $pt[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
