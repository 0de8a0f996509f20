package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-window hashing + LM-surprisal kernels, shared by the
  * interpreted and generated paths of the expressions below (one loop body,
  * two callers — the same no-drift strategy as [[BloomHash]]).
  *
  * Window identity for n ≤ 3 is INJECTIVE: the hash packs the window's
  * UTF-16 units as base-2²¹ digits (3·21 = 63 bits, every unit < 2¹⁶ <
  * 2²¹), so two windows hash equal iff they ARE equal — hash-keyed
  * grouping/lookup is exactly string-keyed grouping, no collision caveat.
  * For n > 3 it falls back to a wrapping polynomial in an odd 64-bit base
  * (distinct windows collide with probability ~2⁻⁶⁴ — the shared contract
  * of every hashed-key pipeline here).
  *
  * Windows are over UTF-16 code units (the kernel walks a materialized
  * Java string); on the normalized [a-z0-9 ] domain every unit is one
  * character, which is the intended use. */
object LmKernel {
  private val PolyB = 0x9E3779B97F4A7C15L // odd => invertible mod 2^64

  def windowHash(s: String, start: Int, n: Int): Long = {
    var h = 0L
    var k = 0
    if (n <= 3) {
      while (k < n) { h = (h << 21) | s.charAt(start + k); k += 1 }
    } else {
      while (k < n) { h = h * PolyB + s.charAt(start + k); k += 1 }
    }
    h
  }

  /** All window hashes of `s` — length max(0, L−n+1). */
  def windowHashes(s: UTF8String, n: Int): Array[Long] = {
    val str = s.toString
    val len = str.length
    if (len < n) return Array.emptyLongArray
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i < out.length) { out(i) = windowHash(str, i, n); i += 1 }
    out
  }

  /** One-pass per-document score against a sorted model: returns
    * `[n_grams, surprisal]` where surprisal sums the integer
    * `floor(log₂(numer div (cnt+1)))` of every window (cnt = 0 for
    * out-of-vocabulary windows). `hashes` MUST be sorted ascending
    * (signed) and aligned with `counts`. */
  def score(s: UTF8String, hashes: Array[Long], counts: Array[Long], numer: Long, n: Int): Array[Long] = {
    val str = s.toString
    val len = str.length
    if (len < n) return Array(0L, 0L)
    val wins = len - n + 1
    var surp = 0L
    var i = 0
    while (i < wins) {
      val h = windowHash(str, i, n)
      val idx = java.util.Arrays.binarySearch(hashes, h)
      val cnt = if (idx >= 0) counts(idx) else 0L
      val q = numer / (cnt + 1)
      // q >= 1 whenever the model is non-empty (cnt+1 <= total+vocab);
      // an EMPTY model (numer = 0) scores every window 0 — same as the
      // integer replay `length(bin(0)) - 1`
      if (q > 0) surp += 63 - java.lang.Long.numberOfLeadingZeros(q)
      i += 1
    }
    Array(wins.toLong, surp)
  }
}

/** All character n-window hashes of a string — `array<long>` of length
  * L−n+1 (EMPTY, not NULL, for shorter strings — mirroring
  * `charNgramsStrict`, whose exploded rows these hashes replace).
  * The codegen'd replacement for the interpreted
  * `transform(sequence(...), substr)` spelling, whose per-window lambda
  * interpretation + substring allocation dominated the LM pipelines
  * (profiled ~2 s of q90's 2.4 s at sf0.1). Used by `trainCharLm`'s
  * explode→groupBy; scoring skips the explode entirely via
  * [[LmSurprisal]]. */
case class CharWindowHashes(child: Expression, windowSize: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (windowSize < 1)
      TypeCheckResult.TypeCheckFailure(s"char_window_hashes: window size $windowSize must be >= 1")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"char_window_hashes requires string, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LmKernel.windowHashes(input.asInstanceOf[UTF8String], windowSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.plans.LmKernel.windowHashes($s, $windowSize));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-document LM surprisal as ONE map-side expression —
  * `array<long> [n_grams, surprisal]` per document.
  *
  * The IVF-centroid pattern applied to a language model: the
  * vocabulary-bounded model (sorted window-hash array + aligned counts) is
  * a codegen REFERENCE object, so scoring is a scan-stage loop with a
  * binary-search lookup per window — no explode (L rows per document), no
  * broadcast join, no doc-id groupBy. The three-exchange pipeline this
  * replaces is kept in spec as the equivalence oracle. Generated source is
  * constant whatever the model, so retraining never recompiles codegen. */
case class LmSurprisal(
    child: Expression,
    hashes: Array[Long],
    counts: Array[Long],
    numer: Long,
    windowSize: Int) extends UnaryExpression {

  require(hashes.length == counts.length,
    s"lm_surprisal: ${hashes.length} hashes vs ${counts.length} counts")
  require(numer >= 0, s"lm_surprisal: numer must be >= 0, got $numer")

  override def checkInputDataTypes(): TypeCheckResult =
    if (windowSize < 1)
      TypeCheckResult.TypeCheckFailure(s"lm_surprisal: window size $windowSize must be >= 1")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"lm_surprisal requires string, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lm_surprisal"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LmKernel.score(
      input.asInstanceOf[UTF8String], hashes, counts, numer, windowSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("lmHashes", hashes, "long[]")
    val c = ctx.addReferenceObj("lmCounts", counts, "long[]")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.plans.LmKernel.score($s, $h, $c, ${numer}L, $windowSize));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
