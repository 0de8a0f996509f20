package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans._

/** Every custom expression's generated Java must actually COMPILE.
  *
  * Spark's default codegen factory mode is FALLBACK: a Janino compile error
  * is logged and the expression silently runs interpreted — results stay
  * correct, plans still print WholeStageCodegen, and "interpreted == codegen"
  * DataFrame specs compare interpreted against interpreted. (Exactly this
  * shipped once: generated code referenced `catalyst.util.UnsafeArrayData`,
  * which does not exist — the real class lives in `catalyst.expressions` —
  * and every array-producing expression quietly fell back, disabling
  * whole-stage codegen for its stage.) `GenerateUnsafeProjection.generate`
  * has no fallback: it throws on compile failure, so this suite fails loudly
  * on any codegen regression, and then cross-checks the COMPILED projection
  * against the interpreted `eval` on a sample row. */
class CodegenCompileSpec extends AnyFunSuite {

  private def strArr(xs: String*): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def dblArr(xs: Double*): ArrayData = new GenericArrayData(xs.toArray[Any])

  private def compileAndCompare(expr: Expression, input: InternalRow): Unit = {
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
    val viaCodegen = proj(input).get(0, expr.dataType)
    val interpreted = expr.eval(input)
    (viaCodegen, interpreted) match {
      case (a: ArrayData, b: ArrayData) =>
        assert(a.toObjectArray(expr.dataType.asInstanceOf[ArrayType].elementType).toSeq ==
          b.toObjectArray(expr.dataType.asInstanceOf[ArrayType].elementType).toSeq, expr.prettyName)
      case (a, b) => assert(a == b, expr.prettyName)
    }
  }

  test("all custom expressions compile under no-fallback codegen and agree with interpreted eval") {
    val sArr = BoundReference(0, ArrayType(StringType), nullable = true)
    val dArr = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val str = BoundReference(0, StringType, nullable = true)
    val lng = BoundReference(0, LongType, nullable = true)

    val toks = InternalRow(strArr("the", "cat", "sat", "on", "the", "mat"))
    val vec = InternalRow(dblArr(0.5, -1.25, 2.0))
    val text = InternalRow(UTF8String.fromString("abcdefgh"))
    val key = InternalRow(Long.box(0x1234_5678_9ABCL))

    compileAndCompare(MinHashSignature(sArr, 8), toks)
    compileAndCompare(RollingHash64(sArr), toks)
    compileAndCompare(XxHash64Array(sArr), toks)
    compileAndCompare(SimHash64(sArr), toks)
    compileAndCompare(WindowHash64(sArr, 3), toks)
    compileAndCompare(CharWindowHashes(str, 3), text)
    compileAndCompare(CharWindowHashes(str, 5), text) // polynomial path
    compileAndCompare(
      LmSurprisal(str, Array(1L, 5L, 9L), Array(3L, 2L, 1L), 10L, 3), text)
    compileAndCompare(
      FloatVectorDot(dArr, BoundReference(1, ArrayType(DoubleType), nullable = true)),
      InternalRow(dblArr(1.0, 2.0), dblArr(3.0, 4.0)))
    compileAndCompare(NearestCentroidIndex(dArr, Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.5))), vec)
    compileAndCompare(MinSquaredDistance(dArr, Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.5))), vec)
    compileAndCompare(
      HyperplaneBuckets(dArr, Seq(Seq(1.0, -1.0, 0.5), Seq(-0.5, 2.0, 1.0)), planesPerBand = 1), vec)
    compileAndCompare(BloomContains(lng, Array.fill(16)(-1L), 5), key)
    compileAndCompare(MergeAdjacentPair(sArr, "the", "cat"), toks)
    compileAndCompare(MergeAdjacentPair(sArr, "x", "y"), toks) // no-match pass-through
    compileAndCompare(MergeAdjacentPair(sArr, "a", "a"),
      InternalRow(strArr("a", "a", "a"))) // greedy overlap: [aa, a]
    // decomposed e + combining acute (NFC composes), ligature ﬁ (NFKC expands)
    val messy = InternalRow(UTF8String.fromString("cafe\u0301 \uFB01sh"))
    compileAndCompare(UnicodeNormalize(str, "NFC"), messy)
    compileAndCompare(UnicodeNormalize(str, "NFKC"), messy)
    compileAndCompare(UnicodeNormalize(str, "NFC"), text) // ASCII fast path
    val lArr = BoundReference(0, ArrayType(LongType), nullable = true)
    val winHashes = InternalRow(new GenericArrayData(Array[Any](5L, 1L, 1L, 3L, -7L, 2L)))
    compileAndCompare(WinnowSelect(lArr, 3), winHashes)
    compileAndCompare(WinnowSelect(lArr, 8), winHashes) // short-array rule: w > m
    compileAndCompare(WinnowSelect(lArr, 1), winHashes) // w=1: every position selected
    compileAndCompare(GramHashes(sArr, 3), toks)
    compileAndCompare(GramHashes(sArr, 9), toks)  // cnt <= n whole-text gram
    compileAndCompare(GramHashes(sArr, 1), toks)
    // NULL inputs through the compiled path
    compileAndCompare(GramHashes(sArr, 3), InternalRow(null))
    compileAndCompare(WindowHash64(sArr, 3), InternalRow(null))
    compileAndCompare(UnicodeNormalize(str, "NFC"), InternalRow(null))
    compileAndCompare(LmSurprisal(str, Array(1L), Array(1L), 2L, 3), InternalRow(null))
  }

  test("gram_tf_vector compiles no-fallback and agrees with interpreted eval") {
    // struct-array output needs its own comparator: the compiled path yields
    // UnsafeRows, the interpreted path GenericInternalRows, and InternalRow
    // defines no structural equality across implementations
    val sArr = BoundReference(0, ArrayType(StringType), nullable = true)
    def pairs(v: Any): Seq[(Long, Long)] = {
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getLong(0), r.getLong(1))
      }
    }
    for ((input, n) <- Seq(
        (InternalRow(strArr("the", "cat", "sat", "on", "the", "mat", "the", "cat", "sat")), 3),
        (InternalRow(strArr("naïve", "κόσμος", "a")), 2), // multibyte slices
        (InternalRow(strArr("one", "two")), 3),           // cnt <= n whole-text gram
        (InternalRow(strArr()), 3),                       // empty tokenization
        (InternalRow(new GenericArrayData(
          Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("b")))), 2))) {
      val expr = GramTfVector(sArr, n)
      val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
      assert(pairs(proj(input).get(0, expr.dataType)) == pairs(expr.eval(input)),
        s"gram_tf_vector codegen/interpreted mismatch at n=$n")
    }
    // NULL array through the compiled path
    val exprNull = GramTfVector(sArr, 3)
    val projNull = GenerateUnsafeProjection.generate(Seq(exprNull))
    assert(projNull(InternalRow(null)).isNullAt(0) && exprNull.eval(InternalRow(null)) == null)
  }
}
