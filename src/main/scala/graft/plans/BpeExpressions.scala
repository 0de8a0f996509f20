package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Whole-word BPE encoding as ONE scalar expression: input the word array of
  * a document, output the flattened token array after applying every learned
  * merge rule in rank order to every word.
  *
  * Semantics are EXACTLY the composed spelling it replaces (spec-enforced
  * equal):
  *
  *   flatten(transform(words, w =>
  *     merges.foldLeft(regexp_extract_all(w, '(.)', 1))(MergeAdjacentPair)))
  *
  * including the regex corner cases: the char split is by code point with
  * Java-regex line terminators (LF, CR, NEL U+0085, LS U+2028, PS U+2029)
  * skipped ('.' never matches them), and a null word nulls the whole result
  * (flatten of an array containing null is null).
  *
  * Why an expression: `transform` lambdas are interpreted — Catalyst
  * evaluates the k chained merge nodes per word through the expression
  * interpreter, plus a regex engine invocation per word for the char split.
  * Encoding is a pure per-row function, so it belongs in one tight JVM loop:
  * code-point split without the regex engine, k in-place merge passes over a
  * reused buffer, one output array. The merge table rides as a codegen
  * REFERENCE OBJECT — every learned vocabulary reuses one compiled shape
  * (the k-means-centroid lesson). q97 at sf0.1: 9.1 s with the lambda
  * spelling, sub-second with this node.
  */
case class BpeEncodeWords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  // merges as a flat String[] (l0, r0, l0+r0, l1, r1, l1+r1, ...): one
  // reference object, JVM-friendly indexing in the hot loop
  @transient private lazy val mergesFlat: Array[String] =
    merges.iterator.flatMap { case (l, r) => Iterator(l, r, l + r) }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"bpe_encode_words requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode_words"

  override def nullSafeEval(input: Any): Any =
    BpeEncodeWords.encodeAll(input.asInstanceOf[ArrayData], mergesFlat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergesFlat, "java.lang.String[]")
    // encodeAll can RETURN null (null word element → flatten-of-null
    // contract), so the body re-checks the value's nullity
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = graft.plans.BpeEncodeWords.encodeAll($arr, $mRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeWords {

  /** Full-document encode; null on a null word (flatten-of-null contract). */
  def encodeAll(words: ArrayData, mergesFlat: Array[String]): ArrayData = {
    val nWords = words.numElements()
    val out = new java.util.ArrayList[AnyRef](nWords * 4)
    var w = 0
    while (w < nWords) {
      if (words.isNullAt(w)) return null
      encodeWordInto(words.getUTF8String(w).toString, mergesFlat, out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  // the line terminators Java-regex '.' never matches
  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  private def encodeWordInto(
      word: String,
      mergesFlat: Array[String],
      out: java.util.ArrayList[AnyRef]): Unit = {
    // code-point split (regexp_extract_all(w, '(.)', 1) equivalent)
    var syms = new Array[String](Math.min(Math.max(word.length, 1), 16))
    var n = 0
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val len = Character.charCount(cp)
      if (!isLineTerminator(cp)) {
        if (n == syms.length) syms = java.util.Arrays.copyOf(syms, n * 2)
        syms(n) = word.substring(i, i + len)
        n += 1
      }
      i += len
    }
    // rank-order merge passes, in place (write index k never passes read rd)
    var m = 0
    while (m < mergesFlat.length) {
      val l = mergesFlat(m); val r = mergesFlat(m + 1); val lr = mergesFlat(m + 2)
      var rd = 0
      var k = 0
      while (rd < n) {
        if (rd < n - 1 && syms(rd) == l && syms(rd + 1) == r) {
          syms(k) = lr; rd += 2
        } else {
          syms(k) = syms(rd); rd += 1
        }
        k += 1
      }
      n = k
      m += 3
    }
    var j = 0
    while (j < n) {
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(syms(j)))
      j += 1
    }
  }
}
