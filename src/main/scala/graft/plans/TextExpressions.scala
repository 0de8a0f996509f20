package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Map-side MinHash signature: the k-way min over universal hashes
  * `(a_i * (xxhash64(shingle) mod p) + b_i) mod p` of every element of a
  * shingle array, computed as ONE scalar codegen expression returning
  * `array<long>` of length k.
  *
  * Why an expression and not an aggregate: the aggregate spelling
  * (explode shingles → groupBy(doc) → k codegen'd `min`s) computes identical
  * values but costs a shuffle of (id, k longs) per document, k-wide
  * aggregation buffers, and a k-agg generated function whose Janino compile
  * time grows with k. Per document the signature is a pure function of its
  * own shingle array — so it belongs in the map stage: a tight
  * (shingles × k) primitive loop per row, zero shuffle, and the whole LSH
  * pipeline up to the bucket self-join becomes shuffle-free. At 100 TB that
  * removes the single biggest exchange of the near-dup pipeline.
  *
  * Value-compatibility contract (spec-enforced): bit-identical to the
  * aggregate spelling with the same coefficients — `h = pmod(xxhash64(s), p)`
  * (seed 42, Spark's own XXH64 over the UTF8 bytes), null shingle elements
  * hash like `xxhash64(NULL)` (= the seed), empty arrays yield NULL (the
  * aggregate form drops empty docs at explode).
  *
  * Reference semantics: MinHash/LSH as in Broder '97; the reference repo has
  * no equivalent operator (dedup family is a graft extension).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1; keeps a*h+b < 2^62, overflow-free
  private val Seed = 42L      // Spark's xxhash64 default seed

  // The same deterministic universal-hash coefficients as the aggregate
  // spelling (single source of truth in Dedup) — derived, not stored, so
  // case-class equality stays structural (array fields would compare by
  // reference and defeat Catalyst subexpression elimination).
  @transient private lazy val coefs = graft.text.Dedup.minhashCoefs(numHashes)
  @transient private lazy val a: Array[Long] = coefs.map(_._1).toArray
  @transient private lazy val b: Array[Long] = coefs.map(_._2).toArray

  /** `array<long>` children carry PRE-HASHED shingles (raw `xxhash64`
    * values, e.g. from [[XxHash64Array]]) — signatures are then identical
    * to hashing the strings here. */
  private def preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig: numHashes must be positive, got $numHashes")
    case t =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string> or array<long>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle array → NULL
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val hashed = preHashed
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val raw =
        if (arr.isNullAt(j)) Seed
        else if (hashed) arr.getLong(j)
        else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      var h = raw % P
      if (h < 0) h += P
      var i = 0
      while (i < numHashes) {
        val v = (a(i) * h + b(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    val rawOf =
      if (preHashed) (arr: String, j: String) => s"$arr.getLong($j)"
      else (arr: String, j: String) =>
        s"org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($arr.getUTF8String($j), ${Seed}L)"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = ($arr.isNullAt($j) ? ${Seed}L : ${rawOf(arr, j)}) % ${P}L;
         |    if ($h < 0) $h += ${P}L;
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling (polynomial) hash of a token array:
  * `h = Σ_i pmod(xxhash64(tok_i), p) · 31^i  mod p`, p = 2^31−1 — the
  * order-sensitive document fingerprint. One scan-stage loop with an
  * incrementally maintained power (`pw = pw·31 mod p`, every product
  * < 2^62), replacing the posexplode + three 4096-entry power tables +
  * groupBy spelling: modular integer sums are order-exact, so the values
  * are identical by construction, and the per-document shuffle disappears.
  * Empty arrays hash to 0 (callers `coalesce(…, 0)` the NULL-array case to
  * match the aggregate form's posexplode_outer behavior). */
case class RollingHash64(child: Expression) extends UnaryExpression {

  private val P = 2147483647L
  private val Seed = 42L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash64 requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var h = 0L
    var pw = 1L
    var j = 0
    while (j < n) {
      val raw = if (arr.isNullAt(j)) Seed else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      var t = raw % P
      if (t < 0) t += P
      h = (h + t * pw) % P
      pw = pw * 31L % P
      j += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val pw = ctx.freshName("pw")
      val t = ctx.freshName("t")
      s"""
         |final int $n = $arr.numElements();
         |long $h = 0L;
         |long $pw = 1L;
         |for (int $j = 0; $j < $n; $j++) {
         |  long $t = ($arr.isNullAt($j)
         |      ? ${Seed}L
         |      : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($arr.getUTF8String($j), ${Seed}L))
         |    % ${P}L;
         |  if ($t < 0) $t += ${P}L;
         |  $h = ($h + $t * $pw) % ${P}L;
         |  $pw = $pw * 31L % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Element-wise `xxhash64` of a string array (seed 42 — Spark's own), as one
  * codegen loop. The `transform(arr, s -> xxhash64(s))` spelling runs the
  * lambda interpreted per element; this stays in the scan stage's generated
  * code. NULL elements hash to the seed, exactly like `xxhash64(NULL)`.
  * Used to shrink shingle sets to 8-byte keys before caching/joining —
  * downstream set ops (distinct/intersect/union) and `minhash_sig` then
  * work on longs. */
case class XxHash64Array(child: Expression) extends UnaryExpression {

  private val Seed = 42L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"xxhash64_array requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxhash64_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      out(j) = if (arr.isNullAt(j)) Seed else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $out = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $out[$j] = $arr.isNullAt($j)
         |    ? ${Seed}L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($arr.getUTF8String($j), ${Seed}L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Map-side 64-bit SimHash of a token array (multiset): per bit position,
  * sum +1/−1 over `xxhash64(token)` bits, set the bit if the sum is
  * positive. Same rationale as [[MinHashSignature]]: the aggregate spelling
  * (explode tokens → 64 conditional sums per document) is a pure per-row
  * function spelled as a shuffle — this is one (tokens × 64) primitive loop
  * in the scan stage.
  *
  * Value contract (spec-enforced): bit-identical to the aggregate form —
  * arithmetic shift over the raw xxhash64 (seed 42), strict `sum > 0` bit
  * rule, null tokens hash like `xxhash64(NULL)`, empty arrays yield NULL
  * (the aggregate form drops empty docs at explode). */
case class SimHash64(child: Expression) extends UnaryExpression {

  private val Seed = 42L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty token array → NULL
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) Seed else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $counts = new int[64];
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $h = $arr.isNullAt($j)
         |      ? ${Seed}L
         |      : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($arr.getUTF8String($j), ${Seed}L);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ($counts[$i] > 0) $sig |= 1L << $i;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling 64-bit hashes of every n-token window of a token array —
  * `array<long>` of length L−n+1 (NULL when the document has fewer than n
  * tokens, so a generator caller drops short documents for free). Window i
  * hashes `h_i = Σ_{k<n} x_{i+k} · B^{n−1−k}` over WRAPPING 2⁶⁴ arithmetic
  * (plain JVM longs — no ANSI overflow applies to hand-written loops),
  * where `x_j = xxhash64(tok_j, seed 42)` and B is an odd 64-bit mixing
  * constant (odd ⇒ invertible mod 2⁶⁴, so the leading term never decays);
  * maintained with the Rabin–Karp rolling update
  * `h_{i+1} = (h_i − x_i·B^{n−1})·B + x_{i+n}` — O(L) per document.
  *
  * Why an expression: the window-STRING spelling (transform + n
  * element_ats + concat_ws per position, then xxhash64) is O(L·n)
  * interpreted work per document and materializes every n-gram string
  * just to hash it. Window identity only needs an injective-enough key:
  * any two equal windows collide by construction, and distinct windows
  * collide with probability ~2⁻⁶⁴ — the same contract hashed shingle sets
  * document. Used by the duplicate-span detector, where the flagging is
  * IDENTICAL to grouping raw window strings absent a 64-bit collision
  * (spec-enforced on random corpora). NULL tokens hash like
  * `xxhash64(NULL)` (= the seed). */
case class WindowHash64(child: Expression, windowSize: Int) extends UnaryExpression {

  private val Seed = 42L
  private val B = 0x9E3779B97F4A7C15L // odd golden-ratio constant

  override def checkInputDataTypes(): TypeCheckResult =
    if (windowSize < 1)
      TypeCheckResult.TypeCheckFailure(s"window_hash64: window size $windowSize must be >= 1")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"window_hash64 requires array<string>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short documents yield NULL
  override def prettyName: String = "window_hash64"

  // B^(n-1) with wrapping multiplication
  @transient private lazy val bPow: Long = {
    var p = 1L; var i = 0
    while (i < windowSize - 1) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < windowSize) return null
    val xs = new Array[Long](len)
    var j = 0
    while (j < len) {
      xs(j) = if (arr.isNullAt(j)) Seed else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      j += 1
    }
    val out = new Array[Long](len - windowSize + 1)
    var h = 0L
    j = 0
    while (j < windowSize) { h = h * B + xs(j); j += 1 }
    out(0) = h
    j = 0
    while (j < len - windowSize) {
      h = (h - xs(j) * bPow) * B + xs(j + windowSize)
      out(j + 1) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val xs = ctx.freshName("xs")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      s"""
         |final int $len = $arr.numElements();
         |if ($len < $windowSize) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $xs = new long[$len];
         |  for (int $j = 0; $j < $len; $j++) {
         |    $xs[$j] = $arr.isNullAt($j)
         |      ? ${Seed}L
         |      : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($arr.getUTF8String($j), ${Seed}L);
         |  }
         |  final long[] $out = new long[$len - $windowSize + 1];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $windowSize; $j++) { $h = $h * ${B}L + $xs[$j]; }
         |  $out[0] = $h;
         |  for (int $j = 0; $j < $len - $windowSize; $j++) {
         |    $h = ($h - $xs[$j] * ${bPow}L) * ${B}L + $xs[$j + $windowSize];
         |    $out[$j + 1] = $h;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native codegen
  * expression. Spark SQL ships no normalizer, and the alternative — a Scala
  * UDF — would break whole-stage codegen exactly where this runs: the
  * scan-stage text-cleaning pipeline in front of tokenization and hashing
  * (mixed-form inputs make "identical" documents hash differently, so
  * normalization belongs BEFORE every dedup signature).
  *
  * ASCII fast path: a pure-ASCII string (the overwhelming case in web
  * corpora) is already normalized under every form and is returned as-is —
  * no String round-trip, no allocation, just `UTF8String.isFullAscii`'s
  * word-at-a-time scan. Non-ASCII strings round-trip once through the JDK's
  * `java.text.Normalizer`.
  *
  * Null contract: null in → null out ([[UnaryExpression]] default).
  * DuckDB-oracle parity: `nfc_normalize` (NFC only) — spec + q93.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {

  @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if Forms(form) => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize: form must be one of ${Forms.mkString("/")}, got '$form'")
    case t =>
      TypeCheckResult.TypeCheckFailure(s"unicode_normalize requires string, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    if (s.isFullAscii) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      // the Form enum rides along as a codegen reference object — stable
      // generated source for every form (one Janino compile per plan shape)
      val formRef = ctx.addReferenceObj("normForm", normForm, "java.text.Normalizer.Form")
      s"""
         |${ev.value} = $in.isFullAscii()
         |  ? $in
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($in.toString(), $formRef));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel for fused word-n-gram hashing (called from generated code
  * — a static method keeps every plan's generated source one line, so
  * Janino compiles one trivial shape while the loop itself runs as
  * JIT-compiled Scala, exactly like Spark's own `XXH64` helpers).
  *
  * Hash contract (spec-pinned): element j is BIT-IDENTICAL to
  * `xxhash64(concat_ws(' ', toks[j..j+n-1]))` (seed 42), and the whole-array
  * gram of a short document to `xxhash64(array_join(toks, ' '))` — because
  * consecutive tokens joined by a single space are a CONTIGUOUS byte slice
  * of the once-joined document buffer, each window hashes a slice of one
  * shared byte array: one buffer copy per document, zero per-gram string
  * materialization, no interpreted HOF lambda (the `transform` +
  * n×`element_at` + `concat_ws` spelling allocates every gram string just
  * to hash it, per element, interpreted). Null tokens are skipped exactly
  * like `concat_ws`/`array_join` skip them (slow path — tokenized arrays
  * never carry nulls). */
object GramKernels {

  private val Seed = 42L
  private val ByteArrayOffset = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET

  /** xxhash64 of every word n-gram (one per window position, duplicates
    * kept, document order); empty token array yields the single hash of the
    * empty string — `wordShinglesFromTokens`'s `cnt <= n` branch. */
  def gramHashes(arr: ArrayData, n: Int): Array[Long] = {
    val len = arr.numElements()
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return gramHashesWithNulls(arr, n)
      i += 1
    }
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var total = 0
    i = 0
    while (i < len) {
      toks(i) = arr.getUTF8String(i)
      total += toks(i).numBytes
      i += 1
    }
    if (len > 1) total += len - 1
    val buf = new Array[Byte](total)
    val starts = new Array[Int](len)
    val ends = new Array[Int](len)
    var off = 0
    i = 0
    while (i < len) {
      if (i > 0) { buf(off) = ' '.toByte; off += 1 }
      starts(i) = off
      toks(i).writeToMemory(buf, ByteArrayOffset + off)
      off += toks(i).numBytes
      ends(i) = off
      i += 1
    }
    if (len <= n) {
      Array(XXH64.hashUnsafeBytes(buf, ByteArrayOffset, total, Seed))
    } else {
      val m = len - n + 1
      val out = new Array[Long](m)
      var j = 0
      while (j < m) {
        val o = starts(j)
        out(j) = XXH64.hashUnsafeBytes(buf, ByteArrayOffset + o, ends(j + n - 1) - o, Seed)
        j += 1
      }
      out
    }
  }

  /** Slow path replicating `concat_ws`/`array_join` null-skipping byte for
    * byte (a null token contributes neither bytes nor a separator). */
  private def gramHashesWithNulls(arr: ArrayData, n: Int): Array[Long] = {
    val len = arr.numElements()
    def hashWindow(from: Int, until: Int): Long = {
      var total = 0
      var cnt = 0
      var i = from
      while (i < until) {
        if (!arr.isNullAt(i)) { total += arr.getUTF8String(i).numBytes; cnt += 1 }
        i += 1
      }
      if (cnt > 1) total += cnt - 1
      val buf = new Array[Byte](total)
      var off = 0
      i = from
      while (i < until) {
        if (!arr.isNullAt(i)) {
          if (off > 0) { buf(off) = ' '.toByte; off += 1 }
          val t = arr.getUTF8String(i)
          t.writeToMemory(buf, ByteArrayOffset + off)
          off += t.numBytes
        }
        i += 1
      }
      XXH64.hashUnsafeBytes(buf, ByteArrayOffset, total, Seed)
    }
    if (len <= n) Array(hashWindow(0, len))
    else Array.tabulate(len - n + 1)(j => hashWindow(j, j + n))
  }

  /** Sorted run-length-encoded term-frequency vector over [[gramHashes]]:
    * `array<struct<gram,tf>>`, grams ascending, tf = window-position count —
    * exactly the rows `explode(grams) → groupBy(id, xxhash64(gram)) →
    * count` produces per document, computed in the scan stage. */
  def gramTfPairs(arr: ArrayData, n: Int): ArrayData = {
    val hs = gramHashes(arr, n)
    java.util.Arrays.sort(hs)
    val m = hs.length
    var runs = 1
    var i = 1
    while (i < m) { if (hs(i) != hs(i - 1)) runs += 1; i += 1 }
    val rows = new Array[Any](runs)
    var r = 0
    var start = 0
    i = 1
    while (i <= m) {
      if (i == m || hs(i) != hs(start)) {
        rows(r) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](hs(start), (i - start).toLong))
        r += 1
        start = i
      }
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** Fused word-n-gram hashes: tokens → `array<long>` of `xxhash64` values,
  * one per window position in document order — element-wise BIT-IDENTICAL
  * to `XxHash64Array(wordShinglesFromTokens(toks, n))` (spec-pinned) while
  * skipping the interpreted `transform` lambda and every intermediate
  * shingle STRING (one joined byte buffer per document, each window hashed
  * as a slice — [[GramKernels]]). This is the minhash/LSH family's shingle
  * producer ([[graft.text.Dedup.hashedShingleSets]]): at 100 TB the corpus
  * scan emits fixed-width keys without ever materializing shingle text. */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"gram_hashes: gram size $n must be >= 1")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gram_hashes requires array<string>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(GramKernels.gramHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.plans.GramKernels.gramHashes($arr, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused word-n-gram TF vector: tokens → per-document
  * `array<struct<gram: long, tf: long>>` (grams ascending), where `gram` is
  * `xxhash64` of the space-joined window and `tf` its in-document count —
  * one scan-stage kernel call per row ([[GramKernels]]) replacing the
  * shingle-string `transform` lambda (interpreted, one string allocation
  * per gram), the post-explode `xxhash64`, AND the `groupBy(id, gram)`
  * count's exchange: the TF vector is a pure per-row function of the token
  * array, so it belongs in the map stage (the [[MinHashSignature]]
  * rationale; at 100 TB this removes the corpus-wide (id, gram) shuffle
  * from the APSS pipeline — candidates aside, only gram-keyed POSTINGS
  * ever shuffle).
  *
  * Value contract (spec-pinned): exploding the result is row-identical to
  * `explode(wordShinglesFromTokens(toks, n)) → groupBy(id, xxhash64(gram))
  * → count` — including the short-document whole-text gram, the empty
  * tokenization's single empty-string gram, and `concat_ws` null-skipping.
  * NULL token array → NULL (explode drops the row, like exploding the NULL
  * shingle array). */
case class GramTfVector(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"gram_tf_vector: gram size $n must be >= 1")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gram_tf_vector requires array<string>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("gram", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "gram_tf_vector"

  override def nullSafeEval(input: Any): Any =
    GramKernels.gramTfPairs(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.GramKernels.gramTfPairs($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Greedy single-pass adjacent-pair merge — the BPE "apply one merge rule"
  * step: scan the symbol array left to right, replacing each non-overlapping
  * occurrence of (left, right) with the concatenation, exactly as in
  * Sennrich et al. 2016's reference implementation (so `[a,a,a]` with rule
  * (a,a) → `[aa,a]`, and the freshly merged symbol never re-matches in the
  * same pass).
  *
  * Why an expression: the rule changes every training round — spelled as a
  * literal in the plan it would generate fresh Janino source per round (the
  * k-means lesson); here the pair rides along as codegen REFERENCE OBJECTS,
  * so every round reuses one compiled shape. Null elements never match and
  * pass through; null array → null (UnaryExpression default).
  */
case class MergeAdjacentPair(child: Expression, left: String, right: String)
    extends UnaryExpression {

  @transient private lazy val leftU =
    org.apache.spark.unsafe.types.UTF8String.fromString(left)
  @transient private lazy val rightU =
    org.apache.spark.unsafe.types.UTF8String.fromString(right)
  @transient private lazy val mergedU =
    org.apache.spark.unsafe.types.UTF8String.fromString(left + right)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"merge_adjacent_pair requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(StringType, child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "merge_adjacent_pair"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i < n - 1 && !arr.isNullAt(i + 1) &&
          cur.equals(leftU) && arr.getUTF8String(i + 1).equals(rightU)) {
        out(k) = mergedU; i += 2
      } else {
        out(k) = cur; i += 1
      }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val lRef = ctx.addReferenceObj("bpeLeft", leftU, u)
      val rRef = ctx.addReferenceObj("bpeRight", rightU, u)
      val mRef = ctx.addReferenceObj("bpeMerged", mergedU, u)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val cur = ctx.freshName("cur")
      s"""
         |final int $n = $arr.numElements();
         |final Object[] $out = new Object[$n];
         |int $i = 0, $k = 0;
         |while ($i < $n) {
         |  final $u $cur = $arr.isNullAt($i) ? null : $arr.getUTF8String($i);
         |  if ($cur != null && $i < $n - 1 && !$arr.isNullAt($i + 1)
         |      && $cur.equals($lRef) && $arr.getUTF8String($i + 1).equals($rRef)) {
         |    $out[$k] = $mRef; $i += 2;
         |  } else {
         |    $out[$k] = $cur; $i += 1;
         |  }
         |  $k += 1;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Map-side hashed-feature linear classifier score (the "hashing trick"
  * of Weinberger '09 / fastText's bag-of-features linear layer): each
  * token indexes a weight table through `bucket = pmod(xxhash64(tok), B)`
  * and the document score is the plain sum of its token weights — one
  * primitive loop per row in the scan stage, zero shuffle, the shape a
  * model-based quality filter must have to run over 100 TB of crawl
  * (score EVERY document at scan speed, never materialize features).
  *
  * The weight table is any deterministic function of the bucket id; graft
  * ships the integer ramp `w(b) = (b mod 7) − 3 ∈ [−3, 3]` so scores stay
  * exact BIGINTs (a trained model would broadcast a real float table —
  * the plumbing is identical, one array lookup per token). Integer sums
  * in the JVM loop wrap at 2⁶⁴ like every hand-written graft kernel (no
  * ANSI overflow; unreachable anyway — |score| ≤ 3·tokens).
  *
  * Null tokens hash like `xxhash64(NULL)` (= the seed); empty arrays
  * yield NULL (consistent with [[SimHash64]]/[[MinHashSignature]]: "no
  * tokens" is signal-absent, not score-zero). */
case class HashedLinearScore(child: Expression, buckets: Int) extends UnaryExpression {

  require(buckets >= 1, s"hashed_linear_score: buckets must be >= 1, got $buckets")

  private val Seed = 42L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"hashed_linear_score requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty token array → NULL
  override def prettyName: String = "hashed_linear_score"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var score = 0L
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) Seed else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      val b = ((h % buckets) + buckets) % buckets
      score += (b % 7) - 3
      j += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val score = ctx.freshName("score")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $score = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $h = $arr.isNullAt($j)
         |      ? ${Seed}L
         |      : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($arr.getUTF8String($j), ${Seed}L);
         |    final long $b = (($h % ${buckets}L) + ${buckets}L) % ${buckets}L;
         |    $score += ($b % 7L) - 3L;
         |  }
         |  ${ev.value} = $score;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken, SIGMOD'03
  * — the MOSS local fingerprinting algorithm): over an `array<long>` of
  * consecutive window hashes (the [[WindowHash64]] output), slide a
  * selection window of `w` hashes and keep the RIGHTMOST minimum of each —
  * recording a position once even when consecutive selection windows agree.
  * Output is `array<long>` of the selected hashes in position order
  * (positional duplicates of an equal hash value are kept; set semantics
  * are one `distinct` away). NULL in → NULL out; an input shorter than `w`
  * selects the rightmost minimum of the whole array, so every document
  * with at least one window hash yields at least one fingerprint — the
  * winnowing guarantee (any shared run of w+n−1 tokens shares at least one
  * selected fingerprint) plus total coverage of short documents.
  *
  * Why an expression: selection is a PURE per-row function of the hash
  * array, so a codegen expression removes the explode+groupBy shuffle a
  * relational spelling would need. The SQL-function spelling —
  * `transform(sequence(...), j -> array_min(slice(hs, j, w)))` plus an
  * argmin rank per window — is O(m·w) interpreted HOF work per document
  * and still needs a dedup pass; the ascending-minima deque below is O(m)
  * inside whole-stage codegen, and the corpus never shuffles anything but
  * the selected (id, hash) fingerprints. Comparisons are SIGNED 64-bit on
  * both paths — the contract the DuckDB oracle replays (BIGINT order).
  *
  * Tie rule: rightmost (pop `>=` from the deque back), the choice SIGMOD'03
  * §4 makes so that equal hashes in one window cost one fingerprint, not w. */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (w < 1)
      TypeCheckResult.TypeCheckFailure(s"winnow_select: window size $w must be >= 1")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"winnow_select requires array<long>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = if (arr.isNullAt(i)) 42L else arr.getLong(i); i += 1 }
    val win = if (w < m) w else m
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // deque holds indices, hashes strictly increasing front→back
    val selPos = new Array[Int](m)
    var nSel = 0
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (i >= win - 1) {
        val j = i - win + 1 // selection window [j, i]
        while (deque(head) < j) head += 1
        val pick = deque(head)
        if (nSel == 0 || selPos(nSel - 1) != pick) { selPos(nSel) = pick; nSel += 1 }
      }
      i += 1
    }
    val out = new Array[Long](nSel)
    i = 0
    while (i < nSel) { out(i) = hs(selPos(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val hs = ctx.freshName("hs")
      val win = ctx.freshName("win")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val selPos = ctx.freshName("selPos")
      val nSel = ctx.freshName("nSel")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val pick = ctx.freshName("pick")
      s"""
         |final int $m = $arr.numElements();
         |final long[] $hs = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $hs[$i] = $arr.isNullAt($i) ? 42L : $arr.getLong($i);
         |}
         |final int $win = ($w < $m) ? $w : ($m == 0 ? 1 : $m);
         |final int[] $dq = new int[$m == 0 ? 1 : $m];
         |int $head = 0, $tail = 0, $nSel = 0;
         |final int[] $selPos = new int[$m == 0 ? 1 : $m];
         |for (int $i = 0; $i < $m; $i++) {
         |  while ($tail > $head && $hs[$dq[$tail - 1]] >= $hs[$i]) $tail--;
         |  $dq[$tail++] = $i;
         |  if ($i >= $win - 1) {
         |    final int $j = $i - $win + 1;
         |    while ($dq[$head] < $j) $head++;
         |    final int $pick = $dq[$head];
         |    if ($nSel == 0 || $selPos[$nSel - 1] != $pick) $selPos[$nSel++] = $pick;
         |  }
         |}
         |final long[] $out = new long[$nSel];
         |for (int $i = 0; $i < $nSel; $i++) { $out[$i] = $hs[$selPos[$i]]; }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
