package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bit-position derivation shared by the Bloom build aggregate and the
  * probe expression — the two MUST derive identical positions or probes
  * would false-negative, which a Bloom filter must never do.
  *
  * Kirsch–Mitzenmacher double hashing: position_i = h1 + i·h2 (wrapping),
  * masked to the power-of-two bit width. h1 is the caller's 64-bit key
  * (already a hash — e.g. `xxhash64(normalize(text))`); h2 is a splitmix64
  * finalizer of it, forced odd so the k probe positions cycle through
  * distinct residues. Public + static-forwarded so generated Java can call
  * `graft.plans.BloomHash.mix(...)` directly.
  */
object BloomHash {
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for `key` in `bits` (mutates). */
  def set(bits: Array[Long], key: Long, numHashFuncs: Int): Unit = {
    val mask = bits.length.toLong * 64 - 1
    val h2 = mix(key) | 1L
    var i = 0
    var h = key
    while (i < numHashFuncs) {
      val pos = h & mask
      bits((pos >>> 6).toInt) |= 1L << pos
      h += h2
      i += 1
    }
  }

  /** True iff all k probe bits for `key` are set. */
  def contains(bits: Array[Long], key: Long, numHashFuncs: Int): Boolean = {
    val mask = bits.length.toLong * 64 - 1
    val h2 = mix(key) | 1L
    var i = 0
    var h = key
    while (i < numHashFuncs) {
      val pos = h & mask
      if ((bits((pos >>> 6).toInt) & (1L << pos)) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  def requireShape(numBits: Long, numHashFuncs: Int): Unit = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"bloom: numBits must be a power of two >= 64, got $numBits")
    require(numBits <= (1L << 33),
      s"bloom: numBits $numBits exceeds 2^33 (1 GiB of driver/executor heap per buffer)")
    require(numHashFuncs >= 1 && numHashFuncs <= 32,
      s"bloom: numHashFuncs must be in [1,32], got $numHashFuncs")
  }
}

/** Bloom-filter build as a typed imperative aggregate over a pre-hashed
  * LongType key column — `bloom_agg(key, numBits, k)` returns the filter as
  * one `array<long>` row (numBits/64 words).
  *
  * Scale design: this is the zero-shuffle way to summarize "every key seen
  * in a 100 TB corpus" into a fixed-size artifact — each task folds its
  * partition into a local bit array (update), partials are OR-merged
  * (merge), and only numBits/8 bytes ever cross the wire per partition, vs
  * a `distinct()` that shuffles every key. Same pattern as Spark's own
  * runtime `BloomFilterAggregate` (injected by row-level runtime filtering),
  * re-expressed here over caller-controlled keys so the resulting bit array
  * is a PERSISTABLE artifact (write the one row out, reuse it across
  * ingest batches — see `Dedup.bloomScreen`).
  *
  * NULL keys are skipped (a NULL text has no membership). The buffer
  * serializes as little-endian longs for shuffle-safe spill.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashFuncs: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  BloomHash.requireShape(numBits, numHashFuncs)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT key (pre-hash with xxhash64), got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits >>> 6).toInt)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomHash.set(buffer, v.asInstanceOf[Long], numHashFuncs)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** Map-side Bloom membership probe: `BloomContains(key, bits, k)` — true
  * iff all k probe positions for the LongType key are set in the
  * driver-held bit array.
  *
  * The bit array is a codegen REFERENCE OBJECT (same rationale as
  * [[NearestCentroidIndex]]): the generated source is a small constant
  * loop whatever the filter size, so a 512 MiB production filter neither
  * bloats the plan tree nor recompiles codegen per ingest batch — it ships
  * to executors once via the task broadcast, and the probe stays inside
  * whole-stage codegen with zero shuffle.
  *
  * Contract: never a false negative for a key inserted by [[BloomBuildAgg]]
  * with the same (numBits, k) — both sides derive positions via
  * [[BloomHash]]. NULL keys yield NULL.
  */
case class BloomContains(child: Expression, bits: Array[Long], numHashFuncs: Int)
  extends UnaryExpression {

  BloomHash.requireShape(bits.length.toLong * 64, numHashFuncs)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires a BIGINT key, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(input: Any): Any =
    BloomHash.contains(bits, input.asInstanceOf[Long], numHashFuncs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val mask = bits.length.toLong * 64 - 1
    nullSafeCodeGen(ctx, ev, key => {
      val h = ctx.freshName("h")
      val h2 = ctx.freshName("h2")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      s"""
         |boolean $found = true;
         |long $h = $key;
         |final long $h2 = graft.plans.BloomHash.mix($key) | 1L;
         |for (int $i = 0; $i < $numHashFuncs; $i++) {
         |  final long $pos = $h & ${mask}L;
         |  if (($arr[(int) ($pos >>> 6)] & (1L << $pos)) == 0L) { $found = false; break; }
         |  $h += $h2;
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  // the bit array is intentionally excluded from equality/explain: compare
  // by identity via the case-class default (Array equality is reference
  // equality), which is correct — two probes are interchangeable only if
  // they share the same filter instance
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
