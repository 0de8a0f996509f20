package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Bucket derivation shared by the Count-Min build aggregate and the probe
  * expression — the two MUST derive identical buckets or estimates would
  * lose the `estimate >= true count` guarantee that makes the sketch a
  * sketch.
  *
  * Kirsch–Mitzenmacher double hashing over ONE xxhash64(seed 42) value:
  * the 64-bit hash splits into 32-bit halves (h1, h2) and row i probes
  * bucket `((h1 + i*h2) mod 2^32) mod width`. All arithmetic stays below
  * 2^37 — safe under ANSI mode, and replayable in DuckDB HUGEINT SQL for
  * the oracle. Public + static so generated Java can call it.
  */
object CountMinHash {
  val Seed = 42L // Spark's xxhash64 default seed

  def bucket(hash: Long, row: Int, width: Int): Int = {
    val h1 = hash & 0xFFFFFFFFL
    val h2 = hash >>> 32
    (((h1 + row.toLong * h2) & 0xFFFFFFFFL) % width).toInt
  }

  /** Count one occurrence of `hash` in every row of the matrix (mutates). */
  def add(counts: Array[Long], hash: Long, depth: Int, width: Int): Unit = {
    var i = 0
    while (i < depth) {
      counts(i * width + bucket(hash, i, width)) += 1L
      i += 1
    }
  }

  /** Point estimate: min over rows of the probed bucket. Never less than
    * the true count of the key (all its increments landed in these cells);
    * over only by other keys colliding into ALL d probed cells. */
  def estimate(counts: Array[Long], hash: Long, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counts(i * width + bucket(hash, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }

  def requireShape(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"count-min: depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 24),
      s"count-min: width must be in [2, 2^24], got $width")
  }
}

/** Count-Min sketch build as a typed imperative aggregate over a tokens
  * column — `count_min_agg(tokens, depth, width)` returns the depth×width
  * counter matrix as one row-major `array<long>`.
  *
  * Scale design: the zero-extra-shuffle way to get approximate per-key
  * frequencies out of a 100 TB corpus — each task folds its partition's
  * token arrays into a local matrix (update), partials merge by elementwise
  * add (order-independent, so the result is DETERMINISTIC whatever the
  * partitioning — unlike a sampled top-k), and only depth·width·8 bytes
  * cross the wire per partition. The exact alternative (explode + groupBy
  * word) shuffles every token occurrence; at corpus scale that is the
  * difference between a fixed 16 KiB artifact and a multi-TB exchange.
  *
  * Children: `array<string>` hashes each element with xxhash64(seed 42);
  * `array<long>` carries PRE-HASHED keys (same contract as
  * [[MinHashSignature]]). NULL arrays contribute nothing; NULL elements are
  * skipped (a NULL token has no frequency).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  CountMinHash.requireShape(depth, width)

  private def preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min_agg requires array<string> or array<long> (pre-hashed), got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val hashed = preHashed
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h =
            if (hashed) arr.getLong(j)
            else XXH64.hashUTF8String(arr.getUTF8String(j), CountMinHash.Seed)
          CountMinHash.add(buffer, h, depth, width)
        }
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Map-side Count-Min point estimate: `CountMinLookup(keyHash, counts, d, w)`
  * — min over rows of the probed bucket for a pre-hashed BIGINT key
  * (`xxhash64` of the token, matching what [[CountMinAgg]] hashed).
  *
  * The counter matrix is a codegen REFERENCE OBJECT (same rationale as
  * [[BloomContains]]): the generated source is a constant-size loop
  * whatever the sketch dimensions, it ships to executors once via the task
  * broadcast, and the probe stays inside whole-stage codegen with zero
  * shuffle. NULL keys yield NULL.
  */
case class CountMinLookup(child: Expression, counts: Array[Long], depth: Int, width: Int)
  extends UnaryExpression {

  CountMinHash.requireShape(depth, width)
  require(counts.length == depth * width,
    s"count_min_lookup: matrix length ${counts.length} != depth*width ${depth * width}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min_lookup requires a BIGINT key (pre-hash with xxhash64), got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_lookup"

  override def nullSafeEval(input: Any): Any =
    CountMinHash.estimate(counts, input.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("cmCounts", counts, "long[]")
    nullSafeCodeGen(ctx, ev, key => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      s"""
         |long $best = Long.MAX_VALUE;
         |final long $h1 = $key & 0xFFFFFFFFL;
         |final long $h2 = $key >>> 32;
         |for (int $i = 0; $i < $depth; $i++) {
         |  final long $c = $arr[$i * $width + (int) ((($h1 + (long) $i * $h2) & 0xFFFFFFFFL) % $width)];
         |  if ($c < $best) $best = $c;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  // the matrix is intentionally excluded from equality/explain: Array
  // equality is reference equality, which is correct — two probes are
  // interchangeable only if they share the same sketch instance
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Misra–Gries frequent-items summary (Misra & Gries '82) as a one-pass
  * TypedImperativeAggregate over a BIGINT key column: at most `k` counters;
  * a key hit increments its counter, a miss with a full table decrements
  * EVERY counter (dropping zeros) — the classic amortized charge argument
  * bounds undercount by N/(k+1). Partial buffers MERGE by the mergeable-
  * summaries rule (Agarwal et al. PODS'12): pointwise counter sum, then
  * subtract the (k+1)-th largest counter from all and drop non-positives —
  * the bound survives, so the map-side combine is exact MG semantics.
  *
  * What the summary GUARANTEES (and what is therefore deterministic under
  * any partitioning, even though the counter VALUES are order-dependent):
  * every key with true count > N/(k+1) survives in the final table. The
  * caller's contract is two-pass — treat survivors as CANDIDATES, verify
  * with exact counts, keep those above the threshold
  * ([[graft.operators.Sketches.guaranteedHeavyHitters]]). Versus q113's
  * Count-Min route: MG keeps the KEYS (no second hash inversion problem)
  * in O(k) memory, Count-Min answers point queries for keys you already
  * hold; both bound memory where a full groupBy would not.
  *
  * Output encoding: interleaved [key₁, cnt₁, key₂, cnt₂, …] array<long>
  * (counters > 0 only, order unspecified). NULL keys are skipped. */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] with UnaryLike[Expression] {

  require(k >= 1 && k <= 4096, s"misra_gries_agg: k $k must be in [1, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"misra_gries_agg requires bigint, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_agg"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  override def update(
      buffer: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val cur = buffer.getOrDefault(key, 0L)
      if (cur > 0L) buffer.put(key, cur + 1L)
      else if (buffer.size() < k) buffer.put(key, 1L)
      else {
        // decrement-all: the O(k) step the charge argument pays for
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.put(e.getKey, buffer.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buffer.size() > k) {
      // subtract the (k+1)-th largest counter value, drop non-positives
      val vals = new Array[Long](buffer.size())
      var i = 0
      val vi = buffer.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      val it2 = buffer.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= sub) it2.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[Long, Long]): Any = {
    val out = new Array[Long](buffer.size() * 2)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = e.getKey
      out(i + 1) = e.getValue
      i += 2
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.size() * 16).order(ByteOrder.LITTLE_ENDIAN)
    val lb = bb.asLongBuffer()
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      lb.put(e.getKey)
      lb.put(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val out = new java.util.HashMap[Long, Long](k * 2)
    val lb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    while (lb.hasRemaining) {
      val key = lb.get()
      val cnt = lb.get()
      out.put(key, cnt)
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
