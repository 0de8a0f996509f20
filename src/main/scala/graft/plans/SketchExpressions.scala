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
