package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual runtime-filter (semi-join reduction) join: the Bloom-filter
  * pre-prune a distributed engine applies in front of a shuffle join when
  * one side is far more selective than the other. Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` covers the planner-visible
  * cases; this operator is the explicit form for when the dim side is an
  * ARTIFACT (persisted from a previous job) or the pruning must survive
  * plan boundaries the optimizer cannot see through (checkpoint, custom
  * sources).
  *
  * Reference scope: the reference engine joins mapping tables to fact
  * tables without any pre-filter (its single-node executors scan
  * everything); this is part of the scale extension surface.
  */
object RuntimeFilter {

  /** Inner equi-join of `fact` to `dim`, with the fact side pre-pruned
    * MAP-SIDE by a Bloom filter built over the dim keys. Result is
    * EXACTLY `fact.join(dim, factKey === dimKey)` — Bloom probes have no
    * false negatives (probe and build derive identical bit positions,
    * spec-enforced in BloomSpec), and false positives are eliminated by
    * the join itself; the filter only reduces what reaches the exchange.
    *
    * Scale shape: the dim side folds to a fixed-size bit array in one
    * pass (a 2²²-bit filter is 512 KiB regardless of dim size); the fact
    * scan probes it inside whole-stage codegen, so the shuffle carries
    * ≈ |matching| + fpp·|fact| rows instead of |fact|. At 100 TB fact /
    * selective dim this is the difference between shuffling terabytes and
    * shuffling the answer. The dim side of the join itself is left to the
    * planner (broadcast when small — the usual case for a dim selective
    * enough to be worth pruning by). */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      numBits: Long = 1L << 22,
      numHashFuncs: Int = 5): DataFrame = {
    import org.apache.spark.sql.graft.ExprColumn
    import org.apache.spark.sql.types._
    // xxhash64 is TYPE-sensitive: INT 7 and BIGINT 7 hash differently, so a
    // fact/dim key-type mismatch the plain join would bridge (implicit cast)
    // would produce Bloom FALSE NEGATIVES and silently drop matching rows.
    // Hash both sides at a common type: identical types hash natively;
    // integral mismatches widen to LongType (lossless, matches the join's
    // own widening); anything else is refused rather than risked.
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val (factHashCol, dimHashCol) =
      if (ft == dt) (col(factKey), col(dimKey))
      else if (integral(ft) && integral(dt))
        (col(factKey).cast(LongType), col(dimKey).cast(LongType))
      else throw new IllegalArgumentException(
        s"bloomPrunedJoin: key types must match or both be integral — " +
          s"fact.$factKey is ${ft.sql}, dim.$dimKey is ${dt.sql}")
    val agg = graft.plans.BloomBuildAgg(
      ExprColumn.expr(xxhash64(dimHashCol)), numBits, numHashFuncs)
    val row = dim.agg(ExprColumn(agg.toAggregateExpression()).as("bits")).head()
    val bits = row.getSeq[Long](0).toArray
    // probe directly on xxhash64(rawColumn) — nothing projected, so the
    // filter evaluates the hash exactly once (no double-eval pushdown)
    val pruned = fact.filter(ExprColumn(graft.plans.BloomContains(
      ExprColumn.expr(xxhash64(factHashCol)), bits, numHashFuncs)))
    pruned.join(dim, col(factKey) === col(dimKey))
  }
}
