package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities — the multi-dimensional data-layout
  * tool behind "OPTIMIZE ZORDER BY"-style clustering: interleaving the bits
  * of two columns gives a 1-D sort key whose ordering keeps 2-D neighbors
  * in the same file/row-group, so min/max stats prune box predicates on
  * EITHER dimension (a plain sort only prunes its leading column).
  *
  * The interleave is a pure column-expression tree (2·bits shift/mask/add
  * terms) — deliberately NOT a custom Catalyst expression: every term is a
  * literal-shift of the input, whole-stage codegen already fuses it into
  * straight-line Java, and the same arithmetic is trivially replayable in
  * oracle SQL. Inputs must be non-negative and fit in `bits` bits; the
  * caller masks first (`pmod`/`%`), keeping the contract visible at the
  * call site.
  */
object Zorder {

  /** Morton-interleave two non-negative columns, `bits` bits each: x's bit
    * b lands at position 2b, y's at 2b+1. Result fits in 2·bits bits. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zorder: bits must be in [1,31], got $bits")
    (0 until bits)
      .map { b =>
        shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
          shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
      }
      .reduce(_ + _)
  }

  /** Reference interpretation for specs: interleave on the driver. */
  def interleaveRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }
}
