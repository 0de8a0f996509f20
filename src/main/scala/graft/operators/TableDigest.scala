package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Commutative table digest — cross-replica / cross-engine content
  * verification (the Percona-table-checksum shape, and literally what
  * this repo's own oracle gate does): a content fingerprint that is
  * IDENTICAL under any row order, partitioning, or file layout, so two
  * replicas, a table before/after OPTIMIZE, or a clone can be compared by
  * exchanging three numbers instead of shipping data.
  *
  * digest = (n, xor of row hashes, sum of row hashes mod 2⁴⁰). Row hash =
  * xxhash64 over the selected columns (Spark's multi-column chaining —
  * each column's hash seeds the next). XOR alone is blind to duplicate
  * PAIRS (a row occurring 2k times XORs to nothing — swap two duplicates
  * for two absences undetected); the modular SUM alone is blind to
  * compensating ±deltas; together with the count they make accidental
  * collisions a 2⁻¹⁰⁰-ish event while staying one map-side aggregate —
  * both folds are commutative+associative, so the shuffle carries 3
  * numbers per task at any scale. The sum ACCUMULATES in DECIMAL(38,0)
  * and takes the final mod after the fold (mod-of-sum ≡ sum-of-mods mod
  * 2⁴⁰): per-row terms average ~2³⁹, so a plain BIGINT sum would hit
  * ANSI ARITHMETIC_OVERFLOW at ~2²⁴ rows — the opposite of the
  * any-scale contract. NULL columns hash per Spark's rule (skipped in
  * the chain), documented here because cross-ENGINE replicas must
  * replay the same rule.
  */
object TableDigest {

  /** One-row digest of `cols` (order matters — it's part of the hash
    * chain; both replicas must agree on it, like a schema). */
  def digest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "TableDigest.digest: at least one column")
    require(cols.forall(df.columns.contains),
      s"TableDigest.digest: missing columns in ${df.columns.mkString(",")}")
    df.select(xxhash64(cols.map(col): _*).as("__td_h"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        expr("bit_xor(__td_h)").cast("long").as("xor_h"),
        // decimal(38,0) headroom: 2^40 per term × up to ~10^26 rows
        expr("pmod(sum(CAST(pmod(__td_h, 1099511627776) AS DECIMAL(38,0))), " +
          "1099511627776)").cast("long").as("sum_h"))
  }

  /** Compare two relations by digest: one row with both digests and a
    * `matches` verdict. The comparison exchanges six numbers — never
    * data — which is the point at 100 TB (each side's digest runs where
    * its data lives). */
  def reconcile(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val da = digest(a, cols).select(col("n").as("n_a"),
      col("xor_h").as("xor_a"), col("sum_h").as("sum_a"))
    val db = digest(b, cols).select(col("n").as("n_b"),
      col("xor_h").as("xor_b"), col("sum_h").as("sum_b"))
    da.crossJoin(db).withColumn("matches",
      col("n_a") === col("n_b") && col("xor_a") === col("xor_b") &&
        col("sum_a") === col("sum_b"))
  }
}
