package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sharding: split a corpus into shards of ≈`budget` tokens
  * each — the layout step before writing training shards.
  *
  * Two strategies with different scale/exactness trade-offs:
  *
  *   - `shardByHash`: one aggregation computes the corpus token total and
  *     hence the shard count; assignment is a map-side `id mod numShards`.
  *     Shard sizes are balanced in expectation only, but NOTHING shuffles
  *     and no global order exists — the right default at 100 TB.
  *
  *   - `packBySequence`: exact sequential packing along a caller-chosen
  *     order via a cumulative token sum; a document starts a new shard when
  *     its first token would cross the budget boundary. The running sum is
  *     a window over `partitionCols` — give it a real partitioning column
  *     (date, source) at scale so no single global sort materializes.
  */
object Sharding {

  /** Expected-balance sharding: numShards = ceil(total_tokens / budget),
    * shard = pmod(mix(id), numShards). The id mix is xxhash64 (the same
    * randomness source as Sampling.uniformHash): total over the full long
    * id range — a raw Knuth multiply would overflow (and, under ANSI mode,
    * throw) once ids pass ~2^31, and 64-bit ids are normal at 100 TB. */
  def shardByHash(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // sum over zero rows is NULL — an empty corpus (upstream filter kept
    // nothing) gets one empty shard, not an opaque NPE
    val totalRow = df.agg(sum(col(tokenCol).cast("long"))).collect()(0)
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val numShards = math.max(1L, (total + budgetTokens - 1) / budgetTokens)
    df.withColumn("shard", pmod(xxhash64(col(idCol).cast("long")), lit(numShards)))
  }

  /** Exact sequential packing: order rows by `orderCol` within each
    * `partitionCols` group, take the running token sum, and assign
    * shard = floor((cumsum − tokens) / budget) — i.e. the shard in which
    * the document STARTS. Deterministic given the order; replayable in
    * plain SQL. Oversized single documents (tokens > budget) get a shard
    * of their own plus overflow into none — they are kept, not dropped. */
  def packBySequence(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      budgetTokens: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy() else Window.partitionBy(partitionCols.map(col): _*)
    val w = w0.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("shard", ((col("__graft_cum") - col(tokenCol)) / lit(budgetTokens)).cast("long"))
      .drop("__graft_cum")
  }

  /** Per-shard manifest: document count and token total, the thing a
    * training job reads to schedule shard consumption. */
  def shardManifest(sharded: DataFrame, tokenCol: String, extraKeys: Seq[String] = Nil): DataFrame =
    sharded
      .groupBy((extraKeys :+ "shard").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol).cast("long")).as("total_tokens"))
}
