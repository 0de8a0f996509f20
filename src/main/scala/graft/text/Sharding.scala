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

  /** GPT-style training-sequence packing: within each `partitionCols` group
    * (shard / date / source — the unit a trainer streams), documents are laid
    * end to end in `orderCol` order and the concatenated token stream is cut
    * into fixed-length sequences of `seqLen`. Unlike `packBySequence` (whole-
    * document budget bins, no splitting), documents HERE span sequence
    * boundaries — the standard pretraining layout: zero padding waste except
    * the final partial sequence of each group.
    *
    * Adds `start_offset` (token offset of the document inside its group's
    * stream) and `first_seq` / `last_seq` (the sequence indices the document
    * touches; equal unless it crosses a boundary). Zero-token documents keep
    * `last_seq = first_seq` — a defined position, no phantom sequence.
    *
    * Scale: ONE shuffle (hash-partition by group for the window sort); the
    * running sum then streams over each sorted group. `partitionCols` is
    * required — an empty partition list would funnel 100 TB through a single
    * global sort partition. */
  def packTrainingSequences(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      seqLen: Long,
      partitionCols: Seq[String]): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(
      partitionCols.nonEmpty,
      "packTrainingSequences needs a real partitioning column — a global single-partition sort does not scale")
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_tok", col(tokenCol).cast("long"))
      .withColumn("__graft_cum", sum(col("__graft_tok")).over(w))
      .withColumn("start_offset", col("__graft_cum") - col("__graft_tok"))
      // `div` (integral division) keeps the arithmetic exact in 64 bits —
      // token offsets at 100 TB exceed double's 2^53 integer grid
      .withColumn("first_seq", expr(s"start_offset div $seqLen"))
      .withColumn(
        "last_seq",
        when(col("__graft_tok") > 0, expr(s"(__graft_cum - 1) div $seqLen"))
          .otherwise(col("first_seq")))
      .drop("__graft_tok", "__graft_cum")
  }

  /** Per-sequence manifest of a `packTrainingSequences` result: for each
    * (group, sequence index), how many documents contribute and how many of
    * its `seqLen` slots they fill — only the last sequence of a group may be
    * partial. Each document fans out to just the sequences it touches
    * (usually 1–2), so the explode is linear, and the groupBy aggregates
    * with map-side partials. */
  def sequenceManifest(
      packed: DataFrame,
      tokenCol: String,
      seqLen: Long,
      partitionCols: Seq[String]): DataFrame = {
    val seqStart = col("seq") * lit(seqLen)
    val docEnd = col("start_offset") + col(tokenCol).cast("long")
    packed
      .withColumn("seq", explode(sequence(col("first_seq"), col("last_seq"))))
      .withColumn(
        "seq_tokens",
        least(docEnd, seqStart + lit(seqLen)) - greatest(col("start_offset"), seqStart))
      .groupBy((partitionCols :+ "seq").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("seq_tokens")).as("n_tokens"))
  }

  /** Per-shard manifest: document count and token total, the thing a
    * training job reads to schedule shard consumption. */
  def shardManifest(sharded: DataFrame, tokenCol: String, extraKeys: Seq[String] = Nil): DataFrame =
    sharded
      .groupBy((extraKeys :+ "shard").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol).cast("long")).as("total_tokens"))

  /** Rendezvous / highest-random-weight shard assignment (Thaler &
    * Ravishankar '98, the consistent-hashing alternative without a ring):
    * each key goes to the shard maximizing xxhash64(key, shard). The HRW
    * property this buys at scale: growing `n` → `n+1` moves EXACTLY the
    * keys whose new argmax is the new shard — an expected 1/(n+1) of the
    * corpus — while every other assignment is untouched (no ring-segment
    * reshuffling), which is what keeps a 100 TB re-shard incremental.
    * Pure map-side: n struct comparisons per row, no shuffle; ties on the
    * 64-bit hash (probability ~n²/2⁶⁴ per key) break to the larger shard
    * id via the struct's second field — total order, engine-replayable. */
  /** Consistent-hash RING with virtual nodes (Karger '97 / Dynamo-style —
    * the other classic sharding scheme beside [[rendezvousShard]]'s HRW:
    * HRW is stateless per key×node, the ring pre-materializes ownership
    * SEGMENTS, which is what systems with range-readable metadata want):
    * each node owns `vnodes` pseudo-random ring positions
    * (xxhash64(node ‖ "#" ‖ v) mod 2³²), a key belongs to the first vnode
    * clockwise from its own hash, and the ring compiles to right-open
    * ownership intervals — so ASSIGNMENT IS AN INTERVAL LOOKUP and rides
    * the broadcast interval-join operator; the ring is metadata-sized, the
    * key side never shuffles.
    *
    * The contract that makes the scheme matter: adding a node moves ONLY
    * the keys that land on the new node's segments — no key ever moves
    * between two old nodes (each old segment either survives or is SPLIT
    * by a new-node vnode; survivors keep their owner). Position collisions
    * between vnodes resolve to the lexicographically smallest node,
    * deterministically.
    *
    * Returns the segment table (lo, hi, node) with right-open [lo, hi)
    * covering [0, 2³²) exactly (the wraparound arc is owned by the
    * smallest-position vnode). */
  def consistentHashRing(spark: org.apache.spark.sql.SparkSession,
      nodes: Seq[String], vnodes: Int): DataFrame = {
    require(nodes.nonEmpty, "consistentHashRing: at least one node")
    require(vnodes >= 1, s"consistentHashRing: vnodes $vnodes must be >= 1")
    require(nodes.distinct.size == nodes.size, "consistentHashRing: duplicate node names")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val m = 4294967296L
    val positions = nodes.flatMap(n => (0 until vnodes).map(v => (n, v)))
      .toDF("node", "v")
      .select(col("node"),
        pmod(xxhash64(concat(col("node"), lit("#"), col("v"))), lit(m)).as("pos"))
      .groupBy("pos").agg(min(col("node")).as("node")) // collision → smallest node
    // segment owned by the vnode at p: (prev_p, p] — spelled right-open as
    // [prev_p + 1, p + 1); the wrap arc [last_p + 1, 2^32) ∪ [0, first_p]
    // belongs to the FIRST vnode. The window orders the ring — vnode-count
    // sized, metadata.
    val w = Window.orderBy("pos")
    val seg = positions
      .withColumn("__graft_prev", lag(col("pos"), 1).over(w))
      .select(
        coalesce(col("__graft_prev") + 1L, lit(0L)).as("lo"),
        (col("pos") + 1L).as("hi"), col("node"))
    val firstOwner = positions.orderBy("pos").limit(1)
      .select(lit(0L).as("__graft_unused"), col("node"))
    val lastPos = positions.agg(max(col("pos")).as("mp"))
    val wrap = firstOwner.crossJoin(lastPos)
      .select((col("mp") + 1L).as("lo"), lit(m).as("hi"), col("node"))
      .filter(col("lo") < col("hi")) // empty when the last vnode sits at 2^32−1
    seg.unionByName(wrap.select("lo", "hi", "node"))
  }

  def rendezvousShard(key: Column, numShards: Int): Column = {
    require(numShards >= 1, s"rendezvousShard: numShards $numShards must be >= 1")
    // hash the key at its NATIVE type (xxhash64 accepts any type): a
    // cast-to-long would throw on string keys under ANSI mode and silently
    // truncate fractional doubles onto colliding shard assignments. The
    // flip side of type-native hashing: xxhash64 is type-sensitive, so the
    // key column's TYPE (not just its values) must stay stable across
    // re-shards — widening an INT key to BIGINT between runs would reassign
    // every key, defeating the HRW incrementality.
    if (numShards == 1) lit(0L) // greatest() needs >= 2 args; one shard is constant
    else greatest((0 until numShards).map { s =>
      struct(xxhash64(key, lit(s.toLong)).as("h"), lit(s.toLong).as("s"))
    }: _*).getField("s")
  }
}
