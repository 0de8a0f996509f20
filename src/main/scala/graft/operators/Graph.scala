package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — the operator family where
  * naive Spark implementations die at scale (unbounded lineage, one
  * codegen'd mega-plan per iteration). Same design rules as
  * [[graft.text.Dedup.duplicateClusters]]: every iteration eagerly
  * checkpoints (lineage truncated, result anchored), inputs consumed more
  * than once are materialized exactly once.
  */
object Graph {

  /** Fixed-point integer PageRank: ranks are BIGINT multiples of
    * 1/`scale`, every step is integer arithmetic —
    *
    *   base     = (scale * (dampDen - dampNum)) div (dampDen * N)
    *   contrib  = rank div outdeg           (per out-edge)
    *   rank'(v) = base + (dampNum * Σ contrib(u→v)) div dampDen
    *
    * — so the result is DETERMINISTIC under any partitioning and engine
    * (integer sums commute exactly; float PageRank differs in the last
    * ulps per shuffle order), which is what makes it oracle-replayable.
    * The floor divisions leak ≤ 1/scale per edge per round to rounding —
    * the standard fixed-point trade; dangling-node mass (nodes with no
    * out-edges) is dropped rather than redistributed, also by contract.
    *
    * Overflow-safe by construction: total rank mass starts at ~`scale`
    * and only shrinks, so `dampNum * Σ` stays below dampNum·scale
    * regardless of node count.
    *
    * Scale shape: edges and out-degrees are joined once and cached; each
    * round is one join on `src` + one aggregation on `dst` + one left
    * join back to the node set — all shuffles on node keys, no
    * whole-graph collects; `checkpoint` truncates lineage each round
    * (local by default, pluggable durable for spot-node clusters).
    *
    * `edges` needs columns (src, dst); duplicate edges are meaningful
    * (parallel edges contribute twice) — pre-`distinct()` if unwanted.
    */
  def pageRankFixedPoint(
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpoint: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    require(scale >= 1000L, s"pageRank: scale must be >= 1000, got $scale")
    require(dampNum >= 0 && dampNum <= dampDen, s"pageRank: damping $dampNum/$dampDen not in [0,1]")
    val e = checkpoint(edges.select(col("src"), col("dst")))
    val nodes = checkpoint(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__graft_outdeg"))
    val edgesWithDeg = checkpoint(e.join(outdeg, "src"))
    var ranks = checkpoint(nodes.withColumn("rank", lit(scale / n)))
    var it = 0
    while (it < iterations) {
      val sums = edgesWithDeg
        .join(ranks, edgesWithDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div __graft_outdeg").as("__graft_c"))
        .groupBy(col("node"))
        .agg(sum(col("__graft_c")).as("__graft_s"))
      ranks = checkpoint(
        nodes
          .join(sums, Seq("node"), "left")
          .select(
            col("node"),
            (lit(base) +
              expr(s"($dampNum * coalesce(__graft_s, 0L)) div $dampDen")).as("rank")))
      it += 1
    }
    ranks
  }
}
