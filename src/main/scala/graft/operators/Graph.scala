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

  /** Exact triangle count by DEGREE ORIENTATION (the MapReduce-classic
    * Suri–Vassilvitskii / Cohen scheme): orient every undirected edge from
    * its lower-(degree, id) endpoint to the higher one, enumerate wedges
    * u→v, u→w only from each node's ORIENTED out-neighborhood, and count
    * the wedges closed by an oriented edge v→w. Every triangle is counted
    * exactly once (its minimum-(degree, id) vertex owns it).
    *
    * Why this survives 100 TB graphs while the naive 3-way self-join does
    * not: orientation bounds every out-degree by O(√m) — a celebrity node
    * with 10⁸ followers has huge IN-degree but only low-(degree,id)
    * neighbors in its OUT-list — so the wedge expansion is O(m^1.5) total
    * with NO quadratic hot key, the precise skew that kills the
    * unoriented join. The wedge→edge probe is an equi-join on (v, w), and
    * the oriented edge list is materialized once and reused for both
    * sides.
    *
    * `edges` needs columns (src, dst); direction and duplicates are
    * normalized away (self-loops dropped). Returns one row, `triangles`
    * BIGINT.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val undirected = edges
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val degrees = undirected
      .select(col("u").as("node")).union(undirected.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): struct comparison gives the lexicographic order
    val withDeg = undirected
      .join(degrees.select(col("node").as("u"), col("deg").as("deg_u")), "u")
      .join(degrees.select(col("node").as("v"), col("deg").as("deg_v")), "v")
    // the wedge self-join EXPANDS (outdeg² per node) — explicit-N
    // repartition on the join key so the expansion runs wide (AQE
    // coalesces by INPUT bytes, blind to the expansion — the q115 lesson),
    // and the checkpoint pins that layout for all three consumers
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val oriented = withDeg
      .select(
        when(struct(col("deg_u"), col("u")) < struct(col("deg_v"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(struct(col("deg_u"), col("u")) < struct(col("deg_v"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .repartition(par, col("src"))
      .localCheckpoint(true) // consumed 3× (two wedge sides + the probe)
    val wedges = oriented.select(col("src").as("w_u"), col("dst").as("w_v"))
      .join(oriented.select(col("src").as("w_u"), col("dst").as("w_w")), Seq("w_u"))
      .filter(col("w_v") < col("w_w"))
    // a wedge closes iff (v,w) or (w,v) is an oriented edge; v<w picked one
    // ordering of each unordered out-pair, but the closing edge's
    // orientation depends on degrees — probe both directions via the
    // canonical (least, greatest) form, which here is exactly (w_v, w_w)
    val closing = oriented.select(
      least(col("src"), col("dst")).as("w_v"),
      greatest(col("src"), col("dst")).as("w_w"))
    wedges
      .join(closing, Seq("w_v", "w_w"), "left_semi")
      .agg(count(lit(1)).cast("long").as("triangles"))
  }
}
