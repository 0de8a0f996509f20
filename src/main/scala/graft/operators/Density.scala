package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering — DBSCAN (Ester et al., KDD '96) over 2-D
  * points: a point with ≥ `minPts` neighbors within `eps` (itself
  * included, the paper's convention) is CORE; cores within `eps` of each
  * other share a cluster (transitively); a non-core within `eps` of a
  * core is BORDER and joins that core's cluster; everything else is
  * NOISE. The clustering shape k-means cannot express: arbitrary-shaped
  * clusters, no k, and an explicit outlier verdict — embedding-space
  * corpus pruning's "dense semantic regions vs stragglers" call.
  *
  * Scale design (the grid partition every distributed DBSCAN uses): the
  * plane is tiled by eps-sided cells, so any two points within `eps` are
  * in the same or adjacent cells — each point probes its 3×3 cell
  * neighborhood and candidates come from a plain (cx, cy) equi-join; the
  * exact distance filter verifies. Candidate volume is Σ per-cell
  * density² — the inherent ε-neighborhood cost, reached without any
  * all-pairs join; a hot cell is an ordinary AQE-skew equi-join key.
  * Core-core edges feed the pointer-doubling connected-components
  * operator (O(log diameter) rounds, checkpointed iterates); cluster ids
  * are the component's minimum core id, so the labeling is deterministic
  * under any partitioning. Border points take the MINIMUM root among
  * their core neighbors — a tie between two touching clusters resolves
  * by total order, never by arrival order.
  *
  * Returns (id, cluster, role): role ∈ core | border | noise; cluster is
  * NULL exactly for noise. */
object Density {

  def dbscan2d(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      eps: Double,
      minPts: Int): DataFrame = {
    require(eps > 0, s"dbscan2d: eps must be positive, got $eps")
    require(minPts >= 1, s"dbscan2d: minPts must be >= 1, got $minPts")
    require(Seq(idCol, xCol, yCol).forall(points.columns.contains),
      s"dbscan2d: missing columns in ${points.columns.mkString(",")}")
    val p = points
      .select(col(idCol).cast("long").as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
      .localCheckpoint(true) // probed, indexed, and labeled — three consumers
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probeCells = p.select(
      col("id").as("ia"), col("x").as("xa"), col("y").as("ya"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
      }: _*)).as("__graft_c"))
      .select(col("ia"), col("xa"), col("ya"),
        col("__graft_c.cx").as("cx"), col("__graft_c.cy").as("cy"))
    val index = p.select(col("id").as("ib"), col("x").as("xb"), col("y").as("yb"),
      col("cx"), col("cy"))
    // self-pairs (ia = ib) arrive via the (0,0) offset and are KEPT: the
    // eps-neighborhood includes the point itself
    val pairs = probeCells.join(index, Seq("cx", "cy"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(eps * eps))
      .select(col("ia"), col("ib"))
      .localCheckpoint(true) // counts, core edges, and border lookup all read it
    val core = pairs.groupBy(col("ia").as("id"))
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") >= minPts.toLong)
      .select(col("id"))
      .localCheckpoint(true)
    val coreEdges = pairs
      .join(core.select(col("id").as("ia")), Seq("ia"), "left_semi")
      .join(core.select(col("id").as("ib")), Seq("ib"), "left_semi")
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id1"), col("ib").as("id2"))
    val ccRoots = graft.text.Dedup.duplicateClusters(coreEdges)
      .select(col("id"), col("root"))
    // an edge-less core (its eps-ball holds only itself + borders) is its
    // own singleton cluster
    val coreRoots = core
      .join(ccRoots, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
      .localCheckpoint(true)
    val coreLabeled = coreRoots.select(col("id"), col("cluster"), lit("core").as("role"))
    val borderLabeled = pairs
      .join(core.select(col("id").as("ia")), Seq("ia"), "left_anti") // ia is non-core
      .join(coreRoots.select(col("id").as("ib"), col("cluster")), Seq("ib")) // ib is core
      .groupBy(col("ia").as("id"))
      .agg(min(col("cluster")).as("cluster"))
      .select(col("id"), col("cluster"), lit("border").as("role"))
    val noise = p.select(col("id"))
      .join(coreLabeled.select(col("id")), Seq("id"), "left_anti")
      .join(borderLabeled.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("cluster"), lit("noise").as("role"))
    coreLabeled.unionByName(borderLabeled).unionByName(noise)
  }
}
