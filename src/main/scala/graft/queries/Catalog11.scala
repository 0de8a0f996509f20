package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDsl._

/** Catalog chunk q287+ — round-10 continuation: the recursive-CTE SQL
  * surface, probabilistic record linkage, link prediction, a one-pass
  * declarative data-quality suite, and further ML-pipeline primitives.
  * Registration + docs in [[graft.Queries]]. */
private[graft] object Catalog11 {

  /** Recursive CTE (`WITH RECURSIVE` — Spark 4's UnionLoop operator,
    * SPARK-24497): a 10-ary hierarchy is derived from part keys (parent(k)
    * = k DIV 10, roots k < 10 — keys are contiguous so every parent
    * exists) and walked TOP-DOWN, threading path-dependent state (owning
    * root, root→node path sum) that only the recursion carries. Output is
    * the per-depth census. Each recursion level is ONE distributed
    * hash-join of the previous frontier against the node table and the
    * level count is bounded by the hierarchy depth (log₁₀ n), so the plan
    * is `depth × (join + union)` — the same shape Delta/graph engines use
    * for bounded-depth reachability at 100 TB. Oracle: DuckDB's own
    * WITH RECURSIVE replays the walk independently. */
  val q287_recursive_cte = Q(
    "q287_recursive_cte",
    (s, dir) => {
      t(s, dir, "part").select(col("p_partkey").cast("long").as("k"))
        .createOrReplaceTempView("q287_nodes")
      s.sql("""
        WITH RECURSIVE walk(k, depth, root, path_sum) AS (
          SELECT k, CAST(0 AS BIGINT), k, k FROM q287_nodes WHERE k < 10
          UNION ALL
          SELECT n.k, w.depth + 1, w.root, w.path_sum + n.k
          FROM q287_nodes n JOIN walk w ON n.k DIV 10 = w.k
          WHERE n.k >= 10
        )
        SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(path_sum) AS BIGINT) AS sum_path,
               CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots
        FROM walk GROUP BY depth ORDER BY depth""")
    },
    Some("""WITH RECURSIVE nodes AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
            walk(k, depth, root, path_sum) AS (
              SELECT k, CAST(0 AS BIGINT), k, k FROM nodes WHERE k < 10
              UNION ALL
              SELECT n.k, w.depth + 1, w.root, w.path_sum + n.k
              FROM nodes n JOIN walk w ON n.k // 10 = w.k
              WHERE n.k >= 10)
            SELECT depth::BIGINT AS depth, COUNT(*)::BIGINT AS n_nodes,
                   SUM(path_sum)::BIGINT AS sum_path,
                   COUNT(DISTINCT root)::BIGINT AS n_roots
            FROM walk GROUP BY depth ORDER BY depth"""))

  val all: Seq[Q] = Seq(q287_recursive_cte)
}
