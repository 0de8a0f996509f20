package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.plans.SqDistL2

/** Greedy k-center coreset selection (Gonzalez '85 farthest-point
  * traversal, the classical 2-approximation to the k-center cover): pick
  * the point farthest from the already-selected set, k−1 times — the
  * "maximally diverse subset" primitive of data curation (seed sets,
  * eval panels, codebook/probe initialization), complementary to MMR
  * (q175), which trades diversity against a relevance score.
  *
  * Scale shape per round: ONE map-side `least(d, sqdist(qv, newest))`
  * update of the running min-distance column — each round compares
  * against only the NEWEST pick, O(N) work total per round, never
  * O(N·|selected|) — followed by a top-1 reduce (`orderBy.limit(1)`,
  * partial per partition). The frame is `localCheckpoint`ed each round
  * (the established k-means/PageRank iteration hygiene: an 8-round
  * `least` chain would otherwise nest eight plan copies).
  *
  * Integer-exact: operates on floor-quantized vectors ([[Pq.quantized]]
  * grid) so distances are BIGINTs and the DuckDB oracle replays every
  * round verbatim. Ties on the max-min distance break to the smallest id
  * on both sides. */
object Coreset {

  /** Returns (round, id, maxmin_d2): round 0 is the seed (smallest id,
    * d2 = 0), rounds 1..k−1 the greedy picks with their selection-time
    * max-min squared distance. */
  def kCenterGreedy(df: DataFrame, idCol: String, qvCol: String, k: Int): Seq[(Int, Long, Long)] = {
    require(k >= 1, s"kCenterGreedy: k must be >= 1, got $k")
    val base = df.select(col(idCol).cast("long").as("__cs_id"), col(qvCol).as("__cs_qv"))
    val seedRow = base.orderBy("__cs_id").limit(1).collect().head
    val seedId = seedRow.getLong(0)
    var picks = Vector((0, seedId, 0L))
    var cur = base
      .withColumn("__cs_d", ExprColumn(SqDistL2(
        ExprColumn.expr(col("__cs_qv")), seedRow.getSeq[Long](1))))
      .localCheckpoint(true)
    for (round <- 1 until k) {
      val far = cur
        .filter(!col("__cs_id").isin(picks.map(_._2): _*))
        .orderBy(col("__cs_d").desc, col("__cs_id"))
        .limit(1).collect().head
      picks :+= ((round, far.getLong(0), far.getAs[Long]("__cs_d")))
      if (round < k - 1) {
        val next = cur.withColumn("__cs_d",
          least(col("__cs_d"), ExprColumn(SqDistL2(
            ExprColumn.expr(col("__cs_qv")), far.getSeq[Long](1)))))
          .transform(org.apache.spark.sql.graft.CheckpointFresh.apply)
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    picks
  }
}
