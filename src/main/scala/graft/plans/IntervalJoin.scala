package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Broadcast interval-LOOKUP join as a first-class physical operator — the
  * second whole-operator Catalyst extension beside
  * [[graft.plans.TopKPerGroup]], for the shape Spark's planner handles
  * worst: joining a fact table to a small table of NON-OVERLAPPING
  * `[lo, hi)` intervals on a containment predicate (tax brackets, price
  * tiers, IP→geo blocks, time buckets, quota bands).
  *
  * What Spark plans for `fact JOIN dim ON p >= lo AND p < hi` is
  * BroadcastNestedLoopJoin: every probe row evaluates the predicate
  * against EVERY interval — O(n·m) predicate evaluations, and the m side
  * of that product is pure waste when intervals are disjoint (at most one
  * can match). This exec collects the build side once, sorts it by `lo`,
  * VALIDATES disjointness (refusing otherwise — with overlap the
  * lookup contract is wrong, and silently returning one match would be a
  * correctness bug), broadcasts the sorted array, and probes it with a
  * binary search per fact row: O(n log m), no shuffle of the fact side,
  * probe-side partitioning preserved. At 100 TB fact / 10⁴ intervals the
  * nested loop evaluates 10⁴× more predicates than needed; this operator
  * makes the lookup a log₂(10⁴) ≈ 13-step search inside one partition-
  * local pass.
  *
  * Semantics: INNER join, point in `[lo, hi)`; NULL points never match;
  * probe rows outside every interval drop. `point`, `lo`, `hi` must be
  * LongType — integer interval lookup is the honest scope (float
  * boundaries belong to quantization first).
  *
  * Scale notes: the build side must fit on the driver + one broadcast
  * (same envelope as any broadcast join); the probe side streams. */
object IntervalJoin {

  /** Logical marker node: probe = left, intervals = right. */
  case class IntervalJoinNode(
      point: Expression,
      lo: Expression,
      hi: Expression,
      left: LogicalPlan,
      right: LogicalPlan) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ right.output
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
      copy(left = newLeft, right = newRight)
  }

  case class IntervalLookupJoinExec(
      point: Expression,
      lo: Expression,
      hi: Expression,
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {
    override def output: Seq[Attribute] = left.output ++ right.output
    // probe-side partitioning survives: this is a map-side lookup
    override def outputPartitioning = left.outputPartitioning
    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): IntervalLookupJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val loB = BindReferences.bindReference(lo, right.output)
      val hiB = BindReferences.bindReference(hi, right.output)
      val entries = right.executeCollect().map { r =>
        val l = loB.eval(r)
        val h = hiB.eval(r)
        require(l != null && h != null, "interval join: NULL interval bound on the build side")
        (l.asInstanceOf[Long], h.asInstanceOf[Long], r.copy())
      }.sortBy(_._1)
      entries.foreach { case (l, h, _) =>
        require(l < h, s"interval join: empty or inverted interval [$l, $h)")
      }
      entries.iterator.sliding(2).withPartial(false).foreach { pair =>
        val (l1, h1, _) = pair.head
        val (l2, _, _) = pair(1)
        require(h1 <= l2,
          s"interval join: overlapping intervals [$l1, $h1) and [$l2, ...) — " +
            "the lookup contract needs disjoint intervals")
      }
      val bc = sparkContext.broadcast(entries)
      val leftOutput = left.output
      val outputLocal = output
      val pointLocal = point
      left.execute().mapPartitions({ iter =>
        val arr = bc.value
        val los = arr.map(_._1)
        val pB = BindReferences.bindReference(pointLocal, leftOutput)
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(outputLocal, outputLocal)
        iter.flatMap { row =>
          val pv = pB.eval(row)
          if (pv == null || arr.isEmpty) Iterator.empty
          else {
            val p = pv.asInstanceOf[Long]
            var idx = java.util.Arrays.binarySearch(los, p)
            if (idx < 0) idx = -idx - 2 // rightmost lo < p
            if (idx >= 0 && p < arr(idx)._2) {
              joined(row, arr(idx)._3)
              Iterator.single(proj(joined): InternalRow)
            } else Iterator.empty
          }
        }
      }, preservesPartitioning = true)
    }
  }

  /** Plans the logical node; the build (right) side is collected by the
    * exec itself, so only the probe child is `planLater`-ed into the
    * streaming path. */
  class IntervalJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case IntervalJoinNode(p, l, h, leftPlan, rightPlan) =>
        IntervalLookupJoinExec(p, l, h, planLater(leftPlan), planLater(rightPlan)) :: Nil
      case _ => Nil
    }
  }
}
