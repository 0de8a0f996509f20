package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Exact top-k rows per group as a FIRST-CLASS physical operator — the
  * whole-operator Catalyst extension path (logical node → planner strategy
  * → physical exec) for the one shape the built-in operators cannot plan
  * well: `row_number() OVER (PARTITION BY g ORDER BY o) <= k`.
  *
  * The window spelling must SORT every group in full — at 100 TB that is a
  * full shuffle of every row followed by a per-partition sort of
  * group-sized runs, all to throw away everything past rank k. This
  * operator instead keeps a bounded heap of k rows per group, and — the
  * part no window can express — runs a PARTIAL pass before the shuffle,
  * exactly like a hash aggregate's map-side combine: each input partition
  * forwards at most k rows per locally-seen group, so the exchange carries
  * O(partitions × groups × k) rows instead of the corpus. For
  * top-5-per-key over billions of skewed rows the shuffle shrinks by the
  * group size / k ratio, and the hot-key sort disappears entirely.
  *
  * Semantics: the output is the first k rows of each group under `order`
  * (ties at the k boundary are resolved arbitrarily — pass a total order,
  * e.g. a unique id as the last sort key, for deterministic results; the
  * same caveat applies to the window form). Output row order is
  * unspecified, as from any aggregate.
  *
  * Memory: one k-row heap per distinct group per partition — the same
  * no-spill envelope as pre-spill hash aggregation; k·groups-per-partition
  * rows must fit, which is the regime this operator is FOR (small k).
  */
object TopKPerGroup {

  /** Logical marker node. `output` = child output (this is a filter-shaped
    * operator, not a projection). */
  case class TopKPerGroupNode(
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
      copy(child = newChild)
  }

  /** Physical bounded-heap top-k. `partial = true` instances accept any
    * input distribution (the map-side combine); the `partial = false`
    * finalizer declares ClusteredDistribution on the group keys, so
    * EnsureRequirements inserts exactly one hash exchange between the two
    * — or none at all when the child is already co-partitioned (bucketed
    * or pre-repartitioned input). */
  case class TopKPerGroupExec(
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      partial: Boolean,
      child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(groupExprs))
    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val groupLocal = groupExprs
      val orderLocal = order
      val kLocal = k
      child.execute().mapPartitions({ iter =>
        val grp = UnsafeProjection.create(groupLocal, childOutput)
        val ord = RowOrdering.create(orderLocal, childOutput)
        // max-heap of the k best (= first-under-`order`) rows: the root is
        // the worst kept row, evicted when a better one arrives
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        val cmp = new java.util.Comparator[InternalRow] {
          override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
        }
        while (iter.hasNext) {
          val row = iter.next()
          val key = grp(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal, cmp)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < kLocal) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      }, preservesPartitioning = true)
    }
  }

  /** Custom OPTIMIZER rule for the custom node: a deterministic filter
    * that references only GROUP columns commutes with per-group top-k
    * (it drops whole groups, never rows within a surviving group), so it
    * pushes below the node — from where Spark's own pushdown carries it
    * into the scan (`PushedFilters`). A filter touching the ORDER columns
    * must NOT move: filtering values before selection changes which rows
    * are the top k. This is the `injectOptimizerRule` extension point;
    * the rule re-fires until fixpoint like any logical rule, and the
    * rewritten shape no longer matches, so it terminates trivially. */
  object PushFilterThroughTopK
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, t @ TopKPerGroupNode(g, _, _, child))
          if cond.deterministic &&
            f.condition.references.subsetOf(AttributeSet(g.flatMap(_.references))) =>
        t.copy(child = Filter(cond, child))
    }
  }

  /** OPT-IN rewrite of the idiomatic window top-k into the bounded-heap
    * operator: `Project(cols, Filter(rn <= k, Window(rn = row_number()
    * OVER (PARTITION BY g ORDER BY o), child)))` becomes
    * `Project(cols, TopKPerGroupNode(g, o, k, child))` whenever the
    * enclosing Project DROPS the rank column — the user keeps writing the
    * textbook `row_number` spelling and the optimizer silently plans the
    * map-side-bounded exec (≤ k rows per group per partition into one
    * exchange, zero sorts).
    *
    * Gated behind `spark.graft.topk.rewriteWindow` (default off) rather
    * than always-on, deliberately: when the window ORDER is not a total
    * order, `row_number` and the heap resolve boundary ties differently —
    * both answers are valid under the query's own semantics, but a
    * pinned-value regression suite (like this repo's oracle gate) would
    * see values flip. The user asserts tie-safety by setting the conf —
    * the same contract TopK.perGroup documents.
    *
    * Shape requirements (all checked): exactly one window expression and
    * it is ROW_NUMBER (rank()/dense_rank() admit ties and must not
    * rewrite); the filter condition is `rn <= lit` / `rn < lit` /
    * `rn = 1` over the rank attribute alone; the Project references
    * child columns only (the rank column must be dead above the filter —
    * TopK does not produce it). */
  object RewriteRowNumberTopK
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Alias, And => _, Attribute, EqualTo, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}

    private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 1 => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (conf.getConfString("spark.graft.topk.rewriteWindow", "false") != "true") return plan
      plan.transform {
        case Project(projList,
              Filter(cond,
                Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
                  part, order, child, _)))
            if order.nonEmpty &&
              limitOf(cond, alias.toAttribute).isDefined &&
              projList.forall(_.references.subsetOf(child.outputSet)) =>
          Project(projList,
            TopKPerGroupNode(part, order, limitOf(cond, alias.toAttribute).get, child))
      }
    }
  }

  /** Plans the logical node as partial → (exchange inserted by
    * EnsureRequirements where needed) → final. */
  class TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupNode(g, o, k, child) =>
        TopKPerGroupExec(g, o, k, partial = false,
          TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }
}
