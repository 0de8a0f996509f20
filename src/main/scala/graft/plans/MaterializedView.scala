package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.PlanDataset

/** Materialized-view AUTOMATIC QUERY REWRITE — the classic warehouse
  * accelerator (Calcite/Oracle/BigQuery MV rewrite): a registered MV
  * pre-computes `GROUP BY g1..gn` sums/counts/mins/maxes over a base
  * table; any later aggregate query over the BASE table whose group
  * columns are a SUBSET of the MV's and whose aggregates are derivable
  * re-plans against the MV — a billion-row scan becomes a
  * groups-cardinality scan, transparently.
  *
  * Soundness rules (each checked structurally, no rewrite otherwise):
  *   - roll-up: `sum` re-aggregates as SUM(sum), `count(*)` as
  *     SUM(cnt), `min`/`max` as MIN(min)/MAX(max) — the decomposable
  *     aggregate algebra; non-decomposable aggregates (avg, distinct,
  *     UDAFs) block the rewrite;
  *   - a filter between the aggregate and the scan must reference MV
  *     GROUP columns only (σ over group columns commutes with γ: it
  *     drops whole groups, never rows within a group), and is remapped
  *     onto the MV;
  *   - STALENESS: at registration the MV records the source's file
  *     listing (name → size); the rule re-lists before rewriting and a
  *     mismatch disables the MV — a stale view is never served. On a
  *     txn-log table the version number would be the freshness token;
  *     for plain parquet the listing is the metadata-cheap equivalent.
  *
  * Output attributes keep the ORIGINAL aggregate's ExprIds (aliases are
  * re-issued under the old ids), so parent operators are untouched —
  * the rewrite is invisible above the aggregate.
  *
  * Registered via GraftExtensions (`injectOptimizerRule`) and, for
  * extension-less sessions, appended to `spark.experimental
  * .extraOptimizations` on first `create`/`register` (the TopK
  * fallback pattern). Gated by `spark.graft.mv.rewrite` (default ON —
  * registering an MV is already the opt-in). */
object MaterializedView {

  /** A registered view: where the materialization lives, what it
    * pre-computes, and the source snapshot it was built from. MV column
    * naming is positional-free: group columns keep their names; sums are
    * `sum_<col>`, mins `min_<col>`, maxes `max_<col>`, count(*) is
    * `cnt`. */
  case class MvDef(
      mvPath: String,
      groupCols: Seq[String],
      sums: Set[String],
      hasCount: Boolean,
      mins: Set[String],
      maxs: Set[String],
      snapshot: Map[String, Long])

  private[graft] val registry = TrieMap.empty[String, MvDef]

  private def canon(p: String): String =
    new java.io.File(p).getAbsolutePath

  /** name → size listing of a parquet file or directory (metadata-only,
    * one driver-side listing). */
  private def snapshotOf(path: String): Map[String, Long] = {
    val f = new java.io.File(path)
    if (f.isFile) Map(f.getName -> f.length())
    else Option(f.listFiles()).getOrElse(Array.empty)
      .filter(x => x.isFile && !x.getName.startsWith("_") && !x.getName.startsWith("."))
      .map(x => x.getName -> x.length()).toMap
  }

  /** Register an EXISTING materialization for `sourcePath`. */
  def register(
      spark: SparkSession,
      sourcePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Seq[String],
      count: Boolean,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil): Unit = {
    ensureRule(spark)
    registry.put(canon(sourcePath),
      MvDef(mvPath, groupCols, sums.toSet, count, mins.toSet, maxs.toSet,
        snapshotOf(sourcePath)))
  }

  /** Compute, write and register the MV in one step. The build is one
    * distributed partial-aggregate pass over the source — the same job
    * the first accelerated query would have run. */
  def create(
      spark: SparkSession,
      sourcePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Seq[String],
      count: Boolean,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, count => fcount, lit, max => fmax, min => fmin, sum => fsum}
    require(groupCols.nonEmpty, "mv: need at least one group column")
    val aggs =
      sums.map(c => fsum(col(c)).as(s"sum_$c")) ++
        (if (count) Seq(fcount(lit(1)).as("cnt")) else Nil) ++
        mins.map(c => fmin(col(c)).as(s"min_$c")) ++
        maxs.map(c => fmax(col(c)).as(s"max_$c"))
    require(aggs.nonEmpty, "mv: need at least one aggregate")
    spark.read.parquet(sourcePath)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    register(spark, sourcePath, mvPath, groupCols, sums, count, mins, maxs)
  }

  def unregister(sourcePath: String): Unit = registry.remove(canon(sourcePath))

  def clear(): Unit = registry.clear()

  /** extraOptimizations fallback so the rewrite works on sessions without
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def ensureRule(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteToMv) &&
        !spark.sessionState.optimizer.batches.exists(_.rules.contains(RewriteToMv))) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteToMv
    }
  }

  object RewriteToMv extends Rule[LogicalPlan] {

    /** Strip attribute-only Projects and collect deterministic Filters
      * between the aggregate and the relation. */
    private def unwrap(plan: LogicalPlan, filters: Seq[Expression])
        : (LogicalPlan, Seq[Expression]) = plan match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, filters)
      case Filter(cond, child) if cond.deterministic =>
        unwrap(child, filters :+ cond)
      case other => (other, filters)
    }

    private def pathOf(plan: LogicalPlan): Option[String] = plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths match {
          case Seq(single) => Some(canon(single.toUri.getPath))
          case _ => None
        }
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      if (conf.getConfString("spark.graft.mv.rewrite", "true") != "true") return plan
      plan.transform {
        case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
      }
    }

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val (base, filters) = unwrap(agg.child, Nil)
      val srcPath = pathOf(base).getOrElse(return None)
      val mv = registry.get(srcPath).getOrElse(return None)
      // staleness gate: the source must look exactly as it did at build
      if (snapshotOf(srcPath) != mv.snapshot) return None
      // query group columns must be bare attributes ⊆ MV group columns
      val groupNames = agg.groupingExpressions.map {
        case a: AttributeReference if mv.groupCols.contains(a.name) => a.name
        case _ => return None
      }
      // filters may only touch MV group columns (σ commutes with γ then)
      if (!filters.forall(_.references.forall(a => mv.groupCols.contains(a.name))))
        return None

      val spark = SparkSession.active
      val mvRel = PlanDataset.analyzed(spark.read.parquet(mv.mvPath))
      val mvAttr: Map[String, Attribute] = mvRel.output.map(a => a.name -> a).toMap
      // every MV column the rewrite could need must exist in the files
      if (!(mv.groupCols.forall(mvAttr.contains))) return None

      def rebuilt(ne: NamedExpression): Option[NamedExpression] = ne match {
        case a: AttributeReference if groupNames.contains(a.name) =>
          Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
        case al @ Alias(ae: AggregateExpression, name)
            if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
          val fn2 = ae.aggregateFunction match {
            case s @ Sum(a: AttributeReference, _) if mv.sums.contains(a.name) =>
              mvAttr.get(s"sum_${a.name}").map(m => s.copy(child = m))
            case Count(Seq(Literal(v, _))) if v != null && mv.hasCount =>
              // count(*) over the base = sum of per-group counts
              mvAttr.get("cnt").map(m => Sum(m))
            case mn @ Min(a: AttributeReference) if mv.mins.contains(a.name) =>
              mvAttr.get(s"min_${a.name}").map(m => mn.copy(child = m))
            case mx @ Max(a: AttributeReference) if mv.maxs.contains(a.name) =>
              mvAttr.get(s"max_${a.name}").map(m => mx.copy(child = m))
            case _ => None
          }
          fn2.map(f => Alias(ae.copy(aggregateFunction = f), name)(exprId = al.exprId))
        case _ => None
      }

      val newAggs = agg.aggregateExpressions.map(ne => rebuilt(ne).getOrElse(return None))
      val newGroups: Seq[Expression] = groupNames.map(mvAttr)
      val newChild =
        if (filters.isEmpty) mvRel
        else Filter(
          // refs were checked ⊆ MV group cols above, and group cols ⊆ mvAttr
          filters.map(_.transform {
            case a: AttributeReference => mvAttr(a.name)
          }).reduce(And),
          mvRel)
      Some(Aggregate(newGroups, newAggs, newChild, None))
    }
  }
}
