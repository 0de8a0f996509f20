package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LeafNode, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.PlanDataset

/** Column-level lineage extraction over the ANALYZED logical plan — for
  * every output column of a frame, the set of source-table columns it
  * transitively depends on. This is governance/debugging tooling the
  * engine gets for free from being Catalyst-native: the analyzed plan
  * already carries globally-unique `ExprId`s, so provenance is one bottom-up
  * fold, no source parsing, and it works on ANY frame however composed
  * (the reference exposes dataset provenance only as registry metadata;
  * here it is derived from the query itself, so it cannot go stale).
  *
  * The fold: leaf relations seed each output attribute with
  * `<table>.<column>` (table = file-relation root basename); `Project`/
  * `Aggregate`/`Window` map each named output expression to the union of
  * its referenced attributes' source sets; `Generate` maps generator output
  * to the generator's references; `Union` merges children positionally
  * (Spark reuses the first child's ExprIds for the union's output);
  * everything else (Filter/Join/Sort/Limit/...) passes attributes through
  * unchanged. Columns derived from no source column (literals,
  * `count(1)`) report the empty marker `"literal"`.
  *
  * Driver-side by design — it reads the PLAN, never the data. Subquery
  * expressions are out of scope (none of graft's operators emit them;
  * their references would simply be missing from the report, not wrong).
  */
object Lineage {

  /** out_col -> sorted source columns ("table.col"). */
  def columnSources(df: DataFrame): Seq[(String, Seq[String])] = {
    val plan = PlanDataset.analyzed(df)
    val m = fold(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String]).toSeq.sorted)
  }

  /** The lineage report as a one-row-per-output-column frame
    * (out_col, sources — comma-joined, "literal" when source-free). */
  def report(df: DataFrame): DataFrame = {
    val rows = columnSources(df).map { case (n, srcs) =>
      (n, if (srcs.isEmpty) "literal" else srcs.mkString(","))
    }
    df.sparkSession.createDataFrame(rows).toDF("out_col", "sources")
  }

  private def leafName(leaf: LeafNode): String = leaf match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption
        .map(_.getName.replaceAll("\\.(parquet|orc|csv|json|txt)$", ""))
        .getOrElse("relation")
    case other => other.nodeName.toLowerCase
  }

  private def fold(plan: LogicalPlan): Map[ExprId, Set[String]] = plan match {
    case leaf: LeafNode =>
      val t = leafName(leaf)
      leaf.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
    case _ =>
      val fromChildren = plan.children.map(fold).fold(Map.empty)(_ ++ _)
      def refs(e: Expression): Set[String] =
        e.references.iterator.flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty)).toSet
      def named(es: Seq[NamedExpression]): Map[ExprId, Set[String]] =
        es.map(ne => ne.exprId -> refs(ne)).toMap
      plan match {
        case p: Project => fromChildren ++ named(p.projectList)
        case a: Aggregate => fromChildren ++ named(a.aggregateExpressions)
        case w: Window => fromChildren ++ named(w.windowExpressions)
        case g: Generate =>
          fromChildren ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator)).toMap
        case u: Union =>
          val childMaps = u.children.map(fold)
          fromChildren ++ u.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> u.children.zip(childMaps).iterator.flatMap { case (c, cm) =>
              cm.getOrElse(c.output(i).exprId, Set.empty[String])
            }.toSet
          }.toMap
        case _ => fromChildren
      }
  }
}
