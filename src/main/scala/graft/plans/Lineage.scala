package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level data lineage extracted from the analyzed Catalyst plan —
  * the governance primitive a catalog needs: for every output column,
  * which (table, column) pairs its VALUES derive from. Walks the
  * logical plan bottom-up propagating attribute provenance through
  * projections, aggregates, windows, generators, and joins down to the
  * parquet relations (table name = file basename).
  *
  * This is DATA lineage: filter/join predicates influence which rows
  * survive but not what a value is made of, so predicate columns do not
  * appear unless they also feed an output expression — the standard
  * column-lineage semantics (e.g. OpenLineage's).
  */
object Lineage {

  type Sources = Map[ExprId, Set[(String, String)]]

  /** (output column, source table, source column) triples, sorted. */
  def extract(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Set.empty).toSeq.map {
        case (t, c) => (a.name, t, c)
      }
    }.distinct.sortBy(identity)
  }

  private def walk(plan: LogicalPlan): Sources = plan match {
    case r: LogicalRelation =>
      val table = r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName)
            .getOrElse("unknown").stripSuffix(".parquet")
            .stripSuffix(".orc").stripSuffix(".csv")
        case _ => "unknown"
      }
      r.output.map(a => a.exprId -> Set(table -> a.name)).toMap
    case p: Project =>
      named(p.projectList, walk(p.child))
    case a: Aggregate =>
      named(a.aggregateExpressions, walk(a.child))
    case w: Window =>
      val child = walk(w.child)
      child ++ named(w.windowExpressions, child)
    case g: Generate =>
      val child = walk(g.child)
      val genSrc = g.generator.references
        .flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet
      child ++ g.generatorOutput.map(a => a.exprId -> genSrc).toMap
    case j: Join =>
      walk(j.left) ++ walk(j.right)
    case u: Union =>
      // positional merge across branches
      val maps = u.children.map(walk)
      val perBranch = u.children.map(_.output)
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> maps.zip(perBranch).flatMap { case (m, outs) =>
          outs.lift(i).toSeq.flatMap(a => m.getOrElse(a.exprId, Set.empty))
        }.toSet
      }.toMap
    case other =>
      // pass-through nodes (Filter, Sort, Limit, SubqueryAlias, ...)
      other.children.map(walk).foldLeft(Map.empty: Sources)(_ ++ _)
  }

  private def named(exprs: Seq[NamedExpression], child: Sources): Sources =
    exprs.map { ne =>
      val srcs: Set[(String, String)] = ne match {
        case a: Attribute => child.getOrElse(a.exprId, Set.empty)
        case _ => ne.references
          .flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet
      }
      ne.exprId -> srcs
    }.toMap ++ child
}
