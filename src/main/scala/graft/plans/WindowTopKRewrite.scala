package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous window-top-k idiom
  *
  * {{{
  * row_number() OVER (PARTITION BY keys ORDER BY ord DESC, tie ASC...)
  *   AS rk ... WHERE rk <= k   -- with rk then dropped
  * }}}
  *
  * into [[TopKPerKeyPlan]], the partial+final bounded-heap operator — so
  * a user writing the PLAIN window API silently gets the O(n log k)
  * no-full-sort execution (Spark's own InferWindowGroupLimit inserts a
  * pre-filter below the window but still sorts and ranks what remains;
  * this rule removes the Window node entirely).
  *
  * The match is deliberately conservative — rewriting is only sound when
  * the rewritten operator provably computes the same rows:
  *
  *  - exactly ONE window expression in the Window node, and it is
  *    `row_number()` (rank/dense_rank admit >k rows on ties);
  *  - the filter is `rk <= lit` or `rk < lit` on that attribute, and the
  *    downstream projection DROPS the rank (if the rank value itself is
  *    consumed, the heap operator cannot supply it);
  *  - the ORDER BY is `first DESC, rest... ASC` with every sort key
  *    provably non-nullable ([[TopKPerKeyExec]] drops null-ordered rows,
  *    a window ranks them; non-nullability makes the difference vacuous)
  *    and at least one tiebreaker (without a total order per key the
  *    window's choice of rows is already arbitrary, but the rewrite
  *    should not introduce NEW nondeterminism);
  *  - multiple tiebreakers fold into one struct (struct ordering is
  *    field-wise, exactly the lexicographic sort the window used).
  *
  * Spark's InferWindowGroupLimit may already have slid a
  * [[WindowGroupLimit]] between the Window and its child (this rule runs
  * with the user-provided batch, after the built-in optimizer); the
  * rewrite strips it — the heap operator subsumes the pre-filter.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private object RankLimit {
    /** (rankAttr exprId, k) from `rk <= lit` / `rk < lit`. */
    def unapply(e: Expression): Option[(ExprId, Int)] = e match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _)) =>
        Some((a.exprId, k))
      case LessThan(a: AttributeReference, Literal(k: Int, _)) =>
        Some((a.exprId, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference) =>
        Some((a.exprId, k))
      case GreaterThan(Literal(k: Int, _), a: AttributeReference) =>
        Some((a.exprId, k - 1))
      case _ => None
    }
  }

  private def eligibleOrder(os: Seq[SortOrder]): Option[(Expression, Expression)] =
    os match {
      case SortOrder(ord, Descending, _, _) +: rest
          if rest.nonEmpty && !ord.nullable &&
            rest.forall(so => so.direction == Ascending &&
              !so.child.nullable) =>
        val tie =
          if (rest.size == 1) rest.head.child
          else CreateStruct(rest.map(_.child).toSeq)
        Some((ord, tie))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList,
        Filter(RankLimit(rankId, k),
          w @ Window(Seq(Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, orderSpec, wChild, _)))
        if k > 0 &&
          w.windowOutputSet.exists(_.exprId == rankId) &&
          projList.forall {
            case a: AttributeReference => a.exprId != rankId &&
              wChild.outputSet.exists(_.exprId == a.exprId)
            case _ => false
          } &&
          partitionSpec.nonEmpty &&
          eligibleOrder(orderSpec).isDefined =>
      val (ord, tie) = eligibleOrder(orderSpec).get
      // InferWindowGroupLimit's pre-filter is subsumed by the heap
      val child = wChild match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      Project(projList, TopKPerKeyPlan(partitionSpec, ord, tie, k, child))
  }
}
