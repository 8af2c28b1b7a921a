package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: `Filter(row_number() <= k)` directly over a
  * single-row_number Window becomes [[TopKPerKeyNode]] — users write
  * the standard window top-k idiom and the engine substitutes the
  * bounded-heap operator (capped shuffle, no per-group sort; see
  * TopKPerKey.scala).
  *
  * Soundness: row_number's semantics over a NON-total order are
  * nondeterministic in Spark (tie order depends on partition-sort
  * internals); the rewrite preserves every deterministic outcome and
  * picks among tied rows exactly as arbitrarily as the window would.
  * Conjunctive residue (rn <= k AND p) keeps `p` as a Filter above
  * the rewritten node. Bounds handled: rn <= k, rn < k, rn = 1.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def boundOf(cond: Expression, rnId: org.apache.spark.sql.catalyst.expressions.ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rnId => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rnId => Some(k - 1)
      case EqualTo(a: AttributeReference, IntegerLiteral(1))
        if a.exprId == rnId => Some(1)
      case EqualTo(IntegerLiteral(1), a: AttributeReference)
        if a.exprId == rnId => Some(1)
      case _ => None
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))
        if order.nonEmpty =>
      val conjuncts = splitConj(cond)
      val bounds = conjuncts.flatMap(c => boundOf(c, a.exprId).map(c -> _))
      bounds match {
        case Seq((matched, k)) if k >= 1 =>
          val rank = a.toAttribute.asInstanceOf[AttributeReference]
          // Spark's InferWindowGroupLimit may already have inserted a
          // per-partition group limit below the Window; our partial
          // exec IS that limit, so drop the redundant node.
          val input = child match {
            case WindowGroupLimit(p2, o2, RowNumber(), l, grandchild)
              if p2 == part && o2 == order && l >= k => grandchild
            case other => other
          }
          val topk = TopKPerKeyNode(part, order, k, rank, input)
          val residue = conjuncts.filterNot(_ eq matched)
          if (residue.isEmpty) topk
          else Filter(residue.reduce(And), topk)
        case _ => f
      }
  }
}
