package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, DenseRank, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Rank, RowNumber, WindowExpression, WindowSpecDefinition}
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
  *
  * `rank() = 1` / `dense_rank() = 1` — the other common top-1 idiom —
  * also rewrite, into the operator's keep-ties mode: at rank 1 both
  * functions select exactly the rows TIED for the best order value
  * per key (they only diverge past the first tie group), so the
  * result is deterministic under any order and the bounded state is
  * the tie group itself (= the output). Bounds past 1 deliberately do
  * NOT rewrite: `rank() <= k` admits more than k rows on ties and
  * `dense_rank() <= k` admits whole value classes — neither is
  * expressible with a k-bounded heap.
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
        Window(Seq(a @ Alias(WindowExpression(rankFn,
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))
        if order.nonEmpty && (rankFn match {
          case RowNumber() | Rank(_) | DenseRank(_) => true
          case _ => false
        }) =>
      val keepTies = !rankFn.isInstanceOf[RowNumber]
      val conjuncts = splitConj(cond)
      val bounds = conjuncts.flatMap(c => boundOf(c, a.exprId).map(c -> _))
      bounds match {
        // rank()/dense_rank() rewrite at k = 1 only (see scaladoc)
        case Seq((matched, k)) if k >= 1 && (!keepTies || k == 1) =>
          val rank = a.toAttribute.asInstanceOf[AttributeReference]
          // Spark's InferWindowGroupLimit may already have inserted a
          // per-partition group limit below the Window; our partial
          // exec IS that limit, so drop the redundant node. Sound to
          // strip when the limit keeps a superset of our output: any
          // rank-like limit with l >= k covers the row_number case
          // (row_number <= k implies rank <= k <= l), but the
          // keep-ties case needs a tie-keeping limit function — a
          // RowNumber group limit may cut tied rows.
          val input = child match {
            case WindowGroupLimit(p2, o2, limitFn, l, grandchild)
              if p2 == part && o2 == order && l >= k &&
                (!keepTies || (limitFn match {
                  case Rank(_) | DenseRank(_) => true
                  case _ => false
                })) => grandchild
            case other => other
          }
          val topk = TopKPerKeyNode(part, order, k, rank, input, keepTies)
          val residue = conjuncts.filterNot(_ eq matched)
          if (residue.isEmpty) topk
          else Filter(residue.reduce(And), topk)
        case _ => f
      }
  }
}
