package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, DenseRank, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Rank, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: `Filter(rankingFn() <= k)` directly over a
  * single-ranking-function Window becomes [[TopKPerKeyNode]] — users
  * write the standard window top-k idiom and the engine substitutes
  * the bounded-state operator (capped shuffle, no per-group sort; see
  * TopKPerKey.scala). All three ranking functions rewrite, each into
  * its own [[TopKRankMode]]:
  *
  *  - `row_number() <= k` → RowNum (exact k, k-bounded heap);
  *  - `rank() <= k` → RankTies (≤ k−1 rows + the boundary tie group,
  *    state = k distinct order-values' tie groups);
  *  - `dense_rank() <= k` → DenseRankTies (top k value classes).
  *
  * Soundness: row_number's semantics over a NON-total order are
  * nondeterministic in Spark (tie order depends on partition-sort
  * internals); the rewrite preserves every deterministic outcome and
  * picks among tied rows exactly as arbitrarily as the window would.
  * rank()/dense_rank() are deterministic under ANY order (tied rows
  * share a rank, so the kept set and the emitted rank are unique) and
  * the operator reproduces their exact numbering — rank() with gaps
  * after ties, dense_rank() without. Conjunctive residue
  * (rn <= k AND p) keeps `p` as a Filter above the rewritten node.
  * Bounds handled: rn <= k, rn < k, rn = 1.
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
      val mode = rankFn match {
        case RowNumber() => TopKRankMode.RowNum
        case Rank(_)     => TopKRankMode.RankTies
        case _           => TopKRankMode.DenseRankTies
      }
      val conjuncts = splitConj(cond)
      val bounds = conjuncts.flatMap(c => boundOf(c, a.exprId).map(c -> _))
      bounds match {
        case Seq((matched, k)) if k >= 1 =>
          val rank = a.toAttribute.asInstanceOf[AttributeReference]
          // Spark's InferWindowGroupLimit may already have inserted a
          // per-partition group limit below the Window; our partial
          // exec IS that limit, so drop the redundant node. Sound to
          // strip only when the limit keeps a superset of our output:
          //  - RowNum target (row_number <= k): any limit fn with
          //    l >= k covers it (dense_rank <= rank <= row_number, so
          //    row_number <= k implies every fn <= k <= l);
          //  - RankTies target (rank <= k): Rank or DenseRank limits
          //    with l >= k cover it (dense_rank <= rank), a RowNumber
          //    limit may cut tied rows;
          //  - DenseRankTies target (dense_rank <= k): only a
          //    DenseRank limit with l >= k covers it (a row in the
          //    k-th value class can carry arbitrarily large rank).
          val input = child match {
            case WindowGroupLimit(p2, o2, limitFn, l, grandchild)
              if p2 == part && o2 == order && l >= k &&
                (mode match {
                  case TopKRankMode.RowNum => true
                  case TopKRankMode.RankTies => limitFn match {
                    case Rank(_) | DenseRank(_) => true
                    case _ => false
                  }
                  case TopKRankMode.DenseRankTies => limitFn match {
                    case DenseRank(_) => true
                    case _ => false
                  }
                }) => grandchild
            case other => other
          }
          val topk = TopKPerKeyNode(part, order, k, rank, input, mode)
          val residue = conjuncts.filterNot(_ eq matched)
          if (residue.isEmpty) topk
          else Filter(residue.reduce(And), topk)
        case _ => f
      }
  }
}
