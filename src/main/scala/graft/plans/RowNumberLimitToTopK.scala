package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite `filter(row_number() over (partition by k
  * order by o) <= n)` into the native [[TopKPerKey]] operator.
  *
  * The window formulation sorts EVERY key group in full and then
  * discards all but n rows; the rewrite keeps bounded heaps and ships
  * at most n rows per key per partition through the shuffle. Fires only
  * on the exact safe shape: a Window whose sole expression is the
  * row_number being filtered with `<=`/`<` against a positive literal.
  * (Spark's own InferWindowGroupLimit inserts a WindowGroupLimit below
  * the Window for this shape; the rewrite strips it and replaces the
  * whole stack.)
  */
object RowNumberLimitToTopK extends Rule[LogicalPlan] {

  /** Above this, bounded in-memory heaps lose to Spark's spill-capable
    * window sort — bail out and keep the Window (mirrors the rationale
    * of Spark's own group-limit threshold). */
  private val maxK = 10000

  private def limitFor(cond: Expression, rank: Attribute): Option[Int] = {
    // guard non-positive literals BEFORE the k-1 adjustment: rn < Int.MinValue
    // would otherwise overflow to top-Int.MaxValue instead of always-false
    def pos(k: Int): Option[Int] = if (k >= 1 && k <= maxK) Some(k) else None
    cond match {
      case LessThanOrEqual(r: Attribute, Literal(k: Int, _)) if r.semanticEquals(rank) => pos(k)
      case LessThan(r: Attribute, Literal(k: Int, _)) if r.semanticEquals(rank) => pos(k).flatMap(x => pos(x - 1))
      case GreaterThanOrEqual(Literal(k: Int, _), r: Attribute) if r.semanticEquals(rank) => pos(k)
      case GreaterThan(Literal(k: Int, _), r: Attribute) if r.semanticEquals(rank) => pos(k).flatMap(x => pos(x - 1))
      case _ => None
    }
  }

  private def isRowNumberFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case UnspecifiedFrame => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topk.rewrite.enabled", "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, spec: WindowSpecDefinition), _)),
          part, order, wchild, _))
        if part.nonEmpty && order.nonEmpty && isRowNumberFrame(spec) =>
      // part.nonEmpty: a global top-n (empty PARTITION BY) would build
      // ClusteredDistribution(Nil), which Spark rejects at planning
      val rank = alias.toAttribute
      limitFor(cond, rank) match {
        case Some(k) if k >= 1 =>
          // Spark may already have inserted its own group-limit below
          val innerChild = wchild match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case c => c
          }
          TopKPerKey(part, order, k, innerChild, Some(rank))
        case _ => f
      }
  }
}
