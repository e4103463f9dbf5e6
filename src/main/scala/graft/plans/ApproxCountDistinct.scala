package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite exact `COUNT(DISTINCT x)` to the HLL++
  * approximation engine-wide — ClickHouse's
  * `count_distinct_implementation` setting re-expressed as a Catalyst
  * rule (the reference's target engine defaults `countDistinct` to
  * `uniqExact`, and operators flip it to `uniq` when dashboards only
  * need ±2%).
  *
  * Why a PLAN rewrite and not a code change: exact distinct counts are
  * the classic silent scale-killer — Spark plans them via
  * RewriteDistinctAggregates' Expand, which REPLICATES every input row
  * per distinct aggregate and shuffles the full distinct key set. The
  * HLL++ form is an ordinary partial-aggregable function: the shuffle
  * carries one 4 KB-ish buffer per group instead of every distinct
  * value. Flipping one conf turns a query corpus written with exact
  * semantics into sketch mode for exploratory / dashboard runs, with
  * no query edits.
  *
  * OPT-IN via `spark.graft.approx.countdistinct` (default false —
  * results change, the user must ask); `…countdistinct.rsd` tunes the
  * target relative standard deviation (default 0.05, Spark's own
  * `approx_count_distinct` default). Only single-argument
  * `COUNT(DISTINCT x)` rewrites — the multi-column form has no HLL++
  * equivalent and keeps exact semantics. Alias/exprId of the
  * surrounding NamedExpression are untouched, so downstream references
  * and the result schema are stable. Idempotent: the rewritten
  * aggregate is no longer distinct, so the pattern cannot re-match. */
object ApproxCountDistinct extends Rule[LogicalPlan] {

  private val EnabledConf = "spark.graft.approx.countdistinct"
  private val RsdConf = "spark.graft.approx.countdistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "false").toBoolean) return plan
    val rsd = conf.getConfString(RsdConf, "0.05").toDouble
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          // only inside Alias: a bare AggregateExpression child of the
          // Aggregate keeps its own toAttribute name, which would
          // otherwise flip from count(DISTINCT x) to approx_…
          case al @ Alias(ae: AggregateExpression, _)
              if ae.isDistinct && ae.aggregateFunction.isInstanceOf[Count] &&
                ae.aggregateFunction.children.length == 1 =>
            val child = ae.aggregateFunction.children.head
            al.withNewChildren(Seq(ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd),
              isDistinct = false)))
        }
    }
  }
}
