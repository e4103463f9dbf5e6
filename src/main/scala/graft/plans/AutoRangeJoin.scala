package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite a keyless range join —
  * `points JOIN intervals ON p >= s AND p < e` with NO equality
  * conjunct — into the binned equi join
  * [[graft.operators.RangeJoin.binnedPointIntervalBy]] plans by hand.
  *
  * Spark plans the naive shape as a broadcast-nested-loop join
  * (O(n·m) comparisons — the silent scale-killer); after the rewrite
  * it is one hash shuffle on the bin key plus the exact re-filter.
  * OPT-IN via `spark.graft.rangejoin.binSeconds`: a bin width must be
  * near the typical interval length for the explode replication to
  * stay O(1), and only the user knows the data's time scale — an
  * unconditional rewrite with a guessed width could regress. Unset ⇒
  * rule inert.
  *
  * Fires only on the exact safe shape: INNER join, both range bounds
  * timestamp-typed, the point column entirely from one side and both
  * interval bounds entirely from the other, and no equi conjunct
  * (if one exists Spark already hash-joins on it). Idempotent by
  * construction — the rewritten join HAS an equality conjunct, so the
  * pattern can't match it again. Reversed intervals (e < s) are
  * filtered before the explode, mirroring the manual API's guard. */
object AutoRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BinConf = "spark.graft.rangejoin.binSeconds"

  private def isTs(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  private def from(side: LogicalPlan, e: Expression): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** (point, start, end, pointsOnLeft) when the conjuncts form the
    * point-in-interval shape with no equi conjunct. */
  private def rangeShape(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val crossEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (from(left, a) && from(right, b)) || (from(right, a) && from(left, b))
      case EqualNullSafe(a, b) =>
        (from(left, a) && from(right, b)) || (from(right, a) && from(left, b))
      case _ => false
    }
    if (crossEqui || conjuncts.length != 2) return None
    // normalize both conjuncts to (lower-or-equal bound, strict upper)
    def geq(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(a, b) => Some((a, b)) // a >= b
      case LessThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
    def lt(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThan(a, b) => Some((a, b)) // a < b
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }
    val pairs = for {
      (pc, lc) <- Seq((conjuncts.head, conjuncts(1)), (conjuncts(1), conjuncts.head))
      (p1, s) <- geq(pc).toSeq
      (p2, e) <- lt(lc).toSeq
      if p1.semanticEquals(p2) && Seq(p1, s, e).forall(isTs)
    } yield (p1, s, e)
    pairs.headOption.flatMap { case (p, s, e) =>
      if (from(left, p) && from(right, s) && from(right, e)) Some((p, s, e, true))
      else if (from(right, p) && from(left, s) && from(left, e)) Some((p, s, e, false))
      else None
    }
  }

  // Catalyst expressions are constructed DIRECTLY (not via the Column
  // functions API — on Spark 4 that builds name-resolved ColumnNodes,
  // which convert to UnresolvedFunction and cannot live in an
  // optimizer-produced plan). Timezone is pinned at construction;
  // nothing re-runs analysis' ResolveTimeZone after this point.

  /** Epoch-microseconds of a timestamp expression (NTZ read as a
    * session-timezone wall clock, matching unix_timestamp). */
  private def epochMicros(e: Expression): Expression = {
    val ltz = if (e.dataType == TimestampNTZType)
      Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)) else e
    UnixMicros(ltz)
  }

  /** floor(seconds / binSeconds) — computed in micros; the nested-floor
    * identity makes it equal to the manual API's floor(unix/B). */
  private def binOf(e: Expression, binSeconds: Long): Expression =
    Floor(Divide(Cast(epochMicros(e), org.apache.spark.sql.types.DoubleType),
      Literal((binSeconds * 1000000L).toDouble)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    conf.getConfString(BinConf, "") match {
      case "" => plan
      case b => rewrite(plan, b.toLong)
    }

  private def rewrite(plan: LogicalPlan, binSeconds: Long): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rangeShape(left, right, cond) match {
        case None => j
        case Some((p, s, e, pointsOnLeft)) =>
          val (points, intervals) = if (pointsOnLeft) (left, right) else (right, left)
          // points side: in-place bin column
          val pAlias = Alias(binOf(p, binSeconds), "__graft_bin_p")()
          val pBin = pAlias.toAttribute
          val pointsB = Project(points.output :+ pAlias, points)
          // intervals side: reversed pairs filtered (negative sequence
          // step guard), covered-bin array exploded to rows
          val filtered = Filter(GreaterThanOrEqual(e, s), intervals)
          // same loud maxBins guard as the manual API: one corrupt
          // multi-year interval must fail the job, not OOM the task
          val sb = binOf(s, binSeconds)
          val eb = binOf(e, binSeconds)
          val seq = Sequence(sb, eb, None, Some(conf.sessionLocalTimeZone))
          val maxBins = conf.getConfString("spark.graft.rangejoin.maxBins", "10000").toLong
          val guarded = If(
            LessThan(Subtract(eb, sb), Literal(maxBins)),
            seq,
            Cast(new RaiseError(Literal(
              s"AutoRangeJoin: interval spans more than $maxBins bins — " +
                "corrupt interval or spark.graft.rangejoin.binSeconds far too small")),
              seq.dataType))
          val binsAlias = Alias(guarded, "__graft_bins")()
          val withBins = Project(intervals.output :+ binsAlias, filtered)
          val explodeGen = Explode(binsAlias.toAttribute)
          val el = explodeGen.elementSchema.head
          val iBin = AttributeReference("__graft_bin_i", el.dataType, el.nullable)()
          val exploded = Generate(
            explodeGen,
            unrequiredChildIndex = Seq(withBins.output.length - 1),
            outer = false,
            qualifier = None,
            generatorOutput = Seq(iBin),
            child = withBins)
          val joined = Join(pointsB, exploded, Inner,
            Some(And(EqualTo(pBin, iBin), cond)),
            JoinHint.NONE)
          Project(j.output, joined)
      }
  }
}
