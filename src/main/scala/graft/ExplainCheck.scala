package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Diagnostic main: join-strategy audit across every registered query.
  * Prints a line per query with join/exchange node counts and flags
  * plans containing cartesian joins, or nested-loop joins whose BUILD
  * side is not PROVABLY small.
  *
  * "Provably small" is STRUCTURAL, not a name allowlist: the build
  * subtree must contain a grand (no-grouping) aggregate — ≤1 row by
  * construction, the scalar-subquery broadcast shape — or declare
  * `maxRows ≤ K` on its logical plan (literal relations, LIMITs), or,
  * failing both, actually COUNT ≤ K rows when executed against the
  * audit's scale factor (the knn_brute family: a filtered query SET
  * that is small by data, broadcast against a corpus scan that IS the
  * brute force). The count runs the tiny build side only, never the
  * probe side.
  *
  * AQE is disabled for the audit session so the pre-execution tree is
  * concrete (AdaptiveSparkPlanExec hides children until runtime);
  * strategy choice itself is identical either way at plan time.
  */
object ExplainCheck {

  private val MaxBuildRows = 1000L

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan
        val planStr = plan.toString
        val bhj = "BroadcastHashJoin".r.findAllIn(planStr).size
        val smj = "SortMergeJoin".r.findAllIn(planStr).size
        val ex = "Exchange hashpartitioning".r.findAllIn(planStr).size
        val cart = plan.collect { case c: CartesianProductExec => c }
        val bnls = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
        val offenders = bnls.filterNot(b => buildSideProvablySmall(spark, b))
        if (offenders.nonEmpty && sys.env.contains("GRAFT_EXPLAIN_DEBUG"))
          offenders.foreach(o => System.err.println(
            s"[explain-debug] $name offender build side (${o.buildSide}):\n" +
              (o.buildSide match { case BuildLeft => o.left; case BuildRight => o.right })))
        val flag =
          if (cart.nonEmpty) "  <-- CARTESIAN"
          else if (offenders.nonEmpty) "  <-- NESTED LOOP (build side not provably small)"
          else ""
        if (flag.nonEmpty) flagged += 1
        System.err.println(
          s"[explain] $name: bhj=$bhj smj=$smj bnl=${bnls.size} cart=${cart.size} hashEx=$ex$flag")
      } catch {
        case e: Throwable => System.err.println(s"[explain] $name: FAILED ${e.getMessage}")
      }
    }
    System.err.println(s"[explain] flagged=$flagged")
    CachedPlans.clear(spark)
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }

  /** Subtree traversal that follows ReusedExchangeExec to the exchange
    * it reuses — a reused broadcast is a LEAF in the tree, so the
    * scalar aggregate it wraps would otherwise be invisible. */
  private def subtreeExists(p: SparkPlan)(f: SparkPlan => Boolean): Boolean =
    f(p) || (p match {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        subtreeExists(r.child)(f)
      case _ => p.children.exists(subtreeExists(_)(f))
    })

  private def firstLogical(p: SparkPlan): Option[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    p.logicalLink.orElse(p match {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        firstLogical(r.child)
      case _ => p.children.view.flatMap(firstLogical).headOption
    })

  /** Structural smallness proof for a BNL's build side (see object
    * doc): grand aggregate in the subtree, maxRows bound, or an actual
    * ≤K count of the build side alone. */
  private def buildSideProvablySmall(
      spark: SparkSession, b: BroadcastNestedLoopJoinExec): Boolean = {
    val build: SparkPlan = b.buildSide match {
      case BuildLeft => b.left
      case BuildRight => b.right
    }
    val scalarAgg = subtreeExists(build) {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case s: SortAggregateExec => s.groupingExpressions.isEmpty
      case _ => false
    }
    if (scalarAgg) return true
    val logical = firstLogical(build)
    logical match {
      case Some(l) =>
        l.maxRows.exists(_ <= MaxBuildRows) || {
          // last resort: run the BUILD side only and count — the audit
          // runs at a small SF, and a genuinely-broadcast side is tiny
          // by definition or the plan deserves its flag
          try org.apache.spark.sql.graft.ColumnShim.ofRows(spark, l)
            .limit((MaxBuildRows + 1).toInt).count() <= MaxBuildRows
          catch { case _: Throwable => false }
        }
      case None => false
    }
  }
}
