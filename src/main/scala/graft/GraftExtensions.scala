package graft

import graft.functions.{RollingHash64, SimHash64}
import graft.plans.{TopKPerKey, TopKPerKeyExec}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy for the engine's custom logical operators. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, rankAttr) =>
      // two-phase: map-side partial top-k bounds shuffle volume to
      // k rows per key per input partition, then final top-k after
      // clustering on the keys (rank emitted only by the final phase)
      TopKPerKeyExec(keys, order, k, global = true,
        TopKPerKeyExec(keys, order, k, global = false, planLater(child)),
        rankAttr) :: Nil
    case _ => Nil
  }
}

/** Session extensions: registers the engine's native Catalyst
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberLimitToTopK)
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => RollingHash64(es.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => SimHash64(es.head)))
  }
}
