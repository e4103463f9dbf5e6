package graft

import graft.functions.{RollingHash64, SimHash64, VecDot, VecNormalize, WordShingles}
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
    def unary(name: String)(
        mk: org.apache.spark.sql.catalyst.expressions.Expression =>
          org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression = { es =>
      if (es.length != 1) throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${es.length}")
      mk(es.head)
    }
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash"),
      unary("rolling_hash")(RollingHash64)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      unary("simhash64")(SimHash64)))
    ext.injectFunction((
      FunctionIdentifier("vec_normalize"),
      new ExpressionInfo(classOf[VecNormalize].getName, "vec_normalize"),
      unary("vec_normalize")(VecNormalize)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"vec_dot expects exactly 2 arguments, got ${es.length}")
        VecDot(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"word_shingles expects (text, n), got ${es.length} arguments")
        es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
            WordShingles(es.head, n)
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an INT literal, got $other")
        }
      }))
  }
}
