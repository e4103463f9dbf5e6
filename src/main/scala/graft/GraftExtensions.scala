package graft

import graft.functions.{JaroWinkler, NfcNormalize, RollingHash64, SimHash64, VecDot, VecNormalize, WordShingles}
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
    ext.injectOptimizerRule(_ => graft.plans.AutoRangeJoin)
    ext.injectOptimizerRule(_ => graft.plans.ApproxCountDistinct)
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
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      unary("nfc_normalize")(NfcNormalize)))
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
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"jaro_winkler expects exactly 2 arguments, got ${es.length}")
        JaroWinkler(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName, "bloom_might_contain"),
      { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"bloom_might_contain expects (filter, key), got ${es.length} arguments")
        graft.functions.BloomMightContain(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("tdigest_quantiles"),
      new ExpressionInfo(classOf[graft.functions.TDigestQuantiles].getName, "tdigest_quantiles"),
      { es =>
        if (es.length < 2 || es.length > 3) throw new IllegalArgumentException(
          s"tdigest_quantiles expects (value, percentages[, compression]), got ${es.length} arguments")
        def num(v: Any): Double = v match {
          case d: Double => d
          case f: Float => f.toDouble
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case i: Int => i.toDouble
          case l: Long => l.toDouble
          case other => throw new IllegalArgumentException(
            s"tdigest_quantiles percentages must be numeric, got $other")
        }
        def constDoubles(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Double] = {
          require(e.foldable, s"tdigest_quantiles percentages must be a constant, got $e")
          (e.eval(), e.dataType) match {
            case (a: org.apache.spark.sql.catalyst.util.ArrayData,
                at: org.apache.spark.sql.types.ArrayType) =>
              a.toObjectArray(at.elementType).map(num).toSeq
            case (v, _) => Seq(num(v))
          }
        }
        val compression = if (es.length == 3) {
          require(es(2).foldable, "tdigest_quantiles compression must be a constant")
          es(2).eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"tdigest_quantiles compression must be INT, got $other")
          }
        } else 300
        val asDouble = org.apache.spark.sql.catalyst.expressions.Cast(
          es.head, org.apache.spark.sql.types.DoubleType)
        graft.functions.TDigestQuantiles(asDouble, constDoubles(es(1)), compression)
          .toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("bitmap_agg"),
      new ExpressionInfo(classOf[graft.functions.BitmapAgg].getName, "bitmap_agg"),
      unary("bitmap_agg")(e =>
        graft.functions.BitmapAgg(e).toAggregateExpression())))
    ext.injectFunction((
      FunctionIdentifier("bitmap_merge_agg"),
      new ExpressionInfo(classOf[graft.functions.BitmapMergeAgg].getName, "bitmap_merge_agg"),
      unary("bitmap_merge_agg")(e =>
        graft.functions.BitmapMergeAgg(e).toAggregateExpression())))
    ext.injectFunction((
      FunctionIdentifier("hll_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.HllSketchAgg].getName, "hll_sketch_agg"),
      unary("hll_sketch_agg")(e =>
        graft.functions.HllSketchAgg(e).toAggregateExpression())))
    ext.injectFunction((
      FunctionIdentifier("hll_merge_agg"),
      new ExpressionInfo(classOf[graft.functions.HllMergeAgg].getName, "hll_merge_agg"),
      unary("hll_merge_agg")(e =>
        graft.functions.HllMergeAgg(e).toAggregateExpression())))
    ext.injectFunction((
      FunctionIdentifier("theta_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaSketchAgg].getName, "theta_sketch_agg"),
      unary("theta_sketch_agg")(e =>
        graft.functions.ThetaSketchAgg(e).toAggregateExpression())))
    ext.injectFunction((
      FunctionIdentifier("theta_union_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaUnionAgg].getName, "theta_union_agg"),
      unary("theta_union_agg")(e =>
        graft.functions.ThetaUnionAgg(e).toAggregateExpression())))
    ext.injectFunction((
      FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[graft.functions.ThetaEstimate].getName, "theta_estimate"),
      unary("theta_estimate")(graft.functions.ThetaEstimate)))
    ext.injectFunction((
      FunctionIdentifier("theta_intersect"),
      new ExpressionInfo(classOf[graft.functions.ThetaIntersect].getName, "theta_intersect"),
      { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"theta_intersect expects (sketch, sketch), got ${es.length} arguments")
        graft.functions.ThetaIntersect(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("theta_a_not_b"),
      new ExpressionInfo(classOf[graft.functions.ThetaANotB].getName, "theta_a_not_b"),
      { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"theta_a_not_b expects (sketch, sketch), got ${es.length} arguments")
        graft.functions.ThetaANotB(es.head, es(1))
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
