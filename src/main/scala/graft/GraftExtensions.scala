package graft

import graft.functions.{RollingHash64, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: registers the engine's native Catalyst
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
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
