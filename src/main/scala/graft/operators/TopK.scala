package graft.operators

import graft.GraftOp
import graft.plans.TopKPerKey
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

/** Public API for the custom TopKPerKey operator (logical node +
  * planner strategy + two-phase physical exec; see graft.plans).
  * Requires `GraftExtensions` on the session.
  */
object TopK {

  /** First `k` rows of each key group under `order` (use `col.desc` /
    * `col.asc` Columns for direction). */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    val attrs = child.output
    // honor the session's spark.sql.caseSensitive semantics and refuse
    // to bind silently when the child has duplicate column names
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    def resolve(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.transform { case u: UnresolvedAttribute =>
        attrs.filter(a => resolver(a.name, u.name)) match {
          case Seq(one) => one
          case Seq() => throw new IllegalArgumentException(
            s"column ${u.name} not in ${attrs.map(_.name)}")
          case many => throw new IllegalArgumentException(
            s"column ${u.name} is ambiguous: matches ${many.map(_.name)}")
        }
      }
    val keys = keyCols.map(n => resolve(UnresolvedAttribute(n)))
    val sortOrder = order.map(c => ColumnShim.catalystExpression(c) match {
      case s: SortOrder => resolve(s).asInstanceOf[SortOrder]
      case e => SortOrder(resolve(e), Ascending)
    })
    ColumnShim.ofRows(df.sparkSession, TopKPerKey(keys, sortOrder, k, child))
  }

  /** Oracle-checked query: top-3 lineitems per supplier by price —
    * identical semantics to a window row_number ≤ 3, executed by the
    * custom operator. */
  val qTopKPerKey: GraftOp = GraftOp(
    "q_topk_per_key",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    perKey(li, Seq("l_suppkey"),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
  }

  val ops: Seq[GraftOp] = Seq(qTopKPerKey)
}
