package graft.operators

import graft.GraftOp
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H Q12/Q9 shapes, adapted to the driver star schema (no
  * shipmode/commitdate/partsupp — linestatus plays the shipmode role,
  * and Q9's profit drops the supplycost term). What they exercise:
  *
  *  - q12_priority  big-big shuffle join + two-sided conditional counts
  *  - q9_profit     fact ⋈ three broadcast dims, grouped by dim attrs
  */
object TpchMore3 {

  /** Q12 shape: order-priority class mix per lineitem status for one
    * ship year. orders⋈lineitem is the genuinely big-big join of the
    * suite — at scale it shuffles both sides on orderkey (sort-merge);
    * the conditional counts fold map-side after the join. */
  val q12Priority: GraftOp = GraftOp(
    "q12_priority",
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1998-01-01 00:00:00" &&
        col("l_shipdate") < "1999-01-01 00:00:00")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
        sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** Q9 shape: revenue from one part family by supplier nation and ship
    * year. The part filter prunes the fact stream through a broadcast
    * join before the (also broadcast) supplier→nation lookups — only
    * matching lineitems ever reach the aggregation. */
  val q9Profit: GraftOp = GraftOp(
    "q9_profit",
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_profit
      |FROM lineitem, part, supplier, nation
      |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val widgetParts = Tables.part(s, d)
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"))
    Tables.lineitem(s, d)
      .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  val ops: Seq[GraftOp] = Seq(q12Priority, q9Profit)
}
