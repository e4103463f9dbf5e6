package graft.operators

import graft.GraftOp
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Further TPC-H-shaped coverage (adapted to the columns the driver's
  * star schema actually carries). */
object TpchMore {

  /** Q10 shape: revenue from returned items per customer, top 20. */
  val q10Returned: GraftOp = GraftOp(
    "q10_returned",
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q14 shape: promo revenue share in one month — ratio of two exact
    * decimal sums, cast to double before the division on both sides. */
  val q14Promo: GraftOp = GraftOp(
    "q14_promo",
    """SELECT
      |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))
      |      ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS promo_share,
      |  count(*) AS n_items
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin) { (s, d) =>
    val disc = discPrice(col("l_extendedprice"), col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01 00:00:00" && col("l_shipdate") < "1997-02-01 00:00:00")
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", disc)
          .otherwise(lit(0).cast(DecimalType(21, 4)))).cast(DoubleType)
          / sum(disc).cast(DoubleType)).as("promo_share"),
        count(lit(1)).as("n_items"))
  }

  /** Q18 shape: large orders (HAVING on grouped sum) joined back to
    * order/customer detail. */
  val q18Large: GraftOp = GraftOp(
    "q18_large",
    """WITH big AS (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      |SELECT c_custkey, o_orderkey, o_orderdate,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  total_qty
      |FROM big, orders, customer
      |WHERE o_orderkey = l_orderkey AND c_custkey = o_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    big.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        dec2(col("o_totalprice")).cast(DoubleType).as("totalprice"), col("total_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** Q19 shape: OR-combined brand/quantity predicate arms (tests
    * disjunctive filter handling after the join). */
  val q19Ored: GraftOp = GraftOp(
    "q19_ored",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND (
      |     (p_brand = 'Brand#11' AND l_quantity >= 1  AND l_quantity <= 20 AND p_size <= 30)
      |  OR (p_brand = 'Brand#22' AND l_quantity >= 10 AND l_quantity <= 30 AND p_size <= 40)
      |  OR (p_brand = 'Brand#15' AND l_quantity >= 20 AND l_quantity <= 50 AND p_size <= 50))""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("l_quantity").between(1, 20) && col("p_size") <= 30) ||
        (col("p_brand") === "Brand#22" && col("l_quantity").between(10, 30) && col("p_size") <= 40) ||
        (col("p_brand") === "Brand#15" && col("l_quantity").between(20, 50) && col("p_size") <= 50))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val ops: Seq[GraftOp] = Seq(q10Returned, q14Promo, q18Large, q19Ored)
}
