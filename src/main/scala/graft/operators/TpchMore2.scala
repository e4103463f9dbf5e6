package graft.operators

import graft.GraftOp
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H Q4/Q13/Q17/Q21/Q22 shapes, adapted to the driver star
  * schema's columns (no commitdate/receiptdate/shipmode/phone — the
  * returned-flag plays the "late" role, mktsegment the phone-prefix
  * role). What each one exercises:
  *
  *  - q4_exists     correlated EXISTS → left-semi join + agg
  *  - q13_custdist  left outer join → two-level aggregation
  *  - q17_small_qty correlated avg subquery on the join key
  *  - q21_single    EXISTS and NOT EXISTS against the same table
  *  - q22_wealthy   scalar avg subquery + NOT EXISTS anti join
  */
object TpchMore2 {

  /** Q4 shape: order-priority distribution of 1996 orders having at
    * least one returned lineitem (EXISTS → semi join). */
  val q4Exists: GraftOp = GraftOp(
    "q4_exists",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val returned = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= "1996-01-01 00:00:00" &&
        col("o_orderdate") < "1997-01-01 00:00:00")
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q13 shape: how many customers placed 0, 1, 2, … orders (left
    * outer join so order-less customers count at 0). */
  val q13Custdist: GraftOp = GraftOp(
    "q13_custdist",
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM c_orders GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q17 shape: revenue that would be lost by dropping small-quantity
    * orders for one brand — lineitems under 20% of their part's average
    * quantity. The correlated avg subquery becomes a broadcast join
    * against per-part averages (computed once, not per row). */
  val q17SmallQty: GraftOp = GraftOp(
    "q17_small_qty",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_items
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#11'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val partAvg = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    li.join(Tables.part(s, d).filter(col("p_brand") === "Brand#11"),
        col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((sum(dec2(col("l_extendedprice"))).cast(DoubleType) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** Q21 shape: suppliers who returned a line in a finished multi-
    * supplier order where NO other supplier returned one (the
    * EXISTS + NOT EXISTS double correlation), top 20 by count. */
  val q21Single: GraftOp = GraftOp(
    "q21_single",
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls"))
    val l2 = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"))
    l1.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("lo") === col("o_orderkey"))
      .join(l2, col("lo2") === col("lo") && col("ls2") =!= col("ls"), "left_semi")
      .join(l3, col("lo3") === col("lo") && col("ls3") =!= col("ls"), "left_anti")
      .join(Tables.supplier(s, d), col("ls") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q22 shape: per-segment count and balance of above-average-balance
    * customers gone DORMANT (scalar subquery broadcast as a single-row
    * cross join; NOT EXISTS as an anti join). TPC-H's literal "never
    * ordered" predicate selects nobody in this synthetic corpus — every
    * customer has at least one order at every SF, so the checked result
    * was vacuously empty (0 rows == 0 rows proves nothing). The anti
    * join instead excludes customers with orders ON OR AFTER 1998-06-01
    * ("wealthy but inactive", the query's actual business shape), which
    * is non-empty at every driver SF and keeps the plan identical:
    * scalar-avg broadcast + anti join with a pushed date filter. */
  val q22Wealthy: GraftOp = GraftOp(
    "q22_wealthy",
    """WITH avg_bal AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
      |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
      |SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer, avg_bal
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) > a
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(dec2(col("c_acctbal")) > 0)
      .agg((sum(dec2(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("a"))
    cust.crossJoin(broadcast(avgBal))
      .filter(dec2(col("c_acctbal")) > col("a"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "1998-06-01 00:00:00")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec2(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q7 shape: trade volume between two nations by ship year — the
    * two-sided nation-pair filter over a 4-way join, dims broadcast. */
  val q7Volume: GraftOp = GraftOp(
    "q7_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS volume
      |FROM lineitem, orders, supplier, customer, nation n1, nation n2
      |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND o_custkey = c_custkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    // nation dims are pre-filtered to the two nations of interest (the
    // TPC-H reference plan shape): supplier/customer rows outside them
    // fall out of the broadcast joins directly, instead of relying on
    // Catalyst to infer per-side IN() predicates from the pair OR —
    // cheap insurance that the fact stream is pruned at 100× scale
    val pairNations = Seq("NATION_3", "NATION_7")
    val n1 = Tables.nation(s, d)
      .filter(col("n_name").isin(pairNations: _*))
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .filter(col("n_name").isin(pairNations: _*))
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
      .join(broadcast(n2), col("c_nationkey") === col("nk2"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 shape: one nation's market share inside one region's customer
    * base, by year — ratio of conditional to total exact-decimal sums. */
  val q8Share: GraftOp = GraftOp(
    "q8_share",
    """SELECT CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CASE WHEN n1.n_name = 'NATION_2'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))
      |    ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS mkt_share,
      |  count(*) AS n_items
      |FROM lineitem, orders, supplier, customer, nation n1, nation n2, region
      |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND o_custkey = c_custkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val disc = discPrice(col("l_extendedprice"), col("l_discount"))
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nk2"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("nk2"), "left_semi")
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_2", disc)
          .otherwise(lit(0).cast(DecimalType(21, 4)))).cast(DoubleType)
          / sum(disc).cast(DoubleType)).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_year"))
  }

  /** Q15 shape: top-revenue supplier(s) — grouped revenue view joined
    * against its own max (scalar subquery → single-row broadcast). */
  val q15TopSupp: GraftOp = GraftOp(
    "q15_top_supp",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01 00:00:00" &&
        col("l_shipdate") < "1997-04-01 00:00:00")
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(s, d), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val ops: Seq[GraftOp] = Seq(q4Exists, q13Custdist, q17SmallQty, q21Single, q22Wealthy,
    q7Volume, q8Share, q15TopSupp)
}
