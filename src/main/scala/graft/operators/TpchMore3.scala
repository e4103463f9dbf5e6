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
      .join(widgetParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** Q2 shape: cheapest supplier per part within one region, with the
    * min-cost condition as a correlated aggregate. partsupp doesn't
    * exist in the star schema, so supply cost is derived: min unit
    * price per (part, supplier) observed in lineitem. The per-part
    * minimum is computed once (grouped agg, not a per-row subquery
    * re-scan) and joined back — the decorrelated plan Catalyst/DuckDB
    * both reach; unit costs are identical doubles in both engines
    * (same single division), so the equality join can't disagree. */
  val q2MinCost: GraftOp = GraftOp(
    "q2_min_cost",
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(round(l_extendedprice * 100) AS BIGINT) * 100
      |        // CAST(l_quantity AS BIGINT)) AS unit_e4
      |  FROM lineitem GROUP BY 1, 2),
      |rsupp AS (
      |  SELECT s_suppkey, s_name, n_name FROM supplier, nation, region
      |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |    AND r_name = 'EUROPE'),
      |c2 AS (
      |  SELECT l_partkey, unit_e4, s_name, n_name
      |  FROM cost JOIN rsupp ON l_suppkey = s_suppkey),
      |m AS (SELECT l_partkey, min(unit_e4) AS min_e4 FROM c2 GROUP BY 1)
      |SELECT p_partkey, p_name, s_name, n_name, unit_e4 / 10000.0 AS unit_cost
      |FROM c2
      |JOIN m ON c2.l_partkey = m.l_partkey AND c2.unit_e4 = m.min_e4
      |JOIN part ON p_partkey = c2.l_partkey
      |WHERE p_size <= 10
      |ORDER BY p_partkey, s_name LIMIT 100""".stripMargin) { (s, d) =>
    // unit cost in EXACT 1e-4-dollar integer units (price-cents·100 div
    // integer quantity): min/tie/equality all run on integers, and the
    // one float op left is an exact-int /10000 at emit — a round(x, 4)
    // of the double quotient was caught landing one step apart across
    // engines at sf0.1 (the §6 round() midpoint gotcha)
    val cost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr(
        "cast(round(l_extendedprice * 100) as bigint) * 100 div cast(l_quantity as bigint)"))
        .as("unit_e4"))
    val rsupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    // r16: registry-persisted — both the per-part min and the final
    // min-match join read c2; each re-ran the lineitem cost aggregate
    val c2 = graft.CachedPlans.cached(s, s"q2.c2:$d")(
      cost.join(rsupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("unit_e4"), col("s_name"), col("n_name")))
    val m = c2.groupBy(col("l_partkey").as("m_partkey")).agg(min(col("unit_e4")).as("min_e4"))
    c2.join(m, col("l_partkey") === col("m_partkey") && col("unit_e4") === col("min_e4"))
      .join(Tables.part(s, d).filter(col("p_size") <= 10),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        (col("unit_e4") / 10000.0).as("unit_cost"))
      .orderBy(col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** Q11 shape: parts whose revenue exceeds the mean per-part revenue —
    * grouped agg + one scalar aggregate broadcast into the HAVING. The
    * threshold is val×n_parts > total (exact decimal × bigint): Q11's
    * FRACTION literal is scale-dependent (0.0001 at SF1 selects
    * nothing at SF0.01 and everything at SF100); an above-average cut
    * keeps ~half the parts at EVERY scale, and no engine can disagree
    * at an exact-arithmetic boundary. */
  val q11ValueShare: GraftOp = GraftOp(
    "q11_value_share",
    """WITH v AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS val
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT sum(val) AS total, count(*) AS n_parts FROM v)
      |SELECT l_partkey, CAST(val AS DOUBLE) AS value
      |FROM v, t WHERE val * n_parts > total
      |ORDER BY value DESC, l_partkey""".stripMargin) { (s, d) =>
    val v = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).as("val"))
    val t = v.agg(sum(col("val")).as("total"), count(lit(1)).as("n_parts"))
    v.crossJoin(broadcast(t))
      .filter(col("val") * col("n_parts") > col("total"))
      .select(col("l_partkey"), col("val").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q16 shape: how many distinct suppliers serve each (brand, type,
    * size) bucket, excluding flagged suppliers (negative balance plays
    * Q16's complaints filter). The NOT IN is a broadcast anti-join;
    * the distinct pair set comes off lineitem once. */
  val q16SupplierCnt: GraftOp = GraftOp(
    "q16_supplier_cnt",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_size IN (1, 5, 10, 15, 20) AND p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM excl)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
    val ps = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey")).distinct()
    val excl = Tables.supplier(s, d).filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    ps.join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, d)
          .filter(col("p_size").isin(1, 5, 10, 15, 20) && col("p_brand") =!= "Brand#1"),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q20 shape: suppliers who ship an above-average share of some red
    * part's volume — a semi-join against a per-(part,supplier)
    * aggregate compared to the per-part total (Q20's 0.5×avail_qty
    * test re-expressed scale-stably: qty×n_suppliers > total is exact
    * decimal × bigint, meaningful at every SF). Both aggregates group
    * on l_partkey, so the second reuses the first's partitioning (no
    * extra wide shuffle at scale). */
  val q20Excess: GraftOp = GraftOp(
    "q20_excess",
    """WITH rp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      |sq AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem JOIN rp ON p_partkey = l_partkey GROUP BY 1, 2),
      |tot AS (SELECT l_partkey, sum(qty) AS tqty, count(*) AS nsupp FROM sq GROUP BY 1),
      |win AS (
      |  SELECT DISTINCT l_suppkey FROM sq JOIN tot USING (l_partkey)
      |  WHERE qty * nsupp > tqty)
      |SELECT s_name, n_name FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM win)
      |ORDER BY s_name""".stripMargin) { (s, d) =>
    val rp = Tables.part(s, d).filter(col("p_name").like("red%")).select(col("p_partkey"))
    val sq = Tables.lineitem(s, d)
      .join(rp, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
    val tot = sq.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("tqty"), count(lit(1)).as("nsupp"))
    val win = sq.join(tot, Seq("l_partkey"))
      .filter(col("qty") * col("nsupp") > col("tqty"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(win, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  val ops: Seq[GraftOp] =
    Seq(q12Priority, q9Profit, q2MinCost, q11ValueShare, q16SupplierCnt, q20Excess)
}
