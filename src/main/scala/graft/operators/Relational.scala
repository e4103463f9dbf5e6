package graft.operators

import graft.GraftOp
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational / OLAP core (SURVEY.md §2b).
  *
  * TPC-H-shaped queries over the driver's star schema. Every plan is
  * declarative DataFrame API: filters/projections push to the parquet
  * scan, dimension joins are broadcast, fact-fact joins shuffle only on
  * their key with AQE handling runtime coalesce/skew.
  */
object Relational {

  /** Q1 shape: multi-key group-by with exact-decimal money aggregates. */
  val q1Agg: GraftOp = GraftOp(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= "2000-01-01 00:00:00")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("sum_disc_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")) *
          (lit(1).cast(DecimalType(3, 2)) + rate2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sumMoney(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (sum(rate2(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q6 shape: selective scan — filter + projection pushdown, single agg. */
  val q6Filter: GraftOp = GraftOp(
    "q6_filter",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.02 AND l_discount <= 0.04
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1996-01-01 00:00:00" &&
        col("l_shipdate") < "1997-01-01 00:00:00" &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * rate2(col("l_discount"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q3 shape: segment join + group + top-k with deterministic tiebreak. */
  val q3Topk: GraftOp = GraftOp(
    "q3_topk",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < "1998-03-15 00:00:00")
    Tables.lineitem(s, d)
      .join(cust.join(ord, col("c_custkey") === col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5 shape: multi-way join with broadcast dimension chain. */
  val q5Join: GraftOp = GraftOp(
    "q5_join",
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem, orders, customer, nation, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    val dims = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** EXISTS / NOT EXISTS via left-semi / left-anti joins. */
  val qSemiAnti: GraftOp = GraftOp(
    "q_semi_anti",
    """SELECT c_mktsegment, 'has_order' AS tag, count(*) AS n
      |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, 'no_order' AS tag, count(*) AS n
      |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment, tag""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val ordKeys = Tables.orders(s, d).select(col("o_custkey"))
    val semi = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .select(col("c_mktsegment"), lit("has_order").as("tag"), col("n"))
    val anti = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .select(col("c_mktsegment"), lit("no_order").as("tag"), col("n"))
    semi.unionAll(anti)
      .select(col("c_mktsegment"), col("tag"), col("n"))
      .orderBy(col("c_mktsegment"), col("tag"))
  }

  /** Window functions: row_number / running sum / lag per supplier. */
  val qWindow: GraftOp = GraftOp(
    "q_window",
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    row_number() OVER w AS rn,
      |    sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING) AS run_qty,
      |    lag(l_quantity) OVER w AS prev_qty
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |) WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        row_number().over(w).as("rn"),
        sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run_qty"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"))
      .filter(col("rn") <= 5)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Exact distinct counting per group. */
  val qDistinct: GraftOp = GraftOp(
    "q_distinct",
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** HLL approximate distinct via the engine's own deterministic sketch
    * tier (seedless splitmix64 + exact-integer register sum), which is
    * what makes it ORACLE-checkable: [[HllOracle]] replicates the full
    * hash→register→estimate math in DuckDB. Spark's built-in
    * `approx_count_distinct` would be rows-only (its HLL++ bias tables
    * aren't SQL-expressible); the graft sketch is also what the rollup/
    * trailing/auto-route family already standardizes on. */
  val qApproxDistinct: GraftOp = GraftOp(
    "q_approx_distinct",
    s"""WITH hsrc AS (SELECT event_type, user_id AS v FROM events),
       |${HllOracle.cte("event_type")}
       |SELECT event_type, approx AS n_users_approx
       |FROM hest ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.functions.hll_estimate(
        graft.functions.hll_sketch_agg(col("user_id"))).as("n_users_approx"))
      .orderBy(col("event_type"))
  }

  /** Hierarchical ROLLUP aggregation over the dimension chain. */
  val qRollup: GraftOp = GraftOp(
    "q_rollup",
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer, nation, region
      |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** As-of join: latest order at-or-before each event's timestamp.
    *
    * Spark-first design: tag + union both sides, one shuffle on the key,
    * then `last(_, ignoreNulls)` over a time-ordered window carries the
    * most recent order forward — no row explosion, scales as a single
    * sort per key partition (the standard big-data as-of pattern).
    * Tiebreak: orders sort before events at equal timestamps (inclusive
    * as-of), max orderkey wins among equal dates.
    */
  /** The shared as-of frame: tag + union both sides, one shuffle on
    * the key, `last(_, ignoreNulls)` over a time-ordered window
    * carries the most recent order forward. Returns one row per EVENT
    * with `last_order_key` / `last_order_date` (nulls when no prior
    * order). Events carry ns-truncated micros; orders are midnight
    * dates — both NTZ micros after the parquet read, so the union is
    * type-aligned. Tiebreak: orders sort before events at equal
    * timestamps (inclusive as-of), max orderkey wins among equal
    * dates. */
  private def asofMatched(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val events = Tables.events(s, d)
    val orders = Tables.orders(s, d)
    val tsType = events.schema("ts").dataType
    val ev = events.select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("is_event"),
      col("event_id"), lit(null).cast(LongType).as("o_key"),
      lit(null).cast(tsType).as("o_date"))
    val ord = orders.select(
      col("o_custkey").as("k"), col("o_orderdate").cast(tsType).as("t"),
      lit(0).as("is_event"), lit(null).cast(LongType).as("event_id"),
      col("o_orderkey").as("o_key"), col("o_orderdate").cast(tsType).as("o_date"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("last_order_key", last(col("o_key"), ignoreNulls = true).over(w))
      .withColumn("last_order_date", last(col("o_date"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t"),
        col("last_order_key"), col("last_order_date"))
  }

  val qAsofJoin: GraftOp = GraftOp(
    "q_asof_join",
    """WITH cand AS (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |SELECT event_id, user_id, o_orderkey AS last_order_key, o_orderdate AS last_order_date
      |FROM cand WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
    asofMatched(s, d)
      .select(col("event_id"), col("user_id"), col("last_order_key"), col("last_order_date"))
      .orderBy(col("event_id"))
  }

  /** As-of join WITH TOLERANCE (r13) — the `tolerance=` knob of
    * pandas `merge_asof` / DuckDB ASOF completing [[qAsofJoin]]'s
    * backward match: the latest order ≤ the event time counts only if
    * it is at most 30 days old, else the event reads NULL (a stale
    * match is usually worse than none — attribution windows, feature
    * staleness gates). Because candidates are recency-ordered, the
    * staleness NULL-out of the single winner is equivalent to
    * filtering the candidate set — so the scale-shaped union +
    * running-last window plan (ONE shuffle on the key, no per-event
    * candidate explosion) is reused verbatim and the tolerance is one
    * post-projection, not a second join. Emits the exact match age in
    * days for matched rows. */
  val qAsofTolerance: GraftOp = GraftOp(
    "q_asof_tolerance",
    """WITH cand AS (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
      |    row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |SELECT event_id, user_id,
      |  CASE WHEN age <= 30 THEN o_orderkey END AS last_order_key,
      |  CASE WHEN age <= 30 THEN o_orderdate END AS last_order_date,
      |  CASE WHEN age <= 30 THEN age END AS age_days
      |FROM (
      |  SELECT event_id, user_id, o_orderkey, o_orderdate,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE)) AS age
      |  FROM cand WHERE rn = 1)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    asofMatched(s, d)
      .withColumn("age",
        datediff(to_date(col("t")), to_date(col("last_order_date"))).cast(LongType))
      .select(col("event_id"), col("user_id"),
        when(col("age") <= 30, col("last_order_key")).as("last_order_key"),
        when(col("age") <= 30, col("last_order_date")).as("last_order_date"),
        when(col("age") <= 30, col("age")).as("age_days"))
      .orderBy(col("event_id"))
  }

  /** Tumbling-window (time-bucket) aggregation, batch form of §2c #23. */
  val qTimeBucket: GraftOp = GraftOp(
    "q_time_bucket",
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("bucket_start"), col("event_type"))
  }

  /** Sessionization: 30-minute-gap sessions per user (gaps-and-islands). */
  val qSession: GraftOp = GraftOp(
    "q_session",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT user_id, ts,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM y)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM z GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Approximate percentiles on the engine's own mergeable t-digest
    * ([[graft.functions.TDigestQuantiles]], a TypedImperativeAggregate:
    * per-partition digests built map-side, serialized through the
    * shuffle, merged finally — ClickHouse's quantilesTDigest shape).
    * The sketch-family twin of q_percentile. Approximate by
    * construction → rows-only; SketchSpec pins the rank-error bound
    * against the exact quantiles and asserts partial-merge execution. */
  val qApproxPercentile: GraftOp = GraftOp.rowsOnly("q_approx_percentile") { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.functions.tdigest_quantiles(col("value"), Seq(0.5, 0.95)).as("qs"))
      .select(col("event_type"),
        col("qs").getItem(0).as("p50_approx"), col("qs").getItem(1).as("p95_approx"))
      .orderBy(col("event_type"))
  }

  /** t-digest rank-bound AUDIT (r8) — the oracle-checked leg the
    * order-dependent digest itself cannot give. q_approx_percentile's
    * emit is rows-only because centroid positions depend on merge
    * order; what IS deterministic is the digest's CONTRACT: the
    * estimate's exact rank interval must intersect [q−ε, q+ε] (ε =
    * 0.01, the bound TDigestSpec pins at compression 300). This op
    * replays that contract end-to-end: run the digest, join the 5-row
    * estimate frame back (broadcast), count `value < est` / `≤ est`
    * exactly, and emit the containment as integer-ppm comparisons —
    * `lt·10⁶ ≤ (q+ε)·10⁶·n AND le·10⁶ ≥ (q−ε)·10⁶·n`, every compared
    * quantity an exact BIGINT (safe to n≈9·10¹², i.e. far past any
    * per-type row count this engine would aggregate un-sharded). The
    * DuckDB oracle replays n analytically and asserts TRUE — a digest
    * that ever broke its rank bound goes hash-red, which makes this
    * the same audit shape as knn_lsh_recall/knn_pq_recall: exact
    * integers about an approximate structure. Two scans of events
    * (digest, then counts), one broadcast join, no extra shuffle. */
  val qTdigestBounds: GraftOp = GraftOp(
    "q_tdigest_bounds",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  TRUE AS ok50, TRUE AS ok95
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    val est = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.functions.tdigest_quantiles(col("value"), Seq(0.5, 0.95)).as("qs"))
      .select(col("event_type"), col("qs").getItem(0).as("e50"), col("qs").getItem(1).as("e95"))
    def contained(lt: Column, le: Column, n: Column, qPpm: Long, epsPpm: Long): Column =
      (lt * lit(1000000L) <= lit(qPpm + epsPpm) * n) &&
        (le * lit(1000000L) >= lit(qPpm - epsPpm) * n)
    Tables.events(s, d)
      .join(broadcast(est), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("value") < col("e50"), 1)).as("lt50"),
        count(when(col("value") <= col("e50"), 1)).as("le50"),
        count(when(col("value") < col("e95"), 1)).as("lt95"),
        count(when(col("value") <= col("e95"), 1)).as("le95"))
      .select(col("event_type"), col("n"),
        contained(col("lt50"), col("le50"), col("n"), 500000L, 10000L).as("ok50"),
        contained(col("lt95"), col("le95"), col("n"), 950000L, 10000L).as("ok95"))
      .orderBy(col("event_type"))
  }

  val ops: Seq[GraftOp] = Seq(
    q1Agg, q6Filter, q3Topk, q5Join, qSemiAnti, qWindow, qDistinct,
    qApproxDistinct, qApproxPercentile, qTdigestBounds, qRollup, qAsofJoin, qAsofTolerance,
    qTimeBucket, qSession)
}
