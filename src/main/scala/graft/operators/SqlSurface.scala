package graft.operators

import graft.GraftOp
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additional SQL-surface coverage (SURVEY.md §2b continued):
  * percentiles, CUBE, set operations, conditional aggregation, string
  * functions — each oracle-checked against DuckDB.
  */
object SqlSurface {

  /** Exact percentiles (linear interpolation, the quantile_cont
    * definition) via [[QuantileExact]]: sort-window rank selection +
    * shared-text interpolation — bit-identical across engines with no
    * rounding rescue, and no per-group value buffering (the
    * percentile() aggregate's OOM shape at 100-TB groups). */
  val qPercentile: GraftOp = GraftOp(
    "q_percentile",
    s"""WITH r AS (
       |  SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events),
       |g AS (
       |  SELECT event_type,
       |    ${QuantileExact.sqlAggs(50, "value", "p50")},
       |    ${QuantileExact.sqlAggs(95, "value", "p95")},
       |    min(value) AS min_v, max(value) AS max_v
       |  FROM r GROUP BY event_type)
       |SELECT event_type,
       |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS p50,
       |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95,
       |  min_v, max_v
       |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val byType = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val aggs = QuantileExact.sparkAggs(50, "value", "p50") ++
      QuantileExact.sparkAggs(95, "value", "p95") ++
      Seq(min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    Tables.events(s, d)
      .select(col("event_type"), col("value"))
      .withColumn("__rn", row_number().over(byType.orderBy(col("value"))))
      .withColumn("__n", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"),
        expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("p50"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95"),
        col("min_v"), col("max_v"))
      .orderBy(col("event_type"))
  }

  /** CUBE over two dimensions with exact-decimal money aggregate. */
  val qCube: GraftOp = GraftOp(
    "q_cube",
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders, customer WHERE o_custkey = c_custkey
      |GROUP BY CUBE (c_mktsegment, o_orderstatus)
      |ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** INTERSECT / EXCEPT set operations, tagged and unioned. */
  val qSetOps: GraftOp = GraftOp(
    "q_setops",
    """SELECT 'both' AS tag, c_custkey AS custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT 'only_seg' AS tag, c_custkey AS custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY tag, custkey""".stripMargin) { (s, d) =>
    val seg = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val fin = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    seg.intersect(fin).select(lit("both").as("tag"), col("custkey"))
      .unionAll(seg.except(fin).select(lit("only_seg").as("tag"), col("custkey")))
      .orderBy(col("tag"), col("custkey"))
  }

  /** Conditional aggregation (CASE inside aggregates). */
  val qCaseAgg: GraftOp = GraftOp(
    "q_case_agg",
    """SELECT o_orderpriority,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      |  CAST(sum(CASE WHEN o_totalprice > 100000 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_totalprice") > 100000, dec2(col("o_totalprice")))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType).as("big_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** String-function surface: case, pad, substring, replace, reverse. */
  val qStringFuncs: GraftOp = GraftOp(
    "q_string_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS uname, length(p_name) AS nlen,
      |  substr(p_name, 1, 5) AS prefix,
      |  replace(p_type, ' ', '_') AS slug,
      |  lpad(p_brand, 12, '*') AS padded,
      |  reverse(p_brand) AS rev,
      |  concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"), length(col("p_name")).as("nlen"),
        substring(col("p_name"), 1, 5).as("prefix"),
        regexp_replace(col("p_type"), " ", "_").as("slug"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_brand")).as("rev"),
        concat(col("p_brand"), lit(":"), col("p_size").cast(StringType)).as("brand_size"))
      .orderBy(col("p_partkey"))
  }

  /** Sliding-window aggregation (10-min windows every 5 min): each
    * event lands in exactly two windows; the oracle unnests the two
    * window starts per event. */
  val qSlidingWindow: GraftOp = GraftOp(
    "q_sliding_window",
    """WITH x AS (
      |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
      |                 time_bucket(INTERVAL '5 minutes', ts)]) AS win_start,
      |         event_type, value
      |  FROM events)
      |SELECT win_start, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Correlated scalar subquery (above-nation-average account balance);
    * the Spark plan expresses it as a window average — one shuffle,
    * no per-row subquery execution. */
  val qCorrSubquery: GraftOp = GraftOp(
    "q_corr_subquery",
    """SELECT c_custkey, c_nationkey,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
      |FROM customer c
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) > (
      |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c_nationkey"))
    Tables.customer(s, d)
      .withColumn("nation_avg",
        sum(dec2(col("c_acctbal"))).over(w).cast(DoubleType) / count(lit(1)).over(w))
      .filter(dec2(col("c_acctbal")) > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        dec2(col("c_acctbal")).cast(DoubleType).as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Array aggregation: sorted distinct collection per group. The
    * contract output serializes the array as a comma-joined string so
    * the driver's pandas-based row sort can hash it (raw numpy arrays
    * are unhashable there); ArrayOpsSpec covers the array-typed
    * variant. */
  val qArrayAgg: GraftOp = GraftOp(
    "q_array_agg",
    """SELECT event_type,
      |  array_to_string(list_sort(list(DISTINCT user_id % 10)), ',') AS user_buckets,
      |  len(list_sort(list(DISTINCT user_id))) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        array_join(transform(array_sort(collect_set(col("user_id") % 10)),
          _.cast(StringType)), ",").as("user_buckets"),
        size(collect_set(col("user_id"))).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** Datetime-function surface (fields aligned across engines). */
  val qDatetime: GraftOp = GraftOp(
    "q_datetime",
    """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS dom, CAST(hour(ts) AS INT) AS h,
      |  count(*) AS n,
      |  min(CAST(ts AS DATE)) AS first_day
      |FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), min(to_date(col("ts"))).as("first_day"))
      .orderBy(col("y"), col("m"), col("dom"), col("h"))
  }

  val ops: Seq[GraftOp] =
    Seq(qPercentile, qCube, qSetOps, qCaseAgg, qStringFuncs, qSlidingWindow,
      qCorrSubquery, qArrayAgg, qDatetime)
}
