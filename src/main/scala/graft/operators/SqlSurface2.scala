package graft.operators

import graft.GraftOp
import graft.functions.Exprs._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-surface coverage, continued: grouping sets (via the SQL API),
  * window frame variants, the full join-type matrix, unpivot, and
  * null-handling functions. */
object SqlSurface2 {

  /** GROUPING SETS through `spark.sql` over a temp view (exercises the
    * SQL entry path alongside the DataFrame API used elsewhere). */
  val qGroupingSets: GraftOp = GraftOp(
    "q_grouping_sets",
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n
      |FROM orders, customer WHERE o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), (c_mktsegment, o_orderstatus))
      |ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n
        |FROM orders_v, customer_v WHERE o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), (c_mktsegment, o_orderstatus))
        |ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)
  }

  /** Window frame variants: range frame, first/last value, ntile. */
  val qWindowFrames: GraftOp = GraftOp(
    "q_window_frames",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |    first_value(o_orderkey) OVER w AS first_ok,
      |    last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
      |    ntile(4) OVER w AS quartile,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS neighborhood_sum,
      |    row_number() OVER w AS rn
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hood = w.rowsBetween(-1, 1)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        dec2(col("o_totalprice")).cast(DoubleType).as("price"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(full).as("last_ok"),
        ntile(4).over(w).as("quartile"),
        sum(dec2(col("o_totalprice"))).over(hood).cast(DoubleType).as("neighborhood_sum"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Join-type matrix on one pair of tables: inner/left/right/full
    * outer counts (nation ⋈ supplier by nationkey). */
  val qJoinTypes: GraftOp = GraftOp(
    "q_join_types",
    """SELECT 'inner' AS jt, count(*) AS n, count(s_suppkey) AS n_right
      |  FROM nation JOIN supplier ON n_nationkey = s_nationkey
      |UNION ALL
      |SELECT 'left' AS jt, count(*) AS n, count(s_suppkey) AS n_right
      |  FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
      |UNION ALL
      |SELECT 'right' AS jt, count(*) AS n, count(s_suppkey) AS n_right
      |  FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
      |UNION ALL
      |SELECT 'full' AS jt, count(*) AS n, count(s_suppkey) AS n_right
      |  FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
      |ORDER BY jt""".stripMargin) { (s, d) =>
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val cond = col("n_nationkey") === col("s_nationkey")
    def one(jt: String, how: String) =
      n.join(sup, cond, how).agg(count(lit(1)).as("n"), count(col("s_suppkey")).as("n_right"))
        .select(lit(jt).as("jt"), col("n"), col("n_right"))
    one("inner", "inner").unionAll(one("left", "left"))
      .unionAll(one("right", "right")).unionAll(one("full", "full"))
      .orderBy(col("jt"))
  }

  /** Unpivot (wide → long): customer balance vs a derived column. */
  val qUnpivot: GraftOp = GraftOp(
    "q_unpivot",
    """WITH wide AS (
      |  SELECT c_custkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
      |    CAST(c_nationkey AS DOUBLE) AS nation_id
      |  FROM customer)
      |SELECT c_custkey, 'acctbal' AS metric, acctbal AS v FROM wide
      |UNION ALL
      |SELECT c_custkey, 'nation_id' AS metric, nation_id AS v FROM wide
      |ORDER BY c_custkey, metric""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        dec2(col("c_acctbal")).cast(DoubleType).as("acctbal"),
        col("c_nationkey").cast(DoubleType).as("nation_id"))
      .unpivot(Array(col("c_custkey")), Array(col("acctbal"), col("nation_id")), "metric", "v")
      .orderBy(col("c_custkey"), col("metric"))
  }

  /** Null-handling surface: coalesce / nullif / ifnull semantics. */
  val qNullFuncs: GraftOp = GraftOp(
    "q_null_funcs",
    """SELECT event_id,
      |  coalesce(NULLIF(event_type, 'error'), 'was_error') AS type_or_flag,
      |  CASE WHEN value > 175 THEN NULL ELSE value END AS capped,
      |  coalesce(CASE WHEN value > 175 THEN NULL ELSE value END, -1.0) AS capped_filled
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val capped = when(col("value") > 175, lit(null).cast(DoubleType)).otherwise(col("value"))
    Tables.events(s, d)
      .select(col("event_id"),
        coalesce(nullif(col("event_type"), lit("error")), lit("was_error")).as("type_or_flag"),
        capped.as("capped"),
        coalesce(capped, lit(-1.0)).as("capped_filled"))
      .orderBy(col("event_id"))
  }

  /** Ranking-function matrix: rank / dense_rank / percent_rank /
    * cume_dist over the same window (ties exercised via p_size). */
  val qRankFuncs: GraftOp = GraftOp(
    "q_rank_funcs",
    """SELECT p_partkey, p_brand, p_size,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist
      |FROM part
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_size)
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand")).orderBy(col("p_size"))
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("p_partkey"))
  }

  /** Ordered string aggregation per group (LISTAGG semantics made
    * deterministic: collect, sort, join — collect_list order is
    * partition-dependent, so the sort is what makes this reproducible
    * at any parallelism). */
  val qStringAgg: GraftOp = GraftOp(
    "q_string_agg",
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), "|").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Trailing-7-day rolling revenue per event type via a RANGE frame
    * over integer day numbers — the frame variant [[qWindowFrames]]
    * doesn't cover, and semantically different from a ROWS frame
    * whenever days are MISSING: RANGE looks back 6 calendar days, not
    * 6 rows, so gaps shrink the window instead of silently widening
    * it. Day numbers are exact integers (epoch-day datediff), so both
    * engines agree on frame membership; money folds in exact DECIMAL
    * inside the frame. One shuffle to the type key; per-key window
    * bounded by the date span. */
  val qRolling7d: GraftOp = GraftOp(
    "q_rolling_7d",
    """WITH dly AS (
      |  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
      |    min(CAST(ts AS DATE)) AS day,
      |    sum(CAST(value AS DECIMAL(18,2))) AS rev
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  GROUP BY 1, 2)
      |SELECT event_type, day, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(sum(rev) OVER (PARTITION BY event_type ORDER BY day_num
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
      |FROM dly ORDER BY event_type, day""".stripMargin) { (s, d) =>
    val dly = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy(col("event_type"),
        datediff(col("ts").cast(DateType), lit("1970-01-01").cast(DateType)).as("day_num"))
      .agg(min(col("ts").cast(DateType)).as("day"),
        sum(col("value").cast(DecimalType(18, 2))).as("rev"))
    dly.select(col("event_type"), col("day"), col("rev").cast(DoubleType).as("revenue"),
        sum(col("rev")).over(
          Window.partitionBy(col("event_type")).orderBy(col("day_num"))
            .rangeBetween(-6, Window.currentRow))
          .cast(DoubleType).as("rolling_7d"))
      .orderBy(col("event_type"), col("day"))
  }

  val ops: Seq[GraftOp] =
    Seq(qGroupingSets, qWindowFrames, qJoinTypes, qUnpivot, qNullFuncs,
      qRankFuncs, qStringAgg, qRolling7d)
}
