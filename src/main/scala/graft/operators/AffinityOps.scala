package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Co-occurrence / market-basket affinity mining — the "frequently
  * bought together" family (reference target engines ship this as
  * retention/affinity dashboards over order facts).
  *
  * Scale shape: the pair enumeration is a SELF-JOIN of the distinct
  * (order, item) set on the order key — both sides hash-partition on
  * the same key, so it is ONE co-partitioned shuffle, and the fan-out
  * per order is bounded by the basket size B (B·(B-1)/2 pairs; TPC-H
  * baskets are ≤7 lines). It is never an all-pairs product over items:
  * work is Σ_orders B², linear in the fact table for bounded baskets.
  * For 100-TB corpora with pathological baskets (one order with 10⁵
  * items), cap the basket first with the per-key top-k operator
  * (TopKPerKeyExec) — the pair count is quadratic in the single
  * largest basket, a data-quality guard, not a plan weakness.
  */
object AffinityOps {

  /** Distinct (order, part) basket items — the shared base of the
    * affinity family, registry-persisted (both pair miners and their
    * margins read it). */
  private[operators] def basketItems(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.CachedPlans.cached(s, s"affinity.items:$d")(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct())

  /** Supported co-occurrence pairs (p1 < p2, support ≥ 2) — ONE
    * co-partitioned self-join shared by q_copurchase and
    * q_basket_rules, which consumed identical pair frames through two
    * separate shuffles before r8; forced by the offline index build. */
  /** Times the pair self-join build ran this JVM (IndexStore pin). */
  @volatile private[graft] var pairBuilds = 0

  private[operators] def basketPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.CachedPlans.cached(s, s"affinity.pairs:$d") {
      pairBuilds += 1
      val items = basketItems(s, d)
      items.as("a")
        .join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    }

  /** Per-(part, month) demand census — the lineitem aggregate the
    * demand-variability family (q_xyz_classes, q_service_level_stock,
    * q_abc_xyz) builds byte-identically; one builder so the three
    * cannot drift. Deliberately NOT registry-persisted (r17, measured):
    * the census is nearly lineitem-sized at every SF ((part, month)
    * cells barely collapse), so persist+serve cost MORE than
    * re-running the scan+partial-agg per consumer — isolated probe
    * xyz/abc/sls warm 1.1–1.7/1.6–1.7/1.4–1.8 s unpersisted vs
    * 1.6–1.9/1.9–2.7/2.0–2.1 s persisted. Guide §5's cache rule
    * (persist only when recompute beats the memory pressure) decides
    * against; ReuseExchange already dedupes the identical exchange
    * within each single query where plans allow. */
  private def partMonthDemand(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("partkey"),
        date_trunc("month", to_date(col("l_shipdate"))).as("m"))
      .agg(sum(col("l_quantity").cast(LongType)).as("q"))

  /** Top co-purchased part pairs with support and lift. Lift =
    * support·n_orders / (count(p1)·count(p2)) is a ratio of exact
    * integer products (each < 2⁵³), so the one double division is
    * IEEE-correctly-rounded and identical across engines — no rounding
    * snap needed. Part frequencies are a dimension-sized table
    * (|parts| rows) broadcast back onto the pair aggregate; the order
    * count rides in as a broadcast single-row cross join (scalar
    * subquery shape). */
  val copurchase: GraftOp = GraftOp(
    "q_copurchase",
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items),
      |pc AS (SELECT l_partkey, count(*) AS pc FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS support
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2),
      |sc AS (
      |  SELECT p1, p2, support, support * n_orders / (c1.pc * c2.pc) AS lift
      |  FROM pairs
      |  JOIN pc c1 ON p1 = c1.l_partkey
      |  JOIN pc c2 ON p2 = c2.l_partkey
      |  CROSS JOIN n
      |  WHERE support >= 2)
      |SELECT p1, p2, support, lift FROM sc
      |ORDER BY support DESC, p1, p2 LIMIT 100""".stripMargin) { (s, d) =>
    val items = basketItems(s, d)
    val pairs = basketPairs(s, d)
    val partCounts = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("pc"))
    val nOrders = items.agg(
      countDistinct(col("l_orderkey")).cast("double").as("n_orders"))
    pairs
      .join(partCounts.as("c1"), col("p1") === col("c1.l_partkey"))
      .join(partCounts.as("c2"), col("p2") === col("c2.l_partkey"))
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("support"),
        (col("support") * col("n_orders") / (col("c1.pc") * col("c2.pc"))).as("lift"))
      .orderBy(col("support").desc, col("p1"), col("p2"))
      .limit(100)
  }

  /** RFM customer segmentation — recency / frequency / monetary
    * quintile scores, the retail-analytics segmentation staple. Each
    * dimension scores 1–5 against its OWN p20/p40/p60/p80 cuts
    * (recency inverted: recent = high), then customers aggregate into
    * the segment matrix.
    *
    * The quintile assignment deliberately avoids ntile's global-sort
    * window: cuts come from one exact-percentile aggregate (a 1-row
    * frame broadcast back), and the score is a CASE-sum of boundary
    * comparisons — pure map over the customer aggregate. Parity: R/F/M
    * are exact integers (days, counts, cents), the interpolated cuts
    * are the same doubles in both engines, and int-vs-double compares
    * at the boundaries agree bit-for-bit. */
  val rfm: GraftOp = GraftOp(
    "q_rfm",
    """WITH base AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_dt, count(*) AS f,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(last_dt) AS mx FROM base),
      |b2 AS (
      |  SELECT o_custkey, CAST(date_diff('day', last_dt, mx) AS BIGINT) AS r, f, m
      |  FROM base CROSS JOIN mx),
      |cuts AS (
      |  SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rc,
      |    quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fc,
      |    quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mc
      |  FROM b2),
      |sc AS (
      |  SELECT
      |    5 - ((CASE WHEN r > rc[1] THEN 1 ELSE 0 END) + (CASE WHEN r > rc[2] THEN 1 ELSE 0 END)
      |       + (CASE WHEN r > rc[3] THEN 1 ELSE 0 END) + (CASE WHEN r > rc[4] THEN 1 ELSE 0 END)) AS r_score,
      |    1 + (CASE WHEN f > fc[1] THEN 1 ELSE 0 END) + (CASE WHEN f > fc[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN f > fc[3] THEN 1 ELSE 0 END) + (CASE WHEN f > fc[4] THEN 1 ELSE 0 END) AS f_score,
      |    1 + (CASE WHEN m > mc[1] THEN 1 ELSE 0 END) + (CASE WHEN m > mc[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN m > mc[3] THEN 1 ELSE 0 END) + (CASE WHEN m > mc[4] THEN 1 ELSE 0 END) AS m_score
      |  FROM b2 CROSS JOIN cuts)
      |SELECT r_score, f_score, m_score, count(*) AS n_customers
      |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_dt"), count(lit(1)).as("f"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("m"))
    val mx = base.agg(max(col("last_dt")).as("mx"))
    val b2 = base.crossJoin(broadcast(mx))
      .select(col("o_custkey"),
        datediff(col("mx"), col("last_dt")).cast("long").as("r"), col("f"), col("m"))
    val cuts = b2.agg(
      percentile(col("r"), typedLit(Seq(0.2, 0.4, 0.6, 0.8))).as("rc"),
      percentile(col("f"), typedLit(Seq(0.2, 0.4, 0.6, 0.8))).as("fc"),
      percentile(col("m"), typedLit(Seq(0.2, 0.4, 0.6, 0.8))).as("mc"))
    def above(x: org.apache.spark.sql.Column, cutsCol: String): org.apache.spark.sql.Column =
      (1 to 4).map(i => when(x > col(cutsCol)(i - 1), 1).otherwise(0)).reduce(_ + _)
    b2.crossJoin(broadcast(cuts))
      .select(
        (lit(5) - above(col("r"), "rc")).as("r_score"),
        (lit(1) + above(col("f"), "fc")).as("f_score"),
        (lit(1) + above(col("m"), "mc")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Open-order backlog curve by SWEEP LINE — "how many orders were
    * open on each day" (placed, not yet first-shipped): the interval-
    * counting question naive plans answer with an O(|orders|·|days|)
    * day-spine join. The sweep compresses each interval to ±1 deltas
    * at its endpoints, aggregates deltas per day (one fact-sized
    * shuffle), and cumulative-sums the |days|-row delta table — the
    * global window runs over the DAY SPINE (thousands of rows at any
    * corpus size), never the orders, which is what makes the
    * unpartitioned window safe here. All-integer state: counts can't
    * drift. */
  val backlog: GraftOp = GraftOp(
    "q_backlog",
    """WITH fs AS (
      |  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1),
      |iv AS (
      |  SELECT CAST(o_orderdate AS DATE) AS open_d, first_ship
      |  FROM orders JOIN fs ON o_orderkey = l_orderkey
      |  WHERE first_ship > CAST(o_orderdate AS DATE)),
      |ev AS (
      |  SELECT open_d AS day, 1 AS delta FROM iv
      |  UNION ALL
      |  SELECT first_ship AS day, -1 AS delta FROM iv),
      |agg AS (SELECT day, CAST(sum(delta) AS BIGINT) AS d FROM ev GROUP BY 1)
      |SELECT day, CAST(sum(d) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
      |FROM agg ORDER BY day""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val fs = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val iv = Tables.orders(s, d)
      .join(fs, col("o_orderkey") === col("l_orderkey"))
      .select(to_date(col("o_orderdate")).as("open_d"), col("first_ship"))
      .filter(col("first_ship") > col("open_d"))
    val ev = iv.select(col("open_d").as("day"), lit(1).as("delta"))
      .unionAll(iv.select(col("first_ship").as("day"), lit(-1).as("delta")))
    val agg = ev.groupBy(col("day")).agg(sum(col("delta")).cast("long").as("d"))
    // spine-sized frame: the window input is |distinct days| rows
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg.select(col("day"), sum(col("d")).over(w).cast("long").as("backlog"))
      .orderBy(col("day"))
  }

  /** Supplier lead time: mean and p95 days from order date to the
    * supplier's first shipment, per supplier — the fulfillment-SLA
    * table. Day deltas are exact integers; the mean is emitted via
    * pure-integer half-up rounding of the exact rational Σdays/n (the
    * §6 midpoint-proof emit), the p95 by the shared linear-interp
    * percentile contract. One co-partitioned orderkey join + one
    * supplier aggregate. */
  val leadTime: GraftOp = GraftOp(
    "q_lead_time",
    """WITH fs AS (
      |  SELECT l_orderkey, l_suppkey, min(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1, 2),
      |lt AS (
      |  SELECT l_suppkey,
      |    CAST(date_diff('day', CAST(o_orderdate AS DATE), first_ship) AS BIGINT) AS days
      |  FROM fs JOIN orders ON l_orderkey = o_orderkey),
      |r AS (
      |  SELECT l_suppkey, days,
      |    row_number() OVER (PARTITION BY l_suppkey ORDER BY days) AS rn,
      |    count(*) OVER (PARTITION BY l_suppkey) AS n
      |  FROM lt),
      |g AS (
      |  SELECT l_suppkey, max(n) AS n_orders,
      |    ((CAST(sum(days) AS BIGINT) * 10000000 // count(*) + 5) // 10) / 1000000.0 AS mean_days,
      |    """.stripMargin + QuantileExact.sqlAggs(95, "days", "p95") + s"""
      |  FROM r GROUP BY 1)
      |SELECT l_suppkey, n_orders, mean_days,
      |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95_days
      |FROM g ORDER BY 1""".stripMargin) { (s, d) =>
    val fs = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val lt = fs.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        datediff(col("first_ship"), to_date(col("o_orderdate"))).cast("long").as("days"))
    val bySupp = org.apache.spark.sql.expressions.Window.partitionBy(col("l_suppkey"))
    val aggs = Seq(max(col("__n")).as("n_orders"),
      (expr("(cast(sum(days) as bigint) * 10000000 div count(1) + 5) div 10") / 1000000.0)
        .as("mean_days")) ++ QuantileExact.sparkAggs(95, "days", "p95")
    lt.withColumn("__rn", row_number().over(bySupp.orderBy(col("days"))))
      .withColumn("__n", count(lit(1)).over(bySupp))
      .groupBy(col("l_suppkey"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_suppkey"), col("n_orders"), col("mean_days"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95_days"))
      .orderBy(col("l_suppkey"))
  }

  /** Directional association rules a→b — q_copurchase's symmetric
    * pair affinity turned into the Apriori level-1 rule readout:
    * confidence(a→b) = support/count(a) differs per direction, so
    * each surviving pair emits both orientations. Confidence is an
    * exact integer (ppm floor — BIGINT products, both engines floor
    * positive division identically); lift reuses the copurchase
    * contract (ratio of exact integer products, one
    * correctly-rounded double divide). Same plan skeleton:
    * basket-keyed self-join for pairs, dimension-sized part
    * frequencies broadcast back, scalar order count as a broadcast
    * cross join. */
  val basketRules: GraftOp = GraftOp(
    "q_basket_rules",
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items),
      |pc AS (SELECT l_partkey, count(*) AS pc FROM items GROUP BY 1),
      |p0 AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |pairs AS (
      |  SELECT pa AS antecedent, pb AS consequent, support FROM p0
      |  UNION ALL
      |  SELECT pb, pa, support FROM p0),
      |sc AS (
      |  SELECT antecedent, consequent, support,
      |    support * 1000000 // ca.pc AS conf_ppm,
      |    support * n_orders / (ca.pc * cb.pc) AS lift
      |  FROM pairs
      |  JOIN pc ca ON antecedent = ca.l_partkey
      |  JOIN pc cb ON consequent = cb.l_partkey
      |  CROSS JOIN n)
      |SELECT antecedent, consequent, support, conf_ppm, lift FROM sc
      |ORDER BY conf_ppm DESC, antecedent, consequent LIMIT 100""".stripMargin) { (s, d) =>
    val items = basketItems(s, d)
    val p0 = basketPairs(s, d)
      .select(col("p1").as("pa"), col("p2").as("pb"), col("support"))
    val pairs = p0.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("support"))
      .unionAll(p0.select(col("pb"), col("pa"), col("support")))
    val partCounts = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("pc"))
    val nOrders = items.agg(
      countDistinct(col("l_orderkey")).cast("double").as("n_orders"))
    pairs
      .join(partCounts.select(col("l_partkey").as("antecedent"), col("pc").as("pc_a")),
        Seq("antecedent"))
      .join(partCounts.select(col("l_partkey").as("consequent"), col("pc").as("pc_b")),
        Seq("consequent"))
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("support"),
        expr("support * 1000000 div pc_a").as("conf_ppm"),
        (col("support") * col("n_orders") / (col("pc_a") * col("pc_b"))).as("lift"))
      .orderBy(col("conf_ppm").desc, col("antecedent"), col("consequent"))
      .limit(100)
  }

  /** Order-sprawl distribution — the fulfillment-complexity readout:
    * per order, how many lines, whether it spans multiple suppliers,
    * and the whole-day spread between first and last ship date; rolled
    * up by basket size. All-integer (counts, a day diff summed as
    * BIGINT — mean span is the caller's one divide). Plan: ONE
    * partial-agg shuffle on the natural order key (count-distinct of
    * suppliers inside baskets of ≤7 lines is cheap map-side), then a
    * ≤|basket sizes|-row rollup. */
  val orderSprawl: GraftOp = GraftOp(
    "q_order_sprawl",
    """WITH o AS (
      |  SELECT l_orderkey, count(*) AS n_items,
      |    count(DISTINCT l_suppkey) AS n_supps,
      |    date_diff('day', CAST(min(l_shipdate) AS DATE), CAST(max(l_shipdate) AS DATE)) AS span_days
      |  FROM lineitem GROUP BY 1)
      |SELECT CAST(n_items AS BIGINT) AS n_items,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(span_days) AS BIGINT) AS sum_span_days,
      |  CAST(sum(CASE WHEN n_supps > 1 THEN 1 ELSE 0 END) AS BIGINT) AS multi_supplier
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        datediff(to_date(max(col("l_shipdate"))), to_date(min(col("l_shipdate"))))
          .as("span_days"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("span_days")).as("sum_span_days"),
        sum(when(col("n_supps") > 1, 1).otherwise(0)).as("multi_supplier"))
      .orderBy(col("n_items"))
  }

  /** Customer reorder cadence per market segment — "how often do they
    * come back": gaps between a customer's consecutive orders in EXACT
    * integer days (lag over the per-customer (date, orderkey) order —
    * no float drift in what the percentile sorts), then count / p50 /
    * p95 per segment on the q_gap_stats percentile contract. One
    * customer-partitioned window pass + one segment aggregate; the
    * repeat-purchase health metric behind q_rfm's recency cut. */
  val reorderCadence: GraftOp = GraftOp(
    "q_reorder_cadence",
    s"""WITH g AS (
       |  SELECT c_mktsegment AS segment,
       |    date_diff('day',
       |      lag(o_orderdate) OVER (PARTITION BY o_custkey
       |                             ORDER BY o_orderdate, o_orderkey),
       |      o_orderdate) AS gap_days
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |vc AS (
       |  SELECT segment, gap_days, count(*) AS c
       |  FROM g WHERE gap_days IS NOT NULL GROUP BY 1, 2),
       |r AS (
       |  SELECT segment, gap_days, c,
       |    sum(c) OVER (PARTITION BY segment ORDER BY gap_days) AS cum,
       |    sum(c) OVER (PARTITION BY segment) AS n
       |  FROM vc),
       |gg AS (
       |  SELECT segment, CAST(max(n) AS BIGINT) AS n_gaps,
       |    ${QuantileExact.sqlAggsHist(50, "gap_days", "p50")},
       |    ${QuantileExact.sqlAggsHist(95, "gap_days", "p95")}
       |  FROM r GROUP BY 1)
       |SELECT segment, n_gaps,
       |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS p50_days,
       |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95_days
       |FROM gg ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).as("gap_days"))
      .filter(col("gap_days").isNotNull)
      .groupBy(col("segment"), col("gap_days"))
      .agg(count(lit(1)).as("c"))
      .withColumn("__cum", sum(col("c")).over(
        Window.partitionBy(col("segment")).orderBy(col("gap_days"))))
      .withColumn("__n", sum(col("c")).over(Window.partitionBy(col("segment"))))
      .groupBy(col("segment"))
      .agg(max(col("__n")).as("n_gaps"),
        (QuantileExact.sparkAggsHist(50, "gap_days", "p50") ++
          QuantileExact.sparkAggsHist(95, "gap_days", "p95")): _*)
      .select(col("segment"), col("n_gaps"),
        expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("p50_days"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95_days"))
      .orderBy(col("segment"))
  }

  /** Monthly unit-value price index vs the first month — the
    * economics readout of the order book (is revenue growth price or
    * volume?). Index_m = (Σext_m/Σqty_m)/(Σext₀/Σqty₀), computed as
    * the exact cross product Σext_m·Σqty₀ / (Σqty_m·Σext₀): the four
    * sums are exact BIGINT cents/units, the cross products ride
    * DECIMAL(38)/HUGEINT (~10²⁰ at sf0.1), and the index is one
    * double division of two exact integers — no per-part rational
    * arithmetic anywhere. */
  val priceIndex: GraftOp = GraftOp(
    "q_price_index",
    """WITH m AS (
      |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS ext,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1),
      |b AS (SELECT ext AS ext0, qty AS qty0 FROM m ORDER BY month LIMIT 1)
      |SELECT month, ext AS ext_cents, qty,
      |  round(CAST(CAST(ext AS HUGEINT) * b.qty0 AS DOUBLE)
      |      / CAST(CAST(qty AS HUGEINT) * b.ext0 AS DOUBLE), 6) AS unit_value_index
      |FROM m, b ORDER BY month""".stripMargin) { (s, d) =>
    val m = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate").cast("date"), "yyyy-MM").as("month"))
      .agg(sum((graft.functions.Exprs.dec2(col("l_extendedprice")) * 100)
          .cast(org.apache.spark.sql.types.LongType)).cast("long").as("ext"),
        sum(col("l_quantity").cast("long")).cast("long").as("qty"))
    val b = broadcast(m.orderBy(col("month")).limit(1)
      .select(col("ext").as("ext0"), col("qty").as("qty0")))
    m.crossJoin(b)
      .select(col("month"), col("ext").as("ext_cents"), col("qty"),
        expr("""round(CAST(CAST(ext AS DECIMAL(38,0)) * qty0 AS DOUBLE)
          |    / CAST(CAST(qty AS DECIMAL(38,0)) * ext0 AS DOUBLE), 6)""".stripMargin)
          .as("unit_value_index"))
      .orderBy(col("month"))
  }

  /** Customer spend-decile MOBILITY matrix (r8) — the longitudinal
    * companion to q_rfm's static segmentation: rank every repeat
    * customer into spend deciles in an early and a late period (fixed
    * split at 1998-01-01) and count the 10×10 transitions. A heavy
    * diagonal means spend rank is sticky (retention economics); mass
    * below it means churn of high-value customers — the matrix is what
    * a "customer movement" dashboard renders. Determinism: per-period
    * totals are exact cents BIGINTs and NTILE(10) runs over the fully
    * deterministic (cents, custkey) order, so both engines assign
    * identical deciles (NTILE's k·⌈n/k⌉ bucket arithmetic is
    * integer-defined once the order is total). The customer frame
    * GROWS with the corpus, so the ranking goes through
    * [[GlobalNtile]] — a one-task window only under the size gate,
    * the two-phase ranged-rank route above it; two hash aggregates on
    * o_custkey, one equi self-join, ≤100 result rows either way. */
  val decileMobility: GraftOp = GraftOp(
    "q_decile_mobility",
    """WITH p1 AS (
      |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01' GROUP BY 1),
      |p2 AS (
      |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01' GROUP BY 1),
      |d1 AS (SELECT o_custkey, ntile(10) OVER (ORDER BY cents, o_custkey) AS dec1 FROM p1),
      |d2 AS (SELECT o_custkey, ntile(10) OVER (ORDER BY cents, o_custkey) AS dec2 FROM p2)
      |SELECT CAST(dec1 AS INT) AS dec_early, CAST(dec2 AS INT) AS dec_late,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM d1 JOIN d2 USING (o_custkey)
      |GROUP BY 1, 2 ORDER BY dec_early, dec_late""".stripMargin) { (s, d) =>
    def period(pred: org.apache.spark.sql.Column) =
      Tables.orders(s, d).filter(pred)
        .groupBy(col("o_custkey"))
        .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("cents"))
    val order = Seq(col("cents"), col("o_custkey"))
    val d1 = GlobalNtile.withBucket(s, period(to_date(col("o_orderdate")) < lit("1998-01-01")),
        order, 10, "dec1", s"mobility.early:$d").select(col("o_custkey"), col("dec1"))
    val d2 = GlobalNtile.withBucket(s, period(to_date(col("o_orderdate")) >= lit("1998-01-01")),
        order, 10, "dec2", s"mobility.late:$d").select(col("o_custkey"), col("dec2"))
    d1.join(d2, "o_custkey")
      .groupBy(col("dec1").as("dec_early"), col("dec2").as("dec_late"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("dec_early"), col("dec_late"))
  }

  /** XYZ demand-variability census — the second axis of inventory
    * classification next to [[SqlSurface3]]'s ABC/Pareto value axis
    * (an A-value part with Z-variability needs safety stock; a C/X
    * part needs none — the 9-cell ABC×XYZ grid is the planner's
    * standard): per part, monthly demand over the FULL month spine
    * (absent months are genuine zeros — that's what intermittency
    * means, and why M is the global month count, not per-part), class
    * X/Y/Z by coefficient of variation at the 0.5/1.0 cuts decided by
    * EXACT integer cross-multiplication (CV ≥ t ⟺ t²·(M−1)·S² ≤
    * M·(M·SS−S²) with t² ∈ {¼, 1} — no sqrt, no double threshold to
    * flip on a ulp; SS folds in DECIMAL(38)/HUGEINT). Emits the
    * per-class census with exact demand-share ppm. */
  val xyzClasses: GraftOp = GraftOp(
    "q_xyz_classes",
    """WITH pm AS (
      |  SELECT l_partkey AS partkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |mm AS (SELECT CAST(count(DISTINCT m) AS BIGINT) AS mc FROM pm),
      |p AS (
      |  SELECT partkey, CAST(sum(q) AS BIGINT) AS s,
      |    CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ss
      |  FROM pm GROUP BY 1),
      |cls AS (
      |  SELECT partkey, s,
      |    CASE
      |      WHEN 4 * mc * (mc * ss - CAST(s AS HUGEINT) * s)
      |           < (mc - 1) * CAST(s AS HUGEINT) * s THEN 'X'
      |      WHEN mc * (mc * ss - CAST(s AS HUGEINT) * s)
      |           < (mc - 1) * CAST(s AS HUGEINT) * s THEN 'Y'
      |      ELSE 'Z' END AS xyz
      |  FROM p, mm WHERE s > 0),
      |t AS (SELECT CAST(sum(s) AS BIGINT) AS tot FROM cls)
      |SELECT xyz, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(s) AS BIGINT) AS total_qty,
      |  CAST(sum(s) * 1000000 // t.tot AS BIGINT) AS demand_share_ppm
      |FROM cls, t GROUP BY xyz, t.tot ORDER BY xyz""".stripMargin) { (s, d) =>
    val pm = partMonthDemand(s, d)
    val mm = broadcast(pm.agg(countDistinct(col("m")).as("mc")))
    val p = pm.groupBy(col("partkey"))
      .agg(sum(col("q")).as("s"),
        sum(col("q").cast(DecimalType(38, 0)) * col("q")).as("ss"))
    val cls = p.filter(col("s") > 0).crossJoin(mm)
      .select(col("partkey"), col("s"),
        expr("""CASE
          |  WHEN 4 * mc * (mc * ss - CAST(s AS DECIMAL(38,0)) * s)
          |       < (mc - 1) * CAST(s AS DECIMAL(38,0)) * s THEN 'X'
          |  WHEN mc * (mc * ss - CAST(s AS DECIMAL(38,0)) * s)
          |       < (mc - 1) * CAST(s AS DECIMAL(38,0)) * s THEN 'Y'
          |  ELSE 'Z' END""".stripMargin).as("xyz"))
    val t = broadcast(cls.agg(sum(col("s")).as("tot")))
    cls.crossJoin(t)
      .groupBy(col("xyz"), col("tot"))
      .agg(count(lit(1)).as("n_parts"), sum(col("s")).as("total_qty"))
      .select(col("xyz"), col("n_parts"), col("total_qty"),
        expr("CAST(total_qty * 1000000 div tot AS BIGINT)").as("demand_share_ppm"))
      .orderBy(col("xyz"))
  }

  /** Service-level stock targets — the newsvendor-style readout that
    * closes the [[xyzClasses]] loop: given the per-part monthly demand
    * distribution (absent months are genuine zeros, same contract as
    * XYZ), the stock level that covers 90% of months is the exact
    * p90 ORDER STATISTIC (percentile_disc semantics: the smallest
    * demand with cumulative month-count ≥ ⌈0.9·M⌉ — an integer
    * decision, no interpolation to disagree on). Aggregated per
    * Brand#-prefix product line: total p90 stock vs total mean
    * demand, and the safety-multiplier ratio in exact floor ppm —
    * the capital-vs-service tradeoff table. Value-domain windows stay
    * ≤|distinct monthly demands| per part. */
  val serviceLevelStock: GraftOp = GraftOp(
    "q_service_level_stock",
    """WITH pm AS (
      |  SELECT l_partkey AS partkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |mm AS (SELECT CAST(count(DISTINCT m) AS BIGINT) AS mc FROM pm),
      |v AS (
      |  SELECT partkey, q, CAST(count(*) AS BIGINT) AS months_at
      |  FROM pm GROUP BY 1, 2),
      |w AS (
      |  SELECT partkey, q, months_at, mc,
      |    CAST(sum(months_at) OVER (PARTITION BY partkey ORDER BY q
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_present,
      |    CAST(sum(months_at) OVER (PARTITION BY partkey) AS BIGINT) AS present
      |  FROM v, mm),
      |p90 AS (
      |  SELECT partkey,
      |    CASE WHEN 10 * (mc - present) >= 9 * mc THEN 0
      |         ELSE min(CASE WHEN 10 * (mc - present + cum_present) >= 9 * mc
      |                       THEN q END) END AS stock,
      |    max(present) AS present, max(mc) AS mc
      |  FROM w GROUP BY partkey, mc, present),
      |tot AS (
      |  SELECT p90.partkey, p90.stock,
      |    CAST(sum(pm.q) AS BIGINT) AS total_q
      |  FROM p90 JOIN pm ON p90.partkey = pm.partkey
      |  GROUP BY 1, 2),
      |ln AS (
      |  SELECT substring(p_brand, 1, 7) AS product_line, t.stock, t.total_q, mm.mc
      |  FROM tot t JOIN part ON t.partkey = p_partkey, mm)
      |SELECT product_line,
      |  CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(stock) AS BIGINT) AS p90_stock_units,
      |  CAST(sum(total_q) AS BIGINT) AS total_demand_units,
      |  CAST(sum(CAST(stock AS HUGEINT)) * mc * 1000000 // sum(total_q) AS BIGINT)
      |    AS safety_multiplier_ppm
      |FROM ln GROUP BY product_line, mc ORDER BY product_line""".stripMargin) { (s, d) =>
    val pm = partMonthDemand(s, d)
    val mm = broadcast(pm.agg(countDistinct(col("m")).as("mc")))
    val v = pm.groupBy(col("partkey"), col("q")).agg(count(lit(1)).as("months_at"))
    val byPart = org.apache.spark.sql.expressions.Window.partitionBy(col("partkey"))
    val w = v.crossJoin(mm)
      .withColumn("cum_present", sum(col("months_at")).over(
        byPart.orderBy(col("q")).rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("present", sum(col("months_at")).over(byPart))
    val p90 = w.groupBy(col("partkey"), col("mc"), col("present"))
      .agg(min(when(expr("10 * (mc - present + cum_present) >= 9 * mc"), col("q")))
        .as("stock_nz"))
      .select(col("partkey"),
        when(expr("10 * (mc - present) >= 9 * mc"), 0L)
          .otherwise(col("stock_nz")).as("stock"))
    val tot = p90.join(pm, Seq("partkey"))
      .groupBy(col("partkey"), col("stock"))
      .agg(sum(col("q")).as("total_q"))
    val ln = tot
      .join(Tables.part(s, d)
        .select(col("p_partkey"), substring(col("p_brand"), 1, 7).as("product_line")),
        col("partkey") === col("p_partkey"))
      .crossJoin(mm)
    ln.groupBy(col("product_line"), col("mc"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("stock")).as("p90_stock_units"),
        sum(col("total_q")).as("total_demand_units"))
      .select(col("product_line"), col("n_parts"), col("p90_stock_units"),
        col("total_demand_units"),
        expr("""CAST(CAST(p90_stock_units AS DECIMAL(38,0)) * mc * 1000000
          |  div total_demand_units AS BIGINT)""".stripMargin).as("safety_multiplier_ppm"))
      .orderBy(col("product_line"))
  }

  /** Arc price elasticity of demand per brand, 1996 → 1997 — the
    * CAUSAL-direction readout next to q_price_index's unit-value
    * series ("prices rose 4%" vs "and demand moved −1.2% per +1%").
    * The arc (midpoint) form is used PRECISELY because it is
    * log-free: with P = S/Q, %ΔP = (S₂Q₁−S₁Q₂)/(S₂Q₁+S₁Q₂) and
    * %ΔQ = (Q₂−Q₁)/(Q₂+Q₁), so the elasticity is a ratio of two
    * exact DECIMAL(38) integers — num = (Q₂−Q₁)(S₂Q₁+S₁Q₂),
    * den = (Q₂+Q₁)(S₂Q₁−S₁Q₂) — and the only double is their single
    * division (null where the unit value didn't move). The log-log
    * spelling would put ln() into the emit — the libm class §6 bans.
    * Scale shape: one broadcast part-dim join, one brand-partitioned
    * conditional aggregate to 25 rows; S·Q products approach
    * DECIMAL(38) only past ~10²⁷ cents·units per brand-year. */
  val arcElasticity: GraftOp = GraftOp(
    "q_arc_elasticity",
    """WITH y AS (
      |  SELECT p.p_brand AS brand,
      |    CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q1,
      |    CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q2,
      |    CAST(sum(CASE WHEN year(l_shipdate) = 1996
      |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN year(l_shipdate) = 1997
      |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS s2
      |  FROM lineitem JOIN part p ON l_partkey = p.p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1),
      |e AS (
      |  SELECT brand, q1, q2, s1, s2,
      |    (q2 - q1) * 1000000 // (q2 + q1) AS dq_ppm,
      |    CAST((CAST(s2 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * q2) * 1000000
      |      // (CAST(s2 AS HUGEINT) * q1 + CAST(s1 AS HUGEINT) * q2) AS BIGINT) AS dp_ppm
      |  FROM y WHERE q1 > 0 AND q2 > 0)
      |SELECT brand, q1, q2, s1, s2, dq_ppm, dp_ppm,
      |  CASE WHEN dp_ppm = 0 THEN NULL
      |       ELSE CAST(dq_ppm AS DOUBLE) / CAST(dp_ppm AS DOUBLE) END AS elasticity
      |FROM e ORDER BY brand""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    // range predicate (not year()) so the filter pushes to the scan
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1996-01-01 00:00:00" &&
        col("l_shipdate") < "1998-01-01 00:00:00")
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
    val y = li.groupBy(col("p_brand").as("brand"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1996, col("l_quantity").cast(LongType)))
          .cast(LongType).as("q1"),
        sum(when(year(col("l_shipdate")) === 1997, col("l_quantity").cast(LongType)))
          .cast(LongType).as("q2"),
        sum(when(year(col("l_shipdate")) === 1996,
          (graft.functions.Exprs.dec2(col("l_extendedprice")) * 100).cast(LongType)))
          .cast(LongType).as("s1"),
        sum(when(year(col("l_shipdate")) === 1997,
          (graft.functions.Exprs.dec2(col("l_extendedprice")) * 100).cast(LongType)))
          .cast(LongType).as("s2"))
    y.filter(col("q1") > 0 && col("q2") > 0)
      .select(col("brand"), col("q1"), col("q2"), col("s1"), col("s2"),
        // both moves as exact trunc-ppm BIGINTs (<=10^6 in magnitude,
        // so their double casts are exact and the one emitted division
        // is engine-identical; a raw >2^53 decimal->double cast is the
        // 1-ulp engine-dependent class, measured on this very op)
        expr("(q2 - q1) * 1000000 div (q2 + q1)").as("dq_ppm"),
        expr("""CAST((CAST(s2 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * q2) * 1000000
          | div (CAST(s2 AS DECIMAL(38,0)) * q1 + CAST(s1 AS DECIMAL(38,0)) * q2) AS BIGINT)""".stripMargin)
          .as("dp_ppm"))
      .withColumn("elasticity",
        when(col("dp_ppm") === 0, lit(null).cast(DoubleType))
          .otherwise(col("dq_ppm").cast(DoubleType) / col("dp_ppm").cast(DoubleType)))
      .orderBy(col("brand"))
  }

  /** ABC×XYZ joint census — the planner's 9-cell grid that neither
    * axis gives alone (q_pareto ranks VALUE, [[xyzClasses]] ranks
    * VARIABILITY; A-value × Z-variability parts get safety stock,
    * C × X get none): each part's ABC class from the exact
    * cumulative-revenue share (q_pareto's spelling and its SAME
    * session-cached two-phase range-partitioned frame — no second
    * sort) joined to its XYZ class from the exact integer
    * cross-multiplication (the [[xyzClasses]] predicate text
    * verbatim), rolled up to ≤9 cells with exact part counts and
    * floor-ppm revenue shares. One lineitem revenue aggregate + one
    * monthly-demand aggregate; the join is part-keyed. */
  val abcXyz: GraftOp = GraftOp(
    "q_abc_xyz",
    """WITH pm AS (
      |  SELECT l_partkey AS partkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |mm AS (SELECT CAST(count(DISTINCT m) AS BIGINT) AS mc FROM pm),
      |p AS (
      |  SELECT partkey, CAST(sum(q) AS BIGINT) AS s,
      |    CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ss
      |  FROM pm GROUP BY 1),
      |xyz AS (
      |  SELECT partkey,
      |    CASE
      |      WHEN 4 * mc * (mc * ss - CAST(s AS HUGEINT) * s)
      |           < (mc - 1) * CAST(s AS HUGEINT) * s THEN 'X'
      |      WHEN mc * (mc * ss - CAST(s AS HUGEINT) * s)
      |           < (mc - 1) * CAST(s AS HUGEINT) * s THEN 'Y'
      |      ELSE 'Z' END AS xyz
      |  FROM p, mm WHERE s > 0),
      |r AS (
      |  SELECT l_partkey AS partkey,
      |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rc
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT partkey, rc,
      |    sum(rc) OVER (ORDER BY rc DESC, partkey) AS cum,
      |    sum(rc) OVER () AS tot
      |  FROM r),
      |abc AS (
      |  SELECT partkey, rc,
      |    CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.80 THEN 'A'
      |         WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95 THEN 'B'
      |         ELSE 'C' END AS abc
      |  FROM c),
      |j AS (SELECT abc.abc, xyz.xyz, abc.rc
      |      FROM abc JOIN xyz ON abc.partkey = xyz.partkey),
      |t AS (SELECT CAST(sum(CAST(rc AS HUGEINT)) AS HUGEINT) AS tot FROM j)
      |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(CAST(rc AS HUGEINT)) * 1000000 // t.tot AS BIGINT) AS revenue_share_ppm
      |FROM j, t GROUP BY abc, xyz, t.tot ORDER BY abc, xyz""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    // XYZ side — the xyzClasses predicate text verbatim
    val pm = partMonthDemand(s, d)
    val mm = broadcast(pm.agg(countDistinct(col("m")).as("mc")))
    val p = pm.groupBy(col("partkey"))
      .agg(sum(col("q")).as("s"),
        sum(col("q").cast(dec) * col("q")).as("ss"))
    val xyz = p.filter(col("s") > 0).crossJoin(mm)
      .select(col("partkey"),
        expr("""CASE
          |  WHEN 4 * mc * (mc * ss - CAST(s AS DECIMAL(38,0)) * s)
          |       < (mc - 1) * CAST(s AS DECIMAL(38,0)) * s THEN 'X'
          |  WHEN mc * (mc * ss - CAST(s AS DECIMAL(38,0)) * s)
          |       < (mc - 1) * CAST(s AS DECIMAL(38,0)) * s THEN 'Y'
          |  ELSE 'Z' END""".stripMargin).as("xyz"))
    // ABC side — q_pareto's two-phase cum via the ONE shared builder
    // (SqlSurface3.paretoRanked), so the session cache key
    // pareto.ranged:$d can only ever be built one way
    val (ranged, share) = SqlSurface3.paretoRanked(s, d)
    val abc = ranged.select(col("l_partkey").as("partkey"), col("rc"),
      when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").as("abc"))
    val j = abc.join(xyz, Seq("partkey"))
    val jt = broadcast(j.agg(sum(col("rc").cast(dec)).cast(dec).as("tot")))
    j.crossJoin(jt)
      .groupBy(col("abc"), col("xyz"), col("tot"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rc").cast(dec)).cast(dec).as("cell_rc"))
      .select(col("abc"), col("xyz"), col("n_parts"),
        expr("CAST(cell_rc * 1000000 div tot AS BIGINT)").as("revenue_share_ppm"))
      .orderBy(col("abc"), col("xyz"))
  }

  val ops: Seq[GraftOp] = Seq(copurchase, rfm, backlog, leadTime, basketRules, orderSprawl, reorderCadence, priceIndex, decileMobility,
    xyzClasses, serviceLevelStock, arcElasticity, abcXyz)
}
