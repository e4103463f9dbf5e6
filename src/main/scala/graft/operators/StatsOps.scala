package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical / econometric rollups over the fact tables: inequality
  * (Gini), time-series memory (autocorrelation), experiment
  * significance (two-proportion z), and trend smoothing (Holt) — the
  * analyst-facing statistics tier ClickHouse ships as dedicated
  * aggregate combinators.
  *
  * Oracle parity follows the house rules (SURVEY.md §6): every
  * cross-row aggregate folds EXACT integers (cents, counts, or
  * N-scaled centered values), so only the FINAL scalar formula runs in
  * doubles — identical expression text on both engines over identical
  * integers gives identical doubles. Sequential recurrences (Holt)
  * use the q_ewma contract: one shuffle to the key, a linear in-order
  * fold with a per-step 10dp grid snap, identical on both engines.
  */
object StatsOps {

  /** Gini coefficient of customer order revenue per market segment —
    * the revenue-concentration audit ("do 20% of customers drive 80%
    * of revenue") behind q_pareto's ABC cut, emitted as the standard
    * scalar. Rank-based form: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * over ascending per-customer cents. One fact groupBy, a
    * SEGMENT-partitioned rank window (never a global sort), and a
    * 3-integer final formula. Per-customer spend is exact cents
    * (decimal sum → ×100 → BIGINT); Σ i·xᵢ and Σx fold in
    * DECIMAL(38)/HUGEINT (they scale with n·spend, past 2⁵³ at corpus
    * scale) and the numerator 2a − (n+1)·tot is assembled EXACTLY in
    * the same type (r10), so the one double division is bit-identical
    * cross-engine with no round() midpoint risk. */
  val gini: GraftOp = GraftOp(
    "q_gini",
    """WITH s AS (
      |  SELECT c_mktsegment AS segment, o_custkey AS cust,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT segment, cents,
      |    row_number() OVER (PARTITION BY segment ORDER BY cents, cust) AS rk
      |  FROM s),
      |g AS (
      |  SELECT segment, count(*) AS n_cust,
      |    CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS tot,
      |    CAST(sum(CAST(rk AS HUGEINT) * cents) AS HUGEINT) AS a
      |  FROM r GROUP BY 1)
      |SELECT segment, n_cust,
      |  CAST(2 * a - (n_cust + 1) * tot AS DOUBLE)
      |    / (CAST(n_cust AS DOUBLE) * CAST(tot AS DOUBLE)) AS gini
      |FROM g ORDER BY segment""".stripMargin) { (s, d) =>
    val spend = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey").as("cust"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    spend
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("segment")).orderBy(col("cents"), col("cust"))))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("cents").cast(DecimalType(38, 0))).as("tot"),
        sum(col("rk").cast(DecimalType(38, 0)) * col("cents")).as("a"))
      .select(col("segment"), col("n_cust"),
        expr("""CAST(2 * a - (n_cust + 1) * tot AS DOUBLE)
          |  / (CAST(n_cust AS DOUBLE) * CAST(tot AS DOUBLE))""".stripMargin)
          .as("gini"))
      .orderBy(col("segment"))
  }

  /** Sample autocorrelation of the daily event-count series at lags
    * 1..7 — the "does today predict tomorrow / is there a weekly
    * echo" diagnostic (pairs with q_seasonality's dow index and
    * q_anomaly_days' z-scores). EXACT integer core: with N days and
    * total S, the N-scaled centered value x = N·n − S is an integer,
    * so r_k = Σ x_t·x_{t−k} / Σ x² folds exactly — in DECIMAL(38)/
    * HUGEINT, since x scales with total event count and the squared
    * fold would wrap BIGINT past ~2³¹·⁵ events; the one double
    * division is identical cross-engine. The daily frame is
    * date-bounded (≤ |days| rows regardless of corpus size), so the
    * lag join explodes 7 tiny rows per day — never the fact table. */
  val acf: GraftOp = GraftOp(
    "q_acf",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s,
      |              min(day) AS mind FROM d),
      |c AS (
      |  SELECT CAST(date_diff('day', st.mind, d.day) AS BIGINT) AS i,
      |    st.nd * d.n - st.s AS x
      |  FROM d, st),
      |den AS (SELECT sum(CAST(x AS HUGEINT) * x) AS den FROM c),
      |p AS (
      |  SELECT a.i - b.i AS lag_d, CAST(a.x AS HUGEINT) * b.x AS xy
      |  FROM c a JOIN c b ON a.i - b.i BETWEEN 1 AND 7)
      |SELECT CAST(lag_d AS INT) AS lag_d, count(*) AS n_pairs,
      |  CAST(sum(xy) AS DOUBLE) / CAST(den AS DOUBLE) AS acf
      |FROM p, den GROUP BY lag_d, den ORDER BY lag_d""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val st = daily.agg(count(lit(1)).as("nd"), sum(col("n")).as("s"),
      min(col("day")).as("mind"))
    val c = daily.crossJoin(broadcast(st))
      .select(datediff(col("day"), col("mind")).cast(LongType).as("i"),
        (col("nd") * col("n") - col("s")).as("x"))
    val den = broadcast(c.agg(sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("den")))
    // equi-join form of the lag join: the right side pre-explodes its
    // 7 shifted copies, so no nested-loop range join appears in the plan
    val shifted = c.select(explode(sequence(lit(1L), lit(7L))).as("lag_d"),
      col("i").as("ib"), col("x").as("xb"))
      .select(col("lag_d"), (col("ib") + col("lag_d")).as("ia"), col("xb"))
    c.join(shifted, col("i") === col("ia"))
      .select(col("lag_d"), (col("x").cast(DecimalType(38, 0)) * col("xb")).as("xy"))
      .groupBy(col("lag_d"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("xy")).as("sxy"))
      .crossJoin(den)
      .select(col("lag_d").cast(IntegerType).as("lag_d"), col("n_pairs"),
        // r11 retirement: exact-integer ratio, ONE IEEE division —
        // round(,6) only added midpoint risk
        expr("CAST(sxy AS DOUBLE) / CAST(den AS DOUBLE)").as("acf"))
      .orderBy(col("lag_d"))
  }

  /** Two-proportion z-test on experiment conversion — the
    * significance readout next to q_ab_funnel's depth table: variants
    * by the portable-hash bucketing (same assignment as q_ab_funnel),
    * conversion = "user has a big-ticket purchase" (value ≥ 150 —
    * a plain has-any-purchase saturates to p=1 on the synthetic
    * corpus, making the pooled variance 0), pooled-variance z.
    * One per-user aggregate then four integers; the rate-difference
    * numerator c_a·n_b − c_b·n_a is assembled EXACTLY in
    * DECIMAL(38)/HUGEINT (r10 — the two-division form cancelled) and
    * every emit is raw deterministic IEEE over the four integers
    * through identical expression text, so the statistic is
    * bit-identical. */
  val twoProp: GraftOp = GraftOp(
    "q_two_prop",
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant,
       |    max(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b,
       |    CAST(sum(conv) FILTER (WHERE variant = 'A') AS BIGINT) AS c_a,
       |    CAST(sum(conv) FILTER (WHERE variant = 'B') AS BIGINT) AS c_b
       |  FROM u)
       |SELECT n_a, n_b, c_a, c_b,
       |  CAST(c_a AS DOUBLE) / n_a AS p_a,
       |  CAST(c_b AS DOUBLE) / n_b AS p_b,
       |  CAST(CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a AS DOUBLE)
       |    / (CAST(n_a AS DOUBLE) * n_b)
       |    / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
       |      * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
       |      * (1.0 / n_a + 1.0 / n_b)) AS z
       |FROM g""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"),
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150, 1)
        .otherwise(0)).as("conv"))
    u.agg(
      count(when(col("variant") === "A", 1)).as("n_a"),
      count(when(col("variant") === "B", 1)).as("n_b"),
      sum(when(col("variant") === "A", col("conv"))).cast(LongType).as("c_a"),
      sum(when(col("variant") === "B", col("conv"))).cast(LongType).as("c_b"))
      .select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        expr("CAST(c_a AS DOUBLE) / n_a").as("p_a"),
        expr("CAST(c_b AS DOUBLE) / n_b").as("p_b"),
        expr("""CAST(CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a AS DOUBLE)
          |  / (CAST(n_a AS DOUBLE) * n_b)
          |  / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
          |   * (1.0D - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
          |   * (1.0D / n_a + 1.0D / n_b))""".stripMargin).as("z"))
  }

  /** Holt linear-trend smoothing (α=0.5, β=0.3) of each event type's
    * daily-count series, with the 7-day-ahead linear forecast — the
    * capacity-planning / trend readout one step past q_ewma's level-
    * only smoothing. Inherently sequential (q_ewma contract): one
    * shuffle to the key, a linear fold over the date-ordered counts
    * (Spark `aggregate` HOF / DuckDB recursive CTE — identical step
    * expression text with a 10dp per-step grid snap, so the state
    * sequence is bit-identical), initialized l₁=y₁, b₁=y₂−y₁. The
    * per-key series is date-bounded, so state stays O(|days|). */
  val holt: GraftOp = GraftOp(
    "q_holt",
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      |  FROM daily),
      |n AS (SELECT event_type, max(i) AS nd FROM d GROUP BY 1),
      |r(event_type, t, l, b) AS (
      |  SELECT a.event_type, 1 AS t,
      |    CAST(a.y AS DOUBLE) AS l, CAST(b.y - a.y AS DOUBLE) AS b
      |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.i = 1 AND b.i = 2
      |  UNION ALL
      |  SELECT r.event_type, r.t + 1,
      |    round(0.5 * d.y + 0.5 * (r.l + r.b), 10),
      |    round(0.3 * (round(0.5 * d.y + 0.5 * (r.l + r.b), 10) - r.l) + 0.7 * r.b, 10)
      |  FROM r JOIN d ON d.event_type = r.event_type AND d.i = r.t + 1),
      |fin AS (
      |  SELECT r.event_type, r.l, r.b, n.nd
      |  FROM r JOIN n ON r.event_type = n.event_type AND r.t = n.nd)
      |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
      |  round(l, 6) AS level, round(b, 6) AS trend,
      |  round(l + 7 * b, 6) AS forecast_7d
      |FROM fin ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(day, y))), r -> r.y)").as("ys"))
      .filter(size(col("ys")) >= 2)
      .select(col("event_type"),
        size(col("ys")).cast(LongType).as("n_days"),
        expr("""aggregate(slice(ys, 2, size(ys) - 1),
          | named_struct('l', CAST(element_at(ys, 1) AS DOUBLE),
          |              'b', CAST(element_at(ys, 2) - element_at(ys, 1) AS DOUBLE)),
          | (acc, x) -> named_struct(
          |   'l', round(0.5D * x + 0.5D * (acc.l + acc.b), 10),
          |   'b', round(0.3D * (round(0.5D * x + 0.5D * (acc.l + acc.b), 10) - acc.l) + 0.7D * acc.b, 10)))""".stripMargin)
          .as("st"))
      .select(col("event_type"), col("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + lit(7) * col("st.b"), 6).as("forecast_7d"))
      .orderBy(col("event_type"))
  }

  /** Join-key skew report over the fact tables' shuffle keys — the
    * input to every salting / AQE-skew-split decision at 100 TB: per
    * key column, the distinct-key count, row count, the heaviest
    * key's ppm share (integer floor), and the p50/p99 of per-key
    * multiplicity (exact-percentile contract). A key whose top-1
    * share or p99/p50 ratio is extreme is the key that needs salting
    * before its shuffle. One groupBy per audited column; the skew
    * aggregate itself folds ≤|keys| rows. */
  val keySkew: GraftOp = GraftOp(
    "q_key_skew", {
      def branch(table: String, key: String): String =
        s"""SELECT '$table.$key' AS key_name, n_keys, n_rows, top1_ppm,
           |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS p50_cnt,
           |  ${QuantileExact.interp("p99_a", "p99_b", "p99_f")} AS p99_cnt,
           |  max_cnt
           |FROM (
           |  SELECT CAST(max(n) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
           |    CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top1_ppm,
           |    ${QuantileExact.sqlAggs(50, "c", "p50")},
           |    ${QuantileExact.sqlAggs(99, "c", "p99")},
           |    CAST(max(c) AS BIGINT) AS max_cnt
           |  FROM (
           |    SELECT c, row_number() OVER (ORDER BY c) AS rn, count(*) OVER () AS n
           |    FROM (SELECT $key, CAST(count(*) AS BIGINT) AS c FROM $table GROUP BY 1)))""".stripMargin
      Seq(branch("orders", "o_custkey"), branch("lineitem", "l_partkey"),
        branch("lineitem", "l_suppkey"), branch("events", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")
    }) { (s, d) =>
    def branch(df: org.apache.spark.sql.DataFrame, table: String, key: String) = {
      // histogram route (r13): per-key counts concentrate on a small
      // value domain, so rank DISTINCT count values by cumulative
      // frequency instead of row_number over every key through one
      // unpartitioned window — the shuffle and the ordering window
      // carry |distinct counts| rows, not |keys|
      val aggs = Seq(max(col("__n")).as("n_keys"),
        sum(col("c") * col("cnt")).as("n_rows"),
        expr("max(c) * 1000000 div sum(c * cnt)").as("top1_ppm"),
        max(col("c")).as("max_cnt")) ++
        QuantileExact.sparkAggsHist(50, "c", "p50") ++
        QuantileExact.sparkAggsHist(99, "c", "p99")
      df.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
        .withColumn("__cum", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("c"))))
        .withColumn("__n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .agg(aggs.head, aggs.tail: _*)
        .select(lit(s"$table.$key").as("key_name"), col("n_keys"), col("n_rows"),
          col("top1_ppm"),
          expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("p50_cnt"),
          expr(QuantileExact.interp("p99_a", "p99_b", "p99_f")).as("p99_cnt"),
          col("max_cnt"))
    }
    branch(Tables.orders(s, d), "orders", "o_custkey")
      .unionAll(branch(Tables.lineitem(s, d), "lineitem", "l_partkey"))
      .unionAll(branch(Tables.lineitem(s, d), "lineitem", "l_suppkey"))
      .unionAll(branch(Tables.events(s, d), "events", "user_id"))
      .orderBy(col("key_name"))
  }

  /** Two-feature OLS with intercept: order revenue (exact cents)
    * regressed on basket size and total quantity — the normal-
    * equations fit every feature-engineering pipeline sanity-checks
    * before training ("is price ≈ linear in volume"). ALL seven
    * cross-row sums fold in DECIMAL(38)/HUGEINT (the second moments
    * scale ~n·value², past 2⁶³ at corpus scale), and the 3×3 Cramer
    * solve assembles every 2×2 MINOR exactly in the same type (r10 —
    * the minors are where the catastrophic cancellation lived; the
    * remaining 3-term cofactor folds run in doubles with explicitly
    * parenthesized identical text) — bit-identical coefficients,
    * snapped to 6dp. One co-partitioned orderkey join +
    * one grand aggregate. */
  val ols2: GraftOp = GraftOp(
    "q_ols2",
    """WITH o AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
      |    CAST(count(*) AS BIGINT) AS x1,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
      |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
      |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
      |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
      |  FROM o),
      |m AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b, CAST(s2 AS DOUBLE) AS c,
      |    CAST(sy AS DOUBLE) AS ry,
      |    CAST(CAST(s11 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s12 AS DOUBLE) AS m1,
      |    CAST(CAST(s1y AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2y AS DOUBLE) AS m2,
      |    CAST(CAST(s1y AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2y AS DOUBLE) AS m3,
      |    CAST(CAST(s1 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2 AS DOUBLE) AS m4,
      |    CAST(CAST(s1 AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * s1y AS DOUBLE) AS m5,
      |    CAST(CAST(s11 AS HUGEINT) * s2y - CAST(s1y AS HUGEINT) * s12 AS DOUBLE) AS m6,
      |    CAST(CAST(s1 AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2 AS DOUBLE) AS m7
      |  FROM g),
      |dets AS (
      |  SELECT n, a, b, c, ry, m1, m2, m3, m4, m5, m6, m7,
      |    ((a * m1 - b * m4) + c * m7) AS det
      |  FROM m)
      |SELECT n AS n_orders,
      |  ((ry * m1 - b * m2) + c * m3) / det AS b0,
      |  ((a * m2 - ry * m4) + c * m5) / det AS b1,
      |  ((a * m6 - b * m5) + ry * m7) / det AS b2
      |FROM dets""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        (graft.functions.Exprs.dec2(col("o_totalprice")) * 100).cast(LongType).as("y"))
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast(LongType)).as("x2"))
    val dec = DecimalType(38, 0)
    val g = o.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
      sum(col("x1").cast(dec) * col("x1")).as("s11"),
      sum(col("x1").cast(dec) * col("x2")).as("s12"),
      sum(col("x2").cast(dec) * col("x2")).as("s22"),
      sum(col("x1").cast(dec) * col("y")).as("s1y"),
      sum(col("x2").cast(dec) * col("y")).as("s2y"))
    g.select(col("n"),
        col("n").cast(DoubleType).as("a"), col("s1").cast(DoubleType).as("b"),
        col("s2").cast(DoubleType).as("c"), col("sy").cast(DoubleType).as("ry"),
        expr("CAST(CAST(s11 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s12 AS DOUBLE)").as("m1"),
        expr("CAST(CAST(s1y AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s2y AS DOUBLE)").as("m2"),
        expr("CAST(CAST(s1y AS DECIMAL(38,0)) * s12 - CAST(s11 AS DECIMAL(38,0)) * s2y AS DOUBLE)").as("m3"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s2 AS DOUBLE)").as("m4"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s2y - CAST(s2 AS DECIMAL(38,0)) * s1y AS DOUBLE)").as("m5"),
        expr("CAST(CAST(s11 AS DECIMAL(38,0)) * s2y - CAST(s1y AS DECIMAL(38,0)) * s12 AS DOUBLE)").as("m6"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s12 - CAST(s11 AS DECIMAL(38,0)) * s2 AS DOUBLE)").as("m7"))
      .withColumn("det", expr("((a * m1 - b * m4) + c * m7)"))
      .select(col("n").as("n_orders"),
        // r11 retirement: exact 2x2-minor doubles through one det
        // division — deterministic IEEE, no round() lottery
        expr("((ry * m1 - b * m2) + c * m3) / det").as("b0"),
        expr("((a * m2 - ry * m4) + c * m5) / det").as("b1"),
        expr("((a * m6 - b * m5) + ry * m7) / det").as("b2"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) on purchase value between the
    * hash variants — the NONPARAMETRIC sibling of q_two_prop (compares
    * whole distributions, no normality assumption; the robust check
    * when revenue is heavy-tailed). EXACT integer rank algebra with
    * ties: per distinct cents value, start = 1 + Σ counts below (one
    * bounded window over ≤|distinct prices| rows — the q_survival
    * discipline; the VALUE domain bounds it, not the corpus), average
    * rank carried DOUBLED (2·start + c − 1, integer — no .5s), so
    * u2_a = 2·U_A and the tie term T = Σ(t³−t) are exact BIGINTs; the
    * normal-approximation z with tie correction is one double formula
    * over those integers, identical text both engines. */
  val mannWhitney: GraftOp = GraftOp(
    "q_mann_whitney",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT cents, CAST(count(*) AS BIGINT) AS cv,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS ca
       |  FROM p GROUP BY 1),
       |s AS (
       |  SELECT cents, cv, ca,
       |    CAST(1 + coalesce(sum(cv) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |  FROM c),
       |g AS (
       |  SELECT CAST(sum(CAST(ca AS HUGEINT)) AS HUGEINT) AS n_a,
       |    CAST(sum(CAST(cv - ca AS HUGEINT)) AS HUGEINT) AS n_b,
       |    CAST(sum(CAST(ca AS HUGEINT) * (2 * start + cv - 1)) AS HUGEINT) AS r2_a,
       |    CAST(sum(CAST(cv AS HUGEINT) * cv * cv - cv) AS HUGEINT) AS t
       |  FROM s)
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       |  CAST(r2_a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) / 2.0
       |    / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
       |      * ((CAST(n_a + n_b AS DOUBLE) + 1.0) - CAST(t AS DOUBLE)
       |        / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))) AS z
       |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = p.groupBy(col("cents"))
      .agg(count(lit(1)).as("cv"),
        count(when(col("variant") === "A", 1)).as("ca"))
    val byVal = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val st = c.withColumn("start", lit(1L) + coalesce(sum(col("cv")).over(byVal), lit(0L)))
    val dec = DecimalType(38, 0)
    st.agg(sum(col("ca").cast(dec)).as("n_a"),
        sum((col("cv") - col("ca")).cast(dec)).as("n_b"),
        sum(col("ca").cast(dec) * (lit(2) * col("start") + col("cv") - 1)).as("r2_a"),
        sum(col("cv").cast(dec) * col("cv") * col("cv") - col("cv")).as("t"))
      .select(col("n_a").cast(LongType).as("n_a"), col("n_b").cast(LongType).as("n_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1)).cast(LongType).as("u2_a"),
        expr("""CAST(r2_a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) / 2.0D
          | / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0D
          |   * ((CAST(n_a + n_b AS DOUBLE) + 1.0D) - CAST(t AS DOUBLE)
          |     / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0D))))""".stripMargin).as("z"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic on purchase value between
    * the hash variants — completes the distribution-test family
    * (parametric z → rank U → full-CDF KS): D = max |F_A − F_B| over
    * the value domain. EXACT: cumulative counts per distinct cents
    * value ride one domain-bounded window, and the sup runs over the
    * INTEGER cross-scaled gap |cumA·n_b − cumB·n_a| — D is that exact
    * max over exact n_a·n_b, one double division at emit. */
  val ks: GraftOp = GraftOp(
    "q_ks_test",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT cents,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS ca,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS cb
       |  FROM p GROUP BY 1),
       |s AS (
       |  SELECT cents,
       |    CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
       |    CAST(sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
       |  FROM c),
       |g AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM c),
       |d AS (SELECT CAST(max(abs(cum_a * g.n_b - cum_b * g.n_a)) AS BIGINT) AS d2
       |      FROM s, g)
       |SELECT g.n_a, g.n_b, d.d2 AS d_scaled,
       |  CAST(d.d2 AS DOUBLE) / (CAST(g.n_a AS DOUBLE) * CAST(g.n_b AS DOUBLE)) AS ks_d
       |FROM g, d""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = p.groupBy(col("cents"))
      .agg(count(when(col("variant") === "A", 1)).as("ca"),
        count(when(col("variant") === "B", 1)).as("cb"))
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c.select(sum(col("ca")).over(w).as("cum_a"), sum(col("cb")).over(w).as("cum_b"))
    val g = broadcast(c.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b")))
    cum.crossJoin(g)
      .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))).as("d2"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"), col("d2").as("d_scaled"),
        expr("CAST(d2 AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")
          .as("ks_d"))
  }

  /** Spearman rank correlation between basket size (lineitems per
    * order) and the order's summed line revenue — the monotone-
    * association readout q_ols2 can't give (OLS assumes linearity;
    * Spearman only order); positive by construction, which the spec
    * pins. Average
    * ranks with ties carried DOUBLED (2·Σbelow + c + 1, integer — the
    * q_mann_whitney discipline), assigned per DISTINCT value over a
    * domain-bounded window of (value, count) rows, then joined back —
    * never a global per-row sort. All six cross-row sums fold in
    * DECIMAL(38)/HUGEINT (Σdx·dy ≤ 4n³ wraps BIGINT past n ≈ 10⁶), the
    * Pearson numerator n·sxy − sx·sy and both radicands are assembled
    * EXACTLY in the same type (r10 — the double-product route lost
    * exactness past 2⁵³ and cancelled), and rho is raw deterministic
    * IEEE: three exact→double casts, one multiply, sqrt, divide. */
  val spearman: GraftOp = GraftOp(
    "q_spearman",
    """WITH t AS (
      |  SELECT l_orderkey,
      |    CAST(count(*) AS BIGINT) AS x,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
      |  FROM lineitem
      |  GROUP BY 1),
      |cx AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
      |dx AS (
      |  SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS dx
      |  FROM cx),
      |cy AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
      |dy AS (
      |  SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS dy
      |  FROM cy),
      |g AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(dx AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(dy AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy
      |  FROM t JOIN dx USING (x) JOIN dy USING (y))
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |      * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman_rho
      |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // r16: registry-persisted — this |orders|-row aggregate feeds THREE
    // subplans (the x-histogram, the y-rank two-phase, and the final
    // join), each of which re-ran the full lineitem shuffle before; one
    // materialization serves all three (guide §2.4: share the exchange)
    val t = graft.CachedPlans.cached(s, s"spearman.t:$d")(
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("x"),
          (sum(graft.functions.Exprs.dec2(col("l_extendedprice"))) * 100)
            .cast(LongType).as("y")))
    // x's domain is value-bounded (basket size ≤ ~7 distinct values) so
    // its cumulative window runs on a bounded frame; y's domain scales
    // with |orders|, so its doubled rank routes through the
    // QuantileExact range-partition + driver-offset two-phase — the
    // same discipline as q_signed_rank's user-domain treatment (an
    // unpartitioned Window.orderBy(y) funneled the whole order set
    // through one task).
    val dxFrame = {
      val below = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t.groupBy(col("x")).agg(count(lit(1)).as("c"))
        .select(col("x"),
          (lit(2L) * coalesce(sum(col("c")).over(below), lit(0L)) + col("c") + 1)
            .as("dx"))
    }
    val dyFrame = QuantileExact.cumBelowUngrouped(s, s"spearman.y:$d",
        t.groupBy(col("y")).agg(count(lit(1)).as("c")), "y", "c")
      .select(col("y"), (lit(2L) * col("__below") + col("c") + 1).as("dy"))
    val dec = DecimalType(38, 0)
    val g = t
      .join(dxFrame, Seq("x"))
      .join(dyFrame, Seq("y"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("dx").cast(dec)).as("sx"), sum(col("dy").cast(dec)).as("sy"),
        sum(col("dx").cast(dec) * col("dx")).as("sxx"),
        sum(col("dy").cast(dec) * col("dy")).as("syy"),
        sum(col("dx").cast(dec) * col("dy")).as("sxy"))
    g.select(col("n").cast(LongType).as("n"),
      expr("""CAST(n * sxy - sx * sy AS DOUBLE)
        | / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |   * CAST(n * syy - sy * sy AS DOUBLE))""".stripMargin)
        .as("spearman_rho"))
  }

  /** Welch's unequal-variance t-test on purchase value between the
    * hash variants — the parametric mean-difference test between
    * q_two_prop (proportions) and q_mann_whitney (ranks). Per-variant
    * state is three exact BIGINTs (n, Σcents, Σcents² — cents² sums
    * < 2⁶³ at any SF whose purchase count < 4·10⁹); the variance
    * numerators n·ss − s² and the mean-difference numerator
    * s_a·n_b − s_b·n_a are assembled EXACTLY in DECIMAL(38)/HUGEINT
    * (r10 — the double-product route cancelled), and every emit is raw
    * deterministic IEEE over those exact integers — no round()
    * midpoint lottery anywhere. */
  val welchT: GraftOp = GraftOp(
    "q_welch_t",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |g AS (
       |  SELECT
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b,
       |    CAST(sum(cents) FILTER (WHERE variant = 'A') AS BIGINT) AS s_a,
       |    CAST(sum(cents) FILTER (WHERE variant = 'B') AS BIGINT) AS s_b,
       |    CAST(sum(cents * cents) FILTER (WHERE variant = 'A') AS BIGINT) AS ss_a,
       |    CAST(sum(cents * cents) FILTER (WHERE variant = 'B') AS BIGINT) AS ss_b
       |  FROM p),
       |v AS (
       |  SELECT n_a, n_b, s_a, s_b,
       |    CAST(CAST(n_a AS HUGEINT) * ss_a - CAST(s_a AS HUGEINT) * s_a AS DOUBLE)
       |      / ((n_a - 1.0) * CAST(n_a AS DOUBLE) * n_a) AS va,
       |    CAST(CAST(n_b AS HUGEINT) * ss_b - CAST(s_b AS HUGEINT) * s_b AS DOUBLE)
       |      / ((n_b - 1.0) * CAST(n_b AS DOUBLE) * n_b) AS vb
       |  FROM g)
       |SELECT n_a, n_b,
       |  CAST(s_a AS DOUBLE) / n_a / 100.0 AS mean_a,
       |  CAST(s_b AS DOUBLE) / n_b / 100.0 AS mean_b,
       |  CAST(CAST(s_a AS HUGEINT) * n_b - CAST(s_b AS HUGEINT) * n_a AS DOUBLE)
       |    / (CAST(n_a AS DOUBLE) * n_b) / (100.0 * sqrt(va + vb)) AS t,
       |  (va + vb) * (va + vb)
       |    / (va * va / (n_a - 1.0) + vb * vb / (n_b - 1.0)) AS df
       |FROM v""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    p.agg(
        count(when(col("variant") === "A", 1)).as("n_a"),
        count(when(col("variant") === "B", 1)).as("n_b"),
        sum(when(col("variant") === "A", col("cents"))).cast(LongType).as("s_a"),
        sum(when(col("variant") === "B", col("cents"))).cast(LongType).as("s_b"),
        sum(when(col("variant") === "A", col("cents") * col("cents")))
          .cast(LongType).as("ss_a"),
        sum(when(col("variant") === "B", col("cents") * col("cents")))
          .cast(LongType).as("ss_b"))
      .withColumn("va",
        expr("""CAST(CAST(n_a AS DECIMAL(38,0)) * ss_a - CAST(s_a AS DECIMAL(38,0)) * s_a AS DOUBLE)
          |  / ((n_a - 1.0D) * CAST(n_a AS DOUBLE) * n_a)""".stripMargin))
      .withColumn("vb",
        expr("""CAST(CAST(n_b AS DECIMAL(38,0)) * ss_b - CAST(s_b AS DECIMAL(38,0)) * s_b AS DOUBLE)
          |  / ((n_b - 1.0D) * CAST(n_b AS DOUBLE) * n_b)""".stripMargin))
      .select(col("n_a"), col("n_b"),
        expr("CAST(s_a AS DOUBLE) / n_a / 100.0D").as("mean_a"),
        expr("CAST(s_b AS DOUBLE) / n_b / 100.0D").as("mean_b"),
        expr("""CAST(CAST(s_a AS DECIMAL(38,0)) * n_b - CAST(s_b AS DECIMAL(38,0)) * n_a AS DOUBLE)
          |  / (CAST(n_a AS DOUBLE) * n_b) / (100.0D * sqrt(va + vb))""".stripMargin).as("t"),
        expr("""(va + vb) * (va + vb)
          | / (va * va / (n_a - 1.0D) + vb * vb / (n_b - 1.0D))""".stripMargin).as("df"))
  }

  /** One-way ANOVA decomposition of per-customer spend across market
    * segments, emitted PER GROUP (the q_chi_square discipline: every
    * number is a function of exact integers — no cross-engine double
    * fold; the caller sums k rows for F). Per segment: n_i, Σcents,
    * Σcents² fold exact (Σcents² is ~10²¹ already at sf0.1, so it
    * folds in DECIMAL(38,0)/HUGEINT, not BIGINT), then between-term
    * n_i·(m_i−m)² and within-term ss_i−s_i²/n_i are double formulas
    * over the group's integers plus the two grand integers. */
  val anova: GraftOp = GraftOp(
    "q_anova",
    """WITH u AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment, o_custkey),
      |g AS (
      |  SELECT segment, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(sum(cents) AS BIGINT) AS s_i,
      |    sum(CAST(cents AS HUGEINT) * cents) AS ss_i
      |  FROM u GROUP BY 1),
      |t AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(s_i) AS BIGINT) AS s FROM g),
      |f AS (
      |  SELECT segment, n_i, s_i, n,
      |    CAST(s_i AS HUGEINT) * n - CAST(s AS HUGEINT) * n_i AS bd,
      |    CAST(ss_i AS HUGEINT) * n_i - CAST(s_i AS HUGEINT) * s_i AS wd
      |  FROM g, t)
      |SELECT segment, n_i,
      |  CAST(CAST(s_i AS HUGEINT) * 10000 // n_i AS BIGINT) / 1000000.0 AS mean_spend,
      |  CAST(bd AS DOUBLE) * CAST(bd AS DOUBLE)
      |    / (CAST(n_i AS DOUBLE) * n * n * 10000.0) AS between_term,
      |  CAST(wd AS DOUBLE) / (CAST(n_i AS DOUBLE) * 10000.0) AS within_term
      |FROM f ORDER BY segment""".stripMargin) { (s, d) =>
    val u = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    // Σcents² exceeds 2⁶³ already at sf0.1 (~10²¹) — fold it in
    // DECIMAL(38,0) (DuckDB side: HUGEINT), never BIGINT
    val g = u.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_i"), sum(col("cents")).as("s_i"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("cents")).as("ss_i"))
    val t = broadcast(g.agg(sum(col("n_i")).as("n"), sum(col("s_i")).as("s")))
    // Exact DECIMAL(38)/HUGEINT numerators + one correctly-rounded
    // double cast and deterministic IEEE mul/div — the q_levene r8 red
    // row showed round(double,6) is a cross-engine midpoint lottery on
    // exactly this formula shape, so it is banned here too.
    g.crossJoin(t)
      .withColumn("bd",
        expr("CAST(s_i AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) * n_i"))
      .withColumn("wd",
        expr("CAST(ss_i AS DECIMAL(38,0)) * n_i - CAST(s_i AS DECIMAL(38,0)) * s_i"))
      .select(col("segment"), col("n_i"),
        expr("CAST(CAST(CAST(s_i AS DECIMAL(38,0)) * 10000 div n_i AS BIGINT) AS DOUBLE) / 1000000.0D")
          .as("mean_spend"),
        expr("""CAST(bd AS DOUBLE) * CAST(bd AS DOUBLE)
          |  / (CAST(n_i AS DOUBLE) * n * n * 10000.0D)""".stripMargin).as("between_term"),
        expr("CAST(wd AS DOUBLE) / (CAST(n_i AS DOUBLE) * 10000.0D)").as("within_term"))
      .orderBy(col("segment"))
  }

  /** Cramér's V effect size for the event-type × weekday contingency —
    * the bounded-[0,1] companion to q_chi_square's raw statistic. The
    * global χ² needs a cross-row SUM, which doubles can't fold
    * order-stably — so each cell is FLOOR-SNAPPED to exact micro units
    * via pure integer arithmetic: cell·10⁶ = (o·n − rt·ct)²·10⁶ ÷
    * (n·rt·ct) under integral division (numerator in DECIMAL(38) /
    * HUGEINT — ~30 digits at sf0.1), then Σ over cells is an exact
    * BIGINT and V = sqrt(χ²/(n·(min(r,c)−1))) one double formula. */
  val cramersV: GraftOp = GraftOp(
    "q_cramers_v",
    """WITH c AS (
      |  SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
      |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |             CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
      |             CAST(count(DISTINCT dow) AS BIGINT) AS nc FROM c),
      |cells AS (
      |  SELECT CAST(
      |      CAST(o * n.n - rt.rt * ct.ct AS HUGEINT)
      |        * (o * n.n - rt.rt * ct.ct) * 1000000
      |      // (CAST(n.n AS HUGEINT) * rt.rt * ct.ct) AS BIGINT) AS cell_micro
      |  FROM c JOIN rt ON c.event_type = rt.event_type JOIN ct ON c.dow = ct.dow
      |  CROSS JOIN n)
      |SELECT n.n AS n_events, n.nr AS n_rows_dim, n.nc AS n_cols_dim,
      |  CAST(sum(cell_micro) AS DOUBLE) / 1000000.0 AS chi2,
      |  round(sqrt(CAST(sum(cell_micro) AS DOUBLE) / 1000000.0
      |    / (CAST(n.n AS DOUBLE) * (least(n.nr, n.nc) - 1))), 6) AS cramers_v
      |FROM cells, n GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("int").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val rt = c.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
    val ct = c.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
    val n = c.agg(sum(col("o")).as("n"),
      countDistinct(col("event_type")).as("nr"), countDistinct(col("dow")).as("nc"))
    c.join(broadcast(rt), Seq("event_type"))
      .join(broadcast(ct), Seq("dow"))
      .crossJoin(broadcast(n))
      .withColumn("dmc", col("o") * col("n") - col("rt") * col("ct"))
      .withColumn("cell_micro",
        expr("CAST(CAST(dmc AS DECIMAL(38,0)) * dmc * 1000000 div (CAST(n AS DECIMAL(38,0)) * rt * ct) AS BIGINT)"))
      .groupBy(col("n").as("n_events"), col("nr").as("n_rows_dim"),
        col("nc").as("n_cols_dim"))
      .agg(sum(col("cell_micro")).as("cm"))
      .select(col("n_events"), col("n_rows_dim"), col("n_cols_dim"),
        expr("CAST(cm AS DOUBLE) / 1000000.0").as("chi2"),
        expr("""round(sqrt(CAST(cm AS DOUBLE) / 1000000.0
          | / (CAST(n_events AS DOUBLE) * (least(n_rows_dim, n_cols_dim) - 1))), 6)""".stripMargin)
          .as("cramers_v"))
  }

  /** Bollinger bands on each event type's daily-count series: 7-day
    * trailing mean ± 2σ with an outside-the-band flag — the rolling-
    * volatility anomaly view next to q_anomaly_days' global z-scores
    * (local regime vs whole-history). The window sums Σy and Σy² are
    * exact BIGINTs over ROWS 6 PRECEDING (date-bounded per key); the
    * variance numerator 7·Σy² − (Σy)² is assembled EXACTLY in
    * DECIMAL(38)/HUGEINT (r10 — past 2⁵³ the double-product route
    * cancelled), mean/σ/bands are raw deterministic IEEE over it, and
    * the flag compares y against bands both engines compute bit-
    * identically. Rows before a full 7-day window are warm-up and
    * dropped. */
  val bollinger: GraftOp = GraftOp(
    "q_bollinger",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, y,
      |    CAST(sum(y) OVER win AS BIGINT) AS s,
      |    CAST(sum(y * y) OVER win AS BIGINT) AS ss,
      |    CAST(count(*) OVER win AS BIGINT) AS wn
      |  FROM d
      |  WINDOW win AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT event_type, day, y,
      |  CAST(s AS DOUBLE) / 7 AS mean7,
      |  sqrt(CAST(7 * CAST(ss AS HUGEINT) - CAST(s AS HUGEINT) * s AS DOUBLE) / 49.0) AS sigma7,
      |  CAST(CASE WHEN y > CAST(s AS DOUBLE) / 7
      |        + 2 * sqrt(CAST(7 * CAST(ss AS HUGEINT) - CAST(s AS HUGEINT) * s AS DOUBLE) / 49.0)
      |      OR y < CAST(s AS DOUBLE) / 7
      |        - 2 * sqrt(CAST(7 * CAST(ss AS HUGEINT) - CAST(s AS HUGEINT) * s AS DOUBLE) / 49.0)
      |    THEN 1 ELSE 0 END AS INT) AS outside
      |FROM w WHERE wn = 7 ORDER BY event_type, day""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("event_type"), col("day"), col("y"),
        sum(col("y")).over(win).as("s"),
        sum(col("y") * col("y")).over(win).as("ss"),
        count(lit(1)).over(win).as("wn"))
      .filter(col("wn") === 7)
      .select(col("event_type"), col("day"), col("y"),
        expr("CAST(s AS DOUBLE) / 7").as("mean7"),
        expr("sqrt(CAST(7 * CAST(ss AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / 49.0D)").as("sigma7"),
        expr("""CAST(CASE WHEN y > CAST(s AS DOUBLE) / 7
          |     + 2 * sqrt(CAST(7 * CAST(ss AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / 49.0D)
          |   OR y < CAST(s AS DOUBLE) / 7
          |     - 2 * sqrt(CAST(7 * CAST(ss AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / 49.0D)
          | THEN 1 ELSE 0 END AS INT)""".stripMargin).as("outside"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Sample-ratio mismatch check — the FIRST gate on any experiment
    * readout (a skewed split invalidates q_two_prop/q_welch_t before
    * they run): χ² goodness-of-fit of the variant user counts against
    * the designed 50/50. For two cells the statistic collapses to
    * (n_a−n_b)²/(n_a+n_b), so the op is ALL-INTEGER: χ² emitted as an
    * exact ppm floor and the α=0.05 flag (critical value 3.841) as a
    * cross-multiplied integer inequality — the first float draft lost
    * a ULP to the §6 round() midpoint gotcha at two SFs. */
  val srm: GraftOp = GraftOp(
    "q_srm",
    s"""WITH u AS (
       |  SELECT DISTINCT user_id,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant
       |  FROM events),
       |g AS (
       |  SELECT CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b
       |  FROM u)
       |SELECT n_a, n_b,
       |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS chi2_ppm,
       |  CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 > 3841 * (n_a + n_b)
       |    THEN 1 ELSE 0 END AS INT) AS srm_flag
       |FROM g""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"))
      .distinct()
      .agg(count(when(col("variant") === "A", 1)).as("n_a"),
        count(when(col("variant") === "B", 1)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        expr("(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b)").as("chi2_ppm"),
        expr("""CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 > 3841 * (n_a + n_b)
          | THEN 1 ELSE 0 END AS INT)""".stripMargin).as("srm_flag"))
  }

  /** CUPED variance-reduced experiment means (Deng et al. 2013, the
    * industry-standard pre-period adjustment): per user, pre-period
    * (Jan 1–15) and post-period purchase cents; θ = cov(X,Y)/var(X)
    * over ALL users, each variant's adjusted mean = ȳ_v − θ·(x̄_v −
    * x̄). Every cross-row sum is exact (ΣXY/ΣX² in DECIMAL(38)/
    * HUGEINT — cents products pass 2⁶³ beyond driver SFs); θ and the
    * adjusted means are double formulas over those integers. One
    * per-user aggregate, one grand + one per-variant rollup. */
  val cuped: GraftOp = GraftOp(
    "q_cuped",
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant,
       |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
       |      THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS x,
       |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
       |      THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(x AS HUGEINT) * x) AS sxx
       |  FROM u),
       |t AS (
       |  SELECT n, sx,
       |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |      / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS theta
       |  FROM g),
       |v AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS n_v,
       |    CAST(sum(x) AS BIGINT) AS sx_v, CAST(sum(y) AS BIGINT) AS sy_v
       |  FROM u GROUP BY 1)
       |SELECT variant, n_v, theta,
       |  CAST(sy_v AS DOUBLE) / n_v / 100.0 AS mean_post,
       |  (CAST(sy_v AS DOUBLE) / n_v - theta
       |    * (CAST(CAST(sx_v AS HUGEINT) * t.n - CAST(t.sx AS HUGEINT) * n_v AS DOUBLE)
       |       / (CAST(n_v AS DOUBLE) * t.n))) / 100.0
       |    AS mean_post_adj
       |FROM v, t ORDER BY variant""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"),
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"))
      .agg(
        (coalesce(sum(when(col("event_type") === "purchase" &&
            col("ts") < lit("2024-01-16").cast(TimestampType),
          col("value").cast(DecimalType(18, 2)))), lit(0)) * 100).cast(LongType).as("x"),
        (coalesce(sum(when(col("event_type") === "purchase" &&
            col("ts") >= lit("2024-01-16").cast(TimestampType),
          col("value").cast(DecimalType(18, 2)))), lit(0)) * 100).cast(LongType).as("y"))
    val g = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"))
    val t = broadcast(g.select(col("n"), col("sx"),
      expr("""CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        | / CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)""".stripMargin)
        .as("theta")))
    val v = u.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"), sum(col("x")).as("sx_v"), sum(col("y")).as("sy_v"))
    v.crossJoin(t)
      .select(col("variant"), col("n_v"), col("theta"),
        expr("CAST(sy_v AS DOUBLE) / n_v / 100.0D").as("mean_post"),
        expr("""(CAST(sy_v AS DOUBLE) / n_v - theta
          | * (CAST(CAST(sx_v AS DECIMAL(38,0)) * n - CAST(sx AS DECIMAL(38,0)) * n_v AS DOUBLE)
          |    / (CAST(n_v AS DOUBLE) * n))) / 100.0D""".stripMargin)
          .as("mean_post_adj"))
      .orderBy(col("variant"))
  }

  /** Theil-Sen robust trend of the daily event-count series — the
    * median of all pairwise slopes, immune to the outlier days that
    * drag q_regression's least-squares line. The daily frame is
    * date-bounded, so the pair join is ≤ |days|²/2 rows regardless of
    * corpus size; slopes are doubles from exact integer (Δcount,
    * Δday) pairs and the median follows the exact-percentile
    * interpolation contract both engines share. */
  val theilSen: GraftOp = GraftOp(
    "q_theil_sen",
    """WITH d AS (
      |  SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS i,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT CAST(b.y - a.y AS DOUBLE) / (b.i - a.i) AS slope
      |  FROM d a JOIN d b ON a.i < b.i),
      |r AS (
      |  SELECT slope, row_number() OVER (ORDER BY slope) AS rn, count(*) OVER () AS n
      |  FROM p),
      |g AS (
      |  SELECT max(n) AS n_pairs,
      |    """.stripMargin + QuantileExact.sqlAggs(50, "slope", "p50") + s"""
      |  FROM r)
      |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS slope_per_day
      |FROM g""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType))
        .cast(LongType).as("i"))
      .agg(count(lit(1)).as("y"))
    val nDays = broadcast(daily.agg(count(lit(1)).as("n_days")))
    val a = daily.select(col("i").as("ia"), col("y").as("ya"))
    val b = daily.select(col("i").as("ib"), col("y").as("yb"))
    val aggs = Seq(max(col("__n")).as("n_pairs")) ++
      QuantileExact.sparkAggs(50, "slope", "p50")
    // slope domain is double-valued (no histogram route); rank the
    // pair frame with the range-partitioned offset discipline instead
    // of an unpartitioned global window (single-task sort)
    val slopes = a.join(b, col("ia") < col("ib"))
      .select(((col("yb") - col("ya")).cast(DoubleType) / (col("ib") - col("ia"))).as("slope"))
    QuantileExact.rankedUngrouped(s, s"theilsen.slopes:$d", slopes, "slope")
      .crossJoin(nDays)
      .groupBy(col("n_days"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_days"), col("n_pairs"),
        expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("slope_per_day"))
  }

  /** Lorenz curve deciles of customer revenue — the plotted companion
    * to [[gini]]'s scalar: customers ranked by exact spend cents into
    * ntile(10) deciles, each with its head-count, revenue and the
    * cumulative revenue share as an EXACT ppm floor ("the top decile
    * holds X% of revenue"). One per-customer aggregate, a
    * [[GlobalNtile]] decile assignment (size-gated: single-partition
    * ntile below 256 MB, range-repartition + exact offset rank above —
    * the customer frame grows with the corpus, so the r13 window
    * retirement applies here too), a 10-row cumulative. */
  val lorenz: GraftOp = GraftOp(
    "q_lorenz",
    """WITH s AS (
      |  SELECT o_custkey AS cust,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |d AS (
      |  SELECT cents, ntile(10) OVER (ORDER BY cents, cust) AS decile FROM s),
      |g AS (
      |  SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM g)
      |SELECT decile, n_cust, cents,
      |  CAST(sum(cents) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000 // tot AS BIGINT)
      |    AS cum_share_ppm
      |FROM g, t ORDER BY decile""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("cust"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    val g = GlobalNtile.withBucket(s, spend, Seq(col("cents"), col("cust")), 10,
        "decile", s"lorenz:$d")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"))
    val t = broadcast(g.agg(sum(col("cents")).as("tot")))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.crossJoin(t)
      // cumulative × 10⁶ widened to DECIMAL(38): Σcents·10⁶ passes 2⁶³
      // one SF above the driver scale (DuckDB widens to HUGEINT itself)
      .select(col("decile"), col("n_cust"), col("cents"),
        expr("""CAST(sum(cents) OVER (ORDER BY decile
          | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) * 1000000"""
          .stripMargin).as("cum_scaled"), col("tot"))
      .select(col("decile"), col("n_cust"), col("cents"),
        expr("cum_scaled div tot").as("cum_share_ppm"))
      .orderBy(col("decile"))
  }

  /** Benjamini-Hochberg FDR control over the per-event-type family of
    * A/B trigger-rate tests — the multiple-comparisons step every
    * experiment readout with more than one metric needs. Per segment
    * (event_type): two-proportion z on "user triggered this event
    * type", exact four-integer state per segment (one shuffle). The
    * two-sided p comes from the Abramowitz-Stegun 7.1.26 erf
    * polynomial — IDENTICAL formula text in both engines, fed the
    * 6dp-SNAPPED z so both engines evaluate the same input; the BH
    * step-up (reject all ranks ≤ k* = max{i : p_i ≤ α·i/m}) then
    * compares 6dp-snapped p to thresholds that are exact functions of
    * integers, so the decision is deterministic, not knife-edge. m is
    * the segment count — a handful of rows after the heavy agg, so
    * the ranking window is trivially bounded. */
  /** Shared A/B p-value family (oracle side): CTEs `u..p` computing a
    * two-proportion z and Abramowitz-Stegun two-sided p per event-type
    * segment — the frame BOTH multiple-comparison procedures
    * ([[fdrBh]] step-up, StatsOps2.holm step-down) rank. Extracted so
    * the two procedures can never drift apart on what a "p-value"
    * means. Text is the body of a `WITH` clause (caller prepends
    * `WITH RECURSIVE`? no — plain `WITH $segPValueCtes, ...tail`). */
  private[operators] val segPValueCtes: String = {
    val erfc = (x: String) =>
      s"""(0.254829592 * (1.0 / (1.0 + 0.3275911 * $x))
         |  - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * $x), 2)
         |  + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * $x), 3)
         |  - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * $x), 4)
         |  + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * $x), 5))
         | * exp(-($x) * ($x))""".stripMargin
    s"""u AS (
         |  SELECT user_id,
         |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
         |         THEN 'A' ELSE 'B' END AS variant
         |  FROM events GROUP BY 1, 2),
         |seg AS (
         |  SELECT e.event_type AS segment, u.user_id, u.variant
         |  FROM events e JOIN u ON e.user_id = u.user_id
         |  GROUP BY 1, 2, 3),
         |base AS (
         |  SELECT variant, count(*) AS n FROM u GROUP BY 1),
         |g AS (
         |  SELECT segment,
         |    (SELECT n FROM base WHERE variant = 'A') AS n_a,
         |    (SELECT n FROM base WHERE variant = 'B') AS n_b,
         |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS c_a,
         |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS c_b
         |  FROM seg GROUP BY 1),
         |z AS (
         |  SELECT segment, n_a, n_b, c_a, c_b,
         |    CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
         |         ELSE round(CAST(CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a AS DOUBLE)
         |      / (CAST(n_a AS DOUBLE) * n_b)
         |      / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
         |        * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
         |        * (1.0 / n_a + 1.0 / n_b)), 6) END AS zv
         |  FROM g),
         |p AS (
         |  SELECT segment, n_a, n_b, c_a, c_b, zv,
         |    round(${erfc("abs(zv) / sqrt(2.0)")}, 6) AS pv
         |  FROM z)""".stripMargin
  }

  /** Shared A/B p-value family (Spark side): one row per event-type
    * segment with columns (segment, n_a, n_b, c_a, c_b, z, p) —
    * exact four-integer state per segment, 6dp-snapped z, A-S 7.1.26
    * two-sided p over the snapped z. Mirror of [[segPValueCtes]]. */
  private[operators] def segPValueFrame(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val u = ev.select(col("user_id")).distinct()
      .withColumn("variant",
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B"))
    val seg = ev.select(col("event_type").as("segment"), col("user_id")).distinct()
      .join(u, "user_id")
    val base = u.groupBy(col("variant")).agg(count(lit(1)).as("n"))
      .groupBy().pivot("variant", Seq("A", "B")).agg(first(col("n")))
      .toDF("n_a", "n_b")
    val g = seg.groupBy(col("segment"))
      .agg(
        count(when(col("variant") === "A", 1)).as("c_a"),
        count(when(col("variant") === "B", 1)).as("c_b"))
      .crossJoin(broadcast(base))
    val z = g.withColumn("z",
      expr("""CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0D
        | ELSE round(CAST(CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a AS DOUBLE)
        | / (CAST(n_a AS DOUBLE) * n_b)
        | / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |   * (1.0D - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |   * (1.0D / n_a + 1.0D / n_b)), 6) END""".stripMargin))
    z.withColumn("p", expr(
      """round((0.254829592 * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
        |  - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 2)
        |  + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 3)
        |  - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 4)
        |  + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 5))
        | * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))), 6)""".stripMargin))
      .select(col("segment"), col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        col("z"), col("p"))
  }

  val fdrBh: GraftOp = GraftOp(
    "q_fdr_bh",
    s"""WITH $segPValueCtes,
       |r AS (
         |  SELECT *, row_number() OVER (ORDER BY pv, segment) AS rnk,
         |    count(*) OVER () AS m
         |  FROM p),
         |k AS (
         |  SELECT *, max(CASE WHEN pv <= 0.05 * rnk / m THEN rnk ELSE 0 END) OVER () AS kstar
         |  FROM r)
         |SELECT segment, n_a, n_b, c_a, c_b, zv AS z, pv AS p,
         |  CAST(rnk AS BIGINT) AS rank,
         |  CASE WHEN rnk <= kstar THEN 1 ELSE 0 END AS significant
         |FROM k ORDER BY rank""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = segPValueFrame(s, d)
    val r = p
      .withColumn("rank", row_number().over(Window.orderBy(col("p"), col("segment"))).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
    val k = r.withColumn("kstar",
      max(when(col("p") <= lit(0.05) * col("rank") / col("m"), col("rank")).otherwise(0L))
        .over(Window.partitionBy()))
    k.select(col("segment"), col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        col("z"), col("p"), col("rank"),
        when(col("rank") <= col("kstar"), 1).otherwise(0).as("significant"))
      .orderBy(col("rank"))
  }

  /** Population Stability Index — THE production drift gate for
    * feature/score distributions between a reference and a current
    * period. Reference = 1992-94 orders, current = 1995+; 10
    * equal-width bins over the reference's exact cent range (bin
    * edges are pure integer arithmetic, so binning is
    * engine-exact; current-period outliers clamp into the edge
    * bins), +1 Laplace smoothing so empty bins stay finite. The one
    * double formula (q2−q1)·ln(q2/q1) runs per bin over exact
    * integers with a 6dp snap. One pass per period for the range, one
    * for the histogram — no sort, no percentile machinery; at 100 TB
    * this is two scans and a 10-row reduce. */
  val psi: GraftOp = GraftOp(
    "q_psi",
    """WITH o AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00' THEN 1 ELSE 2 END AS period
      |  FROM orders),
      |rng AS (
      |  SELECT min(cents) AS lo, max(cents) AS hi FROM o WHERE period = 1),
      |b AS (
      |  SELECT period,
      |    greatest(0, least(9, CAST((cents - (SELECT lo FROM rng)) * 10
      |      // ((SELECT hi FROM rng) - (SELECT lo FROM rng) + 1) AS BIGINT))) AS bin
      |  FROM o),
      |h AS (
      |  SELECT bin,
      |    CAST(count(*) FILTER (WHERE period = 1) AS BIGINT) AS n1,
      |    CAST(count(*) FILTER (WHERE period = 2) AS BIGINT) AS n2
      |  FROM b GROUP BY 1),
      |t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM h)
      |SELECT bin, n1, n2,
      |  round((CAST(n2 + 1 AS DOUBLE) / ((SELECT t2 FROM t) + 10)
      |        - CAST(n1 + 1 AS DOUBLE) / ((SELECT t1 FROM t) + 10))
      |    * ln((CAST(n2 + 1 AS DOUBLE) / ((SELECT t2 FROM t) + 10))
      |       / (CAST(n1 + 1 AS DOUBLE) / ((SELECT t1 FROM t) + 10))), 6) AS psi_contrib
      |FROM h ORDER BY bin""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"),
      when(col("o_orderdate") < "1998-01-01 00:00:00", 1).otherwise(2).as("period"))
    val rng = o.filter(col("period") === 1)
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val b = o.crossJoin(broadcast(rng))
      .select(col("period"),
        greatest(lit(0L), least(lit(9L),
          expr("(cents - lo) * 10 div (hi - lo + 1)"))).as("bin"))
    val h = b.groupBy(col("bin"))
      .agg(
        count(when(col("period") === 1, 1)).as("n1"),
        count(when(col("period") === 2, 1)).as("n2"))
    val t = h.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    h.crossJoin(broadcast(t))
      .select(col("bin"), col("n1"), col("n2"),
        round(((col("n2") + 1).cast("double") / (col("t2") + 10)
          - (col("n1") + 1).cast("double") / (col("t1") + 10))
          * log(((col("n2") + 1).cast("double") / (col("t2") + 10))
            / ((col("n1") + 1).cast("double") / (col("t1") + 10))), 6).as("psi_contrib"))
      .orderBy(col("bin"))
  }

  /** Deterministic Poisson bootstrap of the mean purchase value — the
    * scale-out way to put an uncertainty band on a metric: resample
    * weights are Poisson(1) draws (the standard big-data bootstrap
    * approximation — no resample materialization, one pass), and the
    * "randomness" is the engine's mix64 of (event_id·64+b), so all B
    * resamples are REPRODUCIBLE across engines, runs, and partitions
    * — which is what makes the whole thing oracle-checkable. The draw
    * maps the hash to u ∈ [0,10⁶) and inverts the Poisson(1) CDF via
    * fixed integer thresholds (identical CASE text both engines);
    * Σw·cents / Σw folds exact BIGINTs, one double division per
    * resample at the end. One scan of purchases × B cheap hashes, a
    * B-row reduce — no resample shuffle, no driver loop. */
  val bootstrapCi: GraftOp = GraftOp(
    "q_bootstrap_ci", {
      val E = graft.functions.Exprs
      s"""WITH p AS (
         |  SELECT event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |x AS (
         |  SELECT cents, b, CAST(event_id * 64 + b AS HUGEINT) AS ku
         |  FROM p CROSS JOIN (SELECT unnest(range(30)) AS b)),
         |${E.sqlMix64Ctes(Seq("cents", "b"), "x", "ku", "mx")},
         |w AS (
         |  SELECT cents, b, CASE
         |    WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1 WHEN u < 919699 THEN 2
         |    WHEN u < 981012 THEN 3 WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
         |    WHEN u < 999917 THEN 6 ELSE 7 END AS wt
         |  FROM (SELECT cents, b, (${E.sqlS2U("hs")} // 2) % 1000000 AS u FROM mx)),
         |g AS (
         |  SELECT b, CAST(sum(wt) AS BIGINT) AS n_eff,
         |    CAST(sum(wt * cents) AS BIGINT) AS s_cents
         |  FROM w GROUP BY 1)
         |SELECT b, n_eff,
         |  CAST(s_cents AS DOUBLE) / n_eff / 100.0 AS mean_value
         |FROM g ORDER BY b""".stripMargin
    }) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    p.crossJoin(broadcast(s.range(30).toDF("b")))
      .withColumn("u",
        shiftrightunsigned(graft.functions.mix64(col("event_id") * 64 + col("b")), 1) % 1000000)
      .withColumn("wt", expr(
        """CASE
          | WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1 WHEN u < 919699 THEN 2
          | WHEN u < 981012 THEN 3 WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
          | WHEN u < 999917 THEN 6 ELSE 7 END""".stripMargin))
      .groupBy(col("b"))
      .agg(sum(col("wt")).cast(LongType).as("n_eff"),
        sum(col("wt") * col("cents")).cast(LongType).as("s_cents"))
      .select(col("b"), col("n_eff"),
        expr("CAST(s_cents AS DOUBLE) / n_eff / 100.0").as("mean_value"))
      .orderBy(col("b"))
  }

  /** Split-conformal prediction interval for the q_ols2 price
    * predictor — the distribution-free uncertainty wrapper every
    * deployed regressor needs: fit on a hash-split train half (the
    * SAME exact-integer normal equations as q_ols2), score absolute
    * residuals on the held-out calibration half FROM THE 6dp-SNAPPED
    * coefficients (so both engines evaluate identical doubles), snap
    * residuals to the cent grid, and take the ⌈(n+1)·0.9⌉-th smallest
    * as the 90% interval half-width. The order statistic comes from a
    * cumulative count over DISTINCT residual cents (value-domain
    * bounded — the mann-whitney/survival window discipline, never a
    * corpus-wide row_number), and the empirical coverage is an exact
    * ppm floor. */
  val conformal: GraftOp = GraftOp(
    "q_conformal", {
      val split = graft.functions.Exprs.sqlMd5Long("concat('cf#', CAST(o_orderkey AS VARCHAR))")
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
         |    CAST(count(*) AS BIGINT) AS x1,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |t AS (SELECT * FROM o WHERE $split % 2 = 0),
         |c AS (SELECT * FROM o WHERE $split % 2 = 1),
         |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
         |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
         |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
         |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
         |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
         |  FROM t),
   |m AS (
         |  SELECT n,
         |    CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b, CAST(s2 AS DOUBLE) AS c2,
         |    CAST(sy AS DOUBLE) AS ry,
         |    CAST(CAST(s11 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s12 AS DOUBLE) AS m1,
         |    CAST(CAST(s1y AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2y AS DOUBLE) AS m2,
         |    CAST(CAST(s1y AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2y AS DOUBLE) AS m3,
         |    CAST(CAST(s1 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2 AS DOUBLE) AS m4,
         |    CAST(CAST(s1 AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * s1y AS DOUBLE) AS m5,
         |    CAST(CAST(s11 AS HUGEINT) * s2y - CAST(s1y AS HUGEINT) * s12 AS DOUBLE) AS m6,
         |    CAST(CAST(s1 AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2 AS DOUBLE) AS m7
         |  FROM g),
         |dets AS (
         |  SELECT n, a, b, c2, ry, m1, m2, m3, m4, m5, m6, m7,
         |    ((a * m1 - b * m4) + c2 * m7) AS det
         |  FROM m),
         |coef AS (
         |  SELECT n AS n_train,
         |    ((ry * m1 - b * m2) + c2 * m3) / det / 100.0 AS b0,
         |    ((a * m2 - ry * m4) + c2 * m5) / det / 100.0 AS b1,
         |    ((a * m6 - b * m5) + ry * m7) / det / 100.0 AS b2
         |  FROM dets),
         |r AS (
         |  SELECT CAST(round(abs(CAST(y AS DOUBLE) / 100.0
         |    - (b0 + b1 * x1 + b2 * x2)) * 100.0, 0) AS BIGINT) AS rc
         |  FROM c CROSS JOIN coef),
         |h AS (SELECT rc, count(*) AS cnt FROM r GROUP BY 1),
         |cum AS (SELECT rc, CAST(sum(cnt) OVER (ORDER BY rc) AS BIGINT) AS cum FROM h),
         |kk AS (SELECT CAST(ceil((count(*) + 1) * 0.9) AS BIGINT) AS k,
         |              CAST(count(*) AS BIGINT) AS n_cal FROM r),
         |q AS (SELECT min(rc) AS q_hat_cents FROM cum CROSS JOIN kk WHERE cum >= k)
         |SELECT coef.n_train, kk.n_cal, coef.b0, coef.b1, coef.b2, q.q_hat_cents,
         |  (SELECT count(*) FROM r WHERE rc <= q.q_hat_cents) * 1000000 // kk.n_cal AS coverage_ppm
         |FROM coef CROSS JOIN kk CROSS JOIN q""".stripMargin
    }) { (s, d) =>
    val split = graft.functions.Exprs.md5Long(
      concat(lit("cf#"), col("o_orderkey").cast(StringType)))
    // r16: registry-persisted — the per-order feature frame feeds BOTH
    // the train-side normal equations and the calibration residual
    // pass; each re-ran the orders⋈lineitem join+aggregate before
    val o = graft.CachedPlans.cached(s, s"conformal.o:$d")(
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"),
          (graft.functions.Exprs.dec2(col("o_totalprice")) * 100).cast(LongType).as("y"))
        .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast(LongType)).as("x2")))
    val train = o.filter(split % 2 === 0)
    val cal = o.filter(split % 2 === 1)
    val dec38c = DecimalType(38, 0)
    val g = train.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
      sum(col("x1").cast(dec38c) * col("x1")).as("s11"),
      sum(col("x1").cast(dec38c) * col("x2")).as("s12"),
      sum(col("x2").cast(dec38c) * col("x2")).as("s22"),
      sum(col("x1").cast(dec38c) * col("y")).as("s1y"),
      sum(col("x2").cast(dec38c) * col("y")).as("s2y"))
    val coef = g.select(col("n").as("n_train"),
        col("n").cast(DoubleType).as("a"), col("s1").cast(DoubleType).as("b"),
        col("s2").cast(DoubleType).as("c2"), col("sy").cast(DoubleType).as("ry"),
        expr("CAST(CAST(s11 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s12 AS DOUBLE)").as("m1"),
        expr("CAST(CAST(s1y AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s2y AS DOUBLE)").as("m2"),
        expr("CAST(CAST(s1y AS DECIMAL(38,0)) * s12 - CAST(s11 AS DECIMAL(38,0)) * s2y AS DOUBLE)").as("m3"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s22 - CAST(s12 AS DECIMAL(38,0)) * s2 AS DOUBLE)").as("m4"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s2y - CAST(s2 AS DECIMAL(38,0)) * s1y AS DOUBLE)").as("m5"),
        expr("CAST(CAST(s11 AS DECIMAL(38,0)) * s2y - CAST(s1y AS DECIMAL(38,0)) * s12 AS DOUBLE)").as("m6"),
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s12 - CAST(s11 AS DECIMAL(38,0)) * s2 AS DOUBLE)").as("m7"))
      .withColumn("det", expr("((a * m1 - b * m4) + c2 * m7)"))
      .select(col("n_train"),
        // r11 retirement: same exact-minor shape as q_ols2 — raw IEEE
        expr("((ry * m1 - b * m2) + c2 * m3) / det / 100.0D").as("b0"),
        expr("((a * m2 - ry * m4) + c2 * m5) / det / 100.0D").as("b1"),
        expr("((a * m6 - b * m5) + ry * m7) / det / 100.0D").as("b2"))
    // r11 restructure (the round-10 top-cost query): the calibration
    // ORDER STATISTIC, the calibration COUNT and the coverage count are
    // all derivable from the tiny distinct-residual histogram `h` — the
    // old plan re-read the per-order fact join through `r` three times
    // (h, kk, cov) plus once through the final coef projection. Carrying
    // the 1-row coefficient columns THROUGH the histogram groupBy (they
    // are constants, so they extend the key without changing its
    // cardinality) leaves exactly TWO executions of the orders⋈lineitem
    // aggregation in the physical plan: the train side (inside coef,
    // broadcast into r) and the calibration side (r → h). Everything
    // after h is |distinct residual cents| rows.
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("rc"))
    val r = cal.crossJoin(broadcast(coef))
      .select(col("n_train"), col("b0"), col("b1"), col("b2"),
        expr("CAST(round(abs(CAST(y AS DOUBLE) / 100.0 - (b0 + b1 * x1 + b2 * x2)) * 100.0, 0) AS BIGINT)").as("rc"))
    val h = r.groupBy(col("n_train"), col("b0"), col("b1"), col("b2"), col("rc"))
      .agg(count(lit(1)).as("cnt"))
    // cum = #rows with rc' <= rc; n_cal = total rows — both window
    // folds over the value-domain-bounded histogram (the mann-whitney
    // window discipline: |distinct cents| rows, never the corpus)
    val cum = h
      .withColumn("cum", sum(col("cnt")).over(
        wAll.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).cast(LongType))
      .withColumn("n_cal", sum(col("cnt")).over(
        wAll.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)).cast(LongType))
    // q_hat = min rc with cum >= k; its own cum IS the coverage count
    // (cum is monotone in rc, so min(rc) and min(cum) land on the same
    // histogram row)
    cum.filter(col("cum") >= ceil((col("n_cal") + 1) * 0.9).cast(LongType))
      .groupBy(col("n_train"), col("n_cal"), col("b0"), col("b1"), col("b2"))
      .agg(min(col("rc")).as("q_hat_cents"),
        (min(col("cum")) * 1000000).as("covnum"))
      .select(col("n_train"), col("n_cal"), col("b0"), col("b1"), col("b2"),
        col("q_hat_cents"), expr("covnum div n_cal").as("coverage_ppm"))
  }

  /** Exact ROC-AUC of "does event value separate purchases from
    * clicks" — the model-evaluation metric every ranking/scoring
    * pipeline reports, computed EXACTLY at any scale: AUC is the
    * Mann-Whitney U of the positive class normalized by n₁·n₀
    * (ties counted half), so the same doubled-rank integer algebra
    * q_mann_whitney runs — per distinct score, counts and a
    * value-domain-bounded cumulative — yields 2U as an exact
    * DECIMAL(38)/HUGEINT (the rank sum scales ~n², past BIGINT at
    * ~3·10⁹ events) and AUC as ONE raw double division at the end
    * (r10 — no round() lottery). No per-row sort rank, no threshold
    * sweep. */
  val auc: GraftOp = GraftOp(
    "q_auc",
    """WITH p AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |c AS (
      |  SELECT cents, CAST(count(*) AS BIGINT) AS cv,
      |    CAST(count(*) FILTER (WHERE label = 1) AS BIGINT) AS cp
      |  FROM p GROUP BY 1),
      |s AS (
      |  SELECT cents, cv, cp,
      |    CAST(1 + coalesce(sum(cv) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM c),
      |g AS (
      |  SELECT CAST(sum(CAST(cp AS HUGEINT)) AS HUGEINT) AS n_pos,
      |    CAST(sum(CAST(cv - cp AS HUGEINT)) AS HUGEINT) AS n_neg,
      |    CAST(sum(CAST(cp AS HUGEINT) * (2 * start + cv - 1)) AS HUGEINT) AS r2_pos
      |  FROM s)
      |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
      |  CAST(r2_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
      |  CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
      |    / (2.0 * CAST(n_pos AS DOUBLE) * n_neg) AS auc
      |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(when(col("event_type") === "purchase", 1).otherwise(0).as("label"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = p.groupBy(col("cents"))
      .agg(count(lit(1)).as("cv"), count(when(col("label") === 1, 1)).as("cp"))
    val byVal = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val st = c.withColumn("start", lit(1L) + coalesce(sum(col("cv")).over(byVal), lit(0L)))
    val dec = DecimalType(38, 0)
    st.agg(sum(col("cp").cast(dec)).as("n_pos"),
        sum((col("cv") - col("cp")).cast(dec)).as("n_neg"),
        sum(col("cp").cast(dec) * (lit(2) * col("start") + col("cv") - 1)).as("r2_pos"))
      .select(col("n_pos").cast(LongType).as("n_pos"),
        col("n_neg").cast(LongType).as("n_neg"),
        (col("r2_pos") - col("n_pos") * (col("n_pos") + 1)).cast(LongType).as("u2"),
        expr("""CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
          | / (2.0D * CAST(n_pos AS DOUBLE) * n_neg)""".stripMargin).as("auc"))
  }

  /** Holt-Winters additive seasonal smoothing (α=0.5, β=0.3, γ=0.4,
    * weekly period 7) of each type's daily counts — the step past
    * [[holt]] that a weekday-seasonal series (q_seasonality proved the
    * pattern) actually needs: the forecast adds the day-of-week
    * component back. Init from the first two weeks (level = week-1
    * mean, trend = (week-2 − week-1 mean)/7, seasonals = week-1
    * deviations — all exact-integer sums under one double division),
    * then the classic three-equation fold over days 8..n with a 10dp
    * grid snap per state per step (the holt/ewma parity contract:
    * snapped state sequences are bit-identical, errors cannot
    * compound). Spark folds a 9-field struct through `aggregate`
    * (seasonal vector updated via indexed `transform`); the oracle
    * unrolls the SAME step as a recursive CTE carrying s0..s6 as
    * columns. Sequential by nature; per-key state is O(period), the
    * series is date-bounded — the q_holt scale shape. */
  val holtWinters: GraftOp = GraftOp(
    "q_holt_winters", {
      // S = seasonal of the phase being consumed (day i = r.t + 1)
      val S = "(CASE r.t % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END)"
      val Lp = s"round(0.5 * (d.y - $S) + 0.5 * (r.l + r.b), 10)"
      val Bp = s"round(0.3 * ($Lp - r.l) + 0.7 * r.b, 10)"
      def Sj(j: Int) =
        s"CASE WHEN r.t % 7 = $j THEN round(0.4 * (d.y - $Lp) + 0.6 * r.s$j, 10) ELSE r.s$j END"
      s"""WITH RECURSIVE daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |d AS (
         |  SELECT event_type, y,
         |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
         |  FROM daily),
         |n AS (SELECT event_type, max(i) AS nd FROM d GROUP BY 1 HAVING max(i) >= 15),
         |w AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN i <= 7 THEN y ELSE 0 END) AS BIGINT) AS w1,
         |    CAST(sum(CASE WHEN i > 7 AND i <= 14 THEN y ELSE 0 END) AS BIGINT) AS w2
         |  FROM d WHERE i <= 14 GROUP BY 1),
         |init AS (
         |  SELECT w.event_type,
         |    round(CAST(w1 AS DOUBLE) / 7.0, 10) AS l0,
         |    round(CAST(w2 - w1 AS DOUBLE) / 49.0, 10) AS b0
         |  FROM w JOIN n ON w.event_type = n.event_type),
         |r(event_type, t, l, b, s0, s1, s2, s3, s4, s5, s6) AS (
         |  SELECT i.event_type, 7, i.l0, i.b0,
         |    ${(1 to 7).map(k => s"round(CAST(d$k.y AS DOUBLE) - i.l0, 10)").mkString(", ")}
         |  FROM init i
         |    ${(1 to 7).map(k => s"JOIN d d$k ON d$k.event_type = i.event_type AND d$k.i = $k").mkString("\n|    ")}
         |  UNION ALL
         |  SELECT r.event_type, r.t + 1, $Lp, $Bp,
         |    ${(0 to 6).map(Sj).mkString(",\n|    ")}
         |  FROM r JOIN d ON d.event_type = r.event_type AND d.i = r.t + 1),
         |fin AS (
         |  SELECT r.*, n.nd FROM r JOIN n ON r.event_type = n.event_type AND r.t = n.nd)
         |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
         |  round(l, 6) AS level, round(b, 6) AS trend,
         |  round(l + 7 * b + (CASE (nd + 6) % 7 WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5 ELSE s6 END), 6) AS forecast_7d
         |FROM fin ORDER BY event_type""".stripMargin
    }) { (s, d) =>
    val S = "element_at(acc.s, CAST((acc.t - 1) % 7 AS INT) + 1)"
    val Lp = s"round(0.5D * (x - $S) + 0.5D * (acc.l + acc.b), 10)"
    val Bp = s"round(0.3D * ($Lp - acc.l) + 0.7D * acc.b, 10)"
    val Sup = s"transform(acc.s, (v, j) -> IF(j = CAST((acc.t - 1) % 7 AS INT), " +
      s"round(0.4D * (x - $Lp) + 0.6D * v, 10), v))"
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .groupBy(col("event_type"))
      .agg(expr("transform(array_sort(collect_list(struct(day, y))), r -> r.y)").as("ys"))
      .filter(size(col("ys")) >= 15)
      .select(col("event_type"), size(col("ys")).cast(LongType).as("n_days"),
        expr(s"""aggregate(slice(ys, 8, size(ys) - 7),
          | named_struct(
          |   'l', round(CAST(aggregate(slice(ys, 1, 7), 0L, (a, x) -> a + x) AS DOUBLE) / 7.0, 10),
          |   'b', round(CAST(aggregate(slice(ys, 8, 7), 0L, (a, x) -> a + x)
          |        - aggregate(slice(ys, 1, 7), 0L, (a, x) -> a + x) AS DOUBLE) / 49.0, 10),
          |   's', transform(slice(ys, 1, 7), v ->
          |        round(CAST(v AS DOUBLE) - round(CAST(aggregate(slice(ys, 1, 7), 0L, (a, x) -> a + x) AS DOUBLE) / 7.0, 10), 10)),
          |   't', 8),
          | (acc, x) -> named_struct(
          |   'l', $Lp,
          |   'b', $Bp,
          |   's', $Sup,
          |   't', acc.t + 1))""".stripMargin).as("st"))
      .select(col("event_type"), col("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + lit(7) * col("st.b")
          + element_at(col("st.s"), ((col("n_days") + 6) % 7).cast(IntegerType) + 1), 6)
          .as("forecast_7d"))
      .orderBy(col("event_type"))
  }

  /** Kruskal-Wallis H across the three return-flag populations of line
    * quantity — the k-group extension of q_mann_whitney (parametric
    * q_anova ↔ nonparametric KW, same pairing as two_prop ↔ U). Ranks
    * ride the doubled-rank discipline over the DOMAIN-BOUNDED
    * (value, count) contingency (l_quantity has ≤50 distinct values —
    * the window never sees a per-row sort), so every per-group rank sum
    * R2_i = 2·R_i and the tie term Σ(t³−t) are exact BIGINTs. The
    * cross-group Σ R_i²/n_i — which doubles can't fold order-stably —
    * is FLOOR-SNAPPED to exact deci units per group (the q_cramers_v
    * trick: R2_i²·10 ÷ (4·n_i) under integral division, numerator in
    * DECIMAL(38)/HUGEINT), Σ is then an exact BIGINT and the
    * tie-corrected H is one shared-text double formula. */
  val kruskal: GraftOp = GraftOp(
    "q_kruskal",
    """WITH c AS (
      |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(count(*) AS BIGINT) AS cg
      |  FROM lineitem GROUP BY 1, 2),
      |v AS (SELECT q, CAST(sum(cg) AS BIGINT) AS cv FROM c GROUP BY 1),
      |s AS (
      |  SELECT q, cv,
      |    CAST(1 + coalesce(sum(cv) OVER (ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM v),
      |r AS (
      |  SELECT c.grp, CAST(sum(c.cg) AS BIGINT) AS n_i,
      |    CAST(sum(c.cg * (2 * s.start + s.cv - 1)) AS BIGINT) AS r2_i
      |  FROM c JOIN s ON c.q = s.q GROUP BY 1),
      |t AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS ties FROM v),
      |n AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k FROM r),
      |sc AS (SELECT CAST(sum(CAST(r2_i AS HUGEINT) * r2_i * 10 // (4 * n_i)) AS BIGINT) AS s2
      |       FROM r)
      |SELECT n.n AS n, n.k AS k,
      |  round(((12.0 / (CAST(n.n AS DOUBLE) * (n.n + 1.0))) * (CAST(sc.s2 AS DOUBLE) / 10.0)
      |      - 3.0 * (n.n + 1.0))
      |    / (1.0 - CAST(t.ties AS DOUBLE) / (CAST(n.n AS DOUBLE) * n.n * n.n - n.n)), 6) AS h
      |FROM n, sc, t""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"), col("l_quantity").cast(LongType).as("q"))
      .groupBy(col("grp"), col("q")).agg(count(lit(1)).as("cg"))
    val v = c.groupBy(col("q")).agg(sum(col("cg")).as("cv"))
    val byVal = Window.orderBy(col("q")).rowsBetween(Window.unboundedPreceding, -1)
    val st = v.withColumn("start", lit(1L) + coalesce(sum(col("cv")).over(byVal), lit(0L)))
    val r = c.join(st, "q")
      .groupBy(col("grp"))
      .agg(sum(col("cg")).as("n_i"),
        sum(col("cg") * (lit(2) * col("start") + col("cv") - 1)).as("r2_i"))
    val ties = broadcast(v.agg(sum(col("cv") * col("cv") * col("cv") - col("cv")).as("ties")))
    val nk = broadcast(r.agg(sum(col("n_i")).as("n"), count(lit(1)).as("k")))
    val sc = r
      .select(expr("CAST(CAST(r2_i AS DECIMAL(38,0)) * r2_i * 10 div (4 * n_i) AS DECIMAL(38,0))")
        .as("term"))
      .agg(sum(col("term")).cast(LongType).as("s2"))
    sc.crossJoin(nk).crossJoin(ties)
      .select(col("n"), col("k"),
        expr("""round(((12.0 / (CAST(n AS DOUBLE) * (n + 1.0))) * (CAST(s2 AS DOUBLE) / 10.0)
          |    - 3.0 * (n + 1.0))
          |  / (1.0 - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)), 6)""".stripMargin)
          .as("h"))
  }

  /** Kendall tau-b rank correlation between line quantity and discount
    * — completes the correlation ladder (Pearson q_ols2 → Spearman →
    * Kendall, each weaker in assumptions). Concordant/discordant pairs
    * are counted on the DOMAIN-BOUNDED contingency (≤50 quantities ×
    * ≤11 discounts = ≤550 cells; the cell-pair join is 550², bounded by
    * the DOMAIN not the data — at 100 TB it is the same 300k
    * combinations): C and D are exact Σ n₁·n₂ over cell pairs folded
    * in DECIMAL(38)/HUGEINT (they scale ~n², past BIGINT at ~3·10⁹
    * rows), tie terms come from the margins as exact Σ s(s−1), and
    * tau-b is raw deterministic IEEE: the numerator C−D and both
    * radicand halves n(n−1)−Σs(s−1) are exact integers with one
    * double cast each and an exact /2 (r10 — no round() lottery). */
  val kendall: GraftOp = GraftOp(
    "q_kendall",
    """WITH c AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS y,
      |    CAST(count(*) AS BIGINT) AS m
      |  FROM lineitem GROUP BY 1, 2),
      |pairs AS (
      |  SELECT
      |    CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
      |      THEN CAST(a.m AS HUGEINT) * b.m ELSE 0 END) AS HUGEINT) AS conc,
      |    CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
      |      THEN CAST(a.m AS HUGEINT) * b.m ELSE 0 END) AS HUGEINT) AS disc
      |  FROM c a JOIN c b ON a.x < b.x),
      |mx AS (SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1)) AS HUGEINT) AS tx2
      |       FROM (SELECT sum(m) AS s FROM c GROUP BY x)),
      |my AS (SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1)) AS HUGEINT) AS ty2
      |       FROM (SELECT sum(m) AS s FROM c GROUP BY y)),
      |n AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM c)
      |SELECT n.n AS n, CAST(pairs.conc AS BIGINT) AS conc,
      |  CAST(pairs.disc AS BIGINT) AS disc,
      |  CAST(conc - disc AS DOUBLE)
      |    / sqrt((CAST(CAST(n.n AS HUGEINT) * (n.n - 1) - tx2 AS DOUBLE) / 2.0)
      |         * (CAST(CAST(n.n AS HUGEINT) * (n.n - 1) - ty2 AS DOUBLE) / 2.0)) AS tau_b
      |FROM n, pairs, mx, my""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .select(col("l_quantity").cast(LongType).as("x"),
        (col("l_discount").cast(DecimalType(4, 2)) * 100).cast(LongType).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("m"))
    val a = c.select(col("x").as("ax"), col("y").as("ay"), col("m").as("am"))
    val b = c.select(col("x").as("bx"), col("y").as("by"), col("m").as("bm"))
    val dec38 = DecimalType(38, 0)
    val pairs = a.join(broadcast(b), col("ax") < col("bx"))
      .agg(
        sum(when(col("ay") < col("by"), col("am").cast(dec38) * col("bm"))
          .otherwise(lit(0L).cast(dec38))).as("conc"),
        sum(when(col("ay") > col("by"), col("am").cast(dec38) * col("bm"))
          .otherwise(lit(0L).cast(dec38))).as("disc"))
    val tx = c.groupBy(col("x")).agg(sum(col("m")).as("s"))
      .agg(sum(col("s").cast(dec38) * (col("s") - 1)).as("tx2"))
    val ty = c.groupBy(col("y")).agg(sum(col("m")).as("s"))
      .agg(sum(col("s").cast(dec38) * (col("s") - 1)).as("ty2"))
    val n = c.agg(sum(col("m")).as("n"))
    pairs.crossJoin(broadcast(n)).crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"), col("conc").cast(LongType).as("conc"),
        col("disc").cast(LongType).as("disc"),
        expr("""CAST(conc - disc AS DOUBLE)
          |  / sqrt((CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) - tx2 AS DOUBLE) / 2.0D)
          |       * (CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) - ty2 AS DOUBLE) / 2.0D))""".stripMargin).as("tau_b"))
  }

  /** Cross-correlation between the daily purchase and click series at
    * lags −3..+3 — the LEAD-LAG readout q_acf (one series vs itself)
    * cannot give: does click volume lead purchase volume, and by how
    * many days? Per lag, the Pearson r over aligned (x_d, y_{d+L})
    * pairs folds six exact DECIMAL(38)/HUGEINT moments (Σxy scales
    * ~count², past BIGINT at scale) — the lag join is the q_acf
    * equi-join trick (the y side pre-explodes its 7 shifted copies; no
    * range join) — and r is raw deterministic IEEE over the EXACT
    * numerator n·Σxy − ΣxΣy and exact radicands (r10).
    * Day alignment keys on a shared day-0. */
  val xcorr: GraftOp = GraftOp(
    "q_xcorr",
    """WITH st AS (SELECT min(CAST(ts AS DATE)) AS mind FROM events),
      |px AS (
      |  SELECT CAST(date_diff('day', st.mind, CAST(ts AS DATE)) AS BIGINT) AS i,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events, st WHERE event_type = 'purchase' GROUP BY 1),
      |cy AS (
      |  SELECT CAST(date_diff('day', st.mind, CAST(ts AS DATE)) AS BIGINT) AS i,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events, st WHERE event_type = 'click' GROUP BY 1),
      |p AS (
      |  SELECT CAST(s.lag_d AS INT) AS lag_d, px.x, cy.y
      |  FROM cy CROSS JOIN unnest(generate_series(-3, 3)) s(lag_d)
      |  JOIN px ON px.i = cy.i + s.lag_d),
      |g AS (
      |  SELECT lag_d, CAST(count(*) AS HUGEINT) AS n_pairs,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM p GROUP BY 1)
      |SELECT lag_d, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(n_pairs * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
      |         * CAST(n_pairs * syy - sy * sy AS DOUBLE)) AS r
      |FROM g ORDER BY lag_d""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(to_date(col("ts")).as("day"), col("event_type"))
    val st = broadcast(ev.agg(min(col("day")).as("mind")))
    def daily(t: String, out: String) = ev.filter(col("event_type") === t)
      .crossJoin(st)
      .groupBy(datediff(col("day"), col("mind")).cast(LongType).as("i"))
      .agg(count(lit(1)).as(out))
    val px = daily("purchase", "x")
    val cy = daily("click", "y")
      .select(explode(sequence(lit(-3L), lit(3L))).as("lag_d"), col("i"), col("y"))
      .select(col("lag_d"), (col("i") + col("lag_d")).as("ia"), col("y"))
    val dec = DecimalType(38, 0)
    px.join(cy, col("i") === col("ia"))
      .groupBy(col("lag_d").cast(IntegerType).as("lag_d"))
      .agg(count(lit(1)).cast(dec).as("n_pairs"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      .select(col("lag_d"), col("n_pairs").cast(LongType).as("n_pairs"),
        expr("""CAST(n_pairs * sxy - sx * sy AS DOUBLE)
          |  / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
          |       * CAST(n_pairs * syy - sy * sy AS DOUBLE))""".stripMargin)
          .as("r"))
      .orderBy(col("lag_d"))
  }

  /** Classical additive decomposition of daily purchase revenue into
    * trend + weekday seasonal + residual — the structural view behind
    * q_seasonality's weekday means and q_holt_winters' forecast.
    * EXACT CORE: the 7-day centered trend window sums integer cents
    * (full windows only), the detrended value rides ×7-scaled so
    * 7·cents − Σ₇ stays an exact BIGINT, and each weekday's seasonal
    * component is ONE double division of two exact integers
    * Σ(detr7)/(7·n_w). Seasonal is left un-normalized (mean-of-
    * detrended per weekday); the residual is defined against exactly
    * these trend/seasonal values, so the three parts re-add to the
    * observed series bit-for-bit. */
  val stlDecompose: GraftOp = GraftOp(
    "q_stl_decompose",
    """WITH dd AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |w AS (
      |  SELECT day, CAST(date_part('dow', day) AS INT) AS dow, cents,
      |    CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
      |    CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS n7
      |  FROM dd),
      |i AS (SELECT day, dow, cents, t7, 7 * cents - t7 AS d7 FROM w WHERE n7 = 7),
      |sw AS (SELECT dow, CAST(sum(d7) AS BIGINT) AS snum, CAST(count(*) AS BIGINT) AS n_w
      |       FROM i GROUP BY 1)
      |SELECT i.day, i.dow,
      |  CAST(i.cents AS DOUBLE) / 100.0 AS revenue,
      |  CAST(i.t7 AS DOUBLE) / 7.0 / 100.0 AS trend,
      |  CAST(sw.snum AS DOUBLE) / (7.0 * sw.n_w) / 100.0 AS seasonal,
      |  round(CAST(i.cents AS DOUBLE) / 100.0
      |      - CAST(i.t7 AS DOUBLE) / 7.0 / 100.0
      |      - CAST(sw.snum AS DOUBLE) / (7.0 * sw.n_w) / 100.0, 6) AS residual
      |FROM i JOIN sw ON i.dow = sw.dow ORDER BY i.day""".stripMargin) { (s, d) =>
    val dd = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * 100).cast(LongType))
        .cast(LongType).as("cents"))
    val win = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val i = dd
      .select(col("day"), (dayofweek(col("day")) - 1).cast(IntegerType).as("dow"),
        col("cents"),
        sum(col("cents")).over(win).as("t7"), count(lit(1)).over(win).as("n7"))
      .filter(col("n7") === 7)
      .withColumn("d7", lit(7) * col("cents") - col("t7"))
    val sw = i.groupBy(col("dow")).agg(sum(col("d7")).as("snum"), count(lit(1)).as("n_w"))
    i.join(broadcast(sw), "dow")
      .select(col("day"), col("dow"),
        expr("CAST(cents AS DOUBLE) / 100.0").as("revenue"),
        expr("CAST(t7 AS DOUBLE) / 7.0 / 100.0").as("trend"),
        expr("CAST(snum AS DOUBLE) / (7.0 * n_w) / 100.0").as("seasonal"),
        expr("""round(CAST(cents AS DOUBLE) / 100.0
          |    - CAST(t7 AS DOUBLE) / 7.0 / 100.0
          |    - CAST(snum AS DOUBLE) / (7.0 * n_w) / 100.0, 6)""".stripMargin).as("residual"))
      .orderBy(col("day"))
  }

  /** Granger-style lead-lag significance: does yesterday's CLICK volume
    * predict today's PURCHASE volume beyond what yesterday's purchases
    * already explain? The causal-flavored readout on top of q_xcorr's
    * symmetric correlation: restricted AR(1) y_t ~ y_{t−1} vs the full
    * model adding x_{t−1}, compared by the incremental F statistic.
    * Both regressions solve in closed form from TEN exact BIGINT cross
    * sums over (t−1, t) day pairs (the q_ols2 determinant discipline
    * plus Σy² for residual sums); RSS_r, RSS_f and F are one
    * shared-text double chain over those integers. */
  val granger: GraftOp = GraftOp(
    "q_granger",
    """WITH st AS (SELECT min(CAST(ts AS DATE)) AS mind FROM events),
      |d AS (
      |  SELECT CAST(date_diff('day', st.mind, CAST(ts AS DATE)) AS BIGINT) AS i,
      |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y,
      |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x
      |  FROM events, st GROUP BY 1),
      |p AS (
      |  SELECT cur.y AS y, prev.y AS x1, prev.x AS x2
      |  FROM d cur JOIN d prev ON cur.i = prev.i + 1),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x1 * x2) AS BIGINT) AS s12,
      |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
      |    CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y
      |  FROM p),
      |m AS (
      |  SELECT n,
      |    CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b, CAST(s2 AS DOUBLE) AS c,
      |    CAST(s11 AS DOUBLE) AS e, CAST(s12 AS DOUBLE) AS f, CAST(s22 AS DOUBLE) AS i,
      |    CAST(sy AS DOUBLE) AS ry, CAST(syy AS DOUBLE) AS ryy,
      |    CAST(s1y AS DOUBLE) AS r1, CAST(s2y AS DOUBLE) AS r2
      |  FROM g),
      |fm AS (
      |  SELECT n, ry, ryy, r1, r2, a, b, c, e, f, i,
      |    a * (e * i - f * f) - b * (b * i - f * c) + c * (b * f - e * c) AS det
      |  FROM m),
      |co AS (
      |  SELECT n, ry, ryy, r1, r2, a, b, e,
      |    (ry * (e * i - f * f) - b * (r1 * i - f * r2) + c * (r1 * f - e * r2)) / det AS b0,
      |    (a * (r1 * i - f * r2) - ry * (b * i - c * f) + c * (b * r2 - c * r1)) / det AS b1,
      |    (a * (e * r2 - r1 * f) - b * (b * r2 - c * r1) + ry * (b * f - c * e)) / det AS b2
      |  FROM fm),
      |rs AS (
      |  SELECT n, b1, b2,
      |    ryy - (b0 * ry + b1 * r1 + b2 * r2) AS rss_f,
      |    ryy - ((ry - ((a * r1 - b * ry) / (a * e - b * b)) * b) / a) * ry
      |        - ((a * r1 - b * ry) / (a * e - b * b)) * r1 AS rss_r
      |  FROM co)
      |SELECT n AS n_pairs, round(b1, 6) AS b_ylag, round(b2, 6) AS b_xlag,
      |  round((rss_r - rss_f) / (rss_f / (n - 3.0)), 6) AS f_stat
      |FROM rs""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(to_date(col("ts")).as("day"), col("event_type"))
    val st = broadcast(ev.agg(min(col("day")).as("mind")))
    val daily = ev.crossJoin(st)
      .groupBy(datediff(col("day"), col("mind")).cast(LongType).as("i"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("y"),
        count(when(col("event_type") === "click", 1)).as("x"))
    val prev = daily.select((col("i") + 1).as("ip"), col("y").as("x1"), col("x").as("x2"))
    val p = daily.join(prev, col("i") === col("ip"))
      .select(col("y"), col("x1"), col("x2"))
    val g = p.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
      sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"))
    g.select(col("n"),
        col("n").cast(DoubleType).as("a"), col("s1").cast(DoubleType).as("b"),
        col("s2").cast(DoubleType).as("c"), col("s11").cast(DoubleType).as("e"),
        col("s12").cast(DoubleType).as("f"), col("s22").cast(DoubleType).as("i"),
        col("sy").cast(DoubleType).as("ry"), col("syy").cast(DoubleType).as("ryy"),
        col("s1y").cast(DoubleType).as("r1"), col("s2y").cast(DoubleType).as("r2"))
      .withColumn("det",
        expr("a * (e * i - f * f) - b * (b * i - f * c) + c * (b * f - e * c)"))
      .withColumn("b0",
        expr("(ry * (e * i - f * f) - b * (r1 * i - f * r2) + c * (r1 * f - e * r2)) / det"))
      .withColumn("b1",
        expr("(a * (r1 * i - f * r2) - ry * (b * i - c * f) + c * (b * r2 - c * r1)) / det"))
      .withColumn("b2",
        expr("(a * (e * r2 - r1 * f) - b * (b * r2 - c * r1) + ry * (b * f - c * e)) / det"))
      .withColumn("rss_f", expr("ryy - (b0 * ry + b1 * r1 + b2 * r2)"))
      .withColumn("rss_r", expr(
        """ryy - ((ry - ((a * r1 - b * ry) / (a * e - b * b)) * b) / a) * ry
          |    - ((a * r1 - b * ry) / (a * e - b * b)) * r1""".stripMargin))
      .select(col("n").as("n_pairs"),
        expr("round(b1, 6)").as("b_ylag"), expr("round(b2, 6)").as("b_xlag"),
        expr("round((rss_r - rss_f) / (rss_f / (n - 3.0)), 6)").as("f_stat"))
  }

  /** Wald SPRT on the experiment conversion stream — ALWAYS-VALID
    * sequential inference next to q_two_prop's fixed-horizon z (peek
    * daily without inflating α): each big-ticket conversion is a
    * Bernoulli draw of "converter sits in variant B" (fair split under
    * H0 — the q_srm gate's guarantee), tested at p₁ = 0.55 with
    * α = β = 0.05. The daily log-likelihood ratio is
    * cb·ln(1.1) + ca·ln(0.9) over EXACT cumulative integer counts (one
    * date-bounded window), and the ±ln(19) decision boundaries share
    * formula text — the statistic is a 2-term product of integers and
    * constants, nothing folds in floats. */
  val sprt: GraftOp = GraftOp(
    "q_sprt",
    s"""WITH conv AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant
       |  FROM events
       |  WHERE event_type = 'purchase' AND CAST(value AS DECIMAL(18,2)) >= 150),
       |d AS (
       |  SELECT day,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS da,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS db
       |  FROM conv GROUP BY 1),
       |c AS (
       |  SELECT day,
       |    CAST(sum(da) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
       |    CAST(sum(db) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
       |  FROM d),
       |l AS (SELECT day, ca, cb,
       |      cb * ln(0.55 / 0.5) + ca * ln(0.45 / 0.5) AS llr FROM c)
       |SELECT day, ca, cb, round(llr, 6) AS llr,
       |  CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
       |       WHEN llr <= -ln(19.0) THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM l ORDER BY day""".stripMargin) { (s, d) =>
    val conv = Tables.events(s, d)
      .filter(col("event_type") === "purchase" &&
        col("value").cast(DecimalType(18, 2)) >= 150)
      .select(to_date(col("ts")).as("day"),
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"))
    val daily = conv.groupBy(col("day"))
      .agg(count(when(col("variant") === "A", 1)).as("da"),
        count(when(col("variant") === "B", 1)).as("db"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    daily
      .select(col("day"), sum(col("da")).over(w).as("ca"), sum(col("db")).over(w).as("cb"))
      .withColumn("llr", expr("cb * ln(0.55 / 0.5) + ca * ln(0.45 / 0.5)"))
      .select(col("day"), col("ca"), col("cb"),
        expr("round(llr, 6)").as("llr"),
        expr("""CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
          |     WHEN llr <= -ln(19.0) THEN 'accept_h0'
          |     ELSE 'continue' END""".stripMargin).as("decision"))
      .orderBy(col("day"))
  }

  /** Difference-in-differences on purchase spend: variant B's
    * pre→post change net of variant A's — the quasi-experimental
    * estimator for a mid-experiment feature launch (period split at
    * the series midpoint, variants by the standard hash bucketing).
    * Four cells of exact BIGINT (n, Σcents); every mean and the DiD
    * itself are shared-text double formulas over those eight
    * integers. */
  val did: GraftOp = GraftOp(
    "q_did",
    s"""WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
       |           FROM events),
       |p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CASE WHEN date_diff('day', b.lo, CAST(ts AS DATE))
       |              * 2 <= date_diff('day', b.lo, b.hi) THEN 0 ELSE 1 END AS post,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events, b WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT variant, post, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(cents) AS BIGINT) AS s
       |  FROM p GROUP BY 1, 2)
       |SELECT
       |  CAST(sum(n) AS BIGINT) AS n_purchases,
       |  round(max(CASE WHEN variant = 'B' AND post = 1 THEN CAST(s AS DOUBLE) / n END)
       |      - max(CASE WHEN variant = 'B' AND post = 0 THEN CAST(s AS DOUBLE) / n END)
       |      - (max(CASE WHEN variant = 'A' AND post = 1 THEN CAST(s AS DOUBLE) / n END)
       |       - max(CASE WHEN variant = 'A' AND post = 0 THEN CAST(s AS DOUBLE) / n END)), 6)
       |    AS did_cents
       |FROM c""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val b = broadcast(ev.agg(min(to_date(col("ts"))).as("lo"),
      max(to_date(col("ts"))).as("hi")))
    val p = ev.filter(col("event_type") === "purchase").crossJoin(b)
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        when(datediff(to_date(col("ts")), col("lo")) * 2 <=
          datediff(col("hi"), col("lo")), 0).otherwise(1).as("post"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    p.groupBy(col("variant"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .agg(sum(col("n")).as("n_purchases"),
        expr("""round(max(CASE WHEN variant = 'B' AND post = 1 THEN CAST(s AS DOUBLE) / n END)
          |    - max(CASE WHEN variant = 'B' AND post = 0 THEN CAST(s AS DOUBLE) / n END)
          |    - (max(CASE WHEN variant = 'A' AND post = 1 THEN CAST(s AS DOUBLE) / n END)
          |     - max(CASE WHEN variant = 'A' AND post = 0 THEN CAST(s AS DOUBLE) / n END)), 6)""".stripMargin)
          .as("did_cents"))
  }

  /** Wilson score interval on each event type's big-ticket conversion
    * share — the small-sample-safe CI the normal approximation gets
    * wrong near 0 or 1 (and the per-segment companion to q_sprt's
    * global trajectory). (k, n) are exact BIGINTs per type; the
    * z=1.96 interval is one shared-text double formula over the two
    * integers, clamped into [0,1] by construction. */
  val wilsonCi: GraftOp = GraftOp(
    "q_wilson_ci",
    """WITH c AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (WHERE CAST(value AS DECIMAL(18,2)) >= 150) AS BIGINT) AS k
      |  FROM events GROUP BY 1)
      |SELECT event_type, n, k,
      |  round((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
      |    - 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
      |        + 1.96 * 1.96 / (4.0 * n * n)))
      |    / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
      |  round((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
      |    + 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
      |        + 1.96 * 1.96 / (4.0 * n * n)))
      |    / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
      |FROM c ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("value").cast(DecimalType(18, 2)) >= 150, 1)).as("k"))
      .select(col("event_type"), col("n"), col("k"),
        expr("""round((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
          |  - 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
          |      + 1.96 * 1.96 / (4.0 * n * n)))
          |  / (1.0 + 1.96 * 1.96 / n), 6)""".stripMargin).as("wilson_lo"),
        expr("""round((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n)
          |  + 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n
          |      + 1.96 * 1.96 / (4.0 * n * n)))
          |  / (1.0 + 1.96 * 1.96 / n), 6)""".stripMargin).as("wilson_hi"))
      .orderBy(col("event_type"))
  }

  /** Mann-Kendall trend test on each event type's daily revenue series
    * — the NON-parametric "is this metric trending" gate (q_theil_sen
    * estimates the slope; MK decides significance without assuming
    * linearity or normality; together they are the standard
    * trend-audit pair). S = Σ_{i<j} sgn(cⱼ − cᵢ) is an exact BIGINT
    * over the DOMAIN-BOUNDED day-pair join (|days|² pairs per type —
    * at 100 TB the series is still one row per day; the fact scan is
    * the one daily-cents groupBy), the tie term Σt(t−1)(2t+5) comes
    * from the per-value margins, and z = (S − sgn S)/√(var18/18) is
    * one shared-text double formula over three exact integers,
    * guarded NULL when the variance is zero. */
  val mannKendall: GraftOp = GraftOp(
    "q_mann_kendall",
    """WITH dly AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT a.event_type,
      |    CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM dly a JOIN dly b ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1),
      |t AS (
      |  SELECT event_type,
      |    CAST(coalesce(sum(tt * (tt - 1) * (2 * tt + 5)), 0) AS BIGINT) AS ties
      |  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS tt FROM dly GROUP BY 1, 2)
      |  GROUP BY 1),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM dly GROUP BY 1)
      |SELECT n.event_type, n.n, s.s_stat,
      |  CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.ties AS BIGINT) AS var18,
      |  CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.ties > 0 THEN
      |    round((CAST(s_stat AS DOUBLE)
      |        - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
      |      / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5) - t.ties) / 18.0), 6)
      |  END AS z
      |FROM n JOIN s USING (event_type) JOIN t USING (event_type)
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val dly = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * 100).cast(LongType))
        .cast(LongType).as("c"))
    val a = dly.select(col("event_type"), col("day").as("ad"), col("c").as("ac"))
    val b = dly.select(col("event_type"), col("day").as("bd"), col("c").as("bc"))
    val sStat = a.join(b, Seq("event_type")).filter(col("ad") < col("bd"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("bc") > col("ac"), 1L).when(col("bc") < col("ac"), -1L)
        .otherwise(0L)).cast(LongType).as("s_stat"))
    val ties = dly.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("tt"))
      .groupBy(col("event_type"))
      .agg(coalesce(sum(col("tt") * (col("tt") - 1) * (col("tt") * 2 + 5)), lit(0L))
        .cast(LongType).as("ties"))
    val n = dly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    n.join(sStat, "event_type").join(ties, "event_type")
      .select(col("event_type"), col("n"), col("s_stat"),
        expr("CAST(n * (n - 1) * (2 * n + 5) - ties AS BIGINT)").as("var18"),
        expr("""CASE WHEN n * (n - 1) * (2 * n + 5) - ties > 0 THEN
          |  round((CAST(s_stat AS DOUBLE)
          |      - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
          |    / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - ties) / 18.0), 6)
          |END""".stripMargin).as("z"))
      .orderBy(col("event_type"))
  }

  /** Binary-segmentation changepoint LOCATOR on each event type's
    * daily revenue series — q_cusum emits the drift trajectory; this
    * answers "WHERE did the level shift": the split k maximizing the
    * scaled CUSUM deviation |n·S_k − k·S_n| (the exact-integer form of
    * max |S_k − (k/n)·S_n| — multiplying through by n keeps every
    * compared quantity a BIGINT, so the argmax is engine-exact; ties
    * to the earlier day). One running-sum window per type + a
    * per-type argmax; before/after means emit via micro-dollar
    * floor-snap (never round() an exact rational — §6). */
  val changepoint: GraftOp = GraftOp(
    "q_changepoint",
    """WITH dly AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |o AS (
      |  SELECT event_type, day, c,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sk
      |  FROM dly),
      |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(c) AS BIGINT) AS sn FROM dly GROUP BY 1),
      |d AS (
      |  SELECT o.event_type, o.day, o.k, o.sk, t.n, t.sn,
      |    CAST(abs(t.n * o.sk - o.k * t.sn) AS BIGINT) AS dev
      |  FROM o JOIN tot t ON o.event_type = t.event_type WHERE o.k < t.n),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev DESC, k) AS rn
      |      FROM d)
      |SELECT event_type, day AS split_day, k AS split_k, n, dev AS scaled_dev,
      |  CAST(sk * 10000 // k AS BIGINT) / 1000000.0 AS mean_before,
      |  CAST((sn - sk) * 10000 // (n - k) AS BIGINT) / 1000000.0 AS mean_after
      |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    val dly = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast(DecimalType(18, 2)) * 100).cast(LongType))
        .cast(LongType).as("c"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val o = dly
      .withColumn("k", row_number().over(byDay).cast(LongType))
      .withColumn("sk", sum(col("c")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(LongType))
    val tot = dly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).cast(LongType).as("sn"))
    val byDev = Window.partitionBy(col("event_type")).orderBy(col("dev").desc, col("k"))
    o.join(tot, "event_type")
      .filter(col("k") < col("n"))
      .withColumn("dev", abs(col("n") * col("sk") - col("k") * col("sn")).cast(LongType))
      .withColumn("rn", row_number().over(byDev))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"), col("k").as("split_k"),
        col("n"), col("dev").as("scaled_dev"),
        (expr("CAST(sk * 10000 div k AS BIGINT)") / 1000000.0).as("mean_before"),
        (expr("CAST((sn - sk) * 10000 div (n - k) AS BIGINT)") / 1000000.0).as("mean_after"))
      .orderBy(col("event_type"))
  }

  /** Brown-Forsythe / Levene variance-homogeneity test terms (r8) —
    * the gate q_anova silently assumes: ANOVA's F is only meaningful
    * if the k groups share a variance, and Brown-Forsythe tests
    * exactly that by running the SAME one-way decomposition on the
    * absolute deviations from each group's median. Everything is a
    * function of exact integers (the q_anova/q_chi_square discipline):
    * cents per event, the group median as the LOWER median (the
    * ⌈n/2⌉-th order statistic — percentile_disc semantics, so it is an
    * exact integer cents value found by the q_mann_whitney cumulative
    * trick: per-(type,cents) counts, one value-domain-bounded running
    * window, min cents with cum ≥ ⌈n/2⌉), then z = |cents − med| is an
    * exact BIGINT per row, Σz folds BIGINT, Σz² folds DECIMAL(38)
    * (HUGEINT in the oracle), and the emitted between/within terms are
    * each ONE double formula over those integers — the caller forms
    * F = (N−k)/(k−1) · Σbetween/Σwithin from the k rows. Value-domain
    * windows stay ≤|distinct cents| regardless of corpus size; the
    * 5-row median frame broadcasts back — two hash shuffles total. */
  val levene: GraftOp = GraftOp(
    "q_levene",
    """WITH p AS (
      |  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cv
      |  FROM p GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, cents, cv,
      |    CAST(sum(cv) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(cv) OVER (PARTITION BY event_type) AS BIGINT) AS n_i
      |  FROM c),
      |med AS (
      |  SELECT event_type, min(cents) AS med
      |  FROM w WHERE cum * 2 >= n_i GROUP BY 1),
      |z AS (
      |  SELECT p.event_type, abs(p.cents - med.med) AS dz
      |  FROM p JOIN med USING (event_type)),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(sum(dz) AS BIGINT) AS s_i,
      |    sum(CAST(dz AS HUGEINT) * dz) AS ss_i
      |  FROM z GROUP BY 1),
      |t AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(s_i) AS BIGINT) AS s FROM g),
      |f AS (
      |  SELECT event_type, n_i, med, s_i, n,
      |    CAST(s_i AS HUGEINT) * n - CAST(s AS HUGEINT) * n_i AS bd,
      |    CAST(ss_i AS HUGEINT) * n_i - CAST(s_i AS HUGEINT) * s_i AS wd
      |  FROM g JOIN med USING (event_type) CROSS JOIN t)
      |SELECT event_type, n_i,
      |  med / 100.0 AS median_value,
      |  CAST(CAST(s_i AS HUGEINT) * 10000 // n_i AS BIGINT) / 1000000.0 AS mean_absdev,
      |  CAST(bd AS DOUBLE) * CAST(bd AS DOUBLE)
      |    / (CAST(n_i AS DOUBLE) * n * n * 10000.0) AS between_term,
      |  CAST(wd AS DOUBLE) / (CAST(n_i AS DOUBLE) * 10000.0) AS within_term
      |FROM f ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = p.groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("cv"))
    val byType = Window.partitionBy(col("event_type"))
    val w = c
      .withColumn("cum", sum(col("cv")).over(
        byType.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_i", sum(col("cv")).over(byType))
    val med = broadcast(
      w.filter(col("cum") * 2 >= col("n_i"))
        .groupBy(col("event_type")).agg(min(col("cents")).as("med")))
    val g = p.join(med, "event_type")
      .select(col("event_type"), abs(col("cents") - col("med")).as("dz"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_i"), sum(col("dz")).as("s_i"),
        sum(col("dz").cast(DecimalType(38, 0)) * col("dz")).as("ss_i"))
    val t = broadcast(g.agg(sum(col("n_i")).as("n"), sum(col("s_i")).as("s")))
    // between/within numerators assembled as EXACT DECIMAL(38) integers
    // (HUGEINT on the oracle side), then ONE correctly-rounded cast to
    // double + deterministic IEEE mul/div — no round(), no midpoint
    // lottery (the r8 red row). bd ~ s·n_i stays within 10³⁸ up to
    // ~10²⁷ cents-deviation mass; wd ~ ss_i·n_i within 10³⁸ to ~10³⁶.
    g.join(med, "event_type").crossJoin(t)
      .withColumn("bd",
        expr("CAST(s_i AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) * n_i"))
      .withColumn("wd",
        expr("CAST(ss_i AS DECIMAL(38,0)) * n_i - CAST(s_i AS DECIMAL(38,0)) * s_i"))
      .select(col("event_type"), col("n_i"),
        expr("CAST(med AS DOUBLE) / 100.0D").as("median_value"),
        expr("CAST(CAST(CAST(s_i AS DECIMAL(38,0)) * 10000 div n_i AS BIGINT) AS DOUBLE) / 1000000.0D")
          .as("mean_absdev"),
        expr("""CAST(bd AS DOUBLE) * CAST(bd AS DOUBLE)
          |  / (CAST(n_i AS DOUBLE) * n * n * 10000.0D)""".stripMargin).as("between_term"),
        expr("CAST(wd AS DOUBLE) / (CAST(n_i AS DOUBLE) * 10000.0D)").as("within_term"))
      .orderBy(col("event_type"))
  }

  val ops: Seq[GraftOp] = Seq(gini, acf, twoProp, holt, keySkew, ols2, mannWhitney, ks,
    spearman, welchT, anova, cramersV, bollinger, srm, cuped, theilSen, lorenz, fdrBh, psi,
    bootstrapCi, conformal, auc, holtWinters, kruskal, kendall, xcorr, stlDecompose, granger,
    sprt, did, wilsonCi, mannKendall, changepoint, levene)
}
