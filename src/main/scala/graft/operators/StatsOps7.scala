package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seventh statistics tier (round 14): FORECAST-ACCURACY and
  * RISK-BACKTEST benchmarks — the evaluation half the r7–r13 forecast
  * ladder (q_holt / q_holt_winters / q_croston / q_ewma) and tail-risk
  * readouts (q_cvar) still lacked: a forecast is only as good as the
  * naive benchmark it beats (Hyndman & Koehler 2006), and a VaR level
  * is only as good as its violation count (Kupiec 1995).
  *
  * Oracle-parity contract as [[StatsOps5]]/[[StatsOps6]]: exact
  * integer folds (BIGINT cents / DECIMAL(38) products), one shared-text
  * double formula per emitted statistic, and — per the r13/r14 house
  * rule — NO DecimalType in any emitted schema.
  */
object StatsOps7 {

  /** Naive vs seasonal-naive forecast benchmark on daily purchase
    * revenue — the MASE denominator pair (Hyndman & Koehler 2006):
    * MAE of the lag-1 "no-change" forecast vs MAE of the lag-7
    * "same-weekday" forecast, and their ratio (< 1 ⇒ weekly
    * seasonality carries real signal; the sanity floor every fancier
    * forecaster must beat). Exactness: both sums of absolute errors
    * fold as exact BIGINT cents over the date-bounded day frame (null
    * lags drop from count and sum identically on both engines); the
    * three display doubles divide exact integers with identical
    * expression text. Scale shape: one events scan → day frame; the
    * two lag windows run on that bounded frame. */
  val mase: GraftOp = GraftOp(
    "q_mase",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |l AS (
      |  SELECT day, x,
      |    lag(x, 1) OVER (ORDER BY day) AS x1,
      |    lag(x, 7) OVER (ORDER BY day) AS x7
      |  FROM daily),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(x1) AS BIGINT) AS n1,
      |    CAST(sum(abs(x - x1)) AS BIGINT) AS sae1,
      |    CAST(count(x7) AS BIGINT) AS n7,
      |    CAST(sum(abs(x - x7)) AS BIGINT) AS sae7
      |  FROM l)
      |SELECT n AS n_days, n1, n7, sae1 AS sae1_cents, sae7 AS sae7_cents,
      |  CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS mae_naive,
      |  CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE) / 100.0 AS mae_seasonal,
      |  (CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE))
      |    / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS mase_ratio
      |FROM g""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
        .cast(LongType).as("x"))
    // both lag windows run over the date-bounded day frame
    val ow = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val l = daily.select(col("day"), col("x"),
      lag(col("x"), 1).over(ow).as("x1"),
      lag(col("x"), 7).over(ow).as("x7"))
    l.agg(
        count(lit(1)).as("n"),
        count(col("x1")).as("n1"),
        sum(abs(col("x") - col("x1"))).cast(LongType).as("sae1"),
        count(col("x7")).as("n7"),
        sum(abs(col("x") - col("x7"))).cast(LongType).as("sae7"))
      .select(col("n").as("n_days"), col("n1"), col("n7"),
        col("sae1").as("sae1_cents"), col("sae7").as("sae7_cents"),
        expr("CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0D").as("mae_naive"),
        expr("CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE) / 100.0D").as("mae_seasonal"),
        expr("""(CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE))
               |  / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE))""".stripMargin)
          .as("mase_ratio"))
  }

  /** Kupiec proportion-of-failures backtest of the 95% VaR level
    * (Kupiec 1995) — the regulatory-standard "is the VaR honest"
    * check completing q_cvar (which ESTIMATES the level; this op
    * AUDITS it): violations x = #{orders strictly above VaR₉₅}
    * against the Binomial(n, 0.05) null via the likelihood ratio
    * LR_pof = −2[(n−x)ln(1−p) + x·ln p − (n−x)ln(1−x̂) − x·ln x̂].
    * Exactness: VaR₉₅ reuses q_cvar's exact rank construction (the
    * SAME session-cached range-partitioned rank frame — no second
    * sort); n/x/k are exact integers; ln(0.95)/ln(0.05) are
    * compile-time Scala literals embedded in both texts (the
    * q_gumbel_maxima discipline), and the two runtime ln() calls feed
    * a single 1-row emit that is floor-micro-snapped (the tiny-frame
    * snap class — the libm ban applies to row-scale emits). */
  val kupiec: GraftOp = {
    val ln95 = math.log(0.95)
    val ln05 = math.log(0.05)
    // `suf` = the engine's double-literal suffix ("" DuckDB, "D" Spark)
    // so every literal is double-typed in BOTH texts — a bare 0.0 is
    // DECIMAL in Spark SQL and would change the promotion chain
    def lr(n: String, x: String, suf: String) =
      s"""floor((-2.0$suf * ((CAST($n AS DOUBLE) - CAST($x AS DOUBLE)) * $ln95$suf
         |  + CAST($x AS DOUBLE) * $ln05$suf
         |  - (CAST($n AS DOUBLE) - CAST($x AS DOUBLE))
         |    * ln((CAST($n AS DOUBLE) - CAST($x AS DOUBLE)) / CAST($n AS DOUBLE))
         |  - (CASE WHEN $x = 0 THEN 0.0$suf
         |          ELSE CAST($x AS DOUBLE) * ln(CAST($x AS DOUBLE) / CAST($n AS DOUBLE)) END)))
         |  * 1000000.0$suf) / 1000000.0$suf""".stripMargin
    GraftOp(
      "q_kupiec",
      s"""WITH o AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders),
         |r AS (
         |  SELECT cents,
         |    CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rn,
         |    CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM o),
         |v AS (
         |  SELECT max(n) AS n, min(cents) AS var_cents
         |  FROM r WHERE rn > n - ((n * 5 + 99) // 100)),
         |g AS (
         |  SELECT v.n, v.var_cents,
         |    (SELECT CAST(count(*) AS BIGINT) FROM o WHERE o.cents > v.var_cents) AS x
         |  FROM v)
         |SELECT n, var_cents, x,
         |  CAST(n AS DOUBLE) * 0.05 AS expected_viol,
         |  ${lr("n", "x", "")} AS lr_pof
         |FROM g""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select((graft.functions.Exprs.dec2(col("o_totalprice")) * 100)
          .cast(LongType).as("cents"))
      // SAME cache key as q_cvar: the ranked frame is built once per
      // session+dir and shared by both tail ops
      val ranked = QuantileExact.rankedUngrouped(s, s"cvar.orders:$d", o, "cents")
      val v = ranked.filter(expr("__rn > __n - ((__n * 5 + 99) div 100)"))
        .agg(max(col("__n")).as("n"), min(col("cents")).as("var_cents"))
      o.crossJoin(broadcast(v))
        .agg(max(col("n")).as("n"), max(col("var_cents")).as("var_cents"),
          count(when(col("cents") > col("var_cents"), 1)).as("x"))
        .select(col("n"), col("var_cents"), col("x"),
          expr("CAST(n AS DOUBLE) * 0.05D").as("expected_viol"),
          expr(lr("n", "x", "D")).as("lr_pof"))
    }
  }

  /** Naive-forecast error by horizon h = 1..7 on daily purchase
    * revenue — the forecastability DECAY CURVE ([[mase]] reads two
    * points of it; this emits the whole week): SAE_h = Σ|x_t − x_{t−h}|
    * as exact BIGINT cents per horizon, unpivoted to one row per h.
    * A flat curve says the series is near-random-walk; a dip at h=7
    * quantifies weekly structure. The 7 lag windows and the unpivot
    * all run on the date-bounded day frame; the unpivot spelling
    * differs per engine (VALUES join in DuckDB, stack() in Spark) but
    * every value is the same exact integer. */
  val horizonError: GraftOp = {
    val hs = 1 to 7
    GraftOp(
      "q_horizon_error",
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |l AS (
         |  SELECT day, x,
         |    ${hs.map(h => s"lag(x, $h) OVER (ORDER BY day) AS x$h").mkString(",\n    ")}
         |  FROM daily),
         |g AS (
         |  SELECT
         |    ${hs.map(h => s"CAST(count(x$h) AS BIGINT) AS n$h, CAST(sum(abs(x - x$h)) AS BIGINT) AS s$h").mkString(",\n    ")}
         |  FROM l)
         |SELECT h.h AS horizon,
         |  CASE h.h ${hs.map(h => s"WHEN $h THEN n$h").mkString(" ")} END AS n_pairs,
         |  CASE h.h ${hs.map(h => s"WHEN $h THEN s$h").mkString(" ")} END AS sae_cents,
         |  CAST(CASE h.h ${hs.map(h => s"WHEN $h THEN s$h").mkString(" ")} END AS DOUBLE)
         |    / CAST(CASE h.h ${hs.map(h => s"WHEN $h THEN n$h").mkString(" ")} END AS DOUBLE)
         |    / 100.0 AS mae_value
         |FROM g CROSS JOIN (VALUES ${hs.map(h => s"($h)").mkString(", ")}) h(h)
         |ORDER BY horizon""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(when(col("event_type") === "purchase",
            col("value").cast(DecimalType(18, 2)))
            .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
          .cast(LongType).as("x"))
      val ow = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      val l = daily.select(Seq(col("day"), col("x")) ++
        hs.map(h => lag(col("x"), h).over(ow).as(s"x$h")): _*)
      val g = l.agg(
        count(col("x1")).as("n1"),
        (hs.map(h => sum(abs(col("x") - col(s"x$h"))).cast(LongType).as(s"s$h")) ++
          hs.drop(1).map(h => count(col(s"x$h")).as(s"n$h"))): _*)
      g.select(expr(s"stack(${hs.size}, " +
          hs.map(h => s"CAST($h AS BIGINT), n$h, s$h").mkString(", ") +
          ") AS (horizon, n_pairs, sae_cents)"))
        .select(col("horizon"), col("n_pairs"), col("sae_cents"),
          expr("CAST(sae_cents AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 100.0D")
            .as("mae_value"))
        .orderBy(col("horizon"))
    }
  }

  /** Decile QQ table between the hash-split A/B purchase-value
    * variants — the quantile-level WHERE of the distribution shift
    * q_ks_test (sup distance) and q_energy_distance (omnibus) only
    * summarize: for each decile d = 1..9, the exact lower order
    * statistic of each variant (smallest v with 10·cum ≥ d·n —
    * percentile_disc semantics, a rank decision on exact integers, no
    * interpolation and no double compare) and their gap. One
    * conditional histogram aggregate off the scan; the cumulative
    * window and the 9-decile cross join run on the money-grid-bounded
    * histogram. */
  val qqQuantiles: GraftOp = GraftOp(
    "q_qq_quantiles",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |h AS (
       |  SELECT cents,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS ca,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS cb
       |  FROM p GROUP BY 1),
       |w AS (
       |  SELECT cents,
       |    CAST(sum(ca) OVER cw AS BIGINT) AS cum_a,
       |    CAST(sum(cb) OVER cw AS BIGINT) AS cum_b,
       |    CAST(sum(ca) OVER () AS BIGINT) AS n_a,
       |    CAST(sum(cb) OVER () AS BIGINT) AS n_b
       |  FROM h WINDOW cw AS (ORDER BY cents ROWS UNBOUNDED PRECEDING))
       |SELECT d.d AS decile,
       |  min(CASE WHEN 10 * cum_a >= d.d * n_a THEN cents END) AS qa_cents,
       |  min(CASE WHEN 10 * cum_b >= d.d * n_b THEN cents END) AS qb_cents,
       |  min(CASE WHEN 10 * cum_b >= d.d * n_b THEN cents END)
       |    - min(CASE WHEN 10 * cum_a >= d.d * n_a THEN cents END) AS gap_cents,
       |  CAST(min(CASE WHEN 10 * cum_b >= d.d * n_b THEN cents END)
       |    - min(CASE WHEN 10 * cum_a >= d.d * n_a THEN cents END) AS DOUBLE) / 100.0
       |    AS gap_value
       |FROM w CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(d)
       |GROUP BY d.d ORDER BY decile""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val h = p.groupBy(col("cents"))
      .agg(count(when(col("variant") === "A", 1)).as("ca"),
        count(when(col("variant") === "B", 1)).as("cb"))
    // both windows run on the money-grid-bounded cents histogram
    val cw = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = h.select(col("cents"),
      sum(col("ca")).over(cw).as("cum_a"), sum(col("cb")).over(cw).as("cum_b"),
      sum(col("ca")).over(tw).as("n_a"), sum(col("cb")).over(tw).as("n_b"))
    val deciles = s.range(1, 10).toDF("d")
    w.crossJoin(broadcast(deciles))
      .groupBy(col("d").as("decile"))
      .agg(
        min(when(lit(10) * col("cum_a") >= col("d") * col("n_a"), col("cents")))
          .as("qa_cents"),
        min(when(lit(10) * col("cum_b") >= col("d") * col("n_b"), col("cents")))
          .as("qb_cents"))
      .select(col("decile"), col("qa_cents"), col("qb_cents"),
        (col("qb_cents") - col("qa_cents")).as("gap_cents"),
        expr("CAST(qb_cents - qa_cents AS DOUBLE) / 100.0D").as("gap_value"))
      .orderBy(col("decile"))
  }

  /** Ansari-Bradley rank test of SCALE between the hash-split A/B
    * purchase-value variants (Ansari & Bradley 1960) — the dispersion
    * companion of q_mann_whitney's location test and the
    * nonparametric sibling of q_levene/q_brown_forsythe (no moments,
    * no centers): scores a(r) = min(r, n+1−r) peak at the pooled
    * center, so a large A-sum means A is CONCENTRATED (smaller
    * spread). Doubled midrank scores 2a = min(2R, 2(n+1)−2R) are
    * exact integers off the cents-histogram cumulative windows
    * (midrank-score tie variant, stated identically both engines; the
    * doubling cancels in z). z uses the exact permutation moments for
    * arbitrary fixed scores — E = nₐ·S₁/n,
    * Var = nₐ·n_b(n·S₂−S₁²)/(n²(n−1)) — every inner term an exact
    * DECIMAL(38)/HUGEINT fold (n·S₂ ~ n²(n+1)² stays inside 38 digits
    * to ~10⁹ rows; rescale documented past), one shared-text double
    * at the end. One conditional histogram aggregate off the scan;
    * all windows on the money-grid-bounded frame. */
  val ansariBradley: GraftOp = GraftOp(
    "q_ansari_bradley",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |h AS (
       |  SELECT cents,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS ca,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS cb
       |  FROM p GROUP BY 1),
       |w AS (
       |  SELECT cents, ca, cb, ca + cb AS c,
       |    CAST(1 + coalesce(sum(ca + cb) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start,
       |    CAST(sum(ca + cb) OVER () AS BIGINT) AS n
       |  FROM h),
       |sc AS (
       |  SELECT ca, cb, c, n,
       |    least(2 * start + c - 1, 2 * (n + 1) - (2 * start + c - 1)) AS a2
       |  FROM w),
       |g AS (
       |  SELECT max(n) AS n,
       |    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
       |    CAST(sum(CAST(ca AS HUGEINT) * a2) AS HUGEINT) AS ab2,
       |    CAST(sum(CAST(c AS HUGEINT) * a2) AS HUGEINT) AS s1,
       |    CAST(sum(CAST(c AS HUGEINT) * a2 * a2) AS HUGEINT) AS s2
       |  FROM sc)
       |SELECT n_a, n_b, CAST(ab2 AS DOUBLE) AS ab2,
       |  CAST(n * ab2 - n_a * s1 AS DOUBLE)
       |    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       |        * CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)) AS z
       |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val h = p.groupBy(col("cents"))
      .agg(count(when(col("variant") === "A", 1)).as("ca"),
        count(when(col("variant") === "B", 1)).as("cb"))
    val bw = Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, -1)
    val tw = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = h.select(col("ca"), col("cb"), (col("ca") + col("cb")).as("c"),
      (lit(1L) + coalesce(sum(col("ca") + col("cb")).over(bw), lit(0L))).as("start"),
      sum(col("ca") + col("cb")).over(tw).cast(LongType).as("n"))
    val sc = w.select(col("ca"), col("cb"), col("c"), col("n"),
      least(lit(2) * col("start") + col("c") - 1,
        lit(2) * (col("n") + 1) - (lit(2) * col("start") + col("c") - 1)).as("a2"))
    sc.agg(max(col("n")).as("n"),
        sum(col("ca")).cast(LongType).as("n_a"),
        sum(col("cb")).cast(LongType).as("n_b"),
        sum(col("ca").cast(dec) * col("a2")).cast(dec).as("ab2"),
        sum(col("c").cast(dec) * col("a2")).cast(dec).as("s1"),
        sum(col("c").cast(dec) * col("a2") * col("a2")).cast(dec).as("s2"))
      .select(col("n_a"), col("n_b"),
        col("ab2").cast(DoubleType).as("ab2"),
        expr("""CAST(n * ab2 - n_a * s1 AS DOUBLE)
               |  / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               |      * CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0D))""".stripMargin)
          .as("z"))
  }

  /** Cochran-Mantel-Haenszel stratified 2×2 association (Mantel &
    * Haenszel 1959) — the Simpson's-paradox-proof pooling the 2×2
    * family (q_two_prop, q_risk_ratio) lacked: does order PRIORITY
    * (urgent/high) associate with RETURNS after controlling for
    * customer nation? Per-stratum deviations a − r₁c₁/n and
    * hypergeometric variances r₁r₀c₁c₀/(n²(n−1)) are floor-snapped to
    * exact micro integers per stratum (the q_theil_index fold — the
    * cross-stratum sums are then order-free; numerators ride
    * DECIMAL(38), inside 38 digits to ~10⁸ rows/stratum, rescale
    * documented past), and CMH = (Σdev)²/Σvar plus the MH pooled odds
    * ratio Σ(ad/n)/Σ(bc/n) are shared-text doubles over those exact
    * sums. One orders⋈returned-flag⋈customer co-partitioned aggregate
    * to 25 nation cells; everything after is on the bounded frame. */
  val cmh: GraftOp = GraftOp(
    "q_cmh",
    """WITH r AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS hi,
      |    CASE WHEN EXISTS (SELECT 1 FROM lineitem l
      |                      WHERE l.l_orderkey = o_orderkey AND l.l_returnflag = 'R')
      |         THEN 1 ELSE 0 END AS ret,
      |    o_custkey
      |  FROM orders),
      |g AS (
      |  SELECT c.c_nationkey AS nation,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (WHERE hi = 1 AND ret = 1) AS BIGINT) AS a,
      |    CAST(count(*) FILTER (WHERE hi = 1 AND ret = 0) AS BIGINT) AS b,
      |    CAST(count(*) FILTER (WHERE hi = 0 AND ret = 1) AS BIGINT) AS c2,
      |    CAST(count(*) FILTER (WHERE hi = 0 AND ret = 0) AS BIGINT) AS d2
      |  FROM r JOIN customer c ON r.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |    CAST(sum(a * 1000000 - (CAST(a + b AS HUGEINT) * (a + c2) * 1000000) // n)
      |      AS DECIMAL(38,0)) AS dev_micro,
      |    CAST(sum((CAST(a + b AS HUGEINT) * (c2 + d2) * (a + c2) * (b + d2) * 1000000)
      |      // (CAST(n AS HUGEINT) * n * (n - 1))) AS DECIMAL(38,0)) AS var_micro,
      |    CAST(sum((CAST(a AS HUGEINT) * d2 * 1000000) // n) AS DECIMAL(38,0)) AS ad_micro,
      |    CAST(sum((CAST(b AS HUGEINT) * c2 * 1000000) // n) AS DECIMAL(38,0)) AS bc_micro
      |  FROM g WHERE n > 1)
      |SELECT n_strata,
      |  CAST(dev_micro AS DOUBLE) AS dev_micro,
      |  CAST(var_micro AS DOUBLE) AS var_micro,
      |  CAST(dev_micro AS DOUBLE) * CAST(dev_micro AS DOUBLE)
      |    / (1000000.0 * CAST(var_micro AS DOUBLE)) AS cmh,
      |  CAST(ad_micro AS DOUBLE) / CAST(bc_micro AS DOUBLE) AS or_mh
      |FROM t""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val ret = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    val r = Tables.orders(s, d)
      .join(ret, col("o_orderkey") === col("rk"), "left")
      .select(col("o_custkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L).as("hi"),
        when(col("rk").isNotNull, 1L).otherwise(0L).as("ret"))
    val g = r.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n"),
        count(when(col("hi") === 1 && col("ret") === 1, 1)).as("a"),
        count(when(col("hi") === 1 && col("ret") === 0, 1)).as("b"),
        count(when(col("hi") === 0 && col("ret") === 1, 1)).as("c2"),
        count(when(col("hi") === 0 && col("ret") === 0, 1)).as("d2"))
    g.filter(col("n") > 1)
      .agg(count(lit(1)).as("n_strata"),
        sum(expr("""a * 1000000 - (CAST(a + b AS DECIMAL(38,0)) * (a + c2) * 1000000) div n"""))
          .cast(dec).as("dev_micro"),
        sum(expr("""(CAST(a + b AS DECIMAL(38,0)) * (c2 + d2) * (a + c2) * (b + d2) * 1000000)
                   | div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))""".stripMargin))
          .cast(dec).as("var_micro"),
        sum(expr("(CAST(a AS DECIMAL(38,0)) * d2 * 1000000) div n")).cast(dec).as("ad_micro"),
        sum(expr("(CAST(b AS DECIMAL(38,0)) * c2 * 1000000) div n")).cast(dec).as("bc_micro"))
      .select(col("n_strata"),
        col("dev_micro").cast(DoubleType).as("dev_micro"),
        col("var_micro").cast(DoubleType).as("var_micro"),
        expr("""CAST(dev_micro AS DOUBLE) * CAST(dev_micro AS DOUBLE)
               |  / (1000000.0D * CAST(var_micro AS DOUBLE))""".stripMargin).as("cmh"),
        expr("CAST(ad_micro AS DOUBLE) / CAST(bc_micro AS DOUBLE)").as("or_mh"))
  }

  def ops: Seq[GraftOp] = Seq(mase, kupiec, horizonError, qqQuantiles,
    ansariBradley, cmh)
}
