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

  def ops: Seq[GraftOp] = Seq(mase, kupiec)
}
