package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth statistics tier (round 9, continued): the remaining standard
  * inference ladder — a nonparametric effect size (Cliff's delta, the
  * rank-world twin of q_cohens_d), serial-correlation diagnostics
  * (Durbin-Watson), variance homogeneity under normality (Bartlett,
  * the parametric sibling of q_levene), a max-studentized-residual
  * outlier screen (Grubbs), the randomized-block rank test (Friedman),
  * and a rank-based changepoint significance test (Pettitt — the
  * hypothesis-test companion to q_changepoint's locator).
  *
  * Oracle-parity contract as [[StatsOps3]]: every cross-row fold is an
  * exact integer (BIGINT with a proven bound, DECIMAL(38)/HUGEINT where
  * products scale with corpus size), the final scalar formulas run in
  * doubles with identical expression text on both engines, and libm
  * terms (ln/exp) are 6dp-snapped per the round-9 emit rule before any
  * further use. Fixed small domains (the 3 return flags, the 5 event
  * types, calendar days) are PIVOTED onto one row where a fold of
  * doubles is needed, so fold order is the written expression text.
  */
object StatsOps4 {

  /** Cliff's delta between the hash-split experiment variants — the
    * ordinal effect size q_mann_whitney's significance lacks (the same
    * significance-vs-magnitude trap q_cohens_d closes for Welch's t,
    * but with no normality assumption: δ = P(a>b) − P(a<b)). Runs
    * entirely on the per-cents value contingency: with cum_b the
    * running B-count over ascending cents, Σ ca·(cum_b−cb) counts
    * strict a>b pairs and Σ ca·(n_b−cum_b) strict a<b pairs — both
    * exact DECIMAL(38)/HUGEINT folds (they scale with n²) — and δ is
    * ONE double divide. The magnitude label (Romano's 0.147/0.33/0.474
    * cuts) is decided on exact integer cross-multiplication, never a
    * double threshold, so band membership cannot flip on a 1-ulp. */
  val cliffsDelta: GraftOp = GraftOp(
    "q_cliffs_delta",
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
       |w AS (
       |  SELECT cents, ca, cb,
       |    CAST(sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
       |    CAST(sum(ca) OVER () AS BIGINT) AS n_a,
       |    CAST(sum(cb) OVER () AS BIGINT) AS n_b
       |  FROM c),
       |f AS (
       |  SELECT n_a, n_b,
       |    CAST(sum(CAST(ca AS HUGEINT) * (cum_b - cb)) AS HUGEINT) AS n_gt,
       |    CAST(sum(CAST(ca AS HUGEINT) * (n_b - cum_b)) AS HUGEINT) AS n_lt
       |  FROM w GROUP BY 1, 2)
       |SELECT n_a, n_b,
       |  CAST(n_gt AS BIGINT) AS n_gt, CAST(n_lt AS BIGINT) AS n_lt,
       |  (CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
       |    / (CAST(n_a AS DOUBLE) * n_b) AS cliffs_delta,
       |  CASE WHEN abs(n_gt - n_lt) * 1000 < 147 * CAST(n_a AS HUGEINT) * n_b THEN 'negligible'
       |       WHEN abs(n_gt - n_lt) * 1000 < 330 * CAST(n_a AS HUGEINT) * n_b THEN 'small'
       |       WHEN abs(n_gt - n_lt) * 1000 < 474 * CAST(n_a AS HUGEINT) * n_b THEN 'medium'
       |       ELSE 'large' END AS magnitude
       |FROM f""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = p.groupBy(col("cents"))
      .agg(count(when(col("variant") === "A", 1)).as("ca"),
        count(when(col("variant") === "B", 1)).as("cb"))
    val w = c
      .withColumn("cum_b", sum(col("cb")).over(
        Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_a", sum(col("ca")).over(Window.partitionBy()))
      .withColumn("n_b", sum(col("cb")).over(Window.partitionBy()))
    w.groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("ca").cast(DecimalType(38, 0)) * (col("cum_b") - col("cb"))).as("n_gt"),
        sum(col("ca").cast(DecimalType(38, 0)) * (col("n_b") - col("cum_b"))).as("n_lt"))
      .select(col("n_a"), col("n_b"),
        col("n_gt").cast(LongType).as("n_gt"), col("n_lt").cast(LongType).as("n_lt"),
        expr("""(CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
          |  / (CAST(n_a AS DOUBLE) * n_b)""".stripMargin).as("cliffs_delta"),
        expr("""CASE WHEN abs(n_gt - n_lt) * 1000 < 147 * CAST(n_a AS DECIMAL(38,0)) * n_b THEN 'negligible'
          |     WHEN abs(n_gt - n_lt) * 1000 < 330 * CAST(n_a AS DECIMAL(38,0)) * n_b THEN 'small'
          |     WHEN abs(n_gt - n_lt) * 1000 < 474 * CAST(n_a AS DECIMAL(38,0)) * n_b THEN 'medium'
          |     ELSE 'large' END""".stripMargin).as("magnitude"))
  }

  /** Durbin-Watson statistic on the mean-centered daily event-count
    * series — the lag-1 serial-correlation gate (DW ≈ 2(1−ρ̂)) that a
    * regression/forecast residual check reads BEFORE trusting q_ols2 /
    * q_holt standard errors. Replays q_acf's exact construction:
    * x = nd·n − s is the N-scaled centered count (exact BIGINT), the
    * numerator folds Σ(xₜ−xₜ₋₁)² over CALENDAR-adjacent day pairs and
    * the denominator Σxₜ² over all days — both DECIMAL(38)/HUGEINT
    * folds of exact integers — and DW/ρ̂ are deterministic double
    * formulas with no round(). Calendar gaps contribute no adjacent
    * pair (the same contract as q_acf's lag join). */
  val durbinWatson: GraftOp = GraftOp(
    "q_durbin_watson",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s,
      |              min(day) AS mind FROM d),
      |c AS (
      |  SELECT CAST(date_diff('day', st.mind, d.day) AS BIGINT) AS i,
      |    st.nd * d.n - st.s AS x
      |  FROM d, st),
      |num AS (
      |  SELECT CAST(sum(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x)) AS HUGEINT) AS num,
      |    CAST(count(*) AS BIGINT) AS n_adj
      |  FROM c a JOIN c b ON a.i = b.i + 1),
      |den AS (SELECT CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS den FROM c)
      |SELECT st.nd AS n_days, num.n_adj AS n_adjacent,
      |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS dw,
      |  1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0 AS rho_hat
      |FROM num, den, st""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val st = broadcast(daily.agg(count(lit(1)).as("nd"), sum(col("n")).as("s"),
      min(col("day")).as("mind")))
    val c = daily.crossJoin(st)
      .select(datediff(col("day"), col("mind")).cast(LongType).as("i"),
        (col("nd") * col("n") - col("s")).as("x"))
    val num = broadcast(c.as("a")
      .join(c.as("b"), col("a.i") === col("b.i") + 1)
      .agg(sum((col("a.x") - col("b.x")).cast(DecimalType(38, 0))
        * (col("a.x") - col("b.x"))).as("num"),
        count(lit(1)).as("n_adj")))
    val den = broadcast(c.agg(sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("den")))
    num.crossJoin(den).crossJoin(st)
      .select(col("nd").as("n_days"), col("n_adj").as("n_adjacent"),
        expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)").as("dw"),
        expr("1.0D - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0D").as("rho_hat"))
  }

  /** Bartlett's test of variance homogeneity of line quantity across
    * the 3 return flags — the parametric (normal-theory) sibling of
    * q_levene (Bartlett is more powerful when normality holds, fragile
    * when it doesn't; shipping both is the standard pairing). Each
    * group's variance numerator vᵢ = nᵢ·ssᵢ − sᵢ² is an exact
    * DECIMAL(38)/HUGEINT; the three groups are PIVOTED onto one row
    * over the fixed {A,N,R} domain so the pooled-variance fold and the
    * Σ(nᵢ−1)·ln sᵢ² fold run in the written expression order. Each ln
    * is 6dp-snapped (the libm rescue); M, the correction C and χ² are
    * then deterministic double formulas. Flags against χ²₂ at 0.05. */
  val bartlett: GraftOp = GraftOp(
    "q_bartlett",
    """WITH g AS (
      |  SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_i,
      |    CAST(sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS ss_i
      |  FROM lineitem GROUP BY 1),
      |v AS (
      |  SELECT flag, n_i,
      |    CAST(n_i AS HUGEINT) * ss_i - CAST(s_i AS HUGEINT) * s_i AS v_i
      |  FROM g),
      |w AS (
      |  SELECT
      |    max(CASE WHEN flag = 'A' THEN n_i END) AS na,
      |    max(CASE WHEN flag = 'N' THEN n_i END) AS nn,
      |    max(CASE WHEN flag = 'R' THEN n_i END) AS nr,
      |    max(CASE WHEN flag = 'A' THEN v_i END) AS va,
      |    max(CASE WHEN flag = 'N' THEN v_i END) AS vn,
      |    max(CASE WHEN flag = 'R' THEN v_i END) AS vr
      |  FROM v),
      |f AS (
      |  SELECT na + nn + nr AS nt, na, nn, nr,
      |    round(ln(CAST(va AS DOUBLE) / (CAST(na AS DOUBLE) * (na - 1.0))), 6) AS lna,
      |    round(ln(CAST(vn AS DOUBLE) / (CAST(nn AS DOUBLE) * (nn - 1.0))), 6) AS lnn,
      |    round(ln(CAST(vr AS DOUBLE) / (CAST(nr AS DOUBLE) * (nr - 1.0))), 6) AS lnr,
      |    round(ln((CAST(va AS DOUBLE) / na + CAST(vn AS DOUBLE) / nn
      |            + CAST(vr AS DOUBLE) / nr)
      |           / (CAST(na AS DOUBLE) + nn + nr - 3.0)), 6) AS lnp
      |  FROM w),
      |m AS (
      |  SELECT nt,
      |    ((CAST(nt AS DOUBLE) - 3.0) * lnp
      |      - ((na - 1.0) * lna + (nn - 1.0) * lnn + (nr - 1.0) * lnr))
      |    / (1.0 + (1.0 / (na - 1.0) + 1.0 / (nn - 1.0) + 1.0 / (nr - 1.0)
      |              - 1.0 / (CAST(nt AS DOUBLE) - 3.0)) / 6.0) AS chi2
      |  FROM f)
      |SELECT nt AS n, 3 AS k, chi2 AS chi2_bartlett,
      |  CASE WHEN chi2 > 5.991 THEN 1 ELSE 0 END AS reject_equal_variance
      |FROM m""".stripMargin) { (s, d) =>
    val g = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n_i"),
        sum(col("l_quantity").cast(LongType)).as("s_i"),
        sum(col("l_quantity").cast(DecimalType(38, 0))
          * col("l_quantity").cast(LongType)).as("ss_i"))
    val v = g.select(col("flag"), col("n_i"),
      expr("CAST(n_i AS DECIMAL(38,0)) * ss_i - CAST(s_i AS DECIMAL(38,0)) * s_i").as("v_i"))
    val w = v.agg(
      max(when(col("flag") === "A", col("n_i"))).as("na"),
      max(when(col("flag") === "N", col("n_i"))).as("nn"),
      max(when(col("flag") === "R", col("n_i"))).as("nr"),
      max(when(col("flag") === "A", col("v_i"))).as("va"),
      max(when(col("flag") === "N", col("v_i"))).as("vn"),
      max(when(col("flag") === "R", col("v_i"))).as("vr"))
    w.withColumn("nt", col("na") + col("nn") + col("nr"))
      .withColumn("lna",
        expr("round(ln(CAST(va AS DOUBLE) / (CAST(na AS DOUBLE) * (na - 1.0D))), 6)"))
      .withColumn("lnn",
        expr("round(ln(CAST(vn AS DOUBLE) / (CAST(nn AS DOUBLE) * (nn - 1.0D))), 6)"))
      .withColumn("lnr",
        expr("round(ln(CAST(vr AS DOUBLE) / (CAST(nr AS DOUBLE) * (nr - 1.0D))), 6)"))
      .withColumn("lnp",
        expr("""round(ln((CAST(va AS DOUBLE) / na + CAST(vn AS DOUBLE) / nn
          |        + CAST(vr AS DOUBLE) / nr)
          |       / (CAST(na AS DOUBLE) + nn + nr - 3.0D)), 6)""".stripMargin))
      .withColumn("chi2",
        expr("""((CAST(nt AS DOUBLE) - 3.0D) * lnp
          |  - ((na - 1.0D) * lna + (nn - 1.0D) * lnn + (nr - 1.0D) * lnr))
          |/ (1.0D + (1.0D / (na - 1.0D) + 1.0D / (nn - 1.0D) + 1.0D / (nr - 1.0D)
          |          - 1.0D / (CAST(nt AS DOUBLE) - 3.0D)) / 6.0D)""".stripMargin))
      .select(col("nt").as("n"), lit(3).as("k"), col("chi2").as("chi2_bartlett"),
        expr("CASE WHEN chi2 > 5.991D THEN 1 ELSE 0 END").as("reject_equal_variance"))
  }

  /** Grubbs' max-studentized-deviation screen on per-customer total
    * spend — "is the single most extreme customer statistically
    * surprising", the formal version of the whale question q_outliers
    * answers per-row (Grubbs tests THE extreme; z-scores rank all).
    * One aggregate over the per-customer cents frame yields six exact
    * integers (n, Σ, Σx², max, min — the squared fold in HUGEINT);
    * G_max and G_min are deterministic double formulas (casts,
    * mul/div, one sqrt — no round, no libm). The >4.0 flag is the
    * conventional large-n conservative cut, emitted as a literal
    * comparison. */
  val grubbs: GraftOp = GraftOp(
    "q_grubbs",
    """WITH u AS (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
      |    CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss,
      |    CAST(max(cents) AS BIGINT) AS mx, CAST(min(cents) AS BIGINT) AS mn
      |  FROM u),
      |f AS (
      |  SELECT n, mx, mn,
      |    CAST(s AS DOUBLE) / n AS mean,
      |    sqrt(CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * (n - 1.0))) AS sd
      |  FROM t)
      |SELECT n,
      |  CAST(mx AS DOUBLE) / 100.0 AS max_value,
      |  CAST(mn AS DOUBLE) / 100.0 AS min_value,
      |  (CAST(mx AS DOUBLE) - mean) / sd AS g_max,
      |  (mean - CAST(mn AS DOUBLE)) / sd AS g_min,
      |  CASE WHEN (CAST(mx AS DOUBLE) - mean) / sd > 4.0 THEN 1 ELSE 0 END AS max_is_extreme
      |FROM f""".stripMargin) { (s, d) =>
    val u = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    u.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("cents")).as("ss"),
        max(col("cents")).as("mx"), min(col("cents")).as("mn"))
      .withColumn("mean", expr("CAST(s AS DOUBLE) / n"))
      .withColumn("sd",
        expr("""sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
          |  / (CAST(n AS DOUBLE) * (n - 1.0D)))""".stripMargin))
      .select(col("n"),
        expr("CAST(mx AS DOUBLE) / 100.0D").as("max_value"),
        expr("CAST(mn AS DOUBLE) / 100.0D").as("min_value"),
        expr("(CAST(mx AS DOUBLE) - mean) / sd").as("g_max"),
        expr("(mean - CAST(mn AS DOUBLE)) / sd").as("g_min"),
        expr("CASE WHEN (CAST(mx AS DOUBLE) - mean) / sd > 4.0D THEN 1 ELSE 0 END")
          .as("max_is_extreme"))
  }

  /** Friedman rank test over the weekday × event-type activity matrix
    * — "do the event types keep the same popularity ORDER across
    * weekdays", the randomized-block design q_chi_square's
    * independence view doesn't ask (blocks remove the weekday volume
    * effect; only within-day orderings count). Blocks are the 7
    * engine-neutral dow indices (datediff % 7, the q_seasonality
    * idiom), treatments the 5 event types; within-block DOUBLED
    * midranks come from a 5×5 self-join on the 35-cell contingency
    * (2·#less + #tied + 1 — exact integers, tie-stable), and
    * χ²_F = 3·ΣR2ⱼ²/(bk(k+1)) − 3b(k+1) on the doubled scale is one
    * deterministic double formula. Flags against χ²₄ at 0.05. */
  val friedman: GraftOp = GraftOp(
    "q_friedman",
    """WITH b AS (
      |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
      |    event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT a.dow, a.event_type,
      |    CAST(2 * count(*) FILTER (WHERE c.n < a.n)
      |       + count(*) FILTER (WHERE c.n = a.n) + 1 AS BIGINT) AS r2
      |  FROM b a JOIN b c ON a.dow = c.dow
      |  GROUP BY 1, 2),
      |rj AS (
      |  SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_j,
      |    CAST(count(*) AS BIGINT) AS nb
      |  FROM r GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(CAST(r2_j AS HUGEINT) * r2_j) AS BIGINT) AS sr2,
      |    max(nb) AS nb, CAST(count(*) AS BIGINT) AS k
      |  FROM rj),
      |f AS (
      |  SELECT 3.0 * CAST(sr2 AS DOUBLE)
      |      / (CAST(nb AS DOUBLE) * k * (k + 1.0))
      |    - 3.0 * CAST(nb AS DOUBLE) * (k + 1.0) AS chi2, nb, k
      |  FROM t)
      |SELECT rj.event_type, rj.r2_j,
      |  CAST(rj.r2_j AS DOUBLE) / (2.0 * f.nb) AS mean_rank,
      |  f.chi2 AS chi2_friedman,
      |  CASE WHEN f.chi2 > 9.488 THEN 1 ELSE 0 END AS reject_same_ordering
      |FROM rj, f ORDER BY rj.event_type""".stripMargin) { (s, d) =>
    val b = Tables.events(s, d)
      .select((datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)) % 7).as("dow"),
        col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val r = b.as("a").join(b.as("c"), col("a.dow") === col("c.dow"))
      .groupBy(col("a.dow").as("dow"), col("a.event_type").as("event_type"))
      .agg((count(when(col("c.n") < col("a.n"), 1)) * 2
        + count(when(col("c.n") === col("a.n"), 1)) + 1).as("r2"))
    val rj = r.groupBy(col("event_type"))
      .agg(sum(col("r2")).as("r2_j"), count(lit(1)).as("nb"))
    val t = broadcast(rj.agg(
      sum(col("r2_j").cast(DecimalType(38, 0)) * col("r2_j")).cast(LongType).as("sr2"),
      max(col("nb")).as("nb"), count(lit(1)).as("k")))
    val f = t.select(
      expr("""3.0D * CAST(sr2 AS DOUBLE)
        |    / (CAST(nb AS DOUBLE) * k * (k + 1.0D))
        |  - 3.0D * CAST(nb AS DOUBLE) * (k + 1.0D)""".stripMargin).as("chi2"),
      col("nb"), col("k"))
    rj.select(col("event_type"), col("r2_j")).crossJoin(broadcast(f))
      .select(col("event_type"), col("r2_j"),
        expr("CAST(r2_j AS DOUBLE) / (2.0D * nb)").as("mean_rank"),
        col("chi2").as("chi2_friedman"),
        expr("CASE WHEN chi2 > 9.488D THEN 1 ELSE 0 END").as("reject_same_ordering"))
      .orderBy(col("event_type"))
  }

  /** Pettitt changepoint test on the daily event-count series — the
    * SIGNIFICANCE companion to q_changepoint's binary-segmentation
    * locator (that op answers "where is the split"; this one answers
    * "is there a shift at all", rank-based so a heavy-tailed day can't
    * fake one). Uses the exact midrank identity
    * Uₜ = 2Σᵢ≤ₜRᵢ − t(T+1): doubled midranks of daily counts come from
    * the value contingency (the q_dunn kernel), their running sum is a
    * |days|-bounded window, and every Uₜ is an EXACT INTEGER —
    * K = max|Uₜ| and the argmax day (earliest on ties) are integer
    * decisions. Only the p-approximation 2·exp(−6K²/(T³+T²)) touches
    * libm and is 6dp-snapped. */
  val pettitt: GraftOp = GraftOp(
    "q_pettitt",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |v AS (SELECT n AS val, CAST(count(*) AS BIGINT) AS cv FROM d GROUP BY 1),
      |s AS (
      |  SELECT val, cv,
      |    CAST(1 + coalesce(sum(cv) OVER (ORDER BY val
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM v),
      |r AS (
      |  SELECT d.day, CAST(2 * s.start + s.cv - 1 AS BIGINT) AS r2
      |  FROM d JOIN s ON d.n = s.val),
      |w AS (
      |  SELECT day,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    CAST(sum(r2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS a,
      |    CAST(count(*) OVER () AS BIGINT) AS tt
      |  FROM r),
      |u AS (SELECT day, a - t * (tt + 1) AS u_t, tt FROM w WHERE t < tt),
      |k AS (SELECT max(abs(u_t)) AS k_stat, max(tt) AS tt FROM u)
      |SELECT min(u.day) AS change_day, k.k_stat, k.tt AS n_days,
      |  min(u.u_t) AS u_at_change,
      |  round(2.0 * exp(-6.0 * CAST(k.k_stat AS DOUBLE) * k.k_stat
      |    / (CAST(k.tt AS DOUBLE) * k.tt * k.tt + CAST(k.tt AS DOUBLE) * k.tt)), 6)
      |    AS p_approx
      |FROM u, k WHERE abs(u.u_t) = k.k_stat
      |GROUP BY k.k_stat, k.tt""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val v = daily.groupBy(col("n").as("val")).agg(count(lit(1)).as("cv"))
    val st = v.withColumn("start",
      lit(1L) + coalesce(sum(col("cv")).over(
        Window.orderBy(col("val")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val r = daily.join(st, col("n") === col("val"))
      .select(col("day"), (lit(2) * col("start") + col("cv") - 1).as("r2"))
    val w = r
      .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast(LongType))
      .withColumn("a", sum(col("r2")).over(
        Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tt", count(lit(1)).over(Window.partitionBy()))
    val u = w.filter(col("t") < col("tt"))
      .select(col("day"), (col("a") - col("t") * (col("tt") + 1)).as("u_t"), col("tt"))
    val k = broadcast(u.agg(max(abs(col("u_t"))).as("k_stat"), max(col("tt")).as("tt")))
    u.select(col("day"), col("u_t")).crossJoin(k)
      .filter(abs(col("u_t")) === col("k_stat"))
      .groupBy(col("k_stat"), col("tt"))
      .agg(min(col("day")).as("change_day"), min(col("u_t")).as("u_at_change"))
      .select(col("change_day"), col("k_stat"), col("tt").as("n_days"),
        col("u_at_change"),
        expr("""round(2.0D * exp(-6.0D * CAST(k_stat AS DOUBLE) * k_stat
          |  / (CAST(tt AS DOUBLE) * tt * tt + CAST(tt AS DOUBLE) * tt)), 6)""".stripMargin)
          .as("p_approx"))
  }

  /** One-sweep Tukey median polish of the weekday × event-type count
    * matrix — the ROBUST two-way decomposition (medians, not means, so
    * one anomalous cell can't leak into every effect the way it does
    * in an ANOVA-style mean decomposition; the residual matrix is the
    * "which cell is genuinely odd" readout q_hour_heatmap eyeballs).
    * Both matrix axes are odd-sized (7 weekdays, 5 types), so every
    * median is an EXACT CELL VALUE — the 3rd/4th order statistic by
    * (value, label) rank — and the whole decomposition stays in exact
    * integers: residual = n − row_med − col_med with col medians taken
    * over the row-polished residuals, one sweep, stated identically in
    * both engines. */
  val medianPolish: GraftOp = GraftOp(
    "q_median_polish",
    """WITH b AS (
      |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
      |    event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |rm AS (
      |  SELECT dow, max(CASE WHEN rn = 3 THEN n END) AS row_med
      |  FROM (SELECT dow, n,
      |          row_number() OVER (PARTITION BY dow ORDER BY n, event_type) AS rn
      |        FROM b) t
      |  GROUP BY 1),
      |r1 AS (
      |  SELECT b.dow, b.event_type, b.n, rm.row_med, b.n - rm.row_med AS res1
      |  FROM b JOIN rm ON b.dow = rm.dow),
      |cm AS (
      |  SELECT event_type, max(CASE WHEN rn = 4 THEN res1 END) AS col_med
      |  FROM (SELECT event_type, res1,
      |          row_number() OVER (PARTITION BY event_type ORDER BY res1, dow) AS rn
      |        FROM r1) t
      |  GROUP BY 1)
      |SELECT r1.dow, r1.event_type, r1.n, r1.row_med, cm.col_med,
      |  r1.res1 - cm.col_med AS residual
      |FROM r1 JOIN cm ON r1.event_type = cm.event_type
      |ORDER BY r1.dow, r1.event_type""".stripMargin) { (s, d) =>
    val b = Tables.events(s, d)
      .select((datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)) % 7).as("dow"),
        col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rm = b
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dow")).orderBy(col("n"), col("event_type"))))
      .groupBy(col("dow")).agg(max(when(col("rn") === 3, col("n"))).as("row_med"))
    val r1 = b.join(rm, Seq("dow"))
      .withColumn("res1", col("n") - col("row_med"))
    val cm = r1
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("res1"), col("dow"))))
      .groupBy(col("event_type")).agg(max(when(col("rn") === 4, col("res1"))).as("col_med"))
    r1.join(cm, Seq("event_type"))
      .select(col("dow"), col("event_type"), col("n"), col("row_med"), col("col_med"),
        (col("res1") - col("col_med")).as("residual"))
      .orderBy(col("dow"), col("event_type"))
  }

  /** Rescaled-range (R/S) Hurst profile of the daily event-count
    * series — long-memory vs mean-reversion, the persistence question
    * q_acf's short lags can't settle (H≈0.5 random walk increments,
    * H→1 trending, H→0.5⁻ mean-reverting). Per window size
    * w ∈ {5,10,15} the 30-day series splits into complete blocks; each
    * block's range and sd run on the w-SCALED centered integers
    * yₜ = w·xₜ − Σblock (exact: R_scaled = max−min of the cumulative
    * sums, S² from Σy²), so R/S = R_scaled/√(Σy²/w) is one
    * deterministic double per block, its ln micro-snapped (libm
    * rescue) and folded exactly. The Hurst slope is the 3-point OLS on
    * ln w with the closed-form weights PRECOMPUTED as double
    * constants, parenthesized to pin the fold order; the oracle spells
    * them as STRING→DOUBLE casts because DuckDB's DECIMAL→DOUBLE cast
    * is not correctly rounded (−0.9675751528184137 lands 1 ulp off via
    * the decimal path, exactly via the string path — r9 finding, see
    * SURVEY §6). Constant blocks (Σy² = 0) carry no R/S and are
    * excluded identically. */
  val hurstRs: GraftOp = GraftOp(
    "q_hurst_rs",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS nd, min(day) AS mind FROM d),
      |c AS (
      |  SELECT CAST(date_diff('day', st.mind, d.day) AS BIGINT) AS i, d.n
      |  FROM d, st),
      |e AS (
      |  SELECT w.w, c.i // w.w AS b, c.i, c.n
      |  FROM c, (VALUES (5), (10), (15)) w(w), st
      |  WHERE c.i < w.w * (st.nd // w.w)),
      |blk AS (
      |  SELECT w, b, i, n,
      |    CAST(sum(n) OVER (PARTITION BY w, b) AS BIGINT) AS s_blk
      |  FROM e),
      |y AS (
      |  SELECT w, b, i, w * n - s_blk AS y,
      |    CAST(sum(w * n - s_blk) OVER (PARTITION BY w, b ORDER BY i
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy
      |  FROM blk),
      |g AS (
      |  SELECT w, b,
      |    CAST(max(cy) - min(cy) AS BIGINT) AS r_scaled,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS sy2
      |  FROM y GROUP BY 1, 2),
      |t AS (
      |  SELECT w,
      |    CAST(count(*) AS BIGINT) AS n_blocks,
      |    CAST(sum(CAST(round(ln(CAST(r_scaled AS DOUBLE)
      |      / sqrt(CAST(sy2 AS DOUBLE) / w)) * 1000000) AS BIGINT)) AS BIGINT) AS s_ln
      |  FROM g WHERE sy2 > 0 AND r_scaled > 0 GROUP BY 1),
      |p AS (
      |  SELECT
      |    max(CASE WHEN w = 5 THEN CAST(s_ln AS DOUBLE)
      |        / (CAST(n_blocks AS DOUBLE) * 1000000.0) END) AS y5,
      |    max(CASE WHEN w = 10 THEN CAST(s_ln AS DOUBLE)
      |        / (CAST(n_blocks AS DOUBLE) * 1000000.0) END) AS y10,
      |    max(CASE WHEN w = 15 THEN CAST(s_ln AS DOUBLE)
      |        / (CAST(n_blocks AS DOUBLE) * 1000000.0) END) AS y15,
      |    max(CASE WHEN w = 5 THEN n_blocks END) AS b5,
      |    max(CASE WHEN w = 10 THEN n_blocks END) AS b10,
      |    max(CASE WHEN w = 15 THEN n_blocks END) AS b15
      |  FROM t)
      |SELECT b5 AS blocks_w5, b10 AS blocks_w10, b15 AS blocks_w15,
      |  y5 AS mean_ln_rs_w5, y10 AS mean_ln_rs_w10, y15 AS mean_ln_rs_w15,
      |  ((CAST('-0.9675751528184137' AS DOUBLE) * y5)
      |    + (CAST('0.15535233941616758' AS DOUBLE) * y10))
      |    + (CAST('0.8122228134022442' AS DOUBLE) * y15) AS hurst_slope
      |FROM p""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val st = broadcast(daily.agg(count(lit(1)).as("nd"), min(col("day")).as("mind")))
    val c = daily.crossJoin(st)
      .select(datediff(col("day"), col("mind")).cast(LongType).as("i"), col("n"), col("nd"))
    val e = c.select(col("i"), col("n"), col("nd"),
        explode(array(lit(5L), lit(10L), lit(15L))).as("w"))
      .filter(col("i") < col("w") * expr("nd div w"))
      .select(col("w"), expr("i div w").as("b"), col("i"), col("n"))
    val blk = e.withColumn("s_blk",
      sum(col("n")).over(Window.partitionBy(col("w"), col("b"))))
    val y = blk
      .withColumn("y", col("w") * col("n") - col("s_blk"))
      .withColumn("cy", sum(col("w") * col("n") - col("s_blk")).over(
        Window.partitionBy(col("w"), col("b")).orderBy(col("i"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val g = y.groupBy(col("w"), col("b"))
      .agg((max(col("cy")) - min(col("cy"))).as("r_scaled"),
        sum(col("y").cast(DecimalType(38, 0)) * col("y")).cast(LongType).as("sy2"))
    val t = g.filter(col("sy2") > 0 && col("r_scaled") > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("""CAST(round(ln(CAST(r_scaled AS DOUBLE)
          |  / sqrt(CAST(sy2 AS DOUBLE) / w)) * 1000000) AS BIGINT)""".stripMargin))
          .as("s_ln"))
    val p = t.agg(
      max(when(col("w") === 5,
        expr("CAST(s_ln AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * 1000000.0D)"))).as("y5"),
      max(when(col("w") === 10,
        expr("CAST(s_ln AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * 1000000.0D)"))).as("y10"),
      max(when(col("w") === 15,
        expr("CAST(s_ln AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * 1000000.0D)"))).as("y15"),
      max(when(col("w") === 5, col("n_blocks"))).as("b5"),
      max(when(col("w") === 10, col("n_blocks"))).as("b10"),
      max(when(col("w") === 15, col("n_blocks"))).as("b15"))
    p.select(col("b5").as("blocks_w5"), col("b10").as("blocks_w10"),
      col("b15").as("blocks_w15"),
      col("y5").as("mean_ln_rs_w5"), col("y10").as("mean_ln_rs_w10"),
      col("y15").as("mean_ln_rs_w15"),
      expr("""((-0.9675751528184137D * y5) + (0.15535233941616758D * y10))
        |  + (0.8122228134022442D * y15)""".stripMargin).as("hurst_slope"))
  }

  /** Two-sample Anderson-Darling statistic (ties-collapsed discrete
    * variant) on purchase value between the hash variants — the
    * TAIL-WEIGHTED member of the CDF-gap family (q_ks_test reads the
    * single worst gap, q_cvm the integrated gap, AD re-weights by
    * 1/(F(1−F)) so tail drift — where revenue risk lives — dominates).
    * Per distinct cents the gap numerator N·cumA − n_a·cum is
    * assembled (and then squared) entirely in DECIMAL(38,0)/HUGEINT —
    * the gap scales ~n² and its square ~n⁴, so any BIGINT stage wraps
    * silently on Spark past ~10⁵-10⁶ purchases; each value's term
    * cv·gap²·10⁶ ÷ (cum·(N−cum)) is
    * floor-snapped by exact integral division with the square folded
    * in DECIMAL(38)/HUGEINT, the last value (cum = N) excluded
    * identically by both engines; A² is one double divide. Stated as
    * the multiplicity-weighted discrete analogue (each distinct value
    * contributes with weight cv) — the convention both engines
    * replay. */
  val adTest: GraftOp = GraftOp(
    "q_ad_test",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT cents,
       |    CAST(count(*) AS BIGINT) AS cv,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS ca
       |  FROM p GROUP BY 1),
       |w AS (
       |  SELECT cents, cv,
       |    CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
       |    CAST(sum(cv) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(ca) OVER () AS BIGINT) AS n_a,
       |    CAST(sum(cv) OVER () AS BIGINT) AS n
       |  FROM c),
       |f AS (
       |  SELECT n_a, n - n_a AS n_b, n,
       |    CAST(sum(CAST(cv AS HUGEINT)
       |      * ((CAST(n AS HUGEINT) * cum_a - CAST(n_a AS HUGEINT) * cum)
       |         * (CAST(n AS HUGEINT) * cum_a - CAST(n_a AS HUGEINT) * cum)) * 1000000
       |      // (CAST(cum AS HUGEINT) * (n - cum))) AS HUGEINT) AS s
       |  FROM w WHERE cum < n GROUP BY 1, 2, 3)
       |SELECT n_a, n_b,
       |  CAST(s AS DOUBLE)
       |    / (CAST(n_a AS DOUBLE) * n_b * CAST(n AS DOUBLE) * 1000000.0) AS a2
       |FROM f""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = p.groupBy(col("cents"))
      .agg(count(lit(1)).as("cv"), count(when(col("variant") === "A", 1)).as("ca"))
    val byVal = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = c
      .withColumn("cum_a", sum(col("ca")).over(byVal))
      .withColumn("cum", sum(col("cv")).over(byVal))
      .withColumn("n_a", sum(col("ca")).over(Window.partitionBy()))
      .withColumn("n", sum(col("cv")).over(Window.partitionBy()))
    w.filter(col("cum") < col("n"))
      .withColumn("term",
        expr("""CAST(cv AS DECIMAL(38,0))
          |  * ((CAST(n AS DECIMAL(38,0)) * cum_a - CAST(n_a AS DECIMAL(38,0)) * cum)
          |     * (CAST(n AS DECIMAL(38,0)) * cum_a - CAST(n_a AS DECIMAL(38,0)) * cum)) * 1000000
          |  div (CAST(cum AS DECIMAL(38,0)) * (n - cum))""".stripMargin))
      .groupBy(col("n_a"), (col("n") - col("n_a")).as("n_b"), col("n"))
      .agg(sum(col("term")).as("s"))
      .select(col("n_a"), col("n_b"),
        expr("""CAST(s AS DOUBLE)
          |  / (CAST(n_a AS DOUBLE) * n_b * CAST(n AS DOUBLE) * 1000000.0D)""".stripMargin)
          .as("a2"))
  }

  /** Cochran's Q over the user × event-type participation matrix —
    * "do the five features have the same adoption rate among the SAME
    * users", the k-treatment extension of q_mcnemar and the binary
    * twin of q_friedman (within-user blocking removes heavy-user
    * volume). Participation is scoped to the LAUNCH WINDOW (first two
    * calendar days): over a whole month every user touches every type
    * and the discordance denominator Σ Rᵢ(k−Rᵢ) degenerates to zero —
    * the window is where adoption actually varies, and the honest
    * early-rollout question. The whole statistic is a closed form over
    * FOUR exact integer sums: column totals C_j (users touching type
    * j), row sums R_i (types touched by user i), ΣR and ΣR² — so
    * Q = (k−1)(k·ΣC_j² − (ΣC_j)²)/(k·ΣR − ΣR²) is exact integers into
    * one double divide, no snapping anywhere. Flags against χ²₄ at
    * 0.05. */
  val cochranQ: GraftOp = GraftOp(
    "q_cochran_q",
    """WITH m AS (
      |  SELECT user_id, event_type FROM events
      |  WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) < 2
      |  GROUP BY 1, 2),
      |r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS r_i FROM m GROUP BY 1),
      |rt AS (
      |  SELECT CAST(sum(r_i) AS BIGINT) AS sr,
      |    CAST(sum(CAST(r_i AS HUGEINT) * r_i) AS HUGEINT) AS sr2,
      |    CAST(count(*) AS BIGINT) AS n_users
      |  FROM r),
      |ct AS (
      |  SELECT CAST(sum(CAST(c_j AS HUGEINT) * c_j) AS HUGEINT) AS sc2,
      |    CAST(sum(c_j) AS BIGINT) AS sc, CAST(count(*) AS BIGINT) AS k
      |  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS c_j FROM m GROUP BY 1))
      |SELECT rt.n_users, ct.k,
      |  (CAST(ct.k AS DOUBLE) - 1.0)
      |    * CAST(CAST(ct.k AS HUGEINT) * ct.sc2 - CAST(ct.sc AS HUGEINT) * ct.sc AS DOUBLE)
      |    / CAST(CAST(ct.k AS HUGEINT) * rt.sr - rt.sr2 AS DOUBLE) AS q_cochran,
      |  CASE WHEN (CAST(ct.k AS DOUBLE) - 1.0)
      |    * CAST(CAST(ct.k AS HUGEINT) * ct.sc2 - CAST(ct.sc AS HUGEINT) * ct.sc AS DOUBLE)
      |    / CAST(CAST(ct.k AS HUGEINT) * rt.sr - rt.sr2 AS DOUBLE) > 9.488
      |    THEN 1 ELSE 0 END AS reject_equal_rates
      |FROM rt, ct""".stripMargin) { (s, d) =>
    val m = Tables.events(s, d)
      .filter(datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)) < 2)
      .select(col("user_id"), col("event_type")).distinct()
    val r = m.groupBy(col("user_id")).agg(count(lit(1)).as("r_i"))
    val rt = broadcast(r.agg(sum(col("r_i")).as("sr"),
      sum(col("r_i").cast(DecimalType(38, 0)) * col("r_i")).as("sr2"),
      count(lit(1)).as("n_users")))
    val ct = broadcast(m.groupBy(col("event_type")).agg(count(lit(1)).as("c_j"))
      .agg(sum(col("c_j").cast(DecimalType(38, 0)) * col("c_j")).as("sc2"),
        sum(col("c_j")).as("sc"), count(lit(1)).as("k")))
    rt.crossJoin(ct)
      .withColumn("q",
        expr("""(CAST(k AS DOUBLE) - 1.0D)
          |  * CAST(CAST(k AS DECIMAL(38,0)) * sc2 - CAST(sc AS DECIMAL(38,0)) * sc AS DOUBLE)
          |  / CAST(CAST(k AS DECIMAL(38,0)) * sr - sr2 AS DOUBLE)""".stripMargin))
      .select(col("n_users"), col("k"), col("q").as("q_cochran"),
        expr("CASE WHEN q > 9.488D THEN 1 ELSE 0 END").as("reject_equal_rates"))
  }

  /** Seasonal and trend STRENGTH (Hyndman's feasts definitions:
    * F_s = max(0, 1 − Var(R)/Var(S+R)), F_t with T+R) on the
    * q_stl_decompose components — the single-number "how seasonal /
    * how trended is this series" that decides whether q_holt_winters'
    * seasonal term is worth its parameters. Components are the SAME
    * deterministic doubles q_stl_decompose builds (identical
    * expression text), micro-snapped per row so every variance input
    * folds as exact integers; each strength is then ONE double divide
    * of two exact variance numerators (n·Σx²−(Σx)², DECIMAL(38)) —
    * the n² denominators cancel in the ratio, so no division precedes
    * it. */
  val seasonalStrength: GraftOp = GraftOp(
    "q_seasonal_strength",
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
      |       FROM i GROUP BY 1),
      |u AS (
      |  SELECT
      |    CAST(round((CAST(i.cents AS DOUBLE) / 100.0
      |        - CAST(i.t7 AS DOUBLE) / 7.0 / 100.0
      |        - CAST(sw.snum AS DOUBLE) / (7.0 * sw.n_w) / 100.0) * 1000000) AS BIGINT) AS r_u,
      |    CAST(round((CAST(i.cents AS DOUBLE) / 100.0
      |        - CAST(i.t7 AS DOUBLE) / 7.0 / 100.0) * 1000000) AS BIGINT) AS sr_u,
      |    CAST(round((CAST(i.cents AS DOUBLE) / 100.0
      |        - CAST(sw.snum AS DOUBLE) / (7.0 * sw.n_w) / 100.0) * 1000000) AS BIGINT) AS tr_u
      |  FROM i JOIN sw ON i.dow = sw.dow),
      |f AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) * sum(CAST(r_u AS HUGEINT) * r_u)
      |      - CAST(sum(r_u) AS HUGEINT) * sum(r_u) AS HUGEINT) AS vr,
      |    CAST(count(*) * sum(CAST(sr_u AS HUGEINT) * sr_u)
      |      - CAST(sum(sr_u) AS HUGEINT) * sum(sr_u) AS HUGEINT) AS vsr,
      |    CAST(count(*) * sum(CAST(tr_u AS HUGEINT) * tr_u)
      |      - CAST(sum(tr_u) AS HUGEINT) * sum(tr_u) AS HUGEINT) AS vtr
      |  FROM u)
      |SELECT n,
      |  greatest(0.0, 1.0 - CAST(vr AS DOUBLE) / CAST(vsr AS DOUBLE)) AS strength_seasonal,
      |  greatest(0.0, 1.0 - CAST(vr AS DOUBLE) / CAST(vtr AS DOUBLE)) AS strength_trend
      |FROM f""".stripMargin) { (s, d) =>
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
    val u = i.join(broadcast(sw), "dow")
      .select(
        expr("""CAST(round((CAST(cents AS DOUBLE) / 100.0D
          |    - CAST(t7 AS DOUBLE) / 7.0D / 100.0D
          |    - CAST(snum AS DOUBLE) / (7.0D * n_w) / 100.0D) * 1000000) AS BIGINT)"""
          .stripMargin).as("r_u"),
        expr("""CAST(round((CAST(cents AS DOUBLE) / 100.0D
          |    - CAST(t7 AS DOUBLE) / 7.0D / 100.0D) * 1000000) AS BIGINT)""".stripMargin)
          .as("sr_u"),
        expr("""CAST(round((CAST(cents AS DOUBLE) / 100.0D
          |    - CAST(snum AS DOUBLE) / (7.0D * n_w) / 100.0D) * 1000000) AS BIGINT)"""
          .stripMargin).as("tr_u"))
    u.agg(count(lit(1)).as("n"),
        (count(lit(1)) * sum(col("r_u").cast(DecimalType(38, 0)) * col("r_u"))
          - sum(col("r_u")).cast(DecimalType(38, 0)) * sum(col("r_u"))).as("vr"),
        (count(lit(1)) * sum(col("sr_u").cast(DecimalType(38, 0)) * col("sr_u"))
          - sum(col("sr_u")).cast(DecimalType(38, 0)) * sum(col("sr_u"))).as("vsr"),
        (count(lit(1)) * sum(col("tr_u").cast(DecimalType(38, 0)) * col("tr_u"))
          - sum(col("tr_u")).cast(DecimalType(38, 0)) * sum(col("tr_u"))).as("vtr"))
      .select(col("n"),
        expr("greatest(0.0D, 1.0D - CAST(vr AS DOUBLE) / CAST(vsr AS DOUBLE))")
          .as("strength_seasonal"),
        expr("greatest(0.0D, 1.0D - CAST(vr AS DOUBLE) / CAST(vtr AS DOUBLE))")
          .as("strength_trend"))
  }

  val ops: Seq[GraftOp] = Seq(cliffsDelta, durbinWatson, bartlett, grubbs, friedman,
    pettitt, medianPolish, hurstRs, adTest, cochranQ, seasonalStrength)
}
