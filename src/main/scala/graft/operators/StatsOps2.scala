package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second statistics tier (round 8): distribution-shape testing
  * (Jarque-Bera), drawdown analysis, confounder-adjusted correlation,
  * and the Holm step-down companion to q_fdr_bh's step-up.
  *
  * Same oracle-parity contract as [[StatsOps]]: cross-row folds are
  * exact integers (cents, counts, basis points) — BIGINT where the
  * bound proves it fits, DECIMAL(38)/HUGEINT where cubes/quartics
  * overflow 2⁶³ — and only the final scalar formula runs in doubles,
  * with identical expression text on both engines.
  */
object StatsOps2 {

  /** Jarque-Bera normality screen per event type — the "is this metric
    * even Gaussian" gate an analyst runs before trusting z-based
    * monitors (q_anomaly_days, q_bollinger) on the raw values. Moment
    * folds over exact cents: n, Σc, Σc² fit BIGINT (c ≤ 5.7e4 ⇒
    * Σc² ≤ 3.3e14 at sf0.1 and grows linearly), Σc³/Σc⁴ exceed 2⁶³
    * (≈1.8e19 / 1e24) and fold in DECIMAL(38,0) — DuckDB HUGEINT.
    * Central moments, skewness g₁ = m₃/m₂^1.5 and kurtosis g₂ = m₄/m₂²
    * are one double formula each over those exact integers — but the
    * cancellation-heavy central-moment differences amplify 1-ulp pow()
    * divergence past 6dp, so JB = n/6·(g₁² + (g₂−3)²/4) consumes the
    * 6dp-SNAPPED g₁/g₂ (identical both engines by construction).
    * Map-side partial aggregation makes this one 5-row shuffle at any
    * scale. */
  val jarqueBera: GraftOp = GraftOp(
    "q_jarque_bera",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s1,
      |    CAST(sum(c * c) AS BIGINT) AS s2,
      |    sum(CAST(c AS HUGEINT) * c * c) AS s3,
      |    sum(CAST(c AS HUGEINT) * c * c * c) AS s4
      |  FROM c GROUP BY 1),
      |m AS (
      |  SELECT event_type, n,
      |    CAST(s1 AS DOUBLE) / n AS m1,
      |    CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
      |    CAST(s3 AS DOUBLE) / n
      |      - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |      + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3) AS m3,
      |    CAST(s4 AS DOUBLE) / n
      |      - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
      |      + 6.0 * pow(CAST(s1 AS DOUBLE) / n, 2) * (CAST(s2 AS DOUBLE) / n)
      |      - 3.0 * pow(CAST(s1 AS DOUBLE) / n, 4) AS m4
      |  FROM g),
      |k AS (
      |  SELECT event_type, n,
      |    m1 / 100.0 AS mean_value,
      |    round(m3 / pow(m2, 1.5), 6) AS skewness,
      |    round(m4 / (m2 * m2), 6) AS kurtosis
      |  FROM m)
      |SELECT event_type, n, mean_value, skewness, kurtosis,
      |  round(CAST(n AS DOUBLE) / 6.0 * (skewness * skewness
      |    + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0), 6) AS jb
      |FROM k ORDER BY event_type""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"),
        (graft.functions.Exprs.dec2(col("value")) * 100).cast(LongType).as("c"))
    val g = c.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"),
        sum(col("c").cast(DecimalType(38, 0)) * col("c") * col("c")).as("s3"),
        sum(col("c").cast(DecimalType(38, 0)) * col("c") * col("c") * col("c")).as("s4"))
    g.select(col("event_type"), col("n"),
        expr("CAST(s1 AS DOUBLE) / n").as("m1"),
        expr("CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)")
          .as("m2"),
        expr("""CAST(s3 AS DOUBLE) / n
          |  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
          |  + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3)""".stripMargin).as("m3"),
        expr("""CAST(s4 AS DOUBLE) / n
          |  - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
          |  + 6.0 * pow(CAST(s1 AS DOUBLE) / n, 2) * (CAST(s2 AS DOUBLE) / n)
          |  - 3.0 * pow(CAST(s1 AS DOUBLE) / n, 4)""".stripMargin).as("m4"))
      .select(col("event_type"), col("n"),
        expr("m1 / 100.0D").as("mean_value"), // r11: ratio of exact ints, raw IEEE
        expr("round(m3 / pow(m2, 1.5), 6)").as("skewness"),
        expr("round(m4 / (m2 * m2), 6)").as("kurtosis"))
      .select(col("event_type"), col("n"), col("mean_value"),
        col("skewness"), col("kurtosis"),
        expr("""round(CAST(n AS DOUBLE) / 6.0 * (skewness * skewness
          |  + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0), 6)""".stripMargin).as("jb"))
      .orderBy(col("event_type"))
  }

  /** Peak-to-trough drawdown of each event type's DAILY revenue level
    * — "how far below its best day did this metric fall, and when":
    * the standard health readout for a level series (DAU, daily GMV).
    * Running peak via max() OVER (ORDER BY day), gap = peak − today,
    * max drawdown = the largest gap, trough = the EARLIEST day
    * achieving it, peak day = the earliest day whose level equals the
    * peak in force at the trough. Everything is exact BIGINT cents;
    * the ppm depth is integral division; ties resolve by day order.
    * One date-bounded window per type + two tiny self-joins — the
    * frame is |days|-bounded at any corpus size. */
  val maxDrawdown: GraftOp = GraftOp(
    "q_max_drawdown",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type, day, cents,
      |    CAST(max(cents) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS peak
      |  FROM d),
      |g AS (SELECT *, peak - cents AS gap FROM p),
      |m AS (SELECT event_type, CAST(max(gap) AS BIGINT) AS dd FROM g GROUP BY 1),
      |t AS (
      |  SELECT g.event_type, m.dd, min(g.day) AS trough_day
      |  FROM g JOIN m ON g.event_type = m.event_type AND g.gap = m.dd
      |  GROUP BY 1, 2),
      |tr AS (
      |  SELECT t.event_type, t.dd, t.trough_day, g.peak AS peak_cents
      |  FROM t JOIN g ON g.event_type = t.event_type AND g.day = t.trough_day),
      |pk AS (
      |  SELECT tr.event_type, min(g.day) AS peak_day
      |  FROM tr JOIN g ON g.event_type = tr.event_type
      |    AND g.cents = tr.peak_cents AND g.day <= tr.trough_day
      |  GROUP BY 1)
      |SELECT tr.event_type, pk.peak_day, tr.trough_day,
      |  tr.peak_cents, tr.dd AS drawdown_cents,
      |  CAST(tr.dd * 1000000 // tr.peak_cents AS BIGINT) AS depth_ppm
      |FROM tr JOIN pk ON tr.event_type = pk.event_type
      |ORDER BY tr.event_type""".stripMargin) { (s, d) =>
    val day = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(graft.functions.Exprs.dec2(col("value"))) * 100)
        .cast(LongType).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val g = day
      .withColumn("peak", max(col("cents")).over(w))
      .withColumn("gap", col("peak") - col("cents"))
    val m = g.groupBy(col("event_type")).agg(max(col("gap")).as("dd"))
    val t = g.join(broadcast(m), Seq("event_type"))
      .filter(col("gap") === col("dd"))
      .groupBy(col("event_type"), col("dd")).agg(min(col("day")).as("trough_day"))
    val tr = broadcast(t).join(g, Seq("event_type"))
      .filter(col("day") === col("trough_day"))
      .select(col("event_type"), col("dd"), col("trough_day"),
        col("peak").as("peak_cents"))
    val pk = broadcast(tr).join(g, Seq("event_type"))
      .filter(col("cents") === col("peak_cents") && col("day") <= col("trough_day"))
      .groupBy(col("event_type")).agg(min(col("day")).as("peak_day"))
    tr.join(broadcast(pk), Seq("event_type"))
      .select(col("event_type"), col("peak_day"), col("trough_day"),
        col("peak_cents"), col("dd").as("drawdown_cents"),
        expr("CAST(dd * 1000000 div peak_cents AS BIGINT)").as("depth_ppm"))
      .orderBy(col("event_type"))
  }

  /** Partial correlation of quantity and revenue CONTROLLING for
    * discount — "does the qty↔price relationship survive once the
    * discount confounder is removed", the causal-sanity companion to
    * profile_correlation's raw Pearson matrix. All three pairwise
    * sums fold exact integers: quantity (integral doubles → BIGINT),
    * extendedprice cents, discount basis points (floor(d·100+0.5) —
    * exact for IEEE hundredths). Σy² is the one quartic-free overflow
    * (cents² ≈ 1e14/row) and folds DECIMAL(38)/HUGEINT. The three
    * Pearson r's are 6dp-SNAPPED before the partial-correlation
    * formula consumes them, so the final divide sees identical inputs
    * on both engines. One map-side-combined scan, a 1-row emit. */
  val partialCorr: GraftOp = GraftOp(
    "q_partial_corr",
    """WITH b AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
      |  FROM lineitem),
      |g AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(z AS HUGEINT)) AS HUGEINT) AS sz,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
      |    CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
      |  FROM b),
      |r AS (
      |  SELECT CAST(n AS BIGINT) AS n,
      |    CAST(n * sxy - sx * sy AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |           * CAST(n * syy - sy * sy AS DOUBLE)) AS r_xy,
      |    CAST(n * sxz - sx * sz AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |           * CAST(n * szz - sz * sz AS DOUBLE)) AS r_xz,
      |    CAST(n * syz - sy * sz AS DOUBLE)
      |      / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
      |           * CAST(n * szz - sz * sz AS DOUBLE)) AS r_yz
      |  FROM g)
      |SELECT n, r_xy, r_xz, r_yz,
      |  (r_xy - r_xz * r_yz)
      |    / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)) AS r_xy_given_z
      |FROM r""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d)
      .select(col("l_quantity").cast(LongType).as("x"),
        (graft.functions.Exprs.dec2(col("l_extendedprice")) * 100)
          .cast(LongType).as("y"),
        floor(col("l_discount") * 100 + 0.5).cast(LongType).as("z"))
    val dec = DecimalType(38, 0)
    val g = b.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum(col("z").cast(dec)).as("sz"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"),
      sum(col("z").cast(dec) * col("z")).as("szz"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(col("x").cast(dec) * col("z")).as("sxz"),
      sum(col("y").cast(dec) * col("z")).as("syz"))
    g.select(col("n").cast(LongType).as("n"),
        expr("""CAST(n * sxy - sx * sy AS DOUBLE)
          |  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          |       * CAST(n * syy - sy * sy AS DOUBLE))""".stripMargin)
          .as("r_xy"),
        expr("""CAST(n * sxz - sx * sz AS DOUBLE)
          |  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          |       * CAST(n * szz - sz * sz AS DOUBLE))""".stripMargin)
          .as("r_xz"),
        expr("""CAST(n * syz - sy * sz AS DOUBLE)
          |  / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
          |       * CAST(n * szz - sz * sz AS DOUBLE))""".stripMargin)
          .as("r_yz"))
      .select(col("n"), col("r_xy"), col("r_xz"), col("r_yz"),
        expr("""(r_xy - r_xz * r_yz)
          |  / sqrt((1.0D - r_xz * r_xz) * (1.0D - r_yz * r_yz))""".stripMargin)
          .as("r_xy_given_z"))
  }

  /** Holm-Bonferroni step-down over the SAME per-segment A/B p-value
    * family q_fdr_bh steps up — FWER control next to FDR control, the
    * stricter gate a launch decision uses. Shares StatsOps'
    * segPValueCtes / segPValueFrame verbatim, so the two procedures
    * cannot disagree about the p-values, only about the cutoffs.
    * Adjusted p = running max of min(1, (m−j+1)·p_j) in rank order;
    * rank k rejects iff EVERY j ≤ k clears α/(m−j+1) (the step-down
    * rule, computed as a window min over the per-rank indicator).
    * Both windows run over an m-row frame (m = segment count). */
  val holm: GraftOp = GraftOp(
    "q_holm",
    s"""WITH ${StatsOps.segPValueCtes},
       |r AS (
       |  SELECT segment, pv,
       |    row_number() OVER (ORDER BY pv, segment) AS rnk,
       |    count(*) OVER () AS m
       |  FROM p),
       |a AS (
       |  SELECT segment, pv, rnk, m,
       |    round(max(least(1.0, (m - rnk + 1) * pv))
       |      OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING), 6) AS holm_adj,
       |    min(CASE WHEN pv <= 0.05 / (m - rnk + 1) THEN 1 ELSE 0 END)
       |      OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING) AS all_clear
       |  FROM r)
       |SELECT segment, pv AS p, CAST(rnk AS BIGINT) AS rank, holm_adj,
       |  CAST(all_clear AS INT) AS significant
       |FROM a ORDER BY rank""".stripMargin) { (s, d) =>
    val p = StatsOps.segPValueFrame(s, d)
    val byRank = Window.orderBy(col("rank")).rowsBetween(Window.unboundedPreceding, 0)
    p.withColumn("rank", row_number().over(Window.orderBy(col("p"), col("segment"))).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("holm_adj",
        round(max(least(lit(1.0), (col("m") - col("rank") + 1) * col("p"))).over(byRank), 6))
      .withColumn("all_clear",
        min(when(col("p") <= lit(0.05) / (col("m") - col("rank") + 1), 1).otherwise(0))
          .over(byRank))
      .select(col("segment"), col("p"), col("rank"), col("holm_adj"),
        col("all_clear").cast(IntegerType).as("significant"))
      .orderBy(col("rank"))
  }

  /** Cochran-Armitage trend-in-proportions test — "does the purchase
    * share RISE across the week" (ordered exposure groups), the
    * dose-response reading q_chi_square's unordered independence test
    * throws away. Groups = day-of-week with its natural 0..6 score;
    * success = purchase event. The whole statistic reduces to four
    * exact BIGINT aggregates (N, R, Sn = Σsᵢnᵢ, Sr = Σsᵢrᵢ,
    * Snn = Σnᵢsᵢ² — all ≤ ~4e11 at sf0.1, linear beyond); the z
    * numerator N·Sr − R·Sn and both radicand factors are assembled
    * EXACTLY in DECIMAL(38)/HUGEINT (r10 — they scale ~N², past 2⁵³
    * at corpus scale) and z is raw deterministic IEEE;
    * the 7-group frame is domain-bounded at any corpus size. */
  val cochranArmitage: GraftOp = GraftOp(
    "q_cochran_armitage",
    """WITH e AS (
      |  SELECT CAST(date_part('dow', ts) AS BIGINT) AS s,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |g AS (
      |  SELECT s, CAST(count(*) AS BIGINT) AS n_i, CAST(sum(y) AS BIGINT) AS r_i
      |  FROM e GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(r_i) AS BIGINT) AS r,
      |    CAST(sum(s * n_i) AS BIGINT) AS sn, CAST(sum(s * r_i) AS BIGINT) AS sr,
      |    CAST(sum(s * s * n_i) AS BIGINT) AS snn
      |  FROM g)
      |SELECT n, r, sn, sr, snn,
      |  sqrt(CAST(n AS DOUBLE))
      |    * CAST(CAST(n AS HUGEINT) * sr - CAST(r AS HUGEINT) * sn AS DOUBLE)
      |    / sqrt(CAST(CAST(r AS HUGEINT) * (n - r) AS DOUBLE)
      |         * CAST(CAST(n AS HUGEINT) * snn - CAST(sn AS HUGEINT) * sn AS DOUBLE)) AS z
      |FROM t""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select((dayofweek(col("ts")) - 1).cast(LongType).as("s"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val g = e.groupBy(col("s")).agg(count(lit(1)).as("n_i"), sum(col("y")).as("r_i"))
    g.agg(sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
        sum(col("s") * col("n_i")).as("sn"), sum(col("s") * col("r_i")).as("sr"),
        sum(col("s") * col("s") * col("n_i")).as("snn"))
      .select(col("n"), col("r"), col("sn"), col("sr"), col("snn"),
        expr("""sqrt(CAST(n AS DOUBLE))
          |  * CAST(CAST(n AS DECIMAL(38,0)) * sr - CAST(r AS DECIMAL(38,0)) * sn AS DOUBLE)
          |  / sqrt(CAST(CAST(r AS DECIMAL(38,0)) * (n - r) AS DOUBLE)
          |       * CAST(CAST(n AS DECIMAL(38,0)) * snn - CAST(sn AS DECIMAL(38,0)) * sn AS DOUBLE))""".stripMargin)
          .as("z"))
  }

  /** Wald-Wolfowitz runs test per event type — "is the daily revenue
    * series RANDOM around its median, or does it streak" (regime
    * persistence the ACF's linear-correlation view can miss). The
    * LOWER median of each type's daily cents is picked exactly by a
    * row_number over the date-bounded per-type frame; equal-to-median
    * days are dropped (the standard treatment), the run count is
    * 1 + Σ[sign flips] via one lag() pass, and n₁/n₂/R stay exact
    * BIGINTs feeding one double formula for the normal z. Windows are
    * |days|-bounded per type at any corpus size. */
  val runsTest: GraftOp = GraftOp(
    "q_runs_test",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, cents AS med FROM (
      |    SELECT event_type, cents,
      |      row_number() OVER (PARTITION BY event_type ORDER BY cents, day) AS rn,
      |      count(*) OVER (PARTITION BY event_type) AS n_days
      |    FROM d) x
      |  WHERE rn = (n_days + 1) // 2),
      |s AS (
      |  SELECT d.event_type, d.day,
      |    CASE WHEN d.cents > m.med THEN 1 ELSE 0 END AS above
      |  FROM d JOIN med m ON d.event_type = m.event_type
      |  WHERE d.cents <> m.med),
      |f AS (
      |  SELECT event_type, above,
      |    CASE WHEN lag(above) OVER (PARTITION BY event_type ORDER BY day)
      |              IS DISTINCT FROM above THEN 1 ELSE 0 END AS flip
      |  FROM s),
      |g AS (
      |  SELECT event_type,
      |    CAST(sum(above) AS BIGINT) AS n1,
      |    CAST(count(*) - sum(above) AS BIGINT) AS n2,
      |    CAST(sum(flip) AS BIGINT) AS runs
      |  FROM f GROUP BY 1)
      |SELECT event_type, n1, n2, runs,
      |  CAST(runs * (n1 + n2) - 2 * n1 * n2 - (n1 + n2) AS DOUBLE) / (n1 + n2)
      |    / sqrt(CAST(2 * n1 * n2 AS DOUBLE) * CAST(2 * n1 * n2 - n1 - n2 AS DOUBLE)
      |         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))) AS z
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val day = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(graft.functions.Exprs.dec2(col("value"))) * 100)
        .cast(LongType).as("cents"))
    val byType = Window.partitionBy(col("event_type"))
    val med = day
      .withColumn("rn", row_number().over(byType.orderBy(col("cents"), col("day"))))
      .withColumn("n_days", count(lit(1)).over(byType))
      .filter(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("event_type"), col("cents").as("med"))
    val sgn = day.join(broadcast(med), Seq("event_type"))
      .filter(col("cents") =!= col("med"))
      .select(col("event_type"), col("day"),
        when(col("cents") > col("med"), 1L).otherwise(0L).as("above"))
    val f = sgn.withColumn("flip",
      when(not(lag(col("above"), 1).over(byType.orderBy(col("day"))) <=> col("above")), 1L)
        .otherwise(0L))
    f.groupBy(col("event_type"))
      .agg(sum(col("above")).as("n1"),
        (count(lit(1)) - sum(col("above"))).as("n2"),
        sum(col("flip")).as("runs"))
      .select(col("event_type"), col("n1"), col("n2"), col("runs"),
        expr("""CAST(runs * (n1 + n2) - 2 * n1 * n2 - (n1 + n2) AS DOUBLE) / (n1 + n2)
          |  / sqrt(CAST(2 * n1 * n2 AS DOUBLE) * CAST(2 * n1 * n2 - n1 - n2 AS DOUBLE)
          |       / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))""".stripMargin)
          .as("z"))
      .orderBy(col("event_type"))
  }

  /** Theil T inequality index per market segment — the DECOMPOSABLE
    * inequality measure next to q_gini (Gini ranks, Theil adds up:
    * within + between sums to total, which is why economists report
    * it). T = (1/n)·Σ(xᵢ/μ)·ln(xᵢ/μ) over per-customer revenue: the
    * share ratio xᵢ·n/X is a double from three exact integers, each
    * per-customer term is FLOOR-SNAPPED to micro units (the
    * graph_adamic_adar ln-snap discipline — identical doubles both
    * engines, then exact integers), so the per-segment fold is an
    * order-free BIGINT sum and T is one final division. One fact
    * groupBy + a broadcast 5-row segment-stats join — linear. */
  val theilIndex: GraftOp = GraftOp(
    "q_theil_index",
    """WITH u AS (
      |  SELECT c_mktsegment AS segment, o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT segment, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS x
      |  FROM u GROUP BY 1),
      |t AS (
      |  SELECT u.segment,
      |    CAST(floor(CAST(u.cents AS DOUBLE) * g.n / g.x
      |      * ln(CAST(u.cents AS DOUBLE) * g.n / g.x) * 1000000.0) AS BIGINT) AS tm
      |  FROM u JOIN g ON u.segment = g.segment),
      |a AS (SELECT segment, CAST(sum(tm) AS BIGINT) AS s FROM t GROUP BY 1)
      |SELECT a.segment, g.n AS n_customers,
      |  CAST(g.x AS DOUBLE) / g.n / 100.0 AS mean_spend,
      |  CAST(a.s AS DOUBLE) / g.n / 1000000.0 AS theil
      |FROM a JOIN g ON a.segment = g.segment ORDER BY a.segment""".stripMargin) { (s, d) =>
    val u = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    val g = u.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).cast(LongType).as("x"))
    u.join(broadcast(g), Seq("segment"))
      .select(col("segment"), col("n"), col("x"),
        expr("""CAST(floor(CAST(cents AS DOUBLE) * n / x
          |  * ln(CAST(cents AS DOUBLE) * n / x) * 1000000.0) AS BIGINT)""".stripMargin)
          .as("tm"))
      .groupBy(col("segment"), col("n"), col("x"))
      .agg(sum(col("tm")).cast(LongType).as("s"))
      .select(col("segment"), col("n").as("n_customers"),
        // r11: both are exact-integer ratios (s is already a floor-
        // snapped micro sum) — two IEEE divisions, no round() lottery
        expr("CAST(x AS DOUBLE) / n / 100.0D").as("mean_spend"),
        expr("CAST(s AS DOUBLE) / n / 1000000.0D").as("theil"))
      .orderBy(col("segment"))
  }

  /** Poisson dispersion test per event type — "are daily event counts
    * actually Poisson, or clumped" (the overdispersion gate an
    * operator runs before trusting rate-based alerting; q_burstiness
    * measures inter-arrival clumping, this tests the COUNT model
    * itself). Daily counts are exact integers; Σy² folds in
    * DECIMAL(38)/HUGEINT and the variance numerator n·Σy² − (Σy)² is
    * assembled EXACTLY in the same type (r10 — the double-product
    * route cancelled), so D and χ² are raw deterministic IEEE over
    * exact integers. D ≈ 1 is Poisson; the flag
    * marks |χ² − (n−1)| > 3·√(2(n−1)) (a z≈3 normal approximation of
    * the χ² tail, stated in the emit so the cutoff is auditable).
    * One |days|-bounded frame per type. */
  val poissonDispersion: GraftOp = GraftOp(
    "q_poisson_dispersion",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s1,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
      |  FROM d GROUP BY 1)
      |SELECT event_type, n, s1 AS n_events,
      |  CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      |    / (CAST(n AS DOUBLE) - 1.0) / n / (CAST(s1 AS DOUBLE) / n) AS dispersion,
      |  CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      |    / CAST(s1 AS DOUBLE) AS chi2,
      |  CASE WHEN abs(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      |         / CAST(s1 AS DOUBLE) - (n - 1))
      |       > 3.0 * sqrt(2.0 * (CAST(n AS DOUBLE) - 1.0)) THEN 1 ELSE 0 END
      |    AS not_poisson
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    val day = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    day.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s1"),
        sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("s2"))
      .select(col("event_type"), col("n"), col("s1").as("n_events"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
          |  / (CAST(n AS DOUBLE) - 1.0D) / n / (CAST(s1 AS DOUBLE) / n)""".stripMargin)
          .as("dispersion"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
          |  / CAST(s1 AS DOUBLE)""".stripMargin).as("chi2"),
        expr("""CASE WHEN abs(CAST(CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
          |       / CAST(s1 AS DOUBLE) - (n - 1))
          |     > 3.0D * sqrt(2.0D * (CAST(n AS DOUBLE) - 1.0D)) THEN 1 ELSE 0 END""".stripMargin)
          .as("not_poisson"))
      .orderBy(col("event_type"))
  }

  /** Partial autocorrelation (lags 1–4) via Durbin-Levinson — the
    * Box-Jenkins order-selection companion to q_acf (ACF says "is
    * there memory", PACF says "how many AR terms explain it" — the
    * lag where PACF cuts off IS the AR order). The ACF inputs r₁..r₄
    * replay q_acf's exact-integer construction (squared/cross folds in
    * DECIMAL(38)/HUGEINT — x scales with corpus size, BIGINT would
    * wrap silently on the Spark side past ~2³¹·⁵ events) and are 6dp-SNAPPED
    * before the recursion, so both engines run the identical unrolled
    * Durbin-Levinson chain (φ_kk = (r_k − Σφ_{k−1,j}r_{k−j}) /
    * (1 − Σφ_{k−1,j}r_j), coefficient updates in step) on identical
    * doubles — the same snap-then-recurse contract as q_jarque_bera.
    * Everything after the |days|-bounded ACF frame is a 1-row
    * computation. */
  val pacf: GraftOp = GraftOp(
    "q_pacf",
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
      |  FROM c a JOIN c b ON a.i - b.i BETWEEN 1 AND 4),
      |r AS (
      |  SELECT CAST(lag_d AS INT) AS lag_d,
      |    CAST(sum(xy) AS DOUBLE) / CAST(den AS DOUBLE) AS rv
      |  FROM p, den GROUP BY lag_d, den),
      |w AS (
      |  SELECT max(CASE WHEN lag_d = 1 THEN rv END) AS r1,
      |         max(CASE WHEN lag_d = 2 THEN rv END) AS r2,
      |         max(CASE WHEN lag_d = 3 THEN rv END) AS r3,
      |         max(CASE WHEN lag_d = 4 THEN rv END) AS r4
      |  FROM r),
      |p1 AS (SELECT *, r1 AS f11 FROM w),
      |p2 AS (SELECT *, (r2 - f11 * r1) / (1.0 - f11 * r1) AS f22 FROM p1),
      |p2b AS (SELECT *, f11 - f22 * f11 AS f21 FROM p2),
      |p3 AS (SELECT *, (r3 - (f21 * r2 + f22 * r1))
      |                 / (1.0 - (f21 * r1 + f22 * r2)) AS f33 FROM p2b),
      |p3b AS (SELECT *, f21 - f33 * f22 AS f31, f22 - f33 * f21 AS f32 FROM p3),
      |p4 AS (SELECT *, (r4 - (f31 * r3 + f32 * r2 + f33 * r1))
      |                 / (1.0 - (f31 * r1 + f32 * r2 + f33 * r3)) AS f44 FROM p3b)
      |SELECT lag_d, acf_r, pacf FROM (
      |  SELECT 1 AS lag_d, r1 AS acf_r, f11 AS pacf FROM p4
      |  UNION ALL SELECT 2, r2, f22 FROM p4
      |  UNION ALL SELECT 3, r3, f33 FROM p4
      |  UNION ALL SELECT 4, r4, f44 FROM p4) x
      |ORDER BY lag_d""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val st = daily.agg(count(lit(1)).as("nd"), sum(col("n")).as("s"),
      min(col("day")).as("mind"))
    val c = daily.crossJoin(broadcast(st))
      .select(datediff(col("day"), col("mind")).cast(LongType).as("i"),
        (col("nd") * col("n") - col("s")).as("x"))
    val den = broadcast(c.agg(sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("den")))
    val shifted = c.select(explode(sequence(lit(1L), lit(4L))).as("lag_d"),
      col("i").as("ib"), col("x").as("xb"))
      .select(col("lag_d"), (col("ib") + col("lag_d")).as("ia"), col("xb"))
    val r = c.join(shifted, col("i") === col("ia"))
      .select(col("lag_d"), (col("x").cast(DecimalType(38, 0)) * col("xb")).as("xy"))
      .groupBy(col("lag_d")).agg(sum(col("xy")).as("sxy"))
      .crossJoin(den)
      .select(col("lag_d").cast(IntegerType).as("lag_d"),
        expr("CAST(sxy AS DOUBLE) / CAST(den AS DOUBLE)").as("rv")) // r11: raw exact-int ratio
    val w = r.agg(
      max(when(col("lag_d") === 1, col("rv"))).as("r1"),
      max(when(col("lag_d") === 2, col("rv"))).as("r2"),
      max(when(col("lag_d") === 3, col("rv"))).as("r3"),
      max(when(col("lag_d") === 4, col("rv"))).as("r4"))
    val p4 = w
      .withColumn("f11", expr("r1"))
      .withColumn("f22", expr("(r2 - f11 * r1) / (1.0 - f11 * r1)"))
      .withColumn("f21", expr("f11 - f22 * f11"))
      .withColumn("f33",
        expr("(r3 - (f21 * r2 + f22 * r1)) / (1.0 - (f21 * r1 + f22 * r2))"))
      .withColumn("f31", expr("f21 - f33 * f22"))
      .withColumn("f32", expr("f22 - f33 * f21"))
      .withColumn("f44",
        expr("(r4 - (f31 * r3 + f32 * r2 + f33 * r1)) / (1.0 - (f31 * r1 + f32 * r2 + f33 * r3))"))
    // r11 retirement: the Durbin-Levinson chain is deterministic IEEE
    // over the raw exact-integer acf ratios — identical texts both
    // engines; round(,6) only added the midpoint lottery on top of the
    // 1 - f*r cancellation
    val out = p4.selectExpr("1 AS lag_d", "r1 AS acf_r", "f11 AS pacf")
      .unionAll(p4.selectExpr("2", "r2", "f22"))
      .unionAll(p4.selectExpr("3", "r3", "f33"))
      .unionAll(p4.selectExpr("4", "r4", "f44"))
    out.orderBy(col("lag_d"))
  }

  /** Tukey HSD post-hoc pairwise comparisons — the step an analyst
    * takes AFTER q_anova rejects ("the segments differ — WHICH
    * ones?"), with the studentized-range correction that plain
    * pairwise t-tests lack. Reuses q_anova's exact per-segment state
    * (n, Σcents, Σcents² in DECIMAL(38)); the pooled within-variance
    * avoids the cross-row double fold by FLOOR-SNAPPING each
    * segment's (ssᵢ·nᵢ − sᵢ²)//(nᵢ·10⁴) to an exact BIGINT first (the
    * extra 10⁴ keeps the quotient under 2⁶³ at sf0.1 where the raw
    * per-segment value is ~2.4e19; ≤1e4 cent² loss per segment
    * against an MSW ~1e14, deterministic), so MSW is one double
    * formula over a BIGINT sum. Emits all C(5,2) pairs with q and the
    * significance flag against the stated critical value 3.86
    * (k = 5, df = ∞, α = 0.05). */
  val tukeyHsd: GraftOp = GraftOp(
    "q_tukey_hsd",
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
      |w AS (
      |  SELECT segment, n_i, s_i,
      |    CAST((ss_i * n_i - CAST(s_i AS HUGEINT) * s_i) // (n_i * 10000) AS BIGINT) AS w_i
      |  FROM g),
      |t AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
      |             CAST(sum(w_i) AS BIGINT) AS sw FROM w),
      |p AS (
      |  SELECT a.segment AS seg_a, b.segment AS seg_b,
      |    a.n_i AS n_a, b.n_i AS n_b,
      |    CAST(CAST(a.s_i AS HUGEINT) * b.n_i - CAST(b.s_i AS HUGEINT) * a.n_i AS DOUBLE)
      |      / (CAST(a.n_i AS DOUBLE) * b.n_i) AS md,
      |    CAST(t.sw AS DOUBLE) * 10000.0 / (t.n - t.k) AS msw
      |  FROM w a JOIN w b ON a.segment < b.segment CROSS JOIN t)
      |SELECT seg_a, seg_b,
      |  md / 100.0 AS mean_diff,
      |  abs(md) / sqrt(msw / 2.0 * (1.0 / n_a + 1.0 / n_b)) AS q_stat,
      |  CASE WHEN abs(md) / sqrt(msw / 2.0 * (1.0 / n_a + 1.0 / n_b)) > 3.86
      |       THEN 1 ELSE 0 END AS significant
      |FROM p ORDER BY seg_a, seg_b""".stripMargin) { (s, d) =>
    val u = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    val g = u.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_i"), sum(col("cents")).as("s_i"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("cents")).as("ss_i"))
    // (ss·n − s²)/n ≈ 2.4e19 at sf0.1 — past 2⁶³ (and Spark's integral
    // div lands in LONG) — so the floor-divide carries an extra 10⁴:
    // ≤1e4 cent² loss per segment against an MSW ~1e14, deterministic
    val w = g.select(col("segment"), col("n_i"), col("s_i"),
      expr("CAST((ss_i * n_i - CAST(s_i AS DECIMAL(38,0)) * s_i) div (n_i * 10000) AS BIGINT)")
        .as("w_i"))
    val t = broadcast(w.agg(sum(col("n_i")).as("n"), count(lit(1)).as("k"),
      sum(col("w_i")).cast(LongType).as("sw")))
    val a = w.select(col("segment").as("seg_a"), col("n_i").as("n_a"), col("s_i").as("s_a"))
    val b = w.select(col("segment").as("seg_b"), col("n_i").as("n_b"), col("s_i").as("s_b"))
    // broadcast the 5-row side: the inequality pair join should plan as
    // a BroadcastNestedLoopJoin over the segment domain, never a
    // CartesianProduct exchange (ExplainCheck-audited)
    a.join(broadcast(b), col("seg_a") < col("seg_b")).crossJoin(t)
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        // r11: mean difference as an exact cross-multiplied integer
        // numerator (a/n_a - b/n_b cancels when means are close) over
        // one IEEE division — no round() anywhere downstream
        expr("""CAST(CAST(s_a AS DECIMAL(38,0)) * n_b - CAST(s_b AS DECIMAL(38,0)) * n_a AS DOUBLE)
          |  / (CAST(n_a AS DOUBLE) * n_b)""".stripMargin).as("md"),
        expr("CAST(sw AS DOUBLE) * 10000.0 / (n - k)").as("msw"))
      .select(col("seg_a"), col("seg_b"),
        expr("md / 100.0D").as("mean_diff"),
        expr("abs(md) / sqrt(msw / 2.0D * (1.0D / n_a + 1.0D / n_b))").as("q_stat"),
        expr("""CASE WHEN abs(md) / sqrt(msw / 2.0 * (1.0 / n_a + 1.0 / n_b)) > 3.86
          |     THEN 1 ELSE 0 END""".stripMargin).as("significant"))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  /** Log-rank test between the A/B user split's survival curves —
    * "do the variants RETAIN differently", the hypothesis-test
    * companion to q_km_censored's descriptive curve (same lifetime
    * and 7-day censoring rules, cohorts from the portable md5 user
    * split every experiment op shares). At each event time the
    * expected-death and hypergeometric-variance terms are rationals,
    * so each is FLOOR-SNAPPED to micro units with the product held in
    * DECIMAL(38)/HUGEINT (d·n₁·n₂·(n−d) ≈ 2e14 before scaling), the
    * per-time sums fold as exact BIGINTs, and z/χ² are one double
    * formula over four integers (NULL when the variance is zero — a
    * fully-censored corpus has no deaths to compare, which sf0.001
    * actually exercises). Frames are |distinct-lifetime|-bounded
    * after one per-user aggregate. */
  val logRank: GraftOp = GraftOp(
    "q_log_rank",
    s"""WITH mx AS (SELECT max(ts) AS mt FROM events),
       |l AS (
       |  SELECT user_id,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 1 ELSE 2 END AS grp,
       |    date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS life,
       |    CASE WHEN max(ts) >= (SELECT mt FROM mx) - INTERVAL '7 days' THEN 1 ELSE 0 END AS censored
       |  FROM events GROUP BY 1),
       |d AS (
       |  SELECT life,
       |    CAST(count(*) FILTER (WHERE grp = 1 AND censored = 0) AS BIGINT) AS d1,
       |    CAST(count(*) FILTER (WHERE grp = 1 AND censored = 1) AS BIGINT) AS c1,
       |    CAST(count(*) FILTER (WHERE grp = 2 AND censored = 0) AS BIGINT) AS d2,
       |    CAST(count(*) FILTER (WHERE grp = 2 AND censored = 1) AS BIGINT) AS c2
       |  FROM l GROUP BY 1),
       |tot AS (
       |  SELECT CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n1t,
       |         CAST(count(*) FILTER (WHERE grp = 2) AS BIGINT) AS n2t
       |  FROM l),
       |r AS (
       |  SELECT life, d1, d2,
       |    CAST(tot.n1t - coalesce(sum(d1 + c1) OVER (ORDER BY life
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
       |    CAST(tot.n2t - coalesce(sum(d2 + c2) OVER (ORDER BY life
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n2
       |  FROM d, tot),
       |terms AS (
       |  SELECT life, d1, d2, n1, n2, d1 + d2 AS dt, n1 + n2 AS nt,
       |    CAST((d1 + d2) * n1 * 1000000 // (n1 + n2) AS BIGINT) AS e1_micro,
       |    CASE WHEN n1 + n2 > 1 THEN
       |      CAST(CAST(d1 + d2 AS HUGEINT) * n1 * n2 * (n1 + n2 - d1 - d2) * 1000000
       |        // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT)
       |    ELSE 0 END AS v_micro
       |  FROM r WHERE n1 + n2 > 0),
       |agg AS (
       |  SELECT CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(d2) AS BIGINT) AS o2,
       |    CAST(sum(e1_micro) AS BIGINT) AS e1m, CAST(sum(v_micro) AS BIGINT) AS vm
       |  FROM terms)
       |SELECT tot.n1t AS n_a, tot.n2t AS n_b, o1 AS deaths_a, o2 AS deaths_b,
       |  e1m AS expected_a_micro, vm AS var_micro,
       |  CASE WHEN vm = 0 THEN NULL
       |       ELSE round((CAST(o1 AS DOUBLE) - CAST(e1m AS DOUBLE) / 1000000.0)
       |         / sqrt(CAST(vm AS DOUBLE) / 1000000.0), 6) END AS z
       |FROM agg, tot""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("ts")).as("mt"))
    val l = ev.groupBy(col("user_id"))
      .agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts")))).as("life"),
        max(col("ts")).as("last_ts"))
      .withColumn("grp",
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, 1).otherwise(2))
      .crossJoin(broadcast(mx))
      .select(col("grp"), col("life"),
        when(col("last_ts") >= col("mt") - expr("INTERVAL 7 DAYS"), 1).otherwise(0)
          .as("censored"))
    val dd = l.groupBy(col("life"))
      .agg(count(when(col("grp") === 1 && col("censored") === 0, 1)).as("d1"),
        count(when(col("grp") === 1 && col("censored") === 1, 1)).as("c1"),
        count(when(col("grp") === 2 && col("censored") === 0, 1)).as("d2"),
        count(when(col("grp") === 2 && col("censored") === 1, 1)).as("c2"))
    val tot = broadcast(l.agg(
      count(when(col("grp") === 1, 1)).as("n1t"),
      count(when(col("grp") === 2, 1)).as("n2t")))
    val byLife = Window.orderBy(col("life")).rowsBetween(Window.unboundedPreceding, -1)
    val terms = dd.crossJoin(tot)
      .withColumn("n1",
        (col("n1t") - coalesce(sum(col("d1") + col("c1")).over(byLife), lit(0L)))
          .cast(LongType))
      .withColumn("n2",
        (col("n2t") - coalesce(sum(col("d2") + col("c2")).over(byLife), lit(0L)))
          .cast(LongType))
      .filter(col("n1") + col("n2") > 0)
      .select(col("d1"), col("d2"), col("n1t"), col("n2t"),
        expr("CAST((d1 + d2) * n1 * 1000000 div (n1 + n2) AS BIGINT)").as("e1_micro"),
        expr("""CASE WHEN n1 + n2 > 1 THEN
          |  CAST(CAST(d1 + d2 AS DECIMAL(38,0)) * n1 * n2 * (n1 + n2 - d1 - d2) * 1000000
          |    div (CAST(n1 + n2 AS DECIMAL(38,0)) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT)
          |ELSE 0 END""".stripMargin).as("v_micro"))
    terms.groupBy(col("n1t"), col("n2t"))
      .agg(sum(col("d1")).cast(LongType).as("o1"), sum(col("d2")).cast(LongType).as("o2"),
        sum(col("e1_micro")).cast(LongType).as("e1m"),
        sum(col("v_micro")).cast(LongType).as("vm"))
      .select(col("n1t").as("n_a"), col("n2t").as("n_b"),
        col("o1").as("deaths_a"), col("o2").as("deaths_b"),
        col("e1m").as("expected_a_micro"), col("vm").as("var_micro"),
        expr("""CASE WHEN vm = 0 THEN NULL
          |     ELSE round((CAST(o1 AS DOUBLE) - CAST(e1m AS DOUBLE) / 1000000.0)
          |       / sqrt(CAST(vm AS DOUBLE) / 1000000.0), 6) END""".stripMargin).as("z"))
  }

  /** McNemar's test for PAIRED proportions — "did individual users
    * change purchasing status between the first and second half of
    * the window" (q_two_prop compares two INDEPENDENT groups; paired
    * before/after on the same users needs the discordant-pair test —
    * using two-prop here overstates the variance). The pairing is per
    * user: purchased-in-H1 × purchased-in-H2 from one aggregate; the
    * four contingency cells are exact BIGINTs and both the
    * continuity-corrected χ² = (|b−c|−1)²/(b+c) and the exact-style
    * statistic are one double formula over b and c, NULL-guarded when
    * no user changed status. One per-user aggregate, a 1-row emit. */
  val mcnemar: GraftOp = GraftOp(
    "q_mcnemar",
    """WITH mid AS (
      |  SELECT CAST(min(ts) AS DATE)
      |    + CAST((date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1) // 2
      |        AS INT) AS m
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) < mid.m
      |             THEN 1 ELSE 0 END) AS h1,
      |    max(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) >= mid.m
      |             THEN 1 ELSE 0 END) AS h2
      |  FROM events, mid GROUP BY user_id),
      |g AS (
      |  SELECT
      |    CAST(count(*) FILTER (WHERE h1 = 1 AND h2 = 1) AS BIGINT) AS both_,
      |    CAST(count(*) FILTER (WHERE h1 = 1 AND h2 = 0) AS BIGINT) AS b,
      |    CAST(count(*) FILTER (WHERE h1 = 0 AND h2 = 1) AS BIGINT) AS c,
      |    CAST(count(*) FILTER (WHERE h1 = 0 AND h2 = 0) AS BIGINT) AS neither
      |  FROM u)
      |SELECT both_ AS n_both, b AS n_lost, c AS n_gained, neither AS n_neither,
      |  CASE WHEN b + c = 0 THEN NULL
      |       ELSE (abs(CAST(b AS DOUBLE) - c) - 1.0)
      |          * (abs(CAST(b AS DOUBLE) - c) - 1.0) / (b + c) END AS chi2
      |FROM g""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val mid = broadcast(ev.agg(
      expr("""CAST(min(CAST(ts AS DATE))
        |  + CAST((datediff(max(CAST(ts AS DATE)), min(CAST(ts AS DATE))) + 1) div 2
        |      AS INT) AS DATE)""".stripMargin).as("m")))
    val u = ev.crossJoin(mid)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase" && to_date(col("ts")) < col("m"), 1)
          .otherwise(0)).as("h1"),
        max(when(col("event_type") === "purchase" && to_date(col("ts")) >= col("m"), 1)
          .otherwise(0)).as("h2"))
    u.agg(
        count(when(col("h1") === 1 && col("h2") === 1, 1)).as("n_both"),
        count(when(col("h1") === 1 && col("h2") === 0, 1)).as("b"),
        count(when(col("h1") === 0 && col("h2") === 1, 1)).as("c"),
        count(when(col("h1") === 0 && col("h2") === 0, 1)).as("n_neither"))
      .select(col("n_both"), col("b").as("n_lost"), col("c").as("n_gained"),
        col("n_neither"),
        // r11: b, c are exact counts — every step is exact or correctly
        // rounded IEEE; round(,6) only added midpoint risk
        expr("""CASE WHEN b + c = 0 THEN NULL
          |     ELSE (abs(CAST(b AS DOUBLE) - c) - 1.0D)
          |        * (abs(CAST(b AS DOUBLE) - c) - 1.0D) / (b + c) END""".stripMargin)
          .as("chi2"))
  }

  val ops: Seq[GraftOp] = Seq(jarqueBera, maxDrawdown, partialCorr, holm,
    cochranArmitage, runsTest, theilIndex, poissonDispersion, pacf, tukeyHsd, logRank,
    mcnemar)
}
