package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third statistics tier (round 9): the nonparametric k-group
  * completions (Mood's median, Jonckheere-Terpstra ordered trend,
  * Dunn post-hoc pairs), a full-CDF two-sample statistic (Cramér-von
  * Mises), the Ljung-Box portmanteau over the exact ACF, and the
  * Markov conditional-entropy rate.
  *
  * Same oracle-parity contract as [[StatsOps]]/[[StatsOps2]]:
  * cross-row folds are exact integers — BIGINT where the bound proves
  * it fits, DECIMAL(38)/HUGEINT where products scale quadratically
  * with corpus size — and only the final scalar formula runs in
  * doubles with identical expression text on both engines. Where a
  * formula needs a cross-row fold of non-grid doubles (Ljung-Box's
  * Σr²ₖ, entropy's Σp·ln p), the terms are PIVOTED onto one row over
  * the fixed domain (lags 1..7, the 5 event types) so the fold order
  * is the written expression text, never shuffle arrival order.
  */
object StatsOps3 {

  /** Mood's median test of per-customer spend across market segments —
    * the nonparametric sibling of q_anova (median-based, so a single
    * whale customer cannot move it) and the k-group extension of the
    * sign test. The grand LOWER median is an exact cents value from
    * the q_levene value-domain cumulative trick (percentile_disc
    * semantics); each segment's above/at-or-below counts form a k×2
    * contingency whose χ² cells are FLOOR-SNAPPED to exact micro units
    * via integral division (the q_cramers_v kernel: (o·n − rt·ct)²·10⁶
    * ÷ (n·rt·ct), numerator in DECIMAL(38)/HUGEINT), so each emitted
    * per-segment term is a function of exact integers and the caller
    * sums k rows for the statistic (df = k−1). Value-domain windows
    * stay ≤|distinct cents|; the median broadcasts back. */
  val moodMedian: GraftOp = GraftOp(
    "q_mood_median",
    """WITH u AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment, o_custkey),
      |c AS (SELECT cents, CAST(count(*) AS BIGINT) AS cv FROM u GROUP BY 1),
      |w AS (
      |  SELECT cents, cv,
      |    CAST(sum(cv) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(cv) OVER () AS BIGINT) AS n
      |  FROM c),
      |med AS (SELECT min(cents) AS med FROM w WHERE cum * 2 >= n),
      |g AS (
      |  SELECT segment, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(count(*) FILTER (WHERE cents > med) AS BIGINT) AS a_i
      |  FROM u CROSS JOIN med GROUP BY 1),
      |t AS (SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(a_i) AS BIGINT) AS ca,
      |             CAST(sum(n_i - a_i) AS BIGINT) AS cb FROM g),
      |f AS (
      |  SELECT segment, n_i, a_i, n,
      |    CAST(a_i * n - n_i * ca AS HUGEINT) AS d1,
      |    CAST((n_i - a_i) * n - n_i * cb AS HUGEINT) AS d2,
      |    ca, cb
      |  FROM g, t)
      |SELECT segment, n_i, a_i AS n_above, n_i - a_i AS n_at_or_below,
      |  CAST(med AS DOUBLE) / 100.0 AS median_value,
      |  CAST(CAST(d1 * d1 * 1000000 // (CAST(n AS HUGEINT) * n_i * ca)
      |     + d2 * d2 * 1000000 // (CAST(n AS HUGEINT) * n_i * cb) AS BIGINT) AS DOUBLE)
      |    / 1000000.0 AS chi2_term
      |FROM f CROSS JOIN med ORDER BY segment""".stripMargin) { (s, d) =>
    val u = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    val c = u.groupBy(col("cents")).agg(count(lit(1)).as("cv"))
    val w = c
      .withColumn("cum", sum(col("cv")).over(
        Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cv")).over(Window.partitionBy()))
    val med = broadcast(
      w.filter(col("cum") * 2 >= col("n")).agg(min(col("cents")).as("med")))
    val g = u.crossJoin(med)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_i"),
        count(when(col("cents") > col("med"), 1)).as("a_i"))
    val t = broadcast(g.agg(sum(col("n_i")).as("n"), sum(col("a_i")).as("ca"),
      sum(col("n_i") - col("a_i")).as("cb")))
    g.crossJoin(t).crossJoin(med)
      .withColumn("d1", expr("CAST(a_i * n - n_i * ca AS DECIMAL(38,0))"))
      .withColumn("d2", expr("CAST((n_i - a_i) * n - n_i * cb AS DECIMAL(38,0))"))
      .select(col("segment"), col("n_i"), col("a_i").as("n_above"),
        (col("n_i") - col("a_i")).as("n_at_or_below"),
        expr("CAST(med AS DOUBLE) / 100.0D").as("median_value"),
        expr("""CAST(CAST(d1 * d1 * 1000000 div (CAST(n AS DECIMAL(38,0)) * n_i * ca)
          |   + d2 * d2 * 1000000 div (CAST(n AS DECIMAL(38,0)) * n_i * cb) AS BIGINT) AS DOUBLE)
          |  / 1000000.0D""".stripMargin).as("chi2_term"))
      .orderBy(col("segment"))
  }

  /** Jonckheere-Terpstra ordered-alternative trend test: is line
    * quantity stochastically increasing across ship-date QUARTERS
    * (an ordered hypothesis q_kruskal cannot see — KW detects ANY
    * difference, JT detects a monotone one, which is the seasonal
    * question). J = Σ_{i<j} U_ij runs on the DOMAIN-BOUNDED
    * (quarter, quantity) contingency: the cell-pair join is ≤(4·50)²
    * combinations at any corpus size, and 2J = Σ m₁m₂·(2·[q₁<q₂] +
    * [q₁=q₂]) folds in DECIMAL(38)/HUGEINT (it scales with n²). The
    * null mean and the tie-unadjusted variance are the same exact
    * integer assemblies (4E = n²−Σnᵢ², 72V = n²(2n+3)−Σnᵢ²(2nᵢ+3)),
    * and z is one deterministic double formula — casts, mul/div and a
    * correctly-rounded sqrt, no round(). */
  val jonckheere: GraftOp = GraftOp(
    "q_jonckheere",
    """WITH c AS (
      |  SELECT CAST(date_part('quarter', l_shipdate) AS INT) AS g,
      |    CAST(l_quantity AS BIGINT) AS q, CAST(count(*) AS BIGINT) AS m
      |  FROM lineitem GROUP BY 1, 2),
      |j AS (
      |  SELECT CAST(sum(CAST(a.m AS HUGEINT) * b.m *
      |      (CASE WHEN a.q < b.q THEN 2 WHEN a.q = b.q THEN 1 ELSE 0 END)) AS HUGEINT) AS j2
      |  FROM c a JOIN c b ON a.g < b.g),
      |gs AS (SELECT g, CAST(sum(m) AS BIGINT) AS n_i FROM c GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(CAST(n_i AS HUGEINT) * n_i) AS HUGEINT) AS sq,
      |    CAST(sum(CAST(n_i AS HUGEINT) * n_i * (2 * n_i + 3)) AS HUGEINT) AS sq3
      |  FROM gs),
      |f AS (
      |  SELECT j2, n, k,
      |    CAST(n AS HUGEINT) * n - sq AS e4,
      |    CAST(n AS HUGEINT) * n * (2 * n + 3) - sq3 AS v72
      |  FROM j, t)
      |SELECT n, k,
      |  CAST(j2 AS DOUBLE) / 2.0 AS j_stat,
      |  CAST(e4 AS DOUBLE) / 4.0 AS j_null_mean,
      |  (CAST(j2 AS DOUBLE) / 2.0 - CAST(e4 AS DOUBLE) / 4.0)
      |    / sqrt(CAST(v72 AS DOUBLE) / 72.0) AS z
      |FROM f""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .select(quarter(col("l_shipdate")).cast(IntegerType).as("g"),
        col("l_quantity").cast(LongType).as("q"))
      .groupBy(col("g"), col("q")).agg(count(lit(1)).as("m"))
    val j = c.as("a").join(c.as("b"), col("a.g") < col("b.g"))
      .select((col("a.m").cast(DecimalType(38, 0)) * col("b.m") *
        when(col("a.q") < col("b.q"), 2).when(col("a.q") === col("b.q"), 1).otherwise(0))
        .as("term"))
      .agg(sum(col("term")).as("j2"))
    val gs = c.groupBy(col("g")).agg(sum(col("m")).as("n_i"))
    val t = gs.agg(sum(col("n_i")).as("n"), count(lit(1)).as("k"),
      sum(col("n_i").cast(DecimalType(38, 0)) * col("n_i")).as("sq"),
      sum(col("n_i").cast(DecimalType(38, 0)) * col("n_i") * (col("n_i") * 2 + 3)).as("sq3"))
    broadcast(j).crossJoin(broadcast(t))
      .withColumn("e4", expr("CAST(n AS DECIMAL(38,0)) * n - sq"))
      .withColumn("v72", expr("CAST(n AS DECIMAL(38,0)) * n * (2 * n + 3) - sq3"))
      .select(col("n"), col("k"),
        expr("CAST(j2 AS DOUBLE) / 2.0D").as("j_stat"),
        expr("CAST(e4 AS DOUBLE) / 4.0D").as("j_null_mean"),
        expr("""(CAST(j2 AS DOUBLE) / 2.0D - CAST(e4 AS DOUBLE) / 4.0D)
          |  / sqrt(CAST(v72 AS DOUBLE) / 72.0D)""".stripMargin).as("z"))
  }

  /** Two-sample Cramér-von Mises statistic on purchase value between
    * the hash variants — the INTEGRATED-squared-CDF-gap companion to
    * q_ks_test's sup gap (KS sees the single worst point; CvM sees
    * accumulated distributional drift). Per distinct cents value the
    * scaled ECDF gap D_v = cumA·n_b − cumB·n_a is assembled exactly in
    * DECIMAL(38,0)/HUGEINT (it scales ~n², so BIGINT wraps past ~3M
    * purchases per arm);
    * each value's contribution is FLOOR-SNAPPED as cv·(D_v·10⁶ ÷
    * (n_a·n_b))² — the micro-snapped (F_A−F_B) gap squared — so the
    * cross-value sum folds exactly in DECIMAL(38)/HUGEINT at any
    * corpus size (≤ N·10¹²) and T = Σ/(N·10¹²) is one double divide.
    * The ≤10⁻⁶ ECDF quantization is applied identically by both
    * engines (the PSI/cramers_v discipline). */
  val cvm: GraftOp = GraftOp(
    "q_cvm",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT cents, CAST(count(*) AS BIGINT) AS cv,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS ca
       |  FROM p GROUP BY 1),
       |w AS (
       |  SELECT cents, cv,
       |    CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
       |    CAST(sum(cv - ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
       |    CAST(sum(ca) OVER () AS BIGINT) AS n_a,
       |    CAST(sum(cv - ca) OVER () AS BIGINT) AS n_b
       |  FROM c),
       |f AS (
       |  SELECT n_a, n_b,
       |    CAST(sum(CAST(cv AS HUGEINT)
       |      * ((CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a) * 1000000
       |         // (CAST(n_a AS HUGEINT) * n_b))
       |      * ((CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a) * 1000000
       |         // (CAST(n_a AS HUGEINT) * n_b))) AS HUGEINT) AS s
       |  FROM w GROUP BY 1, 2)
       |SELECT n_a, n_b,
       |  CAST(s AS DOUBLE) / ((CAST(n_a AS DOUBLE) + n_b) * 1000000.0 * 1000000.0) AS t
       |FROM f""".stripMargin) { (s, d) =>
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
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val w = c
      .withColumn("cum_a", sum(col("ca")).over(byVal))
      .withColumn("cum_b", sum(col("cv") - col("ca")).over(byVal))
      .withColumn("n_a", sum(col("ca")).over(all))
      .withColumn("n_b", sum(col("cv") - col("ca")).over(all))
    w.withColumn("fdm",
        expr("""(CAST(cum_a AS DECIMAL(38,0)) * n_b - CAST(cum_b AS DECIMAL(38,0)) * n_a)
          |  * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)""".stripMargin))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("cv").cast(DecimalType(38, 0)) * col("fdm") * col("fdm")).as("s"))
      .select(col("n_a"), col("n_b"),
        expr("""CAST(s AS DOUBLE)
          |  / ((CAST(n_a AS DOUBLE) + n_b) * 1000000.0D * 1000000.0D)""".stripMargin).as("t"))
  }

  /** Dunn's post-hoc pairwise comparisons — the step after q_kruskal
    * rejects ("the return-flag groups differ — WHICH pairs?"), the
    * rank-world twin of q_tukey_hsd. Reuses the kruskal doubled-rank
    * integers verbatim (per group nᵢ and R2ᵢ = 2Rᵢ on the
    * domain-bounded value contingency, the tie term Σ(t³−t)): each
    * pair's mean-rank difference is the exact rational
    * (R2ₐ·n_b − R2_b·nₐ)/(2nₐn_b) with the numerator assembled in
    * DECIMAL(38)/HUGEINT, and z is one deterministic double formula
    * (the tie-corrected σ² = (n(n+1) − Σ(t³−t)/(n−1))/12). Flags each
    * pair against the Bonferroni-corrected two-sided critical value
    * for k = 3 pairs at α = 0.05 (z > 2.394 at α/3, per-comparison
    * p < 0.0167). */
  val dunn: GraftOp = GraftOp(
    "q_dunn",
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
      |n AS (SELECT CAST(sum(n_i) AS BIGINT) AS n FROM r),
      |pr AS (
      |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.n_i AS n_a, b.n_i AS n_b,
      |    CAST(a.r2_i AS HUGEINT) * b.n_i - CAST(b.r2_i AS HUGEINT) * a.n_i AS dnum
      |  FROM r a JOIN r b ON a.grp < b.grp),
      |f AS (
      |  SELECT grp_a, grp_b, n_a, n_b,
      |    (CAST(dnum AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * n_b))
      |      / sqrt((CAST(n.n AS DOUBLE) * (n.n + 1.0)
      |              - CAST(t.ties AS DOUBLE) / (n.n - 1.0)) / 12.0
      |             * (1.0 / n_a + 1.0 / n_b)) AS z
      |  FROM pr, n, t)
      |SELECT grp_a, grp_b, n_a, n_b, z,
      |  CASE WHEN abs(z) > 2.394 THEN 1 ELSE 0 END AS significant
      |FROM f ORDER BY grp_a, grp_b""".stripMargin) { (s, d) =>
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
    val n = broadcast(r.agg(sum(col("n_i")).as("n")))
    r.as("a").join(r.as("b"), col("a.grp") < col("b.grp"))
      .select(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"),
        col("a.n_i").as("n_a"), col("b.n_i").as("n_b"),
        expr("CAST(a.r2_i AS DECIMAL(38,0)) * b.n_i - CAST(b.r2_i AS DECIMAL(38,0)) * a.n_i")
          .as("dnum"))
      .crossJoin(n).crossJoin(ties)
      .withColumn("z",
        expr("""(CAST(dnum AS DOUBLE) / (2.0D * CAST(n_a AS DOUBLE) * n_b))
          |  / sqrt((CAST(n AS DOUBLE) * (n + 1.0D)
          |          - CAST(ties AS DOUBLE) / (n - 1.0D)) / 12.0D
          |         * (1.0D / n_a + 1.0D / n_b))""".stripMargin))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"), col("z"),
        expr("CASE WHEN abs(z) > 2.394D THEN 1 ELSE 0 END").as("significant"))
      .orderBy(col("grp_a"), col("grp_b"))
  }

  /** Ljung-Box portmanteau over the daily-count ACF at lags 1..7 —
    * the "is there ANY autocorrelation" gate q_acf's per-lag readout
    * leaves to eyeballing (the test a forecasting op like q_holt
    * should pass its residual-whiteness check against). Replays
    * q_acf's exact-integer construction (DECIMAL(38) folds of the
    * N-scaled centered products), 6dp-SNAPS each rₖ — the same
    * snap-then-consume contract as q_pacf — then PIVOTS the 7 snapped
    * values onto one row so Q = n(n+2)·Σ rₖ²/(n−k) is one written-out
    * double formula whose fold order is the expression text, never
    * shuffle arrival order. Flags against χ²₇ at α = 0.05 (14.067). */
  val ljungBox: GraftOp = GraftOp(
    "q_ljung_box",
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
      |  FROM c a JOIN c b ON a.i - b.i BETWEEN 1 AND 7),
      |r AS (
      |  SELECT CAST(lag_d AS INT) AS lag_d,
      |    CAST(sum(xy) AS DOUBLE) / CAST(den AS DOUBLE) AS rv
      |  FROM p, den GROUP BY lag_d, den),
      |w AS (
      |  SELECT max(CASE WHEN lag_d = 1 THEN rv END) AS r1,
      |         max(CASE WHEN lag_d = 2 THEN rv END) AS r2,
      |         max(CASE WHEN lag_d = 3 THEN rv END) AS r3,
      |         max(CASE WHEN lag_d = 4 THEN rv END) AS r4,
      |         max(CASE WHEN lag_d = 5 THEN rv END) AS r5,
      |         max(CASE WHEN lag_d = 6 THEN rv END) AS r6,
      |         max(CASE WHEN lag_d = 7 THEN rv END) AS r7
      |  FROM r),
      |f AS (
      |  SELECT st.nd AS n_days,
      |    CAST(st.nd AS DOUBLE) * (st.nd + 2.0)
      |      * (r1 * r1 / (st.nd - 1.0) + r2 * r2 / (st.nd - 2.0)
      |       + r3 * r3 / (st.nd - 3.0) + r4 * r4 / (st.nd - 4.0)
      |       + r5 * r5 / (st.nd - 5.0) + r6 * r6 / (st.nd - 6.0)
      |       + r7 * r7 / (st.nd - 7.0)) AS q_lb
      |  FROM w, st)
      |SELECT n_days, q_lb,
      |  CASE WHEN q_lb > 14.067 THEN 1 ELSE 0 END AS reject_white_noise
      |FROM f""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val st = daily.agg(count(lit(1)).as("nd"), sum(col("n")).as("s"),
      min(col("day")).as("mind"))
    val c = daily.crossJoin(broadcast(st))
      .select(datediff(col("day"), col("mind")).cast(LongType).as("i"),
        (col("nd") * col("n") - col("s")).as("x"))
    val den = broadcast(c.agg(sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("den")))
    val shifted = c.select(explode(sequence(lit(1L), lit(7L))).as("lag_d"),
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
      max(when(col("lag_d") === 4, col("rv"))).as("r4"),
      max(when(col("lag_d") === 5, col("rv"))).as("r5"),
      max(when(col("lag_d") === 6, col("rv"))).as("r6"),
      max(when(col("lag_d") === 7, col("rv"))).as("r7"))
    w.crossJoin(broadcast(st))
      .withColumn("q_lb",
        expr("""CAST(nd AS DOUBLE) * (nd + 2.0D)
          |  * (r1 * r1 / (nd - 1.0D) + r2 * r2 / (nd - 2.0D)
          |   + r3 * r3 / (nd - 3.0D) + r4 * r4 / (nd - 4.0D)
          |   + r5 * r5 / (nd - 5.0D) + r6 * r6 / (nd - 6.0D)
          |   + r7 * r7 / (nd - 7.0D))""".stripMargin))
      .select(col("nd").as("n_days"), col("q_lb"),
        expr("CASE WHEN q_lb > 14.067D THEN 1 ELSE 0 END").as("reject_white_noise"))
  }

  /** Markov conditional-entropy rate of the per-user event-type chain
    * — "how predictable is the next action given the current one", the
    * information-theoretic summary of q_markov's transition matrix
    * (H(next|cur) ≪ H(next) means sessions follow scripts — a bot /
    * boilerplate-behavior tell). Transition counts ride q_transitions'
    * single lead() window; per from-type the entropy folds over the
    * FIXED 5-type to-domain PIVOTED onto one row, so the Σ p·ln p fold
    * order is the written expression (ln is libm → each term is
    * 6dp-rounded, the snap-then-consume rescue). Emits per from-type
    * H(next|cur) in nats plus the exact count integers. */
  val entropyRate: GraftOp = GraftOp(
    "q_entropy_rate",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |c AS (
      |  SELECT event_type AS from_type,
      |    CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(count(*) FILTER (WHERE next_type = 'click') AS BIGINT) AS c1,
      |    CAST(count(*) FILTER (WHERE next_type = 'error') AS BIGINT) AS c2,
      |    CAST(count(*) FILTER (WHERE next_type = 'purchase') AS BIGINT) AS c3,
      |    CAST(count(*) FILTER (WHERE next_type = 'signup') AS BIGINT) AS c4,
      |    CAST(count(*) FILTER (WHERE next_type = 'view') AS BIGINT) AS c5
      |  FROM o WHERE next_type IS NOT NULL GROUP BY 1)
      |SELECT from_type, n_i,
      |  round(CASE WHEN c1 = 0 THEN 0 ELSE -(CAST(c1 AS DOUBLE) / n_i) * ln(CAST(c1 AS DOUBLE) / n_i) END, 6)
      |  + round(CASE WHEN c2 = 0 THEN 0 ELSE -(CAST(c2 AS DOUBLE) / n_i) * ln(CAST(c2 AS DOUBLE) / n_i) END, 6)
      |  + round(CASE WHEN c3 = 0 THEN 0 ELSE -(CAST(c3 AS DOUBLE) / n_i) * ln(CAST(c3 AS DOUBLE) / n_i) END, 6)
      |  + round(CASE WHEN c4 = 0 THEN 0 ELSE -(CAST(c4 AS DOUBLE) / n_i) * ln(CAST(c4 AS DOUBLE) / n_i) END, 6)
      |  + round(CASE WHEN c5 = 0 THEN 0 ELSE -(CAST(c5 AS DOUBLE) / n_i) * ln(CAST(c5 AS DOUBLE) / n_i) END, 6)
      |    AS h_cond_nats
      |FROM c ORDER BY from_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val o = Tables.events(s, d)
      .select(col("event_type"), lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = count(lit(1)).as("n_i") +:
      types.zipWithIndex.map { case (t, i) =>
        count(when(col("next_type") === t, 1)).as(s"c${i + 1}")
      }
    val terms = (1 to 5).map(i =>
      s"round(CASE WHEN c$i = 0 THEN 0 ELSE -(CAST(c$i AS DOUBLE) / n_i) * ln(CAST(c$i AS DOUBLE) / n_i) END, 6)")
      .mkString("\n  + ")
    o.groupBy(col("event_type").as("from_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("from_type"), col("n_i"), expr(terms).as("h_cond_nats"))
      .orderBy(col("from_type"))
  }

  /** Cohen's d / Hedges' g effect size between the hash variants —
    * the magnitude readout q_welch_t's significance lacks (a tiny
    * effect turns significant at scale; an experiment readout without
    * d is a trap). Reuses the welch frame's six exact integers (n, Σ,
    * Σ(cents·cents) per variant — the squared fold in DECIMAL(38)/
    * HUGEINT since it grows linearly in rows but quadratically in the
    * value bound); pooled SD and both effect sizes are one
    * deterministic double formula each (casts, mul/div, sqrt — no
    * round, no libm). Hedges' g applies the small-sample correction
    * 1 − 3/(4·df − 1). */
  val cohensD: GraftOp = GraftOp(
    "q_cohens_d",
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
       |    sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE variant = 'A') AS ss_a,
       |    sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE variant = 'B') AS ss_b
       |  FROM p),
       |f AS (
       |  SELECT n_a, n_b,
       |    CAST(CAST(s_a AS HUGEINT) * n_b - CAST(s_b AS HUGEINT) * n_a AS DOUBLE)
       |      / (CAST(n_a AS DOUBLE) * n_b)
       |      / sqrt((CAST(CAST(n_a AS HUGEINT) * ss_a - CAST(s_a AS HUGEINT) * s_a AS DOUBLE) / n_a
       |            + CAST(CAST(n_b AS HUGEINT) * ss_b - CAST(s_b AS HUGEINT) * s_b AS DOUBLE) / n_b)
       |           / (CAST(n_a AS DOUBLE) + n_b - 2.0)) AS d
       |  FROM g)
       |SELECT n_a, n_b, d AS cohens_d,
       |  d * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE) + n_b - 2.0) - 1.0)) AS hedges_g
       |FROM f""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    p.agg(
        count(when(col("variant") === "A", 1)).as("n_a"),
        count(when(col("variant") === "B", 1)).as("n_b"),
        sum(when(col("variant") === "A", col("cents"))).as("s_a"),
        sum(when(col("variant") === "B", col("cents"))).as("s_b"),
        sum(when(col("variant") === "A",
          col("cents").cast(DecimalType(38, 0)) * col("cents"))).as("ss_a"),
        sum(when(col("variant") === "B",
          col("cents").cast(DecimalType(38, 0)) * col("cents"))).as("ss_b"))
      .withColumn("d",
        expr("""CAST(CAST(s_a AS DECIMAL(38,0)) * n_b - CAST(s_b AS DECIMAL(38,0)) * n_a AS DOUBLE)
          |  / (CAST(n_a AS DOUBLE) * n_b)
          |  / sqrt((CAST(CAST(n_a AS DECIMAL(38,0)) * ss_a - CAST(s_a AS DECIMAL(38,0)) * s_a AS DOUBLE) / n_a
          |        + CAST(CAST(n_b AS DECIMAL(38,0)) * ss_b - CAST(s_b AS DECIMAL(38,0)) * s_b AS DOUBLE) / n_b)
          |       / (CAST(n_a AS DOUBLE) + n_b - 2.0D))""".stripMargin))
      .select(col("n_a"), col("n_b"), col("d").as("cohens_d"),
        expr("d * (1.0D - 3.0D / (4.0D * (CAST(n_a AS DOUBLE) + n_b - 2.0D) - 1.0D))")
          .as("hedges_g"))
  }

  val ops: Seq[GraftOp] = Seq(moodMedian, jonckheere, cvm, dunn, ljungBox, entropyRate,
    cohensD)
}
