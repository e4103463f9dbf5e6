package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifth statistics tier (round 13, continued): distribution-shift and
  * ordered-alternative inference that the r9–r12 ladders still lacked —
  * the energy two-sample statistic (the distance-based omnibus test
  * behind modern drift monitors; Székely & Rizzo 2004), and Page's L
  * trend test for ordered alternatives over randomized blocks (the
  * blocked companion of q_jonckheere, Page 1963).
  *
  * Oracle-parity contract as [[StatsOps4]]: every cross-row fold is an
  * exact integer (DECIMAL(38)/HUGEINT where products scale with n²),
  * final scalar formulas run in doubles with identical expression text
  * on both engines, and no transcendental enters a comparison.
  */
object StatsOps5 {

  /** Two-sample energy distance between the hash-split A/B variants —
    * the omnibus "did the whole distribution move?" statistic that
    * dominates mean-only tests under shape changes (the same split
    * q_cliffs_delta / q_mann_whitney read). The three pairwise-distance
    * sums are computed WITHOUT materializing a single pair: on the
    * per-cents value histogram, Σ|x−y| telescopes into cumulative
    * count/value windows — Σ_v cb(v)·(v·cumA(v) − sumA(v)) counts the
    * x≤y half and the strictly-below twin counts the rest — so the
    * whole statistic is one |D|-sized window pass (|D| = distinct cents,
    * capped by the 2dp money grid, corpus-independent), every sum an
    * exact DECIMAL(38) integer (bounded by n²·max_cents ≈ 10³³ at
    * 10¹⁴ rows), and the only doubles are the three final mean divides
    * and the Székely-Rizzo scaling — identical expression text on both
    * engines. */
  val energyDistance: GraftOp = GraftOp(
    "q_energy_distance",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |h AS (
       |  SELECT cents,
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS HUGEINT) AS ca,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS HUGEINT) AS cb
       |  FROM p GROUP BY 1),
       |w AS (
       |  SELECT cents, ca, cb,
       |    sum(ca) OVER cw AS cum_a, sum(cb) OVER cw AS cum_b,
       |    sum(ca * cents) OVER cw AS vsum_a, sum(cb * cents) OVER cw AS vsum_b
       |  FROM h WINDOW cw AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)),
       |f AS (
       |  SELECT
       |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
       |    CAST(sum(cb * (cents * cum_a - vsum_a)
       |           + ca * (cents * (cum_b - cb) - (vsum_b - cb * cents))) AS DECIMAL(38,0)) AS sxy,
       |    CAST(sum(2 * ca * (cents * (cum_a - ca) - (vsum_a - ca * cents))) AS DECIMAL(38,0)) AS sxx,
       |    CAST(sum(2 * cb * (cents * (cum_b - cb) - (vsum_b - cb * cents))) AS DECIMAL(38,0)) AS syy
       |  FROM w)
       |SELECT na, nb,
       |  2.0 * (CAST(sxy AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
       |    - CAST(sxx AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
       |    - CAST(syy AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)) AS e_stat,
       |  (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
       |    * (2.0 * (CAST(sxy AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
       |      - CAST(sxx AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
       |      - CAST(syy AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE))) AS t_stat
       |FROM f WHERE na > 0 AND nb > 0""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val h = p.groupBy(col("cents"))
      .agg(count(when(col("variant") === "A", 1)).cast(dec).as("ca"),
        count(when(col("variant") === "B", 1)).cast(dec).as("cb"))
    // one cumulative window over the grid-capped cents histogram
    val cw = Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, 0)
    val w = h.select(col("cents"), col("ca"), col("cb"),
      sum(col("ca")).over(cw).as("cum_a"), sum(col("cb")).over(cw).as("cum_b"),
      sum(col("ca") * col("cents")).over(cw).as("vsum_a"),
      sum(col("cb") * col("cents")).over(cw).as("vsum_b"))
    val f = w.agg(
      sum(col("ca")).cast(LongType).as("na"), sum(col("cb")).cast(LongType).as("nb"),
      sum(col("cb") * (col("cents") * col("cum_a") - col("vsum_a"))
        + col("ca") * (col("cents") * (col("cum_b") - col("cb"))
          - (col("vsum_b") - col("cb") * col("cents")))).cast(dec).as("sxy"),
      sum(lit(2) * col("ca") * (col("cents") * (col("cum_a") - col("ca"))
        - (col("vsum_a") - col("ca") * col("cents")))).cast(dec).as("sxx"),
      sum(lit(2) * col("cb") * (col("cents") * (col("cum_b") - col("cb"))
        - (col("vsum_b") - col("cb") * col("cents")))).cast(dec).as("syy"))
    val naD = col("na").cast(DoubleType)
    val nbD = col("nb").cast(DoubleType)
    val eStat = lit(2.0) * (col("sxy").cast(DoubleType) / (naD * nbD)) -
      col("sxx").cast(DoubleType) / (naD * naD) -
      col("syy").cast(DoubleType) / (nbD * nbD)
    f.filter(col("na") > 0 && col("nb") > 0)
      .select(col("na"), col("nb"), eStat.as("e_stat"),
        (naD * nbD / (naD + nbD) * eStat).as("t_stat"))
  }

  /** Page's L test for an ordered alternative over randomized blocks —
    * "does segment revenue trend monotonically across the seven order
    * years, consistently over the five market segments?" The blocked
    * sibling of q_jonckheere (which orders groups, not repeated
    * measures) and the trend-sharpened q_friedman. Treatments = order
    * years in calendar order (ordinal 1..k by dense rank, so the op
    * doesn't bake in the corpus' calendar span), blocks = market
    * segments; within each block the 7 yearly revenue cells are ranked
    * on exact cents (deterministic year tiebreak), L = Σ_year ord·ΣR is
    * an exact integer over a 35-cell frame, and the normal approximation
    * z = (12L − 3bk(k+1)²)/(k(k+1)·√(b(k−1))) is one double expression.
    * Scale shape: one orders⋈customer co-partitioned aggregate down to
    * b·k = 35 cells; everything after is constant-size. */
  val pageTrend: GraftOp = GraftOp(
    "q_page_trend",
    """WITH cell AS (
      |  SELECT c.c_mktsegment AS seg, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT seg, yr,
      |    CAST(dense_rank() OVER (ORDER BY yr) AS BIGINT) AS ord,
      |    CAST(rank() OVER (PARTITION BY seg ORDER BY cents, yr) AS BIGINT) AS rk
      |  FROM cell),
      |l AS (SELECT CAST(sum(ord * rk) AS BIGINT) AS l_stat,
      |             CAST(count(DISTINCT seg) AS BIGINT) AS b,
      |             CAST(count(DISTINCT yr) AS BIGINT) AS k
      |      FROM r)
      |SELECT b, k, l_stat,
      |  (12.0 * CAST(l_stat AS DOUBLE)
      |    - 3.0 * CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
      |      * (CAST(k AS DOUBLE) + 1.0) * (CAST(k AS DOUBLE) + 1.0))
      |  / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
      |    * sqrt(CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))) AS z
      |FROM l""".stripMargin) { (s, d) =>
    val cell = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        year(col("o_orderdate")).cast(LongType).as("yr"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    val r = cell.select(col("seg"), col("yr"),
      // both windows run over the b·k-cell frame (35 rows) — bounded
      dense_rank().over(Window.orderBy(col("yr"))).cast(LongType).as("ord"),
      rank().over(Window.partitionBy(col("seg"))
        .orderBy(col("cents"), col("yr"))).cast(LongType).as("rk"))
    val l = r.agg(sum(col("ord") * col("rk")).cast(LongType).as("l_stat"),
      countDistinct(col("seg")).cast(LongType).as("b"),
      countDistinct(col("yr")).cast(LongType).as("k"))
    val bD = col("b").cast(DoubleType)
    val kD = col("k").cast(DoubleType)
    l.select(col("b"), col("k"), col("l_stat"),
      ((lit(12.0) * col("l_stat").cast(DoubleType)
        - lit(3.0) * bD * kD * (kD + 1.0) * (kD + 1.0))
        / (kD * (kD + 1.0) * sqrt(bD * (kD - 1.0)))).as("z"))
  }

  /** Isotonic (PAVA) calibration of the click→conversion curve — the
    * monotone-regression primitive every probability calibrator
    * (isotonic calibration, reliability diagrams) runs, fitted here
    * WITHOUT the sequential pool-adjacent-violators loop: the fit at
    * bucket i is the minimax closed form max_{j≤i} min_{k≥i}
    * mean(y[j..k]) (Ayer et al. 1955), which turns PAVA into three
    * joins over the score-bucket frame. Every mean is an exact
    * rational compared through the injective key ⌊num·10²⁴/den⌋
    * (distinct rates with denominators ≤10¹² differ by ≥10⁻²⁴, so the
    * scaled floor is a total order — the q_isotonic analogue of the
    * QuantileExact shared-expression discipline). Spark's `div`
    * returns BIGINT and would WRAP a 10²⁴ quotient, so the key is
    * assembled by exact base-10⁶ long division — four BIGINT
    * quotient/remainder steps recombined with overflow-free
    * DECIMAL(38) multiplies — which equals DuckDB's single HUGEINT
    * floor-divide by Euclid; the emitted iso rate is the exact ppm
    * floor of that key plus one double divide. Scale
    * shape: the corpus reduces to one per-user aggregate then a
    * B-bucket frame (B = distinct click counts, count-bounded); the
    * j≤k pair and j≤i≤k triple joins are B² / B³ over broadcast
    * bounded frames — corpus-independent. */
  val isotonic: GraftOp = GraftOp(
    "q_isotonic",
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS label
      |  FROM events GROUP BY 1),
      |b AS (SELECT clicks AS score, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(label) AS BIGINT) AS pos
      |      FROM u GROUP BY 1),
      |c AS (SELECT score, n, pos,
      |    CAST(row_number() OVER (ORDER BY score) AS BIGINT) AS idx,
      |    CAST(sum(n) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn,
      |    CAST(sum(pos) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cump
      |  FROM b),
      |p AS (SELECT j.idx AS ji, k.idx AS ki,
      |    (CAST(k.cump - (j.cump - j.pos) AS HUGEINT) * 1000000000000000000000000)
      |      // (k.cumn - (j.cumn - j.n)) AS mkey
      |  FROM c j JOIN c k ON j.idx <= k.idx),
      |m AS (SELECT i.idx AS idx, p.ji, min(p.mkey) AS mkey
      |      FROM c i JOIN p ON p.ji <= i.idx AND p.ki >= i.idx
      |      GROUP BY 1, 2),
      |iso AS (SELECT idx, max(mkey) AS iso_key FROM m GROUP BY 1)
      |SELECT c.score, c.n, c.pos,
      |  CAST(c.pos * 1000000 // c.n AS BIGINT) AS rate_ppm,
      |  CAST(iso.iso_key // 1000000000000000000 AS BIGINT) AS iso_ppm,
      |  CAST(iso.iso_key // 1000000000000000000 AS DOUBLE) / 1000000.0 AS iso_rate
      |FROM c JOIN iso ON c.idx = iso.idx ORDER BY c.score""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "click", 1)).as("clicks"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).cast(LongType).as("label"))
    val b = u.groupBy(col("clicks").as("score"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
    // windows over the count-bounded score-bucket frame
    val ow = Window.orderBy(col("score"))
    val cw = ow.rowsBetween(Window.unboundedPreceding, 0)
    val c = b.select(col("score"), col("n"), col("pos"),
      row_number().over(ow).cast(LongType).as("idx"),
      sum(col("n")).over(cw).as("cumn"), sum(col("pos")).over(cw).as("cump"))
    val j = c.select(col("idx").as("ji"), (col("cump") - col("pos")).as("p0"),
      (col("cumn") - col("n")).as("n0"))
    val k = c.select(col("idx").as("ki"), col("cump").as("p1"), col("cumn").as("n1"))
    val pairs = broadcast(j).join(k, col("ji") <= col("ki"))
      .select(col("ji"), col("ki"),
        (col("p1") - col("p0")).as("num"), (col("n1") - col("n0")).as("den"))
      .select(col("ji"), col("ki"), col("den"),
        expr("(num * 1000000) div den").as("q1"),
        expr("(num * 1000000) % den").as("r1"))
      .select(col("ji"), col("ki"), col("den"), col("q1"),
        expr("(r1 * 1000000) div den").as("q2"),
        expr("(r1 * 1000000) % den").as("r2"))
      .select(col("ji"), col("ki"), col("den"), col("q1"), col("q2"),
        expr("(r2 * 1000000) div den").as("q3"),
        expr("(r2 * 1000000) % den").as("r3"))
      .select(col("ji"), col("ki"),
        expr("""CAST(q1 AS DECIMAL(38,0)) * 1000000000000000000
               + CAST(q2 AS DECIMAL(38,0)) * 1000000000000
               + CAST(q3 AS DECIMAL(38,0)) * 1000000
               + (r3 * 1000000) div den""").as("mkey"))
    val m = broadcast(c.select(col("idx")))
      .join(pairs, col("ji") <= col("idx") && col("ki") >= col("idx"))
      .groupBy(col("idx"), col("ji")).agg(min(col("mkey")).as("mkey"))
    val iso = m.groupBy(col("idx")).agg(max(col("mkey")).as("iso_key"))
    c.join(iso, "idx")
      .select(col("score"), col("n"), col("pos"),
        expr("pos * 1000000 div n").as("rate_ppm"),
        expr("iso_key div 1000000000000000000").as("iso_ppm"),
        // the display double comes from the exact ppm (≤10⁶, exactly
        // representable) — a raw 10²⁴-key→double cast is 1-ulp
        // engine-dependent
        (expr("iso_key div 1000000000000000000").cast(DoubleType) / lit(1000000.0))
          .as("iso_rate"))
      .orderBy(col("score"))
  }

  /** TOST equivalence test (two one-sided tests, Schuirmann 1987) on
    * purchase value between the hash variants — the A/B family's
    * "prove the variants are the SAME" direction that q_welch_t's
    * difference test cannot give (failing to reject ≠ equivalence).
    * Same exact per-variant state as q_welch_t (n, Σcents, Σcents² —
    * BIGINTs, difference numerators assembled in DECIMAL(38)/HUGEINT),
    * margin δ = ±1.00 currency unit (100 cents); the two one-sided
    * statistics t_lower = (Δ+δ)/se and t_upper = (δ−Δ)/se and the
    * Welch-Satterthwaite df are the only doubles, identical expression
    * text on both engines. Scale shape: one map-side-combining
    * aggregate over the purchase scan — six integers of state. */
  val tost: GraftOp = GraftOp(
    "q_tost",
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
       |      / ((n_b - 1.0) * CAST(n_b AS DOUBLE) * n_b) AS vb,
       |    CAST(CAST(s_b AS HUGEINT) * n_a - CAST(s_a AS HUGEINT) * n_b AS DOUBLE)
       |      / (CAST(n_a AS DOUBLE) * n_b) AS dc
       |  FROM g)
       |SELECT n_a, n_b,
       |  CAST(s_a AS DOUBLE) / n_a / 100.0 AS mean_a,
       |  CAST(s_b AS DOUBLE) / n_b / 100.0 AS mean_b,
       |  dc / 100.0 AS diff,
       |  (dc + 100.0) / sqrt(va + vb) AS t_lower,
       |  (100.0 - dc) / sqrt(va + vb) AS t_upper,
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
      .withColumn("dc",
        expr("""CAST(CAST(s_b AS DECIMAL(38,0)) * n_a - CAST(s_a AS DECIMAL(38,0)) * n_b AS DOUBLE)
          |  / (CAST(n_a AS DOUBLE) * n_b)""".stripMargin))
      .select(col("n_a"), col("n_b"),
        expr("CAST(s_a AS DOUBLE) / n_a / 100.0D").as("mean_a"),
        expr("CAST(s_b AS DOUBLE) / n_b / 100.0D").as("mean_b"),
        expr("dc / 100.0D").as("diff"),
        expr("(dc + 100.0D) / sqrt(va + vb)").as("t_lower"),
        expr("(100.0D - dc) / sqrt(va + vb)").as("t_upper"),
        expr("""(va + vb) * (va + vb)
          | / (va * va / (n_a - 1.0D) + vb * vb / (n_b - 1.0D))""".stripMargin).as("df"))
  }

  /** CVaR / expected shortfall of the order-value tail — the
    * tail-risk companion of q_max_drawdown and q_bollinger: VaR₉₅ is
    * the k-th largest order total (k = ⌈0.05·n⌉, an exact
    * order statistic — rank-defined, so boundary ties cannot change
    * the selected multiset) and CVaR₉₅ is the exact mean of the top-k.
    * Scale shape: the global rank uses the q_kll/QuantileExact
    * range-partition + per-partition-offset discipline (no single-task
    * global sort); the tail sum folds in DECIMAL(38,0) (top-5% cents
    * at 10¹⁴ rows ≈ 10²⁰ > 2⁶³). Emits exact n/k/boundary/tail-sum
    * integers; the two display doubles divide those exact integers
    * with identical expression text on both engines. */
  val cvar: GraftOp = GraftOp(
    "q_cvar",
    """WITH o AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |r AS (
      |  SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rn,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM o)
      |SELECT max(n) AS n,
      |  CAST(count(*) AS BIGINT) AS tail_n,
      |  min(cents) AS var_cents,
      |  CAST(min(cents) AS DOUBLE) / 100.0 AS var_value,
      |  CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS tail_sum,
      |  CAST(CAST(sum(CAST(cents AS HUGEINT)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) / 100.0 AS cvar
      |FROM r WHERE rn > n - ((n * 5 + 99) // 100)""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select((graft.functions.Exprs.dec2(col("o_totalprice")) * 100)
        .cast(LongType).as("cents"))
    val ranked = QuantileExact.rankedUngrouped(s, s"cvar.orders:$d", o, "cents")
    ranked.filter(expr("__rn > __n - ((__n * 5 + 99) div 100)"))
      .agg(
        max(col("__n")).as("n"),
        count(lit(1)).as("tail_n"),
        min(col("cents")).as("var_cents"),
        sum(col("cents").cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("tail_sum"))
      .select(col("n"), col("tail_n"), col("var_cents"),
        expr("CAST(var_cents AS DOUBLE) / 100.0D").as("var_value"),
        col("tail_sum").cast(DoubleType).as("tail_sum"),
        expr("CAST(tail_sum AS DOUBLE) / CAST(tail_n AS DOUBLE) / 100.0D").as("cvar"))
  }

  /** Hodges-Lehmann shift estimator between the hash variants — the
    * EFFECT-SIZE companion of q_mann_whitney (which only tests): the
    * median of all nₐ·n_b pairwise differences B−A, the robust "how
    * much did the distribution move" number (Hodges & Lehmann 1963).
    * Never materializes a pair per row: both sides reduce to their
    * value histograms (grid-capped by the 2dp money domain,
    * corpus-INDEPENDENT), the difference distribution is the
    * |Dₐ|×|D_b| histogram convolution with HUGEINT pair-count weights
    * ca·cb, and the median brackets come from the cumulative-count
    * route with a DIVISION-FREE rank test (2·cum ≥ N + N%2 selects
    * the lower median, 2·cum ≥ N − N%2 + 2 the upper — exact at any
    * N without ⌊(N+1)/2⌋, which would wrap Spark's `div` past 2⁶³).
    * The convolution and bracket selection run DRIVER-side over the
    * two collected histograms — the q_kll discipline: the corpus
    * reduces distributedly to bounded state (here ≤ grid-size rows),
    * and the bounded selection replays exactly on the driver. The
    * measured alternative (a distributed explode convolution) spent
    * 14 s at sf0.1 pushing grid² DECIMAL(38) products through the
    * aggregate's off-fast-path decimal buffers while carrying no
    * information the two bounded histograms don't already hold. Past
    * a domain where |Dₐ|·|D_b| itself is hostile (≫10⁹ grid points)
    * the brackets fall to O(log range) counting probes against the
    * cumulative histograms — the documented escalation path, not
    * needed at a 2dp money grid. */
  val hodgesLehmann: GraftOp = GraftOp(
    "q_hodges_lehmann",
    s"""WITH p AS (
       |  SELECT CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |              THEN 'A' ELSE 'B' END AS variant,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |ha AS (SELECT cents AS va, CAST(count(*) AS HUGEINT) AS ca
       |       FROM p WHERE variant = 'A' GROUP BY 1),
       |hb AS (SELECT cents AS vb, CAST(count(*) AS HUGEINT) AS cb
       |       FROM p WHERE variant = 'B' GROUP BY 1),
       |dh AS (SELECT vb - va AS d, CAST(sum(cb * ca) AS HUGEINT) AS cnt
       |       FROM hb, ha GROUP BY 1),
       |w AS (SELECT d,
       |        sum(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
       |        sum(cnt) OVER () AS np
       |      FROM dh),
       |sel AS (SELECT
       |    CAST(max(np) AS DOUBLE) AS n_pairs,
       |    min(CASE WHEN 2 * cum >= np + np % 2 THEN d END) AS d_lo,
       |    min(CASE WHEN 2 * cum >= np - np % 2 + 2 THEN d END) AS d_hi
       |  FROM w),
       |g AS (SELECT
       |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
       |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b
       |  FROM p)
       |SELECT n_a, n_b, n_pairs, d_lo, d_hi,
       |  CAST(d_lo + d_hi AS DOUBLE) / 200.0 AS hl_shift
       |FROM g, sel""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B").as("variant"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    // Distributed work: the two per-variant value histograms — ONE
    // conditional aggregate over the corpus scan. Both are grid-capped
    // (≤ money-domain cents), so collecting them is bounded by the
    // VALUE DOMAIN, not the corpus — the q_kll discipline (distribute
    // the corpus reduction, replay the bounded selection on the
    // driver). A distributed convolution was measured 14 s at sf0.1:
    // grid² rows of DECIMAL(38) products fall off the unsafe-row fast
    // path (precision > 18), and the pair frame carries no information
    // the two bounded histograms don't already hold.
    val hist = p.groupBy(col("cents")).agg(
        count(when(col("variant") === "A", 1)).as("ca"),
        count(when(col("variant") === "B", 1)).as("cb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nA = hist.map(_._2).sum
    val nB = hist.map(_._3).sum
    // diff histogram in a dense domain-indexed array: |Da|·|Db|
    // multiply-adds, corpus-independent; Math.*Exact makes a
    // >2⁶³-pairs-per-diff overflow loud, never silent
    val as = hist.filter(_._2 > 0); val bs = hist.filter(_._3 > 0)
    val result: (Option[Long], Option[Long], BigInt) =
      if (as.isEmpty || bs.isEmpty) (None, None, BigInt(0))
      else {
        val dMin = bs.head._1 - as.last._1
        val dMax = bs.last._1 - as.head._1
        require(dMax - dMin < (1L << 27),
          s"q_hodges_lehmann: diff grid ${dMax - dMin} exceeds the dense-array bound")
        val acc = new Array[Long]((dMax - dMin + 1).toInt)
        for ((va, ca, _) <- as; (vb, _, cb) <- bs)
          acc((vb - va - dMin).toInt) = Math.addExact(
            acc((vb - va - dMin).toInt), Math.multiplyExact(ca, cb))
        val n = BigInt(nA) * BigInt(nB)
        var cum = BigInt(0)
        var lo = Option.empty[Long]; var hi = Option.empty[Long]
        var i = 0
        while (i < acc.length && hi.isEmpty) {
          cum += acc(i)
          val dv = dMin + i
          if (lo.isEmpty && 2 * cum >= n + (n % 2)) lo = Some(dv)
          if (hi.isEmpty && 2 * cum >= n - (n % 2) + 2) hi = Some(dv)
          i += 1
        }
        (lo, hi, n)
      }
    val (dLo, dHi, nPairs) = result
    val schema = StructType(Seq(
      StructField("n_a", LongType, nullable = false),
      StructField("n_b", LongType, nullable = false),
      StructField("n_pairs", DoubleType, nullable = true),
      StructField("d_lo", LongType, nullable = true),
      StructField("d_hi", LongType, nullable = true),
      StructField("hl_shift", DoubleType, nullable = true)))
    val row = org.apache.spark.sql.Row(
      nA, nB,
      if (as.isEmpty || bs.isEmpty) null
      else java.lang.Double.valueOf(new java.math.BigDecimal(nPairs.bigInteger).doubleValue),
      dLo.map(java.lang.Long.valueOf).orNull,
      dHi.map(java.lang.Long.valueOf).orNull,
      (for (l <- dLo; h <- dHi) yield (l + h).toDouble / 200.0)
        .map(java.lang.Double.valueOf).orNull)
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.List.of(row)), schema)
  }

  /** Wilcoxon signed-rank test on paired per-user spend (first vs
    * second half-month, the q_cuped pre/post split) — the PAIRED
    * continuous test the ladder lacked (q_mcnemar pairs binaries,
    * q_mann_whitney compares independent groups; "did the same users
    * spend differently after the 16th" is neither). Zero differences
    * drop (standard Wilcoxon), |d| gets midranks, W⁺ = Σ ranks of
    * positive d. Exactness: doubled midranks 2R = min_rank + max_rank
    * within each tie group are exact integers read off the global
    * rank; the tie-correction Σ(t³−t) folds in DECIMAL(38); z's
    * n(n+1)(2n+1)/6 term runs in doubles from the exact n (it would
    * wrap BIGINT past n ≈ 1.4·10⁶), identical expression text both
    * engines. Scale shape: one per-user aggregate, then the global
    * |d| rank uses the QuantileExact range-partition +
    * per-partition-offset discipline (the |d| domain is user-sized,
    * NOT grid-capped — a single-task sort window would be the exact
    * anti-pattern r12 retired); tie-group stats are one more shuffle
    * on |d|. */
  val signedRank: GraftOp = GraftOp(
    "q_signed_rank",
    s"""WITH u AS (
       |  SELECT user_id,
       |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
       |      THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS x,
       |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
       |      THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |dd AS (SELECT y - x AS d, abs(y - x) AS a FROM u WHERE y <> x),
       |c AS (
       |  SELECT a, CAST(count(*) AS BIGINT) AS t,
       |    CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS tp
       |  FROM dd GROUP BY 1),
       |s AS (
       |  SELECT a, t, tp,
       |    CAST(1 + coalesce(sum(t) OVER (ORDER BY a
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |  FROM c),
       |g AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS n,
       |    CAST(sum(tp) AS BIGINT) AS n_pos,
       |    CAST(sum(CAST(tp AS HUGEINT) * (2 * start + t - 1)) AS DOUBLE) AS w2_pos,
       |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS DOUBLE) AS t3t
       |  FROM s)
       |SELECT n, n_pos, w2_pos, t3t,
       |  (CAST(w2_pos AS DOUBLE) / 2.0 - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
       |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
       |        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
       |      - CAST(t3t AS DOUBLE) / 48.0) AS z
       |FROM g""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        (coalesce(sum(when(col("event_type") === "purchase" &&
            col("ts") < lit("2024-01-16").cast(TimestampType),
          col("value").cast(DecimalType(18, 2)))), lit(0)) * 100).cast(LongType).as("x"),
        (coalesce(sum(when(col("event_type") === "purchase" &&
            col("ts") >= lit("2024-01-16").cast(TimestampType),
          col("value").cast(DecimalType(18, 2)))), lit(0)) * 100).cast(LongType).as("y"))
    val dd = u.filter(col("y") =!= col("x"))
      .select((col("y") - col("x")).as("d"), abs(col("y") - col("x")).as("a"))
    // global |d| rank without a single-task sort: range-partitioned
    // offsets (the |d| domain scales with users, not the money grid)
    val ranked = QuantileExact.rankedUngrouped(s, s"signedrank.diffs:$d", dd, "a")
    val c = ranked.groupBy(col("a")).agg(
      count(lit(1)).as("t"),
      count(when(col("d") > 0, 1)).as("tp"),
      // 2·midrank of the tie group = min + max of its global ranks
      (min(col("__rn")) + max(col("__rn"))).as("r2"))
    val g = c.agg(
      sum(col("t")).cast(LongType).as("n"),
      sum(col("tp")).cast(LongType).as("n_pos"),
      sum(col("tp").cast(dec) * col("r2")).cast(dec).cast(DoubleType).as("w2_pos"),
      sum(col("t").cast(dec) * col("t") * col("t") - col("t")).cast(dec).cast(DoubleType).as("t3t"))
    g.select(col("n"), col("n_pos"), col("w2_pos"), col("t3t"),
      expr("""(CAST(w2_pos AS DOUBLE) / 2.0D - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0D) / 4.0D)
        | / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0D)
        |     * (2.0D * CAST(n AS DOUBLE) + 1.0D) / 24.0D
        |   - CAST(t3t AS DOUBLE) / 48.0D)""".stripMargin).as("z"))
  }

  /** Decision-stump split quality over the quantity domain — the CART
    * step (Breiman 1984) behind every tree model and every "which
    * threshold separates the classes" feature audit: for each
    * candidate split q (left = l_quantity ≤ q), the weighted Gini
    * PURITY of the returned-vs-kept label, exactly. Gini is used over
    * information gain PRECISELY because it is rational: weighted
    * purity = (ΣcL²·nR + ΣcR²·nL)/(n·nL·nR) is a ratio of exact
    * DECIMAL(38) integers, emitted as an exact floor-ppm plus its raw
    * numerator — entropy's ln() is the libm class §6 bans from emits.
    * The table emits EVERY candidate (the quantity domain is
    * value-bounded at 50), so argmax needs no cross-split rational
    * comparison trick; the n³-sized numerators stay inside
    * DECIMAL(38) to ~10¹⁰ rows and would rescale past that. Scale
    * shape: one histogram aggregate (|domain| rows out of the scan),
    * cumulative windows over the bounded 50-row frame. */
  val giniSplit: GraftOp = GraftOp(
    "q_gini_split",
    """WITH h AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(count(*) AS BIGINT) AS t,
      |    CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS r
      |  FROM lineitem GROUP BY 1),
      |w AS (
      |  SELECT qty,
      |    CAST(sum(t) OVER cw AS BIGINT) AS nl,
      |    CAST(sum(r) OVER cw AS BIGINT) AS rl,
      |    CAST(sum(t) OVER () AS BIGINT) AS n,
      |    CAST(sum(r) OVER () AS BIGINT) AS tr
      |  FROM h WINDOW cw AS (ORDER BY qty ROWS UNBOUNDED PRECEDING)),
      |sp AS (
      |  SELECT qty, nl, n - nl AS nr, rl, tr - rl AS rr,
      |    CAST(CAST(rl AS HUGEINT) * rl + CAST(nl - rl AS HUGEINT) * (nl - rl) AS HUGEINT) AS sl,
      |    CAST(CAST(tr - rl AS HUGEINT) * (tr - rl)
      |       + CAST((n - nl) - (tr - rl) AS HUGEINT) * ((n - nl) - (tr - rl)) AS HUGEINT) AS sr,
      |    n
      |  FROM w WHERE n - nl > 0)
      |SELECT qty AS split_qty, nl, nr, rl, rr,
      |  CAST(CAST(sl * nr + sr * nl AS DECIMAL(38,0)) AS DOUBLE) AS purity_num,
      |  CAST((CAST(sl * nr + sr * nl AS HUGEINT) * 1000000)
      |    // (CAST(n AS HUGEINT) * nl * nr) AS BIGINT) AS purity_ppm
      |FROM sp ORDER BY split_qty""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val h = Tables.lineitem(s, d)
      .groupBy(col("l_quantity").cast(LongType).as("qty"))
      .agg(count(lit(1)).as("t"),
        count(when(col("l_returnflag") === "R", 1)).as("r"))
    // both windows run over the value-bounded quantity histogram
    val cw = Window.orderBy(col("qty")).rowsBetween(Window.unboundedPreceding, 0)
    val tw = Window.orderBy(col("qty"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = h.select(col("qty"),
      sum(col("t")).over(cw).cast(LongType).as("nl"),
      sum(col("r")).over(cw).cast(LongType).as("rl"),
      sum(col("t")).over(tw).cast(LongType).as("n"),
      sum(col("r")).over(tw).cast(LongType).as("tr"))
    w.filter(col("n") - col("nl") > 0)
      .select(col("qty").as("split_qty"), col("nl"),
        (col("n") - col("nl")).as("nr"), col("rl"), (col("tr") - col("rl")).as("rr"),
        col("n"))
      .select(col("split_qty"), col("nl"), col("nr"), col("rl"), col("rr"),
        (col("rl").cast(dec) * col("rl")
          + (col("nl") - col("rl")).cast(dec) * (col("nl") - col("rl"))).as("sl"),
        (col("rr").cast(dec) * col("rr")
          + (col("nr") - col("rr")).cast(dec) * (col("nr") - col("rr"))).as("sr"),
        col("n"))
      .select(col("split_qty"), col("nl"), col("nr"), col("rl"), col("rr"),
        (col("sl") * col("nr") + col("sr") * col("nl")).cast(dec)
          .cast(DoubleType).as("purity_num"),
        expr("""CAST((CAST(sl * nr + sr * nl AS DECIMAL(38,0)) * 1000000)
          | div (CAST(n AS DECIMAL(38,0)) * nl * nr) AS BIGINT)""".stripMargin)
          .as("purity_ppm"))
      .orderBy(col("split_qty"))
  }

  def ops: Seq[GraftOp] =
    Seq(energyDistance, pageTrend, isotonic, tost, cvar, hodgesLehmann,
      signedRank, giniSplit)
}
