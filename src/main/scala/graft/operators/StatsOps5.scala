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

  def ops: Seq[GraftOp] = Seq(energyDistance, pageTrend, isotonic)
}
