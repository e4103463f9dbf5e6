package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixth statistics tier (round 13, continued): RELIABILITY /
  * inter-rater agreement — the label-quality measures every
  * human-annotation or heuristic-labeling pipeline reports before its
  * labels are trusted, which the r7–r13 inference ladder still lacked:
  * Cohen's κ (two raters; Cohen 1960), Fleiss' κ (m raters; Fleiss
  * 1971), and Cronbach's α internal-consistency reliability
  * (Cronbach 1951).
  *
  * The "raters" are deterministic document-quality heuristics (length,
  * word-count, sentence-count thresholds over the documents table) —
  * the exact shape of an LLM-curation labeling stack, where cheap
  * heuristic judges vote and agreement decides which labels are kept.
  *
  * Oracle-parity contract as [[StatsOps5]]: every cross-row fold is an
  * exact integer (DECIMAL(38)/HUGEINT where products scale with n²),
  * the final statistic is ONE double formula over those integers with
  * identical expression text on both engines, and exact floor-ppm
  * twins of each probability are emitted alongside.
  */
object StatsOps6 {

  /** The three deterministic binary "raters" shared by the two kappa
    * ops — identical predicate text on both engines so the agreement
    * ops can never disagree on the votes themselves:
    * A = char length ≥ 300, B = word count ≥ 50 (space count ≥ 49),
    * C = sentence count ≥ 3 (period count ≥ 3). */
  private val sqlRaters =
    """SELECT
      |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
      |    CASE WHEN length(text) - length(replace(text, ' ', '')) >= 49
      |         THEN 1 ELSE 0 END AS rb,
      |    CASE WHEN length(text) - length(replace(text, '.', '')) >= 3
      |         THEN 1 ELSE 0 END AS rc
      |  FROM documents""".stripMargin

  private def sparkRaters(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(
      when(col("n_chars") >= 300, 1).otherwise(0).as("ra"),
      when(length(col("text")) - length(regexp_replace(col("text"), " ", "")) >= 49, 1)
        .otherwise(0).as("rb"),
      when(length(col("text")) - length(regexp_replace(col("text"), "\\.", "")) >= 3, 1)
        .otherwise(0).as("rc"))

  /** Cohen's κ between the length and word-count document raters —
    * chance-corrected two-rater agreement (Cohen 1960), the number a
    * labeling pipeline quotes before trusting cheap judges. The whole
    * statistic reduces to the exact 2×2 contingency (one
    * map-side-combining aggregate over the documents scan — four
    * BIGINTs of state); observed/expected agreement are emitted as
    * exact floor-ppm (po·10⁶//n, pe·10⁶//n²) and
    * κ = (n·po − pe)/(n² − pe) is one double formula whose operands
    * are exact DECIMAL(38)/HUGEINT integers (n² passes 2⁶³ at corpus
    * scale) — identical expression text on both engines. */
  val cohensKappa: GraftOp = GraftOp(
    "q_cohens_kappa",
    s"""WITH r AS (
       |  $sqlRaters),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(*) FILTER (WHERE ra = 1 AND rb = 1) AS BIGINT) AS n11,
       |    CAST(count(*) FILTER (WHERE ra = 1 AND rb = 0) AS BIGINT) AS n10,
       |    CAST(count(*) FILTER (WHERE ra = 0 AND rb = 1) AS BIGINT) AS n01,
       |    CAST(count(*) FILTER (WHERE ra = 0 AND rb = 0) AS BIGINT) AS n00
       |  FROM r),
       |e AS (
       |  SELECT n, n11, n10, n01, n00,
       |    CAST(n11 + n00 AS HUGEINT) AS po_num,
       |    CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
       |      + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS pe_num
       |  FROM g)
       |SELECT n, n11, n10, n01, n00,
       |  CAST(po_num * 1000000 // n AS BIGINT) AS po_ppm,
       |  CAST(pe_num * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm,
       |  CAST(CAST(n AS HUGEINT) * po_num - pe_num AS DOUBLE)
       |    / CAST(CAST(n AS HUGEINT) * n - pe_num AS DOUBLE) AS kappa
       |FROM e""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val g = sparkRaters(s, d).agg(
      count(lit(1)).as("n"),
      count(when(col("ra") === 1 && col("rb") === 1, 1)).as("n11"),
      count(when(col("ra") === 1 && col("rb") === 0, 1)).as("n10"),
      count(when(col("ra") === 0 && col("rb") === 1, 1)).as("n01"),
      count(when(col("ra") === 0 && col("rb") === 0, 1)).as("n00"))
    g.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n11") + col("n00")).cast(dec).as("po_num"),
        ((col("n11") + col("n10")).cast(dec) * (col("n11") + col("n01"))
          + (col("n01") + col("n00")).cast(dec) * (col("n10") + col("n00"))).as("pe_num"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("CAST(po_num * 1000000 div n AS BIGINT)").as("po_ppm"),
        expr("CAST(pe_num * 1000000 div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("pe_ppm"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * po_num - pe_num AS DOUBLE)
               | / CAST(CAST(n AS DECIMAL(38,0)) * n - pe_num AS DOUBLE)""".stripMargin)
          .as("kappa"))
  }

  /** Fleiss' κ over all three document raters — the m-rater
    * generalization (Fleiss 1971) a multi-judge labeling stack needs
    * once a third heuristic votes. With m = 3 and binary categories,
    * each document contributes nᵢ₁ = ra+rb+rc positive votes; the
    * whole statistic reduces to TWO exact integers — S = Σnᵢ₁ and the
    * agreement sum T = Σ(nᵢ₁² + (3−nᵢ₁)² − 3) — folded in one
    * aggregate. P̄o = T/(6N), P̄e = (S² + (3N−S)²)/(9N²), and clearing
    * denominators gives κ = (3N·T − 2E)/(2·(9N² − E)) with
    * E = S² + (3N−S)² — every operand an exact DECIMAL(38)/HUGEINT
    * (N² passes 2⁶³ at corpus scale), κ one double divide with
    * identical expression text on both engines. */
  val fleissKappa: GraftOp = GraftOp(
    "q_fleiss_kappa",
    s"""WITH r AS (
       |  $sqlRaters),
       |v AS (SELECT CAST(ra + rb + rc AS BIGINT) AS p FROM r),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(p) AS BIGINT) AS s,
       |    CAST(sum(p * p + (3 - p) * (3 - p) - 3) AS BIGINT) AS t
       |  FROM v),
       |e AS (
       |  SELECT n, s, t,
       |    CAST(s AS HUGEINT) * s
       |      + CAST(3 * n - s AS HUGEINT) * (3 * n - s) AS pe_num
       |  FROM g)
       |SELECT n, s, t,
       |  CAST(CAST(t AS HUGEINT) * 1000000 // (6 * CAST(n AS HUGEINT)) AS BIGINT) AS po_ppm,
       |  CAST(pe_num * 1000000 // (9 * CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm,
       |  CAST(3 * CAST(n AS HUGEINT) * t - 2 * pe_num AS DOUBLE)
       |    / CAST(2 * (9 * CAST(n AS HUGEINT) * n - pe_num) AS DOUBLE) AS kappa
       |FROM e""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val v = sparkRaters(s, d)
      .select((col("ra") + col("rb") + col("rc")).cast(LongType).as("p"))
    val g = v.agg(
      count(lit(1)).as("n"),
      sum(col("p")).cast(LongType).as("s"),
      sum(col("p") * col("p") + (lit(3) - col("p")) * (lit(3) - col("p")) - 3)
        .cast(LongType).as("t"))
    g.select(col("n"), col("s"), col("t"),
        (col("s").cast(dec) * col("s")
          + (lit(3) * col("n") - col("s")).cast(dec)
            * (lit(3) * col("n") - col("s"))).as("pe_num"))
      .select(col("n"), col("s"), col("t"),
        expr("CAST(CAST(t AS DECIMAL(38,0)) * 1000000 div (6 * CAST(n AS DECIMAL(38,0))) AS BIGINT)")
          .as("po_ppm"),
        expr("CAST(pe_num * 1000000 div (9 * CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("pe_ppm"),
        expr("""CAST(3 * CAST(n AS DECIMAL(38,0)) * t - 2 * pe_num AS DOUBLE)
               | / CAST(2 * (9 * CAST(n AS DECIMAL(38,0)) * n - pe_num) AS DOUBLE)""".stripMargin)
          .as("kappa"))
  }

  /** Cronbach's α internal-consistency reliability of the per-user
    * engagement scale — the k = 5 event-type counts treated as the
    * items of one "engagement" instrument (the classic reliability
    * readout; Cronbach 1951): do the sub-scores move together enough
    * that their sum is a trustworthy single score? α =
    * k/(k−1)·(1 − ΣᵢVᵢ/Vt) with POPULATION variance numerators
    * Vᵢ = n·Σcᵢ² − (Σcᵢ)² and Vt over the summed score — the n-scaled
    * form keeps every fold an exact integer (DECIMAL(38): n·Σs²
    * passes 2⁶³ at corpus scale), ΣVᵢ/Vt is the only double divide
    * (identical expression text both engines), and α's k/(k−1) is the
    * exact literal 1.25. The item list is the pinned event-type
    * domain; a type absent from a user counts 0 (the per-user
    * aggregate's conditional counts, not a pivot join). Scale shape:
    * one per-user aggregate (map-side combining), one 12-integer
    * moment fold — no row ever carries more than the 6 item columns. */
  val cronbachAlpha: GraftOp = GraftOp(
    "q_cronbach",
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS c1,
      |    CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS c2,
      |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS c3,
      |    CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS c4,
      |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS c5
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c1) AS HUGEINT) AS s1, CAST(sum(CAST(c1 AS HUGEINT) * c1) AS HUGEINT) AS q1,
      |    CAST(sum(c2) AS HUGEINT) AS s2, CAST(sum(CAST(c2 AS HUGEINT) * c2) AS HUGEINT) AS q2,
      |    CAST(sum(c3) AS HUGEINT) AS s3, CAST(sum(CAST(c3 AS HUGEINT) * c3) AS HUGEINT) AS q3,
      |    CAST(sum(c4) AS HUGEINT) AS s4, CAST(sum(CAST(c4 AS HUGEINT) * c4) AS HUGEINT) AS q4,
      |    CAST(sum(c5) AS HUGEINT) AS s5, CAST(sum(CAST(c5 AS HUGEINT) * c5) AS HUGEINT) AS q5,
      |    CAST(sum(c1 + c2 + c3 + c4 + c5) AS HUGEINT) AS st,
      |    CAST(sum(CAST(c1 + c2 + c3 + c4 + c5 AS HUGEINT)
      |             * (c1 + c2 + c3 + c4 + c5)) AS HUGEINT) AS qt
      |  FROM u),
      |v AS (
      |  SELECT n,
      |    CAST((n * q1 - s1 * s1) + (n * q2 - s2 * s2) + (n * q3 - s3 * s3)
      |       + (n * q4 - s4 * s4) + (n * q5 - s5 * s5) AS DECIMAL(38,0)) AS v_items,
      |    CAST(n * qt - st * st AS DECIMAL(38,0)) AS v_total
      |  FROM m)
      |SELECT n AS n_users, CAST(5 AS BIGINT) AS k,
      |  CAST(v_items AS DOUBLE) AS v_items, CAST(v_total AS DOUBLE) AS v_total,
      |  1.25 * (1.0 - CAST(v_items AS DOUBLE) / CAST(v_total AS DOUBLE)) AS alpha
      |FROM v""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val u = Tables.events(s, d).groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === types(0), 1)).as("c1"),
        count(when(col("event_type") === types(1), 1)).as("c2"),
        count(when(col("event_type") === types(2), 1)).as("c3"),
        count(when(col("event_type") === types(3), 1)).as("c4"),
        count(when(col("event_type") === types(4), 1)).as("c5"))
    val items = (1 to 5).map(i => col(s"c$i"))
    val tot = items.reduce(_ + _)
    val m = u.agg(
      count(lit(1)).as("n"),
      (1 to 5).flatMap(i => Seq(
        sum(col(s"c$i")).cast(dec).as(s"s$i"),
        sum(col(s"c$i").cast(dec) * col(s"c$i")).cast(dec).as(s"q$i"))) ++ Seq(
        sum(tot).cast(dec).as("st"),
        sum(tot.cast(dec) * tot).cast(dec).as("qt")): _*)
    val vItems = (1 to 5).map(i =>
      col("n") * col(s"q$i") - col(s"s$i") * col(s"s$i")).reduce(_ + _)
    m.select(col("n"),
        vItems.cast(dec).as("v_items"),
        (col("n") * col("qt") - col("st") * col("st")).cast(dec).as("v_total"))
      .select(col("n").as("n_users"), lit(5L).as("k"),
        col("v_items").cast(DoubleType).as("v_items"),
        col("v_total").cast(DoubleType).as("v_total"),
        expr("1.25D * (1.0D - CAST(v_items AS DOUBLE) / CAST(v_total AS DOUBLE))")
          .as("alpha"))
  }

  /** Quade's randomized-block test (Quade 1979) on the segment×year
    * revenue frame — the range-WEIGHTED sibling of q_friedman (which
    * weights every block equally) and q_page_trend (which assumes a
    * monotone alternative): blocks with a wider revenue spread carry
    * proportionally more evidence. Shares q_page_trend's cell frame
    * (seg blocks × order-year treatments, exact summed cents) and its
    * deterministic tiebreaks. Exactness: within-block ranks r and
    * block-range ranks Q are exact integers off bounded windows;
    * doubling the centered score to D = Q·(2r − (k+1)) clears the
    * (k+1)/2 half so A = ΣD² and T² = ΣⱼTⱼ² (Tⱼ = column sums of D)
    * fold as exact BIGINTs, and the doubling cancels in
    * F = (b−1)·T²/(b·A − T²) — one double divide, identical
    * expression text both engines. Scale shape: one orders⋈customer
    * co-partitioned aggregate to b·k = 35 cells; every window after
    * runs on that bounded frame. */
  val quade: GraftOp = GraftOp(
    "q_quade",
    """WITH cell AS (
      |  SELECT c.c_mktsegment AS seg, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |k AS (SELECT CAST(count(DISTINCT yr) AS BIGINT) AS k,
      |             CAST(count(DISTINCT seg) AS BIGINT) AS b FROM cell),
      |rk AS (
      |  SELECT seg, yr, cents,
      |    CAST(rank() OVER (PARTITION BY seg ORDER BY cents, yr) AS BIGINT) AS r
      |  FROM cell),
      |rg AS (
      |  SELECT seg, max(cents) - min(cents) AS rng FROM cell GROUP BY 1),
      |q AS (
      |  SELECT seg, CAST(rank() OVER (ORDER BY rng, seg) AS BIGINT) AS qq FROM rg),
      |dd AS (
      |  SELECT rk.yr, q.qq * (2 * rk.r - (k.k + 1)) AS d
      |  FROM rk JOIN q ON rk.seg = q.seg CROSS JOIN k),
      |tj AS (SELECT yr, CAST(sum(d) AS BIGINT) AS t FROM dd GROUP BY 1),
      |f AS (
      |  SELECT
      |    CAST((SELECT sum(d * d) FROM dd) AS BIGINT) AS a4,
      |    CAST((SELECT sum(t * t) FROM tj) AS BIGINT) AS t4)
      |SELECT b, k, a4, t4,
      |  CAST((b - 1) * t4 AS DOUBLE) / CAST(b * a4 - t4 AS DOUBLE) AS f_stat
      |FROM f CROSS JOIN k""".stripMargin) { (s, d) =>
    val cell = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        year(col("o_orderdate")).cast(LongType).as("yr"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("cents"))
    val kb = cell.agg(countDistinct(col("yr")).cast(LongType).as("k"),
      countDistinct(col("seg")).cast(LongType).as("b"))
    // all windows below run on the bounded b·k cell frame
    val rk = cell.select(col("seg"), col("yr"), col("cents"),
      rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("seg")).orderBy(col("cents"), col("yr")))
        .cast(LongType).as("r"))
    val rg = cell.groupBy(col("seg"))
      .agg((max(col("cents")) - min(col("cents"))).as("rng"))
    val q = rg.select(col("seg"),
      rank().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("rng"), col("seg"))).cast(LongType).as("qq"))
    val dd = rk.join(q, "seg").crossJoin(broadcast(kb))
      .select(col("yr"), (col("qq") * (lit(2) * col("r") - (col("k") + 1))).as("d"))
    val tj = dd.groupBy(col("yr")).agg(sum(col("d")).cast(LongType).as("t"))
    val a4 = dd.agg(sum(col("d") * col("d")).cast(LongType).as("a4"))
    val t4 = tj.agg(sum(col("t") * col("t")).cast(LongType).as("t4"))
    broadcast(kb).crossJoin(broadcast(a4)).crossJoin(broadcast(t4))
      .select(col("b"), col("k"), col("a4"), col("t4"),
        expr("CAST((b - 1) * t4 AS DOUBLE) / CAST(b * a4 - t4 AS DOUBLE)").as("f_stat"))
  }

  /** Brown-Forsythe robust equality-of-spread test (Brown & Forsythe
    * 1974) — q_levene with the group MEDIAN as the center, the
    * variant that stays valid under the skewed distributions real
    * corpora have: is quantity dispersion the same across the three
    * return-flag populations? The whole test runs on the
    * (flag × quantity) histogram — ≤150 cells at ANY corpus size, one
    * aggregate out of the scan. Per-group lower medians are
    * rank-defined off the histogram's cumulative counts
    * (2·cum ≥ n + n%2, the q_hodges_lehmann division-free bracket —
    * ties cannot straddle), deviations z = |qty − med| are exact
    * integers, and the one-way ANOVA on z folds exact
    * DECIMAL(38)/HUGEINT moments with the between-group sum
    * micro-snapped per group ((Σz)²·10⁶ // n, the q_theil_index
    * floor-snap discipline — order-free integer fold, ~10³⁷ at 10¹⁴
    * rows, inside DECIMAL(38)). Emitted per GROUP (the q_anova
    * discipline) with the global F repeated via a broadcast scalar —
    * every integer exact, F one shared-text double formula. */
  val brownForsythe: GraftOp = GraftOp(
    "q_brown_forsythe",
    """WITH h AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT flag, qty, c,
      |    sum(c) OVER (PARTITION BY flag ORDER BY qty ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(c) OVER (PARTITION BY flag) AS ng
      |  FROM h),
      |med AS (
      |  SELECT flag, min(CASE WHEN 2 * cum >= ng + ng % 2 THEN qty END) AS med
      |  FROM w GROUP BY 1),
      |z AS (
      |  SELECT h.flag, abs(h.qty - med.med) AS z, h.c
      |  FROM h JOIN med ON h.flag = med.flag),
      |g AS (
      |  SELECT flag, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CAST(c AS HUGEINT) * z) AS HUGEINT) AS sz,
      |    CAST(sum(CAST(c AS HUGEINT) * z * z) AS DECIMAL(38,0)) AS szz
      |  FROM z GROUP BY 1),
      |gg AS (
      |  SELECT g.flag, g.n, g.sz, g.szz, med.med,
      |    CAST((CAST(g.sz AS HUGEINT) * g.sz * 1000000) // g.n AS DECIMAL(38,0)) AS b_micro
      |  FROM g JOIN med ON g.flag = med.flag),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS grp,
      |    CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sz) AS DECIMAL(38,0)) AS t,
      |    CAST(sum(szz) AS DECIMAL(38,0)) AS szz2,
      |    CAST(sum(b_micro) AS DECIMAL(38,0)) AS sb
      |  FROM gg)
      |SELECT gg.flag, gg.n, gg.med, CAST(gg.sz AS DOUBLE) AS sz,
      |  CAST(gg.szz AS DOUBLE) AS szz,
      |  CAST(gg.b_micro AS DOUBLE) AS b_micro,
      |  ((CAST(sb AS DOUBLE) / 1000000.0 - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(nn AS DOUBLE))
      |      / (CAST(grp AS DOUBLE) - 1.0))
      |    / ((CAST(szz2 AS DOUBLE) - CAST(sb AS DOUBLE) / 1000000.0)
      |      / (CAST(nn AS DOUBLE) - CAST(grp AS DOUBLE))) AS f_stat
      |FROM gg CROSS JOIN tot ORDER BY gg.flag""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val h = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").cast(LongType).as("qty"))
      .agg(count(lit(1)).as("c"))
    // windows over the ≤150-cell (flag × quantity) histogram
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("flag")).orderBy(col("qty"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val nw = org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))
    val w = h.select(col("flag"), col("qty"), col("c"),
      sum(col("c")).over(cw).as("cum"), sum(col("c")).over(nw).as("ng"))
    val med = w.groupBy(col("flag"))
      .agg(min(when(lit(2) * col("cum") >= col("ng") + col("ng") % 2, col("qty")))
        .as("med"))
    val z = h.join(broadcast(med), "flag")
      .select(col("flag"), abs(col("qty") - col("med")).as("z"), col("c"))
    val g = z.groupBy(col("flag")).agg(
      sum(col("c")).cast(LongType).as("n"),
      sum(col("c").cast(dec) * col("z")).cast(dec).as("sz"),
      sum(col("c").cast(dec) * col("z") * col("z")).cast(dec).as("szz"))
    val gg = g.join(broadcast(med), "flag")
      .select(col("flag"), col("n"), col("sz"), col("szz"), col("med"),
        // exact floor division spelled via remainder subtraction kept in
        // DECIMAL(38,0) — Spark's `div` returns BIGINT and would wrap the
        // (Σz)²·10⁶ quotient past 2⁶³ (~10¹⁰ rows/group)
        expr("""CAST(((CAST(sz AS DECIMAL(38,0)) * sz * 1000000)
               |  - (CAST(sz AS DECIMAL(38,0)) * sz * 1000000) % n) / n
               |  AS DECIMAL(38,0))""".stripMargin)
          .as("b_micro"))
    val tot = gg.agg(
      count(lit(1)).as("grp"),
      sum(col("n")).cast(LongType).as("nn"),
      sum(col("sz")).cast(dec).as("t"),
      sum(col("szz")).cast(dec).as("szz2"),
      sum(col("b_micro")).cast(dec).as("sb"))
    gg.crossJoin(broadcast(tot))
      .select(col("flag"), col("n"), col("med"),
        col("sz").cast(DoubleType).as("sz"),
        col("szz").cast(DoubleType).as("szz"),
        col("b_micro").cast(DoubleType).as("b_micro"),
        expr("""((CAST(sb AS DOUBLE) / 1000000.0D - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(nn AS DOUBLE))
               |    / (CAST(grp AS DOUBLE) - 1.0D))
               |  / ((CAST(szz2 AS DOUBLE) - CAST(sb AS DOUBLE) / 1000000.0D)
               |    / (CAST(nn AS DOUBLE) - CAST(grp AS DOUBLE)))""".stripMargin)
          .as("f_stat"))
      .orderBy(col("flag"))
  }

  /** Paired sign test on the q_cuped pre/post per-user spend split —
    * the assumption-FREE floor of the paired ladder (q_signed_rank
    * uses the magnitudes and assumes symmetric differences; the sign
    * test uses only the direction, valid under any continuous paired
    * model): S = #(post > pre) among informative pairs, and the
    * normal approximation z = (2S − n)/√n to the exact
    * Binomial(n, ½) null. Zero differences drop (standard). All
    * state is three exact BIGINTs off one per-user aggregate; z is
    * one double expression, identical text both engines. */
  val signTest: GraftOp = GraftOp(
    "q_sign_test",
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS x,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(18,2)) END), 0) * 100 AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(count(*) FILTER (WHERE y <> x) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (WHERE y > x) AS BIGINT) AS s
      |  FROM u)
      |SELECT n_users, n, s,
      |  CAST(2 * s - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) AS z
      |FROM g""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        (coalesce(sum(when(col("event_type") === "purchase" &&
            col("ts") < lit("2024-01-16").cast(TimestampType),
          col("value").cast(DecimalType(18, 2)))), lit(0)) * 100).cast(LongType).as("x"),
        (coalesce(sum(when(col("event_type") === "purchase" &&
            col("ts") >= lit("2024-01-16").cast(TimestampType),
          col("value").cast(DecimalType(18, 2)))), lit(0)) * 100).cast(LongType).as("y"))
    u.agg(
        count(lit(1)).as("n_users"),
        count(when(col("y") =!= col("x"), 1)).as("n"),
        count(when(col("y") > col("x"), 1)).as("s"))
      .select(col("n_users"), col("n"), col("s"),
        expr("CAST(2 * s - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE))").as("z"))
  }

  /** Croston's method for intermittent demand (Croston 1972) — the
    * forecasting step q_holt/q_holt_winters cannot serve: a sparse
    * per-part demand series (most months zero) needs SEPARATE
    * exponential smoothing of the non-zero demand sizes and of the
    * inter-demand intervals, with forecast z/p demand-per-period (and
    * the Syntetos-Boylan approximation (1−α/2)·z/p correcting
    * Croston's known positive bias). Only non-zero demand months
    * enter the recurrence — the zero months are carried exactly by
    * the month-index gaps, so NO zero-filled spine is materialized.
    * Cross-engine contract: the q_holt sequential-fold discipline —
    * one shuffle to the part key, an in-order fold over the
    * date-BOUNDED series with a 10dp grid snap after every step
    * (Spark aggregate HOF ≡ DuckDB recursive CTE carrying (z, p,
    * prev-index), the SEED state spelled with the same arithmetic
    * text as the step so both engines start from identical doubles),
    * α = 0.3, init z₁ = y₁ / p from the first observed interval;
    * parts with <2 demand months drop (no interval evidence). */
  val croston: GraftOp = GraftOp(
    "q_croston",
    """WITH RECURSIVE m AS (
      |  SELECT l_partkey AS part,
      |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mi,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |d AS (
      |  SELECT part, mi, y,
      |    CAST(row_number() OVER (PARTITION BY part ORDER BY mi) AS BIGINT) AS t
      |  FROM m),
      |n AS (SELECT part, max(t) AS nt FROM d GROUP BY 1 HAVING max(t) >= 2),
      |r(part, t, z, p, pi) AS (
      |  SELECT a.part, CAST(2 AS BIGINT),
      |    floor((0.3 * CAST(b.y AS DOUBLE) + 0.7 * CAST(a.y AS DOUBLE)) * 10000000000.0) / 10000000000.0,
      |    floor((0.3 * CAST(b.mi - a.mi AS DOUBLE) + 0.7 * CAST(b.mi - a.mi AS DOUBLE)) * 10000000000.0) / 10000000000.0,
      |    b.mi
      |  FROM d a JOIN d b ON a.part = b.part AND a.t = 1 AND b.t = 2
      |  UNION ALL
      |  SELECT r.part, r.t + 1,
      |    floor((0.3 * CAST(d.y AS DOUBLE) + 0.7 * r.z) * 10000000000.0) / 10000000000.0,
      |    floor((0.3 * CAST(d.mi - r.pi AS DOUBLE) + 0.7 * r.p) * 10000000000.0) / 10000000000.0,
      |    d.mi
      |  FROM r JOIN d ON d.part = r.part AND d.t = r.t + 1),
      |fin AS (
      |  SELECT r.part, r.z, r.p, n.nt
      |  FROM r JOIN n ON r.part = n.part AND r.t = n.nt)
      |SELECT part AS l_partkey, nt AS n_demands,
      |  CAST(floor(z * 1000000) AS BIGINT) / 1000000.0 AS level,
      |  CAST(floor(p * 1000000) AS BIGINT) / 1000000.0 AS interval,
      |  CAST(floor((z / p) * 1000000) AS BIGINT) / 1000000.0 AS croston,
      |  CAST(floor(0.85 * (z / p) * 1000000) AS BIGINT) / 1000000.0 AS sba
      |FROM fin ORDER BY l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("part"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast(LongType).as("mi"))
      .agg(sum(col("l_quantity").cast(LongType)).cast(LongType).as("y"))
      .groupBy(col("part"))
      .agg(expr("array_sort(collect_list(struct(mi, y)))").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(col("part"), size(col("ss")).cast(LongType).as("n_demands"),
        // seed = the state AFTER step 2, spelled with the same
        // arithmetic text as the recurrence so both engines start
        // from identical doubles
        expr("""aggregate(slice(ss, 3, size(ss) - 2),
          | named_struct(
          |   'z', floor((0.3D * element_at(ss, 2).y + 0.7D * element_at(ss, 1).y) * 10000000000.0D) / 10000000000.0D,
          |   'p', floor((0.3D * CAST(element_at(ss, 2).mi - element_at(ss, 1).mi AS DOUBLE)
          |            + 0.7D * CAST(element_at(ss, 2).mi - element_at(ss, 1).mi AS DOUBLE)) * 10000000000.0D) / 10000000000.0D,
          |   'pi', element_at(ss, 2).mi),
          | (acc, x) -> named_struct(
          |   'z', floor((0.3D * x.y + 0.7D * acc.z) * 10000000000.0D) / 10000000000.0D,
          |   'p', floor((0.3D * CAST(x.mi - acc.pi AS DOUBLE) + 0.7D * acc.p) * 10000000000.0D) / 10000000000.0D,
          |   'pi', x.mi))""".stripMargin).as("st"))
      .select(col("part").as("l_partkey"), col("n_demands"),
        // floor-micro display snaps, not round(…,6): floor on an
        // IDENTICAL double is engine-independent, while the engines'
        // round-to-decimal paths disagree on grid midpoints (one part
        // at sf0.1 hit exactly that lottery on the 0.85 multiply)
        expr("CAST(floor(st.z * 1000000) AS BIGINT) / 1000000.0D").as("level"),
        expr("CAST(floor(st.p * 1000000) AS BIGINT) / 1000000.0D").as("interval"),
        expr("CAST(floor((st.z / st.p) * 1000000) AS BIGINT) / 1000000.0D").as("croston"),
        expr("CAST(floor(0.85D * (st.z / st.p) * 1000000) AS BIGINT) / 1000000.0D").as("sba"))
      .orderBy(col("l_partkey"))
  }

  /** ICC(1,1) intraclass correlation — the GROUP-level member of the
    * reliability family (how much of order-value variance lives
    * BETWEEN customer nations vs within them; the one-way
    * random-effects model, Shrout & Fleiss 1979) with the unbalanced
    * group-size correction k₀ = (N − Σnᵢ²/N)/(a−1). The corpus
    * reduces to 25 bounded nation cells of exact moments (n, Σcents,
    * Σcents² in DECIMAL(38)); the between-groups term Σ Sᵢ²/nᵢ is
    * made an order-free exact fold by per-group FLOOR division
    * (Sᵢ²//nᵢ — integer cents² units; the ≤1-unit-per-group floor is
    * deterministic on both engines and vanishes against the ~10¹⁵
    * sums; staying at unit rather than micro scale keeps Sᵢ² · 10⁶
    * from breaching DECIMAL(38) at corpus scale). MSB/MSW/k₀/ICC are
    * double formulas over the exact integers, identical text both
    * engines. */
  val icc: GraftOp = GraftOp(
    "q_icc",
    """WITH g AS (
      |  SELECT c.c_nationkey AS nation,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT) AS s,
      |    CAST(sum(CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
      |             * CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT) AS ss
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS a,
      |    CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(sum(s) AS DECIMAL(38,0)) AS tt,
      |    CAST(sum(ss) AS DECIMAL(38,0)) AS sst,
      |    sum(CAST(n AS HUGEINT) * n) AS nn2,
      |    CAST(sum((s * s) // n) AS DECIMAL(38,0)) AS sb
      |  FROM g)
      |SELECT a, nn, CAST(nn2 AS DOUBLE) AS nn2, CAST(tt AS DOUBLE) AS tt,
      |  CAST(sst AS DOUBLE) AS sst, CAST(sb AS DOUBLE) AS sb,
      |  ((CAST(sb AS DOUBLE) - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))
      |      / (CAST(a AS DOUBLE) - 1.0)
      |    - (CAST(sst AS DOUBLE) - CAST(sb AS DOUBLE)) / (CAST(nn AS DOUBLE) - CAST(a AS DOUBLE)))
      |  / ((CAST(sb AS DOUBLE) - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))
      |      / (CAST(a AS DOUBLE) - 1.0)
      |    + ((CAST(nn AS DOUBLE) - CAST(nn2 AS DOUBLE) / CAST(nn AS DOUBLE))
      |        / (CAST(a AS DOUBLE) - 1.0) - 1.0)
      |      * (CAST(sst AS DOUBLE) - CAST(sb AS DOUBLE)) / (CAST(nn AS DOUBLE) - CAST(a AS DOUBLE)))
      |  AS icc
      |FROM t""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val cents = (graft.functions.Exprs.dec2(col("o_totalprice")) * 100)
      .cast(LongType)
    val g = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(cents).cast(dec).as("s"),
        sum(cents.cast(dec) * cents).cast(dec).as("ss"))
    val t = g.agg(
      count(lit(1)).as("a"),
      sum(col("n")).cast(LongType).as("nn"),
      sum(col("s")).cast(dec).as("tt"),
      sum(col("ss")).cast(dec).as("sst"),
      // nn2 stays DECIMAL(38,0) to the final double formula — a BIGINT
      // cast would wrap past 2⁶³ once a nation group passes ~3·10⁹ rows
      sum(col("n").cast(dec) * col("n")).cast(dec).as("nn2"),
      // floor(s²/n) without `div` (IntegralDivide's BIGINT result
      // would wrap past 2⁶³ at corpus scale): subtract the remainder,
      // then the decimal divide is exact-integral at scale 6
      sum(expr("CAST((s * s - (s * s) % n) / n AS DECIMAL(38,0))")).cast(dec).as("sb"))
    t.select(col("a"), col("nn"),
      col("nn2").cast(DoubleType).as("nn2"),
      col("tt").cast(DoubleType).as("tt"),
      col("sst").cast(DoubleType).as("sst"),
      col("sb").cast(DoubleType).as("sb"),
      expr("""((CAST(sb AS DOUBLE) - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))
             |    / (CAST(a AS DOUBLE) - 1.0D)
             |  - (CAST(sst AS DOUBLE) - CAST(sb AS DOUBLE)) / (CAST(nn AS DOUBLE) - CAST(a AS DOUBLE)))
             |/ ((CAST(sb AS DOUBLE) - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE))
             |    / (CAST(a AS DOUBLE) - 1.0D)
             |  + ((CAST(nn AS DOUBLE) - CAST(nn2 AS DOUBLE) / CAST(nn AS DOUBLE))
             |      / (CAST(a AS DOUBLE) - 1.0D) - 1.0D)
             |    * (CAST(sst AS DOUBLE) - CAST(sb AS DOUBLE)) / (CAST(nn AS DOUBLE) - CAST(a AS DOUBLE)))""".stripMargin)
        .as("icc"))
  }

  /** Mann-Kendall trend test on the daily event-volume series — the
    * nonparametric "is there ANY monotone trend" monitor (Mann 1945,
    * Kendall 1975) that q_theil_sen's slope and q_page_trend's
    * blocked form both assume an answer to. S = Σ_{i<j} sgn(yⱼ−yᵢ)
    * over the date-BOUNDED day frame — the pair join is |days|²,
    * corpus-independent — an exact BIGINT; the tie-corrected
    * 18·Var(S) = n(n−1)(2n+5) − Σt(t−1)(2t+5) folds exactly off the
    * value-tie histogram; the continuity-corrected z branches on the
    * exact sign of S (CASE over integers, never a double compare).
    * One scan → day counts; everything after runs on the bounded
    * frame. */
  val mannKendall: GraftOp = GraftOp(
    "q_mann_kendall_volume",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |ties AS (
      |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y) v
      |  WHERE t > 1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
      |SELECT n.n AS n_days, s.s AS s_stat,
      |  n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt AS var18,
      |  CASE WHEN s.s > 0 THEN (CAST(s.s AS DOUBLE) - 1.0)
      |         / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt AS DOUBLE) / 18.0)
      |       WHEN s.s < 0 THEN (CAST(s.s AS DOUBLE) + 1.0)
      |         / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt AS DOUBLE) / 18.0)
      |       ELSE 0.0 END AS z
      |FROM n CROSS JOIN s CROSS JOIN ties""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    // the pair join runs on the date-bounded day frame
    val a = daily.select(col("day").as("da"), col("y").as("ya"))
    val b = daily.select(col("day").as("db"), col("y").as("yb"))
    val sS = broadcast(a).join(b, col("da") < col("db"))
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).cast(LongType).as("s"))
    val ties = daily.groupBy(col("y")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)), lit(0L))
        .cast(LongType).as("tt"))
    val n = daily.agg(count(lit(1)).as("n"))
    broadcast(n).crossJoin(broadcast(sS)).crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), col("s").as("s_stat"),
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tt")).as("var18"),
        expr("""CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0D)
               |       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18.0D)
               |     WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0D)
               |       / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tt AS DOUBLE) / 18.0D)
               |     ELSE 0.0D END""".stripMargin).as("z"))
  }

  /** Tabular CUSUM change detection on daily purchase revenue (Page
    * 1954) — the sequential monitor q_mann_kendall's global trend test
    * cannot give ("WHEN did the level shift"): one-sided upper/lower
    * cumulative sums S±_t = max(0, S±_{t−1} ± (x_t − μ₀ − k)) with
    * target μ₀ = the series' own mean and allowance k = μ₀/20 (5%).
    * The whole recurrence is EXACT INTEGER: scaling every sum by 20N
    * clears both rationals — the increment becomes 20N·x_t − 21T
    * (upper) / 19T − 20N·x_t (lower), T = Σx exact cents — so the
    * fold needs no grid snap at all (zero float ops until the two
    * display doubles). Alarm point = the FIRST day attaining the max
    * (deterministic argmax). Scale shape: one scan → the date-bounded
    * day frame; the fold is the q_holt shuffle-free single-series
    * walk (Spark aggregate HOF ≡ DuckDB recursive CTE), state two
    * DECIMAL(38) integers. */
  val cusum: GraftOp = GraftOp(
    "q_cusum_tabular",
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT day, x,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM daily),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS HUGEINT) AS tt FROM d),
      |r(t, su, sl) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)
      |  UNION ALL
      |  SELECT r.t + 1,
      |    greatest(CAST(0 AS HUGEINT), r.su + 20 * g.n * d.x - 21 * g.tt),
      |    greatest(CAST(0 AS HUGEINT), r.sl + 19 * g.tt - 20 * g.n * d.x)
      |  FROM r JOIN d ON d.t = r.t + 1 CROSS JOIN g),
      |mx AS (
      |  SELECT CAST(max(su) AS DECIMAL(38,0)) AS max_up,
      |    CAST(max(sl) AS DECIMAL(38,0)) AS max_down FROM r),
      |al AS (
      |  SELECT
      |    (SELECT min(d.day) FROM r JOIN d ON d.t = r.t
      |      WHERE CAST(r.su AS DECIMAL(38,0)) = mx.max_up AND mx.max_up > 0) AS up_day,
      |    (SELECT min(d.day) FROM r JOIN d ON d.t = r.t
      |      WHERE CAST(r.sl AS DECIMAL(38,0)) = mx.max_down AND mx.max_down > 0) AS down_day
      |  FROM mx)
      |SELECT g.n AS n_days,
      |  CAST(mx.max_up AS DOUBLE) AS max_up, CAST(mx.max_down AS DOUBLE) AS max_down,
      |  CAST(mx.max_up AS DOUBLE) / (20.0 * CAST(g.n AS DOUBLE)) / 100.0 AS cusum_up,
      |  CAST(mx.max_down AS DOUBLE) / (20.0 * CAST(g.n AS DOUBLE)) / 100.0 AS cusum_down,
      |  al.up_day, al.down_day
      |FROM g CROSS JOIN mx CROSS JOIN al""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
        .cast(LongType).as("x"))
    // single date-bounded series: fold once over the sorted day array
    val st = daily
      .agg(expr("array_sort(collect_list(struct(day, x)))").as("ds"))
      .select(col("ds"),
        size(col("ds")).cast(LongType).as("n"),
        expr("aggregate(ds, CAST(0 AS DECIMAL(38,0)), (acc, r) -> acc + r.x)").as("tt"))
      .select(col("n"), col("tt"),
        expr("""aggregate(ds,
          | named_struct('su', CAST(0 AS DECIMAL(38,0)), 'sl', CAST(0 AS DECIMAL(38,0)),
          |   'mu', CAST(0 AS DECIMAL(38,0)), 'ml', CAST(0 AS DECIMAL(38,0)),
          |   'du', CAST(NULL AS DATE), 'dl', CAST(NULL AS DATE),
          |   'n', CAST(size(ds) AS DECIMAL(38,0)),
          |   'tt', aggregate(ds, CAST(0 AS DECIMAL(38,0)), (acc, r) -> acc + r.x)),
          | (a, r) -> named_struct(
          |   'su', greatest(CAST(0 AS DECIMAL(38,0)), a.su + 20 * a.n * r.x - 21 * a.tt),
          |   'sl', greatest(CAST(0 AS DECIMAL(38,0)), a.sl + 19 * a.tt - 20 * a.n * r.x),
          |   'mu', greatest(a.mu, greatest(CAST(0 AS DECIMAL(38,0)), a.su + 20 * a.n * r.x - 21 * a.tt)),
          |   'ml', greatest(a.ml, greatest(CAST(0 AS DECIMAL(38,0)), a.sl + 19 * a.tt - 20 * a.n * r.x)),
          |   'du', CASE WHEN greatest(CAST(0 AS DECIMAL(38,0)), a.su + 20 * a.n * r.x - 21 * a.tt) > a.mu
          |              THEN r.day ELSE a.du END,
          |   'dl', CASE WHEN greatest(CAST(0 AS DECIMAL(38,0)), a.sl + 19 * a.tt - 20 * a.n * r.x) > a.ml
          |              THEN r.day ELSE a.dl END,
          |   'n', a.n, 'tt', a.tt))""".stripMargin).as("st"))
      .select(col("n").as("n_days"),
        col("st.mu").cast(DoubleType).as("max_up"),
        col("st.ml").cast(DoubleType).as("max_down"),
        expr("CAST(st.mu AS DOUBLE) / (20.0D * CAST(n AS DOUBLE)) / 100.0D").as("cusum_up"),
        expr("CAST(st.ml AS DOUBLE) / (20.0D * CAST(n AS DOUBLE)) / 100.0D").as("cusum_down"),
        expr("CASE WHEN st.mu > 0 THEN st.du END").as("up_day"),
        expr("CASE WHEN st.ml > 0 THEN st.dl END").as("down_day"))
    st
  }

  /** Pettitt change-point test (Pettitt 1979) on the daily
    * event-volume series — the rank-based "WHERE does the
    * distribution break" companion to q_cusum's level monitor and
    * q_mann_kendall's trend verdict. U_t = Σ_{i≤t}Σ_{j>t} sgn(xᵢ−xⱼ)
    * computed WITHOUT the n³ triple loop: by sign antisymmetry the
    * within-prefix double sum vanishes, so U_t = Σ_{i≤t} Wᵢ with
    * Wᵢ = Σ_j sgn(xᵢ−xⱼ) — one bounded day×day join plus a cumulative
    * window (spec-pinned against the brute double sum). K = max|U_t|
    * over t<n is an exact BIGINT; the changepoint is the FIRST day
    * attaining it (deterministic argmax); the significance emit is
    * the exact exponent −6K²/(n³+n²) (the p-value's exp() is the
    * libm class the §6 rules keep out of comparisons). */
  val pettitt: GraftOp = GraftOp(
    "q_pettitt_sgn",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT a.day,
      |    CAST(sum(CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1 ELSE 0 END) AS BIGINT) AS wi
      |  FROM daily a JOIN daily b ON TRUE
      |  GROUP BY 1),
      |u AS (
      |  SELECT day,
      |    CAST(sum(wi) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ut,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM w),
      |k AS (
      |  SELECT max(abs(ut)) AS k_stat, max(n) AS n
      |  FROM u WHERE t < n)
      |SELECT k.n AS n_days, k.k_stat,
      |  (SELECT min(u.day) FROM u WHERE abs(u.ut) = k.k_stat AND u.t < u.n) AS cp_day,
      |  -6.0 * CAST(k.k_stat AS DOUBLE) * CAST(k.k_stat AS DOUBLE)
      |    / (CAST(k.n AS DOUBLE) * CAST(k.n AS DOUBLE) * CAST(k.n AS DOUBLE)
      |       + CAST(k.n AS DOUBLE) * CAST(k.n AS DOUBLE)) AS p_exponent
      |FROM k""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    // the day×day join and all windows run on the date-bounded frame
    val a = daily.select(col("day"), col("y").as("ya"))
    val b = daily.select(col("y").as("yb"))
    val w = a.crossJoin(broadcast(b))
      .groupBy(col("day"))
      .agg(sum(when(col("ya") > col("yb"), 1L)
        .when(col("ya") < col("yb"), -1L).otherwise(0L)).cast(LongType).as("wi"))
    val ow = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val u = w.select(col("day"),
      sum(col("wi")).over(ow.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .cast(LongType).as("ut"),
      row_number().over(ow).cast(LongType).as("t"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing))
        .cast(LongType).as("n"))
    val k = u.filter(col("t") < col("n"))
      .agg(max(abs(col("ut"))).as("k_stat"), max(col("n")).as("n"))
    val cp = u.filter(col("t") < col("n"))
      .join(broadcast(k.select(col("k_stat").as("kk"))), abs(col("ut")) === col("kk"))
      .agg(min(col("day")).as("cp_day"))
    broadcast(k).crossJoin(broadcast(cp))
      .select(col("n").as("n_days"), col("k_stat"), col("cp_day"),
        expr("""-6.0D * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE)
               |  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               |     + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))""".stripMargin)
          .as("p_exponent"))
  }

  /** Benford first-digit audit of order totals — the classic
    * data-quality / fraud screen (Newcomb 1881, Benford 1938; the
    * test auditors run on financial corpora): observed first
    * significant digit shares of the exact cent amounts vs the
    * log₁₀(1+1/d) law. The first digit comes from the INTEGER cents'
    * decimal string (substring of CAST(cents AS VARCHAR) — no log10
    * in the extraction path, engine-exact); expected shares are
    * compile-time literals (floor-ppm of log₁₀(1+1/d), embedded
    * identically in both engines' texts — the seededPlanes
    * discipline); emitted PER DIGIT (the q_chi_square discipline) as
    * exact counts, exact observed floor-ppm, the literal expected
    * ppm, and the digit's χ² contribution as one shared-text double
    * formula. One aggregate over the scan → 9 bounded rows. */
  val benford: GraftOp = {
    // log10(1 + 1/d) floor-ppm literals, computed once and embedded
    // in BOTH engine texts so no runtime log10 can diverge
    val expPpm: IndexedSeq[Long] =
      (1 to 9).map(dd => math.floor(math.log10(1.0 + 1.0 / dd) * 1e6).toLong)
    val sqlExp = (1 to 9).map(dd =>
      s"WHEN ${dd} THEN ${expPpm(dd - 1)}").mkString(" ")
    GraftOp(
      "q_benford_cents",
      s"""WITH c AS (
         |  SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders),
         |h AS (
         |  SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM c GROUP BY 1),
         |n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM h)
         |SELECT h.digit, h.obs,
         |  CAST(CAST(h.obs AS HUGEINT) * 1000000 // n.n AS BIGINT) AS obs_ppm,
         |  CAST(CASE h.digit $sqlExp END AS BIGINT) AS exp_ppm,
         |  (CAST(h.obs AS DOUBLE) - CAST(n.n AS DOUBLE) * (CASE h.digit $sqlExp END) / 1000000.0)
         |    * (CAST(h.obs AS DOUBLE) - CAST(n.n AS DOUBLE) * (CASE h.digit $sqlExp END) / 1000000.0)
         |    / (CAST(n.n AS DOUBLE) * (CASE h.digit $sqlExp END) / 1000000.0) AS chi2
         |FROM h CROSS JOIN n ORDER BY h.digit""".stripMargin) { (s, d) =>
      val c = Tables.orders(s, d)
        .select(expr("""CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          | AS STRING), 1, 1) AS BIGINT)""".stripMargin).as("digit"))
      val h = c.groupBy(col("digit")).agg(count(lit(1)).as("obs"))
      val n = h.agg(sum(col("obs")).cast(LongType).as("n"))
      val sparkExp = (1 to 9).map(dd =>
        s"WHEN ${dd} THEN ${expPpm(dd - 1)}").mkString(" ")
      h.crossJoin(broadcast(n))
        .select(col("digit"), col("obs"),
          expr("CAST(CAST(obs AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)").as("obs_ppm"),
          expr(s"CAST(CASE digit $sparkExp END AS BIGINT)").as("exp_ppm"),
          expr(s"""(CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * (CASE digit $sparkExp END) / 1000000.0D)
            | * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * (CASE digit $sparkExp END) / 1000000.0D)
            | / (CAST(n AS DOUBLE) * (CASE digit $sparkExp END) / 1000000.0D)""".stripMargin)
            .as("chi2"))
        .orderBy(col("digit"))
    }
  }

  /** Delete-one-group jackknife of the mean order value (groups =
    * customer nations) — the variance estimator large-scale
    * experimentation infrastructure actually ships (the "delete-a-
    * group" / "bucket" jackknife: recompute the statistic with each
    * of a bounded groups left out, read the spread): the standard
    * answer to "what is the standard error of this corpus-wide mean"
    * when observations are cluster-correlated. Exactness: each
    * leave-one-out mean θ₋g = (T−Sg)/(N−ng) is FLOOR-SNAPPED to
    * exact micro-cents by integral division ((T−Sg)·10⁶ // (N−ng)) so
    * Σθ and Σθ² fold as exact DECIMAL(38) integers across the 25
    * groups (a raw double fold would be order-dependent cross-engine);
    * the variance ((a−1)/a)·(Σθ² − (Σθ)²/a) and SE are one
    * shared-text double formula at the end. Scale shape: one
    * orders⋈customer co-partitioned aggregate to 25 cells. */
  val jackknife: GraftOp = GraftOp(
    "q_jackknife",
    """WITH g AS (
      |  SELECT c.c_nationkey AS nation,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT) AS s
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS a,
      |    CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS HUGEINT) AS tt
      |  FROM g),
      |loo AS (
      |  SELECT t.a, t.nn, t.tt,
      |    CAST(sum(((t.tt - g.s) * 1000000) // (t.nn - g.n)) AS DECIMAL(38,0)) AS sum_loo,
      |    CAST(sum((((t.tt - g.s) * 1000000) // (t.nn - g.n))
      |           * (((t.tt - g.s) * 1000000) // (t.nn - g.n))) AS DECIMAL(38,0)) AS sum_loo2
      |  FROM g CROSS JOIN t GROUP BY 1, 2, 3)
      |SELECT a, nn AS n_orders, CAST(tt AS DOUBLE) AS t_cents,
      |  CAST(sum_loo AS DOUBLE) AS sum_loo, CAST(sum_loo2 AS DOUBLE) AS sum_loo2,
      |  CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0 AS theta_hat,
      |  sqrt(((CAST(a AS DOUBLE) - 1.0) / CAST(a AS DOUBLE))
      |    * (CAST(sum_loo2 AS DOUBLE)
      |       - CAST(sum_loo AS DOUBLE) * CAST(sum_loo AS DOUBLE) / CAST(a AS DOUBLE)))
      |    / 1000000.0 / 100.0 AS jk_se
      |FROM loo""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val cents = (graft.functions.Exprs.dec2(col("o_totalprice")) * 100).cast(LongType)
    val g = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n"), sum(cents).cast(dec).as("s"))
    val t = g.agg(count(lit(1)).as("a"),
      sum(col("n")).cast(LongType).as("nn"), sum(col("s")).cast(dec).as("tt"))
    // floor micro-snap per group via remainder subtraction (the q_icc
    // spelling — IntegralDivide's BIGINT result would wrap at scale)
    val loo = g.crossJoin(broadcast(t))
      .select(col("a"), col("nn"), col("tt"),
        expr("""CAST((((tt - s) * 1000000) - ((tt - s) * 1000000) % (nn - n))
               | / (nn - n) AS DECIMAL(38,0))""".stripMargin).as("th"))
      .groupBy(col("a"), col("nn"), col("tt"))
      .agg(sum(col("th")).cast(dec).as("sum_loo"),
        sum(col("th") * col("th")).cast(dec).as("sum_loo2"))
    loo.select(col("a"), col("nn").as("n_orders"),
      col("tt").cast(DoubleType).as("t_cents"),
      col("sum_loo").cast(DoubleType).as("sum_loo"),
      col("sum_loo2").cast(DoubleType).as("sum_loo2"),
      expr("CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0D").as("theta_hat"),
      expr("""sqrt(((CAST(a AS DOUBLE) - 1.0D) / CAST(a AS DOUBLE))
             |  * (CAST(sum_loo2 AS DOUBLE)
             |     - CAST(sum_loo AS DOUBLE) * CAST(sum_loo AS DOUBLE) / CAST(a AS DOUBLE)))
             |  / 1000000.0D / 100.0D""".stripMargin).as("jk_se"))
  }

  /** User-level permutation test of the A/B purchase-value difference
    * — the exact-null inference q_welch_t approximates with a t
    * distribution, and the deterministic twin of what a bootstrap
    * does with randomness: K = 19 pseudo-random relabelings drawn
    * from seeded portable md5 hashes (`permK:user_id` — the
    * sample_hash discipline: reproducible on any engine, no RNG
    * state), each relabel's mean difference computed from exact
    * integer folds in the SAME single pass (one conditional
    * aggregation, 2(K+1) integers of state), and
    * p = (1 + #{|Δₖ| ≥ |Δ_obs|})/(K+1). The comparisons run on
    * doubles built from exact integers with identical expression
    * text, so both engines compare identical values. Relabeling at
    * the USER level keeps the test honest under within-user
    * correlation (cluster-randomized, like the split itself). K is a
    * compile-time constant; at corpus scale the K md5s per row are
    * the whole cost and scale linearly. */
  val permutationTest: GraftOp = {
    val K = 19
    val sqlAggs = (1 to K).map { k =>
      val h = graft.functions.Exprs.sqlMd5Long(s"'perm$k:' || CAST(user_id AS VARCHAR)")
      s"""CAST(count(*) FILTER (WHERE $h % 2 = 1) AS BIGINT) AS n$k,
         |    CAST(coalesce(sum(cents) FILTER (WHERE $h % 2 = 1), 0) AS HUGEINT) AS s$k""".stripMargin
    }.mkString(",\n    ")
    // |Δk| ≥ |Δobs| indicators over shared-text doubles
    def sqlDiff(nb: String, sb: String, n: String, st: String) =
      s"""(CAST($sb AS DOUBLE) / CAST($nb AS DOUBLE)
         | - CAST($st - $sb AS DOUBLE) / CAST($n - $nb AS DOUBLE))""".stripMargin
    val sqlInd = (1 to K).map { k =>
      s"CASE WHEN abs(${sqlDiff(s"n$k", s"s$k", "n", "st")}) >= abs(${sqlDiff("nb", "sb", "n", "st")}) THEN 1 ELSE 0 END"
    }.mkString(" + ")
    GraftOp(
      "q_permutation_test",
      s"""WITH p AS (
         |  SELECT user_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cents) AS HUGEINT) AS st,
         |    CAST(count(*) FILTER (WHERE ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 1) AS BIGINT) AS nb,
         |    CAST(coalesce(sum(cents) FILTER (WHERE ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 1), 0) AS HUGEINT) AS sb,
         |    $sqlAggs
         |  FROM p)
         |SELECT n, nb, CAST($K AS BIGINT) AS k_perms,
         |  ${sqlDiff("nb", "sb", "n", "st")} / 100.0 AS diff_obs,
         |  CAST($sqlInd AS BIGINT) AS n_extreme,
         |  (1.0 + ($sqlInd)) / ${K + 1}.0 AS p_value
         |FROM g""".stripMargin) { (s, d) =>
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      val dec = DecimalType(38, 0)
      def hash(k: Int) =
        graft.functions.Exprs.md5Long(
          concat(lit(s"perm$k:"), col("user_id").cast(StringType))) % 2 === 1
      val obsHash = graft.functions.Exprs.md5Long(col("user_id").cast(StringType)) % 2 === 1
      val aggs = Seq(
        count(lit(1)).as("n"),
        sum(col("cents")).cast(dec).as("st"),
        count(when(obsHash, 1)).as("nb"),
        coalesce(sum(when(obsHash, col("cents"))), lit(0)).cast(dec).as("sb")) ++
        (1 to K).flatMap { k =>
          Seq(count(when(hash(k), 1)).as(s"n$k"),
            coalesce(sum(when(hash(k), col("cents"))), lit(0)).cast(dec).as(s"s$k"))
        }
      val g = p.agg(aggs.head, aggs.tail: _*)
      def diff(nb: String, sb: String) =
        s"""(CAST($sb AS DOUBLE) / CAST($nb AS DOUBLE)
           | - CAST(st - $sb AS DOUBLE) / CAST(n - $nb AS DOUBLE))""".stripMargin
      val ind = (1 to K).map { k =>
        s"CASE WHEN abs(${diff(s"n$k", s"s$k")}) >= abs(${diff("nb", "sb")}) THEN 1 ELSE 0 END"
      }.mkString(" + ")
      g.select(col("n"), col("nb"), lit(K.toLong).as("k_perms"),
        expr(s"${diff("nb", "sb")} / 100.0D").as("diff_obs"),
        expr(s"CAST($ind AS BIGINT)").as("n_extreme"),
        expr(s"(1.0D + ($ind)) / ${K + 1}.0D").as("p_value"))
    }
  }

  /** Anderson-Darling normality test of the daily event-volume series
    * — the EDF-based normality reading (Anderson & Darling 1954,
    * Stephens 1974's recommended omnibus) next to q_jarque_bera's
    * moment-based one; A-D weights the TAILS, where volume anomalies
    * live. Runs entirely on the date-bounded day frame: per distinct
    * volume the tie-run index weights Σ(2i−1) and Σ(2(n−i)+1) are
    * exact integers off cumulative counts; z is 6dp-snapped before
    * the A-S 7.1.26 erfc polynomial (the q_fdr_bh discipline —
    * identical formula text fed identical snapped inputs), Φ clamped
    * away from {0,1}; each value's w·ln term is floor-snapped to
    * exact micro units so the cross-row sum folds as an order-free
    * BIGINT (the graph_adamic_adar ln-snap discipline), and
    * A² = −n − S/(n·10⁶) is one shared-text double. */
  val andersonDarling: GraftOp = {
    val erfc = (x: String) =>
      s"""(0.254829592 * (1.0 / (1.0 + 0.3275911 * $x))
         |  - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * $x), 2)
         |  + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * $x), 3)
         |  - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * $x), 4)
         |  + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * $x), 5))
         | * exp(-($x) * ($x))""".stripMargin
    val phi =
      s"""CASE WHEN zv >= 0.0 THEN 1.0 - 0.5 * ${erfc("(zv / sqrt(2.0))")}
         |     ELSE 0.5 * ${erfc("(-zv / sqrt(2.0))")} END""".stripMargin
    GraftOp(
      "q_anderson_darling",
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
         |  FROM daily),
         |h AS (
         |  SELECT y, CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(count(*)) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM daily GROUP BY y),
         |z AS (
         |  SELECT h.y, h.c, h.cum, m.n,
         |    CAST(h.cum AS HUGEINT) * h.cum - CAST(h.cum - h.c AS HUGEINT) * (h.cum - h.c) AS w1,
         |    CAST(h.c AS HUGEINT) * (2 * m.n + 1)
         |      - (CAST(h.cum AS HUGEINT) * (h.cum + 1)
         |         - CAST(h.cum - h.c AS HUGEINT) * (h.cum - h.c + 1)) AS w2,
         |    floor(((CAST(h.y AS DOUBLE) - CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))
         |      / sqrt((CAST(m.syy AS DOUBLE)
         |         - CAST(m.sy AS DOUBLE) * CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))
         |        / (CAST(m.n AS DOUBLE) - 1.0))) * 1000000.0) / 1000000.0 AS zv
         |  FROM h CROSS JOIN m),
         |t AS (
         |  SELECT n,
         |    CAST(sum(CAST(floor((CAST(w1 AS DOUBLE)
         |        * ln(greatest(least($phi, 1.0 - 1e-12), 1e-12))
         |      + CAST(w2 AS DOUBLE)
         |        * ln(greatest(least(1.0 - ($phi), 1.0 - 1e-12), 1e-12))) * 1000000.0)
         |      AS BIGINT)) AS DECIMAL(38,0)) AS ssum
         |  FROM z GROUP BY 1)
         |SELECT n AS n_days, CAST(ssum AS DOUBLE) AS ssum,
         |  -CAST(n AS DOUBLE)
         |    - CAST(ssum AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS a2
         |FROM t""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val m = daily.agg(count(lit(1)).as("n"),
        sum(col("y")).cast(LongType).as("sy"),
        sum(col("y").cast(dec) * col("y")).cast(dec).as("syy"))
      // cumulative window over the bounded day-volume histogram
      val cw = org.apache.spark.sql.expressions.Window.orderBy(col("y"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val h = daily.groupBy(col("y")).agg(count(lit(1)).as("c"))
        .select(col("y"), col("c"), sum(col("c")).over(cw).cast(LongType).as("cum"))
      val z = h.crossJoin(broadcast(m))
        .select(col("y"), col("c"), col("cum"), col("n"),
          (col("cum").cast(dec) * col("cum")
            - (col("cum") - col("c")).cast(dec) * (col("cum") - col("c"))).as("w1"),
          (col("c").cast(dec) * (lit(2) * col("n") + 1)
            - (col("cum").cast(dec) * (col("cum") + 1)
               - (col("cum") - col("c")).cast(dec) * (col("cum") - col("c") + 1))).as("w2"),
          // floor-grid snap, not round(,6): round-to-decimal midpoints are
          // the one engine-divergent class (the q_croston lesson)
          expr("""floor(((CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 |  / sqrt((CAST(syy AS DOUBLE)
                 |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 |    / (CAST(n AS DOUBLE) - 1.0D))) * 1000000.0D) / 1000000.0D""".stripMargin).as("zv"))
      val sparkPhi = phi
      val t = z.groupBy(col("n"))
        .agg(expr(
          s"""CAST(sum(CAST(floor((CAST(w1 AS DOUBLE)
             |    * ln(greatest(least($sparkPhi, 1.0 - 1e-12), 1e-12))
             |  + CAST(w2 AS DOUBLE)
             |    * ln(greatest(least(1.0 - ($sparkPhi), 1.0 - 1e-12), 1e-12))) * 1000000.0)
             |  AS BIGINT)) AS DECIMAL(38,0))""".stripMargin).as("ssum"))
      t.select(col("n").as("n_days"), col("ssum").cast(DoubleType).as("ssum"),
        expr("""-CAST(n AS DOUBLE)
               |  - CAST(ssum AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0D)""".stripMargin)
          .as("a2"))
    }
  }

  /** Gumbel extreme-value fit of daily maximum order totals — the
    * capacity-planning readout ("what peak does a 1-in-1000-day
    * event bring") that mean-based forecasting cannot give: block
    * maxima (per calendar day) fitted by method of moments to
    * Gumbel(μ, β) — β = s·√6/π, μ = m − γβ — with every irrational
    * constant (√6/π, Euler-Mascheroni γ, the −ln(−ln p) return-level
    * multipliers for p = .99/.999) PRECOMPUTED in Scala and embedded
    * as the same literal in both engine texts (the q_benford
    * discipline): the only runtime transcendental is sqrt, which
    * IEEE754 requires correctly rounded — so every emitted double is
    * deterministic with NO snap at all. Scale shape: one orders scan
    * → date-bounded daily maxima → exact BIGINT/DECIMAL(38) moments. */
  val gumbelMaxima: GraftOp = {
    val sqrt6OverPi = math.sqrt(6.0) / math.Pi  // 0.779696801...
    val gamma = 0.5772156649015329              // Euler-Mascheroni
    val c99 = -math.log(-math.log(0.99))
    val c999 = -math.log(-math.log(0.999))
    GraftOp(
      "q_gumbel_maxima",
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mx
         |  FROM orders GROUP BY 1),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(mx) AS HUGEINT) AS sm,
         |    CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS smm
         |  FROM daily),
         |f AS (
         |  SELECT n, CAST(sm AS DOUBLE) AS sm, CAST(smm AS DOUBLE) AS smm,
         |    CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean_mx,
         |    sqrt((CAST(smm AS DOUBLE)
         |       - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n AS DOUBLE) - 1.0)) * $sqrt6OverPi AS beta
         |  FROM m)
         |SELECT n AS n_days, sm, smm,
         |  (mean_mx - $gamma * beta) / 100.0 AS mu,
         |  beta / 100.0 AS beta,
         |  (mean_mx - $gamma * beta + beta * $c99) / 100.0 AS return_99,
         |  (mean_mx - $gamma * beta + beta * $c999) / 100.0 AS return_999
         |FROM f""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast(DateType).as("day"))
        .agg(max((graft.functions.Exprs.dec2(col("o_totalprice")) * 100)
          .cast(LongType)).as("mx"))
      val m = daily.agg(count(lit(1)).as("n"),
        sum(col("mx")).cast(dec).as("sm"),
        sum(col("mx").cast(dec) * col("mx")).cast(dec).as("smm"))
      m.select(col("n"),
          col("sm").cast(DoubleType).as("sm"),
          col("smm").cast(DoubleType).as("smm"),
          expr("CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)").as("mean_mx"),
          expr(s"""sqrt((CAST(smm AS DOUBLE)
                  |   - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                  |  / (CAST(n AS DOUBLE) - 1.0D)) * $sqrt6OverPi""".stripMargin).as("beta"))
        .select(col("n").as("n_days"), col("sm"), col("smm"),
          expr(s"(mean_mx - $gamma * beta) / 100.0D").as("mu"),
          expr("beta / 100.0D").as("beta"),
          expr(s"(mean_mx - $gamma * beta + beta * $c99) / 100.0D").as("return_99"),
          expr(s"(mean_mx - $gamma * beta + beta * $c999) / 100.0D").as("return_999"))
    }
  }

  /** Lincoln-Petersen / Chapman capture-recapture estimate of the
    * true user population from two independent "sightings" (clickers
    * and purchasers) — the coverage question a corpus census answers
    * with mark-recapture ("how many users exist beyond the ones any
    * single channel sees"; the same estimator corpus work uses for
    * unseen-duplicate mass): N̂ = (n₁+1)(n₂+1)//(m+1) − 1 (Chapman's
    * bias-corrected form — an exact integer by integral division) and
    * its variance estimate as one shared-text double. One per-user
    * aggregate → three exact BIGINTs. */
  val captureRecapture: GraftOp = GraftOp(
    "q_capture_recapture",
    """WITH u AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
      |  FROM events GROUP BY 1),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_seen,
      |    CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c2) AS BIGINT) AS n2,
      |    CAST(sum(c1 * c2) AS BIGINT) AS m
      |  FROM u)
      |SELECT n_seen, n1, n2, m,
      |  CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS n_hat,
      |  CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) * (n1 - m) * (n2 - m) AS DOUBLE)
      |    / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE) * CAST(m + 2 AS DOUBLE)) AS var_hat
      |FROM g""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val u = Tables.events(s, d).groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("c1"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("c2"))
    u.agg(count(lit(1)).as("n_seen"),
        sum(col("c1")).cast(LongType).as("n1"),
        sum(col("c2")).cast(LongType).as("n2"),
        sum(col("c1") * col("c2")).cast(LongType).as("m"))
      .select(col("n_seen"), col("n1"), col("n2"), col("m"),
        expr("""CAST((CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)
               |  - (CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)) % (m + 1)) / (m + 1)
               |  - 1 AS BIGINT)""".stripMargin).as("n_hat"),
        expr("""CAST(CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1) * (n1 - m) * (n2 - m) AS DOUBLE)
               |  / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE) * CAST(m + 2 AS DOUBLE))""".stripMargin)
          .as("var_hat"))
  }

  /** Matthews correlation coefficient over the same two document
    * raters as q_cohens_kappa (sharing [[sqlRaters]] verbatim, so the
    * two agreement readings can never disagree on the votes) — the
    * balanced-data summary of a 2×2 table that survives extreme class
    * skew where raw accuracy and even κ mislead (the metric of choice
    * for rare-positive labeling audits): MCC = (n11·n00 − n10·n01)/
    * √(r1·r0·c1·c0). The numerator is an exact DECIMAL(38)/HUGEINT
    * (n² scale); the n⁴-scale denominator would breach DECIMAL(38) at
    * corpus scale, so it runs under sqrt in doubles built from the
    * exact marginals — identical expression text both engines. The
    * χ² identity MCC² = χ²/n is emitted alongside as its own shared
    * text. */
  val mcc: GraftOp = GraftOp(
    "q_mcc",
    s"""WITH r AS (
       |  $sqlRaters),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(*) FILTER (WHERE ra = 1 AND rb = 1) AS BIGINT) AS n11,
       |    CAST(count(*) FILTER (WHERE ra = 1 AND rb = 0) AS BIGINT) AS n10,
       |    CAST(count(*) FILTER (WHERE ra = 0 AND rb = 1) AS BIGINT) AS n01,
       |    CAST(count(*) FILTER (WHERE ra = 0 AND rb = 0) AS BIGINT) AS n00
       |  FROM r)
       |SELECT n, n11, n10, n01, n00,
       |  CAST(CAST(n11 AS HUGEINT) * n00 - CAST(n10 AS HUGEINT) * n01 AS DOUBLE) AS mcc_num,
       |  CAST(CAST(n11 AS HUGEINT) * n00 - CAST(n10 AS HUGEINT) * n01 AS DOUBLE)
       |    / sqrt(CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
       |         * CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) AS mcc,
       |  CAST(CAST(n11 AS HUGEINT) * n00 - CAST(n10 AS HUGEINT) * n01 AS DOUBLE)
       |    * CAST(CAST(n11 AS HUGEINT) * n00 - CAST(n10 AS HUGEINT) * n01 AS DOUBLE)
       |    * CAST(n AS DOUBLE)
       |    / (CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
       |       * CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) AS chi2
       |FROM g""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val g = sparkRaters(s, d).agg(
      count(lit(1)).as("n"),
      count(when(col("ra") === 1 && col("rb") === 1, 1)).as("n11"),
      count(when(col("ra") === 1 && col("rb") === 0, 1)).as("n10"),
      count(when(col("ra") === 0 && col("rb") === 1, 1)).as("n01"),
      count(when(col("ra") === 0 && col("rb") === 0, 1)).as("n00"))
    g.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      (col("n11").cast(dec) * col("n00") - col("n10").cast(dec) * col("n01"))
        .cast(dec).cast(DoubleType).as("mcc_num"),
      expr("""CAST(CAST(n11 AS DECIMAL(38,0)) * n00 - CAST(n10 AS DECIMAL(38,0)) * n01 AS DOUBLE)
             |  / sqrt(CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
             |       * CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))""".stripMargin)
        .as("mcc"),
      expr("""CAST(CAST(n11 AS DECIMAL(38,0)) * n00 - CAST(n10 AS DECIMAL(38,0)) * n01 AS DOUBLE)
             |  * CAST(CAST(n11 AS DECIMAL(38,0)) * n00 - CAST(n10 AS DECIMAL(38,0)) * n01 AS DOUBLE)
             |  * CAST(n AS DOUBLE)
             |  / (CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE)
             |     * CAST(n11 + n01 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))""".stripMargin)
        .as("chi2"))
  }

  /** Record-breaking-days audit of daily revenue — the
    * order-statistics stationarity check (Rényi's record theorem:
    * under exchangeability the expected number of running maxima is
    * EXACTLY the harmonic number Hₙ, variance Hₙ − Hₙ⁽²⁾, no
    * distributional assumption at all): records arriving faster than
    * Hₙ says is direct evidence of drift/growth, complementing
    * q_mann_kendall (which needs a monotone signal) and q_cusum
    * (which needs a target). Observed records are exact (strict
    * running max over the date-bounded frame); the harmonic sums fold
    * as exact integers — Σ⌊10⁶/k⌋ micro and Σ⌊10¹²/k²⌋ pico by
    * integral division off the day rank (order-free, engine-exact);
    * z is one shared-text double with the scale corrections inline. */
  val recordBreaks: GraftOp = GraftOp(
    "q_record_breaks",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, x,
      |    max(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k
      |  FROM daily),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (WHERE prevmax IS NULL OR x > prevmax) AS BIGINT) AS n_records,
      |    CAST(sum(1000000 // k) AS BIGINT) AS h1_micro,
      |    CAST(sum(1000000000000 // (k * k)) AS BIGINT) AS h2_pico
      |  FROM w)
      |SELECT n AS n_days, n_records, h1_micro, h2_pico,
      |  (CAST(n_records AS DOUBLE) - CAST(h1_micro AS DOUBLE) / 1000000.0)
      |    / sqrt(CAST(h1_micro AS DOUBLE) / 1000000.0
      |         - CAST(h2_pico AS DOUBLE) / 1000000000000.0) AS z
      |FROM g""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "purchase",
          col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
        .cast(LongType).as("x"))
    // windows over the date-bounded day frame
    val ow = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val w = daily.select(col("day"), col("x"),
      max(col("x")).over(ow.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)).as("prevmax"),
      row_number().over(ow).cast(LongType).as("k"))
    val g = w.agg(
      count(lit(1)).as("n"),
      count(when(col("prevmax").isNull || col("x") > col("prevmax"), 1)).as("n_records"),
      sum(expr("1000000 div k")).cast(LongType).as("h1_micro"),
      sum(expr("1000000000000 div (k * k)")).cast(LongType).as("h2_pico"))
    g.select(col("n").as("n_days"), col("n_records"), col("h1_micro"), col("h2_pico"),
      expr("""(CAST(n_records AS DOUBLE) - CAST(h1_micro AS DOUBLE) / 1000000.0D)
             |  / sqrt(CAST(h1_micro AS DOUBLE) / 1000000.0D
             |       - CAST(h2_pico AS DOUBLE) / 1000000000000.0D)""".stripMargin).as("z"))
  }

  /** Laspeyres / Paasche / Fisher price indices between the corpus'
    * first and last order years — the index-number readout (the CPI
    * construction) that raw revenue growth conflates with volume:
    * per-part unit values p = S/Q over the MATCHED sample (parts
    * trading in both periods, the standard practice). Exactness: the
    * Laspeyres denominator Σp₀q₀ and Paasche numerator Σp₁q₁ collapse
    * to the exact revenue sums ΣS₀/ΣS₁ (p·q of the same period IS
    * revenue); the two cross terms Σp₁q₀ and Σp₀q₁ are per-part
    * rationals floor-snapped to exact micro units (⌊S·Q'·10⁶/Q⌋, the
    * q_theil_index fold discipline — order-free BIGINT sums, inside
    * DECIMAL(38) to ~10¹⁰ rows/part, rescale documented past that);
    * L, P and Fisher's √(L·P) are shared-text doubles. One
    * lineitem scan → per-(part, period) cells → matched join. */
  val priceIndex: GraftOp = GraftOp(
    "q_price_indices",
    """WITH yr AS (
      |  SELECT CAST(min(year(l_shipdate)) AS BIGINT) AS y0,
      |    CAST(max(year(l_shipdate)) AS BIGINT) AS y1
      |  FROM lineitem),
      |pp AS (
      |  SELECT l_partkey AS part, CAST(year(l_shipdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS s
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT a.part, a.q AS q0, a.s AS s0, b.q AS q1, b.s AS s1
      |  FROM pp a JOIN pp b ON a.part = b.part CROSS JOIN yr
      |  WHERE a.yr = yr.y0 AND b.yr = yr.y1 AND a.q > 0 AND b.q > 0),
      |f AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(sum(s0) AS HUGEINT) AS ss0, CAST(sum(s1) AS HUGEINT) AS ss1,
      |    CAST(sum((CAST(s1 AS HUGEINT) * q0 * 1000000) // q1) AS DECIMAL(38,0)) AS p1q0_micro,
      |    CAST(sum((CAST(s0 AS HUGEINT) * q1 * 1000000) // q0) AS DECIMAL(38,0)) AS p0q1_micro
      |  FROM m)
      |SELECT n_parts, CAST(ss0 AS DOUBLE) AS ss0, CAST(ss1 AS DOUBLE) AS ss1,
      |  CAST(p1q0_micro AS DOUBLE) AS p1q0_micro,
      |  CAST(p0q1_micro AS DOUBLE) AS p0q1_micro,
      |  CAST(p1q0_micro AS DOUBLE) / (CAST(ss0 AS DOUBLE) * 1000000.0) AS laspeyres,
      |  (CAST(ss1 AS DOUBLE) * 1000000.0) / CAST(p0q1_micro AS DOUBLE) AS paasche,
      |  sqrt((CAST(p1q0_micro AS DOUBLE) / (CAST(ss0 AS DOUBLE) * 1000000.0))
      |     * ((CAST(ss1 AS DOUBLE) * 1000000.0) / CAST(p0q1_micro AS DOUBLE))) AS fisher
      |FROM f""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val li = Tables.lineitem(s, d)
    val pp = li.groupBy(col("l_partkey").as("part"),
        year(col("l_shipdate")).cast(LongType).as("yr"))
      .agg(sum(col("l_quantity").cast(LongType)).cast(LongType).as("q"),
        sum((graft.functions.Exprs.dec2(col("l_extendedprice")) * 100).cast(LongType))
          .cast(LongType).as("s"))
    val yr = li.agg(min(year(col("l_shipdate"))).cast(LongType).as("y0"),
      max(year(col("l_shipdate"))).cast(LongType).as("y1"))
    val a = pp.select(col("part"), col("yr").as("ya"),
      col("q").as("q0"), col("s").as("s0"))
    val b = pp.select(col("part").as("pb"), col("yr").as("yb"),
      col("q").as("q1"), col("s").as("s1"))
    val a2 = a.crossJoin(broadcast(yr))
      .filter(col("ya") === col("y0") && col("q0") > 0)
    val b2 = b.crossJoin(broadcast(yr).select(col("y1").as("yy1")))
      .filter(col("yb") === col("yy1") && col("q1") > 0)
    val m = a2.join(b2, col("part") === col("pb"))
    val f = m.agg(count(lit(1)).as("n_parts"),
      sum(col("s0")).cast(dec).as("ss0"), sum(col("s1")).cast(dec).as("ss1"),
      // per-part floor snap via remainder subtraction (the q_icc div
      // spelling)
      sum(expr("""CAST(((CAST(s1 AS DECIMAL(38,0)) * q0 * 1000000)
                 |  - (CAST(s1 AS DECIMAL(38,0)) * q0 * 1000000) % q1) / q1
                 | AS DECIMAL(38,0))""".stripMargin)).cast(dec).as("p1q0_micro"),
      sum(expr("""CAST(((CAST(s0 AS DECIMAL(38,0)) * q1 * 1000000)
                 |  - (CAST(s0 AS DECIMAL(38,0)) * q1 * 1000000) % q0) / q0
                 | AS DECIMAL(38,0))""".stripMargin)).cast(dec).as("p0q1_micro"))
    f.select(col("n_parts"),
      col("ss0").cast(DoubleType).as("ss0"),
      col("ss1").cast(DoubleType).as("ss1"),
      col("p1q0_micro").cast(DoubleType).as("p1q0_micro"),
      col("p0q1_micro").cast(DoubleType).as("p0q1_micro"),
      expr("CAST(p1q0_micro AS DOUBLE) / (CAST(ss0 AS DOUBLE) * 1000000.0D)").as("laspeyres"),
      expr("(CAST(ss1 AS DOUBLE) * 1000000.0D) / CAST(p0q1_micro AS DOUBLE)").as("paasche"),
      expr("""sqrt((CAST(p1q0_micro AS DOUBLE) / (CAST(ss0 AS DOUBLE) * 1000000.0D))
             |   * ((CAST(ss1 AS DOUBLE) * 1000000.0D) / CAST(p0q1_micro AS DOUBLE)))""".stripMargin)
        .as("fisher"))
  }

  /** Classical ratio-to-moving-average seasonal indices of monthly
    * revenue — the decomposition step (the X-11 ancestor) behind
    * every "is December really bigger" question q_holt_winters
    * answers parametrically: a centered 12-month moving average
    * (half-weight endpoints) detrends, each month's ratio to its MA
    * is taken, and the ratios average per calendar month. Exactness:
    * the centered MA is kept as the exact integer 24·MA = m₋₆ +
    * 2Σ₋₅..₊₅ + m₊₆ off two bounded window sums; each ratio is
    * floor-snapped to micro (⌊24·m·10⁶/ma24⌋ — integral, order-free)
    * and the per-calendar-month mean is one more exact integral
    * division; the display double derives from the exact micro mean.
    * Everything after the one orders scan runs on the date-bounded
    * month frame. */
  val seasonalityIndex: GraftOp = GraftOp(
    "q_seasonality_index",
    """WITH mo AS (
      |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
      |    CAST(month(o_orderdate) AS BIGINT) AS cal,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS m
      |  FROM orders GROUP BY 1, 2),
      |w AS (
      |  SELECT mi, cal, m,
      |    CAST(sum(m) OVER (ORDER BY mi ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS s11,
      |    CAST(lag(m, 6) OVER (ORDER BY mi) AS BIGINT) AS m_lo,
      |    CAST(lead(m, 6) OVER (ORDER BY mi) AS BIGINT) AS m_hi,
      |    CAST(count(*) OVER (ORDER BY mi ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS c11
      |  FROM mo),
      |r AS (
      |  SELECT cal,
      |    CAST((CAST(m AS HUGEINT) * 24 * 1000000) // (m_lo + 2 * s11 + m_hi) AS BIGINT) AS ratio_micro
      |  FROM w
      |  WHERE m_lo IS NOT NULL AND m_hi IS NOT NULL AND c11 = 11
      |    AND m_lo + 2 * s11 + m_hi > 0),
      |g AS (
      |  SELECT cal, CAST(count(*) AS BIGINT) AS n_ratios,
      |    CAST(sum(ratio_micro) AS BIGINT) AS sum_micro
      |  FROM r GROUP BY 1)
      |SELECT cal AS month, n_ratios, sum_micro,
      |  CAST(sum_micro // n_ratios AS BIGINT) AS index_micro,
      |  CAST(CAST(sum_micro // n_ratios AS BIGINT) AS DOUBLE) / 1000000.0 AS seasonal_index
      |FROM g ORDER BY month""".stripMargin) { (s, d) =>
    val mo = Tables.orders(s, d)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast(LongType).as("mi"),
        month(col("o_orderdate")).cast(LongType).as("cal"))
      .agg((sum(graft.functions.Exprs.dec2(col("o_totalprice"))) * 100)
        .cast(LongType).as("m"))
    // windows over the date-bounded month frame
    val ow = org.apache.spark.sql.expressions.Window.orderBy(col("mi"))
    val fw = ow.rowsBetween(-5, 5)
    val w = mo.select(col("mi"), col("cal"), col("m"),
      sum(col("m")).over(fw).cast(LongType).as("s11"),
      lag(col("m"), 6).over(ow).cast(LongType).as("m_lo"),
      lead(col("m"), 6).over(ow).cast(LongType).as("m_hi"),
      count(lit(1)).over(fw).cast(LongType).as("c11"))
    val r = w.filter(col("m_lo").isNotNull && col("m_hi").isNotNull &&
        col("c11") === 11 &&
        col("m_lo") + lit(2) * col("s11") + col("m_hi") > 0)
      .select(col("cal"),
        expr("CAST((CAST(m AS DECIMAL(38,0)) * 24 * 1000000) div (m_lo + 2 * s11 + m_hi) AS BIGINT)")
          .as("ratio_micro"))
    r.groupBy(col("cal"))
      .agg(count(lit(1)).as("n_ratios"),
        sum(col("ratio_micro")).cast(LongType).as("sum_micro"))
      .select(col("cal").as("month"), col("n_ratios"), col("sum_micro"),
        expr("CAST(sum_micro div n_ratios AS BIGINT)").as("index_micro"),
        expr("CAST(CAST(sum_micro div n_ratios AS BIGINT) AS DOUBLE) / 1000000.0D")
          .as("seasonal_index"))
      .orderBy(col("month"))
  }

  /** Relative risk / odds ratio / risk difference panel for the A/B
    * high-value-purchaser 2×2 (outcome = any purchase ≥ $200 — the
    * base "any purchase" outcome is degenerate on this corpus: every
    * user converts) — the epidemiology-style effect readouts
    * (Katz, Woolf) that the z-test family (q_two_prop, q_fdr_bh's
    * frame) reports significance WITHOUT: RR and OR as exact
    * floor-ppm by integral division plus shared-text doubles, the
    * risk difference as a difference of exact per-arm ppm floors, and
    * the Woolf (log-OR) / Katz (log-RR) standard errors — whose
    * formulas need only reciprocals and sqrt, so no ln ever enters
    * the emit (the caller exponentiates CI bounds; ln is the libm
    * class §6 keeps out of comparisons). One per-user aggregate →
    * four exact BIGINTs. */
  val riskRatio: GraftOp = GraftOp(
    "q_risk_ratio",
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 0 ELSE 1 END AS variant,
       |    max(CASE WHEN event_type = 'purchase'
       |             AND CAST(value AS DECIMAL(18,2)) >= 200 THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT
       |    CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
       |    CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
       |    CAST(sum(conv) FILTER (WHERE variant = 0) AS BIGINT) AS x_a,
       |    CAST(sum(conv) FILTER (WHERE variant = 1) AS BIGINT) AS x_b
       |  FROM u)
       |SELECT n_a, n_b, x_a, x_b,
       |  CAST(CAST(x_a AS HUGEINT) * 1000000 // n_a AS BIGINT) AS risk_a_ppm,
       |  CAST(CAST(x_b AS HUGEINT) * 1000000 // n_b AS BIGINT) AS risk_b_ppm,
       |  CAST(CAST(x_b AS HUGEINT) * 1000000 // n_b AS BIGINT)
       |    - CAST(CAST(x_a AS HUGEINT) * 1000000 // n_a AS BIGINT) AS risk_diff_ppm,
       |  CAST((CAST(x_b AS HUGEINT) * n_a * 1000000) // (CAST(n_b AS HUGEINT) * x_a) AS BIGINT) AS rr_ppm,
       |  CAST((CAST(x_b AS HUGEINT) * (n_a - x_a) * 1000000)
       |    // (CAST(x_a AS HUGEINT) * (n_b - x_b)) AS BIGINT) AS or_ppm,
       |  sqrt(1.0 / CAST(x_a AS DOUBLE) - 1.0 / CAST(n_a AS DOUBLE)
       |     + 1.0 / CAST(x_b AS DOUBLE) - 1.0 / CAST(n_b AS DOUBLE)) AS katz_se,
       |  sqrt(1.0 / CAST(x_a AS DOUBLE) + 1.0 / CAST(n_a - x_a AS DOUBLE)
       |     + 1.0 / CAST(x_b AS DOUBLE) + 1.0 / CAST(n_b - x_b AS DOUBLE)) AS woolf_se
       |FROM g WHERE x_a > 0 AND x_b > 0 AND n_a > x_a AND n_b > x_b""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"),
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(StringType)) % 2 === 0, 0).otherwise(1).as("variant"))
      .agg(max(when(col("event_type") === "purchase" &&
          col("value").cast(DecimalType(18, 2)) >= 200, 1).otherwise(0)).as("conv"))
    val g = u.agg(
      count(when(col("variant") === 0, 1)).as("n_a"),
      count(when(col("variant") === 1, 1)).as("n_b"),
      sum(when(col("variant") === 0, col("conv"))).cast(LongType).as("x_a"),
      sum(when(col("variant") === 1, col("conv"))).cast(LongType).as("x_b"))
    g.filter(col("x_a") > 0 && col("x_b") > 0 &&
        col("n_a") > col("x_a") && col("n_b") > col("x_b"))
      .select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        expr("CAST(CAST(x_a AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT)").as("risk_a_ppm"),
        expr("CAST(CAST(x_b AS DECIMAL(38,0)) * 1000000 div n_b AS BIGINT)").as("risk_b_ppm"),
        expr("""CAST(CAST(x_b AS DECIMAL(38,0)) * 1000000 div n_b AS BIGINT)
               | - CAST(CAST(x_a AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT)""".stripMargin)
          .as("risk_diff_ppm"),
        expr("""CAST((CAST(x_b AS DECIMAL(38,0)) * n_a * 1000000)
               | div (CAST(n_b AS DECIMAL(38,0)) * x_a) AS BIGINT)""".stripMargin).as("rr_ppm"),
        expr("""CAST((CAST(x_b AS DECIMAL(38,0)) * (n_a - x_a) * 1000000)
               | div (CAST(x_a AS DECIMAL(38,0)) * (n_b - x_b)) AS BIGINT)""".stripMargin)
          .as("or_ppm"),
        expr("""sqrt(1.0D / CAST(x_a AS DOUBLE) - 1.0D / CAST(n_a AS DOUBLE)
               |   + 1.0D / CAST(x_b AS DOUBLE) - 1.0D / CAST(n_b AS DOUBLE))""".stripMargin)
          .as("katz_se"),
        expr("""sqrt(1.0D / CAST(x_a AS DOUBLE) + 1.0D / CAST(n_a - x_a AS DOUBLE)
               |   + 1.0D / CAST(x_b AS DOUBLE) + 1.0D / CAST(n_b - x_b AS DOUBLE))""".stripMargin)
          .as("woolf_se"))
  }

  /** Turning-point test for series randomness (Kendall 1976) on
    * daily event volume — the cheapest "is this series i.i.d. noise
    * or does it have structure" screen, reading LOCAL extrema where
    * q_mann_kendall reads global order and q_record_breaks reads
    * running maxima: under exchangeability E[T] = 2(n−2)/3 and
    * Var[T] = (16n−29)/90 exactly. T counts strict interior peaks
    * and troughs off two bounded lag/lead windows (plateau points are
    * not turning points — documented tie handling, identical CASE
    * both engines); clearing denominators makes the z numerator
    * 3T−2(n−2) and variance 90·Var = 16n−29 exact integers, z one
    * shared-text double. */
  val turningPoints: GraftOp = GraftOp(
    "q_turning_points",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, y,
      |    lag(y) OVER (ORDER BY day) AS yp,
      |    lead(y) OVER (ORDER BY day) AS yn
      |  FROM daily),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (WHERE yp IS NOT NULL AND yn IS NOT NULL
      |      AND ((y > yp AND y > yn) OR (y < yp AND y < yn))) AS BIGINT) AS t
      |  FROM w)
      |SELECT n AS n_days, t AS n_turning,
      |  CAST(3 * t - 2 * (n - 2) AS BIGINT) AS z_num3,
      |  CAST(16 * n - 29 AS BIGINT) AS var90,
      |  (CAST(t AS DOUBLE) - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
      |    / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0) AS z
      |FROM g""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    // lag/lead over the date-bounded day frame
    val ow = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val w = daily.select(col("day"), col("y"),
      lag(col("y"), 1).over(ow).as("yp"), lead(col("y"), 1).over(ow).as("yn"))
    val g = w.agg(count(lit(1)).as("n"),
      count(when(col("yp").isNotNull && col("yn").isNotNull &&
        ((col("y") > col("yp") && col("y") > col("yn")) ||
         (col("y") < col("yp") && col("y") < col("yn"))), 1)).as("t"))
    g.select(col("n").as("n_days"), col("t").as("n_turning"),
      (lit(3) * col("t") - lit(2) * (col("n") - 2)).cast(LongType).as("z_num3"),
      (lit(16) * col("n") - 29).cast(LongType).as("var90"),
      expr("""(CAST(t AS DOUBLE) - 2.0D * (CAST(n AS DOUBLE) - 2.0D) / 3.0D)
             |  / sqrt((16.0D * CAST(n AS DOUBLE) - 29.0D) / 90.0D)""".stripMargin).as("z"))
  }

  /** Bartels' rank version of the von Neumann ratio (Bartels 1982) —
    * the RANK-ROBUST serial-independence test completing the
    * randomness pair with q_turning_points (which only sees extrema;
    * Bartels sees any serial dependence): RVN = Σ(Rᵢ−Rᵢ₊₁)²/Σ(Rᵢ−R̄)²
    * over the daily-volume ranks. Exactness: midranks doubled to
    * exact integers (2R = min+max rank within the tie group, the
    * q_spearman discipline — the day frame is bounded so the rank
    * windows are too); the doubling cancels in the ratio, both sums
    * fold as exact DECIMAL(38) integers (NUM = Σ(2Rᵢ−2Rᵢ₊₁)²,
    * DEN = Σ(2Rᵢ)² − (Σ2Rᵢ)²/n cleared by n: n·NUM / (n·Σ(2R)² −
    * (Σ2R)²)), RVN and the z against E=2, Var≈4/n are shared-text
    * doubles. */
  val bartelsRank: GraftOp = GraftOp(
    "q_bartels_rank",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |rk AS (
      |  SELECT day, y,
      |    CAST(rank() OVER (ORDER BY y) AS BIGINT) AS rmin,
      |    CAST(count(*) OVER () - rank() OVER (ORDER BY y DESC) + 1 AS BIGINT) AS rmax
      |  FROM daily),
      |r2 AS (
      |  SELECT day, rmin + rmax AS r2,
      |    lead(rmin + rmax) OVER (ORDER BY day) AS r2n
      |  FROM rk),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN r2n IS NOT NULL
      |      THEN CAST(r2 - r2n AS HUGEINT) * (r2 - r2n) ELSE CAST(0 AS HUGEINT) END) AS DECIMAL(38,0)) AS num,
      |    CAST(sum(CAST(r2 AS HUGEINT) * r2) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(r2) AS DECIMAL(38,0)) AS s
      |  FROM r2)
      |SELECT n AS n_days, CAST(num AS DOUBLE) AS num,
      |  CAST(sq AS DOUBLE) AS sq, CAST(s AS DOUBLE) AS s,
      |  CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS rvn,
      |  (CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) - 2.0)
      |    / sqrt(4.0 / CAST(n AS DOUBLE)) AS z
      |FROM g""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    // rank + lead windows over the date-bounded day frame
    val byY = org.apache.spark.sql.expressions.Window.orderBy(col("y"))
    val byYDesc = org.apache.spark.sql.expressions.Window.orderBy(col("y").desc)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rk = daily.select(col("day"), col("y"),
      rank().over(byY).cast(LongType).as("rmin"),
      (count(lit(1)).over(all) - rank().over(byYDesc) + 1).cast(LongType).as("rmax"))
    val ow = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val r2 = rk.select(col("day"), (col("rmin") + col("rmax")).as("r2"))
      .select(col("day"), col("r2"), lead(col("r2"), 1).over(ow).as("r2n"))
    val g = r2.agg(count(lit(1)).as("n"),
      sum(when(col("r2n").isNotNull,
        (col("r2") - col("r2n")).cast(dec) * (col("r2") - col("r2n")))
        .otherwise(lit(0).cast(dec))).cast(dec).as("num"),
      sum(col("r2").cast(dec) * col("r2")).cast(dec).as("sq"),
      sum(col("r2")).cast(dec).as("s"))
    g.select(col("n").as("n_days"),
      col("num").cast(DoubleType).as("num"),
      col("sq").cast(DoubleType).as("sq"),
      col("s").cast(DoubleType).as("s"),
      expr("""CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
             |  / (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))""".stripMargin)
        .as("rvn"),
      expr("""(CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
             |  / (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) - 2.0D)
             |  / sqrt(4.0D / CAST(n AS DOUBLE))""".stripMargin).as("z"))
  }

  def ops: Seq[GraftOp] =
    Seq(cohensKappa, fleissKappa, cronbachAlpha, quade, brownForsythe, signTest,
      croston, icc, mannKendall, cusum, pettitt, benford, jackknife, permutationTest,
      andersonDarling, gumbelMaxima, captureRecapture, mcc, recordBreaks,
      priceIndex, seasonalityIndex, riskRatio, turningPoints, bartelsRank)
}
