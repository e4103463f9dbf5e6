package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Preference and attribution operators (round 13, continued): the
  * game-theoretic credit-assignment primitives marketing and RLHF
  * pipelines both reach for — exact Shapley-value channel attribution
  * (the axiomatic answer to q_attribution's rule-based splits), and a
  * Bradley-Terry strength fit over pairwise outcomes (the model behind
  * preference-data reward baselines and chess-style ratings).
  *
  * Oracle-parity contract: coalition values and Shapley numerators are
  * exact integers (the k! denominator is multiplied away), shares are
  * exact floor-ppm, and any iterative double arithmetic is unrolled
  * with identical expression text on both engines.
  */
object PrefOps {

  /** Exact Shapley-value attribution over the four pre-conversion
    * channels (click/error/signup/view). Coalition value v(S) = number
    * of converted users whose pre-first-purchase exposure set is
    * CONTAINED in S (the standard set-function lift of touch-point
    * data; Shapley-Shubik over 2⁴ coalitions). With k=4 the factorial
    * weights are multiplied through by 4! so φ·24 = Σ_{S∌i}
    * |S|!(3−|S|)!·(v(S∪i)−v(S)) is an exact BIGINT — no rational
    * arithmetic — and efficiency (Σφ·24 = 24·(v(full)−v(∅))) is a
    * spec-pinned integer identity. Scale shape: one purchase-window
    * aggregate and one user-co-partitioned exposure aggregate reduce
    * the corpus to ≤16 mask counts; everything after runs on 16-row
    * literal frames (the subset-sum join is 16×16). */
  val shapley: GraftOp = GraftOp(
    "q_shapley",
    """WITH fp AS (
      |  SELECT user_id, min(ts) AS p_ts FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |pre AS (
      |  SELECT e.user_id,
      |    CAST(bit_or(CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      |                WHEN 'signup' THEN 4 ELSE 8 END) AS BIGINT) AS mask
      |  FROM events e JOIN fp ON e.user_id = fp.user_id
      |  WHERE e.ts < fp.p_ts AND e.event_type <> 'purchase'
      |  GROUP BY 1),
      |cnt AS (
      |  SELECT coalesce(pre.mask, 0) AS mask, CAST(count(*) AS BIGINT) AS c
      |  FROM fp LEFT JOIN pre ON fp.user_id = pre.user_id GROUP BY 1),
      |s AS (SELECT range AS s FROM range(16)),
      |v AS (
      |  SELECT s.s, CAST(coalesce(sum(cnt.c), 0) AS BIGINT) AS v
      |  FROM s LEFT JOIN cnt ON (s.s & cnt.mask) = cnt.mask GROUP BY 1),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8))
      |       AS t(channel, bit)),
      |phi AS (
      |  SELECT ch.channel, ch.bit,
      |    CAST(sum((CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
      |              ELSE 6 END) * (v1.v - v0.v)) AS BIGINT) AS phi_x24
      |  FROM ch JOIN v v0 ON (v0.s & ch.bit) = 0
      |          JOIN v v1 ON v1.s = v0.s + ch.bit
      |  GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(phi_x24) AS BIGINT) AS t,
      |               (SELECT v FROM v WHERE s = 15) AS v_full,
      |               (SELECT v FROM v WHERE s = 0) AS v_none FROM phi)
      |SELECT p.channel, p.phi_x24,
      |  CASE WHEN tot.t > 0 THEN CAST(p.phi_x24 * 1000000 // tot.t AS BIGINT) END AS share_ppm,
      |  sv.v AS v_solo, tot.v_full, tot.v_none
      |FROM phi p JOIN v sv ON sv.s = p.bit, tot
      |ORDER BY p.channel""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    val pre = ev.filter(col("event_type") =!= "purchase")
      .join(fp, "user_id")
      .filter(col("ts") < col("p_ts"))
      .groupBy(col("user_id"))
      .agg(expr("""bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                   WHEN 'signup' THEN 4 ELSE 8 END)""").cast(LongType).as("mask"))
    // r17, guide §2.4: everything below runs on ≤16 mask counts, but
    // SIX subplans (v0/v1 broadcasts, tot's two coalition filters,
    // v_solo, phi's own agg) chain back through cnt to the events
    // purchase-window aggregate — each broadcast subtree re-derived
    // the corpus scan. Persist the 16-row census; every coalition
    // frame then starts at a cached 16-row scan.
    val cnt = graft.CachedPlans.cached(s, s"shapley.cnt:$d")(
      fp.join(pre, Seq("user_id"), "left")
        .groupBy(coalesce(col("mask"), lit(0L)).as("mask"))
        .agg(count(lit(1)).as("c")))
    // ≤16 mask counts from here on: literal coalition frames
    val sFrame = s.range(16).select(col("id").as("s"))
    val v = sFrame.join(broadcast(cnt),
        (col("s").bitwiseAND(col("mask")) === col("mask")), "left")
      .groupBy(col("s")).agg(coalesce(sum(col("c")), lit(0L)).cast(LongType).as("v"))
    val ch = s.createDataFrame(Seq(("click", 1L), ("error", 2L), ("signup", 4L), ("view", 8L)))
      .toDF("channel", "bit")
    val v0 = v.select(col("s").as("s0"), col("v").as("va"))
    val v1 = v.select(col("s").as("s1"), col("v").as("vb"))
    val phi = ch.join(broadcast(v0), col("s0").bitwiseAND(col("bit")) === 0)
      .join(broadcast(v1), col("s1") === col("s0") + col("bit"))
      .groupBy(col("channel"), col("bit"))
      .agg(sum((when(expr("bit_count(s0)") === 0, 6)
        .when(expr("bit_count(s0)") === 1, 2)
        .when(expr("bit_count(s0)") === 2, 2).otherwise(6))
        * (col("vb") - col("va"))).cast(LongType).as("phi_x24"))
    val tot = broadcast(phi.agg(sum(col("phi_x24")).cast(LongType).as("t"))
      .crossJoin(v.filter(col("s") === 15).select(col("v").as("v_full")))
      .crossJoin(v.filter(col("s") === 0).select(col("v").as("v_none"))))
    phi.join(broadcast(v.select(col("s"), col("v").as("v_solo"))), col("s") === col("bit"))
      .crossJoin(tot)
      .select(col("channel"), col("phi_x24"),
        when(col("t") > 0, expr("phi_x24 * 1000000 div t")).as("share_ppm"),
        col("v_solo"), col("v_full"), col("v_none"))
      .orderBy(col("channel"))
  }

  def ops: Seq[GraftOp] = Seq(shapley)
}
