package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics in the reference's target-warehouse idiom —
  * the query families a ClickHouse-backed event pipeline serves daily
  * (latest-state lookup, funnels, cohort retention, gap-filled
  * series). The reference ships events INTO such a warehouse
  * (KafakToClickhouse.scala); these are the reads the other side of
  * that pipe exists for, re-expressed as Spark plans.
  *
  * Parity rules: all time math is integer day indexes
  * (`datediff` from a fixed epoch date) — no week/tz conventions to
  * disagree on — and counts are exact longs.
  */
object EventsAnalytics {

  /** Config key gating the exact→HLL route for the trailing-distinct
    * family (q_stickiness / q_trailing_active): inputs whose scan
    * estimate exceeds this many bytes take the sketch twin. Unset =
    * always exact. Declared ABOVE every GraftOp val (object-init
    * order). */
  private[graft] val TrailingApproxKey = "spark.graft.approx.trailing.maxExactBytes"
  private[graft] val PercentileApproxKey = "spark.graft.approx.percentile.maxExactBytes"

  /** Per-day HLL sketches of the active-user set — the shared build
    * for every sketch-twin trailing plan: ONE fact scan, |days| 4 KB
    * sketches out. */
  private def dailyUserSketches(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"),
        col("user_id"))
      .groupBy(col("day_idx"))
      .agg(graft.functions.hll_sketch_agg(col("user_id")).as("sk"))

  /** Trailing-7-day merged-sketch estimate per day, emitted under
    * `outName` — each day's SKETCH (not its users) replicates to the 7
    * windows it serves, so the merge shuffle carries |days|×7 kilobyte
    * rows independent of user volume. */
  private def trailingSketch(s: org.apache.spark.sql.SparkSession, d: String,
      outName: String): DataFrame = {
    val daily = dailyUserSketches(s, d)
    val bounds = daily.agg(max(col("day_idx")).as("hi"))
    daily
      .select(explode(sequence(col("day_idx"), col("day_idx") + 6)).as("day"), col("sk"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("hi"))
      .groupBy(col("day").cast(IntegerType).as("day_idx"))
      .agg(graft.functions.hll_merge_agg(col("sk")).as(outName))
      .orderBy(col("day_idx"))
  }

  /** Latest event per user — ClickHouse `argMax`/ReplacingMergeTree
    * "current state" semantics. A single hash aggregation with a
    * lexicographic struct max: partial aggregation folds map-side, so
    * the shuffle carries one row per user, not the event stream (the
    * window-function formulation would sort every event through the
    * exchange). (ts, event_id) is unique → deterministic. */
  val latestPerKey: GraftOp = GraftOp(
    "q_latest_per_key",
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |  event_type AS last_type, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("m"))
      .select(col("user_id"), col("m.ts").as("last_ts"), col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"), col("m.value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** Ordered 3-step funnel (ClickHouse `windowFunnel` shape):
    * signup → first view strictly after it → first purchase strictly
    * after that. Each stage is a per-user aggregate joined to the
    * previous stage's timestamps; all joins are on user_id, so at
    * scale the three stages co-partition onto one exchange and the
    * final depth histogram is five rows. */
  val funnel: GraftOp = GraftOp(
    "q_funnel",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
      |d AS (
      |  SELECT u.user_id,
      |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth
      |  FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |         LEFT JOIN s3 USING (user_id))
      |SELECT depth, count(*) AS n_users FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    funnelDepths(Tables.events(s, d))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  /** Per-user funnel depth frame (user_id, depth) — the shared
    * signup→view→purchase stage construction q_funnel and q_ab_funnel
    * both aggregate; one definition so the two can't drift. */
  private def funnelDepths(ev: DataFrame): DataFrame = {
    val u = ev.select(col("user_id")).distinct()
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.join(s1, Seq("user_id"))
      .filter(col("event_type") === "view" && col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.join(s2, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    u.join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("depth"))
  }

  /** A/B experiment readout: users assigned to variants by the
    * portable hash (the deterministic bucketing every experimentation
    * platform uses — assignment is reproducible, append-stable, and
    * balanced in expectation), then the 3-step funnel depth tallied
    * per variant — the conversion comparison an experiment exists to
    * answer. Same co-partitioned per-user funnel stages as q_funnel;
    * the variant tag is a pure map, so the experiment dimension adds
    * ZERO extra shuffles. */
  val abFunnel: GraftOp = GraftOp(
    "q_ab_funnel",
    s"""WITH v AS (
       |  SELECT DISTINCT user_id,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(user_id AS VARCHAR)")} % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant
       |  FROM events),
       |s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
       |       WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
       |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
       |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
       |d AS (
       |  SELECT v.user_id, v.variant,
       |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
       |         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth
       |  FROM v LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       |         LEFT JOIN s3 USING (user_id))
       |SELECT variant, depth, count(*) AS n_users FROM d
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val variant =
      when(graft.functions.Exprs.md5Long(
        col("user_id").cast(StringType)) % 2 === 0, "A").otherwise("B")
    funnelDepths(Tables.events(s, d))
      .groupBy(variant.as("variant"), col("depth")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("variant"), col("depth"))
  }

  /** Cohort retention: users grouped by first-active day, counted on
    * each later active day as an offset from their cohort day. Two
    * user_id aggregations and one join — the (cohort, offset) matrix
    * is |days|² rows no matter the corpus size. Day indexes are
    * `datediff` from 2024-01-01 (integer; no tz/week conventions). */
  val retention: GraftOp = GraftOp(
    "q_retention",
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      |  FROM events),
      |c AS (SELECT user_id, min(day_idx) AS cohort_day FROM a GROUP BY 1)
      |SELECT cohort_day, CAST(day_idx - cohort_day AS BIGINT) AS offset_day,
      |  count(DISTINCT a.user_id) AS n_active
      |FROM a JOIN c ON a.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val active = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"))
      .distinct()
    val cohort = active.groupBy(col("user_id")).agg(min(col("day_idx")).as("cohort_day"))
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day_idx") - col("cohort_day")).cast(LongType).as("offset_day"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("offset_day"))
  }

  /** Daily new vs returning actives — the acquisition/retention split
    * on every product dashboard: a user counts as NEW on their first
    * active day, RETURNING on later ones. One distinct (user, day)
    * projection, the first-day aggregate joined back on the user key
    * (co-partitioned), then a day rollup — |days| output rows
    * regardless of event volume. */
  val newVsReturning: GraftOp = GraftOp(
    "q_new_returning",
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      |  FROM events),
      |f AS (SELECT user_id, min(day_idx) AS first_day FROM a GROUP BY 1)
      |SELECT CAST(a.day_idx AS INT) AS day_idx,
      |  CAST(sum(CASE WHEN a.day_idx = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
      |  CAST(sum(CASE WHEN a.day_idx > first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val a = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"))
      .distinct()
    val f = a.groupBy(col("user_id")).agg(min(col("day_idx")).as("first_day"))
    a.join(f, Seq("user_id"))
      .groupBy(col("day_idx").cast(IntegerType).as("day_idx"))
      .agg(sum(when(col("day_idx") === col("first_day"), 1).otherwise(0)).cast(LongType)
        .as("new_users"),
        sum(when(col("day_idx") > col("first_day"), 1).otherwise(0)).cast(LongType)
          .as("returning_users"))
      .orderBy(col("day_idx"))
  }

  /** DAU/WAU stickiness per day — "what fraction of the week's users
    * showed up today", the engagement-quality ratio next to raw
    * actives. DAU is the day's distinct users; WAU reuses the
    * trailing-7-day explode (each active day serves the 7 windows it
    * falls in). Both counts are exact ints; the one divide is
    * correctly rounded and snapped at 6dp. */
  val stickiness: GraftOp = GraftOp(
    "q_stickiness",
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      |  FROM events),
      |dau AS (SELECT day_idx, count(*) AS dau FROM a GROUP BY 1),
      |win AS (
      |  SELECT w.day, a.user_id
      |  FROM a, LATERAL (SELECT unnest(range(a.day_idx, a.day_idx + 7)) AS day) w),
      |wau AS (
      |  SELECT CAST(day AS INT) AS day_idx, count(DISTINCT user_id) AS wau
      |  FROM win WHERE day <= (SELECT max(day_idx) FROM a) GROUP BY 1)
      |SELECT CAST(dau.day_idx AS INT) AS day_idx, CAST(dau AS BIGINT) AS dau,
      |  CAST(wau AS BIGINT) AS wau,
      |  CAST(dau AS DOUBLE) / wau AS stickiness
      |FROM dau JOIN wau ON dau.day_idx = wau.day_idx
      |ORDER BY 1""".stripMargin) { (s, d) =>
    ApproxRouting.route(s, TrailingApproxKey, "q_stickiness", Tables.events(s, d))(
      stickinessExactPlan(s, d))(stickinessSketchPlan(s, d))
  }

  private[operators] def stickinessExactPlan(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val a = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"))
      .distinct()
    val dau = a.groupBy(col("day_idx")).agg(count(lit(1)).as("dau"))
    val hi = a.agg(max(col("day_idx")).as("hi"))
    val wau = a
      .select(explode(sequence(col("day_idx"), col("day_idx") + 6)).as("day"), col("user_id"))
      .crossJoin(broadcast(hi))
      .filter(col("day") <= col("hi"))
      .groupBy(col("day").cast(IntegerType).as("day_idx"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.select(col("day_idx").cast(IntegerType).as("day_idx"), col("dau"))
      .join(wau, Seq("day_idx"))
      .select(col("day_idx"), col("dau").cast(LongType).as("dau"),
        col("wau").cast(LongType).as("wau"),
        (col("dau").cast(DoubleType) / col("wau")).as("stickiness")) // r11: raw exact-int ratio
      .orderBy(col("day_idx"))
  }

  /** Sketch twin of [[stickinessExactPlan]]: DAU and WAU both come
    * from the per-day sketches (DAU = each day's own estimate, WAU =
    * the 7-day merge), so ONE fact scan feeds both and the shuffles
    * carry kilobytes. Same schema; ±1.6% RSE estimates. */
  private[operators] def stickinessSketchPlan(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val dau = dailyUserSketches(s, d)
      .select(col("day_idx").cast(IntegerType).as("day_idx"),
        graft.functions.hll_estimate(col("sk")).as("dau"))
    dau.join(trailingSketch(s, d, "wau"), Seq("day_idx"))
      .select(col("day_idx"), col("dau").cast(LongType).as("dau"),
        col("wau").cast(LongType).as("wau"),
        (col("dau").cast(DoubleType) / col("wau")).as("stickiness")) // r11: raw exact-int ratio
      .orderBy(col("day_idx"))
  }

  /** Daily-volume anomaly days — which DAYS were abnormal (incident
    * detection on the ingest pipeline itself, vs q_outliers' abnormal
    * EVENTS): per-type daily counts, exact integer moments over the
    * |types|×|days| aggregate, flag |z| > 2. All counts and moment
    * sums are exact integers (n·Σx², Σx are longs), the z-score is
    * assembled from identical doubles and snapped at 6dp — the
    * q_outliers parity argument one level up. */
  val anomalyDays: GraftOp = GraftOp(
    "q_anomaly_days",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_idx,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS k,
      |    CAST(sum(n) AS DOUBLE) AS s1, CAST(sum(n * n) AS DOUBLE) AS s2
      |  FROM c GROUP BY 1),
      |z AS (
      |  SELECT c.event_type, day_idx, n,
      |    (n - s1 / k) / sqrt(s2 / k - (s1 / k) * (s1 / k)) AS zs
      |  FROM c JOIN st ON c.event_type = st.event_type)
      |SELECT event_type, day_idx, n, round(zs, 6) AS zscore
      |FROM z WHERE abs(zs) > 2 ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType))
          .cast(IntegerType).as("day_idx"))
      .groupBy(col("event_type"), col("day_idx"))
      .agg(count(lit(1)).as("n"))
    val st = c.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"),
        sum(col("n")).cast(DoubleType).as("s1"),
        sum(col("n") * col("n")).cast(DoubleType).as("s2"))
    val mean = col("s1") / col("k")
    val zs = (col("n") - mean) / sqrt(col("s2") / col("k") - mean * mean)
    c.join(broadcast(st), Seq("event_type"))
      .select(col("event_type"), col("day_idx"), col("n"), zs.as("zs"))
      .filter(abs(col("zs")) > 2)
      .select(col("event_type"), col("day_idx"), col("n"), round(col("zs"), 6).as("zscore"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  /** Seasonality-adjusted volume anomalies — q_anomaly_days with the
    * weekly rhythm removed by STRATIFICATION, not subtraction: each
    * day's count is z-scored against its own (event_type, weekday)
    * stratum (Mondays against Mondays), so a busy-Monday pattern stops
    * masquerading as five anomalies a month. Subtracting a dow-mean
    * first would put FRACTIONAL residuals into the variance sums
    * (fold-order doubles — unhashable); stratifying keeps every sum an
    * exact integer and reuses the q_anomaly_days contract verbatim
    * (deterministic double z from exact sums, 6dp emit). dow =
    * day_idx % 7 under the fixed epoch (convention-free). Plan: one
    * (type, day) partial agg, a ≤|types|·7-row broadcast of stratum
    * moments, threshold filter.
    *
    * Threshold |z| > 1.5, NOT q_anomaly_days' 2: a population z-score
    * computed within its own stratum of k points is bounded by
    * (k−1)/√k — with a ~30-day history each weekday stratum has k≈4-5,
    * capping |z| at ~1.5-1.79, so a 2 threshold can NEVER fire and the
    * oracle row passed vacuously (0 rows == 0 rows). 1.5 sits just
    * inside the attainable range and flags only days at the extreme
    * tail of their stratum (~25 of 150 type-days at the driver SFs). */
  val seasonalAnomaly: GraftOp = GraftOp(
    "q_seasonal_anomaly",
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_idx,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT event_type, day_idx, day_idx % 7 AS dow, n FROM c),
      |st AS (
      |  SELECT event_type, dow, count(*) AS k,
      |    CAST(sum(n) AS DOUBLE) AS s1, CAST(sum(n * n) AS DOUBLE) AS s2
      |  FROM d GROUP BY 1, 2),
      |z AS (
      |  SELECT d.event_type, day_idx, dow, n,
      |    (n - s1 / k) / sqrt(s2 / k - (s1 / k) * (s1 / k)) AS zs
      |  FROM d JOIN st USING (event_type, dow))
      |SELECT event_type, day_idx, CAST(dow AS BIGINT) AS dow, n, round(zs, 6) AS zscore
      |FROM z WHERE abs(zs) > 1.5 ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType))
          .cast(IntegerType).as("day_idx"))
      .groupBy(col("event_type"), col("day_idx"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", col("day_idx") % 7)
    val st = c.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("k"),
        sum(col("n")).cast(DoubleType).as("s1"),
        sum(col("n") * col("n")).cast(DoubleType).as("s2"))
    val mean = col("s1") / col("k")
    val zs = (col("n") - mean) / sqrt(col("s2") / col("k") - mean * mean)
    c.join(broadcast(st), Seq("event_type", "dow"))
      .select(col("event_type"), col("day_idx"), col("dow"), col("n"), zs.as("zs"))
      .filter(abs(col("zs")) > 1.5)
      .select(col("event_type"), col("day_idx"), col("dow").cast(LongType).as("dow"),
        col("n"), round(col("zs"), 6).as("zscore"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  /** Daily value-percentile series (p50/p95 per type per day) — the
    * latency-dashboard shape: a percentile TIME SERIES, not one global
    * number. Sort-window rank selection + the [[QuantileExact]]
    * shared-text interpolation per (type, day) group — bit-identical
    * doubles across engines, no per-group buffering, raw emits (r12:
    * the 6dp snap retired with the percentile() aggregate). */
  val dailyPercentiles: GraftOp = GraftOp(
    "q_daily_percentiles",
    s"""WITH d AS (
       |  SELECT event_type,
       |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_idx,
       |    value
       |  FROM events),
       |r AS (
       |  SELECT event_type, day_idx, value,
       |    row_number() OVER (PARTITION BY event_type, day_idx ORDER BY value) AS rn,
       |    count(*) OVER (PARTITION BY event_type, day_idx) AS n
       |  FROM d),
       |g AS (
       |  SELECT event_type, day_idx, max(n) AS n,
       |    ${QuantileExact.sqlAggs(50, "value", "p50")},
       |    ${QuantileExact.sqlAggs(95, "value", "p95")}
       |  FROM r GROUP BY 1, 2)
       |SELECT event_type, day_idx, n,
       |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS p50,
       |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95
       |FROM g ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val byGrp = Window.partitionBy(col("event_type"), col("day_idx"))
    val aggs = Seq(max(col("__n")).as("n")) ++
      QuantileExact.sparkAggs(50, "value", "p50") ++
      QuantileExact.sparkAggs(95, "value", "p95")
    Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType))
          .cast(IntegerType).as("day_idx"),
        col("value"))
      .withColumn("__rn", row_number().over(byGrp.orderBy(col("value"))))
      .withColumn("__n", count(lit(1)).over(byGrp))
      .groupBy(col("event_type"), col("day_idx"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), col("day_idx"), col("n"),
        expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("p50"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  /** Time-series similarity search (EDBT'19/SIGMOD'20 family): which
    * users have the most similar daily-activity PROFILE to a query
    * user — squared Euclidean distance between daily-count series,
    * expanded so no series is ever materialized:
    * ‖u−q‖² = Σu² + Σq² − 2·Σ_matching-days u·q. Every term is an
    * exact INTEGER aggregate (counts and products of counts), the
    * cross term is a co-partitioned equi-join on the day key, absent
    * overlap contributes zero via the left join — ranking on dist²
    * needs no sqrt and cannot be perturbed. Query users broadcast; the
    * candidate space is |queries|×|users| score rows, never a series
    * matrix. */
  val tsSimilarity: GraftOp = GraftOp(
    "q_ts_similarity",
    """WITH ud AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_idx,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |n2 AS (SELECT user_id, CAST(sum(c * c) AS BIGINT) AS s2 FROM ud GROUP BY 1),
      |q AS (SELECT user_id, day_idx, c FROM ud WHERE user_id IN (1, 2, 3)),
      |cr AS (
      |  SELECT q.user_id AS query_user, ud.user_id AS other_user,
      |    CAST(sum(q.c * ud.c) AS BIGINT) AS cross_term
      |  FROM q JOIN ud ON q.day_idx = ud.day_idx AND ud.user_id <> q.user_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT nq.user_id AS query_user, nc.user_id AS other_user,
      |    nq.s2 + nc.s2 - 2 * coalesce(cross_term, 0) AS dist2
      |  FROM (SELECT user_id, s2 FROM n2 WHERE user_id IN (1, 2, 3)) nq
      |  JOIN n2 nc ON nc.user_id <> nq.user_id
      |  LEFT JOIN cr ON cr.query_user = nq.user_id AND cr.other_user = nc.user_id),
      |r AS (
      |  SELECT query_user, other_user, dist2,
      |    row_number() OVER (PARTITION BY query_user ORDER BY dist2, other_user) AS rn
      |  FROM pairs)
      |SELECT query_user, other_user, dist2, rn FROM r WHERE rn <= 10
      |ORDER BY query_user, rn""".stripMargin) { (s, d) =>
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType))
          .cast(IntegerType).as("day_idx"))
      .groupBy(col("user_id"), col("day_idx"))
      .agg(count(lit(1)).as("c"))
    val n2 = ud.groupBy(col("user_id"))
      .agg(sum(col("c") * col("c")).cast(LongType).as("s2"))
    val qids = Seq(1L, 2L, 3L)
    val q = ud.filter(col("user_id").isin(qids: _*))
      .select(col("user_id").as("query_user"), col("day_idx").as("q_day"),
        col("c").as("qc"))
    val cr = ud.join(broadcast(q),
        col("day_idx") === col("q_day") && col("user_id") =!= col("query_user"))
      .groupBy(col("query_user"), col("user_id").as("other_user"))
      .agg(sum(col("qc") * col("c")).cast(LongType).as("cross_term"))
    val pairs = n2.filter(col("user_id").isin(qids: _*))
      .select(col("user_id").as("query_user"), col("s2").as("q_s2"))
      .join(n2.select(col("user_id").as("other_user"), col("s2").as("o_s2")),
        col("other_user") =!= col("query_user"))
      .join(cr, Seq("query_user", "other_user"), "left")
      .select(col("query_user"), col("other_user"),
        (col("q_s2") + col("o_s2") - lit(2) * coalesce(col("cross_term"), lit(0L)))
          .as("dist2"))
    val w = Window.partitionBy(col("query_user")).orderBy(col("dist2"), col("other_user"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy(col("query_user"), col("rn"))
  }

  /** Week-over-week growth per event type — the dashboard staple
    * "how did this week compare": weekly counts (integer week index =
    * day_idx div 7 from the fixed epoch — no ISO-week conventions to
    * disagree on), lag(1) over the per-type weekly series, growth =
    * exact-integer delta and a 6dp-snapped ratio. The window runs over
    * the |types|×|weeks| aggregate (spine-sized), never the events. */
  val wowGrowth: GraftOp = GraftOp(
    "q_wow_growth",
    """WITH w AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS INT) AS week_idx,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, week_idx, n,
      |    lag(n) OVER (PARTITION BY event_type ORDER BY week_idx) AS prev_n
      |  FROM w)
      |SELECT event_type, week_idx, n, CAST(n - prev_n AS BIGINT) AS delta,
      |  CAST(n - prev_n AS DOUBLE) / prev_n AS growth
      |FROM l WHERE prev_n IS NOT NULL
      |ORDER BY event_type, week_idx""".stripMargin) { (s, d) =>
    val w = Tables.events(s, d)
      // integer `div`, matching the oracle's `//` (floor) for ALL
      // inputs — double-divide + int cast truncates toward zero, which
      // only agrees because day_idx >= 0 under the 2024-01-01 epoch
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '2024-01-01') div 7")
          .cast(IntegerType).as("week_idx"))
      .groupBy(col("event_type"), col("week_idx"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("week_idx"))
    w.withColumn("prev_n", lag(col("n"), 1).over(byType))
      .filter(col("prev_n").isNotNull)
      .select(col("event_type"), col("week_idx"), col("n"),
        (col("n") - col("prev_n")).cast(LongType).as("delta"),
        ((col("n") - col("prev_n")).cast(DoubleType) / col("prev_n")).as("growth"))
      .orderBy(col("event_type"), col("week_idx"))
  }

  /** Cohort LTV curves: cumulative per-user value by signup cohort and
    * age — "how much is a week-N user worth", the unit-economics
    * readout layered on q_retention's cohort machinery. Value
    * accumulates in exact CENTS (the momentsStream double→DECIMAL
    * contract), the running sum is integer addition over the
    * |cohorts|×|offsets| matrix (spine-sized window, never the
    * events), and the per-user LTV is emitted via pure-integer
    * half-up rounding of the exact rational cents/(100·users) — the
    * §6 midpoint-proof emit. */
  val cohortLtv: GraftOp = GraftOp(
    "q_cohort_ltv",
    """WITH a AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS day_idx,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |c AS (SELECT user_id, min(day_idx) AS cohort_day FROM a GROUP BY 1),
      |sz AS (SELECT cohort_day, count(*) AS cohort_users FROM c GROUP BY 1),
      |d AS (
      |  SELECT c.cohort_day, a.day_idx - c.cohort_day AS offset_day, sum(a.cents) AS day_cents
      |  FROM a JOIN c ON a.user_id = c.user_id
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT cohort_day, offset_day,
      |    CAST(sum(day_cents) OVER (PARTITION BY cohort_day ORDER BY offset_day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |  FROM d)
      |SELECT m.cohort_day, CAST(m.offset_day AS INT) AS offset_day,
      |  cum_cents,
      |  ((cum_cents * 100000 // cohort_users + 5) // 10) / 1000000.0 AS ltv_per_user
      |FROM m JOIN sz ON m.cohort_day = sz.cohort_day
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val a = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType))
          .cast(IntegerType).as("day_idx"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val c = a.groupBy(col("user_id")).agg(min(col("day_idx")).as("cohort_day"))
    val sz = c.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_users"))
    val dd = a.join(c, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day_idx") - col("cohort_day")).as("offset_day"))
      .agg(sum(col("cents")).as("day_cents"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("offset_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd.withColumn("cum_cents", sum(col("day_cents")).over(w).cast(LongType))
      .join(sz, Seq("cohort_day"))
      .select(col("cohort_day"), col("offset_day").cast(IntegerType).as("offset_day"),
        col("cum_cents"),
        // integer half-up at 6dp of the exact rational cents/(100·users)
        // — never round() an exact rational (§6 midpoint gotcha)
        (expr("(cum_cents * 100000 div cohort_users + 5) div 10") / 1000000.0)
          .as("ltv_per_user"))
      .orderBy(col("cohort_day"), col("offset_day"))
  }

  /** Gap-filled daily series: per-type daily counts left-joined onto a
    * dense (type × day) spine so silent days appear as zeros —
    * the step dashboards/downsamplers assume and plain GROUP BY can't
    * give. The spine is generated from the corpus min/max day (one
    * scalar aggregate broadcast into a lambda-free sequence+explode),
    * |types|·|days| rows — independent of event volume. */
  val gapFill: GraftOp = GraftOp(
    "q_gap_fill",
    """WITH e AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |agg AS (SELECT event_type, day_idx, count(*) AS n, sum(v) AS sv FROM e GROUP BY 1, 2),
      |bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM e),
      |spine AS (
      |  SELECT t.event_type, d.day_idx
      |  FROM (SELECT DISTINCT event_type FROM e) t
      |  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds) d)
      |SELECT s.event_type, CAST(s.day_idx AS INT) AS day_idx,
      |  coalesce(n, 0) AS n, CAST(coalesce(sv, 0) AS DOUBLE) AS sum_value
      |FROM spine s LEFT JOIN agg a
      |  ON s.event_type = a.event_type AND s.day_idx = a.day_idx
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"),
        col("value").cast(DecimalType(18, 2)).as("v"))
    val agg = e.groupBy(col("event_type"), col("day_idx"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val bounds = e.agg(min(col("day_idx")).as("lo"), max(col("day_idx")).as("hi"))
    val spine = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day_idx"))
    spine.join(agg, Seq("event_type", "day_idx"), "left")
      .select(col("event_type"), col("day_idx").cast(IntegerType).as("day_idx"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sv"), lit(0).cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  /** Linear interpolation over the gap-filled daily series: silent
    * days get the straight line between the nearest observed days
    * (edges clamp to the nearest observation). Runs on the aggregated
    * (type × day) matrix — |types|·|days| rows regardless of event
    * volume — so the four IGNORE-NULLS window passes are over tiny
    * partitions, never the raw stream. Daily sums are exact
    * DECIMAL(18,2) (fold-order-free); the interpolation formula is the
    * same double expression in both engines, so results are
    * bit-identical (rounded to 6 decimals as belt and braces). */
  val interpolate: GraftOp = GraftOp(
    "q_interpolate",
    """WITH e AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |agg AS (SELECT event_type, day_idx, sum(v) AS sv FROM e GROUP BY 1, 2),
      |bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM e),
      |spine AS (
      |  SELECT t.event_type, d.day_idx
      |  FROM (SELECT DISTINCT event_type FROM e) t
      |  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds) d),
      |j AS (
      |  SELECT s.event_type, s.day_idx, CAST(a.sv AS DOUBLE) AS sv
      |  FROM spine s LEFT JOIN agg a
      |    ON s.event_type = a.event_type AND s.day_idx = a.day_idx),
      |w AS (
      |  SELECT event_type, day_idx, sv,
      |    last_value(sv IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day_idx
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |    last_value(CASE WHEN sv IS NOT NULL THEN day_idx END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day_idx
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
      |    first_value(sv IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day_idx
      |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN sv IS NOT NULL THEN day_idx END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day_idx
      |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
      |  FROM j)
      |SELECT event_type, CAST(day_idx AS INT) AS day_idx,
      |  round(CASE
      |    WHEN sv IS NOT NULL THEN sv
      |    WHEN pv IS NULL THEN nv
      |    WHEN nv IS NULL THEN pv
      |    ELSE pv + (nv - pv) * (day_idx - pd) / (nd - pd) END, 6) AS filled,
      |  CASE WHEN sv IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
      |FROM w ORDER BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"),
        col("value").cast(DecimalType(18, 2)).as("v"))
    val agg = e.groupBy(col("event_type"), col("day_idx")).agg(sum(col("v")).as("sv"))
    val bounds = e.agg(min(col("day_idx")).as("lo"), max(col("day_idx")).as("hi"))
    val spine = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day_idx"))
    val j = spine.join(agg, Seq("event_type", "day_idx"), "left")
      .select(col("event_type"), col("day_idx"), col("sv").cast(DoubleType).as("sv"))
    val before = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      .rowsBetween(1, Window.unboundedFollowing)
    val markedDay = when(col("sv").isNotNull, col("day_idx"))
    j.select(col("event_type"), col("day_idx"), col("sv"),
        last(col("sv"), ignoreNulls = true).over(before).as("pv"),
        last(markedDay, ignoreNulls = true).over(before).as("pd"),
        first(col("sv"), ignoreNulls = true).over(after).as("nv"),
        first(markedDay, ignoreNulls = true).over(after).as("nd"))
      .select(col("event_type"), col("day_idx").cast(IntegerType).as("day_idx"),
        round(
          when(col("sv").isNotNull, col("sv"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("day_idx") - col("pd")) / (col("nd") - col("pd"))), 6).as("filled"),
        when(col("sv").isNotNull, "obs").otherwise("interp").as("src"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  /** Per-type z-score outliers. The per-group moments come from exact
    * DECIMAL sums (sum v, sum v²) folded map-side in one aggregation
    * and broadcast back — no window over the raw stream, no
    * Welford-order drift: mean/variance/sqrt are then the same double
    * expression in both engines, so membership of |z| > 2.5 cannot
    * disagree at the boundary. */
  val outliers: GraftOp = GraftOp(
    "q_outliers",
    """WITH e AS (
      |  SELECT event_id, event_type, value, CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |st AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(v) AS DOUBLE) AS s1, CAST(sum(v * v) AS DOUBLE) AS s2
      |  FROM e GROUP BY 1),
      |z AS (
      |  SELECT event_id, e.event_type,
      |    (value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) AS zs
      |  FROM e JOIN st ON e.event_type = st.event_type)
      |SELECT event_id, event_type, round(zs, 6) AS zscore
      |FROM z WHERE abs(zs) > 2.5 ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        col("value").cast(DecimalType(18, 2)).as("v"))
    val st = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(DoubleType).as("s1"),
        sum(col("v") * col("v")).cast(DoubleType).as("s2"))
    val mean = col("s1") / col("n")
    val zs = (col("value") - mean) / sqrt(col("s2") / col("n") - mean * mean)
    e.join(broadcast(st), Seq("event_type"))
      .select(col("event_id"), col("event_type"), zs.as("zs"))
      .filter(abs(col("zs")) > 2.5)
      .select(col("event_id"), col("event_type"), round(col("zs"), 6).as("zscore"))
      .orderBy(col("event_id"))
  }

  /** Per-type ROBUST outliers via median absolute deviation (the
    * Iglewicz–Hoaglin modified z-score, |0.6745·(x−med)/MAD| — written
    * below as (x−med)/(1.4826·MAD) > 3.5, the same test). Complements
    * q_outliers: mean/stddev are themselves dragged by the outliers
    * they're hunting, while the two medians are not — the robust
    * detector a metrics warehouse runs on heavy-tailed series.
    *
    * Two aggregation passes (median of value, then median of the
    * absolute deviation), each a one-shuffle exact percentile on the
    * type key with the tiny per-type result broadcast back — no window
    * over the raw stream. Both engines interpolate percentiles
    * linearly and the score is one correctly-rounded divide, so
    * membership at the 3.5 boundary cannot disagree; the emitted score
    * is snapped to 6dp. */
  val robustOutliers: GraftOp = GraftOp(
    "q_robust_outliers",
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value,
      |    abs(e.value - med.med) AS ad, med.med AS med
      |  FROM events e JOIN med ON e.event_type = med.event_type),
      |m2 AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1),
      |r AS (
      |  SELECT event_id, dev.event_type, (value - med) / (1.4826 * mad) AS rz
      |  FROM dev JOIN m2 ON dev.event_type = m2.event_type
      |  WHERE mad > 0)
      |SELECT event_id, event_type, round(rz, 6) AS robust_z
      |FROM r WHERE abs(rz) > 3.5 ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      // MAD = 0 (≥half the values AT the median — discretized metrics)
      // leaves the score undefined: Spark's non-ANSI divide gives NULL
      // (row dropped) where DuckDB gives ±inf (row kept) — filter the
      // degenerate groups explicitly on BOTH sides
      .filter(col("mad") > 0)
      .select(col("event_id"), col("event_type"),
        ((col("value") - col("med")) / (lit(1.4826) * col("mad"))).as("rz"))
      .filter(abs(col("rz")) > 3.5)
      .select(col("event_id"), col("event_type"), round(col("rz"), 6).as("robust_z"))
      .orderBy(col("event_id"))
  }

  /** Winsorized (p05/p95-clipped) per-type mean next to the raw mean —
    * the robust-average move for heavy-tailed metrics (cap the tails
    * instead of dropping them). Same two-phase shape as the MAD op:
    * one exact-percentile aggregate broadcast back, then one clipped
    * aggregate. Parity: the clip bounds are interpolated identically,
    * the clipped value is snapped to DECIMAL(18,6) BEFORE summing
    * (double→decimal casts agree across engines — the q_outliers
    * contract), so both sums are exact integer-scaled arithmetic with
    * no fold-order drift. */
  val winsorized: GraftOp = GraftOp(
    "q_winsorized",
    """WITH qs AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT e.event_type,
      |    CAST(e.value AS DECIMAL(18,6)) AS v,
      |    CAST(least(greatest(e.value, lo), hi) AS DECIMAL(18,6)) AS w
      |  FROM events e JOIN qs ON e.event_type = qs.event_type)
      |SELECT event_type, count(*) AS n,
      |  ((CAST(sum(v) * 1000000 AS BIGINT) * 10 // count(*) + 5) // 10) / 1000000.0 AS raw_mean,
      |  ((CAST(sum(w) * 1000000 AS BIGINT) * 10 // count(*) + 5) // 10) / 1000000.0 AS wins_mean
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_type"), col("value"))
    val qs = e.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.05)).as("lo"),
        percentile(col("value"), lit(0.95)).as("hi"))
    e.join(broadcast(qs), Seq("event_type"))
      .select(col("event_type"),
        col("value").cast(DecimalType(18, 6)).as("v"),
        least(greatest(col("value"), col("lo")), col("hi"))
          .cast(DecimalType(18, 6)).as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (expr("(cast(sum(v) * 1000000 as bigint) * 10 div count(1) + 5) div 10") / 1000000.0)
          .as("raw_mean"),
        (expr("(cast(sum(w) * 1000000 as bigint) * 10 div count(1) + 5) div 10") / 1000000.0)
          .as("wins_mean"))
      .orderBy(col("event_type"))
  }

  /** Per-user time-decayed engagement score Σ v·e^(−Δt/τ) with a 1-day
    * half-life-ish τ, anchored at the corpus max timestamp — the
    * recency-weighted ranking signal (feed scoring, churn features)
    * ClickHouse pipelines compute with exponentialMovingAverage-family
    * combinators. One fact-table groupBy (partial-aggregable — the
    * decay weight is a pure per-row map before the fold); the anchor
    * rides in as a broadcast single-row cross join. Parity: Δt is
    * integer seconds, exp() may differ by 1 ulp between libms and the
    * sum folds in engine order — both absorbed by the 6dp snap on
    * scores O(10³), the q_regression contract. */
  val decay: GraftOp = GraftOp(
    "q_decay",
    """WITH m AS (SELECT max(ts) AS mts FROM events),
      |w AS (
      |  SELECT user_id,
      |    value * exp(-CAST(date_diff('second', ts, mts) AS DOUBLE) / 86400.0) AS dv
      |  FROM events CROSS JOIN m)
      |SELECT user_id, count(*) AS n, round(sum(dv), 6) AS decay_score
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val m = e.agg(max(col("ts")).as("mts"))
    e.crossJoin(broadcast(m))
      .select(col("user_id"),
        (col("value") * exp((unix_timestamp(col("ts")) - unix_timestamp(col("mts")))
          .cast(DoubleType) / 86400.0)).as("dv"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("dv")), 6).as("decay_score"))
      .orderBy(col("user_id"))
  }

  /** χ² contingency table: event_type × day-of-week with observed vs
    * expected counts and per-cell χ² contribution — the independence
    * test behind "does behavior vary by weekday" dashboards (and the
    * feature-selection statistic in ML prep). Emitted PER CELL, so
    * every number is a ratio of exact integer products — the deviation
    * o·N − rt·ct and the product rt·ct are assembled in
    * DECIMAL(38)/HUGEINT (they scale ~N², past 2⁵³ at corpus scale;
    * r10 — the double route cancelled) with one cast each and raw IEEE
    * emits; no global fold to disagree on; the caller sums the 35
    * cells for the statistic. One fact groupBy +
    * two tiny marginal aggregates broadcast back. */
  val chiSquare: GraftOp = GraftOp(
    "q_chi_square",
    """WITH c AS (
      |  SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
      |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c)
      |SELECT c.event_type, c.dow, o,
      |  CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE) / n AS expected,
      |  CAST(CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct AS DOUBLE)
      |    * CAST(CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct AS DOUBLE)
      |    / (CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE) * n) AS chi2_cell
      |FROM c JOIN rt ON c.event_type = rt.event_type JOIN ct ON c.dow = ct.dow
      |CROSS JOIN n
      |ORDER BY c.event_type, c.dow""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("int").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val rt = c.groupBy(col("event_type")).agg(sum(col("o")).cast(LongType).as("rt"))
    val ct = c.groupBy(col("dow")).agg(sum(col("o")).cast(LongType).as("ct"))
    val n = c.agg(sum(col("o")).cast(LongType).as("n"))
    c.join(broadcast(rt), Seq("event_type"))
      .join(broadcast(ct), Seq("dow"))
      .crossJoin(broadcast(n))
      .select(col("event_type"), col("dow"), col("o"),
        expr("CAST(CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE) / n").as("expected"),
        expr("""CAST(CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE)
          |  * CAST(CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE)
          |  / (CAST(CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE) * n)""".stripMargin)
          .as("chi2_cell"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Trailing-7-day distinct actives per day (rolling MAU shape).
    * COUNT(DISTINCT) over a sliding frame is unsupported as a window
    * function, and a band join would plan as a nested loop — so each
    * deduplicated (user, day) pair EXPLODES into the ≤7 later days it
    * supports and a plain groupBy(day) counts distinct users. Fan-out
    * is bounded by the window length, independent of event volume; one
    * equi shuffle on day. */
  val trailingActive: GraftOp = GraftOp(
    "q_trailing_active",
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      |  FROM events),
      |b AS (SELECT max(day_idx) AS hi FROM a),
      |x AS (
      |  SELECT user_id, unnest(generate_series(day_idx, day_idx + 6)) AS day
      |  FROM a)
      |SELECT CAST(day AS INT) AS day_idx, count(DISTINCT user_id) AS active_7d
      |FROM x WHERE day <= (SELECT hi FROM b)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    ApproxRouting.route(s, TrailingApproxKey, "q_trailing_active", Tables.events(s, d))(
      trailingActiveExactPlan(s, d))(
      trailingSketch(s, d, "active_7d")) // same schema, ±1.6% RSE estimate
  }

  private[operators] def trailingActiveExactPlan(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val a = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"))
      .distinct()
    val bounds = a.agg(max(col("day_idx")).as("hi"))
    a.select(col("user_id"),
        explode(sequence(col("day_idx"), col("day_idx") + 6)).as("day"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("hi"))
      .groupBy(col("day").cast(IntegerType).as("day_idx"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
      .orderBy(col("day_idx"))
  }

  /** Top event-type transitions (path analysis): consecutive pairs in
    * each user's event-time order, counted corpus-wide — the Markov /
    * user-journey primitive. One window pass partitioned by user (the
    * natural co-partitioning), one pair shuffle; (ts, event_id) total
    * order makes consecutive-ness deterministic. */
  val transitions: GraftOp = GraftOp(
    "q_transitions",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |FROM o WHERE next_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type LIMIT 20""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
      .limit(20)
  }

  /** Stage-to-stage funnel latency — the "where does the funnel
    * stall" readout next to q_funnel's "how deep do users get": for
    * users who completed a transition, how long signup→view and
    * view→purchase took. Same first-qualifying-event stage frames as
    * q_funnel (min-ts per stage, strictly increasing), diffed to
    * integer seconds (exact — the values the percentile sorts carry no
    * float drift) through the q_gap_stats percentile contract, summed
    * as a BIGINT instead of a round(avg) (midpoint-proof; mean =
    * sum_sec/n_users is the caller's one division). Three narrow
    * per-user aggregates shuffled on the one possible key, a 2-row
    * rollup at the end — the q_funnel plan plus two broadcast-sized
    * joins. */
  val funnelLatency: GraftOp = GraftOp(
    "q_funnel_latency",
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
      |l AS (
      |  SELECT 'signup->view' AS transition, date_diff('second', t1, t2) AS sec
      |  FROM s1 JOIN s2 USING (user_id)
      |  UNION ALL
      |  SELECT 'view->purchase', date_diff('second', t2, t3)
      |  FROM s2 JOIN s3 USING (user_id)),
      |r AS (
      |  SELECT transition, sec,
      |    row_number() OVER (PARTITION BY transition ORDER BY sec) AS rn,
      |    count(*) OVER (PARTITION BY transition) AS n
      |  FROM l),
      |g AS (
      |  SELECT transition, max(n) AS n_users,
      |    CAST(sum(sec) AS BIGINT) AS sum_sec,
      |    """.stripMargin + QuantileExact.sqlAggs(50, "sec", "p50") + ",\n" +
      QuantileExact.sqlAggs(95, "sec", "p95") +
      s"""
      |  FROM r GROUP BY 1)
      |SELECT transition, n_users, sum_sec,
      |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS p50_sec,
      |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95_sec
      |FROM g ORDER BY 1""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.join(s1, Seq("user_id"))
      .filter(col("event_type") === "view" && col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.join(s2, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val l12 = s1.join(s2, Seq("user_id"))
      .select(lit("signup->view").as("transition"),
        (unix_timestamp(col("t2")) - unix_timestamp(col("t1"))).as("sec"))
    val l23 = s2.join(s3, Seq("user_id"))
      .select(lit("view->purchase").as("transition"),
        (unix_timestamp(col("t3")) - unix_timestamp(col("t2"))).as("sec"))
    val byTr = Window.partitionBy(col("transition"))
    val aggs = Seq(max(col("__n")).as("n_users"), sum(col("sec")).as("sum_sec")) ++
      QuantileExact.sparkAggs(50, "sec", "p50") ++
      QuantileExact.sparkAggs(95, "sec", "p95")
    l12.unionAll(l23)
      .withColumn("__rn", row_number().over(byTr.orderBy(col("sec"))))
      .withColumn("__n", count(lit(1)).over(byTr))
      .groupBy(col("transition"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("transition"), col("n_users"), col("sum_sec"),
        expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("p50_sec"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95_sec"))
      .orderBy(col("transition"))
  }

  /** Last-touch conversion attribution — which event type gets credit
    * for each purchase: the latest strictly-preceding same-user
    * non-purchase event (ties broken by event_id in both engines),
    * 'direct' when the purchase is the user's first event. ONE
    * user-partitioned window pass (last IGNORE NULLS over an
    * UNBOUNDED..1 PRECEDING frame — no self-join against the purchase
    * set), then a |event-types|-row rollup; purchase value snapped to
    * integer cents through the cohort-LTV DECIMAL(18,2) contract. */
  val attribution: GraftOp = GraftOp(
    "q_attribution",
    """WITH a AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |  FROM events)
      |SELECT coalesce(channel, 'direct') AS channel,
      |  count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS cents
      |FROM a WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"),
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(w).as("channel"))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
      .orderBy(col("channel"))
  }

  /** Inter-event gap percentiles per type: lag() over each user's
    * event-time order gives the gap to the previous same-user event in
    * integer seconds (exact — no float drift in the ORDER the
    * percentile sorts), then exact p50/p95 per event type. The
    * engagement-cadence metric; same one-window-one-agg shape as
    * q_transitions. */
  val gapStats: GraftOp = GraftOp(
    "q_gap_stats",
    s"""WITH o AS (
       |  SELECT event_type,
       |    date_diff('second',
       |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_sec
       |  FROM events),
       |r AS (
       |  SELECT event_type, gap_sec,
       |    row_number() OVER (PARTITION BY event_type ORDER BY gap_sec) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM o WHERE gap_sec IS NOT NULL),
       |g AS (
       |  SELECT event_type, max(n) AS n_gaps,
       |    ${QuantileExact.sqlAggs(50, "gap_sec", "p50")},
       |    ${QuantileExact.sqlAggs(95, "gap_sec", "p95")}
       |  FROM r GROUP BY 1)
       |SELECT event_type, n_gaps,
       |  ${QuantileExact.interp("p50_a", "p50_b", "p50_f")} AS p50_sec,
       |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95_sec
       |FROM g ORDER BY 1""".stripMargin) { (s, d) =>
    // exact percentile buffers EVERY group value on one reducer — the
    // oracle contract at test scale, an OOM at 100 TB; above the size
    // gate the same query serves its t-digest twin (bounded KB state
    // per group, mergeable, rank error ≤1% — TDigestSpec's gauge) with
    // the identical output schema.
    ApproxRouting.route(s, PercentileApproxKey, "q_gap_stats", Tables.events(s, d))(
      gapStatsExactPlan(s, d))(gapStatsSketchPlan(s, d))
  }

  private def gapFrame(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_sec"))
      .filter(col("gap_sec").isNotNull)
  }

  private[operators] def gapStatsExactPlan(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val aggs = Seq(max(col("__n")).as("n_gaps")) ++
      QuantileExact.sparkAggs(50, "gap_sec", "p50") ++
      QuantileExact.sparkAggs(95, "gap_sec", "p95")
    gapFrame(s, d)
      .withColumn("__rn", row_number().over(byType.orderBy(col("gap_sec"))))
      .withColumn("__n", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), col("n_gaps"),
        expr(QuantileExact.interp("p50_a", "p50_b", "p50_f")).as("p50_sec"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95_sec"))
      .orderBy(col("event_type"))
  }

  private[operators] def gapStatsSketchPlan(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    gapFrame(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        graft.functions.tdigest_quantiles(
          col("gap_sec").cast(org.apache.spark.sql.types.DoubleType),
          Seq(0.5, 0.95)).as("qs"))
      .select(col("event_type"), col("n_gaps"),
        round(col("qs").getItem(0), 6).as("p50_sec"),
        round(col("qs").getItem(1), 6).as("p95_sec"))
      .orderBy(col("event_type"))

  /** WINDOW-constrained funnel (ClickHouse `windowFunnel(W)` — the
    * reference's target engine ships this as a native aggregate):
    * max level k such that signup → view → purchase occur in order
    * with the whole chain inside a 30-minute window of its FIRST step.
    * Differs from q_funnel, which has no window.
    *
    * Engine shape: ONE shuffle (groupBy user) and a LINEAR fold over
    * each user's time-sorted events via the max-chain-start DP — state
    * per level j holds the LATEST chain start that reaches level j
    * (maximizing the start dominates: any event that can extend some
    * chain can extend the latest-started one). The oracle states the
    * same semantics as 2-way/3-way EXISTS self-joins — quadratic/cubic
    * per user, fine for an oracle, exactly what the fold avoids at
    * scale. Ties broken by event_id in both engines. */
  val windowFunnel: GraftOp = GraftOp(
    "q_window_funnel",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |u AS (SELECT DISTINCT user_id FROM events),
      |l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
      |l2 AS (
      |  SELECT DISTINCT a.user_id FROM e a JOIN e b ON a.user_id = b.user_id
      |  WHERE a.event_type = 'signup' AND b.event_type = 'view'
      |    AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
      |    AND b.us - a.us <= 1800000000),
      |l3 AS (
      |  SELECT DISTINCT a.user_id
      |  FROM e a JOIN e b ON a.user_id = b.user_id JOIN e c ON a.user_id = c.user_id
      |  WHERE a.event_type = 'signup' AND b.event_type = 'view' AND c.event_type = 'purchase'
      |    AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
      |    AND (c.us > b.us OR (c.us = b.us AND c.event_id > b.event_id))
      |    AND c.us - a.us <= 1800000000),
      |d AS (
      |  SELECT u.user_id,
      |    CASE WHEN l3.user_id IS NOT NULL THEN 3 WHEN l2.user_id IS NOT NULL THEN 2
      |         WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
      |  FROM u LEFT JOIN l1 USING (user_id) LEFT JOIN l2 USING (user_id)
      |         LEFT JOIN l3 USING (user_id))
      |SELECT level, CAST(count(*) AS BIGINT) AS n_users FROM d
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type"))))
        .as("evs"))
      .select(col("user_id"), expr(
        """aggregate(evs,
          |  named_struct('s1', -1L, 's2', -1L, 's3', -1L),
          |  (acc, e) -> CASE
          |    WHEN e.event_type = 'signup'
          |      THEN named_struct('s1', greatest(acc.s1, e.us), 's2', acc.s2, 's3', acc.s3)
          |    WHEN e.event_type = 'view' AND acc.s1 >= 0L AND e.us - acc.s1 <= 1800000000L
          |      THEN named_struct('s1', acc.s1, 's2', greatest(acc.s2, acc.s1), 's3', acc.s3)
          |    WHEN e.event_type = 'purchase' AND acc.s2 >= 0L AND e.us - acc.s2 <= 1800000000L
          |      THEN named_struct('s1', acc.s1, 's2', acc.s2, 's3', greatest(acc.s3, acc.s2))
          |    ELSE acc END)""".stripMargin).as("st"))
      .select(
        when(col("st.s3") >= 0, 3)
          .when(col("st.s2") >= 0, 2)
          .when(col("st.s1") >= 0, 1)
          .otherwise(0).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("level"))
  }

  /** Per-user exponential moving average (α = 0.3) over the value
    * series in (ts, event_id) order — the classic smoothing primitive
    * (ClickHouse exponentialMovingAverage family). An EWMA is
    * inherently SEQUENTIAL (each step multiplies the previous state),
    * so it cannot be a partial-mergeable aggregate; the scale-correct
    * shape is one shuffle to the key and a LINEAR in-memory fold over
    * each key's sorted series — exactly what both engines run here
    * (Spark `aggregate` HOF, DuckDB `list_reduce`, identical fold
    * order ⇒ identical doubles; each step snaps to 10 dp as
    * belt-and-braces). Emits the final smoothed value per user. */
  val ewma: GraftOp = GraftOp(
    "q_ewma",
    """WITH s AS (
      |  SELECT user_id,
      |    list_transform(
      |      list_sort(list({'us': epoch_us(ts), 'eid': event_id, 'v': value})),
      |      r -> r.v) AS vals
      |  FROM events GROUP BY 1)
      |SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
      |  round(list_reduce(vals, (acc, x) -> round(0.3 * x + 0.7 * acc, 10)), 6) AS ewma
      |FROM s ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(expr("transform(array_sort(collect_list(struct(us, event_id, value))), r -> r.value)")
        .as("vals"))
      .select(col("user_id"),
        size(col("vals")).cast("long").as("n_events"),
        round(expr(
          "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1)," +
            " (acc, x) -> round(0.3D * x + 0.7D * acc, 10))"), 6).as("ewma"))
      .orderBy(col("user_id"))
  }

  /** Per-user CUSUM drift statistic (Page 1954) — the sequential
    * changepoint detector: s_t = max(0, s_{t-1} + (x_t − μ)) over the
    * time-ordered series, with μ the corpus mean. A user whose values
    * drift persistently above the mean accumulates; noise resets to
    * zero. Like q_ewma the fold is inherently sequential (no partial
    * merge exists), so the scale shape is one shuffle to the key + a
    * linear fold.
    *
    * The fold state is ALL-INTEGER: values become exact cents (the
    * momentsStream double→DECIMAL(18,2) contract) and the recurrence
    * runs in cents·n units — s_t = max(0, s_{t-1} + x_cents·n −
    * Σcents) — so there is NO per-step float rounding for the engines
    * to disagree on (a round(…,10)-gridded double fold was observed to
    * drift one grid step on near-midpoint values at sf0.1; integers
    * cannot). The one divide back to value units happens once at emit.
    * Overflow bound: max|x_cents|·n·len < 2⁶³ — beyond that, fold in
    * DECIMAL. */
  val cusum: GraftOp = GraftOp(
    "q_cusum",
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
      |  FROM events),
      |m AS (SELECT CAST(sum(xc) AS BIGINT) AS sc, count(*) AS n FROM c),
      |s AS (
      |  SELECT user_id,
      |    list_transform(
      |      list_sort(list({'us': us, 'eid': event_id, 'v': xc})),
      |      r -> r.v) AS vals
      |  FROM c GROUP BY 1)
      |SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
      |    (acc, x) -> greatest(acc + x * n - sc, CAST(0 AS BIGINT))) // n AS BIGINT) / 100.0 AS cusum
      |FROM s CROSS JOIN m ORDER BY user_id""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("xc"))
    val m = c.agg(sum(col("xc")).cast(LongType).as("sc"), count(lit(1)).as("n"))
    c.groupBy(col("user_id"))
      .agg(expr("transform(array_sort(collect_list(struct(us, event_id, xc))), r -> r.xc)")
        .as("vals"))
      .crossJoin(broadcast(m))
      .select(col("user_id"),
        size(col("vals")).cast("long").as("n_events"),
        (expr(
          "aggregate(vals, 0L, (acc, x) -> greatest(acc + x * n - sc, 0L)) div n") / 100.0)
          .as("cusum"))
      .orderBy(col("user_id"))
  }

  /** Per-type least-squares trend: slope/intercept/correlation of
    * value against hours-since-epoch-start — the drift detector behind
    * any metrics dashboard, via the SQL-standard `regr_*`/`corr`
    * aggregates (one partial-aggregable shuffle; every engine ships
    * these as running-moment aggregates). x is normalized to HOURS
    * from a fixed origin so the slope is a per-hour drift (raw epoch
    * seconds would push slopes to 1e-9 where 6dp rounding erases
    * them); results rounded to 6dp so double fold-order noise (~1e-15
    * relative) cannot surface in the hash. */
  val regression: GraftOp = GraftOp(
    "q_regression",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(regr_slope(value, (epoch_us(ts) - 1704067200000000) / 3600000000.0), 6) AS slope,
      |  round(regr_intercept(value, (epoch_us(ts) - 1704067200000000) / 3600000000.0), 6) AS intercept,
      |  round(corr(value, (epoch_us(ts) - 1704067200000000) / 3600000000.0), 6) AS r
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val x = (unix_micros(col("ts").cast("timestamp")) - lit(1704067200000000L)) / 3600000000.0
    Tables.events(s, d)
      .select(col("event_type"), col("value"), x.as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(regr_slope(col("value"), col("x")), 6).as("slope"),
        round(regr_intercept(col("value"), col("x")), 6).as("intercept"),
        round(corr(col("value"), col("x")), 6).as("r"))
      .orderBy(col("event_type"))
  }

  /** Non-overlapping view→purchase sequence matches per user —
    * ClickHouse `sequenceCount('(?1)(?2)')`: greedy left-to-right
    * matching, a purchase consumes the armed state its view set, so
    * overlapping chains count once. Same scale shape as [[ewma]]: one
    * shuffle to the user key, then a LINEAR fold over the time-sorted
    * events — never the quadratic self-join the equivalent EXISTS
    * formulation implies. Cross-engine parity trick: the fold state
    * (armed flag + match count) is ENCODED AS ONE INT (`armed + 2·cnt`)
    * so DuckDB's homogeneous `list_reduce` and Spark's `aggregate` run
    * the byte-identical integer recurrence — no struct accumulator,
    * no float. The recurrence is BRANCH-FREE arithmetic
    * (`a + (x=1)·(1−a%2) + (x=2)·(a%2)`) rather than a multi-WHEN
    * CASE: DuckDB 1.0.0's list_reduce mis-evaluates multi-branch CASE
    * lambdas on lists longer than its 64-row vector chunk (verified:
    * only the >64-event users diverged, and only under grouped
    * multi-row execution). */
  val sequenceCount: GraftOp = GraftOp(
    "q_sequence_count",
    """WITH s AS (
      |  SELECT user_id,
      |    list_transform(
      |      list_sort(list({'us': epoch_us(ts), 'eid': event_id, 't': event_type})),
      |      r -> CASE WHEN r.t = 'view' THEN 1 WHEN r.t = 'purchase' THEN 2 ELSE 0 END) AS codes
      |  FROM events GROUP BY 1),
      |f AS (
      |  SELECT user_id,
      |    list_reduce(list_prepend(0, codes),
      |      (a, x) -> a + CAST(x = 1 AS INT) * (1 - a % 2)
      |                  + CAST(x = 2 AS INT) * (a % 2)) AS st
      |  FROM s)
      |SELECT user_id, CAST((st - st % 2) / 2 AS BIGINT) AS n_matches
      |FROM f ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(expr(
        """transform(array_sort(collect_list(struct(us, event_id, event_type))),
          |  r -> CASE WHEN r.event_type = 'view' THEN 1
          |            WHEN r.event_type = 'purchase' THEN 2 ELSE 0 END)""".stripMargin)
        .as("codes"))
      .select(col("user_id"), expr(
        """aggregate(codes, 0,
          |  (a, x) -> a + cast(x = 1 AS INT) * (1 - a % 2)
          |              + cast(x = 2 AS INT) * (a % 2))""".stripMargin).as("st"))
      .select(col("user_id"),
        ((col("st") - col("st") % 2) / 2).cast("long").as("n_matches"))
      .orderBy(col("user_id"))
  }

  /** Distinct-user estimates from a SKETCH ROLLUP (ClickHouse
    * `uniqState` → `uniqMerge`): per-(type, day) HLL sketches built
    * once — the shape you'd persist as a 4 KB-per-row rollup table —
    * then merged per type, never rescanning the events. At 100 TB this
    * is THE distinct-count pattern: the fact scan happens once at the
    * finest granularity; every coarser rollup (type, month, all-time)
    * is a merge over kilobyte sketches. Sketch-merge is lossless
    * (element-wise max), so the rollup estimate is byte-identical to
    * sketching the coarse group directly — HllSpec pins that equality,
    * the ±2% accuracy vs exact, and the map-side partial build; it is
    * also why the ORACLE can skip the daily stage and compute registers
    * straight over each type's user set ([[HllOracle]] replicates the
    * hash→register→estimate math exactly in DuckDB). */
  val hllRollup: GraftOp = GraftOp(
    "q_hll_rollup",
    s"""WITH hsrc AS (SELECT event_type, user_id AS v FROM events),
       |${HllOracle.cte("event_type")},
       |esrc AS (SELECT event_type, event_id AS v FROM events),
       |${HllOracle.cte("event_type", "e")},
       |nd AS (SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days
       |       FROM events GROUP BY 1)
       |SELECT h.event_type, nd.n_days, h.approx AS approx_users,
       |       ev.approx AS approx_events
       |FROM hest h JOIN eest ev USING (event_type) JOIN nd USING (event_type)
       |ORDER BY h.event_type""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts").cast("timestamp")).as("day"),
        col("user_id"), col("event_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(graft.functions.hll_sketch_agg(col("user_id")).as("sketch"),
        // second sketch column: event_id is ~13× the user cardinality, so
        // at sf0.1 its estimate leaves linear counting and exercises the
        // RAW α·m²/Σ2^-reg branch against the oracle (users stay linear)
        graft.functions.hll_sketch_agg(col("event_id")).as("esketch"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        graft.functions.hll_merge_agg(col("sketch")).as("approx_users"),
        graft.functions.hll_merge_agg(col("esketch")).as("approx_events"))
      .orderBy(col("event_type"))
  }

  /** EXACT distinct-count rollup from mergeable BITMAP state — the
    * exact twin of [[hllRollup]] (ClickHouse groupBitmapState→
    * groupBitmapMerge): one fact scan builds a canonical bitmap per
    * (type, day); every coarser distinct count is a bitwise-OR of
    * those bitmaps, never a rescan — and unlike HLL the merged count
    * is EXACT, which is why this one is oracle-hash-checked against
    * plain COUNT(DISTINCT) while the sketch twin is rows-only. No
    * RewriteDistinctAggregates Expand anywhere: the shuffle carries
    * one ⌈max_id/8⌉-byte bitmap per group instead of the distinct key
    * stream. Dense-ID contract: keys must sit in [0, 2²⁶) — the
    * dictionary-encoded id shape — enforced loudly by the aggregate. */
  val bitmapRollup: GraftOp = GraftOp(
    "q_bitmap_rollup",
    """SELECT event_type,
      |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
      |  count(DISTINCT user_id) AS users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(graft.functions.bitmap_agg(col("user_id")).as("bm"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        graft.functions.bitmap_merge_agg(col("bm")).as("users"))
      .orderBy(col("event_type"))
  }

  /** Trailing-7-day distinct actives from SLIDING SKETCH MERGES — the
    * sketch twin of [[trailingActive]]. The exact op explodes every
    * (user, day) pair ×7 into a countDistinct shuffle (fine at these
    * SFs; at 100 TB that is 7× the activity table through a wide
    * exchange). This one builds ONE 4 KB HLL sketch per day (the fact
    * scan happens once), then each day's sketch — not its users —
    * replicates to the 7 windows it serves: the merge shuffle carries
    * |days|×7 kilobyte rows, independent of user volume. Same
    * bound/filter semantics as the exact op; HllSpec pins per-day
    * estimates within 3% of it. Oracle: merge losslessness means each
    * window's merged sketch equals the sketch of its day-range's user
    * set, so [[HllOracle]] computes registers per window directly. */
  val hllTrailing: GraftOp = GraftOp(
    "q_hll_trailing",
    s"""WITH a AS (
       |  SELECT DISTINCT user_id,
       |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
       |  FROM events),
       |b AS (SELECT max(day_idx) AS hi FROM a),
       |x AS (
       |  SELECT user_id, unnest(generate_series(day_idx, day_idx + 6)) AS day
       |  FROM a),
       |hsrc AS (SELECT CAST(day AS INT) AS day_idx, user_id AS v
       |         FROM x WHERE day <= (SELECT hi FROM b)),
       |${HllOracle.cte("day_idx")}
       |SELECT day_idx, approx AS active_7d_est
       |FROM hest ORDER BY day_idx""".stripMargin) { (s, d) =>
    trailingSketch(s, d, "active_7d_est")
  }

  /** Month-over-month audience set algebra from THETA sketches — the
    * set operations HLL cannot answer. One scan of orders builds a
    * 32 KB KMV sketch of each month's customer set; every
    * retained / churned / new-customer number between consecutive
    * months is then sketch-vs-sketch arithmetic (linear merges over
    * ≤4096 retained hashes), never a self-join of the fact table. At
    * 100 TB the alternative — a month-to-month FULL OUTER self-join on
    * customer — shuffles the fact table twice per month pair; this
    * shuffles kilobytes. KMV sketches are EXACT below K=4096 retained
    * keys (ThetaSpec pins the ≈1.6% RSE above, plus the lossless
    * union-rollup law) — and TPC-H's per-month customer sets sit far
    * below K at every test SF (~1.8k/month at sf0.1), so the sketch
    * numbers EQUAL exact set algebra and the op is fully
    * oracle-checked against DuckDB's exact per-month set operations
    * (the hash match is the proof that the sketch path is exact in
    * its exact regime). */
  val thetaMonths: GraftOp = GraftOp(
    "q_theta_months",
    """WITH cm AS (
      |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month, o_custkey FROM orders),
      |mm AS (SELECT DISTINCT month FROM cm),
      |ok AS (
      |  SELECT a.month,
      |    strftime(CAST(a.month || '-01' AS DATE) - INTERVAL 1 MONTH, '%Y-%m') AS pm
      |  FROM mm a
      |  WHERE strftime(CAST(a.month || '-01' AS DATE) - INTERVAL 1 MONTH, '%Y-%m')
      |    IN (SELECT month FROM mm))
      |SELECT o.month,
      |  CAST((SELECT count(*) FROM cm WHERE cm.month = o.pm) AS BIGINT) AS prev_customers,
      |  CAST((SELECT count(*) FROM cm WHERE cm.month = o.month) AS BIGINT) AS customers,
      |  CAST((SELECT count(*) FROM cm a WHERE a.month = o.month
      |    AND EXISTS (SELECT 1 FROM cm b WHERE b.month = o.pm AND b.o_custkey = a.o_custkey))
      |    AS BIGINT) AS retained,
      |  CAST((SELECT count(*) FROM cm a WHERE a.month = o.month
      |    AND NOT EXISTS (SELECT 1 FROM cm b WHERE b.month = o.pm AND b.o_custkey = a.o_custkey))
      |    AS BIGINT) AS new_customers,
      |  CAST((SELECT count(*) FROM cm a WHERE a.month = o.pm
      |    AND NOT EXISTS (SELECT 1 FROM cm b WHERE b.month = o.month AND b.o_custkey = a.o_custkey))
      |    AS BIGINT) AS churned
      |FROM ok o ORDER BY month""".stripMargin) { (s, d) =>
    val monthly = Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_custkey"))
      .groupBy(col("month"))
      .agg(graft.functions.theta_sketch_agg(col("o_custkey")).as("sk"))
    // consecutive-month pairing is an equi-join on the derived next
    // month key; both sides are |months| rows of sketches — broadcast
    val next = monthly.select(
      date_format(add_months(to_date(concat(col("month"), lit("-01"))), 1), "yyyy-MM").as("pm"),
      col("sk").as("cur_prev"))
    monthly
      .join(broadcast(next), col("month") === col("pm"))
      .select(col("month"),
        graft.functions.theta_estimate(col("cur_prev")).as("prev_customers"),
        graft.functions.theta_estimate(col("sk")).as("customers"),
        graft.functions.theta_intersect(col("sk"), col("cur_prev")).as("retained"),
        graft.functions.theta_a_not_b(col("sk"), col("cur_prev")).as("new_customers"),
        graft.functions.theta_a_not_b(col("cur_prev"), col("sk")).as("churned"))
      .orderBy(col("month"))
  }

  /** Cart/browse abandonment — per day, the share of views NOT
    * followed by the same user's purchase within 30 minutes (the
    * funnel's operational complement: q_attribution credits
    * conversions, this measures the leak). q_attribution's window
    * trick time-reversed: next_purchase = first IGNORE NULLS over the
    * 1 FOLLOWING..UNBOUNDED frame of the user's (ts, event_id) order —
    * ONE window pass, never a view×purchase self-join; the 30-minute
    * deadline compares exact epoch micros; rate as a ppm floor. */
  val abandonment: GraftOp = GraftOp(
    "q_abandonment",
    """WITH a AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase
      |  FROM events),
      |v AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CASE WHEN next_purchase IS NULL
      |      OR epoch_us(next_purchase) - epoch_us(ts) > 1800000000 THEN 1 ELSE 0 END AS ab
      |  FROM a WHERE event_type = 'view')
      |SELECT day, count(*) AS n_views, CAST(sum(ab) AS BIGINT) AS n_abandoned,
      |  CAST(sum(ab) * 1000000 // count(*) AS BIGINT) AS abandon_ppm
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("event_type"), col("ts"),
        first(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true)
          .over(w).as("next_purchase"))
      .filter(col("event_type") === "view")
      .select(to_date(col("ts")).as("day"),
        when(col("next_purchase").isNull ||
          unix_micros(col("next_purchase").cast("timestamp")) -
            unix_micros(col("ts").cast("timestamp")) > 1800000000L, 1).otherwise(0).as("ab"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_views"), sum(col("ab")).as("n_abandoned"))
      .select(col("day"), col("n_views"), col("n_abandoned"),
        expr("n_abandoned * 1000000 div n_views").as("abandon_ppm"))
      .orderBy(col("day"))
  }

  /** Count-Min frequency serving — build per-day 64 KB CM sketches of
    * the user activity stream, counter-wise-add them to a corpus
    * sketch ([[graft.functions.CmMergeAgg]] — lossless vs a direct
    * build, CountMinSpec pins byte equality), probe the 10 most-active
    * users. The frequency-point-query member of the sketch tier
    * (SpaceSaving = which keys are big, HLL/bitmap = how many distinct,
    * CM = how often is THIS key): at 100 TB the per-day sketch table is
    * kilobytes/day and any key's activity over any day range is a
    * merge + probe, never a fact rescan. Estimates are one-sided
    * (≥ exact, CountMinSpec pins the bound).
    *
    * Oracle: a CM estimate is min over the D hash rows of the EXACT
    * bucket count on that row — integers, so the only cross-engine
    * question is the bucket hash. The splitmix64 finalizer is
    * replicated in DuckDB on unsigned-64 HUGEINT arithmetic (wrapping
    * multiply split at 2^32 so intermediates stay under 2^127; xor
    * through signed BIGINT round trips), per (user, row) — users are
    * pre-aggregated so the hash runs |users|×D times, not per event. */
  val cmsFreq: GraftOp = GraftOp(
    "q_cms_freq", {
      val M = "18446744073709551616" // 2^64
      val toS = (x: String) =>
        s"CAST($x - CASE WHEN $x >= 9223372036854775808 THEN $M ELSE 0 END AS BIGINT)"
      val toU = (x: String) =>
        s"(CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN $M ELSE 0 END)"
      def mulmod(y: String, c: String) =
        s"((($y % 4294967296) * $c + (($y // 4294967296) * $c % 4294967296) * 4294967296) % $M)"
      // signed two's-complement forms of CmImpls.Seeds
      s"""WITH u AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
         |sd AS (SELECT * FROM (VALUES (0, -7046029254386353131), (1, -4417276706812531889),
         |                             (2, 1609587929392839161), (3, 2870177450012600261)) s(r, seed)),
         |e0 AS (SELECT user_id, cnt, r, xor(user_id, seed) AS sx FROM u CROSS JOIN sd),
         |m1 AS (SELECT user_id, cnt, r,
         |       (${toU("sx")} + 11400714819323198485) % $M AS x FROM e0),
         |m2 AS (SELECT user_id, cnt, r, ${toS("x")} AS sa, CAST(x // 1073741824 AS BIGINT) AS sb FROM m1),
         |m3 AS (SELECT user_id, cnt, r, ${toU("xor(sa, sb)")} AS y FROM m2),
         |m4 AS (SELECT user_id, cnt, r, ${mulmod("y", "13787848793156543929")} AS x FROM m3),
         |m5 AS (SELECT user_id, cnt, r, ${toS("x")} AS sa, CAST(x // 134217728 AS BIGINT) AS sb FROM m4),
         |m6 AS (SELECT user_id, cnt, r, ${toU("xor(sa, sb)")} AS y FROM m5),
         |m7 AS (SELECT user_id, cnt, r, ${mulmod("y", "10723151780598845931")} AS x FROM m6),
         |m8 AS (SELECT user_id, cnt, r, ${toS("x")} AS sa, CAST(x // 2147483648 AS BIGINT) AS sb FROM m7),
         |bk AS (SELECT user_id, cnt, r,
         |       CAST((${toU("xor(sa, sb)")} // 2) % 2048 AS INT) AS b FROM m8),
         |bc AS (SELECT r, b, CAST(sum(cnt) AS BIGINT) AS bucket_cnt FROM bk GROUP BY 1, 2),
         |top AS (SELECT user_id, cnt AS exact_freq FROM u ORDER BY cnt DESC, user_id LIMIT 10),
         |pe AS (SELECT t.user_id, t.exact_freq, min(bc.bucket_cnt) AS est_freq
         |       FROM top t JOIN bk ON bk.user_id = t.user_id
         |       JOIN bc ON bc.r = bk.r AND bc.b = bk.b
         |       GROUP BY 1, 2)
         |SELECT user_id, exact_freq, est_freq FROM pe
         |ORDER BY exact_freq DESC, user_id""".stripMargin
    }) { (s, d) =>
    val ev = Tables.events(s, d).select(to_date(col("ts")).as("day"), col("user_id"))
    val corpus = ev.groupBy(col("day"))
      .agg(graft.functions.cm_sketch_agg(col("user_id")).as("sk"))
      .agg(graft.functions.cm_merge_agg(col("sk")).as("sk"))
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_freq"))
      .orderBy(col("exact_freq").desc, col("user_id")).limit(10)
      .crossJoin(broadcast(corpus)) // one 64 KB row
      .select(col("user_id"), col("exact_freq"),
        graft.functions.cm_estimate(col("sk"), col("user_id")).as("est_freq"))
      .orderBy(col("exact_freq").desc, col("user_id"))
  }

  /** Kaplan-Meier-shaped user-lifetime survival curve: lifetime =
    * whole days between a user's first and last event; S(d) = share of
    * users whose lifetime reaches day d, emitted only at OBSERVED
    * lifetimes (no day spine to generate or disagree on). survivors(d)
    * is a descending cumulative sum over the per-lifetime counts —
    * an unpartitioned window, but over AT MOST one row per distinct
    * lifetime (bounded by the corpus's day span, ~10^2-10^3 at any
    * scale), after the heavy per-user agg shuffled on the only
    * possible key. survival_ppm = floor(survivors·10^6 / total):
    * positive integer division floors identically in both engines. */
  val survival: GraftOp = GraftOp(
    "q_survival",
    """WITH l AS (
      |  SELECT user_id,
      |    date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS life
      |  FROM events GROUP BY 1),
      |d AS (SELECT life, count(*) AS n FROM l GROUP BY 1)
      |SELECT life AS day,
      |  CAST(sum(n) OVER (ORDER BY life DESC) AS BIGINT) AS survivors,
      |  CAST(sum(n) OVER (ORDER BY life DESC) * 1000000
      |    // (SELECT count(*) FROM l) AS BIGINT) AS survival_ppm
      |FROM d ORDER BY day""".stripMargin) { (s, d) =>
    val life = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts")))).as("life"))
    val dist = life.groupBy(col("life")).agg(count(lit(1)).as("n"))
    // bounded unpartitioned window: |rows| = distinct lifetimes ≤ day span
    val wDesc = Window.orderBy(col("life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dist
      .withColumn("survivors", sum(col("n")).over(wDesc))
      .crossJoin(broadcast(life.agg(count(lit(1)).as("total"))))
      .select(col("life").cast(LongType).as("day"),
        col("survivors"),
        expr("survivors * 1000000 div total").as("survival_ppm"))
      .orderBy(col("day"))
  }

  /** Top session-path trigrams — the "what do users DO" navigation
    * readout: sessionize on the q_session 30-minute-gap contract, then
    * slide a 3-event window (two lead()s inside the session) and count
    * ordered event-type trigrams. concat is NULL-absorbing in both
    * engines, so windows that run off a session's end drop out without
    * an explicit length check. Plan: the one per-user window pass
    * q_session already pays (session ids fall out of the same sorted
    * run), a second window keyed (user, session) that REUSES that sort
    * order, and a tiny trigram rollup. */
  val eventPaths: GraftOp = GraftOp(
    "q_event_paths",
    """WITH x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes'
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM y),
      |p AS (
      |  SELECT event_type || '>'
      |      || lead(event_type, 1) OVER ws || '>'
      |      || lead(event_type, 2) OVER ws AS path
      |  FROM z
      |  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id))
      |SELECT path, count(*) AS n FROM p WHERE path IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessioned = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    sessioned
      .select(concat(col("event_type"), lit(">"),
        lead(col("event_type"), 1).over(ws), lit(">"),
        lead(col("event_type"), 2).over(ws)).as("path"))
      .filter(col("path").isNotNull)
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(15)
  }

  /** Day-of-week seasonal index per event type — the weekly-rhythm
    * readout a warehouse dashboard bakes into capacity planning. dow =
    * day_idx % 7 under the fixed 2024-01-01 epoch (convention-free:
    * no locale week-start or tz to disagree on; day_idx ≥ 0 on this
    * corpus so % and floor-mod agree). index_ppm = floor(n·7·10^6 /
    * type total) — 10^6 ≡ flat. ONE fact scan into one (type, dow)
    * partial agg; the per-type total is a window over the ≤|types|·7
    * aggregate, never a second scan. */
  val seasonality: GraftOp = GraftOp(
    "q_seasonality",
    """WITH d AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
      |  CAST(n * 7 * 1000000 // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
      |    AS index_ppm
      |FROM d ORDER BY event_type, dow""".stripMargin) { (s, d) =>
    val agg = Tables.events(s, d)
      .select(col("event_type"),
        (datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)) % 7).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    agg
      .withColumn("total", sum(col("n")).over(byType))
      .select(col("event_type"), col("dow").cast(LongType).as("dow"), col("n"),
        expr("n * 7 * 1000000 div total").as("index_ppm"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Burstiness index per event type (Goh & Barabási): B = (σ−μ)/
    * (σ+μ) over the inter-arrival gaps of each type's corpus-wide
    * stream — B→−1 periodic, B≈0 Poisson, B→1 bursty; the traffic-
    * shape diagnostic behind q_gap_stats' raw percentiles (capacity
    * planning needs the SHAPE, not just the quantiles). Gaps are
    * exact whole seconds (epoch-micros diff under integer division),
    * Σg folds BIGINT-exact and Σg² in DECIMAL(38)/HUGEINT; the
    * variance numerator n·Σg² − (Σg)² is assembled EXACTLY in the same
    * type (r10) and B = (√(nΣg²−(Σg)²) − Σg)/(√(nΣg²−(Σg)²) + Σg) is
    * raw deterministic IEEE (the algebra cancels the /n on both
    * sides). One key-partitioned lag window. */
  val burstiness: GraftOp = GraftOp(
    "q_burstiness",
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id))) // 1000000 AS gap
      |  FROM events),
      |a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(gap) AS BIGINT) AS s,
      |    CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS ss
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT event_type, n,
      |  CAST(s AS DOUBLE) / n AS mean_gap_s,
      |  (sqrt(CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS DOUBLE))
      |      - CAST(s AS DOUBLE))
      |    / (sqrt(CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS DOUBLE))
      |      + CAST(s AS DOUBLE)) AS burstiness
      |FROM a ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        expr("""(unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(lag(ts) OVER (
          | PARTITION BY event_type ORDER BY ts, event_id) AS TIMESTAMP))) div 1000000"""
          .stripMargin).as("gap"))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("gap")).as("s"),
        sum(col("gap").cast(DecimalType(38, 0)) * col("gap")).as("ss"))
      .select(col("event_type"), col("n"),
        expr("CAST(s AS DOUBLE) / n").as("mean_gap_s"),
        expr("""(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE))
          |   - CAST(s AS DOUBLE))
          | / (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE))
          |   + CAST(s AS DOUBLE))""".stripMargin).as("burstiness"))
      .orderBy(col("event_type"))
  }

  /** First-order Markov model of the event stream: the full
    * row-normalized transition matrix P(next | current) — q_transitions
    * keeps the top-20 raw counts; this emits EVERY cell with its
    * probability, the object a next-event predictor or a journey
    * simulator consumes. Same single user-partitioned window pass; the
    * matrix is |types|²-bounded, the per-row total joins back
    * broadcast, and the probability is the one double division over
    * two exact counts. */
  val markov: GraftOp = GraftOp(
    "q_markov",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |c AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / tot AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val c = Tables.events(s, d)
      .select(col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("CAST(n AS DOUBLE) / tot").as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Power-user curve: how many users were active on exactly k
    * distinct days, with the reverse-cumulative count (users active on
    * ≥ k days) — the engagement-depth histogram behind "power user"
    * cuts (pairs with q_stickiness's single-ratio view). One distinct
    * (user, day) pass, one per-user aggregate; the cumulative runs
    * over the ≤|days| histogram rows, not users. */
  val powerCurve: GraftOp = GraftOp(
    "q_power_curve",
    """WITH a AS (
      |  SELECT user_id, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
      |  FROM events GROUP BY 1),
      |h AS (SELECT days, CAST(count(*) AS BIGINT) AS n_users FROM a GROUP BY 1)
      |SELECT CAST(days AS INT) AS active_days, n_users,
      |  CAST(sum(n_users) OVER (ORDER BY days DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS users_at_least
      |FROM h ORDER BY active_days""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val h = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("days"))
      .groupBy(col("days")).agg(count(lit(1)).as("n_users"))
    val cum = Window.orderBy(col("days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.select(col("days").cast(IntegerType).as("active_days"), col("n_users"),
        sum(col("n_users")).over(cum).as("users_at_least"))
      .orderBy(col("active_days"))
  }

  /** Weekday × hour activity heatmap with each cell's ppm share of its
    * weekday — the "when is our traffic" calendar view (q_seasonality
    * gives the weekday axis; this is the full 7×24 grid). The share is
    * EXACT integer ppm (n·10⁶ ÷ weekday total, floor) — no double
    * division to disagree on; the grid is 168-bounded. */
  val hourHeatmap: GraftOp = GraftOp(
    "q_hour_heatmap",
    """WITH c AS (
      |  SELECT CAST(date_part('dow', ts) AS INT) AS dow,
      |    CAST(date_part('hour', ts) AS INT) AS hr,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT dow, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
      |SELECT dow, hr, n, n * 1000000 // tot AS dow_share_ppm
      |FROM c JOIN t USING (dow)
      |ORDER BY dow, hr""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select((dayofweek(col("ts")) - 1).cast("int").as("dow"),
        hour(col("ts")).cast("int").as("hr"))
      .groupBy(col("dow"), col("hr"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("dow")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(t), Seq("dow"))
      .select(col("dow"), col("hr"), col("n"),
        expr("n * 1000000 div tot").as("dow_share_ppm"))
      .orderBy(col("dow"), col("hr"))
  }

  /** Daily peak concurrent sessions — the capacity-planning sweep
    * line: +1 at each session start, −1 at its end, running sum, max.
    * Sessions come from the standard 30-min-gap sessionization
    * (q_session's CTE); each session counts in its START day (stated
    * semantics — no midnight clipping, identical both engines). Ties
    * at the same instant process starts before ends (inclusive
    * endpoints), and the day's MAX of the running sum is invariant to
    * the ordering of same-timestamp deltas, so the emitted peak is
    * deterministic even though intermediate prefix sums are not.
    * Scale shape: the sweep window partitions by DAY — per-reducer
    * work is bounded by a day's session count, the same bound every
    * daily rollup here already carries. */
  val peakConcurrency: GraftOp = GraftOp(
    "q_peak_concurrency",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT user_id, ts,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM y),
      |se AS (
      |  SELECT user_id, session_id, min(ts) AS st, max(ts) AS en
      |  FROM z GROUP BY 1, 2),
      |dl AS (
      |  SELECT CAST(st AS DATE) AS day, st AS ts, 1 AS delta FROM se
      |  UNION ALL
      |  SELECT CAST(st AS DATE) AS day, en AS ts, -1 AS delta FROM se),
      |r AS (
      |  SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
      |    ROWS UNBOUNDED PRECEDING) AS c
      |  FROM dl),
      |pk AS (SELECT day, CAST(max(c) AS BIGINT) AS peak_concurrency FROM r GROUP BY 1),
      |ns AS (SELECT CAST(st AS DATE) AS day, count(*) AS n_sessions FROM se GROUP BY 1)
      |SELECT pk.day AS day, ns.n_sessions, pk.peak_concurrency
      |FROM pk JOIN ns ON pk.day = ns.day
      |ORDER BY pk.day""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val se = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    val dl = se.select(col("st").cast(DateType).as("day"), col("st").as("ts"), lit(1).as("delta"))
      .unionAll(se.select(col("st").cast(DateType).as("day"), col("en").as("ts"), lit(-1).as("delta")))
    val r = dl.withColumn("c",
      sum(col("delta")).over(Window.partitionBy(col("day"))
        .orderBy(col("ts"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pk = r.groupBy(col("day")).agg(max(col("c")).cast(LongType).as("peak_concurrency"))
    val ns = se.groupBy(col("st").cast(DateType).as("day")).agg(count(lit(1)).as("n_sessions"))
    pk.join(ns, "day").select(col("day"), col("n_sessions"), col("peak_concurrency"))
      .orderBy(col("day"))
  }

  /** Kaplan-Meier survival with RIGHT-CENSORING — the estimator
    * [[survival]] approximates only when everyone's story has ended:
    * users whose last event falls in the corpus's final 7 days are
    * still alive (censored), and counting them as deaths biases
    * lifetime down. Per observed lifetime t: d_t deaths, c_t
    * censorings, risk set n_t = total − prefix(d+c) — all exact
    * BIGINTs over a value-domain-bounded window (≤ one row per
    * distinct lifetime, the q_survival discipline). The product-limit
    * S(t) = Π(1−d/n) runs as exp(Σ ln(...)) with IDENTICAL formula
    * text both engines and a 6dp emit; a d=n row (everyone at risk
    * dies) would send ln to −∞ where the engines disagree (null vs
    * -inf), so a prefix flag pins S to exactly 0.0 from there on —
    * same CASE text both sides. */
  val kmCensored: GraftOp = GraftOp(
    "q_km_censored",
    """WITH mx AS (SELECT max(ts) AS mt FROM events),
      |l AS (
      |  SELECT user_id,
      |    date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS life,
      |    CASE WHEN max(ts) >= (SELECT mt FROM mx) - INTERVAL '7 days' THEN 1 ELSE 0 END AS censored
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT life,
      |    CAST(count(*) FILTER (WHERE censored = 0) AS BIGINT) AS d,
      |    CAST(count(*) FILTER (WHERE censored = 1) AS BIGINT) AS c
      |  FROM l GROUP BY 1),
      |r AS (
      |  SELECT life, d, c,
      |    CAST((SELECT count(*) FROM l) - coalesce(sum(d + c) OVER (ORDER BY life
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      |  FROM d),
      |f AS (
      |  SELECT life, d, c, n_risk,
      |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dies_out,
      |    CASE WHEN d = n_risk OR d = 0 THEN 0.0
      |         ELSE ln(1.0 - CAST(d AS DOUBLE) / n_risk) END AS lnf
      |  FROM r)
      |SELECT life AS day, d AS deaths, c AS censored, n_risk,
      |  CASE WHEN max(dies_out) OVER (ORDER BY life
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 THEN 0.0
      |       ELSE round(exp(sum(lnf) OVER (ORDER BY life
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END AS survival
      |FROM f ORDER BY day""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("ts")).as("mt"))
    val l = ev.groupBy(col("user_id"))
      .agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts")))).as("life"),
        max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(mx))
      .select(col("life"),
        when(col("last_ts") >= col("mt") - expr("INTERVAL 7 DAYS"), 1).otherwise(0).as("censored"))
    val dd = l.groupBy(col("life"))
      .agg(count(when(col("censored") === 0, 1)).as("d"),
        count(when(col("censored") === 1, 1)).as("c"))
    val total = l.agg(count(lit(1)).as("n_total"))
    val byLife = Window.orderBy(col("life")).rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.orderBy(col("life")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd.crossJoin(broadcast(total))
      .withColumn("n_risk",
        (col("n_total") - coalesce(sum(col("d") + col("c")).over(byLife), lit(0L))).cast(LongType))
      .withColumn("dies_out", when(col("d") === col("n_risk"), 1).otherwise(0))
      .withColumn("lnf",
        expr("""CASE WHEN d = n_risk OR d = 0 THEN 0.0
          | ELSE ln(1.0 - CAST(d AS DOUBLE) / n_risk) END""".stripMargin))
      .select(col("life").as("day"), col("d").as("deaths"), col("c").as("censored"),
        col("n_risk"),
        when(max(col("dies_out")).over(run) === 1, 0.0)
          .otherwise(round(exp(sum(col("lnf")).over(run)), 6)).as("survival"))
      .orderBy(col("day"))
  }

  /** L28 engagement histogram — the growth-team readout next to
    * [[stickiness]]'s single DAU/MAU ratio: the full DISTRIBUTION of
    * days-active per user over the trailing 28 days ("Lness" — a
    * spike at L1 is drive-by traffic, mass at L20+ is a habit). The
    * window anchors at the corpus's max day (broadcast 1-row agg);
    * days-active and the histogram are exact integer counts, the
    * user-share ppm an integral division. Two hash aggregates, both
    * map-side combinable — linear at any scale, emit ≤28 rows. */
  val l28: GraftOp = GraftOp(
    "q_l28",
    """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS mxd FROM events),
      |u AS (
      |  SELECT user_id, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_active
      |  FROM events, mx
      |  WHERE CAST(ts AS DATE) > mxd - 28
      |  GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u)
      |SELECT days_active, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(*) * 1000000 // t.n_users AS BIGINT) AS share_ppm
      |FROM u, t GROUP BY 1, t.n_users ORDER BY 1""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    val u = ev.crossJoin(broadcast(mx))
      .filter(col("day") > date_sub(col("mxd"), 28))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("day")).as("days_active"))
    val t = broadcast(u.agg(count(lit(1)).as("n_users_total")))
    u.groupBy(col("days_active")).agg(count(lit(1)).as("n_users"))
      .crossJoin(t)
      .select(col("days_active"), col("n_users"),
        expr("CAST(n_users * 1000000 div n_users_total AS BIGINT)").as("share_ppm"))
      .orderBy(col("days_active"))
  }

  /** Daily growth accounting — the four-way DAU decomposition
    * (new / retained / resurrected / churned) every growth team runs
    * (a flat DAU can hide "high churn masked by high acquisition";
    * q_new_returning sees only the new/old split, this closes the
    * loop with the two LAG-defined states). Per active (user, day):
    * lag(day) classifies new (no prev), retained (prev = day−1) or
    * resurrected (prev < day−1); churn is charged to day+1 for every
    * active day whose lead is absent or skips a day (right-censored
    * at the corpus horizon — users active on the last day never churn
    * in-window, stated identically in both engines). Day rows where
    * only churn happens survive via the full outer join. All exact
    * integer counts; the quick ratio (new+resurrected)/churned is one
    * double divide, NULL when churn is zero. Windows partition by
    * user — billion-user scale shards cleanly. */
  val growthAccounting: GraftOp = GraftOp(
    "q_growth_accounting",
    """WITH a AS (
      |  SELECT DISTINCT user_id,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      |  FROM events),
      |mx AS (SELECT max(day_idx) AS mxd FROM a),
      |s AS (
      |  SELECT user_id, day_idx,
      |    lag(day_idx) OVER (PARTITION BY user_id ORDER BY day_idx) AS prev,
      |    lead(day_idx) OVER (PARTITION BY user_id ORDER BY day_idx) AS nxt
      |  FROM a),
      |act AS (
      |  SELECT day_idx,
      |    CAST(count(*) FILTER (WHERE prev IS NULL) AS BIGINT) AS new_users,
      |    CAST(count(*) FILTER (WHERE prev = day_idx - 1) AS BIGINT) AS retained,
      |    CAST(count(*) FILTER (WHERE prev IS NOT NULL AND prev < day_idx - 1) AS BIGINT)
      |      AS resurrected
      |  FROM s GROUP BY 1),
      |ch AS (
      |  SELECT s.day_idx + 1 AS day_idx, CAST(count(*) AS BIGINT) AS churned
      |  FROM s, mx
      |  WHERE (s.nxt IS NULL OR s.nxt > s.day_idx + 1) AND s.day_idx + 1 <= mx.mxd
      |  GROUP BY 1)
      |SELECT CAST(coalesce(act.day_idx, ch.day_idx) AS INT) AS day_idx,
      |  coalesce(act.new_users, 0) AS new_users,
      |  coalesce(act.retained, 0) AS retained,
      |  coalesce(act.resurrected, 0) AS resurrected,
      |  coalesce(ch.churned, 0) AS churned,
      |  CASE WHEN coalesce(ch.churned, 0) > 0 THEN
      |    (CAST(coalesce(act.new_users, 0) AS DOUBLE) + coalesce(act.resurrected, 0))
      |      / CAST(ch.churned AS DOUBLE)
      |  ELSE NULL END AS quick_ratio
      |FROM act FULL OUTER JOIN ch ON act.day_idx = ch.day_idx
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val a = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("day_idx"))
      .distinct()
    val mx = broadcast(a.agg(max(col("day_idx")).as("mxd")))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
    val st = a
      .withColumn("prev", lag(col("day_idx"), 1).over(byUser))
      .withColumn("nxt", lead(col("day_idx"), 1).over(byUser))
    val act = st.groupBy(col("day_idx"))
      .agg(count(when(col("prev").isNull, 1)).as("new_users"),
        count(when(col("prev") === col("day_idx") - 1, 1)).as("retained"),
        count(when(col("prev").isNotNull && col("prev") < col("day_idx") - 1, 1))
          .as("resurrected"))
    val ch = st.crossJoin(mx)
      .filter((col("nxt").isNull || col("nxt") > col("day_idx") + 1) &&
        col("day_idx") + 1 <= col("mxd"))
      .groupBy((col("day_idx") + 1).as("day_idx"))
      .agg(count(lit(1)).as("churned"))
    act.join(ch, Seq("day_idx"), "full_outer")
      .select(col("day_idx").cast(IntegerType).as("day_idx"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        coalesce(col("resurrected"), lit(0L)).as("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned"),
        expr("""CASE WHEN coalesce(churned, 0) > 0 THEN
          |  (CAST(coalesce(new_users, 0) AS DOUBLE) + coalesce(resurrected, 0))
          |    / CAST(churned AS DOUBLE)
          |ELSE NULL END""".stripMargin).as("quick_ratio"))
      .orderBy(col("day_idx"))
  }

  val ops: Seq[GraftOp] =
    Seq(latestPerKey, funnel, abFunnel, funnelLatency, attribution, retention, newVsReturning, stickiness, wowGrowth, anomalyDays, cohortLtv, dailyPercentiles, tsSimilarity, gapFill, interpolate, outliers, robustOutliers,
      winsorized, decay, chiSquare, trailingActive,
      transitions, gapStats, windowFunnel, ewma, cusum, regression, sequenceCount, hllRollup, bitmapRollup,
      hllTrailing, thetaMonths, survival, eventPaths, seasonality, cmsFreq, abandonment,
      seasonalAnomaly, markov, powerCurve, hourHeatmap, burstiness, peakConcurrency, kmCensored,
      l28, growthAccounting)

}
