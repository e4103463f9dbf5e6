package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference ETL surface (SURVEY.md §2a), re-expressed Spark-first.
  *
  * The reference (`/root/reference/src/main/scala/...`) consumes a Kafka
  * topic of JSON, validates required fields (dropping "dirty" records,
  * MyKafkaDeserializationSchema.scala:44-60), enriches with source
  * metadata + derived date columns (MyWindowFunction.scala:40-43),
  * batches per key with a count window (KafakToClickhouse.scala:57-60)
  * and emits multi-row INSERT statements with type-aware literal
  * formatting (MyWindowFunction.scala:36-60).
  *
  * Here the `events` table stands in for the topic (`event_id`≈offset,
  * `user_id`≈essCode, `ts`≈cTime, `props`≈payload). Everything is
  * declarative DataFrame API — validation is a predicate the optimizer
  * can push into the scan; batching is one shuffle on the key; SQL
  * generation is codegen'd string expressions, no driver-side loops.
  */
object EtlOps {

  private val reqK = "props RLIKE '\"k\"\\\\s*:'"
  private val maxValid = 175.0

  /** Validity predicate ≈ reference `checkAndProcess` required-field
    * check, plus a range rule (the configurable part of validation).
    * Wrapped in coalesce(_, false): a NULL field makes the raw
    * predicate NULL, and NULL fails BOTH `filter(p)` and `filter(!p)`
    * — the record would vanish from valid AND dirty. */
  private def isValid: Column = coalesce(
    col("user_id").isNotNull && col("ts").isNotNull &&
      col("event_type").isin("click", "error", "purchase", "signup", "view") &&
      expr(reqK) && col("value") >= 0 && col("value") <= maxValid,
    lit(false))

  private val sqlIsValid: String =
    """COALESCE(user_id IS NOT NULL AND ts IS NOT NULL
      | AND event_type IN ('click','error','purchase','signup','view')
      | AND regexp_matches(props, '"k"\s*:')
      | AND value >= 0 AND value <= 175.0, FALSE)""".stripMargin.replace("\n", "")

  /** JSON payload field extraction (fastjson `getString` equivalent). */
  val jsonExtract: GraftOp = GraftOp(
    "etl_json_extract",
    """SELECT event_id, event_type,
      |  CAST(NULLIF(regexp_extract(props, '"k"\s*:\s*(\d+)', 1), '') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        nullif(regexp_extract(col("props"), "\"k\"\\s*:\\s*(\\d+)", 1), lit("")).cast(IntegerType).as("k"))
      .orderBy(col("event_id"))
  }

  /** Required-field + range validation: the clean stream. */
  val validate: GraftOp = GraftOp(
    "etl_validate",
    s"""SELECT event_id, user_id, event_type, value
       |FROM events WHERE $sqlIsValid ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(isValid)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Dirty-record routing: the complement stream, with a reason column
    * (reference just printlns dirty records; we route them). */
  val dirty: GraftOp = GraftOp(
    "etl_dirty",
    s"""SELECT event_id, user_id, value,
       |  CASE WHEN user_id IS NULL OR ts IS NULL THEN 'missing_field'
       |       WHEN NOT regexp_matches(props, '"k"\\s*:') THEN 'missing_k'
       |       WHEN event_type NOT IN ('click','error','purchase','signup','view') THEN 'bad_type'
       |       ELSE 'value_range' END AS reason
       |FROM events WHERE NOT ($sqlIsValid) ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(!isValid)
      .select(col("event_id"), col("user_id"), col("value"),
        when(col("user_id").isNull || col("ts").isNull, "missing_field")
          .when(!expr(reqK), "missing_k")
          .when(!col("event_type").isin("click", "error", "purchase", "signup", "view"), "bad_type")
          .otherwise("value_range").as("reason"))
      .orderBy(col("event_id"))
  }

  /** Metadata + derived-column enrichment (`dayOfYear`, topic/offset
    * metadata — reference injects these per record). */
  val enrich: GraftOp = GraftOp(
    "etl_enrich",
    """SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d') AS day,
      |  'events' AS topic_name, user_id % 32 AS topic_partition,
      |  event_id AS topic_offset, 'graft' AS group_id
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        lit("events").as("topic_name"),
        pmod(col("user_id"), lit(32)).as("topic_partition"),
        col("event_id").as("topic_offset"),
        lit("graft").as("group_id"))
      .orderBy(col("event_id"))
  }

  /** Keyed count-window batching (`countWindow(N)` per key): one
    * row_number shuffle, no state, no driver loop. */
  val countBatch: GraftOp = GraftOp(
    "etl_count_batch",
    """WITH numbered AS (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events)
      |SELECT user_id, CAST(floor((rn - 1) / 20) AS BIGINT) AS batch_id,
      |  count(*) AS n, min(event_id) AS min_event, max(event_id) AS max_event,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM numbered GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val byKey = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(byKey))
      .withColumn("batch_id", floor((col("rn") - 1) / 20).cast(LongType))
      .groupBy(col("user_id"), col("batch_id"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy(col("user_id"), col("batch_id"))
  }

  /** Batched INSERT-statement generation with type-aware literal
    * formatting (quote+escape strings, decimal-format numerics —
    * reference MyWindowFunction.formatValue). Pure codegen'd string
    * expressions per row + one bounded collect_list per batch. */
  val batchSql: GraftOp = GraftOp(
    "etl_batch_sql",
    """WITH numbered AS (
      |  SELECT user_id, event_id, event_type, value, strftime(ts, '%Y-%m-%d') AS day,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events),
      |formatted AS (
      |  SELECT user_id, event_id, CAST(floor((rn - 1) / 20) AS BIGINT) AS batch_id,
      |    concat('(', CAST(event_id AS VARCHAR), ',', CAST(user_id AS VARCHAR),
      |      ',''', replace(event_type, '''', ''''''), ''',',
      |      CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR), ',''', day, ''')') AS row_sql
      |  FROM numbered)
      |SELECT user_id, batch_id,
      |  concat('INSERT INTO sink.events (event_id,user_id,event_type,value,day) VALUES ',
      |    string_agg(row_sql, ',' ORDER BY event_id)) AS stmt
      |FROM formatted GROUP BY user_id, batch_id ORDER BY user_id, batch_id""".stripMargin) { (s, d) =>
    val byKey = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val rowSql = concat(
      lit("("), col("event_id").cast(StringType),
      lit(","), col("user_id").cast(StringType),
      lit(",'"), regexp_replace(col("event_type"), "'", "''"),
      lit("',"), col("value").cast(DecimalType(10, 2)).cast(StringType),
      lit(",'"), date_format(col("ts"), "yyyy-MM-dd"), lit("')"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(byKey))
      .withColumn("batch_id", floor((col("rn") - 1) / 20).cast(LongType))
      .withColumn("row_sql", rowSql)
      .groupBy(col("user_id"), col("batch_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("event_id").as("eid"), col("row_sql").as("fmt")))),
          x => x.getField("fmt")),
        ",").as("vals"))
      .select(col("user_id"), col("batch_id"),
        concat(lit("INSERT INTO sink.events (event_id,user_id,event_type,value,day) VALUES "),
          col("vals")).as("stmt"))
      .orderBy(col("user_id"), col("batch_id"))
  }

  /** Replay dedup: at-least-once delivery → effectively-once by keeping
    * the first record per (key, day, type). */
  val keyDedup: GraftOp = GraftOp(
    "etl_key_dedup",
    """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
      |  min(event_id) AS first_event, count(*) AS n_dups
      |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_dups"))
      .orderBy(col("user_id"), col("day"), col("event_type"))
  }

  /** Per-stream arrival-spacing audit — the consumer-side gap monitor
    * an at-least-once ingest runs per key (reference: the Kafka
    * consumer's offset stream per topic): for each event type, the
    * distribution of OFFSET GAPS between its consecutive records in
    * the global sequence (n, max gap, mean gap in exact ppm, p95). A
    * type whose max gap spikes stopped flowing — the silence signal
    * at per-offset resolution. One key-partitioned lag window + a
    * per-key fold over ≤\|gap domain\| values; mean is an integer ppm
    * floor, p95 on the exact-percentile contract. */
  val gapProfile: GraftOp = GraftOp(
    "etl_gap_profile",
    s"""WITH g AS (
       |  SELECT event_type,
       |    event_id - lag(event_id) OVER (PARTITION BY event_type ORDER BY event_id)
       |      AS gap
       |  FROM events),
       |r AS (
       |  SELECT event_type, gap,
       |    row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM g WHERE gap IS NOT NULL),
       |gg AS (
       |  SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
       |    CAST(max(gap) AS BIGINT) AS max_gap,
       |    CAST(sum(gap) * 1000000 // count(*) AS BIGINT) AS mean_gap_ppm,
       |    ${QuantileExact.sqlAggs(95, "gap", "p95")}
       |  FROM r GROUP BY 1)
       |SELECT event_type, n_gaps, max_gap, mean_gap_ppm,
       |  ${QuantileExact.interp("p95_a", "p95_b", "p95_f")} AS p95_gap
       |FROM gg ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"),
        (col("event_id") - lag(col("event_id"), 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("gap"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("__n")).as("n_gaps"),
        (Seq(max(col("gap")).as("max_gap"),
          expr("sum(gap) * 1000000 div count(*)").as("mean_gap_ppm")) ++
          QuantileExact.sparkAggs(95, "gap", "p95")): _*)
      .select(col("event_type"), col("n_gaps"), col("max_gap"), col("mean_gap_ppm"),
        expr(QuantileExact.interp("p95_a", "p95_b", "p95_f")).as("p95_gap"))
      .orderBy(col("event_type"))
  }

  /** CSV ingest with dirty-record quarantine — the delimiter-format
    * sibling of [[jsonExtract]]/[[validate]] (the reference's
    * validate-and-route discipline applied to the other wire format
    * every ingest pipeline meets). Each event renders to a CSV line; a
    * hash-selected 5% carries a corrupted numeric field. `from_csv`
    * (Catalyst's native CSV expression — PERMISSIVE, no UDF) parses
    * them back; rows whose typed field comes back NULL route to the
    * dirty lane, clean rows aggregate per type with exact decimal
    * money. The oracle replays the corruption rule analytically —
    * checking that parse-and-route loses exactly the planted rows and
    * nothing else. */
  val csvExtract: GraftOp = GraftOp(
    "etl_csv_extract",
    s"""WITH e AS (
       |  SELECT event_type, value,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("concat('csv#', CAST(event_id AS VARCHAR))")} % 20 = 0
       |         THEN 1 ELSE 0 END AS corrupt
       |  FROM events)
       |SELECT event_type,
       |  CAST(count(*) FILTER (WHERE corrupt = 0) AS BIGINT) AS n_ok,
       |  CAST(count(*) FILTER (WHERE corrupt = 1) AS BIGINT) AS n_dirty,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE corrupt = 0) AS DOUBLE) AS sum_value
       |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    val corrupt = graft.functions.Exprs.md5Long(
      concat(lit("csv#"), col("event_id").cast(StringType))) % 20 === 0
    val lines = Tables.events(s, d)
      .select(col("event_type").as("orig_type"),
        concat_ws(",", col("event_id"),
          col("event_type"),
          when(corrupt, lit("not-a-number")).otherwise(col("value").cast(StringType)))
          .as("line"))
    val parsed = lines.select(col("orig_type"),
      from_csv(col("line"),
        org.apache.spark.sql.types.StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType))),
        Map.empty[String, String]).as("r"))
    parsed.groupBy(col("orig_type").as("event_type"))
      .agg(
        count(when(col("r.value").isNotNull, 1)).as("n_ok"),
        count(when(col("r.value").isNull, 1)).as("n_dirty"),
        sum(when(col("r.value").isNotNull, col("r.value").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Dead-letter REPLAY: the recoverable half of the dirty route,
    * repaired and re-emitted (the reference only printlns its dirty
    * records; a production pipeline replays what it can). Reason-code
    * driven: `value_range` clamps into [0, maxValid] at 2dp,
    * `missing_k` substitutes the documented default k=0 — both repairs
    * are deterministic column edits; `missing_field`/`bad_type` are
    * terminal (no invented identities) and stay in the dead-letter
    * table, which is the etl_dirty op itself. Same complement-filter
    * scan as etl_dirty — no extra pass over the clean stream.
    *
    * The repaired value is constructed in INTEGER CENTS — half-up via
    * `floor(value*100 + 0.5)`, every step an exact IEEE op identical
    * across engines — then divided once by 100.0 (single rounding).
    * A `CAST(double AS DECIMAL(18,2))` here (the r7 emit) depends on
    * each engine's decimal-cast rounding of off-grid doubles, which
    * diverged across DuckDB VERSIONS (r7's one red row; SURVEY §6). */
  val dirtyReplay: GraftOp = GraftOp(
    "etl_dirty_replay",
    s"""SELECT event_id, user_id, event_type,
       |  CASE WHEN NOT regexp_matches(props, '"k"\\s*:') THEN 'missing_k'
       |       ELSE 'value_range' END AS reason,
       |  CAST(CASE WHEN value < 0 THEN 0
       |       WHEN value > $maxValid THEN ${(maxValid * 100).toLong}
       |       ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS BIGINT) / 100.0
       |    AS value_repaired,
       |  CAST(coalesce(NULLIF(regexp_extract(props, '"k"\\s*:\\s*(\\d+)', 1), ''), '0') AS INT) AS k_repaired
       |FROM events
       |WHERE NOT ($sqlIsValid)
       |  AND user_id IS NOT NULL AND ts IS NOT NULL
       |  AND event_type IN ('click','error','purchase','signup','view')
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(!isValid)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin("click", "error", "purchase", "signup", "view"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        when(!expr(reqK), "missing_k").otherwise("value_range").as("reason"),
        (when(col("value") < 0, lit(0L))
          .when(col("value") > maxValid, lit((maxValid * 100).toLong))
          .otherwise(floor(col("value") * 100 + 0.5).cast(LongType)) / lit(100.0))
          .as("value_repaired"),
        coalesce(nullif(regexp_extract(col("props"), "\"k\"\\s*:\\s*(\\d+)", 1),
          lit("")), lit("0")).cast(IntegerType).as("k_repaired"))
      .orderBy(col("event_id"))
  }

  /** Data-contract drift monitor: profile the first half of the
    * stream (days 0–14) against the second (15+) — the cheap standing
    * check an ingest pipeline runs per batch window so a silently
    * changed producer (nulls appearing, a value-range jump, an enum
    * growing a member, traffic mix shifting) pages BEFORE it poisons
    * downstream tables. Seven metrics × two windows in ONE aggregate
    * pass (conditional aggregation, no self-join), pivoted to a
    * metric-per-row contract table; everything exact integers, drift
    * an exact ppm of the first-half value. The split day and metric
    * list are the declared contract — both engines state them
    * identically. */
  val profileDrift: GraftOp = GraftOp(
    "etl_profile_drift",
    """WITH e AS (
      |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) >= 15 AS h2,
      |    user_id, event_type, props,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT
      |    CAST(count(*) FILTER (WHERE NOT h2) AS BIGINT) AS n1,
      |    CAST(count(*) FILTER (WHERE h2) AS BIGINT) AS n2,
      |    CAST(count(DISTINCT user_id) FILTER (WHERE NOT h2) AS BIGINT) AS u1,
      |    CAST(count(DISTINCT user_id) FILTER (WHERE h2) AS BIGINT) AS u2,
      |    CAST(count(*) FILTER (WHERE NOT h2 AND event_type = 'purchase') AS BIGINT) AS p1,
      |    CAST(count(*) FILTER (WHERE h2 AND event_type = 'purchase') AS BIGINT) AS p2,
      |    CAST(count(*) FILTER (WHERE NOT h2 AND props IS NULL) AS BIGINT) AS np1,
      |    CAST(count(*) FILTER (WHERE h2 AND props IS NULL) AS BIGINT) AS np2,
      |    CAST(min(cents) FILTER (WHERE NOT h2) AS BIGINT) AS mn1,
      |    CAST(min(cents) FILTER (WHERE h2) AS BIGINT) AS mn2,
      |    CAST(max(cents) FILTER (WHERE NOT h2) AS BIGINT) AS mx1,
      |    CAST(max(cents) FILTER (WHERE h2) AS BIGINT) AS mx2,
      |    CAST(count(DISTINCT event_type) FILTER (WHERE NOT h2) AS BIGINT) AS t1,
      |    CAST(count(DISTINCT event_type) FILTER (WHERE h2) AS BIGINT) AS t2
      |  FROM e),
      |m AS (
      |  SELECT 'n_events' AS metric, n1 AS first_half, n2 AS second_half FROM g
      |  UNION ALL SELECT 'n_users', u1, u2 FROM g
      |  UNION ALL SELECT 'n_purchases', p1, p2 FROM g
      |  UNION ALL SELECT 'null_props', np1, np2 FROM g
      |  UNION ALL SELECT 'value_cents_min', mn1, mn2 FROM g
      |  UNION ALL SELECT 'value_cents_max', mx1, mx2 FROM g
      |  UNION ALL SELECT 'distinct_types', t1, t2 FROM g)
      |SELECT metric, first_half, second_half,
      |  CAST(abs(second_half - first_half) * 1000000
      |    // greatest(abs(first_half), 1) AS BIGINT) AS drift_ppm
      |FROM m ORDER BY metric""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(
        (datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)) >= 15).as("h2"),
        col("user_id"), col("event_type"), col("props"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val g = e.agg(
      count(when(!col("h2"), 1)).as("n1"), count(when(col("h2"), 1)).as("n2"),
      countDistinct(when(!col("h2"), col("user_id"))).as("u1"),
      countDistinct(when(col("h2"), col("user_id"))).as("u2"),
      count(when(!col("h2") && col("event_type") === "purchase", 1)).as("p1"),
      count(when(col("h2") && col("event_type") === "purchase", 1)).as("p2"),
      count(when(!col("h2") && col("props").isNull, 1)).as("np1"),
      count(when(col("h2") && col("props").isNull, 1)).as("np2"),
      min(when(!col("h2"), col("cents"))).as("mn1"),
      min(when(col("h2"), col("cents"))).as("mn2"),
      max(when(!col("h2"), col("cents"))).as("mx1"),
      max(when(col("h2"), col("cents"))).as("mx2"),
      countDistinct(when(!col("h2"), col("event_type"))).as("t1"),
      countDistinct(when(col("h2"), col("event_type"))).as("t2"))
    val m = g.selectExpr("stack(7, " +
      "'n_events', n1, n2, 'n_users', u1, u2, 'n_purchases', p1, p2, " +
      "'null_props', np1, np2, 'value_cents_min', mn1, mn2, " +
      "'value_cents_max', mx1, mx2, 'distinct_types', t1, t2) " +
      "AS (metric, first_half, second_half)")
    m.select(col("metric"), col("first_half"), col("second_half"),
        expr("""CAST(abs(second_half - first_half) * 1000000
          |  div greatest(abs(first_half), 1) AS BIGINT)""".stripMargin).as("drift_ppm"))
      .orderBy(col("metric"))
  }

  val ops: Seq[GraftOp] = Seq(
    jsonExtract, validate, dirty, enrich, countBatch, batchSql, keyDedup, gapProfile,
    csvExtract, dirtyReplay, profileDrift)
}
