package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without an equi key.
  *
  * Spark plans `point BETWEEN start AND end` with no equality conjunct
  * as a broadcast-nested-loop join — O(n·m) row comparisons, the
  * classic silent scale-killer. `binnedPointInterval` rewrites it as an
  * equi join: intervals explode into the fixed-width time bins they
  * cover, points compute their bin in place, the join runs on the bin
  * key (one hash shuffle), and the exact range predicate re-filters
  * within each bin. Replication factor = interval_len / bin + 1, so
  * pick `binSeconds` near the typical interval length. This is the
  * standard interval-join strategy (cf. Flink's interval join and
  * DuckDB's IEJoin motivation) expressed as plain DataFrame ops.
  */
object RangeJoin {

  /** Equi-bin rewrite of `points ⋈ intervals ON point ∈ [start, end)`.
    * `point`, `start`, `end` are timestamp columns; output = all
    * (point-row, interval-row) matches.
    *
    * Guards: intervals with `end < start` can match no point and are
    * dropped BEFORE the bin explode (a reversed pair would otherwise
    * make `sequence` infer a negative step and emit a garbage bin
    * array); an interval covering more than `maxBins` bins fails the
    * job loudly — one corrupt multi-year interval exploding into
    * millions of bin rows is an executor OOM, and silently clamping it
    * would silently drop matches. Size `binSeconds` near the typical
    * interval length so replication stays O(1). */
  def binnedPointInterval(
      points: DataFrame, pointTs: Column,
      intervals: DataFrame, startTs: Column, endTs: Column,
      binSeconds: Long, maxBins: Int = 10000): DataFrame =
    binnedPointIntervalBy(points, pointTs, intervals, startTs, endTs,
      c => floor(unix_timestamp(c) / binSeconds), maxBins)

  /** Domain-generic form of the equi-bin rewrite: `bin` maps a domain
    * value (timestamp, price, offset, id…) to a LONG bin index and
    * must be monotone non-decreasing — floor-division by a fixed width
    * is the canonical instance. The timestamp wrapper above and the
    * numeric `floor(c / width)` case in RangeJoinSpec are both this
    * function.
    *
    * Note on the inclusive end bin: `bin(end)` is included even though
    * `end` is exclusive — a coarser-than-domain bin function (e.g.
    * second-truncating unix_timestamp over sub-second timestamps) can
    * map a point below `end` into `bin(end)`. When `end` sits exactly
    * on a boundary the extra bin's rows are discarded by the exact
    * re-filter — replication, not error. */
  def binnedPointIntervalBy(
      points: DataFrame, pointCol: Column,
      intervals: DataFrame, startCol: Column, endCol: Column,
      bin: Column => Column, maxBins: Int = 10000): DataFrame = {
    for (df <- Seq(points, intervals); c <- Seq("__bin", "__bins"))
      require(!df.columns.contains(c),
        s"binnedPointInterval reserves column name $c")
    val p = points.withColumn("__bin", bin(pointCol))
    val startBin = bin(startCol)
    val endBin = bin(endCol)
    val i = intervals
      .filter(endCol >= startCol)
      .withColumn("__bins",
        when(endBin - startBin < lit(maxBins.toLong), sequence(startBin, endBin))
          .otherwise(raise_error(format_string(
            s"binnedPointInterval: interval spans %d bins (max $maxBins) — " +
              "corrupt interval or bin width far too small",
            endBin - startBin + 1))))
      .withColumn("__bin", explode(col("__bins"))).drop("__bins")
    p.join(i, Seq("__bin"))
      .filter(pointCol >= startCol && pointCol < endCol)
      .drop("__bin")
  }

  /** Purchases within 10 minutes after each signup (temporal
    * co-occurrence with NO shared key — a genuine range join). The
    * DuckDB oracle states the naive range predicate; the Spark plan is
    * the binned equi rewrite, so the hash match also proves the
    * rewrite's correctness. Signups with zero follow-ups are kept. */
  val qRangeJoin: GraftOp = GraftOp(
    "q_range_join",
    """WITH s AS (SELECT event_id AS signup_id, ts AS s_ts FROM events WHERE event_type = 'signup'),
      |p AS (SELECT event_id AS purchase_id, ts AS p_ts FROM events WHERE event_type = 'purchase')
      |SELECT signup_id, count(purchase_id) AS n_follow
      |FROM s LEFT JOIN p ON p_ts >= s_ts AND p_ts < s_ts + INTERVAL '10 minutes'
      |GROUP BY signup_id ORDER BY signup_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("s_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val matched = binnedPointInterval(
        purchases, col("p_ts"), signups, col("s_ts"), col("s_end"), binSeconds = 600L)
      .groupBy(col("signup_id")).agg(count(col("purchase_id")).as("n_follow"))
    signups.select(col("signup_id"))
      .join(matched, Seq("signup_id"), "left_outer")
      .select(col("signup_id"), coalesce(col("n_follow"), lit(0L)).as("n_follow"))
      .orderBy(col("signup_id"))
  }

  /** Equi-bin rewrite of `left ⋈ right ON overlap([ls,le), [rs,re))`.
    * Both interval sets explode into covered bins and hash-join on the
    * bin; a pair overlapping several bins would duplicate, so matches
    * are kept ONLY in the canonical bin containing max(ls, rs) — every
    * overlapping pair shares exactly that bin (floor is monotone and
    * both intervals cover their overlap's start), which dedupes
    * without a distinct shuffle. Same guards as the point form. */
  def binnedIntervalOverlap(
      left: DataFrame, ls: Column, le: Column,
      right: DataFrame, rs: Column, re: Column,
      binSeconds: Long, maxBins: Int = 10000): DataFrame =
    binnedIntervalOverlapBy(left, ls, le, right, rs, re,
      c => floor(unix_timestamp(c) / binSeconds), maxBins)

  /** Domain-generic interval-overlap rewrite — same `bin` contract as
    * [[binnedPointIntervalBy]] (monotone non-decreasing into LONG). */
  def binnedIntervalOverlapBy(
      left: DataFrame, ls: Column, le: Column,
      right: DataFrame, rs: Column, re: Column,
      bin: Column => Column, maxBins: Int = 10000): DataFrame = {
    for (df <- Seq(left, right); c <- Seq("__bin", "__bins", "__sbin_l", "__sbin_r"))
      require(!df.columns.contains(c),
        s"binnedIntervalOverlap reserves column name $c")
    def explodeBins(df: DataFrame, s: Column, e: Column, startBinName: String): DataFrame = {
      val sb = bin(s)
      val eb = bin(e)
      df.filter(e >= s)
        .withColumn(startBinName, sb)
        .withColumn("__bins",
          when(eb - sb < lit(maxBins.toLong), sequence(sb, eb))
            .otherwise(raise_error(format_string(
              s"binnedIntervalOverlap: interval spans %d bins (max $maxBins)",
              eb - sb + 1))))
        .withColumn("__bin", explode(col("__bins"))).drop("__bins")
    }
    explodeBins(left, ls, le, "__sbin_l")
      .join(explodeBins(right, rs, re, "__sbin_r"), Seq("__bin"))
      .filter(ls < re && rs < le) // exact half-open overlap
      .filter(col("__bin") === greatest(col("__sbin_l"), col("__sbin_r")))
      .drop("__bin", "__sbin_l", "__sbin_r")
  }

  /** Overlapping activity windows across event types: each signup
    * opens a 30-minute window, each purchase a 10-minute window; pairs
    * whose windows overlap, with the overlap duration. NO shared key —
    * a genuine interval-interval join, executed as the binned equi
    * rewrite (the DuckDB oracle states the naive overlap predicate, so
    * the hash match proves the rewrite + canonical-bin dedup). */
  val qIntervalOverlap: GraftOp = GraftOp(
    "q_interval_overlap",
    """WITH s AS (
      |  SELECT event_id AS signup_id, ts AS s_s, ts + INTERVAL '30 minutes' AS s_e
      |  FROM events WHERE event_type = 'signup'),
      |p AS (
      |  SELECT event_id AS purchase_id, ts AS p_s, ts + INTERVAL '10 minutes' AS p_e
      |  FROM events WHERE event_type = 'purchase')
      |SELECT signup_id, purchase_id,
      |  date_diff('second', greatest(s_s, p_s), least(s_e, p_e)) AS overlap_sec
      |FROM s JOIN p ON s_s < p_e AND p_s < s_e
      |ORDER BY signup_id, purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_s"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("s_e"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_s"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("p_e"))
    binnedIntervalOverlap(signups, col("s_s"), col("s_e"),
        purchases, col("p_s"), col("p_e"), binSeconds = 1200L)
      .select(col("signup_id"), col("purchase_id"),
        (unix_timestamp(least(col("s_e"), col("p_e"))) -
          unix_timestamp(greatest(col("s_s"), col("p_s")))).as("overlap_sec"))
      .orderBy(col("signup_id"), col("purchase_id"))
  }

  val ops: Seq[GraftOp] = Seq(qRangeJoin, qIntervalOverlap)
}
