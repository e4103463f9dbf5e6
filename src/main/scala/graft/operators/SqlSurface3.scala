package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Third SQL-surface batch (round 2): pivot, positional explode,
  * bucketed histogram — each oracle-checked against DuckDB. */
object SqlSurface3 {

  /** PIVOT: order-status counts spread to columns per priority. Spark's
    * pivot leaves empty cells null; both engines emit 0 instead so the
    * contract is engine-agnostic. */
  val qPivot: GraftOp = GraftOp(
    "q_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))
  }

  /** Positional explode: token + 0-based position per document (DuckDB
    * zips same-level unnests in the SELECT list). Bounded to the first
    * 50 docs to keep the contract output small. */
  val qPosexplode: GraftOp = GraftOp(
    "q_posexplode",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id,
      |  unnest(range(0, len(toks))) AS pos,
      |  unnest(toks) AS tok
      |FROM t ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), "\\s+")))
      .toDF("doc_id", "pos", "tok")
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Bucketed value histogram (fixed-width bins — the shape behind any
    * distribution dashboard; floor-division keys shuffle once). */
  val qHistogram: GraftOp = GraftOp(
    "q_histogram",
    """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
      |  count(*) AS n,
      |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(floor(col("value") / 25.0).as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 6).as("lo"), round(max(col("value")), 6).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Equi-depth (quantile-bucket) histogram with EXACT ntile semantics
    * over a TOTAL order (value, event_id — the tie-break makes every
    * engine cut the same rows into the same buckets) — but WITHOUT the
    * single-reducer global-sort window `ntile` plans to. Distributed
    * exact rank in two passes over one range-partitioned frame:
    *
    *   1. `repartitionByRange(value, event_id)` → globally ordered
    *      partitions; per-partition row counts (≤ P rows) prefix-sum on
    *      the driver into per-partition rank offsets.
    *   2. partition-local `row_number` + offset = exact 0-based global
    *      rank; the closed-form ntile rule (first n%b buckets take
    *      ⌈n/b⌉ rows, the rest ⌊n/b⌋) maps rank → bucket.
    *
    * Every task sees ≤ |rows|/P rows — nothing funnels the corpus to
    * one reducer (the distributed shape of ClickHouse's exact-quantile
    * family; the approximate sibling is q_approx_percentile). The
    * ranged frame is persisted (CachedPlans) so the count pass and the
    * rank pass observe the identical partition assignment. */
  val qEquidepth: GraftOp = GraftOp(
    "q_equidepth",
    """WITH t AS (
      |  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
      |  FROM events)
      |SELECT bucket, count(*) AS n, min(value) AS lo, max(value) AS hi
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val b = 10
    // Size-gated local route: below the threshold a single-partition
    // ntile IS the right plan (one shuffle, no sampling/offset passes);
    // the distributed rank path below it exists for the regime where a
    // global sort into one task would not fit. Identical buckets: ntile
    // assigns ⌈n/b⌉ to the first n%b buckets — the same split the
    // offset formula computes — over the same (value, event_id) order.
    val input = Tables.events(s, d).select(col("value"), col("event_id"))
    val localMax = s.conf.getOption("spark.graft.equidepth.localMaxBytes")
      .map(BigInt(_)).getOrElse(BigInt(256L << 20))
    if (ApproxRouting.inputBytes(input) <= localMax) {
      ApproxRouting.lastDecision.put("q_equidepth", "local")
      input
        .withColumn("bucket",
          ntile(b).over(Window.orderBy(col("value"), col("event_id"))))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("bucket"))
    } else {
      ApproxRouting.lastDecision.put("q_equidepth", "distributed")
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ranged = graft.CachedPlans.cached(s, s"equidepth.ranged:$d") {
        input
          .repartitionByRange(parts, col("value"), col("event_id"))
          .withColumn("__pid", spark_partition_id())
      }
      // pass 1: per-partition counts → driver-side prefix sums (≤ P rows)
      val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val total = counts.map(_._2).sum
      var acc = 0L
      val offsets: Map[Int, Long] =
        counts.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
      val big = total / b + 1 // size of the first (total % b) buckets
      val cut = (total % b) * big // rank where bucket size drops to ⌊n/b⌋
      val small = math.max(total / b, 1L) // guard: unreachable branch when n < b
      // pass 2: exact global rank = partition offset + local row_number
      val r0 = element_at(typedLit(offsets), col("__pid")) +
        row_number().over(Window.partitionBy(col("__pid"))
          .orderBy(col("value"), col("event_id"))) - 1
      ranged
        .withColumn("__r0", r0)
        .withColumn("bucket",
          (when(col("__r0") < cut, expr(s"__r0 div ${big}L"))
            .otherwise(lit(total % b) + expr(s"(__r0 - ${cut}L) div ${small}L"))
            + 1).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("bucket"))
    }
  }

  /** 2-D skyline (Pareto frontier): parts not dominated on
    * (p_retailprice, p_size). The oracle states the definition as a
    * correlated NOT EXISTS (O(n²) — fine for an oracle); the engine
    * computes it with the sort + running-max trick: sorted by price
    * desc, a row survives iff its size beats the running max size of
    * all STRICTLY-higher-priced rows and it is the max size within its
    * own price tie-group — O(n log n), two windows over one sort, the
    * window-function formulation of the classic skyline algorithms. */
  val qSkyline: GraftOp = GraftOp(
    "q_skyline",
    """SELECT p_partkey, p_retailprice, p_size FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice >= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice > a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // collapse to one row per distinct price first (price → max size):
    // the window then runs over |distinct prices| rows, and a ROWS
    // frame gives the strictly-higher-priced running max exactly
    val g = Tables.part(s, d)
      .groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("gmax"))
      .withColumn("max_size_higher",
        max(col("gmax")).over(Window.orderBy(col("price").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      // a price level survives iff its best size beats every
      // higher-priced size
      .filter(col("max_size_higher").isNull || col("gmax") > col("max_size_higher"))
    Tables.part(s, d)
      // g (the surviving skyline price levels) is usually tiny but its
      // bound is |distinct prices|, which scales with part — no forced
      // broadcast; AQE picks one at test SFs from the observed size.
      .join(g,
        col("p_retailprice") === col("price") && col("p_size") === col("gmax"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** ABC / Pareto classification: parts labeled A/B/C by cumulative
    * revenue share (≤80% → A, ≤95% → B, tail → C) — the inventory-
    * analysis staple every ClickHouse-backed dashboard ships.
    *
    * The global running sum is the same scale trap as q_equidepth's
    * ntile — `sum OVER (ORDER BY …)` with no partition key funnels the
    * table through ONE reducer — and gets the same distributed cure:
    * range-partition on the total order (rev desc, partkey), per-
    * partition sums prefix-summed on the driver (≤P longs), partition-
    * local running sum + offset = exact global cumulative. Revenue is
    * held as INTEGER 10⁻⁴-dollar units end-to-end (price-cents ×
    * discount-hundredths), so the cumulative is order-independent
    * integer addition and the 80/95 boundary — one long→double divide
    * per side — cannot straddle engines. Overflow bound: total corpus
    * revenue < 2⁶³·10⁻⁴ ≈ 9·10¹⁴ dollars.
    *
    * The cumsum runs over the PART-level aggregate (dimension-sized,
    * |parts| rows), not the fact table — the fact scan is one ordinary
    * group-by. */
  /** The two-phase ranked-revenue frame q_pareto and q_abc_xyz share
    * — ONE builder for the session cache key `pareto.ranged:$d`
    * (CachedPlans is first-caller-wins, so a second inline copy could
    * silently drift whichever op ran second — r14 AD advice).
    * Returns the range-partitioned frame (l_partkey, rc, __pid) and
    * the exact global cumulative-revenue-share Column over it. */
  private[operators] def paretoRanked(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.expressions.Window
    // integer money units BEFORE any rounding cast: price-cents ×
    // discount-hundredths (a double→decimal cast of the PRODUCT rounds
    // a borderline cent differently across engines; round() of a
    // near-integer double does not — both engines see the same double)
    val r = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")
        * round((lit(1) - col("l_discount")) * 100).cast("long")).as("rc"))
    val (ranged, offsets, tot) = QuantileExact.rangedOffsets(
      s, s"pareto.ranged:$d", r,
      Seq(col("rc").desc, col("l_partkey")), sum(col("rc")))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("rc").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val share = (element_at(typedLit(offsets), col("__pid")) + sum(col("rc")).over(w))
      .cast("double") / lit(tot.toDouble)
    (ranged, share)
  }

  val qPareto: GraftOp = GraftOp(
    "q_pareto",
    """WITH r AS (
      |  SELECT l_partkey,
      |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rc
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT l_partkey, rc,
      |    sum(rc) OVER (ORDER BY rc DESC, l_partkey) AS cum,
      |    sum(rc) OVER () AS tot
      |  FROM r)
      |SELECT l_partkey, rc / 10000.0 AS revenue,
      |  CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.80 THEN 'A'
      |       WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95 THEN 'B'
      |       ELSE 'C' END AS cls
      |FROM c ORDER BY l_partkey""".stripMargin) { (s, d) =>
    val (ranged, share) = paretoRanked(s, d)
    ranged
      .select(col("l_partkey"), (col("rc") / 10000.0).as("revenue"),
        when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").as("cls"))
      .orderBy(col("l_partkey"))
  }

  /** Exact weighted median — revenue-weighted "typical price" (each
    * line counts l_quantity times): the element at weighted rank
    * ⌈W/2⌉ of the weight-expanded sorted multiset, computed WITHOUT
    * expansion and WITHOUT a global sort. q_equidepth's exact-rank
    * discipline adapted to weights: range-repartition on the value
    * (equal values share a partition, so a per-partition RANGE-frame
    * running weight + driver-side partition offsets (≤P rows
    * collected) IS the global value-level cumulative weight — the
    * same ties-as-peers semantics the oracle's default RANGE window
    * states), then one min() over rows at/past the target. Weights
    * are integral quantities (1..50) carried as BIGINT, so the target
    * rank and every cumulative sum are exact. */
  val qWeightedMedian: GraftOp = GraftOp(
    "q_weighted_median",
    """WITH w AS (
      |  SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS wt FROM lineitem),
      |t AS (SELECT (sum(wt) + 1) // 2 AS target, sum(wt) AS total FROM w),
      |c AS (SELECT v, sum(wt) OVER (ORDER BY v) AS cw FROM w)
      |SELECT min(v) AS weighted_median,
      |  (SELECT CAST(total AS BIGINT) FROM t) AS total_weight
      |FROM c, t WHERE cw >= target""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    // cached: pass 2 must see the SAME sampled range boundaries the
    // offsets were computed for (q_equidepth discipline)
    val ranged = graft.CachedPlans.cached(s, s"wmedian.ranged:$d") {
      Tables.lineitem(s, d)
        .select(col("l_extendedprice").as("v"),
          col("l_quantity").cast("long").as("wt"))
        .repartitionByRange(parts, col("v"))
        .withColumn("__pid", spark_partition_id())
    }
    // pass 1: per-partition weight sums → driver prefix offsets (≤ P rows)
    val sums = ranged.groupBy(col("__pid")).agg(sum(col("wt")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = sums.map(_._2).sum
    val target = (total + 1) / 2 // positive, so / and // agree
    var acc = 0L
    val offsets: Map[Int, Long] =
      sums.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
    // pass 2: global value-level cumulative weight = offset + local
    // RANGE-frame running sum (ties are peers, matching the oracle)
    val cw = element_at(typedLit(offsets), col("__pid")) +
      sum(col("wt")).over(Window.partitionBy(col("__pid")).orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    ranged
      .withColumn("__cw", cw)
      .filter(col("__cw") >= target)
      .agg(min(col("v")).as("weighted_median"))
      .withColumn("total_weight", lit(total))
  }

  /** Per-group MODE (most frequent value, ties to the smallest) — the
    * categorical central-tendency member next to q_percentile (median)
    * and q_weighted_median. Deterministic by construction: the
    * frequency table groups (key, value), and the winner is picked by
    * an explicit (count DESC, value ASC) rank — never an engine's
    * unspecified native mode() tie order, which is exactly why this is
    * written as groupBy+rank instead of a builtin. One key shuffle,
    * |keys|×|values| intermediate (domain-bounded: 3 flags × 50
    * quantities). */
  val qMode: GraftOp = GraftOp(
    "q_mode",
    """WITH f AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, q, n,
      |      row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, q) AS rn FROM f)
      |SELECT l_returnflag, q AS mode_quantity, n AS mode_count
      |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val f = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_returnflag"), col("q")).agg(count(lit(1)).as("n"))
    val byFlag = Window.partitionBy(col("l_returnflag")).orderBy(col("n").desc, col("q"))
    f.withColumn("rn", row_number().over(byFlag)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("q").as("mode_quantity"), col("n").as("mode_count"))
      .orderBy(col("l_returnflag"))
  }

  /** Herfindahl-Hirschman concentration of supplier-nation revenue
    * within each region — the antitrust-style "is this market a
    * monopoly" number completing the concentration family (q_gini
    * ranks inequality across a whole population, q_pareto the
    * top-heavy tail; HHI is the per-MARKET single figure regulators
    * threshold at 1500/2500 points). Revenue folds as exact cents;
    * each nation's share is ppm-snapped by exact integral division
    * and HHI = Σ share_ppm² // 10⁶ is an exact integer in ppm units
    * (10⁶ = monopoly); the point thresholds are restated as exact ppm
    * compares (1500 pts = 150 000 ppm). Broadcast dims; one
    * lineitem-side aggregate per (region, nation). */
  val qHhi: GraftOp = GraftOp(
    "q_hhi",
    """WITH rn AS (
      |  SELECT r_name AS region, n_nationkey AS nk, n_name AS nation
      |  FROM nation JOIN region ON n_regionkey = r_regionkey),
      |rev AS (
      |  SELECT rn.region, rn.nation,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN rn ON s_nationkey = rn.nk
      |  GROUP BY 1, 2),
      |tot AS (SELECT region, CAST(sum(cents) AS BIGINT) AS tot FROM rev GROUP BY 1),
      |sh AS (
      |  SELECT rev.region, CAST(rev.cents * 1000000 // tot.tot AS BIGINT) AS ppm
      |  FROM rev JOIN tot ON rev.region = tot.region)
      |SELECT region, CAST(count(*) AS BIGINT) AS n_nations,
      |  CAST(sum(ppm * ppm) // 1000000 AS BIGINT) AS hhi_ppm,
      |  CASE WHEN sum(ppm * ppm) // 1000000 >= 250000 THEN 'concentrated'
      |       WHEN sum(ppm * ppm) // 1000000 >= 150000 THEN 'moderate'
      |       ELSE 'competitive' END AS band
      |FROM sh GROUP BY region ORDER BY region""".stripMargin) { (s, d) =>
    val rn = broadcast(Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_nationkey").as("nk"),
        col("n_name").as("nation")))
    val rev = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(rn, col("s_nationkey") === col("nk"))
      .groupBy(col("region"), col("nation"))
      .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast(LongType))
        .as("cents"))
    val tot = broadcast(rev.groupBy(col("region").as("tregion"))
      .agg(sum(col("cents")).as("tot")))
    val sh = rev.join(tot, col("region") === col("tregion"))
      .select(col("region"), expr("CAST(cents * 1000000 div tot AS BIGINT)").as("ppm"))
    sh.groupBy(col("region"))
      .agg(count(lit(1)).as("n_nations"),
        expr("CAST(sum(ppm * ppm) div 1000000 AS BIGINT)").as("hhi_ppm"))
      .select(col("region"), col("n_nations"), col("hhi_ppm"),
        expr("""CASE WHEN hhi_ppm >= 250000 THEN 'concentrated'
          |     WHEN hhi_ppm >= 150000 THEN 'moderate'
          |     ELSE 'competitive' END""".stripMargin).as("band"))
      .orderBy(col("region"))
  }

  val ops: Seq[GraftOp] = Seq(qPivot, qPosexplode, qHistogram, qEquidepth, qSkyline, qPareto, qWeightedMedian, qMode,
    qHhi)
}
