package graft.operators

/** Exact linear-interpolation percentiles WITHOUT the engine's
  * percentile aggregate — the fifth round()-retirement class.
  *
  * `percentile()` (Spark) and `quantile_cont` (DuckDB) agree on the
  * DEFINITION (value at continuous index φ·(n−1), linearly
  * interpolated) but each interpolates inside its own engine with its
  * own operation order, so emits historically wore a 6dp round to
  * absorb last-ulp differences — the midpoint-lottery class the §6
  * determinism rules exist to retire. They also BUFFER every group
  * value in one aggregation buffer, an OOM at 100-TB group sizes.
  *
  * Both problems fall to the same restructure: rank the group with a
  * sort-based window (rn = row_number, n = count — spills, never
  * buffers), pick the two order statistics around the continuous
  * index with exact integer arithmetic (k = ⌊p·(n−1)/100⌋, hundredths
  * fraction f = (p·(n−1)) mod 100, p the percentile in percent), and
  * interpolate with ONE shared expression text
  * `(a·(100−f) + b·f) / 100` — every multiply/add/divide is a
  * correctly-rounded IEEE op on identical operands, so the result is
  * bit-identical across engines with no rounding rescue. For integer
  * inputs the numerator folds exactly before the single division.
  *
  * The fragments are generated from one place so the two engines'
  * texts cannot drift; only the integer-division spelling differs
  * (`div` in Spark SQL, `//` in DuckDB — exact either way).
  */
object QuantileExact {

  /** Aggregate fragments selecting the bracketing order statistics and
    * fraction for percentile `p` (percent, integer) over value column
    * `v`, given within-group `rn` (1-based) and group size `n`
    * columns. `idiv` is the engine's integer-division operator. */
  private def aExpr(p: Int, v: String, rn: String, n: String, idiv: String) =
    s"max(CASE WHEN $rn - 1 = ($p * ($n - 1)) $idiv 100 THEN $v END)"
  private def bExpr(p: Int, v: String, rn: String, n: String, idiv: String) =
    s"max(CASE WHEN $rn - 1 = ($p * ($n - 1)) $idiv 100 + 1 THEN $v END)"
  private def fExpr(p: Int, n: String) = s"max(($p * ($n - 1)) % 100)"

  /** The interpolation emit over the three aggregate results — THE
    * shared expression text (coalesce covers f=0 at the top rank,
    * where no upper bracket exists). */
  def interp(a: String, b: String, f: String): String =
    s"($a * (100 - $f) + coalesce($b, $a) * $f) / CAST(100 AS DOUBLE)"

  /** DuckDB-side: the three aggregates for percentile `p`, named
    * `<prefix>_a/_b/_f`. Compose in a GROUP BY, then emit
    * [[interp]] over the names in an outer select. */
  def sqlAggs(p: Int, v: String, prefix: String,
      rn: String = "rn", n: String = "n"): String =
    s"""${aExpr(p, v, rn, n, "//")} AS ${prefix}_a,
       |${bExpr(p, v, rn, n, "//")} AS ${prefix}_b,
       |${fExpr(p, n)} AS ${prefix}_f""".stripMargin

  /** Spark-side: same three aggregates as Columns (expr-parsed so the
    * arithmetic text matches the oracle's modulo the div spelling). */
  def sparkAggs(p: Int, v: String, prefix: String,
      rn: String = "__rn", n: String = "__n"): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.expr
    Seq(
      expr(aExpr(p, v, rn, n, "div")).as(s"${prefix}_a"),
      expr(bExpr(p, v, rn, n, "div")).as(s"${prefix}_b"),
      expr(fExpr(p, n)).as(s"${prefix}_f"))
  }

  // ---- histogram route: for SMALL-DOMAIN integer columns the rank
  // window over rows is wasteful — aggregate (group, value) COUNTS
  // first (the shuffle carries |distinct values| rows, not |rows|),
  // take a running sum over the ordered values, and bracket by
  // CUMULATIVE count instead of row rank: a = min value whose cum
  // covers rank k+1, b = min value covering k+2. Same exact
  // interpolation emit.

  private def aHist(p: Int, v: String, cum: String, n: String, idiv: String) =
    s"min(CASE WHEN $cum >= ($p * ($n - 1)) $idiv 100 + 1 THEN $v END)"
  private def bHist(p: Int, v: String, cum: String, n: String, idiv: String) =
    s"min(CASE WHEN $cum >= ($p * ($n - 1)) $idiv 100 + 2 THEN $v END)"

  /** DuckDB-side histogram-route aggregates (needs `cum` = running
    * count over value order and `n` = group total). */
  def sqlAggsHist(p: Int, v: String, prefix: String,
      cum: String = "cum", n: String = "n"): String =
    s"""${aHist(p, v, cum, n, "//")} AS ${prefix}_a,
       |${bHist(p, v, cum, n, "//")} AS ${prefix}_b,
       |${fExpr(p, n)} AS ${prefix}_f""".stripMargin

  /** Spark-side histogram-route aggregates. */
  def sparkAggsHist(p: Int, v: String, prefix: String,
      cum: String = "__cum", n: String = "__n"): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.expr
    Seq(
      expr(aHist(p, v, cum, n, "div")).as(s"${prefix}_a"),
      expr(bHist(p, v, cum, n, "div")).as(s"${prefix}_b"),
      expr(fExpr(p, n)).as(s"${prefix}_f"))
  }

  /** General-domain (double-valued) ungrouped ranking WITHOUT a
    * single-task global sort — the q_kll / q_equidepth discipline for
    * when the histogram route doesn't apply because the value domain
    * is not small: range-partition on the value (equal values land in
    * one partition, so ties never straddle a boundary), rank within
    * each partition with a partition-local sort window, and add the
    * collected per-partition row offsets (a driver collect bounded by
    * the shuffle-partition count, not the data). The ranged frame is
    * pinned in [[graft.CachedPlans]] so the offsets job and the rank
    * job see the SAME partitioning under AQE — and the (possibly
    * expensive) input plan computes once, not once per job.
    *
    * Returns the input columns plus `__rn` (1-based global rank by
    * `v`) and `__n` (total rows) — the contract [[sparkAggs]] expects. */
  /** The one range-partition + driver-offset pass all two-phase
    * helpers (and q_pareto's [[SqlSurface3.paretoRanked]]) share:
    * range-partition `df` on `sortCols` under `cacheKey`, aggregate
    * `perPartTotal` (must be a LongType aggregate) per partition —
    * a driver collect bounded by the shuffle-partition count, never
    * the data — and return (ranged frame with `__pid`, exclusive
    * per-partition offsets, grand total). The ranged frame is pinned
    * in [[graft.CachedPlans]] so the offsets job and the consumer job
    * see the SAME partitioning under AQE. */
  private[operators] def rangedOffsets(s: org.apache.spark.sql.SparkSession,
      cacheKey: String, df: org.apache.spark.sql.DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column], perPartTotal: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.DataFrame, Map[Int, Long], Long) = {
    import org.apache.spark.sql.functions._
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.CachedPlans.cached(s, cacheKey)(
      df.repartitionByRange(parts, sortCols: _*).withColumn("__pid", spark_partition_id()))
    val totals = ranged.groupBy(col("__pid")).agg(perPartTotal.as("c"))
      .collect().map(r => r.getInt(0) -> r.getAs[Long](1)).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] =
      totals.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
    (ranged, offsets, acc)
  }

  /** The exact-integer prefix-sum contract: `weight` must already be
    * LongType — a silent widening (int weights) or a double would
    * break the bit-exact cumulative the consumers hash against. */
  private def requireLongWeight(df: org.apache.spark.sql.DataFrame, weight: String): Unit = {
    val dt = df.schema(weight).dataType
    require(dt == org.apache.spark.sql.types.LongType,
      s"two-phase prefix sums need a LongType weight; '$weight' is ${dt.simpleString}")
  }

  /** Two-phase weighted EXCLUSIVE cumulative sum over an unbounded
    * value domain: range-partition the (value, weight) frame on `v`,
    * collect the ≤P per-partition weight totals to the driver, and add
    * each partition's offset to a partition-local running sum — the
    * same discipline as [[rankedUngrouped]], replacing the corpus-sized
    * single-task `Window.orderBy(v)` funnel (the q_spearman y-rank
    * scale-killer). Emits `__below` = Σ weight over rows with lower `v`
    * (deterministic — a pure function of the value, independent of the
    * partitioning). Rows must carry distinct `v` values (a histogram
    * frame), so no tie straddles a boundary decision. */
  def cumBelowUngrouped(s: org.apache.spark.sql.SparkSession, cacheKey: String,
      df: org.apache.spark.sql.DataFrame, v: String,
      weight: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    requireLongWeight(df, weight)
    val (ranged, offsets, _) =
      rangedOffsets(s, cacheKey, df, Seq(col(v)), sum(col(weight)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(v))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ranged
      .withColumn("__below", element_at(typedLit(offsets), col("__pid")) +
        coalesce(sum(col(weight)).over(w), lit(0L)))
      .drop("__pid")
  }

  /** Two-phase INCLUSIVE weighted prefix sum over an arbitrary total
    * order (possibly composite / descending): range-partition on the
    * sort columns, collect the ≤P per-partition weight totals, offset
    * each partition's local running sum. Replaces a corpus-sized
    * unpartitioned `Window.orderBy(...)` prefix sum (the
    * sample_token_budget funnel). The sort must be total (tie-broken)
    * so the result is a pure function of the row, independent of the
    * partitioning. Emits `__cum`. */
  def prefixSumUngrouped(s: org.apache.spark.sql.SparkSession, cacheKey: String,
      df: org.apache.spark.sql.DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      weight: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    requireLongWeight(df, weight)
    val (ranged, offsets, _) =
      rangedOffsets(s, cacheKey, df, sortCols, sum(col(weight)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged
      .withColumn("__cum", element_at(typedLit(offsets), col("__pid")) +
        sum(col(weight)).over(w))
      .drop("__pid")
  }

  def rankedUngrouped(s: org.apache.spark.sql.SparkSession, cacheKey: String,
      df: org.apache.spark.sql.DataFrame, v: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (ranged, offsets, n) =
      rangedOffsets(s, cacheKey, df, Seq(col(v)), count(lit(1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(v))
    ranged
      .withColumn("__rn", element_at(typedLit(offsets), col("__pid")) +
        row_number().over(w))
      .withColumn("__n", lit(n))
      .drop("__pid")
  }
}
