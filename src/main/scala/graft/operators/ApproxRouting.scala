package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config-gated exact→sketch routing for distinct-count-heavy plans.
  *
  * Ops like `q_trailing_active` / `q_stickiness` are EXACT by default
  * (their oracle contract), but their exact plans carry a 7×-exploded
  * fact stream into a wide `countDistinct` shuffle — fine at test
  * scale, the dominant cost at 100 TB. Each such op has an HLL sketch
  * twin whose shuffle carries kilobyte day-sketches instead of the
  * user stream. This gate picks the path from the INPUT SIZE ESTIMATE
  * (optimizer scan stats — metadata only, no job), so the same query
  * code serves both regimes: exact under the threshold, sketch above.
  *
  * Thresholds are opt-in per family (`spark.graft.approx.<family>.
  * maxExactBytes`): unset means always exact, so default behavior —
  * and the driver's oracle gate — is untouched. Setting e.g.
  * `...maxExactBytes=2e11` on a cluster routes any >200 GB input to
  * the sketch twin (ApproxRoutingSpec pins the swap point and the
  * ≤3% agreement between paths).
  */
object ApproxRouting {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Last path taken per op name ("exact" | "sketch") — the
    * test-visible half of the decision surface. */
  val lastDecision = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Optimizer size estimate of `df`'s input — plan metadata, no job. */
  def inputBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when `confKey` is set and `df`'s estimated size exceeds it. */
  def routeToSketch(s: SparkSession, confKey: String, df: DataFrame): Boolean =
    s.conf.getOption(confKey).exists { t =>
      inputBytes(df) > BigInt(new java.math.BigDecimal(t).toBigInteger)
    }

  /** Pick the exact or sketch plan for `op` and make the decision
    * OBSERVABLE (the ClickHouse `SETTINGS`-visibility discipline): one
    * INFO line with the size estimate vs threshold, [[lastDecision]]
    * for programmatic checks, and a `graft_route_<path>_<op>`
    * SubqueryAlias tag on the plan root — `df.queryExecution.analyzed`
    * / `explain(extended=true)` shows WHICH path served the query (the
    * alias is semantics-free and optimized away, so results and
    * oracles are untouched). */
  def route(s: SparkSession, confKey: String, op: String, input: DataFrame)(
      exact: => DataFrame)(sketch: => DataFrame): DataFrame = {
    val bytes = inputBytes(input)
    val thr = s.conf.getOption(confKey)
    val useSketch = thr.exists(t => bytes > BigInt(new java.math.BigDecimal(t).toBigInteger))
    val path = if (useSketch) "sketch" else "exact"
    log.info(s"graft.route $op -> $path (input estimate $bytes B, $confKey=${thr.getOrElse("unset")})")
    lastDecision.put(op, path)
    (if (useSketch) sketch else exact).as(s"graft_route_${path}_$op")
  }
}
