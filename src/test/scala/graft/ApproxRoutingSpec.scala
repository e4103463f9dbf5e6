package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact→sketch auto-routing for the trailing-distinct family
  * (q_stickiness / q_trailing_active): above the configured input-size
  * threshold the op plans its HLL sketch twin; below (or unset) the
  * exact countDistinct plan. Pins the swap point, the plan shape on
  * each side, and the ≤3% agreement between paths. */
class ApproxRoutingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private val key = graft.operators.EventsAnalytics.TrailingApproxKey

  private def withConf[A](v: Option[String])(body: => A): A = {
    val prior = spark.conf.getOption(key)
    v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
    try body
    finally prior match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def trailingPlan(): String =
    SparkEntry.queries("q_trailing_active")(spark, sf)
      .queryExecution.optimizedPlan.toString

  test("unset: exact countDistinct plan (the oracle contract)") {
    withConf(None) {
      val p = trailingPlan()
      assert(p.contains("count(distinct"), s"exact distinct missing:\n$p")
      assert(!p.contains("hll_merge_agg"), s"sketch path planned while unset:\n$p")
    }
  }

  test("threshold above input: still exact") {
    withConf(Some("9e18")) {
      val p = trailingPlan()
      assert(p.contains("count(distinct"), s"huge threshold must keep exact:\n$p")
    }
  }

  test("threshold below input: sketch twin planned, values within 3% of exact") {
    val exact = withConf(None) {
      SparkEntry.queries("q_trailing_active")(spark, sf).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    withConf(Some("1")) {
      val p = trailingPlan()
      assert(p.contains("hll_merge_agg"), s"sketch path missing above threshold:\n$p")
      assert(!p.contains("count(distinct"), s"exact distinct still planned:\n$p")
      val est = SparkEntry.queries("q_trailing_active")(spark, sf).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(est.keySet === exact.keySet, "sketch path must cover the same days")
      est.foreach { case (day, e) =>
        val x = exact(day)
        assert(math.abs(e - x) <= math.max(3, 0.03 * x),
          s"day $day: sketch $e vs exact $x beyond 3%")
      }
    }
  }

  test("decision is observable: analyzed-plan tag + lastDecision name the served path") {
    withConf(None) {
      val df = SparkEntry.queries("q_trailing_active")(spark, sf)
      assert(df.queryExecution.analyzed.toString.contains("graft_route_exact_q_trailing_active"),
        "exact-path tag missing from analyzed plan")
      assert(graft.operators.ApproxRouting.lastDecision.get("q_trailing_active") === "exact")
    }
    withConf(Some("1")) {
      val df = SparkEntry.queries("q_trailing_active")(spark, sf)
      assert(df.queryExecution.analyzed.toString.contains("graft_route_sketch_q_trailing_active"),
        "sketch-path tag missing from analyzed plan")
      assert(graft.operators.ApproxRouting.lastDecision.get("q_trailing_active") === "sketch")
      // the tag is semantics-free: it does not survive into the optimized plan
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_route_"))
    }
  }

  test("stickiness routes too: both ratios agree within 3 points") {
    val exact = withConf(None) {
      SparkEntry.queries("q_stickiness")(spark, sf).collect()
        .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    }
    withConf(Some("1")) {
      val p = SparkEntry.queries("q_stickiness")(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("hll_"), s"stickiness sketch path missing:\n$p")
      val est = SparkEntry.queries("q_stickiness")(spark, sf).collect()
        .map(r => r.getInt(0) -> r.getDouble(3)).toMap
      assert(est.keySet === exact.keySet)
      est.foreach { case (day, e) =>
        assert(math.abs(e - exact(day)) <= 0.03,
          s"day $day: stickiness $e vs exact ${exact(day)} beyond 0.03")
      }
    }
  }

  test("percentile family routes: q_gap_stats swaps exact percentile for the t-digest twin") {
    val pkey = graft.operators.EventsAnalytics.PercentileApproxKey
    def withP[A](v: Option[String])(body: => A): A = {
      val prior = spark.conf.getOption(pkey)
      v match { case Some(x) => spark.conf.set(pkey, x); case None => spark.conf.unset(pkey) }
      try body
      finally prior match {
        case Some(p) => spark.conf.set(pkey, p); case None => spark.conf.unset(pkey)
      }
    }
    val exact = withP(None) {
      val df = SparkEntry.queries("q_gap_stats")(spark, sf)
      // r12: the exact leg is the QuantileExact rank-selection shape
      // (sort-window row_number + bracketing order statistics), not a
      // percentile() aggregate — assert ITS signature and that no
      // sketch planned
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("row_number") && !plan.contains("tdigest_quantiles"),
        s"unset: the exact rank-selection percentile (oracle contract) must plan:\n$plan")
      assert(graft.operators.ApproxRouting.lastDecision.get("q_gap_stats") === "exact")
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    }
    withP(Some("1")) {
      val df = SparkEntry.queries("q_gap_stats")(spark, sf)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("tdigest_quantiles"), s"t-digest twin missing above threshold:\n$p")
      assert(graft.operators.ApproxRouting.lastDecision.get("q_gap_stats") === "sketch")
      val est = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(est.keySet === exact.keySet)
      est.foreach { case (t, (n, p50, p95)) =>
        val (nx, x50, x95) = exact(t)
        assert(n === nx, s"$t: counts must match exactly on both paths")
        // t-digest contract is RANK accuracy; value tolerance on these
        // smooth gap distributions: 5% relative
        assert(math.abs(p50 - x50) <= 0.05 * math.max(1.0, x50), s"$t p50 $p50 vs $x50")
        assert(math.abs(p95 - x95) <= 0.05 * math.max(1.0, x95), s"$t p95 $p95 vs $x95")
      }
    }
  }
}
