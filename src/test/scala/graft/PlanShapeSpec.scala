package graft

import graft.operators.{Relational, StatsOps}
import org.scalatest.funsuite.AnyFunSuite

/** CI enforcement of the scan-level plan properties SURVEY §5 claims:
  * predicate pushdown reaching the parquet scan and column pruning of
  * the read schema. A scan that reads all 16 lineitem columns for a
  * 2-column aggregate is wrong even when results match. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    // default 100-char metadata truncation cuts PushedFilters/ReadSchema
    // mid-list, which would make the assertions below vacuous
    s.conf.set("spark.sql.maxMetadataStringLength", "100000")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("q6_filter: predicates are pushed to the parquet scan") {
    val plan = Relational.q6Filter.run(spark, sf)
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pushed.contains("l_discount") || pushed.contains("l_quantity") ||
      pushed.contains("l_shipdate"),
      s"no q6 predicate reached the scan; PushedFilters=[$pushed]\n$plan")
  }

  test("q1_agg: scan reads only the referenced lineitem columns") {
    val plan = Relational.q1Agg.run(spark, sf)
      .queryExecution.executedPlan.toString
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(read.nonEmpty, s"no ReadSchema in plan:\n$plan")
    // needed columns present, unreferenced wide columns pruned
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    for (c <- Seq("l_comment", "l_shipinstruct", "l_partkey", "l_suppkey"))
      assert(!read.contains(c), s"column $c not pruned: ReadSchema=$read")
  }

  test("q5_join: all four dimension joins broadcast, no sort-merge join") {
    // r10: the customer-side join no longer carries a hard hint (SF-
    // scaled table — see BroadcastPolicySpec), so the broadcast choice
    // is AQE's; execute first so the adaptive plan is final.
    val df = Relational.q5Join.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge:\n$plan")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj:\n$plan")
  }

  test("sample_fixed_per_group runs on the native TopKPerKey operator") {
    val plan = graft.operators.Sampling.fixedPerGroup.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
  }

  test("q_equidepth: distributed route has no unpartitioned window; local route matches it") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // force the scale path regardless of test-SF size
    spark.conf.set("spark.graft.equidepth.localMaxBytes", "0")
    val df =
      try graft.operators.SqlSurface3.qEquidepth.run(spark, sf)
      finally spark.conf.unset("spark.graft.equidepth.localMaxBytes")
    assert(graft.operators.ApproxRouting.lastDecision.get("q_equidepth") === "distributed")
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected a partition-local rank window")
    val bad = wins.filter(_.partitionSpec.isEmpty)
    assert(bad.isEmpty,
      s"unpartitioned Window moves the whole table to one reducer:\n${bad.mkString("\n")}")
    val distributed = df.collect().toSeq
    // the small-input route (default gate at test SF) is bit-identical
    val local = graft.operators.SqlSurface3.qEquidepth.run(spark, sf)
    assert(graft.operators.ApproxRouting.lastDecision.get("q_equidepth") === "local")
    assert(local.collect().toSeq === distributed)
  }

  test("q_spearman: y-rank is two-phase — only the bounded x-rank window is unpartitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = StatsOps.spearman.run(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    // exactly one unpartitioned window may remain: the x (basket-size)
    // doubled rank, whose frame is value-bounded at ~7 distinct rows.
    // The y-rank (domain ~ |orders|) must ride the __pid-partitioned
    // range-partition + driver-offset two-phase (r13 verdict #4).
    assert(unpart.size <= 1,
      s"q_spearman regained a corpus-sized unpartitioned window:\n${unpart.mkString("\n")}")
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "expected the __pid-partitioned two-phase y-rank window")
  }

  test("sample_token_budget: prefix sum is two-phase — no unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = graft.operators.Sampling.tokenBudget.run(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val bad = wins.filter(_.partitionSpec.isEmpty)
    assert(bad.isEmpty,
      s"corpus-sized unpartitioned prefix-sum window:\n${bad.mkString("\n")}")
  }

  test("emb_mahalanobis: top-20 runs as TakeOrdered, not a global row_number window") {
    val plan = graft.operators.EmbedOps.mahalanobis.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for the top-20:\n$plan")
  }

  test("q_conformal: at most 2 executions of the orders⋈lineitem aggregation") {
    // r11 restructure (the r10 top-cost query): order statistic,
    // calibration count and coverage all derive from the distinct-
    // residual histogram, so the physical plan must read the lineitem
    // fact exactly twice — train side (coefficients) + calibration side
    val plan = StatsOps.conformal.run(spark, sf)
      .queryExecution.executedPlan.toString
    val factScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(factScans <= 2, s"q_conformal re-reads the fact join: $factScans lineitem scans\n$plan")
    assert(factScans >= 1, s"no lineitem scan found — plan shape probe broken\n$plan")
  }

  test("SQL surface: vec_dot / vec_normalize / word_shingles registered") {
    val dot = spark.sql("SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d)) AS d")
      .head.getDouble(0)
    assert(dot === 11.0)
    val unit = spark.sql("SELECT vec_dot(vec_normalize(array(3.0d,4.0d)), vec_normalize(array(3.0d,4.0d))) AS d")
      .head.getDouble(0)
    assert(math.abs(unit - 1.0) < 1e-12)
    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .head.getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    // NFC: decomposed e + COMBINING ACUTE (U+0301) composes to é;
    // pure-ASCII text takes the no-alloc short circuit unchanged
    val n = spark.range(1)
      .select(graft.functions.nfc_normalize(
        org.apache.spark.sql.functions.lit("Cafe\u0301 plain")))
      .head.getString(0)
    assert(n === "Caf\u00e9 plain")
  }
}
