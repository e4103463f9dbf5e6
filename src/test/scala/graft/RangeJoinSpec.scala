package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sides() = {
    val ev = graft.sources.Tables.events(spark, sf)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("s_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    (signups, purchases)
  }

  test("binned rewrite == naive range-predicate join, without the nested loop") {
    val (signups, purchases) = sides()
    val naive = purchases.join(signups,
        col("p_ts") >= col("s_ts") && col("p_ts") < col("s_end"))
      .select(col("signup_id"), col("purchase_id"))
    val binned = RangeJoin.binnedPointInterval(
        purchases, col("p_ts"), signups, col("s_ts"), col("s_end"), binSeconds = 600L)
      .select(col("signup_id"), col("purchase_id"))
    val a = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.nonEmpty, "test data should contain temporal co-occurrences")
    assert(a.sameElements(b))
    // the naive plan is a nested loop; the rewrite must not be
    val naivePlan = naive.queryExecution.executedPlan.toString
    val binnedPlan = binned.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"),
      s"binned rewrite fell back to a nested loop:\n$binnedPlan")
  }

  test("numeric-domain bin function: price-band join == naive predicate join") {
    // parts priced into synthesized bands [lo, hi) — a range join on a
    // NUMERIC key, where the timestamp wrapper can't apply; the
    // generic form takes floor(price / width) as the bin function
    val parts = graft.sources.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice").as("price"))
    val bands = spark.range(0, 20).toDF("band_id")
      .select(col("band_id"),
        (col("band_id") * 100.0 + 850.0).as("lo"),
        (col("band_id") * 100.0 + 1000.0).as("hi")) // overlapping bands
    val naive = parts.join(bands, col("price") >= col("lo") && col("price") < col("hi"))
      .select(col("p_partkey"), col("band_id"))
    val binned = RangeJoin.binnedPointIntervalBy(
        parts, col("price"), bands, col("lo"), col("hi"),
        bin = c => floor(c / 100.0).cast("long"))
      .select(col("p_partkey"), col("band_id"))
    val a = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.nonEmpty, "bands should catch parts")
    assert(a.sameElements(b))
    assert(!binned.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "numeric binned rewrite fell back to a nested loop")
  }

  test("numeric-domain interval overlap == naive overlap join") {
    // id-range overlap: two sets of [start, end) long ranges
    val left = spark.range(0, 50).toDF("l_id")
      .select(col("l_id"), (col("l_id") * 37 % 500).as("l_s"),
        (col("l_id") * 37 % 500 + 40).as("l_e"))
    val right = spark.range(0, 60).toDF("r_id")
      .select(col("r_id"), (col("r_id") * 23 % 500).as("r_s"),
        (col("r_id") * 23 % 500 + 25).as("r_e"))
    val naive = left.join(right, col("l_s") < col("r_e") && col("r_s") < col("l_e"))
      .select(col("l_id"), col("r_id"))
    val binned = RangeJoin.binnedIntervalOverlapBy(
        left, col("l_s"), col("l_e"), right, col("r_s"), col("r_e"),
        bin = c => floor(c / 32.0).cast("long"))
      .select(col("l_id"), col("r_id"))
    val a = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.nonEmpty)
    assert(a.sameElements(b))
  }

  test("AutoRangeJoin rule: naive range predicate rewritten to equi join when opted in") {
    val (signups, purchases) = sides()
    def naive() = purchases.join(signups,
        col("p_ts") >= col("s_ts") && col("p_ts") < col("s_end"))
      .select(col("signup_id"), col("purchase_id"))
    val expected = naive().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive().queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "precondition: without the conf the naive shape is a nested loop")
    spark.conf.set("spark.graft.rangejoin.binSeconds", "600")
    try {
      val rewritten = naive()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire — still a nested loop:\n$plan")
      assert(plan.contains("Generate") || plan.contains("explode"),
        s"expected the bin explode in the rewritten plan:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(expected), "rewrite changed the result set")
      // equi-keyed joins must be left alone — the rule targets only
      // the keyless range shape
      val keyed = purchases.withColumn("k", col("purchase_id") % 10)
        .join(signups.withColumn("k", col("signup_id") % 10), Seq("k"))
      assert(!keyed.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
        "rule fired on an equi join")
      // the rewrite carries the manual API's maxBins guard: a corrupt
      // multi-year interval fails loudly instead of OOMing the task
      val wide = signups.withColumn("s_end", col("s_ts") + expr("INTERVAL 3650 DAYS"))
      val ex = intercept[Exception] {
        purchases.join(wide, col("p_ts") >= col("s_ts") && col("p_ts") < col("s_end")).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(ex).exists(m => m != null && m.contains("AutoRangeJoin")),
        s"expected the AutoRangeJoin maxBins guard, got: $ex")
    } finally spark.conf.unset("spark.graft.rangejoin.binSeconds")
  }

  test("reversed intervals are dropped, not exploded into garbage bins") {
    val (signups, purchases) = sides()
    // swap start/end: every interval is reversed → zero matches, and
    // no sequence() negative-step blowup
    val out = RangeJoin.binnedPointInterval(
      purchases, col("p_ts"), signups, col("s_end"), col("s_ts"), binSeconds = 600L)
    assert(out.count() === 0)
  }

  test("an interval wider than maxBins fails loudly instead of OOMing the task") {
    val (signups, purchases) = sides()
    val wide = signups.withColumn("s_end", col("s_ts") + expr("INTERVAL 2000 MINUTES"))
    val ex = intercept[Exception] {
      RangeJoin.binnedPointInterval(
        purchases, col("p_ts"), wide, col("s_ts"), col("s_end"),
        binSeconds = 60L, maxBins = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("binnedPointInterval")),
      s"expected the maxBins guard message, got: $ex")
  }
}
