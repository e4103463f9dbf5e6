package graft

import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("SpaceSaving typed aggregator recovers the true heavy hitters") {
    import spark.implicits._
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("tok")).as[String]
    val sketch = new SpaceSavingTopK(capacity = 256, k = 20)
    val approx = toks.select(sketch.toColumn).head().map(_._1)
    val exact = graft.operators.TextOps.topTokens.run(spark, sf)
      .collect().map(_.getString(0))
    // capacity >> k on a zipf-ish distribution: true top-10 must survive
    val top10 = exact.take(10).toSet
    assert(top10.subsetOf(approx.toSet),
      s"missing heavy hitters: ${top10 -- approx.toSet}")
  }
}

class TDigestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("t-digest rank error within 1% of exact on events.value") {
    val exactVals = graft.sources.Tables.events(spark, sf)
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    val n = exactVals.length
    val approx = graft.sources.Tables.events(spark, sf)
      .agg(graft.functions.tdigest_quantiles(col("value"), Seq(0.05, 0.5, 0.95, 0.99)).as("qs"))
      .head.getSeq[Double](0)
    for ((q, est) <- Seq(0.05, 0.5, 0.95, 0.99).zip(approx)) {
      // rank error is the sketch's actual guarantee (value error is
      // unbounded on a skewed domain): locate the estimate in the
      // exact sorted data and compare its normalized rank to q
      val rank = {
        val i = java.util.Arrays.binarySearch(exactVals, est)
        (if (i >= 0) i else -i - 1).toDouble / n
      }
      assert(math.abs(rank - q) <= 0.01, s"q=$q est=$est rank=$rank")
    }
  }

  test("t-digest merge of split halves == accuracy of one-shot digest") {
    val vals = graft.sources.Tables.events(spark, sf)
      .select(col("value")).collect().map(_.getDouble(0))
    val (a, b) = vals.splitAt(vals.length / 2)
    val da = new graft.functions.TDigest(300); a.foreach(da.add)
    val db = new graft.functions.TDigest(300); b.foreach(db.add)
    // serialize/deserialize round trip exercises the shuffle path
    val rt = graft.functions.TDigest.fromBytes(db.toBytes)
    da.mergeWith(rt)
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = da.quantile(q)
      val i = java.util.Arrays.binarySearch(sorted, est)
      val rank = (if (i >= 0) i else -i - 1).toDouble / sorted.length
      assert(math.abs(rank - q) <= 0.01, s"merged q=$q est=$est rank=$rank")
    }
    // capacity stays bounded by the scale function, not the input size
    assert(da.centroidCount <= 2 * 300, s"centroids=${da.centroidCount}")
  }

  test("q_approx_percentile runs as a partial/final typed-imperative aggregate") {
    val plan = graft.operators.Relational.qApproxPercentile.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should plan as ObjectHashAggregate:\n$plan")
    assert(plan.contains("partial_tdigest_quantiles"),
      s"no map-side partial digest in plan:\n$plan")
  }

  test("tdigest_quantiles is registered for SQL") {
    graft.sources.Tables.events(spark, sf).createOrReplaceTempView("tdq_events")
    try {
      val r = spark.sql(
        "SELECT tdigest_quantiles(value, array(0.5D, 0.95D), 300) AS qs FROM tdq_events")
        .head.getSeq[Double](0)
      assert(r.length == 2 && r(0) < r(1))
    } finally spark.catalog.dropTempView("tdq_events")
  }
}

class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("bloom filter: no false negatives, bounded false positives, real pruning") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val keys = orders.filter(col("o_orderkey") % 7 === 0).select(col("o_orderkey"))
    val bytes = keys.agg(graft.functions.bloom_agg(col("o_orderkey"), 20000, 0.01))
      .head.getAs[Array[Byte]](0)
    val probed = orders.select(col("o_orderkey"),
      graft.functions.bloom_might_contain(lit(bytes), col("o_orderkey")).as("hit"))
    // every inserted key must probe true — a Bloom filter never lies
    // in the negative direction
    assert(probed.filter(col("o_orderkey") % 7 === 0 && !col("hit")).count() === 0)
    // non-members: fpp pinned at ~1% (10x slack for small-sample noise)
    val nonMembers = probed.filter(col("o_orderkey") % 7 =!= 0)
    val fp = nonMembers.filter(col("hit")).count().toDouble / nonMembers.count()
    assert(fp <= 0.1, s"false-positive rate $fp far above the 1% design point")
    // pruning is real: the probe removes the bulk of the fact side
    assert(nonMembers.filter(col("hit")).count() < nonMembers.count() / 2)
  }

  test("bloom_agg merges partial filters (partial_ mode in plan), OR is lossless") {
    val orders = graft.sources.Tables.orders(spark, sf).repartition(8)
    val agg = orders.agg(graft.functions.bloom_agg(col("o_orderkey"), 20000, 0.01))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_bloom_agg"),
      s"expected map-side partial bloom build:\n$plan")
    // distributed build over 8 partitions == single-threaded build
    val distributed = agg.head.getAs[Array[Byte]](0)
    val local = orders.coalesce(1).agg(
      graft.functions.bloom_agg(col("o_orderkey"), 20000, 0.01)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(distributed, local),
      "OR-merge of partial filters must be byte-identical to a serial build")
  }

  test("bloom_might_contain registered for SQL, codegen-compatible") {
    val keys = spark.range(0, 1000).toDF("k")
    keys.createOrReplaceTempView("bloom_keys")
    try {
      val ser = keys.agg(graft.functions.bloom_agg(col("k"), 1000, 0.01))
        .head.getAs[Array[Byte]](0)
      val hits = keys.filter(
        graft.functions.bloom_might_contain(lit(ser), col("k"))).count()
      assert(hits === 1000)
      val sqlHit = spark.sql(
        s"SELECT count(*) FROM bloom_keys WHERE bloom_might_contain(X'${ser.map("%02x".format(_)).mkString}', k)")
        .head.getLong(0)
      assert(sqlHit === 1000)
    } finally spark.catalog.dropTempView("bloom_keys")
  }
}

class EmbedKernelSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("block-matrix kernel == declarative BNL formulation, bit-identical") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val kernel = graft.operators.DedupOps.embedPairs(0.45)(spark, sf)
        .collect().map(_.toString)
      val declarative = graft.operators.DedupOps.embedPairsDeclarative(0.45)(spark, sf)
        .collect().map(_.toString)
      assert(kernel.sameElements(declarative), s"mismatch at $sf")
    }
  }
}

class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"
  import graft.functions.{hll_sketch_agg, hll_merge_agg}

  test("hll estimate within 3% of exact, small and large cardinalities") {
    // small-n (linear-counting regime): per-type distinct users
    val approx = graft.operators.EventsAnalytics.hllRollup.run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val e = approx(t)
      assert(math.abs(e - n) <= math.max(1, 0.03 * n),
        s"type $t: hll $e vs exact $n")
    }
    // large-n (raw-estimate regime): distinct orderkeys in lineitem
    val li = graft.sources.Tables.lineitem(spark, sf)
    val big = li.agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .agg(hll_merge_agg(col("sk"))).head().getLong(0)
    val bigExact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(big - bigExact) <= 0.03 * bigExact,
      s"hll $big vs exact $bigExact (n=$bigExact)")
  }

  test("linear-counting estimates clear half-integer boundaries by >=1e-4 (oracle-parity proof)") {
    // The HLL oracle's only libm call is ln(): Java Math.log and
    // glibc/DuckDB ln differ by <=1 ulp on 4 of the 4096 reachable
    // linear-counting inputs (~4e-12 absolute at this magnitude). The
    // shared floor(est+0.5) emit absorbs that iff no reachable estimate
    // sits near a half-integer — the branch's input domain is EXACTLY
    // zeros ∈ [1, 4096], so check all of it: min margin is 1.07e-4,
    // eight orders of magnitude above the ulp divergence.
    val minMargin = (1 to 4096).map { z =>
      val est = graft.functions.HllImpls.M * math.log(graft.functions.HllImpls.M.toDouble / z)
      math.abs((est - math.floor(est)) - 0.5)
    }.min
    assert(minMargin > 1e-4, s"margin $minMargin")
  }

  test("sketch rollup is lossless: merged fine sketches == direct coarse sketch") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts").cast("timestamp")).as("day"),
        col("user_id"))
    val rolled = ev
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_merge_agg(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_merge_agg(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == direct,
      s"rollup must equal direct sketch (element-wise max is lossless): $rolled vs $direct")
  }

  test("sliding sketch merges track the exact trailing-7d actives within 3%") {
    val approx = graft.operators.EventsAnalytics.hllTrailing.run(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = graft.operators.EventsAnalytics.trailingActive.run(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "same day spine as the exact op")
    exact.foreach { case (day, n) =>
      assert(math.abs(approx(day) - n) <= math.max(2, 0.03 * n),
        s"day $day: sketch ${approx(day)} vs exact $n")
    }
  }

  test("hll aggregates are registered for SQL") {
    graft.sources.Tables.events(spark, sf).createOrReplaceTempView("hll_events")
    try {
      val est = spark.sql(
        """SELECT hll_merge_agg(sk) FROM (
          |  SELECT event_type, hll_sketch_agg(user_id) AS sk
          |  FROM hll_events GROUP BY 1)""".stripMargin).head().getLong(0)
      val exact = spark.sql("SELECT count(DISTINCT user_id) FROM hll_events")
        .head().getLong(0)
      assert(math.abs(est - exact) <= math.max(2, 0.03 * exact), s"$est vs $exact")
    } finally spark.catalog.dropTempView("hll_events")
  }

  test("hll sketches build map-side as partial typed-imperative aggregates") {
    val plan = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_hll_sketch_agg"),
      s"expected map-side partial hll build:\n$plan")
  }

}

/** KMV theta-sketch tier: exactness in the sub-K regime (where the
  * sketch IS the key set), lossless union rollup, SQL registration,
  * and the map-side partial build. Algebraic merge laws live in
  * SketchLawsSpec. */
class ThetaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import graft.functions.{theta_sketch_agg, theta_union_agg}

  test("q_theta_months is EXACT in the sub-K regime — equals the self-join answer") {
    // sf0.001 months hold far fewer than K=4096 distinct customers, so
    // every estimate must be the TRUE count (the KMV exactness
    // contract), not merely close
    val got = graft.operators.EventsAnalytics.thetaMonths.run(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val byMonth = graft.sources.Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("o_custkey"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got.nonEmpty)
    got.foreach { case (m, (prevN, curN, retained, fresh, churned)) =>
      val prevM = {
        val Array(y, mo) = m.split("-").map(_.toInt)
        if (mo == 1) f"${y - 1}%04d-12" else f"$y%04d-${mo - 1}%02d"
      }
      val (p, c) = (byMonth(prevM), byMonth(m))
      assert(prevN === p.size.toLong, s"$m prev")
      assert(curN === c.size.toLong, s"$m cur")
      assert(retained === (c & p).size.toLong, s"$m retained")
      assert(fresh === (c -- p).size.toLong, s"$m new")
      assert(churned === (p -- c).size.toLong, s"$m churned")
    }
  }

  test("theta union rollup is lossless: merged fine sketches == direct, byte-identical") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts").cast("timestamp")).as("day"),
        col("user_id"))
    val rolled = ev
      .groupBy(col("event_type"), col("day"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(theta_union_agg(col("sk")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val direct = ev
      .groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(rolled == direct,
      "k-smallest union merge must be byte-identical to the direct sketch")
  }

  test("theta aggregates and set ops are registered for SQL") {
    graft.sources.Tables.events(spark, sf).createOrReplaceTempView("theta_events")
    try {
      val row = spark.sql(
        """SELECT theta_estimate(a.sk), theta_intersect(a.sk, b.sk), theta_a_not_b(a.sk, b.sk)
          |FROM (SELECT theta_sketch_agg(user_id) AS sk FROM theta_events WHERE event_type = 'click') a
          |CROSS JOIN (SELECT theta_sketch_agg(user_id) AS sk FROM theta_events WHERE event_type = 'view') b""".stripMargin)
        .head()
      val clicks = graft.sources.Tables.events(spark, sf)
        .filter(col("event_type") === "click").select(col("user_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      val views = graft.sources.Tables.events(spark, sf)
        .filter(col("event_type") === "view").select(col("user_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      // sub-K regime → exact
      assert(row.getLong(0) === clicks.size.toLong)
      assert(row.getLong(1) === (clicks & views).size.toLong)
      assert(row.getLong(2) === (clicks -- views).size.toLong)
    } finally spark.catalog.dropTempView("theta_events")
  }

  test("theta sketches build map-side as partial typed-imperative aggregates") {
    val plan = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(theta_sketch_agg(col("user_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_theta_sketch_agg"),
      s"expected map-side partial theta build:\n$plan")
  }
}
