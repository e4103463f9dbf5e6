package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark's runtime join optimizations pinned on this engine's session
  * config — the two mechanisms that carry selective fact-dim joins at
  * 100 TB when the join key is NOT the partition column (where DPP
  * can't help):
  *
  *  - InjectRuntimeFilter: a bloom filter built from the filtered dim
  *    side is pushed into the fact scan, so most fact rows die before
  *    the shuffle;
  *  - AQE skew-join split: a skewed shuffle partition is split into
  *    task-sized chunks at runtime instead of one straggler task.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val prior = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: selective dim filter injects might_contain into the fact side") {
    // lineitem ⋈ part with a selective part filter on a NON-partition
    // key — thresholds lowered to test-data scale (the defaults target
    // 10 GB scans); the mechanism is identical at 100 TB
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the join through a shuffle: a broadcast join would make
      // the runtime filter pointless (and Spark skips injecting it)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = graft.sources.Tables.lineitem(spark, sf)
      val part = graft.sources.Tables.part(spark, sf)
        .filter(col("p_type") === "PROMO")
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type")).agg(sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter not injected:\n${optimized.take(1500)}")
      // correctness unchanged by the filter
      val expected = li.join(
        graft.sources.Tables.part(spark, sf)
          .filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey")).count()
      assert(expected > 0, "test premise: the selective filter still matches rows")
      val qty = joined.collect()
      assert(qty.length === 1)
    }
  }

  test("AQE splits a skewed join partition instead of one straggler task") {
    import spark.implicits._
    // one hot key carrying ~all rows; thresholds shrunk so the hot
    // partition counts as skewed at test scale
    val hot = (1 to 200000).map(i => (if (i % 100 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "v")
    val dim = (1L to 200L).map(k => (k, s"d$k")).toDF("k", "name")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.shuffle.partitions" -> "8") {
      val joined = hot.join(dim, Seq("k"))
      // collect() executes joined's OWN queryExecution (count() would
      // plan a fresh one whose adaptive plan we couldn't inspect);
      // matches: 198000 k=7 rows + the two hot-exempt keys ≤ 200
      val n = joined.collect().length
      assert(n === 198002, s"unexpected join cardinality $n")
      // the final adaptive SMJ must carry the skew=true marker
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not engage:\n${finalPlan.take(1500)}")
    }
  }
}
