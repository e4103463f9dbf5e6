package graft

import graft.sinks.BucketedLake
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join guarantee: joining two tables bucketed on the
  * join key must plan with NO shuffle exchange on either side — the
  * write-once/join-many trade bucketing exists for. Broadcast is
  * disabled for the assertion so the planner can't sidestep the
  * question at test scale. */
class BucketedLakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key plans with zero exchanges") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    BucketedLake.writeBucketed(o, "orders_bkt", "o_custkey", 8)
    BucketedLake.writeBucketed(c, "customer_bkt", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedLake.bucketedJoin(spark, "orders_bkt", "customer_bkt", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-free merge join over buckets:\n$plan")
      // same result as the plain join over the raw parquet
      val expected = o.join(c, Seq("o_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("bucket-mismatched sides still join correctly (one side re-shuffles)") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    BucketedLake.writeBucketed(o, "orders_bkt8", "o_custkey", 8)
    BucketedLake.writeBucketed(c, "customer_bkt4", "o_custkey", 4)
    try {
      val joined = BucketedLake.bucketedJoin(spark, "orders_bkt8", "customer_bkt4", "o_custkey")
      assert(joined.count() === o.join(c, Seq("o_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt8")
      spark.sql("DROP TABLE IF EXISTS customer_bkt4")
    }
  }
}
