package graft

import java.nio.file.Files

import graft.sinks.PartitionedLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("day-partitioned lake: write, prune on read, dynamic overwrite") {
    val path = Files.createTempDirectory("graft-lake").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
    PartitionedLake.writeByDay(ev, "ts", path)

    val day = "2024-01-05"
    val one = PartitionedLake.readDay(spark, path, day)
    val expected = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(one.count() === expected)
    // partition pruning: the day predicate must land in PartitionFilters
    // (planning-time directory pruning), not in the data filter
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"expected partition filters in scan:\n${plan.take(800)}")

    // dynamic overwrite replaces one day, leaves the rest
    val total = ev.count()
    PartitionedLake.writeByDay(ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day), "ts", path)
    assert(spark.read.parquet(path).count() === total)
  }
}
