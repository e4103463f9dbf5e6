package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry, CachedPlans}

/** Dev probe: time a named subset of `SparkEntry.queries` (args), N
  * repetitions, printing per-rep seconds — for isolating per-query
  * regressions without a full Bench pass. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else Seq("q_distinct")
    for (r <- 1 to reps) {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] rep$r $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    CachedPlans.clear(spark)
    spark.stop()
  }
}
