package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every `SparkEntry.queries` entry at the
  * configured scale factor and prints exactly ONE JSON line.
  *
  * Queries are forced through the noop sink so the FULL plan runs —
  * `count()` would let Catalyst prune projections and sorts and time a
  * gutted plan. Failures are reported as -1 in the per-query map (and
  * logged to stderr) instead of masquerading as fast timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query doesn't absorb
    // session bring-up (measures steady-state, not cold-start)
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch {
      case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"${JsonUtil.q(k)}:$v" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${JsonUtil.q(sfDir)}}""")
    spark.stop()
  }
}
