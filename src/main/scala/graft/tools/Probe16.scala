package graft.tools

import graft.{GraftSession, SparkEntry}

/** r16 measurement probe: where does a typical sub-second bench query
  * spend its time? Times (a) DataFrame CREATION for each base table —
  * file listing + parquet footer schema inference, paid once per
  * `spark.read.parquet` call, i.e. once per query per table today —
  * vs (b) the actual noop-sink execution of a few representative
  * queries, warm and cold. usage: runMain graft.tools.Probe16 <sfDir>
  */
object Probe16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup
    spark.range(100).selectExpr("sum(id)").collect()
    for (round <- 1 to 3) {
      for (tbl <- Seq("lineitem", "orders", "events", "documents", "embeddings"))
        t(s"create $tbl r$round") { spark.read.parquet(s"$sfDir/$tbl.parquet") }
    }
    for (round <- 1 to 3; q <- Seq("q1_agg", "q6_filter", "q_case_agg", "q_datetime")) {
      t(s"exec $q r$round") {
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
