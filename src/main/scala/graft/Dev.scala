package graft

/** Dev harness: time or explain a single op.
  * usage: runMain graft.Dev <opName> <sfDir> [explain]
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val opName = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "time"
    val spark = GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(opName)(spark, sfDir)
    if (mode == "explain") df.explain("formatted")
    else {
      var last = 0L
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = df.count()
        last = System.nanoTime() - t0
        println(f"[dev] $opName run$i: ${last / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
