package graft
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q7_volume", "q21_single", "q17_small_qty", "pipeline_clean")) {
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val shj = "ShuffledHashJoin".r.findAllIn(plan).size
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
      System.err.println(s"[explain] $name: bhj=$bhj smj=$smj shj=$shj hashEx=$ex")
    }
    CachedPlans.clear(spark)
    spark.stop()
  }
}
