package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 AQE-coalescing probe: prints the ACTUAL post-shuffle partition
  * counts of two representative stages — a KB-sized aggregate (the
  * bench's flat-tail shape) and a mid-size window input (the
  * compute-dense shape that parallelismFirst=false alone serializes)
  * — under the coalescing policy given by env:
  *   SPARK_GRAFT_PF       parallelismFirst (true/false)
  *   SPARK_GRAFT_MINPN    minPartitionNum ("" = unset)
  * The string form of an executed plan only says "AQEShuffleRead
  * coalesced"; this probe turns the r17 GraftSession config change
  * into observable partition counts (plans/r17/aqe_partition_probe.txt).
  */
object Probe17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pf = sys.env.getOrElse("SPARK_GRAFT_PF", "false")
    val minPn = sys.env.getOrElse("SPARK_GRAFT_MINPN", "")
    var b = SparkSession.builder().master(s"local[$cpus]").appName("probe17")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      .config("spark.ui.enabled", "false")
    if (minPn.nonEmpty)
      b = b.config("spark.sql.adaptive.coalescePartitions.minPartitionNum", minPn)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // KB-sized post-shuffle stage: per-source doc counts (20 rows)
    val tiny = s.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    // mid-size compute-dense stage: the q_window shape over lineitem
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    // the real q_window shape: 3 window functions, so WindowGroupLimit
    // cannot push the top-5 below the exchange — all rows shuffle
    val win = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_shipdate"),
        row_number().over(w).as("rn"),
        sum(col("l_quantity")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).as("run_qty"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"))
      .filter(col("rn") <= 5)
    for ((name, df) <- Seq("tiny-agg" -> tiny, "window" -> win)) {
      df.queryExecution.toRdd.foreach(_ => ()) // execute so AQE finalizes
      // every AQEShuffleRead's actual partition count in the final plan
      def reads(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] = {
        val self = p match {
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
            Seq(r.partitionSpecs.length)
          case _ => Nil
        }
        self ++ p.children.flatMap(reads) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            reads(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            reads(q.plan)
          case _ => Nil
        })
      }
      val n = reads(df.queryExecution.executedPlan)
      println(s"[probe17] pf=$pf minPartitionNum=${if (minPn.isEmpty) "(unset)" else minPn} " +
        s"$name AQEShuffleRead partition counts: ${n.mkString(",")}")
      if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN"))
        println(df.queryExecution.executedPlan.toString)
    }
    s.stop()
  }
}
