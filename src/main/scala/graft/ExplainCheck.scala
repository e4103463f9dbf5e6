package graft

/** Diagnostic main: join-strategy audit across every registered query.
  * Prints a line per query with join/exchange node counts and flags
  * plans containing nested-loop or cartesian joins — those are
  * intentional ONLY where a single-row side makes them free (scalar
  * subquery broadcasts). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    // intended BNLs: single-row scalar-aggregate broadcasts (free), and
    // knn_brute, where corpus × broadcast-query-set IS the brute force
    // knn_classify: corpus × broadcast-query-set is the brute-force
    // scan; q_gap_fill: types × single-row min/max bounds spine
    // lake_zorder / q11_value_share / q_interpolate: single-row
    // min-max/total scalar-aggregate broadcast, same family as q_gap_fill
    val intendedBnl =
      Set("q22_wealthy", "q15_top_supp", "pipeline_clean", "knn_brute", "text_tfidf",
        "knn_classify", "q_gap_fill", "lake_zorder", "q11_value_share", "q_interpolate",
        "q_trailing_active", "q_hll_trailing", "knn_filtered",
        // r4c single-row scalar-aggregate broadcasts (corpus totals,
        // percentile cuts, census minima, max-ts anchors) — each BNL's
        // build side is exactly one row, the free scalar-subquery shape
        "q_chi_square", "q_copurchase", "q_cusum", "q_decay", "q_rfm",
        "q_stickiness", "sample_temperature", "text_bm25", "text_pmi",
        // broadcast anchor-set scan (knn_brute family) / 1-row cuts
        "knn_hard_negatives", "text_curriculum",
        // 3-row query-user set × user aggregate (knn_brute family)
        "q_ts_similarity")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val cart = "CartesianProduct".r.findAllIn(plan).size
        val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
        val flag =
          if (cart > 0) "  <-- CARTESIAN"
          else if (bnl > 0 && !intendedBnl.contains(name)) "  <-- NESTED LOOP"
          else ""
        System.err.println(s"[explain] $name: bhj=$bhj smj=$smj bnl=$bnl cart=$cart hashEx=$ex$flag")
      } catch {
        case e: Throwable => System.err.println(s"[explain] $name: FAILED ${e.getMessage}")
      }
    }
    CachedPlans.clear(spark)
    spark.stop()
  }
}
