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
    reportDeltas(results, total)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${JsonUtil.q(sfDir)}}""")
    CachedPlans.clear(spark)
    spark.stop()
  }

  /** Per-query regression report vs `bench_baseline.json` (snapshot of
    * the round-1 driver run), on STDERR — stdout stays the one-line
    * JSON contract. Flags ratios > 1.3× so regressions surface in the
    * run log instead of needing archaeology across BENCH_r{N} files. */
  private def reportDeltas(results: Map[String, Double], total: Double): Unit = {
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "bench_baseline.json")
    val f = new java.io.File(baselinePath)
    if (!f.exists()) return
    try {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      // minimal parse of {"queries":{"name":sec,...}} — no JSON lib on the classpath
      val qsec = """"([^"]+)":\s*([0-9.eE+-]+)""".r
      val inQueries = text.substring(text.indexOf("\"queries\""))
      val baseline = qsec.findAllMatchIn(inQueries)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap - "queries"
      val flagged = results.toSeq.collect {
        case (name, sec) if sec >= 0 && baseline.get(name).exists(b => b > 0.3 && sec > b * 1.3) =>
          (name, sec, baseline(name))
      }.sortBy { case (_, sec, b) => -(sec / b) }
      val baseTotal = baseline.values.filter(_ >= 0).sum
      System.err.println(
        f"[bench] total ${total}%.1fs vs baseline ${baseTotal}%.1fs (${total / baseTotal}%.2fx)")
      flagged.foreach { case (name, sec, b) =>
        System.err.println(f"[bench] REGRESSION $name: ${sec}%.2fs vs baseline ${b}%.2fs (${sec / b}%.2fx)")
      }
      if (flagged.isEmpty) System.err.println("[bench] no per-query regressions > 1.3x")
    } catch {
      case e: Throwable => System.err.println(s"[bench] baseline compare failed: ${e.getMessage}")
    }
  }
}
