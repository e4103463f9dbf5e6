package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every `SparkEntry.queries` entry at the
  * configured scale factor and prints exactly ONE JSON line.
  *
  * Queries are forced through the noop sink so the FULL plan runs —
  * `count()` would let Catalyst prune projections and sorts and time a
  * gutted plan. Failures are reported as -1 in the per-query map (and
  * logged to stderr) instead of masquerading as fast timings.
  *
  * The artifact is self-describing: queries run in sorted name order
  * (stable cross-round per-query diffs — Map hash order let whichever
  * query ran first absorb post-warmup costs), and the JSON carries the
  * warmup wall-time (a machine-load proxy: warmup does fixed work, so
  * a 3× warmup means a loaded box, not a plan regression) plus the
  * baseline comparison (total ratio + flagged queries), so a noisy run
  * identifies itself without a rerun.
  *
  * Two full passes, per-query MIN reported: warmup_sec catches a
  * loaded box at start, but a mid-run co-tenant spike lands on
  * whichever queries were executing — min-of-2 makes a single spike
  * drop out entirely, and both raw passes are in the JSON
  * (`queries_run1`/`queries_run2`) so a reader can see which pass a
  * flag came from without a rerun. CachedPlans is cleared between
  * passes so pass 2 pays the same shared-index builds (per-query cost
  * attribution stays comparable across passes).
  *
  * Session-health attribution (r12, after r11 showed pass 2 running
  * 2.2× slower than pass 1 with 30–96× single-query spikes): every
  * query records the JVM-wide GC time that elapsed inside its timing
  * window (sum over GarbageCollectorMXBeans). A spike whose GC share
  * dominates is heap/cleaner accretion, not a plan regression — the
  * per-pass GC totals go in the stdout artifact and per-query GC maps
  * in the snapshot, so the distinction needs no rerun.
  *
  * `SPARK_GRAFT_ONLY=prefix[,prefix…]` cold-isolates a query family
  * (the r9 discipline for adjudicating driver flags): only matching
  * keys run, and the snapshot/prev-compare machinery is bypassed so a
  * partial run can never clobber or compare against a full-surface
  * baseline.
  */
object Bench {
  /** Sum of collection time across all JVM collectors, seconds. */
  private def gcSec(): Double =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .stream.mapToLong(b => math.max(b.getCollectionTime, 0L)).sum / 1e3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query doesn't absorb
    // session bring-up (measures steady-state, not cold-start)
    val w0 = System.nanoTime()
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch {
      case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    val surface = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      only match {
        case Some(prefixes) =>
          val kept = all.filter { case (n, _) => prefixes.exists(n.startsWith) }
          System.err.println(
            s"[bench] SPARK_GRAFT_ONLY=${prefixes.mkString(",")}: ${kept.size}/${all.size} " +
              "queries (cold-isolation mode; snapshot + prev-compare skipped)")
          kept
        case None => all
      }
    }
    // per-query GC attribution: (name -> (wall sec or -1, gc sec inside window))
    def onePass(pass: Int): Seq[(String, Double, Double)] =
      surface.map { case (name, fn) =>
        val g0 = gcSec()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        val gc = gcSec() - g0
        if (ok && sec > 1.0 && gc > 0.3 * sec)
          System.err.println(
            f"[bench] GC-DOMINATED $name run$pass: ${sec}%.2fs wall, ${gc}%.2fs GC " +
              "(session heap pressure, not plan work)")
        (name, if (ok) sec else -1.0, gc)
      }
    val pass1 = onePass(1)
    CachedPlans.clear(spark) // pass 2 rebuilds shared indexes: same cost model
    val pass2 = onePass(2)
    val run1 = pass1.map { case (n, s, _) => (n, s) }
    val run2 = pass2.map { case (n, s, _) => (n, s) }
    def passStats(p: Seq[(String, Double, Double)]): (Double, Double) =
      (p.collect { case (_, s, _) if s >= 0 => s }.sum, p.map(_._3).sum)
    val (run1Sec, gcRun1) = passStats(pass1)
    val (run2Sec, gcRun2) = passStats(pass2)
    System.err.println(
      f"[bench] pass totals: run1 ${run1Sec}%.1fs (GC ${gcRun1}%.1fs), " +
        f"run2 ${run2Sec}%.1fs (GC ${gcRun2}%.1fs), run2/run1 ${run2Sec / math.max(run1Sec, 1e-9)}%.2fx")
    val r2map = run2.toMap
    // min over the passes that SUCCEEDED; -1 only when both failed
    val results = run1.map { case (name, a) =>
      val b = r2map.getOrElse(name, -1.0)
      name -> Seq(a, b).filter(_ >= 0).minOption.getOrElse(-1.0)
    }
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"${JsonUtil.q(k)}:$v" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val delta = reportDeltas(results.toMap, total)
    val prev =
      if (only.isDefined) Cmp("", 0, -1.0) else reportPrevRound(results.toMap, sfDir)
    // HARD GATE: the artifact self-declares. "green" requires zero
    // failed queries AND empty baseline_flagged AND empty prev_flagged —
    // a scoreboard/narrative may claim green ONLY by quoting this field,
    // so a flagged regression can never ship under a green banner.
    // "flagged" (r12): ≤2 flagged queries while the run as a whole got
    // FASTER (both comparison ratios < 1) — still not green (the
    // no-green-banner rule is unchanged), but distinct from
    // "perf_regressed" so one drifting query doesn't label an
    // otherwise-improved round as a regression.
    val failed = results.exists(_._2 < 0)
    val status = gateStatus(failed, delta, prev)
    if (status != "green")
      System.err.println(s"[bench] STATUS $status — do NOT claim green this round")
    // Headline fields LAST: the driver archives only the final ~2000
    // chars of stdout, and with a 200+-query surface the per-query maps
    // alone exceed that — fields printed before them are truncated away.
    // Ordering the object {big maps → guards → headline} keeps
    // status/total/counts readable in the archived tail (the full line
    // is also mirrored into the per-SF snapshot file).
    val nFailed = results.count(_._2 < 0)
    println(s"""{"queries_run1":${qjson(run1)},"queries_run2":${qjson(run2)},""" +
      s""""queries":${qjson(results)},""" +
      s""""warmup_sec":$warmupSec,${delta.json}${prev.json}"sf":${JsonUtil.q(sfDir)},""" +
      s""""run1_sec":$run1Sec,"run2_sec":$run2Sec,""" +
      s""""gc_run1_sec":$gcRun1,"gc_run2_sec":$gcRun2,""" +
      s""""n_queries":${results.size},"n_failed":$nFailed,""" +
      s""""metric":"total","value":$total,"unit":"sec","status":${JsonUtil.q(status)}}""")
    if (only.isEmpty)
      writeSnapshot(sfDir, results, run1, run2, warmupSec)
    CachedPlans.clear(spark)
    spark.stop()
  }

  /** One baseline/prev comparison's outcome: the JSON fragment for the
    * stdout artifact, the flagged-query count, and the shared-query
    * total ratio (-1 when no comparison file exists). */
  private[graft] case class Cmp(json: String, flagged: Int, ratio: Double)

  /** The gate's self-declared status. "green" requires zero failures
    * AND zero flagged queries in BOTH comparisons. "flagged" (≤2
    * flagged queries while every available comparison ratio improved)
    * is still not green — it exists so one drifting query doesn't
    * label an otherwise-faster round "perf_regressed". Everything
    * else with a flag IS perf_regressed. */
  private[graft] def gateStatus(failed: Boolean, baseline: Cmp, prev: Cmp): String = {
    val nFlagged = baseline.flagged + prev.flagged
    val improvedOverall = baseline.ratio < 1.0 &&
      (prev.ratio < 1.0 || prev.json.isEmpty) // no prev snapshot: baseline decides
    if (failed) "failed_queries"
    else if (nFlagged == 0) "green"
    else if (nFlagged <= 2 && improvedOverall) "flagged"
    else "perf_regressed"
  }

  /** Snapshot file for round-over-round comparison, one per scale
    * factor (`bench_prev_sf0.1.json` etc. — per-SF names so a local
    * sf0.01 dev run can never clobber the driver-scale baseline).
    * Holds the full per-query data, so the previous round's numbers
    * stay readable even when the driver artifact truncates stdout. */
  private def snapshotPath(sfDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_PREV",
      s"bench_prev_${new java.io.File(sfDir).getName}.json")

  private def writeSnapshot(sfDir: String, results: Seq[(String, Double)],
      run1: Seq[(String, Double)], run2: Seq[(String, Double)], warmupSec: Double): Unit =
    try {
      // Provenance (r11): every run ARCHIVES the snapshot it is about
      // to overwrite into bench_hist/, stamped with the old file's own
      // mtime — "which run was prev" never needs git archaeology again.
      // bench_prev_* and bench_hist/ are gitignored so a driver-box run
      // can't leave the working tree dirty at judge time (the
      // comparison contract lives in BASELINE.md).
      val prev = java.nio.file.Paths.get(snapshotPath(sfDir))
      if (java.nio.file.Files.exists(prev)) {
        val hist = java.nio.file.Paths.get("bench_hist")
        java.nio.file.Files.createDirectories(hist)
        val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.nio.file.Files.getLastModifiedTime(prev).toInstant)
        val base = prev.getFileName.toString.stripSuffix(".json")
        // CREATE_NEW + numeric suffix on collision: two snapshots
        // overwritten within the same mtime second must both survive
        // (REPLACE_EXISTING silently dropped the earlier archive)
        var n = 0
        var done = false
        while (!done && n < 100) {
          val suffix = if (n == 0) "" else s"-$n"
          try {
            java.nio.file.Files.copy(prev, hist.resolve(s"$base-$stamp$suffix.json"))
            done = true
          } catch { case _: java.nio.file.FileAlreadyExistsException => n += 1 }
        }
      }
      def qjson(rs: Seq[(String, Double)]): String =
        rs.map { case (k, v) => s"${JsonUtil.q(k)}:$v" }.mkString("{", ",", "}")
      val json = s"""{"sf":${JsonUtil.q(sfDir)},"warmup_sec":$warmupSec,""" +
        s""""queries":${qjson(results)},"queries_run1":${qjson(run1)},""" +
        s""""queries_run2":${qjson(run2)}}""" + "\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(snapshotPath(sfDir)),
        json.getBytes("UTF-8"))
    } catch {
      case e: Throwable => System.err.println(s"[bench] snapshot write failed: ${e.getMessage}")
    }

  /** Round-over-round regression guard (vs the last run's snapshot at
    * the SAME scale factor): a query is flagged when its min exceeds
    * 1.5× its previous min AFTER normalizing out run-wide drift (the
    * shared-total ratio — a loaded box slows everything, a plan
    * regression slows one query relative to the rest) AND the
    * normalized absolute delta exceeds 0.5 s — sub-second queries
    * carry high relative variance (JIT/codegen-cache state across a
    * ~190-plan session), so a ratio alone false-flags them while a
    * genuine 2s→4s regression clears both bars. Emits
    * `"prev_round_ratio":…,"prev_flagged":[…],` JSON fragments and
    * stderr lines; empty when no same-SF snapshot exists. */
  private def reportPrevRound(results: Map[String, Double], sfDir: String): Cmp = {
    val f = new java.io.File(snapshotPath(sfDir))
    if (!f.exists()) return Cmp("", 0, -1.0)
    try {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val sfRe = """"sf":\s*"([^"]*)"""".r
      val snapSf = sfRe.findFirstMatchIn(text).map(_.group(1))
      if (!snapSf.contains(sfDir)) return Cmp("", 0, -1.0) // snapshot from another SF: not comparable
      val qsec = """"([^"]+)":\s*([0-9.eE+-]+)""".r
      val inQueries = text.substring(text.indexOf("\"queries\""))
      val stop = inQueries.indexOf("\"queries_run1\"")
      val prev = qsec.findAllMatchIn(
          if (stop > 0) inQueries.substring(0, stop) else inQueries)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap - "queries"
      val shared = (results.keySet intersect prev.keySet)
        .filter(n => results(n) >= 0 && prev(n) >= 0)
      val sharedNow = shared.toSeq.map(results).sum
      val sharedPrev = shared.toSeq.map(prev).sum
      val ratio = if (sharedPrev > 0) sharedNow / sharedPrev else -1.0
      // Normalization protects against a LOADED box (ratio > 1: don't
      // flag everything) but must not manufacture flags when the run
      // got globally FASTER (ratio < 1): a query flat in raw seconds
      // is not a regression just because its neighbors sped up — so
      // the flag threshold never normalizes below 1.0.
      val norm = math.max(ratio, 1.0)
      val flagged = results.toSeq.collect {
        case (name, sec) if sec >= 0 &&
            prev.get(name).exists(p =>
              p > 0.3 && sec > p * 1.5 * norm && sec - p * norm > 0.5) =>
          (name, sec, prev(name))
      }.sortBy { case (_, sec, p) => -(sec / p) }
      System.err.println(
        f"[bench] prev-round shared ${shared.size} queries: ${sharedNow}%.1fs vs " +
          f"${sharedPrev}%.1fs (${ratio}%.2fx)")
      flagged.foreach { case (name, sec, p) =>
        System.err.println(
          f"[bench] PREV-ROUND REGRESSION $name: ${sec}%.2fs vs ${p}%.2fs (${sec / p}%.2fx raw, " +
            f"norm ${norm}%.2fx)")
      }
      if (flagged.isEmpty) System.err.println("[bench] no prev-round regressions > 1.5x normalized")
      val flaggedJson = flagged.map { case (n, _, _) => JsonUtil.q(n) }.mkString("[", ",", "]")
      Cmp(s""""prev_round_ratio":$ratio,"prev_flagged":$flaggedJson,""", flagged.size, ratio)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] prev-round compare failed: ${e.getMessage}")
        Cmp("", 0, -1.0)
    }
  }

  /** Per-query regression report vs `bench_baseline.json` (snapshot of
    * the round-1 driver run): printed on STDERR and returned as JSON
    * fragments (`"baseline_ratio":…,"flagged":[…],`) for embedding in
    * the stdout artifact — empty string when no baseline is present. */
  private def reportDeltas(results: Map[String, Double], total: Double): Cmp = {
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "bench_baseline.json")
    val f = new java.io.File(baselinePath)
    if (!f.exists()) return Cmp("", 0, -1.0)
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
      // shared-query ratio: totals aren't comparable once new queries
      // are added, so compare only the intersection
      // only names with a VALID timing on BOTH sides: a query that
      // crashed this run (-1) must drop out of both sums, or breakage
      // reads as a speedup
      val sharedNames = (results.keySet intersect baseline.keySet)
        .filter(n => results(n) >= 0 && baseline(n) >= 0)
      val sharedNow = sharedNames.toSeq.map(results).sum
      val sharedBase = sharedNames.toSeq.map(baseline).sum
      val ratio = if (sharedBase > 0) sharedNow / sharedBase else -1.0
      System.err.println(
        f"[bench] total ${total}%.1fs (baseline-total ${baseTotal}%.1fs); " +
          f"shared ${sharedNames.size} queries: ${sharedNow}%.1fs vs ${sharedBase}%.1fs (${ratio}%.2fx)")
      flagged.foreach { case (name, sec, b) =>
        System.err.println(f"[bench] REGRESSION $name: ${sec}%.2fs vs baseline ${b}%.2fs (${sec / b}%.2fx)")
      }
      if (flagged.isEmpty) System.err.println("[bench] no per-query regressions > 1.3x")
      val flaggedJson = flagged.map { case (n, _, _) => JsonUtil.q(n) }.mkString("[", ",", "]")
      Cmp(s""""baseline_shared_ratio":$ratio,"baseline_flagged":$flaggedJson,""", flagged.size, ratio)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] baseline compare failed: ${e.getMessage}")
        Cmp("", 0, -1.0)
    }
  }
}
