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
  * The artifact is self-describing: pass 1 runs in sorted name order
  * (stable cross-round per-query diffs — Map hash order let whichever
  * query ran first absorb post-warmup costs) and pass 2 in REVERSE
  * name order (r16: a host-load window then lands on different
  * queries in each pass, so the per-query min absorbs it instead of
  * producing alphabet-contiguous false flags), and the JSON carries the
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
  * Load forensics (r13, after r12's 5-key contiguous-alphabetical-block
  * flag could only be adjudicated by cross-run inference): the artifact
  * now records (a) each query's wall-clock START OFFSET in both passes
  * (`start1`/`start2`, seconds from bench epoch) — a contiguous block
  * of flags whose offsets span one narrow window is a load window, not
  * five independent plan regressions; (b) a background host-load sample
  * every 10 s (`load_samples`: [offset, /proc/loadavg 1-min,
  * MemAvailable MiB]) so that window can be matched against external
  * pressure; (c) per-PASS flag lists (`prev_flagged_run1/2`,
  * `baseline_flagged_run1/2`) alongside the gate's min-of-2 lists, so
  * "slow in both passes" vs "one-pass spike" is decidable from the
  * JSON; and (d) headline `load_max`/`mem_min_mb` so the truncated
  * stdout tail still carries the load verdict.
  *
  * `SPARK_GRAFT_ONLY=prefix[,prefix…]` cold-isolates a query family
  * (the r9 discipline for adjudicating driver flags): only matching
  * keys run, and the snapshot/prev-compare machinery is bypassed so a
  * partial run can never clobber or compare against a full-surface
  * baseline. A partial run self-declares `status:"partial"` and
  * `"partial":true` — the hard-gate rule (green may be claimed only by
  * quoting the status field) therefore can never be satisfied by a
  * subset run.
  */
object Bench {
  /** The stdout artifact's required key set (BenchGateSpec pins this
    * list; main() requires every key present before printing). The
    * r13 load-forensics keys — start offsets, load samples, headline
    * load/mem — are part of the contract: a driver flag on a
    * contiguous query block must be adjudicable from the JSON alone. */
  private[graft] val ArtifactKeys: Seq[String] = Seq(
    "queries_run1", "queries_run2", "queries", "start1", "start2",
    "load_samples", "index_build_sec_run1", "index_build_sec_run2",
    "warmup_sec", "sf", "run1_sec", "run2_sec",
    "gc_run1_sec", "gc_run2_sec", "load_max", "mem_min_mb",
    "n_queries", "n_failed", "metric", "value", "unit", "status")

  /** Sum of collection time across all JVM collectors, seconds. */
  private def gcSec(): Double =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .stream.mapToLong(b => math.max(b.getCollectionTime, 0L)).sum / 1e3

  /** Background host-load sampler: every `periodMs` records
    * (seconds-from-epoch, /proc/loadavg 1-min, MemAvailable MiB).
    * Reads fail soft (-1 fields) on non-Linux boxes. The epoch is
    * shared with the per-query start offsets so a flagged query's
    * window can be matched against the host pressure at that moment. */
  private[graft] final class LoadSampler(epochNanos: Long, periodMs: Long = 10000) {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Double, Double, Long)]()
    @volatile private var running = true
    private def sampleOnce(): Unit = {
      val t = (System.nanoTime() - epochNanos) / 1e9
      val load =
        try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split("\\s+")(0).toDouble
        catch { case _: Throwable => -1.0 }
      val memMb =
        try {
          val src = scala.io.Source.fromFile("/proc/meminfo")
          try src.getLines()
            .collectFirst { case l if l.startsWith("MemAvailable:") =>
              l.trim.split("\\s+")(1).toLong / 1024 }
            .getOrElse(-1L)
          finally src.close()
        } catch { case _: Throwable => -1L }
      buf.add((t, load, memMb))
    }
    private val thread = new Thread(() => {
      while (running) {
        sampleOnce()
        try Thread.sleep(periodMs) catch { case _: InterruptedException => running = false }
      }
    }, "graft-bench-load-sampler")
    thread.setDaemon(true)
    thread.start()
    def stop(): Seq[(Double, Double, Long)] = {
      running = false
      thread.interrupt()
      sampleOnce() // final sample so short runs still carry ≥2 points
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq.sortBy(_._1)
    }
  }

  private def r2(x: Double): Double = math.rint(x * 100) / 100

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
    val epoch = System.nanoTime()
    val sampler = new LoadSampler(epoch)
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
              "queries (cold-isolation mode; snapshot + prev-compare skipped; status=partial)")
          kept
        case None => all
      }
    }
    // per-query attribution: (name, wall sec or -1, gc sec inside window,
    // start offset sec from bench epoch)
    def onePass(pass: Int, order: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Seq[(String, Double, Double, Double)] =
      order.map { case (name, fn) =>
        val g0 = gcSec()
        val t0 = System.nanoTime()
        val startOff = (t0 - epoch) / 1e9
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
        (name, if (ok) sec else -1.0, gc, startOff)
      }
    graft.operators.SharedIndexes.drainBuildLog() // warmup leftovers out
    val pass1 = onePass(1, surface)
    // Per-index build seconds (r16, verdict #6): the shared-index build
    // phase rides inside dedup_candidate_index's timing; these maps
    // break that single number down per index so build-vs-serve cost is
    // read from the artifact, not from an attribution paragraph.
    val idx1 = graft.operators.SharedIndexes.drainBuildLog()
    CachedPlans.clear(spark) // pass 2 rebuilds shared indexes: same cost model
    // Pass 2 walks the surface in REVERSE name order (r16): both passes
    // walking the same sorted order meant a host-load window landed on
    // the same alphabet-contiguous block in both passes, so min-of-2
    // couldn't absorb it (three rounds of q_a…q_c false-flag forensics).
    // Reversed, a load window hits DIFFERENT queries in each pass and
    // the per-query min drops the spike out. The per-query start1/start2
    // offsets still locate each query inside its own pass.
    val pass2 = onePass(2, surface.reverse)
    val idx2 = graft.operators.SharedIndexes.drainBuildLog()
    val loadSamples = sampler.stop()
    val run1 = pass1.map { case (n, s, _, _) => (n, s) }
    val run2 = pass2.map { case (n, s, _, _) => (n, s) }
    val start1 = pass1.map { case (n, _, _, o) => (n, r2(o)) }
    val start2 = pass2.map { case (n, _, _, o) => (n, r2(o)) }
    val gc1 = pass1.map { case (n, _, g, _) => (n, r2(g)) }
    val gc2 = pass2.map { case (n, _, g, _) => (n, r2(g)) }
    def passStats(p: Seq[(String, Double, Double, Double)]): (Double, Double) =
      (p.collect { case (_, s, _, _) if s >= 0 => s }.sum, p.map(_._3).sum)
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
    // Per-PASS flag lists (informational — the gate reads only the
    // min-of-2 lists above): "slow in both passes" vs "one-pass spike"
    // becomes decidable from the artifact without the snapshot.
    val perPass =
      if (only.isDefined) ""
      else {
        def lists(label: String, ref: Option[Map[String, Double]],
            flag: (Map[String, Double], Map[String, Double]) => Seq[String]): String =
          ref match {
            case None => ""
            case Some(m) =>
              val f1 = flag(run1.toMap, m)
              val f2 = flag(run2.toMap, m)
              s""""${label}_flagged_run1":${f1.map(JsonUtil.q).mkString("[", ",", "]")},""" +
                s""""${label}_flagged_run2":${f2.map(JsonUtil.q).mkString("[", ",", "]")},"""
          }
        lists("baseline", loadBaseline(), flagVsBaseline) +
          lists("prev", loadPrevSnapshot(sfDir), flagVsPrev)
      }
    // HARD GATE: the artifact self-declares. "green" requires zero
    // failed queries AND empty baseline_flagged AND empty prev_flagged —
    // a scoreboard/narrative may claim green ONLY by quoting this field,
    // so a flagged regression can never ship under a green banner.
    // "flagged" (r12): ≤2 flagged queries while the run as a whole got
    // FASTER (both comparison ratios < 1) — still not green (the
    // no-green-banner rule is unchanged), but distinct from
    // "perf_regressed" so one drifting query doesn't label an
    // otherwise-improved round as a regression. "partial" (r13): a
    // SPARK_GRAFT_ONLY subset run can never self-declare green.
    val failed = results.exists(_._2 < 0)
    val status =
      if (only.isDefined) "partial" else gateStatus(failed, delta, prev)
    if (status != "green")
      System.err.println(s"[bench] STATUS $status — do NOT claim green this round")
    val loadMax = loadSamples.map(_._2).filter(_ >= 0).maxOption.getOrElse(-1.0)
    val memMin = loadSamples.map(_._3).filter(_ >= 0).minOption.getOrElse(-1L)
    val loadJson = loadSamples
      .map { case (t, l, m) => s"[${r2(t)},$l,$m]" }.mkString("[", ",", "]")
    // Headline fields LAST: the driver archives only the final ~2000
    // chars of stdout, and with a 200+-query surface the per-query maps
    // alone exceed that — fields printed before them are truncated away.
    // Ordering the object {big maps → guards → headline} keeps
    // status/total/counts readable in the archived tail (the full line
    // is also mirrored into the per-SF snapshot file).
    val nFailed = results.count(_._2 < 0)
    val partialJson = if (only.isDefined) s""""partial":true,""" else ""
    val line = s"""{"queries_run1":${qjson(run1)},"queries_run2":${qjson(run2)},""" +
      s""""queries":${qjson(results)},""" +
      s""""start1":${qjson(start1)},"start2":${qjson(start2)},""" +
      s""""load_samples":$loadJson,""" +
      s""""index_build_sec_run1":${qjson(idx1)},"index_build_sec_run2":${qjson(idx2)},""" +
      s""""warmup_sec":$warmupSec,$perPass${delta.json}${prev.json}"sf":${JsonUtil.q(sfDir)},""" +
      s""""run1_sec":$run1Sec,"run2_sec":$run2Sec,""" +
      s""""gc_run1_sec":$gcRun1,"gc_run2_sec":$gcRun2,""" +
      s""""load_max":$loadMax,"mem_min_mb":$memMin,""" +
      s""""n_queries":${results.size},"n_failed":$nFailed,$partialJson""" +
      s""""metric":"total","value":$total,"unit":"sec","status":${JsonUtil.q(status)}}"""
    // Self-check against the spec-pinned schema: dropping a telemetry
    // field fails the bench itself, not just a downstream reader.
    val missing = ArtifactKeys.filterNot(k => line.contains("\"" + k + "\":"))
    require(missing.isEmpty, s"bench artifact missing keys: ${missing.mkString(",")}")
    println(line)
    // Truncation insurance (r17, verdict #5/#8): the r15 driver bench
    // was lost to stdout tail-truncation (BENCH_r15.json parsed:null),
    // which cost r16 its whole per-query round-over-round comparison.
    // Mirror the EXACT artifact line to a file so a clipped stdout can
    // never erase the measurement. Fail-soft: a read-only CWD must not
    // fail the bench itself.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")),
      (line + "\n").getBytes("UTF-8"))
    catch {
      case e: Throwable => System.err.println(s"[bench] bench_last write failed: ${e.getMessage}")
    }
    if (only.isEmpty)
      writeSnapshot(sfDir, results, run1, run2, warmupSec,
        start1, start2, gc1, gc2, loadJson)
    CachedPlans.clear(spark)
    spark.stop()
  }

  /** One baseline/prev comparison's outcome: the JSON fragment for the
    * stdout artifact, the flagged-query count, the shared-query total
    * ratio (-1 when no comparison file exists), and whether a file was
    * PRESENT but unparseable (distinct from absent: flags=0 from a
    * parse failure is missing evidence, not clean evidence). */
  private[graft] case class Cmp(json: String, flagged: Int, ratio: Double,
      parseFailed: Boolean = false)

  /** The gate's self-declared status. "green" requires zero failures
    * AND zero flagged queries in BOTH comparisons. "flagged" (≤2
    * flagged queries while every PRESENT comparison's ratio improved —
    * a missing file contributes no evidence, and at least one
    * comparison must be present) is still not green — it exists so one
    * drifting query doesn't label an otherwise-faster round
    * "perf_regressed". A comparison file that existed but failed to
    * parse forces "cmp_parse_failed": its flag count is missing, not
    * zero, so neither green nor flagged may be claimed over it. */
  private[graft] def gateStatus(failed: Boolean, baseline: Cmp, prev: Cmp): String = {
    val nFlagged = baseline.flagged + prev.flagged
    val basePresent = baseline.json.nonEmpty
    val prevPresent = prev.json.nonEmpty
    val improvedOverall = (basePresent || prevPresent) &&
      (!basePresent || baseline.ratio < 1.0) &&
      (!prevPresent || prev.ratio < 1.0)
    if (failed) "failed_queries"
    else if (baseline.parseFailed || prev.parseFailed) "cmp_parse_failed"
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
      run1: Seq[(String, Double)], run2: Seq[(String, Double)], warmupSec: Double,
      start1: Seq[(String, Double)], start2: Seq[(String, Double)],
      gc1: Seq[(String, Double)], gc2: Seq[(String, Double)], loadJson: String): Unit =
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
        s""""queries_run2":${qjson(run2)},""" +
        s""""start1":${qjson(start1)},"start2":${qjson(start2)},""" +
        s""""gc1":${qjson(gc1)},"gc2":${qjson(gc2)},""" +
        s""""load_samples":$loadJson}""" + "\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(snapshotPath(sfDir)),
        json.getBytes("UTF-8"))
    } catch {
      case e: Throwable => System.err.println(s"[bench] snapshot write failed: ${e.getMessage}")
    }

  /** Parses the per-query `"queries":{…}` map out of a snapshot or
    * baseline file (no JSON lib on the classpath). Returns None when
    * the file is absent; throws on a present-but-unparseable file so
    * callers can distinguish the two. */
  private def parseQueryMap(text: String): Map[String, Double] = {
    val qsec = """"([^"]+)":\s*([0-9.eE+-]+)""".r
    val inQueries = text.substring(text.indexOf("\"queries\""))
    val stop = inQueries.indexOf("\"queries_run1\"")
    qsec.findAllMatchIn(if (stop > 0) inQueries.substring(0, stop) else inQueries)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap - "queries"
  }

  /** Previous-round per-query map, None when absent or for another SF.
    * Parse failures fail soft to None here (the gate-bearing path in
    * reportPrevRound handles them loudly). */
  private def loadPrevSnapshot(sfDir: String): Option[Map[String, Double]] =
    try {
      val f = new java.io.File(snapshotPath(sfDir))
      if (!f.exists()) None
      else {
        val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val sfRe = """"sf":\s*"([^"]*)"""".r
        if (!sfRe.findFirstMatchIn(text).map(_.group(1)).contains(sfDir)) None
        else Some(parseQueryMap(text))
      }
    } catch { case _: Throwable => None }

  private def loadBaseline(): Option[Map[String, Double]] =
    try {
      val f = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_BASELINE", "bench_baseline.json"))
      if (!f.exists()) None
      else Some(parseQueryMap(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    } catch { case _: Throwable => None }

  /** The prev-round flag rule over an arbitrary results map (shared by
    * the gate-bearing min-of-2 compare and the per-pass lists): flagged
    * when min exceeds 1.5× previous AFTER normalizing out run-wide
    * drift, with a 0.5 s absolute floor. */
  private def flagVsPrev(results: Map[String, Double], prev: Map[String, Double]): Seq[String] = {
    val shared = (results.keySet intersect prev.keySet)
      .filter(n => results(n) >= 0 && prev(n) >= 0)
    val sharedPrev = shared.toSeq.map(prev).sum
    val ratio = if (sharedPrev > 0) shared.toSeq.map(results).sum / sharedPrev else -1.0
    val norm = math.max(ratio, 1.0)
    results.toSeq.collect {
      case (name, sec) if sec >= 0 &&
          prev.get(name).exists(p => p > 0.3 && sec > p * 1.5 * norm && sec - p * norm > 0.5) =>
        (name, sec / prev(name))
    }.sortBy(-_._2).map(_._1)
  }

  /** The baseline flag rule over an arbitrary results map: >1.3× the
    * round-1 time for queries with a ≥0.3 s baseline. */
  private def flagVsBaseline(results: Map[String, Double], baseline: Map[String, Double]): Seq[String] =
    results.toSeq.collect {
      case (name, sec) if sec >= 0 &&
          baseline.get(name).exists(b => b > 0.3 && sec > b * 1.3) =>
        (name, sec / baseline(name))
    }.sortBy(-_._2).map(_._1)

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
      val prev = parseQueryMap(text)
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
      val flagged = flagVsPrev(results, prev)
      System.err.println(
        f"[bench] prev-round shared ${shared.size} queries: ${sharedNow}%.1fs vs " +
          f"${sharedPrev}%.1fs (${ratio}%.2fx)")
      flagged.foreach { name =>
        System.err.println(
          f"[bench] PREV-ROUND REGRESSION $name: ${results(name)}%.2fs vs ${prev(name)}%.2fs " +
            f"(${results(name) / prev(name)}%.2fx raw, norm ${norm}%.2fx)")
      }
      if (flagged.isEmpty) System.err.println("[bench] no prev-round regressions > 1.5x normalized")
      val flaggedJson = flagged.map(JsonUtil.q).mkString("[", ",", "]")
      Cmp(s""""prev_round_ratio":$ratio,"prev_flagged":$flaggedJson,""", flagged.size, ratio)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] prev-round compare failed: ${e.getMessage}")
        Cmp("", 0, -1.0, parseFailed = true)
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
      val baseline = parseQueryMap(text)
      val flagged = flagVsBaseline(results, baseline)
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
      flagged.foreach { name =>
        System.err.println(
          f"[bench] REGRESSION $name: ${results(name)}%.2fs vs baseline ${baseline(name)}%.2fs " +
            f"(${results(name) / baseline(name)}%.2fx)")
      }
      if (flagged.isEmpty) System.err.println("[bench] no per-query regressions > 1.3x")
      val flaggedJson = flagged.map(JsonUtil.q).mkString("[", ",", "]")
      Cmp(s""""baseline_shared_ratio":$ratio,"baseline_flagged":$flaggedJson,""", flagged.size, ratio)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] baseline compare failed: ${e.getMessage}")
        Cmp("", 0, -1.0, parseFailed = true)
    }
  }

  /** Test seam: the per-pass flag rules are the gate rules. */
  private[graft] def flagVsPrevForTest(results: Map[String, Double],
      prev: Map[String, Double]): Seq[String] = flagVsPrev(results, prev)
  private[graft] def flagVsBaselineForTest(results: Map[String, Double],
      baseline: Map[String, Double]): Seq[String] = flagVsBaseline(results, baseline)
}
