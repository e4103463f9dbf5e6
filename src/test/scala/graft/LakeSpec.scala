package graft

import java.nio.file.Files

import graft.sinks.PartitionedLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("day-partitioned lake: write, prune on read, dynamic overwrite") {
    val path = Files.createTempDirectory("graft-lake").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
    PartitionedLake.writeByDay(ev, "ts", path)

    val day = "2024-01-05"
    val one = PartitionedLake.readDay(spark, path, day)
    val expected = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(one.count() === expected)
    // partition pruning: the day predicate must land in PartitionFilters
    // (planning-time directory pruning), not in the data filter
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"expected partition filters in scan:\n${plan.take(800)}")

    // dynamic overwrite replaces one day, leaves the rest
    val total = ev.count()
    PartitionedLake.writeByDay(ev.filter(date_format(col("ts"), "yyyy-MM-dd") === day), "ts", path)
    assert(spark.read.parquet(path).count() === total)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact day-partitions at runtime") {
    // THE 100-TB fact-dim pattern: the fact lake is day-partitioned,
    // the filter lives on a dimension table — static planning cannot
    // prune (the fact predicate is only known after the dim filter
    // runs), DPP turns the broadcast dim into a runtime partition
    // filter so the fact scan never opens the other days' files.
    val path = Files.createTempDirectory("graft-dpp").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
    PartitionedLake.writeByDay(ev, "ts", path)
    // partition inference types `day` as DATE — read it back as string
    val allDays = spark.read.parquet(path).select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(allDays.length > 3, "test premise: multiple day partitions")
    val wanted = allDays.take(2)

    import spark.implicits._
    // the dim must be a real table (a LocalRelation constant-folds its
    // filter away) and the predicate an attr=literal equality (DPP's
    // isLikelySelective heuristic; a bare boolean column is not)
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString + "/days"
    allDays.map(d => (d, if (wanted.contains(d)) "peak" else "offpeak")).toSeq
      .toDF("d", "season")
      .select(to_date(col("d")).as("day"), col("season"))
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    // AQE off for a concrete pre-execution tree (strategy identical)
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = spark.read.parquet(path)
      val joined = fact.join(dim.filter(col("season") === "peak"), Seq("day"))
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("dynamicpruning"),
        s"DPP subquery missing from the fact scan:\n${plan.toString.take(1200)}")
      val expected = ev.filter(
        date_format(col("ts"), "yyyy-MM-dd").isin(wanted.toSeq: _*)).count()
      // collect() executes THIS queryExecution (count() would plan a
      // fresh one and leave the captured scan's metrics untouched)
      assert(joined.collect().length.toLong === expected)
      // runtime proof: the fact scan opened only the kept partitions
      val scan = plan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metrics.contains("numPartitions") => f
      }.getOrElse(fail("no partitioned file scan in the plan"))
      assert(scan.metrics("numPartitions").value === wanted.length.toLong,
        s"scan read ${scan.metrics("numPartitions").value} partitions, wanted ${wanted.length}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("compaction: small files collapse, rows and other days untouched") {
    val path = Files.createTempDirectory("graft-compact").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    // deliberately fragment: 16 shuffle partitions → ~16 files per day
    ev.repartition(16).write.partitionBy("day").parquet(path)
    val day = "2024-01-05"
    def files(d: String) = new java.io.File(s"$path/day=$d")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = files(day)
    assert(before > 4, s"fragmentation setup produced only $before files")
    val total = spark.read.parquet(path).count()
    val dayRows = spark.read.parquet(path).filter(col("day") === day).count()

    PartitionedLake.compactDay(spark, path, day, targetFiles = 2)
    assert(files(day) === 2, "compaction must hit the file target")
    assert(spark.read.parquet(path).filter(col("day") === day).count() === dayRows)
    assert(spark.read.parquet(path).count() === total, "other days must be untouched")
  }

  test("z-ordered compaction: per-file boxes tight, either dimension prunes files") {
    val path = Files.createTempDirectory("graft-zorder").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.repartition(16).write.partitionBy("day").parquet(path)
    val day = "2024-01-05"
    val dayRows = spark.read.parquet(path).filter(col("day") === day).count()

    PartitionedLake.compactDayZordered(spark, path, day,
      dimA = "user_id", dimB = "value", targetFiles = 8)

    val files = new java.io.File(s"$path/day=$day")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length === 8, s"expected 8 z-ordered files, got ${files.length}")
    assert(spark.read.parquet(s"$path/day=$day").count() === dayRows,
      "z-order layout must not change the row set")
    assert(!spark.read.parquet(files.head).columns.contains("__zval"),
      "layout key must not leak into the files")

    // read back each file's min/max box in both dimensions
    val boxes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id")), min(col("value")), max(col("value")))
        .head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    val uLo = boxes.map(_._1).min; val uHi = boxes.map(_._2).max
    val vLo = boxes.map(_._3).min; val vHi = boxes.map(_._4).max
    // data-skipping: a predicate selecting the bottom 1/8 of EITHER
    // dimension's domain must skip files by min/max alone. A 1-D sort
    // layout passes one dimension and intersects ALL files on the
    // other; the Z-curve bounds both.
    val uCut = uLo + (uHi - uLo) / 8
    val vCut = vLo + (vHi - vLo) / 8
    val hitU = boxes.count { case (lo, _, _, _) => lo <= uCut }
    val hitV = boxes.count { case (_, _, lo, _) => lo <= vCut }
    assert(hitU <= 6, s"user_id predicate hits $hitU/8 files — dimension not clustered")
    assert(hitV <= 6, s"value predicate hits $hitV/8 files — dimension not clustered")

    // zone-map reader: manifest-pruned scans read fewer files and
    // return exactly the full-scan filter result on BOTH dimensions
    val dayPath = s"$path/day=$day"
    val man = PartitionedLake.manifest(spark, dayPath, Seq("user_id", "value")).persist()
    try {
      val full = spark.read.parquet(dayPath)
      for ((c, lo, hi) <- Seq(("user_id", uLo.toDouble, uCut.toDouble),
        ("value", vLo, vCut))) {
        val (pruned, nRead, nTotal) = PartitionedLake.readPruned(spark, dayPath, man, c, lo, hi)
        val want = full.filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi)
          .select(col("event_id")).collect().map(_.getLong(0)).sorted
        val got = pruned.select(col("event_id")).collect().map(_.getLong(0)).sorted
        assert(got.sameElements(want), s"pruned read on $c changed the result")
        assert(nRead < nTotal, s"$c zone map pruned nothing ($nRead/$nTotal)")
      }
    } finally man.unpersist()
  }

  test("bloom manifest: point lookup skips files zone maps cannot, result exact") {
    val path = Files.createTempDirectory("graft-bloom").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    // hash-fragmented layout: every file's event_id [min,max] box spans
    // ~the whole domain, so min/max stats are useless for a point key
    ev.repartition(8, col("user_id")).write.partitionBy("day").parquet(path)
    val day = "2024-01-05"
    val dayPath = s"$path/day=$day"
    // a MID-domain key: every file's hash-scattered [min,max] straddles
    // it (an extreme key would let min/max stats prune after all)
    val ids = spark.read.parquet(dayPath).select(col("event_id"))
      .orderBy(col("event_id")).collect().map(_.getLong(0))
    val key = ids(ids.length / 2)

    // zone maps keep (nearly) everything on this layout…
    val zman = PartitionedLake.manifest(spark, dayPath, Seq("event_id")).persist()
    val bman = PartitionedLake.bloomManifest(spark, dayPath, "event_id",
      expectedPerFile = 10000, fpp = 0.01).persist()
    try {
      val (_, zRead, zTotal) =
        PartitionedLake.readPruned(spark, dayPath, zman, "event_id", key.toDouble, key.toDouble)
      assert(zTotal > 1, "fragmentation setup produced a single file")
      assert(zRead > 1,
        s"layout unexpectedly min/max-prunable to one file ($zRead/$zTotal) — test premise broken")

      // …the bloom manifest reads only the file(s) that can hold the key
      val (res, nRead, nTotal) =
        PartitionedLake.readPrunedByKey(spark, dayPath, bman, "event_id", key)
      assert(nTotal === zTotal)
      assert(nRead < zRead,
        s"bloom must beat zone maps on a point key (bloom $nRead vs zone $zRead of $nTotal)")
      assert(res.select(col("event_id")).collect().map(_.getLong(0)).toSeq === Seq(key),
        "bloom-pruned lookup must return exactly the matching row")

      // definitely-absent contract: a key never written returns no rows
      // (false positives may open a file; the exact filter ends them)
      val (res2, _, _) =
        PartitionedLake.readPrunedByKey(spark, dayPath, bman, "event_id", -987654321L)
      assert(res2.count() === 0)
    } finally { zman.unpersist(); bman.unpersist() }
  }

  test("targeted key delete rewrites only bloom-hit files; others byte-untouched") {
    val path = Files.createTempDirectory("graft-del").toString + "/events"
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.repartition(8, col("user_id")).write.partitionBy("day").parquet(path)
    val day = "2024-01-05"
    val dayPath = s"$path/day=$day"
    def listing() = new java.io.File(dayPath).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

    val before = spark.read.parquet(dayPath)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    // three mid-range keys (extremes make every premise trivial)
    val victims = Seq(before(before.length / 4), before(before.length / 2),
      before(3 * before.length / 4))
    val bman = graft.sinks.PartitionedLake.bloomManifest(spark, dayPath, "event_id",
      expectedPerFile = 10000, fpp = 0.01).persist()
    val filesBefore = listing()
    try {
      val report = graft.sinks.PartitionedLake.deleteKeys(
        spark, dayPath, bman, "event_id", victims)
      val (rewritten, total) = (report.filesRewritten, report.filesTotal)
      assert(total === filesBefore.size.toLong)
      assert(rewritten < total, s"delete rewrote every file ($rewritten/$total)")

      val after = spark.read.parquet(dayPath)
        .select(col("event_id")).collect().map(_.getLong(0)).sorted
      assert(after.length === before.length - victims.length)
      assert((before.toSet -- victims) === after.toSet,
        "exactly the victim rows must disappear, nothing else")

      // files the bloom didn't implicate are PHYSICALLY the same files
      val filesAfter = listing()
      val untouched = filesBefore.keySet & filesAfter.keySet
      assert(untouched.size.toLong === total - rewritten)
      untouched.foreach { f =>
        assert(filesBefore(f) === filesAfter(f), s"untouched file $f changed on disk")
      }

      // the report maps every rewritten old file to its live replacement
      // (the manifest-invalidation contract), old files gone, no scratch
      // residue left behind in the partition directory
      assert(report.rewrites.size.toLong === rewritten)
      report.rewrites.foreach { case (oldF, newF) =>
        assert(!new java.io.File(new java.net.URI(oldF)).exists(), s"old file $oldF survives")
        newF.foreach(nf =>
          assert(new java.io.File(new java.net.URI(nf)).exists(), s"replacement $nf missing"))
      }
      assert(!new java.io.File(dayPath).listFiles().exists(_.getName.startsWith(".graft-delete")),
        "scratch directories must be cleaned up after the swap")

      // a manifest from BEFORE the delete is stale: the pruned reader
      // must refuse it loudly (silently tolerating missing files would
      // under-read — replacement parts aren't indexed in it at all)
      val ex = intercept[IllegalArgumentException] {
        graft.sinks.PartitionedLake.readPrunedByKey(spark, dayPath, bman, "event_id", victims.head)
      }
      assert(ex.getMessage.contains("STALE"), s"unexpected message: ${ex.getMessage}")
    } finally bman.unpersist()
  }

  test("schema evolution: columns added over time merge, old files read null") {
    // the lake reality: month 1 wrote (id, v); month 2 added quality.
    // mergeSchema must surface the union schema with nulls for old
    // files — silently dropping the new column (the default schema =
    // first-file behavior) loses data for every reader that doesn't
    // know evolution happened.
    import spark.implicits._
    val path = Files.createTempDirectory("graft-evolve").toString + "/docs"
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.parquet(s"$path/batch=1")
    Seq((3L, 30.0, 0.9), (4L, 40.0, 0.7)).toDF("id", "v", "quality")
      .write.parquet(s"$path/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet === Set("id", "v", "quality", "batch"))
    assert(merged.count() === 4)
    assert(merged.filter(col("quality").isNull).count() === 2,
      "old-batch rows must read null for the evolved column")
    assert(merged.filter(col("quality") > 0.8).count() === 1,
      "filters on the evolved column must work across the union")
  }
}
