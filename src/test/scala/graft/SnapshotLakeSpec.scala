package graft

import java.nio.file.{Files, Paths}

import graft.sinks.SnapshotLake
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotLakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.sources.Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), col("n_chars"))

  test("append commits are additive and versioned; reads are snapshot-isolated") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)

    assert(SnapshotLake.currentVersion(path) === 0)
    val v1 = SnapshotLake.commitAppend(a, path)
    val v2 = SnapshotLake.commitAppend(b, path)
    assert((v1, v2) === (1, 2))

    assert(SnapshotLake.readAt(spark, path, 1).count() === a.count())
    assert(SnapshotLake.read(spark, path).count() === a.count() + b.count())
    // v1 re-read AFTER the v2 commit is bit-identical to v1 before it:
    // readers plan from the manifest, not the directory
    val v1ids = SnapshotLake.readAt(spark, path, 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(v1ids.toSeq === a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("changesBetween serves exactly the appended rows; delete/compact commits add none") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
    val c = docs.filter(col("doc_id") % 3 === 2)
    SnapshotLake.commitAppend(a, path) // v1
    SnapshotLake.commitAppend(b, path) // v2
    SnapshotLake.commitDelete(spark, path, "source = 'src1'") // v3: removes rows
    SnapshotLake.commitAppend(c, path) // v4
    val vCompact = SnapshotLake.compact(spark, path, 512L * 1024 * 1024)._1 // v5: layout only
    assert(SnapshotLake.commitTypeOf(path, 3) === "delete")
    assert(SnapshotLake.commitTypeOf(path, vCompact) === "compact")

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // a consumer checkpointed at v1 sees the v2 and v4 appends — nothing
    // from the delete's rewrite files or the compaction's repack
    assert(ids(SnapshotLake.changesBetween(spark, path, 1, vCompact)) ===
      ids(b.union(c)))
    // checkpoint exactly at an append boundary: one commit's worth
    assert(ids(SnapshotLake.changesBetween(spark, path, 1, 2)) === ids(b))
    // fully caught up → empty, with the table's schema intact
    val none = SnapshotLake.changesBetween(spark, path, vCompact, vCompact)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("doc_id", "source", "n_chars"))
    // from the beginning == every append ever (deletes are snapshot
    // semantics, not changelog semantics — stated contract)
    assert(ids(SnapshotLake.changesBetween(spark, path, 0, vCompact)) ===
      ids(a.union(b).union(c)))
  }

  test("copy-on-write delete: current loses the rows, time travel still sees them") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    SnapshotLake.commitAppend(docs, path)
    val before = docs.count()
    val doomed = docs.filter(col("source") === "src1").count()
    assert(doomed > 0, "fixture needs src1-source docs")

    val v2 = SnapshotLake.commitDelete(spark, path, "source = 'src1'")
    assert(v2 === 2)
    val cur = SnapshotLake.read(spark, path)
    assert(cur.count() === before - doomed)
    assert(cur.filter(col("source") === "src1").count() === 0)
    // time travel: v1 still serves the pre-delete table in full
    val v1 = SnapshotLake.readAt(spark, path, 1)
    assert(v1.count() === before)
    assert(v1.filter(col("source") === "src1").count() === doomed)
  }

  test("delete rewrites only the files containing hits; clean files are shared by reference") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    // two commits → at least two file sets; delete targets only commit 1 rows
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    SnapshotLake.commitAppend(a, path)
    SnapshotLake.commitAppend(b, path)
    SnapshotLake.commitDelete(spark, path, "doc_id % 2 = 0 AND source = 'src1'")
    import scala.jdk.CollectionConverters._
    val v2Files = Files.readAllLines(Paths.get(path, "_snapshots", "v2.txt")).asScala.toSet
    val v3Files = Files.readAllLines(Paths.get(path, "_snapshots", "v3.txt")).asScala.toSet
    // every odd-commit (c2-*) file survives into v3 by reference
    // (commit dirs carry a writer-unique token since r10 multi-writer)
    val c2 = v2Files.filter(_.contains("/c2-"))
    assert(c2.nonEmpty && c2.subsetOf(v3Files))
  }

  test("additive schema evolution: new column reads as NULL from old files, time travel keeps the old schema") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    val v1df = docs
    SnapshotLake.commitAppend(v1df, path)
    val v2df = docs.withColumn("lang_guess", lit("en"))
    SnapshotLake.commitAppend(v2df, path)

    // current read carries the evolved schema; pre-evolution files
    // project the added column as NULL (schema from the manifest, not
    // from merging footers)
    val cur = SnapshotLake.read(spark, path)
    assert(cur.columns.toSeq === Seq("doc_id", "source", "n_chars", "lang_guess"))
    assert(cur.filter(col("lang_guess").isNull).count() === v1df.count())
    assert(cur.filter(col("lang_guess") === "en").count() === v2df.count())
    // time travel serves v1 under v1's OWN schema
    assert(SnapshotLake.readAt(spark, path, 1).columns.toSeq ===
      Seq("doc_id", "source", "n_chars"))

    // a delete after evolution preserves the evolved schema, including
    // on rewritten pre-evolution files
    val v3 = SnapshotLake.commitDelete(spark, path, "source = 'src1'")
    val afterDelete = SnapshotLake.readAt(spark, path, v3)
    assert(afterDelete.columns.toSeq === Seq("doc_id", "source", "n_chars", "lang_guess"))
    assert(afterDelete.filter(col("source") === "src1").count() === 0)

    // type changes are rejected as non-additive
    val bad = docs.withColumn("lang_guess", lit(7))
    val err = intercept[IllegalArgumentException](SnapshotLake.commitAppend(bad, path))
    assert(err.getMessage.contains("additive"))
  }

  test("compact bin-packs small files into a layout-only commit; rows and history survive") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    // five tiny commits → five+ small files, the streaming-sink shape
    (0 until 5).foreach(i =>
      SnapshotLake.commitAppend(docs.filter(col("doc_id") % 5 === i), path))
    val before = SnapshotLake.read(spark, path)
    val beforeRows = before.collect().map(_.toString).sorted.toSeq
    val beforeFiles = before.select(input_file_name()).distinct().count()

    val (newV, compacted, written) = SnapshotLake.compact(spark, path, 512 * 1024)
    assert(newV === 6, "compaction is a commit")
    assert(compacted >= 5 && written < compacted, s"$compacted files → $written")
    val after = SnapshotLake.read(spark, path)
    assert(after.collect().map(_.toString).sorted.toSeq === beforeRows,
      "compaction must not change a single row")
    assert(after.select(input_file_name()).distinct().count() < beforeFiles)
    // time travel still serves the pre-compaction layout
    assert(SnapshotLake.readAt(spark, path, 5).count() === beforeRows.length.toLong)
    // already-compacted table: no-op, version unchanged
    assert(SnapshotLake.compact(spark, path, 512 * 1024)._1 <= 7)
    // vacuum to 1 version reclaims the small originals, current intact
    val (_, deleted) = SnapshotLake.vacuum(path, keepVersions = 1)
    assert(deleted > 0, "originals reclaimed after expiry")
    assert(SnapshotLake.read(spark, path).count() === beforeRows.length.toLong)
  }

  test("streaming sink auto-compacts: commits per batch, layout commit fires, rows exact") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingPipelines.snapshotLakeStream(
      mem.toDF().toDF("doc_id", "source"), path,
      targetBytes = 512 * 1024, maxSmallFiles = 3)
      .option("checkpointLocation", Files.createTempDirectory("graft-ck").toString)
      .start()
    try {
      (0 until 6).foreach { b =>
        mem.addData((0L until 10L).map(i => (b * 10L + i, s"src$b")))
        q.processAllAvailable()
      }
      val v = SnapshotLake.currentVersion(path)
      assert(v > 6, s"6 appends + at least one compaction commit, got v$v")
      val rows = SnapshotLake.read(spark, path).collect()
      assert(rows.length === 60, "no loss, no duplication within the run")
      assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 60L).toSeq)
      // compaction actually consolidated: current layout has fewer files
      // than the 6+ the appends wrote
      assert(SnapshotLake.read(spark, path)
        .select(input_file_name()).distinct().count() < 6)
    } finally q.stop()
  }

  test("crash between lake commit and checkpoint: replay re-appends; key dedup restores the single-run table") {
    // The at-least-once composition the sink DOCUMENTS, actually run:
    // a batch's lake commit lands but the query dies before its
    // checkpoint commit marker is written → the restarted query
    // replays the batch and re-appends (at-least-once, visible as
    // duplicates), and the etl_key_dedup shape downstream (first
    // record per key) restores EXACT equality with a never-crashed
    // single-run table.
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    val ck = Files.createTempDirectory("graft-ck").toString
    val mem = MemoryStream[(Long, String)]
    def start() = graft.streaming.StreamingPipelines.snapshotLakeStream(
      mem.toDF().toDF("doc_id", "source"), path,
      targetBytes = 1L, maxSmallFiles = Int.MaxValue) // compaction off: pure appends
      .option("checkpointLocation", ck).start()

    val q1 = start()
    mem.addData((0L until 10L).map(i => (i, "b0")))
    q1.processAllAvailable()
    mem.addData((10L until 20L).map(i => (i, "b1")))
    q1.processAllAvailable()
    q1.stop()
    q1.awaitTermination()
    // Spark 4 guards a checkpoint dir against concurrent queries via
    // the active-query registry; wait until q1 is fully deregistered
    var spins = 0
    while (spark.streams.active.exists(_.id == q1.id) && spins < 200) {
      Thread.sleep(50); spins += 1
    }
    assert(SnapshotLake.read(spark, path).count() === 20L)

    // the crash window: batch 1's lake commit is durable, its
    // checkpoint commit marker is not — drop the marker
    val markers = new java.io.File(ck, "commits").listFiles()
      .filter(f => f.isFile && f.getName.forall(_.isDigit))
    assert(markers.nonEmpty)
    val last = markers.maxBy(_.getName.toInt)
    // Hadoop's ChecksumFileSystem pairs each marker with a hidden
    // .N.crc; a stale crc blocks the replayed batch's marker rewrite
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    assert(last.delete())

    val q2 = start()
    q2.processAllAvailable() // recovery replays batch 1 → re-append
    mem.addData((20L until 30L).map(i => (i, "b2")))
    q2.processAllAvailable()
    q2.stop()

    val raw = SnapshotLake.read(spark, path)
    assert(raw.count() === 40L,
      "the replayed batch must RE-append — at-least-once across restarts")

    // downstream key dedup (first record per key — etl_key_dedup's
    // contract) vs the single-run reference table
    val dedup = raw.groupBy(col("doc_id")).agg(min(col("source")).as("source"))
      .collect().map(_.toString).sorted.toSeq
    val refPath = Files.createTempDirectory("graft-snap-ref").toString + "/t"
    Seq("b0", "b1", "b2").zipWithIndex.foreach { case (src, b) =>
      SnapshotLake.commitAppend(
        (b * 10L until b * 10L + 10L).map(i => (i, src)).toDF("doc_id", "source"), refPath)
    }
    val ref = SnapshotLake.read(spark, refPath)
      .collect().map(_.toString).sorted.toSeq
    assert(dedup === ref,
      "key dedup after crash-replay must equal the never-crashed table exactly")
  }

  test("vacuum expires old snapshots and reclaims unreferenced files only") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    SnapshotLake.commitAppend(docs, path)
    val keepCount = docs.filter(col("source") =!= "src1").count()
    SnapshotLake.commitDelete(spark, path, "source = 'src1'")

    val (expired, deleted) = SnapshotLake.vacuum(path, keepVersions = 1)
    assert(expired === 1)
    assert(deleted > 0, "the rewritten-away originals should be reclaimed")
    // current version unharmed
    assert(SnapshotLake.read(spark, path).count() === keepCount)
    // the expired snapshot is gone (manifest deleted)
    assertThrows[IllegalArgumentException](SnapshotLake.readAt(spark, path, 1))
  }

  test("commit metadata is atomic with the manifest; legacy side-files still read") {
    val path = Files.createTempDirectory("graft-snap").toString + "/t"
    SnapshotLake.commitAppend(docs, path)
    SnapshotLake.commitDelete(spark, path, "source = 'src1'")
    val snaps = Paths.get(path, "_snapshots")
    // r11 contract: ONE file per version — type and schema ride the
    // manifest, so a crash between writes can never misclassify a
    // delete/compact as an append (the changesBetween torn-window bug)
    for (v <- 1 to 2) {
      assert(!Files.exists(snaps.resolve(s"t$v.txt")), "commit type written as a side file")
      assert(!Files.exists(snaps.resolve(s"s$v.json")), "schema written as a side file")
    }
    assert(SnapshotLake.commitTypeOf(path, 1) === "append")
    assert(SnapshotLake.commitTypeOf(path, 2) === "delete")
    assert(SnapshotLake.schemaOf(path, 2).exists(_.fieldNames.contains("doc_id")))

    // legacy tables (pre-header manifests + side files) keep reading
    val tdir = Files.createTempDirectory("graft-snap-legacy").toString + "/t"
    Files.createDirectories(Paths.get(tdir, "_snapshots"))
    Files.write(Paths.get(tdir, "_snapshots", "v1.txt"), "".getBytes)
    Files.write(Paths.get(tdir, "_snapshots", "t1.txt"), "compact".getBytes)
    assert(SnapshotLake.commitTypeOf(tdir, 1) === "compact")
  }
}
