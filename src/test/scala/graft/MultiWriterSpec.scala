package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sinks.SnapshotLake
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic multi-writer commits on the snapshot lake — the
  * Delta/Iceberg concurrency story: every committer plans against the
  * snapshot it read, publishes its manifest with CREATE_NEW, and on
  * losing the publish race re-reads the new current snapshot,
  * re-validates its plan, and re-publishes. No lock server, no lost
  * updates. */
class MultiWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("8 concurrent appenders all commit; no version clash, no lost rows") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-mw").toString + "/t"
    val writers = (0 until 8).map { w =>
      new Thread(() => {
        val df = (w * 100L until w * 100L + 100L).map(i => (i, s"w$w")).toDF("id", "src")
        SnapshotLake.commitAppend(df, path)
      })
    }
    writers.foreach(_.start())
    writers.foreach(_.join())
    assert(SnapshotLake.currentVersion(path) === 8,
      "every writer must land exactly one commit")
    val got = SnapshotLake.read(spark, path).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0L until 800L).toSeq, "a lost update dropped rows")
  }

  test("delete retries after losing the publish race and re-plans against the new snapshot") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-mw").toString + "/t"
    SnapshotLake.commitAppend(
      (0L until 100L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "src"), path)
    // simulate a concurrent committer winning version 2: plant its
    // manifest (same file list) BEFORE the delete publishes — the
    // delete's first CREATE_NEW fails, the retry re-plans against v2
    val v1Files = new String(Files.readAllBytes(
      Paths.get(path, "_snapshots", "v1.txt")), "UTF-8")
    Files.write(Paths.get(path, "_snapshots", "v2.txt"),
      v1Files.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    val v = SnapshotLake.commitDelete(spark, path, "src = 'odd'")
    assert(v === 3, s"delete must retry past the planted v2, got v$v")
    val rows = SnapshotLake.read(spark, path).collect()
    assert(rows.length === 50 && rows.forall(_.getString(1) == "even"))
  }

  test("compact retries after losing the publish race; rows unchanged") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-mw").toString + "/t"
    (0 until 4).foreach(b =>
      SnapshotLake.commitAppend(
        (b * 10L until b * 10L + 10L).map(i => (i, s"b$b")).toDF("id", "src"), path))
    val v4Files = new String(Files.readAllBytes(
      Paths.get(path, "_snapshots", "v4.txt")), "UTF-8")
    Files.write(Paths.get(path, "_snapshots", "v5.txt"),
      v4Files.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    val (v, compacted, written) = SnapshotLake.compact(spark, path, 512 * 1024)
    assert(v === 6, s"compact must retry past the planted v5, got v$v")
    assert(compacted >= 4 && written < compacted)
    val got = SnapshotLake.read(spark, path).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0L until 40L).toSeq)
  }
}
