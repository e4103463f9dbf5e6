package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Snapshot-versioned parquet table — Iceberg-shaped time travel on a
  * plain directory (reference row §2h lake sinks; the public snapshot
  * model: every commit writes IMMUTABLE data files plus a manifest
  * listing exactly the files of that version).
  *
  * Layout:
  * {{{
  *   <path>/data/c<N>/part-*.parquet   — files written by commit N (never mutated)
  *   <path>/_snapshots/v<N>.txt        — one data-file path per line
  * }}}
  *
  * Readers plan from a manifest, never from directory listing, so a
  * read of version N is repeatable while later commits land
  * (snapshot isolation), `readAt(path, olderVersion)` is time travel,
  * and deletes are copy-on-write: the new snapshot swaps rewritten
  * files in while the old snapshot keeps referencing the originals —
  * storage is reclaimed only by an explicit [[vacuum]], exactly the
  * expire-snapshots/remove-orphans split a 100-TB lake needs (instant
  * rollback window vs storage cost is a RETENTION decision, not a
  * side effect of deleting).
  */
object SnapshotLake {

  private def snapDir(path: String): Path = Paths.get(path, "_snapshots")

  /** Latest committed version, 0 when the table doesn't exist yet. */
  def currentVersion(path: String): Int = {
    val d = snapDir(path)
    if (!Files.isDirectory(d)) 0
    else Using.resource(Files.list(d)) { s =>
      s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
          n.stripPrefix("v").stripSuffix(".txt").toInt }
        .maxOption.getOrElse(0)
    }
  }

  private def filesOf(path: String, version: Int): Seq[String] = {
    val f = snapDir(path).resolve(s"v$version.txt")
    require(Files.exists(f), s"snapshot v$version does not exist under $path")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Publishes a manifest with CREATE_NEW so a concurrent committer that
    * raced to the same version FAILS (FileAlreadyExistsException) instead
    * of silently overwriting the earlier manifest — the loser re-reads
    * currentVersion and retries on top of the winner's snapshot. */
  private def writeSnapshot(path: String, version: Int, files: Seq[String]): Unit = {
    Files.createDirectories(snapDir(path))
    Files.write(snapDir(path).resolve(s"v$version.txt"),
      files.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
  }

  private def listParquet(dir: Path): Seq[String] =
    Using.resource(Files.walk(dir)) { s =>
      s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq
    }

  /** Append `df` as a new commit; returns the new version. The commit's
    * files land in their own `data/c<N>/` directory (unique names by
    * construction — no clash with any other commit's files). */
  def commitAppend(df: DataFrame, path: String): Int = {
    var attempt = 0
    var committed = -1
    while (committed < 0) {
      val v = currentVersion(path) + 1
      // Suffix the data dir with the attempt so a retry after losing the
      // manifest race never collides with its own orphaned first write
      // (unreferenced dirs are reclaimed by vacuum).
      val commitDir = Paths.get(path, "data", if (attempt == 0) s"c$v" else s"c$v-r$attempt")
      df.write.mode("errorifexists").parquet(commitDir.toString)
      val prev = if (v == 1) Seq.empty else filesOf(path, v - 1)
      try { writeSnapshot(path, v, prev ++ listParquet(commitDir)); committed = v }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          require(attempt < 16, s"lost the commit race $attempt times under $path")
      }
    }
    committed
  }

  /** Copy-on-write delete: rewrite only the files that CONTAIN matching
    * rows (planned via one pruning scan over the current snapshot, the
    * per-file-Bloom discipline of PartitionedLake.deleteKeys), keep
    * every clean file by reference. Old versions still see the deleted
    * rows — that is the feature, not a leak. Returns the new version.
    *
    * Deletes assume a single writer: a concurrent commit that takes the
    * version first makes this call FAIL (CREATE_NEW manifest publish)
    * rather than silently dropping either commit — re-run the delete
    * against the new current snapshot. */
  def commitDelete(spark: SparkSession, path: String, predicate: String): Int = {
    val v = currentVersion(path)
    require(v > 0, s"no snapshot to delete from under $path")
    val cur = filesOf(path, v)
    val hit = spark.read.parquet(cur: _*)
      .filter(expr(predicate))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet // ≤|files| driver rows
    // input_file_name returns URIs (file://...); map back to the
    // snapshot's plain paths by suffix match
    val hitPlain = cur.filter(p => hit.exists(_.endsWith(p)))
    val newV = v + 1
    val keep = cur.filterNot(hitPlain.contains)
    val rewritten =
      if (hitPlain.isEmpty) Seq.empty
      else {
        val commitDir = Paths.get(path, "data", s"c$newV")
        spark.read.parquet(hitPlain: _*)
          .filter(not(expr(predicate)))
          .write.mode("errorifexists").parquet(commitDir.toString)
        listParquet(commitDir)
      }
    writeSnapshot(path, newV, keep ++ rewritten)
    newV
  }

  /** Read the table exactly as of `version`. */
  def readAt(spark: SparkSession, path: String, version: Int): DataFrame = {
    val fs = filesOf(path, version)
    if (fs.isEmpty) spark.emptyDataFrame else spark.read.parquet(fs: _*)
  }

  /** Read the latest version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readAt(spark, path, currentVersion(path))

  /** Expire snapshots older than the newest `keepVersions` and delete
    * every data file no retained snapshot references. Returns
    * (snapshotsExpired, filesDeleted). */
  def vacuum(path: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, "must retain at least the current snapshot")
    val v = currentVersion(path)
    val keepVs = ((v - keepVersions + 1) max 1) to v
    val referenced = keepVs.flatMap(filesOf(path, _)).toSet
    val expired = (1 until keepVs.start).toList
    expired.foreach(e => Files.deleteIfExists(snapDir(path).resolve(s"v$e.txt")))
    val dataDir = Paths.get(path, "data")
    val orphans =
      if (!Files.isDirectory(dataDir)) Seq.empty
      else listParquet(dataDir).filterNot(referenced.contains)
    orphans.foreach(p => Files.deleteIfExists(Paths.get(p)))
    (expired.size, orphans.size)
  }
}
