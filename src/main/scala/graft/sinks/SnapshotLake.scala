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

  /** Writer-unique commit-directory token: two OPTIMISTIC committers
    * racing for the same version must never collide on the DATA
    * directory either (a shared `c<N>` dir made the loser die in the
    * parquet write, before the manifest race even ran). The token is
    * naming-only — manifests record the actual file paths, so results
    * never depend on it; losers' orphaned dirs are vacuum-reclaimed. */
  private val writerSeq = new java.util.concurrent.atomic.AtomicLong()
  private val writerTag =
    java.lang.Long.toHexString(java.util.concurrent.ThreadLocalRandom.current().nextLong())
  private def commitToken(): String = s"$writerTag-${writerSeq.incrementAndGet()}"

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

  /** Schema committed with `version` (Iceberg-style: schema rides the
    * snapshot metadata, so readers NEVER merge parquet footers — and a
    * column added in commit N reads as NULL from pre-N files via plain
    * schema projection). Absent for tables written before schema
    * tracking; readers then fall back to a mergeSchema read. */
  def schemaOf(path: String, version: Int): Option[org.apache.spark.sql.types.StructType] =
    manifestHeader(path, version, "schema")
      .orElse { // legacy layout: schema in a separate s<N>.json file
        val f = snapDir(path).resolve(s"s$version.json")
        if (!Files.exists(f)) None
        else Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      }
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** `#key=value` header from a version's manifest (None when the
    * manifest predates headers or doesn't exist). */
  private def manifestHeader(path: String, version: Int, key: String): Option[String] = {
    val f = snapDir(path).resolve(s"v$version.txt")
    if (!Files.exists(f)) None
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .find(_.startsWith(s"#$key="))
      .map(_.substring(key.length + 2))
  }

  /** Additive schema evolution: prior fields keep their position and
    * type (same-name re-adds must type-match — evolving a column's
    * TYPE is rewrite territory, not metadata); new fields append. */
  private def mergedSchema(prior: Option[org.apache.spark.sql.types.StructType],
      next: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    prior match {
      case None => next
      case Some(p) =>
        next.fields.foreach { f =>
          p.fields.find(_.name == f.name).foreach { old =>
            require(old.dataType == f.dataType,
              s"schema evolution is additive: column ${f.name} cannot change " +
                s"${old.dataType.simpleString} -> ${f.dataType.simpleString}")
          }
        }
        org.apache.spark.sql.types.StructType(
          p.fields ++ next.fields.filterNot(f => p.fieldNames.contains(f.name)))
    }

  private def filesOf(path: String, version: Int): Seq[String] = {
    val f = snapDir(path).resolve(s"v$version.txt")
    require(Files.exists(f), s"snapshot v$version does not exist under $path")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#")) // '#' lines = commit metadata
  }

  /** Publishes a manifest with CREATE_NEW so a concurrent committer that
    * raced to the same version FAILS (FileAlreadyExistsException) instead
    * of silently overwriting the earlier manifest — the loser re-reads
    * currentVersion and retries on top of the winner's snapshot.
    *
    * The manifest carries the commit TYPE and SCHEMA as `#key=value`
    * header lines (r11): one file, one atomic CREATE_NEW — a crash can
    * no longer leave a committed version whose type/schema files are
    * missing (the old three-write sequence misclassified a torn
    * delete/compact as an append in [[changesBetween]]). Tables
    * written by older builds still read through the legacy
    * s<N>.json / t<N>.txt fallbacks. */
  private def writeSnapshot(path: String, version: Int, files: Seq[String],
      commitType: String, schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    Files.createDirectories(snapDir(path))
    val header = s"#type=$commitType" +: schema.toSeq.map(sc => s"#schema=${sc.json}")
    Files.write(snapDir(path).resolve(s"v$version.txt"),
      (header ++ files.sorted).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
  }

  // Commit type rides the manifest header: appends ADD rows;
  // delete/compact commits only remove or repack existing ones. The
  // incremental reader needs the distinction — a compaction's rewrite
  // files would otherwise read as "new rows". Tables written before
  // type tracking read as all-append (their only writer was
  // commitAppend then).

  /** Commit type of `version`: "append", "delete", or "compact". */
  def commitTypeOf(path: String, version: Int): String =
    manifestHeader(path, version, "type").getOrElse {
      val f = snapDir(path).resolve(s"t$version.txt") // legacy layout
      if (!Files.exists(f)) "append"
      else new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim
    }

  /** Incremental read (CDC-style consumption): exactly the rows
    * APPENDED by commits in (fromVersion, toVersion] — "give me what's
    * new since my last checkpoint" for a downstream incremental job,
    * planned purely from manifests with no table diff. Sound because
    * data files are immutable and an append commit only ADDS files:
    * the appended rows ARE the file-set difference vs the previous
    * snapshot. Delete and compaction commits contribute nothing (their
    * rewrite files carry pre-existing rows); a consumer that must see
    * deletions diffs [[readAt]] snapshots instead — stated contract,
    * matching the append-only changelog every streaming source here
    * produces. Both endpoint manifests (and each append's predecessor)
    * must still be retained — [[vacuum]] bounds how far back a
    * checkpoint may lag. */
  def changesBetween(spark: SparkSession, path: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion >= 0 && fromVersion <= toVersion,
      s"need 0 <= from <= to, got ($fromVersion, $toVersion]")
    require(toVersion <= currentVersion(path),
      s"snapshot v$toVersion does not exist under $path")
    val newFiles = ((fromVersion + 1) to toVersion).flatMap { w =>
      if (commitTypeOf(path, w) != "append") Seq.empty
      else {
        val prev = if (w == 1) Set.empty[String] else filesOf(path, w - 1).toSet
        filesOf(path, w).filterNot(prev)
      }
    }
    val schema = schemaOf(path, toVersion)
    if (newFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.getOrElse(org.apache.spark.sql.types.StructType(Nil)))
    else schema match {
      case Some(sc) => spark.read.schema(sc).parquet(newFiles: _*)
      case None => spark.read.option("mergeSchema", "true").parquet(newFiles: _*)
    }
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
      val commitDir = Paths.get(path, "data", s"c$v-${commitToken()}")
      df.write.mode("errorifexists").parquet(commitDir.toString)
      val prev = if (v == 1) Seq.empty else filesOf(path, v - 1)
      val schema = mergedSchema(
        if (v == 1) None else schemaOf(path, v - 1), df.schema)
      try {
        // one atomic manifest write carries files + type + schema
        writeSnapshot(path, v, prev ++ listParquet(commitDir), "append", Some(schema))
        committed = v
      }
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
    * Multi-writer safe (r10): the delete is OPTIMISTIC — planned
    * against the current snapshot, published with CREATE_NEW; losing
    * the publish race to a concurrent committer triggers a full
    * re-validate-and-retry (re-read the NEW current snapshot, re-plan
    * which files contain hits, re-rewrite, re-publish). Predicate
    * deletes commute to the serial schedule "other commit first, then
    * delete", so the retry is semantically the conflict resolution —
    * the Delta/Iceberg optimistic-concurrency story. */
  def commitDelete(spark: SparkSession, path: String, predicate: String): Int = {
    var attempt = 0
    var committed = -1
    while (committed < 0) {
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
          // attempt-suffixed like commitAppend: a retry never collides
          // with its own orphaned first write (vacuum reclaims those)
          val commitDir = Paths.get(path, "data", s"c$newV-${commitToken()}")
          // rewrite under the SNAPSHOT schema: hit files from before an
          // added column would otherwise lose it to a single-footer read
          val rd = schemaOf(path, v) match {
            case Some(sc) => spark.read.schema(sc)
            case None => spark.read.option("mergeSchema", "true")
          }
          rd.parquet(hitPlain: _*)
            .filter(not(expr(predicate)))
            .write.mode("errorifexists").parquet(commitDir.toString)
          listParquet(commitDir)
        }
      try {
        // delete never evolves the schema: carry v's forward
        writeSnapshot(path, newV, keep ++ rewritten, "delete", schemaOf(path, v))
        committed = newV
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          require(attempt < 16, s"lost the delete-commit race $attempt times under $path")
      }
    }
    committed
  }

  /** Read the table exactly as of `version`, under that version's
    * committed schema: files from before an added column project it
    * as NULL (plain parquet schema projection — no footer merging). */
  def readAt(spark: SparkSession, path: String, version: Int): DataFrame = {
    val fs = filesOf(path, version)
    if (fs.isEmpty) spark.emptyDataFrame
    else schemaOf(path, version) match {
      case Some(sc) => spark.read.schema(sc).parquet(fs: _*)
      case None => spark.read.option("mergeSchema", "true").parquet(fs: _*)
    }
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
    expired.foreach { e =>
      Files.deleteIfExists(snapDir(path).resolve(s"v$e.txt"))
      Files.deleteIfExists(snapDir(path).resolve(s"s$e.json"))
      Files.deleteIfExists(snapDir(path).resolve(s"t$e.txt"))
    }
    val dataDir = Paths.get(path, "data")
    val orphans =
      if (!Files.isDirectory(dataDir)) Seq.empty
      else listParquet(dataDir).filterNot(referenced.contains)
    orphans.foreach(p => Files.deleteIfExists(Paths.get(p)))
    (expired.size, orphans.size)
  }

  /** Number of current-snapshot files below `targetBytes` — the
    * compaction-trigger input a streaming sink polls per batch. */
  def smallFileCount(path: String, targetBytes: Long): Int = {
    val v = currentVersion(path)
    if (v == 0) 0
    else filesOf(path, v).count(f => Files.size(Paths.get(f)) < targetBytes)
  }

  /** Small-file compaction: bin-pack every data file under
    * `targetBytes` into ~target-sized rewrites (greedy first-fit-
    * decreasing — deterministic), publish the result as a NEW snapshot
    * that keeps each already-large file by reference. Rows are
    * untouched (the spec pins an order-independent checksum across the
    * compaction), old versions still reference the small originals
    * until [[vacuum]] expires them — compaction is a LAYOUT commit,
    * not a data change. This is the build-once/serve-many maintenance
    * half of the lake story: streaming/micro-batch sinks produce many
    * tiny files, and at 100 TB an uncompacted table pays per-file
    * open cost on every scan. Multi-writer safe like [[commitDelete]]
    * (r10): optimistic CREATE_NEW publish with re-plan-and-retry on a
    * lost race — a layout commit trivially commutes with any other
    * commit, the retry just re-packs the NEW current file list.
    * Returns (newVersion, filesCompacted, filesWritten); a no-op
    * (≤1 small file) returns the current version unchanged. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    var attempt = 0
    while (true) {
      val v = currentVersion(path)
      require(v > 0, s"no snapshot to compact under $path")
      val cur = filesOf(path, v)
      val sized = cur.map(f => f -> Files.size(Paths.get(f)))
      val (small, big) = sized.partition(_._2 < targetBytes)
      if (small.size <= 1) return (v, 0, 0)
      // first-fit-decreasing: stable order (size desc, path asc) → the
      // same inputs always pack into the same bins
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, List[String])]
      small.sortBy { case (f, sz) => (-sz, f) }.foreach { case (f, sz) =>
        bins.indexWhere(_._1 + sz <= targetBytes) match {
          case -1 => bins += ((sz, List(f)))
          case i => val (load, fs) = bins(i); bins(i) = (load + sz, f :: fs)
        }
      }
      val newV = v + 1
      val commitDir = Paths.get(path, "data", s"c$newV-${commitToken()}")
      val rd = schemaOf(path, v) match {
        case Some(sc) => spark.read.schema(sc)
        case None => spark.read.option("mergeSchema", "true")
      }
      bins.zipWithIndex.foreach { case ((_, fs), i) =>
        rd.parquet(fs: _*).coalesce(1)
          .write.mode("errorifexists").parquet(commitDir.resolve(s"b$i").toString)
      }
      try {
        // layout-only commit: files repack, schema carries forward
        writeSnapshot(path, newV, big.map(_._1) ++ listParquet(commitDir),
          "compact", schemaOf(path, v))
        return (newV, small.size, bins.size)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          require(attempt < 16, s"lost the compact-commit race $attempt times under $path")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
