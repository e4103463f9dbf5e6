package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-partitioned parquet lake layout — the landing zone an
  * events-to-warehouse pipeline writes at scale.
  *
  * Writing partitioned by a low-cardinality day column means readers
  * with a day predicate scan only the matching directories (partition
  * pruning happens at planning time, before any file I/O), and daily
  * reprocessing replaces one directory atomically (dynamic partition
  * overwrite) instead of rewriting the table.
  */
object PartitionedLake {

  /** Write `df` partitioned by the date of `tsCol`. */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("day")) // one shuffle → one file set per day
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)

  /** Read back one day — planner prunes to that partition directory. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)

  /** Compact one day's small files into `targetFiles` outputs. Small
    * files are the chronic lake disease (every micro-batch appends a
    * few, listing and scan overhead grow without bound); compaction
    * rewrites just the one directory via dynamic partition overwrite.
    * The eager localCheckpoint materializes the day's rows first —
    * Spark (correctly) refuses to overwrite a path it is still
    * reading, and a truncated-lineage scan no longer references it. */
  def compactDay(spark: SparkSession, path: String, day: String, targetFiles: Int): Unit =
    readDay(spark, path, day)
      .localCheckpoint(true)
      .repartition(targetFiles)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)

  /** Per-file zone map (min/max per column) for a parquet directory —
    * the Delta/Iceberg file-statistics manifest computed as ONE Spark
    * scan via `input_file_name()` grouping. At 100 TB the manifest is
    * |files|×|cols| rows (thousands), built once per compaction and
    * reused by every [[readPruned]] query. */
  def manifest(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Zone-map-pruned read: keep only files whose [min,max] box can
    * intersect `[lo, hi]` on `column`, then apply the exact filter.
    * With a Z-ordered layout EITHER clustered dimension prunes; with a
    * 1-D sort only the leading column does (LakeSpec demonstrates both
    * the equality contract and the file-skipping payoff). Returns
    * (result, filesRead, filesTotal). */
  def readPruned(spark: SparkSession, path: String, manifestDf: DataFrame,
      column: String, lo: Double, hi: Double): (DataFrame, Long, Long) = {
    val total = manifestDf.count()
    val keep = manifestDf
      .filter(col(s"min_$column").cast("double") <= hi &&
        col(s"max_$column").cast("double") >= lo)
      .select(col("file")).collect().map(_.getString(0))
    // basePath keeps the schema identical on both branches: leaf-file
    // reads recover any partition columns under `path` instead of
    // silently dropping them (a zero-file prune would otherwise return
    // a DIFFERENT schema than a one-file prune)
    val result =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(keep.toIndexedSeq: _*)
          .filter(col(column).cast("double") >= lo && col(column).cast("double") <= hi)
    (result, keep.length.toLong, total)
  }

  /** Per-file BLOOM manifest over a BIGINT key column — the file-skip
    * index for point lookups that zone maps cannot serve: on a
    * high-cardinality key with no sort order, every file's [min,max]
    * box spans the whole domain and [[readPruned]] keeps everything,
    * but each file only CONTAINS its own keys, which is exactly what a
    * Bloom filter captures (Iceberg/Delta ship the same idea as
    * per-file bloom columns in the stats manifest).
    *
    * One scan grouped by `input_file_name()` with the engine's
    * [[graft.functions.BloomFilterAgg]] per file — the manifest is
    * |files| rows × ~`optimalBits(expected)/8` bytes, built once per
    * compaction and reused by every point lookup. */
  def bloomManifest(spark: SparkSession, path: String, keyCol: String,
      expectedPerFile: Long = 100000, fpp: Double = 0.01): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(graft.functions.bloom_agg(col(keyCol), expectedPerFile, fpp).as("bloom"))

  /** Bloom-pruned point lookup: keep only files whose filter says the
    * key MIGHT be present (false ⇒ definitely absent — pruning can
    * never lose a row), then apply the exact predicate so false
    * positives die before the caller sees them. Returns
    * (result, filesRead, filesTotal).
    *
    * Staleness is checked loudly: a manifest built before a
    * [[deleteKeys]] both points at files the delete removed/renamed
    * AND knows nothing about the replacement parts — reading through
    * it can silently miss surviving rows, so a missing keep-file fails
    * with a rebuild instruction instead of a bare FileNotFound (or,
    * worse, a quietly wrong answer). */
  def readPrunedByKey(spark: SparkSession, path: String, bloomManifestDf: DataFrame,
      keyCol: String, key: Long): (DataFrame, Long, Long) = {
    val total = bloomManifestDf.count()
    val keep = bloomManifestDf
      .filter(graft.functions.bloom_might_contain(col("bloom"), lit(key)))
      .select(col("file")).collect().map(_.getString(0))
    val hconf = spark.sessionState.newHadoopConf()
    val missing = keep.filterNot { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).exists(p)
    }
    require(missing.isEmpty,
      s"readPrunedByKey: bloom manifest is STALE — ${missing.length} indexed file(s) no longer " +
        s"exist (first: ${missing.headOption.getOrElse("")}). A deleteKeys rewrote them; rebuild " +
        "the manifest from its returned rewrite list before reading through it.")
    val result =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(keep.toIndexedSeq: _*)
          .filter(col(keyCol) === key)
    (result, keep.length.toLong, total)
  }

  /** Outcome of a [[deleteKeys]]: how many files were rewritten out of
    * the manifest total, and the old→new file mapping (new = None when
    * every row of the old file was a victim) — exactly what a caller
    * needs to invalidate/rebuild the bloom manifest entries the delete
    * made stale. */
  final case class DeleteReport(filesRewritten: Long, filesTotal: Long,
      rewrites: Seq[(String, Option[String])])

  /** Targeted key delete (the right-to-be-forgotten / GDPR-erasure
    * primitive): physically rewrite ONLY the files that can contain
    * the keys — located with the Bloom manifest — and leave every
    * other file byte-untouched. Deleting one user from a 100-TB lake
    * this way rewrites a handful of files instead of the table (the
    * Delta/Iceberg DELETE + file-pruning behavior, done directly on
    * parquet).
    *
    * Per hit file: read → anti-filter → write to a scratch dir
    * (materializes before the original is removed) → swap into the
    * original's directory under a fresh part name. A file whose rows
    * are ALL deleted is removed without a replacement. Readers see the
    * directory listing, so the swap is safe for subsequent scans. The
    * Bloom manifest becomes STALE in both directions: its entries
    * point at removed files AND it knows nothing about the replacement
    * parts, so reading through it could miss surviving rows — the
    * returned [[DeleteReport.rewrites]] mapping is what a caller needs
    * to invalidate those entries and re-index the new parts
    * ([[readPrunedByKey]] refuses stale manifests loudly). */
  def deleteKeys(spark: SparkSession, path: String, bloomManifestDf: DataFrame,
      keyCol: String, keys: Seq[Long]): DeleteReport = {
    require(keys.nonEmpty, "deleteKeys: empty key set")
    val total = bloomManifestDf.count()
    val hits = bloomManifestDf
      .filter(keys.map(k => graft.functions.bloom_might_contain(col("bloom"), lit(k)))
        .reduce(_ || _))
      .select(col("file")).collect().map(_.getString(0))
    val rewrites = hits.toSeq.map { f =>
      val orig = java.nio.file.Paths.get(new java.net.URI(f))
      // scratch lives NEXT TO the target (same filesystem, so the swap
      // below is a true atomic-ish rename, never a cross-device copy);
      // the dot prefix hides it from Spark/Hadoop directory listings
      // while it exists, and it is removed after the swap
      val scratch = java.nio.file.Files.createTempDirectory(orig.getParent, ".graft-delete")
      try {
        val before = spark.read.parquet(f)
        // NULL keys are never victims: a bare !isin() is NULL (dropped)
        // for NULL-key rows, which would silently destroy them
        val kept = before.filter(col(keyCol).isNull || !col(keyCol).isin(keys: _*))
        val keptCount = kept.count()
        kept.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = scratch.toFile.listFiles().find(_.getName.endsWith(".parquet"))
        // replacement lands FIRST (fresh name, same dir), the original
        // goes second — a crash between the two duplicates survivors
        // (repairable) instead of losing them; a missing scratch part
        // with survivors expected fails loudly before anything is deleted
        require(part.isDefined || keptCount == 0L,
          s"deleteKeys: scratch write for $f produced no parquet part but $keptCount rows survive")
        val replacement = part.map { p =>
          val dest = orig.getParent.resolve(s"part-del-${java.util.UUID.randomUUID()}.parquet")
          java.nio.file.Files.move(p.toPath, dest)
          dest.toUri.toString
        }
        java.nio.file.Files.delete(orig)
        f -> replacement
      } finally {
        // best-effort scratch cleanup (write-side _SUCCESS/.crc residue)
        scratch.toFile.listFiles().foreach(_.delete())
        java.nio.file.Files.deleteIfExists(scratch)
      }
    }
    DeleteReport(hits.length.toLong, total, rewrites)
  }

  /** Z-ordered compaction: rewrite one day laid out along the Morton
    * key of two numeric dimensions (`OPTIMIZE ZORDER BY (a, b)`).
    * `repartitionByRange(zval)` gives each output file a contiguous
    * arc of the Z-curve and `sortWithinPartitions` orders rows inside
    * it, so every file's min/max box is tight in BOTH dimensions and a
    * predicate on EITHER dimension skips most files at scan time
    * (LakeSpec reads the boxes back and pins the pruning). The key is
    * layout-only — dropped before the write, so readers see the
    * original schema. */
  def compactDayZordered(spark: SparkSession, path: String, day: String,
      dimA: String, dimB: String, targetFiles: Int): Unit =
    ZOrder.withZKey(readDay(spark, path, day).localCheckpoint(true),
        col(dimA), col(dimB), "__zval")
      .repartitionByRange(targetFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)
}
