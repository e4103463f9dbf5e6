package graft.operators

import org.apache.spark.sql.SparkSession

/** Disk persistence for EVERY session-shared index in
  * [[SharedIndexes]] — the [[DedupIndexStore]]/[[IvfIndex]] save/load
  * discipline extended to the whole registry (exact-k-means cells, PQ
  * codes, basket pairs, trade edges), so the offline build phase
  * (`dedup_candidate_index`) serves WARM from disk on a fresh session
  * instead of re-deriving every frame. At 100 TB this is the
  * difference between an index build being a scheduled offline job and
  * a tax every analysis session re-pays: the artifact survives the
  * session, exactly like a production ANN/dedup index ships.
  *
  * Layout: one directory per (format version, source dir) under
  * `spark.graft.index.store.dir` (default: java.io.tmpdir/
  * graft-index-store). A `_complete.txt` marker is written LAST and
  * carries the source dir plus a fingerprint of the source parquet
  * files (name, length, mtime per part-file): a regenerated corpus at
  * the same path — or a half-written store — never serves. Loading
  * registers each parquet artifact in [[graft.CachedPlans]] under the
  * SAME key its builder uses, so every consumer serves the loaded
  * frame transparently; the per-family build counters
  * (DedupOps.buildCount, IvfIndex.fitCount, EmbedOps.lloydRuns/
  * pqBuilds, GraphOps.edgeBuilds, AffinityOps.pairBuilds) stay
  * untouched on the serve path — IndexStoreSpec pins that.
  *
  * Disable with `spark.graft.index.store.enabled=false` (the build
  * then stays session-local, the pre-r10 behavior).
  */
object IndexStore {

  /** Bump whenever ANY shared-index definition changes: a saved
    * artifact from an older definition must never serve. */
  val FormatVersion = 1

  private[graft] def enabled(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.index.store.enabled").forall(_.trim.toBoolean)

  private def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.index.store.dir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-index-store")

  private def md5hex(v: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def dirFor(s: SparkSession, d: String): String = {
    val safe = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${root(s)}/v$FormatVersion-$safe-${md5hex(d).take(8)}"
  }

  /** Cheap content fingerprint of the source tables the indexes derive
    * from — (file name, length, mtime) per part-file. Catches corpus
    * regeneration at the same path without reading any data. */
  private def fingerprint(d: String): String = {
    val tables = Seq("documents.parquet", "embeddings.parquet", "lineitem.parquet",
      "orders.parquet", "supplier.parquet", "customer.parquet", "nation.parquet")
    val parts = tables.flatMap { t =>
      val f = new java.io.File(d, t)
      val files = if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq else Seq(f)
      files.filter(_.isFile).map(x => s"$t/${x.getName}:${x.length}:${x.lastModified}")
    }
    md5hex(parts.mkString("\n"))
  }

  private def markerPath(dir: String) = java.nio.file.Paths.get(dir, "_complete.txt")

  private def markerContent(d: String): String = s"$d\n${fingerprint(d)}"

  /** A finished, source-matching store exists for this corpus. */
  private[graft] def isComplete(s: SparkSession, d: String): Boolean = {
    val p = markerPath(dirFor(s, d))
    java.nio.file.Files.exists(p) &&
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8") == markerContent(d)
  }

  /** (artifact name, registry key) for the frames stored as plain
    * parquet — the families with driver-side state (dedup, IVF,
    * exact k-means) delegate to their own save/load below. */
  private def plainEntries(d: String): Seq[(String, String)] = Seq(
    ("trade_edges", s"graph.tradeEdges:$d"),
    ("und_edges", s"graph.undTradeEdges:$d"),
    ("basket_pairs", s"affinity.pairs:$d"),
    ("pq_codes", s"emb.pqCodes:$d"))

  private val saveLock = new Object

  /** Build (or reuse) every shared index and write the store; the
    * marker lands last so a crashed writer leaves an incomplete (and
    * therefore ignored) directory. */
  private[graft] def saveAll(s: SparkSession, d: String): Unit = saveLock.synchronized {
    if (isComplete(s, d)) return
    val dir = dirFor(s, d)
    GraphOps.tradeEdges(s, d).write.mode("overwrite").parquet(s"$dir/trade_edges")
    GraphOps.undirectedTradeEdges(s, d).write.mode("overwrite").parquet(s"$dir/und_edges")
    AffinityOps.basketPairs(s, d).write.mode("overwrite").parquet(s"$dir/basket_pairs")
    EmbedOps.pqCodes(s, d).write.mode("overwrite").parquet(s"$dir/pq_codes")
    DedupIndexStore.save(s, d, dir)
    IvfIndex.save(s, d, s"$dir/ivf")
    EmbedOps.kmSave(s, d, dir)
    java.nio.file.Files.write(markerPath(dir),
      markerContent(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Swap every saved artifact into this session's plan registry —
    * consumers serve from disk with zero rebuilds. Caller must have
    * checked [[isComplete]]. */
  private[graft] def loadAll(s: SparkSession, d: String): Unit = {
    val dir = dirFor(s, d)
    plainEntries(d).foreach { case (name, key) =>
      graft.CachedPlans.invalidate(s, key)
      graft.CachedPlans.cached(s, key)(s.read.parquet(s"$dir/$name"))
    }
    DedupIndexStore.load(s, d, dir)
    IvfIndex.load(s, d, s"$dir/ivf")
    EmbedOps.kmLoad(s, d, dir)
  }

  /** Drop every shared index from this session's registries — the
    * fresh-session half of the save→wipe→load spec. */
  private[graft] def wipeSession(s: SparkSession, d: String): Unit = {
    plainEntries(d).foreach { case (_, key) => graft.CachedPlans.invalidate(s, key) }
    DedupIndexStore.wipeSession(s, d)
    IvfIndex.rebuild(s, d)
    EmbedOps.kmWipe(s, d)
  }
}
