package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk persistence for the text-side session-shared dedup indexes —
  * the IvfIndex save/load discipline applied to the shingle family:
  * at 100 TB the candidate-index build (shingle → hash → rare-block →
  * band-join → exact verify → contract) is the expensive offline
  * phase, and the build-once/serve-many split only means something if
  * the built artifact SURVIVES a session restart. `save` materializes
  * every index to parquet; `load` swaps the parquet reads into the
  * session registry under the same keys, so every consumer
  * (dedup_ngram / dedup_minhash / dedup_clusters / dedup_simhash /
  * dedup_representative / pipeline_clean) serves with ZERO rebuilds —
  * DedupOps.buildCount pins that in DedupIndexPersistSpec.
  *
  * The store is per source dir: loading indexes built from a different
  * corpus is the caller's error, recorded in `_source.txt` for
  * diagnosis.
  */
object DedupIndexStore {

  /** (artifact name, registry key, builder) per persisted index. */
  private def entries(s: SparkSession, d: String): Seq[(String, String, () => DataFrame)] = Seq(
    ("shingled", s"dedup.shingled:$d", () => DedupOps.shingledDocs(s, d)),
    ("hashed_index", s"dedup.hashedIndex:$d", () => DedupOps.hashedIndex(s, d)),
    ("rare_sids", s"dedup.rareSids:$d", () => DedupOps.rareSids(s, d)),
    ("rare_index", s"dedup.rareIndex:$d", () => DedupOps.rareIndex(s, d)),
    ("minhash_pairs", s"dedup.minhashPairs:$d", () => DedupOps.minhashPairs(s, d)),
    ("minhash_sigs", s"dedup.minhashSigs:$d", () => DedupOps.corpusSigs(s, d)), // r15
    ("ngram_pairs", s"dedup.ngramPairs:$d", () => DedupOps.ngramPairs(s, d)), // r15

    ("cluster_labels", s"dedup.clusterLabels:$d", () => DedupOps.clusterLabels(s, d)),
    ("simhash_docs", s"dedup.simhashDocs:$d", () => DedupOps.simhashDocs(s, d)))

  /** Build (or reuse the session's already-built) indexes and write
    * each to `indexDir/<name>`. */
  def save(s: SparkSession, d: String, indexDir: String): Unit = {
    entries(s, d).foreach { case (name, _, build) =>
      build().write.mode("overwrite").parquet(s"$indexDir/$name")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$indexDir/_source.txt"),
      d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Replace this session's registry entries with the saved parquet
    * artifacts — consumers serve from disk with zero rebuilds. */
  def load(s: SparkSession, d: String, indexDir: String): Unit =
    entries(s, d).foreach { case (name, key, _) =>
      require(new java.io.File(s"$indexDir/$name").isDirectory,
        s"no saved index '$name' under $indexDir")
      graft.CachedPlans.invalidate(s, key)
      graft.CachedPlans.cached(s, key)(s.read.parquet(s"$indexDir/$name"))
    }

  /** Drop every text-side index from the session registry (the
    * "fresh session" half of the save→wipe→load spec). */
  def wipeSession(s: SparkSession, d: String): Unit =
    entries(s, d).foreach { case (_, key, _) => graft.CachedPlans.invalidate(s, key) }
}
