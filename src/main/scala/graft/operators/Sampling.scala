package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sampling for training-data pipelines: seeded uniform and stratified
  * samples. Bernoulli sampling is partition-local (no shuffle, no
  * collect) and deterministic for a fixed seed + input layout, which is
  * what reproducible dataset curation needs. Spark's RNG stream is not
  * reproducible in the oracle engine → rows-only + SamplingSpec
  * (determinism, fraction bounds, per-stratum bounds).
  */
object Sampling {

  val uniform: GraftOp = GraftOp.rowsOnly("sample_uniform") { (s, d) =>
    Tables.events(s, d)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Per-language stratified sample: downsample the dominant stratum,
    * keep the rest (the rebalancing move behind most corpus mixes). */
  val stratified: GraftOp = GraftOp.rowsOnly("sample_stratified") { (s, d) =>
    val fractions = Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0)
    Tables.documents(s, d)
      .stat.sampleBy("lang", fractions, 42L)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic hash-based sampling: keep a row iff a portable hash
    * of its key lands under the rate threshold. Unlike RNG Bernoulli
    * sampling this is reproducible ACROSS engines and runs (same rows
    * at any parallelism, append-stable as the corpus grows — the
    * property dataset curation actually wants), so it's fully
    * oracle-checkable. Partition-local, no shuffle. */
  val hashSample: GraftOp = GraftOp(
    "sample_hash",
    s"""SELECT event_id, user_id, event_type FROM events
       |WHERE ${graft.functions.Exprs.sqlMd5Long("CAST(event_id AS VARCHAR)")} % 100 < 10
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(graft.functions.Exprs.md5Long(
        col("event_id").cast(org.apache.spark.sql.types.StringType)) % 100 < 10)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  val ops: Seq[GraftOp] = Seq(uniform, stratified, hashSample)
}
