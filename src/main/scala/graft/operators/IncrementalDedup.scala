package graft.operators

import graft.functions.Exprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Incremental dedup: new documents against an EXISTING corpus index —
  * the production shape at scale, where the corpus is 100 TB and the
  * increment is a day's crawl. The corpus is never rescanned: its
  * index (content hashes + minhash band signatures) is built once,
  * persisted as parquet, and each increment joins against it.
  *
  *  - exact: content-hash anti-join (one broadcast/shuffle join on the
  *    increment's size, not the corpus's)
  *  - near: the increment's band signatures join the index's band
  *    table; band buckets bound candidates exactly like the batch
  *    minhash op
  */
object IncrementalDedup {

  final case class CorpusIndex(hashes: DataFrame, bands: DataFrame)

  private def withShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      graft.functions.word_shingles(col("text"), 3).as("shingles"))

  /** 4 band signatures per doc from 16 md5-derived min-hashes (same
    * family as DedupOps.minhash). */
  private def bandSignatures(shingled: DataFrame): DataFrame = {
    val sh = shingled.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .select(col("doc_id"), Exprs.md5Long(col("shingle")).as("sid"))
    val dict = sh.select(col("sid")).distinct()
      .select(col("sid"), transform(sequence(lit(0), lit(15)),
        seed => Exprs.md5Long(concat(col("sid").cast(StringType), lit("#"), seed.cast(StringType)))).as("hs"))
    val minCols = (0 until 16).map(i => min(element_at(col("hs"), i + 1)).as(s"m$i"))
    val sigs = sh.join(dict, "sid").groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bandSig = (0 until 4).map(b =>
      concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}").cast(StringType)): _*))
    sigs.select(col("doc_id"), posexplode(array(bandSig: _*))).toDF("doc_id", "band", "sig")
  }

  /** Build (or rebuild) the corpus index. Persist both frames as
    * parquet in production; they are tiny relative to the corpus. */
  def buildIndex(corpus: DataFrame): CorpusIndex = {
    val shingled = withShingles(corpus)
    CorpusIndex(
      hashes = corpus.select(col("doc_id"), md5(col("text")).as("content_hash")),
      bands = bandSignatures(shingled))
  }

  final case class Result(clean: DataFrame, exactDups: DataFrame, nearDupCandidates: DataFrame)

  /** Split an increment into clean docs, exact duplicates of the
    * corpus, and near-dup candidates (band collisions; verify with
    * exact Jaccard downstream if the band precision isn't enough). */
  def dedupIncrement(increment: DataFrame, index: CorpusIndex): Result = {
    val incHashed = increment.withColumn("content_hash", md5(col("text")))
    val exactDups = incHashed
      .join(index.hashes.select(col("content_hash"), col("doc_id").as("corpus_doc")), "content_hash")
      .select(col("doc_id"), col("corpus_doc"), col("content_hash"))
    val incBands = bandSignatures(withShingles(increment))
    val nearCand = incBands.as("inc")
      .join(index.bands.as("idx"), col("inc.band") === col("idx.band") && col("inc.sig") === col("idx.sig"))
      .select(col("inc.doc_id").as("doc_id"), col("idx.doc_id").as("corpus_doc"))
      .distinct()
    val dupIds = exactDups.select(col("doc_id"))
      .union(nearCand.select(col("doc_id"))).distinct()
    Result(
      clean = increment.join(dupIds, Seq("doc_id"), "left_anti"),
      exactDups = exactDups,
      nearDupCandidates = nearCand)
  }
}
