package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs, built entirely from the oracle-green
  * primitives: quality scoring + language ID (TextOps) → exact dedup
  * (content-hash canonical) → near-dup removal (minhash clusters,
  * keep the minimum-id member of each duplicate group).
  *
  * One op, four stages, zero driver round-trips beyond the bounded
  * cluster-propagation loop; every stage is the same plan shape the
  * standalone op uses, so this is also a regression net for how the
  * primitives compose.
  */
object CleanPipeline {

  val clean: GraftOp = GraftOp(
    "pipeline_clean",
    s"""WITH RECURSIVE ${DedupOps.sqlMinhashVerified},
       |${DedupOps.sqlClusterWalk},
       |noncanon AS (SELECT doc FROM walk GROUP BY doc HAVING min(label) <> doc),
       |q AS (
       |  SELECT d.doc_id, d.lang, d.n_chars, t.toks,
       |    row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rn
       |  FROM documents d JOIN toks t ON d.doc_id = t.doc_id),
       |scored AS (
       |  SELECT doc_id, lang, rn,
       |    len(list_filter(toks, x -> list_contains(${TextOps.sqlStopList}, x))) * 1.0 / len(toks) AS en_ratio,
       |    0.3 * least(1.0, n_chars / 500.0)
       |      + 0.4 * (len(list_distinct(toks)) * 1.0 / len(toks))
       |      + 0.3 * (len(list_filter(toks, x -> list_contains(${TextOps.sqlStopList}, x))) * 1.0 / len(toks)) AS quality_score
       |  FROM q)
       |SELECT doc_id, quality_score, en_ratio
       |FROM scored
       |WHERE quality_score >= 0.38 AND en_ratio >= 0.05 AND rn = 1
       |  AND doc_id NOT IN (SELECT doc FROM noncanon)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val byContent = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    // near-dup losers: every cluster member that is not its cluster's
    // minimum doc_id (the canonical survivor)
    val nonCanonical = DedupOps.clusters.run(s, d)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"))
    withQuality(Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), col("text")))
      .withColumn("rn", row_number().over(byContent))
      .filter(col("quality_score") >= 0.38 && col("en_ratio") >= 0.05 && col("rn") === 1)
      .join(broadcast(nonCanonical), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality_score"), col("en_ratio"))
      .orderBy(col("doc_id"))
  }

  /** The quality/language gate columns — shared by the batch pipeline
    * above and the streaming composition
    * ([[graft.streaming.StreamingPipelines.cleanCorpusStream]]), so the
    * two can't drift. Input needs `doc_id, text, n_chars`; adds
    * `en_ratio` (English-stopword ratio — the language gate) and
    * `quality_score` (length + type-token-ratio + stopword blend). */
  private[graft] def withQuality(docs: DataFrame): DataFrame = {
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    val toks = col("__toks")
    val nTok = size(toks)
    val enRatio = size(filter(toks, x => array_contains(stopArr, x))) * lit(1.0) / nTok
    val ttr = size(array_distinct(toks)) * lit(1.0) / nTok
    docs
      .withColumn("__toks", split(col("text"), "\\s+"))
      .withColumn("en_ratio", enRatio)
      .withColumn("quality_score",
        lit(0.3) * least(lit(1.0), col("n_chars") / 500.0) +
          lit(0.4) * ttr + lit(0.3) * enRatio)
      .drop("__toks")
  }

  /** Rows passing both gates (the filter the streaming stage applies
    * before its cross-corpus index check). */
  private[graft] def qualityGate(docs: DataFrame): DataFrame =
    withQuality(docs)
      .filter(col("quality_score") >= 0.38 && col("en_ratio") >= 0.05)

  /** The full corpus-PREP composition: clean (quality + language +
    * exact-dup + near-dup, the pipeline above) → deterministic
    * train/val/test split → per-split volume report (doc count, total
    * chars, mean quality) — the one-op answer to "what does my
    * training mix look like after curation", built entirely from
    * oracle-green stages so the composition itself is hash-checked.
    * The split is the sample_split hash contract (append-stable: a
    * corpus refresh never moves a surviving doc across splits). */
  val prepare: GraftOp = GraftOp(
    "pipeline_prepare",
    s"""WITH RECURSIVE ${DedupOps.sqlMinhashVerified},
       |${DedupOps.sqlClusterWalk},
       |noncanon AS (SELECT doc FROM walk GROUP BY doc HAVING min(label) <> doc),
       |q AS (
       |  SELECT d.doc_id, d.n_chars, t.toks,
       |    row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rn
       |  FROM documents d JOIN toks t ON d.doc_id = t.doc_id),
       |scored AS (
       |  SELECT doc_id, n_chars, rn,
       |    len(list_filter(toks, x -> list_contains(${TextOps.sqlStopList}, x))) * 1.0 / len(toks) AS en_ratio,
       |    0.3 * least(1.0, n_chars / 500.0)
       |      + 0.4 * (len(list_distinct(toks)) * 1.0 / len(toks))
       |      + 0.3 * (len(list_filter(toks, x -> list_contains(${TextOps.sqlStopList}, x))) * 1.0 / len(toks)) AS quality_score
       |  FROM q),
       |kept AS (
       |  SELECT doc_id, n_chars, quality_score FROM scored
       |  WHERE quality_score >= 0.38 AND en_ratio >= 0.05 AND rn = 1
       |    AND doc_id NOT IN (SELECT doc FROM noncanon)),
       |labeled AS (
       |  SELECT n_chars, quality_score,
       |    CASE WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
       |         WHEN ${graft.functions.Exprs.sqlMd5Long("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM kept)
       |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  ((CAST(sum(CAST(quality_score AS DECIMAL(18,9))) * 1000000000 AS BIGINT) * 10
       |    // (count(*) * 1000) + 5) // 10) / 1000000.0 AS mean_quality
       |FROM labeled GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val bucket = graft.functions.Exprs.md5Long(
      col("doc_id").cast(org.apache.spark.sql.types.StringType)) % 100
    clean.run(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("n_chars"),
        col("quality_score").cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("q"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        // integer half-up at 6dp of the exact rational Σq/n — a double
        // round() of an exact rational is the §6 midpoint gotcha
        (expr("(cast(sum(q) * 1000000000 as bigint) * 10 div (count(1) * 1000) + 5) div 10")
          / 1000000.0).as("mean_quality"))
      .orderBy(col("split"))
  }

  val ops: Seq[GraftOp] = Seq(clean, prepare)
}
