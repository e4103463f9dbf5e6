package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis ops for LLM-data pipelines (SURVEY.md §2f).
  *
  * All scoring runs as codegen'd higher-order array expressions over a
  * whitespace tokenization — no UDFs, so plans stay in whole-stage
  * codegen and scale linearly with the corpus.
  */
object TextOps {

  private[operators] val stopwords = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on", "as", "at", "by")
  private[operators] val sqlStopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  private def tokens: Column = split(col("text"), "\\s+")

  /** Quality scoring: length, type-token ratio, stopword ratio, mean
    * word length, and a composite score (identical double-op order on
    * the oracle side, so values match exactly). */
  val quality: GraftOp = GraftOp(
    "text_quality",
    s"""WITH t AS (
       |  SELECT doc_id, n_chars, string_split_regex(text, '\\s+') AS toks FROM documents)
       |SELECT doc_id, n_chars,
       |  len(toks) AS n_tokens,
       |  len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
       |  len(list_filter(toks, x -> list_contains($sqlStopList, x))) * 1.0 / len(toks) AS stop_ratio,
       |  list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b) * 1.0 / len(toks) AS avg_word_len,
       |  0.3 * least(1.0, n_chars / 500.0)
       |    + 0.4 * (len(list_distinct(toks)) * 1.0 / len(toks))
       |    + 0.3 * (len(list_filter(toks, x -> list_contains($sqlStopList, x))) * 1.0 / len(toks)) AS quality_score
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val stopArr = array(stopwords.map(lit): _*)
    val nTok = size(col("toks"))
    val ttr = size(array_distinct(col("toks"))) * lit(1.0) / nTok
    val stopRatio = size(filter(col("toks"), x => array_contains(stopArr, x))) * lit(1.0) / nTok
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), tokens.as("toks"))
      .select(col("doc_id"), col("n_chars"),
        nTok.as("n_tokens"),
        ttr.as("ttr"),
        stopRatio.as("stop_ratio"),
        (aggregate(transform(col("toks"), x => length(x)), lit(0), (a, b) => a + b) * lit(1.0) / nTok)
          .as("avg_word_len"),
        (lit(0.3) * least(lit(1.0), col("n_chars") / 500.0) + lit(0.4) * ttr + lit(0.3) * stopRatio)
          .as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: English-stopword hit rate (an n-gram/
    * stopword heuristic in the fasttext-less tradition). The corpus is
    * synthetic English-like text, so the interesting part is the
    * mechanism + agreement flag against the labeled `lang` column. */
  val langId: GraftOp = GraftOp(
    "text_lang_id",
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks FROM documents),
       |s AS (
       |  SELECT doc_id, lang,
       |    len(list_filter(toks, x -> list_contains($sqlStopList, x))) * 1.0 / len(toks) AS en_ratio
       |  FROM t)
       |SELECT doc_id, lang, en_ratio,
       |  CASE WHEN en_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred,
       |  CASE WHEN (CASE WHEN en_ratio >= 0.05 THEN 'en' ELSE 'unknown' END) = lang THEN 1 ELSE 0 END AS agree
       |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    val stopArr = array(stopwords.map(lit): _*)
    val enRatio = size(filter(col("toks"), x => array_contains(stopArr, x))) * lit(1.0) / size(col("toks"))
    val pred = when(col("en_ratio") >= 0.05, "en").otherwise("unknown")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), tokens.as("toks"))
      .withColumn("en_ratio", enRatio)
      .select(col("doc_id"), col("lang"), col("en_ratio"),
        pred.as("lang_pred"),
        when(pred === col("lang"), 1).otherwise(0).as("agree"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (ceil(len/4) pieces per word — the standard chars/4 heuristic). */
  val tokenCount: GraftOp = GraftOp(
    "text_tokens",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents)
      |SELECT doc_id, len(toks) AS n_ws_tokens,
      |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS INT))), (a, b) -> a + b) AS BIGINT) AS n_subword_est
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_ws_tokens"),
        aggregate(transform(col("toks"), x => ceil(length(x) / 4.0).cast(IntegerType)),
          lit(0), (a, b) => a + b).cast(LongType).as("n_subword_est"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint via the native RollingHash64 Catalyst
    * expression (codegen'd 64-bit polynomial hash). Wraparound Long
    * arithmetic isn't expressible in DuckDB SQL → rows-only; values are
    * pinned in RollingHashSpec. */
  val fingerprint: GraftOp = GraftOp.rowsOnly("text_fingerprint") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.rolling_hash(col("text")).as("fp64"))
      .orderBy(col("doc_id"))
  }

  /** Exact corpus-wide top tokens (the baseline the SpaceSaving sketch
    * is spec-checked against). */
  val topTokens: GraftOp = GraftOp(
    "text_top_tokens",
    """WITH t AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
      |SELECT tok, count(*) AS n FROM t
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(tokens).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  val ops: Seq[GraftOp] = Seq(quality, langId, tokenCount, fingerprint, topTokens)
}
