package graft.operators

import graft.GraftOp
import graft.functions.Exprs
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

  /** Session-shared whitespace tokenization of the corpus —
    * (doc_id, source, pos, tok), one row per token occurrence.
    *
    * Every token-level text op used to re-scan `documents` and
    * re-explode `split(text)` independently (17 sites); over a
    * 46-key text family that re-pays the same scan+explode dozens of
    * times per session, and late in a ~390-query session the repeated
    * exchanges were the family's drift source. At 100 TB this is the
    * lakehouse norm made explicit: tokenization is a scheduled
    * materialization (a token table ~2× the corpus footprint), not a
    * per-query tax. Registered in [[graft.CachedPlans]] (SER persist,
    * LRU lifecycle) and shipped in the [[IndexStore]] as the
    * `text_tokens` artifact, so a fresh session serves it as a
    * parquet read. */
  @volatile private[graft] var tokenBuilds = 0

  private[operators] def tokenized(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.CachedPlans.cached(s, s"text.tokens:$d") {
      tokenBuilds += 1
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), posexplode(tokens).as(Seq("pos", "tok")))
    }

  /** The deterministic quality FEATURE columns over (toks, n_chars) —
    * single source for every consumer: the quality score, the model
    * gate's features, dedup_representative's ranking. */
  private[operators] def fLen: Column = least(lit(1.0), col("n_chars") / 500.0)
  private[operators] def fTtr: Column =
    size(array_distinct(col("toks"))) * lit(1.0) / size(col("toks"))
  private[operators] def fStop: Column = {
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(col("toks"), x => array_contains(stopArr, x))) * lit(1.0) / size(col("toks"))
  }

  /** The composite quality score — THE formula text_quality emits;
    * dedup_representative ranks on the same expression, so keep
    * exactly one copy. */
  private[operators] def qualityScoreExpr: Column =
    lit(0.3) * fLen + lit(0.4) * fTtr + lit(0.3) * fStop

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
        qualityScoreExpr.as("quality_score"))
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
    * expression (codegen'd 64-bit polynomial hash). The wrapping-Long
    * fold is replicated in DuckDB on unsigned HUGEINT (Exprs.sqlM64
    * idiom): per-char UTF-8 byte expansion, then the identical
    * h·31+byte fold — so the custom codegen kernel is cross-checked
    * bit-for-bit by an independent engine, not just the spec pin. */
  val fingerprint: GraftOp = GraftOp(
    "text_fingerprint",
    s"""WITH f AS (
       |  SELECT doc_id, ${Exprs.sqlRollingHashU("text")} AS fpu FROM documents)
       |SELECT doc_id, ${Exprs.sqlU2S("fpu")} AS fp64
       |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
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

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    * fraction of a doc's bigrams taken by its single most frequent
    * bigram, and the duplicate-token fraction — the two cheapest
    * "machine-generated/boilerplate" tells. Bigrams come from a lead()
    * window over exploded token positions (one doc_id shuffle, linear)
    * rather than an array lambda — CollapseProject re-inlines split()
    * into per-element lambdas, going O(len²) per doc. */
  val repetition: GraftOp = GraftOp(
    "text_repetition",
    """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
      |  FROM toks WHERE len(toks) >= 2),
      |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM cnt GROUP BY 1),
      |dup AS (
      |  SELECT doc_id, len(toks) AS n_tok, len(list_distinct(toks)) AS n_uniq
      |  FROM toks)
      |SELECT d.doc_id AS doc_id,
      |  round(coalesce(top_c * 1.0 / n_bg, 0.0), 6) AS top_bigram_frac,
      |  round(1.0 - n_uniq * 1.0 / n_tok, 6) AS dup_token_frac
      |FROM dup d LEFT JOIN top t ON d.doc_id = t.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tokPos = tokenized(s, d).select(col("doc_id"), col("pos"), col("tok"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = tokPos
      .withColumn("nxt", lead(col("tok"), 1).over(byDoc))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
    val top = bigrams.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bg"))
    val dup = tokPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_uniq"))
    dup.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("top_c") * lit(1.0) / col("n_bg"), lit(0.0)), 6)
          .as("top_bigram_frac"),
        round(lit(1.0) - col("n_uniq") * lit(1.0) / col("n_tok"), 6)
          .as("dup_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide top bigrams — the n-gram extension of text_top_tokens
    * (phrase-level corpus statistics for contamination screens). */
  val topBigrams: GraftOp = GraftOp(
    "text_top_bigrams",
    """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(toks)), i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
      |  FROM toks WHERE len(toks) >= 2)
      |SELECT bigram, count(*) AS n FROM bg
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin) { (s, d) =>
    val tokPos = tokenized(s, d).select(col("doc_id"), col("pos"), col("tok"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    tokPos
      .withColumn("nxt", lead(col("tok"), 1).over(byDoc))
      .filter(col("nxt").isNotNull)
      .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** Collocation extraction: top bigrams by pointwise mutual
    * information against the unigram model. PMI = ln(p(xy)/(p(x)p(y)))
    * is monotone in the RAW ratio n_xy·N / (c_x·c_y), so the engine
    * ranks and emits that ratio and never evaluates a transcendental —
    * every factor is an exact integer product below 2⁵³ and the single
    * divide is IEEE-correctly-rounded, identical across engines (the
    * same trick q_sequence_count uses to stay branch-free).
    *
    * Scale shape: one (w1,w2) hash aggregation over the lead()-paired
    * token stream (linear, the exchange carries bigram hashes not
    * documents) + a dictionary-sized unigram join — vocabulary grows
    * sublinearly (Heaps' law), so the dictionary is broadcast like
    * text_tfidf's. A min-support floor (n_xy ≥ 5) kills the hapax tail
    * before the join, which is what bounds the aggregate at 100 TB. */
  val pmi: GraftOp = GraftOp(
    "text_pmi",
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |toks AS (SELECT unnest(toks) AS tok FROM t),
      |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok FROM toks),
      |bgl AS (
      |  SELECT unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS p
      |  FROM t WHERE len(toks) >= 2),
      |bg AS (
      |  SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_xy FROM bgl
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |sc AS (
      |  SELECT w1, w2, n_xy, n_xy * n_tok / (u1.c * u2.c) AS pmi_ratio
      |  FROM bg JOIN uni u1 ON w1 = u1.tok JOIN uni u2 ON w2 = u2.tok
      |  CROSS JOIN n)
      |SELECT w1, w2, n_xy, pmi_ratio FROM sc
      |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 50""".stripMargin) { (s, d) =>
    val tokPos = tokenized(s, d).select(col("doc_id"), col("pos"), col("tok"))
    val uni = tokPos.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nTok = tokPos.agg(count(lit(1)).cast("double").as("n_tok"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = tokPos
      .withColumn("nxt", lead(col("tok"), 1).over(byDoc))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("w1"), col("nxt").as("w2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= 5)
    bg.join(broadcast(uni.as("u1")), col("w1") === col("u1.tok"))
      .join(broadcast(uni.as("u2")), col("w2") === col("u2.tok"))
      .crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("n_xy"),
        (col("n_xy") * col("n_tok") / (col("u1.c") * col("u2.c"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(50)
  }

  /** Model-based quality filtering — the linear-classifier gate LLM
    * curation pipelines run after heuristics (the DCLM / FineWeb-Edu
    * pattern: a cheap trained scorer decides keep/drop). Weights are
    * LITERALS in the plan (a shipped model, not a fit), features are
    * the same deterministic signals text_quality computes, the score
    * is a sigmoid over the linear term. Pure map, zero shuffle —
    * scoring 100 TB is embarrassingly parallel. Parity: features are
    * exact ratios, the single exp() may differ by 1 ulp and the
    * keep/drop flag therefore compares the ROUNDED probability, so
    * the gate cannot straddle engines. */
  val qualityModel: GraftOp = GraftOp(
    "text_quality_model",
    s"""WITH t AS (
       |  SELECT doc_id, n_chars, string_split_regex(text, '\\s+') AS toks FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    least(1.0, n_chars / 500.0) AS f_len,
       |    len(list_distinct(toks)) * 1.0 / len(toks) AS f_ttr,
       |    len(list_filter(toks, x -> list_contains($sqlStopList, x))) * 1.0 / len(toks) AS f_stop,
       |    list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b)
       |      * 1.0 / len(toks) / 10.0 AS f_awl
       |  FROM t),
       |z AS (
       |  SELECT doc_id,
       |    1.2 * f_len + 2.0 * f_ttr + 1.5 * f_stop - 0.2 * f_awl - 2.0 AS z
       |  FROM f)
       |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS prob,
       |  CASE WHEN round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 THEN 1 ELSE 0 END AS keep
       |FROM z ORDER BY doc_id""".stripMargin) { (s, d) =>
    val fAwl = aggregate(transform(col("toks"), x => length(x)), lit(0), (a, b) => a + b) *
      lit(1.0) / size(col("toks")) / 10.0
    val z = lit(1.2) * fLen + lit(2.0) * fTtr + lit(1.5) * fStop - lit(0.2) * fAwl - 2.0
    val prob = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), tokens.as("toks"))
      .select(col("doc_id"), prob.as("prob"),
        when(prob >= 0.5, 1).otherwise(0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum tiers: documents bucketed into quality quartiles —
    * the curriculum-learning prep step (train easy/clean tiers first,
    * or weight tiers differently in the mix). Same ntile-free quantile
    * assignment as q_rfm: one exact-percentile aggregate over the
    * corpus quality score (the shared text_quality expression),
    * broadcast back, tier = CASE-sum of boundary compares — pure map,
    * no global sort. Parity: the score is the hash-green quality
    * expression and the cuts are the same interpolated doubles. */
  val curriculum: GraftOp = GraftOp(
    "text_curriculum",
    s"""WITH t AS (
       |  SELECT doc_id, n_chars, string_split_regex(text, '\\s+') AS toks FROM documents),
       |q AS (
       |  SELECT doc_id,
       |    0.3 * least(1.0, n_chars / 500.0)
       |      + 0.4 * (len(list_distinct(toks)) * 1.0 / len(toks))
       |      + 0.3 * (len(list_filter(toks, x -> list_contains($sqlStopList, x))) * 1.0 / len(toks)) AS quality
       |  FROM t),
       |cuts AS (SELECT quantile_cont(quality, [0.25, 0.5, 0.75]) AS c FROM q)
       |SELECT doc_id, round(quality, 6) AS quality,
       |  1 + (CASE WHEN quality > c[1] THEN 1 ELSE 0 END)
       |    + (CASE WHEN quality > c[2] THEN 1 ELSE 0 END)
       |    + (CASE WHEN quality > c[3] THEN 1 ELSE 0 END) AS tier
       |FROM q CROSS JOIN cuts ORDER BY doc_id""".stripMargin) { (s, d) =>
    val q = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), tokens.as("toks"))
      .select(col("doc_id"), qualityScoreExpr.as("quality"))
    val cuts = q.agg(percentile(col("quality"), typedLit(Seq(0.25, 0.5, 0.75))).as("c"))
    val tier = (1 to 3).map(i => when(col("quality") > col("c")(i - 1), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    q.crossJoin(broadcast(cuts))
      .select(col("doc_id"), round(col("quality"), 6).as("quality"), tier.as("tier"))
      .orderBy(col("doc_id"))
  }

  /** Per-source language-mix Shannon entropy — the corpus DIVERSITY
    * diagnostic (a source whose mix collapsed to one language is a
    * crawler bug; curation targets a mix, and entropy is the one
    * number that tracks it). Counts are exact integers; H = −Σ p·ln p
    * over ≤|languages| terms, snapped at 6dp (libm-ulp noise only —
    * the transcendental output is not an exact rational, so the
    * midpoint gotcha does not apply; the text_tfidf ln contract).
    * One (source, lang) aggregate + a |sources|-row rollup. */
  val mixEntropy: GraftOp = GraftOp(
    "text_mix_entropy",
    """WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
      |t AS (SELECT source, CAST(sum(n) AS DOUBLE) AS tot FROM c GROUP BY 1)
      |SELECT c.source, CAST(count(*) AS INT) AS n_langs,
      |  round(-sum((n / tot) * ln(n / tot)), 6) AS entropy
      |FROM c JOIN t ON c.source = t.source
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("source")).agg(sum(col("n")).cast(DoubleType).as("tot"))
    val p = col("n") / col("tot")
    c.join(broadcast(t), Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(IntegerType).as("n_langs"),
        round(-sum(p * log(p)), 6).as("entropy"))
      .orderBy(col("source"))
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene/
    * Elasticsearch default scorer) for a keyword query — the text-
    * SEARCH member of the text family: score(d) = Σ_t idf_t ·
    * tf/(tf + k1·(1−b+b·dl/avgdl)), k1=1.2, b=0.75, Lucene's
    * ln(1 + (N−df+0.5)/(df+0.5)) idf.
    *
    * Scale shape: one (doc, term) tf aggregation restricted to the
    * query terms (the filter pushes into the token stream — the
    * inverted-index access pattern without materializing an index),
    * doc lengths from a second linear pass, df/avgdl as tiny broadcast
    * frames; top-k through the rounded-score TakeOrdered. Parity: tf /
    * df / dl are exact ints, avgdl the same double, and the one ln()
    * per term is snapped by the 6dp round BEFORE ranking (the
    * text_tfidf contract). */
  val bm25: GraftOp = GraftOp(
    "text_bm25", {
      val terms = "('join', 'scan', 'filter')"
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN $terms GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id,
         |    sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         |      * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))) AS score
         |  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
         |  GROUP BY 1)
         |SELECT doc_id, round(score, 6) AS bm25 FROM sc
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    }) { (s, d) =>
    val terms = Seq("join", "scan", "filter")
    val toks = tokenized(s, d).select(col("doc_id"), col("tok").as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast(DoubleType).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast(DoubleType).as("df"))
    val idf = log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") / (col("tf") + lit(1.2) * (lit(1) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(sum(idf * norm).as("score"))
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Per-document top-3 TF-IDF terms: term frequency from the doc,
    * document frequency from a corpus-wide dictionary joined back in.
    * The dictionary (one row per distinct term) is tiny next to the
    * corpus — broadcast — so the scoring pass is shuffle-free; the
    * only wide exchange is the (doc_id, term) tf aggregation. Ranking
    * keys are ROUNDED tfidf then term, so libm ULP differences between
    * engines' ln() cannot reorder the top-3. */
  val tfidf: GraftOp = GraftOp(
    "text_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (
      |  SELECT doc_id, term, tf, df, round(tf * ln(n_docs / df), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      |  FROM sc)
      |SELECT doc_id, CAST(rn AS INT) AS rn, term, tf, df, tfidf
      |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
    val toks = tokenized(s, d).select(col("doc_id"), col("tok").as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Benchmark decontamination (GPT-3 appendix-C shape): flag training
    * documents sharing any 8-gram with a held-out benchmark split
    * (here the deterministic `doc_id % 20 = 0` slice stands in for the
    * eval set). 8-grams come from 7 lead() taps over ONE per-doc
    * window pass, and the overlap join runs on the portable 60-bit
    * md5 of the gram — a narrow long-keyed shuffle of the distinct
    * gram sets, never the text. Output: each contaminated train doc
    * with its distinct shared-gram and matched-benchmark-doc counts. */
  val decontam: GraftOp = GraftOp(
    "text_decontam",
    s"""WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       |g AS (
       |  SELECT doc_id, ${graft.functions.Exprs.sqlMd5Long(
            "unnest(list_transform(range(1, len(toks) - 6), i -> " +
              "concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', " +
              "toks[i+4], ' ', toks[i+5], ' ', toks[i+6], ' ', toks[i+7])))")} AS gh
       |  FROM toks WHERE len(toks) >= 8),
       |bench AS (SELECT DISTINCT doc_id, gh FROM g WHERE doc_id % 20 = 0),
       |train AS (SELECT DISTINCT doc_id, gh FROM g WHERE doc_id % 20 <> 0)
       |SELECT t.doc_id AS doc_id,
       |  count(DISTINCT t.gh) AS n_shared_grams,
       |  count(DISTINCT b.doc_id) AS n_bench_docs
       |FROM train t JOIN bench b ON t.gh = b.gh
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val tokPos = tokenized(s, d).select(col("doc_id"), col("pos"), col("tok"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = tokPos
      .select(col("doc_id") +: (0 to 7).map(i =>
        (if (i == 0) col("tok") else lead(col("tok"), i).over(byDoc)).as(s"t$i")): _*)
      .filter(col("t7").isNotNull)
      .select(col("doc_id"), graft.functions.Exprs.md5Long(
        concat_ws(" ", (0 to 7).map(i => col(s"t$i")): _*)).as("gh"))
    val bench = grams.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("bench_doc"), col("gh")).distinct()
    val train = grams.filter(col("doc_id") % 20 =!= 0).distinct()
    train.join(bench, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared_grams"),
        countDistinct(col("bench_doc")).as("n_bench_docs"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction: emails and IPv4 literals replaced with typed
    * placeholders, with a per-doc redaction count — the scrub step a
    * training-data pipeline runs before release (pure map over the
    * corpus: zero shuffle, trivially parallel at 100 TB). Patterns are
    * RE2-compatible so Spark (Java regex) and the oracle (DuckDB RE2)
    * match identical spans; the synthetic corpus contains no PII, so
    * the oracle proves the all-zero result and PiiSpec proves the
    * mechanics on planted PII (the same synthetic-dir pattern
    * ContainmentSpec uses). Emitted text is the redacted form. */
  val piiRedact: GraftOp = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    // n_redactions counts what the SEQUENTIAL replacement actually
    // emits: emails on the original text, then IPs on the
    // email-redacted text — counting both patterns on the original
    // would over-count when one match consumes the other (an IP inside
    // an email local part is replaced once, not twice)
    GraftOp(
      "text_pii_redact",
      s"""WITH r1 AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
         |    regexp_replace(text, '$email', '[EMAIL]', 'g') AS t1
         |  FROM documents)
         |SELECT doc_id,
         |  n_email + CAST(len(regexp_extract_all(t1, '$ipv4')) AS BIGINT) AS n_redactions,
         |  regexp_replace(t1, '$ipv4', '[IP]', 'g') AS redacted
         |FROM r1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_count(col("text"), lit(email)).cast(LongType).as("n_email"),
          regexp_replace(col("text"), email, "[EMAIL]").as("t1"))
        .select(col("doc_id"),
          (col("n_email") + regexp_count(col("t1"), lit(ipv4)).cast(LongType))
            .as("n_redactions"),
          regexp_replace(col("t1"), ipv4, "[IP]").as("redacted"))
        .orderBy(col("doc_id"))
    }
  }

  /** Canonical text normalization: Unicode NFC composition (the
    * engine's native [[graft.functions.NfcNormalize]] expression —
    * Spark ships no normalizer; ASCII short-circuits, so the 100-TB
    * common case never allocates) + locale-free lowercase + internal
    * whitespace collapse + trim. The canonicalization step upstream of
    * every hash-based dedup — two byte-identical-after-normalization
    * docs MUST hash identically or the dedup family undercounts.
    * Pure map, zero shuffle. */
  val normalize: GraftOp = GraftOp(
    "text_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS normalized
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(lower(graft.functions.nfc_normalize(col("text"))), "\\s+", " "))
          .as("normalized"))
      .orderBy(col("doc_id"))
  }

  /** Overlapping token-window chunking — the RAG / embedding-prep
    * splitter: windows of 64 tokens at stride 48 (16-token overlap so
    * no boundary context is lost), emitted as (doc_id, chunk_id,
    * start_tok, n_tokens, chunk_hash). Pure map + explode: zero
    * shuffle, each 100-TB scan task chunks its own documents; the
    * portable 60-bit hash stands in for the chunk text so downstream
    * chunk-level dedup joins stay narrow (the embedding step would read
    * the (doc_id, start_tok) span, not carry the text through every
    * shuffle). */
  val chunks: GraftOp = GraftOp(
    "text_chunks",
    s"""WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       |st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS p FROM t),
       |c AS (SELECT doc_id, CAST(p // 48 AS INT) AS chunk_id, CAST(p AS INT) AS start_tok,
       |    list_slice(toks, p + 1, p + 64) AS chunk FROM st)
       |SELECT doc_id, chunk_id, start_tok, CAST(len(chunk) AS INT) AS n_tokens,
       |  ${graft.functions.Exprs.sqlMd5Long("array_to_string(chunk, ' ')")} AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(48))).as("p"))
      .select(col("doc_id"),
        (col("p") / 48).cast(IntegerType).as("chunk_id"),
        col("p").cast(IntegerType).as("start_tok"),
        slice(col("toks"), col("p") + 1, lit(64)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).as("n_tokens"),
        graft.functions.Exprs.md5Long(concat_ws(" ", col("chunk"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Token-rarity tiers — the unigram-LM perplexity PROXY (CCNet-style
    * LM filtering without the LM): a doc whose tokens are mostly
    * corpus-rare is gibberish/OCR noise, one whose tokens are all
    * corpus-common is boilerplate; curation keeps the middle. Score =
    * mean corpus frequency of the doc's tokens — the integer-exact
    * stand-in for mean unigram log-prob (monotone in it for the
    * rank-tier decision, with ZERO transcendentals: a per-doc Σln over
    * hundreds of fold-ordered doubles could never hash-match).
    *
    * Shape: one token explode builds the corpus dictionary (|vocab|
    * rows), tokens re-join it on the hash-partitioned token key, the
    * per-doc aggregate is exact-integer (Σc, n), and the emitted mean
    * is the §6 pure-integer half-up at 6dp. Tiers cut at the exact
    * p25/p75 of the rounded means (one 1-row aggregate broadcast —
    * the q_rfm ntile-free shape): ≥p75 'head' (common-token docs),
    * ≥p25 'middle', else 'tail'. */
  val rarityTiers: GraftOp = GraftOp(
    "text_rarity_tiers",
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |f AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
      |pd AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS sum_c, CAST(count(*) AS BIGINT) AS n_toks
      |  FROM t JOIN f USING (tok) GROUP BY 1),
      |sc AS (
      |  SELECT doc_id, n_toks,
      |    ((sum_c * 10000000) // n_toks + 5) // 10 / 1e6 AS mean_tok_freq
      |  FROM pd),
      |cuts AS (SELECT quantile_cont(mean_tok_freq, [0.25, 0.75]) AS q FROM sc)
      |SELECT doc_id, n_toks, mean_tok_freq,
      |  CASE WHEN mean_tok_freq >= q[2] THEN 'head'
      |       WHEN mean_tok_freq >= q[1] THEN 'middle'
      |       ELSE 'tail' END AS tier
      |FROM sc CROSS JOIN cuts ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id"), explode(tokens).as("tok"))
    val f = t.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val pd = t.join(f, "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("sum_c"), count(lit(1)).as("n_toks"))
    // integer half-up at 6dp, then ONE exact power-of-ten divide —
    // Σc·10⁷ stays far under Long range at test SFs (≤ ~5e16)
    val sc = pd.select(col("doc_id"), col("n_toks"),
      (expr("(sum_c * 10000000L div n_toks + 5) div 10") / 1e6).as("mean_tok_freq"))
    val cuts = sc.agg(percentile(col("mean_tok_freq"), typedLit(Seq(0.25, 0.75))).as("q"))
    sc.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_toks"), col("mean_tok_freq"),
        when(col("mean_tok_freq") >= col("q")(1), "head")
          .when(col("mean_tok_freq") >= col("q")(0), "middle")
          .otherwise("tail").as("tier"))
      .orderBy(col("doc_id"))
  }

  /** Feature hashing (HashingTF / the "hashing trick"): token →
    * fixed-size bucket via the portable hash, per-doc bucket counts —
    * the vocabulary-free featurizer for linear classifiers/quality
    * gates at corpus scale (no dictionary to build, broadcast, or
    * keep consistent across corpus refreshes; collisions are the
    * accepted trade). 1024 buckets, emitted sparse (only non-zero
    * buckets, the classifier-input shape); doc_id < 100 bounds the
    * emitted sample like mm_chunk. Pure map + one (doc, bucket)
    * aggregate — the hash replaces the dictionary JOIN text_tfidf
    * needs. */
  val hashingTf: GraftOp = GraftOp(
    "text_hashing_tf",
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
       |  FROM documents WHERE doc_id < 100)
       |SELECT doc_id,
       |  CAST(${graft.functions.Exprs.sqlMd5Long("tok")} % 1024 AS INT) AS bucket,
       |  count(*) AS tf
       |FROM t GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(tokens).as("tok"))
      .groupBy(col("doc_id"),
        (graft.functions.Exprs.md5Long(col("tok")) % 1024).cast(IntegerType).as("bucket"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("doc_id"), col("bucket"))
  }

  /** Bigram-LM fluency scoring — the CCNet-style "does this read like
    * the corpus" filter one tier up from text_rarity_tiers' unigram
    * model: train P(w2|w1) on the corpus itself, score each document
    * by its mean bigram conditional probability, surface the 25 least
    * model-like documents (the filter's actual use: what to drop or
    * down-weight). All integer: cond_ppm = floor(n_xy·10^6 / c_w1)
    * with c_w1 = Σ n_xy over the LM table (dictionary-sized — never a
    * second corpus pass), per-doc mean as floor(Σ cond_ppm / n
    * bigrams). No transcendentals, no smoothing needed — the LM is
    * trained on the scored corpus, so every scored bigram is in it.
    *
    * Scale shape: one lead()-paired bigram stream feeds (a) the
    * (w1,w2) hash agg — the exchange carries bigrams, not text — and
    * (b) the doc-side join against the conditional table; the context
    * totals aggregate the LM table itself (Heaps-law sublinear). */
  val lmScore: GraftOp = GraftOp(
    "text_lm_score",
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |bgl AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS p
      |  FROM t WHERE len(toks) >= 2),
      |b AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bgl),
      |lm AS (SELECT w1, w2, count(*) AS n_xy FROM b GROUP BY 1, 2),
      |ctx AS (SELECT w1, sum(n_xy) AS c_w1 FROM lm GROUP BY 1),
      |cond AS (
      |  SELECT w1, w2, CAST(n_xy * 1000000 // c_w1 AS BIGINT) AS cond_ppm
      |  FROM lm JOIN ctx USING (w1)),
      |ds AS (
      |  SELECT doc_id, count(*) AS n_bigrams, sum(cond_ppm) AS sum_ppm
      |  FROM b JOIN cond USING (w1, w2) GROUP BY 1)
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(sum_ppm // n_bigrams AS BIGINT) AS lm_score_ppm
      |FROM ds ORDER BY lm_score_ppm, doc_id LIMIT 25""".stripMargin) { (s, d) =>
    val tokPos = tokenized(s, d).select(col("doc_id"), col("pos"), col("tok"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val b = tokPos
      .withColumn("w2", lead(col("tok"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("tok").as("w1"), col("w2"))
    val lm = b.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
    val cond = lm
      .withColumn("c_w1", sum(col("n_xy"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .select(col("w1"), col("w2"), expr("n_xy * 1000000 div c_w1").as("cond_ppm"))
    b.join(cond, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cond_ppm")).as("sum_ppm"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_ppm div n_bigrams").as("lm_score_ppm"))
      .orderBy(col("lm_score_ppm"), col("doc_id"))
      .limit(25)
  }

  /** Zipf-law fit over the corpus frequency spectrum: OLS slope of
    * ln(freq) on ln(rank) for the top 200 tokens — the "is this a
    * natural-language corpus" sanity check (natural text sits near
    * slope −1; templated/machine output flattens or cliffs). The rank
    * frame is a TakeOrdered top-k (never a global sort), so the OLS
    * runs over exactly 200 (rank, count) integer pairs; ln/× noise
    * over a 200-row fold is ~1e-13 relative, absorbed by the 6dp
    * snap (the text_lm_score transcendental contract). */
  val zipf: GraftOp = GraftOp(
    "text_zipf",
    """WITH t AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY tok),
      |top AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 200),
      |r AS (
      |  SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rk, n
      |  FROM top),
      |f AS (
      |  SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM r),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m, sum(x) AS sx, sum(y) AS sy,
      |         sum(x * y) AS sxy, sum(x * x) AS sxx
      |  FROM f)
      |SELECT m AS n_terms,
      |  round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS slope,
      |  round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6) AS intercept
      |FROM g""".stripMargin) { (s, d) =>
    val top = Tables.documents(s, d)
      .select(explode(tokens).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(200)
    val f = top
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok"))).cast(LongType))
      .select(expr("ln(CAST(rk AS DOUBLE))").as("x"), expr("ln(CAST(n AS DOUBLE))").as("y"))
    f.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("m").as("n_terms"),
        expr("round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)").as("slope"),
        expr("round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)").as("intercept"))
  }

  /** Flesch reading-ease + Flesch-Kincaid grade with a deterministic
    * vowel-group syllable proxy (each maximal [aeiou]+ run = one
    * syllable — the standard dictionary-free approximation) and
    * sentences = max(1, [.!?]+ runs). All three counts are exact
    * integers from the SAME regex semantics both engines (counting
    * whole-text vowel runs ≡ per-word sum — tokens split on
    * whitespace, which never carries a vowel); the two scores are one
    * double formula each. Linear per-doc work, zero shuffle. */
  val readability: GraftOp = GraftOp(
    "text_readability",
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS w,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS syl,
      |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS sent
      |  FROM documents)
      |SELECT doc_id, w AS n_words, syl AS n_syllables, sent AS n_sentences,
      |  round(206.835 - 1.015 * (CAST(w AS DOUBLE) / sent)
      |    - 84.6 * (CAST(syl AS DOUBLE) / w), 6) AS flesch_ease,
      |  round(0.39 * (CAST(w AS DOUBLE) / sent)
      |    + 11.8 * (CAST(syl AS DOUBLE) / w) - 15.59, 6) AS fk_grade
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("w"),
        size(expr("regexp_extract_all(lower(text), '[aeiou]+', 0)")).cast(LongType).as("syl"),
        greatest(lit(1L),
          size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast(LongType)).as("sent"))
      .select(col("doc_id"), col("w").as("n_words"), col("syl").as("n_syllables"),
        col("sent").as("n_sentences"),
        expr("""round(206.835 - 1.015 * (CAST(w AS DOUBLE) / sent)
          | - 84.6 * (CAST(syl AS DOUBLE) / w), 6)""".stripMargin).as("flesch_ease"),
        expr("""round(0.39 * (CAST(w AS DOUBLE) / sent)
          | + 11.8 * (CAST(syl AS DOUBLE) / w) - 15.59, 6)""".stripMargin).as("fk_grade"))
      .orderBy(col("doc_id"))
  }

  /** Jensen-Shannon divergence of each source's token distribution
    * from the corpus mixture — the drift/contamination readout a
    * curation pipeline runs per crawl source ("is this source's
    * vocabulary unlike the rest"). The zero-count tail is NEVER
    * materialized: for tokens absent from a source, P=0 and the term
    * collapses to Q·ln2, so JS = ½[Σ_{t∈s}(P·ln(2P/(P+Q)) +
    * Q·ln(2Q/(P+Q))) + ln2·(1−Σ_{t∈s}Q)] over only the source's own
    * (source, token) rows. Counts are exact integers; the transcendental
    * fold follows the text_tfidf/mix-entropy ln contract (6dp emit).
    * One token-key equi join of the per-source counts against the
    * corpus dictionary — hash-partitioned, no broadcast of the vocab. */
  val jsDivergence: GraftOp = GraftOp(
    "text_js_div",
    """WITH st AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |ct AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ctot FROM st GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st),
      |terms AS (
      |  SELECT st.source,
      |    (CAST(st.c AS DOUBLE) / ns.n_s) AS p,
      |    (CAST(ct.ctot AS DOUBLE) / n.n) AS q
      |  FROM st JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN n)
      |SELECT source,
      |  round(0.5 * (sum(p * ln(2 * p / (p + q)) + q * ln(2 * q / (p + q)))
      |    + ln(2) * (1 - sum(q))), 6) AS js_div
      |FROM terms GROUP BY 1 ORDER BY source""".stripMargin) { (s, d) =>
    val st = tokenized(s, d).select(col("source"), col("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val ct = st.groupBy(col("tok")).agg(sum(col("c")).as("ctot"))
    val ns = st.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val n = st.agg(sum(col("c")).as("n"))
    st.join(ct, Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .select(col("source"),
        (col("c").cast(DoubleType) / col("n_s")).as("p"),
        (col("ctot").cast(DoubleType) / col("n")).as("q"))
      .groupBy(col("source"))
      .agg(expr("""round(0.5 * (sum(p * ln(2 * p / (p + q)) + q * ln(2 * q / (p + q)))
        | + ln(2) * (1 - sum(q))), 6)""".stripMargin).as("js_div"))
      .orderBy(col("source"))
  }

  /** Lexical-diversity profile per source: type-token ratio (distinct
    * tokens / tokens) and hapax share (tokens occurring once in the
    * source / distinct tokens) — the corpus-health gauges that flag
    * templated or boilerplate-heavy slices (low TTR = dedup/filter
    * candidates; the synthetic slices here score low by construction).
    * One explode + two bounded aggregates; all counts exact BIGINTs,
    * the two ratios are one double division each with a 6dp snap. At
    * 100 TB the (source, token) agg is the only wide shuffle and it is
    * the same shape text_top_tokens already carries. */
  val ttr: GraftOp = GraftOp(
    "text_ttr",
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |tc AS (SELECT source, tok, count(*) AS n FROM t GROUP BY 1, 2),
      |g AS (
      |  SELECT source,
      |    CAST(sum(n) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax
      |  FROM tc GROUP BY 1)
      |SELECT source, n_tokens, n_types, n_hapax,
      |  CAST(n_types AS DOUBLE) / n_tokens AS ttr,
      |  CAST(n_hapax AS DOUBLE) / n_types AS hapax_share
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val t = tokenized(s, d).select(col("source"), col("tok"))
    val tc = t.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
    tc.groupBy(col("source"))
      .agg(
        sum(col("n")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("n") === 1, 1)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_share"))
      .orderBy(col("source"))
  }

  /** Compressibility quality signal: deflated/original byte ratio per
    * doc (zlib level 6 through the codegen'd DeflateSize expression —
    * kernel stays inside the whole-stage span). Boilerplate and
    * near-repetition compress far below natural prose, so a low
    * ratio_ppm is the cheap first-pass filter big corpus cleans run
    * before any model scoring (RefinedWeb/Gopher use exactly this
    * signal). zlib output bytes are engine-private → rows-only;
    * DeterminismSpec double-run covers it, R7bOpsSpec pins the
    * monotonicity (repetitive < prose). Partition-local, zero
    * shuffle. */
  val compressionRatio: GraftOp = GraftOp.rowsOnly("text_compression_ratio") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        graft.functions.deflate_size(col("text")).as("deflated_bytes"))
      .withColumn("ratio_ppm",
        (col("deflated_bytes").cast(LongType) * 1000000L / col("n_bytes")).cast(LongType))
      .orderBy(col("doc_id"))
  }

  /** First-seen trigram novelty per document — the data-freshness
    * readout a crawl-ordered corpus needs (how much of each new doc is
    * text the corpus has never produced before?). Each trigram
    * occurrence checks whether its trigram's GLOBAL first appearance
    * (min doc_id) is this doc; novelty is emitted as an exact ppm
    * integer (floor division), so there is no float anywhere. Scale
    * shape: trigrams shuffle ONCE as portable 64-bit hashes (never the
    * strings) through a window-min partitioned by hash — at 100 TB the
    * exchange carries 3 longs/row; no join-back materializes the
    * trigram dictionary. */
  val novelty: GraftOp = GraftOp(
    "text_novelty",
    s"""WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
       |tri AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks) - 1),
       |      i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS tri
       |  FROM toks WHERE len(toks) >= 3),
       |h AS (SELECT doc_id, ${graft.functions.Exprs.sqlMd5Long("tri")} AS th FROM tri),
       |f AS (SELECT doc_id, th, min(doc_id) OVER (PARTITION BY th) AS first_doc FROM h)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
       |  CAST(count(*) FILTER (WHERE first_doc = doc_id) AS BIGINT) AS n_novel,
       |  CAST(count(*) FILTER (WHERE first_doc = doc_id) * 1000000
       |       // count(*) AS BIGINT) AS novelty_ppm
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tokPos = tokenized(s, d).select(col("doc_id"), col("pos"), col("tok"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tri = tokPos
      .withColumn("t2", lead(col("tok"), 1).over(byDoc))
      .withColumn("t3", lead(col("tok"), 2).over(byDoc))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"),
        Exprs.md5Long(concat_ws(" ", col("tok"), col("t2"), col("t3"))).as("th"))
    val f = tri.withColumn("first_doc",
      min(col("doc_id")).over(Window.partitionBy(col("th"))))
    f.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_tri"))
      .orderBy(col("doc_id"))
  }

  /** Heaps-law vocabulary growth per source — the corpus-health twin
    * of text_zipf (rank-frequency): V ≈ K·N^β, with β read off two
    * checkpoints (the doc_id-midpoint half vs the full source — ids
    * are block-assigned per source, so parity would select all-or-
    * nothing; 2·doc_id ≤ min+max is an exact integer split that always
    * strictly nests). All four inputs are exact integers (token
    * occurrences + distinct tokens, per subset); β = ln(V/V₁)/ln(N/N₁)
    * is one shared-text double formula. A β near 0 means the source's
    * vocabulary has saturated
    * (more data adds no new tokens — a TTR-collapse signal at corpus
    * granularity); natural text sits around 0.4-0.6. */
  val heaps: GraftOp = GraftOp(
    "text_heaps",
    """WITH t AS (
      |  SELECT source, doc_id, unnest(string_split_regex(text, '\s+')) AS tok
      |  FROM documents),
      |full_c AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS vocab
      |  FROM t GROUP BY 1),
      |m AS (SELECT source, CAST(min(doc_id) + max(doc_id) AS BIGINT) AS mid2
      |      FROM documents GROUP BY 1),
      |half_c AS (
      |  SELECT t.source, CAST(count(*) AS BIGINT) AS n_tok_half,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS vocab_half
      |  FROM t JOIN m ON t.source = m.source
      |  WHERE 2 * t.doc_id <= m.mid2 GROUP BY 1)
      |SELECT f.source, f.n_tok, f.vocab, h.n_tok_half, h.vocab_half,
      |  round(ln(CAST(f.vocab AS DOUBLE) / h.vocab_half)
      |      / ln(CAST(f.n_tok AS DOUBLE) / h.n_tok_half), 6) AS beta
      |FROM full_c f JOIN half_c h ON f.source = h.source
      |ORDER BY f.source""".stripMargin) { (s, d) =>
    val t = tokenized(s, d).select(col("source"), col("doc_id"), col("tok"))
    val fullC = t.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("vocab"))
    val m = Tables.documents(s, d).groupBy(col("source"))
      .agg((min(col("doc_id")) + max(col("doc_id"))).cast("long").as("mid2"))
    val halfC = t.join(broadcast(m), "source")
      .filter(col("doc_id") * 2 <= col("mid2")).groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok_half"), countDistinct(col("tok")).as("vocab_half"))
    fullC.join(halfC, "source")
      .select(col("source"), col("n_tok"), col("vocab"), col("n_tok_half"),
        col("vocab_half"),
        expr("""round(ln(CAST(vocab AS DOUBLE) / vocab_half)
          |    / ln(CAST(n_tok AS DOUBLE) / n_tok_half), 6)""".stripMargin).as("beta"))
      .orderBy(col("source"))
  }

  /** MOSS winnowing (Schleimer et al. 2003): from each document's
    * char-8-gram hash sequence, every window of 8 consecutive grams
    * contributes its minimal hash (rightmost on ties) and the selected
    * positions form the document's fingerprint set — the guarantee the
    * plain `text_fingerprint` rolling hash cannot give (any shared
    * substring ≥ 15 chars yields a shared fingerprint, with expected
    * density 2/(w+1)). Everything is integers and portable md5 hashes
    * (31-bit here, so hash and position pack into ONE BIGINT sort
    * key); the winner of the window ending at position p is the min
    * of `key = h31·2³² + (2³²−1−p)` over the trailing 8 grams —
    * min key ≡ (hash ASC, pos DESC), the winnowing tie rule. Gram
    * hashes are the engine's rolling-hash kernel (h·31+byte fold over
    * the gram's UTF-8 bytes, low 31 bits), already independently
    * oracled by text_fingerprint. Emits per-doc fingerprint counts +
    * density (exact ppm).
    *
    * Plan shape (r9): the whole per-doc scan — gram hashing, the
    * sliding window min (monotonic deque) and the distinct-winner
    * count — runs in ONE codegen'd WinnowStats kernel pass, so no char
    * position ever reaches an exchange or a window operator: the plan
    * is scan → project → sort, linear in corpus bytes and
    * embarrassingly parallel (r8's per-position md5 + partitioned
    * running-min window put |chars| rows through one exchange: 3.9 s
    * at sf0.1 → ~0.3 s). The oracle replays gram hashing by slicing
    * ONE per-doc codepoint list and the selection via the equivalent
    * running-min window formulation. */
  val winnowing: GraftOp = GraftOp(
    "text_winnowing",
    s"""WITH g0 AS (
       |  SELECT doc_id, length(text) - 7 AS m, ${Exprs.sqlCodepoints("text")} AS cp
       |  FROM documents WHERE length(text) >= 15),
       |g AS (
       |  SELECT doc_id, m, p,
       |    CAST((${Exprs.sqlRollingHashUOverBytes(Exprs.sqlCpUtf8Bytes("list_slice(cp, p, p + 7)"))}
       |      % 2147483648) * 4294967296 + (4294967295 - p) AS BIGINT) AS key
       |  FROM (SELECT doc_id, m, cp, unnest(generate_series(1, m)) AS p FROM g0)),
       |w AS (
       |  SELECT doc_id, m, p,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mk
       |  FROM g)
       |SELECT doc_id, CAST(m AS BIGINT) AS n_grams,
       |  CAST(m - 7 AS BIGINT) AS n_windows,
       |  CAST(count(DISTINCT 4294967295 - mk % 4294967296) AS BIGINT) AS n_selected,
       |  CAST(count(DISTINCT 4294967295 - mk % 4294967296) * 1000000 // (m - 7) AS BIGINT)
       |    AS density_ppm
       |FROM w WHERE p >= 8 GROUP BY doc_id, m ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(length(col("text")) >= 15)
      .select(col("doc_id"), graft.functions.winnow_stats(col("text"), 8, 8).as("st"))
      .select(col("doc_id"),
        col("st").getItem(0).as("n_grams"),
        col("st").getItem(1).as("n_windows"),
        col("st").getItem(2).as("n_selected"))
      .withColumn("density_ppm",
        expr("CAST(n_selected * 1000000 div n_windows AS BIGINT)"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID confusion matrix — the classifier-eval rollup over
    * [[langId]]'s per-doc predictions vs the corpus's labeled `lang`
    * column: per (actual, predicted) cell the exact count plus
    * row-recall and column-precision ppms, the numbers a filtering
    * pipeline reads before trusting a language gate at corpus scale.
    * The oracle composes the audited op's own oracle SQL verbatim as
    * a subquery (the knn_pq_recall discipline), so matrix and
    * per-doc op can never drift. All exact integers. */
  val langConfusion: GraftOp = GraftOp(
    "text_lang_confusion",
    s"""WITH p AS (SELECT lang, lang_pred FROM (${langId.oracle.get}) x),
       |cm AS (SELECT lang AS actual, lang_pred AS predicted,
       |       CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
       |ra AS (SELECT actual, CAST(sum(n) AS BIGINT) AS row_n FROM cm GROUP BY 1),
       |ca AS (SELECT predicted, CAST(sum(n) AS BIGINT) AS col_n FROM cm GROUP BY 1)
       |SELECT cm.actual, cm.predicted, cm.n,
       |  CAST(cm.n * 1000000 // ra.row_n AS BIGINT) AS recall_ppm,
       |  CAST(cm.n * 1000000 // ca.col_n AS BIGINT) AS precision_ppm
       |FROM cm JOIN ra ON cm.actual = ra.actual
       |JOIN ca ON cm.predicted = ca.predicted
       |ORDER BY cm.actual, cm.predicted""".stripMargin) { (s, d) =>
    val p = langId.run(s, d).select(col("lang"), col("lang_pred"))
    val cm = p.groupBy(col("lang").as("actual"), col("lang_pred").as("predicted"))
      .agg(count(lit(1)).as("n"))
    val ra = cm.groupBy(col("actual")).agg(sum(col("n")).cast(LongType).as("row_n"))
    val ca = cm.groupBy(col("predicted")).agg(sum(col("n")).cast(LongType).as("col_n"))
    cm.join(ra, "actual").join(ca, "predicted")
      .select(col("actual"), col("predicted"), col("n"),
        expr("CAST(n * 1000000 div row_n AS BIGINT)").as("recall_ppm"),
        expr("CAST(n * 1000000 div col_n AS BIGINT)").as("precision_ppm"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** Chao1 species-richness + Good-Turing unseen mass per source — the
    * "how much vocabulary have we NOT crawled yet" readout that closes
    * the corpus-coverage loop text_heaps opens (Heaps says how fast
    * vocabulary grows; Chao1 estimates where it tops out; the
    * Good-Turing f1/N is the probability the NEXT token is unseen).
    * All four inputs (V, f1, f2, N) are exact integer aggregates of
    * the per-(source, token) frequency frame; the Chao1 estimate is
    * assembled as an exact ppm integer (V·10⁶ + f1(f1−1)·10⁶ floor-div
    * 2(f2+1) — the bias-corrected form, never 0/0) and divided once by
    * 10⁶, so no double arithmetic precedes the single final division.
    * One token shuffle, margins from the same frame — linear at
    * 100 TB. */
  val chao1: GraftOp = GraftOp(
    "text_chao1",
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |f AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
      |g AS (SELECT source,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(c) AS BIGINT) AS n_tok,
      |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
      |    CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2
      |  FROM f GROUP BY 1)
      |SELECT source, n_tok, vocab, f1, f2,
      |  CAST(vocab * 1000000 + f1 * (f1 - 1) * 1000000 // (2 * (f2 + 1)) AS BIGINT)
      |    / 1000000.0 AS chao1,
      |  CAST(f1 * 1000000 // n_tok AS BIGINT) AS unseen_mass_ppm
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val f = tokenized(s, d).select(col("source"), col("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tok"),
        count(when(col("c") === 1, 1)).as("f1"),
        count(when(col("c") === 2, 1)).as("f2"))
      .select(col("source"), col("n_tok"), col("vocab"), col("f1"), col("f2"),
        (expr("CAST(vocab * 1000000 + f1 * (f1 - 1) * 1000000 div (2 * (f2 + 1)) AS BIGINT)")
          / lit(1000000.0)).as("chao1"),
        expr("CAST(f1 * 1000000 div n_tok AS BIGINT)").as("unseen_mass_ppm"))
      .orderBy(col("source"))
  }

  /** Simpson concentration + Berger-Parker dominance per source — the
    * "is this source one giant template or a real vocabulary" reading
    * next to [[chao1]] (richness asks how many species; Simpson asks
    * how EVENLY the mass spreads over them; Berger-Parker is the
    * single-token worst case). The unbiased finite-sample form
    * λ = Σc(c−1)/(N(N−1)) is a pure integer ratio of the same
    * (source, token) frequency frame — both numerator (≤ N² ≈ 2.5e9
    * per source) and the ×10⁶ scaling fit BIGINT comfortably — so
    * both ppms are exact integral divisions and the inverse-Simpson
    * effective-vocabulary size is the single final double. Shares
    * chao1's one token shuffle; margins are |sources|-bounded. */
  val simpson: GraftOp = GraftOp(
    "text_simpson",
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |f AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
      |g AS (SELECT source,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(c) AS BIGINT) AS n_tok,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep2,
      |    CAST(max(c) AS BIGINT) AS c_max
      |  FROM f GROUP BY 1)
      |SELECT source, n_tok, vocab,
      |  CAST(rep2 * 1000000 // (n_tok * (n_tok - 1)) AS BIGINT) AS simpson_ppm,
      |  CAST(c_max * 1000000 // n_tok AS BIGINT) AS berger_parker_ppm,
      |  CASE WHEN rep2 = 0 THEN NULL
      |       ELSE CAST(n_tok AS DOUBLE) * (n_tok - 1) / rep2 END
      |    AS inv_simpson
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val f = tokenized(s, d).select(col("source"), col("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tok"),
        sum(col("c") * (col("c") - 1)).as("rep2"),
        max(col("c")).as("c_max"))
      .select(col("source"), col("n_tok"), col("vocab"),
        expr("CAST(rep2 * 1000000 div (n_tok * (n_tok - 1)) AS BIGINT)").as("simpson_ppm"),
        expr("CAST(c_max * 1000000 div n_tok AS BIGINT)").as("berger_parker_ppm"),
        expr("""CASE WHEN rep2 = 0 THEN NULL
          |     ELSE CAST(n_tok AS DOUBLE) * (n_tok - 1) / rep2 END""".stripMargin)
          .as("inv_simpson"))
      .orderBy(col("source"))
  }

  /** Encoding-damage audit (r8): the mojibake / replacement-char /
    * control-char sweep a web-scale ingest runs before any text op
    * trusts its bytes (UTF-8-as-Latin1 double-decoding is the single
    * most common corpus defect class — the 'â€œ' signature). The clean
    * synthetic corpus carries none of these, so — the etl_csv_extract
    * discipline — damage is PLANTED by a hash rule both engines replay
    * (1-in-20 docs each get one of three disjoint damage classes
    * appended), and the audit must recover exactly the planted set:
    * per source the doc count, flagged count, per-class char hits
    * (replacement chars, C0 controls, 'â€' mojibake digraphs — all
    * counted by literal/class strip length-diffs, no engine-private
    * behavior), and a clean-ppm via exact integer division. Per-doc
    * map + one hash aggregate — linear, zero extra shuffle; detection
    * completeness is spec-pinned (flagged ≡ planted). */
  val utf8Audit: GraftOp = GraftOp(
    "text_utf8_audit",
    s"""WITH dmg AS (
       |  SELECT source,
       |    CASE ${Exprs.sqlMd5Long("concat('enc#', CAST(doc_id AS VARCHAR))")} % 20
       |      WHEN 0 THEN text || ' â€œmojibakeâ€'
       |      WHEN 1 THEN text || '���'
       |      WHEN 2 THEN text || chr(1) || chr(2)
       |      ELSE text END AS t
       |  FROM documents),
       |m AS (
       |  SELECT source,
       |    length(t) - length(replace(t, '�', '')) AS repl_hits,
       |    length(t) - length(regexp_replace(t, '[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS ctrl_hits,
       |    CAST((length(t) - length(replace(t, 'â€', ''))) // 2 AS BIGINT) AS moji_hits
       |  FROM dmg)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (WHERE repl_hits + ctrl_hits + moji_hits > 0) AS BIGINT) AS n_flagged,
       |  CAST(sum(repl_hits) AS BIGINT) AS repl_hits,
       |  CAST(sum(ctrl_hits) AS BIGINT) AS ctrl_hits,
       |  CAST(sum(moji_hits) AS BIGINT) AS moji_hits,
       |  CAST((count(*) - count(*) FILTER (WHERE repl_hits + ctrl_hits + moji_hits > 0)) * 1000000 // count(*) AS BIGINT) AS clean_ppm
       |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    damagedDocs(s, d)
      .select(col("source"),
        (length(col("t")) - length(replace(col("t"), lit("�"), lit("")))).cast(LongType).as("repl_hits"),
        (length(col("t")) - length(regexp_replace(col("t"), "[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))).cast(LongType).as("ctrl_hits"),
        ((length(col("t")) - length(replace(col("t"), lit("â€"), lit("")))).cast(LongType) / 2).cast(LongType).as("moji_hits"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("repl_hits") + col("ctrl_hits") + col("moji_hits") > 0, 1)).as("n_flagged"),
        sum(col("repl_hits")).cast(LongType).as("repl_hits"),
        sum(col("ctrl_hits")).cast(LongType).as("ctrl_hits"),
        sum(col("moji_hits")).cast(LongType).as("moji_hits"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        col("repl_hits"), col("ctrl_hits"), col("moji_hits"),
        expr("(n_docs - n_flagged) * 1000000 div n_docs").as("clean_ppm"))
      .orderBy(col("source"))
  }

  /** Pairwise source-vocabulary overlap (r8): the corpus-mixing
    * diagnostic read before weighting sources into a training mix —
    * two sources with near-identical vocabularies add redundancy, not
    * coverage (the signal text_js_div gives for unigram FREQUENCIES,
    * here for vocabulary SETS, which is what dedup actually keys on).
    * One distinct (source, token) frame, a self-join on token with
    * src_a < src_b — per-token pair cost is bounded by (#sources)²
    * = 400 regardless of corpus size, so the shuffle stays
    * |vocab|-shaped at 100 TB — then |∩| exact BIGINT per pair,
    * |∪| = v_a + v_b − inter by inclusion-exclusion, and Jaccard as
    * exact integer ppm division. Symmetry/bounds spec-pinned. */
  val vocabOverlap: GraftOp = GraftOp(
    "text_vocab_overlap",
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |v AS (SELECT DISTINCT source, tok FROM t),
      |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS vs FROM v GROUP BY 1),
      |pr AS (
      |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS inter
      |  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, sa.vs AS v_a, sb.vs AS v_b, inter,
      |  CAST(inter * 1000000 // (sa.vs + sb.vs - inter) AS BIGINT) AS jaccard_ppm
      |FROM pr JOIN sz sa ON pr.src_a = sa.source JOIN sz sb ON pr.src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val v = tokenized(s, d).select(col("source"), col("tok"))
      .distinct()
    val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("vs"))
    v.as("a").join(v.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("vs").as("v_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("vs").as("v_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"), col("inter"),
        expr("inter * 1000000 div (v_a + v_b - inter)").as("jaccard_ppm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The deterministically damaged corpus [[utf8Audit]] sweeps —
    * exposed for the spec's planted ≡ flagged completeness check. */
  private[graft] def damagedDocs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sel = Exprs.md5Long(concat(lit("enc#"), col("doc_id").cast(StringType))) % 20
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        when(sel === 0, concat(col("text"), lit(" â€œmojibakeâ€")))
          .when(sel === 1, concat(col("text"), lit("���")))
          .when(sel === 2, concat(col("text"), lit("\u0001\u0002")))
          .otherwise(col("text")).as("t"),
        (sel <= 2).as("planted"))
  }


  /** Reliability diagram for [[qualityModel]] — the calibration check
    * a pipeline runs BEFORE trusting the logistic score as a keep
    * threshold (an uncalibrated 0.8 is not an 80% keep rate; the
    * diagram says by how much, per decile). Reference policy = the
    * rule gate `quality_score ≥ 0.55` over [[quality]]'s hash-green
    * score. Both the predicted probability and the rule score are
    * 6dp-snapped BEFORE use, the per-doc prob is micro-snapped to an
    * exact BIGINT for the bucket mean (no cross-row double fold), and
    * every emitted rate is an integral-division ppm. One doc-level
    * map + a ≤10-row aggregate — linear. */
  val calibration: GraftOp = GraftOp(
    "text_calibration",
    s"""WITH t AS (
       |  SELECT doc_id, n_chars, string_split_regex(text, '\\s+') AS toks FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    least(1.0, n_chars / 500.0) AS f_len,
       |    len(list_distinct(toks)) * 1.0 / len(toks) AS f_ttr,
       |    len(list_filter(toks, x -> list_contains($sqlStopList, x))) * 1.0 / len(toks) AS f_stop,
       |    list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b)
       |      * 1.0 / len(toks) / 10.0 AS f_awl
       |  FROM t),
       |z AS (
       |  SELECT doc_id,
       |    round(1.0 / (1.0 + exp(-(1.2 * f_len + 2.0 * f_ttr + 1.5 * f_stop - 0.2 * f_awl - 2.0))), 6) AS prob,
       |    CASE WHEN round(0.3 * f_len + 0.4 * f_ttr + 0.3 * f_stop, 6) >= 0.55
       |         THEN 1 ELSE 0 END AS actual
       |  FROM f),
       |b AS (
       |  SELECT CAST(least(floor(prob * 10.0), 9) AS INT) AS bucket,
       |    CAST(round(prob * 1000000) AS BIGINT) AS pm, actual
       |  FROM z)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pm) // count(*) AS BIGINT) AS mean_pred_ppm,
       |  CAST(sum(actual) * 1000000 // count(*) AS BIGINT) AS actual_pos_ppm,
       |  CAST(abs(sum(pm) // count(*) - sum(actual) * 1000000 // count(*)) AS BIGINT)
       |    AS gap_ppm
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val fAwl = aggregate(transform(col("toks"), x => length(x)), lit(0), (a, b) => a + b) *
      lit(1.0) / size(col("toks")) / 10.0
    val zc = lit(1.2) * fLen + lit(2.0) * fTtr + lit(1.5) * fStop - lit(0.2) * fAwl - 2.0
    val prob = round(lit(1.0) / (lit(1.0) + exp(-zc)), 6)
    val actual = when(round(qualityScoreExpr, 6) >= 0.55, 1).otherwise(0)
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), tokens.as("toks"))
      .select(prob.as("prob"), actual.as("actual"))
      .select(expr("CAST(least(floor(prob * 10.0), 9) AS INT)").as("bucket"),
        expr("CAST(round(prob * 1000000) AS BIGINT)").as("pm"),
        col("actual"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pm")).as("spm"),
        sum(col("actual")).as("sa"))
      .select(col("bucket"), col("n_docs"),
        expr("CAST(spm div n_docs AS BIGINT)").as("mean_pred_ppm"),
        expr("CAST(sa * 1000000 div n_docs AS BIGINT)").as("actual_pos_ppm"),
        expr("CAST(abs(spm div n_docs - sa * 1000000 div n_docs) AS BIGINT)").as("gap_ppm"))
      .orderBy(col("bucket"))
  }

  /** Per-source character-class census: alpha / digit / whitespace /
    * other counts and exact ppm shares — the cheapest structural
    * fingerprint of a slice (code dumps run digit+punct heavy, tables
    * whitespace heavy, prose alpha heavy), the gate a mixing pipeline
    * reads before trusting `source` labels. Three linear regex passes
    * per document with EXPLICIT character classes (never \\s or \\w —
    * Java and RE2 disagree on their edges), all counts exact BIGINTs,
    * shares integral-division ppm floors. One |sources|-row
    * aggregate. */
  val charClasses: GraftOp = GraftOp(
    "text_char_classes",
    """WITH d AS (
      |  SELECT source, CAST(length(text) AS BIGINT) AS n,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS al,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS dg,
      |    CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS BIGINT) AS ws
      |  FROM documents),
      |g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n) AS BIGINT) AS n_chars, CAST(sum(al) AS BIGINT) AS n_alpha,
      |    CAST(sum(dg) AS BIGINT) AS n_digit, CAST(sum(ws) AS BIGINT) AS n_space
      |  FROM d GROUP BY 1)
      |SELECT source, n_docs, n_chars, n_alpha, n_digit, n_space,
      |  n_chars - n_alpha - n_digit - n_space AS n_other,
      |  CAST(n_alpha * 1000000 // n_chars AS BIGINT) AS alpha_ppm,
      |  CAST(n_digit * 1000000 // n_chars AS BIGINT) AS digit_ppm,
      |  CAST((n_chars - n_alpha - n_digit - n_space) * 1000000 // n_chars AS BIGINT)
      |    AS other_ppm
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val doc = Tables.documents(s, d)
      .select(col("source"), length(col("text")).cast(LongType).as("n"),
        (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z]", "")))
          .cast(LongType).as("al"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast(LongType).as("dg"),
        (length(col("text")) - length(regexp_replace(col("text"), "[ \t\n\r]", "")))
          .cast(LongType).as("ws"))
    doc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_chars"),
        sum(col("al")).as("n_alpha"), sum(col("dg")).as("n_digit"),
        sum(col("ws")).as("n_space"))
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_alpha"),
        col("n_digit"), col("n_space"),
        (col("n_chars") - col("n_alpha") - col("n_digit") - col("n_space")).as("n_other"),
        expr("CAST(n_alpha * 1000000 div n_chars AS BIGINT)").as("alpha_ppm"),
        expr("CAST(n_digit * 1000000 div n_chars AS BIGINT)").as("digit_ppm"),
        expr("""CAST((n_chars - n_alpha - n_digit - n_space) * 1000000 div n_chars
          | AS BIGINT)""".stripMargin).as("other_ppm"))
      .orderBy(col("source"))
  }

  /** Dunning log-likelihood (G²) keyword extraction per source — the
    * statistically-grounded "what words characterize this slice"
    * readout (Dunning 1993), stronger than raw lift for rare tokens
    * and the standard corpus-comparison tool. Candidate keywords are
    * selected by EXACT integer criteria (a ≥ 5 occurrences in the
    * source and lift ≥ 1.2 as 5·a·N ≥ 6·r_a·c_a, products in
    * DECIMAL(38)/HUGEINT — the synthetic sources share most of one
    * vocabulary, so lifts sit near 1 and regress toward it as the
    * corpus grows)
    * so the emitted ROW SET can never flip on a 1-ulp double; G² is
    * then the written-out 4-cell formula with each x·ln(x·N/(row·col))
    * term 6dp-snapped (ln is libm — the snap-then-consume rescue).
    * The (source, token) agg is the text_top_tokens shuffle shape. */
  val g2Keywords: GraftOp = GraftOp(
    "text_g2_keywords",
    """WITH st AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS a
      |  FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |ct AS (SELECT tok, CAST(sum(a) AS BIGINT) AS ca FROM st GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(a) AS BIGINT) AS ra FROM st GROUP BY 1),
      |n AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM st),
      |k AS (
      |  SELECT st.source, st.tok, st.a, ct.ca, ns.ra, n.n,
      |    ns.ra - st.a AS b, ct.ca - st.a AS c, n.n - ns.ra - ct.ca + st.a AS dd
      |  FROM st JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN n
      |  WHERE st.a >= 5 AND 5 * CAST(st.a AS HUGEINT) * n.n >= 6 * CAST(ns.ra AS HUGEINT) * ct.ca)
      |SELECT source, tok, a AS n_in_source, ca AS n_corpus,
      |  CAST(CAST(a AS HUGEINT) * n * 1000000 // (CAST(ra AS HUGEINT) * ca) AS BIGINT)
      |    AS lift_ppm,
      |  2 * (round(CASE WHEN a = 0 THEN 0 ELSE a * ln(CAST(a AS DOUBLE) * n / (CAST(ra AS DOUBLE) * ca)) END, 6)
      |     + round(CASE WHEN b = 0 THEN 0 ELSE b * ln(CAST(b AS DOUBLE) * n / (CAST(ra AS DOUBLE) * (n - ca))) END, 6)
      |     + round(CASE WHEN c = 0 THEN 0 ELSE c * ln(CAST(c AS DOUBLE) * n / (CAST(n - ra AS DOUBLE) * ca)) END, 6)
      |     + round(CASE WHEN dd = 0 THEN 0 ELSE dd * ln(CAST(dd AS DOUBLE) * n / (CAST(n - ra AS DOUBLE) * (n - ca))) END, 6))
      |    AS g2
      |FROM k ORDER BY source, tok""".stripMargin) { (s, d) =>
    val st = tokenized(s, d).select(col("source"), col("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("a"))
    val ct = st.groupBy(col("tok")).agg(sum(col("a")).as("ca"))
    val ns = broadcast(st.groupBy(col("source")).agg(sum(col("a")).as("ra")))
    val n = broadcast(st.agg(sum(col("a")).as("n")))
    st.join(ct, Seq("tok")).join(ns, Seq("source")).crossJoin(n)
      .filter(col("a") >= 5 &&
        col("a").cast(DecimalType(38, 0)) * col("n") * 5 >=
          col("ra").cast(DecimalType(38, 0)) * col("ca") * 6)
      .withColumn("b", col("ra") - col("a"))
      .withColumn("c", col("ca") - col("a"))
      .withColumn("dd", col("n") - col("ra") - col("ca") + col("a"))
      .select(col("source"), col("tok"), col("a").as("n_in_source"),
        col("ca").as("n_corpus"),
        expr("""CAST(CAST(a AS DECIMAL(38,0)) * n * 1000000
          | div (CAST(ra AS DECIMAL(38,0)) * ca) AS BIGINT)""".stripMargin).as("lift_ppm"),
        expr("""2 * (round(CASE WHEN a = 0 THEN 0 ELSE a * ln(CAST(a AS DOUBLE) * n / (CAST(ra AS DOUBLE) * ca)) END, 6)
          |   + round(CASE WHEN b = 0 THEN 0 ELSE b * ln(CAST(b AS DOUBLE) * n / (CAST(ra AS DOUBLE) * (n - ca))) END, 6)
          |   + round(CASE WHEN c = 0 THEN 0 ELSE c * ln(CAST(c AS DOUBLE) * n / (CAST(n - ra AS DOUBLE) * ca)) END, 6)
          |   + round(CASE WHEN dd = 0 THEN 0 ELSE dd * ln(CAST(dd AS DOUBLE) * n / (CAST(n - ra AS DOUBLE) * (n - ca))) END, 6))""".stripMargin)
          .as("g2"))
      .orderBy(col("source"), col("tok"))
  }

  val ops: Seq[GraftOp] =
    Seq(quality, langId, tokenCount, fingerprint, topTokens, repetition, topBigrams, pmi, bm25, qualityModel, curriculum, mixEntropy, tfidf,
      decontam, piiRedact, normalize, chunks, rarityTiers, hashingTf, lmScore, zipf,
      readability, jsDivergence, ttr, compressionRatio, novelty, heaps, winnowing, chao1,
      langConfusion, utf8Audit, vocabOverlap, simpson, calibration, charClasses, g2Keywords)
}
