package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second text-analysis tier (round 9, continued): per-term corpus
  * distribution diagnostics over the exact top-terms frame — Church &
  * Gale burstiness (within-document clumping) and Gries' deviation of
  * proportions (across-source evenness). Together they answer the two
  * sides of "is this term's frequency trustworthy": a bursty term owes
  * its count to few documents; a high-DP term owes it to few sources.
  * [[TextOps]]'s `text_js_div` gives the per-SOURCE divergence view;
  * these give the per-TERM view on the same tokenization.
  *
  * Determinism: term membership in the top-K frame is decided by
  * exact integer (tf, tok) ordering; every emitted ratio is an exact
  * floor-ppm/micro integral division — no doubles anywhere. */
object TextOps2 {

  private def tokens: Column = split(col("text"), "\\s+")

  /** Church-Gale burstiness of the exact top-20 corpus terms:
    * tf/df — the mean occurrences per CONTAINING document (micro
    * units) plus document coverage (ppm). A frequent term carried by
    * few documents (high burstiness, low df share) inflates corpus
    * counts without corpus coverage — the classic boilerplate /
    * spam-phrase tell a dedup pass should then look at. One token
    * explode, one (term, tf, df) aggregate; the top-K set is an exact
    * integer decision (tf DESC, tok). */
  val termBurstiness: GraftOp = GraftOp(
    "text_term_burstiness",
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |g AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS tf,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM t GROUP BY 1),
      |top AS (SELECT tok, tf, df FROM g ORDER BY tf DESC, tok LIMIT 20),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      |SELECT tok, tf, df,
      |  CAST(tf * 1000000 // df AS BIGINT) AS burstiness_micro,
      |  CAST(df * 1000000 // n_docs AS BIGINT) AS doc_coverage_ppm
      |FROM top, nd ORDER BY tf DESC, tok""".stripMargin) { (s, d) =>
    val t = TextOps.tokenized(s, d).select(col("doc_id"), col("tok"))
    val g = t.groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val top = g.orderBy(col("tf").desc, col("tok")).limit(20)
    val nd = broadcast(Tables.documents(s, d).agg(count(lit(1)).as("n_docs")))
    top.crossJoin(nd)
      .select(col("tok"), col("tf"), col("df"),
        expr("CAST(tf * 1000000 div df AS BIGINT)").as("burstiness_micro"),
        expr("CAST(df * 1000000 div n_docs AS BIGINT)").as("doc_coverage_ppm"))
      .orderBy(col("tf").desc, col("tok"))
  }

  /** Gries' deviation of proportions (DP) for the same exact top-20
    * terms: DP = ½·Σ_sources |term share in source − source's token
    * share|, 0 = the term is spread exactly like the corpus, →1 = it
    * lives in one source. The corpus-design readout: a pretraining
    * mix that "contains" a domain only via one source scores high DP
    * on that domain's vocabulary — q_js_div flags WHICH source
    * diverges, DP flags which TERMS. Both shares are ppm-snapped by
    * exact integral division and the |·| fold is an exact integer sum
    * over the bounded source domain (missing (term, source) cells
    * enter as exact zero via the domain cross join). */
  val termDispersion: GraftOp = GraftOp(
    "text_term_dispersion",
    """WITH t AS (
      |  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |g AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1),
      |top AS (SELECT tok, tf FROM g ORDER BY tf DESC, tok LIMIT 20),
      |src AS (SELECT source, CAST(count(*) AS BIGINT) AS stoks FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(stoks) AS BIGINT) AS tot FROM src),
      |cell AS (
      |  SELECT t.tok, t.source, CAST(count(*) AS BIGINT) AS cnt
      |  FROM t JOIN top ON t.tok = top.tok GROUP BY 1, 2),
      |dp AS (
      |  SELECT top.tok, top.tf,
      |    CAST(sum(abs(coalesce(cell.cnt, 0) * 1000000 // top.tf
      |                 - src.stoks * 1000000 // tot.tot)) AS BIGINT) AS sad_ppm
      |  FROM top CROSS JOIN src
      |  LEFT JOIN cell ON cell.tok = top.tok AND cell.source = src.source
      |  CROSS JOIN tot
      |  GROUP BY 1, 2)
      |SELECT tok, tf, CAST(sad_ppm // 2 AS BIGINT) AS dp_ppm
      |FROM dp ORDER BY tf DESC, tok""".stripMargin) { (s, d) =>
    val t = TextOps.tokenized(s, d).select(col("source"), col("tok"))
    val g = t.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val top = broadcast(g.orderBy(col("tf").desc, col("tok")).limit(20))
    val src = broadcast(t.groupBy(col("source")).agg(count(lit(1)).as("stoks")))
    val tot = broadcast(src.agg(sum(col("stoks")).as("tot")))
    val cell = t.join(top.select(col("tok")), Seq("tok"))
      .groupBy(col("tok"), col("source")).agg(count(lit(1)).as("cnt"))
    top.crossJoin(src)
      .join(cell, Seq("tok", "source"), "left")
      .crossJoin(tot)
      .groupBy(col("tok"), col("tf"))
      .agg(sum(abs(
        expr("coalesce(cnt, 0) * 1000000 div tf")
          - expr("stoks * 1000000 div tot"))).as("sad_ppm"))
      .select(col("tok"), col("tf"),
        expr("CAST(sad_ppm div 2 AS BIGINT)").as("dp_ppm"))
      .orderBy(col("tf").desc, col("tok"))
  }

  /** Cohen's kappa for the language-ID heuristic vs the labeled lang
    * column — the chance-corrected single number the
    * `text_lang_confusion` matrix rolls up to (raw agreement flatters
    * a classifier that just predicts the majority class; kappa
    * subtracts the agreement luck would get). On the exact confusion
    * frame: κ = (N·Σdiag − Σₖ rowₖ·colₖ)/(N² − Σₖ rowₖ·colₖ) — all
    * exact integers (the cross products fold in DECIMAL(38)/HUGEINT
    * since they scale n²) into ONE double divide; observed and
    * expected agreement emitted as deterministic doubles from the
    * same integers. */
  val langKappa: GraftOp = GraftOp(
    "text_lang_kappa",
    s"""WITH p AS (SELECT lang, lang_pred FROM (${TextOps.langId.oracle.get}) x),
       |cm AS (SELECT lang AS actual, lang_pred AS predicted,
       |       CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
       |t AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nt,
       |    CAST(sum(CASE WHEN actual = predicted THEN n ELSE 0 END) AS BIGINT) AS diag
       |  FROM cm),
       |rc AS (
       |  SELECT CAST(sum(CAST(r.row_n AS HUGEINT) * c.col_n) AS HUGEINT) AS src
       |  FROM (SELECT actual AS k, CAST(sum(n) AS BIGINT) AS row_n FROM cm GROUP BY 1) r
       |  JOIN (SELECT predicted AS k, CAST(sum(n) AS BIGINT) AS col_n FROM cm GROUP BY 1) c
       |    ON r.k = c.k)
       |SELECT t.nt AS n, t.diag AS n_agree,
       |  CAST(t.diag AS DOUBLE) / t.nt AS p_observed,
       |  CAST(rc.src AS DOUBLE) / CAST(CAST(t.nt AS HUGEINT) * t.nt AS DOUBLE) AS p_expected,
       |  CAST(CAST(t.nt AS HUGEINT) * t.diag - rc.src AS DOUBLE)
       |    / CAST(CAST(t.nt AS HUGEINT) * t.nt - rc.src AS DOUBLE) AS kappa
       |FROM t, rc""".stripMargin) { (s, d) =>
    val p = TextOps.langId.run(s, d).select(col("lang"), col("lang_pred"))
    val cm = p.groupBy(col("lang").as("actual"), col("lang_pred").as("predicted"))
      .agg(count(lit(1)).as("n"))
    val t = broadcast(cm.agg(sum(col("n")).as("nt"),
      sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L)).as("diag")))
    val r = cm.groupBy(col("actual").as("k")).agg(sum(col("n")).as("row_n"))
    val c = cm.groupBy(col("predicted").as("k")).agg(sum(col("n")).as("col_n"))
    val rc = broadcast(r.join(c, Seq("k"))
      .agg(sum(col("row_n").cast(DecimalType(38, 0)) * col("col_n")).as("src")))
    t.crossJoin(rc)
      .select(col("nt").as("n"), col("diag").as("n_agree"),
        expr("CAST(diag AS DOUBLE) / nt").as("p_observed"),
        expr("CAST(src AS DOUBLE) / CAST(CAST(nt AS DECIMAL(38,0)) * nt AS DOUBLE)").as("p_expected"),
        expr("""CAST(CAST(nt AS DECIMAL(38,0)) * diag - src AS DOUBLE)
          |  / CAST(CAST(nt AS DECIMAL(38,0)) * nt - src AS DOUBLE)""".stripMargin).as("kappa"))
  }

  /** Gopher quality-rule gate (Rae et al. 2021 §A1.1) — the
    * published rule set a pretraining pipeline actually names, as a
    * per-source census: word count ∈ [50, 100k], mean word length
    * ∈ [3, 10], ellipsis-to-word ratio < 0.1, stopword fraction
    * ≥ 0.06, ≥ 80% of words alphabetic. EVERY rule is decided by
    * exact integer CROSS-MULTIPLICATION on token/char counts (3·wc ≤
    * Σlen ≤ 10·wc, stop·100 ≥ 6·wc, alpha·5 ≥ 4·wc, ell·10 < wc) —
    * no ratio is ever materialized as a double, so no gate can flip
    * on a ulp. Emits per-source rule-level pass counts and the
    * all-rules pass rate (ppm). One linear pass. */
  val gopherGate: GraftOp = GraftOp(
    "text_gopher_gate",
    s"""WITH t AS (
       |  SELECT source, string_split_regex(text, '\\s+') AS toks, text FROM documents),
       |m AS (
       |  SELECT source,
       |    CAST(len(toks) AS BIGINT) AS wc,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b)
       |      AS BIGINT) AS chars,
       |    CAST(len(list_filter(toks, x -> list_contains(${TextOps.sqlStopList}, x)))
       |      AS BIGINT) AS stops,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
       |      AS alpha,
       |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS ell
       |  FROM t),
       |r AS (
       |  SELECT source,
       |    CASE WHEN wc BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_wc,
       |    CASE WHEN 3 * wc <= chars AND chars <= 10 * wc THEN 1 ELSE 0 END AS r_wlen,
       |    CASE WHEN ell * 10 < wc THEN 1 ELSE 0 END AS r_ell,
       |    CASE WHEN stops * 100 >= 6 * wc THEN 1 ELSE 0 END AS r_stop,
       |    CASE WHEN alpha * 5 >= 4 * wc THEN 1 ELSE 0 END AS r_alpha
       |  FROM m)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(r_wc) AS BIGINT) AS pass_word_count,
       |  CAST(sum(r_wlen) AS BIGINT) AS pass_word_length,
       |  CAST(sum(r_ell) AS BIGINT) AS pass_ellipsis,
       |  CAST(sum(r_stop) AS BIGINT) AS pass_stopwords,
       |  CAST(sum(r_alpha) AS BIGINT) AS pass_alpha,
       |  CAST(sum(r_wc * r_wlen * r_ell * r_stop * r_alpha) AS BIGINT) AS pass_all,
       |  CAST(sum(r_wc * r_wlen * r_ell * r_stop * r_alpha) * 1000000 // count(*)
       |    AS BIGINT) AS pass_all_ppm
       |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    val m = Tables.documents(s, d)
      .select(col("source"), tokens.as("toks"), col("text"))
      .select(col("source"),
        size(col("toks")).cast(LongType).as("wc"),
        expr("CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS BIGINT)").as("chars"),
        size(filter(col("toks"), x => array_contains(stopArr, x)))
          .cast(LongType).as("stops"),
        expr("CAST(size(filter(toks, x -> x rlike '[A-Za-z]')) AS BIGINT)").as("alpha"),
        expr("CAST((length(text) - length(replace(text, '...', ''))) div 3 AS BIGINT)")
          .as("ell"))
    val r = m.select(col("source"),
      when(col("wc").between(50, 100000), 1).otherwise(0).as("r_wc"),
      when(lit(3) * col("wc") <= col("chars") && col("chars") <= lit(10) * col("wc"), 1)
        .otherwise(0).as("r_wlen"),
      when(col("ell") * 10 < col("wc"), 1).otherwise(0).as("r_ell"),
      when(col("stops") * 100 >= col("wc") * 6, 1).otherwise(0).as("r_stop"),
      when(col("alpha") * 5 >= col("wc") * 4, 1).otherwise(0).as("r_alpha"))
    r.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_wc")).as("pass_word_count"),
        sum(col("r_wlen")).as("pass_word_length"),
        sum(col("r_ell")).as("pass_ellipsis"),
        sum(col("r_stop")).as("pass_stopwords"),
        sum(col("r_alpha")).as("pass_alpha"),
        sum(col("r_wc") * col("r_wlen") * col("r_ell") * col("r_stop") * col("r_alpha"))
          .as("pass_all"))
      .select(col("source"), col("n_docs"), col("pass_word_count"),
        col("pass_word_length"), col("pass_ellipsis"), col("pass_stopwords"),
        col("pass_alpha"), col("pass_all"),
        expr("CAST(pass_all * 1000000 div n_docs AS BIGINT)").as("pass_all_ppm"))
      .orderBy(col("source"))
  }

  /** Tokenizer-cost census per source (r10): subword FERTILITY
    * (estimated subword tokens per whitespace word — the HuggingFace
    * tokenizer-efficiency metric) and compression (chars per subword
    * token), using the SAME ceil(len/4) subword estimator as
    * text_tokens so the two readouts share a tokenization. A source
    * whose fertility runs high (long/rare words fragmenting into many
    * pieces) costs proportionally more training budget per word — the
    * number a mixture planner (sample_doremi, sample_mixture) prices
    * against. ALL-INTEGER: the three per-source sums fold exactly and
    * both ratios are floor-ppm integral divisions; one linear pass,
    * |sources| result rows at any corpus size. */
  val fertility: GraftOp = GraftOp(
    "text_fertility",
    """WITH t AS (
      |  SELECT source, n_chars,
      |    string_split_regex(text, '\s+') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT source, n_chars,
      |    len(toks) AS n_ws,
      |    CAST(list_reduce(list_prepend(0, list_transform(toks,
      |      x -> CAST(ceil(length(x) / 4.0) AS INT))), (a, b) -> a + b) AS BIGINT) AS n_sub
      |  FROM t),
      |g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |    CAST(sum(n_ws) AS BIGINT) AS total_words,
      |    CAST(sum(n_sub) AS BIGINT) AS total_subwords
      |  FROM p GROUP BY 1)
      |SELECT source, n_docs, total_words, total_subwords,
      |  CAST(CAST(total_subwords AS HUGEINT) * 1000000 // total_words AS BIGINT)
      |    AS fertility_ppm,
      |  CAST(CAST(total_chars AS HUGEINT) * 1000000 // total_subwords AS BIGINT)
      |    AS chars_per_token_ppm
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val p = Tables.documents(s, d)
      .select(col("source"), col("n_chars"), tokens.as("toks"))
      .select(col("source"), col("n_chars"),
        size(col("toks")).as("n_ws"),
        aggregate(transform(col("toks"), x => ceil(length(x) / 4.0).cast(IntegerType)),
          lit(0), (a, b) => a + b).cast(LongType).as("n_sub"))
    p.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("total_chars"),
        sum(col("n_ws")).cast(LongType).as("total_words"),
        sum(col("n_sub")).cast(LongType).as("total_subwords"))
      .select(col("source"), col("n_docs"), col("total_words"), col("total_subwords"),
        expr("""CAST(CAST(total_subwords AS DECIMAL(38,0)) * 1000000
          |  div total_words AS BIGINT)""".stripMargin).as("fertility_ppm"),
        expr("""CAST(CAST(total_chars AS DECIMAL(38,0)) * 1000000
          |  div total_subwords AS BIGINT)""".stripMargin).as("chars_per_token_ppm"))
      .orderBy(col("source"))
  }

  /** SpaceSaving heavy-hitters GUARANTEE audit — the oracle leg the
    * sketch family was missing (SpaceSaving itself was spec-only,
    * SURVEY §2f 37c). Why the sketch's per-item STATE cannot get the
    * q_kll treatment (adjudication, r13): KLL's deterministic corner
    * works because its compaction schedule is a function of n ALONE —
    * O(k·log n) driver state replays it with no data. SpaceSaving's
    * counters are a function of the ENTIRE census: even fed in a
    * deterministic (count ASC, token) order, the eviction sequence is
    * a priority-queue fold over every distinct token (the consumed-min
    * sequence has no prefix-sum closed form — each admission re-inserts
    * m+n_j into the live set), and which TOKEN holds which counter is
    * ambiguous under est-value ties. An order-free replay therefore
    * requires the exact census — at which point the exact top-k
    * (text_top_tokens) is already the answer. What IS order-free and
    * merge-shape-free are the sketch's THEOREMS, so this op
    * oracle-checks those, the q_tdigest_bounds pattern:
    *
    *  - `n_tracked = min(vocab, capacity)` — union-merge never loses
    *    slots below capacity;
    *  - `all_est_ge_true` — every tracked estimate dominates the true
    *    count (induction: absent items enter a merge at the partial's
    *    min, which bounds any evicted item's true mass);
    *  - `all_est_le_total` — no estimate exceeds the stream length
    *    (each partial's counters sum to its partition count).
    *
    * A sketch bug flips a boolean and the DuckDB hash-compare goes
    * red; the exact top-1 token rides along as the deterministic
    * anchor. The sketch runs genuinely distributed (per-partition
    * typed aggregation, union merge); the single finished summary
    * (≤ capacity pairs) is the op's only driver state. */
  val topkSketchAudit: GraftOp = GraftOp(
    "text_topk_sketch",
    """WITH t AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
      |g AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
      |             CAST(count(*) AS BIGINT) AS vocab FROM c),
      |top1 AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 1)
      |SELECT g.n_total, g.vocab, 16 AS capacity,
      |  CAST(least(g.vocab, 16) AS BIGINT) AS n_tracked,
      |  true AS all_est_ge_true, true AS all_est_le_total,
      |  top1.tok AS top1_token, top1.n AS top1_count
      |FROM g CROSS JOIN top1""".stripMargin) { (s, d) =>
    import s.implicits._
    val cap = 16
    val toks = TextOps.tokenized(s, d).select(col("tok")).as[String]
    // genuinely distributed: per-partition sketches, union merge; the
    // finished summary is <= cap pairs — bounded driver state
    val pairs: Seq[(String, Long)] =
      toks.select(new graft.functions.SpaceSavingTopK(cap, cap).toColumn).head()
    val est = pairs.toDF("tok", "est")
    val census = TextOps.tokenized(s, d).groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val audit = census.join(broadcast(est), Seq("tok"), "left")
      .agg(sum(col("n")).as("n_total"), count(lit(1)).as("vocab"),
        sum(when(col("est").isNotNull, 1L).otherwise(0L)).as("n_tracked"),
        min(when(col("est").isNotNull, col("est") >= col("n"))).as("all_est_ge_true"))
      .withColumn("all_est_le_total",
        lit(pairs.map(_._2).maxOption.getOrElse(0L)) <= col("n_total"))
    val top1 = census.orderBy(col("n").desc, col("tok")).limit(1)
      .select(col("tok").as("top1_token"), col("n").as("top1_count"))
    audit.crossJoin(broadcast(top1))
      .select(col("n_total"), col("vocab"), lit(cap).as("capacity"),
        col("n_tracked"), col("all_est_ge_true"), col("all_est_le_total"),
        col("top1_token"), col("top1_count"))
  }

  /** BPE tokenizer training, three merge rounds (Sennrich et al.
    * 2016) — the LLM-pipeline primitive the text family lacked: learn
    * the top byte-pair merges from the corpus' frequency-weighted
    * vocabulary. Classic BPE trains on the WORD-FREQUENCY table (not
    * the corpus stream), so every round is dictionary-sized
    * (Heaps-law sublinear): words start as space-joined character
    * symbols; each round counts adjacent symbol pairs weighted by
    * word frequency (exact integers), picks the argmax pair by
    * (count DESC, pair ASC), and applies the merge greedily
    * left-to-right via a string FOLD whose step appends the right
    * symbol WITHOUT its separator when the accumulator's tail symbol
    * equals the merge's left side — non-overlapping occurrences merge
    * exactly as BPE defines ("a a a" under (a,a) → "aa a"), and the
    * space-delimited suffix test cannot false-match inside a longer
    * symbol. Both engines run the same fold (Spark `aggregate`,
    * DuckDB `list_reduce` with the prepend-init idiom) over the same
    * exact-integer argmax, so the learned merges, their counts, and
    * the per-round distinct-symbol census hash-match. Emits one row
    * per round: (round, merge_left, merge_right, pair_count,
    * vocab_after).
    *
    * Scale shape: one corpus pass for the word-frequency table (the
    * shared token frame), then every round is a |vocab|-row pair
    * aggregate, a 1-row argmax broadcast back, and a per-word fold —
    * the structure a full 32k-merge trainer loops; three rounds are
    * unrolled here for the deterministic-oracle contract (the doremi
    * 3-round discipline). */
  // ---- BPE internals shared by text_bpe_learn / text_bpe_apply ----

  // the greedy-merge fold step, generated once for both engines
  // (QuantileExact's one-source discipline): `ew` is the engine's
  // ends_with spelling, ml/mr the merge columns in scope
  private def bpeFoldStep(ew: String): String =
    s"""CASE WHEN acc = '' THEN x
       |     WHEN (acc = ml OR $ew(acc, ' ' || ml)) AND x = mr THEN acc || mr
       |     ELSE acc || ' ' || x END""".stripMargin
  private val bpeSparkFold =
    s"aggregate(split(sym, ' '), '', (acc, x) -> ${bpeFoldStep("endswith")})"
  private val bpeDuckFold =
    s"list_reduce(list_prepend('', string_split(sym, ' ')), (acc, x) -> ${bpeFoldStep("ends_with")})"

  /** DuckDB CTE chain t, w0, s0, p1..v3 — the whole 3-round training
    * pipeline; s3 is the merged per-word symbol table. */
  private def duckBpeCtes: String = {
    def duckRound(r: Int): String =
      s"""p$r AS (
         |  SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(ss)), i -> [ss[i], ss[i+1]])) AS p
         |    FROM (SELECT freq, string_split(sym, ' ') AS ss FROM s${r - 1})
         |    WHERE len(ss) >= 2)
         |  GROUP BY 1, 2),
         |m$r AS (SELECT a AS ml, b AS mr, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |s$r AS (SELECT tok, freq, $bpeDuckFold AS sym FROM s${r - 1} CROSS JOIN m$r),
         |v$r AS (
         |  SELECT CAST(count(DISTINCT sm) AS BIGINT) AS vocab
         |  FROM (SELECT unnest(string_split(sym, ' ')) AS sm FROM s$r))""".stripMargin
    s"""t AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       |w0 AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY tok),
       |s0 AS (
       |  SELECT tok, freq,
       |    array_to_string(list_filter(string_split_regex(tok, ''), c -> c <> ''), ' ') AS sym
       |  FROM w0),
       |${duckRound(1)},
       |${duckRound(2)},
       |${duckRound(3)}""".stripMargin
  }

  /** Spark-side 3-round training: per-round (merge row, symbol table
    * after the merge); `_2.last` is the fully-merged per-word table
    * (tok, freq, sym). Mirrors [[duckBpeCtes]]. */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String)
      : Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = {
    val w0 = TextOps.tokenized(s, d).groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val s0 = w0.select(col("tok"), col("freq"),
      array_join(filter(split(col("tok"), ""), x => x =!= ""), " ").as("sym"))
    def pairCounts(sf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = sf
      .select(col("freq"), split(col("sym"), " ").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(ss) - 1), i -> struct(element_at(ss, i) AS a, element_at(ss, i + 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
    def best(p: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      p.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .select(col("a").as("ml"), col("b").as("mr"), col("cnt"))
    var state = s0
    (1 to 3).map { _ =>
      val m = best(pairCounts(state)).localCheckpoint()
      state = state.crossJoin(broadcast(m))
        .select(col("tok"), col("freq"), expr(bpeSparkFold).as("sym"))
        .localCheckpoint()
      (m, state)
    }
  }

  val bpeLearn: GraftOp = GraftOp(
    "text_bpe_learn",
    s"""WITH $duckBpeCtes
       |SELECT * FROM (
       |  SELECT 1 AS round, ml AS merge_left, mr AS merge_right, cnt AS pair_count,
       |    (SELECT vocab FROM v1) AS vocab_after FROM m1
       |  UNION ALL
       |  SELECT 2, ml, mr, cnt, (SELECT vocab FROM v2) FROM m2
       |  UNION ALL
       |  SELECT 3, ml, mr, cnt, (SELECT vocab FROM v3) FROM m3)
       |ORDER BY round""".stripMargin) { (s, d) =>
    def vocabOf(sf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      sf.select(explode(split(col("sym"), " ")).as("sm"))
        .agg(countDistinct(col("sm")).as("vocab"))
    val rows = bpeTrain(s, d).zipWithIndex.map { case ((m, state), i) =>
      m.crossJoin(broadcast(vocabOf(state)))
        .select(lit(i + 1).as("round"), col("ml").as("merge_left"),
          col("mr").as("merge_right"), col("cnt").as("pair_count"),
          col("vocab").as("vocab_after"))
    }
    rows.reduce(_.unionByName(_)).orderBy(col("round"))
  }

  /** Apply the learned BPE merges back to the corpus — the tokenizer-
    * EVALUATION half of [[bpeLearn]] (its fertility/compression
    * readout, per source): every corpus token count joins the merged
    * per-word symbol table, so per source the op emits exact words,
    * pre-BPE symbol count (= characters), post-merge symbol count and
    * the ppm compression the three merges bought. The corpus-side
    * work is the word-frequency join (dictionary-sized build side,
    * broadcast); all counts fold as exact integers. */
  val bpeApply: GraftOp = GraftOp(
    "text_bpe_apply",
    s"""WITH $duckBpeCtes,
       |ts AS (
       |  SELECT source, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       |wc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n FROM ts GROUP BY 1, 2),
       |j AS (
       |  SELECT wc.source, wc.n,
       |    CAST(len(string_split(s0.sym, ' ')) AS BIGINT) AS chars0,
       |    CAST(len(string_split(s3.sym, ' ')) AS BIGINT) AS syms3
       |  FROM wc JOIN s0 ON s0.tok = wc.tok JOIN s3 ON s3.tok = wc.tok)
       |SELECT source, CAST(sum(n) AS BIGINT) AS words,
       |  CAST(sum(n * chars0) AS BIGINT) AS symbols_before,
       |  CAST(sum(n * syms3) AS BIGINT) AS symbols_after,
       |  CAST((sum(n * chars0) - sum(n * syms3)) * 1000000 // sum(n * chars0) AS BIGINT)
       |    AS saved_ppm
       |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val merged = bpeTrain(s, d).last._2
      .select(col("tok"),
        size(filter(split(col("tok"), ""), x => x =!= "")).as("chars0"),
        size(split(col("sym"), " ")).as("syms3"))
    val wc = TextOps.tokenized(s, d)
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
    wc.join(broadcast(merged), "tok")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("words"),
        sum(col("n") * col("chars0")).as("symbols_before"),
        sum(col("n") * col("syms3")).as("symbols_after"))
      .select(col("source"), col("words"), col("symbols_before"), col("symbols_after"),
        expr("(symbols_before - symbols_after) * 1000000 div symbols_before").as("saved_ppm"))
      .orderBy(col("source"))
  }

  val ops: Seq[GraftOp] =
    Seq(termBurstiness, termDispersion, langKappa, gopherGate, fertility, topkSketchAudit,
      bpeLearn, bpeApply)
}
