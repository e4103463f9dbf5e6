package graft.operators

import graft.GraftOp
import graft.functions.Exprs
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third text-analysis tier (round 14): corpus-COVERAGE and
  * cross-source DISTRIBUTION diagnostics — the vocabulary-saturation
  * and mixing-drift readouts the r5–r13 text surface (richness:
  * Chao1/Heaps/Zipf; drift: JS/PSI; overlap: vocab/decontam) still
  * lacked:
  *
  *  - Good-Turing frequency spectrum (how much probability mass lives
  *    in UNSEEN vocabulary — the scaling-law-era "is this corpus
  *    exhausted" number),
  *  - Kolmogorov-Smirnov distance between two sources' document-length
  *    distributions (the structural-drift check JS divergence over
  *    tokens cannot see),
  *  - shingle-level Jaccard similarity between sources (corpus-overlap
  *    matrix at the 3-gram level — the mixing-dedup view
  *    dedup_cross_source's verified-pair counts approximate from the
  *    top).
  *
  * Oracle parity per SURVEY §6: exact integer folds, shared-text
  * double emits, no DecimalType in any emitted schema.
  */
object TextOps3 {

  /** Good-Turing frequency spectrum over whitespace tokens (Good 1953;
    * the Gale-Sampson "simple" variant's raw ingredients): for each
    * low frequency r ≤ 10, the count-of-counts N_r, the adjusted
    * frequency r* = (r+1)·N_{r+1}/N_r as an exact floor-micro integer,
    * and the unseen-mass estimate p₀ = N₁/N as exact floor-ppm — the
    * "how much of the language have we NOT seen" number that decides
    * whether more of the same source is worth crawling. The emitted
    * rows are the 10 SMALLEST frequencies PRESENT (ORDER BY r LIMIT
    * 10, deterministic both engines) rather than a fixed r ≤ 10 cut:
    * a saturated corpus may have no low-frequency tokens at all
    * (p₀ = 0 is then the meaningful "exhausted" reading, not an empty
    * frame). Exactness:
    * everything is integer counts and integral division (BIGINT-safe
    * to vocab ~8·10¹¹ at the 10⁶ micro scale); the one display double
    * divides exact integers with identical text. Scale shape: token
    * explode → groupBy token (the corpus shuffle) → the spectrum is
    * value-bounded (≤ max-frequency rows, emitted r ≤ 10); the N_{r+1}
    * lookup is a broadcast self-join on the bounded spectrum. */
  val goodTuring: GraftOp = GraftOp(
    "text_good_turing",
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |tf AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS r
      |  FROM toks WHERE tok <> '' GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(r) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab
      |  FROM tf),
      |sp AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY 1)
      |SELECT s.r, s.n_r,
      |  coalesce(s2.n_r, 0) AS n_r_next,
      |  CAST((s.r + 1) * coalesce(s2.n_r, 0) * 1000000 // s.n_r AS BIGINT) AS r_star_micro,
      |  tot.n_tokens, tot.vocab,
      |  CAST((SELECT coalesce(sum(n_r), 0) FROM sp WHERE r = 1) * 1000000
      |    // tot.n_tokens AS BIGINT) AS p0_ppm
      |FROM sp s LEFT JOIN sp s2 ON s2.r = s.r + 1 CROSS JOIN tot
      |ORDER BY s.r LIMIT 10""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("r"))
    val tot = tf.agg(sum(col("r")).cast(LongType).as("n_tokens"),
      count(lit(1)).as("vocab"))
    val sp = tf.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    val n1 = sp.filter(col("r") === 1)
      .agg(coalesce(sum(col("n_r")), lit(0L)).as("n1"))
    sp
      .join(broadcast(sp.select(col("r").as("r_next"), col("n_r").as("n_r_next"))),
        col("r_next") === col("r") + 1, "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
      .select(col("r"), col("n_r"),
        coalesce(col("n_r_next"), lit(0L)).as("n_r_next"),
        expr("(r + 1) * coalesce(n_r_next, 0) * 1000000 div n_r").as("r_star_micro"),
        col("n_tokens"), col("vocab"),
        expr("n1 * 1000000 div n_tokens").as("p0_ppm"))
      .orderBy(col("r"))
      .limit(10)
  }

  /** Kolmogorov-Smirnov distance between the document-LENGTH
    * distributions of the lexicographically first and last sources —
    * the structural corpus-mixing drift check: token-level divergences
    * (text_js_div) miss a source that says the same words in 10×
    * longer documents. Same exact construction as q_ks_test: the two
    * sources reduce to a shared n_chars histogram, D·n_a·n_b =
    * max|cum_a·n_b − cum_b·n_a| is an exact BIGINT off one cumulative
    * window over the length-DOMAIN-bounded histogram, and the one
    * display double divides exact integers. The source pair is
    * data-derived (min/max source name — deterministic, no literal
    * drift). */
  val lengthKs: GraftOp = GraftOp(
    "text_length_ks",
    """WITH se AS (SELECT min(source) AS lo, max(source) AS hi FROM documents),
      |p AS (
      |  SELECT d.n_chars, d.source = se.lo AS is_lo
      |  FROM documents d, se WHERE d.source = se.lo OR d.source = se.hi),
      |h AS (
      |  SELECT n_chars,
      |    CAST(count(*) FILTER (WHERE is_lo) AS BIGINT) AS ca,
      |    CAST(count(*) FILTER (WHERE NOT is_lo) AS BIGINT) AS cb
      |  FROM p GROUP BY 1),
      |w AS (
      |  SELECT n_chars,
      |    CAST(sum(ca) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
      |    CAST(sum(cb) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
      |  FROM h),
      |g AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM h),
      |dd AS (SELECT CAST(max(abs(cum_a * g.n_b - cum_b * g.n_a)) AS BIGINT) AS d2
      |       FROM w, g)
      |SELECT se.lo AS source_a, se.hi AS source_b, g.n_a, g.n_b, dd.d2 AS d_scaled,
      |  CAST(dd.d2 AS DOUBLE) / (CAST(g.n_a AS DOUBLE) * CAST(g.n_b AS DOUBLE)) AS ks_d
      |FROM se, g, dd""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val se = broadcast(docs.agg(min(col("source")).as("lo"), max(col("source")).as("hi")))
    val p = docs.select(col("n_chars"), col("source")).crossJoin(se)
      .filter(col("source") === col("lo") || col("source") === col("hi"))
      .select(col("n_chars"), (col("source") === col("lo")).as("is_lo"))
    val h = p.groupBy(col("n_chars"))
      .agg(count(when(col("is_lo"), 1)).as("ca"),
        count(when(!col("is_lo"), 1)).as("cb"))
    // cumulative window over the length-domain-bounded histogram
    val w = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(sum(col("ca")).over(w).as("cum_a"),
      sum(col("cb")).over(w).as("cum_b"))
    val g = broadcast(h.agg(sum(col("ca")).cast(LongType).as("n_a"),
      sum(col("cb")).cast(LongType).as("n_b")))
    cum.crossJoin(g)
      .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))).as("d2"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .crossJoin(se)
      .select(col("lo").as("source_a"), col("hi").as("source_b"),
        col("n_a"), col("n_b"), col("d2").as("d_scaled"),
        expr("CAST(d2 AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")
          .as("ks_d"))
  }

  /** Shingle-level Jaccard similarity matrix between sources — the
    * corpus-overlap view of the mixing plan ("how much of source B is
    * already in source A", at the 3-gram level): J(A,B) =
    * |S_A ∩ S_B| / |S_A ∪ S_B| over each source's DISTINCT 3-gram
    * shingle-hash sets, every count an exact BIGINT and the one
    * emitted double a division of exact integers. Complements
    * dedup_cross_source (near-dup PAIR counts) and text_vocab_overlap
    * (unigram level) with the set-similarity number mixture planning
    * actually uses. Scale shape: reuses [[DedupOps.shingledDocs]]'s
    * session-cached shingle frame; one distinct (source, sid) reduce
    * (the corpus shuffle, shuffled on sid), then the intersection
    * self-join explodes ≤ |sources|² rows PER SHINGLE (source-bounded,
    * corpus-independent) and aggregates straight down to the ≤
    * |sources|² matrix. Zero-overlap pairs drop (inner join) on both
    * engines. */
  val sourceJaccard: GraftOp = GraftOp(
    "text_source_jaccard",
    s"""WITH toks AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks FROM documents),
       |shl AS (SELECT doc_id, ${DedupOps.sqlShingles} AS shingles FROM toks),
       |sh0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM shl),
       |ss AS (
       |  SELECT DISTINCT d.source, ${Exprs.sqlMd5Long("sh0.shingle")} AS sid
       |  FROM sh0 JOIN documents d ON sh0.doc_id = d.doc_id),
       |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(count(*) AS BIGINT) AS n_common
       |  FROM ss a JOIN ss b ON a.sid = b.sid AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, n_common, za.n AS n_a, zb.n AS n_b,
       |  CAST(n_common AS DOUBLE) / CAST(za.n + zb.n - n_common AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sz za ON source_a = za.source
       |JOIN sz zb ON source_b = zb.source
       |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    // r16: registry-persisted — the distinct (source, sid) set feeds
    // THREE subplans (sizes + both sides of the intersection
    // self-join); each re-ran the explode+join+distinct before
    // r17: start from the session-shared hashedIndex (doc_id, sid) —
    // it IS the exploded+md5'd shingle frame, already materialized by
    // the index build phase; re-running the explode+md5 kernel here
    // (the expensive part per the r16 shingling notes) was pure
    // duplicate derivation. Same sids by construction (identical
    // md5Long over identical shingles), oracle unchanged.
    val ss = graft.CachedPlans.cached(s, s"text.sourceShingleSet:$d")(
      DedupOps.hashedIndex(s, d)
        .join(src, Seq("doc_id"))
        .select(col("source"), col("sid"))
        .distinct())
    val sz = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = ss.join(
        ss.select(col("source").as("source_b"), col("sid")), Seq("sid"))
      .filter(col("source") < col("source_b"))
      .groupBy(col("source").as("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sz.select(col("source").as("source_a"), col("n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sz.select(col("source").as("source_b"), col("n").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE)")
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Per-source hapax-legomena share — the source-level drill-down of
    * [[goodTuring]]'s corpus-wide unseen-mass estimate (a source whose
    * vocabulary is mostly hapax is still yielding new language; one
    * with zero hapax is exhausted): tokens appearing exactly once
    * WITHIN the source, as exact counts and exact floor-ppm shares of
    * both the source's vocabulary and its token volume. One explode →
    * (source, token) count aggregate (the corpus shuffle) → a
    * |sources|-row rollup; every number an exact integer. */
  val hapaxShare: GraftOp = GraftOp(
    "text_hapax_share",
    """WITH tf AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |g AS (
      |  SELECT source,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax
      |  FROM tf GROUP BY 1)
      |SELECT source, n_tokens, vocab, hapax,
      |  hapax * 1000000 // vocab AS hapax_vocab_ppm,
      |  hapax * 1000000 // n_tokens AS hapax_token_ppm
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("source"))
      .agg(sum(col("c")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("vocab"),
        count(when(col("c") === 1, 1)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        expr("hapax * 1000000 div vocab").as("hapax_vocab_ppm"),
        expr("hapax * 1000000 div n_tokens").as("hapax_token_ppm"))
      .orderBy(col("source"))
  }

  /** Per-source unigram Shannon entropy (nats) — the
    * information-density reading completing the coverage trio with
    * [[goodTuring]] (unseen mass) and [[hapaxShare]] (new-vocabulary
    * rate): H = ln N − (1/N)·Σ c·ln c over the source's token counts.
    * A low-entropy source is templated/boilerplate regardless of its
    * vocabulary size. Exactness: each token's c·ln(c) term is
    * floor-snapped to exact micro units (the graph_adamic_adar ln-snap
    * discipline — the cross-token sum then folds ORDER-FREE as an
    * exact DECIMAL(38) integer; terms are BIGINT-safe to ~2.8·10¹¹
    * occurrences of one token within one source, rescale documented
    * past); the final H is one shared-text double over the exact sum
    * and N, floor-micro-snapped on the \|sources\|-row emit (the
    * tiny-frame snap class — ln(N) is the one unsnapped libm call per
    * row and feeds the snap). */
  val unigramEntropy: GraftOp = GraftOp(
    "text_unigram_entropy",
    """WITH tf AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY 1, 2),
      |g AS (
      |  SELECT source,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0)
      |      AS BIGINT)) AS DECIMAL(38,0)) AS clogc_micro
      |  FROM tf GROUP BY 1)
      |SELECT source, n_tokens, vocab,
      |  CAST(clogc_micro AS DOUBLE) AS clogc_micro,
      |  floor((ln(CAST(n_tokens AS DOUBLE))
      |    - CAST(clogc_micro AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE))
      |    * 1000000.0) / 1000000.0 AS entropy_nats
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val dec = DecimalType(38, 0)
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("source"))
      .agg(sum(col("c")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(expr("""CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0D)
                   | AS BIGINT)""".stripMargin)).cast(dec).as("clogc_micro"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("clogc_micro").cast(DoubleType).as("clogc_micro"),
        expr("""floor((ln(CAST(n_tokens AS DOUBLE))
               |  - CAST(clogc_micro AS DOUBLE) / 1000000.0D / CAST(n_tokens AS DOUBLE))
               |  * 1000000.0D) / 1000000.0D""".stripMargin).as("entropy_nats"))
      .orderBy(col("source"))
  }

  /** Corpus bigram entropy and the conditional entropy H(next | prev)
    * — the SEQUENCE-level information density [[unigramEntropy]]'s
    * bag-of-words view cannot see (a corpus can have high unigram
    * entropy yet be near-deterministic word-to-word — the boilerplate
    * signature n-gram LMs exploit): H_cond = H(prev,next) − H(prev),
    * both entropies over exact bigram / bigram-prefix counts with the
    * same floor-snapped c·ln c micro folds as [[unigramEntropy]]
    * (order-free DECIMAL(38) sums), both H's floor-micro-snapped on
    * the 1-row emit and the difference taken between the snapped
    * values (identical doubles both engines). The prefix marginal
    * derives from the SAME (bigram, count) frame via the
    * first-token split (tokens are whitespace-split so the separator
    * cannot occur inside one), so the two levels cannot drift. Scale
    * shape: per-document lead pairing (doc-partitioned windows), one
    * bigram groupBy (the corpus shuffle), bounded rollups after. */
  val bigramEntropy: GraftOp = GraftOp(
    "text_bigram_entropy",
    """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(toks)),
      |    i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
      |  FROM toks WHERE len(toks) >= 2),
      |cj AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1),
      |pj AS (
      |  SELECT split_part(bigram, ' ', 1) AS pref, CAST(sum(c) AS BIGINT) AS cp
      |  FROM cj GROUP BY 1),
      |g AS (
      |  SELECT
      |    (SELECT CAST(sum(c) AS BIGINT) FROM cj) AS n,
      |    (SELECT CAST(count(*) AS BIGINT) FROM cj) AS v_bigrams,
      |    (SELECT CAST(count(*) AS BIGINT) FROM pj) AS v_prefixes,
      |    (SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0)
      |       AS BIGINT)) AS DECIMAL(38,0)) FROM cj) AS sj_micro,
      |    (SELECT CAST(sum(CAST(floor(CAST(cp AS DOUBLE) * ln(CAST(cp AS DOUBLE)) * 1000000.0)
      |       AS BIGINT)) AS DECIMAL(38,0)) FROM pj) AS sp_micro)
      |SELECT n AS n_bigrams, v_bigrams, v_prefixes,
      |  floor((ln(CAST(n AS DOUBLE))
      |    - CAST(sj_micro AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)) * 1000000.0)
      |    / 1000000.0 AS h_joint,
      |  floor((ln(CAST(n AS DOUBLE))
      |    - CAST(sp_micro AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)) * 1000000.0)
      |    / 1000000.0 AS h_prefix,
      |  floor((ln(CAST(n AS DOUBLE))
      |    - CAST(sj_micro AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)) * 1000000.0)
      |    / 1000000.0
      |  - floor((ln(CAST(n AS DOUBLE))
      |    - CAST(sp_micro AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)) * 1000000.0)
      |    / 1000000.0 AS h_cond
      |FROM g""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), "\\s+")))
      .toDF("doc_id", "pos", "tok")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cj = toks
      .withColumn("nxt", lead(col("tok"), 1).over(byDoc))
      .filter(col("nxt").isNotNull)
      .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c"))
    val pj = cj.groupBy(substring_index(col("bigram"), " ", 1).as("pref"))
      .agg(sum(col("c")).cast(LongType).as("cp"))
    def snapFold(cCol: String) =
      expr(s"""CAST(floor(CAST($cCol AS DOUBLE) * ln(CAST($cCol AS DOUBLE)) * 1000000.0D)
              | AS BIGINT)""".stripMargin)
    val gj = cj.agg(sum(col("c")).cast(LongType).as("n"),
      count(lit(1)).as("v_bigrams"),
      sum(snapFold("c")).cast(dec).as("sj_micro"))
    val gp = pj.agg(count(lit(1)).as("v_prefixes"),
      sum(snapFold("cp")).cast(dec).as("sp_micro"))
    def h(sm: String) =
      s"""floor((ln(CAST(n AS DOUBLE))
         |  - CAST($sm AS DOUBLE) / 1000000.0D / CAST(n AS DOUBLE)) * 1000000.0D)
         |  / 1000000.0D""".stripMargin
    broadcast(gj).crossJoin(broadcast(gp))
      .select(col("n").as("n_bigrams"), col("v_bigrams"), col("v_prefixes"),
        expr(h("sj_micro")).as("h_joint"),
        expr(h("sp_micro")).as("h_prefix"),
        expr(s"${h("sj_micro")} - ${h("sp_micro")}").as("h_cond"))
  }

  /** SpaceSaving GUARANTEED-top-k emit (r16, verdict #4) — the sketch
    * row's own oracle-checked key (§2f 37c had only the theorem audit
    * `text_topk_sketch`; this emits the sketch's actionable OUTPUT).
    * The q_tdigest_bounds discipline: exact integers about an
    * approximate structure. Rows are the exact top-k tokens (census
    * order, DuckDB-computable); the sketch contributes three
    * theorem-guaranteed booleans evaluated GENUINELY against its
    * counters on the Spark side and emitted as the theorem's verdict
    * on the oracle side, so a broken sketch goes hash-red:
    *
    *  - `covered`: any token with n_true·cap > n_total MUST hold a
    *    counter (an untracked item's true count is ≤ the sketch min ≤
    *    n_total/cap — Metwally et al.'s guarantee, preserved by the
    *    floor-union merge: every merged counter ≥ minA+minB, so the
    *    merged min still bounds absent items);
    *  - `est_dominates`: every tracked estimate ≥ its true count
    *    (absent items enter a merge at the partial's min, an upper
    *    bound on their mass in that partial);
    *  - `est_within_slack`: every tracked estimate ≤ true +
    *    n_total div cap (est − true ≤ sketch min, and the min is ≤
    *    Σcounters/cap ≤ n_total/cap — the matched-floor argument:
    *    any cap-sized selection's per-side values sum to ≤ that
    *    side's counter total, so the merged counter sum never exceeds
    *    the stream length).
    *
    * The est VALUES are never emitted: Spark's final merge order is
    * scheduler-dependent and the bounds above are the merge-shape-free
    * truth. Scale shape: the census groupBy is the corpus shuffle the
    * text family already pays (shared token frame); the sketch is one
    * distributed typed aggregation; top-k/est/total are ≤cap-row
    * broadcasts. */
  val topkGuaranteed: GraftOp = GraftOp(
    "text_topk_guaranteed",
    """WITH t AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
      |g AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
      |r AS (SELECT tok, n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
      |      FROM c)
      |SELECT r.rank, r.tok, r.n AS n_true,
      |  CAST(g.n_total // 16 AS BIGINT) AS ss_threshold,
      |  (r.n * 16 > g.n_total) AS guaranteed,
      |  true AS covered, true AS est_dominates, true AS est_within_slack
      |FROM r CROSS JOIN g WHERE r.rank <= 8 ORDER BY r.rank""".stripMargin) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cap = 16
    val k = 8
    val toks = TextOps.tokenized(s, d).select(col("tok")).as[String]
    val pairs: Seq[(String, Long)] =
      toks.select(new graft.functions.SpaceSavingTopK(cap, cap).toColumn).head()
    val est = pairs.toDF("tok", "est")
    val census = TextOps.tokenized(s, d).groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val total = census.agg(sum(col("n")).cast(LongType).as("n_total"))
    val topk = census.orderBy(col("n").desc, col("tok")).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc, col("tok"))))
    topk.join(broadcast(est), Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .select(col("rank"), col("tok"), col("n").as("n_true"),
        expr("n_total div 16").as("ss_threshold"),
        (col("n") * 16 > col("n_total")).as("guaranteed"),
        (!(col("n") * 16 > col("n_total")) || col("est").isNotNull).as("covered"),
        (col("est").isNull || col("est") >= col("n")).as("est_dominates"),
        (col("est").isNull || col("est") <= col("n") + expr("n_total div 16"))
          .as("est_within_slack"))
      .orderBy(col("rank"))
  }

  /** Compression-ratio BOUNDS companion (r16, verdict #5) — the
    * oracle-checked gate over the engine-private zlib kernel
    * (`text_compression_ratio` stays rows-only by adjudicated
    * contract; this key makes a broken compressor hash-red). Emits the
    * exact byte counts plus two theorem booleans per document,
    * evaluated against the REAL deflate output on the Spark side and
    * as the theorems' verdicts on the oracle side:
    *
    *  - `le_expansion_bound`: deflate never expands beyond zlib's
    *    documented compressBound — n + n/2¹² + n/2¹⁴ + n/2²⁵ + 13
    *    (stored-block fallback + 2-byte header + 4-byte Adler-32);
    *  - `ge_stream_floor`: the output can never shrink below
    *    8 + n div 2064 bytes — the 6 wrapper bytes + ≥2 data bytes,
    *    plus ≥1 Huffman bit per LZ77 symbol with each symbol covering
    *    ≤258 input bytes (258×8 = 2064; real streams pay ≥2 bits per
    *    match, so the floor has 2× slack even on degenerate runs).
    *
    * Why NOT the verdict-suggested unigram-entropy (H0) lower bound:
    * H0 is not a sound floor for an LZ77 codec — deflate compresses
    * `abab…` far below its order-0 character entropy by matching, so
    * an `deflated ≥ H0·n/8` boolean would be theorem-FALSE on
    * repetitive documents and the hash would diverge on legitimate
    * data. The symbol-rate floor above is the information bound that
    * DOES hold for this codec. Scale shape: partition-local scan,
    * zero shuffle, one codegen'd kernel call per row. */
  val compressionBounds: GraftOp = GraftOp(
    "text_compression_bounds",
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(strlen(text) + strlen(text) // 4096 + strlen(text) // 16384
      |       + strlen(text) // 33554432 + 13 AS BIGINT) AS zlib_bound,
      |  CAST(8 + strlen(text) // 2064 AS BIGINT) AS stream_floor,
      |  true AS le_expansion_bound, true AS ge_stream_floor
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).cast(LongType).as("n_bytes"),
        graft.functions.deflate_size(col("text")).cast(LongType).as("deflated"))
      .select(col("doc_id"), col("n_bytes"),
        expr("n_bytes + n_bytes div 4096 + n_bytes div 16384 + n_bytes div 33554432 + 13")
          .as("zlib_bound"),
        expr("8 + n_bytes div 2064").as("stream_floor"),
        (col("deflated") <=
          expr("n_bytes + n_bytes div 4096 + n_bytes div 16384 + n_bytes div 33554432 + 13"))
          .as("le_expansion_bound"),
        (col("deflated") >= expr("8 + n_bytes div 2064")).as("ge_stream_floor"))
      .orderBy(col("doc_id"))
  }

  def ops: Seq[GraftOp] = Seq(goodTuring, lengthKs, sourceJaccard, hapaxShare,
    unigramEntropy, bigramEntropy, topkGuaranteed, compressionBounds)
}
