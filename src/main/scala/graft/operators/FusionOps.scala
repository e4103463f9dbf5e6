package graft.operators

import graft.GraftOp
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (SURVEY.md §2e) — the RAG-serving
  * staple: a lexical ranking (BM25 over the shared token frame) and a
  * dense ranking (norm-augmented MIPS over the embeddings) fused by
  * reciprocal rank (Cormack et al. 2009: score(d) = Σ 1/(k₀+rank_d),
  * k₀ = 60). The two rankers index the same corpus (`vec_id` ≡
  * `doc_id` by construction of the test tables), so fusion is a
  * full-outer join of two top-k lists — 20 + 10 rows — after each
  * ranker has done its own scale-shaped work; the fusion stage itself
  * is O(k) whatever the corpus size.
  *
  * Determinism: ranks are exact integers (each ranker breaks score
  * ties by doc_id), and the RRF score is two single IEEE divisions of
  * small-integer rationals summed once with the identical expression
  * text on both engines — bit-stable, so ordering by it cannot
  * diverge. Absent-in-one-list docs contribute 0 from that list (the
  * standard RRF convention) and emit rank 0.
  */
object FusionOps {

  /** Identical RRF expression text for BOTH engines: one division per
    * list, explicit 2-term parenthesized sum, null rank → 0. */
  private def rrfExpr(lex: String, dense: String): String =
    s"""(CASE WHEN $lex IS NULL THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(1 AS DOUBLE) / (60 + $lex) END)
       |+ (CASE WHEN $dense IS NULL THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(1 AS DOUBLE) / (60 + $dense) END)""".stripMargin

  /** Registry-persisted (doc_id, r_lex) full lexical ranking — BUILT
    * BY the audited op's own `run` (the knn_graph_edges precedent:
    * audit and audited cannot drift because the registry entry IS the
    * audited plan). r17, guide §2.4: text_err_rank previously ran the
    * BM25 plan twice per query (once directly, once inside rrf.run)
    * and text_rrf_fusion once more — three full ranker derivations per
    * bench pass for two narrow ranked lists. */
  private def lexRanked(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.CachedPlans.cached(s, s"fusion.lexRanked:$d")(
      TextOps.bm25.run(s, d)
        .withColumn("r_lex",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("r_lex")))

  /** Registry-persisted query-0 dense top-k (doc_id, r_dense) — the
    * MIPS op's own emitted ranking, same sharing rationale. */
  private def denseQ0(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.CachedPlans.cached(s, s"fusion.denseQ0:$d")(
      MipsOps.mips.run(s, d)
        .filter(col("query_id") === 0)
        .select(col("corpus_id").as("doc_id"), col("rn").cast("long").as("r_dense")))

  val rrf: GraftOp = GraftOp(
    "text_rrf_fusion",
    s"""WITH lex AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
       |  FROM (${TextOps.bm25.oracle.get})),
       |dense AS (
       |  SELECT corpus_id AS doc_id, CAST(rn AS BIGINT) AS r_dense
       |  FROM (${MipsOps.mips.oracle.get}) WHERE query_id = 0),
       |fused AS (
       |  SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
       |    r_lex, r_dense,
       |    ${rrfExpr("r_lex", "r_dense")} AS rrf
       |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
       |SELECT doc_id,
       |  CAST(coalesce(r_lex, 0) AS BIGINT) AS r_lex,
       |  CAST(coalesce(r_dense, 0) AS BIGINT) AS r_dense,
       |  rrf,
       |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rn
       |FROM fused ORDER BY rn LIMIT 20""".stripMargin) { (s, d) =>
    // each ranker's own (already-verified) plan, reduced to (doc, rank)
    // and served from the shared registry entries (r17)
    val lex = lexRanked(s, d)
    val dense = denseQ0(s, d)
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", expr(rrfExpr("r_lex", "r_dense")))
      .select(col("doc_id"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_dense"), lit(0L)).as("r_dense"),
        col("rrf"))
      .withColumn("rn", row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .orderBy(col("rn"))
      .limit(20)
  }

  /** ERR@10 retrieval-quality audit of all three rankers (lexical
    * BM25, dense MIPS, RRF fusion) against exact-cosine graded
    * relevance — Expected Reciprocal Rank (Chapelle et al. 2009), the
    * cascade-model metric chosen here over NDCG because its
    * discounts are RATIONAL (1/r and the grade probabilities
    * (2^g−1)/2^gmax), so the whole metric is an exact integer: scaling
    * by lcm(1..10)·8¹⁰ = 2 705 829 396 480 makes every term
    * (2520/r)·num_r·8^(10−r)·∏_{i<r}(8−num_i) an exact BIGINT
    * (≤ 2520·7·8⁹ ≈ 2.4·10¹²) — no log2, no libm, nothing for two
    * engines to disagree on. The cascade product ∏(8−num_i) never
    * runs as a sequential fold: the factors take only the values
    * {1,5,7,8}, so the product is 5^c₅·7^c₇·8^c₈ with cᵥ plain
    * window COUNTS of prior rows — three cumulative sums and three
    * 10-entry power-table lookups. Grades: brute cosine rank 1-2 → 3,
    * 3-5 → 2, 6-10 → 1, else 0 (num = 2^g−1 ∈ {7,3,1,0}). Scale
    * shape: each ranker does its own verified scale-shaped work; the
    * audit itself is windows over 3×10 rows. */
  val errRank: GraftOp = GraftOp(
    "text_err_rank",
    s"""WITH truth AS (
       |  SELECT corpus_id AS doc_id, CAST(rn AS BIGINT) AS brute_rn
       |  FROM (${KnnOps.brute.oracle.get}) WHERE query_id = 0),
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rn
       |  FROM (${TextOps.bm25.oracle.get})),
       |dense AS (
       |  SELECT corpus_id AS doc_id, CAST(rn AS BIGINT) AS rn
       |  FROM (${MipsOps.mips.oracle.get}) WHERE query_id = 0),
       |rr AS (SELECT doc_id, CAST(rn AS BIGINT) AS rn FROM (${rrf.oracle.get})),
       |l AS (
       |  SELECT 'bm25' AS ranker, doc_id, rn FROM lex WHERE rn <= 10
       |  UNION ALL SELECT 'dense' AS ranker, doc_id, rn FROM dense WHERE rn <= 10
       |  UNION ALL SELECT 'rrf' AS ranker, doc_id, rn FROM rr WHERE rn <= 10),
       |g AS (
       |  SELECT ranker, l.rn,
       |    CASE WHEN t.brute_rn <= 2 THEN CAST(7 AS BIGINT)
       |         WHEN t.brute_rn <= 5 THEN CAST(3 AS BIGINT)
       |         WHEN t.brute_rn <= 10 THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS num
       |  FROM l LEFT JOIN truth t ON l.doc_id = t.doc_id),
       |w AS (
       |  SELECT ranker, rn, num,
       |    coalesce(sum(CASE WHEN num = 3 THEN 1 ELSE 0 END) OVER pw, 0) AS c5,
       |    coalesce(sum(CASE WHEN num = 1 THEN 1 ELSE 0 END) OVER pw, 0) AS c7,
       |    coalesce(sum(CASE WHEN num = 0 THEN 1 ELSE 0 END) OVER pw, 0) AS c8
       |  FROM g
       |  WINDOW pw AS (PARTITION BY ranker ORDER BY rn
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |tt AS (
       |  SELECT ranker, num,
       |    (2520 // rn) * num
       |      * list_extract([1,8,64,512,4096,32768,262144,2097152,16777216,134217728], CAST(11 - rn AS BIGINT))
       |      * list_extract([1,5,25,125,625,3125,15625,78125,390625,1953125], CAST(c5 + 1 AS BIGINT))
       |      * list_extract([1,7,49,343,2401,16807,117649,823543,5764801,40353607], CAST(c7 + 1 AS BIGINT))
       |      * list_extract([1,8,64,512,4096,32768,262144,2097152,16777216,134217728], CAST(c8 + 1 AS BIGINT)) AS term
       |  FROM w)
       |SELECT ranker,
       |  CAST(sum(term) AS BIGINT) AS err_scaled,
       |  CAST(sum(CASE WHEN num > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
       |  CAST(CAST(sum(term) AS HUGEINT) * 1000000 // 2705829396480 AS BIGINT) AS err_ppm,
       |  CAST(CAST(CAST(sum(term) AS HUGEINT) * 1000000 // 2705829396480 AS BIGINT) AS DOUBLE)
       |    / 1000000.0 AS err
       |FROM tt GROUP BY ranker ORDER BY ranker""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val lex = lexRanked(s, d)
      .filter(col("r_lex") <= 10)
      .select(lit("bm25").as("ranker"), col("doc_id"), col("r_lex").as("rn"))
    val dense = denseQ0(s, d)
      .select(lit("dense").as("ranker"), col("doc_id"), col("r_dense").as("rn"))
    val fused = rrf.run(s, d).filter(col("rn") <= 10)
      .select(lit("rrf").as("ranker"), col("doc_id"), col("rn").cast("long").as("rn"))
    val truth = KnnOps.brute.run(s, d).filter(col("query_id") === 0)
      .select(col("corpus_id").as("doc_id"), col("rn").cast("long").as("brute_rn"))
    val graded = lex.unionByName(dense).unionByName(fused)
      .join(broadcast(truth), Seq("doc_id"), "left")
      .withColumn("num",
        when(col("brute_rn") <= 2, 7L).when(col("brute_rn") <= 5, 3L)
          .when(col("brute_rn") <= 10, 1L).otherwise(0L))
    // prior-row factor counts over the 10-row-per-ranker lists
    val pw = Window.partitionBy(col("ranker")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def cnt(v: Long): Column =
      coalesce(sum(when(col("num") === v, 1L).otherwise(0L)).over(pw), lit(0L))
    def powTable(base: Long): Column =
      array((0 to 9).map(i => lit(BigInt(base).pow(i).toLong)): _*)
    val withCnt = graded
      .withColumn("c5", cnt(3L)).withColumn("c7", cnt(1L)).withColumn("c8", cnt(0L))
      .withColumn("term",
        expr("(2520 div rn)") * col("num")
          * element_at(powTable(8), (lit(11) - col("rn")).cast("int"))
          * element_at(powTable(5), (col("c5") + 1).cast("int"))
          * element_at(powTable(7), (col("c7") + 1).cast("int"))
          * element_at(powTable(8), (col("c8") + 1).cast("int")))
    withCnt.groupBy(col("ranker"))
      .agg(sum(col("term")).cast(LongType).as("err_scaled"),
        sum(when(col("num") > 0, 1L).otherwise(0L)).cast(LongType).as("n_rel"))
      .withColumn("err_ppm",
        expr("CAST((CAST(err_scaled AS DECIMAL(38,0)) * 1000000) div 2705829396480 AS BIGINT)"))
      .withColumn("err", col("err_ppm").cast(DoubleType) / lit(1000000.0))
      .orderBy(col("ranker"))
  }

  val ops: Seq[GraftOp] = Seq(rrf, errRank)
}
