package graft.operators

import graft.GraftOp
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
    val lex = TextOps.bm25.run(s, d)
      .withColumn("r_lex",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_lex"))
    val dense = MipsOps.mips.run(s, d)
      .filter(col("query_id") === 0)
      .select(col("corpus_id").as("doc_id"), col("rn").cast("long").as("r_dense"))
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

  val ops: Seq[GraftOp] = Seq(rrf)
}
