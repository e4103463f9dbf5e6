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
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens).as("tok"))
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
    val t = Tables.documents(s, d)
      .select(col("source"), explode(tokens).as("tok"))
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

  val ops: Seq[GraftOp] = Seq(termBurstiness, termDispersion)
}
