package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-sequence packing: concatenate the corpus in doc_id order
  * and chop it into fixed-size token windows (the GPT-style
  * "concat-and-chunk" batch layout) — each document learns which
  * sequence(s) it lands in and at what offset.
  *
  * The core is a corpus-wide prefix sum of token counts. A single
  * unbounded window (`ORDER BY doc_id` with no partition) would pull
  * every row through ONE reducer — the classic scale trap — so the
  * prefix sum is computed hierarchically, the two-phase scan shape:
  *
  *   1. bucket docs by `doc_id div 1024`; within-bucket running sums
  *      are a window PARTITIONED by bucket (parallel, bounded);
  *   2. per-bucket totals (one row per bucket) get their own running
  *      sum — a window over thousands of rows, not billions — and are
  *      broadcast back as each bucket's starting offset.
  *
  * The DuckDB oracle uses the plain sequential window — same numbers,
  * which is exactly the point: the distributed decomposition is
  * invisible in the result.
  */
object PackOps {

  private val Budget = 512 // tokens per packed training sequence
  private val Bucket = 1024 // doc_ids per prefix-sum bucket

  val packSequences: GraftOp = GraftOp(
    "pack_sequences",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
       |  FROM t)
       |SELECT doc_id, n_tok,
       |  tok_before // $Budget AS start_seq,
       |  tok_before % $Budget AS start_off,
       |  (tok_before + n_tok - 1) // $Budget AS end_seq
       |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"),
        expr(s"doc_id div $Bucket").as("bucket"))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acrossBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // phase 2 input: ONE row per bucket — the unpartitioned window is
    // over the bucket directory, never the corpus
    val offsets = t.groupBy(col("bucket")).agg(sum(col("n_tok")).as("bucket_tok"))
      .select(col("bucket"),
        coalesce(sum(col("bucket_tok")).over(acrossBuckets), lit(0L)).as("bucket_off"))
    t.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("n_tok"),
        (col("bucket_off") + sum(col("n_tok")).over(inBucket) - col("n_tok")).as("tok_before"))
      .select(col("doc_id"), col("n_tok"),
        // `div` = exact integral division (a double-`/`-then-cast loses
        // bits once corpus token counts pass 2^53)
        expr(s"tok_before div $Budget").as("start_seq"),
        (col("tok_before") % Budget).as("start_off"),
        expr(s"(tok_before + n_tok - 1) div $Budget").as("end_seq"))
      .orderBy(col("doc_id"))
  }

  /** Packing-efficiency audit at the [[Budget]]-token context — the
    * "how much of the compute is padding" number that decides whether
    * a training pipeline packs at all: regime A (one document per
    * sequence, padded to the next Budget multiple) vs regime B (the
    * [[packSequences]] concatenated stream, padding only in the final
    * tail) — B's sequence count ⌈N/B⌉ is also the bin-packing lower
    * bound every boundary-respecting packer (FFD etc.) is graded
    * against. All counts are exact integers off ONE token-count
    * aggregate (⌈n/B⌉ spelled (n+B−1)//B — integral, engine-exact);
    * efficiencies are exact floor-ppm. */
  val packEfficiency: GraftOp = GraftOp(
    "pack_efficiency",
    s"""WITH t AS (
       |  SELECT CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |    CAST(sum((n_tok + $Budget - 1) // $Budget) AS BIGINT) AS seqs_padded
       |  FROM t)
       |SELECT CAST($Budget AS BIGINT) AS budget, n_docs, n_tokens, seqs_padded,
       |  (n_tokens + $Budget - 1) // $Budget AS seqs_stream,
       |  seqs_padded * $Budget - n_tokens AS waste_padded,
       |  ((n_tokens + $Budget - 1) // $Budget) * $Budget - n_tokens AS waste_stream,
       |  n_tokens * 1000000 // (seqs_padded * $Budget) AS eff_padded_ppm,
       |  n_tokens * 1000000 // (((n_tokens + $Budget - 1) // $Budget) * $Budget)
       |    AS eff_stream_ppm
       |FROM g""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast(LongType).as("n_tokens"),
        sum(expr(s"(n_tok + $Budget - 1) div $Budget")).cast(LongType).as("seqs_padded"))
      .select(lit(Budget.toLong).as("budget"), col("n_docs"), col("n_tokens"),
        col("seqs_padded"),
        expr(s"(n_tokens + $Budget - 1) div $Budget").as("seqs_stream"),
        expr(s"seqs_padded * $Budget - n_tokens").as("waste_padded"),
        expr(s"((n_tokens + $Budget - 1) div $Budget) * $Budget - n_tokens")
          .as("waste_stream"),
        expr(s"n_tokens * 1000000 div (seqs_padded * $Budget)").as("eff_padded_ppm"),
        expr(s"n_tokens * 1000000 div (((n_tokens + $Budget - 1) div $Budget) * $Budget)")
          .as("eff_stream_ppm"))
  }

  val ops: Seq[GraftOp] = Seq(packSequences, packEfficiency)
}
