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

  /** Deterministic epoch-shuffle order audit over the packed stream —
    * the training-order-reproducibility readout [[packSequences]] was
    * still missing: every epoch e permutes the S packed sequences by
    * the portable hash md5Long("seq#e") (ties to the smaller seq id),
    * and this op emits, per epoch, the 10×10 block-mixing profile of
    * that permutation — sequence-id decile × epoch-position decile
    * occupancy collapsed to (diagonal mass, max cell, min cell). An
    * unshuffled epoch puts 100% on the diagonal; a well-mixed one
    * sits near uniform (≈10k ppm/cell). Because the order is a pure
    * hash, the oracle re-derives the identical permutation and the
    * profile hash-matches — reproducibility is PROVEN by the compare,
    * not asserted.
    *
    * Scale: positions come from ONE two-phase prefix-sum pass
    * ([[QuantileExact.prefixSumUngrouped]] over (epoch, hash, seq) —
    * epochs are contiguous blocks of exactly S rows, so the in-epoch
    * position is cum − (e−1)·S with no per-epoch repartition), the
    * cell table is ≤ 3·100 rows, and every statistic is an exact
    * BIGINT (counts ≤ S; ppm exact for S < 9·10¹²). */
  val packEpochOrder: GraftOp = GraftOp(
    "pack_epoch_order",
    s"""WITH t AS (
       |  SELECT CAST(sum(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
       |  FROM documents),
       |sq AS (SELECT (n_tokens + $Budget - 1) // $Budget AS ns FROM t),
       |seqs AS (SELECT sq.ns, s2.i AS seq FROM sq, unnest(range(sq.ns)) AS s2(i)),
       |ep AS (SELECT unnest([1, 2, 3]) AS epoch),
       |h AS (
       |  SELECT ep.epoch, q.seq, q.ns,
       |    ${graft.functions.Exprs.sqlMd5Long("concat(CAST(q.seq AS VARCHAR), '#', CAST(ep.epoch AS VARCHAR))")} AS hv
       |  FROM seqs q CROSS JOIN ep),
       |p AS (
       |  SELECT epoch, seq, ns,
       |    row_number() OVER (PARTITION BY epoch ORDER BY hv, seq) AS pos
       |  FROM h),
       |c AS (
       |  SELECT epoch, ns, seq * 10 // ns AS ib, (pos - 1) * 10 // ns AS pd FROM p),
       |cells AS (
       |  SELECT epoch, ib, pd, CAST(count(*) AS BIGINT) AS n
       |  FROM c GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT ep.epoch, x.i AS ib, y.j AS pd
       |  FROM ep, unnest(range(10)) AS x(i), unnest(range(10)) AS y(j)),
       |filled AS (
       |  SELECT g.epoch, g.ib, g.pd, coalesce(cl.n, 0) AS n
       |  FROM grid g LEFT JOIN cells cl
       |    ON cl.epoch = g.epoch AND cl.ib = g.ib AND cl.pd = g.pd)
       |SELECT CAST(f.epoch AS INT) AS epoch, sq.ns AS n_seqs,
       |  CAST(sum(CASE WHEN f.ib = f.pd THEN f.n ELSE 0 END) * 1000000 // sq.ns AS BIGINT) AS diag_ppm,
       |  CAST(max(f.n) AS BIGINT) AS max_cell, CAST(min(f.n) AS BIGINT) AS min_cell
       |FROM filled f, sq GROUP BY 1, 2 ORDER BY epoch""".stripMargin) { (s, d) =>
    import s.implicits._
    val nTokens = Tables.documents(s, d)
      .agg(sum(size(split(col("text"), "\\s+")).cast(LongType)).cast(LongType))
      .head.getLong(0)
    val ns = (nTokens + Budget - 1) / Budget
    val hv = graft.functions.Exprs.md5Long(
      concat(col("seq").cast(StringType), lit("#"), col("epoch").cast(StringType)))
    val base = s.range(ns).toDF("seq")
      .crossJoin(Seq(1, 2, 3).toDF("epoch"))
      .select(col("epoch"), col("seq"), hv.as("hv"), lit(1L).as("w"))
    val pos = QuantileExact.prefixSumUngrouped(s, s"pack.epochOrder:$d", base,
        Seq(col("epoch"), col("hv"), col("seq")), "w")
      .select(col("epoch"), col("seq"),
        (col("__cum") - (col("epoch").cast(LongType) - 1) * ns).as("pos"))
    val cells = pos
      .select(col("epoch"), expr(s"seq * 10 div ${ns}L").as("ib"),
        expr(s"(pos - 1) * 10 div ${ns}L").as("pd"))
      .groupBy(col("epoch"), col("ib"), col("pd"))
      .agg(count(lit(1)).as("n"))
    val grid = Seq(1, 2, 3).toDF("epoch")
      .crossJoin(s.range(10).toDF("ib"))
      .crossJoin(s.range(10).toDF("pd"))
    grid.join(cells, Seq("epoch", "ib", "pd"), "left")
      .select(col("epoch"), col("ib"), col("pd"), coalesce(col("n"), lit(0L)).as("n"))
      .groupBy(col("epoch"))
      .agg(sum(when(col("ib") === col("pd"), col("n")).otherwise(lit(0L))).as("diag"),
        max(col("n")).as("max_cell"), min(col("n")).as("min_cell"))
      .select(col("epoch").cast(IntegerType).as("epoch"), lit(ns).as("n_seqs"),
        expr(s"diag * 1000000 div ${ns}L").as("diag_ppm"),
        col("max_cell"), col("min_cell"))
      .orderBy(col("epoch"))
  }

  val ops: Seq[GraftOp] = Seq(packSequences, packEfficiency, packEpochOrder)
}
