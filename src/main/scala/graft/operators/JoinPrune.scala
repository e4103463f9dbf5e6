package graft.operators

import graft.GraftOp
import graft.functions.Exprs
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Join pruning via the engine's own Bloom filter
  * ([[graft.functions.BloomFilterAgg]] / bloom_might_contain) —
  * semi-join pushdown / runtime filtering done explicitly: build a
  * filter over the SELECTIVE side's join keys (tiny — KBs), probe it
  * in the fact table's scan filter BEFORE the join, and let the exact
  * join eliminate the false positives. The shuffle then carries only
  * rows that can match: at 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~1% that joins
  * (the pattern behind Spark's own runtime row-group filtering and
  * ClickHouse's JOIN ... WHERE key IN pre-filters).
  */
object JoinPrune {

  /** High-value orders (top ~2% by total price) joined back to their
    * line items for a per-priority revenue rollup. The Bloom filter
    * over qualifying order keys prunes the lineitem scan; the result
    * is EXACTLY the plain join's (false positives die in the join), so
    * the DuckDB oracle states the naive join — the hash match proves
    * the pruning is lossless. The collected filter is documented-tiny:
    * optimal m for |hi-value orders| keys at 1% fpp. */
  val qBloomPrefilter: GraftOp = GraftOp(
    "q_bloom_prefilter",
    """WITH hi AS (
      |  SELECT o_orderkey, o_orderpriority FROM orders
      |  WHERE CAST(o_totalprice AS DECIMAL(18,2)) > CAST(400000 AS DECIMAL(18,2)))
      |SELECT o_orderpriority,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN hi ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val hi = Tables.orders(s, d)
      .filter(Exprs.dec2(col("o_totalprice")) > lit(400000).cast("decimal(18,2)"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    // build once on the selective side; the serialized filter is
    // m = O(|hi| · ln(1/fpp)) BITS — a documented-tiny driver value
    // shipped to executors as a literal (at cluster scale: a broadcast)
    val filterBytes = hi
      .agg(graft.functions.bloom_agg(col("o_orderkey"), expectedItems = 100000, fpp = 0.01))
      .head.getAs[Array[Byte]](0)
    Tables.lineitem(s, d)
      .filter(graft.functions.bloom_might_contain(lit(filterBytes), col("l_orderkey")))
      .join(broadcast(hi), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(Exprs.discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val ops: Seq[GraftOp] = Seq(qBloomPrefilter)
}
