package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global NTILE(b) without an unbounded single-partition sort —
  * the q_equidepth routing discipline packaged for reuse wherever an
  * operator needs equal-count buckets over a TOTAL order on an
  * unbounded frame (q_equidepth ranks the fact table; q_decile_mobility
  * ranks the customer frame — both grow with the corpus, so neither may
  * assume a one-task window at 100 TB).
  *
  * Below `spark.graft.ntile.localMaxBytes` (default 256 MB) a
  * single-partition `ntile()` IS the right plan: one shuffle, no extra
  * passes. Above it: range-repartition on the order columns, count per
  * partition, collect the ≤P counts for driver-side prefix offsets
  * (the ONLY driver data — partition counts, never rows), then exact
  * global rank = offset + per-partition row_number, and the bucket from
  * NTILE's own split arithmetic (first n%b buckets take ⌈n/b⌉ rows, the
  * rest ⌊n/b⌋) — bit-identical assignment to `ntile()` over the same
  * total order, which is what lets callers keep one oracle for both
  * routes.
  */
object GlobalNtile {

  /** `df` plus an INT `bucketCol` ∈ [1, b] assigned by exact NTILE
    * semantics over the total order `order` (must be deterministic and
    * duplicate-free — include a tiebreaker key column). `cacheKey`
    * names the session-persisted ranged frame on the distributed route
    * — the offsets job and the rank job MUST see the same range
    * partitioning, and under AQE only a pinned materialization
    * guarantees that (the q_equidepth lesson). */
  def withBucket(s: SparkSession, df: DataFrame, order: Seq[Column], b: Int,
      bucketCol: String, cacheKey: String): DataFrame = {
    val localMax = s.conf.getOption("spark.graft.ntile.localMaxBytes")
      .map(BigInt(_)).getOrElse(BigInt(256L << 20))
    if (ApproxRouting.inputBytes(df) <= localMax) {
      df.withColumn(bucketCol, ntile(b).over(Window.orderBy(order: _*)))
    } else {
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ranged = graft.CachedPlans.cached(s, s"globalntile.$cacheKey")(
        df.repartitionByRange(parts, order: _*)
          .withColumn("__pid", spark_partition_id()))
      val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val total = counts.map(_._2).sum
      var acc = 0L
      val offsets: Map[Int, Long] =
        counts.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
      val big = total / b + 1
      val cut = (total % b) * big
      val small = math.max(total / b, 1L)
      val r0 = element_at(typedLit(offsets), col("__pid")) +
        row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)) - 1
      ranged
        .withColumn("__r0", r0)
        .withColumn(bucketCol,
          (when(col("__r0") < cut, expr(s"__r0 div ${big}L"))
            .otherwise(lit(total % b) + expr(s"(__r0 - ${cut}L) div ${small}L"))
            + 1).cast("int"))
        .drop("__pid", "__r0")
    }
  }
}
