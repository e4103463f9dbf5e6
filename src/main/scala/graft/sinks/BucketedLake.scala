package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join half of the lake story
  * ([[PartitionedLake]] is the pruning half).
  *
  * A fact table joined on the same key every day (orders⋈customer,
  * lineitem⋈orders) pays a full both-sides shuffle per run. Writing
  * both sides bucketed by the join key (`bucketBy(n, key)` +
  * `sortBy(key)`) pre-shuffles them ONCE at write time: every
  * subsequent join planned over the catalog tables reads bucket i of
  * each side into the same task — the exchange (and with sorted
  * buckets, the sort) disappears from every downstream plan. At 100 TB
  * that converts the recurring O(table) network shuffle into a
  * one-time write cost; bucket count is chosen so a single bucket fits
  * an executor (e.g. 4096 buckets × ~25 GB for a 100 TB fact).
  *
  * Bucketed writes must go through the session catalog (`saveAsTable`;
  * plain `.parquet(path)` silently drops bucketing metadata — there is
  * nowhere to record it), which is how a real deployment stores shared
  * tables anyway.
  */
object BucketedLake {

  /** Write `df` as catalog table `name`, bucketed and sorted by `key`
    * into `buckets` buckets. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** Equi-join two bucketed catalog tables on `key`. When both sides
    * are bucketed by `key` with the same bucket count, the planned
    * join has NO Exchange on either side (BucketedLakeSpec pins this);
    * with sorted buckets the per-bucket sort is also free. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
