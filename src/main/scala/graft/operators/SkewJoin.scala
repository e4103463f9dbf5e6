package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling joins (SURVEY.md §5).
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; salting
  * is the explicit fallback when a handful of hot keys dominate (e.g. a
  * power-law user_id in a 100 TB event log) or when the join sits where
  * AQE can't rewrite it. Salting replicates the SMALL side `salts`
  * times and scatters the big side's hot keys across salt buckets, so
  * no single task owns a whole hot key.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * Result is identical to `big.join(small, key)` (inner).
    *
    * The salt hashes the big side's ROW CONTENT (all columns + a seed),
    * not `monotonically_increasing_id()`: monotonic ids are physical
    * positions, so a retried map task can re-scatter the same row into
    * a different salt bucket mid-shuffle. Content hashing is stable
    * under task retry and repartitioning, and spreads a hot key's rows
    * because they differ in their non-key columns.
    *
    * Known limits of content salting (the price of retry determinism):
    * (1) EXACT duplicate rows all land in one salt bucket — a hot key
    * made of byte-identical copies does not spread (dedup first, or
    * accept mono-id's retry instability for that workload); (2) `hash`
    * rejects MapType columns — project them away or to their sorted
    * entries before salting. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      seed: Int = 0x5a17): DataFrame = {
    val rowContent = big.columns.map(col).toSeq :+ lit(seed)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(rowContent: _*), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
