package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Morton (Z-order) layout keys — the multi-dimensional data-skipping
  * layout behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Sorting by the
  * interleaved key clusters rows that are close in BOTH dimensions, so
  * a range-partitioned writer produces files whose per-file min/max
  * boxes are tight in each dimension and either-dimension predicates
  * prune files (plain sort layouts prune only their leading column).
  */
object ZOrder {

  /** Spread the low 8 bits of `c` to the even bit positions
    * (0x0F0F/0x3333/0x5555 mask-shift rounds — pure codegen'd bit
    * arithmetic). */
  def spread(c: Column): Column = Seq((4, 3855L), (2, 13107L), (1, 21845L))
    .foldLeft(c) { case (e, (sh, mask)) => e.bitwiseOR(shiftleft(e, sh)).bitwiseAND(lit(mask)) }

  /** Append column `zcol` = 16-bit Morton key of `a` interleaved with
    * `b`. Each dimension is min/max-normalized to 8-bit resolution
    * first — interleaving unequal-width domains degenerates to a 1-D
    * sort on whichever dimension holds the higher bits. One scalar
    * min/max aggregate broadcast into the row-wise bit math; no extra
    * shuffle to assign the key. */
  def withZKey(df: DataFrame, a: Column, b: Column, zcol: String): DataFrame = {
    val reserved = Seq("__za", "__zb", "__zamin", "__zamax", "__zbmin", "__zbmax",
      "__zan", "__zbn")
    for (c <- reserved :+ zcol; if df.columns.contains(c))
      throw new IllegalArgumentException(s"withZKey reserves column name $c")
    val t = df
      .withColumn("__za", a.cast(LongType))
      .withColumn("__zb", b.cast(LongType))
    val stats = t.agg(
      min(col("__za")).as("__zamin"), max(col("__za")).as("__zamax"),
      min(col("__zb")).as("__zbmin"), max(col("__zb")).as("__zbmax"))
    t.crossJoin(broadcast(stats))
      .withColumn("__zan", expr("((__za - __zamin) * 256) div (__zamax - __zamin + 1)"))
      .withColumn("__zbn", expr("((__zb - __zbmin) * 256) div (__zbmax - __zbmin + 1)"))
      .withColumn(zcol, spread(col("__zan")).bitwiseOR(shiftleft(spread(col("__zbn")), 1)))
      .drop(reserved: _*)
  }
}
