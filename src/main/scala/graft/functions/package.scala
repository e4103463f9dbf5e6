package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim

/** Column-level API for the engine's custom Catalyst expressions.
  * SQL-side registration lives in [[graft.GraftExtensions]]. */
package object functions {

  def rolling_hash(c: Column): Column =
    ColumnShim.column(RollingHash64(ColumnShim.expression(c)))

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  def word_shingles(text: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(text), n))

  def vec_normalize(a: Column): Column =
    ColumnShim.column(VecNormalize(ColumnShim.expression(a)))

  /** Mergeable t-digest quantiles (TypedImperativeAggregate): partial
    * digests are built map-side and merged after the shuffle — the
    * distributed shape of ClickHouse's quantilesTDigest. */
  def tdigest_quantiles(c: Column, percentages: Seq[Double],
      compression: Int = 300): Column =
    ColumnShim.column(
      TDigestQuantiles(ColumnShim.expression(c.cast("double")), percentages, compression)
        .toAggregateExpression())
}
