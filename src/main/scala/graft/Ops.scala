package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name   `SparkEntry.queries` key (== SURVEY.md §2 `queries key`)
  * @param run    the Spark-first implementation, `(session, sfDir) => result`
  * @param oracle equivalent DuckDB SQL over the same tables; None → the
  *               driver records the weaker rows-only check (op is then
  *               covered by a ScalaTest spec instead)
  */
case class GraftOp(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftOp {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GraftOp =
    GraftOp(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GraftOp =
    GraftOp(name, run, None)
}
