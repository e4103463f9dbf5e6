package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Third SQL-surface batch (round 2): pivot, positional explode,
  * bucketed histogram — each oracle-checked against DuckDB. */
object SqlSurface3 {

  /** PIVOT: order-status counts spread to columns per priority. Spark's
    * pivot leaves empty cells null; both engines emit 0 instead so the
    * contract is engine-agnostic. */
  val qPivot: GraftOp = GraftOp(
    "q_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))
  }

  /** Positional explode: token + 0-based position per document (DuckDB
    * zips same-level unnests in the SELECT list). Bounded to the first
    * 50 docs to keep the contract output small. */
  val qPosexplode: GraftOp = GraftOp(
    "q_posexplode",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id,
      |  unnest(range(0, len(toks))) AS pos,
      |  unnest(toks) AS tok
      |FROM t ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), "\\s+")))
      .toDF("doc_id", "pos", "tok")
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Bucketed value histogram (fixed-width bins — the shape behind any
    * distribution dashboard; floor-division keys shuffle once). */
  val qHistogram: GraftOp = GraftOp(
    "q_histogram",
    """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
      |  count(*) AS n,
      |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(floor(col("value") / 25.0).as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 6).as("lo"), round(max(col("value")), 6).as("hi"))
      .orderBy(col("bucket"))
  }

  val ops: Seq[GraftOp] = Seq(qPivot, qPosexplode, qHistogram)
}
