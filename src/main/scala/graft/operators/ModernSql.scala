package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark 4 modern-SQL surface: recursive CTEs (UnionLoop), VARIANT
  * semi-structured access, and correlated LATERAL subqueries. These are
  * the three newest planner paths a migrating user hits; each gets a
  * DuckDB oracle (DuckDB speaks all three natively).
  */
object ModernSql {

  /** Plan `body` against UNIQUELY-named temp views of the given
    * frames, dropping the views right after planning. `sql()` resolves
    * eagerly, so the returned DataFrame stays valid after the drop —
    * while the shared session catalog never sees a fixed-name
    * mutation: two concurrent planners (or two dirs in one session)
    * cannot race each other's views, and nothing leaks to later
    * callers. `body` receives base-name → unique-name. */
  private def withTempViews(s: SparkSession, dfs: (String, DataFrame)*)(
      body: Map[String, String] => DataFrame): DataFrame = {
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val names = dfs.map { case (base, df) =>
      val unique = s"${base}_$suffix"
      df.createTempView(unique) // unique ⇒ cannot collide; fails loudly if it somehow does
      base -> unique
    }.toMap
    try body(names)
    finally names.values.foreach(s.catalog.dropTempView(_))
  }

  /** Hierarchy walk via WITH RECURSIVE — depth-to-root over the
    * deterministic parent chain key→key/10 (a digit-trie org chart
    * derived from customer keys, so the oracle can replay it). Spark
    * plans this as UnionLoop: each iteration is one distributed step
    * over the frontier, and rounds are bounded by log₁₀(maxkey) — the
    * recursion depth is data-independent, unlike a diameter-bound
    * label-propagation loop. Gated by `spark.sql.cteRecursionEnabled`
    * (set here; default recursion level limit 100 ≫ the ~6 levels any
    * 64-bit key can produce). */
  val recursiveCte: GraftOp = GraftOp(
    "q_recursive_cte",
    """WITH RECURSIVE anc AS (
      |  SELECT c_custkey AS node, c_custkey // 10 AS parent, 1 AS depth FROM customer
      |  UNION ALL
      |  SELECT node, parent // 10, depth + 1 FROM anc WHERE parent >= 10)
      |SELECT node, max(depth) AS depth_to_root FROM anc
      |GROUP BY 1 ORDER BY node LIMIT 1000""".stripMargin) { (s, d) =>
    // enable recursion only for this statement's ANALYSIS, restoring
    // the prior value — leaving it on would let a later query with an
    // accidentally self-referential CTE name silently plan as
    // recursion (the result DataFrame stays valid after restore: the
    // plan is resolved eagerly at sql() time)
    val prior = s.conf.getOption("spark.sql.cteRecursionEnabled")
    s.conf.set("spark.sql.cteRecursionEnabled", "true")
    try {
      withTempViews(s, "customer_v" -> Tables.customer(s, d)) { v =>
        s.sql(
          s"""WITH RECURSIVE anc AS (
             |  SELECT c_custkey AS node, c_custkey div 10 AS parent, 1 AS depth FROM ${v("customer_v")}
             |  UNION ALL
             |  SELECT node, parent div 10, depth + 1 FROM anc WHERE parent >= 10)
             |SELECT node, max(depth) AS depth_to_root FROM anc
             |GROUP BY 1 ORDER BY node LIMIT 1000""".stripMargin)
      }
    } finally prior match {
      case Some(v) => s.conf.set("spark.sql.cteRecursionEnabled", v)
      case None => s.conf.unset("spark.sql.cteRecursionEnabled")
    }
  }

  /** Semi-structured access through the VARIANT type (Spark 4's
    * shredded-storage JSON path — parse once into a binary-encoded
    * value, typed `variant_get` extraction instead of per-access string
    * re-parsing). Same result as the string-path `get_json_object`
    * (etl_json_extract) but the plan carries typed access the reader
    * can push into shredded parquet at scale. */
  val variantJson: GraftOp = GraftOp(
    "q_variant_json",
    """SELECT CAST(json_extract(props, '$.k') AS INT) AS k, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(variant_get(parse_json(col("props")), "$.k", "int").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
  }

  /** Correlated LATERAL subquery: per-nation top-2 customers by
    * balance — the dependent-join shape (each outer row parameterizes
    * an ordered/limited inner query) that Catalyst must decorrelate
    * into a ranked join rather than loop. Tie-broken on c_custkey so
    * the LIMIT cut is deterministic in both engines. */
  val lateralTopN: GraftOp = GraftOp(
    "q_lateral_topn",
    """SELECT n_name, l.c_custkey, l.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
      |ORDER BY n_name, c_custkey""".stripMargin) { (s, d) =>
    withTempViews(s,
      "nation_v" -> Tables.nation(s, d),
      "customer_v" -> Tables.customer(s, d)) { v =>
      s.sql(
        s"""SELECT n_name, l.c_custkey, l.c_acctbal
           |FROM ${v("nation_v")}, LATERAL (
           |  SELECT c_custkey, c_acctbal FROM ${v("customer_v")}
           |  WHERE c_nationkey = n_nationkey
           |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
           |ORDER BY n_name, c_custkey""".stripMargin)
    }
  }

  val ops: Seq[GraftOp] = Seq(recursiveCte, variantJson, lateralTopN)
}
