package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in ApproxCountDistinct rule: `spark.graft.approx.
  * countdistinct=true` flips exact COUNT(DISTINCT x) plans to HLL++
  * engine-wide, without query edits (ClickHouse's
  * count_distinct_implementation setting as a Catalyst rule). */
class ApproxRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private val conf = "spark.graft.approx.countdistinct"

  private def distinctQuery() =
    graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"))

  private def withConf[A](v: String)(body: => A): A = {
    val prior = spark.conf.getOption(conf)
    spark.conf.set(conf, v)
    try body
    finally prior match {
      case Some(p) => spark.conf.set(conf, p)
      case None => spark.conf.unset(conf)
    }
  }

  test("off by default: plan keeps the exact distinct aggregate") {
    val plan = distinctQuery().queryExecution.optimizedPlan.toString
    assert(plan.contains("count(distinct"), s"exact distinct missing:\n$plan")
    assert(!plan.contains("approx_count_distinct"), s"rewrite fired while off:\n$plan")
  }

  test("on: distinct expand gone, HLL++ planned, schema stable, counts within rsd") {
    val exact = distinctQuery().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    withConf("true") {
      val df = distinctQuery()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("approx_count_distinct"), s"rewrite did not fire:\n$optimized")
      assert(!optimized.contains("count(distinct"), s"exact distinct survived:\n$optimized")
      // the scale payoff: no Expand row replication in the physical plan
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Expand"), s"Expand survived the rewrite:\n$physical")
      // alias names unchanged — downstream references keep resolving
      assert(df.columns.toSeq === Seq("event_type", "users", "n"))
      val got = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.keySet === exact.keySet)
      for ((k, (users, n)) <- exact) {
        val (gotUsers, gotN) = got(k)
        assert(gotN === n, "plain COUNT must not be touched")
        assert(math.abs(gotUsers - users).toDouble / users < 0.15,
          s"$k: approx $gotUsers too far from exact $users")
      }
    }
  }

  test("multi-column COUNT(DISTINCT a, b) keeps exact semantics") {
    withConf("true") {
      val df = graft.sources.Tables.events(spark, sf)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id"), col("event_type")).as("pairs"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("count(distinct"),
        s"multi-column distinct must stay exact:\n$optimized")
      assert(df.collect().length > 0)
    }
  }

  test("engine's own oracle ops are untouched by default (q_distinct exact)") {
    // q_distinct is oracle-hash-checked on exact semantics; the rule
    // being opt-in is what keeps that green
    val r = SparkEntry.queries("q_distinct")(spark, sf).collect()
    assert(r.nonEmpty)
  }
}
