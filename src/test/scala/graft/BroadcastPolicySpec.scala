package graft

import graft.operators.{Relational, SqlSurface, SqlSurface3, TpchMore, TpchMore2, TpchMore3}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

/** CI pin for SURVEY §5's broadcast policy (corrected r10): hard
  * `broadcast()` hints are reserved for FIXED-size frames — nation (25
  * rows) and region (5 rows) at every SF, one-row scalar aggregates,
  * bounded domains. part/customer/supplier SCALE with SF (billions of
  * rows at the 100-TB design point); a hard hint there makes Spark
  * attempt the broadcast regardless of size and FAIL the job past the
  * 8 GB broadcast limit — strictly worse than a slow plan. With no
  * hint, AQE's size threshold still picks a broadcast join at every
  * test SF (asserted below on executed plans) and degrades to a
  * shuffle join at scale instead of dying.
  */
class BroadcastPolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Parquet root paths that sit UNDER a broadcast hint in the
    * analyzed plan with NO aggregate/limit between hint and scan —
    * i.e. tables whose full (SF-scaled) row set the query FORCES
    * Spark to broadcast. An Aggregate or Limit on the path bounds the
    * hinted frame by its grouping domain / limit, not the scan size,
    * so scans behind one are not forced-broadcast scans. */
  private def hintedPaths(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan}
    def scans(p: LogicalPlan): Seq[String] = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => Seq.empty
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
      case other => other.children.flatMap(scans)
    }
    df.queryExecution.analyzed.collect { case h: ResolvedHint => scans(h.child) }.flatten
  }

  private val scaled = Seq("part.parquet", "customer.parquet", "supplier.parquet")

  test("no hard broadcast hint on SF-scaled tables (part/customer/supplier)") {
    val reps = Seq(
      "q10_returned" -> TpchMore.q10Returned,
      "q14_promo" -> TpchMore.q14Promo,
      "q18_large" -> TpchMore.q18Large,
      "q19_ored" -> TpchMore.q19Ored,
      "q17_small_qty" -> TpchMore2.q17SmallQty,
      "q7_volume" -> TpchMore2.q7Volume,
      "q8_share" -> TpchMore2.q8Share,
      "q15_top_supp" -> TpchMore2.q15TopSupp,
      "q9_profit" -> TpchMore3.q9Profit,
      "q2_min_cost" -> TpchMore3.q2MinCost,
      "q16_supplier_cnt" -> TpchMore3.q16SupplierCnt,
      "q_cube" -> SqlSurface.qCube,
      "q_hhi" -> SqlSurface3.qHhi,
      "q3_topk" -> Relational.q3Topk,
      "q5_join" -> Relational.q5Join)
    for ((name, op) <- reps) {
      val bad = hintedPaths(op.run(spark, sf))
        .filter(p => scaled.exists(p.contains))
      assert(bad.isEmpty,
        s"$name forces a broadcast of an SF-scaled table: $bad")
    }
  }

  test("fixed-size dims keep their hints (q5_join broadcasts nation+region)") {
    val hinted = hintedPaths(Relational.q5Join.run(spark, sf))
    assert(hinted.exists(_.contains("nation.parquet")) &&
      hinted.exists(_.contains("region.parquet")),
      s"expected nation+region under broadcast hints, got: $hinted")
  }

  test("AQE still picks broadcast joins for the de-hinted dims at test SF") {
    // representative of the 21 de-hinted sites: lineitem ⋈ customer
    // (q10) and lineitem ⋈ part (q14) — after execution the final
    // adaptive plan must have chosen broadcast, not sort-merge, purely
    // from observed sizes
    for (op <- Seq(TpchMore.q10Returned, TpchMore.q14Promo)) {
      val df = op.run(spark, sf)
      df.collect()
      // AdaptiveSparkPlan.toString appends the pre-execution
      // "== Initial Plan ==" section; judge only the final plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("BroadcastHashJoin"),
        s"${op.name}: no broadcast join chosen by AQE at sf0.001:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        s"${op.name}: non-broadcast join in the final plan:\n$plan")
    }
  }
}
