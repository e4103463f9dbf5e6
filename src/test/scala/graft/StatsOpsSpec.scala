package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the statistics tier (the oracle hash-compare is
  * the exactness gate; these assert the MATH means what it claims). */
class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("q_gini: a Gini coefficient lands in [0, 1)") {
    val rows = operators.StatsOps.gini.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: gini $g out of range")
    }
  }

  test("q_acf: one row per lag 1..7, coefficients in [-1, 1]") {
    val rows = operators.StatsOps.acf.run(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 7))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9,
        s"lag ${r.getInt(0)}: acf ${r.getDouble(2)} outside [-1,1]")
    }
  }

  test("q_holt: forecast is the linear extrapolation of (level, trend)") {
    val rows = operators.StatsOps.holt.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "fold needs two seed points")
      val (l, b, f) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // level/trend are independently 6dp-rounded AFTER the fold, so
      // recomposition agrees to the rounding grid, not bit-exactly
      assert(math.abs(f - (l + 7 * b)) < 1e-4,
        s"${r.getString(0)}: forecast $f vs level+7*trend ${l + 7 * b}")
    }
  }

  test("q_two_prop: exposure counts partition the user set; conversions bounded") {
    val r = operators.StatsOps.twoProp.run(spark, sf).head()
    val users = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(r.getLong(0) + r.getLong(1) === users)
    assert(r.getLong(2) <= r.getLong(0) && r.getLong(3) <= r.getLong(1))
  }

  test("q_key_skew: one row per audited key, shares and percentiles ordered") {
    val rows = operators.StatsOps.keySkew.run(spark, sf).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(3) <= 1000000L, s"${r.getString(0)}: top1_ppm over 100%")
      assert(r.getDouble(4) <= r.getDouble(5) + 1e-9, "p50 must not exceed p99")
      assert(r.getDouble(5) <= r.getLong(6).toDouble + 1e-9, "p99 must not exceed max")
    }
  }

  test("q_ols2: coefficients are finite and volume carries positive price signal") {
    val r = operators.StatsOps.ols2.run(spark, sf).head()
    assert(r.getLong(0) > 0)
    Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)).foreach(v =>
      assert(!v.isNaN && !v.isInfinite, s"non-finite coefficient $v"))
    // revenue in cents rises with total quantity on TPC-H-shaped data
    assert(r.getDouble(3) > 0, s"beta_qty ${r.getDouble(3)} should be positive")
  }

  test("text_zipf: a natural-language corpus has a negative power-law slope") {
    val r = operators.TextOps.zipf.run(spark, sf).head()
    // the synthetic corpus has a small vocabulary — the fit takes
    // min(vocab, 200) terms
    assert(r.getLong(0) >= 10L && r.getLong(0) <= 200L)
    assert(r.getDouble(1) < 0, s"slope ${r.getDouble(1)} should be negative")
  }

  test("q_kruskal: H is non-negative, n covers lineitem, k = 3 return flags") {
    val r = operators.StatsOps.kruskal.run(spark, sf).head()
    val n = sources.Tables.lineitem(spark, sf).count()
    assert(r.getLong(0) === n, "rank test must cover every line item")
    assert(r.getLong(1) === 3L, "three return-flag populations")
    // H is a scaled variance of mean ranks — negative only on a math error
    assert(r.getDouble(2) >= 0.0, s"H ${r.getDouble(2)}")
  }

  test("q_kendall: tau-b in [-1,1]; C+D bounded by n-choose-2; independent columns near 0") {
    val r = operators.StatsOps.kendall.run(spark, sf).head()
    val (n, conc, disc, tau) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(conc >= 0 && disc >= 0 && conc + disc <= n * (n - 1) / 2)
    assert(tau >= -1.0 && tau <= 1.0, s"tau_b $tau")
    // quantity and discount are drawn independently in TPC-H-shaped data
    assert(math.abs(tau) < 0.05, s"tau_b $tau should be near zero")
  }
}
