package graft

import graft.operators.CurationOps
import org.scalatest.funsuite.AnyFunSuite

/** Curation-operator properties beyond the DuckDB oracle: plan shape
  * for the per-source cap (must execute on the native top-k operator,
  * not a full window sort) and the locality guarantee Z-ordering
  * exists to provide. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cap_per_source executes on the native TopKPerKey operator") {
    val plan = CurationOps.capPerSource.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
  }

  test("cap_per_source keeps at most 10 docs per source, the longest ones") {
    val rows = CurationOps.capPerSource.run(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, docs) =>
      assert(docs.length <= 10, s"source $src kept ${docs.length} > 10 docs")
    }
  }

  test("merge_upsert: updated keys carry version-1 values, new keys appear") {
    val out = CurationOps.mergeUpsert.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every key ≡3 (mod 7) must surface as status U, every ≡0 (mod 97) as N
    val o = graft.sources.Tables.orders(spark, sf)
    val expectU = o.filter(org.apache.spark.sql.functions.col("o_orderkey") % 7 === 3).count()
    val expectN = o.filter(org.apache.spark.sql.functions.col("o_orderkey") % 97 === 0).count()
    assert(out.getOrElse("U", 0L) === expectU)
    assert(out.getOrElse("N", 0L) === expectN)
  }

  test("lake_zorder: sorting by zval bounds both dimensions per chunk") {
    // the data-skipping property itself: cut the z-sorted output into
    // contiguous chunks (files, in a real writer) and check each
    // chunk's min/max box is tight in BOTH dimensions — i.e. a
    // predicate on either column prunes most chunks. With a
    // single-dimension sort the secondary dimension's per-chunk range
    // would span ~the full domain.
    val rows = CurationOps.zorder.run(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (cust_bucket, day_bucket), z-sorted
    assert(rows.length > 500)
    val chunks = rows.grouped(rows.length / 16).toSeq
    def spanFrac(vals: Seq[Long]): Double = {
      val all = rows.map(_._2)
      (vals.max - vals.min).toDouble / math.max(1L, all.max - all.min).toDouble
    }
    val avgDaySpan = chunks.map(c => spanFrac(c.map(_._2))).sum / chunks.size
    val avgCustSpan = {
      val allC = rows.map(_._1)
      chunks.map(c => (c.map(_._1).max - c.map(_._1).min).toDouble /
        math.max(1L, allC.max - allC.min).toDouble).sum / chunks.size
    }
    // both dimensions must be locally bounded — each chunk covers well
    // under the full domain (a random order gives ~1.0 on both; a
    // day-only sort gives ~1.0 on cust)
    assert(avgDaySpan < 0.7, f"day span/chunk $avgDaySpan%.2f not bounded")
    assert(avgCustSpan < 0.7, f"cust span/chunk $avgCustSpan%.2f not bounded")
  }

  test("fuzzy_join only compares within blocks (hash equi-join, no cartesian)") {
    val plan = CurationOps.fuzzyJoin.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"fuzzy join went all-pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"fuzzy join went all-pairs:\n$plan")
  }

  test("jaro_winkler pins the published values and DuckDB's byte/empty semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
      ("CRATE", "TRACE"), ("abc", "abc"), ("", ""), ("a", ""),
      // non-ASCII: DuckDB matches UTF-8 BYTES (probed: 0.75, not the
      // 0.8 a codepoint-level window would give) — the kernel must too
      ("résumé", "resume"))
      .toDF("a", "b")
      .select(graft.functions.jaro_winkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val expected = Seq(0.9611111111111111, 0.8400000000000001, 0.8133333333333332,
      0.7333333333333334, 1.0, 0.0, 0.0, 0.75)
    rows.zip(expected).foreach { case (got, want) =>
      assert(got === want, s"expected bit-exact $want, got $got")
    }
  }

  test("jaro_winkler is registered for SQL and matches the Column form") {
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA')").collect().head.getDouble(0)
    assert(viaSql === 0.9611111111111111)
  }

  test("fuzzy_jw stays a blocked equi-join with the similarity as a filter") {
    val plan = CurationOps.fuzzyJw.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"jw join went all-pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"jw join went all-pairs:\n$plan")
    assert(plan.contains("jaro_winkler") || plan.contains("jarowinkler"),
      s"native expression missing from plan:\n$plan")
  }
}
