package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Power-iteration PCA: recovery of a planted dominant direction with
  * a known spectrum, sign canonicalization, and the real-table run. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planted spectrum: top component and eigenvalue recovered") {
    import spark.implicits._
    // x_i = a_i·e0 + b_i·e1 in R^6, a = ±10 (period 2), b = ±1
    // (period 4, staggered) → over 4k rows cov = diag(100, 1, 0…)
    val rows = (0 until 4000).map { i =>
      val a = if (i % 2 == 0) 10.0 else -10.0
      val b = if ((i / 2) % 2 == 0) 1.0 else -1.0
      Seq(a, b, 0.0, 0.0, 0.0, 0.0)
    }
    val df = rows.toDF("x")
    val out = operators.EmbedOps.pcaTop(df)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val loadings = out.map(_._2)
    val lambda = out.head._3
    assert(math.abs(loadings(0) - 1.0) < 1e-9, s"e0 loading ${loadings(0)}")
    loadings.drop(1).foreach(l => assert(math.abs(l) < 1e-6, s"off-axis loading $l"))
    assert(math.abs(lambda - 100.0) < 1e-6, s"eigenvalue $lambda")
    // sign canonicalization: first nonzero loading is positive
    assert(loadings.find(_ != 0.0).exists(_ > 0))
  }

  test("non-zero-mean corpus: centering recovers the covariance direction, not the mean") {
    import spark.implicits._
    // Every row carries a HUGE constant offset along e2 (mean = 100·e2)
    // while the actual variance lives along e0 (±10). The uncentered
    // Gram iteration would lock onto e2; the covariance eigenvector is e0.
    val rows = (0 until 4000).map { i =>
      val a = if (i % 2 == 0) 10.0 else -10.0
      Seq(a, 0.0, 100.0, 0.0, 0.0, 0.0)
    }
    val out = operators.EmbedOps.pcaTop(rows.toDF("x"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val loadings = out.map(_._2)
    assert(math.abs(loadings(0) - 1.0) < 1e-9, s"e0 loading ${loadings(0)}")
    assert(math.abs(loadings(2)) < 1e-6, s"mean-direction loading ${loadings(2)}")
    assert(math.abs(out.head._3 - 100.0) < 1e-6, s"eigenvalue ${out.head._3}")
  }

  test("local and distributed routes are bit-identical (integer-micros sums are order-free)") {
    val xs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("x"))
    val local = operators.EmbedOps.pcaTop(xs).collect().toSeq
    assert(operators.ApproxRouting.lastDecision.get("emb_pca") === "local")
    spark.conf.set("spark.graft.pca.localMaxBytes", "0")
    val dist =
      try operators.EmbedOps.pcaTop(xs).collect().toSeq
      finally spark.conf.unset("spark.graft.pca.localMaxBytes")
    assert(operators.ApproxRouting.lastDecision.get("emb_pca") === "distributed")
    assert(local === dist)
  }

  test("embeddings table: unit loading vector, positive variance, |dim| rows") {
    val out = operators.EmbedOps.pcaTop(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select(col("embedding").cast("array<double>").as("x")))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val norm = math.sqrt(out.map(_._2).map(l => l * l).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading norm $norm (6dp-rounded entries)")
    assert(out.head._3 > 0, "variance along the top component must be positive")
    assert(out.length > 1)
  }
}
