package graft

import graft.functions.SpaceSavingTopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("SpaceSaving typed aggregator recovers the true heavy hitters") {
    import spark.implicits._
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("tok")).as[String]
    val sketch = new SpaceSavingTopK(capacity = 256, k = 20)
    val approx = toks.select(sketch.toColumn).head().map(_._1)
    val exact = graft.operators.TextOps.topTokens.run(spark, sf)
      .collect().map(_.getString(0))
    // capacity >> k on a zipf-ish distribution: true top-10 must survive
    val top10 = exact.take(10).toSet
    assert(top10.subsetOf(approx.toSet),
      s"missing heavy hitters: ${top10 -- approx.toSet}")
  }
}

class EmbedKernelSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("block-matrix kernel == declarative BNL formulation, bit-identical") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val kernel = graft.operators.DedupOps.embedPairs(0.45)(spark, sf)
        .collect().map(_.toString)
      val declarative = graft.operators.DedupOps.embedPairsDeclarative(0.45)(spark, sf)
        .collect().map(_.toString)
      assert(kernel.sameElements(declarative), s"mismatch at $sf")
    }
  }
}
