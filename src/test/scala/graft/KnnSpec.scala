package graft

import graft.operators.KnnOps
import org.scalatest.funsuite.AnyFunSuite

class KnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("lsh ANN recall@10 vs brute force") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(KnnOps.brute.run(spark, sf))
    val approx = pairs(KnnOps.lsh.run(spark, sf))
    assert(exact.size === 50)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below floor")
    info(s"recall@10 = $recall")
  }

  test("lsh corpus path is shuffle-free (signatures per-row, candidates broadcast)") {
    val plan = KnnOps.lsh.run(spark, sf).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    // only the small-candidate distinct and the per-query window may
    // hash-shuffle; the corpus is never exploded ×(L·B) nor shuffled
    assert(shuffles <= 2, s"expected <=2 hash shuffles, got $shuffles:\n$plan")
  }

  test("ivf ANN recall@10 vs brute force") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(KnnOps.brute.run(spark, sf))
    val approx = pairs(KnnOps.ivf.run(spark, sf))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall $recall below floor")
    info(s"ivf recall@10 = $recall")
  }
}
