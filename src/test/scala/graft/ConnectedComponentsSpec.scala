package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("200-long chain: star contraction converges in ~log rounds, labels = chain min") {
    // diameter 199 ≫ the 50-round bound that aborts plain propagation —
    // the exact failure mode star contraction exists to remove
    import spark.implicits._
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    spark.conf.set("spark.graft.cc.algo", "star") // pin the distributed path
    val labels =
      try ConnectedComponents.run(spark, edges)
      finally spark.conf.unset("spark.graft.cc.algo")
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 200)
    assert(out.forall(_._2 == 0L), "every chain node must label to the chain minimum")
    assert(ConnectedComponents.lastRounds <= 15,
      s"star contraction took ${ConnectedComponents.lastRounds} rounds on a 200-chain " +
        "— that's diameter-proportional, not logarithmic")
  }

  test("star and propagation agree on a random sparse graph") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(150)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    def labelsWith(algo: String): Array[(Long, Long)] = {
      spark.conf.set("spark.graft.cc.algo", algo)
      try ConnectedComponents.run(spark, edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      finally spark.conf.unset("spark.graft.cc.algo")
    }
    val star = labelsWith("star")
    val prop = labelsWith("propagation")
    val local = labelsWith("auto") // 150 edges ≪ localThreshold → union-find
    assert(star.nonEmpty)
    assert(star.sameElements(prop))
    assert(star.sameElements(local))
  }

  test("empty edge set yields empty labels (no hang, no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(spark, empty).count() === 0)
  }

  test("checkpoint blocks from intermediate rounds are released (two-generation lifecycle)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val edges = (0L until 120L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = ConnectedComponents.run(spark, edges)
    labels.count()
    val after = sc.getPersistentRDDs.size
    // the returned labels frame may keep ONE checkpointed generation
    // alive; the per-round intermediates must be gone
    assert(after - before <= 2,
      s"expected at most 2 retained RDD handles, got ${after - before} " +
        "(intermediate round checkpoints are leaking)")
  }
}
