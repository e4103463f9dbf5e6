package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_embed's exact→bucketed scale routing: above the configured
  * input-size threshold the op plans the cluster-bucketed candidate
  * path instead of the Θ(n²) block-matrix kernel. Pins the swap point,
  * the plan shape on each side, precision (every bucketed pair is
  * bit-identical to the exact op's row), and the recall floor. */
class DedupRoutingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val key = "spark.graft.approx.embed.maxExactBytes"

  private def withConf[A](v: Option[String])(body: => A): A = {
    val prior = spark.conf.getOption(key)
    v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
    try body
    finally prior match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def planOf() =
    SparkEntry.queries("dedup_embed")(spark, sf).queryExecution.optimizedPlan.toString

  test("unset / huge threshold: exact block-matrix kernel planned") {
    withConf(None) {
      val p = planOf()
      assert(p.contains("MapGroups"), s"block-matrix kernel missing:\n$p")
    }
    withConf(Some("9e18")) {
      assert(planOf().contains("MapGroups"), "huge threshold must keep the exact kernel")
    }
  }

  test("threshold below input: bucketed path, bit-identical pairs, recall >= 0.75") {
    val exact = withConf(None) {
      SparkEntry.queries("dedup_embed")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    assert(exact.nonEmpty, "test premise: exact path finds pairs at this SF")
    withConf(Some("1")) {
      val p = planOf()
      assert(!p.contains("MapGroups"), s"exact kernel still planned above threshold:\n$p")
      val bucketed = SparkEntry.queries("dedup_embed")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // precision: every emitted pair exists in the exact result with
      // the IDENTICAL rounded cosine (verification is the same kernel)
      bucketed.foreach { case (pair, cosB) =>
        assert(exact.contains(pair), s"bucketed emitted non-pair $pair")
        assert(exact(pair) === cosB, s"pair $pair: $cosB != exact ${exact(pair)}")
      }
      // recall floor on i.i.d. random vectors (real clustered corpora
      // do better — see dedup_semantic's recall notes)
      val recall = bucketed.size.toDouble / exact.size
      assert(recall >= 0.75, f"recall $recall%.2f below 0.75 floor " +
        s"(${bucketed.size}/${exact.size})")
    }
  }
}
