package graft

import graft.functions.CmImpls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min tier: the kernel laws that make any partitioning correct
  * (commutative-monoid merge, insert-merge distributivity), the
  * one-sided error contract (never underestimates; bounded over-
  * estimate), and the Spark-level rollup law (per-day sketches
  * cm_merge_agg'd equal the direct whole-table sketch BYTE for byte —
  * the uniqState→uniqMerge shape the HLL/bitmap twins pin). */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cmOf(vs: Seq[Long]): Array[Long] = {
    val c = new Array[Long](CmImpls.D * CmImpls.W)
    vs.foreach(CmImpls.add(c, _, 1L))
    c
  }

  private def merged(a: Array[Long], b: Array[Long]): Array[Long] = {
    val m = a.clone(); CmImpls.merge(m, b); m
  }

  test("kernel: merge is a commutative monoid; insert distributes over merge") {
    val rnd = new scala.util.Random(37L)
    (1 to 100).foreach { _ =>
      def vec() = Vector.fill(rnd.nextInt(400))(rnd.nextLong() % 1000)
      val (xs, ys, zs) = (vec(), vec(), vec())
      val (a, b, c) = (cmOf(xs), cmOf(ys), cmOf(zs))
      assert(merged(a, b).sameElements(merged(b, a)), "commutative")
      assert(merged(merged(a, b), c).sameElements(merged(a, merged(b, c))), "associative")
      assert(cmOf(xs ++ ys).sameElements(merged(a, b)), "insert-merge distributivity")
    }
  }

  test("kernel: never underestimates; overestimate bounded by eN/W per row") {
    val rnd = new scala.util.Random(41L)
    // zipf-ish multiset over a 5k-key domain, 50k inserts
    val stream = Vector.fill(50000)((rnd.nextInt(5000) * rnd.nextDouble()).toLong)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sketch = CmImpls.serialize(cmOf(stream))
    val bound = math.ceil(math.E * stream.size / CmImpls.W).toLong
    exact.foreach { case (k, n) =>
      val est = CmImpls.estimate(sketch, k)
      assert(est >= n, s"key $k: est $est under exact $n — CM must never underestimate")
      assert(est <= n + 4 * bound, s"key $k: est $est way past bound ($n + 4*$bound)")
    }
  }

  test("spark rollup law: per-day sketches merged == whole-table sketch, byte-identical") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy(col("day"))
      .agg(graft.functions.cm_sketch_agg(col("user_id")).as("sk"))
    val rolled = daily.agg(graft.functions.cm_merge_agg(col("sk")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val direct = ev.agg(graft.functions.cm_sketch_agg(col("user_id")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(rolled, direct),
      "counter-wise-add rollup must be lossless vs the direct build")
  }

  test("spark probe: cm_estimate >= exact count for every user; small-domain exactness regime") {
    val ev = graft.sources.Tables.events(spark, sf).select(col("user_id"))
    val sketch = ev.agg(graft.functions.cm_sketch_agg(col("user_id")).as("sk"))
    val probed = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .withColumn("est", graft.functions.cm_estimate(col("sk"), col("user_id")))
    assert(probed.filter(col("est") < col("exact")).count() === 0,
      "no probe may underestimate")
    // sf0.001 has far fewer active users than W counters per row, so
    // most probes should be collision-free (exact); pin a floor rather
    // than an exact ratio to stay robust to data regeneration
    val n = probed.count()
    val exactHits = probed.filter(col("est") === col("exact")).count()
    assert(exactHits * 10 >= n * 9, s"expected ≥90% exact probes in the small regime, got $exactHits/$n")
  }
}
