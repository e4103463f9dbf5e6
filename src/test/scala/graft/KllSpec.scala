package graft

import graft.operators.{KllKernel, KllStream}
import org.scalatest.funsuite.AnyFunSuite

/** Kernel laws for the deterministic compaction rank sketch. The
  * oracle hash-compare proves the closed-form replay agrees across
  * engines; these prove the closed form IS the streaming kernel's
  * sorted-feed state, and that the kernel keeps its rank-error
  * contract under arbitrary feed order and under merge — the two
  * properties the 100-TB per-partition build path relies on. */
class KllSpec extends AnyFunSuite {

  /** True rank error of every retained quantile answer against the
    * exact multiset. */
  private def maxRankErr(sk: KllStream, data: Seq[Long], phis: Seq[Int]): Long =
    phis.map { p =>
      val est = sk.query(p, 100)
      val sorted = data.sorted
      // exact rank range of est in the data (1-based)
      val lo = sorted.indexWhere(_ >= est) + 1L
      val hi = sorted.lastIndexWhere(_ <= est) + 1L
      val target = (p.toLong * data.size + 99) / 100
      if (target >= lo && target <= hi) 0L
      else math.min(math.abs(lo - target), math.abs(hi - target))
    }.max

  private def det(seed: Long, i: Int): Long = {
    // splitmix64-style deterministic pseudo-data (no Math.random)
    var z = seed + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    math.floorMod(z ^ (z >>> 31), 1000000L)
  }

  test("sorted feed reproduces the closed-form canonical state exactly") {
    for ((n, k) <- Seq((1000, 32), (4096, 64), (777, 16), (31, 32), (256, 256))) {
      val sk = new KllStream(k)
      (1 to n).foreach(v => sk.update(v.toLong))
      // feeding 1..n sorted: value at rank g IS g, so the kernel state
      // must equal the (rank, weight) closed form verbatim
      assert(sk.state === KllKernel.canonicalState(n.toLong, k),
        s"kernel sorted-feed state diverged from closed form at n=$n k=$k")
      assert(sk.count === n.toLong)
    }
  }

  test("closed-form mass and bound identities") {
    for (n <- Seq(0L, 1L, 255L, 256L, 600000L, 123457L)) {
      val st = KllKernel.canonicalState(n, 256)
      assert(st.map(_._2).sum === n, s"retained mass != n at n=$n")
      assert(st.map(_._1) === st.map(_._1).sorted, "ranks not ascending")
      assert(st.forall { case (g, _) => g >= 1 && g <= n })
      if (n > 0) {
        val answers = KllKernel.answerRanks(n, 256, Seq(1 -> 100, 50 -> 100, 99 -> 100))
        val e = KllKernel.errBound(n, 256)
        answers.foreach { case ((num, den), rk) =>
          val target = (num.toLong * n + den - 1) / den // ⌈φ·n⌉
          assert(math.abs(rk - target) <= e,
            s"answer rank $rk for $num/$den outside bound $e of target $target at n=$n")
        }
      }
    }
  }

  test("shuffled feed keeps the rank-error bound") {
    val n = 20000
    val k = 64
    val data = (0 until n).map(i => det(42L, i))
    val sk = new KllStream(k)
    data.foreach(sk.update)
    val e = KllKernel.errBound(n.toLong, k)
    val err = maxRankErr(sk, data, Seq(1, 25, 50, 75, 99))
    assert(err <= e, s"shuffled-feed rank error $err exceeds bound $e")
  }

  test("merge of partition sketches keeps a proportional bound") {
    val n = 20000
    val k = 64
    val data = (0 until n).map(i => det(7L, i))
    val parts = data.grouped(n / 8 + 1).toSeq
    val sks = parts.map { p => val s = new KllStream(k); p.foreach(s.update); s }
    val merged = sks.head
    sks.tail.foreach(merged.merge)
    assert(merged.count === n.toLong)
    assert(merged.state.map(_._2).sum === n.toLong, "merge lost mass")
    // merge adds compactions beyond the single-stream schedule; 2x the
    // a-priori bound is the generous envelope the pipeline budgets
    val e = 2 * KllKernel.errBound(n.toLong, k)
    val err = maxRankErr(merged, data, Seq(1, 25, 50, 75, 99))
    assert(err <= e, s"merged rank error $err exceeds envelope $e")
  }

  test("empty corpus: closed form yields no answer rows, kernel refuses a quantile") {
    assert(KllKernel.answerRanks(0L, 256, Seq(50 -> 100)).isEmpty)
    assert(KllKernel.canonicalState(0L, 256).isEmpty)
    assert(KllKernel.errBound(0L, 256) === 0L)
    val sk = new KllStream(64)
    assertThrows[IllegalArgumentException](sk.query(50, 100))
  }
}
