package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 (continued) op-kernel pins: the division-free
  * Hodges-Lehmann median-bracket selection, the CVaR ceil-rank tail
  * law, and the TOST/Welch statistic identity — each checked against
  * a brute-force BigInt/sort reference on deterministic data.
  */
class R13cOpsSpec extends AnyFunSuite {

  /** Deterministic LCG so the fixtures are reproducible without RNG. */
  private def lcg(seed: Long, n: Int, mod: Int): Seq[Long] = {
    var x = seed
    (1 to n).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      math.floorMod(x >>> 17, mod.toLong)
    }
  }

  // ---- Hodges-Lehmann: histogram-route bracket selection ----

  /** The op's selection rule: over the diff histogram's cumulative
    * counts, d_lo = min d with 2·cum ≥ N + N%2, d_hi = min d with
    * 2·cum ≥ N − N%2 + 2 (division-free lower/upper median ranks). */
  private def hlViaHistogram(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    val ha = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val diffs = (for ((va, ca) <- ha.toSeq; (vb, cb) <- hb.toSeq)
      yield (vb - va) -> BigInt(ca) * cb)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = diffs.map(_._2).sum
    var cum = BigInt(0)
    var lo = Option.empty[Long]; var hi = Option.empty[Long]
    for ((d, c) <- diffs) {
      cum += c
      if (lo.isEmpty && 2 * cum >= n + (n % 2)) lo = Some(d)
      if (hi.isEmpty && 2 * cum >= n - (n % 2) + 2) hi = Some(d)
    }
    (lo.get, hi.get)
  }

  /** Brute reference: materialize every pairwise difference, sort,
    * take the two middle order statistics. */
  private def hlBrute(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    val diffs = (for (x <- a; y <- b) yield y - x).sorted
    val n = diffs.length
    (diffs((n - 1) / 2), diffs(n / 2))
  }

  test("HL bracket selection equals brute pairwise medians (odd/even/tied)") {
    val cases = Seq(
      (lcg(1, 31, 50), lcg(2, 17, 50)),     // odd x odd
      (lcg(3, 20, 40), lcg(4, 16, 40)),     // even product
      (lcg(5, 25, 5), lcg(6, 24, 5)),       // heavy ties on a tiny grid
      (Seq(7L, 7L, 7L), Seq(7L, 7L)),       // degenerate: all equal
      (Seq(0L), Seq(100L)))                  // single pair
    for ((a, b) <- cases) {
      val got = hlViaHistogram(a, b)
      val want = hlBrute(a, b)
      assert(got === want, s"a=$a b=$b")
    }
  }

  test("HL estimate is location-equivariant: shifting B by s shifts the brackets by s") {
    val a = lcg(7, 40, 30); val b = lcg(8, 35, 30)
    val (lo, hi) = hlViaHistogram(a, b)
    val (lo2, hi2) = hlViaHistogram(a, b.map(_ + 13L))
    assert(lo2 === lo + 13L && hi2 === hi + 13L)
  }

  // ---- CVaR: ceil-rank tail selection ----

  private def cvarViaRank(v: Seq[Long]): (Long, Long, BigInt) = {
    val n = v.length.toLong
    val k = (n * 5 + 99) / 100 // the op's (n*5+99) div 100
    val ranked = v.sorted.zipWithIndex.map { case (x, i) => (x, i + 1L) }
    val tail = ranked.filter(_._2 > n - k).map(_._1)
    (k, tail.min, tail.map(BigInt(_)).sum)
  }

  test("CVaR ceil-k selection equals the sorted top-k (boundary ties included)") {
    for (n <- Seq(1, 19, 20, 21, 100, 137)) {
      val v = lcg(9 + n, n, 25) // small grid -> ties guaranteed at the cut
      val (k, varC, sum) = cvarViaRank(v)
      assert(k === (n * 5 + 99) / 100 && k >= 1)
      val topK = v.sorted.takeRight(k.toInt)
      assert(varC === topK.min, s"n=$n")
      assert(sum === topK.map(BigInt(_)).sum, s"n=$n")
    }
  }

  // ---- TOST: exact-moment formulas and the Welch identity ----

  /** The op's emit math over exact integer moments. */
  private def tost(a: Seq[Long], b: Seq[Long], deltaCents: Double)
      : (Double, Double, Double) = {
    def mom(v: Seq[Long]) =
      (v.size.toLong, v.map(BigInt(_)).sum, v.map(x => BigInt(x) * x).sum)
    val (na, sa, ssa) = mom(a); val (nb, sb, ssb) = mom(b)
    val va = (BigInt(na) * ssa - sa * sa).toDouble / ((na - 1.0) * na.toDouble * na)
    val vb = (BigInt(nb) * ssb - sb * sb).toDouble / ((nb - 1.0) * nb.toDouble * nb)
    val dc = (sb * BigInt(na) - sa * BigInt(nb)).toDouble / (na.toDouble * nb)
    val se = math.sqrt(va + vb)
    ((dc + deltaCents) / se, (deltaCents - dc) / se, dc / se)
  }

  test("TOST one-sided statistics bracket the Welch t: (t_lower - t_upper) / 2 == t_welch") {
    val a = lcg(21, 60, 400); val b = lcg(22, 55, 400)
    val (tl, tu, tw) = tost(a, b, 100.0)
    assert(math.abs((tl - tu) / 2 - tw) < 1e-12)
  }

  test("TOST passes equivalence on identical-mean samples and fails it across a wide shift") {
    val a = lcg(23, 80, 100)
    // same multiset -> dc = 0 -> both statistics equal delta/se > 0
    val (tl0, tu0, _) = tost(a, a.map(identity), 100.0)
    assert(tl0 > 0 && tu0 > 0 && math.abs(tl0 - tu0) < 1e-12)
    // shift B far beyond the margin -> t_upper strongly negative
    val (tl1, tu1, _) = tost(a, a.map(_ + 500L), 100.0)
    assert(tl1 > 0 && tu1 < 0)
  }

  // ---- ERR@10: exact-integer scaling vs the textbook cascade ----

  /** The op's scaled-integer formula: term_r = (2520/r)·num_r·
    * 8^(10−r)·5^c5·7^c7·8^c8 over prior-row factor counts. */
  private def errScaled(nums: Seq[Long]): Long =
    nums.zipWithIndex.map { case (num, i) =>
      val r = i + 1
      val prior = nums.take(i)
      val c5 = prior.count(_ == 3); val c7 = prior.count(_ == 1)
      val c8 = prior.count(_ == 0)
      (2520L / r) * num *
        BigInt(8).pow(10 - r).toLong * BigInt(5).pow(c5).toLong *
        BigInt(7).pow(c7).toLong * BigInt(8).pow(c8).toLong
    }.sum

  /** Textbook ERR (Chapelle 2009): Σ (1/r)·R_r·∏_{i<r}(1−R_i),
    * R = num/8. */
  private def errDirect(nums: Seq[Long]): Double =
    nums.zipWithIndex.map { case (num, i) =>
      val r = i + 1
      val prod = nums.take(i).map(n => 1.0 - n / 8.0).product
      (1.0 / r) * (num / 8.0) * prod
    }.sum

  test("ERR scaled-integer formula equals the textbook cascade for every grade pattern") {
    val denom = 2520.0 * math.pow(8, 10)
    val patterns = Seq(
      Seq.fill(10)(7L),                               // perfect run
      Seq.fill(10)(0L),                               // nothing relevant
      Seq(7L, 3, 1, 0, 0, 0, 0, 0, 0, 0),             // ideal ordering
      Seq(0L, 0, 0, 0, 0, 0, 0, 1, 3, 7),             // inverted
      Seq(1L, 7, 0, 3, 0, 1, 7, 0, 3, 1),             // mixed
      Seq(3L, 3, 3),                                  // short list
      Seq(7L))                                        // single hit
    for (p <- patterns) {
      val got = errScaled(p) / denom
      assert(math.abs(got - errDirect(p)) < 1e-12, s"pattern=$p")
    }
  }

  test("ERR cascade product factors as 5^c5 * 7^c7 * 8^c8 for any prior prefix") {
    val prior = Seq(7L, 3, 1, 0, 3, 0, 1, 7, 0)
    for (k <- prior.indices) {
      val pre = prior.take(k)
      val direct = pre.map(8L - _).product
      val viaCounts = BigInt(5).pow(pre.count(_ == 3)).toLong *
        BigInt(7).pow(pre.count(_ == 1)).toLong *
        BigInt(8).pow(pre.count(_ == 0)).toLong
      assert(direct === viaCounts, s"prefix=$pre")
    }
  }

  // ---- Wilcoxon signed-rank: doubled midranks + tie correction ----

  /** The op's math: histogram of |d|, 2R = 2·start + t − 1 per tie
    * group, W2⁺ = Σ tp·2R, z from exact integers. */
  private def signedRankOp(d: Seq[Long]): (Long, BigInt, Double) = {
    val nz = d.filter(_ != 0)
    val n = nz.length.toLong
    val groups = nz.groupBy(math.abs).toSeq.sortBy(_._1)
    var start = 1L
    var w2 = BigInt(0); var t3t = BigInt(0)
    for ((_, vs) <- groups) {
      val t = vs.length.toLong
      val tp = vs.count(_ > 0).toLong
      w2 += BigInt(tp) * (2 * start + t - 1)
      t3t += BigInt(t) * t * t - t
      start += t
    }
    val z = (w2.toDouble / 2.0 - n * (n + 1.0) / 4.0) /
      math.sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - t3t.toDouble / 48.0)
    (n, w2, z)
  }

  /** Brute reference: assign average midranks by sorting |d|. */
  private def signedRankBrute(d: Seq[Long]): Double = {
    val nz = d.filter(_ != 0)
    val sorted = nz.map(math.abs).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
    nz.filter(_ > 0).map(x => rankOf(math.abs(x))).sum
  }

  test("signed-rank W+ from doubled midranks equals the brute average-rank sum") {
    for (seed <- 31L to 35L) {
      val d = lcg(seed, 50, 21).map(_ - 10) // signed, zeros included
      val (_, w2, _) = signedRankOp(d)
      assert(w2.toDouble / 2.0 === signedRankBrute(d), s"seed=$seed")
    }
  }

  test("signed-rank z is antisymmetric: negating every difference flips its sign") {
    val d = lcg(40, 60, 41).map(_ - 20).filter(_ != 0)
    val (_, _, z) = signedRankOp(d)
    val (_, _, zNeg) = signedRankOp(d.map(-_))
    assert(math.abs(z + zNeg) < 1e-9)
  }

  // ---- Gini split: integer purity vs the textbook impurity ----

  /** The op's exact purity ppm over a labeled (value, isPos) set at
    * split point q (left = value ≤ q). */
  private def purityPpm(rows: Seq[(Long, Boolean)], q: Long): Long = {
    val (l, r) = rows.partition(_._1 <= q)
    val (nl, rl) = (BigInt(l.size), BigInt(l.count(_._2)))
    val (nr, rr) = (BigInt(r.size), BigInt(r.count(_._2)))
    val sl = rl * rl + (nl - rl) * (nl - rl)
    val sr = rr * rr + (nr - rr) * (nr - rr)
    ((sl * nr + sr * nl) * 1000000 / (BigInt(rows.size) * nl * nr)).toLong
  }

  test("Gini purity ppm equals 10^6 * (1 - weighted impurity) within floor rounding") {
    val rows = lcg(50, 200, 10).map(v => (v, (v * 7 + 3) % 5 < 2))
    for (q <- 0L to 8L) {
      val (l, r) = rows.partition(_._1 <= q)
      if (l.nonEmpty && r.nonEmpty) {
        def gini(xs: Seq[(Long, Boolean)]) = {
          val p = xs.count(_._2).toDouble / xs.size
          1.0 - p * p - (1 - p) * (1 - p)
        }
        val impurity = (l.size * gini(l) + r.size * gini(r)) / rows.size
        val direct = (1.0 - impurity) * 1e6
        val got = purityPpm(rows, q).toDouble
        assert(math.abs(got - direct) <= 1.0, s"q=$q got=$got direct=$direct")
      }
    }
  }

  test("Gini purity is maximal at the true boundary of a separable labeling") {
    // labels are exactly value >= 5 -> the q=4 split is pure
    val rows = lcg(51, 300, 10).map(v => (v, v >= 5))
    val candidates = (0L to 8L).filter(q =>
      rows.exists(_._1 <= q) && rows.exists(_._1 > q))
    val best = candidates.maxBy(purityPpm(rows, _))
    assert(best === 4L)
    assert(purityPpm(rows, 4L) === 1000000L)
  }

  // ---- Arc elasticity: the integer form vs the midpoint formula ----

  test("arc elasticity integer num/den equals the midpoint formula on unit values") {
    val cases = Seq((120L, 100L, 600000L, 550000L), (80L, 100L, 500000L, 500000L),
      (100L, 130L, 700000L, 820000L))
    for ((q1, q2, s1, s2) <- cases) {
      val p1 = s1.toDouble / q1; val p2 = s2.toDouble / q2
      val direct = ((q2 - q1).toDouble / (q2 + q1)) / ((p2 - p1) / (p2 + p1))
      val num = BigInt(q2 - q1) * (BigInt(s2) * q1 + BigInt(s1) * q2)
      val den = BigInt(q2 + q1) * (BigInt(s2) * q1 - BigInt(s1) * q2)
      assert(math.abs(num.toDouble / den.toDouble - direct) < 1e-9,
        s"case=($q1,$q2,$s1,$s2)")
      // the op's emitted form: both moves as exact trunc-ppm integers
      // (toward zero, the div/HUGEINT-// shared semantics)
      val dqPpm = (BigInt(q2 - q1) * 1000000 / (q2 + q1)).toLong
      val dpPpm = ((BigInt(s2) * q1 - BigInt(s1) * q2) * 1000000 /
        (BigInt(s2) * q1 + BigInt(s1) * q2)).toLong
      if (dpPpm != 0)
        assert(math.abs(dqPpm.toDouble / dpPpm.toDouble - direct) < 1e-3,
          s"ppm case=($q1,$q2,$s1,$s2)")
    }
  }
}
