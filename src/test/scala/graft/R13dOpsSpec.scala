package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 (continued) reliability-family pins: the integer-cleared
  * Cohen's-κ / Fleiss'-κ formulas and Cronbach's n-scaled variance
  * form, each checked against the textbook real-arithmetic definition
  * on deterministic fixtures.
  */
class R13dOpsSpec extends AnyFunSuite {

  private def lcg(seed: Long, n: Int, mod: Int): Seq[Long] = {
    var x = seed
    (1 to n).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      math.floorMod(x >>> 17, mod.toLong)
    }
  }

  // ---- Cohen's kappa: integer-cleared form vs textbook po/pe ----

  /** The op's formula: κ = (n·po − pe)/(n² − pe) with
    * pe = r1·c1 + r0·c0, all BigInt. */
  private def kappaInt(n11: Long, n10: Long, n01: Long, n00: Long): Double = {
    val n = BigInt(n11 + n10 + n01 + n00)
    val po = BigInt(n11 + n00)
    val pe = BigInt(n11 + n10) * BigInt(n11 + n01) +
      BigInt(n01 + n00) * BigInt(n10 + n00)
    ((n * po - pe).toDouble / (n * n - pe).toDouble)
  }

  /** Textbook: κ = (po − pe)/(1 − pe) over the probability scale. */
  private def kappaRef(n11: Long, n10: Long, n01: Long, n00: Long): Double = {
    val n = (n11 + n10 + n01 + n00).toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) / n) * ((n11 + n01) / n) +
      ((n01 + n00) / n) * ((n10 + n00) / n)
    (po - pe) / (1 - pe)
  }

  test("Cohen's kappa integer-cleared form tracks the textbook probability form") {
    val cases = Seq((40L, 9L, 6L, 45L), (70L, 5L, 15L, 10L), (1L, 2L, 3L, 4L),
      (100L, 0L, 0L, 100L), (10L, 40L, 40L, 10L))
    for ((a, b, c, dd) <- cases) {
      assert(math.abs(kappaInt(a, b, c, dd) - kappaRef(a, b, c, dd)) < 1e-12,
        s"cells=($a,$b,$c,$dd)")
    }
  }

  test("Cohen's kappa boundary laws: perfect agreement = 1, symmetric swap = negative") {
    assert(kappaInt(50, 0, 0, 50) === 1.0)
    assert(kappaInt(0, 50, 50, 0) < 0)
  }

  // ---- Fleiss' kappa: cleared-denominator form vs textbook ----

  /** The op's formula with m = 3 binary raters: E = S² + (3N−S)²,
    * κ = (3N·T − 2E)/(2·(9N² − E)), T = Σ(p² + (3−p)² − 3). */
  private def fleissInt(votes: Seq[Long]): Double = {
    val n = BigInt(votes.length)
    val sAll = BigInt(votes.sum)
    val t = BigInt(votes.map(p => p * p + (3 - p) * (3 - p) - 3).sum)
    val e = sAll * sAll + (3 * n - sAll) * (3 * n - sAll)
    (3 * n * t - 2 * e).toDouble / (2 * (9 * n * n - e)).toDouble
  }

  /** Textbook Fleiss: P̄o = mean of per-subject agreement
    * (Σnⱼ²−m)/(m(m−1)); P̄e = Σpⱼ². */
  private def fleissRef(votes: Seq[Long]): Double = {
    val m = 3.0
    val n = votes.length.toDouble
    val po = votes.map { p =>
      (p * p + (3 - p) * (3 - p) - m) / (m * (m - 1))
    }.sum / n
    val p1 = votes.sum / (m * n)
    val pe = p1 * p1 + (1 - p1) * (1 - p1)
    (po - pe) / (1 - pe)
  }

  test("Fleiss' kappa cleared form tracks the textbook form") {
    val fixtures = Seq(
      lcg(11, 200, 4),           // uniform vote counts 0..3
      lcg(12, 50, 2).map(_ * 3), // unanimous only: all 0 or 3
      Seq(1L, 2L, 1L, 2L, 1L, 2L))
    for (v <- fixtures) {
      assert(math.abs(fleissInt(v) - fleissRef(v)) < 1e-12, s"votes=$v")
    }
  }

  test("Fleiss' kappa is 1 under unanimous raters with both categories present") {
    assert(fleissInt(Seq(3L, 0L, 3L, 0L, 0L)) === 1.0)
  }

  // ---- Cronbach's alpha: n-scaled integer form vs classic form ----

  /** The op's formula: α = (k/(k−1))·(1 − ΣVᵢ/Vt) with
    * Vᵢ = n·Σxᵢ² − (Σxᵢ)² — population variances scaled by n², which
    * cancels in the ratio. */
  private def alphaInt(items: Seq[Seq[Long]]): Double = {
    val k = items.length
    val n = BigInt(items.head.length)
    def vNum(xs: Seq[Long]): BigInt = {
      val s = BigInt(xs.sum)
      n * xs.map(x => BigInt(x) * x).sum - s * s
    }
    val tot = items.transpose.map(_.sum)
    val vi = items.map(vNum).sum
    val vt = vNum(tot)
    (k.toDouble / (k - 1)) * (1.0 - vi.toDouble / vt.toDouble)
  }

  /** Classic: α over per-item population variances on the real scale. */
  private def alphaRef(items: Seq[Seq[Long]]): Double = {
    val k = items.length
    val n = items.head.length.toDouble
    def popVar(xs: Seq[Long]): Double = {
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    val tot = items.transpose.map(_.sum)
    (k / (k - 1.0)) * (1.0 - items.map(popVar).sum / popVar(tot))
  }

  test("Cronbach alpha integer form tracks the classic variance form") {
    val items = (1 to 5).map(i => lcg(20 + i, 120, 30).map(_ + lcg(99, 120, 10)(i)))
    assert(math.abs(alphaInt(items) - alphaRef(items)) < 1e-10)
  }

  test("Cronbach alpha is exactly 1 for k identical items") {
    val base = lcg(7, 80, 25)
    val items = Seq.fill(5)(base)
    // ΣVᵢ = 5V, Vt = 25V → α = 1.25·(1 − 1/5) = 1 exactly
    assert(alphaInt(items) === 1.0)
  }

  test("Cronbach alpha catches an anti-correlated item (drops below the all-consistent value)") {
    val base = lcg(7, 80, 25)
    val consistent = Seq.fill(5)(base)
    val flipped = consistent.updated(4, base.map(24L - _))
    assert(alphaInt(flipped) < alphaInt(consistent))
  }

  // ---- Croston: gap formulation ≡ zero-filled-spine formulation ----

  private def snap10(x: Double): Double = math.floor(x * 1e10) / 1e10

  /** The op's recurrence over non-zero (index, demand) points. */
  private def crostonGaps(pts: Seq[(Long, Long)]): (Double, Double) = {
    var z = snap10(0.3 * pts(1)._2 + 0.7 * pts(0)._2)
    val i0 = (pts(1)._1 - pts(0)._1).toDouble
    var p = snap10(0.3 * i0 + 0.7 * i0)
    var pi = pts(1)._1
    for ((mi, y) <- pts.drop(2)) {
      z = snap10(0.3 * y + 0.7 * z)
      p = snap10(0.3 * (mi - pi).toDouble + 0.7 * p)
      pi = mi
    }
    (z, p)
  }

  /** Classic statement: walk EVERY period of the spine, updating only
    * at non-zero demand with the accumulated interval counter. */
  private def crostonSpine(pts: Seq[(Long, Long)]): (Double, Double) = {
    val demand = pts.toMap
    val (first, second) = (pts(0)._1, pts(1)._1)
    var z = snap10(0.3 * demand(second) + 0.7 * demand(first))
    val i0 = (second - first).toDouble
    var p = snap10(0.3 * i0 + 0.7 * i0)
    var q = 0L
    for (t <- second + 1 to pts.last._1) {
      q += 1
      demand.get(t) match {
        case Some(y) if y > 0 =>
          z = snap10(0.3 * y + 0.7 * z)
          p = snap10(0.3 * q.toDouble + 0.7 * p)
          q = 0L
        case _ => ()
      }
    }
    (z, p)
  }

  test("Croston gap recurrence equals the classic zero-filled-spine walk") {
    val months = lcg(31, 40, 60).distinct.sorted
    val demands = lcg(32, months.length, 49).map(_ + 1)
    val pts = months.zip(demands)
    assert(crostonGaps(pts) === crostonSpine(pts))
  }

  test("Croston on a dense series (every period demands) reduces to plain EWMA of sizes with p = 1") {
    val pts = (1L to 25L).map(i => (i, (lcg(33, 25, 40)((i - 1).toInt) + 1)))
    val (z, p) = crostonGaps(pts)
    var ref = snap10(0.3 * pts(1)._2 + 0.7 * pts(0)._2)
    for ((_, y) <- pts.drop(2)) ref = snap10(0.3 * y + 0.7 * ref)
    assert(z === ref && p === 1.0)
  }

  // ---- ICC: floor(S²/n) fold vs exact rational between-groups sum ----

  /** The op's ICC over (group → values) with the floored Σ S²/n. */
  private def iccOp(groups: Seq[Seq[Long]]): Double = {
    val a = groups.length
    val n = groups.map(_.length.toLong).sum
    val sb = groups.map { g =>
      val s = BigInt(g.sum); (s * s) / g.length
    }.sum
    val sst = groups.flatten.map(x => BigInt(x) * x).sum
    val tt = BigInt(groups.flatten.sum)
    val nn2 = groups.map(g => BigInt(g.length) * g.length).sum
    val msb = (sb.toDouble - tt.toDouble * tt.toDouble / n) / (a - 1.0)
    val msw = (sst.toDouble - sb.toDouble) / (n - a).toDouble
    val k0 = (n - nn2.toDouble / n) / (a - 1.0)
    (msb - msw) / (msb + (k0 - 1.0) * msw)
  }

  /** Exact-rational reference (no floor) for the same model. */
  private def iccRef(groups: Seq[Seq[Long]]): Double = {
    val a = groups.length
    val n = groups.map(_.length.toLong).sum
    val sb = groups.map { g => val s = g.sum.toDouble; s * s / g.length }.sum
    val sst = groups.flatten.map(x => x.toDouble * x).sum
    val tt = groups.flatten.sum.toDouble
    val nn2 = groups.map(g => g.length.toDouble * g.length).sum
    val msb = (sb - tt * tt / n) / (a - 1.0)
    val msw = (sst - sb) / (n - a).toDouble
    val k0 = (n - nn2 / n) / (a - 1.0)
    (msb - msw) / (msb + (k0 - 1.0) * msw)
  }

  test("ICC floored between-groups fold tracks the exact-rational reference") {
    val groups = (1 to 8).map(i => lcg(40 + i, 50 + i * 3, 5000).map(_ + 100))
    assert(math.abs(iccOp(groups) - iccRef(groups)) < 1e-6)
  }

  test("ICC is near 1 when groups are well separated and near 0 when identical") {
    val sep = (0 until 5).map(i => Seq.fill(30)(1000L * i + 5) ++ Seq(1000L * i + 6))
    assert(iccOp(sep) > 0.99)
    val same = (0 until 5).map(_ => lcg(55, 40, 100))
    assert(math.abs(iccOp(same)) < 0.05)
  }

  // ---- Mann-Kendall: S and tie-corrected variance vs brute ----

  private def mkStats(ys: Seq[Long]): (Long, BigInt) = {
    val n = ys.length
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      s += java.lang.Long.signum(ys(j) - ys(i))
    val ties = ys.groupBy(identity).values.map(_.size.toLong).filter(_ > 1)
    val var18 = BigInt(n.toLong) * (n - 1) * (2L * n + 5) -
      ties.map(t => BigInt(t) * (t - 1) * (2 * t + 5)).sum
    (s, var18)
  }

  test("Mann-Kendall S is antisymmetric and maximal on a strictly monotone series") {
    val up = (1L to 20L).toSeq
    val (sUp, v) = mkStats(up)
    assert(sUp === 20L * 19 / 2)
    val (sDown, _) = mkStats(up.reverse)
    assert(sDown === -sUp)
    assert(v === BigInt(20) * 19 * 45) // no ties
  }

  test("Mann-Kendall tie correction: constant series has S = 0 and var18 = 0") {
    val (s, v) = mkStats(Seq.fill(12)(7L))
    assert(s === 0L && v === 0)
  }

  // ---- CUSUM: 20N-scaled integer recurrence vs real arithmetic ----

  /** The op's exact-integer walk: S⁺ scaled by 20N. */
  private def cusumScaled(xs: Seq[Long]): (BigInt, Int) = {
    val n = BigInt(xs.length)
    val t = BigInt(xs.sum)
    var su = BigInt(0); var mu = BigInt(0); var arg = -1
    for ((x, i) <- xs.zipWithIndex) {
      su = (su + 20 * n * x - 21 * t).max(BigInt(0))
      if (su > mu) { mu = su; arg = i }
    }
    (mu, arg)
  }

  /** Real-arithmetic reference: μ₀ = mean, k = μ₀/20. */
  private def cusumRef(xs: Seq[Long]): (Double, Int) = {
    val mu0 = xs.sum.toDouble / xs.length
    val k = mu0 / 20
    var s = 0.0; var m = 0.0; var arg = -1
    for ((x, i) <- xs.zipWithIndex) {
      s = math.max(0.0, s + (x - mu0 - k))
      if (s > m) { m = s; arg = i }
    }
    (m, arg)
  }

  test("CUSUM scaled-integer recurrence equals the real-arithmetic walk") {
    val xs = lcg(61, 60, 1000).map(_ + 500)
    val (mu, arg) = cusumScaled(xs)
    val (mRef, argRef) = cusumRef(xs)
    assert(arg === argRef)
    assert(math.abs(mu.toDouble / (20.0 * xs.length) - mRef) < 1e-6)
  }

  test("CUSUM flags an upward level shift at/after the shift point") {
    val xs = Seq.fill(30)(100L) ++ Seq.fill(10)(180L)
    val (mu, arg) = cusumScaled(xs)
    assert(mu > 0 && arg >= 30)
  }

  // ---- Pettitt: antisymmetry-reduced cumulative form vs brute ----

  /** The op's form: U_t = cumulative sum of Wᵢ = Σ_j sgn(xᵢ−xⱼ). */
  private def pettittViaW(xs: Seq[Long]): Seq[Long] = {
    val w = xs.map(a => xs.map(b => java.lang.Long.signum(a - b).toLong).sum)
    w.scanLeft(0L)(_ + _).tail.dropRight(1)
  }

  /** Brute: U_t = Σ_{i≤t}Σ_{j>t} sgn(xᵢ−xⱼ). */
  private def pettittBrute(xs: Seq[Long]): Seq[Long] = {
    val n = xs.length
    (0 until n - 1).map { t =>
      (for (i <- 0 to t; j <- t + 1 until n)
        yield java.lang.Long.signum(xs(i) - xs(j)).toLong).sum
    }
  }

  test("Pettitt cumulative-W form equals the brute double sum") {
    val xs = lcg(71, 25, 40)
    assert(pettittViaW(xs) === pettittBrute(xs))
  }

  test("Pettitt K maximizes at a planted distribution break") {
    val xs = Seq.fill(15)(10L) ++ Seq.fill(15)(50L)
    val u = pettittViaW(xs)
    assert(u.map(math.abs).max === u(14).abs) // break after index 14
  }

  // ---- Benford: literal table + string first-digit extraction ----

  test("Benford expected floor-ppm literals match log10(1+1/d) and sum to ~1e6") {
    val ppm = (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
    assert(ppm.head === 301029L && ppm.last === 45757L)
    val total = ppm.sum
    assert(total >= 999995L && total <= 1000000L)
  }

  test("string first-digit extraction equals the arithmetic first significant digit") {
    for (x <- Seq(1L, 9L, 10L, 105L, 9999L, 123456789L)) {
      val viaString = x.toString.charAt(0).asDigit
      var v = x
      while (v >= 10) v /= 10
      assert(viaString === v.toInt)
    }
  }

  // ---- Jackknife: floor-snapped fold vs exact-rational reference ----

  /** The op's SE: micro-snapped leave-one-out means, integer fold. */
  private def jkOp(groups: Seq[Seq[Long]]): Double = {
    val a = groups.length
    val nn = BigInt(groups.map(_.length.toLong).sum)
    val tt = BigInt(groups.flatten.sum)
    val th = groups.map { g =>
      ((tt - g.sum) * 1000000) / (nn - g.length)
    }
    val s1 = th.sum; val s2 = th.map(x => x * x).sum
    math.sqrt(((a - 1.0) / a) *
      (s2.toDouble - s1.toDouble * s1.toDouble / a)) / 1e6
  }

  /** Exact-rational reference (no snap). */
  private def jkRef(groups: Seq[Seq[Long]]): Double = {
    val a = groups.length
    val nn = groups.map(_.length.toLong).sum.toDouble
    val tt = groups.flatten.sum.toDouble
    val th = groups.map(g => (tt - g.sum) / (nn - g.length))
    val m = th.sum / a
    math.sqrt(((a - 1.0) / a) * th.map(x => (x - m) * (x - m)).sum)
  }

  test("jackknife micro-snapped fold tracks the exact-rational SE") {
    val groups = (1 to 12).map(i => lcg(80 + i, 40 + i, 5000).map(_ + 100))
    assert(math.abs(jkOp(groups) - jkRef(groups)) < 1e-4)
  }

  test("jackknife SE is 0 when every group has identical composition") {
    val g = lcg(90, 30, 200)
    assert(jkOp(Seq.fill(10)(g)) === 0.0)
  }

  // ---- Permutation test: p-value laws ----

  /** The op's p over relabel diffs. */
  private def permP(obs: Double, perms: Seq[Double]): Double =
    (1.0 + perms.count(p => math.abs(p) >= math.abs(obs))) / (perms.length + 1.0)

  test("permutation p is 1 when the observed diff is 0 and minimal when it dominates") {
    val perms = lcg(95, 19, 100).map(_.toDouble - 50)
    assert(permP(0.0, perms) === 1.0)
    assert(permP(1e9, perms) === 1.0 / 20)
  }

  test("permutation p is monotone nonincreasing in |observed diff|") {
    val perms = lcg(96, 19, 100).map(_.toDouble - 50)
    val ps = Seq(0.0, 5.0, 20.0, 49.0, 60.0).map(d => permP(d, perms))
    assert(ps === ps.sorted.reverse)
  }

  // ---- Anderson-Darling: tie-run weights and statistic direction ----

  /** The op's tie-run weights off cumulative counts. */
  private def adWeights(counts: Seq[Long]): Seq[(BigInt, BigInt)] = {
    val n = counts.sum
    var cum = 0L
    counts.map { c =>
      cum += c
      val w1 = BigInt(cum) * cum - BigInt(cum - c) * (cum - c)
      val w2 = BigInt(c) * (2 * n + 1) -
        (BigInt(cum) * (cum + 1) - BigInt(cum - c) * (cum - c + 1))
      (w1, w2)
    }
  }

  test("A-D tie-run weights equal the per-index sums Σ(2i−1) and Σ(2(n−i)+1)") {
    val counts = Seq(3L, 1L, 4L, 2L, 5L)
    val n = counts.sum
    val direct = {
      var idx = 0L
      counts.map { c =>
        val is = (idx + 1) to (idx + c)
        idx += c
        (BigInt(is.map(2 * _ - 1).sum), BigInt(is.map(i => 2 * (n - i) + 1).sum))
      }
    }
    assert(adWeights(counts) === direct)
  }

  /** The op's A² with the same erfc polynomial and micro-snapped terms. */
  private def adStat(ys: Seq[Long]): Double = {
    val n = ys.length
    val mean = ys.sum.toDouble / n
    val sd = math.sqrt(ys.map(y => (y - mean) * (y - mean)).sum / (n - 1.0))
    def erfc(x: Double): Double = {
      val t = 1.0 / (1.0 + 0.3275911 * x)
      (0.254829592 * t - 0.284496736 * t * t + 1.421413741 * t * t * t -
        1.453152027 * t * t * t * t + 1.061405429 * t * t * t * t * t) *
        math.exp(-x * x)
    }
    def phi(z: Double): Double =
      if (z >= 0) 1.0 - 0.5 * erfc(z / math.sqrt(2.0)) else 0.5 * erfc(-z / math.sqrt(2.0))
    val hist = ys.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val ws = adWeights(hist.map(_._2))
    def clamp(x: Double) = math.max(1e-12, math.min(1.0 - 1e-12, x))
    val terms = hist.zip(ws).map { case ((v, _), (w1, w2)) =>
      val z = math.rint((v - mean) / sd * 1e6) / 1e6
      math.floor((w1.toDouble * math.log(clamp(phi(z))) +
        w2.toDouble * math.log(clamp(1.0 - phi(z)))) * 1e6).toLong
    }
    -n - terms.sum.toDouble / (n * 1e6)
  }

  test("A-D statistic is small on near-normal data and grows on heavy-tailed data") {
    // binomial-ish sums approximate normal
    val normal = (1 to 60).map(i => (1 to 12).map(j => lcg(i * 7 + j, 1, 10).head).sum)
    val heavy = (1 to 60).map(i => if (i % 10 == 0) 600L else lcg(200 + i, 1, 10).head)
    assert(adStat(normal) < adStat(heavy))
    assert(adStat(normal) < 2.0)
  }

  // ---- Gumbel: literal constants and return-level ordering ----

  test("Gumbel constants: √6/π, γ, and the −ln(−ln p) multipliers") {
    assert(math.abs(math.sqrt(6.0) / math.Pi - 0.7796968) < 1e-6)
    assert(math.abs(-math.log(-math.log(0.99)) - 4.600149) < 1e-5)
    assert(math.abs(-math.log(-math.log(0.999)) - 6.907255) < 1e-5)
    // return levels must order: mu < rl99 < rl999 for beta > 0
    val (mu, beta) = (100.0, 7.0)
    val rl99 = mu + beta * (-math.log(-math.log(0.99)))
    val rl999 = mu + beta * (-math.log(-math.log(0.999)))
    assert(mu < rl99 && rl99 < rl999)
  }

  // ---- Capture-recapture: Chapman laws ----

  private def chapman(n1: Long, n2: Long, m: Long): BigInt =
    (BigInt(n1 + 1) * (n2 + 1)) / (m + 1) - 1

  test("Chapman estimator: full overlap recovers the larger list; fixture matches brute") {
    assert(chapman(100, 40, 40) === BigInt(100)) // n2 ⊆ n1 → N̂ = n1
    // textbook fixture: n1=400, n2=200, m=100 → (401·201)/101 − 1 = 797
    assert(chapman(400, 200, 100) === BigInt(797))
    // estimate grows as overlap shrinks
    assert(chapman(400, 200, 50) > chapman(400, 200, 100))
  }

  // ---- MCC: bounds, perfect/inverse agreement, χ² identity ----

  private def mccOf(n11: Long, n10: Long, n01: Long, n00: Long): Double =
    (n11.toDouble * n00 - n10.toDouble * n01) /
      math.sqrt((n11 + n10).toDouble * (n01 + n00) * (n11 + n01) * (n10 + n00))

  test("MCC is 1 on perfect agreement, −1 on perfect inversion, and satisfies MCC² = χ²/n") {
    assert(mccOf(50, 0, 0, 50) === 1.0)
    assert(mccOf(0, 50, 50, 0) === -1.0)
    val (a, b, c, d) = (40L, 9L, 6L, 45L)
    val n = (a + b + c + d).toDouble
    val m = mccOf(a, b, c, d)
    // χ² of the 2×2 table
    val chi2 = {
      val (r1, r0, c1, c0) = (a + b, c + d, a + c, b + d)
      val cells = Seq((a, r1 * c1), (b, r1 * c0), (c, r0 * c1), (d, r0 * c0))
      cells.map { case (o, e) =>
        val ex = e / n; (o - ex) * (o - ex) / ex
      }.sum
    }
    assert(math.abs(m * m - chi2 / n) < 1e-12)
  }

  // ---- Record breaks: Rényi harmonic expectation ----

  /** Exact record count of a sequence (strict running max). */
  private def nRecords(xs: Seq[Long]): Int = {
    var mx = Long.MinValue; var c = 0
    for (x <- xs) if (x > mx) { mx = x; c += 1 }
    c
  }

  test("records of a strictly increasing series = n; of a decreasing series = 1") {
    assert(nRecords((1L to 20L)) === 20)
    assert(nRecords((1L to 20L).reverse) === 1)
  }

  test("mean record count over ALL permutations of a distinct series equals Hn (Rényi)") {
    val xs = lcg(101, 20, 1000000).distinct.take(7)
    val perms = xs.permutations.toSeq
    val total = perms.map(p => nRecords(p).toLong).sum
    val hn = (1 to xs.length).map(1.0 / _).sum
    assert(math.abs(total.toDouble / perms.length - hn) < 1e-9)
  }

  test("harmonic micro-sums: Σ⌊10⁶/k⌋ under-approximates Hn·10⁶ by < n") {
    for (n <- Seq(10, 100, 2500)) {
      val micro = (1 to n).map(k => 1000000L / k).sum
      val hn = (1 to n).map(1.0 / _).sum
      val err = hn * 1e6 - micro
      assert(err >= 0 && err < n, s"n=$n err=$err")
    }
  }

  // ---- Price indices: identity laws and Fisher bracketing ----

  /** The op's snapped index computation over (q0, s0, q1, s1) parts. */
  private def indices(parts: Seq[(Long, Long, Long, Long)]): (Double, Double, Double) = {
    val ss0 = parts.map(_._2).sum
    val ss1 = parts.map(_._4).sum
    val p1q0 = parts.map { case (q0, _, q1, s1) => BigInt(s1) * q0 * 1000000 / q1 }.sum
    val p0q1 = parts.map { case (q0, s0, q1, _) => BigInt(s0) * q1 * 1000000 / q0 }.sum
    val l = p1q0.toDouble / (ss0.toDouble * 1e6)
    val p = ss1.toDouble * 1e6 / p0q1.toDouble
    (l, p, math.sqrt(l * p))
  }

  test("price indices: identical periods give L = P = F = 1 exactly-ish; pure inflation recovers the factor") {
    val base = Seq((10L, 1000L, 10L, 1000L), (5L, 900L, 5L, 900L))
    val (l0, p0, f0) = indices(base)
    assert(math.abs(l0 - 1) < 1e-9 && math.abs(p0 - 1) < 1e-9 && math.abs(f0 - 1) < 1e-9)
    // prices double, quantities unchanged → all three indices = 2
    val doubled = base.map { case (q0, s0, q1, s1) => (q0, s0, q1, s1 * 2) }
    val (l2, p2, f2) = indices(doubled)
    assert(math.abs(l2 - 2) < 1e-6 && math.abs(p2 - 2) < 1e-6 && math.abs(f2 - 2) < 1e-6)
  }

  test("Fisher index lies between Laspeyres and Paasche") {
    val parts = (1 to 20).map { i =>
      val q0 = lcg(110 + i, 1, 50).head + 1
      val q1 = lcg(120 + i, 1, 50).head + 1
      val s0 = (q0 * (lcg(130 + i, 1, 900).head + 100))
      val s1 = (q1 * (lcg(140 + i, 1, 900).head + 100))
      (q0, s0, q1, s1)
    }
    val (l, p, f) = indices(parts)
    assert(f >= math.min(l, p) - 1e-12 && f <= math.max(l, p) + 1e-12)
  }

  // ---- Seasonality: centered-MA ratio on a planted seasonal series ----

  /** The op's pipeline over a month series: 24·MA window, micro ratio,
    * per-calendar-month mean. */
  private def seasonalIdx(ms: Seq[(Long, Long)]): Map[Long, Double] = {
    val n = ms.length
    val ratios = (6 until n - 6).map { t =>
      val ma24 = ms(t - 6)._2 + 2 * (t - 5 to t + 5).map(ms(_)._2).sum + ms(t + 6)._2
      (ms(t)._1, BigInt(ms(t)._2) * 24 * 1000000 / ma24)
    }
    ratios.groupBy(_._1).map { case (cal, rs) =>
      cal -> (rs.map(_._2).sum / rs.length).toDouble / 1e6
    }
  }

  // ---- Risk panel: RR/OR identities ----

  test("risk panel: RR and OR agree at ppm scale with brute rationals; OR ≥ RR for risk > in B") {
    val (nA, xA, nB, xB) = (400L, 80L, 400L, 120L)
    val rrPpm = BigInt(xB) * nA * 1000000 / (BigInt(nB) * xA)
    val orPpm = BigInt(xB) * (nA - xA) * 1000000 / (BigInt(xA) * (nB - xB))
    assert(rrPpm === BigInt(1500000)) // (120/400)/(80/400) = 1.5
    // OR = (120·320)/(80·280) = 12/7 ≈ 1.714286
    assert(orPpm === BigInt(120) * 320 * 1000000 / (80 * 280))
    assert(orPpm > rrPpm) // OR exaggerates RR when risk rises and outcome is common
    // null case: equal risks → both exactly 10⁶
    val rrNull = BigInt(80) * 400 * 1000000 / (BigInt(400) * 80)
    assert(rrNull === BigInt(1000000))
  }

  // ---- Turning points & Bartels rank: randomness-test laws ----

  private def turningPoints(ys: Seq[Long]): Int =
    (1 until ys.length - 1).count { i =>
      (ys(i) > ys(i - 1) && ys(i) > ys(i + 1)) ||
        (ys(i) < ys(i - 1) && ys(i) < ys(i + 1))
    }

  test("turning points: monotone series has 0, alternating series has n−2; E/Var identities") {
    assert(turningPoints((1L to 20L)) === 0)
    val alt = (0 until 20).map(i => if (i % 2 == 0) 10L else 20L)
    assert(turningPoints(alt) === 18)
    // expected count of a random permutation, checked by enumeration at n=5
    val perms = (1L to 5L).permutations.toSeq
    val mean = perms.map(p => turningPoints(p).toDouble).sum / perms.length
    assert(math.abs(mean - 2.0 * (5 - 2) / 3.0) < 1e-12)
    val variance = perms.map { p =>
      val t = turningPoints(p).toDouble; (t - mean) * (t - mean)
    }.sum / perms.length
    assert(math.abs(variance - (16.0 * 5 - 29) / 90.0) < 1e-12)
  }

  /** The op's RVN over doubled midranks. */
  private def rvn(ys: Seq[Long]): Double = {
    val sorted = ys.sorted
    val r2 = ys.map { y =>
      val rmin = sorted.indexOf(y) + 1L
      val rmax = sorted.lastIndexOf(y) + 1L
      rmin + rmax
    }
    val n = ys.length
    val num = r2.sliding(2).map { case Seq(a, b) => (a - b).toDouble * (a - b) }.sum
    val s = r2.sum.toDouble
    val sq = r2.map(x => x.toDouble * x).sum
    n * num / (n * sq - s * s)
  }

  test("Bartels RVN: monotone < 2 (expected under randomness) < alternating") {
    val mono = (1L to 30L).toSeq
    val alt = (0 until 30).map(i => if (i % 2 == 0) i.toLong else 100L - i)
    assert(rvn(mono) < 0.5)
    assert(rvn(alt) > 3.0)
    // expectation ≈ 2 under exchangeability, checked by enumeration at n=5
    val perms = (1L to 5L).permutations.toSeq
    val mean = perms.map(rvn).sum / perms.length
    assert(math.abs(mean - 2.0) < 0.2)
  }

  test("seasonality indices recover a planted multiplicative December spike") {
    // flat level 1000 with December ×1.5, 4 full years
    val ms = for (y <- 0 until 4; m <- 1 to 12)
      yield ((m.toLong, if (m == 12) 1500L else 1000L))
    val idx = seasonalIdx(ms.toSeq)
    assert(idx(12L) > 1.4 && idx(12L) < 1.5)
    for (m <- 1L to 11L if idx.contains(m)) assert(idx(m) < 1.0)
  }
}
