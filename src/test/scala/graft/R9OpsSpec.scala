package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-9 changes: the WinnowStats one-pass
  * kernel vs a reference re-derivation, and the Brandes-pivot
  * landmark-sampled betweenness route. The oracle hash-compare is the
  * exactness gate; these assert the mechanics mean what they claim. */
class R9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  /** Reference winnowing: the naive O(len·w) re-derivation of
    * [[graft.functions.HashImpls.winnowStats]] — per-position gram
    * hash, then an explicit min scan per window with the
    * (hash ASC, pos DESC) tie rule, distinct winners via a Set. */
  private def naiveWinnow(text: String, k: Int, w: Int): (Long, Long, Long) = {
    val bytes = text.getBytes("UTF-8")
    val starts = bytes.indices.filter(i => (bytes(i) & 0xc0) != 0x80).toArray :+ bytes.length
    val n = starts.length - 1
    val m = n - (k - 1)
    val nw = m - (w - 1)
    if (m <= 0 || nw <= 0) return (math.max(m, 0).toLong, math.max(nw, 0).toLong, 0L)
    val keys = (1 to m).map { p =>
      var h = 1125899906842597L
      (starts(p - 1) until starts(p - 1 + k)).foreach(i => h = h * 31L + bytes(i))
      ((h & 0x7fffffffL) << 32) | (4294967295L - p)
    }.toArray
    val winners = scala.collection.mutable.Set[Long]()
    (w to m).foreach { p =>
      val minKey = (p - w until p).map(keys).min
      winners += 4294967295L - (minKey & 0xffffffffL)
    }
    (m.toLong, nw.toLong, winners.size.toLong)
  }

  test("winnowStats kernel equals the naive per-window re-derivation, incl. non-ASCII") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and then some more text",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams hash equal
      "abcdefghabcdefghabcdefgh", // periodic
      "héllo wörld — ünïcode tàil with ample length für grams",
      "exactly15chars!" // m = 8, exactly one window
    )
    texts.foreach { t =>
      val got = graft.functions.HashImpls
        .winnowStats(org.apache.spark.unsafe.types.UTF8String.fromString(t), 8, 8)
        .toLongArray()
      val want = naiveWinnow(t, 8, 8)
      assert((got(0), got(1), got(2)) === want, s"text: $t")
    }
  }

  test("winnowStats: repeated-substring documents share fingerprints (the MOSS guarantee)") {
    // any shared substring of length >= k + w - 1 = 15 must yield a
    // shared selected gram hash; check via density: selections exist
    val rows = operators.TextOps.winnowing.run(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (ng, nw, nsel) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ng == nw + 7, s"gram/window arithmetic: $r")
      assert(nsel >= (nw + 7) / 8 && nsel <= nw, s"winnow coverage bound: $r")
    }
  }

  test("mm_avi: walker rejects bad magic, size lies, and index/data disagreement") {
    val good = operators.MmOps.syntheticAvi(42L)
    assert(operators.MmOps.parseAviMeta(good).isDefined)
    val badMagic = good.clone(); badMagic(8) = 'X'.toByte // form type
    assert(operators.MmOps.parseAviMeta(badMagic).isEmpty)
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte // RIFF size lie
    assert(operators.MmOps.parseAviMeta(badSize).isEmpty)
    assert(operators.MmOps.parseAviMeta(good.take(good.length - 1)).isEmpty,
      "truncation must be caught")
    // corrupt the last idx1 entry's size field: index no longer matches data
    val badIdx = good.clone(); badIdx(badIdx.length - 4) = (badIdx(badIdx.length - 4) + 1).toByte
    assert(operators.MmOps.parseAviMeta(badIdx).isEmpty,
      "idx1 entry disagreeing with its frame must be rejected")
    // flip a frame-count byte in avih: header vs walked count disagreement
    val hdrOff = 12 + 8 + 4 + 8 + 16 // avih payload dwTotalFrames offset in file
    val badNf = good.clone(); badNf(hdrOff) = (badNf(hdrOff) + 1).toByte
    assert(operators.MmOps.parseAviMeta(badNf).isEmpty,
      "avih frame count must match the walked movi frames")
  }

  test("betweenness: K >= |V| pivot sampling reduces bit-exactly to the exact route") {
    val exact = operators.GraphOps.betweenness.run(spark, sf).collect()
    assert(exact.nonEmpty)
    try {
      spark.conf.set("spark.graft.betweenness.roots", "1000")
      val sampled = operators.GraphOps.betweenness.run(spark, sf).collect()
      assert(sampled.map(_.toString).toSeq === exact.map(_.toString).toSeq,
        "with every node a pivot, the |V|/(2K) ordered-pair rescale must cancel exactly")
    } finally spark.conf.unset("spark.graft.betweenness.roots")
  }

  test("r9 stats tier: bounds and identities hold") {
    val mood = operators.StatsOps3.moodMedian.run(spark, sf).collect()
    assert(mood.length === 5)
    val nAll = mood.map(_.getLong(1)).sum
    mood.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1), s"above+below=n_i: $r")
      assert(r.getDouble(5) >= 0, s"chi2 term non-negative: $r")
      assert(r.getDouble(4) > 0, s"median positive: $r")
    }
    // lower median: at least half the mass sits at or below it globally
    assert(mood.map(_.getLong(3)).sum * 2 >= nAll, "median must split the mass")

    val jt = operators.StatsOps3.jonckheere.run(spark, sf).collect()
    assert(jt.length === 1)
    val (jn, jk, jStat, jMean) =
      (jt(0).getLong(0), jt(0).getLong(1), jt(0).getDouble(2), jt(0).getDouble(3))
    assert(jk === 4)
    assert(jStat >= 0 && jStat <= jn.toDouble * jn / 2, s"J within pair bounds: ${jt(0)}")
    assert(jMean > 0 && !jt(0).getDouble(4).isNaN, s"null mean and z defined: ${jt(0)}")

    val cvm = operators.StatsOps3.cvm.run(spark, sf).collect()(0)
    assert(cvm.getDouble(2) >= 0 && cvm.getDouble(2) <= cvm.getLong(0) + cvm.getLong(1),
      s"CvM T in [0, N]: $cvm")

    val dunn = operators.StatsOps3.dunn.run(spark, sf).collect()
    assert(dunn.length === 3, "C(3,2) return-flag pairs")
    dunn.foreach(r => assert(!r.getDouble(4).isNaN, s"z defined: $r"))

    val lb = operators.StatsOps3.ljungBox.run(spark, sf).collect()(0)
    assert(lb.getDouble(1) >= 0, s"Q non-negative: $lb")
    assert((lb.getInt(2) == 1) === (lb.getDouble(1) > 14.067), s"flag consistent: $lb")

    val ent = operators.StatsOps3.entropyRate.run(spark, sf).collect()
    assert(ent.length === 5)
    ent.foreach { r =>
      val h = r.getDouble(2)
      assert(h >= 0 && h <= math.log(5.0) + 1e-4,
        s"conditional entropy within [0, ln 5]: $r")
    }
  }

  test("betweenness: K = 8 pivots give a bounded, non-degenerate approximation") {
    val exact = operators.GraphOps.betweenness.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val est =
      try {
        spark.conf.set("spark.graft.betweenness.roots", "8")
        operators.GraphOps.betweenness.run(spark, sf).collect()
          .map(r => r.getString(0) -> r.getDouble(3)).toMap
      } finally spark.conf.unset("spark.graft.betweenness.roots")
    assert(est.keySet === exact.keySet, "sampled route must emit every node")
    assert(est.values.exists(_ > 0), "8 pivots on the nation graph must see some flow")
    val maxExact = exact.values.max
    assert(maxExact > 0)
    val mae = exact.keys.map(k => math.abs(est(k) - exact(k))).sum / exact.size
    assert(mae <= 0.5 * maxExact,
      s"mean abs error $mae vs max betweenness $maxExact — estimator degenerated")
    // the estimator must broadly preserve ranking: the exact top node
    // should sit in the estimated top 5
    val topExact = exact.maxBy(_._2)._1
    val top5Est = est.toSeq.sortBy(-_._2).take(5).map(_._1).toSet
    assert(top5Est.contains(topExact),
      s"exact top node $topExact missing from estimated top-5 $top5Est")
  }
}
