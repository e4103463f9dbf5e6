package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-8 additions (Mann-Kendall trend,
  * Chao1/Good-Turing richness, LSH recall audit). The oracle
  * hash-compare is the exactness gate; these assert the mechanics
  * mean what they claim. */
class R8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("q_mann_kendall: S bounded by pair count, z sign follows S, variance positive") {
    val rows = operators.StatsOps.mannKendall.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, s, var18) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val maxPairs = n * (n - 1) / 2
      assert(math.abs(s) <= maxPairs, s"|S|=$s exceeds C(n,2)=$maxPairs: $r")
      assert(var18 > 0, s"daily cent totals should not be fully tied: $r")
      val z = r.getDouble(4)
      if (s > 0) assert(z > 0, s"z must carry S's sign: $r")
      if (s < 0) assert(z < 0, s"z must carry S's sign: $r")
    }
  }

  test("text_chao1: estimate dominates observed vocabulary; unseen mass is a proper ppm") {
    val rows = operators.TextOps.chao1.run(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (nTok, vocab, f1, _, chao1, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))
      assert(f1 <= vocab && vocab <= nTok, s"margins must nest: $r")
      assert(chao1 >= vocab.toDouble, s"Chao1 can only add unseen species: $r")
      assert(ppm >= 0 && ppm <= 1000000, s"unseen mass must be a ppm: $r")
      assert(ppm.toDouble / 1e6 <= f1.toDouble / (nTok - 1).max(1),
        s"Good-Turing mass is f1/N floor-divided: $r")
    }
  }

  test("knn_pq_recall: hits within [0, K]; ADC shortlist+rerank clears the PQ floor") {
    val rows = operators.KnnOps.pqRecall.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10, s"hits out of range: $r")
      assert(r.getLong(2) === r.getLong(1) * 1000000 / 10, s"ppm must be hits/K: $r")
    }
    val mean = rows.map(_.getLong(1)).sum.toDouble / (rows.length * 10)
    assert(mean >= 0.6, s"mean recall $mean below the 0.6 floor KnnSpec pins for PQ")
  }

  test("privacy_l_diversity: margins consistent and the risk rule is what it claims") {
    val rows = operators.CurationOps.lDiversity.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (size, l, share, risk) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))
      assert(l >= 1 && l <= 4, s"band domain has 4 values: $r")
      assert(l <= size, s"distinct bands cannot exceed members: $r")
      assert(share >= 1000000 / 4 / 2 && share <= 1000000, s"dominant share bounds: $r")
      assert(risk === (if (l < 3 || share > 900000) 1 else 0), s"risk rule mismatch: $r")
    }
  }

  test("q_changepoint: split is interior, deviation positive, means bracket the shift") {
    val rows = operators.StatsOps.changepoint.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (k, n, dev) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(k >= 1 && k < n, s"split must be interior: $r")
      assert(dev >= 0, s"|scaled deviation| cannot be negative: $r")
      assert(r.getDouble(5) > 0 && r.getDouble(6) > 0,
        s"daily revenue means must be positive: $r")
    }
  }

  test("text_lang_confusion: cells sum to the corpus; diagonal recall matches lang_id agreement") {
    val cm = operators.TextOps.langConfusion.run(spark, sf).collect()
    val total = cm.map(_.getLong(2)).sum
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(total === docs, "every doc lands in exactly one confusion cell")
    cm.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000, s"recall ppm: $r")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000, s"precision ppm: $r")
    }
    val diagonal = cm.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    val agree = operators.TextOps.langId.run(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("agree")).head.getLong(0)
    assert(diagonal === agree, "diagonal mass must equal the per-doc agreement count")
  }

  test("dedup_lsh_audit: hits nest inside both routes; ppms follow the counts") {
    val r = operators.DedupOps.lshAudit.run(spark, sf).collect()
    assert(r.length === 1)
    val (truth, found, hits) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(hits <= truth && hits <= found, s"intersection must nest: ${r(0)}")
    assert(truth > 0, "fixture plants near-dups; truth set cannot be empty")
    assert(r(0).getLong(3) === hits * 1000000 / truth, s"recall ppm: ${r(0)}")
    assert(r(0).getLong(4) === hits * 1000000 / found, s"precision ppm: ${r(0)}")
    assert(r(0).getLong(3) >= 900000,
      "16x4 banding at tau=0.8 must recall >=90% of the blocked-exact pairs")
  }

  test("mm_id3: walker rejects bad magic, non-syncsafe size bytes, and a lying frame size") {
    val good = operators.MmOps.id3Mp3Stream(12, 5, 1, 30)
    assert(operators.MmOps.parseId3Mp3(good).contains((33, 12, 64, 48000, 30)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(operators.MmOps.parseId3Mp3(badMagic).isEmpty)
    val badSyncsafe = good.clone(); badSyncsafe(9) = (badSyncsafe(9) | 0x80).toByte
    assert(operators.MmOps.parseId3Mp3(badSyncsafe).isEmpty,
      "a size byte with its high bit set must be rejected")
    val badFrame = good.clone(); badFrame(17) = (badFrame(17) + 1).toByte
    assert(operators.MmOps.parseId3Mp3(badFrame).isEmpty,
      "a frame that does not fill the tag body must be rejected")
  }

  test("knn_lsh_recall: per-query hits within [0, K] and mean recall matches KnnSpec's floor") {
    val rows = operators.KnnOps.lshRecall.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10, s"hits out of range: $r")
      assert(r.getLong(2) === r.getLong(1) * 1000000 / 10, s"ppm must be hits/K: $r")
    }
    val mean = rows.map(_.getLong(1)).sum.toDouble / (rows.length * 10)
    assert(mean >= 0.9, s"mean recall $mean below the 0.9 floor KnnSpec pins")
  }

  test("text_utf8_audit: flagged docs are exactly the planted set, class counts disjoint") {
    import org.apache.spark.sql.functions._
    val dmg = operators.TextOps.damagedDocs(spark, sf)
      .select(col("doc_id"), col("planted"),
        (length(col("t")) - length(replace(col("t"), lit("�"), lit("")))).as("repl"),
        (length(col("t")) - length(regexp_replace(col("t"), "[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))).as("ctrl"),
        ((length(col("t")) - length(replace(col("t"), lit("â€"), lit("")))) / 2).as("moji"))
      .collect()
    assert(dmg.nonEmpty)
    dmg.foreach { r =>
      val hit = r.getInt(2) + r.getInt(3) + r.getDouble(4).toInt > 0
      assert(hit === r.getBoolean(1), s"audit flag must equal the planted bit: $r")
    }
    val audit = operators.TextOps.utf8Audit.run(spark, sf).collect()
    assert(audit.length === 20)
    val planted = dmg.count(_.getBoolean(1)).toLong
    assert(audit.map(_.getLong(2)).sum === planted, "flagged total must equal planted total")
    assert(audit.map(_.getLong(1)).sum === dmg.length.toLong)
  }

  test("graph_edge_support: edge supports sum to the node triangle counts (both are 3x triangles)") {
    val edges = operators.GraphOps.edgeSupport.run(spark, sf).collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      assert(r.getLong(2) >= 0)
      assert((r.getLong(2) > 0) === r.getBoolean(3))
      assert(r.getString(0) < r.getString(1), "edges are canonical (u < v)")
    }
    val nodeSum = operators.GraphOps.triangles.run(spark, sf).collect().map(_.getLong(1)).sum
    assert(edges.map(_.getLong(2)).sum === nodeSum,
      "each triangle contributes 3 to edge supports and 3 to node counts")
  }

  test("q_decile_mobility: two-phase ranked route assigns the same deciles as the one-task ntile") {
    val local = operators.AffinityOps.decileMobility.run(spark, sf).collect()
    assert(local.nonEmpty)
    local.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 10 && r.getInt(1) >= 1 && r.getInt(1) <= 10)
    }
    spark.conf.set("spark.graft.ntile.localMaxBytes", "0")
    try {
      val dist = operators.AffinityOps.decileMobility.run(spark, sf).collect()
      assert(dist.map(_.toSeq).toSeq === local.map(_.toSeq).toSeq,
        "the distributed rank formula must reproduce ntile() bucket-for-bucket")
    } finally spark.conf.unset("spark.graft.ntile.localMaxBytes")
  }

  test("emb_dim_profile: 64 dims, moments consistent, variance nonnegative") {
    val rows = operators.EmbedOps.dimProfile.run(spark, sf).collect()
    assert(rows.length === 64)
    rows.foreach { r =>
      val (mn, mx) = (r.getLong(2), r.getLong(3))
      assert(mn <= mx, s"min must not exceed max: $r")
      val mean = r.getDouble(4)
      assert(mean * 1e6 >= mn - 1 && mean * 1e6 <= mx + 1, s"mean outside [min,max]: $r")
      assert(r.getDouble(5) >= 0, s"variance cannot be negative: $r")
      if (mn == mx) assert(r.getBoolean(6), "a constant dimension must flag low_variance")
    }
  }

  test("mm_webp: walker rejects bad magic, a lying RIFF size, and canvas/bitstream disagreement") {
    val good = operators.MmOps.syntheticWebp(37) // 37%3 != 0: no EXIF chunk
    val parsed = operators.MmOps.parseWebpMeta(good)
    assert(parsed.contains((8 + 37 % 16, 8 + (37 / 16) % 16, 2, false, 10L + 5 + 37 % 32)))
    val withExif = operators.MmOps.syntheticWebp(36) // 36%3 == 0: EXIF present
    assert(operators.MmOps.parseWebpMeta(withExif).exists(t => t._3 == 3 && t._4))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(operators.MmOps.parseWebpMeta(badMagic).isEmpty)
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte
    assert(operators.MmOps.parseWebpMeta(badSize).isEmpty,
      "a RIFF size that is not file-8 must be rejected")
    val badDims = good.clone(); badDims(24) = (badDims(24) ^ 1).toByte // VP8X canvas width bit
    assert(operators.MmOps.parseWebpMeta(badDims).isEmpty,
      "VP8L bitstream dims must repeat the VP8X canvas")
    val truncated = java.util.Arrays.copyOf(good, good.length - 3)
    assert(operators.MmOps.parseWebpMeta(truncated).isEmpty)
  }

  test("graph_edge_betweenness: mass identity vs pair distances; every edge carries its own pair") {
    val rows = operators.GraphOps.edgeBetweenness.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "edges canonical u<v")
      // the pair (u,v) itself travels its own edge: d=1, sigma=1 ⇒ the
      // edge's own term is exactly 1e6, so no edge scores below it
      assert(r.getLong(3) >= 1000000L, s"an existing edge carries at least its own pair: $r")
    }
    // identity: Sum_e ebc = Sum_{s<t} d(s,t) (each shortest path has d
    // edges and per-position fractions sum to 1) up to one floor-unit
    // loss per (s,t,edge) term
    val edges = rows.map(r => (r.getString(0), r.getString(1)))
    val adj = scala.collection.mutable.Map.empty[String, List[String]].withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) = v :: adj(u); adj(v) = u :: adj(v) }
    val nodes = adj.keys.toSeq.sorted
    var sumD = 0L
    for (s0 <- nodes) {
      val dist = scala.collection.mutable.Map(s0 -> 0)
      var frontier = List(s0); var h = 0
      while (frontier.nonEmpty) {
        h += 1
        val nxt = frontier.flatMap(adj).distinct.filterNot(dist.contains)
        nxt.foreach(dist(_) = h)
        frontier = nxt
      }
      dist.foreach { case (t, dd) => if (s0 < t) sumD += dd }
    }
    val total = rows.map(_.getLong(3)).sum
    assert(total <= sumD * 1000000L, s"mass cannot exceed the exact identity: $total vs ${sumD * 1000000L}")
    assert(total >= sumD * 1000000L - 5000000L,
      s"floor loss must stay under one unit per term: $total vs ${sumD * 1000000L}")
  }

  test("q_mcnemar: contingency partitions the users; chi2 restates its own discordant pair integers") {
    val rows = operators.StatsOps2.mcnemar.run(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (both, lost, gained, neither) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = SparkTestSession.spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(both + lost + gained + neither === users,
      "the four cells must partition the user base")
    if (lost + gained > 0) {
      val expect = BigDecimal(
        (math.abs(lost.toDouble - gained) - 1.0) * (math.abs(lost.toDouble - gained) - 1.0)
          / (lost + gained))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) === expect, s"chi2 must restate its own integers: $r")
    } else assert(r.isNullAt(4))
  }

  test("q_tukey_hsd: all 10 pairs, q nonnegative, flag restates its own cutoff") {
    val rows = operators.StatsOps2.tukeyHsd.run(spark, sf).collect()
    assert(rows.length === 10, "C(5,2) segment pairs")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs emitted once, ordered")
      assert(r.getDouble(3) >= 0, s"q is an absolute ratio: $r")
      assert(r.getInt(4) === (if (r.getDouble(3) > 3.86) 1 else 0), s"flag cutoff: $r")
    }
  }

  test("q_log_rank: observed deaths partition, expectation bounded by totals, z finite or NULL") {
    val rows = operators.StatsOps2.logRank.run(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (na, nb, oa, ob, e1m, vm) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))
    assert(oa <= na && ob <= nb, "deaths bounded by cohort sizes")
    assert(e1m >= 0 && e1m <= (oa + ob) * 1000000L,
      "expected deaths in A bounded by total deaths")
    assert(vm >= 0)
    if (vm > 0) assert(!r.getDouble(6).isNaN, "z must be finite when variance exists")
    else assert(r.isNullAt(6), "zero variance must emit NULL, not a division blowup")
  }

  test("q_pacf: lag-1 PACF equals lag-1 ACF; all partials are proper correlations") {
    val rows = operators.StatsOps2.pacf.run(spark, sf).collect()
    assert(rows.length === 4)
    val byLag = rows.sortBy(_.getInt(0))
    assert(byLag.head.getDouble(2) === byLag.head.getDouble(1),
      "Durbin-Levinson starts at phi_11 = r1 by definition")
    byLag.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 && math.abs(r.getDouble(2)) <= 1.0,
        s"correlations must stay in [-1,1]: $r")
    }
  }

  test("text_calibration: buckets partition the corpus and the gap restates its own integers") {
    val rows = operators.TextOps.calibration.run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum ===
      SparkTestSession.spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      val (b, mean, act, gap) = (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(b >= 0 && b <= 9, s"decile bucket: $r")
      assert(mean >= b * 100000L && (b == 9 || mean < (b + 1) * 100000L + 1),
        s"bucket mean must sit inside its own decile: $r")
      assert(act >= 0 && act <= 1000000, s"actual rate is a ppm: $r")
      assert(gap === math.abs(mean - act), s"gap must restate its own integers: $r")
    }
  }

  test("emb_cluster_purity: purity bounded below by the dominant label share; ARI in [-1, 1]") {
    val rows = operators.EmbedOps.clusterPurity.run(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n, k, nl, purity, ari) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(k >= 1 && k <= 4 && nl >= 2, s"shape: $r")
    assert(purity >= 1000000 / nl && purity <= 1000000,
      s"purity can never undershoot the uniform-label floor: $r")
    assert(ari >= -1.0 && ari <= 1.0, s"ARI range: $r")
    assert(n === spark.read.parquet(s"$sf/embeddings.parquet").count())
  }

  test("q_l28: histogram partitions active users, days bounded by window, shares sum to ~1M ppm") {
    val rows = operators.EventsAnalytics.l28.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalUsers = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 28, s"days-active outside the window: $r")
      assert(r.getLong(2) === r.getLong(1) * 1000000 / totalUsers,
        s"share must be the exact integral-division ppm: $r")
    }
    val ppmSum = rows.map(_.getLong(2)).sum
    assert(ppmSum >= 1000000 - rows.length && ppmSum <= 1000000,
      s"floored shares must sum to within one ulp-per-row of 1M: $ppmSum")
  }

  test("q_poisson_dispersion: near-unit dispersion on the synthetic daily counts, flag consistent") {
    val rows = operators.StatsOps2.poissonDispersion.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, disp, chi2, flag) = (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getInt(5))
      assert(disp > 0, s"dispersion is a ratio of positive quantities: $r")
      assert(chi2 >= 0, s"chi2 is a scaled sum of squares: $r")
      val expectFlag = math.abs(chi2 - (n - 1)) > 3.0 * math.sqrt(2.0 * (n - 1))
      assert(flag === (if (expectFlag) 1 else 0), s"flag must restate its own cutoff: $r")
    }
  }

  test("knn_graph_recall: exact integers reassemble, recall clears the graph spec's floor") {
    val rows = operators.KnnOps.knnGraphRecall.run(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n, hits, possible, ppm, worst) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(possible === n * 4, "denominator is nodes x k")
    assert(hits <= possible && worst >= 0 && worst <= 4)
    assert(ppm === hits * 1000000 / possible, "ppm must be the exact integral division")
    assert(ppm >= 800000, s"corpus-wide recall fell below the 0.8 floor: $ppm")
  }

  test("q_theil_index: nonnegative, bounded by ln(n), and zero only under perfect equality") {
    val rows = operators.StatsOps2.theilIndex.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, t) = (r.getLong(1), r.getDouble(3))
      // floor-snapping can dip a hair below the mathematical 0 bound
      assert(t >= -1e-5, s"Theil T is nonnegative: $r")
      assert(t <= math.log(n.toDouble), s"T is at most ln(n) (one customer holds all): $r")
      assert(t > 0, s"real revenue data is never perfectly equal: $r")
    }
  }

  test("graph_eccentricity: radius <= ecc <= diameter, flags exact, bounds from real extremes") {
    val rows = operators.GraphOps.eccentricity.run(spark, sf).collect()
    assert(rows.length === 25)
    val diameter = rows.head.getLong(3)
    val radius = rows.head.getLong(4)
    assert(radius >= 1 && radius <= diameter, s"radius/diameter ordering: $radius/$diameter")
    assert(rows.exists(_.getInt(5) == 1) && rows.exists(_.getInt(6) == 1),
      "center and periphery are both nonempty by construction")
    rows.foreach { r =>
      val ecc = r.getLong(2)
      assert(ecc >= radius && ecc <= diameter, s"ecc outside [radius, diameter]: $r")
      assert(r.getInt(5) === (if (ecc == radius) 1 else 0), s"center flag: $r")
      assert(r.getInt(6) === (if (ecc == diameter) 1 else 0), s"periphery flag: $r")
    }
  }

  test("emb_mahalanobis: top-20 strictly ranked, scores positive, E[maha2] ~ dim for the bulk") {
    val rows = operators.EmbedOps.mahalanobis.run(spark, sf).collect()
    assert(rows.length === 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) > b.getLong(1) ||
          (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)),
          "ranking must be (score desc, vec_id) strict")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"a top outlier has positive distance: $r")
      // under any distribution the per-vector EXPECTED maha2 is exactly
      // the dimension count (64); the top-20 must sit above it
      assert(r.getDouble(2) > 64.0, s"an outlier must exceed the population mean: $r")
    }
  }

  test("privacy_t_closeness: t is a proper ppm, risk rule exact, classes partition customers") {
    val rows = operators.CurationOps.tCloseness.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalCustomers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_.getLong(2)).sum === totalCustomers,
      "QI classes must partition the customer table")
    rows.foreach { r =>
      val (t, risk) = (r.getLong(3), r.getInt(4))
      assert(t >= 0 && t <= 1000000, s"t must be a ppm: $r")
      assert(risk === (if (t > 250000) 1 else 0), s"risk rule mismatch: $r")
    }
    // the triad orders: a global-identical class has t=0; sanity that
    // not every class is flagged (the corpus is not pathological)
    assert(rows.count(_.getInt(4) == 0) > rows.length / 2,
      "most classes should track the global distribution")
  }

  test("q_cochran_armitage: margins nest and z carries the sign of the integer numerator") {
    val rows = operators.StatsOps2.cochranArmitage.run(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n, rr, sn, sr, snn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(rr <= n, "successes cannot exceed trials")
    assert(sr <= sn, "score-weighted successes bounded by score-weighted trials")
    assert(snn <= 6 * sn, "scores are 0..6 so s*s*n <= 6*s*n")
    val num = n.toDouble * sr - rr.toDouble * sn
    val z = r.getDouble(5)
    if (num > 0) assert(z > 0, s"z must carry the numerator's sign: $r")
    if (num < 0) assert(z < 0, s"z must carry the numerator's sign: $r")
  }

  test("q_runs_test: run count sits in [1, n1+n2] and the tie-dropped margins are positive") {
    val rows = operators.StatsOps2.runsTest.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n1, n2, runs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n1 > 0 && n2 > 0, s"both sides of the median must be populated: $r")
      assert(math.abs(n1 - n2) <= 1,
        s"dropping exactly the median day leaves near-balanced sides: $r")
      assert(runs >= 1 && runs <= n1 + n2, s"runs bounded by observations: $r")
      assert(!r.getDouble(4).isNaN, s"z must be finite: $r")
    }
  }

  test("knn_graph: structure sound and bucketed neighbors recall the brute top-4") {
    val rows = operators.KnnOps.knnGraph.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byNode = rows.groupBy(_.getLong(0))
    byNode.foreach { case (node, rs) =>
      val rns = rs.map(_.getInt(3)).sorted
      assert(rns.toSeq === (1 to rs.length), s"ranks must be dense from 1 for node $node")
      assert(rs.length <= 4, s"at most k=4 neighbors per node: $node")
      rs.foreach { r =>
        assert(r.getLong(1) != node, "no self edges")
        assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"cosine out of range: $r")
      }
    }
    // recall vs in-memory brute-force top-4 over the same unit vectors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val unit = vecs.map { case (id, e) =>
      val n = math.sqrt(e.map(x => x * x).sum); id -> e.map(_ / n)
    }.toMap
    val ids = unit.keys.toArray
    var hits = 0L
    var total = 0L
    byNode.foreach { case (node, rs) =>
      val u = unit(node)
      val top = ids.filter(_ != node)
        .map(j => (j, unit(j).zip(u).map { case (a, b) => a * b }.sum))
        .sortBy { case (j, c) => (-c, j) }.take(4).map(_._1).toSet
      hits += rs.map(_.getLong(1)).count(top)
      total += 4
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"bucketed k-NN graph recall@4 fell to $recall")
  }

  test("mm_ogg_meta: lacing framing, CRC and structure rules reject every corruption class") {
    val good = operators.MmOps.syntheticOgg(37) // p2 = 237 < 255: single lacing value
    assert(operators.MmOps.parseOggMeta(good).contains(
      (2, 2, 38, 230L + 7 + 37, 230L + 7 + 37)))
    // docId%300 == 55 ⇒ p2 = 255 exactly: lacing [255, 0] — the
    // zero-terminator edge a naive walker drops
    val multiple = operators.MmOps.syntheticOgg(355)
    assert(operators.MmOps.parseOggMeta(multiple).exists(_._2 == 2),
      "a 255-multiple packet still counts once via its 0 terminator")
    val longPacket = operators.MmOps.syntheticOgg(299) // p2 = 499: lacing [255, 244]
    assert(operators.MmOps.parseOggMeta(longPacket).exists(t => t._2 == 2 && t._4 == 538L))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(operators.MmOps.parseOggMeta(badMagic).isEmpty)
    val badCrc = good.clone(); badCrc(40) = (badCrc(40) ^ 1).toByte // payload bit flip
    assert(operators.MmOps.parseOggMeta(badCrc).isEmpty, "CRC must catch a payload flip")
    val badSeq = good.clone()
    // second page starts after page1: 27 + 1 lacing + p1 payload
    val p1 = 30 + 37 % 10
    val page2 = 27 + 1 + p1
    badSeq(page2 + 18) = 9 // sequence gap
    assert(operators.MmOps.parseOggMeta(badSeq).isEmpty, "page sequence must be gapless")
    val truncated = java.util.Arrays.copyOf(good, good.length - 2)
    assert(operators.MmOps.parseOggMeta(truncated).isEmpty)
    val noEos = java.util.Arrays.copyOf(good, page2)
    assert(operators.MmOps.parseOggMeta(noEos).isEmpty, "a stream without EOS is incomplete")
  }

  test("text_vocab_overlap: all 190 pairs, intersection bounded by both vocabularies") {
    val rows = operators.TextOps.vocabOverlap.run(spark, sf).collect()
    assert(rows.length === 20 * 19 / 2, "every source pair must appear")
    rows.foreach { r =>
      val (va, vb, inter, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(inter <= math.min(va, vb), s"|A∩B| cannot exceed either side: $r")
      assert(ppm === inter * 1000000 / (va + vb - inter), s"ppm must be the exact division: $r")
      assert(ppm >= 0 && ppm <= 1000000)
      assert(r.getString(0) < r.getString(1), "pairs are emitted once, ordered")
    }
  }

  test("q_levene: terms nonnegative, medians interior, and F assembles finite") {
    val rows = operators.StatsOps.levene.run(spark, sf).collect()
    assert(rows.length === 5)
    var between = 0.0; var within = 0.0; var n = 0L
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0, s"mean |dev| cannot be negative: $r")
      assert(r.getDouble(4) >= 0, s"between term is a square: $r")
      assert(r.getDouble(5) >= 0, s"within term is a sum of squares: $r")
      between += r.getDouble(4); within += r.getDouble(5); n += r.getLong(1)
    }
    assert(n === SparkTestSession.spark.read.parquet(s"$sf/events.parquet").count())
    val f = (n - rows.length).toDouble / (rows.length - 1) * between / within
    assert(f >= 0 && !f.isNaN && !f.isInfinite, s"F must assemble finite: $f")
  }

  test("q_tdigest_bounds: every per-type digest estimate sits inside its 1% rank band") {
    val rows = operators.Relational.qTdigestBounds.run(spark, sf).collect()
    assert(rows.length === 5)
    val total = rows.map(_.getLong(1)).sum
    assert(total === SparkTestSession.spark.read
      .parquet(s"$sf/events.parquet").count(), "per-type n must partition the corpus")
    rows.foreach { r =>
      assert(r.getBoolean(2), s"p50 estimate broke its rank bound: $r")
      assert(r.getBoolean(3), s"p95 estimate broke its rank bound: $r")
    }
  }

  test("q_jarque_bera: jb reassembles from the snapped moments; positive dispersion shapes") {
    val rows = operators.StatsOps2.jarqueBera.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, sk, ku, jb) = (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(ku > 0, s"kurtosis of a non-degenerate sample is positive: $r")
      assert(jb >= 0, s"JB is a sum of squares: $r")
      val expect = BigDecimal(n / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(jb === expect, s"jb must be exactly n/6(g1^2+(g2-3)^2/4) of the SNAPPED moments: $r")
    }
  }

  test("q_max_drawdown: peak precedes trough, depth is the floored ppm of its own integers") {
    val rows = operators.StatsOps2.maxDrawdown.run(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (peakDay, troughDay) = (r.getDate(1), r.getDate(2))
      val (peak, dd, ppm) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(!peakDay.after(troughDay), s"the peak must precede its trough: $r")
      assert(dd >= 0 && dd <= peak, s"drawdown sits inside [0, peak]: $r")
      assert(ppm === dd * 1000000L / peak, s"depth is integral-division ppm: $r")
    }
  }

  test("q_partial_corr: all four correlations are proper, and removing the confounder moves r") {
    val rows = operators.StatsOps2.partialCorr.run(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    Seq(1, 2, 3, 4).foreach { i =>
      assert(math.abs(r.getDouble(i)) <= 1.0, s"correlation out of [-1,1] at col $i: $r")
    }
  }

  test("text_simpson: ppms proper, dominance bounds concentration, inverse within [1, vocab]") {
    val rows = operators.TextOps.simpson.run(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (n, vocab, sp, bp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sp >= 0 && sp <= 1000000, s"Simpson must be a ppm: $r")
      assert(bp >= 1000000 / vocab && bp <= 1000000, s"dominance at least the uniform share: $r")
      assert(sp <= bp + 1, s"concentration cannot exceed the dominant share: $r")
      if (!r.isNullAt(5)) {
        // the UNBIASED lambda can undershoot 1/V (c=2-everywhere gives
        // inv = N-1 ≈ 2V), so only the hard lower bound holds
        assert(r.getDouble(5) >= 1.0 - 1e-6, s"effective vocabulary is at least 1: $r")
      }
      assert(n >= vocab, s"tokens dominate vocabulary: $r")
    }
  }

  test("graph_betweenness: exact match against an independent in-memory Brandes-style replay") {
    val rows = operators.GraphOps.betweenness.run(spark, sf).collect()
    assert(rows.length === 25)
    // independent replication: collect the SAME sparsified edge list,
    // run plain-Scala BFS sigma counting + the floor-snapped
    // pair-dependency sum, compare bc_micro exactly
    val edges = {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val su = spark.read.parquet(s"$sf/supplier.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      val n = spark.read.parquet(s"$sf/nation.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n.select(col("n_nationkey").as("nk1"), col("n_name").as("src")), col("s_nationkey") === col("nk1"))
        .join(n.select(col("n_nationkey").as("nk2"), col("n_name").as("dst")), col("c_nationkey") === col("nk2"))
        .filter(col("nk1") =!= col("nk2"))
        .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
        .distinct()
        .filter(graft.functions.Exprs.md5Long(concat_ws("|", col("u"), col("v"))) % 4 === 0)
        .collect().map(r => (r.getString(0), r.getString(1)))
    }
    val adj = scala.collection.mutable.Map.empty[String, List[String]].withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) = v :: adj(u); adj(v) = u :: adj(v) }
    val nodes = adj.keys.toSeq.sorted
    // BFS from every root carrying (dist, sigma)
    val state = nodes.map { root =>
      val dist = scala.collection.mutable.Map(root -> 0)
      val sigma = scala.collection.mutable.Map(root -> 1L)
      var frontier = List(root)
      var h = 0
      while (frontier.nonEmpty) {
        h += 1
        val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        frontier.foreach(u => adj(u).foreach { w =>
          if (!dist.contains(w) || dist(w) == h) acc(w) += sigma(u)
        })
        frontier = acc.keys.filter(!dist.contains(_)).toList
        frontier.foreach { w => dist(w) = h; sigma(w) = acc(w) }
      }
      root -> (dist.toMap, sigma.toMap)
    }.toMap
    val bcMicro = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      s0 <- nodes; t <- nodes if s0 < t
      (dS, sigS) = state(s0) if dS.contains(t)
      v <- nodes if v != s0 && v != t
      if dS.contains(v) && state(v)._1.contains(t)
      if dS(v) + state(v)._1(t) == dS(t)
    } bcMicro(v) += sigS(v) * state(v)._2(t) * 1000000L / sigS(t)
    rows.foreach { r =>
      assert(r.getLong(2) === bcMicro(r.getString(0)),
        s"bc_micro mismatch for ${r.getString(0)}: op=${r.getLong(2)} replay=${bcMicro(r.getString(0))}")
    }
  }

  test("q_holm: step-down is monotone and never rejects beyond BH's step-up") {
    val rows = operators.StatsOps2.holm.run(spark, sf).collect()
    assert(rows.length === 5)
    val byRank = rows.sortBy(_.getLong(2))
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(3) <= b.getDouble(3), "holm_adj must be nondecreasing in rank")
        assert(a.getInt(4) >= b.getInt(4), "significance is a prefix of the rank order")
      case _ =>
    }
    byRank.foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(1), s"adjusted p dominates raw p: $r")
    }
    val bh = operators.StatsOps.fdrBh.run(spark, sf).collect()
      .filter(_.getInt(8) == 1).map(_.getString(0)).toSet
    val holmRejects = byRank.filter(_.getInt(4) == 1).map(_.getString(0)).toSet
    assert(holmRejects.subsetOf(bh), "FWER step-down must be at most as liberal as BH")
  }
}
