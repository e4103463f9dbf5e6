package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-7 surface (stats tests, journey
  * analytics, graph centralities, tar/zip container legs, readability,
  * JS divergence, shard manifest). The oracle hash-compare is the
  * exactness gate; these assert the math/mechanics mean what they
  * claim — including the corruption paths no oracle row can see. */
class R7OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  // ---- statistics tier ----

  test("q_spearman: rho in [-1,1] and positive (bigger baskets cost more)") {
    val r = operators.StatsOps.spearman.run(spark, sf).head()
    val rho = r.getDouble(1)
    assert(rho > 0.0 && rho <= 1.0, s"rho $rho")
  }

  test("q_welch_t: df within Welch bounds, means positive") {
    val r = operators.StatsOps.welchT.run(spark, sf).head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val df = r.getDouble(5)
    assert(df >= math.min(na, nb) - 1.0 && df <= na + nb - 2.0, s"df $df")
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
  }

  test("q_anova: groups partition the customers; SS terms non-negative") {
    val rows = operators.StatsOps.anova.run(spark, sf).collect()
    val custs = sources.Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum === custs)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"${r.getString(0)} between_term")
      assert(r.getDouble(4) >= 0.0, s"${r.getString(0)} within_term")
    }
  }

  test("q_cramers_v: V in [0,1] and chi2 agrees with q_chi_square's cells") {
    val r = operators.StatsOps.cramersV.run(spark, sf).head()
    val v = r.getDouble(4)
    assert(v >= 0.0 && v <= 1.0, s"V $v")
    // floor snap loses < 1e-6 per cell; 35 cells => within 1e-4 + cell rounding
    val cellSum = operators.EventsAnalytics.chiSquare.run(spark, sf)
      .agg(sum(col("chi2_cell"))).head().getDouble(0)
    assert(math.abs(r.getDouble(3) - cellSum) < 1e-3,
      s"chi2 ${r.getDouble(3)} vs cell sum $cellSum")
  }

  test("q_srm: flag agrees with the exact chi2 against 3.841") {
    val r = operators.StatsOps.srm.run(spark, sf).head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
    assert((r.getInt(3) == 1) === (chi2 > 3.841))
    assert(r.getLong(2) === (na - nb) * (na - nb) * 1000000L / (na + nb))
  }

  test("q_cuped: adjustment preserves the overall mean (theta-weighted identity)") {
    val rows = operators.StatsOps.cuped.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("A", "B"))
    // Σ n_v·(adj_v − y_v) = −θ·Σ n_v·(x̄_v − x̄) = 0: the adjustment
    // only moves variance between variants, never the grand mean
    val shift = rows.map(r => r.getLong(1) * (r.getDouble(4) - r.getDouble(3))).sum
    val total = rows.map(_.getLong(1)).sum
    assert(math.abs(shift / total) < 1e-4, s"grand-mean shift $shift over $total users")
  }

  test("q_theil_sen: pair count is n(n-1)/2 over the day domain") {
    val r = operators.StatsOps.theilSen.run(spark, sf).head()
    val n = r.getLong(0)
    assert(r.getLong(1) === n * (n - 1) / 2)
  }

  // ---- journey analytics ----

  test("q_markov: each row of the transition matrix sums to ~1") {
    val rows = operators.EventsAnalytics.markov.run(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from: sum p $p")
    }
  }

  test("q_power_curve: reverse-cumulative is monotone and tops at |users|") {
    val rows = operators.EventsAnalytics.powerCurve.run(spark, sf).collect()
    val atLeast = rows.map(_.getLong(2))
    assert(atLeast.zip(atLeast.tail).forall { case (a, b) => a >= b },
      "users_at_least must be non-increasing in active_days")
    val users = sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(atLeast.head === users, "at k=min the cumulative covers everyone")
  }

  test("q_hour_heatmap: ppm shares of each weekday sum to 1e6 minus floor loss") {
    val rows = operators.EventsAnalytics.hourHeatmap.run(spark, sf).collect()
    rows.groupBy(_.getInt(0)).foreach { case (dow, rs) =>
      val ppm = rs.map(_.getLong(3)).sum
      assert(ppm <= 1000000L && ppm > 1000000L - 24, s"dow $dow: $ppm")
    }
  }

  // ---- graph centralities ----

  test("graph_clustering: coefficients in [0,1]") {
    val rows = operators.GraphOps.clustering.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0, s"${r.getString(0)}: $c")
    }
  }

  test("graph_assortativity: r in [-1,1] on a non-degenerate degree sequence") {
    val r = operators.GraphOps.assortativity.run(spark, sf).head()
    val a = r.getDouble(1)
    assert(a >= -1.0 && a <= 1.0, s"assortativity $a")
  }

  test("graph_closeness: normalized closeness in (0,1], non-vacuous spread") {
    val rows = operators.GraphOps.closeness.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c > 0.0 && c <= 1.0, s"${r.getString(0)}: $c")
    }
    assert(rows.map(_.getDouble(3)).distinct.length > 1,
      "sparsified graph must yield varied closeness (complete graph is all-1.0)")
  }

  // ---- container kernels (corruption paths the oracle can't see) ----

  test("tar kernel: round trip, checksum detects corruption, truncation -> None") {
    val entries = Seq("a.txt" -> Array.fill[Byte](600)(65), "a.cls" -> "en".getBytes)
    val tar = operators.MmOps.tarBytes(entries)
    assert(tar.length % 512 === 0)
    val Some((n, payload, ok, first)) = operators.MmOps.parseTar(tar)
    assert(n === 2 && payload === 602L && ok === 2 && first === "a.txt")
    // flip one NAME byte in the first header (walk stays aligned —
    // size field untouched): the checksum re-sum must catch it
    val bad = tar.clone(); bad(2) = (bad(2) ^ 1).toByte
    assert(operators.MmOps.parseTar(bad).exists(_._3 < 2), "corrupt header must fail checksum")
    // drop the zero-block terminator: walk must reject
    assert(operators.MmOps.parseTar(tar.dropRight(1024)).isEmpty)
  }

  test("zip kernel: round trip, CRC detects payload corruption, no EOCD -> None") {
    val entries = Seq("d.txt" -> "hello zip world".getBytes, "d.cls" -> "en".getBytes)
    val zip = operators.MmOps.zipBytes(entries)
    val Some((n, total, cdSize, crcOk)) = operators.MmOps.parseZip(zip)
    assert(n === 2 && total === 17L && crcOk === 2)
    assert(cdSize === 92 + entries.map(_._1.length).sum)
    // flip one payload byte (first member's data starts after the
    // 30-byte local header + 5-byte name): its CRC re-check must fail
    val bad = zip.clone(); bad(36) = (bad(36) ^ 1).toByte
    assert(operators.MmOps.parseZip(bad).exists(_._4 < 2), "corrupt payload must fail CRC")
    assert(operators.MmOps.parseZip(zip.take(8)).isEmpty)
  }

  test("pdf kernel: round trip, xref offset corruption detected, no tail -> None") {
    val pdf = operators.MmOps.pdfBytes(3, 612, 792)
    val Some((v, no, np, w, h, ok)) = operators.MmOps.parsePdf(pdf)
    assert(v === "1.4" && no === 5 && np === 3 && w === 612 && h === 792 && ok)
    // corrupt one xref offset digit: validation must catch the lie
    val s = new String(pdf, "US-ASCII")
    // locate the table through the startxref pointer (lastIndexOf("xref")
    // would land inside "startxref" itself)
    val xrefOff = s.substring(s.lastIndexOf("startxref") + 9).trim.takeWhile(_.isDigit).toInt
    val entries0 = s.indexOf('\n', s.indexOf('\n', xrefOff) + 1) + 1
    val bad = pdf.clone()
    bad(entries0 + 20 + 8) = (if (bad(entries0 + 20 + 8) == '0') '1' else '0').toByte
    assert(operators.MmOps.parsePdf(bad).exists(!_._6), "corrupt xref offset must flag")
    // strip the startxref tail: a reader cannot even start
    assert(operators.MmOps.parsePdf(
      s.substring(0, s.lastIndexOf("startxref")).getBytes("US-ASCII")).isEmpty)
  }

  // ---- text + sharding ----

  test("text_readability: syllable proxy bounded by word and char counts") {
    val rows = operators.TextOps.readability.run(spark, sf).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, syl, sent) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w >= 1 && syl >= 1 && sent >= 1)
      // a vowel run needs >= 1 char and no token is all vowels repeated
      // beyond its length: syllables can't exceed ~half the doc's chars
      assert(syl <= 2 * w * 20, s"doc ${r.getLong(0)}: syl $syl vs words $w")
    }
    // scores must vary across docs (non-vacuous)
    assert(rows.map(_.getDouble(4)).distinct.length > 1)
  }

  test("text_js_div: divergence in [0, ln 2]") {
    val rows = operators.TextOps.jsDivergence.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val js = r.getDouble(1)
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"${r.getString(0)}: $js")
    }
  }

  test("knn_mmr: 5 distinct picks per query, rank 1 = pure-relevance top-1") {
    val rows = operators.KnnOps.mmr.run(spark, sf).collect()
    val brute = operators.KnnOps.brute.run(spark, sf).collect()
      .filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 5), s"query $qid ranks")
      val picks = rs.map(_.getLong(2))
      assert(picks.distinct.length === 5, s"query $qid picked a duplicate")
      val r1 = rs.find(_.getInt(1) == 1).get.getLong(2)
      assert(r1 === brute(qid), s"query $qid: MMR rank-1 must equal relevance top-1")
    }
  }

  test("q_bollinger: outside flag consistent with the emitted bands") {
    val rows = operators.StatsOps.bollinger.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, m, sd, flag) = (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5))
      val outside = y > m + 2 * sd || y < m - 2 * sd
      // bands are 6dp-rounded in the emit; re-derive with slack
      if (math.abs(math.abs(y - m) - 2 * sd) > 1e-4)
        assert(outside === (flag == 1), s"${r.getString(0)} ${r.get(1)}: flag $flag")
    }
  }

  test("sample_shard: shards partition the corpus with rough balance") {
    val rows = operators.Sampling.shard.run(spark, sf).collect()
    assert(rows.length === 16)
    val total = sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    val (mn, mx) = (rows.map(_.getLong(1)).min, rows.map(_.getLong(1)).max)
    assert(mx < 3 * math.max(mn, 1L), s"severe shard imbalance: min $mn max $mx")
  }
}
