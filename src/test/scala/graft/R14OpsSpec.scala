package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 op pins: each new statistic recomputed independently in
  * Scala (driver-side brute force over the sf0.001 tables, or law
  * checks with exact invariants) and compared against the op's
  * distributed result.
  */
class R14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- q_mase: brute recomputation from the collected day series ----

  test("q_mase matches a driver-side brute recomputation") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "purchase",
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 2)))) * 100)
        .cast("long").as("x"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val sae1 = daily.sliding(2).map(p => math.abs(p(1) - p(0))).sum
    val sae7 = daily.sliding(8).map(p => math.abs(p(7) - p(0))).sum
    val r = graft.operators.StatsOps7.mase.run(spark, sf).collect().head
    assert(r.getAs[Long]("sae1_cents") === sae1)
    assert(r.getAs[Long]("sae7_cents") === sae7)
    val n1 = daily.length - 1; val n7 = daily.length - 7
    assert(math.abs(r.getAs[Double]("mase_ratio") -
      (sae7.toDouble / n7) / (sae1.toDouble / n1)) < 1e-12)
  }

  // ---- q_kupiec: violation count law + LR recomputation ----

  test("q_kupiec: violations ≤ k, LR ≥ 0, LR matches its own formula") {
    val r = graft.operators.StatsOps7.kupiec.run(spark, sf).collect().head
    val n = r.getAs[Long]("n"); val x = r.getAs[Long]("x")
    val k = (n * 5 + 99) / 100
    assert(x <= k, s"strictly-above-VaR count $x exceeds the tail size $k")
    assert(x >= 0 && n > 0)
    val lr = r.getAs[Double]("lr_pof")
    assert(lr >= -1e-6, s"LR_pof must be nonnegative, got $lr")
    val nd = n.toDouble; val xd = x.toDouble
    val raw = -2.0 * ((nd - xd) * math.log(0.95) + xd * math.log(0.05)
      - (nd - xd) * math.log((nd - xd) / nd)
      - (if (x == 0) 0.0 else xd * math.log(xd / nd)))
    assert(math.abs(lr - math.floor(raw * 1e6) / 1e6) < 1e-9)
  }

  // ---- text_good_turing: brute spectrum over collected tokens ----

  test("text_good_turing matches the brute token spectrum") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split("\\s+").filter(_.nonEmpty)
      .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1))
    val nTokens = counts.values.sum
    val spectrum = counts.values.groupBy(identity).map { case (r, v) => r -> v.size.toLong }
    val rows = graft.operators.TextOps3.goodTuring.run(spark, sf).collect()
    // the 10 smallest frequencies PRESENT (the corpus may have no
    // low-frequency tokens at all — synthetic text has a small vocab)
    val wantR = spectrum.keys.toSeq.sorted.take(10)
    assert(rows.map(_.getAs[Long]("r")).toSeq.sorted === wantR)
    rows.foreach { row =>
      val r = row.getAs[Long]("r")
      assert(row.getAs[Long]("n_r") === spectrum(r), s"N_$r mismatch")
      assert(row.getAs[Long]("n_r_next") === spectrum.getOrElse(r + 1, 0L))
      assert(row.getAs[Long]("n_tokens") === nTokens)
      assert(row.getAs[Long]("vocab") === counts.size.toLong)
      assert(row.getAs[Long]("r_star_micro") ===
        (r + 1) * spectrum.getOrElse(r + 1, 0L) * 1000000L / spectrum(r))
      assert(row.getAs[Long]("p0_ppm") === spectrum.getOrElse(1L, 0L) * 1000000L / nTokens)
    }
  }

  // ---- text_length_ks: brute two-sample KS over collected lengths ----

  test("text_length_ks matches the brute KS distance") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val lo = docs.map(_._1).min; val hi = docs.map(_._1).max
    val a = docs.filter(_._1 == lo).map(_._2).sorted
    val b = docs.filter(_._1 == hi).map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    val d2 = values.map(v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)).max
    val r = graft.operators.TextOps3.lengthKs.run(spark, sf).collect().head
    assert(r.getAs[String]("source_a") === lo)
    assert(r.getAs[String]("source_b") === hi)
    assert(r.getAs[Long]("d_scaled") === d2)
    assert(math.abs(r.getAs[Double]("ks_d") - d2.toDouble / (a.length.toLong * b.length)) < 1e-15)
  }

  // ---- text_source_jaccard: brute shingle sets per source ----

  test("text_source_jaccard matches brute per-source shingle sets") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(text: String): Set[Long] = {
      val toks = text.split("\\s+")
      val sh = if (toks.length >= 3)
        (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
      else Seq(text)
      sh.map(graft.functions.Exprs.md5Long15).toSet
    }
    val bySource: Map[String, Set[Long]] =
      docs.groupBy(_._1).map { case (s0, ds) => s0 -> ds.flatMap(d => shingles(d._2)).toSet }
    val rows = graft.operators.TextOps3.sourceJaccard.run(spark, sf).collect()
    val expected = for {
      sa <- bySource.keys.toSeq.sorted; sb <- bySource.keys.toSeq.sorted
      if sa < sb
      inter = (bySource(sa) & bySource(sb)).size if inter > 0
    } yield (sa, sb, inter.toLong, bySource(sa).size.toLong, bySource(sb).size.toLong)
    assert(rows.length === expected.length)
    rows.zip(expected.sortBy(e => (e._1, e._2))).foreach { case (row, (sa, sb, ic, na, nb)) =>
      assert(row.getAs[String]("source_a") === sa)
      assert(row.getAs[String]("source_b") === sb)
      assert(row.getAs[Long]("n_common") === ic)
      assert(row.getAs[Long]("n_a") === na)
      assert(row.getAs[Long]("n_b") === nb)
      assert(math.abs(row.getAs[Double]("jaccard") - ic.toDouble / (na + nb - ic)) < 1e-15)
    }
  }

  // ---- pack_efficiency: brute recomputation + dominance law ----

  test("pack_efficiency matches brute token accounting; stream dominates padded") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(size(split(col("text"), "\\s+")).cast("long")).collect().map(_.getLong(0))
    val b = 512L
    val n = toks.sum
    val seqsPadded = toks.map(t => (t + b - 1) / b).sum
    val r = graft.operators.PackOps.packEfficiency.run(spark, sf).collect().head
    assert(r.getAs[Long]("n_tokens") === n)
    assert(r.getAs[Long]("seqs_padded") === seqsPadded)
    assert(r.getAs[Long]("seqs_stream") === (n + b - 1) / b)
    assert(r.getAs[Long]("waste_padded") === seqsPadded * b - n)
    // the concatenated stream is the bin-packing lower bound: it can
    // never pad more than one-doc-per-sequence
    assert(r.getAs[Long]("eff_stream_ppm") >= r.getAs[Long]("eff_padded_ppm"))
  }

  // ---- q_horizon_error: brute + consistency with q_mase ----

  test("q_horizon_error matches brute sliding SAEs and q_mase's h=1/h=7 points") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "purchase",
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 2)))) * 100)
        .cast("long").as("x"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val rows = graft.operators.StatsOps7.horizonError.run(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("sae_cents"))).toMap
    assert(rows.keySet === (1L to 7L).toSet)
    (1 to 7).foreach { h =>
      val sae = daily.sliding(h + 1).map(p => math.abs(p(h) - p(0))).sum
      assert(rows(h.toLong) === ((daily.length - h).toLong, sae), s"horizon $h")
    }
    val mase = graft.operators.StatsOps7.mase.run(spark, sf).collect().head
    assert(rows(1L)._2 === mase.getAs[Long]("sae1_cents"))
    assert(rows(7L)._2 === mase.getAs[Long]("sae7_cents"))
  }

  // ---- q_qq_quantiles: brute percentile_disc + monotonicity ----

  test("q_qq_quantiles matches brute lower order statistics per variant") {
    val p = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(org.apache.spark.sql.types.StringType)) % 2 === 0, "A")
          .otherwise("B").as("v"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = p.filter(_._1 == "A").map(_._2).sorted
    val b = p.filter(_._1 == "B").map(_._2).sorted
    // percentile_disc lower semantics: smallest v with 10*cum >= d*n
    def q(xs: Array[Long], d: Int): Long = xs(((d * xs.length + 9) / 10) - 1)
    val rows = graft.operators.StatsOps7.qqQuantiles.run(spark, sf).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile").toInt
      assert(r.getAs[Long]("qa_cents") === q(a, d), s"qa decile $d")
      assert(r.getAs[Long]("qb_cents") === q(b, d), s"qb decile $d")
    }
    val qa = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("qa_cents"))
    assert(qa.zip(qa.tail).forall { case (x, y) => x <= y }, "deciles must be monotone")
  }

  // ---- text_hapax_share: brute per-source token counts ----

  test("text_hapax_share matches brute per-source hapax counts") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = graft.operators.TextOps3.hapaxShare.run(spark, sf).collect()
    val bySource = docs.groupBy(_._1)
    assert(rows.length === bySource.size)
    rows.foreach { r =>
      val s0 = r.getAs[String]("source")
      val counts = scala.collection.mutable.Map.empty[String, Long]
      bySource(s0).foreach(_._2.split("\\s+").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1))
      val hapax = counts.values.count(_ == 1L).toLong
      assert(r.getAs[Long]("n_tokens") === counts.values.sum)
      assert(r.getAs[Long]("vocab") === counts.size.toLong)
      assert(r.getAs[Long]("hapax") === hapax)
      assert(r.getAs[Long]("hapax_vocab_ppm") === hapax * 1000000L / counts.size)
    }
  }

  // ---- q_ansari_bradley: brute midrank-score replay ----

  test("q_ansari_bradley matches a brute midrank-score recomputation") {
    val p = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(
        when(graft.functions.Exprs.md5Long(
          col("user_id").cast(org.apache.spark.sql.types.StringType)) % 2 === 0, "A")
          .otherwise("B").as("v"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byVal = p.groupBy(_._2).map { case (v, xs) =>
      (v, xs.count(_._1 == "A").toLong, xs.length.toLong)
    }.toSeq.sortBy(_._1)
    val n = byVal.map(_._3).sum
    var start = 1L
    var ab2 = BigInt(0); var s1 = BigInt(0); var s2 = BigInt(0)
    byVal.foreach { case (_, ca, c) =>
      val r2 = 2 * start + c - 1
      val a2 = math.min(r2, 2 * (n + 1) - r2)
      ab2 += BigInt(ca) * a2
      s1 += BigInt(c) * a2
      s2 += BigInt(c) * a2 * a2
      start += c
    }
    val na = p.count(_._1 == "A").toLong; val nb = n - na
    val r = graft.operators.StatsOps7.ansariBradley.run(spark, sf).collect().head
    assert(r.getAs[Long]("n_a") === na)
    assert(r.getAs[Double]("ab2") === ab2.toDouble)
    val z = (BigInt(n) * ab2 - BigInt(na) * s1).toDouble /
      math.sqrt(na.toDouble * nb.toDouble * (BigInt(n) * s2 - s1 * s1).toDouble / (n - 1.0))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
  }

  // ---- q_cmh: brute stratified 2x2 replay + nonnegativity ----

  test("q_cmh matches a brute stratified 2x2 recomputation") {
    def asL(r: Row, i: Int): Long = r.get(i).asInstanceOf[Number].longValue
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey")).distinct()
      .collect().map(asL(_, 0)).toSet
    val cust = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => asL(r, 0) -> asL(r, 1)).toMap
    val cells = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .collect().foreach { r =>
        val nation = cust(asL(r, 1))
        val hi = if (Set("1-URGENT", "2-HIGH")(r.getString(2))) 1L else 0L
        val ret = if (li(asL(r, 0))) 1L else 0L
        cells((nation, hi, ret)) = cells.getOrElse((nation, hi, ret), 0L) + 1
      }
    var dev = BigInt(0); var vr = BigInt(0); var ad = BigInt(0); var bc = BigInt(0)
    var strata = 0L
    cells.keys.map(_._1).toSeq.distinct.foreach { nat =>
      val a = cells.getOrElse((nat, 1L, 1L), 0L); val b = cells.getOrElse((nat, 1L, 0L), 0L)
      val c2 = cells.getOrElse((nat, 0L, 1L), 0L); val d2 = cells.getOrElse((nat, 0L, 0L), 0L)
      val nn = a + b + c2 + d2
      if (nn > 1) {
        strata += 1
        dev += BigInt(a) * 1000000 - BigInt(a + b) * (a + c2) * 1000000 / nn
        vr += BigInt(a + b) * (c2 + d2) * (a + c2) * (b + d2) * 1000000 /
          (BigInt(nn) * nn * (nn - 1))
        ad += BigInt(a) * d2 * 1000000 / nn
        bc += BigInt(b) * c2 * 1000000 / nn
      }
    }
    val r = graft.operators.StatsOps7.cmh.run(spark, sf).collect().head
    assert(r.getAs[Long]("n_strata") === strata)
    assert(r.getAs[Double]("dev_micro") === dev.toDouble)
    assert(r.getAs[Double]("var_micro") === vr.toDouble)
    assert(r.getAs[Double]("cmh") >= 0.0)
    assert(math.abs(r.getAs[Double]("or_mh") - ad.toDouble / bc.toDouble) < 1e-12)
  }

  // ---- text_unigram_entropy: brute replay + entropy bounds ----

  test("text_unigram_entropy matches brute snapped folds and stays within bounds") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = graft.operators.TextOps3.unigramEntropy.run(spark, sf).collect()
    rows.foreach { r =>
      val s0 = r.getAs[String]("source")
      val counts = scala.collection.mutable.Map.empty[String, Long]
      docs.filter(_._1 == s0).foreach(_._2.split("\\s+").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1))
      val n = counts.values.sum
      val clogc = counts.values.map(c =>
        math.floor(c.toDouble * math.log(c.toDouble) * 1e6).toLong).sum
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Double]("clogc_micro") === clogc.toDouble)
      val h = math.floor((math.log(n.toDouble) - clogc / 1e6 / n) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("entropy_nats") - h) < 1e-12)
      // 0 ≤ H ≤ ln(V) up to the micro snap
      assert(h >= -1e-6 && h <= math.log(counts.size.toDouble) + 1e-6)
    }
  }

  // ---- q_abc_xyz: cross-op consistency with its two parent axes ----

  test("q_abc_xyz marginals agree with q_pareto and q_xyz_classes") {
    val grid = graft.operators.AffinityOps.abcXyz.run(spark, sf).collect()
      .map(r => (r.getAs[String]("abc"), r.getAs[String]("xyz")) ->
        r.getAs[Long]("n_parts")).toMap
    assert(grid.nonEmpty && grid.size <= 9)
    // XYZ marginal: summing the grid over ABC must reproduce
    // q_xyz_classes' per-class part counts exactly
    val xyzCounts = graft.operators.AffinityOps.xyzClasses.run(spark, sf).collect()
      .map(r => r.getAs[String]("xyz") -> r.getAs[Long]("n_parts")).toMap
    xyzCounts.foreach { case (cls, n) =>
      assert(grid.collect { case ((_, x), c) if x == cls => c }.sum === n,
        s"XYZ marginal drift for $cls")
    }
    // ABC marginal vs q_pareto's per-part classes (pareto emits every
    // part; xyz drops zero-demand parts, so compare on the join side:
    // grid total == xyz total)
    assert(grid.values.sum === xyzCounts.values.sum)
    // revenue shares are floor-ppm of a partition of the total
    val ppm = graft.operators.AffinityOps.abcXyz.run(spark, sf).collect()
      .map(_.getAs[Long]("revenue_share_ppm"))
    assert(ppm.sum <= 1000000L && ppm.sum > 1000000L - ppm.length)
  }

  // ---- text_bigram_entropy: brute replay + information laws ----

  test("text_bigram_entropy matches brute snapped folds; 0 <= H_cond <= H_joint") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val cj = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val toks = t.split("\\s+")
      toks.sliding(2).filter(_.length == 2)
        .foreach(p => cj((p(0), p(1))) = cj.getOrElse((p(0), p(1)), 0L) + 1)
    }
    val n = cj.values.sum
    val sj = cj.values.map(c => math.floor(c * math.log(c.toDouble) * 1e6).toLong).sum
    val cp = cj.groupBy(_._1._1).map { case (_, m) => m.values.sum }
    val sp = cp.map(c => math.floor(c * math.log(c.toDouble) * 1e6).toLong).sum
    val r = graft.operators.TextOps3.bigramEntropy.run(spark, sf).collect().head
    assert(r.getAs[Long]("n_bigrams") === n)
    assert(r.getAs[Long]("v_bigrams") === cj.size.toLong)
    assert(r.getAs[Long]("v_prefixes") === cp.size.toLong)
    def h(s0: Long) = math.floor((math.log(n.toDouble) - s0 / 1e6 / n) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("h_joint") - h(sj)) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_prefix") - h(sp)) < 1e-12)
    val hc = r.getAs[Double]("h_cond")
    assert(math.abs(hc - (h(sj) - h(sp))) < 1e-12)
    // information laws (up to the micro snap): conditioning cannot
    // create information, and H(next|prev) >= 0
    assert(hc >= -1e-5 && hc <= r.getAs[Double]("h_joint") + 1e-5)
  }

  // ---- sample_ess: Kish laws + weight identity with sample_importance ----

  test("sample_ess: ess ≤ n_kept, deff ≥ 1, and Σw matches sample_importance") {
    val ess = graft.operators.Sampling.ess.run(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("sw_micro"),
          r.getAs[Double]("ess"), r.getAs[Double]("kish_deff")))
      .toMap
    assert(ess.nonEmpty)
    ess.values.foreach { case (n, _, e, deff) =>
      assert(e <= n + 1e-9, "ESS cannot exceed the sample size")
      assert(deff >= 1.0 - 1e-9, "Kish design effect is ≥ 1 by Cauchy-Schwarz")
    }
    // identical weights by construction: sw_micro == importance's ht_micro
    val ht = graft.operators.Sampling.importance.run(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("ht_micro")).toMap
    ess.foreach { case (s0, (_, sw, _, _)) => assert(sw === ht(s0), s"weight drift for $s0") }
  }
}
