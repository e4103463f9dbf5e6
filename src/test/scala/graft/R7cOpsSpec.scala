package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-7c surface (cross-correlation, STL
  * decomposition, trigram novelty, Heaps growth, token-budget
  * selection, Adamic-Adar). The oracle hash-compare is the exactness
  * gate; these assert the mechanics mean what they claim. */
class R7cOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("q_xcorr: 7 lag rows, r in [-1,1], and lag 0 is the self-alignment peak region") {
    val rows = operators.StatsOps.xcorr.run(spark, sf).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0, s"r ${r.getDouble(2)}")
      assert(r.getLong(1) >= 20L, "a 30-day series leaves >=20 aligned pairs per lag")
    }
  }

  test("q_stl_decompose: parts re-add to the series; trend is the 7-day mean") {
    val rows = operators.StatsOps.stlDecompose.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rev, tr, se, res) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // residual is defined against exactly these trend/seasonal values
      assert(math.abs(rev - tr - se - res) < 2e-6, s"decomposition must re-add: $r")
    }
  }

  test("text_novelty: doc 0 is fully novel; novelty_ppm bounded; novel <= total") {
    val rows = operators.TextOps.novelty.run(spark, sf).collect()
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(1) === first.getLong(2), "the earliest doc has nothing to repeat")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("text_heaps: the half strictly nests (N1 < N, V1 <= V) and beta in [0, 1]") {
    val rows = operators.TextOps.heaps.run(spark, sf).collect()
    assert(rows.length === 20, "one row per source")
    rows.foreach { r =>
      assert(r.getLong(3) < r.getLong(1), s"half must be a strict subset: $r")
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, s"beta ${r.getDouble(5)}")
    }
  }

  test("sample_token_budget: selection is the diversity-ranked prefix within budget") {
    val sel = operators.Sampling.tokenBudget.run(spark, sf).collect()
    assert(sel.nonEmpty)
    val all = sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        split(col("text"), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val budget = all / 4
    assert(sel.map(_.getLong(1)).sum <= budget, "selected tokens fit the budget")
    // the selection boundary is tight: the remaining headroom is smaller
    // than the largest document, so SOME doc was refused for overflow (or
    // everything fit)
    val maxCum = sel.map(_.getLong(3)).max
    val maxDocTok = sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        split(col("text"), "\\s+")).cast("long").as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(budget - maxCum < maxDocTok || sel.length.toLong ==
      sources.Tables.documents(spark, sf).count(), "greedy prefix is maximal")
  }

  test("emb_kmeans: clusters partition the corpus and beat random label purity") {
    val rows = operators.EmbedOps.kmeans.run(spark, sf).collect()
    assert(rows.length === 4, "k = 4 clusters, none empty on this corpus")
    val total = sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "every vector is assigned exactly once")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L, "inertia is a sum of squared integers")
      assert(r.getLong(4) <= r.getLong(1), "majority count bounded by cluster size")
    }
    // the synthetic corpus embeds only mild label structure at k=4 over
    // 10 labels; purity must still clear the ~0.10 random baseline
    val purity = rows.map(_.getLong(4)).sum.toDouble / total
    assert(purity > 0.12, s"purity $purity")
  }

  test("knn_ivf_exact: k results per query, ranked by exact distance, recall>=0.5 vs integer brute force") {
    val res = operators.KnnOps.ivfExact.run(spark, sf).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (_, rows) =>
      assert(rows.length === 10)
      val ds = rows.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(ds.sameElements(ds.sorted), "ranked ascending by exact distance")
    }
    // recall vs exact integer-L2 brute force over the same micros grid
    val xs = operators.EmbedOps.kmScaled(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = byQ.map { case (q, rows) =>
      val truth = xs.keys.filter(_ != q).toSeq
        .sortBy(c => (d2(xs(q), xs(c)), c)).take(10).toSet
      rows.map(_.getLong(1)).count(truth.contains) / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean (nprobe=2 of 4 cells)")
  }

  test("text_winnowing: coverage lower bound holds and density sits near 2/(w+1)") {
    val rows = operators.TextOps.winnowing.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nsel) = (r.getLong(2), r.getLong(3))
      // every window contributes a fingerprint and one fingerprint can
      // serve at most w=8 windows → nsel >= ceil(nw/8); and never more
      // fingerprints than windows
      assert(nsel >= (nw + 7) / 8 && nsel <= nw, s"$r")
    }
    val meanDensity = rows.map(_.getLong(4)).sum.toDouble / rows.length / 1e6
    assert(meanDensity > 0.12 && meanDensity < 0.40,
      s"mean density $meanDensity should sit near the theoretical 2/(w+1) = 0.22")
  }

  test("mm_bmp: walker rejects bad magic, non-40 DIB header, and a lying file size") {
    val good = operators.MmOps.syntheticBmp(42L)
    assert(operators.MmOps.parseBmpMeta(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(operators.MmOps.parseBmpMeta(badMagic).isEmpty)
    val badDib = good.clone(); badDib(14) = 12 // BITMAPCOREHEADER size
    assert(operators.MmOps.parseBmpMeta(badDib).isEmpty)
    assert(operators.MmOps.parseBmpMeta(good.take(good.length - 1)).isEmpty,
      "declared file size must match the buffer")
  }

  test("sprtStream: replayed draws add zero; totals equal the batch trajectory's last row") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipelines
    import graft.streaming.StreamingPipelines.UpsertRow
    val rows = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[UpsertRow].collect().toIndexedSeq
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[UpsertRow]
    val out = StreamingPipelines.sprtStream(mem.toDS()).toDF()
    val q = out.writeStream.format("memory").queryName("sprt_draws")
      .outputMode("append").start()
    try {
      mem.addData(half1); q.processAllAvailable()
      mem.addData(half2); q.processAllAvailable()
      mem.addData(half1); q.processAllAvailable() // deliberate replay
      val got = spark.sql(
        "SELECT variant, sum(n) FROM sprt_draws GROUP BY 1").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val last = operators.StatsOps.sprt.run(spark, sf)
        .orderBy(col("day").desc).limit(1).head()
      assert(got.getOrElse("A", 0L) === last.getLong(1), "ca equals batch cumulative")
      assert(got.getOrElse("B", 0L) === last.getLong(2), "cb equals batch cumulative")
    } finally q.stop()
  }

  test("graph_adamic_adar: same pair set as jaccard; rare-partner weighting holds") {
    val aa = operators.GraphOps.adamicAdar.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val jc = operators.GraphOps.jaccard.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(aa.keySet === jc.keySet, "both scores rank the same candidate pairs")
    aa.foreach { case (k, (nCommon, score)) =>
      assert(nCommon === jc(k), s"common-neighbor counts agree for $k")
      // each neighbor contributes 1/ln(d) with 2 <= d <= n_nations, so the
      // total is bounded by n_common/ln(2) above and n_common/ln(25) below
      assert(score <= nCommon / math.log(2.0) + 1e-6, s"$k: $score")
      assert(score >= nCommon / math.log(50.0), s"$k: $score too small")
    }
  }
}
