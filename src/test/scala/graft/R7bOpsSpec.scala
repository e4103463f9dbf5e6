package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-7b surface (mix64 expression, MP3/
  * FLAC/EXIF container legs, conformal interval, bootstrap, FDR, PSI,
  * epoch reshuffle, peak concurrency). The oracle hash-compare is the
  * exactness gate; these assert the mechanics mean what they claim —
  * especially the corruption paths no oracle row can see. */
class R7bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  // ---- mix64 expression ----

  test("mix64: codegen column equals the JVM kernel, and is a bijection-grade mixer") {
    import spark.implicits._
    val keys = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val got = keys.toDF("k").select(functions.mix64(col("k"))).collect().map(_.getLong(0))
    val want = keys.map(functions.HashImpls.mix64)
    assert(got.toSeq === want)
    assert(got.distinct.length === keys.length, "distinct inputs must stay distinct")
  }

  // ---- container legs: parsers must REJECT corruption ----

  test("mp3: walker rejects a broken sync, a bad bitrate index, and a truncated tail") {
    val ok = operators.MmOps.mp3Stream(5, 0, 10)
    assert(operators.MmOps.parseMp3(ok).contains((64, 44100, 10)))
    val badSync = ok.clone(); badSync(0) = 0x00
    assert(operators.MmOps.parseMp3(badSync).isEmpty)
    val badBitrate = ok.clone(); badBitrate(2) = (15 << 4).toByte // idx 15 = invalid
    assert(operators.MmOps.parseMp3(badBitrate).isEmpty)
    assert(operators.MmOps.parseMp3(ok.dropRight(7)).isEmpty,
      "a frame length that overruns the buffer must fail the walk")
  }

  test("flac: parser rejects wrong magic, non-STREAMINFO first block, wrong length") {
    val ok = operators.MmOps.flacHeader(44100, 2, 16, 123456L)
    assert(operators.MmOps.parseFlacHeader(ok).contains((44100, 2, 16, 123456L)))
    val badMagic = ok.clone(); badMagic(0) = 'g'.toByte
    assert(operators.MmOps.parseFlacHeader(badMagic).isEmpty)
    val badType = ok.clone(); badType(4) = (0x80 | 3).toByte // VORBIS_COMMENT, not STREAMINFO
    assert(operators.MmOps.parseFlacHeader(badType).isEmpty)
    val badLen = ok.clone(); badLen(7) = 20.toByte
    assert(operators.MmOps.parseFlacHeader(badLen).isEmpty)
  }

  test("exif: both byte orders round-trip; flipped order marker breaks the parse") {
    for (le <- Seq(true, false)) {
      val bytes = operators.MmOps.exifJpeg(le, 6, 640, 480)
      assert(operators.MmOps.parseExif(bytes)
        .contains((if (le) "II" else "MM", 6, 640, 480)))
    }
    // corrupt the byte-order marker: "II" -> "IX" is not a TIFF header
    val bytes = operators.MmOps.exifJpeg(littleEndian = true, 1, 16, 16)
    val i = {
      val s = new String(bytes.map(b => (b & 0xFF).toChar))
      s.indexOf("Exif") + 6
    }
    bytes(i + 1) = 'X'.toByte
    assert(operators.MmOps.parseExif(bytes).isEmpty)
  }

  test("exif: a SHORT read at the value field honors byte order (II vs MM differ in bytes)") {
    val ii = operators.MmOps.exifJpeg(littleEndian = true, 7, 100, 200)
    val mm = operators.MmOps.exifJpeg(littleEndian = false, 7, 100, 200)
    assert(!ii.sameElements(mm), "II and MM encodings must differ on the wire")
    assert(operators.MmOps.parseExif(ii).get._2 === 7)
    assert(operators.MmOps.parseExif(mm).get._2 === 7)
  }

  // ---- conformal / bootstrap / FDR / PSI semantics ----

  test("q_conformal: empirical coverage is >= the nominal 90% on calibration") {
    val r = operators.StatsOps.conformal.run(spark, sf).head()
    val covPpm = r.getLong(6)
    assert(covPpm >= 900000L, s"split-conformal guarantees >= ceil((n+1)0.9)/n; got $covPpm ppm")
    assert(r.getLong(0) + r.getLong(1) > 0)
  }

  test("q_bootstrap_ci: resample means vary but stay near the plain mean") {
    val rows = operators.StatsOps.bootstrapCi.run(spark, sf).collect()
    assert(rows.length === 30)
    val means = rows.map(_.getDouble(2))
    assert(means.distinct.length > 1, "resamples must actually differ")
    val mn = means.sum / means.length
    means.foreach(m => assert(math.abs(m - mn) / mn < 0.2, s"$m vs $mn"))
  }

  test("q_fdr_bh: BH rejections are a prefix of the p-ranked list") {
    val rows = operators.StatsOps.fdrBh.run(spark, sf).collect()
    val flags = rows.sortBy(_.getLong(7)).map(_.getInt(8))
    val firstZero = flags.indexOf(0)
    if (firstZero >= 0)
      assert(flags.drop(firstZero).forall(_ == 0), "rejections must be rank-contiguous")
  }

  test("q_psi: contributions sum to a small drift for a stationary synthetic corpus") {
    val rows = operators.StatsOps.psi.run(spark, sf).collect()
    assert(rows.length === 10)
    val psi = rows.map(_.getDouble(3)).sum
    assert(psi >= 0.0 && psi < 0.5, s"psi $psi")
  }

  // ---- epoch reshuffle ----

  test("sample_epoch_shuffle: epochs are full permutations in different orders, stable across parallelism") {
    val out = operators.Sampling.epochShuffle.run(spark, sf).collect()
    val docs = sources.Tables.documents(spark, sf).count()
    val byEpoch = out.groupBy(_.getLong(0))
    assert(byEpoch.keySet === Set(0L, 1L))
    byEpoch.values.foreach(rows => assert(rows.map(_.getLong(3)).distinct.length === docs.toInt))
    val order0 = out.filter(_.getLong(0) == 0L).sortBy(r => (r.getLong(1), r.getInt(2))).map(_.getLong(3))
    val order1 = out.filter(_.getLong(0) == 1L).sortBy(r => (r.getLong(1), r.getInt(2))).map(_.getLong(3))
    assert(!order0.sameElements(order1), "epochs must visit docs in different orders")
    // parallelism independence: recompute over a repartitioned input
    val again = operators.Sampling.epochShuffle.run(spark, sf).repartition(7).collect()
    assert(again.map(_.toString).sorted.sameElements(out.map(_.toString).sorted))
  }

  // ---- compression ratio ----

  test("text_compression_ratio: repetition compresses below prose, ratios sane") {
    import spark.implicits._
    val rows = operators.TextOps.compressionRatio.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getLong(3)
      assert(ppm > 0L && ppm < 2000000L, s"doc ${r.getLong(0)}: $ppm")
    }
    // direct kernel check: a highly repetitive string must compress far
    // below a same-length high-entropy one
    val rep = "the same phrase again and again " * 40
    val rnd = (0 until rep.length).map(i =>
      (math.floorMod(functions.HashImpls.mix64(i.toLong), 26) + 97).toChar).mkString
    val two = Seq(("a", rep), ("b", rnd)).toDF("id", "t")
      .select(col("id"), functions.deflate_size(col("t")).as("dz")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(two("a") * 4 < two("b"), s"repetitive ${two("a")} vs random ${two("b")}")
  }

  // ---- peak concurrency ----

  test("q_peak_concurrency: peak is at least 1, at most that day's session count") {
    val rows = operators.EventsAnalytics.peakConcurrency.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, peak) = (r.getLong(1), r.getLong(2))
      assert(peak >= 1L && peak <= n, s"day ${r.get(0)}: peak $peak sessions $n")
    }
  }
}
