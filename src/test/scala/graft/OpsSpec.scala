package graft

import graft.functions.{rolling_hash, simhash64, HashImpls}
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", cores = 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered op plans and executes at sf0.001") {
    SparkEntry.allOps.foreach { op =>
      val n = op.run(spark, sf).count()
      assert(n >= 0, s"${op.name} failed to execute")
    }
  }

  test("queries and oracleSql stay consistent") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.nonEmpty)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ModernSql ops: two dirs in one session don't collide, no temp-view leaks") {
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    // plan BOTH dirs before collecting EITHER — a fixed view name
    // would let the second plan capture the first's data
    val small = graft.operators.ModernSql.lateralTopN.run(spark, "/root/testdata/sf0.001")
    val big = graft.operators.ModernSql.lateralTopN.run(spark, "/root/testdata/sf0.01")
    val smallRows = small.count()
    val bigRows = big.count()
    assert(smallRows === 50 && bigRows === 50) // 25 nations × top-2
    // different dirs → different balances: the two plans must not
    // have resolved against the same view
    val sBal = small.selectExpr("sum(c_acctbal)").head.getDouble(0)
    val bBal = big.selectExpr("sum(c_acctbal)").head.getDouble(0)
    assert(sBal !== bBal, "both dirs resolved to the same underlying view")
    val after = spark.catalog.listTables().collect().map(_.name).toSet
    assert(after === before, s"temp views leaked: ${after -- before}")
  }

  test("approx_percentile within 5% of exact quantiles") {
    val exact = graft.operators.SqlSurface.qPercentile.run(spark, sf)
      .select(col("event_type"), col("p50"), col("p95")).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    Relational.qApproxPercentile.run(spark, sf).collect().foreach { r =>
      val t = r.getString(0)
      val (e50, e95) = exact(t)
      assert(math.abs(r.getDouble(1) - e50) / e50 <= 0.05, s"$t p50 ${r.getDouble(1)} vs $e50")
      assert(math.abs(r.getDouble(2) - e95) / e95 <= 0.05, s"$t p95 ${r.getDouble(2)} vs $e95")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val exact = Relational.qDistinct.run(spark, sf)
      .select(col("event_type"), col("n_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.qApproxDistinct.run(spark, sf).collect().foreach { r =>
      val (t, approx) = (r.getString(0), r.getLong(1))
      assert(math.abs(approx - exact(t)).toDouble / exact(t) <= 0.05,
        s"$t approx=$approx exact=${exact(t)}")
    }
  }
}

class CustomExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rolling_hash: pinned values, null-safe, codegen == interpreted") {
    import spark.implicits._
    val expected = HashImpls.rollingHash(UTF8String.fromString("hello world"))
    val viaCol = Seq("hello world").toDF("s")
      .select(rolling_hash(col("s"))).head.getLong(0)
    assert(viaCol === expected)
    // distinct inputs, distinct hashes; stability across calls
    val hs = Seq("a", "b", "ab", "ba", "").toDF("s")
      .select(rolling_hash(col("s"))).collect().map(_.getLong(0))
    assert(hs.distinct.length === hs.length)
    // null propagates
    val n = Seq[Option[String]](None).toDF("s").select(rolling_hash(col("s"))).head
    assert(n.isNullAt(0))
  }

  test("rolling_hash registered for SQL via GraftExtensions") {
    assert(spark.sql("SELECT rolling_hash('x') h").head.getLong(0) ===
      HashImpls.rollingHash(UTF8String.fromString("x")))
  }

  test("simhash64: similar token sets → small hamming distance") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(3, "changed")                 // 1 of 60 tokens differs
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq(("base", base), ("near", near), ("far", far)).toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("base"), m("near")) < ham(m("base"), m("far")),
      s"near=${ham(m("base"), m("near"))} far=${ham(m("base"), m("far"))}")
    assert(ham(m("base"), m("near")) <= 6)
  }
}

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("minhash+LSH finds the same near-dup pairs as exact ngram jaccard") {
    val exact = DedupOps.ngram.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = DedupOps.minhash.run(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    // minhash verifies candidates with exact jaccard → subset; recall high
    assert(mh.subsetOf(exact))
    assert(mh.size.toDouble / exact.size >= 0.9, s"recall ${mh.size}/${exact.size}")
  }

  test("simhash bands surface near-dup candidates") {
    val pairs = DedupOps.simhash.run(spark, sf).count()
    assert(pairs > 0, "planted near-dups should collide in simhash bands")
  }
}

class MmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("decode pipeline: deterministic, sane schema and ranges; planted PNGs really decode") {
    val out = MmOps.decodePipeline(spark, sf)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "channels", "mean_luma"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val planted = r.getLong(0) % 50 == 0
      assert(r.getInt(1) > 0)
      if (planted) {
        // real javax.imageio decode of the planted PNG: dimensions are
        // the synthesis formula's, channels exactly 3 (RGB)
        assert(r.getInt(2) === 8 + (r.getLong(0) % 16).toInt, s"png width for $r")
        assert(r.getInt(3) === 8 + ((r.getLong(0) / 16) % 16).toInt, s"png height for $r")
        assert(r.getInt(4) === 3, s"png channels for $r")
      } else {
        assert(r.getInt(2) >= 64 && r.getInt(2) < 576)
        assert(r.getInt(3) >= 64 && r.getInt(3) < 576)
        assert(r.getInt(4) >= 1 && r.getInt(4) <= 3)
      }
      assert(r.getDouble(5) > 0)
    }
    // determinism: two runs agree
    val again = MmOps.decodePipeline(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("image dHash: deterministic, brightness-invariant, locality-sensitive") {
    def mk(w: Int, h: Int)(luma: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val v = luma(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // a smooth horizontal gradient, values well inside [0, 255]
    val base = mk(18, 16)((x, _) => 20 + x * 10)
    val h0 = MmOps.dhash64(base)
    assert(h0 === MmOps.dhash64(mk(18, 16)((x, _) => 20 + x * 10)), "determinism")
    // uniform brightness shift: every gradient direction unchanged
    val brighter = mk(18, 16)((x, _) => 50 + x * 10)
    assert(MmOps.dhash64(brighter) === h0, "dHash must be brightness-invariant")
    // a small local perturbation moves FEW bits; an inverted gradient flips most
    val dented = mk(18, 16)((x, y) => if (x == 4 && y == 3) 250 else 20 + x * 10)
    val inverted = mk(18, 16)((x, _) => 200 - x * 10)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(MmOps.dhash64(dented), h0) <= 8,
      s"local dent moved ${hamming(MmOps.dhash64(dented), h0)} bits")
    assert(hamming(MmOps.dhash64(inverted), h0) >= 40,
      s"inverted gradient only moved ${hamming(MmOps.dhash64(inverted), h0)} bits")
    // the op itself: planted-PNG rows flagged as images, all rows hashed
    val out = MmOps.imagePhash.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(1) === (r.getLong(0) % 50 == 0), s"is_image wrong for $r")
    }
  }

  test("image near-dup: banded pair-finder honors the pigeonhole guarantee; op rolls up per image") {
    import spark.implicits._
    // h2 = 1 bit off h1 (same band); h3 = 3 bits off h1 spread over 3
    // bands (pigeonhole: MUST still share one untouched band); h4 =
    // complement (64 bits off — no shared band, and verification would
    // reject anyway); h5 = 8 bits off, 2 per band (candidate via no
    // band ⇒ never surfaced, the LSH miss-case by design).
    val h1 = 0x123456789ABCDEF0L
    val h2 = h1 ^ 1L
    val h3 = h1 ^ ((1L << 2) | (1L << 17) | (1L << 33))
    val h4 = ~h1
    val h5 = h1 ^ ((3L << 1) | (3L << 20) | (3L << 36) | (3L << 50))
    val hashes = Seq((1L, h1), (2L, h2), (3L, h3), (4L, h4), (5L, h5))
      .toDF("doc_id", "phash")
    val pairs = MmOps.nearDupPairs(hashes, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(1), s"hamming-1 pair missed: $pairs")
    assert(pairs.get((1L, 3L)).contains(3), s"hamming-3 pair missed (pigeonhole): $pairs")
    assert(pairs.get((2L, 3L)).contains(4), s"hamming-4 shared-band pair missed: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L), "complement must not pair")
    assert(!pairs.keys.exists(p => p._1 == 5L || p._2 == 5L),
      "4-band-spread 8-bit pair must not surface (no shared band)")
    // the op: exactly one row per planted image, isolated rows at 0 / -1
    val nImages = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id % 50 = 0").count()
    val op = MmOps.imageNearDup.run(spark, sf).collect()
    assert(op.length.toLong === nImages)
    op.foreach { r =>
      assert((r.getLong(1) == 0L) === (r.getInt(2) == -1), s"rollup inconsistent: $r")
    }
  }

  test("mp4 box walk: round-trips planted params, skips free box, rejects malformed trees") {
    assert(MmOps.parseMp4Meta(MmOps.mp4Bytes("mp42", 90000, 123456))
      .contains(("mp42", 90000, 123456L)))
    // walker must skip the free box by SIZE, not by fixed offset:
    // corrupting the free box's type must not change the result
    val b = MmOps.mp4Bytes("isom", 600, 42)
    b(28) = 'x'.toByte // free box fourcc first char
    assert(MmOps.parseMp4Meta(b).contains(("isom", 600, 42L)))
    // box size overrunning the buffer -> quarantine, not a crash
    val overrun = MmOps.mp4Bytes("isom", 600, 42)
    overrun(0) = 0x7F.toByte // ftyp size becomes huge
    assert(MmOps.parseMp4Meta(overrun).isEmpty)
    // box size < 8 -> malformed
    val tiny = MmOps.mp4Bytes("isom", 600, 42)
    tiny(3) = 4 // ftyp size = 4
    assert(MmOps.parseMp4Meta(tiny).isEmpty)
    // garbage bytes -> None
    assert(MmOps.parseMp4Meta(Array.fill[Byte](64)(9)).isEmpty)
  }

  test("audio energy kernel: analytic features of known waveforms; op emits one row per doc") {
    def sq(amp: Int, halfPeriod: Int, n: Int, silentFrom: Int): Array[Short] =
      Array.tabulate[Short](n)(i =>
        if (i >= silentFrom) 0
        else (if ((i / halfPeriod) % 2 == 0) amp else -amp).toShort)
    // silence: every feature zero, both 64-sample frames silent
    assert(MmOps.audioFeatures(MmOps.wavBytes(8000, new Array[Short](128)))
      .contains((128, 0, 0L, 0, 2, 2)))
    // full square wave (amp 1000, half-period 2): sign flips at every
    // 2nd sample from i=2 -> 63 crossings; energy = n * amp^2
    assert(MmOps.audioFeatures(MmOps.wavBytes(8000, sq(1000, 2, 128, 128)))
      .contains((128, 1000, 128L * 1000 * 1000, 63, 2, 0)))
    // half-silent: only the live half crosses (31 flips), one silent frame
    assert(MmOps.audioFeatures(MmOps.wavBytes(8000, sq(2000, 2, 128, 64)))
      .contains((128, 2000, 64L * 2000 * 2000, 31, 2, 1)))
    // malformed container -> quarantine lane, not a crash
    assert(MmOps.audioFeatures(Array.fill[Byte](50)(7)).isEmpty)
    // the op: one row per doc; every planted wave has a live section
    // (peak >= 1000) and a silent tail >= 64 samples (>= 1 silent frame)
    val out = MmOps.audioEnergy.run(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length.toLong === nDocs)
    out.foreach { r =>
      assert(r.getInt(2) >= 1000 && r.getInt(6) >= 1, s"bad features: $r")
      assert(r.getInt(5) === (r.getInt(1) + 63) / 64, s"frame count wrong: $r")
    }
  }

  test("decode kernel: real PNG round-trip hits pinned raster stats; non-image falls back to stub") {
    // PNG is lossless, so the decoded mean is the pixel formula's mean —
    // computed independently here, pinned against the codec's output
    val docId = 100L
    val (w, h) = (8 + (docId % 16).toInt, 8 + ((docId / 16) % 16).toInt)
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sum += ((docId * 31 + x * 7 + y * 13) % 256) +
        ((docId * 17 + x * 3 + y * 29) % 256) +
        ((docId * 43 + x * 19 + y * 5) % 256)
    }
    val expectMean = sum.toDouble / (w.toLong * h * 3)
    val (dw, dh, dc, dm) = MmOps.decodeKernel(MmOps.syntheticPng(docId))
    assert((dw, dh, dc) === ((w, h, 3)))
    assert(dm === expectMean, s"decoded mean $dm != pixel-formula mean $expectMean")

    // a 1x1 handcrafted white PNG via the codec itself
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(MmOps.decodeKernel(bos.toByteArray) === ((1, 1, 3, 255.0)))

    // non-image bytes: stub lane, identical to calling the stub directly
    val text = "not an image".getBytes("UTF-8")
    assert(MmOps.decodeKernel(text) === MmOps.stubKernel(text))
  }
}
