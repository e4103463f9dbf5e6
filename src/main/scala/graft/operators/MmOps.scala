package graft.operators

import graft.GraftOp
import graft.functions.Exprs
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2g).
  *
  * Media are opaque `binary` columns with typed metadata. IMAGE decode
  * is REAL — the pure-JVM `javax.imageio` PNG/JPEG codecs run inside
  * the partition-wise kernel (planted PNGs exercise the round trip) —
  * while formats this container has no codec for (audio/video) fall
  * back to a clearly-marked deterministic STUB lane, with the Spark
  * side (schema, binary batching, mapPartitions decode, output shape)
  * identical for both.
  */
object MmOps {

  // javax.imageio defaults to a DISK-backed stream cache: every
  // ImageIO.read/write round-trips a temp FILE, so a per-row codec
  // kernel pays an fsync'd create/delete per image — with 32 threads
  // that is tmp-dir contention, not decoding. Blobs here are small
  // in-memory byte arrays; the memory cache is strictly better. Class
  // init runs wherever the kernel lambdas first call into this object
  // (driver and every executor JVM alike).
  javax.imageio.ImageIO.setUseCache(false)

  /** Binary ingest + metadata: text bytes stand in for media blobs. */
  val meta: GraftOp = GraftOp(
    "mm_meta",
    s"""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |  64 + ${Exprs.sqlMd5Long("text")} % 512 AS width,
       |  64 + (${Exprs.sqlMd5Long("text")} >> 9) % 512 AS height,
       |  1 + ${Exprs.sqlMd5Long("text")} % 3 AS channels
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        (lit(64) + h % 512).as("width"),
        (lit(64) + shiftright(h, 9) % 512).as("height"),
        (lit(1) + h % 3).as("channels"))
      .orderBy(col("doc_id"))
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_luma", DoubleType)))

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte

  /** REAL image decode via the pure-JVM `javax.imageio` codecs:
    * PNG/JPEG blobs decode to their actual raster (width, height,
    * band count, mean sample value across all bands); anything the
    * codec can't handle falls back to [[stubKernel]] — the quarantine
    * lane of a production decode stage. */
  private[graft] def decodeKernel(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    if (isPng(bytes) || isJpeg(bytes)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img != null) {
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        return (w, h, bands, sum.toDouble / (w.toLong * h * bands))
      }
    }
    stubKernel(bytes)
  }

  /** Deterministic STUB kernel for non-image blobs — the documented
    * placeholder for codecs this container lacks (audio/video):
    * dimensions/luma derive from the bytes, so the pipeline shape
    * (schema, batching, partitioning) is exercised end-to-end. */
  private[graft] def stubKernel(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    var h = 1125899906842597L
    var lumaSum = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); lumaSum += (bytes(i) & 0xFF); i += 1 }
    val width = 64 + (math.floorMod(h, 512L)).toInt
    val height = 64 + (math.floorMod(h >>> 9, 512L)).toInt
    val channels = 1 + math.floorMod(h, 3L).toInt
    (width, height, channels,
      if (bytes.length == 0) 0.0 else lumaSum.toDouble / bytes.length)
  }

  /** Deterministic tiny RGB PNG for `docId` — written by the REAL
    * `javax.imageio` PNG encoder over an integer pixel pattern, so the
    * decode path upstream exercises a real codec round-trip (PNG is
    * lossless: decoded samples equal the pattern exactly). */
  private[graft] def syntheticPng(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 16).toInt
    val h = 8 + ((docId / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + x * 3 + y * 29) % 256).toInt
        val b = ((docId * 43 + x * 19 + y * 5) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media decode over binary batches — partition-wise imperative
    * decode via `mapPartitions` (where a codec genuinely belongs; the
    * kernel never crosses a shuffle). Every 50th document carries a
    * REAL planted PNG and decodes through `javax.imageio`; the rest
    * are text bytes and take the deterministic stub lane — the
    * route-by-container-format shape of a production multimodal
    * ingest (cf. mm_sniff). */
  def decodePipeline(spark: SparkSession, dir: String): DataFrame = {
    val blobs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
    val enc = RowEncoder.encoderFor(decodedSchema)
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val bytes =
          if (docId % 50 == 0) syntheticPng(docId) else r.getAs[Array[Byte]](1)
        val (w, h, channels, luma) = decodeKernel(bytes)
        Row(docId, bytes.length, w, h, channels, luma)
      }
    }(enc)
  }

  /** Queries-map entry for the decode pipeline — ORACLE-CHECKED on the
    * planted-PNG lane (r15): PNG is lossless, so the raster stats the
    * REAL `javax.imageio` decode produces equal the pixel-generating
    * formula exactly, and the oracle computes that formula
    * arithmetically (per-pixel sum over unnest(range(w))×range(h)).
    * The full pipeline still decodes EVERY doc (the filter sits above
    * the opaque mapPartitions, so the stub/quarantine lane's routing
    * runs too — it stays spec-covered: wrapping-hash stub dims aren't
    * SQL-expressible, and the planted n_bytes is zlib-encoder-specific
    * so the emit drops it in favor of the decoded raster columns). */
  val decode: GraftOp = GraftOp(
    "mm_decode",
    """WITH planted AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
      |d AS (SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS width,
      |        CAST(8 + (doc_id // 16) % 16 AS INT) AS height FROM planted),
      |px AS (
      |  SELECT d.doc_id, d.width, d.height,
      |    sum((d.doc_id * 31 + x.i * 7 + y.j * 13) % 256
      |      + (d.doc_id * 17 + x.i * 3 + y.j * 29) % 256
      |      + (d.doc_id * 43 + x.i * 19 + y.j * 5) % 256) AS s
      |  FROM d, unnest(range(CAST(d.width AS BIGINT))) AS x(i),
      |          unnest(range(CAST(d.height AS BIGINT))) AS y(j)
      |  GROUP BY 1, 2, 3)
      |SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
      |  CAST(s AS DOUBLE) / (width * CAST(height AS BIGINT) * 3) AS mean_luma
      |FROM px ORDER BY doc_id""".stripMargin) { (s, d) =>
    decodePipeline(s, d)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("width"), col("height"), col("channels"), col("mean_luma"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-size blob chunking — the frame-sample / shard step before a
    * per-chunk decoder or embedder: one blob row → N chunk rows with
    * (chunk_id, offset, chunk bytes). Pure expressions (sequence +
    * posexplode + binary substring), so chunking stays in codegen and
    * the expensive kernel only ever sees bounded-size chunks. */
  val chunk: GraftOp = GraftOp(
    "mm_chunk",
    """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS total FROM documents WHERE doc_id < 100)
      |SELECT doc_id, CAST(n AS INT) AS chunk_id,
      |  CAST(n * 256 + 1 AS BIGINT) AS byte_offset,
      |  CAST(least(256, total - n * 256) AS INT) AS chunk_bytes
      |FROM b, unnest(range(0, CAST(ceil(total / 256.0) AS BIGINT))) AS t(n)
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    val chunkSize = 256
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
        ceil(octet_length(encode(col("text"), "UTF-8")) / chunkSize.toDouble)
          .cast(IntegerType).as("n_chunks"))
      // empty blob → ZERO chunk rows. sequence(0, -1) would "helpfully"
      // infer step -1 and return [0, -1]; posexplode of an empty array
      // matches the oracle's empty range(0, 0)
      .select(col("doc_id"), col("blob"),
        posexplode(when(col("n_chunks") > 0, sequence(lit(0), col("n_chunks") - 1))
          .otherwise(array().cast("array<int>"))))
      .toDF("doc_id", "blob", "chunk_id", "n")
      // the chunk bytes are REALLY extracted (binary substr) — the
      // contract emits their length; the oracle states it arithmetically
      .select(col("doc_id"), col("chunk_id"),
        (col("n").cast(LongType) * chunkSize + 1).as("byte_offset"),
        octet_length(col("blob").substr(col("n") * chunkSize + 1, lit(chunkSize)))
          .as("chunk_bytes"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Container-format sniffing over binary columns: classify each blob
    * by magic-byte prefix (PNG/JPEG/RIFF here), the first gate of any
    * media-ingest pipeline (route to the right decoder, quarantine the
    * rest). Test blobs get deterministic planted headers so the oracle
    * can replay the classification; the prefix test itself is the
    * production kernel. Pure map + one |formats|-row aggregate. */
  val sniff: GraftOp = GraftOp(
    "mm_sniff",
    """WITH b AS (
      |  SELECT doc_id,
      |    from_hex(CASE doc_id % 3 WHEN 0 THEN '89504E470D0A1A0A'
      |      WHEN 1 THEN 'FFD8FFE0' ELSE '52494646' END) || encode(text) AS blob
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, octet_length(blob) AS n_bytes,
      |    CASE WHEN hex(blob) LIKE '89504E470D0A1A0A%' THEN 'png'
      |         WHEN hex(blob) LIKE 'FFD8FF%' THEN 'jpeg'
      |         WHEN hex(blob) LIKE '52494646%' THEN 'riff'
      |         ELSE 'unknown' END AS format
      |  FROM b)
      |SELECT format, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val header = unhex(
      when(col("doc_id") % 3 === 0, "89504E470D0A1A0A")
        .when(col("doc_id") % 3 === 1, "FFD8FFE0")
        .otherwise("52494646"))
    val b = Tables.documents(s, d)
      .select(col("doc_id"), concat(header, encode(col("text"), "UTF-8")).as("blob"))
    // production kernel would substring(blob, 1, 8) before hex; DuckDB
    // lacks blob substring, so the oracle-parity form hexes the blob —
    // the classification is identical
    b.select(col("doc_id"), octet_length(col("blob")).as("n_bytes"),
        when(hex(col("blob")).startsWith("89504E470D0A1A0A"), "png")
          .when(hex(col("blob")).startsWith("FFD8FF"), "jpeg")
          .when(hex(col("blob")).startsWith("52494646"), "riff")
          .otherwise("unknown").as("format"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).cast(LongType).as("total_bytes"))
      .orderBy(col("format"))
  }

  /** Uniform frame sampling — the video-ingest plumbing that decides
    * WHICH frames a vision pipeline decodes before any codec runs
    * (sample ≤16 frames per clip, evenly spaced): per blob, synthetic
    * (n_frames, fps) metadata from the portable hash stands in for
    * container headers, stride = ⌈n_frames/16⌉, sampled index list =
    * range(0, n_frames, stride), timestamp = frame·1000 div fps.
    * All INTEGER arithmetic — the sampling plan is bit-reproducible
    * (re-ingesting a clip samples identical frames, so frame-level
    * caches/dedup stay valid). Pure map + explode, zero shuffle; the
    * emitted (frame_idx, ts_ms) rows are exactly what a decode stage
    * maps over. */
  val frameSample: GraftOp = GraftOp(
    "mm_framesample",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(8 + ${Exprs.sqlMd5Long("text")} % 120 AS BIGINT) AS n_frames,
       |    CAST(1 + (${Exprs.sqlMd5Long("text")} >> 7) % 29 AS BIGINT) AS fps
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, n_frames, fps,
       |    unnest(range(0, n_frames, (n_frames + 15) // 16)) AS frame_idx
       |  FROM m)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  frame_idx * 1000 // fps AS ts_ms
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        (lit(8) + h % 120).as("n_frames"),
        (lit(1) + shiftright(h, 7) % 29).as("fps"))
      .select(col("doc_id"), col("fps"),
        explode(sequence(lit(0L), col("n_frames") - 1,
          expr("(n_frames + 15) div 16"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr("frame_idx * 1000 div fps").as("ts_ms"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Build a canonical 44-byte PCM WAV header (RIFF little-endian)
    * for the given audio parameters — the real container format, so
    * the parser opposite is exercised against genuine bytes. */
  private[graft] def wavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * (bitsPerSample / 8)
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort) // PCM
    bb.putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * channels * (bitsPerSample / 8)) // byte rate
    bb.putShort((channels * (bitsPerSample / 8)).toShort)  // block align
    bb.putShort(bitsPerSample.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Parse a PCM WAV header: (sampleRate, channels, bits, nSamples),
    * or None when the magic bytes don't check out (quarantine lane). */
  private[graft] def parseWavHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = { val b = new Array[Byte](n); bb.get(b); new String(b, "US-ASCII") }
    if (ascii(4) != "RIFF") return None
    bb.getInt // riff size
    if (ascii(4) != "WAVE" || ascii(4) != "fmt ") return None
    bb.getInt // fmt size
    val fmt = bb.getShort
    val channels = bb.getShort.toInt
    val rate = bb.getInt
    bb.getInt; bb.getShort // byte rate, block align
    val bits = bb.getShort.toInt
    if (ascii(4) != "data" || fmt != 1) return None
    val dataLen = bb.getInt
    Some((rate, channels, bits, dataLen / (channels * (bits / 8))))
  }

  /** Audio-container metadata — the audio twin of [[meta]]/[[sniff]]:
    * each doc carries a REAL planted PCM WAV header (hash-derived
    * parameters through the genuine RIFF byte layout) and the kernel
    * parses the little-endian container fields back; duration is
    * integer math on the parsed values. The oracle replays the hash
    * arithmetic, so the hash match proves the build→parse round trip
    * preserves every field. mapPartitions kernel (where a real audio
    * demuxer belongs), zero shuffle. */
  val wavMeta: GraftOp = GraftOp(
    "mm_wav_meta",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(8000 + (${Exprs.sqlMd5Long("text")} % 8) * 4000 AS INT) AS sample_rate,
       |    CAST(1 + (${Exprs.sqlMd5Long("text")} >> 3) % 2 AS INT) AS channels,
       |    CAST(1000 + (${Exprs.sqlMd5Long("text")} >> 4) % 9000 AS INT) AS n_samples
       |  FROM documents)
       |SELECT doc_id, sample_rate, channels, 16 AS bits, n_samples,
       |  CAST(n_samples AS BIGINT) * 1000 // sample_rate AS duration_ms
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    val params = Tables.documents(s, d)
      .select(col("doc_id"),
        (lit(8000) + (h % 8) * 4000).cast(IntegerType).as("sample_rate"),
        (lit(1) + shiftright(h, 3) % 2).cast(IntegerType).as("channels"),
        (lit(1000) + shiftright(h, 4) % 9000).cast(IntegerType).as("n_samples"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("duration_ms", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    params.mapPartitions { rows =>
      rows.map { r =>
        // REAL round trip: hash params → genuine RIFF bytes → parse
        val header = wavHeader(r.getInt(1), r.getInt(2), 16, r.getInt(3))
        val (rate, ch, bits, n) = parseWavHeader(header).getOrElse(
          throw new IllegalStateException(s"unparseable planted WAV for doc ${r.getLong(0)}"))
        Row(r.getLong(0), rate, ch, bits, n, n.toLong * 1000 / rate)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** dHash perceptual hash of a decoded raster: the image is reduced
    * to a 9×8 luma grid (integer block sums; adjacent-cell compares
    * use cross-multiplication so averages never touch floating
    * point), each bit = "is this cell brighter than its right
    * neighbor". Gradient-based ⇒ invariant to uniform brightness
    * shifts and compression noise — the property that makes it the
    * standard near-dup key for image corpora. */
  private[graft] def dhash64(img: java.awt.image.BufferedImage): Long = {
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val sums = Array.ofDim[Long](8, 9) // [row][col] luma sums
    val counts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val gx = math.min(8, x * 9 / w)
        var b = 0
        var luma = 0L
        while (b < bands) { luma += raster.getSample(x, y, b); b += 1 }
        sums(gy)(gx) += luma
        counts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var bit = 0
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        // avg(gx) > avg(gx+1) without division: cross-multiply counts
        if (sums(gy)(gx) * counts(gy)(gx + 1) > sums(gy)(gx + 1) * counts(gy)(gx))
          hash |= 1L << bit
        bit += 1
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Shared oracle CTE chain replaying [[dhash64]] over the planted
    * PNGs analytically (r10, promoting the image-hash family from
    * rows-only): PNG is LOSSLESS, so the decoded raster the Scala side
    * hashes equals the integer pixel pattern [[syntheticPng]] wrote —
    * the oracle re-derives the 9×8 luma-grid sums, the cross-
    * multiplied adjacent compares, and the 64-bit assembly (HUGEINT
    * bit shifts folded back to the signed BIGINT two's-complement
    * value, the dedup_simhash discipline). Matching proves the REAL
    * javax.imageio decode round-trips the encoder bit-exactly. */
  private[operators] val sqlDhash: String =
    """imgs AS (
      |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 16) % 16 AS h
      |  FROM documents WHERE doc_id % 50 = 0),
      |px AS (
      |  SELECT doc_id,
      |    least(7, y * 8 // h) AS gy, least(8, x * 9 // w) AS gx,
      |    (doc_id * 31 + x * 7 + y * 13) % 256
      |      + (doc_id * 17 + x * 3 + y * 29) % 256
      |      + (doc_id * 43 + x * 19 + y * 5) % 256 AS luma
      |  FROM imgs, range(0, 24) rx(x), range(0, 24) ry(y)
      |  WHERE x < w AND y < h),
      |cells AS (
      |  SELECT doc_id, gy, gx, CAST(sum(luma) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM px GROUP BY 1, 2, 3),
      |dbits AS (
      |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
      |  FROM cells a JOIN cells b ON a.doc_id = b.doc_id AND a.gy = b.gy
      |    AND b.gx = a.gx + 1
      |  WHERE a.gx < 8 AND a.s * b.c > b.s * a.c),
      |ih AS (
      |  SELECT i.doc_id,
      |    CAST(CASE WHEN coalesce(t.u, 0) >= CAST('9223372036854775808' AS HUGEINT)
      |         THEN coalesce(t.u, 0) - CAST('18446744073709551616' AS HUGEINT)
      |         ELSE coalesce(t.u, 0) END AS BIGINT) AS phash
      |  FROM imgs i LEFT JOIN (
      |    SELECT doc_id, CAST(sum(CAST(1 AS HUGEINT) << bit) AS HUGEINT) AS u
      |    FROM dbits GROUP BY 1) t ON i.doc_id = t.doc_id)""".stripMargin

  /** Image perceptual hashing — the multimodal dedup primitive: every
    * 50th doc's planted PNG decodes through javax.imageio and hashes
    * via [[dhash64]]; non-image blobs take a portable md5 fingerprint
    * lane (flagged by is_image so downstream image-dedup joins only
    * hash-comparable rows). Oracled r10: the image lane replays
    * [[sqlDhash]] (lossless PNG ⇒ decoded raster = written pattern),
    * the stub lane is the repo-standard [[Exprs.md5Long]] both engines
    * share. */
  val imagePhash: GraftOp = GraftOp(
    "mm_image_phash",
    s"""WITH $sqlDhash
       |SELECT d.doc_id, d.doc_id % 50 = 0 AS is_image,
       |  CASE WHEN d.doc_id % 50 = 0 THEN ih.phash
       |       ELSE ${graft.functions.Exprs.sqlMd5Long("d.text")} END AS phash
       |FROM documents d LEFT JOIN ih ON d.doc_id = ih.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val blobs = Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.Exprs.md5Long(col("text")).as("fallback"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("is_image", BooleanType),
      StructField("phash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        if (docId % 50 == 0) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(syntheticPng(docId)))
          Row(docId, true, dhash64(img))
        } else {
          Row(docId, false, r.getLong(1))
        }
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a minimal genuine ISO-BMFF (MP4) container: ftyp + a
    * 16-byte free box (so the walker has to SKIP, not assume offsets)
    * + moov/mvhd carrying timescale and duration — big-endian
    * throughout, the real byte layout (contrast WAV's little-endian
    * RIFF). */
  private[graft] def mp4Bytes(brand: String, timescale: Int, duration: Int): Array[Byte] = {
    require(brand.length == 4)
    val bb = java.nio.ByteBuffer.allocate(24 + 16 + 116)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    bb.putInt(24); fourcc("ftyp"); fourcc(brand); bb.putInt(0)
    fourcc("isom"); fourcc("mp41")
    bb.putInt(16); fourcc("free"); bb.putLong(0L)
    bb.putInt(116); fourcc("moov")
    bb.putInt(108); fourcc("mvhd")
    bb.putInt(0)                     // version 0 + flags
    bb.putInt(0).putInt(0)           // creation / modification time
    bb.putInt(timescale).putInt(duration)
    bb.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    bb.put(new Array[Byte](10))      // reserved
    // unity matrix
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.put(new Array[Byte](24))      // pre_defined
    bb.putInt(1)                     // next_track_ID
    bb.array()
  }

  /** Walk an ISO-BMFF box tree: top-level boxes by (size32, fourcc),
    * ftyp yields the major brand, moov's children are walked for
    * mvhd's (timescale, duration). Returns None on any malformed box
    * (size < 8, overruns the buffer) — the quarantine lane. A real
    * demuxer's first loop. */
  private[graft] def parseMp4Meta(bytes: Array[Byte]): Option[(String, Int, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    var brand: String = null
    var ts = -1
    var dur = -1L
    var pos = 0
    while (pos + 8 <= bytes.length) {
      val size = bb.getInt(pos)
      if (size < 8 || pos + size > bytes.length) return None
      cc(pos + 4) match {
        case "ftyp" if size >= 12 => brand = cc(pos + 8)
        case "moov" =>
          var cpos = pos + 8
          while (cpos + 8 <= pos + size) {
            val csize = bb.getInt(cpos)
            if (csize < 8 || cpos + csize > pos + size) return None
            if (cc(cpos + 4) == "mvhd" && csize >= 32 && bytes(cpos + 8) == 0) {
              ts = bb.getInt(cpos + 20)       // after version/flags + 2 times
              dur = bb.getInt(cpos + 24).toLong
            }
            cpos += csize
          }
        case _ => ()
      }
      pos += size
    }
    if (brand != null && ts > 0 && dur >= 0) Some((brand, ts, dur)) else None
  }

  /** Video-container metadata — the ISO-BMFF twin of [[wavMeta]]:
    * hash-derived parameters are laid out as a GENUINE MP4 box tree
    * (big-endian ftyp/free/moov/mvhd) and the kernel re-walks the
    * boxes like a demuxer (skipping the planted free box), recovering
    * brand, timescale, duration and integer duration_ms. The oracle
    * replays the hash arithmetic, so the hash match proves the
    * build→walk round trip preserves every field. mapPartitions,
    * zero shuffle. */
  val mp4Meta: GraftOp = GraftOp(
    "mm_mp4_meta",
    s"""WITH m AS (SELECT doc_id, ${Exprs.sqlMd5Long("text")} AS h FROM documents)
       |SELECT doc_id,
       |  CASE (h >> 2) % 2 WHEN 0 THEN 'isom' ELSE 'mp42' END AS brand,
       |  CAST(CASE h % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000 WHEN 2 THEN 24000
       |       ELSE 90000 END AS INT) AS timescale,
       |  CAST(1000 + (h >> 4) % 100000 AS BIGINT) AS duration_units,
       |  CAST((1000 + (h >> 4) % 100000) * 1000
       |    // (CASE h % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000 WHEN 2 THEN 24000
       |        ELSE 90000 END) AS BIGINT) AS duration_ms
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), Exprs.md5Long(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("brand", StringType),
      StructField("timescale", IntegerType), StructField("duration_units", LongType),
      StructField("duration_ms", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val h = r.getLong(1)
        val brand = if (((h >> 2) % 2) == 0) "isom" else "mp42"
        val ts = (h % 4) match {
          case 0 => 600; case 1 => 1000; case 2 => 24000; case _ => 90000
        }
        val dur = (1000 + (h >> 4) % 100000).toInt
        val (pBrand, pTs, pDur) = parseMp4Meta(mp4Bytes(brand, ts, dur)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted MP4 for doc ${r.getLong(0)}"))
        Row(r.getLong(0), pBrand, pTs, pDur, pDur * 1000L / pTs)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a complete PCM WAV blob: [[wavHeader]] followed by the
    * 16-bit little-endian samples — the genuine byte layout an audio
    * decoder reads. */
  private[graft] def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val header = wavHeader(sampleRate, 1, 16, samples.length)
    val bb = java.nio.ByteBuffer.allocate(header.length + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(header)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Deterministic planted waveform for a doc: a square wave (period
    * and amplitude hash-derived) whose final quarter is silent — the
    * shape gives every DSP feature a non-trivial, analytically
    * checkable value. */
  private[graft] def syntheticWave(h: Long): (Int, Array[Short]) = {
    val n = 256 + math.floorMod(h, 256).toInt
    val period = 4 + math.floorMod(h >> 5, 12).toInt
    val amp = (1000 + math.floorMod(h >> 8, 20000)).toInt
    val silentFrom = n - n / 4
    val samples = new Array[Short](n)
    var i = 0
    while (i < silentFrom) {
      samples(i) = (if ((i / (period / 2)) % 2 == 0) amp else -amp).toShort
      i += 1
    }
    (8000 + math.floorMod(h, 8).toInt * 4000, samples)
  }

  /** Parse a full PCM WAV blob and extract integer DSP features:
    * peak |amplitude|, energy (Σ s² as a BIGINT), zero crossings
    * (strict sign flips), and 64-sample frame silence (max |s| < 100)
    * — the language-/float-free audio stats a filtering pipeline cuts
    * on (silence-heavy and clipped clips are dropped before
    * transcription). Returns None on a malformed container.
    *
    * mm_audio_energy's oracle replays this loop arithmetically: the
    * planted square wave is fully determined by the doc's md5Long
    * hash, so every feature is a per-sample CASE over
    * unnest(range(n)) — sign flips at multiples of period/2, the
    * silent tail contributes zero samples, frames group by i//64. */
  private[graft] def audioFeatures(bytes: Array[Byte]): Option[(Int, Int, Long, Int, Int, Int)] =
    parseWavHeader(bytes).map { case (_, channels, bits, nSamples) =>
      val bb = java.nio.ByteBuffer.wrap(bytes, 44, bytes.length - 44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var peak = 0
      var sumSq = 0L
      var zc = 0
      var frames = 0
      var silentFrames = 0
      var frameMax = 0
      var prev = 0
      val n = nSamples * channels // total 16-bit samples (bits == 16 here)
      var i = 0
      while (i < n) {
        val s = bb.getShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        if (a > frameMax) frameMax = a
        sumSq += s.toLong * s
        if (prev * s < 0) zc += 1
        if (s != 0) prev = s
        i += 1
        if (i % 64 == 0 || i == n) {
          frames += 1
          if (frameMax < 100) silentFrames += 1
          frameMax = 0
        }
      }
      (n, peak, sumSq, zc, frames, silentFrames)
    }

  /** Audio energy / silence profiling — the audio lane's decode→
    * feature-extract twin of [[imageNearDup]]'s image lane: every doc
    * plants a COMPLETE deterministic WAV (genuine RIFF header + square
    * -wave PCM with a silent tail), and the kernel re-reads it as any
    * decoder would — container parse, then sample-level integer DSP
    * ([[audioFeatures]]). All-integer outputs — and ORACLE-CHECKED
    * since r15: the wave parameters derive from the portable 60-bit
    * md5Long hash (NOT a wrapping JVM hash), so the oracle simulates
    * the exact sample stream per doc (unnest(range(n)) + CASE) and
    * folds the same integer features; the REAL container parse + DSP
    * loop stays on the Spark side. MmSpec still pins the analytic
    * feature values of known waveforms. */
  val audioEnergy: GraftOp = GraftOp(
    "mm_audio_energy",
    """WITH p AS (
      |  SELECT doc_id, CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM documents),
      |w AS (
      |  SELECT doc_id,
      |    256 + h % 256 AS n,
      |    (4 + (h // 32) % 12) // 2 AS hp,
      |    1000 + (h // 256) % 20000 AS amp,
      |    (256 + h % 256) - (256 + h % 256) // 4 AS silent_from
      |  FROM p),
      |s AS (
      |  SELECT w.doc_id, w.n, t.i,
      |    CASE WHEN t.i < w.silent_from
      |         THEN CASE WHEN ((t.i // w.hp) % 2) = 0 THEN w.amp ELSE -w.amp END
      |         ELSE 0 END AS smp,
      |    CASE WHEN t.i >= 1 AND t.i < w.silent_from
      |          AND ((t.i // w.hp) % 2) <> (((t.i - 1) // w.hp) % 2)
      |         THEN 1 ELSE 0 END AS flip
      |  FROM w, unnest(range(w.n)) AS t(i)),
      |f AS (
      |  SELECT doc_id, i // 64 AS frame, max(abs(smp)) AS fmax FROM s GROUP BY 1, 2),
      |fr AS (
      |  SELECT doc_id, CAST(count(*) AS INT) AS n_frames,
      |    CAST(sum(CASE WHEN fmax < 100 THEN 1 ELSE 0 END) AS INT) AS n_silent_frames
      |  FROM f GROUP BY 1),
      |ag AS (
      |  SELECT doc_id, CAST(max(n) AS INT) AS n_samples, CAST(max(abs(smp)) AS INT) AS peak,
      |    CAST(sum(smp * smp) AS BIGINT) AS sum_sq,
      |    CAST(sum(flip) AS INT) AS zero_crossings
      |  FROM s GROUP BY 1)
      |SELECT a.doc_id, a.n_samples, a.peak, a.sum_sq, a.zero_crossings,
      |  fr.n_frames, fr.n_silent_frames
      |FROM ag a JOIN fr USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), Exprs.md5Long(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_samples", IntegerType),
      StructField("peak", IntegerType), StructField("sum_sq", LongType),
      StructField("zero_crossings", IntegerType), StructField("n_frames", IntegerType),
      StructField("n_silent_frames", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val (rate, samples) = syntheticWave(r.getLong(1))
        val (n, peak, sumSq, zc, frames, silent) =
          audioFeatures(wavBytes(rate, samples)).getOrElse(
            throw new IllegalStateException(s"unparseable planted WAV for doc ${r.getLong(0)}"))
        Row(r.getLong(0), n, peak, sumSq, zc, frames, silent)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Candidate-pair finder over (doc_id, phash) frames: the 64-bit
    * hash is cut into four 16-bit bands and pairs meet through a band
    * equi-join — the simhash/LSH pigeonhole guarantee that any pair
    * within hamming ≤ 3 shares at least one identical band, so the
    * join can only miss pairs ≥ 4 bits apart (and in practice far
    * beyond — 4 spread bits must land in 4 distinct bands). Candidates
    * are then verified with an exact popcount on the XOR. Same
    * banded shape as DedupOps.simhash: the shuffle carries
    * (band, 16-bit value) keys, never an all-pairs product. */
  private[graft] def nearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val banded = hashes.select(col("doc_id"), col("phash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("v"))
      }: _*)).as("bv"))
      .select(col("doc_id"), col("phash"),
        col("bv.band").as("band"), col("bv.v").as("v"))
    val l = banded.select(col("band"), col("v"),
      col("doc_id").as("da"), col("phash").as("pa"))
    val r = banded.select(col("band"), col("v"),
      col("doc_id").as("db"), col("phash").as("pb"))
    l.join(r, Seq("band", "v")).filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("pa"), col("pb")).distinct()
      .select(col("da"), col("db"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Image near-duplicate scan — the perceptual-hash analogue of
    * simhash text dedup, over the REAL image lane only (every 50th
    * doc decodes its planted PNG through javax.imageio; dHash bits
    * of non-images are not comparable, so the stub lane stays out by
    * construction). [[nearDupPairs]] generates banded candidates,
    * hamming ≤ 6 confirms, and the result rolls up per image
    * (n_neardup / min_hamming, isolated images kept at 0 / −1), so
    * cardinality is exactly the image count. Oracled r10 via
    * [[sqlDhash]]: the oracle replays the SAME contract the operator
    * computes — band-candidate (∃ equal 16-bit band, on the unsigned
    * HUGEINT view of the hash) AND hamming ≤ 6 via xor/bit_count on
    * the signed value — over the |images|² pair space that is tiny at
    * oracle SF (the Spark side never materializes it; the banded join
    * IS the scale path). */
  val imageNearDup: GraftOp = GraftOp(
    "mm_image_neardup",
    s"""WITH $sqlDhash,
       |u AS (
       |  SELECT doc_id, phash,
       |    CAST(phash AS HUGEINT) + CASE WHEN phash < 0
       |      THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END AS pu
       |  FROM ih),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |    bit_count(xor(a.phash, b.phash)) AS hamming
       |  FROM u a JOIN u b ON a.doc_id < b.doc_id
       |  WHERE ((a.pu % 65536 = b.pu % 65536)
       |      OR ((a.pu // 65536) % 65536 = (b.pu // 65536) % 65536)
       |      OR ((a.pu // 4294967296) % 65536 = (b.pu // 4294967296) % 65536)
       |      OR ((a.pu // 281474976710656) % 65536 = (b.pu // 281474976710656) % 65536))
       |    AND bit_count(xor(a.phash, b.phash)) <= 6),
       |per AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neardup,
       |    min(hamming) AS min_hamming
       |  FROM (SELECT da AS doc_id, hamming FROM pairs
       |        UNION ALL SELECT db, hamming FROM pairs)
       |  GROUP BY 1)
       |SELECT i.doc_id, coalesce(per.n_neardup, 0) AS n_neardup,
       |  CAST(coalesce(per.min_hamming, -1) AS INT) AS min_hamming
       |FROM ih i LEFT JOIN per ON i.doc_id = per.doc_id
       |ORDER BY i.doc_id""".stripMargin) { (s, d) =>
    val imgIds = Tables.documents(s, d)
      .filter(col("doc_id") % 50 === 0).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("phash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val hashes = imgIds.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(syntheticPng(docId)))
        Row(docId, dhash64(img))
      }
    }(enc)
    val pairs = nearDupPairs(hashes, maxHamming = 6).persist()
    val perImage = pairs.select(col("da").as("doc_id"), col("hamming"))
      .unionAll(pairs.select(col("db").as("doc_id"), col("hamming")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_neardup"), min(col("hamming")).as("min_hamming"))
    hashes.join(perImage, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        coalesce(col("min_hamming"), lit(-1)).as("min_hamming"))
      .orderBy(col("doc_id"))
  }

  /** Encode a hash-patterned raster as a REAL baseline JPEG through
    * the JDK's `javax.imageio` writer — the planted input for the
    * segment walk (dimensions hash-derived, so the oracle can predict
    * them without running Java). */
  private[graft] def syntheticJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 37 + y * 11) % 256 << 16) | ((x + y) % 256 << 8) | (x * y % 256))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Walk a JPEG's marker segments like a metadata scanner (no pixel
    * decode): SOI, then FF-marker / 2-byte big-endian length frames
    * until a start-of-frame (SOF0 baseline / SOF2 progressive) yields
    * precision, height, width, component count. Returns
    * (sofMarker, width, height, nComponents, nSegmentsBeforeSof). */
  private[graft] def parseJpegMeta(bytes: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var i = 2
    var segs = 0
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xc0 || marker == 0xc2) {
        // SOF frame: len(2) precision(1) height(2) width(2) ncomp(1)
        val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
        val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
        val nc = bytes(i + 9) & 0xff
        val sof = if (marker == 0xc0) "SOF0" else "SOF2"
        return Some((sof, w, h, nc, segs))
      }
      val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      i += 2 + len
      segs += 1
    }
    None
  }

  /** JPEG structural metadata via a genuine marker-segment walk — the
    * third leg of the container story (PNG full decode, RIFF/WAV
    * parse, ISO-BMFF box tree): a metadata pass reads dimensions from
    * the SOF header in O(header) bytes, never running the entropy
    * decoder. Planted JPEGs are REAL `javax.imageio` encodes at
    * hash-derived dimensions, re-walked demuxer-style; the oracle
    * predicts (marker, dims, components) from the same hash math —
    * matching proves the walk reads the real encoder's byte layout.
    * The JDK writer emits baseline SOF0 with 3 components for RGB
    * input (public JFIF behavior). */
  val jpegMeta: GraftOp = GraftOp(
    "mm_jpeg_meta",
    s"""WITH m AS (SELECT doc_id, ${Exprs.sqlMd5Long("text")} AS h FROM documents)
       |SELECT doc_id, 'SOF0' AS sof_marker,
       |  CAST(8 + h % 48 AS INT) AS width,
       |  CAST(8 + (h >> 6) % 48 AS INT) AS height,
       |  CAST(3 AS INT) AS n_components
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), Exprs.md5Long(col("text")).as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("sof_marker", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_components", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val h = r.getLong(1)
        val (w0, h0) = ((8 + h % 48).toInt, (8 + (h >> 6) % 48).toInt)
        val (sof, w, ht, nc, _) = parseJpegMeta(syntheticJpeg(w0, h0)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted JPEG for doc ${r.getLong(0)}"))
        Row(r.getLong(0), sof, w, ht, nc)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Walk a PNG's chunk stream (no pixel decode): 8-byte signature,
    * then [len(4 BE), type(4 ASCII), data, crc(4)] frames; IHDR yields
    * width/height/bit-depth/color-type. Returns (width, height,
    * bitDepth, colorType, firstChunk, lastChunk, nIdat). */
  private[graft] def parsePngChunks(bytes: Array[Byte]): Option[(Int, Int, Int, Int, String, String, Int)] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length < 8 || !sig.indices.forall(i => (bytes(i) & 0xff) == sig(i))) return None
    def be32(i: Int): Int =
      ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var i = 8
    var first: String = null
    var last: String = null
    var nIdat = 0
    var w, h, depth, color = -1
    while (i + 8 <= bytes.length) {
      val len = be32(i)
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      if (first == null) first = typ
      last = typ
      if (typ == "IHDR") {
        w = be32(i + 8); h = be32(i + 12)
        depth = bytes(i + 16) & 0xff; color = bytes(i + 17) & 0xff
      }
      if (typ == "IDAT") nIdat += 1
      i += 12 + len // len + type + data + crc
    }
    if (w < 0 || last != "IEND") None
    else Some((w, h, depth, color, first, last, nIdat))
  }

  /** PNG structural metadata via a genuine chunk walk — the fourth leg
    * of the container story (JPEG marker walk, RIFF/WAV, ISO-BMFF):
    * dimensions and pixel format from IHDR in O(header) bytes, chunk
    * framing validated end-to-end (first=IHDR, last=IEND, ≥1 IDAT).
    * Planted PNGs are REAL `javax.imageio` encodes at id-derived
    * dimensions; the oracle predicts IHDR fields from the same id
    * math — matching proves the walk reads the real encoder's layout
    * (TYPE_3BYTE_BGR → 8-bit truecolor, color type 2). */
  val pngChunks: GraftOp = GraftOp(
    "mm_png_chunks",
    """SELECT doc_id,
      |  CAST(8 + doc_id % 16 AS INT) AS width,
      |  CAST(8 + (doc_id // 16) % 16 AS INT) AS height,
      |  CAST(8 AS INT) AS bit_depth,
      |  CAST(2 AS INT) AS color_type,
      |  'IHDR' AS first_chunk, 'IEND' AS last_chunk,
      |  CAST(1 AS INT) AS has_idat
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("bit_depth", IntegerType),
      StructField("color_type", IntegerType), StructField("first_chunk", StringType),
      StructField("last_chunk", StringType), StructField("has_idat", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (w, h, depth, color, first, last, nIdat) =
          parsePngChunks(syntheticPng(docId)).getOrElse(
            throw new IllegalStateException(s"unwalkable planted PNG for doc $docId"))
        Row(docId, w, h, depth, color, first, last, if (nIdat > 0) 1 else 0)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Deterministic GIF for `docId` via the REAL JDK GIF encoder
    * (palette quantization and LZW are the encoder's own). */
  private[graft] def syntheticBmp(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 16).toInt
    val h = 8 + ((docId / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((docId + x) % 256).toInt << 16) | (((x * y) % 256) << 8)
          | ((docId % 256).toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Walk a BMP's two fixed headers: BITMAPFILEHEADER ('BM', LE u32
    * file size, LE u32 pixel-data offset) then BITMAPINFOHEADER (LE
    * sizes/dims/planes/bpp/compression). Returns (width, height, bpp,
    * compression, fileSize, dataOffset); None on bad magic, a non-40
    * DIB header, or a declared size disagreeing with the buffer. */
  private[graft] def parseBmpMeta(
      bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def le32(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val fileSize = le32(2)
    val dataOffset = le32(10)
    if (fileSize != bytes.length || dataOffset > bytes.length) return None
    if (le32(14) != 40) return None // only BITMAPINFOHEADER walked
    val (w, h) = (le32(18), le32(22))
    if (le16(26) != 1) return None // planes
    Some((w, h, le16(28), le32(30), fileSize, dataOffset))
  }

  private[graft] def syntheticGif(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 16).toInt
    val h = 8 + ((docId / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((docId + x) % 256).toInt << 16) | (((x * y) % 256) << 8)
          | ((docId % 256).toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** Walk a GIF's block stream: header+version, little-endian logical
    * screen descriptor, global color table skip, then extension /
    * image-descriptor / trailer blocks with sub-block chains skipped
    * size-first (never decoded). Returns (version, width, height,
    * nFrames, sawTrailer). */
  private[graft] def parseGifMeta(bytes: Array[Byte]): Option[(String, Int, Int, Int, Boolean)] = {
    if (bytes.length < 13 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') return None
    val version = new String(bytes, 3, 3, "US-ASCII")
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val w = le16(6)
    val h = le16(8)
    val packed = bytes(10) & 0xff
    var i = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    var frames = 0
    var trailer = false
    def skipSubBlocks(): Unit = {
      while (i < bytes.length && (bytes(i) & 0xff) != 0) i += 1 + (bytes(i) & 0xff)
      i += 1 // terminator
    }
    while (!trailer && i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks
          i += 2; skipSubBlocks()
        case 0x2c => // image descriptor
          frames += 1
          val lp = bytes(i + 9) & 0xff
          i += 10 + (if ((lp & 0x80) != 0) 3 * (1 << ((lp & 7) + 1)) else 0)
          i += 1 // LZW minimum code size
          skipSubBlocks()
        case 0x3b => trailer = true
        case _ => return None // unknown block: malformed
      }
    }
    Some((version, w, h, frames, trailer))
  }

  /** GIF structural metadata — fifth container leg: the block walk
    * skips LZW sub-block chains size-first exactly like a demuxer,
    * counts image descriptors and requires the trailer. Planted GIFs
    * are REAL JDK encodes at id-derived dimensions; the oracle
    * predicts version/dims/frame-count from the same id math. */
  /** Tenth container leg: BMP fixed-header walk over REAL JDK encodes
    * (TYPE_INT_RGB → 24-bpp uncompressed BITMAPINFOHEADER at offset
    * 54). The oracle predicts every field from id math alone — width/
    * height from the planted dims, pixel bytes from the 4-byte row
    * padding rule ⌈3w/4⌉·4·h — so a hash match proves the encoder and
    * the walker agree on the whole layout, padding included. Kernel in
    * mapPartitions like every codec. */
  val bmpMeta: GraftOp = GraftOp(
    "mm_bmp_meta",
    """SELECT doc_id,
      |  CAST(8 + doc_id % 16 AS INT) AS width,
      |  CAST(8 + (doc_id // 16) % 16 AS INT) AS height,
      |  CAST(24 AS INT) AS bpp, CAST(0 AS INT) AS compression,
      |  CAST((((8 + doc_id % 16) * 3 + 3) // 4) * 4
      |       * (8 + (doc_id // 16) % 16) AS INT) AS pixel_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("bpp", IntegerType),
      StructField("compression", IntegerType), StructField("pixel_bytes", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (w, h, bpp, comp, fileSize, off) = parseBmpMeta(syntheticBmp(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted BMP for doc $docId"))
        Row(docId, w, h, bpp, comp, fileSize - off)
      }
    }(enc).orderBy(col("doc_id"))
  }

  val gifMeta: GraftOp = GraftOp(
    "mm_gif_meta",
    """SELECT doc_id, '89a' AS version,
      |  CAST(8 + doc_id % 16 AS INT) AS width,
      |  CAST(8 + (doc_id // 16) % 16 AS INT) AS height,
      |  CAST(1 AS INT) AS n_frames, CAST(1 AS INT) AS has_trailer
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("version", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_frames", IntegerType), StructField("has_trailer", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (v, w, h, nf, tr) = parseGifMeta(syntheticGif(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted GIF for doc $docId"))
        Row(docId, v, w, h, nf, if (tr) 1 else 0)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a POSIX ustar archive: one 512-byte header per entry (octal
    * size/mtime fields, checksum computed over the header with the
    * checksum field blanked to spaces, `ustar` magic), payload padded
    * to the 512 boundary, two zero blocks at the end. */
  private[graft] def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      def putStr(off: Int, v: String): Unit = {
        val b = v.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
      }
      putStr(0, name)
      putStr(100, "0000644"); putStr(108, "0000000"); putStr(116, "0000000")
      putStr(124, f"${data.length}%011o")
      putStr(136, "00000000000")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = '0'
      putStr(257, "ustar"); putStr(263, "00")
      var sum = 0L; var j = 0
      while (j < 512) { sum += (h(j) & 0xff); j += 1 }
      putStr(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
      bos.write(h); bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  /** Walk a ustar archive header-first (the WebDataset reader loop):
    * per entry verify the `ustar` magic and the header checksum
    * (space-blanked sum), read the octal size, skip the padded payload
    * — stop at the first zero block. Returns (nEntries, payloadBytes,
    * headersOk, firstName); None when the terminator is missing or a
    * header is unwalkable. */
  private[graft] def parseTar(bytes: Array[Byte]): Option[(Int, Long, Int, String)] = {
    var i = 0; var entries = 0; var payload = 0L; var okChk = 0; var first = ""
    while (i + 512 <= bytes.length) {
      if (bytes(i) == 0) return Some((entries, payload, okChk, first))
      if (new String(bytes, i + 257, 5, "US-ASCII") != "ustar") return None
      var e = i
      while (e < i + 100 && bytes(e) != 0) e += 1
      val name = new String(bytes, i, e - i, "US-ASCII")
      val stored = java.lang.Long.parseLong(
        new String(bytes, i + 148, 6, "US-ASCII").trim, 8)
      var sum = 0L; var j = 0
      while (j < 512) { sum += (if (j >= 148 && j < 156) 32 else bytes(i + j) & 0xff); j += 1 }
      if (sum == stored) okChk += 1
      val size = java.lang.Long.parseLong(
        new String(bytes, i + 124, 11, "US-ASCII").trim, 8)
      if (entries == 0) first = name
      entries += 1; payload += size
      i += 512 + ((size + 511) / 512 * 512).toInt
    }
    None
  }

  /** TAR / WebDataset sample metadata — sixth container leg, and the
    * container LLM training shards actually ship in: each document
    * becomes a WebDataset-style sample tar (`<key>.txt` payload +
    * `<key>.cls` label), built as a REAL ustar archive (octal fields,
    * blanked-checksum sum, zero-block terminator) and walked back
    * header-first with checksum verification. The oracle predicts
    * entry count, payload bytes, 512-block count and first member name
    * from the same id/text math (strlen = byte length both sides —
    * the corpus is ASCII; hash-match proves the build→parse round
    * trip). Build+walk live in one mapPartitions — zero shuffle. */
  val tarMeta: GraftOp = GraftOp(
    "mm_tar_meta",
    """SELECT doc_id,
      |  CAST(2 AS INT) AS n_entries,
      |  CAST(strlen(text) + strlen(lang) AS BIGINT) AS payload_bytes,
      |  CAST(4 + (strlen(text) + 511) // 512 + (strlen(lang) + 511) // 512 AS BIGINT)
      |    AS n_blocks,
      |  CAST(2 AS INT) AS headers_ok,
      |  concat(CAST(doc_id AS VARCHAR), '.txt') AS first_name
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_entries", IntegerType),
      StructField("payload_bytes", LongType), StructField("n_blocks", LongType),
      StructField("headers_ok", IntegerType), StructField("first_name", StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val tar = tarBytes(Seq(
          s"$docId.txt" -> r.getString(1).getBytes("UTF-8"),
          s"$docId.cls" -> r.getString(2).getBytes("UTF-8")))
        val (n, payload, ok, first) = parseTar(tar).getOrElse(
          throw new IllegalStateException(s"unwalkable planted tar for doc $docId"))
        Row(docId, n, payload, tar.length.toLong / 512, ok, first)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a store-method (no compression) ZIP: local file headers +
    * payloads, then the central directory, then the end-of-central-
    * directory record — real CRC-32s via java.util.zip. */
  private[graft] def zipBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bos = new java.io.ByteArrayOutputStream()
    val cds = entries.map { case (name, data) =>
      val off = bos.size()
      val crcCalc = new java.util.zip.CRC32(); crcCalc.update(data)
      val crc = crcCalc.getValue
      val nb = name.getBytes("US-ASCII")
      val bb = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x04034b50); bb.putShort(20); bb.putShort(0); bb.putShort(0)
      bb.putShort(0); bb.putShort(0)
      bb.putInt(crc.toInt); bb.putInt(data.length); bb.putInt(data.length)
      bb.putShort(nb.length.toShort); bb.putShort(0)
      bos.write(bb.array()); bos.write(nb); bos.write(data)
      (name, crc, data.length, off)
    }
    val cdStart = bos.size()
    cds.foreach { case (name, crc, size, off) =>
      val nb = name.getBytes("US-ASCII")
      val bb = ByteBuffer.allocate(46).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x02014b50); bb.putShort(20); bb.putShort(20); bb.putShort(0)
      bb.putShort(0); bb.putShort(0); bb.putShort(0)
      bb.putInt(crc.toInt); bb.putInt(size); bb.putInt(size)
      bb.putShort(nb.length.toShort); bb.putShort(0); bb.putShort(0)
      bb.putShort(0); bb.putShort(0); bb.putInt(0); bb.putInt(off)
      bos.write(bb.array()); bos.write(nb)
    }
    val cdSize = bos.size() - cdStart
    val bb = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x06054b50); bb.putShort(0); bb.putShort(0)
    bb.putShort(cds.size.toShort); bb.putShort(cds.size.toShort)
    bb.putInt(cdSize); bb.putInt(cdStart); bb.putShort(0)
    bos.write(bb.array())
    bos.toByteArray
  }

  /** Read a ZIP the way unzip does: find the EOCD signature from the
    * end, jump to the central directory, walk its entries, and verify
    * each member by recomputing CRC-32 over the stored payload reached
    * through its local header. Returns (nEntries, totalUncompressed,
    * cdSize, crcOk). */
  private[graft] def parseZip(bytes: Array[Byte]): Option[(Int, Long, Int, Int)] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le32(i: Int): Int = ByteBuffer.wrap(bytes, i, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    def le16(i: Int): Int =
      ByteBuffer.wrap(bytes, i, 2).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
    var e = bytes.length - 22
    while (e >= 0 && le32(e) != 0x06054b50) e -= 1
    if (e < 0) return None
    val n = le16(e + 10)
    val cdSize = le32(e + 12)
    var i = le32(e + 16)
    var total = 0L; var crcOk = 0; var k = 0
    while (k < n) {
      if (le32(i) != 0x02014b50) return None
      val crc = le32(i + 16).toLong & 0xffffffffL
      val size = le32(i + 24)
      val nameLen = le16(i + 28)
      val extraLen = le16(i + 30); val cmtLen = le16(i + 32)
      val lho = le32(i + 42)
      // local header: fixed 30 bytes + its own name/extra lengths
      val dataOff = lho + 30 + le16(lho + 26) + le16(lho + 28)
      val calc = new java.util.zip.CRC32()
      calc.update(bytes, dataOff, size)
      if (calc.getValue == crc) crcOk += 1
      total += size
      i += 46 + nameLen + extraLen + cmtLen
      k += 1
    }
    Some((n, total, cdSize, crcOk))
  }

  /** ZIP central-directory walk — seventh container leg (the docx /
    * epub / apk family): per document a REAL store-method zip of the
    * same two WebDataset members, read back EOCD-first with per-member
    * CRC-32 re-verification against the stored payload. The oracle
    * predicts entry count, byte totals and the central-directory size
    * from name/text length math; crc_ok = 2 asserts the JVM-side
    * round trip. One mapPartitions, zero shuffle. */
  val zipMeta: GraftOp = GraftOp(
    "mm_zip_meta",
    """SELECT doc_id,
      |  CAST(2 AS INT) AS n_entries,
      |  CAST(strlen(text) + strlen(lang) AS BIGINT) AS total_bytes,
      |  CAST(92 + 2 * (strlen(CAST(doc_id AS VARCHAR)) + 4) AS INT) AS cd_size,
      |  CAST(2 AS INT) AS crc_ok
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_entries", IntegerType),
      StructField("total_bytes", LongType), StructField("cd_size", IntegerType),
      StructField("crc_ok", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val zip = zipBytes(Seq(
          s"$docId.txt" -> r.getString(1).getBytes("UTF-8"),
          s"$docId.cls" -> r.getString(2).getBytes("UTF-8")))
        val (n, total, cdSize, crcOk) = parseZip(zip).getOrElse(
          throw new IllegalStateException(s"unreadable planted zip for doc $docId"))
        Row(docId, n, total, cdSize, crcOk)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a minimal REAL PDF: header, catalog → pages → N page
    * objects with id-derived MediaBox, a byte-exact xref table, and
    * the trailer/startxref tail a conforming reader seeks first. */
  private[graft] def pdfBytes(nPages: Int, w: Int, h: Int): Array[Byte] = {
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    sb.append("%PDF-1.4\n")
    def obj(body: String): Unit = { offsets += sb.length; sb.append(body) }
    obj("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    obj(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n")
    (0 until nPages).foreach { i =>
      obj(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 $w $h] >> endobj\n")
    }
    val xrefOff = sb.length
    sb.append(f"xref\n0 ${offsets.length + 1}%d\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer << /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes("US-ASCII")
  }

  /** Read a PDF the way a conforming reader starts: the startxref
    * pointer in the tail, the xref table at that offset, per-object
    * offset validation ("<id> 0 obj" must sit at every claimed
    * offset), then trailer /Root → catalog → /Pages → /Count and the
    * first page's /MediaBox. Returns (version, nObjects, nPages,
    * width, height, xrefOk); None when the tail/table is malformed. */
  private[graft] def parsePdf(bytes: Array[Byte]): Option[(String, Int, Int, Int, Int, Boolean)] = {
    val s = new String(bytes, "US-ASCII")
    if (!s.startsWith("%PDF-")) return None
    val version = s.substring(5, 8)
    val sx = s.lastIndexOf("startxref")
    if (sx < 0) return None
    val xrefOff = s.substring(sx + 9).trim.takeWhile(_.isDigit).toInt
    if (xrefOff >= s.length || !s.startsWith("xref", xrefOff)) return None
    val afterXref = s.indexOf('\n', xrefOff) + 1
    val header = s.substring(afterXref, s.indexOf('\n', afterXref)).trim.split(" ")
    val size = header(1).toInt
    val entries0 = s.indexOf('\n', afterXref) + 1
    var xrefOk = true
    var i = 1 // entry 0 is the free head
    while (i < size) {
      val e = s.substring(entries0 + i * 20, entries0 + i * 20 + 20)
      val off = e.substring(0, 10).toInt
      if (e.charAt(17) != 'n' || !s.startsWith(s"$i 0 obj", off)) xrefOk = false
      i += 1
    }
    val trailer = s.indexOf("trailer", entries0)
    if (trailer < 0) return None
    val root = """/Root (\d+) 0 R""".r.findFirstMatchIn(s.substring(trailer))
      .map(_.group(1).toInt).getOrElse(return None)
    def objBody(id: Int): String = {
      val start = s.indexOf(s"$id 0 obj")
      if (start < 0) return ""
      s.substring(start, s.indexOf("endobj", start))
    }
    val pagesRef = """/Pages (\d+) 0 R""".r.findFirstMatchIn(objBody(root))
      .map(_.group(1).toInt).getOrElse(return None)
    val pagesObj = objBody(pagesRef)
    val count = """/Count (\d+)""".r.findFirstMatchIn(pagesObj)
      .map(_.group(1).toInt).getOrElse(return None)
    val firstKid = """/Kids \[(\d+) 0 R""".r.findFirstMatchIn(pagesObj)
      .map(_.group(1).toInt).getOrElse(return None)
    val mb = """/MediaBox \[0 0 (\d+) (\d+)\]""".r.findFirstMatchIn(objBody(firstKid))
      .getOrElse(return None)
    Some((version, size - 1, count, mb.group(1).toInt, mb.group(2).toInt, xrefOk))
  }

  /** PDF xref walk — eighth container leg, the DOCUMENT container a
    * text-extraction pipeline meets first: per doc a REAL minimal PDF
    * (catalog → pages → id-derived page objects, byte-exact xref,
    * trailer/startxref tail) read back reader-style — startxref seek,
    * xref parse with per-object OFFSET VALIDATION, trailer /Root
    * chase to /Count and the first MediaBox. Oracle predicts every
    * field from the id math; xref_ok = 1 pins that the builder's
    * byte offsets are the parser's truth. mapPartitions, zero
    * shuffle. */
  val pdfMeta: GraftOp = GraftOp(
    "mm_pdf_meta",
    """SELECT doc_id, '1.4' AS version,
      |  CAST(2 + 1 + doc_id % 4 AS INT) AS n_objects,
      |  CAST(1 + doc_id % 4 AS INT) AS n_pages,
      |  CAST(400 + doc_id % 200 AS INT) AS width,
      |  CAST(500 + (doc_id // 7) % 300 AS INT) AS height,
      |  CAST(1 AS INT) AS xref_ok
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("version", StringType),
      StructField("n_objects", IntegerType), StructField("n_pages", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("xref_ok", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val pdf = pdfBytes((1 + docId % 4).toInt, (400 + docId % 200).toInt,
          (500 + (docId / 7) % 300).toInt)
        val (v, no, np, w, h, ok) = parsePdf(pdf).getOrElse(
          throw new IllegalStateException(s"unreadable planted PDF for doc $docId"))
        Row(docId, v, no, np, w, h, if (ok) 1 else 0)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Mixed-corpus container census — the composition op over ALL
    * EIGHT container legs: each doc plants the format its id selects
    * (png/gif/jpeg/wav/mp4/tar/zip/pdf), the matching walker parses it
    * back, and the rollup reports per-format doc counts and parse
    * successes — the "what is actually in this crawl bucket and how
    * much of it opens" inventory a multimodal ingest runs first. The
    * oracle predicts counts from id arithmetic; parsed_ok = n_docs
    * hash-pins every builder→walker pair in one row each. Kernels in
    * mapPartitions, one 8-group aggregate. */
  val containerCensus: GraftOp = GraftOp(
    "mm_container_census",
    """WITH f AS (
      |  SELECT CASE CAST(doc_id % 8 AS INT)
      |    WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'jpeg'
      |    WHEN 3 THEN 'wav' WHEN 4 THEN 'mp4' WHEN 5 THEN 'tar'
      |    WHEN 6 THEN 'zip' ELSE 'pdf' END AS format
      |  FROM documents)
      |SELECT format, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS parsed_ok
      |FROM f GROUP BY 1 ORDER BY format""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("format", StringType),
      StructField("ok", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (fmt, ok) = (id % 8) match {
          case 0 => "png" -> parsePngChunks(syntheticPng(id)).isDefined
          case 1 => "gif" -> parseGifMeta(syntheticGif(id)).isDefined
          case 2 => "jpeg" -> parseJpegMeta(syntheticJpeg((8 + id % 8).toInt, 8)).isDefined
          case 3 => "wav" -> parseWavHeader(wavBytes(8000,
            Array.tabulate(16)(i => ((id + i) % 256).toShort))).isDefined
          case 4 => "mp4" -> parseMp4Meta(mp4Bytes("isom", 1000, (id % 5000).toInt)).isDefined
          case 5 => "tar" -> parseTar(tarBytes(Seq(
            s"$id.txt" -> s"doc $id".getBytes("UTF-8")))).isDefined
          case 6 => "zip" -> parseZip(zipBytes(Seq(
            s"$id.txt" -> s"doc $id".getBytes("UTF-8")))).isDefined
          case _ => "pdf" -> parsePdf(pdfBytes((1 + id % 3).toInt, 612, 792)).isDefined
        }
        Row(id, fmt, if (ok) 1 else 0)
      }
    }(enc)
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ok")).cast(LongType).as("parsed_ok"))
      .orderBy(col("format"))
  }

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15
    * = bad — neither planted). Public constants from ISO/IEC 11172-3. */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Build a REAL MPEG-1 Layer III stream: `nFrames` frames, each a
    * genuine 4-byte header (sync, version, layer, bitrate index,
    * sample-rate index, padding 0) plus a zero payload of the exact
    * spec frame length ⌊144000·kbps/rate⌋. */
  private[graft] def mp3Stream(bitrateIdx: Int, rateIdx: Int, nFrames: Int): Array[Byte] = {
    val frameLen = 144000 * Mp3Bitrates(bitrateIdx) / Mp3Rates(rateIdx)
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      val o = f * frameLen
      out(o) = 0xFF.toByte
      out(o + 1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
      out(o + 2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
      out(o + 3) = 0 // stereo, no emphasis
      f += 1
    }
    out
  }

  /** Walk an MP3 stream frame-by-frame using each header's OWN length
    * field (the real parser discipline — no trust in caller-known
    * frame counts): (bitrate_kbps, sample_rate, n_frames), or None on
    * a bad sync / inconsistent parameters. */
  private[graft] def parseMp3(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    var o = 0
    var n = 0
    var kbps = -1
    var rate = -1
    while (o + 4 <= bytes.length) {
      if (bytes(o) != 0xFF.toByte || (bytes(o + 1) & 0xFE) != 0xFA) return None
      val bIdx = (bytes(o + 2) >> 4) & 0xF
      val rIdx = (bytes(o + 2) >> 2) & 0x3
      if (bIdx == 0 || bIdx == 15 || rIdx == 3) return None
      val k = Mp3Bitrates(bIdx)
      val r = Mp3Rates(rIdx)
      if (kbps == -1) { kbps = k; rate = r }
      else if (kbps != k || rate != r) return None
      val frameLen = 144000 * k / r + ((bytes(o + 2) >> 1) & 1)
      if (frameLen < 4) return None
      o += frameLen
      n += 1
    }
    if (n == 0 || o != bytes.length) None else Some((kbps, rate, n))
  }

  /** MP3 frame-sync walk — the ninth container leg (compressed-audio
    * metadata next to WAV's PCM): hash-derived parameters → a genuine
    * MPEG-1 Layer III stream → the kernel re-derives bitrate/rate/
    * frame count by walking sync words and per-header frame lengths.
    * Duration is exact integer math: each Layer III frame spans 1152
    * samples. The oracle replays the hash-derived parameters and the
    * spec arithmetic analytically. */
  val mp3Meta: GraftOp = GraftOp(
    "mm_mp3_meta",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(1 + ${Exprs.sqlMd5Long("text")} % 14 AS INT) AS b_idx,
       |    CAST((${Exprs.sqlMd5Long("text")} >> 4) % 3 AS INT) AS r_idx,
       |    CAST(50 + (${Exprs.sqlMd5Long("text")} >> 6) % 200 AS INT) AS n_frames
       |  FROM documents),
       |p AS (
       |  SELECT doc_id,
       |    list_extract([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320], b_idx) AS bitrate_kbps,
       |    list_extract([44100, 48000, 32000], r_idx + 1) AS sample_rate,
       |    n_frames
       |  FROM m)
       |SELECT doc_id, CAST(bitrate_kbps AS INT) AS bitrate_kbps,
       |  CAST(sample_rate AS INT) AS sample_rate, n_frames,
       |  CAST(n_frames AS BIGINT) * 1152 * 1000 // sample_rate AS duration_ms
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    val params = Tables.documents(s, d)
      .select(col("doc_id"),
        (lit(1) + h % 14).cast(IntegerType).as("b_idx"),
        (shiftright(h, 4) % 3).cast(IntegerType).as("r_idx"),
        (lit(50) + shiftright(h, 6) % 200).cast(IntegerType).as("n_frames"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bitrate_kbps", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    params.mapPartitions { rows =>
      rows.map { r =>
        val stream = mp3Stream(r.getInt(1), r.getInt(2), r.getInt(3))
        val (kbps, rate, n) = parseMp3(stream).getOrElse(
          throw new IllegalStateException(s"unparseable planted MP3 for doc ${r.getLong(0)}"))
        Row(r.getLong(0), kbps, rate, n, n.toLong * 1152 * 1000 / rate)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a REAL ID3v2.3 tag (10-byte header with a SYNCSAFE 28-bit
    * body size — four 7-bit bytes, the encoding no other leg
    * exercises — plus one TIT2 text frame with a plain big-endian
    * v2.3 frame size and an ISO-8859-1 title) prepended to a genuine
    * MPEG-1 Layer III stream from [[mp3Stream]]. */
  private[graft] def id3Mp3Stream(titleLen: Int, bitrateIdx: Int, rateIdx: Int,
      nFrames: Int): Array[Byte] = {
    val frameBody = 1 + titleLen // encoding byte + latin-1 title
    val tagBody = 10 + frameBody // one TIT2 frame header + body
    val tag = new Array[Byte](10 + tagBody)
    tag(0) = 'I'; tag(1) = 'D'; tag(2) = '3'
    tag(3) = 3; tag(4) = 0 // v2.3.0
    tag(5) = 0 // no unsync/extended-header/experimental flags
    tag(6) = ((tagBody >> 21) & 0x7F).toByte
    tag(7) = ((tagBody >> 14) & 0x7F).toByte
    tag(8) = ((tagBody >> 7) & 0x7F).toByte
    tag(9) = (tagBody & 0x7F).toByte
    tag(10) = 'T'; tag(11) = 'I'; tag(12) = 'T'; tag(13) = '2'
    tag(14) = ((frameBody >>> 24) & 0xFF).toByte
    tag(15) = ((frameBody >>> 16) & 0xFF).toByte
    tag(16) = ((frameBody >>> 8) & 0xFF).toByte
    tag(17) = (frameBody & 0xFF).toByte
    tag(18) = 0; tag(19) = 0 // frame flags
    tag(20) = 0 // ISO-8859-1 text encoding
    var i = 0
    while (i < titleLen) { tag(21 + i) = ('A' + (titleLen + i) % 26).toByte; i += 1 }
    tag ++ mp3Stream(bitrateIdx, rateIdx, nFrames)
  }

  /** Walk an ID3v2-tagged MP3: validate the ID3 header, decode the
    * syncsafe size (REJECTING any size byte with its high bit set —
    * the corruption the 7-bit encoding exists to make detectable),
    * validate the single TIT2 frame fills the tag body exactly, then
    * hand the remainder to [[parseMp3]]'s sync walk. Returns
    * (tag_bytes, title_len, bitrate_kbps, sample_rate, n_frames). */
  private[graft] def parseId3Mp3(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (bytes.length < 21) return None
    if (bytes(0) != 'I' || bytes(1) != 'D' || bytes(2) != '3') return None
    if (bytes(3) != 3 || bytes(4) != 0 || bytes(5) != 0) return None
    var size = 0
    var i = 6
    while (i < 10) {
      val b = bytes(i) & 0xFF
      if ((b & 0x80) != 0) return None // syncsafe bytes carry 7 bits
      size = (size << 7) | b
      i += 1
    }
    val tagEnd = 10 + size
    if (tagEnd > bytes.length) return None
    if (bytes(10) != 'T' || bytes(11) != 'I' || bytes(12) != 'T' || bytes(13) != '2')
      return None
    val frameBody = ((bytes(14) & 0xFF) << 24) | ((bytes(15) & 0xFF) << 16) |
      ((bytes(16) & 0xFF) << 8) | (bytes(17) & 0xFF)
    if (bytes(18) != 0 || bytes(19) != 0) return None
    if (10 + frameBody != size) return None // the one frame fills the body
    if (bytes(20) != 0) return None // ISO-8859-1 only
    parseMp3(java.util.Arrays.copyOfRange(bytes, tagEnd, bytes.length))
      .map { case (kbps, rate, n) => (tagEnd, frameBody - 1, kbps, rate, n) }
  }

  /** ID3v2 tag walk over tagged MP3s — the twelfth container leg, and
    * the only one exercising SYNCSAFE integers (ID3's 7-bit size
    * bytes): hash-derived title/stream parameters → a real v2.3 tag +
    * Layer III stream → the walker re-derives tag size, title length
    * and audio parameters from the bytes alone. The oracle replays the
    * parameters and the 21+titleLen tag arithmetic analytically. */
  val id3Meta: GraftOp = GraftOp(
    "mm_id3_meta",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(5 + ${Exprs.sqlMd5Long("text")} % 20 AS INT) AS title_len,
       |    CAST(1 + (${Exprs.sqlMd5Long("text")} >> 2) % 14 AS INT) AS b_idx,
       |    CAST((${Exprs.sqlMd5Long("text")} >> 4) % 3 AS INT) AS r_idx,
       |    CAST(20 + (${Exprs.sqlMd5Long("text")} >> 6) % 100 AS INT) AS n_frames
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(21 + title_len AS INT) AS tag_bytes, title_len,
       |  CAST(list_extract([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320], b_idx) AS INT) AS bitrate_kbps,
       |  CAST(list_extract([44100, 48000, 32000], r_idx + 1) AS INT) AS sample_rate,
       |  n_frames
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    val params = Tables.documents(s, d)
      .select(col("doc_id"),
        (lit(5) + h % 20).cast(IntegerType).as("title_len"),
        (lit(1) + shiftright(h, 2) % 14).cast(IntegerType).as("b_idx"),
        (shiftright(h, 4) % 3).cast(IntegerType).as("r_idx"),
        (lit(20) + shiftright(h, 6) % 100).cast(IntegerType).as("n_frames"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("tag_bytes", IntegerType),
      StructField("title_len", IntegerType),
      StructField("bitrate_kbps", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    params.mapPartitions { rows =>
      rows.map { r =>
        val stream = id3Mp3Stream(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
        val (tagBytes, titleLen, kbps, rate, n) = parseId3Mp3(stream).getOrElse(
          throw new IllegalStateException(s"unparseable planted ID3 MP3 for doc ${r.getLong(0)}"))
        Row(r.getLong(0), tagBytes, titleLen, kbps, rate, n)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a REAL FLAC header: "fLaC" magic + a last-flagged
    * STREAMINFO metadata block with the genuine big-endian bit
    * packing (16+16 blocksizes, 24+24 framesizes, then the 64-bit
    * rate(20)|channels-1(3)|bps-1(5)|totalSamples(36) group, 16-byte
    * zero MD5). */
  private[graft] def flacHeader(sampleRate: Int, channels: Int, bps: Int,
      totalSamples: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 34)
    bb.put("fLaC".getBytes("US-ASCII"))
    bb.put((0x80).toByte) // last-metadata-block | type 0 (STREAMINFO)
    bb.put(0.toByte).put(0.toByte).put(34.toByte) // 24-bit length
    bb.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // min framesize (unknown)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // max framesize (unknown)
    val group = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | (totalSamples & 0xFFFFFFFFFL)
    bb.putLong(group)
    bb.put(new Array[Byte](16)) // md5 of raw audio (zeros: unknown)
    bb.array()
  }

  /** Parse a FLAC STREAMINFO header: (sampleRate, channels, bps,
    * totalSamples), or None when magic/type/length don't check out. */
  private[graft] def parseFlacHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes.length < 42) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); bb.get(magic)
    if (new String(magic, "US-ASCII") != "fLaC") return None
    val header = bb.get()
    if ((header & 0x7F) != 0) return None // STREAMINFO must be type 0
    val len = ((bb.get() & 0xFF) << 16) | ((bb.get() & 0xFF) << 8) | (bb.get() & 0xFF)
    if (len != 34) return None
    bb.getShort; bb.getShort // blocksizes
    bb.position(bb.position() + 6) // framesizes
    val group = bb.getLong
    val rate = (group >>> 44).toInt
    val channels = ((group >>> 41) & 0x7).toInt + 1
    val bps = ((group >>> 36) & 0x1F).toInt + 1
    val total = group & 0xFFFFFFFFFL
    Some((rate, channels, bps, total))
  }

  /** FLAC STREAMINFO walk — the tenth container leg (lossless-audio
    * metadata): hash-derived parameters → genuine fLaC magic +
    * bit-packed STREAMINFO → parsed back field by field. The 20/3/5/36
    * bit group exercises sub-byte big-endian packing no other leg
    * does. Oracle replays the parameters analytically. */
  val flacMeta: GraftOp = GraftOp(
    "mm_flac_meta",
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(list_extract([8000, 16000, 22050, 44100, 48000, 96000],
       |      CAST(1 + ${Exprs.sqlMd5Long("text")} % 6 AS INT)) AS INT) AS sample_rate,
       |    CAST(1 + (${Exprs.sqlMd5Long("text")} >> 3) % 2 AS INT) AS channels,
       |    CAST(CASE WHEN (${Exprs.sqlMd5Long("text")} >> 5) % 2 = 0 THEN 16 ELSE 24 END AS INT) AS bps,
       |    CAST(10000 + (${Exprs.sqlMd5Long("text")} >> 7) % 100000 AS BIGINT) AS total_samples
       |  FROM documents)
       |SELECT doc_id, sample_rate, channels, bps, total_samples,
       |  total_samples * 1000 // sample_rate AS duration_ms
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    val rates = Array(8000, 16000, 22050, 44100, 48000, 96000)
    val params = Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(lit(rates), (lit(1) + h % 6).cast(IntegerType)).as("sample_rate"),
        (lit(1) + shiftright(h, 3) % 2).cast(IntegerType).as("channels"),
        when(shiftright(h, 5) % 2 === 0, 16).otherwise(24).as("bps"),
        (lit(10000L) + shiftright(h, 7) % 100000).cast(LongType).as("total_samples"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bps", IntegerType),
      StructField("total_samples", LongType),
      StructField("duration_ms", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    params.mapPartitions { rows =>
      rows.map { r =>
        val header = flacHeader(r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
        val (rate, ch, bps, total) = parseFlacHeader(header).getOrElse(
          throw new IllegalStateException(s"unparseable planted FLAC for doc ${r.getLong(0)}"))
        Row(r.getLong(0), rate, ch, bps, total, total * 1000 / rate)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a REAL Exif APP1 segment inside a minimal JPEG: SOI, APP1
    * ("Exif\0\0" + TIFF header in the REQUESTED byte order + IFD0 with
    * Orientation/PixelXDimension/PixelYDimension entries), EOI. SHORT
    * values are left-justified in their 4-byte field per the TIFF
    * spec — the byte-order-dependent detail the parser must honor. */
  private[graft] def exifJpeg(littleEndian: Boolean, orientation: Int,
      pixX: Int, pixY: Int): Array[Byte] = {
    val order = if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
                else java.nio.ByteOrder.BIG_ENDIAN
    val tiff = java.nio.ByteBuffer.allocate(8 + 2 + 3 * 12 + 4).order(order)
    tiff.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    tiff.putShort(42.toShort)
    tiff.putInt(8) // IFD0 right after the header
    tiff.putShort(3.toShort) // entry count
    // entries must be tag-sorted: 0x0112 < 0xA002 < 0xA003
    tiff.putShort(0x0112.toShort).putShort(3.toShort).putInt(1) // Orientation SHORT
    tiff.putShort(orientation.toShort).putShort(0.toShort)      // left-justified value
    tiff.putShort(0xA002.toShort).putShort(4.toShort).putInt(1).putInt(pixX) // LONG
    tiff.putShort(0xA003.toShort).putShort(4.toShort).putInt(1).putInt(pixY) // LONG
    tiff.putInt(0) // no next IFD
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff.array()
    val out = java.nio.ByteBuffer.allocate(2 + 4 + payload.length + 2)
    out.put(0xFF.toByte).put(0xD8.toByte) // SOI
    out.put(0xFF.toByte).put(0xE1.toByte) // APP1
    out.putShort((payload.length + 2).toShort) // segment length incl. itself (BE)
    out.put(payload)
    out.put(0xFF.toByte).put(0xD9.toByte) // EOI
    out.array()
  }

  /** Parse Exif out of a JPEG marker stream: find APP1/"Exif", read
    * the TIFF header's byte order, walk IFD0, return
    * (byteOrder, orientation, pixX, pixY) — SHORT reads honor the
    * left-justified value-field rule. */
  private[graft] def parseExif(bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None
      val marker = bytes(i + 1) & 0xFF
      if (marker == 0xD9) return None // EOI before APP1
      val segLen = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
      if (marker == 0xE1 && segLen >= 8 &&
          new String(bytes, i + 4, 4, "US-ASCII") == "Exif") {
        val t0 = i + 10 // TIFF header start (skip Exif\0\0)
        val bo = new String(bytes, t0, 2, "US-ASCII")
        val le = bo match {
          case "II" => true
          case "MM" => false
          case _ => return None
        }
        def u16(o: Int): Int =
          if (le) (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
          else ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
        def u32(o: Int): Int =
          if (le) (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
            ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
          else ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
            ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
        if (u16(t0 + 2) != 42) return None
        val ifd = t0 + u32(t0 + 4)
        val n = u16(ifd)
        var (ori, px, py) = (-1, -1, -1)
        var e = 0
        while (e < n) {
          val eo = ifd + 2 + e * 12
          val tag = u16(eo)
          val typ = u16(eo + 2)
          val vo = eo + 8
          tag match {
            case 0x0112 if typ == 3 => ori = u16(vo) // SHORT, left-justified
            case 0xA002 if typ == 4 => px = u32(vo)
            case 0xA003 if typ == 4 => py = u32(vo)
            case _ =>
          }
          e += 1
        }
        if (ori < 0 || px < 0 || py < 0) return None
        return Some((bo, ori, px, py))
      }
      i += 2 + segLen
    }
    None
  }

  /** EXIF orientation + pixel dimensions — the eleventh container
    * leg, and the only one where BYTE ORDER is data-dependent: half
    * the corpus plants "II" TIFF headers, half "MM", and the IFD
    * walker must honor each (including the left-justified SHORT
    * value-field rule). This is the metadata image pipelines actually
    * read before any decode (auto-rotation, thumbnail sizing). */
  val exifMeta: GraftOp = GraftOp(
    "mm_exif_meta",
    s"""WITH m AS (SELECT doc_id, ${Exprs.sqlMd5Long("text")} AS h FROM documents)
       |SELECT doc_id,
       |  CASE WHEN h % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
       |  CAST(1 + (h >> 1) % 8 AS INT) AS orientation,
       |  CAST(16 + (h >> 4) % 1024 AS INT) AS pix_x,
       |  CAST(16 + (h >> 14) % 1024 AS INT) AS pix_y
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = Exprs.md5Long(col("text"))
    val params = Tables.documents(s, d)
      .select(col("doc_id"),
        (h % 2 === 0).as("le"),
        (lit(1) + shiftright(h, 1) % 8).cast(IntegerType).as("orientation"),
        (lit(16) + shiftright(h, 4) % 1024).cast(IntegerType).as("pix_x"),
        (lit(16) + shiftright(h, 14) % 1024).cast(IntegerType).as("pix_y"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_order", StringType),
      StructField("orientation", IntegerType),
      StructField("pix_x", IntegerType),
      StructField("pix_y", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    params.mapPartitions { rows =>
      rows.map { r =>
        val jpeg = exifJpeg(r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4))
        val (bo, ori, px, py) = parseExif(jpeg).getOrElse(
          throw new IllegalStateException(s"unwalkable planted Exif for doc ${r.getLong(0)}"))
        Row(r.getLong(0), bo, ori, px, py)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a RIFF/WEBP container: VP8X extended header (24-bit LE
    * canvas minus-one fields), an optional EXIF chunk, and a VP8L
    * chunk whose lossless bitstream header (0x2f signature + 14-bit
    * minus-one dims) REPEATS the canvas size — the redundancy real
    * demuxers cross-check. Odd-sized chunk payloads get the RIFF pad
    * byte, which no other container leg exercises. */
  private[graft] def syntheticWebp(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 16).toInt
    val h = 8 + ((docId / 16) % 16).toInt
    val hasExif = docId % 3 == 0
    val exifLen = 8 + (docId % 8).toInt
    val vp8lLen = 5 + (docId % 32).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    def chunk(cc: String, payload: Array[Byte]): Unit = {
      fourcc(cc); le32(payload.length); bos.write(payload)
      if (payload.length % 2 == 1) bos.write(0) // RIFF even-padding rule
    }
    val riffSize = 4 + 18 +
      (if (hasExif) 8 + exifLen + exifLen % 2 else 0) + 8 + vp8lLen + vp8lLen % 2
    fourcc("RIFF"); le32(riffSize); fourcc("WEBP")
    val vp8x = new Array[Byte](10)
    vp8x(0) = (if (hasExif) 0x08 else 0x00).toByte // EXIF flag bit
    vp8x(4) = ((w - 1) & 0xff).toByte; vp8x(5) = (((w - 1) >> 8) & 0xff).toByte
    vp8x(6) = (((w - 1) >> 16) & 0xff).toByte
    vp8x(7) = ((h - 1) & 0xff).toByte; vp8x(8) = (((h - 1) >> 8) & 0xff).toByte
    vp8x(9) = (((h - 1) >> 16) & 0xff).toByte
    chunk("VP8X", vp8x)
    if (hasExif) {
      val exif = Array.tabulate[Byte](exifLen)(i => ((docId + i) % 251).toByte)
      chunk("EXIF", exif)
    }
    val vp8l = new Array[Byte](vp8lLen)
    vp8l(0) = 0x2f // VP8L signature
    val dims = (w - 1) | ((h - 1) << 14) // 14-bit minus-one fields, version 0
    vp8l(1) = (dims & 0xff).toByte; vp8l(2) = ((dims >> 8) & 0xff).toByte
    vp8l(3) = ((dims >> 16) & 0xff).toByte; vp8l(4) = ((dims >> 24) & 0xff).toByte
    var i = 5
    while (i < vp8lLen) { vp8l(i) = ((docId * 7 + i) % 253).toByte; i += 1 }
    chunk("VP8L", vp8l)
    bos.toByteArray
  }

  /** Walk a RIFF/WEBP container: verify the RIFF magic, the WEBP form
    * type, and that the declared RIFF size is exactly file−8; iterate
    * chunks fourCC-first honoring the odd-payload pad byte; require a
    * leading VP8X, read its 24-bit LE canvas; on VP8L verify the 0x2f
    * signature and that the bitstream's 14-bit dims REPEAT the canvas.
    * Returns (width, height, nChunks, hasExif, payloadBytes); None on
    * any structural lie (bad magic, size mismatch, truncation,
    * canvas/bitstream disagreement). */
  private[graft] def parseWebpMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Boolean, Long)] = {
    if (bytes.length < 30) return None
    if (new String(bytes, 0, 4, "US-ASCII") != "RIFF") return None
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (le32(4) != bytes.length - 8) return None
    if (new String(bytes, 8, 4, "US-ASCII") != "WEBP") return None
    var i = 12
    var (w, h) = (-1, -1)
    var nChunks = 0
    var hasExif = false
    var payload = 0L
    while (i < bytes.length) {
      if (i + 8 > bytes.length) return None // truncated chunk header
      val cc = new String(bytes, i, 4, "US-ASCII")
      val len = le32(i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      cc match {
        case "VP8X" =>
          if (nChunks != 0 || len != 10) return None // must lead, fixed size
          hasExif = (bytes(i + 8) & 0x08) != 0
          w = 1 + ((bytes(i + 12) & 0xff) | ((bytes(i + 13) & 0xff) << 8) |
            ((bytes(i + 14) & 0xff) << 16))
          h = 1 + ((bytes(i + 15) & 0xff) | ((bytes(i + 16) & 0xff) << 8) |
            ((bytes(i + 17) & 0xff) << 16))
        case "VP8L" =>
          if (len < 5 || bytes(i + 8) != 0x2f) return None
          val dims = le32(i + 9)
          if (1 + (dims & 0x3fff) != w || 1 + ((dims >> 14) & 0x3fff) != h) return None
        case "EXIF" => // presence must match the VP8X flag, checked below
        case _ => return None // unknown chunk: malformed for this corpus
      }
      nChunks += 1
      payload += len
      i += 8 + len + len % 2
    }
    if (w < 0 || nChunks < 2) return None
    Some((w, h, nChunks, hasExif, payload))
  }

  /** WebP/RIFF structural metadata — thirteenth container leg, and the
    * only RIFF-chunked one (WAV shares the family but mm_wav_meta
    * walks a flat fmt/data layout): VP8X extended header, conditional
    * EXIF chunk driven by the id rule, VP8L lossless bitstream whose
    * 14-bit dims must REPEAT the canvas (the cross-check real demuxers
    * run), and odd-payload pad bytes that the size arithmetic must
    * honor. The oracle predicts dims, chunk count, and total payload
    * bytes from the same id math — hash-match proves the build→walk
    * round trip including the pad rule. Build+walk in one
    * mapPartitions, zero shuffle. */
  val webpMeta: GraftOp = GraftOp(
    "mm_webp_meta",
    """SELECT doc_id,
      |  CAST(8 + doc_id % 16 AS INT) AS width,
      |  CAST(8 + (doc_id // 16) % 16 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS INT) AS n_chunks,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS has_exif,
      |  CAST(10 + CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 8 ELSE 0 END
      |       + 5 + doc_id % 32 AS BIGINT) AS payload_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_chunks", IntegerType),
      StructField("has_exif", IntegerType), StructField("payload_bytes", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (w, h, nc, exif, payload) = parseWebpMeta(syntheticWebp(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted WebP for doc $docId"))
        Row(docId, w, h, nc, if (exif) 1 else 0, payload)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Ogg page CRC: polynomial 0x04C11DB7, MSB-first (NON-reflected),
    * init 0, no final xor — deliberately different from zlib's
    * reflected CRC-32, which is why real demuxers can't reuse their
    * zlib table here. Computed over the page with the CRC field
    * zeroed. */
  private[graft] def oggCrc(bytes: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc = crc ^ ((bytes(i) & 0xff) << 24)
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7 else crc << 1
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Build a 2-page Ogg stream: a BOS page carrying one small packet
    * and an EOS page whose packet length crosses the 255-byte lacing
    * boundary — the segment-table encoding (⌊L/255⌋ 255-values + a
    * (L mod 255) terminator, INCLUDING the 0 terminator when L is an
    * exact multiple of 255, which docId%300==55 plants) is the one
    * framing rule no other container leg exercises. Each page carries
    * the real Ogg CRC; the final granule position repeats the total
    * packet byte count (this corpus's cross-check, in the VP8L-dims
    * spirit). */
  private[graft] def syntheticOgg(docId: Long): Array[Byte] = {
    val p1 = 30 + (docId % 10).toInt
    val p2 = 200 + (docId % 300).toInt
    val serial = (docId % 1000 + 1).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def page(headerType: Int, granule: Long, seq: Int, packetLen: Int): Unit = {
      val lacing = new java.io.ByteArrayOutputStream()
      var rest = packetLen
      while (rest >= 255) { lacing.write(255); rest -= 255 }
      lacing.write(rest) // terminator, 0 when packetLen % 255 == 0
      val lac = lacing.toByteArray
      val head = java.nio.ByteBuffer.allocate(27 + lac.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.put("OggS".getBytes("US-ASCII")).put(0.toByte)
        .put(headerType.toByte).putLong(granule).putInt(serial).putInt(seq)
        .putInt(0) // CRC placeholder
        .put(lac.length.toByte).put(lac)
      val payload = Array.tabulate[Byte](packetLen)(i => ((docId * 11 + i) % 251).toByte)
      val full = head.array() ++ payload
      val crc = oggCrc(full)
      full(22) = (crc & 0xff).toByte; full(23) = ((crc >> 8) & 0xff).toByte
      full(24) = ((crc >> 16) & 0xff).toByte; full(25) = ((crc >> 24) & 0xff).toByte
      bos.write(full)
    }
    page(0x02, 0L, 0, p1)                   // BOS
    page(0x04, (p1 + p2).toLong, 1, p2)     // EOS, granule = total bytes
    bos.toByteArray
  }

  /** Walk an Ogg stream: verify every page's capture pattern, version
    * 0, the recomputed CRC (field zeroed), lacing-sum-vs-available
    * truncation, BOS exactly on the first page, EOS exactly on the
    * last, a constant serial, and gapless sequence numbers; count
    * packets by lacing TERMINATORS (values < 255 — a 255 continues
    * the packet), and require the final granule to repeat the total
    * packet byte count. Returns (nPages, nPackets, serial,
    * payloadBytes, granule); None on any structural lie. */
  private[graft] def parseOggMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    var i = 0
    var nPages = 0
    var nPackets = 0
    var serial = Int.MinValue
    var payload = 0L
    var granule = -1L
    var sawEos = false
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    while (i < bytes.length) {
      if (sawEos) return None // trailing bytes after the EOS page
      if (i + 27 > bytes.length) return None
      if (new String(bytes, i, 4, "US-ASCII") != "OggS") return None
      if (bytes(i + 4) != 0) return None // stream structure version
      val headerType = bytes(i + 5) & 0xff
      var g = 0L
      var k = 7
      while (k >= 0) { g = (g << 8) | (bytes(i + 6 + k) & 0xff); k -= 1 }
      val ser = le32(i + 14)
      val seq = le32(i + 18)
      val nSeg = bytes(i + 26) & 0xff
      if (i + 27 + nSeg > bytes.length) return None
      var bodyLen = 0
      var packetsHere = 0
      var s = 0
      while (s < nSeg) {
        val lace = bytes(i + 27 + s) & 0xff
        bodyLen += lace
        if (lace < 255) packetsHere += 1
        s += 1
      }
      if (i + 27 + nSeg + bodyLen > bytes.length) return None
      // CRC check: recompute with the CRC field zeroed
      val pageLen = 27 + nSeg + bodyLen
      val copy = java.util.Arrays.copyOfRange(bytes, i, i + pageLen)
      val stored = le32(i + 22)
      copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
      if (oggCrc(copy) != stored) return None
      if (nPages == 0) {
        if ((headerType & 0x02) == 0) return None // first page must be BOS
        serial = ser
      } else {
        if ((headerType & 0x02) != 0) return None // BOS only leads
        if (ser != serial) return None            // single logical stream
      }
      if (seq != nPages) return None // gapless page sequence
      if ((headerType & 0x04) != 0) sawEos = true
      nPages += 1
      nPackets += packetsHere
      payload += bodyLen
      granule = g
      i += pageLen
    }
    if (nPages == 0 || !sawEos) return None
    if (granule != payload) return None // corpus rule: granule repeats bytes
    Some((nPages, nPackets, serial, payload, granule))
  }

  /** Ogg page walk — fourteenth container leg, and the only one
    * exercising LACING-VALUE packet framing (255-continuation bytes
    * with an explicit terminator, including the 0-terminator for
    * exact multiples) and a NON-reflected CRC-32 the zlib table
    * cannot serve. The oracle replays page count, packet count,
    * serial, payload bytes, and the granule cross-check analytically
    * from the id rule; the walker rejects bad magic, CRC lies, lacing
    * truncation, sequence gaps, misplaced BOS/EOS, and
    * granule/byte-count disagreement (spec-pinned). Build+walk in one
    * mapPartitions, zero shuffle. */
  val oggMeta: GraftOp = GraftOp(
    "mm_ogg_meta",
    """SELECT doc_id,
      |  CAST(2 AS INT) AS n_pages,
      |  CAST(2 AS INT) AS n_packets,
      |  CAST(doc_id % 1000 + 1 AS INT) AS serial,
      |  CAST(230 + doc_id % 10 + doc_id % 300 AS BIGINT) AS payload_bytes,
      |  CAST(230 + doc_id % 10 + doc_id % 300 AS BIGINT) AS granule
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pages", IntegerType),
      StructField("n_packets", IntegerType), StructField("serial", IntegerType),
      StructField("payload_bytes", LongType), StructField("granule", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (np, nk, ser, payload, granule) = parseOggMeta(syntheticOgg(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted Ogg for doc $docId"))
        Row(docId, np, nk, ser, payload, granule)
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** Build a minimal AVI: RIFF 'AVI ' with a LIST('hdrl'){avih} header,
    * a LIST('movi') of '00dc' frame chunks (odd payload sizes exercise
    * the RIFF pad rule inside a NESTED list), and an idx1 index whose
    * entries must agree one-to-one with the walked frames — the
    * index-vs-data cross-check no other container leg has. */
  private[graft] def syntheticAvi(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 32).toInt
    val h = 16 + ((docId / 32) % 32).toInt
    val nf = 2 + (docId % 5).toInt
    val uspf = 33333 + (docId % 1000).toInt
    val frameLens = Array.tabulate(nf)(i => 5 + ((docId + i) % 9).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    val moviPayload = 4 + frameLens.map(l => 8 + l + l % 2).sum
    val riffSize = 4 + (8 + 68) + (8 + moviPayload) + 8 + 16 * nf
    fourcc("RIFF"); le32(riffSize); fourcc("AVI ")
    // LIST hdrl { avih(56) }
    fourcc("LIST"); le32(68); fourcc("hdrl")
    fourcc("avih"); le32(56)
    val avih = new Array[Byte](56)
    def put32(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = (v & 0xff).toByte; arr(off + 1) = ((v >> 8) & 0xff).toByte
      arr(off + 2) = ((v >> 16) & 0xff).toByte; arr(off + 3) = ((v >> 24) & 0xff).toByte
    }
    put32(avih, 0, uspf); put32(avih, 16, nf); put32(avih, 32, w); put32(avih, 36, h)
    bos.write(avih)
    // LIST movi { nf x 00dc }
    fourcc("LIST"); le32(moviPayload); fourcc("movi")
    val offsets = new Array[Int](nf)
    var moviOff = 4 // offsets are idx1-style: relative to the 'movi' fourcc
    frameLens.zipWithIndex.foreach { case (l, i) =>
      offsets(i) = moviOff
      fourcc("00dc"); le32(l)
      bos.write(Array.tabulate[Byte](l)(j => ((docId * 13 + i * 7 + j) % 251).toByte))
      if (l % 2 == 1) bos.write(0)
      moviOff += 8 + l + l % 2
    }
    // idx1
    fourcc("idx1"); le32(16 * nf)
    frameLens.zipWithIndex.foreach { case (l, i) =>
      fourcc("00dc"); le32(0x10); le32(offsets(i)); le32(l)
    }
    bos.toByteArray
  }

  /** Walk an AVI container: RIFF magic + 'AVI ' form type + declared
    * size == file−8; LIST('hdrl') must lead and carry a 56-byte avih
    * (µs/frame, total frames, width, height at their fixed offsets);
    * LIST('movi') frames are counted and summed honoring the odd-pad
    * rule; idx1 must exist with exactly one entry per walked frame,
    * each entry's ckid/offset/size matching the frame it indexes.
    * Returns (width, height, nFrames, usPerFrame, payloadBytes); None
    * on any structural lie (bad magic, size lie, truncation, missing
    * header, frame-count or index disagreement). */
  private[graft] def parseAviMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def cc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    if (le32(4) != bytes.length - 8) return None
    var i = 12
    var w = -1; var h = -1; var nfHdr = -1; var uspf = -1
    var framesWalked = 0
    var payload = 0L
    var frameIdx = List.empty[(Int, Int)] // (offset-from-movi, size), walked order
    var sawIdx1 = false
    var idxOk = true
    while (i + 8 <= bytes.length) {
      val id = cc(i)
      val sz = le32(i + 4)
      if (i + 8 + sz > bytes.length) return None
      id match {
        case "LIST" if sz >= 4 && cc(i + 8) == "hdrl" =>
          // first subchunk must be the 56-byte avih
          if (sz < 4 + 8 + 56 || cc(i + 12) != "avih" || le32(i + 16) != 56) return None
          uspf = le32(i + 20); nfHdr = le32(i + 36); w = le32(i + 52); h = le32(i + 56)
        case "LIST" if sz >= 4 && cc(i + 8) == "movi" =>
          var j = i + 12
          val end = i + 8 + sz
          while (j + 8 <= end) {
            if (cc(j) != "00dc") return None
            val fl = le32(j + 4)
            if (j + 8 + fl > end) return None
            frameIdx ::= ((j - (i + 8), fl))
            framesWalked += 1
            payload += fl
            j += 8 + fl + fl % 2
          }
          if (j != end) return None
        case "idx1" =>
          if (sz % 16 != 0) return None
          sawIdx1 = true
          val entries = sz / 16
          if (entries != framesWalked) idxOk = false
          val walked = frameIdx.reverse.toArray
          var e = 0
          while (e < entries && idxOk) {
            val o = i + 8 + e * 16
            if (cc(o) != "00dc" || (le32(o + 4) & 0x10) == 0 ||
              e >= walked.length || le32(o + 8) != walked(e)._1 ||
              le32(o + 12) != walked(e)._2) idxOk = false
            e += 1
          }
        case _ => return None
      }
      i += 8 + sz + sz % 2
    }
    if (i != bytes.length) return None
    if (w < 0 || nfHdr != framesWalked || !sawIdx1 || !idxOk) return None
    Some((w, h, framesWalked, uspf, payload))
  }

  /** AVI / RIFF-AVI walk — fifteenth container leg: the only one with
    * a NESTED LIST hierarchy and an index chunk (idx1) that must agree
    * entry-by-entry with the data it indexes — the header-vs-payload
    * cross-check a video ingest pipeline runs before trusting a
    * container's own frame count. The oracle replays width, height,
    * frame count, µs/frame, and the summed frame bytes analytically
    * from the id rule; the walker rejects bad magic, size lies,
    * truncation, and any index/data disagreement (spec-pinned).
    * Build+walk in one mapPartitions pass, zero shuffle. */
  val aviMeta: GraftOp = GraftOp(
    "mm_avi_meta",
    """SELECT doc_id,
      |  CAST(16 + doc_id % 32 AS INT) AS width,
      |  CAST(16 + (doc_id // 32) % 32 AS INT) AS height,
      |  CAST(2 + doc_id % 5 AS INT) AS n_frames,
      |  CAST(33333 + doc_id % 1000 AS INT) AS us_per_frame,
      |  CAST(list_sum(list_transform(range(2 + doc_id % 5),
      |    i -> 5 + (doc_id + i) % 9)) AS BIGINT) AS payload_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_frames", IntegerType),
      StructField("us_per_frame", IntegerType), StructField("payload_bytes", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (w, h, nf, uspf, payload) = parseAviMeta(syntheticAvi(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted AVI for doc $docId"))
        Row(docId, w, h, nf, uspf, payload)
      }
    }(enc).orderBy(col("doc_id"))
  }

  val ops: Seq[GraftOp] = Seq(meta, decode, chunk, sniff, frameSample, wavMeta, imagePhash, imageNearDup, audioEnergy, mp4Meta, jpegMeta, pngChunks, gifMeta, bmpMeta, tarMeta, zipMeta, pdfMeta, containerCensus, mp3Meta, flacMeta, exifMeta, id3Meta, webpMeta, oggMeta, aviMeta)
}
