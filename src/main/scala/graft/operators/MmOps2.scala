package graft.operators

import graft.GraftOp
import graft.sources.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Container legs fifteen and sixteen (round 9, continued): the ICO
  * icon directory (a DIRECTORY-of-offsets format — the walker's
  * cross-check is that every directory entry's offset/length tiles the
  * file exactly, the multi-image sibling of AVI's idx1-vs-movi check)
  * and big-endian IFF AIFF (the only leg whose header carries an
  * 80-bit IEEE-754 EXTENDED float — the sample rate — decoded with
  * integer shifts, no floating point).
  *
  * Same contract as the [[MmOps]] legs: deterministic synthetic blob
  * per doc_id, a STRICT walker that rejects structural lies
  * (spec-pinned), build+walk fused in one mapPartitions (zero
  * shuffle, no blob materialization beyond the row), and an oracle
  * that replays the emitted metadata ANALYTICALLY from the id rule —
  * so the whole parse path is hash-checked. */
object MmOps2 {

  // ---------------------------------------------------------------- ICO

  /** Minimal multi-image ICO: ICONDIR(6) + n×ICONDIRENTRY(16) +
    * contiguous fake image payloads. Entry i: square side
    * 16·2^((docId+i) mod 3) (encoded 0 for none here — sides stay
    * ≤64), 32 bpp, payload 40 + 4·side bytes. */
  private[graft] def syntheticIco(docId: Long): Array[Byte] = {
    val n = 1 + (docId % 4).toInt
    val sides = Array.tabulate(n)(i => 16 << ((docId + i) % 3).toInt)
    val lens = sides.map(s => 40 + 4 * s)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    le16(0); le16(1); le16(n) // reserved, type=icon, count
    var off = 6 + 16 * n
    var i = 0
    while (i < n) {
      bos.write(sides(i) & 0xff); bos.write(sides(i) & 0xff) // width, height
      bos.write(0); bos.write(0)                             // palette, reserved
      le16(1); le16(32)                                      // planes, bpp
      le32(lens(i)); le32(off)
      off += lens(i)
      i += 1
    }
    sides.zipWithIndex.foreach { case (s, i) =>
      bos.write(Array.tabulate[Byte](lens(i))(j => ((docId * 17 + i * 11 + j) % 251).toByte))
    }
    bos.toByteArray
  }

  /** Walk an ICO directory → (nImages, maxSide, totalImageBytes);
    * None on any structural lie: bad magic/type, zero entries,
    * non-zero reserved fields, non-contiguous or out-of-file payload
    * offsets, trailing bytes. */
  private[graft] def parseIcoMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes.length < 6) return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (le16(o) | (le16(o + 2).toLong << 16)) & 0xffffffffL
    if (le16(0) != 0 || le16(2) != 1) return None
    val n = le16(4)
    if (n < 1 || bytes.length < 6 + 16 * n) return None
    var expectOff = (6 + 16 * n).toLong
    var maxSide = 0
    var total = 0L
    var i = 0
    while (i < n) {
      val e = 6 + 16 * i
      val side = bytes(e) & 0xff
      if (side != (bytes(e + 1) & 0xff)) return None // non-square lie
      if (bytes(e + 3) != 0) return None             // reserved
      if (le16(e + 4) != 1) return None              // planes
      val len = le32(e + 8)
      val off = le32(e + 12)
      if (off != expectOff) return None // directory must tile the file
      expectOff += len
      total += len
      val real = if (side == 0) 256 else side
      if (real > maxSide) maxSide = real
      i += 1
    }
    if (expectOff != bytes.length.toLong) return None // trailing bytes
    Some((n, maxSide, total))
  }

  /** ICO directory walk — the offset-directory format: the walker
    * proves the n ICONDIRENTRY records tile the payload region
    * exactly (offset chain + total length), the analytic oracle
    * replays count, max side and payload bytes from the id rule by
    * expanding entries with a bounded generate_series. */
  val icoMeta: GraftOp = GraftOp(
    "mm_ico_meta",
    """WITH e AS (
      |  SELECT doc_id, i.i AS i,
      |    CASE (doc_id + i.i) % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END AS side
      |  FROM documents, generate_series(0, 3) i(i)
      |  WHERE i.i < 1 + doc_id % 4)
      |SELECT doc_id,
      |  CAST(count(*) AS INT) AS n_images,
      |  CAST(max(side) AS INT) AS max_side,
      |  CAST(sum(40 + 4 * side) AS BIGINT) AS total_image_bytes
      |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_images", IntegerType),
      StructField("max_side", IntegerType), StructField("total_image_bytes", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (n, side, total) = parseIcoMeta(syntheticIco(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted ICO for doc $docId"))
        Row(docId, n, side, total)
      }
    }(enc).orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------- AIFF

  private val AiffRates = Array(8000, 11025, 22050, 44100)

  /** Minimal AIFF: FORM/AIFF + COMM(18) with the sample rate as an
    * 80-bit extended float + SSND carrying frames×channels×bytes of
    * deterministic samples (odd totals exercise the IFF pad rule). */
  private[graft] def syntheticAiff(docId: Long): Array[Byte] = {
    val channels = 1 + (docId % 2).toInt
    val rate = AiffRates((docId % 4).toInt)
    val frames = 100 + (docId % 50).toInt
    val bits = if ((docId / 4) % 2 == 0) 8 else 16
    val dataLen = frames * channels * (bits / 8)
    val bos = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xffff); be16(v & 0xffff) }
    val ssndChunk = 8 + 8 + dataLen + (dataLen % 2) // header + offset/block + data + pad
    val formSize = 4 + (8 + 18) + ssndChunk
    fourcc("FORM"); be32(formSize); fourcc("AIFF")
    fourcc("COMM"); be32(18)
    be16(channels); be32(frames); be16(bits)
    // 80-bit extended float: 1-bit sign, 15-bit exponent (bias 16383),
    // 64-bit mantissa with EXPLICIT leading 1
    val p = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    be16(16383 + p.toInt)
    val mant = rate.toLong << (63 - p)
    var k = 56
    while (k >= 0) { bos.write(((mant >>> k) & 0xff).toInt); k -= 8 }
    fourcc("SSND"); be32(8 + dataLen)
    be32(0); be32(0) // offset, block size
    bos.write(Array.tabulate[Byte](dataLen)(j => ((docId * 7 + j) % 251).toByte))
    if (dataLen % 2 == 1) bos.write(0) // IFF pad byte
    bos.toByteArray
  }

  /** Walk an AIFF FORM → (channels, sampleRate, nFrames, sampleBits);
    * the 80-bit rate decodes with integer shifts only. None on bad
    * magic, short/oversized chunks, an unnormalized or fractional
    * rate, SSND/COMM size lies, missing pad, or trailing bytes. */
  private[graft] def parseAiffMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def be16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def be32(o: Int): Long = ((be16(o).toLong << 16) | be16(o + 2)) & 0xffffffffL
    if (bytes.length < 12) return None
    if (new String(bytes, 0, 4, "US-ASCII") != "FORM") return None
    if (be32(4) != bytes.length - 8L) return None
    if (new String(bytes, 8, 4, "US-ASCII") != "AIFF") return None
    var i = 12
    var comm: Option[(Int, Int, Int, Int)] = None
    var sawSsnd = false
    var ssndData = -1L
    while (i < bytes.length) {
      if (i + 8 > bytes.length) return None
      val id = new String(bytes, i, 4, "US-ASCII")
      val len = be32(i + 4)
      if (len > Int.MaxValue - 10L - i) return None
      val end = (i + 8 + len + (len % 2)).toInt // IFF chunks are word-aligned
      if (end > bytes.length) return None
      id match {
        case "COMM" =>
          if (len != 18 || comm.isDefined) return None
          val channels = be16(i + 8)
          val frames = be32(i + 10)
          val bits = be16(i + 14)
          val exp = be16(i + 16)
          var mant = 0L
          var k = 0
          while (k < 8) { mant = (mant << 8) | (bytes(i + 18 + k) & 0xff); k += 1 }
          if ((exp & 0x8000) != 0) return None // negative rate
          if (mant >= 0) return None           // MSB clear = unnormalized
          val shift = 16383 + 63 - exp
          if (shift < 0 || shift > 63) return None
          if (shift > 0 && (mant << (64 - shift)) != 0) return None // fractional
          val rate = mant >>> shift
          if (rate > Int.MaxValue) return None
          comm = Some((channels, rate.toInt, frames.toInt, bits))
        case "SSND" =>
          if (sawSsnd) return None
          sawSsnd = true
          if (len < 8) return None
          if (be32(i + 8) != 0 || be32(i + 12) != 0) return None // offset/block
          ssndData = len - 8
        case _ => return None // corpus plants only COMM+SSND
      }
      i = end
    }
    comm.flatMap { case c @ (channels, _, frames, bits) =>
      if (!sawSsnd) None
      else if (ssndData != frames.toLong * channels * (bits / 8)) None
      else Some(c)
    }
  }

  /** AIFF COMM/SSND walk — the big-endian IFF leg, and the only
    * header field in the corpus stored as an 80-bit extended float
    * (the sample rate): the walker decodes it with integer shifts and
    * cross-checks SSND's payload against frames×channels×bytes; the
    * oracle replays everything (including duration micros via exact
    * integral division) from the id rule. */
  val aiffMeta: GraftOp = GraftOp(
    "mm_aiff_meta",
    """SELECT doc_id,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
      |       WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
      |  CAST(100 + doc_id % 50 AS INT) AS n_frames,
      |  CAST(CASE WHEN (doc_id // 4) % 2 = 0 THEN 8 ELSE 16 END AS INT) AS sample_bits,
      |  CAST((100 + doc_id % 50) * 1000000
      |    // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
      |        WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_micros
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType),
      StructField("sample_bits", IntegerType), StructField("duration_micros", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (ch, rate, frames, bits) = parseAiffMeta(syntheticAiff(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted AIFF for doc $docId"))
        Row(docId, ch, rate, frames, bits, frames.toLong * 1000000L / rate)
      }
    }(enc).orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- SRT

  /** Minimal SRT: n sequential cues, 200 ms gaps, per-cue duration
    * 800 + ((docId+i) mod 7)·100 ms, text "cue i doc <id>". */
  private[graft] def syntheticSrt(docId: Long): String = {
    val n = 2 + (docId % 4).toInt
    val start0 = 500 + (docId % 10).toInt * 10
    def ts(ms: Long): String = {
      val h = ms / 3600000; val m = (ms / 60000) % 60
      val s = (ms / 1000) % 60; val f = ms % 1000
      f"$h%02d:$m%02d:$s%02d,$f%03d"
    }
    val sb = new StringBuilder
    var t = start0.toLong
    var i = 0
    while (i < n) {
      val dur = 800 + ((docId + i) % 7) * 100
      sb.append(i + 1).append('\n')
      sb.append(ts(t)).append(" --> ").append(ts(t + dur)).append('\n')
      sb.append(s"cue $i doc $docId").append('\n')
      sb.append('\n')
      t += dur + 200
      i += 1
    }
    sb.toString
  }

  private val SrtTs = java.util.regex.Pattern.compile(
    "(\\d{2}):(\\d{2}):(\\d{2}),(\\d{3}) --> (\\d{2}):(\\d{2}):(\\d{2}),(\\d{3})")

  /** Walk an SRT document → (nCues, totalDurationMs, spanMs,
    * textChars); None on non-sequential indices, malformed or
    * reversed timestamps, overlapping cues, missing separators, or
    * trailing garbage. */
  private[graft] def parseSrtMeta(srt: String): Option[(Int, Long, Long, Long)] = {
    val lines = srt.split("\n", -1)
    var i = 0
    var cue = 0
    var prevEnd = -1L
    var firstStart = -1L
    var lastEnd = -1L
    var totalDur = 0L
    var chars = 0L
    while (i < lines.length && lines(i).nonEmpty) {
      if (lines(i) != (cue + 1).toString) return None // sequential indices
      if (i + 2 >= lines.length) return None
      val m = SrtTs.matcher(lines(i + 1))
      if (!m.matches()) return None
      def ms(o: Int): Long = m.group(o).toLong * 3600000 + m.group(o + 1).toLong * 60000 +
        m.group(o + 2).toLong * 1000 + m.group(o + 3).toLong
      val start = ms(1); val end = ms(5)
      if (end <= start) return None      // reversed / empty cue
      if (start < prevEnd) return None   // overlap
      if (firstStart < 0) firstStart = start
      prevEnd = end; lastEnd = end
      totalDur += end - start
      var j = i + 2
      var sawText = false
      while (j < lines.length && lines(j).nonEmpty) {
        chars += lines(j).length; sawText = true; j += 1
      }
      if (!sawText) return None          // cue without text
      if (j >= lines.length) return None // missing terminating blank line
      i = j + 1
      cue += 1
    }
    while (i < lines.length) { if (lines(i).nonEmpty) return None; i += 1 } // trailing junk
    if (cue == 0) return None
    Some((cue, totalDur, lastEnd - firstStart, chars))
  }

  /** SRT subtitle walk — the CAPTION modality a video-training
    * pipeline pairs with mm_mp4_meta/mm_avi_meta (text-format
    * container, but a container all the same: indices, timecode
    * pairs, separators). The walker enforces sequential cue indices,
    * well-formed HH:MM:SS,mmm timecodes, monotone NON-OVERLAPPING
    * cues and terminating separators; the oracle replays cue count,
    * summed duration, span and text chars analytically from the id
    * rule (per-cue durations via a bounded generate_series, text
    * length via length(CAST(doc_id AS VARCHAR))). */
  val srtMeta: GraftOp = GraftOp(
    "mm_srt_meta",
    """WITH c AS (
      |  SELECT doc_id, i.i AS i, 800 + ((doc_id + i.i) % 7) * 100 AS dur
      |  FROM documents, generate_series(0, 5) i(i)
      |  WHERE i.i < 2 + doc_id % 4)
      |SELECT doc_id,
      |  CAST(count(*) AS INT) AS n_cues,
      |  CAST(sum(dur) AS BIGINT) AS total_duration_ms,
      |  CAST(sum(dur) + 200 * (count(*) - 1) AS BIGINT) AS span_ms,
      |  CAST(count(*) * (10 + length(CAST(doc_id AS VARCHAR))) AS BIGINT) AS text_chars
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_cues", IntegerType),
      StructField("total_duration_ms", LongType), StructField("span_ms", LongType),
      StructField("text_chars", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val (n, dur, span, chars) = parseSrtMeta(syntheticSrt(docId)).getOrElse(
          throw new IllegalStateException(s"unwalkable planted SRT for doc $docId"))
        Row(docId, n, dur, span, chars)
      }
    }(enc).orderBy(col("doc_id"))
  }

  val ops: Seq[GraftOp] = Seq(icoMeta, aiffMeta, srtMeta)
}
