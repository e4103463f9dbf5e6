package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 op pins: the SpaceSaving guaranteed-top-k emit and the
  * compression-bounds gate, each recomputed brute-force on the driver
  * over sf0.001 and checked against the distributed result — plus an
  * INDEPENDENT deflate of every document so the bounds booleans are
  * proven against the real codec, not against the expression that
  * emits them.
  */
class R16OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def texts: Array[String] = graft.sources.Tables.documents(spark, sf)
    .select(col("text")).collect().map(_.getString(0))

  // ---- text_topk_guaranteed ----

  test("text_topk_guaranteed: ranks/counts match the brute census, theorems hold") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split("\\s+")
      .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1))
    val total = counts.values.sum
    val top8 = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(8)
    val rows = graft.operators.TextOps3.topkGuaranteed.run(spark, sf).collect()
    assert(rows.length == 8)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i + 1, "rank must be dense 1..8")
      assert(r.getString(1) == top8(i)._1, s"rank ${i + 1} token mismatch")
      assert(r.getLong(2) == top8(i)._2, s"rank ${i + 1} count mismatch")
      assert(r.getLong(3) == total / 16, "ss_threshold = n_total div cap")
      assert(r.getBoolean(4) == (top8(i)._2 * 16 > total))
      assert(r.getBoolean(5), s"guaranteed token not covered by the sketch: ${r.getString(1)}")
      assert(r.getBoolean(6), s"sketch estimate below the true count: ${r.getString(1)}")
      assert(r.getBoolean(7), s"sketch estimate above true + n/cap slack: ${r.getString(1)}")
    }
  }

  // ---- text_compression_bounds ----

  test("text_compression_bounds: bounds hold against an independent deflate") {
    val rows = graft.operators.TextOps3.compressionBounds.run(spark, sf).collect()
    assert(rows.length == texts.length)
    // independent codec run: java.util.zip at the same level the
    // DeflateSize kernel uses
    def deflatedLen(s: String): Long = {
      val d = new java.util.zip.Deflater(6)
      try {
        val in = s.getBytes("UTF-8")
        d.setInput(in); d.finish()
        val buf = new Array[Byte](in.length + in.length / 100 + 64)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        n
      } finally d.end()
    }
    val byteLens = texts.map(_.getBytes("UTF-8").length.toLong).sorted
    assert(rows.map(_.getLong(1)).sorted.toSeq == byteLens.toSeq,
      "n_bytes must be the exact UTF-8 byte counts")
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) == n + n / 4096 + n / 16384 + n / 33554432 + 13)
      assert(r.getLong(3) == 8 + n / 2064)
      assert(r.getBoolean(4), s"doc ${r.getLong(0)}: deflate exceeded compressBound")
      assert(r.getBoolean(5), s"doc ${r.getLong(0)}: deflate under the symbol-rate floor")
    }
    // the theorem booleans must reflect the REAL codec: recompute both
    // bounds from an independent Deflater for every document
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().foreach { r =>
        val n = r.getString(1).getBytes("UTF-8").length.toLong
        val dz = deflatedLen(r.getString(1))
        assert(dz <= n + n / 4096 + n / 16384 + n / 33554432 + 13,
          s"doc ${r.get(0)}: independent deflate broke the ceiling")
        assert(dz >= 8 + n / 2064,
          s"doc ${r.get(0)}: independent deflate broke the floor")
      }
  }
}
