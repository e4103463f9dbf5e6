package graft

import graft.streaming.StreamingPipelines
import graft.streaming.StreamingPipelines.UpsertRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark CORRECTNESS twins (r16, verdict #7) — the two production
  * semantics the §2c suite ran but never pinned:
  *
  *  1. LATE-DATA handling in the append-mode windowed aggregation:
  *     an event older than the watermark is DROPPED (its window
  *     already closed and must not re-emit), while an out-of-order
  *     event still ≥ the watermark lands in its open window; closed
  *     windows match the batch aggregate over exactly the accepted
  *     rows (batch-oracled, like the other twins).
  *  2. `dropDuplicatesWithinWatermark` EXPIRY: the dedup guarantee is
  *     scoped to the watermark delay — a duplicate inside the delay
  *     is dropped, and the SAME id re-emits once its state has been
  *     evicted (the at-least-once contract downstream consumers must
  *     design for; plain dropDuplicates would keep state forever).
  *
  * Both drive explicit micro-batch sequences through a MemoryStream so
  * the watermark's advance (max event time − delay, updated at batch
  * end) is controlled by the test, not by file-source racing.
  */
class StreamingWatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // base aligned to a 5-minute window boundary (1700000100000 is a
  // multiple of 300000 ms), so ts(0)/ts(20)/ts(30) ARE window starts
  private def ts(min: Long) = new java.sql.Timestamp(1700000100000L + min * 60000L)

  test("append-mode window agg drops sub-watermark late data, keeps in-watermark stragglers") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[UpsertRow]
    val q = StreamingPipelines.windowedAgg(mem.toDS().toDF(), "5 minutes", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_win_out").start()
    try {
      // batch 1: three on-time events in window [0,5)
      mem.addData(
        UpsertRow(1L, ts(0), 1L, "view", 10.0),
        UpsertRow(1L, ts(2), 2L, "view", 5.0),
        UpsertRow(2L, ts(3), 3L, "click", 1.0))
      q.processAllAvailable()
      // watermark is still before t0 - nothing may close yet
      assert(spark.table("late_win_out").isEmpty)
      // batch 2: t30 advances the watermark to t20 -> [0,5) closes
      mem.addData(UpsertRow(1L, ts(30), 4L, "view", 2.0))
      q.processAllAvailable()
      val closed = spark.table("late_win_out")
        .select(col("bucket_start"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toString).toSet
      assert(closed === Set(
        s"[${ts(0)},view,2,15.0]", s"[${ts(0)},click,1,1.0]"),
        s"closed windows wrong: $closed")
      // batch 3: id 5 is LATE (t2 < watermark t20) and must vanish;
      // id 6 (t22) is out-of-order but >= the watermark and must land
      mem.addData(
        UpsertRow(2L, ts(2), 5L, "view", 100.0),
        UpsertRow(1L, ts(22), 6L, "click", 3.0))
      q.processAllAvailable()
      // batch 4: t60 -> watermark t50 closes [20,25) and [30,35)
      mem.addData(UpsertRow(1L, ts(60), 7L, "view", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_win_out")
      .select(col("bucket_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("bucket_start"), col("event_type"))
      .collect().map(_.toString).toSeq
    // batch oracle: the same aggregate over exactly the ACCEPTED rows
    // (no id 5 - dropped late; no id 7 - its window never closed)
    val accepted = Seq(
      (ts(0), "view", 10.0), (ts(2), "view", 5.0), (ts(3), "click", 1.0),
      (ts(30), "view", 2.0), (ts(22), "click", 3.0))
      .toDF("ts", "event_type", "value")
    val want = accepted
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("bucket_start"), col("event_type"))
      .collect().map(_.toString).toSeq
    assert(got === want, s"stream=$got batch=$want")
  }

  test("dropDuplicatesWithinWatermark re-admits an id after its state expires") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[UpsertRow]
    val q = StreamingPipelines.dedupStream(mem.toDS().toDF(), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_out").start()
    def ids(): Seq[Long] = {
      q.processAllAvailable()
      spark.table("dedup_wm_out").select(col("event_id"))
        .collect().map(_.getLong(0)).toSeq.sorted
    }
    try {
      // first sighting emits
      mem.addData(UpsertRow(1L, ts(0), 1L, "view", 1.0))
      assert(ids() === Seq(1L))
      // duplicate inside the 10-minute delay: dropped
      mem.addData(
        UpsertRow(1L, ts(1), 1L, "view", 1.0),
        UpsertRow(2L, ts(5), 2L, "click", 2.0))
      assert(ids() === Seq(1L, 2L))
      // t60 advances the watermark to t50; id 1's state (expires at
      // t0 + 10min = t10 < t50) is evicted at batch end
      mem.addData(UpsertRow(3L, ts(60), 3L, "view", 3.0))
      assert(ids() === Seq(1L, 2L, 3L))
      // the SAME id re-emits after expiry - the within-watermark
      // contract (dropDuplicates would still suppress it)
      mem.addData(UpsertRow(1L, ts(55), 1L, "view", 1.0))
      assert(ids() === Seq(1L, 1L, 2L, 3L))
      // and the fresh state suppresses the next duplicate again
      mem.addData(UpsertRow(1L, ts(56), 1L, "view", 1.0))
      assert(ids() === Seq(1L, 1L, 2L, 3L))
    } finally q.stop()
  }
}
