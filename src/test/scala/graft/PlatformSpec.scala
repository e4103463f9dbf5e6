package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Platform plumbing around the operator surface: the real binary-file
  * source for multimodal ingest, the native session_window operator's
  * parity with the SQL sessionization, and free pipeline metrics via
  * Dataset.observe. */
class PlatformSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("binaryFile source ingests real blobs and feeds the sniff kernel") {
    val dir = Files.createTempDirectory("graft-blobfiles")
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
    (0 until 12).foreach { i =>
      val header = if (i % 2 == 0) png else jpeg
      Files.write(dir.resolve(f"blob_$i%03d.bin"),
        header ++ s"payload-$i".getBytes("UTF-8"))
    }
    // the REAL multimodal ingest path: Spark's binaryFile source gives
    // (path, modificationTime, length, content) with no codec needed
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    assert(df.count() === 12)
    // same magic-byte classification kernel mm_sniff runs
    val fmt = when(hex(col("content")).startsWith("89504E470D0A1A0A"), "png")
      .when(hex(col("content")).startsWith("FFD8FF"), "jpeg")
      .otherwise("unknown")
    val counts = df.select(fmt.as("format"))
      .groupBy("format").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("png" -> 6L, "jpeg" -> 6L))
    // pushdown sanity: length is a partitioning-level column — a size
    // filter must not read file contents (pruned at listing time)
    val small = df.filter(col("length") < 100).count()
    assert(small === 12)
  }

  test("native session_window equals the gaps-and-islands sessionization") {
    val gap = "30 minutes"
    val native = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(_.toString).sorted
    val sql = SparkEntry.queries("q_session")(spark, sf)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(_.toString).sorted
    assert(native.length > 0 && native.sameElements(sql),
      s"native=${native.length} sessions, sql=${sql.length}")
    // boundary semantics AGREE: session_window's gap is inclusive
    // (next event at exactly t+gap extends the session), matching
    // q_session's `ts > prev + gap` split condition — pin it so a
    // Spark behavior change can't silently break the parity above
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val atGap = Seq((1L, t0), (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")))
      .toDF("user_id", "ts")
    assert(atGap.groupBy(col("user_id"), session_window(col("ts"), gap)).count().count() === 1L,
      "session_window must MERGE an exactly-gap pair (inclusive gap, like q_session)")
    val pastGap = Seq((1L, t0), (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:01")))
      .toDF("user_id", "ts")
    assert(pastGap.groupBy(col("user_id"), session_window(col("ts"), gap)).count().count() === 2L,
      "session_window must SPLIT past the gap")
  }

  test("CSV malformed-record routing: corrupt rows quarantined, clean rows typed") {
    // source-boundary dirty routing — the reference quarantines records
    // failing the field check AFTER parse (MyKafkaDeserializationSchema);
    // PERMISSIVE + columnNameOfCorruptRecord is the same contract at the
    // file-source boundary: bad lines land in a quarantine column
    // instead of killing the job or silently vanishing
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("data.csv"),
      """id,amount,label
        |1,10.5,ok
        |2,notanumber,bad-amount
        |3,30.25,ok
        |garbage line with no commas at all extra
        |5,50.0,ok
        |""".stripMargin)
    val schema = "id INT, amount DOUBLE, label STRING, _corrupt STRING"
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(dir.toString)
      .cache() // corrupt-column reads need the parsed batch materialized
    try {
      val clean = df.filter(col("_corrupt").isNull)
      val dirty = df.filter(col("_corrupt").isNotNull)
      assert(clean.count() === 3)
      assert(dirty.count() === 2, "both malformed lines must be quarantined")
      assert(clean.agg(sum(col("amount"))).head.getDouble(0) === 90.75)
      // the quarantine column preserves the raw line for replay/debug
      val rawLines = dirty.select(col("_corrupt")).collect().map(_.getString(0))
      assert(rawLines.exists(_.contains("notanumber")))
    } finally df.unpersist()
  }

  test("observe(): ETL metrics ride the action for free (no second scan)") {
    val obs = new org.apache.spark.sql.Observation("etl")
    val df = graft.sources.Tables.events(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
        max(col("ts")).as("watermark_high"))
      .filter(col("event_type") =!= "nonexistent")
    val n = df.count() // the one action — metrics piggyback on it
    val m = obs.get
    assert(m("rows") === n)
    assert(m("null_props").asInstanceOf[Long] >= 0L)
    assert(m("watermark_high") != null)
  }
}
