package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join == plain join on a skewed key") {
    val events = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    val users = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = events.join(users, "user_id")
      .orderBy("event_id").collect().map(_.toString)
    val salted = SkewJoin.saltedJoin(events, users, "user_id", salts = 8)
      .select(events.columns.map(col).toIndexedSeq ++ Seq(col("c_mktsegment")): _*)
      .orderBy("event_id").collect().map(_.toString)
    assert(salted.length === plain.length)
    assert(salted.sameElements(plain))
  }

  test("salt assignment is content-deterministic: stable under repartitioning") {
    // monotonically_increasing_id-based salting scatters by PHYSICAL
    // position, so a retried/replanned scan re-salts rows differently;
    // content-hash salting must give every row the same salt no matter
    // how the input is partitioned (the retry-determinism contract)
    val events = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    val users = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    def saltOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] = {
      val rowContent = df.columns.map(col).toSeq :+ lit(0x5a17)
      df.withColumn("__salt", pmod(hash(rowContent: _*), lit(8)))
        .select(col("event_id"), col("__salt"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val base = saltOf(events)
    val shuffled = saltOf(events.repartition(13, col("value")))
    assert(base === shuffled)
    // a hot key's rows still spread across buckets (salting does work)
    val hot = events.groupBy("user_id").count().orderBy(col("count").desc)
      .first().getLong(0)
    val rowContent = events.columns.map(col).toSeq :+ lit(0x5a17)
    val hotSalts = events.filter(col("user_id") === hot)
      .withColumn("__salt", pmod(hash(rowContent: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(hotSalts > 1, "hot key's rows should scatter across salt buckets")
    // and the join result is still exactly the plain join
    val plain = events.join(users, "user_id").count()
    val salted = SkewJoin.saltedJoin(events, users, "user_id", salts = 8).count()
    assert(salted === plain)
  }

  test("session_window built-in agrees with the gaps-and-islands session op") {
    // Spark's session_window(ts, gap) merges events < gap apart — same
    // semantics as the oracle-checked q_session formulation
    val ev = graft.sources.Tables.events(spark, sf)
    val viaBuiltin = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total"))
      .orderBy("user_id").collect().map(_.toString)
    val viaOp = graft.operators.Relational.qSession.run(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total"))
      .orderBy("user_id").collect().map(_.toString)
    assert(viaBuiltin.sameElements(viaOp))
  }
}
