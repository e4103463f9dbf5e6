package graft

import graft.operators.{EventsAnalytics, KnnOps, PackOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape checks for the round-3 event-analytics,
  * sequence-packing and kNN-classify operators (their value-level
  * parity is oracle-checked; these pin the SCALE properties the oracle
  * can't see). */
class EventsPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def countOccurrences(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).size

  test("q_latest_per_key is a single partial-aggregated exchange, not a corpus sort") {
    val plan = EventsAnalytics.latestPerKey.run(spark, sf)
      .queryExecution.executedPlan.toString
    // one hash exchange on user_id; no window/sort of the raw stream
    // before it (the row_number formulation would show Window + a sort
    // of every event through the exchange)
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ["), plan)
  }

  test("q_latest_per_key matches the window-function formulation") {
    val agg = EventsAnalytics.latestPerKey.run(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val ref = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id")).collect()
    assert(agg.toSeq == ref.toSeq)
  }

  test("q_funnel depths partition the user base and are monotonically reached") {
    val depths = EventsAnalytics.funnel.run(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(depths.values.sum == nUsers, s"funnel depths $depths don't partition $nUsers users")
    // reaching depth k requires depth k-1: cumulative counts decrease
    val reached = (0 to 3).map(k => (k to 3).flatMap(depths.get).sum)
    assert(reached == reached.sorted.reverse, s"non-monotone funnel: $reached")
  }

  test("q_gap_fill emits a dense types×days spine with true zeros") {
    val rows = EventsAnalytics.gapFill.run(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val days = rows.map(_.getInt(1)).distinct.length
    assert(rows.length == types * days, "spine is not dense")
    val perType = rows.groupBy(_.getString(0)).values
    assert(perType.forall(_.map(_.getInt(1)).sorted.toSeq == rows.map(_.getInt(1)).distinct.sorted.toSeq),
      "a type is missing spine days")
  }

  test("pack_sequences: hierarchical prefix sum == naive global cumsum; offsets consistent") {
    val out = PackOps.packSequences.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // contiguity: doc i+1 starts exactly where doc i ended
    val tokBefore = out.scanLeft(0L) { case (acc, (_, n, _, _, _)) => acc + n }
    out.zip(tokBefore).foreach { case ((doc, n, startSeq, startOff, endSeq), before) =>
      assert(startSeq == before / 512 && startOff == before % 512,
        s"doc $doc: start ($startSeq,$startOff) != cumsum-derived $before")
      assert(endSeq == (before + n - 1) / 512, s"doc $doc: endSeq")
    }
  }

  test("pack_sequences plan has no corpus-wide unpartitioned window") {
    val plan = PackOps.packSequences.run(spark, sf)
      .queryExecution.executedPlan.toString
    // the only Exchange SinglePartition feeds the per-bucket directory
    // (one row per bucket), never the document stream: the window over
    // it must be preceded by an aggregate on bucket
    val single = countOccurrences(plan, "Exchange SinglePartition")
    assert(single <= 1, s"multiple single-partition exchanges:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(bucket"), plan)
  }

  test("pack_epoch_order: epochs mix (diagonal far from identity), counts conserve, deterministic") {
    val rows = PackOps.packEpochOrder.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val ns = rows.head._2
    rows.foreach { case (epoch, n, diagPpm, mx, mn) =>
      assert(n == ns, "sequence count must not vary by epoch")
      // identity order would put 1e6 ppm on the diagonal; a hash
      // shuffle sits near uniform (100k ppm). 3× uniform is a
      // generous mixing bound that an unshuffled epoch can't meet.
      assert(diagPpm < 300000, s"epoch $epoch barely shuffled: diag $diagPpm ppm")
      assert(mx >= mn && mn >= 0 && mx <= n)
    }
    val again = PackOps.packEpochOrder.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq == rows.toSeq, "epoch order must be reproducible")
  }

  test("dedup_lsh_band_curve: candidate volume and recall are monotone in band count") {
    val raw = graft.operators.DedupOps.bandCurve.run(spark, sf).collect()
    // recall_ppm is NULL when n_truth = 0 (div NULLIF): fail with a
    // clear message on an empty truth set instead of a getLong NPE
    assert(raw.forall(!_.isNullAt(5)),
      "recall_ppm is NULL — fixture has no ngram truth pairs")
    val rows = raw.map(r => (r.getInt(0), r.getLong(2), r.getLong(5)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8, 16))
    rows.sliding(2).foreach { case Array((b1, c1, r1), (b2, c2, r2)) =>
      // candidate sets NEST as bands double (agreeing on a 2k-run
      // implies agreeing on both k-runs) — so volume and recall can
      // only grow with the band count
      assert(c2 >= c1, s"candidates dropped $b1→$b2: $c1→$c2")
      assert(r2 >= r1, s"recall dropped $b1→$b2: $r1→$r2")
    }
  }

  test("knn_classify: every query labeled once, labels from the corpus label set") {
    val out = KnnOps.classify.run(spark, sf).collect()
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 50).select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSet
    val nQueries = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50).count()
    assert(out.length == nQueries)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(r => labels.contains(r.getInt(1))))
    assert(out.forall { r => val v = r.getLong(2); v >= 1 && v <= 10 })
  }
}
