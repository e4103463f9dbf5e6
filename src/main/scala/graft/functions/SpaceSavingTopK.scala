package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy-hitters sketch as a typed `Aggregator` — the
  * user-facing typed-aggregation extension point (complementing the
  * native codegen'd Expression tier in [[graft.functions]] and the
  * custom plan-node tier in [[graft.plans]]). Also the state of the
  * streaming heavy-hitters pipeline
  * ([[graft.streaming.StreamingPipelines.heavyHittersStream]]).
  *
  * Tracks at most `capacity` counters; when full, the smallest counter
  * is reassigned to the incoming item with +1 (Metwally et al.'s
  * SpaceSaving). Counts are overestimates bounded by the evicted
  * minimum; with capacity ≫ k the true top-k survive. Merge unions
  * counters and re-truncates, so it parallelizes as a proper
  * map-side-combine aggregate.
  */
class SpaceSavingTopK(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        val (minItem, minCount) = buf.minBy { case (it, c) => (c, it) }
        (buf - minItem).updated(item, minCount + 1)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    // an item absent from a full sketch may have been evicted with up
    // to that sketch's minimum count — add it as the overestimate bound
    // (parallel SpaceSaving) so cross-partition heavy hitters keep
    // their mass instead of being truncated away
    val aFloor = if (a.size >= capacity) a.values.min else 0L
    val bFloor = if (b.size >= capacity) b.values.min else 0L
    val merged = (a.keySet ++ b.keySet).iterator
      .map(it => it -> (a.getOrElse(it, aFloor) + b.getOrElse(it, bFloor))).toMap
    if (merged.size <= capacity) merged
    else merged.toSeq.sortBy { case (it, c) => (-c, it) }.take(capacity).toMap
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (it, c) => (-c, it) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
}
