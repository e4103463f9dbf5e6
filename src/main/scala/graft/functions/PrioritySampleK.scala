package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic weighted sample-without-replacement of size k as a
  * typed `Aggregator` — priority sampling (Duffield, Lund & Thorup
  * 2007) with the RNG replaced by the engine's salted portable hash:
  * each (key, weight) row gets priority w/u with u the exact uniform
  * `(md5Long15(salt‖key)+1)/2⁶⁰`, and the k highest-priority rows win
  * (key tiebreak). Because the priority is a PURE function of the row,
  * the state is a bounded join-semilattice (insert = union + top-k
  * truncation): arrival order doesn't matter, merge is associative and
  * commutative, and at-least-once REPLAY of any row is a no-op — the
  * reservoir-sampling replacement whose result is reproducible across
  * engines, runs, partitionings, and restarts. This is the streaming
  * half of the batch `sample_weighted` / `sample_dsir` selection
  * contract (identical priority formula); O(k) state per group. */
class PrioritySampleK(k: Int, salt: String)
    extends Aggregator[(String, Long), Seq[(Double, String, Long)], Seq[(String, Long)]] {

  private def pri(key: String, w: Long): Double =
    w / ((Exprs.md5Long15(salt + key) + 1) / 1.152921504606846976e18)

  private def trunc(s: Seq[(Double, String, Long)]): Seq[(Double, String, Long)] =
    s.distinct.sortBy { case (p, key, _) => (-p, key) }.take(k)

  override def zero: Seq[(Double, String, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, String, Long)], x: (String, Long)): Seq[(Double, String, Long)] =
    trunc(b :+ ((pri(x._1, x._2), x._1, x._2)))

  override def merge(a: Seq[(Double, String, Long)], b: Seq[(Double, String, Long)]): Seq[(Double, String, Long)] =
    trunc(a ++ b)

  override def finish(b: Seq[(Double, String, Long)]): Seq[(String, Long)] =
    b.map { case (_, key, w) => (key, w) }

  override def bufferEncoder: Encoder[Seq[(Double, String, Long)]] =
    Encoders.kryo[Seq[(Double, String, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
}
