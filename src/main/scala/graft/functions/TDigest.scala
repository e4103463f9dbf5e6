package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch: Dunning's MERGING t-digest (Computing
  * Extremely Accurate Quantiles Using t-Digests, Dunning & Ertl 2019)
  * — the same sketch family ClickHouse ships as `quantileTDigest`,
  * which is the natural target for the reference's ClickHouse-side
  * analytics (reference: ClickHouseSink.scala executes against a
  * ClickHouse that exposes this aggregate).
  *
  * Centroids are kept sorted with weights bounded by the k1 scale
  * function k(q) = δ/(2π)·asin(2q−1): bucket capacity shrinks toward
  * the tails, so tail quantiles stay sharp while the middle
  * compresses. Incoming points accumulate in a flat buffer and fold
  * into the centroid list when it fills (amortized O(log n) per
  * point); merging two digests concatenates centroid lists and
  * re-compresses — associative, which is exactly what a distributed
  * partial/final aggregate needs.
  *
  * DETERMINISM, scoped honestly: no RNG anywhere, so the digest is a
  * pure function of its (update, merge) CALL SEQUENCE — same sequence,
  * bit-identical centroids, which is what the local rows-only
  * determinism gate exercises. Across a cluster the FINAL merge folds
  * partial digests in shuffle-fetch arrival order, and a t-digest
  * merge (like ClickHouse's quantileTDigest) is order-sensitive at
  * the bit level — cluster reruns stay within the rank-error bound
  * (TDigestSpec pins it) but are not guaranteed bit-stable. Exact
  * bit-stability needs the exact q_percentile twin.
  */
final class TDigest(val compression: Double) extends Serializable {
  private var means = new Array[Double](0)
  private var weights = new Array[Double](0)
  private var count = 0 // live centroids
  private var total = 0.0 // merged weight

  // unmerged point buffer — folded in by compress()
  private val bufCap = 512
  private var buf = new Array[Double](bufCap)
  private var bufN = 0

  def isEmpty: Boolean = count == 0 && bufN == 0 && pendN == 0

  def add(x: Double): Unit = {
    if (bufN == bufCap) compress()
    buf(bufN) = x
    bufN += 1
  }

  /** Fold `other` into this digest (other is left untouched). */
  def mergeWith(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.count) {
      // weighted points enter through the same merge path as singles
      addCentroid(other.means(i), other.weights(i))
      i += 1
    }
  }

  private var pendM: Array[Double] = new Array(0)
  private var pendW: Array[Double] = new Array(0)
  private var pendN = 0

  private def addCentroid(m: Double, w: Double): Unit = {
    if (pendN == pendM.length) {
      val grow = math.max(64, pendM.length * 2)
      pendM = java.util.Arrays.copyOf(pendM, grow)
      pendW = java.util.Arrays.copyOf(pendW, grow)
    }
    pendM(pendN) = m; pendW(pendN) = w; pendN += 1
    if (pendN >= 4 * compression.toInt) compress()
  }

  private def k(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  private def invK(kk: Double): Double = {
    val s = math.sin(2 * math.Pi * kk / compression)
    (math.min(1.0, math.max(-1.0, s)) + 1) / 2
  }

  /** Merge buffer + pending centroids + current centroids into a fresh
    * k1-capacity-bounded centroid list. */
  def compress(): Unit = {
    if (bufN == 0 && pendN == 0) return
    val m = count + bufN + pendN
    val allM = new Array[Double](m)
    val allW = new Array[Double](m)
    System.arraycopy(means, 0, allM, 0, count)
    System.arraycopy(weights, 0, allW, 0, count)
    var i = 0
    while (i < bufN) { allM(count + i) = buf(i); allW(count + i) = 1.0; i += 1 }
    i = 0
    while (i < pendN) {
      allM(count + bufN + i) = pendM(i); allW(count + bufN + i) = pendW(i); i += 1
    }
    bufN = 0; pendN = 0
    // sort (mean, weight) pairs by (mean, weight) — the weight
    // tie-break removes insertion-order dependence among equal means
    val idx = (0 until m).sortBy(i => (allM(i), allW(i)))
    val w = allW.sum
    val outM = new Array[Double](m)
    val outW = new Array[Double](m)
    var n = 0
    var curM = allM(idx(0))
    var curW = allW(idx(0))
    var emitted = 0.0 // weight fully emitted before the current centroid
    var qLimit = w * invK(k(0) + 1)
    i = 1
    while (i < m) {
      val am = allM(idx(i)); val aw = allW(idx(i))
      if (emitted + curW + aw <= qLimit) {
        curM += (am - curM) * aw / (curW + aw) // weighted running mean
        curW += aw
      } else {
        outM(n) = curM; outW(n) = curW; n += 1
        emitted += curW
        qLimit = w * invK(k(emitted / w) + 1)
        curM = am; curW = aw
      }
      i += 1
    }
    outM(n) = curM; outW(n) = curW; n += 1
    means = java.util.Arrays.copyOf(outM, n)
    weights = java.util.Arrays.copyOf(outW, n)
    count = n
    total = w
  }

  /** Quantile via linear interpolation between centroid centers. */
  def quantile(q: Double): Double = {
    compress()
    if (count == 0) return Double.NaN
    if (count == 1) return means(0)
    val index = q * total
    // centroid centers sit at cum_i = (sum of weights before i) + w_i/2
    var cumBefore = 0.0
    var i = 0
    while (i < count) {
      val center = cumBefore + weights(i) / 2
      if (index <= center) {
        if (i == 0) return means(0)
        val prevCenter = cumBefore - weights(i - 1) / 2
        val frac = (index - prevCenter) / (center - prevCenter)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      cumBefore += weights(i)
      i += 1
    }
    means(count - 1)
  }

  def toBytes: Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(8 + 4 + 16 * count)
    bb.putDouble(compression)
    bb.putInt(count)
    var i = 0
    while (i < count) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }

  def centroidCount: Int = { compress(); count }
}

object TDigest {
  def fromBytes(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val m = bb.getDouble; val w = bb.getDouble
      d.addCentroid(m, w)
      i += 1
    }
    d.compress()
    d
  }
}

/** `tdigest_quantiles(value, percentages, compression)` — distributed
  * approximate quantiles as a [[TypedImperativeAggregate]]: partial
  * aggregates build per-partition digests, serialize() ships them as
  * binary buffers through the shuffle, merge() folds them on the final
  * side — map-side combine for a quantile, which no exact formulation
  * gets. Returns `array<double>`, one entry per requested percentage
  * (null on empty input, like the built-in `percentile`).
  *
  * Mirrors ClickHouse's `quantilesTDigest(...)(col)`
  * (reference target engine); the exact twin is q_percentile.
  */
case class TDigestQuantiles(
    child: Expression,
    percentages: Seq[Double],
    compression: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    s"percentages must be in [0,1], got $percentages")
  require(compression >= 20, s"compression too low for usable accuracy: $compression")

  override def createAggregationBuffer(): TDigest = new TDigest(compression.toDouble)

  override def update(b: TDigest, row: InternalRow): TDigest = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TDigest, other: TDigest): TDigest = { b.mergeWith(other); b }

  override def eval(b: TDigest): Any =
    if (b.isEmpty) null
    else new GenericArrayData(percentages.map(b.quantile).toArray)

  override def serialize(b: TDigest): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = o)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // builders cast the child to double (AbstractDataType is private[sql],
  // so ImplicitCastInputTypes isn't available outside org.apache.spark)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantiles expects DOUBLE input, got ${child.dataType}")
  override def prettyName: String = "tdigest_quantiles"
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantiles =
    copy(child = newChild)
}
