package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bitmap (bitset) distinct-count kernels — the EXACT mergeable twin
  * of the HLL tier (ClickHouse `groupBitmapState`→`groupBitmapMerge`).
  *
  * For a DENSE integer key domain (dictionary-encoded user/doc ids —
  * the shape a warehouse engineers for), a plain bitset is both exact
  * and mergeable: ⌈max_id/8⌉ bytes per group, bitwise-OR merge (an
  * abelian monoid, like every sketch here), popcount cardinality.
  * Against COUNT(DISTINCT): no RewriteDistinctAggregates Expand, no
  * distinct-key shuffle — per-group state crosses the wire once.
  * Against HLL: exact, and set-algebra-capable, at the price of state
  * linear in the ID DOMAIN rather than constant — which is why both
  * tiers exist (HLL for unbounded domains, bitmap for dense ones).
  *
  * Serialized form is CANONICAL — trailing zero words trimmed — so the
  * same key set yields byte-identical bitmaps regardless of the
  * grouping or merge order that built them.
  */
object BitmapImpls {

  /** Hard ID-domain bound: 2^26 bits = 8 MB per group worst case.
    * Beyond this the dense-bitmap contract is the wrong tool (use HLL,
    * or dictionary-encode first) — fail loud, never silently truncate. */
  val MaxBits: Long = 1L << 26

  /** Set bit `v`, growing geometrically. Returns the (possibly new) array. */
  def set(words: Array[Long], v: Long): Array[Long] = {
    require(v >= 0 && v < MaxBits,
      s"bitmap_agg: key $v outside the dense domain [0, $MaxBits) — " +
        "dictionary-encode the key or use hll_sketch_agg")
    val w = (v >>> 6).toInt
    val out =
      if (w < words.length) words
      else java.util.Arrays.copyOf(words, math.max(w + 1, words.length * 2))
    out(w) |= 1L << (v & 63)
    out
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (long, short) = if (a.length >= b.length) (a, b) else (b, a)
    val out = java.util.Arrays.copyOf(long, long.length)
    var i = 0
    while (i < short.length) { out(i) |= short(i); i += 1 }
    out
  }

  /** OR a SERIALIZED bitmap into `dst` in place, growing `dst` only
    * when the incoming bitmap is wider — the per-row aggregate-update
    * path. The copying [[or]] per input row would be O(rows × domain)
    * allocation churn for dense domains; this decodes words straight
    * out of the byte buffer into the accumulator. */
  def orBytesInto(dst: Array[Long], bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length / 8
    val out =
      if (n <= dst.length) dst
      else java.util.Arrays.copyOf(dst, math.max(n, dst.length * 2))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < n) { out(i) |= bb.getLong; i += 1 }
    out
  }

  def cardinality(words: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }

  /** Canonical bytes: trailing zero words trimmed, big-endian words. */
  def serialize(words: Array[Long]): Array[Byte] = {
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    val bb = java.nio.ByteBuffer.allocate(n * 8)
    var i = 0
    while (i < n) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }
}

final class BitmapBuffer(var words: Array[Long]) extends Serializable {
  def this() = this(new Array[Long](16))
}

private[functions] trait BitmapAggBase extends TypedImperativeAggregate[BitmapBuffer] {
  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer()
  override def merge(b: BitmapBuffer, o: BitmapBuffer): BitmapBuffer = {
    b.words = BitmapImpls.or(b.words, o.words); b
  }
  override def serialize(b: BitmapBuffer): Array[Byte] = BitmapImpls.serialize(b.words)
  override def deserialize(bytes: Array[Byte]): BitmapBuffer =
    new BitmapBuffer(BitmapImpls.deserialize(bytes))
  override def nullable: Boolean = false
}

/** `bitmap_agg(key)` — build the exact bitmap over a dense BIGINT key
  * domain; returns canonical BINARY for rollup tables, like
  * [[HllSketchAgg]] but exact. */
case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapAggBase with UnaryLike[Expression] {

  override def update(b: BitmapBuffer, row: InternalRow): BitmapBuffer = {
    val v = child.eval(row)
    if (v != null) b.words = BitmapImpls.set(b.words, v.asInstanceOf[Long])
    b
  }

  override def eval(b: BitmapBuffer): Any = BitmapImpls.serialize(b.words)
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg expects BIGINT key, got ${child.dataType}")
  override def prettyName: String = "bitmap_agg"
  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BitmapAgg =
    copy(child = newChild)
}

/** `bitmap_merge_agg(bitmap)` — OR persisted bitmaps up to a coarser
  * grouping and return the EXACT distinct count. OR loses nothing, so
  * a rollup of per-day bitmaps equals bitmapping the month directly —
  * and unlike [[HllMergeAgg]] the count is exact, which is what makes
  * the rollup op oracle-checkable against COUNT(DISTINCT). */
case class BitmapMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapAggBase with UnaryLike[Expression] {

  override def update(b: BitmapBuffer, row: InternalRow): BitmapBuffer = {
    val v = child.eval(row)
    if (v != null) {
      b.words = BitmapImpls.orBytesInto(b.words, v.asInstanceOf[Array[Byte]])
    }
    b
  }

  override def eval(b: BitmapBuffer): Any = BitmapImpls.cardinality(b.words)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_merge_agg expects BINARY bitmap, got ${child.dataType}")
  override def prettyName: String = "bitmap_merge_agg"
  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BitmapMergeAgg =
    copy(child = newChild)
}
