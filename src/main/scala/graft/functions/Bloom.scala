package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bloom-filter kernels shared by the aggregate (build) and the scalar
  * expression (probe) — static methods so the probe stays inside
  * whole-stage codegen as a plain function call.
  *
  * Double hashing g_i = h1 + i·h2 over two splitmix64-derived 64-bit
  * hashes (Kirsch & Mitzenmacher 2006: two hashes simulate k
  * independent ones with no loss in the false-positive bound).
  * Deterministic — no per-run seed — so a filter built twice over the
  * same keys is byte-identical.
  */
object BloomImpls {

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** m bits for n items at false-positive rate p (standard formula). */
  def optimalBits(expectedItems: Long, fpp: Double): Int = {
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2)))
    math.max(64, math.min(m, 1L << 30).toInt) // cap at 128 MB of bits
  }

  def optimalHashes(fpp: Double): Int =
    math.max(1, math.ceil(-math.log(fpp) / math.log(2)).toInt)

  def insert(bits: Array[Long], numHashes: Int, value: Long): Unit = {
    val m = bits.length.toLong * 64
    val h1 = splitmix64(value)
    val h2 = splitmix64(h1 ^ 0x9e3779b97f4a7c15L) | 1L // odd → full-period stride
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Probe a SERIALIZED filter (layout: int numHashes, long[] bits).
    * Reads bytes directly (no ByteBuffer wrapping) — this runs inside
    * the fact scan's codegen'd filter for every row, so the probe must
    * be allocation-free. */
  def mightContain(ser: Array[Byte], value: Long): Boolean = {
    if (ser == null || ser.length < 12) return false
    val numHashes = ((ser(0) & 0xff) << 24) | ((ser(1) & 0xff) << 16) |
      ((ser(2) & 0xff) << 8) | (ser(3) & 0xff)
    val words = (ser.length - 4) / 8
    val m = words.toLong * 64
    val h1 = splitmix64(value)
    val h2 = splitmix64(h1 ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, m)
      val off = 4 + (idx >>> 6).toInt * 8
      var word = 0L
      var b = 0
      while (b < 8) { word = (word << 8) | (ser(off + b) & 0xffL); b += 1 }
      if ((word & (1L << (idx & 63))) == 0) return false
      i += 1
    }
    true
  }

  def serialize(bits: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + bits.length * 8)
    bb.putInt(numHashes)
    bits.foreach(bb.putLong)
    bb.array()
  }
}

final class BloomBuffer(val bits: Array[Long], val numHashes: Int) extends Serializable {
  def add(v: Long): Unit = BloomImpls.insert(bits, numHashes, v)
  def orWith(o: BloomBuffer): Unit = {
    var i = 0
    while (i < bits.length) { bits(i) |= o.bits(i); i += 1 }
  }
}

/** `bloom_agg(key, expectedItems, fpp)` — build a Bloom filter over a
  * LONG key column as a [[TypedImperativeAggregate]]: per-partition
  * filters built map-side, OR-merged after the shuffle (a Bloom filter
  * is an abelian monoid under bitwise OR — the cheapest possible
  * merge). Returns the serialized filter as BINARY.
  *
  * The scale pattern this enables is semi-join pushdown / runtime
  * filtering: build the filter over a selective dimension's keys
  * (tiny), probe it in the fact scan's filter BEFORE the join — the
  * shuffle then carries only rows that can match (false positives are
  * eliminated by the exact join, so results are unchanged — which is
  * why q_bloom_prefilter can be oracle-checked against the plain
  * join). */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(expectedItems > 0 && fpp > 0 && fpp < 1,
    s"bloom_agg: need expectedItems > 0 and fpp in (0,1), got ($expectedItems, $fpp)")

  private def numBits = BloomImpls.optimalBits(expectedItems, fpp)
  private def numHashes = BloomImpls.optimalHashes(fpp)

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(new Array[Long]((numBits + 63) / 64), numHashes)

  override def update(b: BloomBuffer, row: InternalRow): BloomBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BloomBuffer, o: BloomBuffer): BloomBuffer = { b.orWith(o); b }

  override def eval(b: BloomBuffer): Any = BloomImpls.serialize(b.bits, b.numHashes)

  override def serialize(b: BloomBuffer): Array[Byte] =
    BloomImpls.serialize(b.bits, b.numHashes)

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val bits = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < bits.length) { bits(i) = bb.getLong; i += 1 }
    new BloomBuffer(bits, k)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects BIGINT key, got ${child.dataType}")
  override def prettyName: String = "bloom_agg"
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(filter, key)` — probe a serialized Bloom
  * filter. False ⇒ definitely absent; true ⇒ maybe present. Codegen'd
  * as a static call so a fact-scan filter using it stays inside
  * whole-stage codegen. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (BINARY, BIGINT), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(f: Any, v: Any): Any =
    BloomImpls.mightContain(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, v) =>
      s"graft.functions.BloomImpls.mightContain($f, $v)")

  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
