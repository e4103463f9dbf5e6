package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Count-Min sketch kernels (Cormode & Muthukrishnan 2005) — the
  * frequency-point-query member of the sketch tier: "how many times
  * did THIS key appear" in sublinear space, where SpaceSaving answers
  * "which keys appeared most" and HLL/bitmap answer "how many distinct
  * keys". D×W counter matrix; each of the D rows hashes the key to one
  * counter and adds; the estimate is the MIN over rows, so it
  * overestimates only (never under), by ≤ ⌈e·N/W⌉ with probability
  * ≥ 1−e^−D. Counter-wise ADDITION is the merge — a commutative
  * monoid, so sketches built map-side partial-merge through the
  * shuffle exactly like the other tiers, and a fine-grained rollup
  * table re-merges to coarser groupings without rescanning facts.
  *
  * Deterministic (fixed per-row seed mix over the same splitmix64 the
  * HLL tier uses) — the same multiset always yields the byte-identical
  * sketch, so rollup laws are testable as exact equalities.
  */
object CmImpls {

  /** Depth (hash rows): error probability e^−4 ≈ 1.8%. */
  val D: Int = 4

  /** Width (counters per row): ε = e/W ≈ 0.13% of stream size N.
    * D×W longs = 64 KB per sketch. */
  val W: Int = 2048

  val Bytes: Int = D * W * 8

  private val Seeds: Array[Long] = Array(
    0x9e3779b97f4a7c15L, 0xc2b2ae3d27d4eb4fL,
    0x165667b19e3779f9L, 0x27d4eb2f165667c5L)

  private def idx(row: Int, value: Long): Int =
    row * W + ((HashImpls.mix64(value ^ Seeds(row)) >>> 1) % W).toInt

  def add(counts: Array[Long], value: Long, inc: Long): Unit = {
    var r = 0
    while (r < D) { counts(idx(r, value)) += inc; r += 1 }
  }

  def merge(a: Array[Long], b: Array[Long]): Unit = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
  }

  /** A CM sketch wire form is exactly D×W longs; anything else (a
    * truncated buffer, or an HLL/theta BINARY passed by mistake) must
    * fail with a diagnosable error, not a raw buffer exception — and an
    * oversized buffer must not be silently accepted with its tail
    * ignored. */
  def checkWire(bytes: Array[Byte]): Unit =
    require(bytes.length == Bytes,
      s"not a cm sketch: expected $Bytes bytes (D=$D × W=$W longs), got ${bytes.length}")

  def estimate(bytes: Array[Byte], value: Long): Long = {
    checkWire(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var est = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = bb.getLong(idx(r, value) * 8)
      if (c < est) est = c
      r += 1
    }
    est
  }

  def serialize(counts: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Bytes)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    checkWire(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](D * W)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(i * 8); i += 1 }
    out
  }
}

final class CmBuffer(val counts: Array[Long]) extends Serializable {
  def this() = this(new Array[Long](CmImpls.D * CmImpls.W))
}

private[functions] trait CmAggBase extends TypedImperativeAggregate[CmBuffer] {
  override def createAggregationBuffer(): CmBuffer = new CmBuffer()
  override def merge(b: CmBuffer, o: CmBuffer): CmBuffer = {
    CmImpls.merge(b.counts, o.counts); b
  }
  override def serialize(b: CmBuffer): Array[Byte] = CmImpls.serialize(b.counts)
  override def deserialize(bytes: Array[Byte]): CmBuffer =
    new CmBuffer(CmImpls.deserialize(bytes))
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
}

/** `cm_sketch_agg(key)` — build the 64 KB Count-Min sketch over a
  * BIGINT key column (each row counts once). BINARY out; persist at
  * the finest grouping and probe with [[CmEstimate]]. */
case class CmSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends CmAggBase with UnaryLike[Expression] {

  override def update(b: CmBuffer, row: InternalRow): CmBuffer = {
    val v = child.eval(row)
    if (v != null) CmImpls.add(b.counts, v.asInstanceOf[Long], 1L)
    b
  }
  override def eval(b: CmBuffer): Any = CmImpls.serialize(b.counts)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_sketch_agg expects BIGINT key, got ${child.dataType}")
  override def prettyName: String = "cm_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmSketchAgg =
    copy(child = newChild)
}

/** `cm_merge_agg(sketch)` — re-aggregate persisted sketches to a
  * coarser grouping by counter-wise addition; returns the merged
  * sketch (BINARY). Lossless: merging per-day sketches equals
  * sketching the concatenated stream, byte for byte. */
case class CmMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends CmAggBase with UnaryLike[Expression] {

  override def update(b: CmBuffer, row: InternalRow): CmBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      CmImpls.checkWire(bytes)
      // in-place add against the wire form: no intermediate array
      val bb = java.nio.ByteBuffer.wrap(bytes)
      var i = 0
      while (i < b.counts.length) { b.counts(i) += bb.getLong(i * 8); i += 1 }
    }
    b
  }
  override def eval(b: CmBuffer): Any = CmImpls.serialize(b.counts)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_merge_agg expects BINARY sketch, got ${child.dataType}")
  override def prettyName: String = "cm_merge_agg"
  override def withNewMutableAggBufferOffset(o: Int): CmMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmMergeAgg =
    copy(child = newChild)
}

/** `cm_estimate(sketch, key)` — frequency point query: min over the D
  * counter rows. Scalar, codegen'd ([[HllEstimate]] shape). */
case class CmEstimate(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cm_estimate expects (BINARY, BIGINT), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    CmImpls.estimate(sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.functions.CmImpls.estimate($s, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}
