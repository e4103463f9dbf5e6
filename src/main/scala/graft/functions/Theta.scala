package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV / theta sketch kernels (Beyer et al. 2007, "On synopses for
  * distinct-value estimation"; the Dasgupta et al. theta-sketch
  * framework generalizes the set algebra).
  *
  * Where HLL ([[HllImpls]]) answers only UNION cardinalities, a KMV
  * sketch — the K smallest distinct hash values of the key set —
  * supports the full set algebra: INTERSECTION and DIFFERENCE
  * estimates between independently-built sketches, the "how many
  * users did both / stopped doing" questions a union-only sketch
  * cannot answer. This is the ClickHouse-ecosystem
  * `uniqTheta`/`uniqThetaIntersect` shape.
  *
  * Contracts:
  *  - Deterministic: seedless splitmix64 hash → the same key set
  *    always yields the byte-identical sketch.
  *  - Mergeable monoid: union = k-smallest of the concatenation,
  *    associative + commutative; rolling up per-day sketches is
  *    byte-identical to sketching the union directly (the k smallest
  *    distinct hashes of A∪B are a subset of kmin(A) ∪ kmin(B)).
  *  - EXACT below K: with fewer than K distinct keys the sketch IS
  *    the key-hash set, so estimates (incl. intersections between two
  *    sub-K sketches) are exact counts, not approximations.
  *  - Above K: relative standard error ≈ 1/√(K−2) ≈ 1.6% at K=4096.
  *
  * Serialized form: the retained hashes as big-endian longs, sorted
  * ascending UNSIGNED (the natural iteration order of the build set),
  * ≤ 8·K bytes. θ (the inclusion threshold) is not stored — it is
  * derivable: 1.0 when the sketch holds < K entries, else the
  * normalized K-th smallest (= last) entry.
  */
object ThetaImpls {

  /** Retained-minimum count: 4096 × 8 B = 32 KB full sketch, RSE ≈
    * 1/√(K−2) ≈ 1.6%. */
  val K: Int = 4096

  private val UNSIGNED: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  def newSet(): java.util.TreeSet[java.lang.Long] = new java.util.TreeSet(UNSIGNED)

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Normalized position of an unsigned 64-bit hash in [0,1), from its
    * top 53 bits (the full double precision available). */
  def norm(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  def add(set: java.util.TreeSet[java.lang.Long], key: Long): Unit = {
    val h = splitmix64(key)
    if (set.size < K) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
      if (set.add(h)) set.pollLast() // keep exactly the K smallest
      ()
    }
  }

  def mergeInto(into: java.util.TreeSet[java.lang.Long], bytes: Array[Byte]): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) {
      val h = bb.getLong
      if (into.size < K) into.add(h)
      else if (java.lang.Long.compareUnsigned(h, into.last) < 0) {
        if (into.add(h)) into.pollLast()
      }
    }
  }

  def serialize(set: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private def entries(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length / 8
    val out = new Array[Long](n)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** θ of a serialized sketch: 1.0 while exact (< K entries), else the
    * normalized largest retained hash. */
  private def theta(e: Array[Long]): Double =
    if (e.length < K) 1.0 else norm(e(e.length - 1))

  /** Distinct-count estimate: exact below K, else (K−1)/θ. */
  def estimate(bytes: Array[Byte]): Long = {
    val e = entries(bytes)
    if (e.length < K) e.length.toLong
    else math.rint((K - 1).toDouble / theta(e)).toLong
  }

  /** |A ∩ B| estimate: count shared hashes below θ = min(θA, θB),
    * scaled by 1/θ. Exact when both sketches are exact. Both inputs
    * are sorted unsigned-ascending → one linear merge pass. */
  def intersect(a: Array[Byte], b: Array[Byte]): Long = {
    val ea = entries(a); val eb = entries(b)
    val th = math.min(theta(ea), theta(eb))
    var i = 0; var j = 0; var shared = 0
    while (i < ea.length && j < eb.length) {
      val c = java.lang.Long.compareUnsigned(ea(i), eb(j))
      if (c == 0) {
        if (norm(ea(i)) < th) shared += 1 // th==1.0 (both exact) admits all
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    math.rint(shared.toDouble / th).toLong
  }

  /** |A \ B| estimate: hashes of A below θ = min(θA, θB) absent from
    * B, scaled by 1/θ. Exact when both sketches are exact. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Long = {
    val ea = entries(a); val eb = entries(b)
    val th = math.min(theta(ea), theta(eb))
    var i = 0; var j = 0; var only = 0
    while (i < ea.length) {
      while (j < eb.length && java.lang.Long.compareUnsigned(eb(j), ea(i)) < 0) j += 1
      val inB = j < eb.length && eb(j) == ea(i)
      if (!inB && norm(ea(i)) < th) only += 1 // th==1.0 (both exact) admits all
      i += 1
    }
    math.rint(only.toDouble / th).toLong
  }
}

final class ThetaBuffer(val set: java.util.TreeSet[java.lang.Long]) {
  def this() = this(ThetaImpls.newSet())
}

private[functions] trait ThetaAggBase extends TypedImperativeAggregate[ThetaBuffer] {
  override def createAggregationBuffer(): ThetaBuffer = new ThetaBuffer()
  override def merge(b: ThetaBuffer, o: ThetaBuffer): ThetaBuffer = {
    val it = o.set.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b.set.size < ThetaImpls.K) b.set.add(h)
      else if (java.lang.Long.compareUnsigned(h, b.set.last) < 0) {
        if (b.set.add(h)) b.set.pollLast()
      }
    }
    b
  }
  override def serialize(b: ThetaBuffer): Array[Byte] = ThetaImpls.serialize(b.set)
  override def deserialize(bytes: Array[Byte]): ThetaBuffer = {
    val b = new ThetaBuffer()
    ThetaImpls.mergeInto(b.set, bytes)
    b
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def eval(b: ThetaBuffer): Any = ThetaImpls.serialize(b.set)
}

/** `theta_sketch_agg(key)` — KMV theta sketch over a BIGINT key column
  * (map-side partial sketches, k-smallest merge after the shuffle) →
  * BINARY. Persist at the finest segment granularity; answer distinct
  * counts AND set-algebra questions across segments downstream. */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ThetaAggBase with UnaryLike[Expression] {

  override def update(b: ThetaBuffer, row: InternalRow): ThetaBuffer = {
    val v = child.eval(row)
    if (v != null) ThetaImpls.add(b.set, v.asInstanceOf[Long])
    b
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects BIGINT key, got ${child.dataType}")
  override def prettyName: String = "theta_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketch)` — roll persisted sketches up to a coarser
  * grouping → the merged BINARY sketch (NOT an estimate: unions stay
  * composable; apply [[ThetaEstimate]] for the number). Union-merge is
  * lossless w.r.t. the sketch contract, so rollup == direct sketch,
  * byte-identical. */
case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ThetaAggBase with UnaryLike[Expression] {

  override def update(b: ThetaBuffer, row: InternalRow): ThetaBuffer = {
    val v = child.eval(row)
    if (v != null) ThetaImpls.mergeInto(b.set, v.asInstanceOf[Array[Byte]])
    b
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects BINARY sketch, got ${child.dataType}")
  override def prettyName: String = "theta_union_agg"
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketch)` — distinct-count estimate of a serialized
  * sketch (exact below K). Scalar, codegen'd. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects BINARY sketch, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    ThetaImpls.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaImpls.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect(a, b)` — |A ∩ B| estimate from two independently
  * built sketches (exact when both are below K). The capability HLL
  * fundamentally lacks. */
case class ThetaIntersect(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_intersect"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_intersect expects (BINARY, BINARY), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaImpls.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaImpls.intersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

/** `theta_a_not_b(a, b)` — |A \ B| estimate (exact when both sketches
  * are below K): the churn / exclusive-audience number. */
case class ThetaANotB(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_a_not_b"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_a_not_b expects (BINARY, BINARY), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaImpls.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaImpls.aNotB($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB =
    copy(left = l, right = r)
}
