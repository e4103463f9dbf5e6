package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog kernels shared by the two aggregates (build and
  * re-merge).
  *
  * Standard HLL (Flajolet et al. 2007) with the linear-counting
  * small-range correction: 2^p byte registers, register index = top p
  * bits of a splitmix64 hash, rank = leading-zero count of the
  * remaining bits + 1. Deterministic — no per-run seed — so the same
  * key set always yields the byte-identical sketch, and a sketch is an
  * abelian monoid under element-wise max (the merge). This is the
  * ClickHouse `uniqCombined` / `uniqState`→`uniqMerge` shape: build
  * tiny sketches at FINE granularity once, answer every COARSER
  * distinct-count rollup by merging sketches — never rescanning the
  * fact data.
  */
object HllImpls {

  /** Register-count exponent: 2^12 = 4096 registers = 4 KB per sketch,
    * standard error 1.04/√4096 ≈ 1.6%. */
  val P: Int = 12
  val M: Int = 1 << P

  // Bias-correction constant α_m for m ≥ 128 (Flajolet et al. §4).
  private val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def add(regs: Array[Byte], value: Long): Unit = {
    val h = splitmix64(value)
    val idx = (h >>> (64 - P)).toInt
    // rank over the low 64-P bits: shift them to the top, count zeros
    val rank = (java.lang.Long.numberOfLeadingZeros(h << P) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  def merge(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** Raw HLL estimate with the linear-counting switch below 2.5m.
    *
    * Cross-engine deterministic by construction (this is what makes the
    * HLL family ORACLE-checkable in DuckDB, not just spec-covered):
    * Σ 2^-reg is accumulated EXACTLY as the 128-bit integer
    * Σ 2^(65-reg) in (hi·2^32 + lo) form — an order-free integer sum,
    * not a float fold — then converted to double with a single IEEE
    * rounding (hi exact ≤2^45, ×2^32 exact scaling, +lo<2^32 is one
    * correctly-rounded add; DuckDB's `hi*2^32 + lo` does the identical
    * operation on the identical integers). Every later step is one
    * shared-text double formula (`Alpha·16777216/inv`, the 10240
    * branch test, `4096·ln(4096/z)`), and the final `floor(est+0.5)`
    * absorbs the only libm divergence: Java `Math.log` and glibc/DuckDB
    * `ln` differ by 1 ulp on 4 of the 4096 possible linear-counting
    * inputs, while the closest any `4096·ln(4096/z)` gets to a
    * half-integer is 1.07e-4 (exhaustive, pinned in HllSpec) — eleven
    * orders of magnitude of margin. */
  def estimate(regs: Array[Byte]): Long = {
    var hi = 0L // units of 2^32, holds terms 2^(65-reg) for reg ≤ 33
    var lo = 0L // units of 1,    holds terms 2^(65-reg) for reg ≥ 34
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = regs(i)
      if (r == 0) { zeros += 1; hi += 1L << 33 }
      else if (r <= 33) hi += 1L << (33 - r)
      else lo += 1L << (65 - r)
      i += 1
    }
    hi += lo >>> 32
    lo &= 0xffffffffL
    // ÷ 2^65 is exact scaling; the literal parses to exactly 2^65.
    val inv = (hi.toDouble * 4294967296.0 + lo.toDouble) / 36893488147419103232.0
    val raw = Alpha * 16777216.0 / inv // α · m², m² spelled as a literal (oracle parity)
    val est =
      if (raw <= 10240.0 && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else raw
    math.floor(est + 0.5).toLong
  }
}

final class HllBuffer(val regs: Array[Byte]) extends Serializable {
  def this() = this(new Array[Byte](HllImpls.M))
}

private[functions] trait HllAggBase extends TypedImperativeAggregate[HllBuffer] {
  override def createAggregationBuffer(): HllBuffer = new HllBuffer()
  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = {
    HllImpls.merge(b.regs, o.regs); b
  }
  override def serialize(b: HllBuffer): Array[Byte] = b.regs.clone()
  override def deserialize(bytes: Array[Byte]): HllBuffer = new HllBuffer(bytes.clone())
  override def nullable: Boolean = false
}

/** `hll_sketch_agg(key)` — build the 4 KB HLL sketch over a BIGINT key
  * column (map-side partial sketches, element-wise-max merged after the
  * shuffle). Returns the sketch as BINARY — persist it in a rollup
  * table keyed at the finest granularity you'll ever query. */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase with UnaryLike[Expression] {

  override def update(b: HllBuffer, row: InternalRow): HllBuffer = {
    val v = child.eval(row)
    if (v != null) HllImpls.add(b.regs, v.asInstanceOf[Long])
    b
  }

  override def eval(b: HllBuffer): Any = b.regs.clone()
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch_agg expects BIGINT key, got ${child.dataType}")
  override def prettyName: String = "hll_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** `hll_merge_agg(sketch)` — re-aggregate persisted sketches (BINARY
  * columns from [[HllSketchAgg]]) to a coarser grouping and return the
  * merged ESTIMATE as BIGINT. Merging is exact with respect to the
  * sketches (element-wise max loses nothing), so rolling up per-day
  * sketches to a month equals sketching the month directly —
  * byte-identical, not approximately. */
case class HllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase with UnaryLike[Expression] {

  override def update(b: HllBuffer, row: InternalRow): HllBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == HllImpls.M,
        s"hll_merge_agg: sketch must be ${HllImpls.M} bytes, got ${regs.length}")
      HllImpls.merge(b.regs, regs)
    }
    b
  }

  override def eval(b: HllBuffer): Any = HllImpls.estimate(b.regs)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge_agg expects BINARY sketch, got ${child.dataType}")
  override def prettyName: String = "hll_merge_agg"
  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** `hll_estimate(sketch)` — distinct-count estimate of ONE serialized
  * sketch, per row (no re-aggregation). Scalar, codegen'd — the
  * [[ThetaEstimate]] shape for the HLL tier. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects BINARY sketch, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    HllImpls.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllImpls.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
