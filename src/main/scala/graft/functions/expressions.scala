package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** RollingHash64(text) — native Catalyst expression: 64-bit polynomial
  * hash over the string's UTF-8 bytes. Codegen emits a call into the
  * shared kernel, so it participates in whole-stage codegen.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** WordShingles(text, n) — native distinct word-n-gram shingling:
  * one pass, no lambda re-evaluation. Output order is first-seen. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** NfcNormalize(text) — Unicode NFC composition as a native
  * expression (Spark ships no normalizer function; DuckDB twin:
  * `nfc_normalize`). ASCII input short-circuits without allocating. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** VecNormalize(array<double>) — one-pass unit normalization; fold
  * order matches the SQL-oracle formulation bit-for-bit. */
case class VecNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "vec_normalize"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
}

/** VecDot(array<double>, array<double>) — native dot product with a
  * primitive kernel; fold order matches the HOF formulation so results
  * are bit-identical to the SQL oracle. */
case class VecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.dotDouble($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** LshBuckets(array<double>) — all `tables` random-hyperplane LSH
  * bucket ids in one vector scan (bit-packed ±1 plane masks; per-plane
  * dot fold order identical to VecDot against the literal plane, so
  * the md5-seeded DuckDB oracle replays the exact signatures). */
case class LshBuckets(child: Expression, seedBase: Int, tables: Int, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.lshBuckets(input.asInstanceOf[ArrayData], seedBase, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls.lshBuckets($c, $seedBase, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** JaroWinkler(left, right) — native Jaro-Winkler similarity,
  * bit-identical to DuckDB's `jaro_winkler_similarity` (see the
  * kernel's contract notes). Codegen'd, so blocked fuzzy joins keep
  * the whole-stage span through the similarity filter. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

/** Mix64(bigint) — the splitmix64 finalizer as a native expression:
  * the engine's deterministic pseudo-shuffle key (epoch reshuffles,
  * salting). Codegen'd; DuckDB twin is Exprs.sqlMix64Ctes. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.mix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** DeflateSize(text) — deflated byte count of the string's UTF-8
  * bytes (zlib level 6): the compressibility quality signal, as a
  * codegen'd expression so the per-row native kernel stays inside the
  * whole-stage span. Engine-private byte count → rows-only ops. */
case class DeflateSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

/** WinnowStats(text, k, w) — MOSS winnowing fingerprint statistics
  * [n_grams, n_windows, n_selected] in one O(len) pass per document
  * (k-char-gram rolling hashes + monotonic-deque window min), instead
  * of exploding every char position through an exchange and a window
  * operator. Codegen'd kernel call keeps the whole-stage span. */
case class WinnowStats(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_stats"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.winnowStats(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.winnowStats($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

/** TokenWindowHashes(array<string>, w) — Rabin-Karp window hashes:
  * out(i) = 64-bit hash of tokens [i, i+w) for every start position,
  * one md5 per TOKEN plus an O(1) rolling update per position (vs
  * md5 over the joined w-token span text per position — O(w·tokens)
  * hashing). The ExactSubstr kernel; codegen'd so the window scan
  * stays inside the whole-stage span. */
case class TokenWindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.windowHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.windowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

/** SimHash64(array<string>) — native Catalyst expression: 64-bit
  * SimHash over a token array (per-token splitmix64, per-bit voting).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
