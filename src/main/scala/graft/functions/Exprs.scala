package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column helpers shared by the operator library.
  *
  * Parity rules (see SURVEY.md §6): money math runs in exact decimal and
  * is cast to double only at the end, so Spark and the DuckDB oracle
  * produce bit-identical doubles regardless of aggregation order.
  * Portable hashing derives 60-bit integers from md5 prefixes, which
  * every SQL engine can reproduce.
  */
object Exprs {

  /** 2-decimal money column → exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** small 2-decimal rate (discount/tax) → exact decimal. */
  def rate2(c: Column): Column = c.cast(DecimalType(3, 2))

  /** exact decimal sum of a 2-decimal double column, emitted as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** `extendedprice * (1 - discount)` in exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(DecimalType(3, 2)) - rate2(discount))

  /** Portable 60-bit hash: first 15 hex chars of md5 as a long.
    * DuckDB equivalent: `CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT)`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** float array → double array (all vector math runs in double). */
  def vecAsDouble(arr: Column): Column = transform(arr, _.cast(DoubleType))

  /** Left-fold dot product — same fold order as the DuckDB
    * `list_reduce(list_prepend(0.0, ...))` oracle, so doubles match
    * bit-for-bit. Native VecDot expression: primitive loop, codegen'd,
    * no per-pair intermediate array. Inputs must be double arrays. */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Unit-normalized double vector: cosine becomes a single dot product
    * (compute once per vector, not 3 aggregates per pair). Native
    * one-pass kernel — the HOF formulation re-evaluates the norm
    * aggregate inside the lambda, O(d²) per vector. Division per
    * element is IEEE-identical on the oracle side. */
  def unit(a: Column): Column = graft.functions.vec_normalize(a)

  // ---- DuckDB SQL fragments mirroring the above (oracle side) ----

  /** DuckDB: element-wise double cast of a list column. */
  def sqlVecAsDouble(col: String): String =
    s"list_transform($col, x -> CAST(x AS DOUBLE))"

  /** DuckDB: left-fold dot product over two DOUBLE lists (1-based idx). */
  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"

  def sqlNormSq(a: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform($a, x -> x * x)), (acc, x) -> acc + x)"

  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlNormSq(a)}) * sqrt(${sqlNormSq(b)})))"

  /** DuckDB: unit-normalized double vector (mirrors [[unit]]). */
  def sqlUnit(a: String): String =
    s"list_transform($a, x -> x / sqrt(${sqlNormSq(a)}))"

  def sqlMd5Long(x: String): String =
    s"CAST(concat('0x', substring(md5($x), 1, 15)) AS BIGINT)"

  /** Driver-side twin of [[md5Long]]/[[sqlMd5Long]] — for deriving
    * SEEDED constants (projection planes, codebooks) both engines can
    * regenerate independently from the same string. */
  def md5Long15(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** The engine's shared ±1 seeded codebook: plane `j` element `i` is
    * +1 iff md5Long("j#i") is even — the same planes emb_project
    * projects onto and dedup_semantic clusters against. */
  def seededPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until dim).map(i => if (md5Long15(s"$j#$i") % 2 == 0) 1.0 else -1.0)
    }

  /** DuckDB literal for [[seededPlanes]] plane `j` (array of ±1). */
  def sqlSeededPlane(j: Int, dim: Int): String =
    (0 until dim).map { i =>
      s"CASE WHEN ${sqlMd5Long(s"'$j#$i'")} % 2 = 0 THEN 1.0 ELSE -1.0 END"
    }.mkString("[", ", ", "]")

  /** Product-quantization codebook: subspace `j`, codeword `c` → ±1
    * vector over `sub` dims, seeded in the 1000+ plane-id namespace
    * (disjoint from emb_project / dedup_semantic's planes 0..15).
    * Shared by the encode op and the ADC server — and regenerable by
    * the oracle via [[sqlPqPlane]], no shipped codebook. */
  def pqCodebook(m: Int, k: Int, sub: Int): IndexedSeq[IndexedSeq[Seq[Double]]] =
    IndexedSeq.tabulate(m)(j => IndexedSeq.tabulate(k)(c =>
      (0 until sub).map(i =>
        if (md5Long15(s"${1000 + j * k + c}#$i") % 2 == 0) 1.0 else -1.0)))

  /** DuckDB literal for [[pqCodebook]] codeword (j, c). */
  def sqlPqPlane(j: Int, c: Int, k: Int, sub: Int): String =
    sqlSeededPlane(1000 + j * k + c, sub)

  // ---- wrapping-64 arithmetic on DuckDB HUGEINT (oracle side) ----
  // The engine's hash kernels (HashImpls.rollingHash / mix64) run on
  // wrapping JVM Longs. DuckDB replicates them on unsigned-64 HUGEINT:
  // multiplies split at 2^32 so intermediates stay below 2^127, xor
  // round-trips through signed BIGINT. First used by the q_cms_freq
  // oracle (EventsAnalytics.scala); shared here for the fingerprint /
  // simhash oracles.

  /** 2^64 as a DuckDB literal. */
  val sqlM64 = "18446744073709551616"

  /** unsigned HUGEINT in [0, 2^64) → signed two's-complement BIGINT. */
  def sqlU2S(x: String): String =
    s"CAST($x - CASE WHEN $x >= 9223372036854775808 THEN $sqlM64 ELSE 0 END AS BIGINT)"

  /** signed BIGINT → unsigned HUGEINT in [0, 2^64). */
  def sqlS2U(x: String): String =
    s"(CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN $sqlM64 ELSE 0 END)"

  /** (y * c) mod 2^64 with y unsigned HUGEINT, c an unsigned literal;
    * split at 2^32 keeps every intermediate below 2^127. */
  def sqlMulMod(y: String, c: String): String =
    s"((($y % 4294967296) * $c + (($y // 4294967296) * $c % 4294967296) * 4294967296) % $sqlM64)"

  /** DuckDB: string column `src` as a codepoint list (−1 for the
    * empty-string artifact of regexp splitting). */
  def sqlCodepoints(src: String): String =
    s"list_transform(string_split_regex($src, ''), c -> CASE WHEN c = '' THEN -1 ELSE unicode(c) END)"

  /** DuckDB: a codepoint-list expression → its UTF-8 bytes as a
    * HUGEINT list, JVM-signed (−128..127) — the exact byte stream
    * HashImpls.rollingHash folds over. Factored from [[sqlUtf8Bytes]]
    * so per-gram oracles can SLICE one per-doc codepoint list instead
    * of regexp-splitting every gram. */
  def sqlCpUtf8Bytes(cps: String): String =
    s"""flatten(list_transform($cps, p -> CASE
       |    WHEN p < 0 THEN []
       |    WHEN p < 128 THEN [CAST(p AS HUGEINT)]
       |    WHEN p < 2048 THEN [CAST(192 + p // 64 - 256 AS HUGEINT), CAST(128 + p % 64 - 256 AS HUGEINT)]
       |    WHEN p < 65536 THEN [CAST(224 + p // 4096 - 256 AS HUGEINT), CAST(128 + (p // 64) % 64 - 256 AS HUGEINT), CAST(128 + p % 64 - 256 AS HUGEINT)]
       |    ELSE [CAST(240 + p // 262144 - 256 AS HUGEINT), CAST(128 + (p // 4096) % 64 - 256 AS HUGEINT), CAST(128 + (p // 64) % 64 - 256 AS HUGEINT), CAST(128 + p % 64 - 256 AS HUGEINT)] END))""".stripMargin

  /** DuckDB: the UTF-8 bytes of string column `src` as a HUGEINT list,
    * JVM-signed (−128..127). */
  def sqlUtf8Bytes(src: String): String = sqlCpUtf8Bytes(sqlCodepoints(src))

  /** DuckDB: HashImpls.rollingHash fold over a HUGEINT byte-list
    * expression, as an unsigned HUGEINT. */
  def sqlRollingHashUOverBytes(bytes: String): String =
    s"list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), $bytes), " +
      s"(h, b) -> ((h * 31 + b) % $sqlM64 + $sqlM64) % $sqlM64)"

  /** DuckDB: HashImpls.rollingHash over string column `src` —
    * h = h·31 + byte (mod 2^64) from seed 1125899906842597 — as an
    * unsigned HUGEINT. */
  def sqlRollingHashU(src: String): String =
    sqlRollingHashUOverBytes(sqlUtf8Bytes(src))

  /** DuckDB CTE chain replicating HashImpls.mix64 (the splitmix64
    * finalizer) on an unsigned HUGEINT column: reads `$inCol` from CTE
    * `$in`, carries `$carry` through, and ends with CTE `$out` holding
    * carry + `hs` (the mixed hash as a SIGNED BIGINT). Caller splices
    * this between two other CTE definitions. */
  def sqlMix64Ctes(carry: Seq[String], in: String, inCol: String, out: String): String = {
    val cs = carry.mkString(", ")
    s"""${out}_m1 AS (SELECT $cs, ($inCol + 11400714819323198485) % $sqlM64 AS x FROM $in),
       |${out}_m2 AS (SELECT $cs, ${sqlU2S("x")} AS sa, CAST(x // 1073741824 AS BIGINT) AS sb FROM ${out}_m1),
       |${out}_m3 AS (SELECT $cs, ${sqlS2U("xor(sa, sb)")} AS y FROM ${out}_m2),
       |${out}_m4 AS (SELECT $cs, ${sqlMulMod("y", "13787848793156543929")} AS x FROM ${out}_m3),
       |${out}_m5 AS (SELECT $cs, ${sqlU2S("x")} AS sa, CAST(x // 134217728 AS BIGINT) AS sb FROM ${out}_m4),
       |${out}_m6 AS (SELECT $cs, ${sqlS2U("xor(sa, sb)")} AS y FROM ${out}_m5),
       |${out}_m7 AS (SELECT $cs, ${sqlMulMod("y", "10723151780598845931")} AS x FROM ${out}_m6),
       |${out}_m8 AS (SELECT $cs, ${sqlU2S("x")} AS sa, CAST(x // 2147483648 AS BIGINT) AS sb FROM ${out}_m7),
       |$out AS (SELECT $cs, xor(sa, sb) AS hs FROM ${out}_m8)""".stripMargin
  }

}
