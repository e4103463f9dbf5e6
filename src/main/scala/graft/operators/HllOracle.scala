package graft.operators

/** DuckDB oracle SQL for the engine's HyperLogLog family.
  *
  * Replicates [[graft.functions.HllImpls]] exactly in SQL — the same
  * playbook that oracled `q_cms_freq`: the seedless splitmix64
  * finalizer runs on unsigned-HUGEINT wrapping arithmetic, the
  * register rank is an INTEGER bit-length (no floats), the register
  * sum Σ 2^(65−reg) is an exact HUGEINT that both engines convert to
  * double with one identical rounding, and the estimate formulas share
  * byte-identical expression text. Sketch merges need no special
  * handling: an HLL merge is element-wise max, so the merged registers
  * over any group equal the registers computed directly over the
  * group's value set — the oracle always takes the direct form.
  *
  * The one libm call (`ln` in the linear-counting branch) is safe
  * under the final `floor(est + 0.5)`: Java vs glibc/DuckDB `ln`
  * differ by ≤1 ulp on 4 of the 4096 possible inputs, and HllSpec pins
  * (exhaustively) that no `4096·ln(4096/z)` comes within 1e-4 of a
  * half-integer.
  */
object HllOracle {

  private val M64 = "18446744073709551616" // 2^64
  private def toS(x: String) =
    s"CAST($x - CASE WHEN $x >= 9223372036854775808 THEN $M64 ELSE 0 END AS BIGINT)"
  private def toU(x: String) =
    s"(CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN $M64 ELSE 0 END)"
  private def mulmod(y: String, c: String) =
    s"((($y % 4294967296) * $c + (($y // 4294967296) * $c % 4294967296) * 4294967296) % $M64)"

  /** CTE chain from `<p>src(<g>, v BIGINT)` to `<p>est(<g>, approx BIGINT)`.
    * Embed as: `WITH ${p}src AS (...), ${HllOracle.cte("g")} SELECT ... FROM ${p}est`.
    * @param g comma-separated group column list as it appears in the src CTE
    * @param p CTE-name prefix — distinct per instantiation when one oracle
    *          carries two sketch columns (default "h")
    */
  def cte(g: String, p: String = "h"): String =
    s"""${p}m1 AS (SELECT $g, (${toU("v")} + 11400714819323198485) % $M64 AS x FROM ${p}src),
       |${p}m2 AS (SELECT $g, ${toS("x")} AS sa, CAST(x // 1073741824 AS BIGINT) AS sb FROM ${p}m1),
       |${p}m3 AS (SELECT $g, ${toU("xor(sa, sb)")} AS y FROM ${p}m2),
       |${p}m4 AS (SELECT $g, ${mulmod("y", "13787848793156543929")} AS x FROM ${p}m3),
       |${p}m5 AS (SELECT $g, ${toS("x")} AS sa, CAST(x // 134217728 AS BIGINT) AS sb FROM ${p}m4),
       |${p}m6 AS (SELECT $g, ${toU("xor(sa, sb)")} AS y FROM ${p}m5),
       |${p}m7 AS (SELECT $g, ${mulmod("y", "10723151780598845931")} AS x FROM ${p}m6),
       |${p}m8 AS (SELECT $g, ${toS("x")} AS sa, CAST(x // 2147483648 AS BIGINT) AS sb FROM ${p}m7),
       |${p}h AS (SELECT $g, ${toU("xor(sa, sb)")} AS h FROM ${p}m8),
       |${p}rk AS (SELECT $g, CAST(h // 4503599627370496 AS INT) AS idx,
       |               CAST(h % 4503599627370496 AS BIGINT) AS t FROM ${p}h),
       |${p}reg AS (SELECT $g, idx,
       |                max(CASE WHEN t = 0 THEN 65 ELSE 53 - length(bin(t)) END) AS reg
       |         FROM ${p}rk GROUP BY ALL),
       |${p}sum AS (SELECT $g,
       |                sum(CAST(1 AS HUGEINT) << (65 - reg))
       |                  + (4096 - count(*)) * (CAST(1 AS HUGEINT) << 65) AS s,
       |                4096 - count(*) AS zeros
       |         FROM ${p}reg GROUP BY ALL),
       |${p}inv AS (SELECT $g, zeros,
       |                (CAST(s // 4294967296 AS DOUBLE) * 4294967296.0
       |                  + CAST(s % 4294967296 AS DOUBLE)) / 36893488147419103232.0 AS inv
       |         FROM ${p}sum),
       |${p}raw AS (SELECT $g, zeros,
       |                (0.7213 / (1.0 + 1.079 / 4096.0)) * 16777216.0 / inv AS raw
       |         FROM ${p}inv),
       |${p}est AS (SELECT $g,
       |                CAST(floor((CASE WHEN raw <= 10240.0 AND zeros > 0
       |                            THEN 4096.0 * ln(4096.0 / zeros)
       |                            ELSE raw END) + 0.5) AS BIGINT) AS approx
       |         FROM ${p}raw)""".stripMargin
}
