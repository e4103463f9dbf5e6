package graft.tools

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The pre-libm round-snap guard, executable (SURVEY §6, r15; AD
  * advice r14).
  *
  * House lesson: `round(x, n)` with n > 0 on a double is an exact-
  * DECIMAL operation in Spark (BigDecimal HALF_UP on the binary
  * value) but a float ×10ⁿ/round/÷10ⁿ rescale in DuckDB — the two can
  * differ by one grid step at binary-representation midpoints. Fed
  * into a libm function (ln/exp/sqrt/pow/...), that one-step wobble
  * AMPLIFIES into a visibly different emitted value (the Anderson-
  * Darling ln-term creep the r14 advice flagged); emitted directly,
  * the wobble is confined to the last printed digit of a display
  * column and the surviving 2dp/6dp/10dp grid-snap sites are
  * hash-pinned every round (and the deliberate recursion snaps —
  * EWMA/Holt 10dp — round on BOTH engine texts at the same point, so
  * they stay in lockstep). Scale-0 round is fully deterministic
  * cross-engine (no rescale; both engines round the identical double
  * half-away to an exactly representable integer).
  *
  * Contract enforced here: NO Round with scale > 0 may appear inside
  * the argument subtree of a libm-class function, in either engine
  * text. Use `floor(x * grid) / grid` (IEEE-deterministic) when a
  * value must be snapped before transcendental math.
  */
object RoundScan {

  /** prettyName set of the transcendental kernels whose inputs must
    * never be decimal-grid round()s. */
  private val LibmNames = Set(
    "ln", "log", "log10", "log2", "log1p", "exp", "expm1", "sqrt", "cbrt",
    "power", "pow", "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh")

  private def posScaleRounds(e: Expression): Seq[Round] = e.collect {
    case r @ Round(_, Literal(scale: Int, _), _) if scale > 0 => r
  }

  /** Round(scale>0) nodes under a libm call's argument subtree. */
  def sparkViolations(plan: LogicalPlan): Seq[String] =
    plan.collect { case node =>
      node.expressions.flatMap(_.collect {
        case e if LibmNames.contains(e.prettyName.toLowerCase) =>
          e.children.flatMap(posScaleRounds)
            .map(r => s"${e.prettyName}(.. round(${r.child.simpleString(3)}, ${r.scale.sql}) ..)")
      }.flatten)
    }.flatten

  /** Banned round() sites in an oracle SQL text: a round(x, n>0) call
    * lexically inside a libm call's parentheses. */
  def oracleViolations(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val lower = sql.toLowerCase
    // paren stack of enclosing call names ("" for plain parens)
    val stack = scala.collection.mutable.Stack.empty[String]
    var i = 0
    while (i < lower.length) {
      lower(i) match {
        case '\'' =>
          // skip string literals ('' is the escaped quote) — a paren
          // inside a regex/text literal must not unbalance the stack
          i += 1
          while (i < lower.length &&
              !(lower(i) == '\'' && (i + 1 >= lower.length || lower(i + 1) != '\''))) {
            if (lower(i) == '\'' && i + 1 < lower.length && lower(i + 1) == '\'') i += 1
            i += 1
          }
        case '"' =>
          // skip double-quoted identifiers ("" is the escaped quote) —
          // a paren inside a quoted column name must not fail the scan
          // open by unbalancing the stack
          i += 1
          while (i < lower.length &&
              !(lower(i) == '"' && (i + 1 >= lower.length || lower(i + 1) != '"'))) {
            if (lower(i) == '"' && i + 1 < lower.length && lower(i + 1) == '"') i += 1
            i += 1
          }
        case '-' if i + 1 < lower.length && lower(i + 1) == '-' =>
          // skip '--' line comments: commented-out parens must not
          // desync the paren stack (fail-open under-reporting)
          while (i < lower.length && lower(i) != '\n') i += 1
        case '(' =>
          // name directly before this paren (SQL allows whitespace
          // between a call name and its paren: `ln (x)` is a libm call)
          var j = i - 1
          while (j >= 0 && Character.isWhitespace(lower(j))) j -= 1
          val nameEnd = j + 1
          while (j >= 0 && (Character.isLetterOrDigit(lower(j)) || lower(j) == '_')) j -= 1
          val name = lower.substring(j + 1, nameEnd)
          if (name == "round" && stack.exists(LibmNames.contains)) {
            // capture the call text for the message; scale check below
            var k = i + 1
            var depth = 1
            while (depth > 0 && k < sql.length) {
              sql(k) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
              k += 1
            }
            val args = sql.substring(i + 1, k - 1)
            // top-level second arg must be a positive integer to count
            var d = 0
            var lastComma = -1
            args.zipWithIndex.foreach {
              case ('(', _) => d += 1
              case (')', _) => d -= 1
              case (',', p) if d == 0 => lastComma = p
              case _ =>
            }
            val scaleTxt = if (lastComma < 0) "" else args.substring(lastComma + 1).trim
            if (scaleTxt.matches("[1-9][0-9]*"))
              out += s"${stack.find(LibmNames.contains).get}(.. round($args) ..)"
          }
          stack.push(name)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  /** CLI: scan every registered op; print violations. */
  def main(cliArgs: Array[String]): Unit = {
    val sfDir = if (cliArgs.nonEmpty) cliArgs(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.allOps.foreach { op =>
      val sv = sparkViolations(op.run(spark, sfDir).queryExecution.analyzed)
      val ov = op.oracle.toSeq.flatMap(oracleViolations)
      if (sv.nonEmpty || ov.nonEmpty) {
        bad += 1
        println(s"[roundscan] ${op.name}: spark=${sv.mkString("; ")} oracle=${ov.mkString("; ")}")
      }
    }
    println(s"[roundscan] flagged=$bad")
    spark.stop()
  }
}
