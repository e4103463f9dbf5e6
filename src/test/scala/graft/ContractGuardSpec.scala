package graft

import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver compare — the two failure classes
  * that shipped silently in r13 and can never ship again:
  *
  *  1. DUPLICATE KEYS: `SparkEntry.queries` is a last-wins Map, so two
  *     ops sharing a name silently unregister one of them (five ops
  *     were shadowed in r13). `SparkEntry.allOps` now `require`s
  *     uniqueness; this spec pins it as a named test.
  *  2. DECIMAL EMITS: the driver reads the Spark parquet via pyarrow,
  *     where a DECIMAL(38,0) column materializes as decimal.Decimal
  *     objects while the DuckDB oracle side coerces to float64 — the
  *     dtype-tagged hash compare can then never match (14 r13 reds).
  *     House rule: decimals are intermediates only; emitted schemas
  *     carry DOUBLE or BIGINT. This spec walks every registered op's
  *     OUTPUT schema and fails on any DecimalType field.
  */
class ContractGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("GraftOp names are unique (a collision would shadow a live op)") {
    val names = SparkEntry.allOps.map(_.name)
    val dup = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dup.isEmpty, s"duplicate op names: ${dup.mkString(", ")}")
  }

  test("no registered op emits a DecimalType column (driver-compare hazard)") {
    val offenders = SparkEntry.allOps.flatMap { op =>
      val dec = op.run(spark, sf).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType])
      if (dec.isEmpty) Nil
      else Seq(s"${op.name}(${dec.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"decimal-typed emits (cast to DOUBLE/BIGINT): ${offenders.mkString("; ")}")
  }

  test("SURVEY §2 row ids are unique (the judge's checklist keys off them)") {
    val lines = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    var in2 = false
    val ids = scala.collection.mutable.ArrayBuffer.empty[String]
    val rowId = """^\|\s*([0-9]+[a-z0-9]*)\s*\|""".r
    lines.foreach { l =>
      if (l.matches("^##\\s+§?2\\b.*")) in2 = true
      else if (l.startsWith("## ")) in2 = false
      else if (in2) rowId.findFirstMatchIn(l).foreach(m => ids += m.group(1))
    }
    assert(ids.nonEmpty, "found no §2 rows — did the section heading move?")
    val dup = ids.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dup.isEmpty, s"duplicate §2 row ids: ${dup.mkString(", ")}")
  }

  test("no round(scale>0) inside a libm kernel's arguments, in either engine text") {
    // the pre-libm input-snap class (Anderson-Darling creep, r14 AD
    // advice): a decimal-grid round can wobble one grid step between
    // engines, and a downstream ln/exp/sqrt amplifies the wobble.
    // Emit-rounding and the deliberate lockstep recursion snaps
    // (EWMA/Holt 10dp, both texts rounding at the same point) pass.
    val offenders = SparkEntry.allOps.flatMap { op =>
      val sv = graft.tools.RoundScan.sparkViolations(
        op.run(spark, sf).queryExecution.analyzed)
      val ov = op.oracle.toSeq.flatMap(graft.tools.RoundScan.oracleViolations)
      if (sv.isEmpty && ov.isEmpty) Nil
      else Seq(s"${op.name}: ${(sv ++ ov).mkString("; ")}")
    }
    assert(offenders.isEmpty, s"pre-libm round snaps: ${offenders.mkString(" | ")}")
  }

  test("the round-snap guard goes red on a planted pre-libm snap") {
    import org.apache.spark.sql.functions._
    val planted = spark.range(1).select(exp(round(col("id") * 1.1, 6)).as("x"))
    assert(graft.tools.RoundScan.sparkViolations(planted.queryExecution.analyzed).nonEmpty,
      "Spark-side guard missed exp(round(x, 6))")
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT exp(round(x * 1.1, 6)) AS x FROM t").nonEmpty,
      "oracle-side guard missed exp(round(x, 6))")
    // allowed classes stay allowed: emit rounding, scale-0 inside libm
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT round(cos, 6) AS c, ln(round(x)) AS l, sqrt(round(y, 0) + 1) AS s FROM t").isEmpty)
    // parens inside string literals must not unbalance the scan: this
    // ln( closes before the round, so the round is NOT inside it
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT ln(regexp_extract(t, '([0-9]+)')) AS a, round(x, 6) AS b FROM t").isEmpty)
    val ok = spark.range(1).select(round(exp(col("id") * 1.1), 6).as("x"))
    assert(graft.tools.RoundScan.sparkViolations(ok.queryExecution.analyzed).isEmpty,
      "round OF a libm result is the emit class, not an input snap")
    // r16 hardening (r15 advice): the lexical guard must not fail OPEN
    // on whitespace-before-paren calls, '--' comments, or double-quoted
    // identifiers containing parens
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT ln (round(x * 1.1, 6)) AS a FROM t").nonEmpty,
      "guard missed 'ln (…)' with whitespace before the paren")
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT -- ln(\n  exp(round(x * 1.1, 6)) AS a FROM t").nonEmpty,
      "a '--' comment desynced the paren stack (fail-open)")
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT \"weird (col\" AS c, exp(round(x * 1.1, 6)) AS a FROM t").nonEmpty,
      "a double-quoted identifier with a paren desynced the stack (fail-open)")
    assert(graft.tools.RoundScan.oracleViolations(
      "SELECT x -- exp(round(y, 6))\nFROM t").isEmpty,
      "a fully commented-out violation must not flag")
  }
}
