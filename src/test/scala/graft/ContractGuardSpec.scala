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
}
