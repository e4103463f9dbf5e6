package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run-to-run determinism for every op the DuckDB oracle can NOT
  * check (the rows-only set: seeded sampling, sketches, ANN, stub
  * decode, index statistics). Reproducibility is the property dataset
  * curation actually needs from these — same input, same output, every
  * run — and nothing else asserts it. The persisted-plan registry is
  * cleared between runs so the second run rebuilds from scratch
  * instead of replaying a cached result. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every rows-only op is run-to-run deterministic") {
    val rowsOnly = SparkEntry.allOps.filter(_.oracle.isEmpty)
    assert(rowsOnly.nonEmpty)
    val failures = rowsOnly.flatMap { op =>
      def snapshot(): Seq[String] = {
        CachedPlans.clear(spark)
        op.run(spark, sf).collect().map(_.toString).sorted.toSeq
      }
      val a = snapshot()
      val b = snapshot()
      if (a == b) None
      else Some(s"${op.name}: run1 ${a.length} rows != run2 ${b.length} rows " +
        s"(first diff: ${a.zip(b).find { case (x, y) => x != y }})")
    }
    CachedPlans.clear(spark)
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
