package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate's status contract (r12): "flagged" exists between
  * "green" and "perf_regressed" so one drifting query in an
  * otherwise-faster round reads accurately — but it must NEVER be
  * reachable when the run failed, when more than two queries flag, or
  * when any available comparison says the run got slower overall. */
class BenchGateSpec extends AnyFunSuite {
  private def cmp(flagged: Int, ratio: Double, present: Boolean = true) =
    Bench.Cmp(if (present) "x" else "", flagged, ratio)

  test("zero flags and no failures is green") {
    assert(Bench.gateStatus(failed = false, cmp(0, 0.9), cmp(0, 0.8)) === "green")
    // no comparison files at all: nothing to flag, still green
    assert(Bench.gateStatus(failed = false, cmp(0, -1.0, present = false),
      cmp(0, -1.0, present = false)) === "green")
  }

  test("a failed query forces failed_queries regardless of flags") {
    assert(Bench.gateStatus(failed = true, cmp(0, 0.5), cmp(0, 0.5)) === "failed_queries")
  }

  test("one or two flags with both ratios improved is flagged, not regressed") {
    assert(Bench.gateStatus(failed = false, cmp(0, 0.9), cmp(1, 0.8)) === "flagged")
    assert(Bench.gateStatus(failed = false, cmp(1, 0.9), cmp(1, 0.95)) === "flagged")
  }

  test("flagged is NOT reachable when the run got slower overall") {
    assert(Bench.gateStatus(failed = false, cmp(0, 1.1), cmp(1, 0.8)) === "perf_regressed")
    assert(Bench.gateStatus(failed = false, cmp(1, 0.9), cmp(1, 1.2)) === "perf_regressed")
  }

  test("three or more flags is perf_regressed even when faster overall") {
    assert(Bench.gateStatus(failed = false, cmp(2, 0.9), cmp(1, 0.8)) === "perf_regressed")
    assert(Bench.gateStatus(failed = false, cmp(0, 0.9), cmp(3, 0.8)) === "perf_regressed")
  }

  test("missing prev snapshot: the baseline ratio decides the flagged band") {
    assert(Bench.gateStatus(failed = false, cmp(1, 0.9),
      cmp(0, -1.0, present = false)) === "flagged")
    assert(Bench.gateStatus(failed = false, cmp(1, 1.05),
      cmp(0, -1.0, present = false)) === "perf_regressed")
  }
}
