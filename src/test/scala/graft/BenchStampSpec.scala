package graft

import org.scalatest.funsuite.AnyFunSuite

/** The degraded-window stamp must flip on ANY sick canary reading — start,
  * end, or a mid-run section probe (r13 verdict ask 5: r12's committed run
  * collapsed 732 → 242 M dist/s mid-run and still published clean because
  * only the bracketing probes were consulted at a floor/2 threshold).
  */
class BenchStampSpec extends AnyFunSuite {
  private val floor = 320e6 // Bench.CanaryCleanFloor

  test("all-clean readings publish clean") {
    assert(!Bench.degradedStamp(Seq(732e6, 500e6, 400e6, 330e6)))
  }

  test("a sick START flips the stamp") {
    assert(Bench.degradedStamp(Seq(100e6, 700e6, 700e6)))
  }

  test("a sick END flips the stamp") {
    assert(Bench.degradedStamp(Seq(700e6, 700e6, 120e6)))
  }

  test("a mid-run collapse flips the stamp even with clean brackets") {
    // the r12 failure shape: clean start, clean-ish end, sick interior
    assert(Bench.degradedStamp(Seq(732e6, 150e6, 400e6)))
  }

  test("threshold is floor/2, exclusive below") {
    assert(!Bench.degradedStamp(Seq(floor / 2)))
    assert(Bench.degradedStamp(Seq(floor / 2 - 1)))
  }

  test("no readings never stamps degraded") {
    assert(!Bench.degradedStamp(Seq.empty))
  }
}
