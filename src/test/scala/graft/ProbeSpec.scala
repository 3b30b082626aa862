package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the bench calibration probes (fixed work, JIT-elision
  * sink, parallel fan-out) — measurement harness code deserves the
  * same spec coverage as operators: a probe that silently stops doing
  * its work would re-open the blind window class it exists to detect.
  */
class ProbeSpec extends AnyFunSuite {

  test("serial probe: fixed work, positive wall time, repeatable") {
    val a = Bench.calibrationProbe()
    val b = Bench.calibrationProbe()
    assert(a > 0 && b > 0)
    // both readings time the SAME deterministic work: on one machine
    // two back-to-back runs sit within an order of magnitude (this is
    // a sanity bound, not a band — the band lives in BENCH_NOTES)
    assert(math.max(a, b) / math.min(a, b) < 10, s"$a vs $b")
  }

  test("parallel probe: every thread completes and is counted, wall " +
    "time positive") {
    // NO wall-clock ratio asserts here: timing properties on a shared
    // host turn load into test failures (the exact condition the
    // probe exists to MEASURE, not to fail on). The concurrency
    // contract is the completion counter inside the probe — a lost
    // thread fails the require loudly instead of under-measuring.
    val one = Bench.calibrationProbeParallel(1)
    val four = Bench.calibrationProbeParallel(4)
    assert(one > 0 && four > 0)
  }
}
