package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the bench calibration probes (fixed work, JIT-elision
  * sink, parallel fan-out) — measurement harness code deserves the
  * same spec coverage as operators: a probe that silently stops doing
  * its work would re-open the blind window class it exists to detect.
  */
class ProbeSpec extends AnyFunSuite {

  test("serial probe: fixed work, positive wall time, repeatable") {
    // NO wall-clock ratio assert (r17, ADVICE): a timing band on a
    // shared host turns load into a test failure — the exact condition
    // the probe exists to MEASURE (the parallel test's stance, applied
    // here too; the first run is also pre-JIT relative to the second).
    // The probe's contract is the sink require inside it: lost work
    // fails loudly there.
    val a = Bench.calibrationProbe()
    val b = Bench.calibrationProbe()
    assert(a > 0 && b > 0)
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
