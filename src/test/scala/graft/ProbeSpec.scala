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

  test("parallel probe: all threads join, wall time positive, " +
    "thread count respected") {
    // 1 thread ≈ the kernel once; N threads do N× total work
    // concurrently — wall time must not scale anywhere near N× on a
    // multi-core box, and must not be zero (the sink forbids elision)
    val one = Bench.calibrationProbeParallel(1)
    val four = Bench.calibrationProbeParallel(4)
    assert(one > 0 && four > 0)
    // 4 threads of fixed work can be slower than 1, but never 4× the
    // single-thread time on a 32-core host (that would mean the
    // fan-out serialized — the probe would be blind to contention)
    assert(four < one * 4, s"one=$one four=$four")
  }
}
