package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.IntegerLn

/** Laws for the fixed-point integer ln kernel — the libm-free drift
  * scoring tail (r14). Three layers:
  *   1. the Spark SQL stage text computes EXACTLY the intended integer
  *      recurrence (vs the pure-Scala mirror `lnRatio9Ref`) — a
  *      transcription typo in the expression strings is an exact
  *      mismatch, not a tolerance miss;
  *   2. the recurrence approximates `Math.log` to ≤ 1e-7 absolute
  *      (VERDICT r13's prescribed spec law) across counts, inverses,
  *      near-1 ratios, drift-shaped smoothed products, and 2^62
  *      extremes;
  *   3. structural facts: exact zero on equal operands, antisymmetric
  *      within the tolerance, every internal division nonnegative (by
  *      the overflow/sign audit in the kernel scaladoc — asserted here
  *      via the ref mirror on adversarial operands).
  */
class IntegerLnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(20260815L)
    val fixed = Seq[(Long, Long)](
      (1L, 1L), (2L, 1L), (1L, 2L), (7L, 3L), (3L, 7L),
      (1000003L, 1000000L), (1L, 1L << 62), ((1L << 62), 1L),
      ((1L << 62) - 1, (1L << 62) - 3), (999999937L, 1L), (1L, 97L),
      (1000000000000000000L, 999999999999999999L))
    val wide = Seq.fill(120)((1L + math.abs(rng.nextLong()) % ((1L << 62) - 1),
      1L + math.abs(rng.nextLong()) % ((1L << 62) - 1)))
    val small = Seq.fill(120)((1L + rng.nextInt(1000000).toLong,
      1L + rng.nextInt(1000000).toLong))
    // drift-shaped: (c_ref+1)(n_cur+B) vs (c_cur+1)(n_ref+B)
    val drift = Seq.fill(120) {
      val n1 = 100L + rng.nextInt(10000000)
      val n2 = 100L + rng.nextInt(10000000)
      val b = 2L + rng.nextInt(99)
      ((1L + rng.nextLong(n1)) * (n2 + b), (1L + rng.nextLong(n2)) * (n1 + b))
    }
    fixed ++ wide ++ small ++ drift
  }

  test("Spark stage text == pure-Scala mirror, bit-exact on 372 pairs") {
    val df = pairs.toDF("n", "d")
    val got = IntegerLn.withLnRatio(df, "n", "d")
      .select("n", "d", "iln_lr9").collect()
    got.foreach { r =>
      val (n, d, lr9) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(lr9 == IntegerLn.lnRatio9Ref(n, d),
        s"stage-text mismatch at ($n, $d)")
    }
    assert(got.length == pairs.size)
  }

  test("|lr9/1e9 - Math.log(n/d)| <= 1e-7 incl. 2^62 extremes") {
    var worst = 0.0
    pairs.foreach { case (n, d) =>
      val err = math.abs(
        IntegerLn.lnRatio9Ref(n, d) / 1e9 - math.log(n.toDouble / d))
      worst = math.max(worst, err)
      assert(err <= 1e-7, s"accuracy miss at ($n, $d): $err")
    }
    info(f"worst abs error: $worst%.3g")
  }

  test("equal operands give EXACT zero; antisymmetry within 4e-9") {
    Seq(1L, 7L, 1000003L, (1L << 62) - 1).foreach { x =>
      assert(IntegerLn.lnRatio9Ref(x, x) == 0L)
    }
    // not bit-antisymmetric (independent truncations), but within the
    // summed truncation bound
    pairs.take(120).foreach { case (n, d) =>
      val fwd = IntegerLn.lnRatio9Ref(n, d)
      val bwd = IntegerLn.lnRatio9Ref(d, n)
      assert(math.abs(fwd + bwd) <= 40L, s"antisymmetry at ($n, $d)")
    }
  }

  test("DuckDB-dialect CTE text differs from Spark only by // vs div") {
    val sparkText = IntegerLn
      .stages("n", "d", IntegerLn.sparkDiv).map(_._2).mkString("\n")
    val duckText = IntegerLn
      .stages("n", "d", IntegerLn.duckDiv).map(_._2).mkString("\n")
    assert(duckText.replace(" // ", " div ") == sparkText)
    // and the only intended textual delta is the division operator
    assert(sparkText.contains(" div ") && duckText.contains(" // "))
    assert(!sparkText.contains(" // ") && !duckText.contains(" div "))
  }
}
