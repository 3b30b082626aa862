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

  // --- r15: pre-scaled product form (prodStages) --------------------

  /** Factor quads: small (all shifts 0), planted 2⁶²-scale (shifts
    * engage; raw products would overflow by up to ~60 bits), and
    * drift-shaped asymmetric extremes (count 1 against a 2⁶²-scale
    * total — the empty-bin case).
    */
  private def quads: Seq[(Long, Long, Long, Long)] = {
    val rng = new scala.util.Random(20260815L)
    val lim62 = (1L << 62) - 1
    def r62() = 1L + math.abs(rng.nextLong()) % lim62
    def r31() = 1L + rng.nextInt(Int.MaxValue).toLong
    val fixed = Seq[(Long, Long, Long, Long)](
      (1L, 1L, 1L, 1L),
      (2L, 3L, 5L, 7L),
      (1L, lim62, 257L, lim62 - 56L),
      (lim62, lim62, 1L, 1L), (1L, 1L, lim62, lim62),
      (9223372036854775783L, 9223372036854775783L, 3L, 7L),
      (1L, 9223372036854775783L, 9223372036854775783L, 1L),
      ((1L << 31), (1L << 31), (1L << 31) - 1, (1L << 31) + 1))
    val small = Seq.fill(120)((r31(), r31(), r31(), r31()))
    val big = Seq.fill(120)((r62(), r62(), r62(), r62()))
    val mixed = Seq.fill(120)((1L + rng.nextInt(100).toLong, r62(),
      1L + rng.nextInt(100).toLong, r62()))
    fixed ++ small ++ big ++ mixed
  }

  test("prod2: Spark stage text == pure-Scala mirror, bit-exact") {
    val df = quads.toDF("a", "b", "cc", "dd")
    val got = IntegerLn.withLnRatioProd2(df, "a", "b", "cc", "dd")
      .select("a", "b", "cc", "dd", "iln_lr9").collect()
    got.foreach { r =>
      val (a, b, c, d) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getLong(4) == IntegerLn.lnRatio9Prod2Ref(a, b, c, d),
        s"prod2 stage-text mismatch at ($a, $b, $c, $d)")
    }
    assert(got.length == quads.size)
  }

  test("prod2 == raw-product kernel EXACTLY when every factor < 2^31") {
    // the hashes-unchanged law: below 2^31 per factor all clamps are
    // no-ops, so the pre-scaled form IS the r14 raw-product form
    val rng = new scala.util.Random(42L)
    val qs = Seq((1L, 1L, 1L, 1L),
        (2147483647L, 2147483647L, 2147483647L, 2147483647L)) ++
      Seq.fill(4000)((1L + rng.nextInt(Int.MaxValue).toLong,
        1L + rng.nextInt(Int.MaxValue).toLong,
        1L + rng.nextInt(Int.MaxValue).toLong,
        1L + rng.nextInt(Int.MaxValue).toLong))
    qs.foreach { case (a, b, c, d) =>
      assert(IntegerLn.lnRatio9Prod2Ref(a, b, c, d) ==
        IntegerLn.lnRatio9Ref(a * b, c * d),
        s"prod2 deviates in the no-shift regime at ($a, $b, $c, $d)")
    }
  }

  test("prod2 accuracy <= 1.5e-7 vs Math.log at 2^62-scale factors") {
    // kernel bound 1e-7 + four clamp truncations (<= 4*2^-30 ~ 3.7e-9)
    var worst = 0.0
    quads.foreach { case (a, b, c, d) =>
      val want = math.log(a.toDouble) + math.log(b.toDouble) -
        math.log(c.toDouble) - math.log(d.toDouble)
      val err =
        math.abs(IntegerLn.lnRatio9Prod2Ref(a, b, c, d) / 1e9 - want)
      worst = math.max(worst, err)
      assert(err <= 1.5e-7, s"prod2 accuracy miss at ($a, $b, $c, $d): $err")
    }
    info(f"worst abs error: $worst%.3g")
  }

  test("prod2 DuckDB-dialect text differs from Spark only by // vs div") {
    val sparkText = IntegerLn
      .prodStages("a", "b", "c", "d", IntegerLn.sparkDiv)
      .map(_._2).mkString("\n")
    val duckText = IntegerLn
      .prodStages("a", "b", "c", "d", IntegerLn.duckDiv)
      .map(_._2).mkString("\n")
    assert(duckText.replace(" // ", " div ") == sparkText)
    assert(sparkText.contains(" div ") && duckText.contains(" // "))
    assert(!sparkText.contains(" // ") && !duckText.contains(" div "))
  }

  test("barrier = false returns the same values as the default path") {
    val df = pairs.take(40).toDF("n", "d")
    val withB = IntegerLn.withLnRatio(df, "n", "d")
      .select("n", "d", "iln_lr9").collect().toSeq.map(_.toSeq)
    val noB = IntegerLn.withLnRatio(df, "n", "d", barrier = false)
      .select("n", "d", "iln_lr9").collect().toSeq.map(_.toSeq)
    assert(withB.sortBy(_.toString) == noB.sortBy(_.toString))
  }
}
