package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Deterministic fixed-point natural log of an exact integer ratio —
  * the engine-portable replacement for libm `ln` in every HASHED
  * emission (r14; VERDICT r13 task 1).
  *
  * Why: the driver's DuckDB build evaluates `ln` with a vectorized /
  * approximate implementation whose results differ from the JVM's by
  * far more than 1 ulp (r12/r13 evidence: six drift hashes flipped
  * across three independent marginal families even after factor-1000
  * coarsening with measured 5–10-unit margins). Coarsening a libm
  * output is therefore a losing arms race; this kernel removes libm
  * from the value entirely. Both engines run the SAME integer
  * recurrence — `length(bin(x))` bitlens, `>>`/`<<` range reduction,
  * a 9-term atanh series at 1e9 fixed point, truncating integer
  * division on nonnegative operands — so the result is bit-identical
  * by construction, at full 1e-9 resolution, independent of either
  * engine's math library.
  *
  * Math: for num, den ≥ 1,
  *   ln(num/den) = kk·ln2 + ln(m),  m ∈ [1, 2)
  * with kk recovered from bitlengths (integer shifts only) and
  *   ln(m) = 2·atanh(z),  z = (m−1)/(m+1) ∈ [0, 1/3),
  *   atanh(z) = z + z³/3 + z⁵/5 + … (9 odd terms, through z¹⁷).
  *
  * Fixed-point plan (all BIGINT, overflow-free by construction):
  *  - operands are first right-shifted to ≤ 30 bits (truncation error
  *    ≤ 2·2⁻²⁹ in the log), shifts folded into kk;
  *  - bitlens are equalized (m ∈ [1,2) exactly, as an integer ratio
  *    big/d2 with big < 2³¹, d2 < 2³⁰);
  *  - z, z², and the series run at scale 1e9: the largest product is
  *    (big − d2)·1e9 < 2³⁰·1e9 ≈ 1.1e18 < 2⁶³;
  *  - ln2 enters as the shared literal 693147181 (= round(ln2·1e9));
  *    |kk| ≤ 63 bounds that rounding's contribution at 2.8e-8.
  *
  * Every integer division in the recurrence has a NONNEGATIVE
  * dividend, so Spark's truncating `div` and DuckDB's `//` agree
  * (the CLAUDE.md negative-operand trap cannot arise).
  *
  * Accuracy: |lr9/1e9 − ln(num/den)| ≤ 1e-7 (spec-lawed against
  * `java.lang.Math.log` in IntegerLnSpec; measured worst ≈ 2.8e-8
  * over extremes including 2⁶² operands). Determinism — the property
  * that matters for the driver gate — is exact, not approximate.
  *
  * Range: num, den ∈ [1, 2⁶³). Drift callers form
  * num = (c_ref+1)·(n_cur+n_bins), den = (c_cur+1)·(n_ref+n_bins),
  * exact in BIGINT up to ~3e9 rows per snapshot; beyond that,
  * pre-scale the counts (documented in docs/SCALE.md).
  */
object IntegerLn {

  /** round(ln(2)·1e9) — the one transcendental constant, shared as a
    * literal by both engines.
    */
  val Ln2Grid9: Long = 693147181L

  /** Spark SQL truncating integer division (nonneg operands only). */
  def sparkDiv(a: String, b: String): String = s"(($a) div ($b))"

  /** DuckDB integer division (nonneg operands only — `//` truncates
    * or floors depending on build; identical on nonneg).
    */
  def duckDiv(a: String, b: String): String = s"(($a) // ($b))"

  /** The recurrence as an ordered stage list (columnName → exprText),
    * computing `<prefix>lr9` ≈ ln(num/den)·1e9 as BIGINT from the two
    * nonnegative BIGINT expressions `num` and `den`. Everything except
    * `intDiv` is spelled identically in Spark SQL and DuckDB:
    * `bin(BIGINT)` is the unpadded binary string in both, `<<`/`>>`
    * are plain integer shifts in both (Spark 4 infix operators), and
    * CASE/greatest/length are ANSI. One definition feeds both the
    * DataFrame chain ([[withLnRatio]]) and the oracle CTEs
    * ([[sqlCtes]]), so the two engines cannot drift apart.
    */
  def stages(num: String, den: String,
      intDiv: (String, String) => String,
      prefix: String = "iln_"): Seq[(String, String)] = {
    val p = prefix
    val base = Seq(
      s"${p}bn" -> s"length(bin($num))",
      s"${p}bd" -> s"length(bin($den))",
      s"${p}sn" -> s"greatest(${p}bn - 30, 0)",
      s"${p}sd" -> s"greatest(${p}bd - 30, 0)",
      s"${p}n1" -> s"(($num) >> ${p}sn)",
      s"${p}d1" -> s"(($den) >> ${p}sd)",
      s"${p}k0" -> s"length(bin(${p}n1)) - length(bin(${p}d1))",
      s"${p}n2" ->
        s"CASE WHEN ${p}k0 < 0 THEN (${p}n1 << (0 - ${p}k0)) ELSE ${p}n1 END",
      s"${p}d2" ->
        s"CASE WHEN ${p}k0 > 0 THEN (${p}d1 << ${p}k0) ELSE ${p}d1 END",
      s"${p}m" ->
        s"CASE WHEN ${p}n2 >= ${p}d2 THEN ${p}n2 ELSE ${p}n2 * 2 END",
      s"${p}kk" -> (s"(${p}sn - ${p}sd + ${p}k0) - " +
        s"(CASE WHEN ${p}n2 >= ${p}d2 THEN 0 ELSE 1 END)"),
      s"${p}z" -> intDiv(s"(${p}m - ${p}d2) * 1000000000",
        s"${p}m + ${p}d2"),
      s"${p}z2" -> intDiv(s"${p}z * ${p}z", "1000000000"),
      s"${p}u3" -> intDiv(s"${p}z * ${p}z2", "1000000000"))
    val higher = (5 to 17 by 2).map(n =>
      s"${p}u$n" -> intDiv(s"${p}u${n - 2} * ${p}z2", "1000000000"))
    val terms = (3 to 17 by 2)
      .map(n => intDiv(s"${p}u$n", n.toString)).mkString(" + ")
    // CAST(kk AS BIGINT): kk is 32-bit (length() arithmetic) and
    // kk·693147181 overflows INT under Spark's ANSI mode
    base ++ higher :+ (s"${p}lr9" ->
      s"CAST(${p}kk AS BIGINT) * $Ln2Grid9 + 2 * (${p}z + $terms)")
  }

  /** PRE-SCALED product form: stages computing
    * `<prefix>lr9` ≈ ln((aNum·bNum)/(aDen·bDen))·1e9 where each of the
    * four operands is a nonnegative BIGINT expression ≥ 1 that may be
    * as large as 2⁶³−1 — the products are never formed raw. Each
    * factor is first right-shifted to ≤ 31 bits
    * (`f >> greatest(bitlen(f) − 31, 0)`), making both products ≤ 2⁶²
    * by construction; the net shift `(sa+sb) − (sc+sd)` is then folded
    * back as an exact `·ln2` correction (the same bookkeeping the core
    * kernel already does for its own range reduction).
    *
    * Below 2³¹ per factor every shift is 0, the products and every
    * downstream stage are IDENTICAL to the unscaled form, and the
    * correction is exactly 0 — so results (and driver hashes) are
    * bit-for-bit unchanged in the regime where the old form was safe.
    * When a shift engages, each clamp truncates at ≥ 31 retained bits
    * (relative error ≤ 2⁻³⁰ per factor, ≤ 4·2⁻³⁰ ≈ 3.7e-9 in the log
    * — below the kernel's own 2·2⁻²⁹ range-reduction truncation), and
    * asymmetric operands are handled exactly: a count of 1 next to a
    * 2⁶²-scale count shifts by 0 and stays exact (the drift family's
    * empty-bin case). Determinism is preserved at ANY scale: both
    * engines run the same shifts (spelled once, here).
    */
  def prodStages(aNum: String, bNum: String, aDen: String, bDen: String,
      intDiv: (String, String) => String,
      prefix: String = "iln_"): Seq[(String, String)] = {
    val p = prefix
    def clampShift(f: String): String =
      s"greatest(length(bin($f)) - 31, 0)"
    val pre = Seq(
      s"${p}psa" -> clampShift(aNum),
      s"${p}psb" -> clampShift(bNum),
      s"${p}psc" -> clampShift(aDen),
      s"${p}psd" -> clampShift(bDen),
      s"${p}pnum" -> s"((($aNum) >> ${p}psa) * (($bNum) >> ${p}psb))",
      s"${p}pden" -> s"((($aDen) >> ${p}psc) * (($bDen) >> ${p}psd))")
    // CAST(... AS BIGINT): the shift sums are INT (length arithmetic)
    // and the ·Ln2Grid9 product overflows INT under ANSI
    pre ++ stages(s"${p}pnum", s"${p}pden", intDiv, s"${p}r") :+
      (s"${p}lr9" -> (s"${p}rlr9 + CAST(${p}psa + ${p}psb - " +
        s"${p}psc - ${p}psd AS BIGINT) * $Ln2Grid9"))
  }

  /** Append the kernel to a DataFrame: expects nonnegative BIGINT
    * expressions `numCol` and `denCol` (≥ 1), adds the stage columns
    * and the result `<prefix>lr9`. All stages are built-in
    * expressions — whole-stage codegen fuses the 24 projections into
    * one pass (~60 integer ops/row).
    *
    * The input goes through a LAZY plan barrier first: each
    * `withColumn` re-analyzes its whole child plan, so folding 24
    * stages directly onto a corpus-lineage frame costs O(stages ×
    * upstream-plan-size) in the ANALYZER (measured ~0.3 s per kernel
    * application over a corpus aggregate at sf0.1 — pure planning,
    * not execution). The barrier truncates the logical plan to one
    * node; eager = false keeps entry construction job-free (r7
    * convention), so the saving is one plan barrier (materialized at
    * first action) instead of |stages| full re-analyses — no job runs
    * at call time. Callers always invoke the kernel on 1-row /
    * dictionary-sized frames, so the materialization itself is nil.
    * Pass `barrier = false` when the input plan is ALREADY tiny (e.g.
    * one aggregate over a checkpointed frame): the fold then re-analyzes
    * a few-node plan per stage — cheaper than the extra barrier job
    * (the r14 `text_bm25_topk` regression was exactly that fixed cost).
    */
  def withLnRatio(df: DataFrame, numCol: String, denCol: String,
      prefix: String = "iln_", barrier: Boolean = true): DataFrame =
    withLnRatios(df, Seq((numCol, denCol, prefix)), barrier)

  /** Multi-ratio form: one plan barrier + one fold for SEVERAL
    * (num, den, prefix) applications — a per-term caller (BM25's
    * per-term idf over one stats row) pays one plan barrier instead
    * of |terms|.
    */
  def withLnRatios(df: DataFrame,
      ratios: Seq[(String, String, String)],
      barrier: Boolean = true): DataFrame =
    foldStages(df,
      ratios.flatMap { case (n, d, p) => stages(n, d, sparkDiv, p) },
      barrier)

  /** Pre-scaled product form of [[withLnRatio]] — see [[prodStages]].
    * Use whenever num/den are PRODUCTS of counts that could each
    * approach 2⁶³ at the 100 TB design point (drift's
    * (c+1)·(n+B) smoothing ratios, DSIR's bucket-weight ratio).
    */
  def withLnRatioProd2(df: DataFrame, aNum: String, bNum: String,
      aDen: String, bDen: String, prefix: String = "iln_",
      barrier: Boolean = true): DataFrame =
    foldStages(df, prodStages(aNum, bNum, aDen, bDen, sparkDiv, prefix),
      barrier)

  /** Fold a stage list onto a DataFrame in DEPENDENCY LAYERS: stages
    * that reference no same-batch stage name are applied together in
    * one `withColumns` call, so a 24-stage chain costs ~16 plan
    * re-analyses instead of 24 — and a 3-ratio batch still ~16 instead
    * of 72 (the layers of independent ratios merge). Layering is
    * computed from the actual word-boundary occurrences of previously
    * defined stage names in each expression, so it is correct for any
    * stage list (a false substring hit only splits conservatively).
    * Values are unchanged — only the Project grouping differs.
    */
  private def foldStages(df: DataFrame, st: Seq[(String, String)],
      barrier: Boolean): DataFrame = {
    val layerOf = scala.collection.mutable.Map.empty[String, Int]
    val layered = st.map { case (name, ex) =>
      val dep = layerOf.collect {
        case (n, l) if s"\\b${java.util.regex.Pattern.quote(n)}\\b".r
          .findFirstIn(ex).isDefined => l
      }
      val layer = if (dep.isEmpty) 0 else dep.max + 1
      layerOf(name) = layer
      (layer, name, ex)
    }
    layered.groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(if (barrier) df.localCheckpoint(eager = false) else df) {
        case (d, (_, group)) =>
          d.withColumns(group.map { case (_, n, ex) => n -> expr(ex) }.toMap)
      }
  }

  /** The DuckDB mirror as chained CTE text: returns the `, lN AS
    * (...)` chain (to splice after an existing CTE list) and the name
    * of the last CTE, which exposes every column of `fromCte` plus
    * the stage columns ending in `<prefix>lr9`.
    */
  def sqlCtes(fromCte: String, num: String, den: String,
      prefix: String = "iln_",
      ctePrefix: String = "iln_l"): (String, String) =
    cteChain(fromCte, stages(num, den, duckDiv, prefix), ctePrefix)

  /** DuckDB mirror of [[withLnRatioProd2]] — the pre-scaled product
    * stages as chained CTEs.
    */
  def sqlCtesProd2(fromCte: String, aNum: String, bNum: String,
      aDen: String, bDen: String, prefix: String = "iln_",
      ctePrefix: String = "iln_l"): (String, String) =
    cteChain(fromCte,
      prodStages(aNum, bNum, aDen, bDen, duckDiv, prefix), ctePrefix)

  private def cteChain(fromCte: String, st: Seq[(String, String)],
      ctePrefix: String): (String, String) = {
    val parts = st.zipWithIndex.map { case ((name, ex), i) =>
      val src = if (i == 0) fromCte else s"$ctePrefix${i - 1}"
      s"$ctePrefix$i AS (SELECT *, $ex AS $name FROM $src)"
    }
    (parts.mkString(",\n", ",\n", ""), s"$ctePrefix${st.size - 1}")
  }

  /** Pure-Scala mirror of the recurrence — the spec oracle that pins
    * the SQL stage text to the intended integer algorithm (a
    * transcription typo in [[stages]] shows up as an exact mismatch,
    * not a tolerance miss).
    */
  def lnRatio9Ref(num: Long, den: Long): Long = {
    require(num >= 1 && den >= 1, s"lnRatio9Ref: need num,den >= 1")
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val sn = math.max(bitlen(num) - 30, 0)
    val sd = math.max(bitlen(den) - 30, 0)
    val n1 = num >> sn
    val d1 = den >> sd
    val k0 = bitlen(n1) - bitlen(d1)
    val n2 = if (k0 < 0) n1 << (-k0) else n1
    val d2 = if (k0 > 0) d1 << k0 else d1
    val big = if (n2 >= d2) n2 else n2 * 2
    val kk = (sn - sd + k0) - (if (n2 >= d2) 0 else 1)
    val z = (big - d2) * 1000000000L / (big + d2)
    val z2 = z * z / 1000000000L
    var u = z * z2 / 1000000000L
    var acc = z
    var n = 3
    while (n <= 17) {
      acc += u / n
      u = u * z2 / 1000000000L
      n += 2
    }
    kk.toLong * Ln2Grid9 + 2 * acc
  }

  /** Pure-Scala mirror of [[prodStages]] — the spec oracle for the
    * pre-scaled product form. Exactly [[lnRatio9Ref]] on the raw
    * products whenever every factor < 2³¹ (all shifts 0), and
    * overflow-free with bounded error for factors up to 2⁶³−1.
    */
  def lnRatio9Prod2Ref(aNum: Long, bNum: Long, aDen: Long,
      bDen: Long): Long = {
    require(aNum >= 1 && bNum >= 1 && aDen >= 1 && bDen >= 1,
      "lnRatio9Prod2Ref: need all factors >= 1")
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    def sh(x: Long): Int = math.max(bitlen(x) - 31, 0)
    val (sa, sb, sc, sd) = (sh(aNum), sh(bNum), sh(aDen), sh(bDen))
    lnRatio9Ref((aNum >> sa) * (bNum >> sb), (aDen >> sc) * (bDen >> sd)) +
      (sa + sb - sc - sd).toLong * Ln2Grid9
  }
}
