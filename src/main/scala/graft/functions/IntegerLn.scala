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
    * convention). Callers always invoke the kernel on 1-row /
    * dictionary-sized frames, so the materialization itself is nil.
    */
  def withLnRatio(df: DataFrame, numCol: String, denCol: String,
      prefix: String = "iln_"): DataFrame =
    withLnRatios(df, Seq((numCol, denCol, prefix)))

  /** Multi-ratio form: one plan barrier + one fold for SEVERAL
    * (num, den, prefix) applications — a per-term caller (BM25's
    * per-term idf over one stats row) pays one checkpoint job instead
    * of |terms|.
    */
  def withLnRatios(df: DataFrame,
      ratios: Seq[(String, String, String)]): DataFrame =
    ratios.flatMap { case (n, d, p) => stages(n, d, sparkDiv, p) }
      .foldLeft(df.localCheckpoint(eager = false)) {
        case (d, (name, ex)) => d.withColumn(name, expr(ex))
      }

  /** The DuckDB mirror as chained CTE text: returns the `, lN AS
    * (...)` chain (to splice after an existing CTE list) and the name
    * of the last CTE, which exposes every column of `fromCte` plus
    * the stage columns ending in `<prefix>lr9`.
    */
  def sqlCtes(fromCte: String, num: String, den: String,
      prefix: String = "iln_",
      ctePrefix: String = "iln_l"): (String, String) = {
    val st = stages(num, den, duckDiv, prefix)
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
}
