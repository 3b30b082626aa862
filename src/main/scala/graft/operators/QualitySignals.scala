package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus quality-signal operators a training-data pipeline runs after
  * basic stats and before sampling: repetition scoring (the
  * Gopher-style "repetitious document" signals), unigram
  * language-model scoring (cheap fluency/perplexity proxy), and PII
  * scan + redaction. All are built-in expression compositions — no
  * UDFs — and every cross-row float aggregate travels through a
  * scaled-BIGINT carrier (`floor(x·1e9 + 0.5)`) so the sums are exact,
  * order-free, and bit-identical in the DuckDB oracle (the same
  * convention as `Kernels.dsum`, fitted to values that are not money).
  *
  * Scale shapes: repetition is explode + hash-agg keyed on
  * (doc_id, gram) — partial aggregation applies, nothing quadratic;
  * the unigram LM builds a vocabulary with one hash-agg and BROADCASTS
  * it (vocabularies are MBs even at 100 TB corpus scale — the corpus
  * itself never shuffles for scoring beyond the per-doc agg); the PII
  * scan is a pure map + filter, embarrassingly parallel.
  */
object QualitySignals {

  // ---------------------------------------------------------------
  // Repetition signals (per-document)
  // ---------------------------------------------------------------

  /** Per-document repetition signals: fraction of tokens that are the
    * single most frequent word, and the fraction of n-gram occurrences
    * belonging to n-grams seen more than once in the document (n=2,3)
    * — the standard cheap "document is degenerate/boilerplate"
    * filters. `flagged=1` marks documents over any threshold.
    *
    * Thresholds default to roughly the p90 of the synthetic corpus so
    * the flag actually partitions the data (topFrac 0.14 / dup2 0.12 /
    * dup3 0.02).
    */
  def repetition(docs: DataFrame, topFrac: Double = 0.14,
      dup2Frac: Double = 0.12, dup3Frac: Double = 0.02): DataFrame = {
    // SINGLE corpus pass: words, 2-grams and 3-grams are built
    // map-side from one token array, tagged with a kind (1/2/3),
    // concatenated, and exploded once — so the text column is scanned
    // once and there is exactly one wide shuffle, keyed
    // (doc_id, kind, gram), with map-side partial aggregation. A doc
    // contributes |ws|·3 − 3 rows; nothing is quadratic.
    def gramArr(n: Int): String = {
      val gram = (s"'$n'" +: (0 until n).map(j => s"element_at(ws, i + $j)"))
        .mkString("concat_ws(' ', ", ", ", ")")
      s"""CASE WHEN size(ws) >= $n
         |  THEN transform(sequence(1, size(ws) - ${n - 1}), i -> $gram)
         |  ELSE slice(ws, 1, 0) END""".stripMargin
    }
    val tagged = docs
      .select(col("doc_id"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .select(col("doc_id"), explode(expr(
        s"concat(transform(ws, w -> concat('1 ', w)), " +
          s"${gramArr(2)}, ${gramArr(3)})")).as("g"))

    tagged
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .withColumn("k", substring(col("g"), 1, 1).cast("int"))
      .groupBy("doc_id")
      .agg(max(when(col("k") === 1, col("c"))).as("mx"),
        sum(when(col("k") === 1, col("c"))).as("n_tok"),
        sum(when(col("k") === 2 && col("c") > 1, col("c")).otherwise(lit(0L)))
          .as("dup2_sum"),
        sum(when(col("k") === 2, col("c"))).as("g2_tot"),
        sum(when(col("k") === 3 && col("c") > 1, col("c")).otherwise(lit(0L)))
          .as("dup3_sum"),
        sum(when(col("k") === 3, col("c"))).as("g3_tot"))
      .withColumn("top_word_frac", col("mx").cast("double") / col("n_tok"))
      .withColumn("dup2_frac",
        coalesce(col("dup2_sum").cast("double") / col("g2_tot"), lit(0.0)))
      .withColumn("dup3_frac",
        coalesce(col("dup3_sum").cast("double") / col("g3_tot"), lit(0.0)))
      .withColumn("flagged",
        (col("top_word_frac") > topFrac || col("dup2_frac") > dup2Frac ||
          col("dup3_frac") > dup3Frac).cast("int"))
      .select("doc_id", "n_tok", "top_word_frac", "dup2_frac", "dup3_frac",
        "flagged")
      .orderBy("doc_id")
  }

  def repetitionSql(topFrac: Double = 0.14, dup2Frac: Double = 0.12,
      dup3Frac: Double = 0.02): String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents),
       |wc AS (
       |  SELECT doc_id, w, COUNT(*) AS c
       |  FROM (SELECT doc_id, UNNEST(ws) AS w FROM t)
       |  WHERE w <> '' GROUP BY 1, 2),
       |top AS (
       |  SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n_tok
       |  FROM wc GROUP BY 1),
       |g2 AS (
       |  SELECT doc_id, UNNEST(list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i+1])) AS g
       |  FROM t),
       |gc2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
       |d2 AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |      / SUM(c) AS dup2_frac
       |  FROM gc2 GROUP BY 1),
       |g3 AS (
       |  SELECT doc_id, UNNEST(list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
       |  FROM t),
       |gc3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
       |d3 AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |      / SUM(c) AS dup3_frac
       |  FROM gc3 GROUP BY 1)
       |SELECT top.doc_id, n_tok,
       |  CAST(mx AS DOUBLE) / n_tok AS top_word_frac,
       |  COALESCE(dup2_frac, 0.0) AS dup2_frac,
       |  COALESCE(dup3_frac, 0.0) AS dup3_frac,
       |  CAST(CAST(mx AS DOUBLE) / n_tok > $topFrac
       |    OR COALESCE(dup2_frac, 0.0) > $dup2Frac
       |    OR COALESCE(dup3_frac, 0.0) > $dup3Frac AS INTEGER) AS flagged
       |FROM top LEFT JOIN d2 USING (doc_id) LEFT JOIN d3 USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Unigram LM scoring (broadcast vocabulary)
  // ---------------------------------------------------------------

  /** Corpus unigram log-prob table (w, lps): lps = lnRatio9(c, total)
    * via the [[graft.functions.IntegerLn]] kernel on the vocab frame
    * (r14: no libm in any hashed value — ln(c/total) comes from the
    * exact integer pair; the kernel handles num < den natively, so
    * lps ≤ 0 as before). Shared by [[unigramLm]] and
    * [[perplexityBuckets]], with [[lpSqlCtes]] the one SQL copy.
    */
  private def lpTable(w: DataFrame): DataFrame = {
    val vocab = w.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum("c").as("total"))
    graft.functions.IntegerLn
      .withLnRatio(vocab.crossJoin(broadcast(tot)), "c", "total")
      .select(col("w"), col("iln_lr9").as("lps"))
  }

  /** DuckDB mirror of [[lpTable]] as CTE text (expects `fromW`, a CTE
    * with a `w` column; exposes `vocab(w, c)`, `tot(total)` and
    * `lp(w, lps)`).
    */
  private def lpSqlCtesFrom(fromW: String): String = {
    val (ctes, last) =
      graft.functions.IntegerLn.sqlCtes("lp0", "c", "total")
    s"""vocab AS (SELECT w, COUNT(*) AS c FROM $fromW GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
       |lp0 AS (SELECT w, c, total FROM vocab, tot)$ctes,
       |lp AS (SELECT w, iln_lr9 AS lps FROM $last)""".stripMargin
  }
  private val lpSqlCtes: String = lpSqlCtesFrom("w")

  /** Unigram language-model scoring: build corpus unigram frequencies,
    * broadcast them, and score each document by its average per-token
    * negative log-likelihood (the cheap perplexity proxy used as a
    * fluency gate). Reported per (lang, source): token-weighted
    * average NLL plus the best/worst per-document NLL.
    *
    * Exactness: each log-probability is a 1e-9-grid BIGINT from the
    * [[graft.functions.IntegerLn]] kernel (r14: `lnRatio9(c, total)`
    * — no libm anywhere, bit-identical cross-engine by construction),
    * so all sums are exact integer sums regardless of partitioning;
    * emission keeps the r13 1e-6 resolution (one integer division) for
    * interface stability. The 1e9 grid bounds group
    * token counts at ~1e8 per group before BIGINT overflow — per-group
    * (not corpus-wide) at 100 TB. The bound is ENFORCED, not just
    * documented: a DECIMAL(38,0) carrier of Σ|lps| rides alongside
    * (exact 128-bit, one extra agg column), and any group whose
    * abs-sum exceeds Long.MaxValue raises at execution time instead of
    * wrapping into a plausible-but-wrong statistic. Σ|lps| bounds
    * every BIGINT partial sum at both the per-doc and per-group level
    * (|Σ subset| ≤ Σ|x|), so "guard passes" ⇒ no overflow anywhere.
    */
  def unigramLm(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), col("lang"), col("source"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    val lp = lpTable(w)
    val perDoc = w.join(broadcast(lp), "w")
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n"), sum("lps").as("s"),
        sum(abs(col("lps")).cast("decimal(38,0)")).as("sabs"))
    perDoc.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("total_tokens"),
        // UNROUNDED: operands are exact integers, so the IEEE division
        // chain is bit-identical in DuckDB — round(…,6) would risk a
        // half-way-tie divergence (CLAUDE.md integer-ratio rule)
        when(
          sum(col("sabs")) > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(
            lit("unigramLm: BIGINT log-prob carrier overflow for group ("),
            coalesce(col("lang"), lit("<null>")), lit(","),
            coalesce(col("source"), lit("<null>")),
            lit(") — shard the group or rescale the grid")
          )).cast("double"))
          // r13 coarsened emission (the drift-family convention): the
          // negated grid sum (≥ 0: every lp9 ≤ 0 since p ≤ 1) drops
          // its last 3 digits through one integer division, so a
          // cross-engine ±1-unit ln flip in any single term can no
          // longer move the hashed double unless the whole sum sits
          // at a 1000-boundary
          .otherwise(expr("cast((-sum(s)) div 1000 as double)") /
            sum("n").cast("double") / lit(1e6)).as("avg_nll_token"),
        min(expr("cast((-s) div 1000 as double)") / col("n") / lit(1e6))
          .as("min_doc_nll"),
        max(expr("cast((-s) div 1000 as double)") / col("n") / lit(1e6))
          .as("max_doc_nll"))
      .orderBy("lang", "source")
  }

  /** Interpolated BIGRAM fluency — the step from [[unigramLm]] toward
    * the CCNet-style n-gram LM: per-token negative log-likelihood
    * under `λ·P(w|prev) + (1−λ)·P(w)`, with bigram/context
    * probabilities from the corpus's own tables and doc-initial tokens
    * scored pure-unigram (no cross-document context). Same report
    * shape as [[unigramLm]] (per-(lang, source) NLL stats).
    *
    * Exactness: every probability is a ratio of exact integers — the
    * IEEE chain (two divisions, two multiplies, one add, one ln) is
    * mirrored token-for-token in the oracle — and each term snaps to
    * the 1e9 BIGINT grid before the order-free per-doc sum (the
    * [[unigramLm]] convention, λ constants interpolated as their
    * exact Scala-double decimal forms).
    *
    * Scale shape: the token/bigram stream is materialized ONCE (three
    * consumers); the unigram table is dictionary-sized but the BIGRAM
    * table can be corpus-scale (Zipf tail), so the scoring joins are
    * HASH joins keyed (p, w) / (p) — never broadcast, never a window;
    * per-doc and per-group sums are plain partial-aggregatable
    * BIGINT aggregates with the [[unigramLm] ]overflow guard.
    */
  /** λ as the reduced rational L/D on the /1000 grid — ONE copy shared
    * by [[bigramFluency]] and [[bigramFluencySql]] so the two engines
    * cannot disagree on the snapped λ. Grid 1000 caps D ≤ 1000 for any
    * λ (r15, ADVICE r14 — the old 1e6 grid let λ=0.123457 blow D to
    * ~1e6 and shrink the D·t² headroom to ~3e6 tokens); λ=0.7 reduces
    * to 7/10 exactly as before.
    */
  private[graft] def rationalizeLambda(lambda: Double): (Long, Long) = {
    val l = math.round(lambda * 1000L)
    require(l >= 0 && l <= 1000, s"bigramFluency: lambda not in [0,1]: $lambda")
    val g = java.math.BigInteger.valueOf(l)
      .gcd(java.math.BigInteger.valueOf(1000L)).longValue()
    (l / g, 1000L / g)
  }

  /** The D·t² headroom guard on the 1-row token total — factored out
    * so the spec can fire it with a planted bound (the real bound,
    * ≥ ~9.6e7 tokens even at the D=1000 cap, is unreachable by a test
    * corpus).
    */
  private[graft] def guardedTokenTotal(tot: DataFrame,
      tBound: Long): DataFrame =
    tot.select(when(col("t") > lit(tBound),
      raise_error(concat(
        lit("bigramFluency: D*t^2 BIGINT headroom exceeded (t="),
        col("t").cast("string"),
        lit(s", bound=$tBound) — pre-scale counts or shard the corpus")
      )).cast("bigint"))
      .otherwise(col("t")).as("t"))

  def bigramFluency(docs: DataFrame, lambda: Double = 0.7): DataFrame = {
    val stream = docs
      .select(col("doc_id"), col("lang"), col("source"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(expr(
          """transform(sequence(0, size(ws) - 1),
            |  i -> struct(get(ws, i - 1) AS p, get(ws, i) AS w))"""
            .stripMargin)).as("t"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("t.p").as("p"), col("t.w").as("w"))
      .localCheckpoint(eager = false)
    val uni = stream.groupBy("w").agg(count(lit(1)).as("cu"))
    // ENFORCED interpolation headroom (r15): every product in the
    // rationalized-λ ratio is bounded by D·t² (cb ≤ cp ≤ t, cu ≤ t,
    // L ≤ D), so t ≤ floor(sqrt((2⁶³−1)/D)) makes the whole BIGINT
    // chain overflow-free; past it the 1-row tot raises loudly
    // (QualitySignals guard convention) instead of wrapping. At D=10
    // (default λ=0.7) the bound is ~9.6e8 corpus tokens — pre-scale
    // counts past that.
    val tot = guardedTokenTotal(uni.agg(sum("cu").as("t")),
      math.sqrt(Long.MaxValue.toDouble / rationalizeLambda(lambda)._2)
        .toLong - 1)
    val big = stream.filter(col("p").isNotNull)
      .groupBy("p", "w").agg(count(lit(1)).as("cb"))
      .localCheckpoint(eager = false)
    val ctx = big.groupBy("p").agg(sum("cb").as("cp"))
    // r14: λ rationalized to L/D so the interpolated probability is
    // the EXACT integer ratio
    //   λ·cb/cp + (1−λ)·cu/t = (L·cb·t + (D−L)·cu·cp) / (D·cp·t)
    // and both branches run through the IntegerLn kernel on the
    // TYPE-sized frames (uni / big⋈ctx⋈uni), never per stream row —
    // no libm in any hashed value, and the corpus-sized join fetches
    // a precomputed lp9. r15: λ snaps to the /1000 grid (ADVICE r14),
    // capping D ≤ 1000 for ANY λ — the old 1e6 grid let an arbitrary
    // λ shrink the safe corpus to ~3e6 tokens; λ=0.7 still reduces to
    // 7/10, so default values are unchanged. The D·t² < 2⁶³ headroom
    // (t ≤ ~9.6e8 tokens at D=10) is now ENFORCED below, not just
    // documented: an over-budget corpus raises loudly instead of
    // relying on ANSI to catch the wrap.
    val (lNum, lDen) = rationalizeLambda(lambda)
    val uniLp = graft.functions.IntegerLn
      .withLnRatio(uni.crossJoin(broadcast(tot)), "cu", "t")
      .select(col("w"), col("iln_lr9").as("ulp9"))
    val bigLp = graft.functions.IntegerLn
      .withLnRatio(
        big.join(ctx.hint("shuffle_hash"), "p")
          .join(uni.hint("shuffle_hash"), "w")
          .crossJoin(broadcast(tot)),
        s"($lNum * cb * t + ${lDen - lNum} * cu * cp)",
        s"($lDen * cp * t)")
      .select(col("p"), col("w"), col("iln_lr9").as("blp9"))
    stream
      .join(uniLp.hint("shuffle_hash"), Seq("w"))
      .join(bigLp.hint("shuffle_hash"), Seq("p", "w"), "left")
      .withColumn("lp9", coalesce(col("blp9"), col("ulp9")))
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n"), sum("lp9").as("s"),
        sum(abs(col("lp9")).cast("decimal(38,0)")).as("sabs"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("total_tokens"),
        when(
          sum(col("sabs")) > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(lit(
            "bigramFluency: BIGINT log-prob carrier overflow — shard " +
              "the group or rescale the grid")).cast("double"))
          // r13 coarsened emission — see unigramLm
          .otherwise(expr("cast((-sum(s)) div 1000 as double)") /
            sum("n").cast("double") / lit(1e6)).as("avg_nll_token"),
        min(expr("cast((-s) div 1000 as double)") / col("n") / lit(1e6))
          .as("min_doc_nll"),
        max(expr("cast((-s) div 1000 as double)") / col("n") / lit(1e6))
          .as("max_doc_nll"))
      .orderBy("lang", "source")
  }

  /** DuckDB oracle for [[bigramFluency]] — the same λ
    * rationalization and IntegerLn kernel CTEs over the type-sized
    * frames.
    */
  def bigramFluencySql(lambda: Double = 0.7): String = {
    val (lNum, lDen) = rationalizeLambda(lambda)
    val (uCtes, uLast) = graft.functions.IntegerLn.sqlCtes(
      "ulp0", "cu", "t", prefix = "u_", ctePrefix = "u_l")
    val (bCtes, bLast) = graft.functions.IntegerLn.sqlCtes(
      "blp0", s"($lNum * cb * t + ${lDen - lNum} * cu * cp)",
      s"($lDen * cp * t)", prefix = "b_", ctePrefix = "b_l")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, source,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents),
       |nz AS (SELECT * FROM toks WHERE len(ws) > 0),
       |stream AS (
       |  SELECT doc_id, lang, source, ws[i - 1] AS p, ws[i] AS w
       |  FROM nz, UNNEST(range(1, len(ws) + 1)) AS u(i)),
       |uni AS (SELECT w, COUNT(*) AS cu FROM stream GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS t FROM uni),
       |big AS (SELECT p, w, COUNT(*) AS cb FROM stream
       |        WHERE p IS NOT NULL GROUP BY 1, 2),
       |ctx AS (SELECT p, CAST(SUM(cb) AS BIGINT) AS cp
       |        FROM big GROUP BY 1),
       |ulp0 AS (SELECT w, cu, t FROM uni, tot)$uCtes,
       |ulp AS (SELECT w, u_lr9 AS ulp9 FROM $uLast),
       |blp0 AS (
       |  SELECT b.p, b.w, b.cb, c.cp, u.cu, t.t
       |  FROM big b JOIN ctx c USING (p) JOIN uni u USING (w),
       |    tot t)$bCtes,
       |blp AS (SELECT p, w, b_lr9 AS blp9 FROM $bLast),
       |terms AS (
       |  SELECT s.doc_id, s.lang, s.source,
       |    COALESCE(b.blp9, u.ulp9) AS lp9
       |  FROM stream s
       |  JOIN ulp u USING (w)
       |  LEFT JOIN blp b ON s.p = b.p AND s.w = b.w),
       |perdoc AS (
       |  SELECT doc_id, lang, source, COUNT(*) AS n,
       |    CAST(SUM(lp9) AS BIGINT) AS s
       |  FROM terms GROUP BY 1, 2, 3)
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS total_tokens,
       |  CAST((-CAST(SUM(s) AS BIGINT)) // 1000 AS DOUBLE)
       |    / CAST(SUM(n) AS DOUBLE) / 1e6 AS avg_nll_token,
       |  MIN(CAST((-s) // 1000 AS DOUBLE) / n / 1e6) AS min_doc_nll,
       |  MAX(CAST((-s) // 1000 AS DOUBLE) / n / 1e6) AS max_doc_nll
       |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val unigramLmSql: String =
    s"""WITH w AS (
      |  SELECT doc_id, lang, source, w FROM (
      |    SELECT doc_id, lang, source,
      |      UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
      |    FROM documents)
      |  WHERE w <> ''),
      |$lpSqlCtes,
      |perdoc AS (
      |  SELECT doc_id, lang, source, COUNT(*) AS n,
      |    CAST(SUM(lps) AS BIGINT) AS s
      |  FROM w JOIN lp USING (w) GROUP BY 1, 2, 3)
      |SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  CAST((-CAST(SUM(s) AS BIGINT)) // 1000 AS DOUBLE)
      |    / CAST(SUM(n) AS DOUBLE) / 1e6 AS avg_nll_token,
      |  MIN(CAST((-s) // 1000 AS DOUBLE) / n / 1e6) AS min_doc_nll,
      |  MAX(CAST((-s) // 1000 AS DOUBLE) / n / 1e6) AS max_doc_nll
      |FROM perdoc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // Hash-trick linear quality classifier (fasttext-style inference)
  // ---------------------------------------------------------------

  /** Linear text-classifier INFERENCE via the hashing trick — the
    * fasttext-style quality-filter shape every production corpus runs:
    * each token hashes into one of `buckets` feature buckets, the
    * document's score is the mean bucket weight, and the label is the
    * score's sign. There is no vocabulary lookup and no model join —
    * the whole scorer is one codegen'd `aggregate` fold over the token
    * array, a pure map at ANY corpus size (the only shuffle below is
    * the output orderBy).
    *
    * The weight table is a deterministic fixture (bucket → md5-derived
    * integer in [-1e6, 1e6], i.e. weight·1e6 on an integer grid) — a
    * real deployment swaps in trained weights either as a plan-time
    * literal array (≤ a few MB for 2^20 buckets) or a broadcast join;
    * the dataflow is identical. Integer-grid weights make the token
    * sum exact and order-free, so the mean (one double division) is
    * bit-identical in DuckDB — the same fixed-point discipline as the
    * rest of the repo (CLAUDE.md).
    */
  def linearClassifier(docs: DataFrame, buckets: Int = 1024): DataFrame =
    scoredTokens(docs, buckets, Seq(col("lang")))
      // no rounding: swt and n_tok are exact integers < 2^53, so the
      // two IEEE divisions are bit-identical across engines — while
      // round(…,6) would DIVERGE whenever the rational score lands on
      // a half-way tie (Spark decimal HALF_UP vs DuckDB binary round)
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (col("swt").cast("double") / col("n_tok") / lit(1e6)).as("score"),
        (col("swt").cast("double") / col("n_tok") / lit(1e6) > 0)
          .cast("int").as("label"))
      .orderBy("doc_id")

  /** Just the per-document score (no lang/label) — the form other
    * operators compose with (e.g. [[Dedup.keepBest]] cluster
    * resolution). Same hash chain and exactness as
    * [[linearClassifier]].
    */
  def qualityScore(docs: DataFrame, buckets: Int = 1024): DataFrame =
    scoredTokens(docs, buckets, Nil)
      .select(col("doc_id"), col("n_tok"),
        (col("swt").cast("double") / col("n_tok") / lit(1e6)).as("score"))

  /** Shared scorer core: doc_id (+carried cols) with token count and
    * the exact integer weight sum from one `aggregate` fold. Exposed
    * package-side so composed pipelines can score WITHOUT a self-join
    * (the score is a pure map over its input — joining it back to the
    * same input would evaluate the upstream subtree twice).
    */
  private[operators] def scoredTokens(docs: DataFrame, buckets: Int,
      carry: Seq[Column]): DataFrame = {
    val bucket =
      s"cast(conv(substring(md5(concat('qc:', w)), 1, 15), 16, 10) as bigint)" +
        s" % $buckets"
    val wgrid =
      s"(cast(conv(substring(md5(concat('qw:', cast(($bucket) as string))), " +
        s"1, 15), 16, 10) as bigint) % 2000001) - 1000000"
    docs
      .select(col("doc_id") +: carry :+
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"): _*)
      .where(size(col("ws")) > 0)
      .withColumn("n_tok", size(col("ws")).cast("bigint"))
      .withColumn("swt",
        expr(s"aggregate(ws, cast(0 as bigint), (acc, w) -> acc + ($wgrid))"))
  }

  /** DuckDB form of the token→bucket→weight hash chain (lambda var
    * `w`), shared by every oracle that embeds the scorer.
    */
  private[operators] def wgridSqlExpr(buckets: Int = 1024): String = {
    val bucket =
      s"CAST('0x' || substring(md5('qc:' || w), 1, 15) AS BIGINT) % $buckets"
    s"(CAST('0x' || substring(md5('qw:' || CAST(($bucket) AS VARCHAR)), " +
      s"1, 15) AS BIGINT) % 2000001) - 1000000"
  }

  def linearClassifierSql(buckets: Int = 1024): String = {
    val wgrid = wgridSqlExpr(buckets)
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_tok,
       |    list_sum(list_transform(ws, w -> $wgrid)) AS swt
       |  FROM t WHERE len(ws) > 0)
       |SELECT doc_id, lang, n_tok,
       |  CAST(swt AS DOUBLE) / n_tok / 1e6 AS score,
       |  CAST(CAST(swt AS DOUBLE) / n_tok / 1e6 > 0 AS INTEGER) AS label
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // PII scan + redaction
  // ---------------------------------------------------------------

  /** Shared-subset (Java regex ∩ RE2) PII patterns. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b555-[0-9]{4}\\b"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The synthetic corpus is PII-free word salad, so the driver entry
    * exercises the scanner over a deterministic fixture augmentation:
    * documents with doc_id divisible by 7/11/13 get an email / phone /
    * IPv4 appended, derived purely from doc_id — the oracle SQL
    * performs the identical augmentation, so the scan itself is what
    * gets checked bit-for-bit. Library callers scan their real text by
    * skipping the augmentation (`augment = false`).
    */
  def augmented(docs: DataFrame): Column =
    concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"),
          lit("."), ((col("doc_id") * 13) % 256).cast("string")))
        .otherwise(lit("")))

  /** Per-document PII hit counts + md5 of the redacted text (emails →
    * `[EMAIL]`, phones → `[PHONE]`, IPs → `[IP]`), only for documents
    * with at least one hit. A pure map + filter — no shuffle at any
    * scale; the md5 column proves the redacted output itself is
    * identical across engines, not just the counts.
    */
  def piiRedact(docs: DataFrame, augment: Boolean = true,
      ordered: Boolean = true): DataFrame = {
    val text = if (augment) augmented(docs) else col("text")
    // counts are taken SEQUENTIALLY, each on the text as the previous
    // redaction left it — so a span consumed by the email pass (e.g.
    // '555-1234@x.io') is never double-reported as a phone, and every
    // count is a faithful description of the redacted output
    val out = docs.withColumn("aug", text)
      .withColumn("n_emails",
        size(regexp_extract_all(col("aug"), lit(emailRe), lit(0)))
          .cast("bigint"))
      .withColumn("s1", regexp_replace(col("aug"), emailRe, "[EMAIL]"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("s1"), lit(phoneRe), lit(0)))
          .cast("bigint"))
      .withColumn("s2", regexp_replace(col("s1"), phoneRe, "[PHONE]"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("s2"), lit(ipRe), lit(0)))
          .cast("bigint"))
      .withColumn("redacted", regexp_replace(col("s2"), ipRe, "[IP]"))
      .where(col("n_emails") + col("n_phones") + col("n_ips") > 0)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("redacted")).as("redacted_md5"))
    // ordered=false is the STREAMING form: a global sort is neither
    // supported nor meaningful in append mode; the driver entry keeps
    // the total order for the oracle compare
    if (ordered) out.orderBy("doc_id") else out
  }

  val piiRedactSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 7 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR)
       |              || '@example.com' ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0
       |         THEN ' call 555-'
       |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END
       |    || CASE WHEN doc_id % 13 = 0
       |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
       |              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
       |              || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
       |         ELSE '' END AS t
       |  FROM documents),
       |st1 AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT)
       |      AS n_emails,
       |    regexp_replace(t, '$emailRe', '[EMAIL]', 'g') AS s1
       |  FROM aug),
       |st2 AS (
       |  SELECT doc_id, n_emails,
       |    CAST(len(regexp_extract_all(s1, '$phoneRe')) AS BIGINT)
       |      AS n_phones,
       |    regexp_replace(s1, '$phoneRe', '[PHONE]', 'g') AS s2
       |  FROM st1),
       |hits AS (
       |  SELECT doc_id, n_emails, n_phones,
       |    CAST(len(regexp_extract_all(s2, '$ipRe')) AS BIGINT) AS n_ips,
       |    md5(regexp_replace(s2, '$ipRe', '[IP]', 'g')) AS redacted_md5
       |  FROM st2)
       |SELECT doc_id, n_emails, n_phones, n_ips, redacted_md5
       |FROM hits WHERE n_emails + n_phones + n_ips > 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Gopher rule-suite filter (per-document heuristic gate)
  // ---------------------------------------------------------------

  /** Gopher-rule default thresholds — the ONE copy shared by
    * [[gopherRules]], [[gopherRulesSql]] and every composition
    * (`CorpusPipeline.ragIngestSql`'s kept-CTE), so an engine-side
    * default change can never silently diverge a composed oracle.
    */
  val GopherMinWords: Long = 25L
  val GopherMaxWords: Long = 100000L
  val GopherMinMwl: Double = 3.0
  val GopherMaxMwl: Double = 4.5
  val GopherMinAlphaFrac: Double = 0.8
  val GopherMinStopHits: Long = 2L

  /** Gopher-style rule-suite document filter (Rae et al.,
    * arXiv:2112.11446 Table A1 — the standard pre-training heuristic
    * gate): per-document structural signals plus one pass/fail flag
    * per rule and the conjunction `kept`. Rules:
    *
    *   - r_words:  word count within [minWords, maxWords];
    *   - r_mwl:    mean word length within [minMwl, maxMwl];
    *   - r_alpha:  fraction of words containing an ASCII letter
    *               ≥ minAlphaFrac;
    *   - r_stop:   at least minStopHits stopword occurrences (the
    *               'the'/'a' set shared with [[TextAnalysis.quality]]).
    *
    * One explode + hash-agg keyed on doc_id — partial aggregation
    * applies, the corpus shuffles once on doc_id and nothing is
    * quadratic; at 100 TB this is the same shape as `tokenCounts`.
    * Exactness: every signal is a ratio of exact integers, emitted
    * UNROUNDED (identical IEEE divisions in both engines — the
    * CLAUDE.md integer-ratio rule); threshold comparisons therefore
    * agree bit-for-bit with the DuckDB oracle. Thresholds default to
    * values that actually partition the synthetic corpus (word counts
    * 10–99, mean word length 3.7–5.3, stop hits 0–8).
    */
  def gopherRules(docs: DataFrame,
      minWords: Long = GopherMinWords, maxWords: Long = GopherMaxWords,
      minMwl: Double = GopherMinMwl, maxMwl: Double = GopherMaxMwl,
      minAlphaFrac: Double = GopherMinAlphaFrac,
      minStopHits: Long = GopherMinStopHits): DataFrame = {
    val sig = docs
      .select(col("doc_id"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("bigint")).as("n_word_chars"),
        sum(Kernels.indicator(col("w").rlike("[A-Za-z]")))
          .cast("bigint").as("n_alpha"),
        sum(Kernels.indicator(col("w").isin("the", "a")))
          .cast("bigint").as("stop_hits"))
    sig
      .withColumn("mean_word_len",
        col("n_word_chars").cast("double") / col("n_words"))
      .withColumn("alpha_frac",
        col("n_alpha").cast("double") / col("n_words"))
      .withColumn("r_words",
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .cast("int"))
      .withColumn("r_mwl",
        (col("mean_word_len") >= minMwl && col("mean_word_len") <= maxMwl)
          .cast("int"))
      .withColumn("r_alpha", (col("alpha_frac") >= minAlphaFrac).cast("int"))
      .withColumn("r_stop", (col("stop_hits") >= minStopHits).cast("int"))
      .withColumn("kept",
        (col("r_words") === 1 && col("r_mwl") === 1 &&
          col("r_alpha") === 1 && col("r_stop") === 1).cast("int"))
      .select("doc_id", "n_words", "mean_word_len", "alpha_frac",
        "stop_hits", "r_words", "r_mwl", "r_alpha", "r_stop", "kept")
      .orderBy("doc_id")
  }

  def gopherRulesSql(
      minWords: Long = GopherMinWords, maxWords: Long = GopherMaxWords,
      minMwl: Double = GopherMinMwl, maxMwl: Double = GopherMaxMwl,
      minAlphaFrac: Double = GopherMinAlphaFrac,
      minStopHits: Long = GopherMinStopHits): String =
    s"""WITH w AS (
       |  SELECT doc_id, UNNEST(list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')) AS w
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id, COUNT(*) AS n_words,
       |    CAST(SUM(len(w)) AS BIGINT) AS n_word_chars,
       |    CAST(SUM(CASE WHEN regexp_matches(w, '[A-Za-z]')
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
       |    CAST(SUM(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
       |         AS BIGINT) AS stop_hits
       |  FROM w GROUP BY doc_id),
       |r AS (
       |  SELECT doc_id, n_words,
       |    CAST(n_word_chars AS DOUBLE) / n_words AS mean_word_len,
       |    CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
       |    stop_hits,
       |    CAST(n_words >= $minWords AND n_words <= $maxWords AS INTEGER)
       |      AS r_words,
       |    CAST(CAST(n_word_chars AS DOUBLE) / n_words >= $minMwl
       |      AND CAST(n_word_chars AS DOUBLE) / n_words <= $maxMwl
       |      AS INTEGER) AS r_mwl,
       |    CAST(CAST(n_alpha AS DOUBLE) / n_words >= $minAlphaFrac
       |      AS INTEGER) AS r_alpha,
       |    CAST(stop_hits >= $minStopHits AS INTEGER) AS r_stop
       |  FROM sig)
       |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
       |  r_words, r_mwl, r_alpha, r_stop,
       |  CAST(r_words = 1 AND r_mwl = 1 AND r_alpha = 1 AND r_stop = 1
       |       AS INTEGER) AS kept
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Persisted unigram-LM store + OOV-aware batch scoring
  // ---------------------------------------------------------------

  /** Persist a unigram LM trained on a BASE corpus — the vocabulary
    * with 1e9-grid log-probs (`vocab/`: w, lps) and a 1-row `meta/`
    * (total token count) — so later batches score against an ARTIFACT
    * instead of re-aggregating the base every ingest (the
    * signature/semantic-store discipline applied to the LM-scoring
    * family; CCNet ships exactly this shape — a frozen wiki LM scoring
    * each crawl snapshot). Atomic temp+rename publish.
    */
  def writeLmStore(baseDocs: DataFrame, path: String): Unit =
    publishLm(docWordCounts(baseDocs), path)

  /** Token counts of a document frame — the LM store's additive unit. */
  private def docWordCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Normalize a vocabulary-count frame into the published store
    * layout (`vocab/`: w, c, lps on the 1e9 grid; `meta/`: total) —
    * shared by [[writeLmStore]] and [[appendToLmStore]] so the two
    * paths can never diverge. Atomic temp+rename.
    */
  private def publishLm(vocabCounts: DataFrame, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      vocabCounts.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".inprogress")
    fs.delete(tmp, true)
    // EAGER checkpoint is load-bearing on the append path: the merged
    // counts READ the store being replaced, so they must be fully
    // materialized before the publish swap below touches it
    val vocab = vocabCounts.localCheckpoint()
    val tot = vocab.agg(sum("c").as("total"))
    // r14: lps via the IntegerLn kernel (no libm in stored values —
    // the ensure* path carries the `iln` layout discriminator so a
    // pre-r14 store can never be served against the kernel oracle)
    graft.functions.IntegerLn
      .withLnRatio(vocab.crossJoin(broadcast(tot)), "c", "total")
      .select(col("w"), col("c"), col("iln_lr9").as("lps"))
      .write.parquet(tmp.toString + "/vocab")
    tot.write.parquet(tmp.toString + "/meta")
    StoreSwap.swapIn(fs, tmp, dst)
  }

  /** Fold a batch's token counts into the persisted LM — counts are
    * ADDITIVE, but every log-prob must renormalize because the total
    * changed, so (unlike the signature store's directory-level
    * append) the append REPUBLISHES the store from merged counts.
    * That is cheap by construction: the vocabulary is
    * dictionary-sized (MBs at any corpus scale) and the only
    * batch-sized work is the batch's own count aggregation.
    * Spec-checked law: append(base, batch) ≡ writeLmStore over
    * base ∪ batch, bit-for-bit.
    */
  def appendToLmStore(storePath: String, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val merged = spark.read.parquet(s"$storePath/vocab").select("w", "c")
      .unionAll(docWordCounts(batch))
      .groupBy("w").agg(sum("c").as("c"))
    publishLm(merged, storePath)
  }

  def isCompleteLmStore(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(path + "/vocab/_SUCCESS")) &&
      fs.exists(new org.apache.hadoop.fs.Path(path + "/meta/_SUCCESS"))

  /** Build-once helper (content-fingerprint path keying +
    * completeness gate — the ensure* discipline). EAGER by documented
    * design. The fingerprint folds an order-free CONTENT hash (xor of
    * per-row xxhash64 over id + text) alongside (count, max id), so a
    * regenerated fixture with the same shape but different text can
    * never silently reuse a stale persisted LM (r10, ADVICE).
    */
  def ensureLmStore(baseDocs: DataFrame, tag: String): String = {
    val fp = StoreSwap.contentFp(baseDocs, "ensureLmStore",
      "doc_id", Seq("doc_id", "text"))
    // `iln`: the r14 integer-ln vocab layout — keeps a pre-r14 store
    // (libm lps at the same content fingerprint) from being reused
    val path = s"/tmp/graft_lmstore_iln_${tag}_${fp.tag}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      baseDocs.sparkSession.sparkContext.hadoopConfiguration)
    if (!isCompleteLmStore(fs, path)) writeLmStore(baseDocs, path)
    path
  }

  /** Score a document batch against a PERSISTED unigram LM — the
    * per-ingest fluency gate: vocabulary broadcast (MBs at any corpus
    * size), the batch never shuffles beyond its per-doc aggregate,
    * and per-batch cost is independent of the base the LM was trained
    * on. Out-of-vocabulary tokens — which cannot occur in the
    * self-trained [[unigramLm]] but are the NORMAL case against a
    * frozen store — take the unseen-mass log-prob `ln(1/(total+1))`
    * (add-one style), so every token contributes a finite exact grid
    * value and the per-doc NLL stays an exact-integer ratio. Emits
    * doc_id, token and OOV counts, and the unrounded per-token NLL.
    */
  def scoreAgainstLmStore(storePath: String, docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val lm = spark.read.parquet(s"$storePath/vocab")
    // r14: OOV mass ln(1/(total+1)) = lnRatio9(1, total+1) — kernel
    val meta = graft.functions.IntegerLn
      .withLnRatio(spark.read.parquet(s"$storePath/meta"),
        "CAST(1 AS BIGINT)", "(total + 1)")
      .withColumn("oov_lps", col("iln_lr9"))
    val w = docs
      .select(col("doc_id"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    w.join(broadcast(lm), Seq("w"), "left")
      .crossJoin(broadcast(meta.select("oov_lps")))
      .select(col("doc_id"),
        col("lps").isNull.cast("int").as("oov"),
        coalesce(col("lps"), col("oov_lps")).as("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum("oov").cast("bigint").as("n_oov"),
        sum("t").as("s"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        // r13 coarsened emission — see unigramLm
        (expr("cast((-s) div 1000 as double)") / col("n_tok") /
          lit(1e6)).as("nll"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for the driver's store-scoring entry: the LM
    * trained on the base 4/5 of doc_ids (the exact-integer threshold
    * split both engines derive identically), the remaining 1/5 scored
    * with the same OOV rule.
    */
  def lmStoreScoreSql: String = {
    val (oovCtes, oovLast) = graft.functions.IntegerLn.sqlCtes(
      "tot", "CAST(1 AS BIGINT)", "(total + 1)",
      prefix = "oov_", ctePrefix = "oov_l")
    s"""WITH thr AS (SELECT (MAX(doc_id) * 4) // 5 AS t FROM documents),
      |bw AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id,
      |      UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
      |    FROM documents, thr WHERE doc_id < t)
      |  WHERE w <> ''),
      |${lpSqlCtesFrom("bw")}$oovCtes,
      |oov AS (SELECT oov_lr9 AS oov_lps FROM $oovLast),
      |dw AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id,
      |      UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
      |    FROM documents, thr WHERE doc_id >= t)
      |  WHERE w <> ''),
      |scored AS (
      |  SELECT doc_id,
      |    CASE WHEN lps IS NULL THEN 1 ELSE 0 END AS oovf,
      |    COALESCE(lps, oov_lps) AS t
      |  FROM dw LEFT JOIN lp USING (w) CROSS JOIN oov)
      |SELECT doc_id, COUNT(*) AS n_tok,
      |  CAST(SUM(oovf) AS BIGINT) AS n_oov,
      |  CAST((-CAST(SUM(t) AS BIGINT)) // 1000 AS DOUBLE)
      |    / COUNT(*) / 1e6 AS nll
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------
  // CCNet perplexity bucketing (head / middle / tail)
  // ---------------------------------------------------------------

  /** CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3): rank every document by its unigram-LM per-token NLL (the
    * same broadcast-vocabulary scorer as [[unigramLm]]) and split the
    * corpus into `buckets` equal-frequency tiers — head (most fluent),
    * middle, tail — the partition CCNet uses to keep/LM-filter/drop.
    *
    * The global ranking is [[Kernels.globalRank]] — range-partitioned
    * exact order statistics, NO unpartitioned window over the corpus
    * (the ledger prefix-sum runs over ≤ shuffle-partitions rows), so
    * the bucketing survives a 100 TB corpus where a naive
    * `ntile() over (order by nll)` funnels everything through one
    * reducer. Construction is EAGER (the kernel checkpoints its
    * shard-tagged frame — see its scaladoc).
    *
    * Exactness: log-probs ride the 1e9 scaled-BIGINT grid (sums exact
    * and order-free; DECIMAL(38,0) abs-sum guard raises on overflow
    * instead of wrapping); the per-doc NLL is a division of exact
    * integers, bit-identical in DuckDB, so ranks — and therefore
    * bucket boundaries — agree bit-for-bit with the oracle's
    * `ROW_NUMBER() OVER (ORDER BY nll, doc_id)`.
    */
  def perplexityBuckets(docs: DataFrame, buckets: Int = 3): DataFrame = {
    require(buckets > 0)
    val w = docs
      .select(col("doc_id"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    val lp = lpTable(w)
    val scored = w.join(broadcast(lp), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("lps").as("s"),
        sum(abs(col("lps")).cast("decimal(38,0)")).as("sabs"))
      .select(col("doc_id"), col("n_tok"),
        when(col("sabs") > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(lit("perplexityBuckets: BIGINT log-prob carrier " +
            "overflow — rescale the grid or shard the document"))
            .cast("double"))
          // r13 coarsened emission — see unigramLm; the RANKING below
          // also runs on the coarsened nll, so a single ln flip can't
          // reorder two docs unless their sums straddle a boundary
          .otherwise(expr("cast((-s) div 1000 as double)") /
            col("n_tok") / lit(1e6))
          .as("nll"))
    Kernels.globalRank(scored, Seq(col("nll"), col("doc_id")), "rnk")
      .withColumn("bucket", expr(s"((rnk - 1) * $buckets) div n_total"))
      .withColumn("tier",
        when(col("bucket") === 0, lit("head"))
          .when(col("bucket") === lit(buckets - 1), lit("tail"))
          .otherwise(lit("middle")))
      .select("doc_id", "n_tok", "nll", "rnk", "bucket", "tier")
      .orderBy("doc_id")
  }

  def perplexityBucketsSql(buckets: Int = 3): String =
    s"""WITH w AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id,
       |      UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> ''),
       |$lpSqlCtes,
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_tok, CAST(SUM(lps) AS BIGINT) AS s
       |  FROM w JOIN lp USING (w) GROUP BY 1),
       |nd AS (SELECT COUNT(*) AS n_total FROM perdoc),
       |r AS (
       |  SELECT doc_id, n_tok,
       |    CAST((-s) // 1000 AS DOUBLE) / n_tok / 1e6 AS nll,
       |    ROW_NUMBER() OVER (
       |      ORDER BY CAST((-s) // 1000 AS DOUBLE) / n_tok / 1e6, doc_id)
       |      AS rnk
       |  FROM perdoc)
       |SELECT doc_id, n_tok, nll, rnk,
       |  (rnk - 1) * $buckets // n_total AS bucket,
       |  CASE WHEN (rnk - 1) * $buckets // n_total = 0 THEN 'head'
       |       WHEN (rnk - 1) * $buckets // n_total = ${buckets - 1}
       |         THEN 'tail'
       |       ELSE 'middle' END AS tier
       |FROM r, nd ORDER BY doc_id""".stripMargin
}
