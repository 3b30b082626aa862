package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Kernels.{davgSql, dsumSql}

/** Document-corpus analysis operators (training-pipeline extension):
  * per-language stats, regex token counting, per-document quality
  * scoring, stopword-based language ID. All built-in expression
  * compositions (codegen'd, no UDFs); every ratio is an int/int
  * division → bit-deterministic against the oracle.
  */
object TextAnalysis {

  /** Per-language corpus stats over whitespace tokens. */
  def stats(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        (sum("n_chars") / count(lit(1))).as("avg_chars"),
        (sum("n_tokens") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  val statsSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
      |FROM (SELECT lang, n_chars,
      |        CASE WHEN length(trim(text)) = 0 THEN 0
      |             ELSE len(regexp_split_to_array(trim(text), '\s+')) END
      |          AS n_tokens
      |      FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Regex (BPE-ish pre-tokenizer) token counts per source. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", TextFunctions.regexTokenCount(col("text")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (sum("n_tokens") / count(lit(1))).as("avg_tokens"))
      .orderBy("source")

  val tokenCountsSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
       |FROM (SELECT source,
       |        len(regexp_extract_all(text, '${TextFunctions.tokenPattern}'))
       |          AS n_tokens
       |      FROM documents) t
       |GROUP BY source ORDER BY source""".stripMargin

  /** Per-document quality score: length saturation + type-token ratio
    * + stopword penalty — the standard cheap quality heuristics.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("w")).as("n_uniq"),
        sum(Kernels.indicator(col("w").isin("a", "the"))).as("n_stop"))
    docs.join(toks, "doc_id")
      .withColumn("ttr", col("n_uniq").cast("double") / col("n_tok"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tok"))
      .withColumn("quality",
        least(col("n_chars").cast("double") / 500, lit(1.0)) * 0.4 +
          col("ttr") * 0.4 + (lit(1) - col("stop_ratio")) * 0.2)
      .select("doc_id", "n_tok", "ttr", "stop_ratio", "quality")
      .orderBy("doc_id")
  }

  val qualitySql: String =
    """WITH toks AS (
      |  SELECT doc_id, COUNT(*) AS n_tok, COUNT(DISTINCT w) AS n_uniq,
      |    SUM(CASE WHEN w IN ('a','the') THEN 1 ELSE 0 END) AS n_stop
      |  FROM (SELECT doc_id,
      |          UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
      |        FROM documents) t
      |  WHERE w <> '' GROUP BY doc_id)
      |SELECT d.doc_id, n_tok,
      |  CAST(n_uniq AS DOUBLE) / n_tok AS ttr,
      |  CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
      |  LEAST(CAST(n_chars AS DOUBLE) / 500, 1.0) * 0.4
      |    + (CAST(n_uniq AS DOUBLE) / n_tok) * 0.4
      |    + (1 - CAST(n_stop AS DOUBLE) / n_tok) * 0.2 AS quality
      |FROM documents d JOIN toks ON d.doc_id = toks.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Deterministic distributed heavy hitters (frequent words):
    *
    *   - phase 1: per-partition Misra-Gries summaries of capacity `k`
    *     via `mapPartitions` — one pass, bounded memory, NO shuffle.
    *     Pigeonhole guarantee: any word with global count > N/k must
    *     exceed count_p > n_p/k in at least one partition, so the
    *     candidate union is a guaranteed superset of the true heavy
    *     hitters (capacity k ⇒ local survivors include everything
    *     above n_p/(k+1)).
    *   - phase 2: exact recount of the candidates only — a broadcast
    *     semi-join filters the corpus, so the only wide shuffle
    *     carries candidate occurrences, never the full vocabulary.
    *
    * The candidate SET depends on partitioning, but the exact filter
    * `cnt·k > N` makes the OUTPUT deterministic and layout-independent
    * — which is what lets a sketch-based operator be DuckDB-oracle-
    * checked bit-for-bit (the oracle states the plain exact
    * definition). This is the one sanctioned `mapPartitions` use:
    * genuinely imperative bounded-state per-partition logic, like the
    * reference's partition-local sketches.
    */
  def heavyHitters(docs: DataFrame, k: Int = 30): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    // one sketch pass emits BOTH the survivors and the partition's
    // word total (empty-string sentinel — never a word, they are
    // filtered nonempty), so N needs no extra corpus scan
    val sketch = words.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { w =>
        np += 1
        m.get(w) match {
          case Some(v) => m(w) = v + 1
          case None if m.size < k => m(w) = 1L
          case None =>
            for (key <- m.keys.toArray) {
              val v = m(key)
              if (v == 1L) m.remove(key) else m(key) = v - 1
            }
        }
      }
      m.keysIterator.map(w => (w, 0L)) ++ Iterator(("", np))
    }.toDF("w", "np").localCheckpoint()
    val cands = sketch.where(col("w") =!= "").select("w").distinct()
    val tot = sketch.where(col("w") === "").agg(sum("np").as("n"))
    words.join(broadcast(cands), "w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * k > col("n"))
      .select(col("w"), col("cnt"),
        (col("cnt").cast("double") / col("n")).as("frac"))
      .orderBy(desc("cnt"), col("w"))
  }

  /** DuckDB oracle for [[heavyHitters]] — the plain exact definition
    * the sketch+recount pipeline must reproduce.
    */
  def heavyHittersSql(k: Int = 30): String =
    s"""WITH w0 AS (
       |  SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |  FROM documents),
       |ww AS (SELECT w FROM w0 WHERE w <> ''),
       |tot AS (SELECT COUNT(*) AS n FROM ww),
       |c AS (SELECT w, COUNT(*) AS cnt FROM ww GROUP BY 1)
       |SELECT w, cnt, CAST(cnt AS DOUBLE) / n AS frac
       |FROM c, tot WHERE cnt * $k > n
       |ORDER BY cnt DESC, w""".stripMargin

  /** CONTENT-level drift between two corpus snapshots: which terms
    * entered / left the exact top-`k` and how far the survivors moved
    * — the "what changed" view the distributional PSI/KL reports
    * ([[Profiling.driftReport]]) deliberately aggregate away. Output
    * is ≤ 2k rows: term, per-side exact count and rank (count desc,
    * term asc — a total order), status, and the survivors' rank
    * shift.
    *
    * Scale shape: each side is one vocab-sized hash-agg collapsed to
    * k rows by a `TakeOrderedAndProject` LIMIT (never a corpus sort);
    * the rank is a row_number over the POST-LIMIT frame — window
    * bound: construction-bounded, ≤ k rows in one inherent partition
    * — and the churn join is k-vs-k. All counts/ranks exact integers.
    */
  def heavyHitterChurn(ref: DataFrame, cur: DataFrame,
      k: Int = 30): DataFrame = {
    def topk(docs: DataFrame) = {
      val counts = docs
        .select(explode(TextFunctions.words(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("w")).limit(k)
      counts.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("cnt"), col("w"))).cast("bigint"))
    }
    val r = topk(ref).select(col("w"), col("cnt").as("cnt_ref"),
      col("rk").as("rk_ref"))
    val c = topk(cur).select(col("w"), col("cnt").as("cnt_cur"),
      col("rk").as("rk_cur"))
    // full outer can't broadcast; without the hint the planner's
    // unknown-size default serves a sort-merge join even for two
    // k-row frames (the loopReport lesson — keep the audit at 0 SMJ)
    r.join(c.hint("shuffle_hash"), Seq("w"), "full_outer")
      .withColumn("status",
        when(col("rk_ref").isNotNull && col("rk_cur").isNotNull,
          "stayed")
          .when(col("rk_ref").isNotNull, "left").otherwise("entered"))
      .withColumn("rank_shift", col("rk_ref") - col("rk_cur"))
      .select("w", "cnt_ref", "rk_ref", "cnt_cur", "rk_cur", "status",
        "rank_shift")
      .orderBy(coalesce(col("rk_cur"), lit((k + 1).toLong)),
        coalesce(col("rk_ref"), lit((k + 1).toLong)), col("w"))
  }

  /** Driver-entry split: the SAME planted shift as the PSI report's
    * (`Profiling.driftSql`), so the two views complement each other
    * over one incident.
    */
  def heavyHitterChurnEntry(docs: DataFrame, k: Int = 30): DataFrame =
    heavyHitterChurn(
      docs.filter(Profiling.plantedShiftRefCol),
      docs.filter(Profiling.plantedShiftCurCol),
      k)

  /** DuckDB oracle for [[heavyHitterChurn]] — the plain exact
    * definition (per-side counts, ROW_NUMBER rank, full outer join).
    */
  def heavyHitterChurnSql(k: Int = 30): String = {
    val refW = Profiling.plantedShiftRefSql
    val curW = Profiling.plantedShiftCurSql
    def side(w: String) =
      s"""SELECT w, cnt, rk FROM (
         |    SELECT w, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w)
         |      AS rk
         |    FROM (SELECT w, COUNT(*) AS cnt FROM (
         |            SELECT UNNEST(regexp_split_to_array(trim(text),
         |              '\\s+')) AS w
         |            FROM documents WHERE $w) t
         |          WHERE w <> '' GROUP BY 1) c) q
         |  WHERE rk <= $k""".stripMargin
    s"""WITH tr AS (
       |  ${side(refW)}),
       |tc AS (
       |  ${side(curW)})
       |SELECT COALESCE(r.w, c.w) AS w, r.cnt AS cnt_ref,
       |  r.rk AS rk_ref, c.cnt AS cnt_cur, c.rk AS rk_cur,
       |  CASE WHEN r.w IS NOT NULL AND c.w IS NOT NULL THEN 'stayed'
       |       WHEN r.w IS NOT NULL THEN 'left'
       |       ELSE 'entered' END AS status,
       |  r.rk - c.rk AS rank_shift
       |FROM tr r FULL OUTER JOIN tc c ON r.w = c.w
       |ORDER BY COALESCE(c.rk, ${k + 1}), COALESCE(r.rk, ${k + 1}),
       |  COALESCE(r.w, c.w)""".stripMargin
  }

  /** DISTINCTIVE terms per source — the "what makes this source
    * different" curation view: TF-IDF over sources-as-documents,
    * top-`k` per source. Candidates are first capped by PIGEONHOLE:
    * only terms with `tf · capInv > n_source` survive, so each source
    * contributes AT MOST `capInv` candidate terms no matter the
    * corpus size — that cap is what makes the per-source ranking
    * window safe (and the df/broadcast frames dictionary-sized:
    * ≤ sources · capInv rows). df counts the sources where the term
    * is a candidate; score = tf · lnRatio9(S, df) — the ln comes from
    * the [[graft.functions.IntegerLn]] fixed-point kernel (r14: no
    * libm in any hashed value), so the score is an exact BIGINT
    * product, bit-identical cross-engine by construction, with
    * term-asc tie-break. Overflow headroom: tf · lr9 < 2⁶³ holds to
    * ~4e8 occurrences of one term in one source at 1e6 sources. r15:
    * the bound is ENFORCED — a per-row guard on the dictionary-sized
    * cands frame raises loudly past it (QualitySignals guard
    * convention) instead of relying on ANSI to catch the wrap;
    * pre-scale tf to go further.
    */
  /** tf·lr9 with the overflow guard BEFORE multiplying: tf ≤ cap div
    * lr9 ⟺ tf·lr9 ≤ cap; greatest(…, 1) keeps the division defined
    * when lr9 = 0 (df = n_sources ⇒ score 0, can't overflow). The
    * `cap` parameter exists so the spec can fire the guard with a
    * planted bound (the real one needs ~4e8 occurrences of one term).
    */
  private[graft] def guardedScore9(
      cap: Long = Long.MaxValue): Column =
    when(col("tf") > expr(s"${cap}L div greatest(iln_lr9, 1L)"),
      raise_error(concat(
        lit("sourceSignatureTerms: tf*idf BIGINT overflow for term "),
        col("w"), lit(" — pre-scale tf"))).cast("bigint"))
      .otherwise(col("tf") * col("iln_lr9"))

  def sourceSignatureTerms(docs: DataFrame, k: Int = 5,
      capInv: Int = 1000): DataFrame = {
    val terms = docs.select(col("source"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    val tf = terms.groupBy("source", "w").agg(count(lit(1)).as("tf"))
    val n = terms.groupBy("source").agg(count(lit(1)).as("n"))
    val cands = tf.join(broadcast(n), "source")
      .filter(col("tf") * capInv > col("n"))
    val dfs = cands.groupBy("w").agg(count(lit(1)).as("df"))
    val sources = docs.select(countDistinct("source").as("n_sources"))
    val scored = graft.functions.IntegerLn.withLnRatio(
        cands.join(broadcast(dfs), "w").crossJoin(broadcast(sources)),
        "n_sources", "df")
      .withColumn("score9", guardedScore9())
    // emission keeps the r13 1e-6 resolution (score9 div 1000) for
    // interface stability; with the integer kernel the full-resolution
    // value is already deterministic, so the division is a formatting
    // choice, not a cross-engine bet. score9 ≥ 0 (df ≤ n_sources ⇒
    // lr9 ≥ 0), so Spark div ≡ DuckDB //
    val coarse = scored.withColumn("score6",
      expr("score9 div 1000"))
    // window bound: construction-bounded — ≤ capInv rows per source
    // by the pigeonhole filter above
    coarse.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(desc("score6"), col("w"))).cast("bigint"))
      .filter(col("rk") <= k)
      .select(col("source"), col("w"), col("tf"), col("df"),
        (col("score6").cast("double") / lit(1e6)).as("tfidf"),
        col("rk"))
      .orderBy("source", "rk")
  }

  /** DuckDB oracle for [[sourceSignatureTerms]] — the plain exact
    * definition (pigeonhole candidate cap, candidate-df, grid score,
    * per-source ROW_NUMBER).
    */
  def sourceSignatureTermsSql(k: Int = 5, capInv: Int = 1000): String = {
    val (lnCtes, lastCte) =
      graft.functions.IntegerLn.sqlCtes("sc0", "n_sources", "df")
    s"""WITH tw AS (
       |  SELECT source, w FROM (
       |    SELECT source,
       |      UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents) t
       |  WHERE w <> ''),
       |tf AS (SELECT source, w, COUNT(*) AS tf FROM tw GROUP BY 1, 2),
       |n AS (SELECT source, COUNT(*) AS n FROM tw GROUP BY 1),
       |cands AS (
       |  SELECT f.source, f.w, f.tf
       |  FROM tf f JOIN n USING (source) WHERE f.tf * $capInv > n.n),
       |s AS (SELECT COUNT(DISTINCT source) AS n_sources FROM documents),
       |d AS (SELECT w, COUNT(*) AS df FROM cands GROUP BY 1),
       |sc0 AS (
       |  SELECT c.source, c.w, c.tf, d.df, s.n_sources
       |  FROM cands c JOIN d USING (w) CROSS JOIN s)$lnCtes,
       |sc AS (
       |  SELECT source, w, tf, df, tf * iln_lr9 AS score9
       |  FROM $lastCte),
       |r AS (
       |  SELECT source, w, tf, df, score9 // 1000 AS score6,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY score9 // 1000 DESC, w) AS rk
       |  FROM sc)
       |SELECT source, w, tf, df,
       |  CAST(score6 AS DOUBLE) / 1e6 AS tfidf, rk
       |FROM r WHERE rk <= $k ORDER BY source, rk""".stripMargin
  }

  /** Stopword-hit language ID: count stopword matches per candidate
    * language, predict the argmax (ties → lexicographically first;
    * all-zero → 'und'), reported as a (actual, predicted) confusion
    * table.
    */
  def langId(docs: DataFrame): DataFrame = {
    val scoreAggs = TextFunctions.stopwords.toSeq.sortBy(_._1).map {
      case (l, ws) =>
        sum(Kernels.indicator(col("w").isin(ws: _*))).as(s"score_$l")
    }
    val scored = docs
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .groupBy("doc_id", "lang")
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val langs = TextFunctions.stopwords.keys.toSeq.sorted
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    val predicted = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") > 0 && col(s"score_$l") === best, lit(l))
        .otherwise(acc)
    }
    // foldRight gives earlier (lexicographic) languages precedence on ties
    scored
      .withColumn("predicted", predicted)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val langIdSql: String = {
    val langs = TextFunctions.stopwords.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (l, ws) =>
      val in = ws.map(w => s"'$w'").mkString(", ")
      s"SUM(CASE WHEN w IN ($in) THEN 1 ELSE 0 END) AS score_$l"
    }.mkString(",\n    ")
    val bestExpr = langs.map { case (l, _) => s"score_$l" }
      .reduceRight((a, b) => s"GREATEST($a, $b)")
    val caseArms = langs.map { case (l, _) =>
      s"WHEN score_$l > 0 AND score_$l = best THEN '$l'"
    }.mkString("\n    ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM (SELECT doc_id, lang,
       |          UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |        FROM documents) t
       |  GROUP BY doc_id, lang),
       |withbest AS (
       |  SELECT *, $bestExpr AS best FROM scored),
       |pred AS (
       |  SELECT lang,
       |    CASE $caseArms
       |    ELSE 'und' END AS predicted
       |  FROM withbest)
       |SELECT lang, predicted, COUNT(*) AS n FROM pred
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  // ---------------------------------------------------------------
  // Winnowing fingerprints (rolling-window k-gram minima)
  // ---------------------------------------------------------------

  /** Document fingerprinting by WINNOWING (Schleimer et al., the MOSS
    * scheme): hash every word `k`-gram, slide a window of `w`
    * consecutive gram hashes, keep each window's minimum — a
    * guaranteed-coverage fingerprint subset (any shared run of
    * `k + w - 1` words between two documents shares at least one
    * fingerprint). Output per doc: gram/fingerprint counts and the md5
    * of the sorted fingerprint list, proving the SELECTED SET itself
    * matches across engines.
    *
    * Entirely map-side — the grams, hashes, window minima and dedup
    * are one chain of array HOFs per row (no explode, no shuffle
    * before the output sort). Gram hashes use the portable 60-bit md5
    * convention; documents shorter than one window contribute their
    * single overall minimum, matching the paper's "every document gets
    * at least one fingerprint".
    */
  def winnowFingerprint(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val gram = (0 until k).map(j => s"element_at(ws, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col("doc_id"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .withColumn("hs", expr(
        s"""CASE WHEN size(ws) < $k THEN array()
           |ELSE transform(sequence(1, size(ws) - ${k - 1}),
           |  i -> cast(conv(substring(md5($gram), 1, 15), 16, 10) as bigint))
           |END""".stripMargin))
      .withColumn("prints", expr(
        s"""CASE WHEN size(hs) = 0 THEN array()
           |ELSE array_sort(array_distinct(
           |  transform(sequence(1, greatest(size(hs) - ${w - 1}, 1)),
           |            i -> array_min(slice(hs, i, $w)))))
           |END""".stripMargin))
      .select(col("doc_id"), size(col("hs")).cast("bigint").as("n_grams"),
        size(col("prints")).cast("bigint").as("n_prints"),
        md5(expr("array_join(transform(prints, p -> cast(p as string)), ',')"))
          .as("prints_md5"))
      .orderBy("doc_id")
  }

  def winnowFingerprintSql(k: Int = 3, w: Int = 4): String = {
    val gram = (0 until k).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) < $k THEN []
       |    ELSE list_transform(range(1, len(ws) - ${k - 1} + 1),
       |      i -> CAST('0x' || substring(md5($gram), 1, 15) AS BIGINT))
       |    END AS hs
       |  FROM t),
       |p AS (
       |  SELECT doc_id, hs,
       |    CASE WHEN len(hs) = 0 THEN []
       |    ELSE list_sort(list_distinct(
       |      list_transform(range(1, greatest(len(hs) - ${w - 1}, 1) + 1),
       |                     i -> list_min(hs[i : i + ${w - 1}]))))
       |    END AS prints
       |  FROM g)
       |SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
       |  CAST(len(prints) AS BIGINT) AS n_prints,
       |  md5(array_to_string(prints, ',')) AS prints_md5
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Cross-document repeated n-gram spans — the exact-substring
    * duplication signal of Lee et al., "Deduplicating Training Data
    * Makes Language Models Better" (arXiv:2107.06499), as a per-doc
    * report: for every `width`-token window (stride 1), does the
    * identical window occur in ≥2 distinct documents? Emitted per doc:
    * window count, duplicated-window count, duplicated fraction (an
    * exact-integer ratio — unrounded by the house rule). At 100 TB the
    * window explosion is the same cardinality class as the shingle
    * front end (one row per token), the gram tally is one hash-agg on
    * the portable 60-bit md5 key, and the count-back join is
    * hash-hinted — the passage-dedup shape with overlapping windows.
    * Docs shorter than one window carry no signal and are excluded
    * (identically in the oracle).
    */
  def repeatedNgrams(docs: DataFrame, width: Int = 8): DataFrame = {
    val gram = (0 until width).map(j => s"element_at(ws, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    val grams = docs
      .select(col("doc_id"),
        expr(s"filter(${TextFunctions.wordsSql("text")}, w -> w != '')")
          .as("ws"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(ws) < $width THEN array()
           |ELSE transform(sequence(1, size(ws) - ${width - 1}),
           |  i -> cast(conv(substring(md5($gram), 1, 15), 16, 10) as bigint))
           |END""".stripMargin)).as("gh"))
    val tally = grams.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
    grams.join(tally.hint("shuffle_hash"), "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
      .orderBy("doc_id")
  }

  def repeatedNgramsSql(width: Int = 8): String = {
    val gram = (0 until width).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                w -> w <> '') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CAST('0x' || substring(md5($gram), 1, 15) AS BIGINT) AS gh
       |  FROM t,
       |    UNNEST(range(1, greatest(len(ws) - ${width - 1}, 0) + 1)) AS u(i)),
       |c AS (SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
       |SELECT doc_id, COUNT(*) AS n_windows,
       |  CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN 1 END), 0) AS BIGINT)
       |    AS n_dup_windows,
       |  CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN 1 END), 0) AS DOUBLE)
       |    / COUNT(*) AS dup_frac
       |FROM g JOIN c USING (gh)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Vocabulary-growth (Heaps-law) profile — the corpus-composition
    * diagnostic a pretraining run reads before sizing a tokenizer or
    * spotting a template-heavy crawl (sublinear type growth = healthy
    * Zipfian text; near-linear = ids/hashes/boilerplate explosions):
    * per log₂ doc-id bucket, the tokens contributed, the NEW types
    * (words whose corpus-first occurrence — min doc_id — falls in the
    * bucket), cumulative tokens/types and the running type-token
    * ratio.
    *
    * Scale shape: one tokenize pass feeds two hash-aggs (per-word min
    * doc_id — the vocabulary frame, dictionary-sized — and per-bucket
    * token counts); buckets are exact binary-digit counts (the
    * [[Dedup.componentSizeHistogram]] convention — float log2 floors
    * differently per engine at exact powers). Window bound (r10
    * convention): the cumulative ledger is unpartitioned but runs over
    * the ≤64-row bucket frame — bounded by the BIGINT width, never by
    * data. ttr is an exact-integer ratio, unrounded.
    */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    def bucket(c: org.apache.spark.sql.Column) =
      (length(bin(c + lit(1L))) - 1).cast("long")
    val newTypes = tok.groupBy("w").agg(min("doc_id").as("first_doc"))
      .groupBy(bucket(col("first_doc")).as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val tokens = tok.groupBy(bucket(col("doc_id")).as("bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("doc_id").as("n_docs"))
    val led = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokens.join(newTypes, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_tokens", sum("n_tokens").over(led))
      .withColumn("cum_types", sum("new_types").over(led))
      .withColumn("ttr", col("cum_types").cast("double") / col("cum_tokens"))
      .select("bucket", "n_docs", "n_tokens", "new_types", "cum_tokens",
        "cum_types", "ttr")
      .orderBy("bucket")
  }

  /** DuckDB oracle for [[vocabGrowth]]. */
  val vocabGrowthSql: String =
    """WITH tok AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
      |    FROM documents) t WHERE w <> ''),
      |ft AS (SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY 1),
      |nt AS (
      |  SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS bucket,
      |    COUNT(*) AS new_types
      |  FROM ft GROUP BY 1),
      |tk AS (
      |  SELECT CAST(length(bin(doc_id + 1)) - 1 AS BIGINT) AS bucket,
      |    COUNT(*) AS n_tokens,
      |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |  FROM tok GROUP BY 1),
      |j AS (
      |  SELECT tk.bucket, tk.n_docs, tk.n_tokens,
      |    COALESCE(nt.new_types, 0) AS new_types
      |  FROM tk LEFT JOIN nt USING (bucket)),
      |c AS (
      |  SELECT bucket, n_docs, n_tokens, new_types,
      |    CAST(SUM(n_tokens) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens,
      |    CAST(SUM(new_types) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_types
      |  FROM j)
      |SELECT bucket, n_docs, n_tokens, new_types, cum_tokens, cum_types,
      |  CAST(cum_types AS DOUBLE) / cum_tokens AS ttr
      |FROM c ORDER BY bucket""".stripMargin
}
