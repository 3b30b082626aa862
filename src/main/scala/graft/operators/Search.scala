package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Keyword retrieval over the document corpus: BM25-ranked top-k for a
  * fixed term set (Robertson/Sparck Jones probabilistic weighting, the
  * standard Okapi BM25 formulation). A training-data pipeline runs
  * this shape constantly — "find the documents most about X" for
  * curriculum slicing, targeted audits, and contamination triage —
  * and it is also the reference point every learned retriever is
  * evaluated against.
  *
  * Scale shape (100 TB story): the corpus is tokenized ONCE — a single
  * hash-agg keyed doc_id carries the document length and every
  * per-term frequency as conditional counts (|terms| extra agg
  * columns, map-side partials). Corpus stats + per-term document
  * frequencies reduce that frame to ONE row, which broadcasts back;
  * scoring is then a pure row-local map and the global top-k plans as
  * TakeOrderedAndProject (per-partition heaps, no full sort). Total:
  * one corpus scan, one wide shuffle, nothing quadratic, no windows,
  * no UDFs.
  *
  * Cross-engine exactness: tf/df/dl/N are exact integers, so every
  * shared ratio is a bit-identical IEEE chain in DuckDB; the one
  * transcendental (the idf log) is snapped to a 1e9 fixed-point grid
  * and each per-term score contribution to a 1e12 grid, summed
  * row-locally over BIGINTs in a fixed order — exact and identical in
  * the oracle (the QualitySignals log-prob convention, CLAUDE.md).
  */
object Search {

  val defaultTerms: Seq[String] = Seq("hash", "join", "filter")

  /** BM25 top-k: one row per retrieved document (≥1 term matched) with
    * its matched-term count and score, ranked (score desc, doc_id asc)
    * — a total order, so the LIMIT is deterministic.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = defaultTerms,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
    // ONE corpus aggregation: document length + every per-term tf
    val tfCols = terms.indices.map(i =>
      sum(when(col("w") === terms(i), lit(1L)).otherwise(lit(0L)))
        .as(s"tf$i"))
    val perDoc = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
      // TWO consumers (the stats reduction and the scoring map) — the
      // lazy plan barrier materializes the narrow (doc_id, dl, tf*)
      // frame once instead of re-scanning the corpus per branch;
      // eager=false so constructing the entry never executes it
      .localCheckpoint(eager = false)
    // corpus stats + per-term dfs: ONE row, broadcast back
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df$i"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"),
      (sum("dl").as("sum_dl") +: dfCols): _*)
    // r14: idf via the IntegerLn kernel on the 1-ROW stats frame —
    // ln(1 + (N−df+0.5)/(df+0.5)) = ln((2N+2)/(2df+1)), an exact
    // integer ratio, so idf9 is bit-identical cross-engine by
    // construction (no libm in any hashed value). Overflow headroom:
    // 2N+2 wraps only past ~4.6e18 DOCUMENTS (< 22 bytes/doc at
    // 100 TB) — unreachable, no pre-scaling needed. barrier = false
    // (r15): stats is ONE aggregate over the perDoc checkpoint, so the
    // plan is already tiny — the extra barrier job was the r14
    // text_bm25_topk ×1.51 fixed-cost regression.
    val statsIdf = graft.functions.IntegerLn.withLnRatios(stats,
        terms.indices.map(i =>
          ("(2 * n_docs + 2)", s"(2 * df$i + 1)", s"iln${i}_")),
        barrier = false)
      .select((col("n_docs") +: col("sum_dl") +:
        terms.indices.map(i => col(s"iln${i}_lr9").as(s"idf9_$i"))): _*)
    // row-local scoring: per-term contribution on the 1e12 grid;
    // idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) — the IEEE
    // chain runs on exact integers and literals only (single ops,
    // identical in DuckDB)
    def term9(i: Int): Column =
      when(col(s"tf$i") > 0,
        floor(col(s"idf9_$i").cast("double") / lit(1e9) *
          (col(s"tf$i").cast("double") * lit(k1 + 1.0) /
            (col(s"tf$i").cast("double") + lit(k1) * (lit(1.0 - b) +
              lit(b) * (col("dl").cast("double") /
                (col("sum_dl").cast("double") / col("n_docs")))))) *
          lit(1e12) + lit(0.5)).cast("bigint"))
        .otherwise(lit(0L))
    val s9 = terms.indices.map(term9).reduce(_ + _)
    val nTerms = terms.indices
      .map(i => when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    perDoc.crossJoin(broadcast(statsIdf))
      // emission keeps the r13 1e-9 resolution (s9 div 1000) for
      // interface stability; the value is deterministic at ANY
      // resolution now — the division is formatting, not a bet
      .withColumn("s9w", s9)
      .select(col("doc_id"), nTerms.as("n_terms"),
        (expr("s9w div 1000").cast("double") / lit(1e9)).as("score"))
      .filter(col("n_terms") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** DuckDB oracle for [[bm25TopK]] — identical ratio chains and the
    * same fixed-point grids; constants CAST to DOUBLE (DuckDB decimal
    * literal trap, CLAUDE.md).
    */
  def bm25TopKSql(terms: Seq[String] = defaultTerms, k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 20): String = {
    val tfDefs = terms.indices.map(i =>
      s"""CAST(SUM(CASE WHEN w = '${terms(i)}' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tf$i""".stripMargin).mkString(",\n    ")
    val dfDefs = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n    ")
    // r14: idf via the IntegerLn kernel CTEs chained over the 1-row
    // stats CTE — same integer recurrence as the Spark side
    val (idfCtes, idfLast) = terms.indices
      .foldLeft(("", "stats")) { case ((acc, from), i) =>
        val (c, l) = graft.functions.IntegerLn.sqlCtes(from,
          "(2 * n_docs + 2)", s"(2 * df$i + 1)",
          prefix = s"iln${i}_", ctePrefix = s"iln${i}_l")
        (acc + c, l)
      }
    val idfSel = terms.indices
      .map(i => s"iln${i}_lr9 AS idf9_$i").mkString(", ")
    def term9(i: Int): String =
      s"""CASE WHEN tf$i > 0 THEN
         |      CAST(floor(CAST(idf9_$i AS DOUBLE) / 1e9 *
         |          (CAST(tf$i AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE) /
         |            (CAST(tf$i AS DOUBLE) + CAST($k1 AS DOUBLE) *
         |              (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE) *
         |                (CAST(dl AS DOUBLE) /
         |                  (CAST(sum_dl AS DOUBLE) / n_docs))))) * 1e12
         |        + CAST(0.5 AS DOUBLE)) AS BIGINT)
         |      ELSE 0 END""".stripMargin
    val s9 = terms.indices.map(term9).mkString("(", "\n    + ", ")")
    val nTerms = terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END")
      .mkString("CAST((", " + ", ") AS BIGINT)")
    s"""WITH tok AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents) t
       |  WHERE w <> ''),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS dl,
       |    $tfDefs
       |  FROM tok GROUP BY 1),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |    $dfDefs
       |  FROM perdoc)$idfCtes,
       |statsx AS (SELECT n_docs, sum_dl, $idfSel FROM $idfLast),
       |scored AS (
       |  SELECT doc_id,
       |    $nTerms AS n_terms,
       |    $s9 AS s9
       |  FROM perdoc, statsx)
       |SELECT doc_id, n_terms,
       |  CAST(s9 // 1000 AS DOUBLE) / 1e9 AS score
       |FROM scored WHERE n_terms > 0
       |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Deterministic (qid, qtext) fixture for the query-TABLE entry. */
  val defaultQueryTable: Seq[(Long, String)] = Seq(
    (0L, "hash join merge"),
    (1L, "filter scan"),
    (2L, "window agg group"),
    (3L, "slow query"),
    (4L, "vector stream batch"))

  /** BM25 over a query TABLE — the retrieval-pipeline form
    * ([[bm25TopK]] takes driver-literal terms; a real pipeline scores
    * a query SET): per-qid top-k over (qid, qtext) rows, ranked
    * (score desc, doc_id asc).
    *
    * Scale shape: ONE corpus tokenization feeds a (doc_id, word, tf)
    * aggregate (map-side partials), lazily checkpointed; document
    * lengths and the 1-row corpus stats derive from it without a
    * second scan. The query side is dictionary-sized by definition, so
    * query terms, per-term dfs and the query table itself all
    * BROADCAST — the corpus never shuffles for them. Per-(qid, doc)
    * scores are exact BIGINT grid sums (same 1e9/1e12 grids as
    * [[bm25TopK]]), and the per-qid top-k rides the
    * [[graft.functions.BottomKByKey]] bounded heap on the exact
    * integer key (-s9, doc_id) — map-side partials carry ≤topK rows
    * per (qid, partition), never a window, so one hot query cannot
    * serialize a reducer.
    */
  def bm25Queries(docs: DataFrame,
      queryTable: Seq[(Long, String)] = defaultQueryTable,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import graft.functions.BottomKByKey.bottom_k_by_key
    val spark = docs.sparkSession
    import spark.implicits._
    val queries = queryTable.toDF("qid", "qtext")
    val tokAgg = docs
      .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      // THREE consumers (doc lengths, postings, and stats via lengths)
      // — one corpus scan + one (doc_id, w) shuffle, materialized once
      .localCheckpoint(eager = false)
    val perDoc = tokAgg.groupBy("doc_id").agg(sum("tf").as("dl"))
      .localCheckpoint(eager = false)
    val qterms = queries.select(col("qid"),
        explode(TextFunctions.words(col("qtext"))).as("w"))
      .where(col("w") =!= "").distinct()
    val postings = tokAgg
      .join(broadcast(qterms.select("w").distinct()), Seq("w"), "left_semi")
      .localCheckpoint(eager = false)
    val dfs = postings.groupBy("w").agg(count(lit(1)).as("df"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("sum_dl"))
    // r14: idf via the IntegerLn kernel on the dictionary-sized
    // (query-term) dfs frame — ln((2N+2)/(2df+1)) as an exact integer
    // ratio, bit-identical cross-engine by construction
    val dfsIdf = graft.functions.IntegerLn.withLnRatio(
        dfs.crossJoin(broadcast(stats)),
        "(2 * n_docs + 2)", "(2 * df + 1)")
      .select(col("w"), col("iln_lr9").as("idf9"))
    val c9 = floor(col("idf9").cast("double") / lit(1e9) *
        (col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) +
            lit(b) * (col("dl").cast("double") /
              (col("sum_dl").cast("double") / col("n_docs")))))) *
        lit(1e12) + lit(0.5)).cast("bigint")
    postings
      .join(broadcast(qterms), "w")
      .join(broadcast(dfsIdf), "w")
      .join(perDoc.hint("shuffle_hash"), "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), c9.as("c9"))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("c9").as("s9"))
      // r13 coarsened emission + ranking (drift-family convention):
      // s9 ≥ 0 (idf ≥ 0, contributions positive), so one integer
      // division drops the ln-flip-exposed last 3 digits of the
      // 1e-12-grid sum; the top-k key is the coarsened value, making
      // the cut flip-immune (near-ties within 1 raw unit become hard
      // ties at 1e-9, broken by doc_id)
      .withColumn("s6", expr("s9 div 1000"))
      .groupBy("qid")
      .agg(bottom_k_by_key(struct((-col("s6")).as("key"),
        col("doc_id").as("id"), col("n_terms").as("payload")), topK)
        .as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("doc_id"),
        col("col.payload").as("n_terms"),
        ((-col("col.key")).cast("double") / lit(1e9)).as("score"),
        (col("pos") + 1).cast("bigint").as("rk"))
      .orderBy("qid", "rk")
  }

  /** DuckDB oracle for [[bm25Queries]] — the query table inlined as
    * VALUES, identical ratio chains and fixed-point grids.
    */
  def bm25QueriesSql(queryTable: Seq[(Long, String)] = defaultQueryTable,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): String =
    queriesCtePrefix(queryTable, k1, b) +
      s"""
       |SELECT qid, doc_id, n_terms, score, rk FROM ranked
       |WHERE rk <= $topK ORDER BY qid, rk""".stripMargin

  /** The shared retrieval CTE chain (query table → tokenization →
    * postings → idf → scored → ranked) used by both [[bm25QueriesSql]]
    * and [[bm25RerankSql]] — ONE generator, so the rerank oracle's
    * candidate set is the retrieval oracle by construction.
    */
  private def queriesCtePrefix(queryTable: Seq[(Long, String)],
      k1: Double, b: Double): String = {
    val values = queryTable
      .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }
      .mkString(", ")
    val (idfCtes, idfLast) = graft.functions.IntegerLn.sqlCtes(
      "idfsrc", "(2 * n_docs + 2)", "(2 * df + 1)")
    s"""WITH q AS (SELECT * FROM (VALUES $values) AS t(qid, qtext)),
       |qterms AS (
       |  SELECT DISTINCT qid, w FROM (
       |    SELECT qid, UNNEST(regexp_split_to_array(trim(qtext), '\\s+')) AS w
       |    FROM q) t WHERE w <> ''),
       |tokagg AS (
       |  SELECT doc_id, w, COUNT(*) AS tf FROM (
       |    SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents) t
       |  WHERE w <> '' GROUP BY 1, 2),
       |perdoc AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
       |  FROM tokagg GROUP BY 1),
       |postings AS (
       |  SELECT doc_id, w, tf FROM tokagg
       |  WHERE w IN (SELECT DISTINCT w FROM qterms)),
       |dfs AS (SELECT w, COUNT(*) AS df FROM postings GROUP BY 1),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
       |  FROM perdoc),
       |idfsrc AS (SELECT w, df, n_docs FROM dfs, stats)$idfCtes,
       |idfs AS (SELECT w, iln_lr9 AS idf9 FROM $idfLast),
       |contrib AS (
       |  SELECT qt.qid, p.doc_id,
       |    CAST(floor(CAST(idf9 AS DOUBLE) / 1e9 *
       |        (CAST(tf AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE) /
       |          (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) *
       |            (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE) *
       |              (CAST(dl AS DOUBLE) /
       |                (CAST(sum_dl AS DOUBLE) / n_docs))))) * 1e12
       |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c9
       |  FROM postings p
       |  JOIN qterms qt USING (w)
       |  JOIN idfs USING (w)
       |  JOIN perdoc USING (doc_id), stats),
       |scored AS (
       |  SELECT qid, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |    CAST(SUM(c9) AS BIGINT) AS s9
       |  FROM contrib GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, doc_id, n_terms,
       |    CAST(s9 // 1000 AS DOUBLE) / 1e9 AS score,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY s9 // 1000 DESC, doc_id) AS rk
       |  FROM scored)""".stripMargin
  }

  /** Cross-encoder-style RERANK over the BM25 candidates — the third
    * stage of the standard retrieval pipeline (retrieve → rank →
    * rerank): the top-`topK` page from [[bm25Queries]] is re-scored
    * with INTERACTION features that BM25's bag-of-words model cannot
    * see, then cut to `topR`. (A learned cross-encoder is a model
    * inference at this exact seam — same candidate plumbing, different
    * scorer; this lexical scorer keeps the stage deterministic and
    * oracle-exact.)
    *
    * Features, per (query, candidate) pair over the candidate's full
    * token sequence — all exact integers:
    *  - `coverage`: distinct query terms present (the dominant field);
    *  - `n_adj`: adjacent DISTINCT-term pairs (token at p and p+1 both
    *    query terms, different ones) — the phrase-proximity signal;
    *  - `tf_q`: total query-term occurrences;
    *  - `first_pos`: earliest match position (earlier = better).
    * Packed injectively into one BIGINT
    * (`min(coverage,9999)·1e13 + min(n_adj,9999)·1e8 +
    * min(tf_q,9999)·1e4 + (9999 − min(first_pos,9999))` — ALL four
    * fields capped at 9999 (r17: coverage too, so the band
    * disjointness holds for any queryTable, not just sane ones); max
    * ≈ 5·10¹³ for a 5-term query), so the rerank order is hash-exact
    * cross-engine with no float anywhere.
    *
    * Scale shape: the candidate set is `|queries| · topK` rows —
    * bounded by the QUERY LOAD, independent of corpus size (the real
    * cross-encoder deployment economics: rerank touches only the
    * retrieved page). The candidate ids are PUSHED into the documents
    * re-read as a parquet `In` filter (row-group stats skip everything
    * else — a broadcast semi-join would still scan the full corpus;
    * the ladder showed exactly that growth term before the pushdown),
    * behind a COUNTED cap guard ([[prunedCandidateScan]]): past
    * `maxPushdownIds` the re-read degrades to a shuffle_hash
    * left-semi prune instead of an unbounded driver collect. Tokens
    * explode for candidate docs only, the adjacency pass is an
    * equi-join on (qid, doc_id, pos+1) over that bounded frame, and
    * the final cut is a per-qid window bounded by construction
    * (≤ topK rows per qid). Construction-EAGER (the candidate-id
    * count + bounded collect — one query-load-sized read off the
    * retrieval checkpoint, which every downstream branch reuses;
    * documented per the
    * [[graft.operators.Dedup.guardedSelfJoinPairs]] convention);
    * the only corpus-sized work is the retrieval stage it shares with
    * [[bm25Queries]].
    */
  def bm25Rerank(docs: DataFrame,
      queryTable: Seq[(Long, String)] = defaultQueryTable,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
      topR: Int = 5,
      maxPushdownIds: Long = defaultMaxPushdownIds): DataFrame =
    rerankCandidates(docs, bm25Queries(docs, queryTable, k1, b, topK),
      queryTable, topR, maxPushdownIds)

  /** Default cap on the candidate-id pushdown ([[prunedCandidateScan]]):
    * 100k ids ≈ a few MB of filter literals — comfortably inside
    * driver memory and the scan's In/INSET machinery, far above the
    * fixture's query load (|queries|·topK ≤ tens). Past it the re-read
    * degrades rather than collecting an unbounded list.
    */
  val defaultMaxPushdownIds: Long = 100000L

  /** The candidate-pruned corpus re-read shared by every rerank path —
    * ONE definition so the cap policy and the prune shape cannot
    * diverge (the [[graft.operators.Dedup]] `prunedSubstringScan`
    * discipline). `candIds` must be the DISTINCT candidate doc_ids.
    *
    * Within cap: a bounded collect (the count is verified FIRST, so
    * the collect is provably ≤ `maxPushdownIds` rows) pushes the id
    * list into the parquet scan as `PushedFilters: In(doc_id, …)` —
    * row-group stats skip everything else, so the re-read is
    * page-sized, never corpus-sized (a broadcast semi-join would still
    * scan the full corpus; the ladder showed exactly that growth term
    * before the pushdown — CLAUDE.md r16 convention).
    *
    * Over cap: a shuffle_hash left-semi prune against the candidate-id
    * frame — the honest degraded cost is ONE full corpus scan plus a
    * corpus-sized exchange (no driver collect, no broadcast), after
    * which everything downstream is candidate-page-sized again. The
    * count makes construction EAGER (one job over the caller's
    * checkpointed page, which every downstream branch reuses anyway).
    */
  private[graft] def prunedCandidateScan(docs: DataFrame,
      candIds: DataFrame, maxPushdownIds: Long): DataFrame =
    if (candIds.count() <= maxPushdownIds) {
      val ids = candIds.collect().map(_.getLong(0)).sorted.toSeq
      docs.filter(col("doc_id").isin(ids: _*))
    } else
      docs.join(candIds.hint("shuffle_hash"), Seq("doc_id"), "left_semi")

  /** Shared interaction-FEATURE stage over a retrieval page — the
    * candidate plumbing every rerank scorer (the lexical packer in
    * [[rerankCandidates]], the model dot product in
    * [[rerankModelCandidates]], a future learned cross-encoder) plugs
    * into: one row per (qid, candidate) with
    * (coverage, n_adj, tf_q, first_pos, bm25_rk). Construction-EAGER
    * (the candidate-id count + bounded collect inside
    * [[prunedCandidateScan]] — documented per the
    * [[graft.operators.Dedup.guardedSelfJoinPairs]] convention).
    */
  /** The query table exploded to DISTINCT (qid, term) rows —
    * dictionary-sized, shared by every retrieval/rerank stage.
    */
  private[operators] def queryTerms(spark: org.apache.spark.sql.SparkSession,
      queryTable: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    queryTable.toDF("qid", "qtext")
      .select(col("qid"),
        explode(TextFunctions.words(col("qtext"))).as("w"))
      .where(col("w") =!= "").distinct()
  }

  /** The candidate page as a (qid, doc_id, bm25_rk) barrier — consumed
    * three times downstream (id pruning, pair restriction, final
    * join), per the r7 convention.
    */
  private[operators] def candPage(page: DataFrame): DataFrame =
    page.select(col("qid"), col("doc_id"), col("rk").as("bm25_rk"))
      .localCheckpoint(eager = false)

  /** The feature tail every rerank SOURCE feeds (r17: the corpus
    * re-read path here and the positional-index path in
    * [[graft.operators.SearchIndex.rerankFromStore]] — ONE copy of the
    * feature math, so the two sources cannot diverge): from `matched`
    * (qid, doc_id, w, pos) rows — query-term occurrences of actual
    * candidate pairs with their 1-based token positions — compute the
    * adjacency pass and the per-pair features, joined back to the
    * candidate page. `matched` must already be a plan barrier
    * (consumed three times: features + both adjacency sides).
    */
  private[operators] def featuresFromMatched(cands: DataFrame,
      matched: DataFrame): DataFrame = {
    // rename-the-right-side self-join (unambiguous under the shared
    // checkpoint's expression ids)
    val mRight = matched.toDF("qid2", "doc_id2", "w2", "pos2")
    val adj = matched.withColumn("pnext", col("pos") + 1)
      .join(broadcast(mRight),
        col("qid") === col("qid2") && col("doc_id") === col("doc_id2") &&
          col("pnext") === col("pos2") && col("w") =!= col("w2"))
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_adj"))
    val feats = matched.groupBy("qid", "doc_id")
      .agg(countDistinct(col("w")).as("coverage"),
        count(lit(1)).as("tf_q"),
        min(col("pos")).cast("bigint").as("first_pos"))
    cands
      .join(feats.hint("shuffle_hash"), Seq("qid", "doc_id"))
      .join(adj.hint("shuffle_hash"), Seq("qid", "doc_id"), "left")
      .withColumn("n_adj", coalesce(col("n_adj"), lit(0L)))
  }

  private def rerankFeatures(docs: DataFrame, page: DataFrame,
      queryTable: Seq[(Long, String)],
      maxPushdownIds: Long): DataFrame = {
    val spark = docs.sparkSession
    val cands = candPage(page)
    // cap-guarded pruned re-read (see [[prunedCandidateScan]]); only
    // candidate docs are re-tokenized, positions kept (1-based,
    // matching the oracle's list indexing)
    val candToks =
      prunedCandidateScan(docs, cands.select("doc_id").distinct(),
          maxPushdownIds)
        .select(col("doc_id"),
          posexplode(TextFunctions.words(col("text"))).as(Seq("p0", "w")))
        .where(col("w") =!= "")
        .select(col("doc_id"), (col("p0") + 1).cast("bigint").as("pos"),
          col("w"))
    val qterms = queryTerms(spark, queryTable)
    // matched positions, restricted to actual CANDIDATE pairs (a doc
    // retrieved for q0 only must not be scored for q1); consumed three
    // times (features + both adjacency sides) — barrier
    val matched = candToks
      .join(broadcast(qterms), "w")
      .join(broadcast(cands.select("qid", "doc_id")),
        Seq("qid", "doc_id"), "left_semi")
      .select("qid", "doc_id", "w", "pos")
      .localCheckpoint(eager = false)
    featuresFromMatched(cands, matched)
  }

  /** The per-qid (score desc, doc_id) cut shared by both scorers.
    * Window bound: ≤ topK candidate rows per qid by construction (the
    * bm25Queries bounded heap emits exactly the page) — the sanctioned
    * schema-bounded window class.
    */
  private[operators] def rerankCut(scored: DataFrame, scoreCol: String,
      topR: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("qid")
      .orderBy(col(scoreCol).desc, col("doc_id"))
    scored
      .withColumn("rrk", row_number().over(byQ).cast("bigint"))
      .filter(col("rrk") <= topR)
      .select("qid", "doc_id", "coverage", "n_adj", "tf_q",
        "first_pos", scoreCol, "bm25_rk", "rrk")
      .orderBy("qid", "rrk")
  }

  /** The rerank tail over ANY retrieval page carrying
    * (qid, doc_id, rk) — shared by the fresh path ([[bm25Rerank]])
    * and the persisted-index path
    * ([[graft.operators.SearchIndex.bm25FromStore]]): store retrieval
    * ≡ fresh is already oracle-proven, so ONE rerank oracle covers
    * both compositions.
    */
  def rerankCandidates(docs: DataFrame, page: DataFrame,
      queryTable: Seq[(Long, String)] = defaultQueryTable,
      topR: Int = 5,
      maxPushdownIds: Long = defaultMaxPushdownIds): DataFrame = {
    val f = rerankFeatures(docs, page, queryTable, maxPushdownIds)
    rerankCut(f.withColumn("rerank_s", lexicalRerankScore),
      "rerank_s", topR)
  }

  /** The lexical packed score over the shared feature frame.
    * All four fields capped at 9999 (r17: coverage too — it is ≤ the
    * query's distinct-term count, but the packing bands' disjointness
    * must hold for ANY queryTable, not just sane ones).
    */
  private[operators] def lexicalRerankScore: Column =
    least(col("coverage"), lit(9999L)) * lit(10000000000000L) +
      least(col("n_adj"), lit(9999L)) * lit(100000000L) +
      least(col("tf_q"), lit(9999L)) * lit(10000L) +
      (lit(9999L) - least(col("first_pos"), lit(9999L)))

  /** Deterministic integer-grid model weights (the
    * [[graft.operators.QualitySignals]] linearClassifier fixture
    * convention): w_i derives from md5("rrw:i"), signed, in
    * [-1e6, 1e6] — i.e. weight·1e6 on an integer grid. The weights are
    * plan-time LITERALS on both engines (no cross-engine hash is
    * involved), so a trained reranker swaps in its own grid with zero
    * dataflow change.
    */
  val defaultRerankWeights: Seq[Long] = (0 until 4).map { i =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rrw:$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 2000001L) - 1000000L
  }

  /** MODEL rerank: the learned-reranker seam made concrete — a linear
    * scorer over the SAME candidate plumbing as the lexical packer
    * ([[rerankFeatures]] is shared code, not a parallel
    * implementation): `model_s = w · x` where
    * `x = (min(coverage,9999), min(n_adj,9999), min(tf_q,9999),
    * 9999 − min(first_pos,9999))` — the exact capped feature vector
    * the lexical packer folds, so lexical rerank ≡ model rerank under
    * `weights = (1e13, 1e8, 1e4, 1)` (the packing radixes; spec law in
    * SearchSpec). All-integer dot product → hash-exact cross-engine.
    * A real cross-encoder replaces the dot product with a model
    * inference over the identical (qid, doc_id, features) frame — the
    * [[graft.ml.MLParity.parallelPredictSvc]] broadcast-scoring shape.
    *
    * Overflow headroom: `Σ|w_i| · 9999 < 2^63` — DERIVED from the
    * feature cap and the actual weight vector
    * ([[requireModelWeights]]; r18, ADVICE closure) — and every x_i
    * really is ≤ 9999 (all four features least-capped, coverage
    * included). Covers the default fixture (|w| ≤ 1e6), the packing
    * radixes (≤ 1e13), and the trained grid
    * ([[trainedRerankWeights]]).
    */
  def bm25RerankModel(docs: DataFrame,
      queryTable: Seq[(Long, String)] = defaultQueryTable,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
      topR: Int = 5, weights: Seq[Long] = defaultRerankWeights,
      maxPushdownIds: Long = defaultMaxPushdownIds): DataFrame =
    rerankModelCandidates(docs,
      bm25Queries(docs, queryTable, k1, b, topK), queryTable, topR,
      weights, maxPushdownIds)

  /** Model-scored rerank tail over ANY retrieval page — the
    * [[rerankCandidates]] twin with the dot-product scorer (see
    * [[bm25RerankModel]]).
    */
  /** Per-feature cap in the serving vector — every x_i is
    * `least(feature, 9999)` (or `9999 − least(first_pos, 9999)`), so
    * the dot product's worst case is exactly `featureCap · Σ|w_i|`.
    */
  private[operators] val featureCap: Long = 9999L

  /** Weight-vector contract shared by every scorer/oracle/snapping
    * site: 4 weights whose worst-case |dot| with the capped feature
    * vector stays inside BIGINT. DERIVED from the cap and the actual
    * weights (ADVICE r17: the old per-weight 2.3e14 constant left
    * ~0.25% headroom and would silently go stale if a fifth feature
    * or a larger cap ever landed) — the BigInt product can't overflow
    * the check itself.
    */
  private[graft] def requireModelWeights(weights: Seq[Long]): Unit = {
    require(weights.length == 4,
      s"rerankModel: 4 feature weights required, got ${weights.length}")
    val worst = weights.map(w => BigInt(w).abs * featureCap).sum
    require(worst <= BigInt(Long.MaxValue),
      s"rerankModel: sum(|w_i|) * $featureCap = $worst overflows the " +
        "BIGINT dot-product headroom")
  }

  def rerankModelCandidates(docs: DataFrame, page: DataFrame,
      queryTable: Seq[(Long, String)] = defaultQueryTable,
      topR: Int = 5, weights: Seq[Long] = defaultRerankWeights,
      maxPushdownIds: Long = defaultMaxPushdownIds): DataFrame = {
    requireModelWeights(weights)
    val f = rerankFeatures(docs, page, queryTable, maxPushdownIds)
    val x = Seq(least(col("coverage"), lit(9999L)),
      least(col("n_adj"), lit(9999L)),
      least(col("tf_q"), lit(9999L)),
      lit(9999L) - least(col("first_pos"), lit(9999L)))
    val modelS = x.zip(weights)
      .map { case (xi, wi) => xi * lit(wi) }.reduce(_ + _)
    rerankCut(f.withColumn("model_s", modelS), "model_s", topR)
  }

  // ---------------------------------------------------------------
  // Trained reranker (r18): closing the train → serve loop on the
  // model seam. A pairwise-preference linear model is TRAINED on a
  // deterministic feature fixture (full-batch integer perceptron —
  // every epoch's violation gradient is a sum of exact integer
  // difference vectors, so the distributed trainer and the local twin
  // are bit-identical by construction, the Kernels order-free-sum
  // discipline applied to learning), SNAPPED to the serving grid
  // (an order-exact integer rescale — a float-trained model, e.g.
  // MLParity's LinearSVC coefficients, would round onto the grid here
  // instead, gated by the same post-snap ranking law), and SERVED
  // through the UNCHANGED [[bm25RerankModel]] plumbing: the weights
  // are data, not code (the QualitySignals classifier convention).
  // The training fixture is sfDir-INDEPENDENT because the driver's
  // oracle SQL is a fixed string per entry — the learned weights must
  // be the same constants on both engines.
  // ---------------------------------------------------------------

  /** Deterministic training fixture: 64 md5-seeded capped feature
    * vectors `x = (coverage, n_adj, tf_q, 9999 − first_pos)` in
    * realistic serving ranges. The TEACHER is the lexical packed
    * score — so training is learning-to-rank from pairwise
    * preferences of the deterministic scorer, and the learned model's
    * quality has ground truth: at convergence it reproduces the
    * teacher's ranking on the fixture exactly (spec-gated).
    */
  private[graft] val rerankTrainingFixture: Seq[Array[Long]] = {
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until 64).map { i =>
      val cov = h(s"trc:$i") % 6L
      val adj = h(s"tra:$i") % 10L
      val tfq = h(s"trt:$i") % 31L
      val fp = 1L + h(s"trf:$i") % 400L
      Array(cov, adj, tfq, featureCap - fp)
    }
  }

  /** Per-feature TRAINING scale: the batch perceptron's epoch count
    * is R²/γ² in the pair geometry, and the raw feature ranges are
    * wildly skewed (coverage spans ±5 while the first-pos term spans
    * ±399) — on raw differences the summed-gradient update oscillates
    * (measured: no convergence in 50k epochs). Scaling each feature to
    * a comparable range (≈ 400/range_i) equalizes the margins and the
    * SAME data converges in ~11 epochs. The scale folds into the
    * SERVED weights exactly (`w_serve_i = w_i · s_i`, so
    * `w_serve · d_raw ≡ w · d_scaled` — an integer reparametrization,
    * not an approximation).
    */
  private[graft] val trainingScale: Seq[Long] = Seq(80L, 44L, 13L, 1L)

  /** All ordered preference pairs (a ≻ b under the teacher) of a
    * feature fixture as SCALED difference vectors
    * `d_k = (x_a,k − x_b,k) · scale_k`; the teacher is the lexical
    * pack over the capped raw vector.
    */
  private[graft] def preferencePairs(
      fixture: Seq[Array[Long]]): Seq[Array[Long]] = {
    def teacher(x: Array[Long]): Long =
      x(0) * 10000000000000L + x(1) * 100000000L + x(2) * 10000L + x(3)
    for {
      a <- fixture; b <- fixture
      if teacher(a) > teacher(b)
    } yield Array.tabulate(4)(k => (a(k) - b(k)) * trainingScale(k))
  }

  /** One full-batch perceptron epoch: the violation gradient
    * `g = Σ_{d : w·d ≤ 0} d` and the violation count. Pure integer —
    * the SAME update the distributed trainer aggregates, so the two
    * trainers agree bit-for-bit (order-free sums).
    */
  private[graft] def perceptronEpoch(pairs: Seq[Array[Long]],
      w: Array[Long]): (Array[Long], Long) = {
    val g = Array.fill(4)(0L)
    var v = 0L
    pairs.foreach { d =>
      var dot = 0L
      var k = 0
      while (k < 4) { dot += w(k) * d(k); k += 1 }
      if (dot <= 0L) {
        v += 1
        k = 0
        while (k < 4) { g(k) += d(k); k += 1 }
      }
    }
    (g, v)
  }

  /** Local (driver-resident) trainer: full-batch perceptron epochs
    * until zero violated pairs (batch-perceptron convergence holds —
    * the teacher is linearly representable by the packing radixes, so
    * the pair set is separable) or `maxEpochs`. Returns the RAW grid
    * weights plus the final violation count (0 = converged).
    */
  private[graft] def trainRerankWeightsLocal(
      fixture: Seq[Array[Long]] = rerankTrainingFixture,
      maxEpochs: Int = 5000): (Seq[Long], Long) = {
    val pairs = preferencePairs(fixture)
    val w = Array.fill(4)(0L)
    var v = -1L
    var e = 0
    while (e < maxEpochs && v != 0L) {
      val (g, viol) = perceptronEpoch(pairs, w)
      v = viol
      if (v != 0L) { var k = 0; while (k < 4) { w(k) += g(k); k += 1 } }
      e += 1
    }
    (w.toSeq, v)
  }

  /** Distributed trainer over a preference-pair FRAME (d1..d4): one
    * dictionary-sized integer aggregation per epoch (the violation
    * gradient), weight update on the driver — the
    * [[graft.ml.MLParity]] full-batch shape with exact arithmetic, so
    * it equals [[trainRerankWeightsLocal]] on the same pairs
    * bit-for-bit (spec law). At scale the pair frame is query-load-
    * sized (candidate pages, not the corpus), and each epoch is one
    * map-side-combined sum — no collect of the pairs, ever.
    */
  def trainRerankWeights(pairs: DataFrame, maxEpochs: Int = 5000):
      (Seq[Long], Long) = {
    val w = Array.fill(4)(0L)
    var v = -1L
    var e = 0
    val cached = pairs.select(col("d1").cast("long"),
        col("d2").cast("long"), col("d3").cast("long"),
        col("d4").cast("long"))
      .toDF("d1", "d2", "d3", "d4")
      .localCheckpoint() // eager: consumed once per epoch, many epochs
    while (e < maxEpochs && v != 0L) {
      val dot = lit(w(0)) * col("d1") + lit(w(1)) * col("d2") +
        lit(w(2)) * col("d3") + lit(w(3)) * col("d4")
      val viol = when(dot <= 0L, lit(1L)).otherwise(lit(0L))
      val r = cached.agg(
        sum(when(dot <= 0L, col("d1")).otherwise(lit(0L))),
        sum(when(dot <= 0L, col("d2")).otherwise(lit(0L))),
        sum(when(dot <= 0L, col("d3")).otherwise(lit(0L))),
        sum(when(dot <= 0L, col("d4")).otherwise(lit(0L))),
        sum(viol)).collect().head
      v = r.getLong(4)
      if (v != 0L) {
        var k = 0
        while (k < 4) { w(k) += r.getLong(k); k += 1 }
      }
      e += 1
    }
    (w.toSeq, v)
  }

  /** Snap raw trained weights onto the SERVING grid: an integer
    * scale-up to the default-weight magnitude (`targetMax`), which
    * preserves every dot-product sign exactly (`k·(w·d)`, k ≥ 1) —
    * so the snapped model provably ranks identically to the raw one
    * on EVERY input, not just the fixture (spec re-checks the fixture
    * anyway). Reuses the serving headroom contract
    * ([[requireModelWeights]]) so an over-scaled snap fails loudly at
    * snap time, not at serve time.
    */
  private[graft] def snapRerankWeights(w: Seq[Long],
      targetMax: Long = 1000000L): Seq[Long] = {
    val mx = math.max(w.map(math.abs).max, 1L)
    val k = math.max(1L, targetMax / mx)
    val snapped = w.map(_ * k)
    requireModelWeights(snapped)
    snapped
  }

  /** The shipped TRAINED weights: local deterministic training run on
    * the md5 fixture, the training scale folded back in (exact
    * integer reparametrization — see [[trainingScale]]), snapped to
    * the serving grid. Computed at class init (the fixture is 64
    * rows; training is milliseconds) so the same constants reach the
    * Spark entry and the DuckDB oracle SQL — weights are data. The
    * require makes a non-converged training run fail LOUDLY at first
    * use, not ship a half-learned model.
    */
  lazy val trainedRerankWeights: Seq[Long] = {
    val (raw, viol) = trainRerankWeightsLocal()
    require(viol == 0L,
      s"trainedRerankWeights: training did not converge ($viol violations)")
    snapRerankWeights(raw.zip(trainingScale).map { case (w, s) => w * s })
  }

  /** Shared feature-stage CTE chain for BOTH rerank oracles (lexical
    * [[bm25RerankSql]] and model [[bm25RerankModelSql]]) — one
    * generator on top of [[queriesCtePrefix]], so every scorer's
    * candidate set AND feature values are the retrieval oracle by
    * construction; ends in `featrows`
    * (qid, doc_id, coverage, n_adj, tf_q, first_pos, bm25_rk).
    */
  private def rerankFeatureCtes(queryTable: Seq[(Long, String)],
      k1: Double, b: Double, topK: Int): String =
    queriesCtePrefix(queryTable, k1, b) + s""",
       |cands AS (
       |  SELECT qid, doc_id, rk AS bm25_rk FROM ranked WHERE rk <= $topK),
       |ctoks AS (
       |  SELECT doc_id, i AS pos, ws[CAST(i AS INT)] AS w
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
       |        FROM documents
       |        WHERE doc_id IN (SELECT DISTINCT doc_id FROM cands)) t,
       |    UNNEST(range(1, len(ws) + 1)) AS u(i)
       |  WHERE ws[CAST(i AS INT)] <> ''),
       |matched AS (
       |  SELECT cd.qid, cd.doc_id, t.w, t.pos
       |  FROM cands cd
       |  JOIN ctoks t ON t.doc_id = cd.doc_id
       |  JOIN qterms qt ON qt.qid = cd.qid AND qt.w = t.w),
       |adj AS (
       |  SELECT a.qid, a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_adj
       |  FROM matched a JOIN matched b
       |    ON b.qid = a.qid AND b.doc_id = a.doc_id
       |   AND b.pos = a.pos + 1 AND b.w <> a.w
       |  GROUP BY 1, 2),
       |feats AS (
       |  SELECT qid, doc_id,
       |    CAST(COUNT(DISTINCT w) AS BIGINT) AS coverage,
       |    CAST(COUNT(*) AS BIGINT) AS tf_q,
       |    CAST(MIN(pos) AS BIGINT) AS first_pos
       |  FROM matched GROUP BY 1, 2),
       |featrows AS (
       |  SELECT c.qid, c.doc_id, f.coverage,
       |    COALESCE(a.n_adj, 0) AS n_adj, f.tf_q, f.first_pos, c.bm25_rk
       |  FROM cands c
       |  JOIN feats f USING (qid, doc_id)
       |  LEFT JOIN adj a USING (qid, doc_id))""".stripMargin

  /** DuckDB oracle for [[bm25Rerank]] — the SAME retrieval + feature
    * CTE chain as every other rerank oracle (one generator), with the
    * packed integer rerank score.
    */
  def bm25RerankSql(queryTable: Seq[(Long, String)] = defaultQueryTable,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
      topR: Int = 5): String =
    rerankFeatureCtes(queryTable, k1, b, topK) + s""",
       |rr AS (
       |  SELECT qid, doc_id, coverage, n_adj, tf_q, first_pos,
       |    least(coverage, 9999) * 10000000000000 +
       |      least(n_adj, 9999) * 100000000 +
       |      least(tf_q, 9999) * 10000 +
       |      (9999 - least(first_pos, 9999)) AS rerank_s,
       |    bm25_rk
       |  FROM featrows),
       |rr2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY rerank_s DESC, doc_id) AS rrk FROM rr)
       |SELECT qid, doc_id, coverage, n_adj, tf_q, first_pos,
       |  rerank_s, bm25_rk, rrk
       |FROM rr2 WHERE rrk <= $topR ORDER BY qid, rrk""".stripMargin

  /** DuckDB oracle for [[bm25RerankModel]] — same feature chain, the
    * dot-product scorer with the weights inlined as literals.
    */
  def bm25RerankModelSql(
      queryTable: Seq[(Long, String)] = defaultQueryTable,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
      topR: Int = 5,
      weights: Seq[Long] = defaultRerankWeights): String = {
    requireModelWeights(weights)
    val Seq(w0, w1, w2, w3) = weights
    rerankFeatureCtes(queryTable, k1, b, topK) + s""",
       |rr AS (
       |  SELECT qid, doc_id, coverage, n_adj, tf_q, first_pos,
       |    least(coverage, 9999) * CAST($w0 AS BIGINT) +
       |      least(n_adj, 9999) * CAST($w1 AS BIGINT) +
       |      least(tf_q, 9999) * CAST($w2 AS BIGINT) +
       |      (9999 - least(first_pos, 9999)) * CAST($w3 AS BIGINT)
       |      AS model_s,
       |    bm25_rk
       |  FROM featrows),
       |rr2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY model_s DESC, doc_id) AS rrk FROM rr)
       |SELECT qid, doc_id, coverage, n_adj, tf_q, first_pos,
       |  model_s, bm25_rk, rrk
       |FROM rr2 WHERE rrk <= $topR ORDER BY qid, rrk""".stripMargin
  }

  // --- exact-phrase search (r18) --------------------------------------

  /** Phrase table for the exact-phrase entries: token-level verbatim
    * match against the fixture corpus. Includes a repeated-token
    * phrase (pid 0 — both offsets must land on distinct consecutive
    * tokens), a 4-gram, and a phrase with zero sf0.01 hits (pid 3 —
    * the negative case rides the same oracle).
    */
  val defaultPhraseTable: Seq[(Long, String)] = Seq(
    (0L, "table table"),
    (1L, "fast merge batch"),
    (2L, "scan slow"),
    (3L, "window agg group"),
    (4L, "value table part a"))

  /** The phrase side exploded to ORDERED (pid, off, w) rows (off
    * 0-based — anchors stay 1-based token positions) plus per-phrase
    * lengths. NOT distinct: a repeated token keeps every offset row,
    * which is exactly what the anchor count needs. Both frames are
    * dictionary-sized at any corpus size and broadcast everywhere.
    */
  private[operators] def phraseSides(
      spark: org.apache.spark.sql.SparkSession,
      phraseTable: Seq[(Long, String)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val pterms = phraseTable.toDF("pid", "ptext")
      .select(col("pid"),
        posexplode(TextFunctions.words(col("ptext"))).as(Seq("off", "w")))
      .where(col("w") =!= "")
      .select(col("pid"), col("off").cast("bigint").as("off"), col("w"))
    val plens = pterms.groupBy("pid").agg(count(lit(1)).as("len"))
    (pterms, plens)
  }

  /** The shared exact-phrase matching tail — ONE copy for the fresh
    * corpus scan ([[phraseSearch]]) and the positional-index path
    * ([[graft.operators.SearchIndex.phraseFromStore]]), the
    * [[featuresFromMatched]] discipline, so the two sources cannot
    * diverge. From token occurrences (doc_id, pos, w) — any source —
    * the match is pure anchor arithmetic: a phrase of length L matches
    * at anchor a iff all L offset rows find their token at pos = a +
    * off, i.e. the (pid, doc_id, anchor = pos − off) group collects
    * exactly L hits ((off, pos) pairs are distinct by construction, so
    * COUNT(*) counts matched offsets). Shuffle shape: tokens prune to
    * phrase terms via the broadcast join FIRST, then one
    * (pid, doc_id, anchor) hash-agg with map-side partials and one
    * (pid, doc_id) roll-up — cost ∝ phrase-TERM occurrences, never
    * all tokens, and window-free. All-integer output: hash-exact
    * cross-engine.
    */
  private[operators] def phraseHits(toks: DataFrame, pterms: DataFrame,
      plens: DataFrame): DataFrame =
    toks.join(broadcast(pterms), "w")
      .select(col("pid"), col("doc_id"),
        (col("pos") - col("off")).as("anchor"))
      .groupBy("pid", "doc_id", "anchor")
      .agg(count(lit(1)).as("m"))
      .join(broadcast(plens), "pid")
      .filter(col("m") === col("len"))
      .groupBy("pid", "doc_id")
      .agg(count(lit(1)).as("n_hits"),
        min(col("anchor")).cast("bigint").as("first_hit"))
      .orderBy("pid", "doc_id")

  /** Exact-phrase search over the corpus — token-level verbatim
    * containment (the benchmark-leak / decontamination probe at the
    * TOKEN level, complementing the gram-store substring path): one
    * row per (pid, doc_id) with the match count and earliest 1-based
    * start position. One corpus tokenize (the retrieval scan shape),
    * then the [[phraseHits]] tail.
    */
  def phraseSearch(docs: DataFrame,
      phraseTable: Seq[(Long, String)] = defaultPhraseTable): DataFrame = {
    val (pterms, plens) = phraseSides(docs.sparkSession, phraseTable)
    val toks = docs.select(col("doc_id"),
        posexplode(TextFunctions.words(col("text"))).as(Seq("p0", "w")))
      .where(col("w") =!= "")
      .select(col("doc_id"), (col("p0") + 1).cast("bigint").as("pos"),
        col("w"))
    phraseHits(toks, pterms, plens)
  }

  /** DuckDB oracle for [[phraseSearch]] AND
    * [[graft.operators.SearchIndex.phraseFromStore]] — one
    * layout-independent ground truth (recomputes everything from the
    * raw table), so a hash match on the store entry certifies the
    * stored position lists against the corpus itself.
    */
  def phraseSearchSql(
      phraseTable: Seq[(Long, String)] = defaultPhraseTable): String = {
    val values = phraseTable
      .map { case (p, t) => s"(CAST($p AS BIGINT), '${t.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH p AS (SELECT * FROM (VALUES $values) AS t(pid, ptext)),
       |pterms AS (
       |  SELECT pid, i - 1 AS off, ws[CAST(i AS INT)] AS w
       |  FROM (SELECT pid, regexp_split_to_array(trim(ptext), '\\s+') AS ws
       |        FROM p) t,
       |    UNNEST(range(1, len(ws) + 1)) AS u(i)
       |  WHERE ws[CAST(i AS INT)] <> ''),
       |plen AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS len
       |  FROM pterms GROUP BY 1),
       |toks AS (
       |  SELECT doc_id, i AS pos, ws[CAST(i AS INT)] AS w
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
       |        FROM documents) t,
       |    UNNEST(range(1, len(ws) + 1)) AS u(i)
       |  WHERE ws[CAST(i AS INT)] <> ''),
       |hits AS (
       |  SELECT pt.pid, t.doc_id, t.pos - pt.off AS anchor,
       |    CAST(COUNT(*) AS BIGINT) AS m
       |  FROM toks t JOIN pterms pt ON pt.w = t.w
       |  GROUP BY 1, 2, 3),
       |fullm AS (
       |  SELECT h.pid, h.doc_id, h.anchor
       |  FROM hits h JOIN plen USING (pid) WHERE h.m = plen.len)
       |SELECT pid, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       |  CAST(MIN(anchor) AS BIGINT) AS first_hit
       |FROM fullm GROUP BY 1, 2 ORDER BY pid, doc_id""".stripMargin
  }
}
