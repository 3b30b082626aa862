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
    // row-local scoring: idf on the 1e9 grid, per-term contribution on
    // the 1e12 grid; idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    def idf9(i: Int): Column =
      floor(log(lit(1.0) +
        ((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
          (col(s"df$i").cast("double") + lit(0.5))) * lit(1e9) + lit(0.5))
        .cast("bigint")
    def term9(i: Int): Column =
      when(col(s"tf$i") > 0,
        floor(idf9(i).cast("double") / lit(1e9) *
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
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), nTerms.as("n_terms"),
        (s9.cast("double") / lit(1e12)).as("score"))
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
    def idf9(i: Int): String =
      s"""CAST(floor(ln(CAST(1.0 AS DOUBLE) +
         |        (CAST(n_docs - df$i AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
         |        (CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE))) * 1e9
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT)""".stripMargin
    def term9(i: Int): String =
      s"""CASE WHEN tf$i > 0 THEN
         |      CAST(floor(CAST(${idf9(i)} AS DOUBLE) / 1e9 *
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
       |  FROM perdoc),
       |scored AS (
       |  SELECT doc_id,
       |    $nTerms AS n_terms,
       |    $s9 AS s9
       |  FROM perdoc, stats)
       |SELECT doc_id, n_terms, CAST(s9 AS DOUBLE) / 1e12 AS score
       |FROM scored WHERE n_terms > 0
       |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }
}
