package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // same length everywhere so ranking is purely tf-driven
  private def docs = Seq(
    (0L, "hash join filter hash join filter hash join"), // all terms, dense
    (1L, "hash scan scan scan scan scan scan scan"),     // one term, sparse
    (2L, "scan sort merge agg group window batch row"),  // no query terms
    (3L, "hash join scan sort merge agg group row")      // two terms, once
  ).toDF("doc_id", "text")

  test("bm25 ranks dense multi-term docs first and drops no-match docs") {
    val out = Search.bm25TopK(docs).collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(!ids.contains(2L)) // no query term → no row
    assert(ids.head == 0L) // highest tf across all three terms
    assert(out.head.getLong(1) == 3) // matched all three terms
    // scores strictly ordered (desc) and positive
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0))
    // doc 3 (two terms, tf=1 each) outranks doc 1 (one term, tf=1):
    // more matched terms ⇒ more idf mass at equal tf and equal length
    assert(ids.indexOf(3L) < ids.indexOf(1L))
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val d = Seq(
      (0L, "hash join filter"),
      (1L, "hash join filter pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = Search.bm25TopK(d).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
  }

  test("bm25 respects topK with the doc_id tie-break") {
    // identical docs → identical scores; the limit must cut on doc_id
    val d = (0L to 9L).map(i => (i, "hash join filter")).toDF("doc_id", "text")
    val out = Search.bm25TopK(d, topK = 4).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("bm25 ignores terms absent from the corpus") {
    val out = Search.bm25TopK(docs, terms = Seq("hash", "zzz_missing"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) <= 1)) // only 'hash' can match
  }
}
