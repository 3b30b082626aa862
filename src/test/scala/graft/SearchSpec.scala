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

  test("bm25 scores sit on the coarsened 1e-9 grid (r13 convention)") {
    // score = (s9 div 1000)/1e9 ⇒ score·1e9 is an exact integer —
    // reverting the ln-flip coarsening fails HERE, not at the driver
    (Search.bm25TopK(docs).collect().map(_.getDouble(2)) ++
      Search.bm25Queries(docs).collect().map(_.getDouble(3)))
      .foreach { v =>
        // reconstruct the integer numerator and replay the exact
        // division the operator emitted — bit-equality or bust
        val k = math.rint(v * 1e9).toLong
        assert(v == k.toDouble / 1e9, s"off-grid score: $v")
      }
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

  test("bm25Queries: a one-query table reproduces bm25TopK exactly") {
    // same terms, same grids → per-doc (n_terms, score) must be
    // bit-identical between the query-table form and the literal form
    val single = Search.bm25Queries(docs,
      queryTable = Seq((7L, "hash join filter")), topK = 20).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val literal = Search.bm25TopK(docs, topK = 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(single == literal)
  }

  test("bm25Queries: per-qid top-k, dedup'd query terms, layout-independent") {
    val qt = Seq((0L, "hash hash join"), // dup term counts once
      (1L, "scan"), (2L, "zzz_missing"))
    val out = Search.bm25Queries(docs, queryTable = qt, topK = 2).collect()
    val byQ = out.groupBy(_.getLong(0))
    // q0: 'hash hash join' ≡ 'hash join' — doc 0 densest
    assert(byQ(0L).map(_.getLong(1)).toSeq.head == 0L)
    assert(byQ(0L).head.getLong(2) == 2L) // n_terms counts DISTINCT terms
    // q1 matches docs 1/2/3 ('scan'); topK=2 cuts deterministically
    assert(byQ(1L).map(_.getLong(1)).length == 2)
    assert(byQ(1L).head.getLong(1) == 1L) // tf=6 dominates
    // q2: no corpus term → no rows at all
    assert(!byQ.contains(2L))
    // ranks are 1..k per qid
    assert(byQ.values.forall(rs =>
      rs.map(_.getLong(4)).toSeq == (1L to rs.length).toSeq))
    // layout independence
    val again = Search.bm25Queries(docs.repartition(5), queryTable = qt,
      topK = 2).collect().map(_.toString)
    assert(again.sameElements(out.map(_.toString)))
  }

  test("rerank: output ⊆ candidate page, per-qid ≤ topR, packed score " +
    "self-consistent") {
    val cands = Search.bm25Queries(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Search.bm25Rerank(docs, topR = 3).collect()
    assert(out.nonEmpty)
    // every reranked row was retrieved for THAT query
    assert(out.forall(r => cands((r.getLong(0), r.getLong(1)))))
    // rrk is 1..≤topR per qid
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(8)).toSeq.sorted ==
        (1L to rs.length).toSeq && rs.length <= 3)
    }
    // the packed BIGINT score is exactly its emitted feature fields
    out.foreach { r =>
      val (cov, adj, tf, fp) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expected = math.min(cov, 9999L) * 10000000000000L +
        math.min(adj, 9999L) * 100000000L + math.min(tf, 9999L) *
        10000L + (9999L - math.min(fp, 9999L))
      assert(r.getLong(6) == expected, r.toString)
    }
    // layout independence
    val again = Search.bm25Rerank(docs.repartition(5), topR = 3)
      .collect().map(_.toString)
    assert(again.sameElements(
      Search.bm25Rerank(docs, topR = 3).collect().map(_.toString)))
  }

  test("rerank: phrase adjacency flips a BM25 tie") {
    // identical length / per-term tf ⇒ BM25 ties and ranks doc 0 first
    // (doc_id tie-break); doc 1 has the terms ADJACENT twice — the
    // interaction feature BM25's bag-of-words cannot see
    val d = Seq(
      (0L, "hash scan join scan hash scan join scan"),
      (1L, "scan hash join scan hash join scan scan")
    ).toDF("doc_id", "text")
    val qt = Seq((0L, "hash join"))
    val bm25 = Search.bm25Queries(d, queryTable = qt)
      .collect().map(_.getLong(1)).toSeq
    assert(bm25 == Seq(0L, 1L)) // the tie really is a tie
    val rr = Search.bm25Rerank(d, queryTable = qt).collect()
    assert(rr.map(_.getLong(1)).toSeq == Seq(1L, 0L))
    val byId = rr.map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(byId(1L) == 2L && byId(0L) == 0L) // n_adj counted exactly
  }

  test("rerank: earlier first match wins at equal coverage/adjacency/tf") {
    val d = Seq(
      (0L, "pad pad hash join"),
      (1L, "hash join pad pad")
    ).toDF("doc_id", "text")
    val qt = Seq((0L, "hash join"))
    val rr = Search.bm25Rerank(d, queryTable = qt).collect()
    assert(rr.map(_.getLong(1)).toSeq == Seq(1L, 0L))
    val fp = rr.map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(fp(1L) == 1L && fp(0L) == 3L)
  }

  test("rerank cap guard: the over-cap semi-join branch returns " +
    "identical rows (degrade, never diverge — the r17 counted guard)") {
    val within = Search.bm25Rerank(docs, topR = 3).collect()
      .map(_.toString)
    // cap 0 forces the shuffle_hash left-semi prune on every page
    val over = Search.bm25Rerank(docs, topR = 3, maxPushdownIds = 0L)
      .collect().map(_.toString)
    assert(over.sameElements(within))
    // the model scorer shares the same guarded plumbing
    val mWithin = Search.bm25RerankModel(docs, topR = 3).collect()
      .map(_.toString)
    val mOver = Search.bm25RerankModel(docs, topR = 3,
      maxPushdownIds = 0L).collect().map(_.toString)
    assert(mOver.sameElements(mWithin))
  }

  test("model rerank with the packing-radix weights reproduces the " +
    "lexical rerank exactly (shared features, two scorers)") {
    // w = (1e13, 1e8, 1e4, 1) makes the dot product EQUAL the lexical
    // packed score by construction — the features-coincide law the
    // learned-reranker seam is certified against
    val lex = Search.bm25Rerank(docs).collect().map(_.toString)
    val mdl = Search.bm25RerankModel(docs,
      weights = Seq(10000000000000L, 100000000L, 10000L, 1L))
      .collect().map(_.toString)
    assert(mdl.sameElements(lex))
  }

  test("model rerank: dot product self-consistent, per-qid <= topR, " +
    "weight contract enforced") {
    val w = Search.defaultRerankWeights
    assert(w.length == 4 && w.forall(x => math.abs(x) <= 1000000L))
    val out = Search.bm25RerankModel(docs, topR = 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val x = Seq(math.min(r.getLong(2), 9999L),
        math.min(r.getLong(3), 9999L),
        math.min(r.getLong(4), 9999L),
        9999L - math.min(r.getLong(5), 9999L))
      val dot = x.zip(w).map { case (xi, wi) => xi * wi }.sum
      assert(r.getLong(6) == dot, r.toString)
    }
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(8)).toSeq.sorted == (1L to rs.length).toSeq
        && rs.length <= 3)
    }
    // contract: exactly 4 weights, and the DERIVED headroom bound
    // (r18, ADVICE closure): sum(|w_i|)·9999 must fit BIGINT — a
    // single 9.3e14 weight overflows (9999·9.3e14 > 2^63) …
    intercept[IllegalArgumentException] {
      Search.bm25RerankModel(docs, weights = Seq(1L, 2L, 3L))
    }
    intercept[IllegalArgumentException] {
      Search.bm25RerankModel(docs,
        weights = Seq(930000000000000L, 0L, 0L, 0L))
    }
    // … while a single 2.4e14 weight is genuinely safe (9999·2.4e14
    // < 2^63) — the old per-weight constant rejected it spuriously
    assert(Search.bm25RerankModel(docs,
      weights = Seq(240000000000000L, 0L, 0L, 1L), topR = 3)
      .collect().nonEmpty)
    // four weights at the old per-weight limit still pass (the
    // derived bound is never TIGHTER than the constant it replaced)
    Search.requireModelWeights(Seq.fill(4)(230000000000000L))
  }

  test("trained reranker: local training converges to the teacher's " +
    "ranking, deterministically, and the snap preserves it exactly") {
    val (raw, viol) = Search.trainRerankWeightsLocal()
    assert(viol == 0L, s"perceptron did not converge: $viol violations")
    // deterministic: a second run is bit-identical
    assert(Search.trainRerankWeightsLocal()._1 == raw)
    // converged ⇒ every (scaled) preference pair is ranked the
    // teacher's way
    val pairs = Search.preferencePairs(Search.rerankTrainingFixture)
    def dot(w: Seq[Long], d: Array[Long]): Long =
      w.zip(d).map { case (wi, di) => wi * di }.sum
    assert(pairs.forall(d => dot(raw, d) > 0L))
    // the training scale folds into the SERVED weights exactly: on
    // the RAW feature differences the serving vector ranks every
    // fixture pair the teacher's way too (the reparametrization law)
    val serving = raw.zip(Search.trainingScale)
      .map { case (w, s) => w * s }
    val fix = Search.rerankTrainingFixture
    def lex(x: Array[Long]): Long =
      x(0) * 10000000000000L + x(1) * 100000000L + x(2) * 10000L + x(3)
    val rawPairs = for {
      a <- fix; b <- fix; if lex(a) > lex(b)
    } yield Array.tabulate(4)(k => a(k) - b(k))
    assert(rawPairs.forall(d => dot(serving, d) > 0L))
    // the snap is an integer scale-up: every dot-product sign (hence
    // every ranking, on ANY input) is preserved — re-checked on the
    // fixture pairs, and the snapped vector passes the serving
    // headroom contract by construction
    val snapped = Search.snapRerankWeights(serving)
    assert(rawPairs.forall(d => dot(snapped, d) > 0L))
    assert(snapped.zip(serving).map { case (s, r) => s / r }.distinct
      .length == 1 || serving.contains(0L)) // one common integer factor
    assert(Search.trainedRerankWeights == snapped)
  }

  test("trained reranker: the distributed trainer equals the local " +
    "twin bit-for-bit (order-free integer epochs)") {
    val pairs = Search.preferencePairs(Search.rerankTrainingFixture)
    val df = pairs.map(d => (d(0), d(1), d(2), d(3)))
      .toDF("d1", "d2", "d3", "d4")
      .repartition(7) // layout independence of the epoch aggregation
    val (dw, dv) = Search.trainRerankWeights(df)
    val (lw, lv) = Search.trainRerankWeightsLocal()
    assert(dv == 0L && dv == lv)
    assert(dw == lw)
  }

  test("trained reranker: learned weights serve through the unchanged " +
    "model plumbing, dot self-consistent") {
    val w = Search.trainedRerankWeights
    val out = Search.bm25RerankModel(docs, weights = w, topR = 3)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val x = Seq(math.min(r.getLong(2), 9999L),
        math.min(r.getLong(3), 9999L),
        math.min(r.getLong(4), 9999L),
        9999L - math.min(r.getLong(5), 9999L))
      val dot = x.zip(w).map { case (xi, wi) => xi * wi }.sum
      assert(r.getLong(6) == dot, r.toString)
    }
  }

  // --- exact-phrase search (r18) ------------------------------------

  private def phraseDocs = Seq(
    (0L, "a b c a b c"),       // "a b" at 1 and 4; "a b c" at 1 and 4
    (1L, "x x x y"),           // repeated-token phrase territory
    (2L, "b a c b"),           // has all of a,b,c but never "a b"
    (3L, "a b")                // exact whole-doc match
  ).toDF("doc_id", "text")

  test("phrase search: counts overlapping anchors, repeated-token " +
    "phrases, and rejects bag-of-words false positives") {
    val out = Search.phraseSearch(phraseDocs, Seq(
        (0L, "a b"), (1L, "x x"), (2L, "a b c"), (3L, "c a"),
        (4L, "missing term")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 1L),  // "a b" twice in doc 0, first at 1
      (0L, 3L, 1L, 1L),  // whole-doc match
      (1L, 1L, 2L, 1L),  // "x x" overlaps: anchors 1 and 2
      (2L, 0L, 2L, 1L),  // the full trigram, twice
      (3L, 0L, 1L, 3L))) // "c a" spans doc 0's middle (c@3, a@4)
    // doc 2 ("b a c b") holds all of a, b, c but matches NOTHING —
    // order matters: no "a b", no "c a" (c@3 is followed by b@4)
  }

  test("phrase search: store path ≡ fresh path bit-for-bit off the " +
    "positional index (shared matching tail, stored ps certified)") {
    val store = graft.operators.SearchIndex.ensureAppendedIndexStore(
      phraseDocs, "search_spec_phrase", positions = true)
    val table = Seq((0L, "a b"), (1L, "x x"), (2L, "a b c"),
      (3L, "c a"))
    val fresh = Search.phraseSearch(phraseDocs, table).collect().toSeq
    val stored = graft.operators.SearchIndex
      .phraseFromStore(spark, store, table).collect().toSeq
    assert(fresh == stored)
    assert(fresh.nonEmpty)
  }

  test("phrase search: a plain (non-positional) store is refused, " +
    "never silently degraded") {
    val store = graft.operators.SearchIndex.ensureAppendedIndexStore(
      phraseDocs, "search_spec_phrase_plain", positions = false)
    val e = intercept[IllegalArgumentException] {
      graft.operators.SearchIndex.phraseFromStore(spark, store)
    }
    assert(e.getMessage.contains("WITHOUT positions"))
  }
}
