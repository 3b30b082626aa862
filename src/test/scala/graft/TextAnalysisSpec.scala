package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the cat and the hat", "en", "s1", 19L),
    (1L, "der hund und die katze", "de", "s1", 22L),
    (2L, "word word word word", "en", "s2", 19L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tokenCount splits on whitespace, safe on blanks") {
    val df = Seq("a b  c", "", "  ").toDF("text")
      .select(TextFunctions.tokenCount($"text").as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0))
  }

  test("fingerprint is case/whitespace-insensitive md5") {
    val fps = Seq("A  b", "a b").toDF("text")
      .select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0).length == 32)
  }

  test("stats aggregates per language") {
    val out = TextAnalysis.stats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(out == List(("de", 1L), ("en", 2L)))
  }

  test("langId predicts via stopword hits") {
    val out = TextAnalysis.langId(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out(("en", "en")) == 1) // doc 0 has 'the'/'and'
    assert(out(("de", "de")) == 1) // doc 1 has 'der'/'und'/'die'
    assert(out(("en", "und")) == 1) // doc 2 has no stopwords
  }

  test("heavyHitters finds exactly the words above N/k, despite eviction") {
    // skewed corpus: 'hot' dominates, 25 singletons force MG eviction
    // at capacity k=3; spread over 8 partitions so per-partition
    // summaries actually evict and disagree
    val texts = (Seq.fill(30)("hot") ++ ('a' to 'y').map(_.toString))
      .grouped(7).map(_.mkString(" ")).toSeq
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
    val out = TextAnalysis.heavyHitters(d, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // N = 55; only 'hot' (30) exceeds 55/3
    assert(out.toSeq == Seq(("hot", 30L)))
    // with a loose threshold everything above N/56 (=0) qualifies
    val all = TextAnalysis.heavyHitters(d, k = 56).collect()
    assert(all.length == 26 && all.head.getString(0) == "hot")
  }

  test("heavyHitterChurn labels entered/left/stayed with exact rank shifts") {
    def corpus(hotA: Int, hotB: Int) =
      (Seq.fill(hotA)("alpha") ++ Seq.fill(hotB)("beta") ++
        Seq.fill(3)("gamma") ++ Seq("delta"))
        .grouped(5).map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s1", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // ref: alpha(10) > beta(5) > gamma(3); cur: beta(9) > alpha(4) >
    // gamma(3) — alpha and beta swap, delta replaces nothing at k=3
    val out = TextAnalysis
      .heavyHitterChurn(corpus(10, 5), corpus(4, 9), k = 3)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(5), Option(r.get(2)), Option(r.get(4)))))
      .toMap
    assert(out("alpha") == (("stayed", Some(1L), Some(2L))))
    assert(out("beta") == (("stayed", Some(2L), Some(1L))))
    assert(out("gamma") == (("stayed", Some(3L), Some(3L))))
    assert(out.size == 3)
    // shrink k to 1: the swap becomes one 'left' and one 'entered'
    val k1 = TextAnalysis
      .heavyHitterChurn(corpus(10, 5), corpus(4, 9), k = 1)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(k1 == Map("beta" -> "entered", "alpha" -> "left"))
  }

  test("sourceSignatureTerms surfaces source-exclusive terms above shared ones") {
    // 'zebra' is exclusive to s1 and frequent there; 'common' is
    // frequent EVERYWHERE (df = S → ln 1 → score 0)
    val d = (Seq.fill(6)(("zebra common", "s1")) ++
      Seq.fill(6)(("octopus common", "s2")) ++
      Seq.fill(6)(("walrus common", "s3")))
      .zipWithIndex
      .map { case ((t, s), i) => (i.toLong, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.sourceSignatureTerms(d, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(5)) ->
        (r.getString(1), r.getDouble(4)))
      .toMap
    // rank 1 per source = the exclusive term with tf·ln(3/1) > 0
    assert(out(("s1", 1L))._1 == "zebra" && out(("s1", 1L))._2 > 0.0)
    assert(out(("s2", 1L))._1 == "octopus")
    assert(out(("s3", 1L))._1 == "walrus")
    // 'common' ranks second with score exactly 0 (df = S)
    assert(out(("s1", 2L)) == (("common", 0.0)))
    // pigeonhole cap: with capInv = 1 nothing can satisfy tf > n
    assert(TextAnalysis.sourceSignatureTerms(d, k = 2, capInv = 1)
      .collect().isEmpty)
  }

  test("quality combines length, diversity and stopword ratio") {
    val q = TextAnalysis.quality(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(q(2L) < q(1L)) // repeated-word doc scores below diverse doc
    assert(q.values.forall(v => v > 0 && v <= 1))
  }

  test("winnowing: shared k+w-1 runs share a fingerprint; short docs get one") {
    import spark.implicits._
    // k=3, w=4: any shared 6-word run guarantees a common fingerprint
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (0L, s"one two $shared three four", "en", "s1", 10L),
      (1L, s"nine eight $shared seven six five", "en", "s1", 10L),
      (2L, "tiny doc", "en", "s1", 8L), // < k words → zero grams
      (3L, "u v w", "en", "s1", 5L) // exactly one gram, < one window
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.winnowFingerprint(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(2L) == ((0L, 0L, md5Hex(""))))
    assert(out(3L)._1 == 1L && out(3L)._2 == 1L) // one gram, one print
    // recompute the actual fingerprint SETS to check the guarantee
    def prints(text: String): Set[Long] = {
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val hs = ws.sliding(3).map(g => java.lang.Long.parseLong(
        md5Hex(g.mkString(" ")).take(15), 16)).toArray
      if (hs.isEmpty) Set.empty
      else (0 until math.max(hs.length - 3, 1)).map(i =>
        hs.slice(i, i + 4).min).toSet
    }
    val p0 = prints(s"one two $shared three four")
    val p1 = prints(s"nine eight $shared seven six five")
    assert((p0 & p1).nonEmpty) // the winnowing coverage guarantee
    assert(out(0L)._2 == p0.size && out(1L)._2 == p1.size)
    // layout-independent
    val again = TextAnalysis.winnowFingerprint(d.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(again == out)
  }

  test("repeated n-grams: shared 8-token runs are flagged cross-doc") {
    import spark.implicits._
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8" // exactly one width-8 window
    val d = Seq(
      (0L, s"$shared tail0 tail1", "en", "s1", 10L),     // 3 windows
      (1L, s"head0 $shared", "en", "s1", 10L),           // 2 windows
      (2L, "a totally different run of nine words here now", "en", "s1", 10L),
      (3L, "too short", "en", "s1", 10L)                 // < 8 tokens
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.repeatedNgrams(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // doc 3 has no window → excluded by design
    assert(out.keySet == Set(0L, 1L, 2L))
    // exactly the one shared window is duplicated in docs 0 and 1
    assert(out(0L) == ((3L, 1L, 1.0 / 3)))
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    // layout-independent
    val again = TextAnalysis.repeatedNgrams(d.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(again == out)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("vocabGrowth buckets new types by first appearance, exact cums") {
    // bin(doc_id+1)-1 buckets: doc0 -> 0; docs1-2 -> 1; docs3-6 -> 2
    val d = Seq(
      (0L, "a b"),
      (1L, "a c"),
      (2L, "a d e"),
      (3L, "a b f")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // bucket 0: doc0 (2 tokens; new a, b) — ttr 2/2
    assert(out(0L) == ((1L, 2L, 2L, 2L, 2L, 1.0)))
    // bucket 1: docs 1-2 (5 tokens; new c, d, e) — cum 7 tokens/5 types
    assert(out(1L) == ((2L, 5L, 3L, 7L, 5L, 5.0 / 7)))
    // bucket 2: doc3 (3 tokens; new f only) — cum 10/6
    assert(out(2L) == ((1L, 3L, 1L, 10L, 6L, 6.0 / 10)))
    // layout-independent
    val again = TextAnalysis.vocabGrowth(d.repartition(5)).collect()
      .map(_.toString)
    assert(again.sameElements(
      TextAnalysis.vocabGrowth(d).collect().map(_.toString)))
  }

  test("sourceSignatureTerms tf*idf overflow guard fires (planted cap)") {
    // guardedScore9 IS the production score expression; a planted cap
    // stands in for Long.MaxValue (the real bound needs ~4e8
    // occurrences of one term)
    val df = Seq((4L, 100L, "hot"), (2L, 100L, "cold"), (9L, 0L, "zero"))
      .toDF("tf", "iln_lr9", "w")
    val ok = df.withColumn("score9", TextAnalysis.guardedScore9(cap = 400L))
      .orderBy("w").select("score9").collect().map(_.getLong(0)).toSeq
    assert(ok == Seq(200L, 400L, 0L)) // cold, hot(=cap, passes), zero
    val boom = intercept[Exception] {
      df.withColumn("score9", TextAnalysis.guardedScore9(cap = 399L))
        .collect()
    }
    assert(boom.getMessage.contains("tf*idf BIGINT overflow"))
  }
}
