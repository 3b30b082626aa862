package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{QualitySignals, Quantize}

class QualitySignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "a a a a", "en", "s1", 7L), // fully repetitive
    (1L, "a b c d", "en", "s1", 7L), // fully diverse
    (2L, "x", "en", "s2", 1L), // too short for any 2-gram
    (3L, "p q p q p q", "en", "s2", 11L) // repeated bigram
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("repetition: degenerate doc maxes every signal, diverse doc zeroes them") {
    val out = QualitySignals.repetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: "a a a a" — top word = 4/4, all three 2-grams are "a a"
    assert(out(0L).getDouble(2) == 1.0)
    assert(out(0L).getDouble(3) == 1.0)
    assert(out(0L).getInt(5) == 1)
    // doc 1: unique words — top 1/4, no duplicated grams
    assert(out(1L).getDouble(2) == 0.25)
    assert(out(1L).getDouble(3) == 0.0)
    assert(out(1L).getDouble(4) == 0.0)
    // doc 2: single word — gram fractions default to 0, not null
    assert(out(2L).getDouble(3) == 0.0 && out(2L).getDouble(4) == 0.0)
    // doc 3: "p q" appears 3×, "q p" 2× of 5 grams → dup2 = 1.0
    assert(out(3L).getDouble(3) == 1.0)
  }

  test("unigramLm: docs of rare words score higher NLL than docs of common words") {
    val many = (0 until 8).map(i => (10L + i, "w w w w", "en", "s1", 7L))
    val d = (many :+ ((99L, "rare other", "en", "s2", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.unigramLm(d).collect()
      .map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(out("s2") > out("s1")) // rare-word doc is less likely
    // 32 'w' of 34 tokens: s1 NLL = -ln(32/34), exact to the 1e-9 grid
    assert(math.abs(out("s1") - -math.log(32.0 / 34.0)) < 1e-6)
  }

  test("LM emissions sit on the coarsened factor-1000 grid (r13 convention)") {
    // avg_nll_token = (coarsened sum)/n/1e6 ⇒ value·n·1e6 is an exact
    // integer (< 2^53); same for per-doc min/max and store scoring —
    // reverting the coarsening fails HERE, not at the driver
    val docs = Seq.tabulate(12)(i =>
      (i.toLong, s"alpha beta w$i gamma ${"x" * (i % 3 + 1)}",
        Seq("en", "de")(i % 2), s"s${i % 3}", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def onGrid(v: Double, n: Long): Unit = {
      // reconstruct the coarsened integer sum and replay the exact
      // division chain the operator emitted (sum/n then /1e6) —
      // bit-equality or bust
      val k = math.rint(v * n * 1e6).toLong
      assert(v == k.toDouble / n.toDouble / 1e6,
        s"off-grid emission: $v ($n)")
    }
    QualitySignals.unigramLm(docs).collect().foreach { r =>
      onGrid(r.getDouble(4), r.getLong(3)) // avg · total_tokens
    }
    QualitySignals.bigramFluency(docs).collect().foreach { r =>
      onGrid(r.getDouble(4), r.getLong(3))
    }
    QualitySignals.perplexityBuckets(docs).collect().foreach { r =>
      onGrid(r.getDouble(2), r.getLong(1)) // nll · n_tok
    }
  }

  test("piiRedact finds and redacts emails, phones, IPs (augment off)") {
    val d = Seq(
      (1L, "mail me at bob@corp.io or call 555-0199", "en", "s1", 40L),
      (2L, "server 10.1.2.3 and 10.4.5.6 down", "en", "s1", 33L),
      (3L, "nothing sensitive here", "en", "s1", 22L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.piiRedact(d, augment = false).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 filtered out
    val r1 = out(0)
    assert(r1.getLong(1) == 1 && r1.getLong(2) == 1 && r1.getLong(3) == 0)
    val r2 = out(1)
    assert(r2.getLong(3) == 2)
    // the md5 is of the fully redacted text — recompute it directly
    val expected = spark.sql(
      "SELECT md5('mail me at [EMAIL] or call [PHONE]')").first().getString(0)
    assert(r1.getString(4) == expected)
  }

  test("piiRedact counts describe the redaction when patterns overlap") {
    // the email pass consumes '555-1234@x.io' (digits/dash are legal
    // local-part chars) — the phone count must then be 0, matching
    // the redacted output, not 1 from an independent scan
    val d = Seq((1L, "reach me at 555-1234@example.com", "en", "s1", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = QualitySignals.piiRedact(d, augment = false).collect()(0)
    assert(r.getLong(1) == 1 && r.getLong(2) == 0 && r.getLong(3) == 0)
    val expected = spark.sql(
      "SELECT md5('reach me at [EMAIL]')").first().getString(0)
    assert(r.getString(4) == expected)
  }

  test("piiRedact fixture augmentation hits the deterministic doc_id slices") {
    val d = (0L until 100L).map(i => (i, "plain words", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.piiRedact(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L) == ((1L, 1L, 1L))) // 0 divides 7, 11 and 13
    assert(out(14L) == ((1L, 0L, 0L)))
    assert(out(22L) == ((0L, 1L, 0L)))
    assert(out(26L) == ((0L, 0L, 1L)))
    assert(!out.contains(1L)) // no PII appended → filtered
  }

  test("int8Stats: quantization is exact for representable vectors") {
    val d = Seq(
      (1L, Array(127.0f, -127.0f, 0.0f, 63.5f), 1),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f), 2) // zero vector guard
    ).toDF("vec_id", "embedding", "label")
    val out = Quantize.int8Stats(d).collect()
      .map(r => r.getInt(0) -> r).toMap
    // m=127 → q = (127, -127, 0, 64); L1 = 318; only 63.5 has error
    assert(out(1).getLong(3) == 318L)
    assert(out(1).getDouble(4) == 127.0)
    val step = 127.0 / 127.0 // m/127 = 1.0 → err = 64*1 - 63.5 = 0.5
    val mse = 0.5 * step * 0.5 * step / 4
    assert(math.abs(out(1).getDouble(5) - mse) < 1e-6)
    // zero vector: no codes, no error, scale 0
    assert(out(2).getLong(3) == 0L)
    assert(out(2).getDouble(4) == 0.0 && out(2).getDouble(5) == 0.0)
  }

  test("scoreAgainstLmStore: OOV tokens take the add-one unseen mass") {
    val base = Seq(
      // counts: alpha 2, beta 2, total 4 → p = 1/2 each
      (0L, "alpha alpha beta", "en", "s1", 0L),
      (1L, "beta", "en", "s1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("lmstore").toString + "/lm"
    QualitySignals.writeLmStore(base, dir)
    val delta = Seq(
      (10L, "alpha beta", "en", "s1", 0L),  // fully in-vocab
      (11L, "alpha zeta", "en", "s1", 0L)   // one OOV token
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.scoreAgainstLmStore(dir, delta).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // base totals: alpha 2, beta 2, total 4; emission at the r13
    // coarsened resolution: (-sum) div 1000 over the 1e9 grid, /1e6
    def g(p: Double) = math.floor(math.log(p) * 1e9 + 0.5).toLong
    def nll(terms: Long*): Double =
      (-terms.sum / 1000L).toDouble / terms.length / 1e6
    assert(out(10L) == ((2L, 0L, nll(g(0.5), g(0.5)))))
    // zeta is OOV → ln(1/(4+1))
    assert(out(11L) == ((2L, 1L, nll(g(0.5), g(1.0 / 5)))))
    // layout independence
    val again = QualitySignals
      .scoreAgainstLmStore(dir, delta.repartition(4))
      .collect().map(_.toString)
    assert(again.sameElements(QualitySignals
      .scoreAgainstLmStore(dir, delta).collect().map(_.toString)))
  }

  test("appendToLmStore ≡ a fresh store over the union") {
    val base = Seq((0L, "alpha alpha beta", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = Seq((1L, "beta gamma gamma gamma", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("lmappend")
    val grown = tmp.resolve("grown").toString
    val fresh = tmp.resolve("fresh").toString
    QualitySignals.writeLmStore(base, grown)
    QualitySignals.appendToLmStore(grown, batch)
    QualitySignals.writeLmStore(base.unionAll(batch), fresh)
    val probe = Seq((10L, "alpha beta gamma zeta", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = QualitySignals.scoreAgainstLmStore(grown, probe)
      .collect().map(_.toString)
    val b = QualitySignals.scoreAgainstLmStore(fresh, probe)
      .collect().map(_.toString)
    assert(a.sameElements(b))
    // and the OOV mass moved: gamma is now in-vocab, zeta still OOV
    val row = QualitySignals.scoreAgainstLmStore(grown, probe)
      .collect().head
    assert(row.getLong(2) == 1L) // exactly one OOV token (zeta)
  }

  test("pqTopK: an exact copy of the query has ADC 0 and ranks first") {
    // dims=4, m=2, k=2: seeds 0 and 1 are the codebook; vec 2 copies
    // seed 0 exactly → its codes are (0, 0) and ADC(query 0 → 2) = 0
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f), 0),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f), 1),
      (2L, Array(1.0f, 0.0f, 0.0f, 1.0f), 0), // exact copy of 0
      (3L, Array(0.9f, 0.1f, 0.1f, 0.9f), 0)  // near 0 — codes (0,0) too
    ).toDF("vec_id", "embedding", "label")
    val out = Quantize.pqTopK(e, m = 2, k = 2, numQueries = 1, topK = 3,
        dims = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.head == ((2L, 0L, 1))) // zero ADC, rank 1
    // vec 3 shares vec 2's codes → identical ADC, tie → larger id next
    assert(out(1)._1 == 3L && out(1)._2 == 0L)
    // vec 1's codes differ → strictly positive ADC
    assert(out(2)._1 == 1L && out(2)._2 > 0L)
    // layout independence
    val again = Quantize.pqTopK(e.repartition(5), m = 2, k = 2,
      numQueries = 1, topK = 3, dims = 4).collect().map(_.toString)
    assert(again.sameElements(Quantize.pqTopK(e, m = 2, k = 2,
      numQueries = 1, topK = 3, dims = 4).collect().map(_.toString)))
  }

  test("linearClassifier: score is the mean bucket weight, label its sign") {
    val d = Seq(
      (1L, "alpha beta alpha", "en", "s1", 16L),
      (2L, "alpha", "en", "s1", 5L),
      (3L, "  ", "en", "s1", 2L) // blank doc → filtered, not a div-by-0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.linearClassifier(d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    // recompute doc 2's weight directly from the documented hash chain
    val w = {
      def h60(s: String) = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .take(15), 16)
      (h60("qw:" + (h60("qc:alpha") % 1024)) % 2000001) - 1000000
    }
    assert(math.abs(out(2L)._2 - w / 1e6) < 1e-9)
    assert(out(2L)._3 == (if (w > 0) 1 else 0))
    // deterministic under repartition
    val again = QualitySignals.linearClassifier(d.repartition(5)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(again == out)
  }

  test("gopherRules: each rule gates on its own signal") {
    val d = Seq(
      // 26 words incl. 2 stopwords, mean len 100/26 ≈ 3.8 → passes all
      (1L, ("the a " + Seq.fill(24)("abcd").mkString(" ")),
        "en", "s1", 0L),
      (2L, "the a short doc", "en", "s1", 0L), // fails r_words (4 < 25)
      // 26 long words → fails r_mwl (mean len > 4.5) and r_stop
      (3L, Seq.fill(26)("extraordinarily").mkString(" "), "en", "s1", 0L),
      // 26 numeric tokens + 2 stops → fails r_alpha (2/28 < 0.8)
      (4L, ("the a " + Seq.fill(26)("12345").mkString(" ")), "en", "s1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.gopherRules(d).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9)))
      .toMap
    assert(out(1L) == ((1, 1, 1, 1, 1)))
    assert(out(2L)._1 == 0 && out(2L)._5 == 0)
    assert(out(3L)._2 == 0 && out(3L)._4 == 0 && out(3L)._5 == 0)
    assert(out(4L)._3 == 0 && out(4L)._5 == 0)
  }

  test("perplexityBuckets: rare-word docs rank last, tiers split evenly") {
    // 9 docs: three share a common word, three a mid word, three a rare
    // mix — per-token NLL orders by how common the doc's words are
    val d = (0L until 9L).map { i =>
      val w = if (i < 3) "common" else if (i < 6) "mid" else s"rare$i"
      (i, Seq.fill(4)(if (i < 6) w else s"$w x$i").mkString(" "),
        "en", "s1", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualitySignals.perplexityBuckets(d).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    // ranks are a permutation of 1..9
    assert(out.values.map(_._2).toSeq.sorted == (1L to 9L))
    // each tier holds exactly 3 docs
    val tiers = out.values.groupBy(_._4).view.mapValues(_.size).toMap
    assert(tiers == Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    // unique-word docs have strictly higher NLL than common-word docs
    val commonMax = (0L until 3L).map(out(_)._1).max
    val rareMin = (6L until 9L).map(out(_)._1).min
    assert(rareMin > commonMax)
    // bucket is the rank tercile
    out.values.foreach { case (_, rnk, bucket, _) =>
      assert(bucket == (rnk - 1) * 3 / 9)
    }
  }

  test("bigramFluency matches a driver-side reimplementation exactly") {
    val data = Seq(
      (0L, "a b a b a b", "en", "g0"), // predictable bigrams
      (1L, "a c b d a e", "en", "g1"), // same unigram-heavy 'a', unique pairs
      (2L, "z", "en", "g2"),           // single token → pure unigram
      (3L, "c d c d", "de", "g0"))
    val df = data.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val lambda = 0.7
    // faithful reimplementation of the documented formula
    val toks = data.map { case (id, t, l, s) =>
      (id, l, s, t.trim.split("\\s+").filter(_.nonEmpty).toSeq) }
      .filter(_._4.nonEmpty)
    val stream = toks.flatMap { case (id, l, s, ws) =>
      ws.zipWithIndex.map { case (w, i) =>
        (id, l, s, if (i == 0) null else ws(i - 1), w) } }
    val uni = stream.groupBy(_._5).map { case (w, g) => w -> g.size.toLong }
    val t = uni.values.sum.toDouble
    val big = stream.filter(_._4 != null)
      .groupBy(r => (r._4, r._5)).map { case (k, g) => k -> g.size.toLong }
    val ctx = big.groupBy(_._1._1).map { case (p, g) => p -> g.values.sum }
    def lp9(p: String, w: String): Long = {
      val term =
        if (p == null) math.log(uni(w) / t)
        else math.log(lambda * (big((p, w)).toDouble / ctx(p)) +
          (1.0 - lambda) * (uni(w) / t))
      math.floor(term * 1e9 + 0.5).toLong
    }
    val perDoc = stream.groupBy(r => (r._1, r._2, r._3)).map { case (k, g) =>
      k -> ((g.size.toLong, g.map(r => lp9(r._4, r._5)).sum)) }
    val expected = perDoc.groupBy { case ((_, l, s), _) => (l, s) }
      .map { case (k, g) =>
        val n = g.values.map(_._1).sum
        val sum = g.values.map(_._2).sum
        // r13 coarsened emission: (-sum) div 1000 over the grid, /1e6
        k -> ((g.size.toLong, n,
          (-sum / 1000L).toDouble / n.toDouble / 1e6)) }
    val out = QualitySignals.bigramFluency(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == expected)
    // and the semantics have teeth: the predictable-bigram doc is more
    // fluent (lower NLL) than the unique-bigram doc
    assert(out(("en", "g0"))._3 < out(("en", "g1"))._3)
    // layout independence
    val again = QualitySignals.bigramFluency(df.repartition(5)).collect()
      .map(_.toString)
    assert(again.sameElements(
      QualitySignals.bigramFluency(df).collect().map(_.toString)))
  }

  test("bigram guards: lambda /1000 cap and the D*t^2 headroom fire") {
    // the /1000 grid caps D at 1000 for ANY lambda (ADVICE r14) and
    // keeps the default exactly 7/10
    assert(QualitySignals.rationalizeLambda(0.7) == ((7L, 10L)))
    assert(QualitySignals.rationalizeLambda(0.123457) == ((123L, 1000L)))
    assert(QualitySignals.rationalizeLambda(0.0) == ((0L, 1L)))
    assert(QualitySignals.rationalizeLambda(1.0) == ((1L, 1L)))
    assert(QualitySignals.rationalizeLambda(0.5) == ((1L, 2L)))
    // the headroom guard is the PRODUCTION expression (bigramFluency
    // routes its 1-row tot through it); planted bound makes it fire
    val ok = QualitySignals
      .guardedTokenTotal(Seq(100L).toDF("t"), tBound = 1000L)
      .collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(100L))
    val boom = intercept[Exception] {
      QualitySignals.guardedTokenTotal(Seq(100L).toDF("t"), tBound = 10L)
        .collect()
    }
    assert(boom.getMessage.contains("headroom exceeded"))
  }
}
