package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusPipeline

/** Decontamination + sequence packing (the composed corpus pipeline
  * itself is covered in RangeOpsSpec alongside its building blocks).
  */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dsirSelect ranks target-distribution-like docs first") {
    // en = target distribution (alpha/beta/gamma); xx = raw-only
    // vocabulary (delta/epsilon/zeta); doc 4 is an xx doc written in
    // the TARGET vocabulary — DSIR's whole point is to surface it
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta gamma alpha beta", "en"),
      (1L, "beta gamma alpha beta alpha gamma beta alpha", "en"),
      (2L, "delta epsilon zeta delta epsilon zeta delta", "xx"),
      (3L, "zeta delta epsilon zeta epsilon delta zeta", "xx"),
      (4L, "alpha beta gamma alpha beta gamma alpha beta", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = CorpusPipeline.dsirSelect(docs, buckets = 64, topK = 5)
      .collect()
    assert(out.length == 5)
    val ids = out.map(_.getLong(0)).toSeq
    // target-vocabulary docs (en + the target-like xx doc 4) all
    // outrank the raw-vocabulary docs 2 and 3
    assert(ids.takeRight(2).toSet == Set(2L, 3L), s"order=$ids")
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // raw-only docs carry clearly negative importance; the margin to
    // the target-like docs is wide (sign of the target-like docs
    // themselves is not asserted: at toy scale a doc's own grams
    // inflate the raw denominator enough to nudge them ~0)
    assert(byId(2L) < byId(4L) - 0.1 && byId(3L) < byId(4L) - 0.1)
    // weights are per-gram averages: the ordering column is finite
    assert(out.forall(r => !r.getDouble(3).isNaN))
  }

  test("decontaminate flags docs overlapping the benchmark slice") {
    // benchMod=29 → ids 0 and 29 are benchmark docs
    val bench0 = "alpha beta gamma delta epsilon zeta eta theta"
    val bench29 = "one two three four five six seven eight nine"
    val docs = Seq(
      (0L, bench0, "en", "s", 10L),
      (29L, bench29, "en", "s", 10L),
      (5L, bench0, "en", "s", 10L),              // exact copy of bench 0
      (7L, "one two three four five ten", "en", "s", 10L), // partial of 29
      (9L, "completely different words entirely here now", "en", "s", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.decontaminate(docs, tau = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(5L) == (0L, 1.0)) // all shingles contained in bench 0
    // doc 7: shingles {one two three, two three four, three four five,
    // four five ten} — 3 of 4 appear in bench 29
    assert(out(7L) == (29L, 0.75))
    assert(!out.contains(9L)) // disjoint: never flagged
    assert(!out.contains(0L) && !out.contains(29L)) // bench side excluded
  }

  test("packSequences matches a driver-side running-sum reference") {
    // pure-alpha words so regex tokens == words; irregular sizes and a
    // blockSize smaller than the corpus exercise the ledger path
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(137)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(9))("word").mkString(" "),
        "en", "s", 10L))
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusPipeline.packSequences(docs, seqLen = 16L, blockSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // reference: plain sequential packing over doc_id order
    var cum = 0L
    val bins = rows.sortBy(_._1).map { case (id, text, _, _, _) =>
      val n = text.split(" ").length.toLong
      val start = cum; cum += n
      (start / 16L, id, n)
    }
    val expected = bins.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, xs) => (bin, xs.length.toLong, xs.map(_._3).sum,
        xs.map(_._2).min, xs.map(_._2).max)
    }
    assert(got.toSeq == expected)
  }

  test("packSequences is layout-independent") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(3 + i % 5)("tok").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = CorpusPipeline.packSequences(docs, 32L, 7L).collect()
    val b = CorpusPipeline.packSequences(docs.repartition(13), 32L, 7L).collect()
    assert(a.sameElements(b))
  }

  /** Sequential word-level BPE trainer — the ground truth the
    * distributed double-space-replace implementation must equal.
    */
  private def seqBpe(wordFreq: Map[String, Long],
      m: Int): List[(Int, String, String, Long)] = {
    var dict = wordFreq.toList.map { case (w, f) =>
      (w.map(_.toString).toList, f)
    }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long)]
    for (r <- 1 to m) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      dict.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += f)
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toList
          .minBy { case ((x, y), n) => (-n, s"$x $y") }
        def merge(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (x + y) :: merge(rest)
          case x :: rest => x :: merge(rest)
          case Nil => Nil
        }
        dict = dict.map { case (syms, f) => (merge(syms), f) }
        out += ((r, s"$a $b", a + b, c))
      }
    }
    out.toList
  }

  test("bpeMerges equals the sequential BPE trainer, merge for merge") {
    // repeated words with shared substrings; 'aaaa' exercises the
    // greedy non-overlapping pairing (a a a a -> aa aa, not aa a a)
    val words = Seq.fill(10)("lower") ++ Seq.fill(6)("lowest") ++
      Seq.fill(8)("newer") ++ Seq.fill(5)("wider") ++ Seq.fill(4)("aaaa")
    val docs = words.grouped(5).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.mkString(" "), "en", "s", 10L)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val freq = words.groupBy(identity).map { case (w, g) =>
      w -> g.size.toLong
    }
    val expected = seqBpe(freq, 6)
    val got = CorpusPipeline.bpeMerges(docs, numMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("bpeMerges pairs greedily left-to-right, not overlapping") {
    // 'aaaa' alone: round 1 merges (a,a) with weighted count 3·freq;
    // GREEDY pairing gives [aa, aa], so round 2 must merge (aa, aa) —
    // a non-greedy [aa, a, a] split would merge (aa, a) instead, and
    // the sequential reference (which is greedy by construction)
    // would catch it
    val docs = Seq.tabulate(5)(i => (i.toLong, "aaaa", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusPipeline.bpeMerges(docs, numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    assert(got == List((1, "a a", "aa", 15L), (2, "aa aa", "aaaa", 5L)),
      got.toString)
    assert(got == seqBpe(Map("aaaa" -> 5L), 2))
  }

  test("bpeEncode token counts equal sequential merge application") {
    val words = Seq.fill(10)("lower") ++ Seq.fill(6)("lowest") ++
      Seq.fill(8)("newer")
    val docs = words.grouped(4).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.mkString(" "), "en", "s", 10L)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val freq = words.groupBy(identity).map { case (w, g) =>
      w -> g.size.toLong
    }
    // sequential: learn merges, then apply them to each word in order
    val merges = seqBpe(freq, 4).map(_._2)
    def encode(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList) { (syms, m) =>
        val Array(a, b) = m.split(" ")
        def go(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (x + y) :: go(rest)
          case x :: rest => x :: go(rest)
          case Nil => Nil
        }
        go(syms)
      }
    val expTokens = words.map(w => encode(w).size.toLong).sum
    val expVocab = words.flatMap(encode).distinct.size.toLong
    val row = CorpusPipeline.bpeEncode(docs, numMerges = 4).collect()(0)
    assert(row.getString(0) == "en")
    assert(row.getLong(1) == words.size)
    assert(row.getLong(2) == expTokens, s"${row.getLong(2)} vs $expTokens")
    assert(row.getLong(3) == expVocab)
  }

  test("bpeEncode covers out-of-dictionary words (dictLimit only bounds training)") {
    val words = Seq.fill(8)("lower") ++ Seq.fill(6)("newer") ++
      Seq("rare", "rarer", "rarest")
    val docs = words.grouped(5).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.mkString(" "), "en", "s", 10L)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    // merges learn only from the top-2 words, but EVERY word is
    // encoded — including the rare ones the dictionary pruned
    val row = CorpusPipeline.bpeEncode(docs, numMerges = 2, dictLimit = 2)
      .collect()(0)
    assert(row.getLong(1) == words.size.toLong) // nothing dropped
    assert(row.getLong(2) > 0)
  }

  test("bpeMerges is layout-independent") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"alpha beta gamma delta w$i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = CorpusPipeline.bpeMerges(docs, 4).collect()
    val b = CorpusPipeline.bpeMerges(docs.repartition(9), 4).collect()
    assert(a.sameElements(b))
  }

  test("curate composes passage dedup, quality gate and temperature sampling") {
    // 60 docs across two langs; every doc carries the same 3-word
    // boilerplate header, which passage dedup must strip corpus-wide
    val docs = Seq.tabulate(60) { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      (i.toLong, s"hot hot hot unique$i word$i tail$i", lang, "s", 20L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.curate(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // the boilerplate is gone: every surviving doc contributes exactly
    // its 3 unique words (width=3 → ["hot hot hot", "uniqueN wordN tailN"])
    out.values.foreach { case (n, sum, avg) =>
      assert(sum == 3 * n && avg == 3.0)
    }
    // gate + sampling only drop docs — never more docs than the corpus
    assert(out.values.map(_._1).sum <= 60)
    assert(out.values.forall(_._1 > 0))
    // layout-independent
    val again = CorpusPipeline.curate(docs.repartition(11)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(again == out)
  }

  test("ragIngest gates with gopher rules before chunking") {
    val pass = "the a " + Seq.fill(40)("abcd").mkString(" ") // 42 words, passes
    val fail = "too short" // fails min-words
    val d = Seq(
      (0L, pass, "en", "sA", 0L),
      (1L, fail, "en", "sB", 0L),
      (2L, pass, "en", "sA", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.ragIngest(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // sB's only doc fails the gate → absent; sA ships 2 docs, each 42
    // tokens → 2 chunks apiece (32 + tail 18 at stride 24)
    assert(!out.contains("sB"))
    assert(out("sA") == ((4L, (32L + 18L) * 2, 2L)))
  }

  test("chunkDocuments: every token covered, overlap and tail laws hold") {
    val d = Seq(
      (0L, Seq.tabulate(40)(i => s"w$i").mkString(" ")), // 40 tokens
      (1L, "just three tokens"),                         // short → 1 chunk
      (2L, Seq.tabulate(32)(i => s"x$i").mkString(" "))  // exactly chunkLen
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.chunkDocuments(d, chunkLen = 32, stride = 24)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // doc 0 (40 toks): chunk 0 covers 1..32, chunk 1 starts at 24 and
    // holds the remaining 16 — overlap of 8 tokens, full coverage
    assert(out((0L, 0L)) == ((0L, 32L)))
    assert(out((0L, 1L)) == ((24L, 16L)))
    assert(!out.contains((0L, 2L)))
    // short and exact-length docs yield exactly one chunk each
    assert(out((1L, 0L)) == ((0L, 3L)) && !out.contains((1L, 1L)))
    assert(out((2L, 0L)) == ((0L, 32L)) && !out.contains((2L, 1L)))
    // the chunk text hash matches a direct reconstruction
    val md5s = CorpusPipeline.chunkDocuments(d, 32, 24).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5s((0L, 1L)) ==
      m((24 until 40).map(i => s"w$i").mkString(" ")))
  }

  test("corpusDiff classifies added/removed/modified/unchanged per source") {
    val old = Seq(
      (0L, "same text", "s1"),
      (1L, "will change", "s1"),
      (2L, "will vanish", "s2")).toDF("doc_id", "text", "source")
    val nw = Seq(
      (0L, "same text", "s1"),
      (1L, "changed now", "s1"),
      (3L, "brand new", "s2")).toDF("doc_id", "text", "source")
    val out = CorpusPipeline.corpusDiff(old, nw).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("s1", "unchanged") -> 1L, ("s1", "modified") -> 1L,
      ("s2", "removed") -> 1L, ("s2", "added") -> 1L))
  }

  test("exactKSample carves exactly K docs, layout-independent") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, s"text $i", if (i % 2 == 0) "en" else "de",
        s"src${i % 3}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Sampling.exactKSample(docs, k = 37).collect()
    assert(out.map(_.getLong(1)).sum == 37L) // exactly K, never expected-K
    val again = graft.operators.Sampling
      .exactKSample(docs.repartition(9), k = 37).collect().map(_.toString)
    assert(again.sameElements(out.map(_.toString)))
    // append stability: adding docs only displaces by smaller hash —
    // the carved set from a superset is a (hash-wise) refinement, so
    // every kept hash in the superset cut is <= the original max
    val more = docs.unionAll(Seq((1000L, "extra", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val mx0 = out.map(_.getLong(3)).max
    val mx1 = graft.operators.Sampling.exactKSample(more, k = 37)
      .collect().map(_.getLong(3)).max
    assert(mx1 <= mx0)
  }

  private def subwordDocs = {
    val words = Seq("hello", "help", "helmet", "low", "lower", "yellow",
      "mellow", "hell", "he", "ox")
    words.grouped(3).zipWithIndex.map { case (g, i) =>
      (i.toLong, (g ++ g.take(i)).mkString(" "), "en", "s", 10L)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("subword segmentation reassembles every dictionary word") {
    import graft.operators.CorpusPipeline
    val segs = CorpusPipeline.subwordSegments(subwordDocs, vocabSize = 6)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3)))
    val rebuilt = segs.groupBy(_._1).map { case (w, ps) =>
      w -> ps.sortBy(_._2).map(_._3).mkString
    }
    assert(rebuilt.nonEmpty)
    rebuilt.foreach { case (w, s) => assert(s == w, s"$w rebuilt as $s") }
  }

  test("subword segmentation is greedy longest-match against the vocab") {
    import graft.operators.CorpusPipeline
    val vocab = CorpusPipeline.subwordVocab(subwordDocs, vocabSize = 6)
      .collect().map(_.getString(0)).toSet ++
      subwordDocs.collect().flatMap(_.getString(1).split("\\s+"))
        .flatMap(_.toSeq).map(_.toString).toSet
    val segs = CorpusPipeline.subwordSegments(subwordDocs, vocabSize = 6)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3)))
      .groupBy(_._1).map { case (w, ps) => w -> ps.sortBy(_._2).map(_._3) }
    // sequential greedy reference
    def greedy(w: String): Seq[String] = {
      var pos = 0
      val out = scala.collection.mutable.ListBuffer[String]()
      while (pos < w.length) {
        val piece = (math.min(6, w.length - pos) to 1 by -1).iterator
          .map(L => w.substring(pos, pos + L)).find(vocab.contains).get
        out += piece; pos += piece.length
      }
      out.toSeq
    }
    segs.foreach { case (w, ps) =>
      assert(ps.toSeq == greedy(w), s"word $w") }
  }

  test("subword stats are layout-independent") {
    import graft.operators.CorpusPipeline
    val a = CorpusPipeline.subwordStats(subwordDocs)
      .collect().map(_.toString).toSeq
    val b = CorpusPipeline.subwordStats(subwordDocs.repartition(7))
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
