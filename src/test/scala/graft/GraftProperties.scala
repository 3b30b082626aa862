package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions._
import graft.operators.Kernels

/** Property-based algebraic invariants (SURVEY §5.2 item 3): the
  * engine-level guarantees every operator relies on, checked over
  * random 2-decimal data (the fixture domain).
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-decimal doubles — the fixture money domain
  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(-99999, 99999).map(_ / 100.0))

  private val kvGen: Gen[List[(Int, Double)]] =
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 5),
      Gen.chooseNum(-9999, 9999).map(_ / 100.0)))

  property("filter composition commutes") = forAll(moneyGen) { xs =>
    val df = xs.toDF("x")
    val a = df.filter($"x" > 0).filter($"x" < 100).collect().toSet
    val b = df.filter($"x" < 100).filter($"x" > 0).collect().toSet
    a == b
  }

  property("dsum distributes over union (partial/final agg exactness)") =
    forAll(moneyGen, moneyGen) { (xs, ys) =>
      (xs.nonEmpty && ys.nonEmpty) ==> {
        val su = xs.toDF("x").unionAll(ys.toDF("x"))
          .agg(Kernels.dsum($"x")).head.getDouble(0)
        val sa = xs.toDF("x").agg(Kernels.dsum($"x")).head.getDouble(0)
        val sb = ys.toDF("x").agg(Kernels.dsum($"x")).head.getDouble(0)
        // exact decimal carrier → bit-equal, not approximately equal
        su == BigDecimal(sa).+(BigDecimal(sb)).toDouble ||
          su == sa + sb
      }
    }

  property("topK equals sorted prefix") = forAll(kvGen) { kvs =>
    kvs.nonEmpty ==> {
      val df = kvs.toDF("k", "v")
      val top = Kernels.topK(df, 5, $"v".desc, $"k".asc)
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toList
      val full = kvs.sortBy { case (k, v) => (-v, k) }.take(5)
      top == full
    }
  }

  property("groupBy counts sum to total") = forAll(kvGen) { kvs =>
    val df = kvs.toDF("k", "v")
    val grouped = df.groupBy("k").agg(count(lit(1)).as("n"))
      .agg(sum("n")).head
    val total = if (grouped.isNullAt(0)) 0L else grouped.getLong(0)
    total == kvs.size.toLong
  }

  property("join with unique-keyed dim preserves fact rows") =
    forAll(kvGen) { kvs =>
      val fact = kvs.toDF("k", "v")
      val dim = (0 to 5).map(k => (k, s"d$k")).toDF("k", "name")
      fact.join(dim, "k").count() == kvs.size.toLong
    }

  property("groupedArgmax rows all attain their group max") =
    forAll(kvGen) { kvs =>
      kvs.nonEmpty ==> {
        val df = kvs.toDF("k", "v")
        val maxes = kvs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        Kernels.groupedArgmax(df, Seq("k"), $"v").collect()
          .forall(r => r.getDouble(1) == maxes(r.getInt(0)))
      }
    }

  // (key, time) event streams for the as-of join invariant
  private val streamGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    Gen.zip(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 200L))),
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 200L))))
      .map { case (ls, rs) =>
        (ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
          // unique (key, time) on the right so "latest" is well-defined
          rs.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
      }

  property("as-of join matches the per-row latest-at-or-before definition") =
    forAll(streamGen) { case (ls, rs) =>
      ls.nonEmpty ==> {
        val l = ls.toDF("id", "k", "t")
        val r = rs.toDF("rk", "rt", "v")
        val got = graft.operators.AsofOps
          .asofJoin(l, r, "t", "rt", "k", "rk")
          .select("id", "v").collect()
          .map(x => x.getLong(0) ->
            (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
        ls.forall { case (id, k, t) =>
          val expected = rs.filter(x => x._1 == k && x._2 <= t)
            .sortBy(_._2).lastOption.map(_._3)
          got(id) == expected
        }
      }
    }

  // random band bounds alongside the streams: lo in [-60, 50) so
  // look-back bands (negative offsets → negative bucket operands)
  // are exercised, width ≥ 1
  private val bandGen: Gen[(Long, Long)] =
    Gen.zip(Gen.chooseNum(-60L, 49L), Gen.chooseNum(1L, 80L))
      .map { case (lo, w) => (lo, lo + w) }

  // token counts 0..8 (zero-token docs exist in real corpora, never in
  // the fixtures), block size deliberately smaller than the doc count
  private val packGen: Gen[(List[Int], Long, Long)] =
    Gen.zip(Gen.listOfN(30, Gen.chooseNum(0, 8)),
      Gen.chooseNum(1L, 20L), Gen.chooseNum(1L, 64L))

  property("sequence packing equals the sequential reference") =
    forAll(packGen) { case (toks, blockSize, seqLen) =>
      val docs = toks.zipWithIndex.map { case (n, i) =>
        (i.toLong, List.fill(n)("tok").mkString(" "), "en", "s", 1L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = graft.operators.CorpusPipeline
        .packSequences(docs, seqLen, blockSize)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toList
      var cum = 0L
      val ref = toks.zipWithIndex.map { case (n, i) =>
        val start = cum; cum += n
        (start / seqLen, i.toLong, n.toLong)
      }.groupBy(_._1).toList.sortBy(_._1).map { case (bin, xs) =>
        (bin, xs.length.toLong, xs.map(_._3).sum,
          xs.map(_._2).min, xs.map(_._2).max)
      }
      got == ref
    }

  property("banded range join matches the (lo, hi] pair definition") =
    forAll(streamGen, bandGen) { case ((ls, rs), (lo, hi)) =>
      (ls.nonEmpty && rs.nonEmpty) ==> {
        val l = ls.toDF("id", "k", "lt")
        val r = rs.map { case (k, t, i) => (i, k, t) }.toDF("rid", "k", "rt")
        val got = graft.operators.RangeOps
          .rangeJoin(l, r, Seq("k"), "lt", "rt", lo, hi)
          .select("id", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        val expected = (for {
          (id, k, t) <- ls
          (rk, rt, rid) <- rs
          if rk == k && rt - t > lo && rt - t <= hi
        } yield (id, rid)).toSet
        got == expected
      }
    }

  // random word-salad documents over a small vocabulary
  private val docGen: Gen[List[(Long, String)]] =
    Gen.listOfN(6, Gen.listOfN(12,
      Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def docsDf(ds: List[(Long, String)]) =
    ds.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  property("repetition signals match the sequential definition") =
    forAll(docGen) { ds =>
      ds.nonEmpty ==> {
        val got = graft.operators.QualitySignals.repetition(docsDf(ds))
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4)))).toMap
        ds.forall { case (id, text) =>
          val ws = text.trim.split("\\s+").filter(_.nonEmpty).toList
          def dupFrac(n: Int): Double = {
            val gs = ws.sliding(n).filter(_.size == n).map(_.mkString(" "))
              .toList
            if (gs.isEmpty) 0.0
            else {
              val counts = gs.groupBy(identity).values.map(_.size)
              counts.filter(_ > 1).sum.toDouble / gs.size
            }
          }
          val wc = ws.groupBy(identity).values.map(_.size)
          val (nTok, topF, d2, d3) = got(id)
          nTok == ws.size && topF == wc.max.toDouble / ws.size &&
            d2 == dupFrac(2) && d3 == dupFrac(3)
        }
      }
    }

  property("PII redaction is idempotent and counts are stable") =
    forAll(docGen) { ds =>
      ds.nonEmpty ==> {
        import graft.operators.QualitySignals
        val once = QualitySignals.piiRedact(docsDf(ds)).collect()
          .map(r => (r.getLong(0), r.getString(4))).toMap
        // re-redacting already-redacted text finds nothing: run the
        // scan over the redacted placeholders
        val redacted = ds.map { case (id, _) =>
          (id, "[EMAIL] [PHONE] [IP] plain words") }
        val again = QualitySignals
          .piiRedact(docsDf(redacted), augment = false).collect()
        once.nonEmpty ==> (again.isEmpty)
      }
    }

  property("passage dedup strips exactly the corpus-frequent passages") =
    forAll(docGen) { ds =>
      ds.nonEmpty ==> {
        import graft.operators.Dedup
        val w = 2
        // sequential reference: chunk every doc, count corpus-wide,
        // keep chunks seen < 3 times
        val chunks = ds.map { case (id, t) =>
          id -> t.split("\\s+").filter(_.nonEmpty).grouped(w)
            .map(_.mkString(" ")).toList }
        val freq = chunks.flatMap(_._2).groupBy(identity)
          .map { case (p, o) => p -> o.size }
        val got = Dedup.passageDedup(docsDf(ds), width = w,
            maxOccurrences = 3).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        chunks.forall { case (id, ps) =>
          got(id) == ((ps.size.toLong,
            ps.count(p => freq(p) < 3).toLong))
        }
      }
    }

  property("winnowing fingerprints are gram-hash minima (subset, bounded)") =
    forAll(docGen) { ds =>
      ds.nonEmpty ==> {
        import graft.operators.TextAnalysis
        val got = TextAnalysis.winnowFingerprint(docsDf(ds)).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        ds.forall { case (id, t) =>
          val n = t.split("\\s+").count(_.nonEmpty)
          val nGrams = math.max(n - 2, 0)
          val (g, p) = got(id)
          // gram count exact; fingerprints non-empty iff grams exist,
          // and never more than the window count
          g == nGrams &&
            (if (nGrams == 0) p == 0
             else p >= 1 && p <= math.max(nGrams - 3, 1))
        }
      }
    }

  property("int8 codes are scale-invariant; absmax scales linearly") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 250.0f))) {
      vs =>
      vs.exists(_ != 0.0f) ==> {
        import graft.operators.Quantize
        val one = Seq((1L, vs.toArray, 0)).toDF("vec_id", "embedding", "label")
        val four = Seq((1L, vs.toArray.map(_ * 4.0f), 0))
          .toDF("vec_id", "embedding", "label")
        val a = Quantize.int8Stats(one).head
        val b = Quantize.int8Stats(four).head
        // quantization is relative to the per-vector absmax: scaling
        // the vector leaves the codes (and their L1 checksum) intact
        a.getLong(3) == b.getLong(3) &&
          math.abs(b.getDouble(4) - 4.0 * a.getDouble(4)) < 1e-5
      }
    }

  // pure-JVM (no Spark job), so the 8-case Spark budget doesn't
  // apply: a seeded 20k-pair sweep of the integer-ln recurrence vs
  // Math.log over the FULL operand range, plus log-additivity within
  // summed truncation error
  property("integer ln: <=1e-7 of Math.log, 20k pairs, full range") = {
    import graft.functions.IntegerLn.lnRatio9Ref
    val rng = new scala.util.Random(14L)
    def operand(): Long = rng.nextInt(3) match {
      case 0 => 1L + rng.nextInt(1000)
      case 1 => 1L + rng.nextLong(1000000000L)
      case _ => 1L + rng.nextLong((1L << 62) - 1)
    }
    (0 until 20000).forall { _ =>
      val (n, d) = (operand(), operand())
      math.abs(lnRatio9Ref(n, d) / 1e9 -
        math.log(n.toDouble / d.toDouble)) <= 1e-7
    }
  }
  property("integer ln: log-additivity ln(a/b)+ln(b/c) ~ ln(a/c)") = {
    import graft.functions.IntegerLn.lnRatio9Ref
    val rng = new scala.util.Random(15L)
    (0 until 20000).forall { _ =>
      val a = 1L + rng.nextLong(1000000000L)
      val b = 1L + rng.nextLong(1000000000L)
      val c = 1L + rng.nextLong(1000000000L)
      // each call truncates independently (bound ~40 units each)
      math.abs(lnRatio9Ref(a, b) + lnRatio9Ref(b, c) -
        lnRatio9Ref(a, c)) <= 120L
    }
  }
}
