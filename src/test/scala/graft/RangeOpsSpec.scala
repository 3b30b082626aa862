package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{RangeOps, Sampling}

class RangeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 10L, 1000L), // band (1000, 1600]
    (2L, 10L, 1600L), // half-open: right at 1600 excluded, 2200 included
    (3L, 20L, 500L),  // other key
    (4L, 30L, 100L)   // key with no right rows
  ).toDF("lid", "k", "lt")

  private def rightDf = Seq(
    (100L, 10L, 1000L), // equal time: excluded (strict lower bound)
    (101L, 10L, 1001L),
    (102L, 10L, 1600L), // hits lid=1 (inclusive hi), not lid=2 (strict lo)
    (103L, 10L, 2200L), // hits lid=2 only
    (104L, 10L, 2201L), // beyond every band
    (105L, 20L, 900L),  // key 20, in band of lid=3
    (106L, 20L, 5000L)
  ).toDF("rid", "k", "rt")

  test("banded range join matches the (lo, hi] definition per key") {
    val pairs = RangeOps.rangeJoin(leftDf, rightDf, Seq("k"), "lt", "rt",
        0L, 600L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 101L), (1L, 102L), (2L, 103L), (3L, 105L)))
  }

  test("band replication never duplicates a pair") {
    val out = RangeOps.rangeJoin(leftDf, rightDf, Seq("k"), "lt", "rt",
        0L, 600L)
      .groupBy("lid", "rid").count().filter(col("count") > 1).count()
    assert(out == 0L)
  }

  test("banded join equals the naive theta-join on random data") {
    val rnd = new scala.util.Random(42)
    val l = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .toDF("lid", "k", "lt")
    val r = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .toDF("rid", "k", "rt")
    val (lo, hi) = (250L, 1000L)
    val banded = RangeOps.rangeJoin(l, r, Seq("k"), "lt", "rt", lo, hi)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.join(r, "k")
      .filter(col("rt") - col("lt") > lo && col("rt") - col("lt") <= hi)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
  }

  test("look-back bands and pre-epoch timestamps bucket correctly") {
    // negative loMicros (a look-back join) and timestamps straddling 0
    // make the bucket operands negative — floor division must hold
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(4000).toLong - 2000L))
      .toDF("lid", "k", "lt")
    val r = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(4000).toLong - 2000L))
      .toDF("rid", "k", "rt")
    for ((lo, hi) <- Seq((-700L, -100L), (-300L, 300L), (-50L, 1L))) {
      val banded = RangeOps.rangeJoin(l, r, Seq("k"), "lt", "rt", lo, hi)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val naive = l.join(r, "k")
        .filter(col("rt") - col("lt") > lo && col("rt") - col("lt") <= hi)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(banded == naive, s"band ($lo, $hi]")
    }
  }

  test("salted and keyless range joins return the plain result set") {
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong))
      .toDF("lid", "k", "lt")
    val r = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(5000).toLong))
      .toDF("rid", "k", "rt")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").as[(Long, Long)].collect().toSet
    val plain = pairs(RangeOps.rangeJoin(l, r, Seq("k"), "lt", "rt", 0L, 700L))
    val salted = pairs(RangeOps.rangeJoinSalted(l, r, Seq("k"), "lt", "rt",
      0L, 700L, saltFactor = 4))
    assert(salted == plain)
    // keyless: a pure temporal join (no equi keys at all)
    val keyless = pairs(RangeOps.rangeJoin(l.drop("k"), r.drop("k"),
      Seq.empty, "lt", "rt", 0L, 700L))
    val naive = (for {
      (lid, _, lt) <- l.as[(Long, Long, Long)].collect()
      (rid, _, rt) <- r.as[(Long, Long, Long)].collect()
      if rt - lt > 0 && rt - lt <= 700L
    } yield (lid, rid)).toSet
    assert(keyless == naive)
  }

  test("driver entry counts error→click followups per user") {
    val ts = (us: Long) => new java.sql.Timestamp(us / 1000L)
    val events = Seq(
      (1L, ts(0L), 7L, "error", 0.0, "{}"),
      (2L, ts(1000000L), 7L, "click", 0.0, "{}"),     // 1 s after error
      (3L, ts(600000000L), 7L, "click", 0.0, "{}"),   // exactly 600 s: kept
      (4L, ts(601000000L), 7L, "click", 0.0, "{}"),   // past the window
      (5L, ts(0L), 8L, "click", 0.0, "{}"),           // other user, no error
      (6L, ts(50L), 9L, "error", 0.0, "{}")           // error, no clicks
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = RangeOps.errorClickFollowups(events, windowSeconds = 600)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List((7L, 2L, 1L, 2L)))
  }

  test("composed corpus pipeline: gates, splits and totals are consistent") {
    import graft.operators.{CorpusPipeline, Dedup, Sampling}
    // unique words per doc: no near-dups, so the keep-list is total
    // and short docs (< 3 words, < minTokens) exercise the edge paths
    val docs = Seq.tabulate(400)(i =>
      (i.toLong, (0 until (i % 12)).map(j => s"w${i}_$j").mkString(" "),
        if (i % 2 == 0) "en" else "de", s"src${i % 3}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.corpusStats(docs, tau = 0.5, minTokens = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // domains
    assert(out.keySet.forall { case (l, s) =>
      Set("en", "de")(l) && Set("train", "valid", "test")(s) })
    // invariant: n_docs equals an independent recomputation from the
    // building blocks (keep-list ∘ sample ∘ token gate)
    val keep = Dedup.clusters(docs, tau = 0.5)
      .filter(col("doc_id") === col("cluster_id")).select("doc_id")
    val rate = when(col("lang") === "en", 400)
      .when(col("lang") === "de", 900).otherwise(500)
    val expected = docs.join(keep, "doc_id")
      .filter(Sampling.hashBucket("smp:", col("doc_id")) < rate)
      .filter(size(split(trim(col("text")), "\\s+")) >= 5)
      .filter(length(trim(col("text"))) > 0)
      .count()
    assert(out.values.map(_._1).sum == expected && expected > 0)
    // per-group arithmetic: avg_tokens = sum/n, and the gate held
    out.values.foreach { case (n, sum, avg) =>
      assert(sum >= 5L * n && avg == sum.toDouble / n)
    }
  }

  test("source quota caps per-source counts deterministically") {
    val docs = Seq.tabulate(300)(i =>
      (i.toLong, s"text $i", "en", s"src${i % 3}", (10 + i % 5).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val q1 = Sampling.sourceQuota(docs, quota = 15).collect()
    val q2 = Sampling.sourceQuota(docs.repartition(11), quota = 15).collect()
    assert(q1.sameElements(q2)) // layout-independent
    assert(q1.map(_.getString(0)).toSeq == Seq("src0", "src1", "src2"))
    assert(q1.forall(_.getLong(1) == 15L)) // 100 available → capped at 15
    // a source under quota keeps everything
    val small = Sampling.sourceQuota(docs.filter(col("doc_id") < 9), 15)
      .collect()
    assert(small.map(r => r.getString(0) -> r.getLong(1)).toMap
      .values.toSeq == Seq(3L, 3L, 3L))
  }

  test("mixEpochs repeats over-weighted sources and thins the rest") {
    // 3 sources × 100 docs; recipe: src0 45%, src1 35%, src2 20% of a
    // 300-doc output → targets 135/105/60: src0 ships 1 full epoch +
    // a ~35% partial, src2 thins to a ~60% partial of epoch 0
    val docs = Seq.tabulate(300)(i =>
      (i.toLong, s"text $i", "en", s"src${i % 3}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val recipe = Map("src0" -> 450, "src1" -> 350, "src2" -> 200)
    val out = Sampling.mixEpochs(docs, recipe).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // full epochs carry EXACTLY the source's doc count
    assert(out(("src0", 0L)) == ((100L, 135L)))
    assert(out(("src1", 0L)) == ((100L, 105L)))
    // partial epochs: permille-approximate, deterministic
    val (p0, _) = out(("src0", 1L))
    assert(p0 > 20 && p0 < 50, s"src0 partial=$p0")
    val (p2, t2) = out(("src2", 0L))
    assert(t2 == 60L && p2 > 45 && p2 < 75, s"src2 partial=$p2")
    // no src1 epoch 1 beyond its 5% partial; no epochs ≥ 2 anywhere
    assert(!out.keySet.exists(_._2 >= 2))
    // layout-independent
    val out2 = Sampling.mixEpochs(docs.repartition(7), recipe).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out2 == out)
    // a source absent from the recipe ships nothing
    val out3 = Sampling.mixEpochs(docs, recipe - "src2").collect()
      .map(_.getString(0)).toSet
    assert(out3 == Set("src0", "src1"))
  }

  test("stratified sample is deterministic and respects stratum rates") {
    val docs = Seq.tabulate(2000)(i =>
      (i.toLong, s"text $i", if (i % 2 == 0) "en" else "de", s"src${i % 3}", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s1 = Sampling.stratifiedSample(docs).collect()
    val s2 = Sampling.stratifiedSample(docs.repartition(7)).collect()
    assert(s1.sameElements(s2)) // layout-independent
    val byLang = s1.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    // en keeps ~40% of 1000, de ~90% of 1000 (md5 buckets are uniform)
    assert(byLang("en") > 320 && byLang("en") < 480)
    assert(byLang("de") > 840 && byLang("de") < 960)
    val splits = s1.groupBy(_.getString(3)).map { case (s, rs) => s -> rs.length }
    assert(splits("train") > splits("valid") && splits("train") > splits("test"))
    assert(splits.values.sum == s1.length)
  }

  test("deterministic shuffle is a layout-independent total permutation") {
    val docs = Seq.tabulate(2000)(i =>
      (i.toLong, s"text $i", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s1 = Sampling.deterministicShuffle(docs).collect()
    val s2 = Sampling.deterministicShuffle(docs.repartition(7)).collect()
    assert(s1.sameElements(s2)) // layout-independent
    // a permutation: every doc exactly once
    assert(s1.map(_.getLong(0)).sorted.sameElements(0L until 2000L))
    // dense 1..n positions within every shard
    s1.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.sameElements(1L to rows.length))
    }
    // actually shuffled: doc order within a shard isn't id order
    val shard0 = s1.filter(_.getLong(2) == 0L).map(_.getLong(0))
    assert(!shard0.sorted.sameElements(shard0))
    // a different salt yields a different epoch order
    val e2 = Sampling.deterministicShuffle(docs, salt = "ep2:").collect()
    assert(!e2.map(_.getLong(0)).sameElements(s1.map(_.getLong(0))))
  }

  test("temperature sample flattens the language mixture deterministically") {
    // 1600 en / 200 de / 200 fr: α=0.5 boosts the minorities' SHARE
    val docs = Seq.tabulate(2000) { i =>
      val lang = if (i < 1600) "en" else if (i < 1800) "de" else "fr"
      (i.toLong, s"text $i", lang, s"src${i % 3}", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Sampling.temperatureSample(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("en", "de", "fr"))
    val (nEn, rEn, kEn) = out("en")
    val (nDe, rDe, kDe) = out("de")
    assert(nEn == 1600L && nDe == 200L)
    // minority languages get a strictly higher keep-rate
    assert(rDe > rEn && out("fr")._2 == rDe)
    // α=0.5, T=N/2: q_en = √1600/(√1600+2√200) ≈ .586 → rate ≈ .366
    assert(rEn > 300 && rEn < 430)
    assert(rDe > 900) // q_de·T/n_de ≈ 1.04 → capped near 1000
    // kept counts follow the rates (md5 buckets are uniform)
    assert(math.abs(kEn - nEn * rEn / 1000.0) < 60)
    assert(math.abs(kDe - nDe * rDe / 1000.0) < 30)
    // layout-independent
    val again = Sampling.temperatureSample(docs.repartition(7)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }
}
