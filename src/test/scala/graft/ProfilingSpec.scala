package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq.tabulate(120)(i =>
    (i.toLong, s"text body ${i % 37}", Seq("en", "de", "fr")(i % 3),
      s"src${i % 4}", 40L + (i % 5) * 64L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("columnProfile: exact rows/nulls/distincts and NUMERIC min/max") {
    val df = Seq[(java.lang.Long, String)](
      (9L, "b"), (10L, "a"), (10L, null), (null, "a"))
      .toDF("k", "s")
    val rows = Profiling.columnProfile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    // numeric semantics: min 9 / max 10, NOT byte-string "10" < "9"
    assert(rows("k") == ((4L, 1L, 2L, "9", "10")))
    assert(rows("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("columnProfile on an EMPTY input keeps the oracle's one-row-per-column shape") {
    val empty = Seq.empty[(java.lang.Long, String)].toDF("k", "s")
    val rows = Profiling.columnProfile(empty, Seq("k", "s")).collect()
    assert(rows.length == 2, s"expected 2 seeded rows, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.isNullAt(4) && r.isNullAt(5), s"empty min/max not null: $r")
    }
  }

  test("drift psi/kl are emitted on the 1e-6 grid (driver-portable resolution)") {
    // the per-term 1e-9 grid sum is exact, but its ±1-unit tail rides
    // cross-engine ln bits (the r12 driver red); emission divides the
    // exact sum by 1000 so a term flip can only show when the whole
    // sum sits within 1e-6 of a boundary
    val cur = docs.filter(col("lang") =!= "de")
    Profiling.driftReport(docs, cur).collect().foreach { r =>
      Seq(r.getDouble(4), r.getDouble(5)).foreach { v =>
        assert(v >= 0.0, s"negative emitted drift: $r")
        val scaled = v * 1e6
        assert(scaled == math.rint(scaled), s"psi/kl off the 1e-6 grid: $r")
      }
    }
  }

  test("driftBinsEntry: all-integer per-bin counts reconstruct the planted shift") {
    val rows = Profiling.driftBinsEntry(
        docs.withColumn("source", col("source")))
      .collect()
    assert(rows.nonEmpty)
    // counts are exact and consistent with the split sizes
    val nRef = docs.filter(Profiling.plantedShiftRefCol).count()
    val nCur = docs.filter(Profiling.plantedShiftCurCol).count()
    val byFeature = rows.groupBy(_.getString(0))
    byFeature.foreach { case (f, rs) =>
      assert(rs.map(_.getLong(2)).sum == nRef, s"$f c_ref total")
      assert(rs.map(_.getLong(3)).sum == nCur, s"$f c_cur total")
    }
    assert(byFeature.keySet == Set("lang", "len_bucket", "source"))
  }

  test("events/embeddings bins diagnostics: per-feature totals equal split sizes") {
    val events = Seq.tabulate(200)(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 3600000L),
        i.toLong % 7, Seq("click", "view", "error")(i % 3),
        (i % 50) * 3.7))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val er = Profiling.eventsDriftBinsEntry(events).collect()
    val eRef = events.filter(col("event_id") % 2 === 0).count()
    er.groupBy(_.getString(0)).foreach { case (f, rs) =>
      assert(rs.map(_.getLong(2)).sum == eRef, s"events $f c_ref total")
    }
    assert(er.map(_.getString(0)).toSet ==
      Set("event_type", "hour_of_day", "value_bucket"))
    val emb = Seq.tabulate(60) { i =>
      (i.toLong, Seq.tabulate(8)(d => (d + 1) * 0.25f *
        (if (d == i % 8) 2f else 1f)), i % 5)
    }.toDF("vec_id", "embedding", "label")
    val br = Profiling.embeddingDriftBinsEntry(emb).collect()
    val bRef = emb.filter(col("vec_id") % 2 === 0).count()
    br.groupBy(_.getString(0)).foreach { case (f, rs) =>
      assert(rs.map(_.getLong(2)).sum == bRef, s"emb $f c_ref total")
    }
    assert(br.map(_.getString(0)).toSet ==
      Set("label", "argmax_dim", "norm_bucket"))
  }

  test("driftReport on identical snapshots is exactly zero") {
    val r = Profiling.driftReport(docs, docs).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getDouble(4) == 0.0 && row.getDouble(5) == 0.0 &&
        row.getDouble(6) == 0.0, s"nonzero drift: $row")
    }
  }

  test("driftReport flags a removed language; smoothing handles one-sided bins") {
    val cur = docs.filter(col("lang") =!= "de")
    val byFeature = Profiling.driftReport(docs, cur).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    // 'de' exists only on the ref side: add-1 smoothing keeps the sum
    // finite and the vanished bin dominates the lang PSI
    assert(byFeature("lang") > 0.1)
    // untouched marginal stays comparatively calm but nonzero (the
    // removed third shifts all shares)
    assert(byFeature("source") >= 0.0 && byFeature("source") < byFeature("lang"))
  }

  test("eventsDrift: zero on identical snapshots, moves when a type vanishes") {
    val events = Seq.tabulate(200)(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 3600000L),
        i.toLong % 7, Seq("click", "view", "error")(i % 3),
        (i % 50) * 3.7))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    Profiling.eventsDrift(events, events).collect().foreach { r =>
      assert(r.getDouble(4) == 0.0 && r.getDouble(6) == 0.0)
    }
    val byFeature = Profiling
      .eventsDrift(events, events.filter(col("event_type") =!= "error"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(byFeature("event_type") > 0.1)
    assert(byFeature.size == 3)
  }

  test("embeddingDrift: zero on identical snapshots, moves when a cluster collapses") {
    val rnd = new scala.util.Random(7)
    val emb = Seq.tabulate(300) { i =>
      val label = i % 5
      // cluster direction = dimension 2*label, plus small noise
      val v = Array.tabulate(16)(d =>
        (if (d == 2 * label) 1.0f else 0.0f) +
          (rnd.nextFloat() - 0.5f) * 0.2f)
      (i.toLong, v.toSeq, label)
    }.toDF("vec_id", "embedding", "label")
    Profiling.embeddingDrift(emb, emb).collect().foreach { r =>
      assert(r.getDouble(4) == 0.0 && r.getDouble(6) == 0.0)
    }
    val byFeature = Profiling
      .embeddingDrift(emb, emb.filter(col("label") =!= 2))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(byFeature.size == 3)
    assert(byFeature("label") > 0.1)
    assert(byFeature("argmax_dim") > 0.05) // direction 4 vanished with it
  }

  test("profile store: append equals a fresh build over the union, exactly") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_profile")
    val inc = tmp.resolve("inc").toString
    Profiling.writeProfileStore(base, inc)
    Profiling.appendToProfileStore(inc, batch)
    val fresh = tmp.resolve("fresh").toString
    Profiling.writeProfileStore(docs, fresh)
    def bins(p: String) = spark.read.parquet(s"$p/bins")
      .orderBy("feature", "bin").collect().map(_.toString)
    assert(bins(inc).sameElements(bins(fresh)) && bins(inc).nonEmpty)
    // and the drift a consumer computes from either store is identical
    val cur = docs.filter(col("lang") =!= "fr")
    val a = Profiling.driftFromStore(spark, inc, cur).collect()
      .map(_.toString)
    val b = Profiling.driftFromStore(spark, fresh, cur).collect()
      .map(_.toString)
    assert(a.sameElements(b))
  }

  test("batch-stamped append skips a replayed batch id exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_profile_replay")
      .resolve("store").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    Profiling.writeProfileStore(base, tmp)
    assert(Profiling.appendBatchToProfileStore(tmp, batch, 0L))
    def bins() = spark.read.parquet(s"$tmp/bins")
      .orderBy("feature", "bin").collect().map(_.toString)
    val once = bins()
    // replayed id: skipped — additive counts would double-count
    assert(!Profiling.appendBatchToProfileStore(tmp, batch, 0L))
    assert(bins().sameElements(once))
    // next id applies
    assert(Profiling.appendBatchToProfileStore(tmp,
      batch.limit(0), 1L))
  }

  test("driftFromStore matches the direct two-snapshot report") {
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val cur = docs.filter(col("doc_id") % 2 === 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_profile_rt")
      .resolve("store").toString
    Profiling.writeProfileStore(ref, tmp)
    val viaStore = Profiling.driftFromStore(spark, tmp, cur).collect()
      .map(_.toString)
    val direct = Profiling.driftReport(ref, cur).collect().map(_.toString)
    assert(viaStore.sameElements(direct) && viaStore.nonEmpty)
  }

  test("append into a missing store is refused (no orphan publishes)") {
    val ghost = java.nio.file.Files.createTempDirectory("graft_profile_ghost")
      .resolve("nope").toString
    intercept[IllegalArgumentException] {
      Profiling.appendToProfileStore(ghost, docs)
    }
  }
}
