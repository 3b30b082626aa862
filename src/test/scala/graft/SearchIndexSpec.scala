package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Search, SearchIndex}

class SearchIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // vocabulary overlaps the default query table ("hash join merge" …)
  private def docs = Seq.tabulate(80)(i =>
    (i.toLong,
      Seq("hash", "join", "filter", "scan", "merge", "agg", "window",
        "stream", "batch", "vector")
        .zipWithIndex.filter { case (_, j) => (i + j) % 3 != 0 }
        .map { case (w, j) => (w + " ") * ((i + j) % 4 + 1) }
        .mkString(" "),
      "en", s"src${i % 3}", 50L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("retrieval from the store is bit-identical to the direct BM25") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx")
      .resolve("store").toString
    SearchIndex.writeIndexStore(docs, tmp)
    val stored = SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString)
    val direct = Search.bm25Queries(docs).collect().map(_.toString)
    assert(stored.sameElements(direct) && stored.nonEmpty)
  }

  test("append equals a fresh build over the union, through retrieval") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_app")
    val inc = tmp.resolve("inc").toString
    SearchIndex.writeIndexStore(base, inc)
    SearchIndex.appendToIndexStore(inc, delta)
    val fresh = tmp.resolve("fresh").toString
    SearchIndex.writeIndexStore(docs, fresh)
    val a = SearchIndex.bm25FromStore(spark, inc).collect().map(_.toString)
    val b = SearchIndex.bm25FromStore(spark, fresh).collect()
      .map(_.toString)
    assert(a.sameElements(b) && a.nonEmpty)
  }

  test("replayed content tag and replayed batch id are both no-ops") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_rp")
      .resolve("store").toString
    SearchIndex.writeIndexStore(base, tmp)
    SearchIndex.appendToIndexStore(tmp, delta)
    val once = SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString)
    // same content tag: manifest hit, nothing re-lands
    SearchIndex.appendToIndexStore(tmp, delta)
    assert(SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString).sameElements(once))
    // stamped path: id 0 applies once, replay refused
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_sidx_rp2")
      .resolve("store").toString
    SearchIndex.writeIndexStore(base, tmp2)
    assert(SearchIndex.appendBatchToIndexStore(tmp2, delta, 0L))
    val after = SearchIndex.bm25FromStore(spark, tmp2).collect()
      .map(_.toString)
    assert(!SearchIndex.appendBatchToIndexStore(tmp2, delta, 0L))
    assert(SearchIndex.bm25FromStore(spark, tmp2).collect()
      .map(_.toString).sameElements(after))
    // a NEW id carrying already-manifested content: content no-op
    // (returns false, store unchanged) but the watermark advances so
    // the stamped and tagged guards agree — id 1 then replays as a
    // plain watermark hit
    assert(!SearchIndex.appendBatchToIndexStore(tmp2, delta, 1L))
    assert(SearchIndex.bm25FromStore(spark, tmp2).collect()
      .map(_.toString).sameElements(after))
    assert(!SearchIndex.appendBatchToIndexStore(tmp2, delta, 1L))
  }

  test("a crash inside the root swap self-heals from .old") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_heal")
      .resolve("store").toString
    SearchIndex.writeIndexStore(docs, tmp)
    val before = SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString)
    // the window between swapIn's two renames: dst gone, .old complete
    val p = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(tmp + ".old")
    fs.delete(old, true)
    require(fs.rename(p, old))
    assert(SearchIndex.isCompleteIndexStore(fs, tmp))
    assert(SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString).sameElements(before))
  }

  test("orphan batch dirs from a crashed append are invisible to readers") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_crash")
      .resolve("store").toString
    SearchIndex.writeIndexStore(base, tmp)
    val before = SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString)
    // simulate the crash window: batch dirs landed, meta publish never
    // ran — write them exactly as the append would (the store's OWN
    // tokenizer/bucketing, so a WB change can't desync the fixture),
    // manifest untouched
    val tok = SearchIndex.tokAgg(delta)
    tok.write.mode("overwrite").partitionBy("wb")
      .parquet(s"$tmp/postings/batch=borphan")
    tok.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$tmp/doclens/batch=borphan")
    assert(SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString).sameElements(before))
  }

  test("query probe partition-prunes the postings scan to its wb buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_prune")
      .resolve("store").toString
    SearchIndex.writeIndexStore(docs, tmp)
    // the outer retrieval plan hides the scan behind a lazy
    // localCheckpoint barrier, so assert on the store-read building
    // block the retrieval composes: manifest-gated read + wb filter
    val wb = spark.range(1).select(
        pmod(xxhash64(lit("hash")), lit(SearchIndex.WB.toLong)))
      .collect().head.getLong(0)
    val tags = spark.read.parquet(s"$tmp/meta/tags")
      .collect().map(_.getString(0)).toSeq
    val plan = SearchIndex
      .readBatched(spark, tmp, "postings", tags, Some(Seq(wb)))
      .queryExecution.executedPlan
    val scans = plan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "wb"))),
      "postings scan carries no wb partition filter — prune lost")
    // and the pruned read returns exactly the one term's postings
    val rows = SearchIndex
      .readBatched(spark, tmp, "postings", tags, Some(Seq(wb)))
      .filter(col("w") === "hash")
    assert(rows.count() > 0)
  }

  test("compaction: scores bit-identical, one dir left, ledger outlives the fold") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_cmp")
    val store = tmp.resolve("store").toString
    val parts = (0 to 2).map(m => docs.filter(col("doc_id") % 3 === m))
    SearchIndex.writeIndexStore(parts(0), store)
    SearchIndex.appendToIndexStore(store, parts(1))
    SearchIndex.appendToIndexStore(store, parts(2))
    val before = SearchIndex.bm25FromStore(spark, store).collect()
      .map(_.toString)
    def batchDirs(sub: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/$sub"))
        .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(batchDirs("postings").length == 3)
    // a crashed append's orphan (unmanifested dir): invisible to
    // reads, and the fold's sweep must RECLAIM it, not just the
    // folded tags
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$store/postings/batch=borphan"))
    // under threshold: maintain is a no-op; at it: folds all three
    assert(SearchIndex.maintainIndexStore(spark, store, 4) == 0)
    assert(SearchIndex.maintainIndexStore(spark, store, 3) == 3)
    assert(SearchIndex.bm25FromStore(spark, store).collect()
      .map(_.toString).sameElements(before), "compaction changed scores")
    assert(batchDirs("postings").length == 1 &&
      batchDirs("postings").head.startsWith("batch=c3_"),
      s"orphan or folded dirs survived: ${batchDirs("postings").toSeq}")
    assert(batchDirs("doclens").length == 1)
    // the applied LEDGER outlives the folded dirs: replaying an old
    // batch (tagged or stamped) is a no-op — its dir is NOT recreated
    SearchIndex.appendToIndexStore(store, parts(1))
    assert(!SearchIndex.appendBatchToIndexStore(store, parts(2), 7L))
    assert(batchDirs("postings").length == 1)
    assert(SearchIndex.bm25FromStore(spark, store).collect()
      .map(_.toString).sameElements(before))
    // nothing left to fold
    assert(SearchIndex.compactIndexStore(spark, store) == 0)
    // crash window between a fold's meta publish and ITS sweep: one
    // visible tag, folded dirs still on disk — the single-tag call
    // must still reclaim them (else they leak forever: every later
    // call would early-return at one visible tag)
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$store/postings/batch=bstale"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$store/doclens/batch=bstale"))
    assert(SearchIndex.compactIndexStore(spark, store) == 0)
    assert(!batchDirs("postings").contains("batch=bstale") &&
      !batchDirs("doclens").contains("batch=bstale"),
      "single-tag compact left crash orphans on disk")
    // compaction composes with append: a genuinely NEW batch lands
    // after the fold and the store still equals a fresh build
    val extra = docs.withColumn("doc_id", col("doc_id") + 1000L)
    SearchIndex.appendToIndexStore(store, extra)
    val fresh = tmp.resolve("fresh").toString
    SearchIndex.writeIndexStore(docs.unionAll(extra), fresh)
    assert(SearchIndex.bm25FromStore(spark, store).collect()
      .map(_.toString).sameElements(
        SearchIndex.bm25FromStore(spark, fresh).collect()
          .map(_.toString)),
      "post-compaction append diverged from fresh")
  }

  test("empty store and missing store behave (empty result; append refused)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_empty")
    val empty = tmp.resolve("empty").toString
    SearchIndex.writeIndexStore(docs.limit(0), empty)
    assert(SearchIndex.bm25FromStore(spark, empty).collect().isEmpty)
    intercept[IllegalArgumentException] {
      SearchIndex.appendToIndexStore(tmp.resolve("nope").toString, docs)
    }
  }

  test("compaction on an EMPTY manifest never sweeps a crashed append's dirs") {
    // the empty-manifest state IS constructible: writeIndexStore over
    // an empty frame publishes zero tags — if a later append crashes
    // after landing its batch dirs but before its meta publish, a
    // maintenance compaction must not bulk-delete the unpublished dirs
    // (the empty visible set would otherwise sweep EVERYTHING)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_esweep")
      .resolve("store").toString
    SearchIndex.writeIndexStore(docs.limit(0), tmp)
    val tok = SearchIndex.tokAgg(docs)
    tok.write.mode("overwrite").partitionBy("wb")
      .parquet(s"$tmp/postings/batch=bcrashed")
    tok.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode("overwrite").parquet(s"$tmp/doclens/batch=bcrashed")
    assert(SearchIndex.compactIndexStore(spark, tmp) == 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$tmp/postings/batch=bcrashed")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$tmp/doclens/batch=bcrashed")))
    // and with one visible tag the sweep still reclaims true orphans
    // while the published generation stays intact
    val single = java.nio.file.Files
      .createTempDirectory("graft_sidx_esweep2").resolve("store").toString
    SearchIndex.writeIndexStore(docs, single)
    tok.limit(1).write.mode("overwrite").partitionBy("wb")
      .parquet(s"$single/postings/batch=borphan")
    val before = SearchIndex.bm25FromStore(spark, single).collect()
      .map(_.toString)
    assert(SearchIndex.compactIndexStore(spark, single) == 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$single/postings/batch=borphan")))
    assert(SearchIndex.bm25FromStore(spark, single).collect()
      .map(_.toString).sameElements(before))
  }

  test("positional store: rerank from the index is bit-identical to " +
    "the fresh rerank — through append, compaction, and retrieval") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_pos")
      .resolve("store").toString
    val base = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4L)) === 0)
    SearchIndex.writeIndexStore(base, tmp, positions = true)
    // append derives the layout from the STORE — no caller flag
    SearchIndex.appendToIndexStore(tmp, delta)
    val fresh = Search.bm25Rerank(docs).collect().map(_.toString)
    val stored = SearchIndex.rerankFromStore(spark, tmp).collect()
      .map(_.toString)
    assert(stored.sameElements(fresh) && stored.nonEmpty)
    // retrieval over the positional layout is unchanged too
    assert(SearchIndex.bm25FromStore(spark, tmp).collect()
      .map(_.toString)
      .sameElements(Search.bm25Queries(docs).collect().map(_.toString)))
    // the fold is a pure re-layout for positions as well
    assert(SearchIndex.compactIndexStore(spark, tmp) == 2)
    assert(SearchIndex.rerankFromStore(spark, tmp).collect()
      .map(_.toString).sameElements(fresh))
  }

  test("plain store refuses rerankFromStore loudly; positions cost " +
    "storage, not retrieval IO (ps pruned from the probe's scan)") {
    val plain = java.nio.file.Files.createTempDirectory("graft_sidx_np")
      .resolve("store").toString
    SearchIndex.writeIndexStore(docs, plain)
    val e = intercept[IllegalArgumentException](
      SearchIndex.rerankFromStore(spark, plain))
    assert(e.getMessage.contains("WITHOUT positions"), e.getMessage)
    // positional store: the RETRIEVAL projection (w, doc_id, tf, wb)
    // must reach the parquet scan without ps — column pruning keeps
    // the position lists off the wire for every non-rerank probe
    // (pre-barrier building block, the wb-prune test's pattern)
    val pos = java.nio.file.Files.createTempDirectory("graft_sidx_psch")
      .resolve("store").toString
    SearchIndex.writeIndexStore(docs, pos, positions = true)
    val tags = spark.read.parquet(s"$pos/meta/tags")
      .collect().map(_.getString(0)).toSeq
    val plan = SearchIndex.readBatched(spark, pos, "postings", tags, None)
      .select("w", "doc_id", "tf")
      .queryExecution.executedPlan
    val scans = plan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(!_.requiredSchema.fieldNames.contains("ps")),
      "retrieval projection read the ps column — pruning lost")
    // while the rerank path really reads them
    assert(SearchIndex.readBatched(spark, pos, "postings", tags, None)
      .select(explode(col("ps"))).count() > 0)
  }
}
