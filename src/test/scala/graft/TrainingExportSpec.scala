package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TrainingExport
import graft.operators.Sampling

class TrainingExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq.tabulate(120)(i =>
    (i.toLong, s"document body ${(i * 31) % 57} tok${i % 11}", "en",
      s"src${i % 3}", (20 + i % 9).toLong))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def manifest(path: String): Seq[String] =
    TrainingExport.readManifest(spark, path)
      .collect().map(_.toString).toSeq

  test("manifest from written files equals the source-derived frame") {
    val path = java.nio.file.Files.createTempDirectory("graft_export")
      .resolve("exp").toString
    TrainingExport.exportShards(docs, path, shards = 8, waves = 4)
    assert(TrainingExport.isCompleteExport(fs, path))
    val fromFiles = manifest(path)
    val fromSource = docs
      .withColumn("shard", pmod(
        Sampling.hashBucketFull(TrainingExport.ShardSalt, col("doc_id")),
        lit(8L)))
      .withColumn("ch", conv(substring(md5(concat(
        col("doc_id").cast("string"), lit(":"), col("text"))), 1, 15),
        16, 10).cast("bigint"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(ch)").as("xor_hash"),
        sum("n_chars").cast("bigint").as("sum_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("shard").collect().map(_.toString).toSeq
    assert(fromFiles == fromSource && fromFiles.size == 8)
  }

  test("a crashed export resumes: missing waves rewritten, result identical") {
    val path = java.nio.file.Files.createTempDirectory("graft_export_res")
      .resolve("exp").toString
    TrainingExport.exportShards(docs, path, shards = 8, waves = 4)
    val want = manifest(path)
    // simulate a crash after wave 1: waves 2,3 never happened (their
    // markers + shard dirs gone), the manifest was never published,
    // and wave 2 died mid-write leaving tmp garbage
    val p = new org.apache.hadoop.fs.Path(_: String)
    fs.delete(p(s"$path/_manifest"), true)
    for (w <- 2 to 3) fs.delete(p(s"$path/_wave${w}of4.done"), false)
    for (k <- 0 until 8 if k % 4 >= 2) fs.delete(p(s"$path/shard=$k"), true)
    fs.mkdirs(p(s"$path/.wave2.tmp/shard=2"))
    fs.create(p(s"$path/.wave2.tmp/shard=2/garbage")).close()
    assert(!TrainingExport.isCompleteExport(fs, path))
    TrainingExport.exportShards(docs, path, shards = 8, waves = 4)
    assert(TrainingExport.isCompleteExport(fs, path))
    assert(manifest(path) == want)
    assert(!fs.exists(p(s"$path/.wave2.tmp")))
  }

  test("resuming with a different wave count rewrites every wave, losing nothing") {
    val path = java.nio.file.Files.createTempDirectory("graft_export_wv")
      .resolve("exp").toString
    TrainingExport.exportShards(docs, path, shards = 8, waves = 4)
    val want = manifest(path)
    // crash after waves 0,1 of a 4-wave export…
    val p = new org.apache.hadoop.fs.Path(_: String)
    fs.delete(p(s"$path/_manifest"), true)
    for (w <- 2 to 3) fs.delete(p(s"$path/_wave${w}of4.done"), false)
    for (k <- 0 until 8 if k % 4 >= 2) fs.delete(p(s"$path/shard=$k"), true)
    // …resumed with waves=2: the old markers match nothing, every
    // wave rewrites, the export completes identically
    TrainingExport.exportShards(docs, path, shards = 8, waves = 2)
    assert(TrainingExport.isCompleteExport(fs, path))
    assert(manifest(path) == want)
    // but a mismatched SHARD count on resume is refused outright
    fs.delete(p(s"$path/_manifest"), true)
    assertThrows[IllegalArgumentException] {
      TrainingExport.exportShards(docs, path, shards = 5, waves = 2)
    }
  }

  test("a completed export is a no-op on re-run") {
    val path = java.nio.file.Files.createTempDirectory("graft_export_noop")
      .resolve("exp").toString
    TrainingExport.exportShards(docs, path, shards = 8, waves = 4)
    val stamp = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$path/_manifest")).getModificationTime
    TrainingExport.exportShards(docs, path, shards = 8, waves = 4)
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$path/_manifest")).getModificationTime == stamp)
  }

  test("incremental append equals a fresh export over the union") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_export_app")
    val inc = tmp.resolve("inc").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    TrainingExport.exportShards(base, inc, shards = 8, waves = 2)
    assert(TrainingExport.appendBatchToExport(inc, batch, 0L))
    val fresh = tmp.resolve("fresh").toString
    TrainingExport.exportShards(docs, fresh, shards = 8, waves = 2)
    def m(p: String) = TrainingExport.readManifest(spark, p)
      .collect().map(_.toString).sorted.toSeq
    assert(m(inc) == m(fresh))
    // and the stored manifest still equals the from-files truth
    assert(m(inc) == TrainingExport.manifestFromFiles(spark, inc)
      .collect().map(_.toString).sorted.toSeq)
    // replayed id: skipped exactly
    assert(!TrainingExport.appendBatchToExport(inc, batch, 0L))
    assert(m(inc) == m(fresh))
  }

  test("a crashed append attempt is cleaned up and re-applied exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_export_crash")
    val inc = tmp.resolve("inc").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    TrainingExport.exportShards(base, inc, shards = 8, waves = 2)
    // simulate: a previous attempt of batch 7 moved SOME files but
    // died before publishing the manifest
    val p = new org.apache.hadoop.fs.Path(_: String)
    val someShard = fs.listStatus(p(inc))
      .filter(_.getPath.getName.startsWith("shard=")).head.getPath
    fs.create(new org.apache.hadoop.fs.Path(someShard,
      "b7-part-garbage.parquet")).close()
    assert(TrainingExport.appendBatchToExport(inc, batch, 7L))
    val fresh = tmp.resolve("fresh").toString
    TrainingExport.exportShards(docs, fresh, shards = 8, waves = 2)
    def m(px: String) = TrainingExport.readManifest(spark, px)
      .collect().map(_.toString).sorted.toSeq
    assert(m(inc) == m(fresh))
    assert(TrainingExport.lastAppendedBatch(fs, inc) == 7L)
  }

  test("readShard returns exactly the shard's docs in training order, appends interleaved") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_export_rd")
    val inc = tmp.resolve("inc").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    TrainingExport.exportShards(base, inc, shards = 4, waves = 2)
    TrainingExport.appendBatchToExport(inc, batch, 0L)
    val got = TrainingExport.readShard(spark, inc, 2)
      .select("skey", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = docs
      .withColumn("skey", Sampling.hashBucketFull(
        TrainingExport.ShardSalt, col("doc_id")))
      .filter(pmod(col("skey"), lit(4L)) === 2L)
      .select("skey", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("reshard preserves global content exactly under a new shard count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_export_rs")
    val a = tmp.resolve("a").toString
    val b = tmp.resolve("b").toString
    TrainingExport.exportShards(docs, a, shards = 8, waves = 4)
    TrainingExport.reshard(spark, a, b, shards = 5, waves = 2)
    def global(path: String): (Long, Long) = {
      val r = TrainingExport.readManifest(spark, path)
        .agg(sum("n_rows"), expr("bit_xor(xor_hash)")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(global(a) == global(b))
    assert(TrainingExport.readManifest(spark, b).count() == 5)
    // and the resharded export is itself a valid source-parity export
    val direct = tmp.resolve("c").toString
    TrainingExport.exportShards(docs, direct, shards = 5, waves = 2)
    val x = TrainingExport.readManifest(spark, b)
      .collect().map(_.toString).sorted
    val y = TrainingExport.readManifest(spark, direct)
      .collect().map(_.toString).sorted
    assert(x.sameElements(y))
  }

  test("rows inside each shard file are in (skey, doc_id) training order") {
    val path = java.nio.file.Files.createTempDirectory("graft_export_ord")
      .resolve("exp").toString
    TrainingExport.exportShards(docs, path, shards = 4, waves = 2)
    val shard0 = new org.apache.hadoop.fs.Path(s"$path/shard=0")
    val files = fs.listStatus(shard0)
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (st <- files) {
      val rows = spark.read.parquet(st.getPath.toString)
        .select("skey", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == rows.sorted)
    }
  }
}
