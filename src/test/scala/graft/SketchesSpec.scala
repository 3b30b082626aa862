package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq.tabulate(90)(i =>
    (i.toLong, (0 until 6).map(j => s"w${(i * 7 + j * 13) % 40}")
      .mkString(" "), "en", s"src${i % 3}", 10L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("sketch store: append equals a fresh build over the union") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sketch")
    val inc = tmp.resolve("inc").toString
    Sketches.writeSketchStore(base, inc)
    Sketches.appendToSketchStore(inc, batch)
    val fresh = tmp.resolve("fresh").toString
    Sketches.writeSketchStore(docs, fresh)
    val a = Sketches.estimateStore(spark, inc).collect().map(_.toString)
    val b = Sketches.estimateStore(spark, fresh).collect().map(_.toString)
    assert(a.sameElements(b) && a.nonEmpty)
  }

  test("sketch estimates match exact distinct counts at fixture cardinality") {
    // lgK=14 HLL is EXACT below its list-mode threshold — the fixture's
    // per-source vocabularies sit far under it, so the estimate must
    // equal countDistinct exactly (at real scale the law relaxes to
    // the ~0.81% standard error)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sketch_acc")
      .resolve("store").toString
    Sketches.writeSketchStore(docs, tmp)
    val est = Sketches.estimateStore(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = docs.select(col("source"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("source").agg(countDistinct("w").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("batch-stamped append skips a replayed batch id exactly") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sketch_replay")
      .resolve("store").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    Sketches.writeSketchStore(base, tmp)
    assert(Sketches.lastAppliedBatch(fs, tmp) == -1L)
    assert(Sketches.appendBatchToSketchStore(tmp, batch, 0L))
    val once = Sketches.estimateStore(spark, tmp).collect().map(_.toString)
    // replayed id: skipped, store byte-for-byte equivalent (n_tokens
    // would double under a blind append)
    assert(!Sketches.appendBatchToSketchStore(tmp, batch, 0L))
    val twice = Sketches.estimateStore(spark, tmp).collect().map(_.toString)
    assert(once.sameElements(twice))
    assert(Sketches.lastAppliedBatch(fs, tmp) == 0L)
    // the next id applies
    assert(Sketches.appendBatchToSketchStore(tmp, batch, 1L))
    assert(Sketches.lastAppliedBatch(fs, tmp) == 1L)
  }

  test("quantile store: exact order statistics below sketch capacity") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll")
      .resolve("store").toString
    Sketches.writeQuantileStore(docs, tmp)
    val got = Sketches.quantileReport(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // inclusive-rank reference: smallest value with rank*n >= q*n
    val bysrc = docs.select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def q(xs: Seq[Double], p: Double): Double =
      xs(math.ceil(p * xs.size).toInt - 1)
    assert(got.keySet == bysrc.keySet && got.nonEmpty)
    bysrc.foreach { case (s, xs) =>
      assert(got(s) == ((xs.size.toLong,
        q(xs, 0.5), q(xs, 0.9), q(xs, 0.99))), s"source $s")
    }
  }

  test("quantile store: append equals a fresh build over the union") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll_app")
    val inc = tmp.resolve("inc").toString
    Sketches.writeQuantileStore(base, inc)
    Sketches.appendToQuantileStore(inc, batch)
    val fresh = tmp.resolve("fresh").toString
    Sketches.writeQuantileStore(docs, fresh)
    val a = Sketches.quantileReport(spark, inc).collect().map(_.toString)
    val b = Sketches.quantileReport(spark, fresh).collect().map(_.toString)
    assert(a.sameElements(b) && a.nonEmpty)
    // replayed batch id: skipped exactly (shared watermark mechanics)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(Sketches.appendBatchToQuantileStore(inc, batch, 5L))
    assert(!Sketches.appendBatchToQuantileStore(inc, batch, 5L))
    assert(Sketches.lastAppliedBatch(fs, inc) == 5L)
  }

  test("appending a new source adds it without touching existing rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sketch_new")
      .resolve("store").toString
    Sketches.writeSketchStore(docs, tmp)
    val before = Sketches.estimateStore(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val newSrc = Seq((1000L, "brand new tokens here", "en", "srcX", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Sketches.appendToSketchStore(tmp, newSrc)
    val after = Sketches.estimateStore(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(after(("srcX")) == ((4L, 4L)))
    before.foreach { case (s, v) => assert(after(s) == v) }
  }
}
