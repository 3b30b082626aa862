package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Kernels
import graft.sources.Bucketing

class ScaleToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join plans without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "b_left", "k", 4, Some(dir))
    Bucketing.writeBucketed(right, "b_right", "k", 4, Some(dir))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_left", "b_right", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("partitionBy layout prunes partitions on filtered reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1 to 300).map(i => (i, Seq("a", "b", "c")(i % 3), i * 1.5))
      .toDF("id", "bucket", "v")
    graft.sources.PartitionedSink.writePartitioned(df, dir, Seq("bucket"))
    val filtered = graft.sources.PartitionedSink.read(spark, dir)
      .filter($"bucket" === "a")
    assert(filtered.count() == 100)
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("bucket"), plan)
  }

  test("range-partitioned sorted write round-trips ordered data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val df = (1 to 1000).reverse.map(i => (i.toLong, s"r$i")).toDF("k", "v")
    graft.sources.PartitionedSink.writeSorted(df, dir, "k", numPartitions = 4)
    val back = graft.sources.PartitionedSink.read(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.min("k")).head.getLong(0) == 1L)
  }

  test("saltedDsum is bit-identical to plain dsum") {
    val df = (1 to 5000).map(i => (i % 3, (i % 997) / 100.0)).toDF("k", "v")
    val plain = df.groupBy("k").agg(Kernels.dsum($"v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val salted = Kernels.saltedDsum(df, Seq("k"), $"v", "s", saltFactor = 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(plain == salted)
  }

  test("custom expressions are registered in the SQL surface") {
    val got = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS FLOAT), cast(0.0 AS FLOAT)),
        |                  array(cast(1.0 AS FLOAT), cast(0.0 AS FLOAT))) AS c
      """.stripMargin).head.getDouble(0)
    assert(got == 1.0)
    val sig = spark.sql(
      "SELECT minhash_signature(s, 4) FROM VALUES ('aa'), ('bb') AS t(s)")
      .head.getSeq[Long](0)
    assert(sig.length == 4)
  }

  test("saltedJoin matches the plain join result on a skewed key") {
    // 90% of big rows share one key — the classic skew shape
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, i)).toDF("k", "v")
    val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k").agg(count(lit(1)), sum("v")).head
    val salted = Kernels.saltedJoin(big, small, Seq("k"), saltFactor = 4)
      .agg(count(lit(1)), sum("v")).head
    assert(plain == salted)
    assert(Kernels.saltedJoin(big, small, Seq("k")).columns.count(_ == "k") == 1)
  }

  test("ensure* helpers refuse an EMPTY input frame loudly (r16 " +
    "repo-wide audit of the null-fingerprint NPE class)") {
    import spark.implicits._
    val docs = Seq((1L, "some text", "web", "en", 9L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .filter("doc_id < 0") // empty, full schema
    val emb = Seq((1L, Array(0.1f), 0L))
      .toDF("vec_id", "embedding", "label")
      .filter("vec_id < 0")
    def refused(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("empty input frame"), e.getMessage)
    }
    refused(graft.operators.Dedup.ensureSignatureStore(docs, "emptyspec"))
    refused(graft.operators.Dedup.ensureClusterMap(docs, "emptyspec"))
    refused(graft.operators.IngestLoop.ensureIngestLoop(docs, "emptyspec"))
    refused(graft.operators.Sketches.ensureSketchStore(docs, "emptyspec"))
    refused(graft.operators.Profiling.ensureProfileStore(docs, "emptyspec"))
    refused(graft.operators.QualitySignals.ensureLmStore(docs, "emptyspec"))
    refused(graft.operators.Similarity.ensureSemanticStore(emb, "emptyspec"))
    refused(graft.sources.TrainingExport.ensureExport(docs, "emptyspec"))
  }

  test("contentFp refuses a NON-empty frame whose id column is all " +
    "NULL (r17 ADVICE: max() is NULL there — same opaque-NPE class " +
    "as the empty frame)") {
    import spark.implicits._
    val docs = Seq((1L, "some text"), (2L, "more text"))
      .toDF("doc_id0", "text")
      .selectExpr("CAST(NULL AS BIGINT) AS doc_id", "text")
    val e = intercept[IllegalArgumentException](
      graft.operators.StoreSwap.contentFp(docs, "nullspec", "doc_id",
        Seq("doc_id", "text")))
    assert(e.getMessage.contains("nullspec") &&
      e.getMessage.contains("NULL"), e.getMessage)
    // and the happy path round-trips the triple into the tag format
    val ok = graft.operators.StoreSwap.contentFp(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"),
      "nullspec", "doc_id", Seq("doc_id", "text"))
    assert(ok.n == 2L && ok.maxId == 2L &&
      ok.tag == s"2_2_${java.lang.Long.toHexString(ok.hash)}")
  }
}
