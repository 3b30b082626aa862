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
}
