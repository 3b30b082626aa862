package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Kernels._

/** Scale-robustness probe: amplifies the sf0.1 fixtures in-memory
  * (unionAll with shifted keys — no files written) and times the
  * heaviest query shapes, to catch super-linear behavior before it
  * shows up on a real cluster. Usage: runMain graft.ScaleProbe [mult]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(16)
    val spark = Engine.session("graft-scale-probe", master = "local[32]")
    val dir = "/root/testdata/sf0.1"
    val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
    val or0 = spark.read.parquet(s"$dir/orders.parquet")
    def amplify(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until mult).map { i =>
        keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * 100000000L)))
      }.reduce(_ unionAll _)
    val li = amplify(li0, Seq("l_orderkey")).cache()
    val or = amplify(or0, Seq("o_orderkey")).cache()
    println(s"rows: lineitem=${li.count()} orders=${or.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("q1-shape") {
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")), dsum(col("l_extendedprice")),
          count(lit(1))).count()
    }
    time("join-agg") {
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .count()
    }
    time("topk") {
      topK(li.groupBy("l_orderkey").agg(dsum(col("l_quantity")).as("s")),
        10, col("s").desc, col("l_orderkey")).count()
    }
    time("semi-anti") {
      val l1 = li.select(col("l_orderkey").as("k1"), col("l_suppkey").as("s1"),
        col("l_shipdate").as("d1"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      l1.join(l2, col("k2") === col("k1") && col("s2") =!= col("s1"),
        "left_semi").groupBy("s1").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
