package graft

import org.apache.spark.sql.SparkSession
import graft.queries.TpchFull

/** Benchmark of the ORIGINAL full-column TPC-H surface
  * ([[graft.queries.TpchFull]]) over dbgen-format `.tbl` input — the
  * closest apples-to-apples number to the reference's actual harness,
  * which ran dbgen `.tbl` at ~2 GB
  * (`/root/reference/benchmark/test_tpch.py:26-35,69-72`). Tables are
  * read from `.tbl` and persisted before timing (the reference's
  * `client.persist`, `test_tpch.py:114-115`), then each of the 22
  * queries gets a warm-up pass, a GC settle, and one measured pass —
  * the [[Bench]] methodology.
  *
  * Usage: runMain graft.BenchDbgen [tblDir] [scale]
  * Generates the deterministic [[graft.sources.DbgenGen]] fixture into
  * `tblDir` if it's missing (scale 1000 ≈ 6M lineitem rows, the
  * reference's dbgen-SF1 row count).
  */
object BenchDbgen {
  def main(args: Array[String]): Unit = {
    val tblDir = args.headOption.getOrElse("/tmp/graft_dbgen_bench")
    val scale = if (args.length > 1) args(1).toInt else 1000
    if (!new java.io.File(s"$tblDir/lineitem.tbl").exists()) {
      println(s"generating dbgen fixture at $tblDir (scale $scale)…")
      graft.sources.DbgenGen.write(tblDir, scale)
    }
    sys.props("graft.cacheTables") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions sized to data (≈1 per ~250k lineitem rows,
    // min cpus): a fixed 32 means ~1M wide rows per partition at
    // scale 5000 — sort/spill territory; AQE coalesces the excess
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(cpus.toInt, scale * 6000 / 250000).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = TpchFull.DbgenCtx(spark, tblDir)
    // prime + persist all tables, untimed
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "partsupp", "nation", "region"))
      ctx.t(t).count()
    val names = TpchFull.queries.keys.toSeq
      .sortBy(n => n.drop(1).toInt)
    for (n <- names)
      try TpchFull.queries(n)(ctx).count()
      catch { case _: Throwable => () }
    System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
    val errors = scala.collection.mutable.ListBuffer[String]()
    val results = names.map { n =>
      val t0 = System.nanoTime()
      try { TpchFull.queries(n)(ctx).count(); n -> (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        errors += s"$n: ${e.getClass.getSimpleName}"; n -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"dbgen_total","value":$total,"unit":"sec","queries":$qs,"errors":[${errors.map("\"" + _ + "\"").mkString(",")}],"scale":$scale}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DBGEN.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    results.foreach { case (n, v) => println(f"$n%-4s ${v}%8.3f s") }
    spark.stop()
  }
}
