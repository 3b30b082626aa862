package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Batch SQL runner for the differential fuzz harness
  * (`tools/fuzz_gen.py` → this → `tools/selfcheck.py`): executes each
  * generated query through the SAME session configuration the driver
  * gate uses (GraftExtensions, UTC, nanos normalization, AQE) and
  * dumps one parquet directory per query, so the existing selfcheck
  * compare (columns sorted, rows sorted, values exact) adjudicates
  * Spark-vs-DuckDB agreement on queries nobody hand-picked.
  *
  * Input: `<outDir>/queries.tsv` — one `name<TAB>sql` per line (the
  * generator guarantees no tabs/newlines inside the SQL). The
  * generator also writes `<outDir>/oracle_sql.json` with the same
  * statements, which is what selfcheck.py consumes.
  *
  * Usage: runMain graft.SqlBatch <sfDir> <outDir>
  */
object SqlBatch {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    // events goes through the same nanos/NTZ normalization the curated
    // entries use (Ctx.events) — DuckDB's read of the same parquet
    // truncates ns→µs identically, so fuzzed timestamp comparisons and
    // min/max agree exactly
    graft.queries.Ctx(spark, sfDir).events.createOrReplaceTempView("events")
    // --nulls mode: the generator materializes null-injected fixture
    // derivatives under <outDir>/nullfix; register each as a view so
    // both engines read the SAME physical rows
    val nullfix = Paths.get(s"$outDir/nullfix")
    if (Files.isDirectory(nullfix))
      Files.list(nullfix).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach { p =>
          val name = p.getFileName.toString.stripSuffix(".parquet")
          spark.read.parquet(p.toString).createOrReplaceTempView(name)
        }
    var failed = 0
    for (line <- Files.readAllLines(
        Paths.get(s"$outDir/queries.tsv")).asScala if line.nonEmpty) {
      // destructure inside the try: a malformed line (missing tab)
      // counts as ONE failure instead of aborting the whole batch
      try {
        val Array(name, sql) = line.split("\t", 2)
        spark.sql(sql).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(
          s"[sqlbatch] ${line.takeWhile(_ != '\t')} failed: ${e.getMessage}")
      }
    }
    System.err.println(s"[sqlbatch] done, $failed failures")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
