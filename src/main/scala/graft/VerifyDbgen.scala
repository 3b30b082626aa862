package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.queries.TpchFull

/** Correctness dump for the ORIGINAL full-column TPC-H surface over
  * dbgen `.tbl` input (`queries/TpchFull`) — same contract as
  * [[Verify]]: per-query parquet + oracle_sql.json, compared by
  * `tools/selfcheck_dbgen.py` against DuckDB reading the same `.tbl`
  * files.
  *
  * Usage: runMain graft.VerifyDbgen <tblDir> <outDir>
  * (generate a fixture first: runMain graft.sources.DbgenGen <tblDir>)
  */
object VerifyDbgen {
  def main(args: Array[String]): Unit = {
    val Array(tblDir, outDir) = args
    val spark = Engine.session("graft-verify-dbgen")
    new java.io.File(outDir).mkdirs()
    val ctx = TpchFull.DbgenCtx(spark, tblDir)
    TpchFull.queries.foreach { case (name, fn) =>
      try fn(ctx).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-dbgen] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = TpchFull.oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
