package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Ctx, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator surface (SURVEY §2) to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries
  * the DuckDB-equivalent SQL for the driver's correctness gate. Column
  * names are aliased identically on both sides; all double aggregates
  * use the deterministic fixed-point convention in
  * [[graft.operators.Kernels]] so hashes match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1(Ctx(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-pipeline extension surface.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Tpch.queries ++ graft.queries.Extensions.queries).map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(Ctx(s, dir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (the
    * driver records a rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    Tpch.oracles ++ graft.queries.Extensions.oracles
}
