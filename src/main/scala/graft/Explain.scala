package graft

/** Plan inspector: prints `explain("formatted")` for the named queries
  * (or a default set) against a scale dir — the per-round check that
  * filters reach the parquet scan (`PushedFilters`), projections prune
  * (`ReadSchema`), small dims broadcast, and top-k plans as
  * `TakeOrderedAndProject`.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1", "q3", "q5", "q6", "q21")
    val spark = Engine.session("graft-explain")
    val qs = SparkEntry.queries
    for (n <- names; fn <- qs.get(n)) {
      println(s"\n===================== $n =====================")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
