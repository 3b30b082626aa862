package graft

/** Ad-hoc single-entry timer: warm-up + measured run of named
  * `SparkEntry.queries` entries at a given SF dir, without paying for
  * the whole bench. Usage: runMain graft.TimeQuery <sfDir> <name…>
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1")
    sys.props("graft.cacheTables") = "true"
    val spark = Engine.session("graft-time-query", master = "local[32]")
    for (n <- names) {
      val q = SparkEntry.queries(n)
      q(spark, dir).count() // warm-up: codegen + table cache
      val t0 = System.nanoTime()
      val rows = q(spark, dir).count()
      println(f"[time] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
