package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test
  * JVM; suites reuse the session via getOrCreate).
  */
object TestSpark {
  lazy val spark: SparkSession =
    Engine.session("graft-test", master = "local[4]", shufflePartitions = 4)
}
