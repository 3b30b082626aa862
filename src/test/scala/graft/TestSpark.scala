package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test
  * JVM; suites reuse the session via getOrCreate).
  *
  * `local[4,3]` = 4 threads, task maxFailures 3: local mode ignores
  * `spark.task.maxFailures`, the retry count rides in the master
  * string. Every suite therefore runs under retry-enabled scheduling
  * — the environment `RetryDeterminismSpec` needs to prove results
  * are bit-identical when tasks fail and re-attempt (suites that
  * assert job failure still pass: a deterministic throw exhausts all
  * attempts with the same exception).
  */
object TestSpark {
  lazy val spark: SparkSession =
    Engine.session("graft-test", master = "local[4,3]", shufflePartitions = 4)
}
