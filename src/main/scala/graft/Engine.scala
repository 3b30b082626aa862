package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (`/root/reference/`, a dask/distributed fork) boots a
  * scheduler + N workers and connects a `Client`
  * (`benchmark/test_tpch.py:75-101`). In Spark all of that is the
  * `SparkSession`: driver = scheduler, executors = workers, Catalyst +
  * DAGScheduler subsume dask's graph optimizer and `decide_worker`
  * placement (SURVEY.md §3-4).
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting, shuffle
  * coalescing), shuffle partitions sized for the local[32] test rig —
  * on a real cluster this is a deploy-time knob, the query code never
  * hard-codes partition counts.
  */
object Engine {

  def session(
      appName: String = "graft",
      master: String = sys.env.getOrElse("GRAFT_MASTER", "local[*]"),
      shufflePartitions: Int =
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32").toInt
  ): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime row-level join pruning: bloom filters built from the
      // selective side prune the probe-side scan (a big win for the
      // dimension-filtered fact joins at 100 TB)
      // NOTE: the runtime-filter size caps stay at their defaults
      // (4M items / 67M bits) — deliberately small for the planner's
      // auto-injected filters. The explicit BloomGate ingest gates
      // need far bigger filters (up to 1e9 keys / 1 GiB for a store
      // sidecar) and raise the caps SCOPED to their own build job
      // (BloomGate.withScopedCaps), so a misestimated plan can never
      // materialize a gigabyte-scale injected filter session-wide.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the events fixture carries TIMESTAMP(NANOS) parquet, which
      // Spark 4 rejects by default; read as long and normalize in Ctx
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
