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
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the explicit Bloom ingest gates (functions/BloomGate) build
      // their filters through the same BloomFilterAggregate, which
      // enforces these caps; the runtime-filter defaults (4M items /
      // 67M bits) are sized for transient per-query filters, not a
      // persisted store sidecar — allow up to 1e9 keys / 1 GiB per
      // filter (past that, shard per band; BloomGate.geometry clamps)
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        "1000000000")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        "8589934592")
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
