package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.queries.Ctx
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  // the file-stream source wants a directory; stage the single-file
  // fixture into one
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling counts match the batch operator") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.runToMemory(
      EventStream.tumblingCounts(stream), "tumbling_test")
    try {
      val streamed = spark.table("tumbling_test")
        .select("hour", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = EventOps.tumblingHourly(Ctx(spark, sfDir).events)
        .select(col("hour"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static join enriches events with a dimension") {
    import spark.implicits._
    val dim = Ctx(spark, sfDir).events.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("user_total"))
    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.runToMemory(
      EventStream.enrich(stream, dim, "user_id")
        .groupBy("user_total").count(),
      "enrich_test")
    try {
      val joined = spark.table("enrich_test")
        .agg(org.apache.spark.sql.functions.sum("count")).head.getLong(0)
      assert(joined == Ctx(spark, sfDir).events.count())
    } finally q.stop()
  }

  test("streaming dedup keeps one row per key within the watermark") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val dd = EventStream.dedupStream(stream, Seq("event_id"))
    val q = EventStream.runToMemory(dd, "dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.table("dedup_test").count()
      val batch = Ctx(spark, sfDir).events.dropDuplicates("event_id", "ts").count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("foreachBatch sink lands the stream as parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val stream = EventStream.readEvents(spark, eventsDir)
      .select("event_id", "ts", "event_type", "value")
    val q = EventStream.runToParquet(stream, s"$out/events", ckpt)
    try {
      val landed = spark.read.parquet(s"$out/events").count()
      assert(landed == Ctx(spark, sfDir).events.count())
    } finally q.stop()
  }

  test("stateful sessionization closes all but the open session per user") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val sess = EventStream.sessionizeStream(spark, stream)
    val q = EventStream.runToMemory(sess, "sessions_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val closed = spark.table("sessions_test").count()
      val batch = EventOps.sessionize(Ctx(spark, sfDir).events)
        .agg(sum("n_sessions"), count(lit(1))).head
      val totalSessions = batch.getLong(0)
      val users = batch.getLong(1)
      // gap-closed sessions all emit; open sessions emit only if the
      // event-time timeout (watermark > last + gap) fired before the
      // stream ended — per-user last sessions near the global max ts
      // stay in state
      assert(closed >= totalSessions - users && closed <= totalSessions,
        s"closed=$closed total=$totalSessions users=$users")
    } finally q.stop()
  }

  test("stream-stream range join matches the batch banded range join") {
    val errors = EventStream.readEvents(spark, eventsDir)
      .filter(col("event_type") === "error")
    val clicks = EventStream.readEvents(spark, eventsDir)
      .filter(col("event_type") === "click")
    val q = EventStream.runToMemory(
      EventStream.rangeJoinStream(errors, clicks, "user_id",
        window = "4 hours"),
      "range_join_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.table("range_join_test")
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = Ctx(spark, sfDir).events
      val e = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("l_id"),
          unix_micros(col("ts")).as("l_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("r_id"),
          unix_micros(col("ts")).as("r_us"))
      val batch = graft.operators.RangeOps
        .rangeJoin(e, c, Seq("user_id"), "l_us", "r_us",
          0L, 4L * 3600L * 1000000L)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
