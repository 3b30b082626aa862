package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has NO streaming query
  * engine (SURVEY §2.10 — its pub/sub/queues are engine plumbing, not
  * data-plane operators); this module adds the streaming capabilities
  * a training-data pipeline needs, as incremental versions of the
  * batch operators in [[graft.operators.EventOps]]:
  *
  *  - tumbling event-time window aggregation with a watermark
  *    (late-data bound) — the streaming twin of
  *    `EventOps.tumblingHourly`;
  *  - stateful sessionization via `flatMapGroupsWithState` — the
  *    streaming twin of `EventOps.sessionize`.
  *
  * At scale this is the standard Spark story: state lives in the state
  * store keyed by group, partitioned by the shuffle; nothing here is
  * driver-side.
  */
object EventStream {

  /** events fixture schema, ts as long nanos (see Ctx.events). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour event-time windows per event type with a
    * 10-minute watermark.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a streaming aggregate to a named memory sink until the input
    * is exhausted (batch-driving a stream for tests/demos).
    */
  def runToMemory(agg: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Durable streaming sink via foreachBatch: each micro-batch lands
    * as parquet (append), the standard incremental-ingest shape (the
    * batch side of the pipeline then reads the same directory). Use
    * `Trigger.AvailableNow` for catch-up runs.
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Stream-static join: enrich the event stream with a static
    * dimension (broadcast per micro-batch — the standard Spark
    * pattern; the static side may be a slowly-refreshed table).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream-stream range join — the incremental twin of
    * `operators/RangeOps.rangeJoin`: pair each left event with right
    * events of the same key whose time falls in (lT, lT + window].
    * Spark's stream-stream join keeps both sides in the state store;
    * the watermarks plus the time-range predicate bound how long each
    * row is retained (a right row can only match lefts at most
    * `window` older, so state is evicted once the watermark passes) —
    * the same band-bounding idea as the batch bucket join, expressed
    * as state TTL instead of bucket replication.
    */
  def rangeJoinStream(left: DataFrame, right: DataFrame, key: String,
      window: String = "10 minutes", lateness: String = "10 minutes"): DataFrame = {
    val l = left.select(col(key), col("event_id").as("l_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col(key).as("r_key"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", lateness)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .select(col(key), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Streaming exact dedup — the training-pipeline dedup operator in
    * its incremental form: state = fingerprints seen within the
    * watermark horizon; `dropDuplicates` keyed on the content
    * fingerprint. (Batch twin: `operators/Dedup.exact/fingerprint`.)
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates(keyCols :+ "ts")

  // ts stays in the row so the watermarked column survives to the
  // flatMapGroupsWithState child (required for event-time timeout)
  final case class SessionEvent(user_id: Long, eus: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, n_events: Long, span_us: Long)

  /** Stateful sessionization: per-user state carries the open
    * session; a gap > `gapMicros` closes it, and an event-time
    * TIMEOUT (watermark passing last-event + gap) flushes idle open
    * sessions in a live stream — so state is bounded and every session
    * is eventually emitted. Mirrors `EventOps.sessionize` semantics
    * for ordered per-user input.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapMicros: Long = 1800L * 1000000L): DataFrame = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), unix_micros(col("ts")).as("eus"), col("ts"))
      .as[SessionEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: the open
            // session can never be extended — emit and clear
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.n, st.last - st.start))
          } else {
            val sorted = rows.map(_.eus).toSeq.sorted
            var out = List.empty[SessionOut]
            var st = state.getOption.orNull
            for (t <- sorted) {
              if (st == null) st = SessionState(t, t, 1)
              else if (t - st.last > gapMicros) {
                out = SessionOut(user, st.n, st.last - st.start) :: out
                st = SessionState(t, t, 1)
              } else st = SessionState(st.start, t, st.n + 1)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp((st.last + gapMicros) / 1000L)
            }
            out.reverseIterator
          }
        })
      .toDF()
  }
}
