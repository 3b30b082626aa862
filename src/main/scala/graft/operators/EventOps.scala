package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Kernels.{davg, dsum}

/** Batch time-series operators over the `events` fixture table —
  * tumbling windows, sessionization, JSON field extraction, ranked
  * windows. The reference has no streaming/windowing surface (SURVEY
  * §2.10); these are the batch window-on-timestamp capabilities the
  * brief adds, and [[graft.streaming.EventStream]] mirrors the
  * tumbling aggregate on Structured Streaming.
  *
  * Timestamps are normalized to epoch microseconds (`unix_micros`)
  * wherever arithmetic/ordering feeds results, so integer math keeps
  * everything bit-deterministic against the oracle (the fixture's ns
  * timestamps truncate identically).
  */
object EventOps {

  /** Tumbling 1-hour windows per event type: count / exact sum / mean.
    * Pure hash aggregation — one shuffle on (hour, type) regardless of
    * scale; this is also what the streaming variant incrementalizes.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"))
      .orderBy("hour", "event_type")

  val tumblingHourlySql: String =
    s"""SELECT date_trunc('hour', ts) AS hour, event_type,
       |  COUNT(*) AS n,
       |  ${Kernels.dsumSql("value")} AS sum_value,
       |  ${Kernels.davgSql("value")} AS avg_value
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sessionization (gaps-and-islands): a session breaks after
    * `gapSeconds` of user inactivity. lag + cumulative sum over a
    * per-user window — one shuffle on user_id; session stats then
    * aggregate per (user, session). Per-user output:
    * sessions/events/avg events-per-session/max session span (µs).
    *
    * Window bound (r10 convention): partition = user_id; rows = one
    * user's events. This is the INHERENT sessionization shape (session
    * order is a per-user total order), so the residual skew is a
    * pathological bot user whose whole history lands on one task —
    * AQE cannot split a window partition. Production mitigation at
    * 100 TB: [[sessionizeCapped]] (real code — trailing-N cap via the
    * bounded heap, window rows ≤ maxEvents by construction), or shard
    * a bot's timeline by coarse time range and merge boundary sessions
    * in a second pass; the human-user population is safely bounded.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame =
    sessionizeFromEus(
      events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("eus")),
      gapSeconds * 1000000L)

  /** The lag + cumulative-sum session chain over an already-projected
    * (user_id, event_id, eus) frame — shared by [[sessionize]] and
    * [[sessionizeCapped]].
    */
  private def sessionizeFromEus(e: DataFrame, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("eus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = e
      .withColumn("prev_eus", lag("eus", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_eus").isNull ||
          col("eus") - col("prev_eus") > gapMicros, 1).otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(cum))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"),
        (max("eus") - min("eus")).as("span_us"))
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        (sum("n_events") / count(lit(1))).as("avg_events_per_session"),
        max("span_us").as("max_session_us"))
      .orderBy("user_id")
  }

  /** [[sessionize]] with the per-user history CAPPED to the trailing
    * `maxEvents` events — the production bot-user mitigation the
    * sessionize window-bound note prescribes, as real code: the cap
    * rides the exact [[graft.functions.BottomKByKey]] heap on the
    * (−eus, −event_id) key (map-side partials carry ≤maxEvents rows
    * per (user, partition)), so a pathological bot's full history
    * never reaches the per-user session window — the residual window
    * sorts ≤maxEvents rows per user BY CONSTRUCTION, turning the
    * inherent-shape skew into a hard bound. Trailing (largest
    * (eus, event_id)) keeps the freshest behavior, the slice
    * session-stats consumers want when a key must be truncated.
    */
  def sessionizeCapped(events: DataFrame, gapSeconds: Long = 1800,
      maxEvents: Int = 64): DataFrame = {
    import graft.functions.BottomKByKey.bottom_k_by_key
    val capped = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("eus"))
      .groupBy("user_id")
      .agg(bottom_k_by_key(struct((-col("eus")).as("key"),
        (-col("event_id")).as("id"), col("eus").as("payload")), maxEvents)
        .as("keep"))
      .select(col("user_id"), explode(col("keep")).as("k"))
      .select(col("user_id"), (-col("k.id")).as("event_id"),
        col("k.payload").as("eus"))
    sessionizeFromEus(capped, gapSeconds * 1000000L)
  }

  /** DuckDB oracle for [[sessionizeCapped]] — the trailing-cap CTE
    * (ROW_NUMBER over (eus, event_id) DESC — fine in the oracle, the
    * engine side is the bounded heap) feeding the shared session
    * chain.
    */
  def sessionizeCappedSql(gapSeconds: Long = 1800,
      maxEvents: Int = 64): String = {
    val gapMicros = gapSeconds * 1000000L
    s"""WITH e0 AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS eus FROM events),
       |e AS (
       |  SELECT user_id, event_id, eus FROM (
       |    SELECT user_id, event_id, eus,
       |      ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY eus DESC, event_id DESC) AS rk
       |    FROM e0) t WHERE rk <= $maxEvents),
       |flagged AS (
       |  SELECT user_id, event_id, eus,
       |    CASE WHEN lag(eus) OVER (PARTITION BY user_id ORDER BY eus, event_id)
       |              IS NULL
       |           OR eus - lag(eus) OVER (PARTITION BY user_id ORDER BY eus, event_id)
       |              > $gapMicros
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM e),
       |sessioned AS (
       |  SELECT user_id, eus,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY eus, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM flagged),
       |sessions AS (
       |  SELECT user_id, sess_id, COUNT(*) AS n_events,
       |    MAX(eus) - MIN(eus) AS span_us
       |  FROM sessioned GROUP BY 1, 2)
       |SELECT user_id, COUNT(*) AS n_sessions,
       |  CAST(SUM(n_events) AS BIGINT) AS n_events,
       |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events_per_session,
       |  MAX(span_us) AS max_session_us
       |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Sessionization via Spark's NATIVE `session_window` operator
    * (gap-merged event-time sessions; also valid under Structured
    * Streaming with a watermark — the lag+cumsum form above is the
    * portable/oracle-checkable twin). Returns per-user session rows.
    */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))
      .orderBy("user_id", "sess_start")

  def sessionizeSql(gapSeconds: Long = 1800): String = {
    val gapMicros = gapSeconds * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS eus FROM events),
       |flagged AS (
       |  SELECT user_id, event_id, eus,
       |    CASE WHEN lag(eus) OVER (PARTITION BY user_id ORDER BY eus, event_id)
       |              IS NULL
       |           OR eus - lag(eus) OVER (PARTITION BY user_id ORDER BY eus, event_id)
       |              > $gapMicros
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM e),
       |sessioned AS (
       |  SELECT user_id, eus,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY eus, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM flagged),
       |sessions AS (
       |  SELECT user_id, sess_id, COUNT(*) AS n_events,
       |    MAX(eus) - MIN(eus) AS span_us
       |  FROM sessioned GROUP BY 1, 2)
       |SELECT user_id, COUNT(*) AS n_sessions,
       |  CAST(SUM(n_events) AS BIGINT) AS n_events,
       |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events_per_session,
       |  MAX(span_us) AS max_session_us
       |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** JSON-ish property extraction (`props` carries `{"k": <int>}`):
    * regex-based field pull (portable across engines; at scale prefer
    * `get_json_object`/`from_json` with a schema), aggregated per
    * event type.
    */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      // try_cast: a props value with no digits extracts "" and an ANSI
      // cast would fail the whole query — malformed rows become null
      // and fall out of min/max/avg, same as the oracle's TRY_CAST
      .withColumn("k",
        regexp_extract(col("props"), "([0-9]+)", 1).try_cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"),
        (sum("k") / count("k")).as("avg_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  MIN(k) AS min_k, MAX(k) AS max_k,
      |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
      |FROM (SELECT event_type,
      |        TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sliding 2-hour/1-hour-step windows per event type — Spark's
    * native `window()` expression (each event lands in size/step
    * windows; epoch-aligned starts). The oracle expands the same
    * assignment as a UNION ALL of shifted hour-truncations.
    */
  def slidingTwoHour(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val slidingTwoHourSql: String =
    s"""SELECT win_start, event_type, COUNT(*) AS n,
       |  ${Kernels.dsumSql("value")} AS sum_value
       |FROM (
       |  SELECT date_trunc('hour', ts) AS win_start, event_type, value
       |  FROM events
       |  UNION ALL
       |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value
       |  FROM events) t
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Ranked windows: top-3 revenue days per event type —
    * `row_number` over a per-type window on exact daily sums.
    * Window bound: partition = event_type over the PRE-AGGREGATED
    * daily frame — rows per partition = distinct days
    * (calendar-bounded, ~365/year), never event-volume-scaled.
    */
  def topDays(events: DataFrame, k: Int = 3): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(dsum(col("value")).as("day_value"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("day_value").desc, col("day"))
    daily.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy("event_type", "rk")
  }

  def topDaysSql(k: Int = 3): String =
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    ${Kernels.dsumSql("value")} AS day_value
       |  FROM events GROUP BY 1, 2),
       |ranked AS (
       |  SELECT event_type, day, day_value,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY day_value DESC, day) AS rk
       |  FROM daily)
       |SELECT event_type, day, day_value, rk FROM ranked WHERE rk <= $k
       |ORDER BY event_type, rk""".stripMargin
}
