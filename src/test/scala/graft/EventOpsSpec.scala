package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // user 1: two sessions (gap 2h); user 2: one session
  private def events = Seq(
    (1L, 1L, "2024-01-01 10:00:00", "click", 1.0, "{\"k\": 3}"),
    (2L, 1L, "2024-01-01 10:10:00", "view", 2.0, "{\"k\": 5}"),
    (3L, 1L, "2024-01-01 12:30:00", "click", 3.0, "{\"k\": 7}"),
    (4L, 2L, "2024-01-01 09:59:59", "view", 4.0, "{\"k\": 11}")
  ).toDF("event_id", "user_id", "ts_s", "event_type", "value", "props")
    .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")

  test("sessionize splits on the inactivity gap") {
    val out = EventOps.sessionize(events, gapSeconds = 1800).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // (user, n_sessions, n_events)
    assert(out == List((1L, 2L, 3L), (2L, 1L, 1L)))
  }

  test("native session_window agrees with the gaps-and-islands form") {
    val native = EventOps.sessionizeNative(events, "30 minutes")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val lagBased = EventOps.sessionize(events, gapSeconds = 1800).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(native == lagBased)
  }

  test("sessionizeCapped keeps the trailing window; small users unchanged") {
    // user 9 is the bot: 10 events in two sessions (6 old + 4 recent,
    // 2h apart). maxEvents=4 keeps only the trailing 4 → ONE session
    // of 4 events; user 2 (1 event, under the cap) is identical to the
    // uncapped form
    val bot = (0 until 10).map { i =>
      val ts = if (i < 6) f"2024-01-01 08:0$i:00" else s"2024-01-01 11:0${i - 6}:00"
      (100L + i, 9L, ts, "click", 1.0, "{\"k\": 1}")
    }
    val all = (Seq(
      (4L, 2L, "2024-01-01 09:59:59", "view", 4.0, "{\"k\": 11}")) ++ bot)
      .toDF("event_id", "user_id", "ts_s", "event_type", "value", "props")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val capped = EventOps.sessionizeCapped(all, gapSeconds = 1800,
      maxEvents = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(capped(9L) == ((1L, 4L))) // only the trailing session remains
    val uncapped = EventOps.sessionize(all, gapSeconds = 1800).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(uncapped(9L) == ((2L, 10L)))
    assert(capped(2L) == uncapped(2L)) // under-cap users identical
    // layout-independent
    val again = EventOps.sessionizeCapped(all.repartition(7),
      gapSeconds = 1800, maxEvents = 4).collect().map(_.toString)
    assert(again.sameElements(EventOps.sessionizeCapped(all,
      gapSeconds = 1800, maxEvents = 4).collect().map(_.toString)))
  }

  test("tumblingHourly groups by hour and type") {
    val out = EventOps.tumblingHourly(events).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(out.contains(("2024-01-01 09:00:00.0", "view", 1L)))
    assert(out.contains(("2024-01-01 10:00:00.0", "click", 1L)))
  }

  test("jsonExtract pulls the k property") {
    val out = EventOps.jsonExtract(events).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toList
    assert(out == List(("click", 3L, 7L), ("view", 5L, 11L)))
  }

  test("topDays ranks by exact daily sums") {
    val out = EventOps.topDays(events, k = 1).collect()
    assert(out.length == 2) // one top day per type
    assert(out.forall(_.getInt(3) == 1))
  }
}
