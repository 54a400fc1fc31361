package graft

import java.sql.Timestamp

import graft.operators.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on >30-minute gaps per user") {
    val events = Seq(
      // user 1: two sessions (10:00-10:20, then 11:00)
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2026-01-01 10:20:00"), "view", 2.0),
      (3L, 1L, ts("2026-01-01 11:00:00"), "buy", 4.0),
      // user 2: one session, events out of order in the input
      (5L, 2L, ts("2026-01-01 09:30:00"), "view", 8.0),
      (4L, 2L, ts("2026-01-01 09:10:00"), "view", 16.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")

    val got = Events.sessionize(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1L, 1L, 2L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:20:00"), 3.0),
      (1L, 2L, 1L, ts("2026-01-01 11:00:00"), ts("2026-01-01 11:00:00"), 4.0),
      (2L, 1L, 2L, ts("2026-01-01 09:10:00"), ts("2026-01-01 09:30:00"), 24.0)))
  }

  test("hourlyRollup buckets by hour and event_type") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:05:00"), "view", 1.5),
      (2L, 2L, ts("2026-01-01 10:55:00"), "view", 2.5),
      (3L, 1L, ts("2026-01-01 10:30:00"), "buy", 10.0),
      (4L, 1L, ts("2026-01-01 11:01:00"), "view", 3.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")

    val got = Events.hourlyRollup(events).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (ts("2026-01-01 10:00:00"), "buy", 1L, 10.0, 1L),
      (ts("2026-01-01 10:00:00"), "view", 2L, 4.0, 2L),
      (ts("2026-01-01 11:00:00"), "view", 1L, 3.0, 1L)))
  }
}
