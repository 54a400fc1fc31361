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

  test("intervalJoin equals the naive range join, honors boundaries, and plans no BNLJ") {
    import org.apache.spark.sql.functions.{col, date_trunc, expr}
    val events = Seq(
      // two window-defining purchases: w10 [Jan 10 09:00:01, Jan 12 09:00:01),
      // w11 [Jan 11 00:00:00, Jan 13 00:00:00) — overlapping, sub-second start truncated
      (10L, 1L, ts("2026-01-10 09:00:01.750"), "purchase", 500.0),
      (11L, 2L, ts("2026-01-11 00:00:00"), "purchase", 460.0),
      (1L, 1L, ts("2026-01-10 09:00:01"), "t", 1.0),   // exactly at truncated w10 start -> in
      (2L, 1L, ts("2026-01-12 09:00:00"), "t", 1.0),   // just inside w10 end, inside w11
      (3L, 1L, ts("2026-01-12 09:00:01"), "t", 1.0),   // exactly at w10 end -> out of w10, in w11
      (4L, 2L, ts("2026-02-01 12:00:00"), "t", 1.0),   // no window
      (5L, 2L, ts("2026-01-11 08:00:00"), "t", 300.0), // inside both (not a purchase -> no window)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")

    val df = Events.intervalJoin(events)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucketized join must not plan a nested loop")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SAME threshold as the operator's default — a divergent baseline
    // predicate would make the parity assert only coincidentally true
    val windows = events.filter(col("event_type") === "purchase" && col("value") > 250.0)
      .select(col("event_id").as("win_id"), date_trunc("second", col("ts")).as("ws"))
    val naive = events.join(windows,
        col("ts") >= col("ws") && col("ts") < col("ws") + expr("INTERVAL 2 DAYS"))
      .select(col("event_id"), col("win_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 10L), (2L, 10L), (5L, 10L), (10L, 10L),
      (2L, 11L), (3L, 11L), (5L, 11L), (11L, 11L), (11L, 10L)))
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
