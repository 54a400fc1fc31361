package graft

import java.sql.Timestamp

import graft.operators.FinAnalytics

class FinAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: closes 10, 20, 30 on consecutive days (two ticks on day 1
  // — close must pick the later one); user 2: constant 50.
  private lazy val events = Seq(
    (1L, 1L, ts("2026-01-01 09:00:00"), "t", 5.0),
    (2L, 1L, ts("2026-01-01 16:00:00"), "t", 10.0),
    (3L, 1L, ts("2026-01-02 16:00:00"), "t", 20.0),
    (4L, 1L, ts("2026-01-03 16:00:00"), "t", 30.0),
    (5L, 2L, ts("2026-01-01 12:00:00"), "t", 50.0),
    (6L, 2L, ts("2026-01-02 12:00:00"), "t", 50.0),
    (7L, 2L, ts("2026-01-03 12:00:00"), "t", 50.0),
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("dailyOhlc picks open/close by time order, high/low by value") {
    val d1 = FinAnalytics.dailyOhlc(events).collect()
      .find(r => r.getLong(0) == 1L && r.getDate(1).toString == "2026-01-01").get
    assert(d1.getDouble(2) === 5.0)  // open
    assert(d1.getDouble(3) === 10.0) // high
    assert(d1.getDouble(4) === 5.0)  // low
    assert(d1.getDouble(5) === 10.0) // close
    assert(d1.getLong(6) === 2L)     // n_ticks
  }

  test("movingAvg is the trailing mean of daily closes") {
    val rows = FinAnalytics.movingAvg(events).collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getDate(1).toString, r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("2026-01-01", 10.0), ("2026-01-02", 15.0), ("2026-01-03", 20.0)))
  }

  test("returns are close/prev - 1 on the daily close series") {
    val rows = FinAnalytics.returns(events).collect()
      .filter(_.getLong(0) == 1L).map(_.getDouble(3))
    assert(rows.toSeq === Seq(1.0, 0.5)) // 20/10-1, 30/20-1
  }

  test("rollingHiLo tracks the trailing-window extrema") {
    val rows = FinAnalytics.rollingHiLo(events, bars = 2).collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq === Seq((10.0, 10.0), (20.0, 10.0), (30.0, 20.0)))
  }

  test("beta of a constant-price instrument is 0") {
    val rows = FinAnalytics.beta(events).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rows(2L) === 0.0)
    // user 1 moves with (and dominates) the market -> positive beta
    assert(rows(1L) > 0.0)
  }
}
