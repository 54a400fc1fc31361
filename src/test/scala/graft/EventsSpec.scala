package graft

import java.sql.Timestamp

import graft.operators.Events
import org.apache.spark.sql.functions.{col, countDistinct}

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

  test("sessionQuantiles picks exact rank elements over session durations") {
    // five sessions with durations 0, 300, 600, 1200, 3000 s:
    // n=5 -> p50 = 3rd (600), p90 = ceil-rank 5th (3000), p99 = 5th
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 1.0), // u1 s1: 20 min
      (2L, 1L, ts("2026-01-01 10:20:00"), "view", 1.0),
      (3L, 1L, ts("2026-01-01 12:00:00"), "view", 1.0), // u1 s2: 0
      (4L, 2L, ts("2026-01-01 09:00:00"), "view", 1.0), // u2 s1: 50 min
      (5L, 2L, ts("2026-01-01 09:25:00"), "view", 1.0),
      (6L, 2L, ts("2026-01-01 09:50:00"), "view", 1.0),
      (7L, 3L, ts("2026-01-01 08:00:00"), "view", 1.0), // u3 s1: 5 min
      (8L, 3L, ts("2026-01-01 08:05:00"), "view", 1.0),
      (9L, 4L, ts("2026-01-01 07:00:00"), "view", 1.0), // u4 s1: 10 min
      (10L, 4L, ts("2026-01-01 07:10:00"), "view", 1.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.sessionQuantiles(events).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getString(0) === "session")
    assert(r.getLong(1) === 5L)
    assert(r.getDouble(2) === 600.0)  // p50
    assert(r.getDouble(3) === 3000.0) // p90
    assert(r.getDouble(4) === 3000.0) // p99
  }

  test("debounce chains <=300s same-type bursts and keeps the first event") {
    val events = Seq(
      // user 1 clicks: burst of three chained (<=300s consecutive
      // gaps even though first->last spans 390s), then a fresh burst
      (1L, 1L, ts("2026-01-01 10:00:00"), "click", 1.0),
      (2L, 1L, ts("2026-01-01 10:03:00"), "click", 1.0),
      (3L, 1L, ts("2026-01-01 10:06:30"), "click", 1.0),
      (4L, 1L, ts("2026-01-01 10:20:00"), "click", 1.0),
      // same user, different type inside the click burst: own burst
      (5L, 1L, ts("2026-01-01 10:01:00"), "view", 1.0),
      // other user untouched by user 1's bursts
      (6L, 2L, ts("2026-01-01 10:00:30"), "click", 1.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")

    val got = Events.debounce(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, "click", 1L, 1L, 2L), // keeper 1, suppressed 2 and 3
      (1L, "click", 2L, 4L, 0L),
      (1L, "view", 1L, 5L, 0L),
      (2L, "click", 1L, 6L, 0L)))
  }

  test("rollingActive equals the naive per-day trailing-window distinct") {
    val rng = new scala.util.Random(11)
    val events = (1 to 300).map { i =>
      val day = 1 + rng.nextInt(12)
      (i.toLong, 1L + rng.nextInt(9),
        ts(f"2026-01-$day%02d 0${rng.nextInt(10)}:00:00"), "view", 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")

    val got = Events.rollingActive(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))

    // naive: for every active day, scan all events in [d-6, d]
    val raw = events.collect().map(r => (r.getLong(1), r.getTimestamp(2).toLocalDateTime.toLocalDate))
    val days = raw.map(_._2).distinct.sorted(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val naive = days.map { d =>
      val dau = raw.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = raw.filter(e => !e._2.isAfter(d) && !e._2.isBefore(d.minusDays(6)))
        .map(_._1).distinct.length.toLong
      (d.toString, dau, wau,
        BigDecimal(dau.toDouble / wau).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.toSeq === naive.toSeq)
    assert(got.exists { case (_, dau, wau, _) => wau > dau }, "windows must actually accumulate")
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

  test("approxUsers HLL estimate lands within the rsd bound of the exact distinct") {
    val events = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val approx = Events.approxUsers(events).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (t, a) =>
      val e = exact(t).toDouble
      // rsd = 1%; allow 5 sigma
      assert(math.abs(a - e) / e <= 0.05, s"$t: approx $a vs exact $e")
    }
  }

  test("rollupTypeDay emits detail, per-type, and grand-total levels that reconcile") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 1.5),
      (2L, 1L, ts("2026-01-02 10:00:00"), "view", 2.5),
      (3L, 2L, ts("2026-01-01 10:00:00"), "click", 10.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.rollupTypeDay(events).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val detail = got.filter(g => g._3 == 0 && g._4 == 0)
    val perType = got.filter(g => g._3 == 0 && g._4 == 1)
    val grand = got.filter(g => g._3 == 1 && g._4 == 1)
    assert(detail.length === 3 && perType.length === 2 && grand.length === 1)
    assert(grand.head._5 === 3L && grand.head._6 === 14.0)
    assert(perType.map(_._6).sum === grand.head._6)
    assert(perType.find(_._1 == "view").get._6 === 4.0)
    assert(grand.head._2 === "1900-01-01") // sentinel day on super-aggregate rows
  }

  test("funnel stages require the previous stage to have fired first") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 0.0),
      (2L, 1L, ts("2026-01-01 10:05:00"), "click", 0.0),
      (3L, 1L, ts("2026-01-01 10:10:00"), "purchase", 0.0),
      // user 2: click BEFORE any view -> not a funnel click; later view
      // but the purchase has no qualifying click before it
      (4L, 2L, ts("2026-01-01 10:00:00"), "click", 0.0),
      (5L, 2L, ts("2026-01-01 10:05:00"), "view", 0.0),
      (6L, 2L, ts("2026-01-01 10:10:00"), "purchase", 0.0),
      // user 3: purchase only
      (7L, 3L, ts("2026-01-01 10:00:00"), "purchase", 0.0),
      // user 4: view then a second click-less purchase
      (8L, 4L, ts("2026-01-01 10:00:00"), "view", 0.0),
      (9L, 4L, ts("2026-01-01 10:05:00"), "purchase", 0.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.funnel(events).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
    // completion timestamps are ordered within the funnel
    val u1 = Events.funnel(events).collect().find(_.getLong(0) == 1L).get
    assert(!u1.getTimestamp(1).after(u1.getTimestamp(2)))
    assert(!u1.getTimestamp(2).after(u1.getTimestamp(3)))
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

  test("attribution credits the latest click inside the window, nulls otherwise") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2026-01-01 10:30:00"), "click", 0.0),
      (3L, 1L, ts("2026-01-01 10:45:00"), "purchase", 9.0), // -> click 2, 15 min ago
      (4L, 1L, ts("2026-01-01 12:00:00"), "purchase", 7.0), // last click > 1h old -> null
      (5L, 2L, ts("2026-01-01 11:00:00"), "purchase", 5.0), // user has no clicks -> null
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.attribution(events).collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got === Seq(
      (3L, Some(2L), Some(15L * 60 * 1000000)),
      (4L, None, None),
      (5L, None, None)))
  }

  test("cohortRetention counts users by first-activity week and offset") {
    // weeks (Mondays): 2026-01-05, 2026-01-12, 2026-01-19
    val events = Seq(
      // user 1: cohort w0, active w0 and w2 (twice in w0 -> one pair)
      (1L, 1L, ts("2026-01-05 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2026-01-06 10:00:00"), "view", 1.0),
      (3L, 1L, ts("2026-01-19 10:00:00"), "view", 1.0),
      // user 2: cohort w0, active w0 only
      (4L, 2L, ts("2026-01-07 10:00:00"), "view", 1.0),
      // user 3: cohort w1, active w1 and w2
      (5L, 3L, ts("2026-01-12 10:00:00"), "view", 1.0),
      (6L, 3L, ts("2026-01-20 10:00:00"), "view", 1.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.cohortRetention(events).collect()
      .map(r => ((r.getDate(0).toString, r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("2026-01-05", 0L) -> ((2L, 1.0)),
      ("2026-01-05", 2L) -> ((1L, 0.5)),
      ("2026-01-12", 0L) -> ((1L, 1.0)),
      ("2026-01-12", 1L) -> ((1L, 1.0))))
  }

  test("transitions counts consecutive per-user pairs; probabilities sum to 1 per from_type") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2026-01-01 10:01:00"), "click", 1.0),
      (3L, 1L, ts("2026-01-01 10:02:00"), "purchase", 1.0),
      (4L, 2L, ts("2026-01-01 11:00:00"), "view", 1.0),
      (5L, 2L, ts("2026-01-01 11:05:00"), "view", 1.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("click", "purchase", 1L, 1L, 1.0),
      ("view", "click", 1L, 2L, 0.5),
      ("view", "view", 1L, 2L, 0.5)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12)
    }
  }

  test("rfm scores users against corpus means with recency anchored to the newest day") {
    val events = Seq(
      // user 1: 4 events on the anchor day, mon 40 -> champion
      (1L, 1L, ts("2026-01-10 10:00:00"), "view", 10.0),
      (2L, 1L, ts("2026-01-10 11:00:00"), "view", 10.0),
      (3L, 1L, ts("2026-01-10 12:00:00"), "view", 10.0),
      (4L, 1L, ts("2026-01-10 13:00:00"), "view", 10.0),
      // user 2: 2 events 5 days back, mon 20 -> recent but light: "new"
      (5L, 2L, ts("2026-01-05 10:00:00"), "view", 10.0),
      (6L, 2L, ts("2026-01-05 11:00:00"), "view", 10.0),
      // user 3: 1 old small event -> dormant
      (7L, 3L, ts("2025-12-29 10:00:00"), "view", 1.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.rfm(events).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    // corpus means: avg_f = 7/3 ≈ 2.33, avg_m = 61/3 ≈ 20.33
    assert(got.toSeq === Seq(
      (1L, 0L, 4L, 40.0, 3L, 2L, 2L, "champion"),
      (2L, 5L, 2L, 20.0, 2L, 1L, 1L, "new"),
      (3L, 12L, 1L, 1.0, 1L, 1L, 1L, "dormant")))
  }

  test("gapQuantiles ranks exact inter-arrival microsecond gaps per type") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "a", 1.0),
      (2L, 1L, ts("2026-01-01 10:01:00"), "a", 1.0), // gap 60 s
      (3L, 1L, ts("2026-01-01 10:03:00"), "a", 1.0), // gap 120 s
      (4L, 1L, ts("2026-01-01 10:06:00"), "a", 1.0), // gap 180 s (then none)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Events.gapQuantiles(events).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "a" && row.getLong(1) === 3L)
    assert(row.getDouble(2) === 120e6) // p50: rank (3+1)/2 = 2
    assert(row.getDouble(3) === 180e6) // p90: rank 3
    assert(row.getDouble(4) === 180e6) // p99: rank 3
  }

  test("winsorize clamps values above the exact per-type p99") {
    val events = (1 to 100).map(i =>
      (i.toLong, 1L, ts(f"2026-01-01 10:00:${i % 60}%02d"), "a", i.toDouble))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.winsorize(events).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    // p99 of 1..100 = ceil(99*100/100) = rank 99 -> value 99
    assert(got(100L) === ((99.0, true)))
    assert(got(99L) === ((99.0, false)))
    assert(got(50L) === ((50.0, false)))
    assert(got.values.count(_._2) === 1)
  }

  test("sessionPaths counts '>'-joined per-session type sequences, top by frequency") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2026-01-01 10:10:00"), "click", 1.0),   // session 1: view>click
      (3L, 1L, ts("2026-01-01 12:00:00"), "purchase", 1.0), // session 2: purchase
      (4L, 2L, ts("2026-01-01 09:00:00"), "view", 1.0),
      (5L, 2L, ts("2026-01-01 09:05:00"), "click", 1.0),   // view>click again
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.sessionPaths(events).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("view>click", 2L), ("purchase", 1L)))
  }

  test("anomalies flags values far from the user's trailing baseline, excluding self") {
    val base = (1 to 21).map(i =>
      (i.toLong, 1L, ts(f"2026-01-01 10:${i}%02d:00"), "t", 10.0))
    val events = (base :+ (22L, 1L, ts("2026-01-01 10:22:00"), "t", 500.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.anomalies(events).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(3)), r.getBoolean(4)))).toMap
    // first event: no baseline; constant run: sd = 0 -> no z, no flag
    assert(got(1L) === ((None, false)))
    assert(got(10L) === ((None, false)))
    // the 500 against a constant-10 baseline: sd is 0 -> undefined z,
    // NOT flagged (a zero-variance baseline can't score)
    assert(got(22L) === ((None, false)))
    // now a noisy baseline: alternating 9/11, then a spike
    val noisy = ((1 to 20).map(i =>
      (i.toLong, 2L, ts(f"2026-01-01 11:${i}%02d:00"), "t", if (i % 2 == 0) 9.0 else 11.0))
      :+ (21L, 2L, ts("2026-01-01 11:21:00"), "t", 100.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val spike = Events.anomalies(noisy).collect().filter(_.getLong(0) == 21L).head
    assert(spike.getBoolean(4), "spike against a noisy baseline must be flagged")
    assert(spike.getDouble(3) > 50.0) // (100-10)/~1.026
  }

  test("jsonProps extracts the JSON metric and counts missing keys separately") {
    val events = Seq(
      ("a", """{"k": 5}"""),
      ("a", """{"k": 7}"""),
      ("b", """{"x": 1}"""),
    ).toDF("event_type", "props")
    val got = Events.jsonProps(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))
    assert(got.toSeq === Seq(
      ("a", 2L, 2L, Some(5L), Some(7L), Some(12L), Some(6.0)),
      ("b", 1L, 0L, None, None, None, None)))
  }

  test("histogram bins partition each type's values; flat types collapse to bin 0") {
    val events = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), "view", Some(0.0)),
      (2L, 1L, java.sql.Timestamp.valueOf("2026-01-01 11:00:00"), "view", Some(10.0)),
      (3L, 1L, java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), "view", Some(20.0)),
      (4L, 1L, java.sql.Timestamp.valueOf("2026-01-01 13:00:00"), "flat", Some(5.0)),
      (5L, 1L, java.sql.Timestamp.valueOf("2026-01-01 14:00:00"), "flat", Some(5.0)),
      (6L, 1L, java.sql.Timestamp.valueOf("2026-01-01 15:00:00"), "view", None: Option[Double])
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = Events.histogram(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    // view: lo=0 hi=20 -> 0 in bin 0, 10 in bin 10, 20 clamps to bin 19
    assert(rows.filter(_._1 == "view").map(r => (r._2, r._5)).toSeq
      === Seq((0L, 1L), (10L, 1L), (19L, 1L)))
    // flat type: hi == lo -> everything in bin 0
    assert(rows.filter(_._1 == "flat").map(r => (r._2, r._5)).toSeq === Seq((0L, 2L)))
    // counts partition the non-null rows
    assert(rows.map(_._5).sum === 5L)
    // edges are consistent: bin_lo < bin_hi wherever the span is positive
    assert(rows.filter(_._1 == "view").forall(r => r._3 < r._4))
  }
}
