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

  test("ohlcBars('month') folds a whole month into one bar per key") {
    val withFeb = events.union(Seq(
      (8L, 1L, ts("2026-02-10 10:00:00"), "t", 7.0)).toDF(events.columns: _*))
    val rows = FinAnalytics.ohlcBars(withFeb, "month").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(5), r.getLong(6)))
    assert(rows.toSeq === Seq(
      (1L, "2026-01-01", 5.0, 30.0, 4L),  // open=first tick, close=last
      (1L, "2026-02-01", 7.0, 7.0, 1L),
      (2L, "2026-01-01", 50.0, 50.0, 3L)))
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

  test("ntileDeciles splits each instrument's closes by value order") {
    val rows = FinAnalytics.ntileDeciles(events, n = 2).collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getDate(1).toString, r.getLong(3)))
    // closes 10, 20, 30 by value -> first bucket gets the remainder
    assert(rows.toSeq === Seq(("2026-01-01", 1L), ("2026-01-02", 1L), ("2026-01-03", 2L)))
  }

  test("ewma of a constant series is the constant; ramped series lags behind the close") {
    val rows = FinAnalytics.ewma(events).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
    // constant user 2: every weight combination of 50 is 50
    rows.filter(_._1 == 2L).foreach { case (_, _, _, e) => assert(e === 50.0) }
    val u1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.head._4 === 10.0) // day 1: only w0 present -> ewma = close
    // rising series: ewma trails the close but moves up
    assert(u1.map(_._4).toSeq == u1.map(_._4).toSeq.sorted)
    u1.tail.foreach { case (_, _, c, e) => assert(e < c) }
  }

  test("valueQuantiles handles a constant-valued group (vmax == vmin degenerate bucket)") {
    val evs = (1 to 50).map(i => (i.toLong, 1L, ts(f"2026-01-01 10:00:$i%02.0f"), "flat", 7.5)) ++
      (1 to 9).map(i => (100L + i, 2L, ts(s"2026-01-01 11:00:0$i"), "vary", i.toDouble))
    val df = evs.toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = FinAnalytics.valueQuantiles(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("flat") === ((50L, 7.5, 7.5, 7.5)))
    // 9 values 1..9: p50 rank (9+1)/2=5 -> 5, p90 rank (81+9)/10=9 -> 9, p99 rank (891+99)/100=9 -> 9
    assert(rows("vary") === ((9L, 5.0, 9.0, 9.0)))
  }

  test("featureSnapshot composes the per-day metrics; single instrument has beta20 = 1") {
    // one user -> the market IS the instrument -> mret == ret, beta 1
    val solo = events.filter(org.apache.spark.sql.functions.col("user_id") === 1L)
    val rows = FinAnalytics.featureSnapshot(solo).collect()
    assert(rows.length === 3)
    val byDay = rows.map(r => r.getDate(1).toString -> r).toMap
    val d3 = byDay("2026-01-03")
    assert(d3.getDouble(3) === 20.0)          // ma5 of 10,20,30
    assert(d3.getLong(5) >= 1L)               // volume = ticks that day
    assert(d3.getDouble(6) > 0.0)             // avg_vol10
    assert(d3.getDouble(7) > 0.0)             // avg_vol20
    assert(d3.getDouble(8) === 30.0)          // hi10
    assert(d3.getDouble(9) === 10.0)          // lo10
    assert(d3.getDouble(10) === 0.5)          // ret 30/20-1
    assert(d3.getDouble(11) === 0.0)          // drawdown of a rising series
    assert(!d3.isNullAt(13) && d3.getDouble(13) === 1.0, "self-market beta20 must be 1")
    assert(byDay("2026-01-01").isNullAt(10))  // first day has no return
  }

  test("ohlcUnpivot melts each bar into exactly four metric rows") {
    val bars = FinAnalytics.dailyOhlc(events).count()
    val rows = FinAnalytics.ohlcUnpivot(events).collect()
    assert(rows.length === 4 * bars.toInt)
    val d1 = rows.filter(r => r.getLong(0) == 1L && r.getDate(1).toString == "2026-01-01")
      .map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(d1 === Map("open" -> 5.0, "high" -> 10.0, "low" -> 5.0, "close" -> 10.0))
  }

  test("rollingMedian picks the lower median of the trailing frame") {
    // user 1 closes: 10, 20, 30 -> frames [10], [10,20], [10,20,30]
    // lower medians: 10, 10, 20
    val got = FinAnalytics.rollingMedian(events, bars = 3).collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getDate(1).toString, r.getDouble(3))).toSeq
    assert(got === Seq(("2026-01-01", 10.0), ("2026-01-02", 10.0), ("2026-01-03", 20.0)))
  }

  test("corrPairs: perfectly co-moving series correlate at 1, constant series have no corr") {
    // user 3 moves proportionally to user 1 (returns identical);
    // user 2 is constant (zero variance -> corr undefined, filtered
    // to NULL and the (1,2)/(2,3) pairs emit NULL corr)
    val extra = Seq(
      (8L, 3L, ts("2026-01-01 16:00:00"), "t", 100.0),
      (9L, 3L, ts("2026-01-02 16:00:00"), "t", 200.0),
      (10L, 3L, ts("2026-01-03 16:00:00"), "t", 300.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = FinAnalytics.corrPairs(events.unionByName(extra)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows((1L, 3L)) === Some(1.0))
    assert(rows((1L, 2L)) === None)
    assert(rows((2L, 3L)) === None)
  }

  test("rangeDaySum bounds the frame by calendar time, not row count") {
    val gapped = Seq(
      (1L, 9L, ts("2026-01-01 16:00:00"), "t", 10.0),
      (2L, 9L, ts("2026-01-02 16:00:00"), "t", 20.0),
      (3L, 9L, ts("2026-01-12 16:00:00"), "t", 40.0), // > 7 days after both
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = FinAnalytics.rangeDaySum(gapped).collect()
      .map(r => (r.getDate(1).toString, r.getDouble(3), r.getLong(4))).toSeq
    // a ROWS frame would put 20.0 (the previous ROW) in Jan 12's window
    assert(got === Seq(
      ("2026-01-01", 10.0, 1L),
      ("2026-01-02", 30.0, 2L),
      ("2026-01-12", 40.0, 1L)))
  }

  test("resampleFfill fills calendar gaps with the last known close") {
    // user 1 has closes on Jan 1-3; drop Jan 2's tick to make a gap
    val gappy = events.filter("event_id <> 3")
    val got = FinAnalytics.resampleFfill(gappy).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("2026-01-01", 10.0, false),
      ("2026-01-02", 10.0, true),  // gap day carries Jan 1's close
      ("2026-01-03", 30.0, false)))
  }

  test("bollinger: constant series collapses the band; rising series brackets the close") {
    val rows = FinAnalytics.bollinger(events).collect()
    // user 2 (constant 50), day 3: ma = 50, std = 0, band collapsed, %B undefined
    val u2 = rows.filter(_.getLong(0) == 2L).map(r =>
      (r.getDate(1).toString, r.getDouble(3), r.get(4), r.get(5), r.get(6), r.get(7)))
    assert(u2.last === (("2026-01-03", 50.0, 0.0, 50.0, 50.0, null)))
    // user 2 day 1: single bar -> no std/band yet
    assert(u2.head === (("2026-01-01", 50.0, null, null, null, null)))
    // user 1 day 2: closes 10, 20 -> mean 15, sample std sqrt(50)
    val u1d2 = rows.find(r => r.getLong(0) == 1L && r.getDate(1).toString == "2026-01-02").get
    assert(u1d2.getDouble(4) === 7.071068)  // round(sqrt(50), 6)
    assert(u1d2.getDouble(5) === 29.142136) // 15 + 2*std
    assert(u1d2.getDouble(6) === 0.857864)  // 15 - 2*std
    val pctB = u1d2.getDouble(7)
    assert(math.abs(pctB - (20.0 - 0.857864) / (29.142136 - 0.857864)) < 1e-6)
  }

  test("rsi saturates at 100 on all-gain windows, 0 on all-loss, undefined when flat") {
    val ev = Seq(
      (1L, 1L, ts("2026-01-01 12:00:00"), "t", 10.0),
      (2L, 1L, ts("2026-01-02 12:00:00"), "t", 20.0),
      (3L, 1L, ts("2026-01-03 12:00:00"), "t", 30.0), // all gains
      (4L, 2L, ts("2026-01-01 12:00:00"), "t", 50.0),
      (5L, 2L, ts("2026-01-02 12:00:00"), "t", 50.0), // flat
      (6L, 3L, ts("2026-01-01 12:00:00"), "t", 30.0),
      (7L, 3L, ts("2026-01-02 12:00:00"), "t", 20.0),
      (8L, 3L, ts("2026-01-03 12:00:00"), "t", 10.0), // all losses
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = FinAnalytics.rsi(ev).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> Option(r.get(3))).toMap
    assert(got((1L, "2026-01-02")) === Some(100.0))
    assert(got((1L, "2026-01-03")) === Some(100.0))
    assert(got((2L, "2026-01-02")) === None)
    assert(got((3L, "2026-01-02")) === Some(0.0))
    assert(got((3L, "2026-01-03")) === Some(0.0))
  }

  test("vwap weights closes by per-day tick volume") {
    // user 1 day 1 has volume 2 (two ticks), days 2-3 volume 1:
    // vwap(day3) = (10*2 + 20 + 30) / 4 = 17.5; day1 = close itself.
    val rows = FinAnalytics.vwap(events).collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getDate(1).toString, r.getDouble(4)))
    assert(rows.toSeq === Seq(
      ("2026-01-01", 10.0), ("2026-01-02", 13.333333), ("2026-01-03", 17.5)))
  }

  test("stochastic %K spans 0..100 over the window; %D needs three K values; flat is null") {
    val k1 = FinAnalytics.stochastic(events).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getDate(1).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    // day1: window = {10} flat -> null K; day2: (20-10)/(20-10)=100;
    // day3: (30-10)/(30-10)=100; %D defined nowhere (day1 K is null).
    assert(k1.toSeq === Seq(
      ("2026-01-01", None, None),
      ("2026-01-02", Some(100.0), None),
      ("2026-01-03", Some(100.0), None)))
    // user 2 constant 50 -> flat windows, all null
    val k2 = FinAnalytics.stochastic(events).collect()
      .filter(_.getLong(0) == 2L).map(r => Option(r.get(3)))
    assert(k2.forall(_.isEmpty))
  }

  test("obv accumulates signed volume on close direction and is exact integer math") {
    val rows = FinAnalytics.obv(events).collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getDate(1).toString, r.getLong(4)))
    // day1: first bar dir 0 -> 0; day2: up, +vol(1) -> 1; day3: up -> 2
    assert(rows.toSeq === Seq(("2026-01-01", 0L), ("2026-01-02", 1L), ("2026-01-03", 2L)))
    val flat = FinAnalytics.obv(events).collect()
      .filter(_.getLong(0) == 2L).map(_.getLong(4))
    assert(flat.toSeq === Seq(0L, 0L, 0L))
  }

  test("atr: true range spans the bar plus the gap from prior close") {
    val rows = FinAnalytics.atr(events).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
    // day2: pc=10, TR = max(20-20, |20-10|, |20-10|) = 10, ATR = 10
    // day3: pc=20, TR = max(0, 10, 10) = 10, ATR = (10+10)/2 = 10
    assert(rows.toSeq === Seq(("2026-01-02", 10.0, 10.0), ("2026-01-03", 10.0, 10.0)))
    val flat = FinAnalytics.atr(events).collect().filter(_.getLong(0) == 2L)
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(flat.forall(_ == ((0.0, 0.0))))
  }

  test("macd is zero on a constant series and positive when fast memory sees higher closes") {
    val rows = FinAnalytics.macd(events).collect()
    // user 2: constant 50 -> both ewmas 50, macd exactly 0
    val u2 = rows.filter(_.getLong(0) == 2L)
    assert(u2.forall(r => r.getDouble(3) === 50.0 && r.getDouble(4) === 50.0 && r.getDouble(5) === 0.0))
    // user 1 rising 10, 20, 30: day-1 macd 0 (one bar), then fast > slow
    val u1 = rows.filter(_.getLong(0) == 1L).map(r => (r.getDate(1).toString, r.getDouble(5)))
    assert(u1.head === (("2026-01-01", 0.0)))
    assert(u1.drop(1).forall(_._2 > 0.0))
  }

  test("autocorr: oscillating series is negative, constant-return series undefined") {
    val ev = Seq(
      (1L, 1L, ts("2026-01-01 12:00:00"), "t", 10.0),
      (2L, 1L, ts("2026-01-02 12:00:00"), "t", 20.0),
      (3L, 1L, ts("2026-01-03 12:00:00"), "t", 10.0),
      (4L, 1L, ts("2026-01-04 12:00:00"), "t", 20.0),
      (5L, 1L, ts("2026-01-05 12:00:00"), "t", 10.0), // returns alternate +1, -0.5
      (6L, 2L, ts("2026-01-01 12:00:00"), "t", 10.0),
      (7L, 2L, ts("2026-01-02 12:00:00"), "t", 20.0),
      (8L, 2L, ts("2026-01-03 12:00:00"), "t", 40.0),
      (9L, 2L, ts("2026-01-04 12:00:00"), "t", 80.0), // constant +1 returns
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = FinAnalytics.autocorr(ev).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(got(1L).exists(_.asInstanceOf[Double] < -0.9))
    assert(got(2L) === None) // zero variance -> no defined autocorrelation
  }

  test("moments: symmetric distribution has zero skew and hand-checked variance/kurtosis") {
    val ev = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "a", 1.0),
      (2L, 1L, ts("2026-01-01 10:01:00"), "a", 2.0),
      (3L, 1L, ts("2026-01-01 10:02:00"), "a", 3.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = FinAnalytics.moments(ev).collect().head
    assert(r.getString(0) === "a" && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 2.0)      // mean
    assert(r.getDouble(3) === 0.666667) // population variance 2/3
    assert(r.getDouble(4) === 0.0)      // symmetric -> zero skew
    assert(r.getDouble(5) === -1.5)     // m4/m2^2 - 3 = (2/3)/(4/9) - 3
  }

  test("splineFeatures basis is a partition of unity with local support") {
    val rows = FinAnalytics.splineFeatures(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val basis = (2 until 14).map(r.getDouble)
      val sum = basis.sum
      assert(math.abs(sum - 1.0) < 1e-5, s"partition of unity violated: $sum")
      // max of the cardinal cubic is 2/3 (round-6 can land 3e-8 above)
      assert(basis.forall(b => b >= 0.0 && b <= 2.0 / 3.0 + 1e-6))
      // support spans 4 knots: 4 non-zero bases off-knot, 3 on-knot
      // (a basis is exactly 0 at its support boundary)
      assert(Set(3, 4).contains(basis.count(_ > 1e-9)))
    }
  }

  test("sharpe computes the annualized ratios and nulls out degenerate denominators") {
    val rows = FinAnalytics.sharpe(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    // user 1: returns 1.0, 0.5 → mean .75, std √.125, no downside
    val u1 = rows(1L)
    assert(math.abs(u1.getDouble(2) - 0.75 / math.sqrt(0.125) * math.sqrt(252.0)) < 1e-5)
    assert(u1.isNullAt(3), "all-positive returns have no downside deviation")
    // user 2: constant closes → zero-variance returns → both null
    val u2 = rows(2L)
    assert(u2.isNullAt(2) && u2.isNullAt(3))
  }

  test("infoRatio measures active return vs the composite, zero for the market itself") {
    // Two users with OPPOSITE moves around a flat market composite:
    // u1 closes 100,110,99; u2 closes 100,90,101.2 (sums 200,200,200.2)
    // → market returns 0, 0.001; active returns differ per user and
    // the ratios must be negatives-ish of each other in sign.
    val ev = Seq(
      (1L, 1L, ts("2026-01-01 12:00:00"), "t", 100.0),
      (2L, 1L, ts("2026-01-02 12:00:00"), "t", 110.0),
      (3L, 1L, ts("2026-01-03 12:00:00"), "t", 99.0),
      (4L, 2L, ts("2026-01-01 12:00:00"), "t", 100.0),
      (5L, 2L, ts("2026-01-02 12:00:00"), "t", 90.0),
      (6L, 2L, ts("2026-01-03 12:00:00"), "t", 101.2),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = FinAnalytics.infoRatio(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    // hand-check u1: rets .1, -.1; mkt 0, .001 → a = .1, -.101
    // mean = -.0005, std = sqrt((2*.020201-.000001)/2) ≈ .142131
    val mean = -0.0005
    val std = math.sqrt((2 * (0.1 * 0.1 + 0.101 * 0.101) - 0.0005 * 0.0005 * 4) / 2)
    assert(math.abs(rows(1L).getDouble(2) - mean / std * math.sqrt(252.0)) < 1e-4)
    assert(rows(1L).getDouble(2) < 0 !== rows(2L).getDouble(2) < 0,
      "opposite movers vs the composite must sign-split")
  }

  test("calmar divides the annualized mean return by max drawdown, null when flat") {
    // user 9: closes 100, 110, 99 → returns 0.1, −0.1 → mean 0;
    // peak 110, trough 99 → maxdd = 1 − 99/110 = 0.1 → calmar 0.
    // user 8: monotone rising → maxdd 0 → NULL ratio (no ANSI error).
    val ev = Seq(
      (1L, 9L, ts("2026-01-01 12:00:00"), "t", 100.0),
      (2L, 9L, ts("2026-01-02 12:00:00"), "t", 110.0),
      (3L, 9L, ts("2026-01-03 12:00:00"), "t", 99.0),
      (4L, 8L, ts("2026-01-01 12:00:00"), "t", 50.0),
      (5L, 8L, ts("2026-01-02 12:00:00"), "t", 60.0),
      // user 7: a single close → no returns; must still get a row
      (6L, 7L, ts("2026-01-01 12:00:00"), "t", 40.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = FinAnalytics.calmar(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(9L).getDouble(2) === 0.1)
    assert(rows(9L).getDouble(3) === 0.0)
    assert(rows(8L).getDouble(2) === 0.0)
    assert(rows(8L).isNullAt(3), "no drawdown → null calmar, not a division error")
    assert(rows(7L).getLong(1) === 0L && rows(7L).isNullAt(3),
      "single-close key keeps its panel row with n = 0 and null ratio")
  }

  test("varEs picks the tail order statistic and averages the value-based tail") {
    // closes 100, 110, 99, 108.9 → returns ≈ 0.1, −0.1, 0.1; n=3 →
    // k = ⌈3·5/100⌉ = 1 → VaR = the single most-negative return
    val ev = Seq(
      (1L, 9L, ts("2026-01-01 12:00:00"), "t", 100.0),
      (2L, 9L, ts("2026-01-02 12:00:00"), "t", 110.0),
      (3L, 9L, ts("2026-01-03 12:00:00"), "t", 99.0),
      (4L, 9L, ts("2026-01-04 12:00:00"), "t", 108.9),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = FinAnalytics.varEs(ev).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 3L)
    assert(math.abs(r(0).getDouble(2) - (-0.1)) < 1e-12) // VaR: raw input return
    assert(r(0).getDouble(3) === -0.1)                   // ES: dec6 tail mean
  }
}
