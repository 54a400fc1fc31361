package graft

import java.sql.Timestamp

import graft.plans.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom sort-merge as-of operator, checked on hand-built edge
  * cases and against an independent join+argmax formulation on real
  * testdata.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at-or-before each left time, null when none") {
    val quotes = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0),
      (1L, ts("2026-01-01 11:00:00"), 110.0),
      (3L, ts("2026-01-01 10:00:00"), 300.0),
    ).toDF("q_user", "q_ts", "px")
    val trades = Seq(
      (1L, 1L, ts("2026-01-01 09:30:00")), // before any quote -> null
      (2L, 1L, ts("2026-01-01 10:30:00")), // -> 100
      (3L, 1L, ts("2026-01-01 11:00:00")), // boundary: <= matches -> 110
      (4L, 1L, ts("2026-01-01 12:00:00")), // -> 110
      (5L, 2L, ts("2026-01-01 12:00:00")), // keyless -> null
    ).toDF("trade_id", "user", "t_ts")

    val got = AsOf.join(trades, quotes, "user", "q_user", "t_ts", "q_ts")
      .select(col("trade_id"), col("px"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, None), (2L, Some(100.0)), (3L, Some(110.0)), (4L, Some(110.0)), (5L, None)))
  }

  test("key filters push through the as-of join into both parquet scans") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val full = graft.operators.FinAnalytics.asofPrice(t.events)
    val firstUser = full.select(min(col("user_id"))).collect().head.getLong(0)
    val filtered = full.filter(col("user_id") === firstUser)
    val plan = filtered.queryExecution.executedPlan.toString
    val pushes = raw"PushedFilters: \[[^\]]*EqualTo\(user_id,$firstUser\)".r
      .findAllIn(plan).size
    assert(pushes >= 2, s"expected the key filter in both scans, got $pushes:\n$plan")
    // and pushing didn't change the answer
    val want = full.collect().filter(_.getLong(1) == firstUser).map(_.toString).sorted
    assert(filtered.collect().map(_.toString).sorted.toSeq === want.toSeq)
  }

  test("custom operator matches join+argmax brute force on testdata") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val events = t.events.select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val got = graft.operators.FinAnalytics.asofPrice(t.events)
      .collect().map(_.toString).sorted

    // Independent formulation: inner-join all (event, earlier-close)
    // pairs, keep the latest per event, left-join back.
    val c = graft.operators.FinAnalytics.dailyOhlc(t.events)
      .select(col("user_id").as("cu"), col("day"), col("close"),
        col("day").cast("timestamp").as("day_ts"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("day_ts").desc)
    val best = events.join(c, col("user_id") === col("cu") && col("ts") >= col("day_ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id").as("be"), col("day"), col("close"))
    val want = events.join(best, col("event_id") === col("be"), "left")
      .select(col("event_id"), col("user_id"), col("value"),
        col("day").as("close_day"), col("close"))
      .orderBy(col("event_id"))
      .collect().map(_.toString).sorted
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }
}
