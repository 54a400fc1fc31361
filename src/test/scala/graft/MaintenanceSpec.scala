package graft

import java.sql.Timestamp

import graft.operators.Maintenance

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, 1L, ts("2026-01-01 10:00:00"), "a", 1.0),
    (2L, 1L, ts("2026-01-01 12:00:00"), "b", 2.0), // same user/day, later -> kept by dedupLatest
    (3L, 1L, ts("2026-01-05 10:00:00"), "c", 3.0),
    (4L, 2L, ts("2026-01-09 10:00:00"), "d", 4.0),
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("dedupLatest keeps the newest row per (user, day)") {
    val kept = Maintenance.dedupLatest(events).collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L, 4L))
  }

  test("retentionWindow keeps rows within N days of the global max ts") {
    val kept = Maintenance.retentionWindow(events, days = 7).collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L)) // cutoff = Jan 2 10:00
  }

  test("incrementalDelta keeps rows within N days of each user's max ts") {
    val kept = Maintenance.incrementalDelta(events, days = 3).collect().map(_.getLong(0)).toSet
    // user 1 checkpoint Jan 5 -> cutoff Jan 2 (drops ids 1,2); user 2 keeps its only row
    assert(kept === Set(3L, 4L))
  }

  test("cdcApply keeps the latest upsert and drops keys whose last change is a tombstone") {
    val events = Seq(
      // key (1, Jan 1): two upserts -> latest value 2.0 survives
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2026-01-01 11:00:00"), "view", 2.0),
      // key (1, Jan 2): upsert then tombstone -> key removed
      (3L, 1L, ts("2026-01-02 10:00:00"), "view", 3.0),
      (4L, 1L, ts("2026-01-02 11:00:00"), "error", 0.0),
      // key (2, Jan 1): tombstone then a LATER upsert -> re-created
      (5L, 2L, ts("2026-01-01 10:00:00"), "error", 0.0),
      (6L, 2L, ts("2026-01-01 11:00:00"), "view", 5.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Maintenance.cdcApply(events).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2))).toSet
    assert(got === Set((1L, "2026-01-01", 2.0), (2L, "2026-01-01", 5.0)))
  }

  test("scd2Build collapses equal-value runs into validity intervals") {
    val events = Seq(
      // user 1: value 5 (Jan 1-2, two days SAME value -> one version),
      // then 7 (Jan 3), then back to 5 (Jan 4) -> three versions
      (1L, 1L, ts("2026-01-01 10:00:00"), "view", 5.0),
      (2L, 1L, ts("2026-01-02 10:00:00"), "view", 5.0),
      (3L, 1L, ts("2026-01-03 10:00:00"), "view", 7.0),
      (4L, 1L, ts("2026-01-04 10:00:00"), "view", 5.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Maintenance.scd2Build(events).collect()
      .map(r => (r.getDouble(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4))).toSeq
    assert(got === Seq(
      (5.0, "2026-01-01", Some("2026-01-03"), false),
      (7.0, "2026-01-03", Some("2026-01-04"), false),
      (5.0, "2026-01-04", None, true)))
  }

  test("existsUrgent keeps each matching customer exactly once") {
    val customer = Seq(
      (1L, "alice", "BUILDING"), (2L, "bob", "AUTO"), (3L, "carol", "AUTO"),
    ).toDF("c_custkey", "c_name", "c_mktsegment")
    val orders = Seq(
      // customer 1 has TWO urgent orders -> still one output row
      (10L, 1L, "1-URGENT"), (11L, 1L, "1-URGENT"),
      (12L, 2L, "5-LOW"),
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val got = graft.operators.Analytics.existsUrgent(customer, orders).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "alice")))
  }

  test("lastUpdate reports max date and count per key") {
    val orders = Seq(
      (10L, 1L, ts("2026-02-01 00:00:00")),
      (11L, 1L, ts("2026-03-01 00:00:00")),
      (12L, 2L, ts("2026-01-15 00:00:00")),
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Maintenance.lastUpdate(orders).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2))).toSeq
    assert(got === Seq((1L, "2026-03-01", 2L), (2L, "2026-01-15", 1L)))
  }

  test("schemaUnion aligns by name and null-fills the old snapshot's missing column") {
    val ev = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "a", 1.0, """{"k": 1}"""), // old slice
      (2L, 1L, ts("2026-01-05 10:00:00"), "b", 2.0, """{"k": 2}"""), // new slice (within 2 days of max)
      (3L, 2L, ts("2026-01-06 10:00:00"), "c", 3.0, """{"k": 3}"""),
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = Maintenance.schemaUnion(ev).collect()
      .map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(got === Map(
      1L -> None,                    // old schema: props null-filled
      2L -> Some("""{"k": 2}"""),
      3L -> Some("""{"k": 3}""")))
  }
}
