package graft

import java.sql.Timestamp

import graft.operators.{Dedup, Events}
import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming mirrors must agree with their batch counterparts once
  * the watermark closes the windows/sessions.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // A far-future flush event advances the watermark so append-mode
  // results (closed windows / timed-out sessions) are emitted.
  private val flush = Event(999L, 9999L, ts("2026-06-01 00:00:00"), 0.0)

  test("streaming sessionize matches batch sessionize after watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventsStream.sessionize(input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val evs = Seq(
        Event(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
        Event(1L, 2L, ts("2026-01-01 10:20:00"), 2.0),
        Event(1L, 3L, ts("2026-01-01 11:00:00"), 4.0),
        Event(2L, 5L, ts("2026-01-01 09:30:00"), 8.0),
        Event(2L, 4L, ts("2026-01-01 09:10:00"), 16.0))
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(flush) // watermark jumps past every session's end+gap
      q.processAllAvailable()
      input.addData(Event(999L, 10000L, ts("2026-12-01 00:00:00"), 0.0)) // fire timeouts
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .filter(col("user_id") =!= 999L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5))).toSet

      val batch = Events.sessionize(
          evs.map(e => (e.event_id, e.user_id, e.ts, "t", e.value))
            .toDF("event_id", "user_id", "ts", "event_type", "value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3), r.getTimestamp(4), r.getDouble(5))).toSet

      assert(got === batch)
      assert(got.size === 3)
    } finally q.stop()
  }

  test("streaming debounce matches batch debounce across micro-batches") {
    import graft.streaming.EventsStream.DebEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DebEvent]
    val bursts = EventsStream.debounce(input.toDS())
    val q = bursts.writeStream.format("memory").queryName("deb_out")
      .outputMode("append").start()
    try {
      // burst of three chained clicks, a separate view, a second
      // user, then (next micro-batch) a fresh click burst — the
      // cross-batch chain is the part batch windows get for free
      val b1 = Seq(
        DebEvent(1L, "click", 1L, ts("2026-01-01 10:00:00")),
        DebEvent(1L, "click", 2L, ts("2026-01-01 10:03:00")),
        DebEvent(1L, "view", 5L, ts("2026-01-01 10:01:00")),
        DebEvent(2L, "click", 6L, ts("2026-01-01 10:00:30")))
      val b2 = Seq(
        DebEvent(1L, "click", 3L, ts("2026-01-01 10:06:30")), // chains onto burst 1
        DebEvent(1L, "click", 4L, ts("2026-01-01 10:20:00"))) // new burst
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      input.addData(DebEvent(999L, "x", 9999L, ts("2026-06-01 00:00:00")))
      q.processAllAvailable()
      input.addData(DebEvent(999L, "x", 10000L, ts("2026-12-01 00:00:00"))) // fire timeouts
      q.processAllAvailable()

      val got = spark.table("deb_out")
        .filter(col("user_id") =!= 999L)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getTimestamp(4), r.getLong(5))).toSet

      val batch = Events.debounce(
          (b1 ++ b2).map(e => (e.event_id, e.user_id, e.ts, e.event_type, 1.0))
            .toDF("event_id", "user_id", "ts", "event_type", "value"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getTimestamp(4), r.getLong(5))).toSet

      assert(got === batch)
      assert(got.size === 4)
    } finally q.stop()
  }

  test("streaming debounce chains late retry pairs into one suppressed burst") {
    import graft.streaming.EventsStream.DebEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DebEvent]
    val bursts = EventsStream.debounce(input.toDS())
    val q = bursts.writeStream.format("memory").queryName("deb_late_out")
      .outputMode("append").start()
    try {
      // batch 1 opens a burst at 10:30
      input.addData(DebEvent(1L, "click", 10L, ts("2026-01-01 10:30:00")))
      q.processAllAvailable()
      // batch 2 delivers a delayed retry PAIR from 10:00 — inside
      // the 1h watermark (which sits at 09:30 after batch 1) but
      // disjoint before the open burst (10:30 − 300s): must collapse
      // to ONE burst with one suppression, not two singletons
      input.addData(
        DebEvent(1L, "click", 2L, ts("2026-01-01 10:00:00")),
        DebEvent(1L, "click", 3L, ts("2026-01-01 10:00:10")))
      q.processAllAvailable()

      val late = spark.table("deb_late_out")
        .filter(col("keeper_id") === 2L).collect()
        .map(r => (r.getLong(3), r.getLong(5)))
      assert(late.toSeq === Seq((2L, 1L)),
        "late retry pair must flush as one burst with n_suppressed = 1")
    } finally q.stop()
  }

  test("streaming debounce merges the set-aside late burst after a backward keeper retake") {
    import graft.streaming.EventsStream.DebEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DebEvent]
    val bursts = EventsStream.debounce(input.toDS())
    val q = bursts.writeStream.format("memory").queryName("deb_retake_out")
      .outputMode("append").start()
    try {
      // batch 1 opens a burst at 10:30 (keeper 10)
      input.addData(DebEvent(1L, "click", 10L, ts("2026-01-01 10:30:00")))
      q.processAllAvailable()
      // batch 2: event 20 @10:21:30 is disjoint-before the open burst
      // (< 10:25) and gets set aside as a late burst; event 21 @10:26
      // then lands in-gap and RETAKES the open burst's start backward
      // to 10:26, which brings the late burst (10:21:30 >= 10:26−gap)
      // within gap — batch semantics see ONE burst {20, 21, 10} with
      // keeper 20. The merge must happen, not a two-burst flush.
      input.addData(
        DebEvent(1L, "click", 20L, ts("2026-01-01 10:21:30")),
        DebEvent(1L, "click", 21L, ts("2026-01-01 10:26:00")))
      q.processAllAvailable()
      input.addData(DebEvent(999L, "x", 9999L, ts("2026-06-01 00:00:00")))
      q.processAllAvailable()
      input.addData(DebEvent(999L, "x", 10000L, ts("2026-12-01 00:00:00"))) // fire timeout
      q.processAllAvailable()

      val got = spark.table("deb_retake_out").filter(col("user_id") === 1L)
        .collect().map(r => (r.getLong(3), r.getTimestamp(4), r.getLong(5))).toSeq
      assert(got === Seq((20L, ts("2026-01-01 10:21:30"), 2L)),
        "backward retake must merge the late burst into the open one (keeper 20, 2 suppressed)")
    } finally q.stop()
  }

  test("session ids keep incrementing after a timeout closes a session") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_resume")
      .outputMode("append").start()
    try {
      input.addData(Event(7L, 1L, ts("2026-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(flush) // watermark passes end+gap -> arms/fires timeout
      q.processAllAvailable()
      input.addData(Event(999L, 2L, ts("2026-07-01 00:00:00"), 0.0)) // fire timeout
      q.processAllAvailable()
      // user 7 comes back after the quiet period (>= watermark)
      input.addData(Event(7L, 3L, ts("2026-08-01 00:00:00"), 2.0))
      q.processAllAvailable()
      input.addData(Event(999L, 4L, ts("2027-01-01 00:00:00"), 0.0)) // flush again
      q.processAllAvailable()
      input.addData(Event(999L, 5L, ts("2027-06-01 00:00:00"), 0.0)) // fire 2nd timeout
      q.processAllAvailable()

      val ids = spark.table("sess_resume").filter(col("user_id") === 7L)
        .collect().map(r => (r.getLong(1), r.getDouble(5))).sortBy(_._1)
      assert(ids.toSeq === Seq((1L, 1.0), (2L, 2.0)), "second session must be id 2, not a duplicate id 1")
    } finally q.stop()
  }

  test("session_window variant agrees with flatMapGroupsWithState on session extents") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val out = EventsStream.sessionizeWindowed(
      input.toDS().withColumn("event_type", lit("t")).toDF())
    val q = out.writeStream.format("memory").queryName("sessw_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
        Event(1L, 2L, ts("2026-01-01 10:20:00"), 2.0),
        Event(1L, 3L, ts("2026-01-01 11:00:00"), 4.0))
      q.processAllAvailable()
      input.addData(flush)
      q.processAllAvailable()
      val got = spark.table("sessw_out").filter(col("user_id") === 1L)
        .collect()
        .map(r => (r.getTimestamp(1), r.getLong(3), r.getDecimal(4).doubleValue())).toSet
      // session_window's end = last event + gap; starts and aggregates
      // must line up with the typed-state sessionizer
      assert(got === Set(
        (ts("2026-01-01 10:00:00"), 2L, 3.0),
        (ts("2026-01-01 11:00:00"), 1L, 4.0)))
    } finally q.stop()
  }

  test("foreachBatch parquet sink persists closed sessions with a checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS())
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventsStream.Session], _: Long) =>
        batch.write.mode("append").parquet(s"$dir/out")
      }
      .start()
    try {
      input.addData(
        Event(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
        Event(1L, 2L, ts("2026-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      input.addData(flush)
      q.processAllAvailable()
      val persisted = spark.read.parquet(s"$dir/out")
        .filter(col("user_id") === 1L).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(5)))
      assert(persisted.toSeq === Seq((1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("exactly-once sink survives a stop/restart from checkpoint without duplicates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val input = MemoryStream[Event]
    // run 1: one session closed by the flush watermark, then STOP
    val q1 = EventsStream.sessionSinkExactlyOnce(EventsStream.sessionize(input.toDS()), dir)
    try {
      input.addData(
        Event(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
        Event(1L, 2L, ts("2026-01-01 10:20:00"), 2.0))
      q1.processAllAvailable()
      input.addData(flush)
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2: RESTART from the same checkpoint (same source), new data
    val q2 = EventsStream.sessionSinkExactlyOnce(EventsStream.sessionize(input.toDS()), dir)
    try {
      input.addData(Event(1L, 3L, ts("2026-07-01 10:00:00"), 4.0))
      q2.processAllAvailable()
      input.addData(Event(999L, 4L, ts("2027-01-01 00:00:00"), 0.0)) // advance watermark
      q2.processAllAvailable()
      input.addData(Event(999L, 5L, ts("2027-06-01 00:00:00"), 0.0)) // fire timeout
      q2.processAllAvailable()
    } finally q2.stop()

    val persisted = spark.read.parquet(s"$dir/out")
      .filter(col("user_id") === 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    // no (user_id, session_id) may appear twice across restarts
    assert(persisted.map(t => (t._1, t._2)).distinct.length === persisted.length,
      s"duplicate sessions after restart: ${persisted.toSeq}")
    assert(persisted.toSet === Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0)))
  }

  test("streaming funnel advances stage across micro-batches and matches batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventsStream.FunnelEvent
    val input = MemoryStream[FunnelEvent]
    val q = EventsStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      // batch 1: user 1 views; user 2 clicks with no prior view
      input.addData(
        FunnelEvent(1L, 1L, ts("2026-01-01 10:00:00"), "view"),
        FunnelEvent(2L, 2L, ts("2026-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      // batch 2: user 1 converts; user 2 views then purchases (no
      // qualifying click -> must stay at stage 1)
      input.addData(
        FunnelEvent(1L, 3L, ts("2026-01-01 10:05:00"), "click"),
        FunnelEvent(1L, 4L, ts("2026-01-01 10:10:00"), "purchase"),
        FunnelEvent(2L, 5L, ts("2026-01-01 10:05:00"), "view"),
        FunnelEvent(2L, 6L, ts("2026-01-01 10:10:00"), "purchase"))
      q.processAllAvailable()

      // update mode re-emits per batch: keep each user's LAST row
      val got = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getLong(4)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.last }
      assert(got(1L)._5 === 3L && got(2L)._5 === 1L)

      val batch = Events.funnel(Seq(
          (1L, 1L, ts("2026-01-01 10:00:00"), "view", 0.0),
          (2L, 2L, ts("2026-01-01 10:00:00"), "click", 0.0),
          (3L, 1L, ts("2026-01-01 10:05:00"), "click", 0.0),
          (4L, 1L, ts("2026-01-01 10:10:00"), "purchase", 0.0),
          (5L, 2L, ts("2026-01-01 10:05:00"), "view", 0.0),
          (6L, 2L, ts("2026-01-01 10:10:00"), "purchase", 0.0))
          .toDF("event_id", "user_id", "ts", "event_type", "value"))
        .collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getLong(4))).toSeq
      assert(got.values.toSet === batch.toSet)
    } finally q.stop()
  }

  test("streaming windowed top-k merges heap state across batches and emits on window close") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val df = input.toDS().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventsStream.topUsersWindowed(df, k = 2)
      .writeStream.format("memory").queryName("topk_win_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, 1L, ts("2026-01-01 10:00:00"), "a", 5.0),
        (2L, 2L, ts("2026-01-01 10:10:00"), "a", 7.0))
      q.processAllAvailable()
      // u1's total must MERGE across the batch cut inside the heap state
      input.addData(
        (3L, 1L, ts("2026-01-01 10:20:00"), "a", 5.0),
        (4L, 3L, ts("2026-01-01 10:30:00"), "a", 3.0))
      q.processAllAvailable()
      input.addData((9999L, 999L, ts("2026-06-01 00:00:00"), "a", 0.0)) // advance watermark
      q.processAllAvailable()

      val got = spark.table("topk_win_out")
        .filter(col("window_start") === ts("2026-01-01 10:00:00")).collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got === Set(("a", 1L, 1000L, 1L), ("a", 2L, 700L, 2L)))
    } finally q.stop()
  }

  test("streaming anomalies reproduce the batch z-scores bit-for-bit across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventsStream.ValueEvent
    val input = MemoryStream[ValueEvent]
    val q = EventsStream.anomalies(input.toDS(), bars = 3)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      // noisy baseline then a spike, split across the batch cut
      val evs = Seq(
        ValueEvent(1L, 1L, ts("2026-01-01 10:00:00"), 9.37),
        ValueEvent(1L, 2L, ts("2026-01-01 10:01:00"), 11.21),
        ValueEvent(1L, 3L, ts("2026-01-01 10:02:00"), 8.93),
        ValueEvent(1L, 4L, ts("2026-01-01 10:03:00"), 10.55),
        ValueEvent(1L, 5L, ts("2026-01-01 10:04:00"), 97.02))
      input.addData(evs.take(2): _*)
      q.processAllAvailable()
      input.addData(evs.drop(2): _*)
      q.processAllAvailable()

      val got = spark.table("anom_out").collect()
        .map(r => r.getLong(1) -> ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap
      val batch = graft.operators.Events.anomalies(
          evs.map(e => (e.event_id, e.user_id, e.ts, "t", e.value))
            .toDF("event_id", "user_id", "ts", "event_type", "value"),
          bars = 3)
        .collect()
        .map(r => r.getLong(0) -> ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap
      assert(got === batch)
      assert(got(5L)._2, "the spike must be flagged")
      assert(got.values.count(_._1.isDefined) >= 3)
    } finally q.stop()
  }

  test("streaming transitions pair consecutive events across micro-batches and match batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.EventsStream.TransitionEvent
    val input = MemoryStream[TransitionEvent]
    val q = EventsStream.transitionPairs(input.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 view -> click; user 2 lone view
      input.addData(
        TransitionEvent(1L, 1L, ts("2026-01-01 10:00:00"), "view"),
        TransitionEvent(1L, 2L, ts("2026-01-01 10:01:00"), "click"),
        TransitionEvent(2L, 3L, ts("2026-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      // batch 2: the remembered last event pairs across the batch cut
      input.addData(
        TransitionEvent(1L, 4L, ts("2026-01-01 10:02:00"), "purchase"),
        TransitionEvent(2L, 5L, ts("2026-01-01 10:05:00"), "view"))
      q.processAllAvailable()

      val got = spark.table("trans_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(got.toSet === Set(
        (1L, "view", "click"), (1L, "click", "purchase"), (2L, "view", "view")))

      // pair counts equal the batch transition matrix on the same events
      val batch = Events.transitions(Seq(
          (1L, 1L, ts("2026-01-01 10:00:00"), "view", 0.0),
          (2L, 1L, ts("2026-01-01 10:01:00"), "click", 0.0),
          (3L, 2L, ts("2026-01-01 10:00:00"), "view", 0.0),
          (4L, 1L, ts("2026-01-01 10:02:00"), "purchase", 0.0),
          (5L, 2L, ts("2026-01-01 10:05:00"), "view", 0.0))
          .toDF("event_id", "user_id", "ts", "event_type", "value"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val streamCounts = got.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.length.toLong }
      assert(streamCounts === batch)
    } finally q.stop()
  }

  test("streaming exact dedup verdicts new content against all content ever seen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.DedupStream
    import graft.streaming.DedupStream.Doc
    val input = MemoryStream[Doc]
    val q = DedupStream.exactDedup(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: 3 is a dup of 1 within the batch (min doc_id keeps)
      input.addData(Doc(3L, "alpha"), Doc(1L, "alpha"), Doc(2L, "beta"))
      q.processAllAvailable()
      // batch 2: 4 duplicates batch-1 content; 5 is new
      input.addData(Doc(4L, "alpha"), Doc(5L, "gamma"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
      assert(got === Set(
        (1L, true, 1L), (3L, false, 1L), (2L, true, 2L),
        (4L, false, 1L), (5L, true, 5L)))
    } finally q.stop()
  }

  test("streaming near-dup detects cross-batch duplicates via banded minhash state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream.nearDupCandidates(
        input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      input.addData(
        (1L, shared),
        (2L, "totally different words with no overlap at all here now"))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1 (from the PREVIOUS batch);
      // doc 4 shares nothing
      input.addData(
        (3L, shared),
        (4L, "yet another completely unrelated document body text"))
      q.processAllAvailable()
      val got = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // identical text -> identical signatures -> est 1.0; the same
      // pair may surface from several bands (consumers dedup on (a,b))
      assert(got.map(p => (p._1, p._2)) === Set((1L, 3L)))
      assert(got.forall(_._3 === 1.0))
    } finally q.stop()
  }

  test("streaming payload near-dup matches the batch banded detector pair-for-pair") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Multimodal
    // engineered corpus (the CurationSpec recipe, smaller): 10 groups
    // × 3 members sharing a long base with tiny tails — every true
    // pair is within a group, none across
    val rng = new scala.util.Random(11)
    val corpus = (0 until 10).flatMap { g =>
      val base = (0 until 6000).map { _ =>
        val r = rng.nextInt(36)
        if (r < 26) ('a' + r).toChar else ('0' + (r - 26)).toChar
      }.mkString + " the quick brown fox " * 100
      (0 until 3).map(m => (g * 1000L + m * 5, base + ("x" * m)))
    }
    val docsDf = corpus.toDF("doc_id", "text")
    val batchPairs = Multimodal.payloadNearDupBanded(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchPairs.size >= 20, s"corpus must admit many pairs, got ${batchPairs.size}")
    val payloads = Multimodal.synthesize(docsDf).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    // member 2 of every group arrives in a LATER batch, so every
    // group exercises both in-batch and cross-batch (state) pairing
    val (early, late) = payloads.partition(p => p._1 % 1000L / 5L != 2L)
    val input = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.DedupStream.payloadNearDupCandidates(
        input.toDS().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("payload_neardup_out")
      .outputMode("append").start()
    try {
      input.addData(early.toSeq)
      q.processAllAvailable()
      input.addData(late.toSeq)
      q.processAllAvailable()
      val got = spark.table("payload_neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // set equality: same pairs, same exact dist_ppm (multi-band
      // re-surfacings dedup on collapse to the set)
      assert(got === batchPairs)
    } finally q.stop()
  }

  test("streaming payload near-dup bucket cap bounds state: oversized buckets stop pairing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Multimodal
    // five near-identical payloads (same text; doc_id only perturbs
    // header bytes) all land in the same buckets; cap 3 means docs
    // 4-5 must neither pair nor grow state
    val text = "shared payload body " * 400
    val docsDf = (0 until 5).map(m => (m * 5L, text)).toDF("doc_id", "text")
    val payloads = Multimodal.synthesize(docsDf).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.DedupStream.payloadNearDupCandidates(
        input.toDS().toDF("doc_id", "payload"), bucketCap = 3L)
      .writeStream.format("memory").queryName("payload_cap_out")
      .outputMode("append").start()
    try {
      input.addData(payloads.toSeq)
      q.processAllAvailable()
      val got = spark.table("payload_cap_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val preCap = Set(0L, 5L, 10L) // the three residents before the cap trips
      assert(got.nonEmpty, "pre-cap residents must still pair")
      assert(got.forall(p => preCap.contains(p._1) && preCap.contains(p._2)),
        s"docs arriving after the cap tripped must not pair, got $got")
    } finally q.stop()
  }

  test("TTL payload near-dup pairs only window-mates and recovers capped buckets after eviction") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Multimodal
    val text = "shared payload body " * 400
    // same text -> same buckets; doc_id stride 5 keeps one container
    def payloadOf(id: Long): Array[Byte] =
      Multimodal.synthesize(Seq((id, text)).toDF("doc_id", "text"))
        .collect()(0).getAs[Array[Byte]](1)
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = graft.streaming.DedupStream.payloadNearDupCandidatesTtl(
        input.toDS().toDF("doc_id", "ts", "payload"), ttlMinutes = 60)
      .writeStream.format("memory").queryName("payload_ttl_out")
      .outputMode("append").start()
    try {
      input.addData((0L, ts("2026-01-01 10:00:00"), payloadOf(0L)))
      q.processAllAvailable()
      // within TTL -> pairs with doc 0
      input.addData((5L, ts("2026-01-01 10:30:00"), payloadOf(5L)))
      q.processAllAvailable()
      // advance the watermark far past TTL, then fire timeouts; the
      // two flush payloads live in disjoint nibble bins (0x11 -> bin
      // 1, 0x99 -> bin 9) so they cannot pair with anything
      input.addData((998L, ts("2026-06-01 00:00:00"), Array.fill(64)(0x11.toByte)))
      q.processAllAvailable()
      input.addData((997L, ts("2026-12-01 00:00:00"), Array.fill(64)(0x99.toByte)))
      q.processAllAvailable()
      // bucket evicted: doc 10 pairs with nothing despite matching 0/5
      input.addData((10L, ts("2026-12-01 00:00:00"), payloadOf(10L)))
      q.processAllAvailable()
      val got = spark.table("payload_ttl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((0L, 5L)))
    } finally q.stop()
  }

  test("SCD enrichment joins each event to the dimension version valid at event time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(
      (1L, "bronze", ts("2026-01-01 00:00:00"), Some(ts("2026-02-01 00:00:00"))),
      (1L, "gold", ts("2026-02-01 00:00:00"), None),       // open version
      (2L, "silver", ts("2026-01-15 00:00:00"), None))
      .toDF("key", "tier", "valid_from", "valid_to")
    val input = MemoryStream[Event]
    val q = EventsStream.enrichScd(input.toDS().toDF(), dim)
      .writeStream.format("memory").queryName("scd_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1L, 1L, ts("2026-01-10 00:00:00"), 1.0), // bronze era
        Event(1L, 2L, ts("2026-03-01 00:00:00"), 2.0), // gold era (open version)
        Event(2L, 3L, ts("2026-01-01 00:00:00"), 3.0), // before silver starts -> NULL
        Event(3L, 4L, ts("2026-01-01 00:00:00"), 4.0)) // unknown key -> NULL
      q.processAllAvailable()
      val got = spark.table("scd_out").collect()
        .map(r => r.getLong(1) -> Option(r.getString(4)).getOrElse("none")).toMap
      assert(got === Map(1L -> "bronze", 2L -> "gold", 3L -> "none", 4L -> "none"))
    } finally q.stop()
  }

  test("streaming dedup state survives a stop/restart from checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.DedupStream
    import graft.streaming.DedupStream.{Doc, Verdict}
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt").toString
    val input = MemoryStream[Doc]
    def start() = DedupStream.exactDedup(input.toDS())
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Verdict], _: Long) =>
        batch.write.mode("append").parquet(s"$dir/out")
      }
      .start()
    // run 1: establish the keeper for "alpha", then STOP
    val q1 = start()
    try {
      input.addData(Doc(1L, "alpha"))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2: the dup must be verdicted against run 1's RESTORED state
    val q2 = start()
    try {
      input.addData(Doc(2L, "alpha"))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(got === Set((1L, true, 1L), (2L, false, 1L)),
      "keeper state must be restored from the checkpoint across restarts")
  }

  test("TTL dedup evicts cold content keys and re-admits later arrivals as fresh keepers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.DedupStream
    import graft.streaming.DedupStream.TsDoc
    val input = MemoryStream[TsDoc]
    val q = DedupStream.exactDedupTtl(input.toDS(), ttlMinutes = 60)
      .writeStream.format("memory").queryName("ttl_dedup_out")
      .outputMode("append").start()
    try {
      input.addData(TsDoc(1L, ts("2026-01-01 10:00:00"), "alpha"))
      q.processAllAvailable()
      // within TTL: still a dup of doc 1
      input.addData(TsDoc(2L, ts("2026-01-01 10:30:00"), "alpha"))
      q.processAllAvailable()
      // advance the watermark far past last-seen + TTL, then fire the
      // timeout on the following batch (same pattern as sessionize)
      input.addData(TsDoc(998L, ts("2026-06-01 00:00:00"), "flush-a"))
      q.processAllAvailable()
      input.addData(TsDoc(999L, ts("2026-12-01 00:00:00"), "flush-b"))
      q.processAllAvailable()
      // evicted: the same content is re-admitted as a fresh keeper
      input.addData(TsDoc(3L, ts("2026-12-01 00:00:00"), "alpha"))
      q.processAllAvailable()
      val got = spark.table("ttl_dedup_out")
        .filter(col("doc_id") < 900L).collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
      assert(got === Set((1L, true, 1L), (2L, false, 1L), (3L, true, 3L)))
    } finally q.stop()
  }

  test("TTL near-dup pairs only window-mates after bucket eviction") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val q = graft.streaming.DedupStream.nearDupCandidatesTtl(
        input.toDS().toDF("doc_id", "ts", "text"), ttlMinutes = 60)
      .writeStream.format("memory").queryName("neardup_ttl_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2026-01-01 10:00:00"), shared))
      q.processAllAvailable()
      // within TTL -> pairs with doc 1
      input.addData((2L, ts("2026-01-01 10:30:00"), shared))
      q.processAllAvailable()
      // advance watermark far past TTL, then fire timeouts
      input.addData((998L, ts("2026-06-01 00:00:00"), "unrelated flush body one"))
      q.processAllAvailable()
      input.addData((997L, ts("2026-12-01 00:00:00"), "second unrelated flush body"))
      q.processAllAvailable()
      // bucket evicted: doc 3 pairs with nothing despite matching 1/2
      input.addData((3L, ts("2026-12-01 00:00:00"), shared))
      q.processAllAvailable()
      val got = spark.table("neardup_ttl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)))
    } finally q.stop()
  }

  test("batch reconciliation of streaming candidates equals the batch near-dup answer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val shared = "one two three four five six seven eight nine ten eleven twelve"
    val corpus = Seq(
      (1L, shared),
      (2L, shared + " thirteen"),                                   // J ≈ 10/11 vs doc 1
      (3L, "completely unrelated content that shares no shingles"),
      (4L, "another disjoint document body with its own words"))
    val docs = corpus.toDF("doc_id", "text")
    // streaming pass forwards ALL band collisions (minEstJaccard = 0):
    // the sketch-level cut would drop borderline true pairs the exact
    // verify could still keep — equivalence with batch minhashLsh
    // only holds when reconciliation sees every collision
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream.nearDupCandidates(
        input.toDS().toDF("doc_id", "text"), minEstJaccard = 0.0)
      .writeStream.format("memory").queryName("reconcile_in")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(2): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val cands = spark.table("reconcile_in").select(col("a"), col("b"))
    // batch reconciliation: exact verify of the flagged pairs only
    val reconciled = Dedup.verifyPairs(docs, cands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(reconciled === batch)
    assert(reconciled.map(p => (p._1, p._2)) === Set((1L, 2L)))
  }

  test("streaming hourlyRollup emits closed hourly windows matching batch counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val rollup = EventsStream.hourlyRollup(
      input.toDS().withColumn("event_type", lit("view")).toDF())
    val q = rollup.writeStream.format("memory").queryName("rollup_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1L, 1L, ts("2026-01-01 10:05:00"), 1.5),
        Event(2L, 2L, ts("2026-01-01 10:55:00"), 2.5),
        Event(1L, 3L, ts("2026-01-01 11:01:00"), 3.0))
      q.processAllAvailable()
      input.addData(flush)
      q.processAllAvailable()

      val got = spark.table("rollup_out")
        .filter(col("bucket") < ts("2026-06-01 00:00:00"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(2), r.getDecimal(3).doubleValue())).toSet
      assert(got === Set(
        (ts("2026-01-01 10:00:00"), 2L, 4.0),
        (ts("2026-01-01 11:00:00"), 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming attribution candidates are exactly the in-window click pairs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventsStream.attributionCandidates(df)
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      input.addData(
        (1L, 1L, ts("2026-01-01 10:00:00"), "click", 0.0),
        (2L, 1L, ts("2026-01-01 10:30:00"), "click", 0.0),
        (3L, 1L, ts("2026-01-01 10:45:00"), "purchase", 9.0), // both clicks in window
        (4L, 1L, ts("2026-01-01 12:00:00"), "purchase", 7.0), // no click within 1h
        (5L, 2L, ts("2026-01-01 10:40:00"), "click", 0.0))    // other user
      q.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got === Set((3L, 1L), (3L, 2L)))
    } finally q.stop()
  }

  test("streaming histogram bins against the frozen batch profile; closed windows match hand counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // history profiles type "view" to lo=0, hi=20
    val history = Seq(
      (1L, 1L, ts("2026-01-01 08:00:00"), "view", Some(0.0)),
      (2L, 1L, ts("2026-01-01 08:30:00"), "view", Some(20.0))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val edges = Events.histogramEdges(history)
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val stream = input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventsStream.histogramStream(stream, edges).writeStream
      .format("memory").queryName("hist_out").outputMode("append").start()
    try {
      input.addData(
        (10L, 1L, ts("2026-01-01 10:05:00"), "view", 0.0),   // bin 0
        (11L, 1L, ts("2026-01-01 10:10:00"), "view", 10.0),  // bin 10
        (12L, 1L, ts("2026-01-01 10:20:00"), "view", 20.0),  // top clamp -> 19
        (13L, 1L, ts("2026-01-01 10:25:00"), "view", 25.0),  // drift above -> 19
        (14L, 1L, ts("2026-01-01 10:40:00"), "view", -5.0))  // drift below -> 0
      q.processAllAvailable()
      input.addData((99L, 9L, ts("2026-06-01 00:00:00"), "view", 0.0)) // watermark flush
      q.processAllAvailable()
      val got = spark.table("hist_out")
        .filter(col("bucket") === ts("2026-01-01 10:00:00"))
        .collect().map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
      assert(got === Seq((0L, 2L), (10L, 1L), (19L, 2L)))
    } finally q.stop()
  }

  test("streaming winsorize clamps against the frozen batch profile; output matches the batch recompute") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 100 history rows for type "api": values 1..100 → exact p99 = 99;
    // one "view" row so a second profile exists.
    val history = ((1L to 100L).map(i =>
        (i, 1L, ts("2026-01-01 08:00:00"), "api", Some(i.toDouble))) :+
      (200L, 2L, ts("2026-01-01 08:30:00"), "view", Some(5.0)))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val thresholds = Events.winsorizeThresholds(history)
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val stream = input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = EventsStream.winsorizeStream(stream, thresholds).writeStream
      .format("memory").queryName("wins_out").outputMode("append").start()
    try {
      // replay the history rows split across micro-batches
      input.addData((1L to 60L).map(i =>
        (i, 1L, ts("2026-01-01 08:00:00"), "api", i.toDouble)))
      q.processAllAvailable()
      input.addData((61L to 100L).map(i =>
        (i, 1L, ts("2026-01-01 08:00:00"), "api", i.toDouble)))
      input.addData(Seq((200L, 2L, ts("2026-01-01 08:30:00"), "view", 5.0)))
      q.processAllAvailable()
      val got = spark.table("wins_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
        .sortBy(_._1).toSeq
      val batch = Events.winsorize(history).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
        .toSeq
      assert(got === batch, "streamed clamp must equal the batch winsorize of the same rows")
      // the clamp actually fired exactly where the profile says
      assert(got.count(_._5) === 1)
      assert(got.find(_._1 == 100L).get._4 === 99.0)
    } finally q.stop()
  }

  test("file-drop → exact dedup → windowed rollup composes in one query and survives a mid-pipeline restart") {
    import graft.streaming.DedupStream
    import graft.streaming.DedupStream.TsDoc
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_compose").toString
    val watch = s"$dir/watch"; java.nio.file.Files.createDirectories(java.nio.file.Paths.get(watch))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def drop(name: String, rows: Seq[(Long, String, String)]): Unit = {
      val body = rows.map { case (id, t, tx) => s"$id,$t,$tx" }.mkString("\n")
      // atomic-ish: write then move, so the file source never reads a
      // half-written drop
      val tmp = java.nio.file.Paths.get(s"$dir/$name.tmp")
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$watch/$name"))
    }
    // One query: file source → flatMapGroupsWithState dedup → window
    // agg → parquet sink, all under ONE checkpoint. The three state
    // surfaces (file log, keeper state, window state) must restore
    // together.
    def start() = DedupStream.dedupedRollup(
        spark.readStream.schema(docSchema).csv(watch).as[TsDoc])
      .writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .start()

    drop("d1.csv", Seq(
      (1L, "2026-01-01 10:05:00", "alpha"),
      (2L, "2026-01-01 10:15:00", "alpha"), // in-batch dup
      (3L, "2026-01-01 10:20:00", "beta"),
      (4L, "2026-01-01 11:10:00", "gamma")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // mid-pipeline restart: doc 5 duplicates run-1 content (keeper
    // state check), doc 6 is fresh, doc 7 pushes the watermark
    drop("d2.csv", Seq(
      (5L, "2026-01-01 11:20:00", "alpha"), // cross-RESTART dup
      (6L, "2026-01-01 11:30:00", "delta"),
      (7L, "2026-01-01 18:00:00", "flush-1")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // one more drop so the post-restart watermark (17:50) emits the
      // closed 11:00 window
      drop("d3.csv", Seq((8L, "2026-01-01 23:00:00", "flush-2")))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(s"$dir/out")
      .filter(col("window_start") < lit(ts("2026-01-01 12:00:00")))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    // batch parity: exact dedup keepers over ALL dropped docs → hourly
    // counts of kept docs for the closed windows
    val all = Seq(
      (1L, ts("2026-01-01 10:05:00"), "alpha"), (2L, ts("2026-01-01 10:15:00"), "alpha"),
      (3L, ts("2026-01-01 10:20:00"), "beta"), (4L, ts("2026-01-01 11:10:00"), "gamma"),
      (5L, ts("2026-01-01 11:20:00"), "alpha"), (6L, ts("2026-01-01 11:30:00"), "delta"),
      (7L, ts("2026-01-01 18:00:00"), "flush-1"), (8L, ts("2026-01-01 23:00:00"), "flush-2"))
      .toDF("doc_id", "ts", "text")
    val batch = all.join(Dedup.exact(all).select(col("keep_id")), col("doc_id") === col("keep_id"))
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("kept_docs"))
      .filter(col("window_start") < lit(ts("2026-01-01 12:00:00")))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(got === batch,
      "composed stream must equal the batch dedup+rollup recompute")
    // and the cross-restart dup was actually suppressed: 11:00 window
    // keeps gamma + delta only
    assert(got === Set((ts("2026-01-01 10:00:00"), 2L), (ts("2026-01-01 11:00:00"), 2L)))
  }
}
