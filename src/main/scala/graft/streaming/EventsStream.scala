package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirrors of [[graft.operators.Events]]
  * (SURVEY §2 #33/#34) — the incremental form of the reference's
  * continuously-appended fact table (finanalyzer
  * findatabase.py:196 `update_database` re-runs batch analytics
  * after every append; here the analytics ARE the stream).
  *
  * Scale design: every job is keyed-state streaming — state is
  * partitioned by group key across executors and bounded per key.
  * The windowed/session jobs are watermark-evicted and append-only
  * (safe for an exactly-once parquet or Kafka sink); the quantile
  * monitor instead keeps ONE fixed-size sketch per key forever
  * (state = O(distinct keys), see its doc) and emits update-mode
  * rows for live dashboards, not append-only sinks.
  */
object EventsStream {

  /** Input row for typed sessionization. `value` rides along for the
    * session total.
    */
  case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  /** Open-session state kept per user between micro-batches.
    * Timestamps are epoch millis (second-truncated, matching the
    * batch operator); the value total is accumulated in integer
    * cents so state merge order can never change the result.
    */
  case class OpenSession(sessionId: Long, startMs: Long, endMs: Long,
                         nEvents: Long, totalCents: Long)

  /** Full per-user state: the session counter survives session
    * closure (a timeout must NOT reset numbering — the next session
    * after a quiet period needs a fresh id, or the sink sees
    * duplicate (user_id, session_id) keys). Post-timeout state is
    * one long per user — O(keys), the same bound as any keyed
    * streaming aggregation.
    */
  case class SessState(nextSessionId: Long, open: Option[OpenSession])

  /** Emitted closed session — same shape as the batch
    * [[graft.operators.Events.sessionize]] output.
    */
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     start_ts: Timestamp, end_ts: Timestamp, total_value: Double)

  /** Cents with the same rounding as the batch path's
    * `cast(value AS DECIMAL(12,2))` — HALF_UP (away from zero).
    * `math.round` half-rounds toward +∞, which differs on negative
    * exact half-cents (−1.005 → −100 vs the cast's −101).
    */
  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.unscaledValue().longValueExact()

  private def toSession(userId: Long, s: OpenSession): Session =
    Session(userId, s.sessionId, s.nEvents,
      new Timestamp(s.startMs), new Timestamp(s.endMs), s.totalCents / 100.0)

  /** Tumbling 1-hour rollup per event_type with a watermark — the
    * streaming form of [[graft.operators.Events.hourlyRollup]].
    *
    * Differences forced by streaming semantics: `n_users` is
    * `approx_count_distinct` (exact distinct would need unbounded
    * per-window user sets in state), and a window only emits once the
    * watermark passes its end (append mode). Partial aggregation
    * still happens map-side per micro-batch; state per window×type is
    * O(1).
    */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("total_value"),
        approx_count_distinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"), col("n_users"))

  /** Windowed value histogram over FROZEN bin edges — the streaming
    * form of [[graft.operators.Events.histogram]], and the standard
    * streaming distribution-monitoring shape: the per-type [lo, hi)
    * profile comes from a BATCH pass over history
    * ([[graft.operators.Events.histogramEdges]]) and joins the stream
    * as a broadcast static frame, so the windowed count is stateless
    * per (window, type, bin) — O(bins) state per window×type, no
    * unbounded per-window extrema. Drift shows up as mass in the
    * clamp bins (0 and bins−1); re-profile offline when it does.
    * Binning reuses the batch operator's exact expression, so a
    * closed window's counts equal the batch histogram of the same
    * rows binned against the same edges.
    */
  def histogramStream(events: DataFrame, edges: DataFrame, bins: Int = 20,
                      windowLen: String = "1 hour",
                      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .filter(col("value").isNotNull)
      .join(broadcast(edges), "event_type")
      .withColumn("bin", graft.operators.Events.binIndex(bins))
      .groupBy(window(col("ts"), windowLen), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("bin"), col("n"))

  /** Streaming winsorization against FROZEN batch thresholds — the
    * streaming form of [[graft.operators.Events.winsorize]], closing
    * the monitoring pair with [[histogramStream]]: the per-type p99
    * clamp comes from a BATCH pass over history
    * ([[graft.operators.Events.winsorizeThresholds]] — exact
    * two-pass histogram rank selection, not a sketch) and joins the
    * stream as a broadcast static frame. The clamp itself is
    * stateless row-at-a-time (no window, no state store), so the
    * operator is pure map-side work per micro-batch; a static frame
    * is re-planned each batch, so re-profiling offline takes effect
    * on the next batch with no restart. Rows clamp with the batch
    * operator's exact expression, so the streamed output over any
    * prefix equals the batch winsorize of the same rows against the
    * same thresholds. Threshold drift shows up as the `clipped` rate
    * moving away from 1%; re-profile when it does.
    */
  def winsorizeStream(events: DataFrame, thresholds: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .join(broadcast(thresholds), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        least(col("value"), col("p99")).as("value_w"),
        (col("value") > col("p99")).as("clipped"))

  /** Gap-based sessionization via the built-in `session_window`
    * aggregation — the declarative alternative to the
    * flatMapGroupsWithState form below when only per-session
    * aggregates (not custom state transitions) are needed. State
    * merging, watermark eviction, and session merging are all
    * engine-managed.
    */
  def sessionizeWindowed(events: DataFrame, gapMinutes: Int = 30,
                         watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"), col("n_events"), col("total_value"))

  /** Live per-key quantile estimates emitted after each micro-batch. */
  case class QuantileUpdate(event_type: String, n_seen: Long,
                            p50: Double, p90: Double, p99: Double)

  /** Streaming percentile monitoring: one mergeable t-digest
    * ([[graft.plans.TDigest]]) per event_type held in keyed state and
    * folded forward across micro-batches — the streaming form of the
    * batch `fin_quantiles_sketch` (null values skipped, like the
    * batch aggregate). State per key is the serialized digest:
    * O(compression) centroids REGARDLESS of stream length, which is
    * the entire point — exact streaming quantiles would need
    * unbounded per-key history. Keys are never evicted (a lifetime
    * monitor over a LOW-CARDINALITY key like event_type; for dirty /
    * unbounded key domains add an idle timeout). Update-mode output
    * — each micro-batch re-emits touched keys' current p50/p90/p99 —
    * so the sink is a dashboard/upsert store, NOT an append-only file.
    */
  def quantileSketch(events: DataFrame, compression: Double = 100.0): Dataset[QuantileUpdate] = {
    import events.sparkSession.implicits._
    events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], QuantileUpdate](GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[(String, Double)], state: GroupState[Array[Byte]]) =>
          val d = state.getOption.map(graft.plans.TDigest.deserialize)
            .getOrElse(new graft.plans.TDigest(compression))
          batch.foreach { case (_, v) => d.add(v) }
          state.update(d.serialize())
          QuantileUpdate(key, d.size, d.quantile(0.5), d.quantile(0.9), d.quantile(0.99))
      }
  }

  /** Typed input for the streaming funnel. */
  case class FunnelEvent(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  /** Per-user funnel progress: the stage machine is MONOTONE, so
    * state is four longs per user forever — no event history.
    */
  case class FunnelState(stage: Int, firstViewMs: Long, firstClickMs: Long,
                         firstPurchaseMs: Long)

  /** Emitted after each micro-batch that touches the user (update
    * mode) — same columns as the batch [[graft.operators.Events.funnel]].
    */
  case class FunnelUpdate(user_id: Long, first_view: Option[Timestamp],
                          first_click: Option[Timestamp],
                          first_purchase: Option[Timestamp], stage: Long)

  /** Streaming form of [[graft.operators.Events.funnel]]: the ordered
    * view → click → purchase machine as keyed state. Each micro-batch
    * sorts its own events by (ts, event_id) and folds them through
    * the monotone stage transition (a click only counts once a view
    * has fired, a purchase only after a qualifying click), then emits
    * the user's current funnel row. State per user is one
    * [[FunnelState]] — O(keys), independent of stream length.
    * In-order delivery within the state fold matches the batch
    * operator; events arriving across micro-batches out of order can
    * only UNDER-advance the funnel (the same direction as the batch
    * semantics' "after" requirement), never invent a conversion.
    */
  def funnel(events: Dataset[FunnelEvent]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val absent = Long.MinValue // sign-encoding would misread pre-1970 timestamps
          var st = state.getOption.getOrElse(FunnelState(0, absent, absent, absent))
          // order by SECOND-truncated time, like the batch operator's
          // (tsec, event_id) window order — raw-millis ordering would
          // fold same-second events differently and diverge on ties
          batch.toVector
            .sortBy(e => (math.floorDiv(e.ts.getTime, 1000L), e.event_id))
            .foreach { e =>
            val tsec = math.floorDiv(e.ts.getTime, 1000L) * 1000L
            (e.event_type, st.stage) match {
              case ("view", 0)     => st = st.copy(stage = 1, firstViewMs = tsec)
              case ("click", 1)    => st = st.copy(stage = 2, firstClickMs = tsec)
              case ("purchase", 2) => st = st.copy(stage = 3, firstPurchaseMs = tsec)
              case _               => // no transition: stage machine is monotone
            }
          }
          state.update(st)
          def opt(ms: Long) = if (ms != absent) Some(new Timestamp(ms)) else None
          FunnelUpdate(userId, opt(st.firstViewMs), opt(st.firstClickMs),
            opt(st.firstPurchaseMs), st.stage.toLong)
      }
  }

  /** Windowed grouped top-k THROUGH the custom heap aggregate:
    * hourly top spenders per event_type, computed as two CHAINED
    * streaming aggregations on the same event-time window (per-user
    * exact-cents totals, then [[graft.plans.TopKLongPairs]] over the
    * totals) — Spark's multiple-stateful-operator support carries
    * the watermark through both, and the k-bounded heap buffers
    * merge inside the state store exactly like they merge map-side
    * in batch. Append mode: a window's top-k emits once, when the
    * watermark closes it.
    */
  def topUsersWindowed(events: DataFrame, k: Int = 3,
                       watermarkDelay: String = "2 hours"): DataFrame = {
    val cents = (col("value").cast("decimal(12,2)") * 100).cast("long")
    val per = events
      .filter(col("value").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("user_id"))
      .agg(sum(cents).as("cents"))
    per
      .groupBy(col("window"), col("event_type"))
      .agg(graft.plans.TopKLongPairs(col("cents"), col("user_id"), k).as("top"))
      .select(col("window").getField("start").as("window_start"), col("event_type"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("window_start"), col("event_type"), col("t.id").as("user_id"),
        col("t.score").as("total_cents"), (col("pos") + 1).cast("long").as("rank"))
  }

  case class ValueEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  /** Ring buffer of the user's last ≤ `bars` values in exact cents —
    * bounded state per key (20 longs), never event history.
    */
  case class BaselineState(recentCents: Seq[Long])

  case class AnomalyVerdict(user_id: Long, event_id: Long, value: Double,
                            zscore: Option[Double], is_anomaly: Boolean)

  /** Streaming mirror of [[graft.operators.Events.anomalies]]: each
    * event scored against the SAME user's previous ≤ 20 values,
    * kept as an exact-cents ring buffer in keyed state. The moment
    * arithmetic reproduces the batch operator bit-for-bit: the exact
    * cents sum / 100.0 equals the batch's DECIMAL(12,2)-sum→double
    * cast (one correctly-rounded division each), the cents² sum /
    * 10⁴ equals the scale-4 product sum cast, and the z-score uses
    * the same 6-decimal-rounded stddev. In-order within a
    * micro-batch via the (ts ms, event_id) sort; cross-batch
    * stragglers score against the state as of arrival (the standard
    * streaming caveat, same class as [[funnel]]'s).
    */
  def anomalies(events: Dataset[ValueEvent], bars: Int = 20,
                zCut: Double = 3.0): Dataset[AnomalyVerdict] = {
    import events.sparkSession.implicits._
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue() + 0.0
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BaselineState, AnomalyVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[ValueEvent], state: GroupState[BaselineState]) =>
          var recent = state.getOption.map(_.recentCents).getOrElse(Seq.empty)
          val out = Vector.newBuilder[AnomalyVerdict]
          batch.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val n = recent.size
            val z: Option[Double] = if (n > 1) {
              val s = recent.sum / 100.0                      // == dec2-sum → double
              // Squares accumulate in BigInt — c*c overflows Long for
              // |value| above ~$3e7 (cents ~3e9) and would silently
              // diverge from the batch operator's DECIMAL(25,4) sum.
              // The exact scale-4 sum is rounded to double ONCE, the
              // same single rounding as the batch decimal→double cast.
              val sq = recent.foldLeft(BigInt(0))((acc, c) => acc + BigInt(c) * BigInt(c))
              val s2 = new java.math.BigDecimal(sq.bigInteger, 4).doubleValue
              val varNum = n.toDouble * s2 - s * s
              val sd = round6(math.sqrt(varNum / (n.toDouble * (n - 1).toDouble)))
              if (sd > 0.0) Some(round6((e.value - s / n) / sd)) else None
            } else None
            out += AnomalyVerdict(userId, e.event_id, e.value, z,
              z.exists(v => math.abs(v) > zCut))
            recent = (recent :+ cents(e.value)).takeRight(bars)
          }
          state.update(BaselineState(recent))
          out.result().iterator
      }
  }

  case class TransitionEvent(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  /** The single remembered event per user between micro-batches. */
  case class LastEvent(tsMs: Long, eventId: Long, eventType: String)

  /** One consecutive-pair observation — the streaming unit the batch
    * [[graft.operators.Events.transitions]] matrix aggregates.
    */
  case class TransitionPair(user_id: Long, from_type: String, to_type: String)

  /** Streaming form of [[graft.operators.Events.transitions]]: emits
    * a (from_type → to_type) pair for every pair of consecutive
    * same-user events, keeping ONE last-seen event per user as state
    * (O(keys), independent of stream length) — the "stateful
    * last-value per key" pattern. Each micro-batch sorts its own
    * slice by (ts ms, event_id) before folding, matching the batch
    * window order; events split across micro-batches out of
    * chronological order pair in arrival order instead (the standard
    * streaming caveat, same class as [[funnel]]'s). Downstream
    * aggregation into the probability matrix is a plain streaming
    * groupBy count — pairs are append-only.
    */
  def transitionPairs(events: Dataset[TransitionEvent]): Dataset[TransitionPair] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[TransitionEvent], state: GroupState[LastEvent]) =>
          var last = state.getOption
          val out = Vector.newBuilder[TransitionPair]
          batch.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            last.foreach(l => out += TransitionPair(userId, l.eventType, e.event_type))
            last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Stream enrichment against a SLOWLY-CHANGING dimension (SCD
    * type 2): each event joins the dimension VERSION that was valid
    * at its event time — `key matches AND valid_from ≤ ts < valid_to`
    * (open versions carry NULL valid_to). This is a stream-static
    * join: the static side is re-planned every micro-batch, so
    * appending a new dimension version takes effect on the next batch
    * with no restart, and Spark broadcasts the (small) dimension into
    * each batch's join — the broadcast-state pattern without any
    * user-managed state store. Events with no valid version pass
    * through with NULL attributes (left join): losing events to a
    * late-arriving dimension would be silent data loss.
    */
  def enrichScd(events: DataFrame, dimVersions: DataFrame): DataFrame =
    events.join(dimVersions,
      events("user_id") === dimVersions("key") &&
        events("ts") >= dimVersions("valid_from") &&
        (dimVersions("valid_to").isNull || events("ts") < dimVersions("valid_to")),
      "left")
      .drop("key", "valid_from", "valid_to")

  /** Streaming attribution candidates: every (purchase, click) pair
    * by the same user with the click inside the lookback window — a
    * STREAM-STREAM inner join with watermarks on both sides. The
    * time-range join condition bounds how long click state must be
    * buffered (watermark + window), so Spark evicts old clicks
    * instead of holding the stream forever — the state-size contract
    * that makes a stream-stream join runnable indefinitely.
    *
    * Deliberately emits ALL in-window clicks per purchase, not the
    * last-touch winner: picking a per-purchase winner needs the
    * window CLOSED (a late click can displace the current winner),
    * so the winner pick belongs downstream — batch
    * [[graft.operators.Events.attribution]] is the reconciliation
    * (same contract as DedupStream's candidates + batch verify).
    */
  def attributionCandidates(events: DataFrame, windowHours: Int = 1,
                            watermarkDelay: String = "2 hours"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermarkDelay)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowHours HOURS"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("c_ts"), col("p_ts"), col("value"))
  }

  /** Exactly-once parquet sink for closed sessions: `foreachBatch`
    * writing each micro-batch to its own `batch_id=<id>` partition
    * directory with OVERWRITE. Spark's exactly-once contract is
    * checkpointed offsets + an idempotent sink; a replayed batch
    * (crash between sink write and offset commit, or a restart)
    * rewrites the SAME directory instead of appending duplicates.
    * The output reads back as one partitioned parquet table.
    */
  def sessionSinkExactlyOnce(sessions: Dataset[Session], dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    sessions.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Session], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/out/batch_id=$batchId")
      }
      .start()

  /** Gap-based sessionization with `flatMapGroupsWithState` — the
    * streaming form of [[graft.operators.Events.sessionize]].
    *
    * Per user (the group key): events in each micro-batch are sorted
    * by (ts, event_id), folded into the open session from state, and
    * sessions close either when a later event exceeds the gap or when
    * the event-time timeout fires (watermark passed end + gap, so no
    * in-order event can extend the session anymore). Out-of-order
    * events are handled within the watermark delay; later ones are
    * dropped by the watermark, the same contract as any streaming
    * aggregation.
    *
    * State per key is one fixed-size [[OpenSession]]; emitted rows
    * are append-only closed sessions.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val out = st.open.map(toSession(userId, _)).toVector
            // Keep only the counter; no new timeout needed (nothing
            // left to flush, and the counter must survive).
            state.update(SessState(st.nextSessionId, None))
            out.iterator
          } else {
            val st = state.getOption.getOrElse(SessState(1L, None))
            var nextId = st.nextSessionId
            var open = st.open
            val evs = batch.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Vector.newBuilder[Session]
            evs.foreach { e =>
              val tsec = math.floorDiv(e.ts.getTime, 1000L) * 1000L
              open match {
                case Some(s) if tsec >= s.startMs - gapMs && tsec <= s.endMs + gapMs =>
                  // In-session (a late event may extend the START too).
                  open = Some(s.copy(
                    startMs = math.min(s.startMs, tsec), endMs = math.max(s.endMs, tsec),
                    nEvents = s.nEvents + 1, totalCents = s.totalCents + cents(e.value)))
                case Some(s) if tsec < s.startMs - gapMs =>
                  // Late-but-within-watermark event, disjoint BEFORE the
                  // open session: emit it as its own session now. (Ids
                  // are assigned in arrival order here — a batch rerun
                  // over the same data would number it earlier.)
                  closed += Session(userId, nextId, 1,
                    new Timestamp(tsec), new Timestamp(tsec), cents(e.value) / 100.0)
                  nextId += 1
                case Some(s) =>
                  closed += toSession(userId, s)
                  open = Some(OpenSession(nextId, tsec, tsec, 1, cents(e.value)))
                  nextId += 1
                case None =>
                  open = Some(OpenSession(nextId, tsec, tsec, 1, cents(e.value)))
                  nextId += 1
              }
            }
            state.update(SessState(nextId, open))
            open.foreach { s =>
              // Timeout may not be <= current watermark; clamp up.
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Input row for typed debounce (keyed by user × type). */
  case class DebEvent(user_id: Long, event_type: String, event_id: Long, ts: Timestamp)

  /** Open burst kept per (user, type) between micro-batches: the
    * keeper so far, the last event time (the gap anchor), and the
    * burst size. O(1) per key.
    */
  case class OpenBurst(burstId: Long, keeperId: Long, startMs: Long,
                       lastMs: Long, nBurst: Long)

  /** Per-key debounce state — like [[SessState]], the burst counter
    * must survive burst closure so ids never repeat.
    */
  case class DebState(nextBurstId: Long, open: Option[OpenBurst])

  /** Emitted closed burst — same shape as the batch
    * [[graft.operators.Events.debounce]] output row.
    */
  case class Burst(user_id: Long, event_type: String, burst_id: Long,
                   keeper_id: Long, start_ts: Timestamp, n_suppressed: Long)

  private def toBurst(e: DebEvent, b: OpenBurst): Burst =
    Burst(e.user_id, e.event_type, b.burstId, b.keeperId,
      new Timestamp(b.startMs), b.nBurst - 1)

  /** Streaming mirror of [[graft.operators.Events.debounce]]: the
    * retry/double-fire suppressor as keyed state. A burst stays open
    * while same-(user, type) events keep arriving within `gapSeconds`
    * of the LAST one; it closes — emitting one append-mode row — when
    * a later event lands beyond the gap or the event-time timeout
    * (watermark past last + gap) fires. State per key is one open
    * burst + the id counter, evicted down to the counter on timeout —
    * O(distinct (user, type) keys), the standard bound.
    *
    * A late-but-within-watermark event that lands in-gap of the open
    * burst extends it and may even RETAKE the keeper (the batch rule:
    * min (tsec, event_id)); late events disjoint BEFORE the open
    * burst chain among themselves within the micro-batch (a delayed
    * retry pair still collapses to one keeper) and flush as one
    * burst at batch end, numbered in arrival order; if a backward
    * keeper-retake later pulls the open burst within gap of the
    * still-open late burst, the two merge into one (batch parity) —
    * the residual caveats (late bursts cannot be extended by a LATER
    * micro-batch, and a late burst already flushed earlier in the
    * same batch cannot be un-emitted) are the same class as
    * [[sessionize]]'s late-event branch, reconciled by the batch
    * operator when exactness matters.
    */
  def debounce(events: Dataset[DebEvent], gapSeconds: Int = 300,
               watermarkDelay: String = "1 hour"): Dataset[Burst] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebState, Burst](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), batch: Iterator[DebEvent], state: GroupState[DebState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val out = st.open.map(b =>
              Burst(key._1, key._2, b.burstId, b.keeperId,
                new Timestamp(b.startMs), b.nBurst - 1)).toVector
            state.update(DebState(st.nextBurstId, None))
            out.iterator
          } else {
            val st = state.getOption.getOrElse(DebState(1L, None))
            var nextId = st.nextBurstId
            var open = st.open
            // Late-but-within-watermark events disjoint BEFORE the
            // open burst chain among THEMSELVES within this batch
            // (a delayed retry pair must still collapse to one
            // keeper + n_suppressed=1, not two singletons); the
            // chained late burst flushes at batch end because state
            // holds exactly one open burst.
            var lateOpen: Option[OpenBurst] = None
            val evs = batch.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Vector.newBuilder[Burst]
            def flushLate(e: DebEvent): Unit = lateOpen.foreach { lb =>
              closed += Burst(e.user_id, e.event_type, lb.burstId, lb.keeperId,
                new Timestamp(lb.startMs), lb.nBurst - 1)
              lateOpen = None
            }
            evs.foreach { e =>
              val tsec = math.floorDiv(e.ts.getTime, 1000L) * 1000L
              open match {
                case Some(b) if tsec >= b.startMs - gapMs && tsec <= b.lastMs + gapMs =>
                  // In-burst; a late earlier event can retake the keeper.
                  val retake = tsec < b.startMs ||
                    (tsec == b.startMs && e.event_id < b.keeperId)
                  val (ks, ki) =
                    if (retake) (tsec, e.event_id) else (b.startMs, b.keeperId)
                  var nb = b.copy(keeperId = ki, startMs = ks,
                    lastMs = math.max(b.lastMs, tsec), nBurst = b.nBurst + 1)
                  // A backward retake extends the open burst toward the
                  // past and can bring the set-aside late burst within
                  // gap of it — batch semantics would see ONE burst, so
                  // merge instead of flushing two. The late burst
                  // started strictly earlier (it was disjoint-before),
                  // so its keeper wins the min-(ts, id) rule; its
                  // in-batch id is simply retired (ids must never
                  //  repeat, holes are fine). Late bursts ALREADY
                  // flushed to `closed` in this batch are past help —
                  // that residual stays with the cross-batch caveat.
                  if (retake) lateOpen.foreach { lb =>
                    if (lb.lastMs >= nb.startMs - gapMs) {
                      nb = nb.copy(keeperId = lb.keeperId, startMs = lb.startMs,
                        nBurst = nb.nBurst + lb.nBurst)
                      lateOpen = None
                    }
                  }
                  open = Some(nb)
                case Some(b) if tsec < b.startMs - gapMs =>
                  // Late disjoint before the open burst: chain onto
                  // the in-batch late burst while within gap of it,
                  // else flush it and start a fresh one.
                  lateOpen match {
                    case Some(lb) if tsec >= lb.startMs - gapMs && tsec <= lb.lastMs + gapMs =>
                      lateOpen = Some(lb.copy(
                        lastMs = math.max(lb.lastMs, tsec), nBurst = lb.nBurst + 1))
                    case _ =>
                      flushLate(e)
                      lateOpen = Some(OpenBurst(nextId, e.event_id, tsec, tsec, 1L))
                      nextId += 1
                  }
                case Some(b) =>
                  flushLate(e)
                  closed += toBurst(e, b)
                  open = Some(OpenBurst(nextId, e.event_id, tsec, tsec, 1L))
                  nextId += 1
                case None =>
                  open = Some(OpenBurst(nextId, e.event_id, tsec, tsec, 1L))
                  nextId += 1
              }
            }
            evs.lastOption.foreach(flushLate)
            state.update(DebState(nextId, open))
            open.foreach { b =>
              state.setTimeoutTimestamp(
                math.max(b.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
