package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.operators.Ridge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming model scoring — the reference's production loop: fetch
  * today's rows, score them with the model trained on everything up
  * to yesterday, then fold today into the training history
  * (finanalyzer's update-then-analyze cycle, findatabase.py:196 +
  * the regressor demo's fit/evaluate split).
  *
  * Spark-native shape: the model is MODEL-PARAMETER state (7
  * doubles), not row state — so no state store is involved. Each
  * micro-batch is scored inside `foreachBatch`, where the current
  * coefficients enter the batch plan as literals (re-planned per
  * batch, the same broadcast-state pattern as
  * [[EventsStream.enrichScd]]); after scoring, the batch joins the
  * training history and the model refits for the NEXT batch. Scoring
  * therefore never sees a model trained on its own rows —
  * walk-forward evaluation semantics, matching TimeSeriesSplit's
  * ordering guarantee ([[graft.operators.CvEval]]).
  *
  * The history handle is an eagerly-materialized lineage-free frame
  * (localCheckpoint), so the refit never replays upstream batches.
  * On restart the caller re-seeds history from its durable store
  * (e.g. the [[graft.sources.FileDrop]] upsert target) — history is
  * derivable state, deliberately NOT hidden in a checkpoint.
  */
object RidgeStream {

  /** Start the walk-forward scoring loop over a streaming events
    * frame (columns event_id, ts, value at minimum). `sink` receives
    * each batch's (event_id, value, prediction, residual) frame —
    * scored with the PRE-batch model — plus the batch id.
    */
  def walkForward(events: DataFrame, history0: DataFrame, alpha: Double = 1.0)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val cols = Seq("event_id", "ts", "value")
    val history = new AtomicReference[DataFrame](
      history0.selectExpr(cols: _*).localCheckpoint(true))
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val hist = history.get
        val beta = Ridge.fit(hist, alpha) // yesterday's model
        sink(Ridge.predictWith(batch, beta), id)
        history.set(
          hist.unionByName(batch.selectExpr(cols: _*)).localCheckpoint(true))
        ()
      }
      .start()
  }
}
