package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming curation — the ingest-time deployment of the trained
  * quality classifier ([[graft.operators.QualityModel]]): a corpus
  * crawler's document stream is gated batch-by-batch with FROZEN
  * coefficients fit offline, the way production pretraining pipelines
  * run their quality model over incoming shards (fit rarely, serve
  * every batch).
  *
  * Spark-native shape: the model is MODEL-PARAMETER state (7
  * doubles), not row state — no state store; the coefficients enter
  * each micro-batch's plan as literals inside `foreachBatch` (the
  * [[RidgeStream]] pattern). Each batch is scored and gated
  * independently — per-document features only, so the verdict for a
  * doc never depends on which batch carried it (spec-pinned: the
  * streamed verdicts equal the one-shot batch gate doc-for-doc).
  */
object CurationStream {

  /** Start the frozen-model quality gate over a streaming documents
    * frame (columns doc_id, lang, text at minimum). `sink` receives
    * each batch's [[Curation.filterGateModel]] frame — heuristic
    * verdict columns + model_score/model_ok + the composed keep —
    * plus the batch id.
    */
  def qualityGateServe(documents: DataFrame, beta: Array[Double], minScore: Double = 0.5)
                      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Curation.filterGateModel(batch, beta, minScore), id)
        ()
      }
      .start()
}
