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

  /** Streaming CCNet gate — the ingest-time deployment of the frozen
    * perplexity model ([[Curation.pplModel]]): each micro-batch is
    * scored under the FROZEN unigram LM (vocabulary-bounded state,
    * broadcast-joined — no state store), cut at the frozen
    * per-language terciles, and kept at the per-bucket rates. A
    * doc's verdict is a pure function of (doc, model), so batching
    * never changes it (spec-pinned: the streamed union equals the
    * one-shot [[Curation.pplFilter]] doc-for-doc when the model was
    * fit on the full corpus) — exactly how CCNet runs its shipped LM
    * over incoming CommonCrawl shards.
    */
  def pplGateServe(documents: DataFrame, model: Curation.PplModel,
                   rates: Map[String, Int] = Map("head" -> 10000, "middle" -> 5000, "tail" -> 0))
                  (sink: (DataFrame, Long) => Unit): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Curation.pplGate(model, batch, rates), id)
        ()
      }
      .start()
}
