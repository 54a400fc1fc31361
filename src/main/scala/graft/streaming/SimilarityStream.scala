package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN serving — the online half of the PQ search family:
  * the index is trained ONCE on the static corpus (codebooks = model
  * parameters in plan literals; encoded codes = a checkpointed
  * 9-byte-per-vector table), then every micro-batch of query vectors
  * is scored against it inside `foreachBatch` — a stream-static join
  * shape like [[RidgeStream]], with NO state store: the model is
  * frozen, queries are stateless lookups.
  *
  * This is the production serving layout at scale: the corpus index
  * lives as a persisted codes table, query traffic arrives as a
  * stream, and each batch costs one codes scan + an exact re-rank of
  * ≤ rerank×|batch| vectors. Retraining is an OFFLINE concern — a new
  * index swaps in by restarting the serve loop (same reasoning as
  * [[RidgeStream]]'s derivable-state restart: the index is derivable
  * from the corpus, deliberately not hidden in a stream checkpoint).
  */
object SimilarityStream {

  /** Start the serving loop: `queries` is a STREAMING frame of
    * (vec_id, embedding) rows; `sink` receives each batch's
    * (query_id, neighbor_id, rank, cosine) result plus the batch id.
    * Query frames are external by definition here, so corpus rows
    * with colliding ids are never self-excluded (see
    * Similarity.notSelf).
    */
  def annPqServe(queries: DataFrame, corpus: DataFrame,
                 k: Int = 5, m: Int = 8, codebookSize: Int = 8,
                 iters: Int = 3, rerank: Int = 50)
                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val index = Similarity.pqIndexBuild(corpus, m, codebookSize, iters)
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Similarity.pqSearch(index, batch, k, rerank), id)
        ()
      }
      .start()
  }
}
