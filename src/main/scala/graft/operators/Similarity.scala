package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity — near-dup pairs and nearest-neighbor search
  * over an `array<float>` column (SURVEY §2 #25-27).
  *
  * Scale design: the query side of every search broadcasts (queries
  * ≪ corpus); the corpus is scanned once, map-side, and only top-k
  * candidates reach a shuffle. The all-pairs near-dup variant prunes
  * with a codegen double cosine and verifies survivors with exact
  * decimal arithmetic — the expensive exact math touches only
  * near-threshold pairs.
  */
object Similarity {

  /** Near-duplicate pairs with exact-cosine ≥ threshold.
    * Two-phase: double-cosine prefilter with a 1e-3 margin (≫ the
    * ~1e-12 double-vs-exact error), then exact decimal verification —
    * output is identical to brute-force exact, at prune-phase cost.
    */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), col("a") < col("b"))
      .filter(cosineFast(col("ea"), col("eb")) >= threshold - 1e-3)
    pairs
      .withColumn("cosine",
        cosineExact(decDot(col("ea"), col("eb")), decNorm2(col("ea")), decNorm2(col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
      .orderBy(col("a"), col("b"))
  }

  /** Exact top-k cosine neighbors for the query set (vec_id ≡ 0 mod
    * 100). Queries broadcast over one corpus scan; ranking uses the
    * exact cosine with vec_id tiebreak so rank order is total.
    */
  def annBruteForce(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // Phase 1: native double cosine over the full scan, per-query
    // top-(k+20) — double vs exact differ < 1e-9, so the true top-k
    // always survives this cut. Phase 2: exact decimal re-rank of
    // the survivors only (the oracle-parity values).
    val wFast = Window.partitionBy(col("query_id")).orderBy(col("fast").desc, col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
      .withColumn("rf", row_number().over(wFast))
      .filter(col("rf") <= k + 20)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style search: the coarse quantizer assignment is the
    * pre-computed `label` column (in a full IVF build this is the
    * nearest-centroid id); search scans only the query's own cell —
    * the 1/nlist scan-pruning that makes ANN tractable at 100 TB.
    */
  def annIvf(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("label").as("qlabel"))
    val wFast = Window.partitionBy(col("query_id")).orderBy(col("fast").desc, col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .withColumn("fast", cosineFast(col("qe"), col("embedding")))
      .withColumn("rf", row_number().over(wFast))
      .filter(col("rf") <= k + 20)
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
