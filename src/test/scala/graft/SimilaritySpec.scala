package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The two-phase (fast-prune → exact re-rank) ANN must return exactly
  * what a single-phase exact scan returns — on real testdata, not a toy.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val embeddings: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Single-phase exact top-k (no fast prune) — the spec's oracle. */
  private def exactTopK(k: Int): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        cosineExact(decDot(col("qe"), col("embedding")), decNorm2(col("qe")), decNorm2(col("embedding"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
  }

  test("pruned annBruteForce equals the single-phase exact scan") {
    val got = Similarity.annBruteForce(embeddings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val want = exactTopK(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("embeddingNearDup pairs are symmetric-free and above threshold") {
    val rows = Similarity.embeddingNearDup(embeddings, threshold = 0.45).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.45))
  }
}
