package graft

/** Dev probe: recall@5 of flat PQ vs wide-codebook PQ (cb=64) vs OPQ
  * (seeded-Hadamard init + signed-permutation refinement) vs the
  * exact scan. Not driver contract — run by hand when recording §2
  * numbers.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("opq-probe")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = operators.Similarity.annBruteForce(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def rec(rows: Array[org.apache.spark.sql.Row]): Double =
        rows.count(g => exact.contains((g.getLong(0), g.getLong(1)))).toDouble / exact.size
      val pq = rec(operators.Similarity.annPq(emb).collect())
      val wide = rec(operators.Similarity.annPq(emb, codebookSize = 64).collect())
      val opq = rec(operators.Similarity.annOpq(emb).collect())
      println(f"OPQ RECALL $sf: flat_pq=$pq%.3f pq_wide64=$wide%.3f opq=$opq%.3f")
    }
    spark.stop()
  }
}
