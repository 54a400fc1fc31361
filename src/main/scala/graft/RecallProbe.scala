package graft

/** Dev probe: measured recall@5 of the BQ layouts vs the exact scan.
  * Not driver contract — run by hand when recording §2 numbers.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("recall-probe")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = operators.Similarity.annBruteForce(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def rec(rows: Array[org.apache.spark.sql.Row]): Double =
        rows.count(g => exact.contains((g.getLong(0), g.getLong(1)))).toDouble / exact.size
      val res = rec(operators.Similarity.annBqResidual(emb).collect())
      val flat = rec(operators.Similarity.annBq(emb).collect())
      println(f"RECALL $sf: residual=$res%.3f flat=$flat%.3f")
    }
    spark.stop()
  }
}
