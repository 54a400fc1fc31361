package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // Warm up the JVM (codegen compiler, shuffle machinery, parquet
    // footer reads) so the first timed query isn't charged for it.
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q_filter_project").foreach(fn => fn(spark, sfDir).count())
    // min of two runs per query: the second run reuses compiled
    // codegen classes, so this measures the operator's steady-state
    // throughput (what dominates at real scale) rather than one-time
    // Janino compilation, which is ~30% of wall-clock at bench SF.
    // A failed query must read as a failure (-1), not as a
    // suspiciously fast time.
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val (a, b) = (once(), once())
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
