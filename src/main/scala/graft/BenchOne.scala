package graft
import org.apache.spark.sql.SparkSession

/** Focused micro-bench: time only the named queries (all of
  * SparkEntry.queries if none given) — min of two runs each, same
  * protocol as [[Bench]] — for iterating on a single operator
  * without paying the full-surface run.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench-one")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      println(f"$n%s: ${math.min(a, b)}%.2f s  (runs $a%.2f, $b%.2f)")
    }
    spark.stop()
  }
}
