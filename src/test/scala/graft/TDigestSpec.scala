package graft

import graft.operators.FinAnalytics
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The t-digest aggregate is approximate — the contract is a RANK
  * error bound vs the exact distribution, and that bound must hold
  * through Spark's partial-aggregate/shuffle/merge machinery at any
  * partitioning.
  */
class TDigestSpec extends SparkSpec {

  private val maxRankErr = 0.05

  /** Fraction of values ≤ x (the empirical rank of x). */
  private def rankOf(sorted: Array[Double], x: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, x)
    val pos = if (i >= 0) i + 1 else -(i + 1)
    pos.toDouble / sorted.length
  }

  test("quantileSketch rank error stays within bounds vs the exact distribution") {
    val events = Tables(spark, "/root/testdata/sf0.001").events
    val approx = FinAnalytics.quantileSketch(events).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = events.select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(approx.nonEmpty && approx.keySet === exact.keySet)
    approx.foreach { case (tpe, (p50, p90, p99)) =>
      val sorted = exact(tpe)
      assert(math.abs(rankOf(sorted, p50) - 0.50) <= maxRankErr, s"$tpe p50=$p50")
      assert(math.abs(rankOf(sorted, p90) - 0.90) <= maxRankErr, s"$tpe p90=$p90")
      assert(math.abs(rankOf(sorted, p99) - 0.99) <= maxRankErr, s"$tpe p99=$p99")
    }
  }

  test("digest merge is how partials combine: bound holds at 1 and at 32 partitions") {
    val events = Tables(spark, "/root/testdata/sf0.001").events
    val sorted = events.select(col("value")).collect().map(_.getDouble(0)).sorted
    Seq(1, 32).foreach { p =>
      val row = events.repartition(p)
        .agg(graft.plans.TDigestQuantiles(col("value"), Seq(0.5, 0.99), 100.0).as("qs"))
        .select(col("qs")(0), col("qs")(1)).head()
      assert(math.abs(rankOf(sorted, row.getDouble(0)) - 0.50) <= maxRankErr, s"p=$p p50")
      assert(math.abs(rankOf(sorted, row.getDouble(1)) - 0.99) <= maxRankErr, s"p=$p p99")
    }
  }

  test("streaming quantile sketch folds state across micro-batches within rank bounds") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    val q = graft.streaming.EventsStream.quantileSketch(
        input.toDS().toDF("event_type", "value"))
      .writeStream.format("memory").queryName("qsketch_out")
      .outputMode("update").start()
    try {
      // two micro-batches: the second must fold into the first's state
      val batch1 = (1 to 600).map(i => ("t", i.toDouble))
      val batch2 = (601 to 1000).map(i => ("t", i.toDouble))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val last = spark.table("qsketch_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(4)))
        .maxBy(_._1)
      assert(last._1 === 1000L, "state must accumulate across batches")
      assert(math.abs(last._2 - 500.0) <= 50.0, s"p50=${last._2}")
      assert(math.abs(last._3 - 990.0) <= 50.0, s"p99=${last._3}")
    } finally q.stop()
  }

  test("tdigest_quantiles is registered for SQL") {
    graft.plans.GraftExtensions.register(spark)
    spark.range(0, 10001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("td_probe")
    val qs = spark.sql("SELECT tdigest_quantiles(v) FROM td_probe").head().getSeq[Double](0)
    assert(math.abs(qs(0) - 5000.0) < 500.0)   // p50 of 0..10000
    assert(math.abs(qs(2) - 9900.0) < 500.0)   // p99
  }
}
