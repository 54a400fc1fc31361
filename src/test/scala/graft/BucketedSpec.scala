package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Bucketed storage must let key-aligned aggregations and self-joins
  * plan with ZERO exchanges — the pre-shuffled-storage contract.
  */
class BucketedSpec extends SparkSpec {

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
  }

  test("groupBy and self-join on the bucket key plan without a shuffle") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    rmrf(new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:") + "/events_bucketed"))
    Bucketed.write(t.events.select(col("event_id"), col("user_id"), col("value")),
      "events_bucketed", "user_id", 8)
    val b = spark.table("events_bucketed")

    val agg = b.groupBy(col("user_id")).agg(sum(col("value")))
    assert(!agg.queryExecution.executedPlan.toString.contains("ShuffleExchange"),
      "bucketed groupBy should not shuffle")

    // Force the non-broadcast path: this is the fact-join-fact shape
    // where bucketing replaces BOTH shuffles.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = b.as("x").join(b.as("y"), "user_id")
      assert(!joined.queryExecution.executedPlan.toString.contains("ShuffleExchange"),
        "bucketed self-join should not shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // and the data survives the round-trip
    assert(b.count() === t.events.count())
    spark.sql("DROP TABLE events_bucketed")
  }
}
