package graft

import graft.sources.{KafkaShaped, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka-wire-shaped adapter: schema contract, producer
  * determinism, round-trip fidelity, and the streaming consumer over
  * a record directory.
  */
class KafkaShapedSpec extends SparkSpec {

  private lazy val events = Tables(spark, "/root/testdata/sf0.001").events
  private val valueSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("records carry the exact Kafka source schema") {
    val recs = KafkaShaped.toRecords(events, "events", 8, "user_id", "ts")
    // names and types are the contract; nullability is tightened by
    // the literal-valued metadata columns
    assert(recs.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      KafkaShaped.recordSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("offsets are dense per partition and assignment is key-deterministic") {
    val recs = KafkaShaped.toRecords(events, "events", 8, "user_id", "ts").cache()
    val parts = recs.groupBy("partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"), count(lit(1)).as("n"))
      .collect()
    assert(parts.nonEmpty)
    parts.foreach { r =>
      assert(r.getLong(1) === 0L, "offsets start at 0")
      assert(r.getLong(2) === r.getLong(3) - 1, "offsets are dense")
    }
    // same key -> same partition, across independent producer runs
    val again = KafkaShaped.toRecords(events, "events", 8, "user_id", "ts")
    val disagree = recs
      .select(col("key").cast("string").as("k"), col("partition").as("p1")).distinct()
      .join(again.select(col("key").cast("string").as("k"), col("partition").as("p2")).distinct(), "k")
      .filter(col("p1") =!= col("p2")).count()
    assert(disagree === 0L)
    // offsets are replay-deterministic too (exactly-once sinks key on
    // (partition, offset)): the full record assignment must reproduce
    val offsetDisagree = recs
      .select(col("value").cast("string").as("v"), col("partition").as("p1"), col("offset").as("o1"))
      .join(again.select(col("value").cast("string").as("v"), col("partition").as("p2"), col("offset").as("o2")), "v")
      .filter(col("p1") =!= col("p2") || col("o1") =!= col("o2")).count()
    assert(offsetDisagree === 0L)
    recs.unpersist()
  }

  test("producer -> consumer round-trip preserves every typed column") {
    val recs = KafkaShaped.toRecords(events, "events", 4, "event_id", "ts")
    val back = KafkaShaped.parse(recs, valueSchema)
    assert(back.columns.take(4).toSeq === Seq("topic", "partition", "offset", "timestamp"))
    // ts included: the wire format must preserve MICROSECONDS (the
    // to_json default truncates to millis)
    val want = events.select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).sortBy(_._1)
    val got = back.select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming consumer over a record directory matches the batch parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka").toString
    val recs = KafkaShaped.toRecords(events.limit(200), "events", 4, "user_id", "ts")
    KafkaShaped.writeRecords(recs, s"$dir/records")
    val parsed = KafkaShaped.parse(
      KafkaShaped.streamFromDirectory(spark, s"$dir/records"), valueSchema)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = parsed.writeStream.format("memory").queryName("kafka_shaped_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kafka_shaped_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = events.limit(200).groupBy(col("event_type")).agg(count(lit(1)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally q.stop()
  }
}
