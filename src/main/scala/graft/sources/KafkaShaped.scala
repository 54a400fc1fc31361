package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing.hex60

/** Kafka-wire-shaped source/sink adapter.
  *
  * This container ships no Kafka connector jar, but the INTERFACE a
  * Kafka-backed deployment needs is just a schema contract: Spark's
  * Kafka source emits records as
  * `(key binary, value binary, topic, partition, offset, timestamp,
  * timestampType)` and every downstream transform works on that
  * DataFrame. This adapter implements the same contract over files:
  *
  *  - [[toRecords]] is the producer side — any DataFrame becomes
  *    wire records (key bytes, JSON value bytes, deterministic
  *    partition assignment, dense per-partition offsets);
  *  - [[parse]] is the consumer side — records back to typed columns
  *    via an EXPLICIT value schema (schema inference on a 100 TB
  *    stream is both a second pass and a correctness hazard);
  *  - [[streamFromDirectory]] tails a directory of record files as a
  *    Structured Streaming source.
  *
  * Swapping in real Kafka is `spark.readStream.format("kafka")` in
  * place of [[streamFromDirectory]] — the downstream plan is
  * unchanged because the schema is identical.
  */
object KafkaShaped {

  /** The Spark Kafka source's public record schema. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Producer side: serialize `df` into Kafka-shaped records.
    *
    * Partition assignment is content-hashed from the key (md5-based,
    * like the default murmur2-on-key-bytes producer but engine-stable
    * across runs and cluster sizes), and offsets are dense
    * `row_number`s per partition in (timestamp, key) order — the
    * broker's append order for a deterministic replay. The offset
    * window shuffles once on the partition id, exactly how the data
    * would land broker-side.
    */
  /** Timestamp wire format with MICROSECOND precision — to_json's
    * default truncates to milliseconds, which would silently degrade
    * every parsed ts (the source data is µs-resolution). Shared by
    * producer and consumer so the round-trip is exact.
    */
  val timestampWireFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def toRecords(df: DataFrame, topic: String, numPartitions: Int,
                keyCol: String, tsCol: String): DataFrame = {
    // Snapshot the payload BEFORE any metadata column is added: the
    // wire names (key/timestamp/...) may collide with input columns,
    // and resolving the JSON struct later would silently read the
    // overwritten values. Internal temp names are __-prefixed.
    val payload = to_json(struct(df.columns.map(col).toIndexedSeq: _*),
      Map("timestampFormat" -> timestampWireFormat))
    val rec = df.select(
        col(keyCol).cast("string").as("__key"),
        payload.as("__value"),
        col(tsCol).cast("timestamp").as("__timestamp"))
      .withColumn("__partition", partitionFor(col("__key"), numPartitions))
    // The trailing __value term makes the append order TOTAL up to
    // full-record duplicates (which are interchangeable) — offsets
    // must be replay-deterministic because exactly-once sinks key on
    // (partition, offset).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__partition"))
      .orderBy(col("__timestamp"), col("__key"), col("__value"))
    rec
      .withColumn("__offset", row_number().over(w).cast("long") - 1)
      .select(col("__key").cast("binary").as("key"),
        col("__value").cast("binary").as("value"),
        lit(topic).as("topic"),
        col("__partition").as("partition"),
        col("__offset").as("offset"),
        col("__timestamp").as("timestamp"),
        lit(1).as("timestampType")) // CreateTime
  }

  /** Consumer side: records → typed columns. Keeps the wire metadata
    * (topic/partition/offset/timestamp) alongside the decoded value
    * fields — exactly-once sinks key their idempotent writes on
    * (partition, offset).
    */
  def parse(records: DataFrame, valueSchema: StructType): DataFrame =
    records
      .withColumn("v", from_json(col("value").cast("string"), valueSchema,
        Map("timestampFormat" -> timestampWireFormat)))
      .select(Seq(col("topic"), col("partition"), col("offset"), col("timestamp")) ++
        valueSchema.fieldNames.map(f => col(s"v.$f").as(f)): _*)

  /** Write records as a partition-directory layout (one directory per
    * Kafka partition — the same pruning unit a broker gives you).
    */
  def writeRecords(records: DataFrame, path: String): Unit =
    records.write.mode("overwrite").partitionBy("partition").parquet(path)

  /** Streaming consumer over a record directory: the stand-in for
    * `readStream.format("kafka")`, schema-identical so every
    * downstream transform (watermarks, windows, stateful ops,
    * exactly-once sinks) is source-agnostic.
    */
  def streamFromDirectory(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(recordSchema).parquet(path)

  /** Partition assignment expression (exposed for specs/planning). */
  def partitionFor(key: Column, numPartitions: Int): Column =
    (hex60(key.cast("string")) % numPartitions).cast("int")
}
