package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** File-drop ingestion adapter — the Spark-native shape of the
  * reference's market-data acquisition loop (finanalyzer
  * database/dataAcquisition.py:38-50 `receive_history` +
  * findatabase.py:196 `update_database`): an external fetcher drops
  * per-ticker history files (the yfinance `Ticker.history` column
  * schema) into a watch directory, and a Structured Streaming
  * directory source ingests each drop incrementally, upserting
  * last-writer-wins bars into a parquet target keyed by
  * (ticker, date).
  *
  * Scale shape: the watch source is Spark's file-stream source
  * (checkpointed file log — each file processed exactly once, with
  * maxFilesPerTrigger backpressure); the per-batch merge is one
  * union + keyed window dedup, and only the CHANGED snapshot is
  * rewritten. At real scale the target write would partition by
  * ingest date so the rewrite touches recent partitions only —
  * here the snapshot is a single overwrite, the semantics the spec
  * pins (drop → target equals the batch recompute over all files).
  */
object FileDrop {

  /** yfinance `Ticker.history` columns + provenance, matching the
    * reference's `valuesFinHistory(open, high, low, close,
    * dateValue, dateAdded, namesId)` with the ticker denormalized
    * (names join happens downstream, `fin_company_enrich`-style).
    */
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("date", DateType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("date_added", TimestampType)))

  /** The streaming directory watch: new CSV drops become micro-batch
    * rows. Explicit schema (never inferred — a malformed drop must
    * fail loudly, not degrade every column to string).
    */
  def readStream(spark: SparkSession, watchDir: String,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(watchDir)

  /** Last-writer-wins bar per (ticker, date): the reference's
    * redundancy.sql dedup, keyed on provenance recency. The tiebreak
    * covers EVERY value column so the pick is a total order — two
    * drops that tie on (date_added, close, volume) but differ in
    * open/high/low would otherwise choose a nondeterministic winner
    * and let the streamed target diverge from the pinned
    * batch-recompute semantics.
    */
  def latestPerBar(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker"), col("date"))
      .orderBy(col("date_added").desc, col("close").desc, col("volume").desc,
        col("open").desc, col("high").desc, col("low").desc)
    bars.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Start the ingestion loop: watch → per-batch upsert into the
    * parquet target. Each batch merges the new rows with the current
    * target via [[latestPerBar]]; the merged snapshot is eagerly
    * materialized (localCheckpoint) BEFORE the overwrite, because the
    * lazy plan reads the same files the write replaces. Exactly-once
    * across restarts comes from the file source's checkpointed log —
    * a reprocessed batch re-merges identical rows, and the keyed
    * dedup makes the upsert idempotent.
    */
  def ingest(spark: SparkSession, watchDir: String, targetDir: String,
             checkpointDir: String, maxFilesPerTrigger: Int = 16): StreamingQuery =
    readStream(spark, watchDir, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(targetDir)))
            spark.read.schema(schema).parquet(targetDir)
          else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        val merged = latestPerBar(existing.unionByName(batch)).localCheckpoint(true)
        merged.write.mode("overwrite").parquet(targetDir)
        ()
      }
      .start()
}
