package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Wide fundamentals-snapshot ingestion — the Spark-native shape of
  * the reference's `.info` acquisition path (finanalyzer
  * database/sqlrequests.sql:56-160 `financialData` — 44 nullable
  * metric columns keyed (namesId, dateValue) — filled per key/day by
  * findatabase.py:174-179 `insert_info_from_web` and deduped
  * last-writer-wins by sql/redundancy.sql). An external fetcher
  * drops wide per-ticker snapshot CSVs into a watch directory; a
  * Structured Streaming file source ingests each drop exactly once
  * and upserts the parquet target keyed by (ticker, date).
  *
  * Differences from [[FileDrop]] (the OHLC history drop) that make
  * this the wide-snapshot adapter:
  *  - the row is a sparse 44-metric attribute vector (fetchers often
  *    return subsets — any missing CSV field is a typed NULL, never a
  *    stringly-typed degrade);
  *  - the target schema EVOLVES: a redeployed fetcher may add metric
  *    columns, so the per-batch merge unions by NAME with missing
  *    columns null-filled (the maint_schema_union semantics) instead
  *    of demanding identical schemas forever.
  *
  * Scale shape: same as FileDrop — checkpointed file-log source with
  * maxFilesPerTrigger backpressure, one union + keyed window dedup
  * per batch, snapshot overwrite (at real scale: partition the
  * target by ingest date and rewrite recent partitions only).
  */
object InfoDrop {

  /** The 44 metric columns of the reference `financialData` table,
    * snake_cased, in its DDL order (sqlrequests.sql:56-160).
    */
  val metricNames: Seq[String] = Seq(
    "average_volume", "beta", "bid", "bid_size", "book_value",
    "current_price", "current_ratio", "day_high", "day_low",
    "dividend_rate", "dividend_yield", "earnings_growth",
    "earnings_quarterly_growth", "ebitda", "ebitda_margins",
    "enterprise_value", "fifty_day_average", "fifty_two_week_high",
    "fifty_two_week_low", "forward_eps", "forward_pe", "free_cashflow",
    "gross_profits", "gross_margins", "market_cap",
    "number_of_analyst_opinions", "operating_cashflow", "payout_ratio",
    "peg_ratio", "price_to_book", "profit_margins", "quick_ratio",
    "regular_market_price", "regular_market_volume", "return_on_assets",
    "return_on_equity", "revenue_per_share", "shares_short",
    "short_ratio", "total_cash_per_share", "total_debt",
    "total_revenue", "volume", "two_hundred_day_average")

  /** Key + provenance + the wide nullable metric block. Explicit on
    * read (inference is a full extra pass and would mistype sparse
    * columns); every metric is nullable DOUBLE — the reference
    * declares them FLOAT and yfinance omits fields freely.
    */
  val schema: StructType = StructType(
    StructField("ticker", StringType) +:
    StructField("date", DateType) +:
    metricNames.map(StructField(_, DoubleType)) :+
    StructField("date_added", TimestampType))

  def readStream(spark: SparkSession, watchDir: String,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(watchDir)

  /** Last-writer-wins snapshot per (ticker, date) — the reference's
    * redundancy.sql dedup keyed on provenance recency. The tiebreak
    * extends over EVERY non-key column of the frame (sorted by name,
    * nulls last), so it is a total order over the row's value set
    * regardless of which metric columns this deployment carries:
    * rows that tie on all columns are identical, so the winner is
    * value-deterministic in every case.
    */
  def latestPerSnapshot(rows: DataFrame): DataFrame = {
    val valueCols = rows.columns.toSeq
      .filterNot(Set("ticker", "date", "date_added")).sorted
    val w = Window.partitionBy(col("ticker"), col("date"))
      .orderBy(col("date_added").desc_nulls_last +:
        valueCols.map(col(_).desc_nulls_last): _*)
    rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Start the ingestion loop: watch → per-batch upsert into the
    * parquet target, evolving the target schema by name. The target
    * is read with its OWN schema (not the stream's): an older target
    * written before a metric existed still merges — both directions
    * of drift null-fill via `unionByName(allowMissingColumns)`.
    * The merged snapshot is eagerly materialized before the
    * overwrite (the lazy plan reads the files the write replaces);
    * exactly-once across restarts comes from the file source's
    * checkpointed log, and the keyed dedup makes reprocessed batches
    * idempotent.
    */
  def ingest(spark: SparkSession, watchDir: String, targetDir: String,
             checkpointDir: String, maxFilesPerTrigger: Int = 16): StreamingQuery =
    readStream(spark, watchDir, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(targetDir)))
            spark.read.parquet(targetDir)
          else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), batch.schema)
        val merged = latestPerSnapshot(
          existing.unionByName(batch, allowMissingColumns = true)).localCheckpoint(true)
        merged.write.mode("overwrite").parquet(targetDir)
        ()
      }
      .start()
}
