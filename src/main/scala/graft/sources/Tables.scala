package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet table catalog over a scale-factor directory.
  *
  * One accessor per testdata table; all reads go through [[table]] so
  * scan options stay in one place. Readers return unexecuted
  * DataFrames — Catalyst sees the whole downstream plan and pushes
  * filters/projections into the parquet scan.
  */
final class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default. Read it as a raw nanosecond long and truncate to
    * microseconds (integer DIV — a double division would lose
    * precision above 2^53 ns). Truncation is monotone, so orderings
    * and second-aligned cutoff comparisons agree with ns-native
    * engines.
    */
  def events: DataFrame = {
    // The legacy flag has no per-read option form (probed: a
    // DataFrameReader option is ignored and the read throws), so set
    // it only around the eager schema resolution and restore the
    // caller's value after. Execution of the returned (lazy) frame is
    // safe post-restore: the file schema was already resolved to LONG
    // (probed on this Spark version — see VerifySpec round-trip).
    // Synchronized on the session: the set/resolve/restore triple is
    // not atomic, so two concurrent events() calls could interleave
    // (one restoring while the other resolves, or recording the
    // other's transient "true" as the previous value).
    spark.synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try table("events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Partitioned parquet writer — the shape we'd use for a curated
    * 100 TB dataset: partition columns for pruning, one file per
    * task.
    */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}

/** Bucketed table writes — pre-shuffled storage. A table bucketed
  * (and sorted) by its join/aggregation key lets every later
  * equi-join or groupBy on that key run WITHOUT a shuffle: the scan
  * itself reports hash partitioning. At 100 TB this turns the
  * nightly fact⋈fact join from two full shuffles into zero.
  */
object Bucketed {
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed, under spark.sql.warehouse.dir
}

/** Non-parquet sources/sinks. Schemas are always EXPLICIT on read:
  * inference needs an extra full pass over the data (ruinous at
  * 100 TB) and can silently mistype columns; a declared schema makes
  * the read one pass and the types a contract.
  */
object Formats {
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
