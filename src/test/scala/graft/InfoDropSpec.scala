package graft

import java.nio.file.{Files, Paths}

import graft.sources.InfoDrop
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Wide fundamentals-snapshot ingestion: dropping sparse 44-metric
  * info CSVs must upsert the parquet target to EXACTLY the batch
  * recompute over every file dropped so far (last-writer-wins per
  * (ticker, date)), restarts must not duplicate, and a target
  * written under an OLDER schema must merge by name with new metric
  * columns null-filled (the maint_schema_union semantics).
  */
class InfoDropSpec extends SparkSpec {

  private def mkTmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val header =
    (Seq("ticker", "date") ++ InfoDrop.metricNames :+ "date_added").mkString(",")

  /** One sparse CSV line: only the named metrics are present, every
    * other field is empty (→ typed NULL under the explicit schema).
    */
  private def line(ticker: String, date: String, added: String,
                   metrics: (String, Double)*): String = {
    val m = metrics.toMap
    (Seq(ticker, date) ++
      InfoDrop.metricNames.map(n => m.get(n).map(_.toString).getOrElse("")) :+
      added).mkString(",")
  }

  private def drop(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name), (header +: rows).mkString("\n").getBytes)

  private def readTarget(targetDir: String) =
    spark.read.parquet(targetDir).orderBy("ticker", "date").collect().toSeq

  private def batchRecompute(watchDir: String) =
    InfoDrop.latestPerSnapshot(
      spark.read.schema(InfoDrop.schema).option("header", "true").csv(watchDir))
      .orderBy("ticker", "date").collect().toSeq

  private def metric(r: Row, name: String): Any = r.get(r.fieldIndex(name))

  test("drops upsert the target to the batch recompute; revisions win by recency") {
    val watch = mkTmp("id_watch"); val target = mkTmp("id_tgt") + "/t"
    val ckpt = mkTmp("id_ckpt")
    drop(watch, "aapl_1.csv",
      line("AAPL", "2026-01-02", "2026-01-02 18:00:00",
        "current_price" -> 10.5, "beta" -> 1.1, "market_cap" -> 2.5e12))
    val q = InfoDrop.ingest(spark, watch, target, ckpt)
    try {
      q.processAllAvailable()
      assert(readTarget(target) === batchRecompute(watch))
      // Second drop: a NEW day plus a same-day REVISION (newer
      // date_added — an intraday refetch with a moved price).
      drop(watch, "aapl_2.csv",
        line("AAPL", "2026-01-02", "2026-01-02 21:00:00",
          "current_price" -> 10.8, "beta" -> 1.1, "market_cap" -> 2.6e12),
        line("AAPL", "2026-01-03", "2026-01-03 18:00:00",
          "current_price" -> 11.0, "beta" -> 1.2),
        line("MSFT", "2026-01-03", "2026-01-03 18:00:00",
          "current_price" -> 305.0, "ebitda" -> 1.2e11))
      q.processAllAvailable()
      val got = readTarget(target)
      assert(got === batchRecompute(watch))
      assert(got.size === 3)
      val revised = got.find(r => r.getString(0) == "AAPL"
        && r.getDate(1).toString == "2026-01-02").get
      assert(metric(revised, "current_price") === 10.8,
        "revision with newer date_added must win")
      // sparse fields land as typed nulls, not strings
      assert(metric(revised, "ebitda") === null)
    } finally q.stop()
  }

  test("restart from checkpoint neither reprocesses nor duplicates") {
    val watch = mkTmp("id_watch2"); val target = mkTmp("id_tgt2") + "/t"
    val ckpt = mkTmp("id_ckpt2")
    drop(watch, "a.csv",
      line("AAPL", "2026-01-02", "2026-01-02 18:00:00", "current_price" -> 10.5))
    val q1 = InfoDrop.ingest(spark, watch, target, ckpt)
    try { q1.processAllAvailable() } finally q1.stop()
    drop(watch, "b.csv",
      line("AAPL", "2026-01-03", "2026-01-03 18:00:00", "current_price" -> 11.0))
    val q2 = InfoDrop.ingest(spark, watch, target, ckpt)
    try {
      q2.processAllAvailable()
      assert(readTarget(target) === batchRecompute(watch))
      assert(readTarget(target).size === 2)
    } finally q2.stop()
  }

  test("a target written under an older schema evolves by name") {
    val watch = mkTmp("id_watch3"); val target = mkTmp("id_tgt3") + "/t"
    val ckpt = mkTmp("id_ckpt3")
    // A previous deployment knew only (ticker, date, beta, date_added).
    val oldSchema = StructType(Seq(
      StructField("ticker", StringType), StructField("date", DateType),
      StructField("beta", DoubleType), StructField("date_added", TimestampType)))
    val oldRows = java.util.Arrays.asList(
      Row("IBM", java.sql.Date.valueOf("2025-12-30"), 0.9,
        java.sql.Timestamp.valueOf("2025-12-30 18:00:00")))
    spark.createDataFrame(oldRows, oldSchema).write.parquet(target)
    drop(watch, "a.csv",
      line("AAPL", "2026-01-02", "2026-01-02 18:00:00", "current_price" -> 10.5))
    val q = InfoDrop.ingest(spark, watch, target, ckpt)
    try {
      q.processAllAvailable()
      val got = readTarget(target)
      assert(got.size === 2)
      // merged target carries the full evolved column set
      val cols = spark.read.parquet(target).columns.toSet
      assert(InfoDrop.schema.fieldNames.toSet.subsetOf(cols))
      val ibm = got.find(_.getString(0) == "IBM").get
      assert(metric(ibm, "beta") === 0.9, "pre-evolution row keeps its value")
      assert(metric(ibm, "current_price") === null, "new columns null-fill old rows")
      val aapl = got.find(_.getString(0) == "AAPL").get
      assert(metric(aapl, "current_price") === 10.5)
      assert(metric(aapl, "beta") === null)
    } finally q.stop()
  }
}
