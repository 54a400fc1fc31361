package graft

import java.nio.file.{Files, Paths}

import graft.sources.FileDrop

/** File-drop ingestion: dropping per-ticker history CSVs into the
  * watch directory must upsert the parquet target to EXACTLY the
  * batch recompute over every file dropped so far — including
  * last-writer-wins revisions of existing (ticker, date) bars — and
  * a restart from checkpoint must not duplicate or reprocess.
  */
class FileDropSpec extends SparkSpec {

  private def mkTmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val header = "ticker,date,open,high,low,close,volume,date_added"

  private def drop(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name), (header +: rows).mkString("\n").getBytes)

  private def readTarget(targetDir: String) =
    spark.read.schema(FileDrop.schema).parquet(targetDir)
      .orderBy("ticker", "date").collect().toSeq

  private def batchRecompute(watchDir: String) =
    FileDrop.latestPerBar(
      spark.read.schema(FileDrop.schema).option("header", "true").csv(watchDir))
      .orderBy("ticker", "date").collect().toSeq

  test("drops upsert the target to the batch recompute; revisions win by recency") {
    val watch = mkTmp("fd_watch"); val target = mkTmp("fd_tgt") + "/t"
    val ckpt = mkTmp("fd_ckpt")
    drop(watch, "aapl_1.csv",
      "AAPL,2026-01-02,10.0,11.0,9.5,10.5,1000,2026-01-03 00:00:00",
      "AAPL,2026-01-03,10.5,12.0,10.0,11.5,1100,2026-01-03 00:00:00")
    val q = FileDrop.ingest(spark, watch, target, ckpt)
    try {
      q.processAllAvailable()
      assert(readTarget(target) === batchRecompute(watch))
      // Second drop: one NEW date and one REVISION of 2026-01-03
      // (newer date_added — e.g. a dividend-adjusted refetch).
      drop(watch, "aapl_2.csv",
        "AAPL,2026-01-03,10.5,12.0,10.0,11.8,1150,2026-01-04 00:00:00",
        "AAPL,2026-01-04,11.8,12.5,11.0,12.1,900,2026-01-04 00:00:00",
        "MSFT,2026-01-04,300.0,305.0,299.0,304.0,5000,2026-01-04 00:00:00")
      q.processAllAvailable()
      val got = readTarget(target)
      assert(got === batchRecompute(watch))
      assert(got.size === 4)
      val revised = got.find(r => r.getString(0) == "AAPL"
        && r.getDate(1).toString == "2026-01-03").get
      assert(revised.getDouble(5) === 11.8, "revision with newer date_added must win")
    } finally q.stop()
  }

  test("restart from checkpoint neither reprocesses nor duplicates") {
    val watch = mkTmp("fd_watch2"); val target = mkTmp("fd_tgt2") + "/t"
    val ckpt = mkTmp("fd_ckpt2")
    drop(watch, "a.csv", "AAPL,2026-01-02,1,2,0.5,1.5,10,2026-01-03 00:00:00")
    val q1 = FileDrop.ingest(spark, watch, target, ckpt)
    try { q1.processAllAvailable() } finally q1.stop()
    drop(watch, "b.csv", "AAPL,2026-01-03,1.5,2.5,1.0,2.0,20,2026-01-04 00:00:00")
    val q2 = FileDrop.ingest(spark, watch, target, ckpt)
    try {
      q2.processAllAvailable()
      assert(readTarget(target) === batchRecompute(watch))
      assert(readTarget(target).size === 2)
    } finally q2.stop()
  }
}
