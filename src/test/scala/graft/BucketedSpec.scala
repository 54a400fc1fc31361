package graft

import graft.sources.{Bucketed, Compaction}
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

  test("curated dedup output buckets by keeper_id; cluster rollups plan without a shuffle") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val comps = graft.operators.Dedup.components(docs)
    spark.sql("DROP TABLE IF EXISTS curated_docs")
    rmrf(new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:") + "/curated_docs"))
    graft.operators.Dedup.writeCurated(docs, comps, "curated_docs", 8)
    val b = spark.table("curated_docs")

    // the next job's shape: per-cluster report over the curated table
    val report = b.groupBy(col("keeper_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("n_chars")).as("chars"))
    assert(!report.queryExecution.executedPlan.toString.contains("ShuffleExchange"),
      "keeper_id rollup over the bucketed curated table should not shuffle")

    // verdicts survive the write exactly: labels equal the batch apply
    val got = b.select(col("doc_id"), col("keeper_id"), col("kept")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val want = graft.operators.Dedup.applyDedupWith(docs, comps).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === want)
    assert(b.count() === docs.count())
    spark.sql("DROP TABLE curated_docs")
  }

  test("compaction merges small files, preserves data, and range mode clusters keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1L to 10000L).map(i => (i, i % 97, s"row$i")).toDF("id", "k", "s")
    df.repartition(50).write.mode("overwrite").parquet(s"$dir/frag")

    val r = Compaction.compact(spark, s"$dir/frag", s"$dir/merged",
      targetFileBytes = 1L << 30)
    assert(r.filesBefore === 50)
    assert(r.filesAfter === 1, s"one target-size file expected, got ${r.filesAfter}")
    val back = spark.read.parquet(s"$dir/merged")
    assert(back.count() === 10000L)
    assert(back.agg(sum(col("id"))).head.getLong(0) === df.agg(sum(col("id"))).head.getLong(0))

    // sorted mode: files carry disjoint id ranges (min/max prunable)
    val r2 = Compaction.compact(spark, s"$dir/frag", s"$dir/sorted",
      targetFileBytes = r.bytes / 2 + 1, sortBy = Some("id"))
    assert(r2.outFiles >= 2)
    val p = new org.apache.hadoop.fs.Path(s"$dir/sorted")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ranges = fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map { f =>
        val d = spark.read.parquet(f.getPath.toString)
          .agg(min(col("id")), max(col("id"))).head
        (d.getLong(0), d.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "range-compacted files must not overlap")
      case _ =>
    }
  }
}
