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
  *
  * COVERAGE under load (round 17): a budget-truncated run must not
  * starve the SAME queries round after round (round 16 lost the same
  * alphabetical 77-query tail twice), so
  *  - queries run LEAST-RECENTLY-MEASURED FIRST: `BENCH_DETAIL.json`
  *    carries a per-query `measured_run` (the monotone `run_id` of the
  *    last run that timed it); anything a truncated run skipped sorts
  *    to the FRONT of the next run, and ties (a fully-covered previous
  *    run) break by `md5(run_id:name)` — a fresh deterministic
  *    shuffle each run, never the Map's hash-arbitrary order and never
  *    the same alphabetical tail;
  *  - when the load canary reads HOT (warmup or the fixed mid-run
  *    probe above ~2x its quiet band), the gate degrades to ONE run
  *    per query instead of min-of-2 — half the wall buys the whole
  *    tail's coverage; affected queries are flagged (`"r":1` on the
  *    stream line, names in `single_run`) because a single-run time
  *    includes codegen compile and reads ~p90, not p50.
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
    // The probe also DRIVES the degrade decision below, so it runs
    // every 20 queries (~0.3 s each when quiet — noise) rather than
    // round 16's 40: a load wave must not get 40 queries of min-of-2
    // wall before the gate reacts.
    val canaryEvery = 20
    // Quiet-band thresholds from the measured record: quiet probes
    // read 0.25-0.67 s / warmup 5-9 s (BASELINE.md canary note, the
    // judge's quiet re-run); the round-16 load collapse read probe
    // 0.80-7.11 s. 1.5 s / 12 s sit above every quiet observation
    // and below every collapse observation.
    val hotProbeS = 1.5
    val hotWarmupS = 12.0
    val canary = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    // 2 = min-of-2 (the steady-state protocol BASELINE p50 is
    // recorded against); 1 = degraded single-run under load. The
    // gate RECOVERS to min-of-2 when the probe cools back under the
    // quiet band — a transient load wave should not cost the whole
    // remaining run its p50-comparability.
    var runsPerQuery = if (warmupS > hotWarmupS) 1 else 2
    def probeCanary(i: Int): Unit = {
      val t0 = System.nanoTime()
      spark.range(1000000).selectExpr("sum(id)").collect()
      val probeS = (System.nanoTime() - t0) / 1e9
      canary += ((i, probeS, load1Now))
      if (probeS > hotProbeS) runsPerQuery = 1
      else if (probeS < hotProbeS / 2) runsPerQuery = 2
    }
    probeCanary(0)
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Previous run's state (read BEFORE the first incremental
    // overwrite) -> cross-round deltas + the least-recently-measured
    // ordering, without tail parsing. Parsed with Jackson (on the
    // Spark classpath) rather than a regex: the regex version
    // silently zeroed every delta whenever the emit format drifted
    // (key order, scientific notation). A missing/unreadable file is
    // expected on the first run and is LOGGED to stderr, never
    // silently swallowed.
    val (prevTotal, prevQueries, prevComplete, prevRunId, prevMeasured) = try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Paths.get("BENCH_DETAIL.json").toFile)
      val pv = Option(root.get("value")).map(_.asDouble)
      def mapOf(field: String): Map[String, Double] =
        Option(root.get(field)).map { q =>
          val b = Map.newBuilder[String, Double]
          q.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asDouble)
          b.result()
        }.getOrElse(Map.empty[String, Double])
      // A truncated previous total (budget timeout or mid-run kill)
      // must not surface as a comparable prev_total: a full run vs a
      // 103-query partial total reads as a phantom 2x regression.
      val complete = !Option(root.get("timed_out")).exists(_.asBoolean) &&
        !Option(root.get("skipped")).exists(_.asInt > 0) &&
        !Option(root.get("partial")).exists(_.asBoolean)
      val runId = Option(root.get("run_id")).map(_.asLong).getOrElse(0L)
      (pv, mapOf("queries"), complete, runId, mapOf("measured_run"))
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] no previous BENCH_DETAIL.json state (${e.getClass.getSimpleName}: ${e.getMessage}); deltas start empty")
        (None, Map.empty[String, Double], false, 0L, Map.empty[String, Double])
    }
    val runId = prevRunId + 1
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val singleRun = scala.collection.mutable.ArrayBuffer.empty[String]
    def detailJson(timedOut: Boolean, partial: Boolean, skipped: Int): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.values.filter(_ >= 0).sum
      val fails = results.values.count(_ < 0)
      val deltas = results.flatMap { case (k, v) =>
        prevQueries.get(k).filter(_ >= 0).filter(_ => v >= 0)
          .map(p => s"\"" + k + "\":" + fmt(v - p))
      }.mkString("{", ",", "}")
      val prevField = prevTotal.map(p =>
        if (prevComplete) s""","prev_total":${fmt(p)}"""
        else s""","prev_total_truncated":${fmt(p)}""").getOrElse("")
      val canaryJson = canary.map { case (i, s, l) =>
        s"""{"i":$i,"probe_s":${fmt(s)},"load1":${fmt(l)}}"""
      }.mkString("[", ",", "]")
      val measured = (prevMeasured ++ results.keys.map(_ -> runId.toDouble))
        .toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + v.toLong }
        .mkString("{", ",", "}")
      val singles = singleRun.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"fails":$fails,"skipped":$skipped,"timed_out":$timedOut,"partial":$partial,"warmup_s":${fmt(warmupS)},"load1":${fmt(load1)},"run_id":$runId,"single_run":$singles,"canary":$canaryJson,"queries":$qs,"sf":"$sfDir"$prevField,"deltas":$deltas,"measured_run":$measured}"""
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
    def md5Hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // Least-recently-measured FIRST, md5(run_id:name) tiebreak: a
    // truncated run's skip set is always the queries with the
    // FRESHEST existing measurement, and two consecutive truncations
    // at the same cut point still cover different tie-order subsets.
    val allQueries = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      (prevMeasured.getOrElse(name, -1.0), md5Hex(s"$runId:$name"))
    }
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
        val r = runsPerQuery
        val s = if (r == 1) once() else {
          val (a, b) = (once(), once())
          if (a < 0 || b < 0) -1.0 else math.min(a, b)
        }
        results += name -> s
        if (r == 1) singleRun += name
        // ~40-byte per-query line: dozens fit in the driver's tail
        // window, so even a hard kill preserves the recent timings.
        // "r":1 marks a degraded single-run time (includes codegen
        // compile; compare against p90, not p50).
        val rField = if (r == 1) ""","r":1""" else ""
        println(s"""{"q":"$name","s":${fmt(s)}$rField}""")
        writeDetail(timedOut = false, partial = true, skipped = 0)
      }
    }
    val skipped = allQueries.size - results.size
    probeCanary(qIdx)
    writeDetail(timedOut, partial = false, skipped)
    val total = results.values.filter(_ >= 0).sum
    val fails = results.values.count(_ < 0)
    val canaryMax = if (canary.nonEmpty) canary.map(_._2).max else -1.0
    val prevField = prevTotal.filter(_ => prevComplete)
      .map(p => s""","prev_total":${fmt(p)}""").getOrElse("")
    // Per-query detail goes to the file (and the streamed lines): the
    // full 180-query map is ~7 KB, which overflows the driver's ~2 KB
    // stdout tail window and truncated BENCH_r01-r04 mid-JSON. The
    // FINAL stdout line must be the short (<250 byte) parseable summary.
    // fails is FIRST-CLASS: a total that sums only passing queries
    // reads as a speedup when queries crash (round 7: 69 fails
    // deflated the headline by ~22 s). skipped/timed_out likewise: a
    // budget-truncated total must not read as a 180-query speedup,
    // and n_single (degraded single-run queries) must not read as
    // 180 comparable p50s.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"fails":$fails,"skipped":$skipped,"timed_out":$timedOut,"n_single":${singleRun.size},"warmup_s":${fmt(warmupS)},"load1":${fmt(load1)},"canary_max_s":${fmt(canaryMax)}$prevField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
