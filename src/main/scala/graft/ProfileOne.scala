package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job/per-stage profile of one or more registered queries —
  * optimization-round tooling (guide §1: measure first). For each
  * named query it runs the SAME timed action as [[Bench]] (count of
  * the declared frame, after one untimed warm run to exclude codegen
  * compilation), with a SparkListener recording every job's wall
  * clock, stage count, task count, and summed task time, so the
  * wall/task split exposes scheduling + planning overhead vs real
  * executor work. Output is one line per job plus a per-query
  * summary — stdout only, no artifact contract.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    final case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
                            var stages: Int = 0, var tasks: Int = 0,
                            var taskMs: Long = 0L, var desc: String = "")
    final case class StageRec(id: Int, var name: String = "", var tasks: Int = 0,
                              var runMs: Long = 0L, var cpuMs: Long = 0L,
                              var gcMs: Long = 0L, var deserMs: Long = 0L,
                              var srFetchMs: Long = 0L, var rows: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(e.jobId, start = e.time)
        r.stages = e.stageIds.size
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = jobs.synchronized {
        stages(e.stageInfo.stageId) = StageRec(e.stageInfo.stageId, name = e.stageInfo.name)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        stageToJob.get(e.stageId).flatMap(jobs.get).foreach { r =>
          r.tasks += 1
          if (e.taskInfo != null) r.taskMs += e.taskInfo.duration
        }
        stages.get(e.stageId).foreach { s =>
          s.tasks += 1
          val m = e.taskMetrics
          if (m != null) {
            s.runMs += m.executorRunTime
            s.cpuMs += m.executorCpuTime / 1000000L
            s.gcMs += m.jvmGCTime
            s.deserMs += m.executorDeserializeTime
            s.srFetchMs += m.shuffleReadMetrics.fetchWaitTime
            s.rows += m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val names = if (args.nonEmpty) args.toSeq else Seq("mm_neardup")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // untimed warm run: codegen, broadcast, footer caches
      jobs.synchronized { jobs.clear(); stages.clear(); stageToJob.clear() }
      // In-process MAIN-THREAD sampler (jstack attach is unreliable
      // on this box): every 10 ms record the driver thread's deepest
      // org.apache.spark frame, so the "gaps" line below can be
      // attributed (analysis vs optimization vs codegen vs await).
      val mainThread = Thread.currentThread()
      val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find { e =>
            val c = e.getClassName
            c.startsWith("org.apache.spark") &&
              !c.contains("ProfileOne") && !c.startsWith("org.apache.spark.sql.classic.Dataset")
          }.map(e => e.getClassName.split('.').takeRight(2).mkString(".") + "." + e.getMethodName)
            .getOrElse(st.headOption.map(e => e.getClassName + "." + e.getMethodName).getOrElse("?"))
          samples.merge(frame, 1, (a, b) => a + b)
          Thread.sleep(10)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallS = (System.nanoTime() - t0) / 1e9
      sampling = false
      Thread.sleep(200) // let listener events drain
      jobs.synchronized {
        println(f"\n===== $name%s  wall ${wallS}%.3f s  jobs ${jobs.size}%d =====")
        var sumJob = 0.0
        jobs.values.foreach { r =>
          val w = (r.end - r.start) / 1e3
          sumJob += w
          println(f"  job ${r.id}%4d  wall ${w}%7.3f s  stages ${r.stages}%3d  tasks ${r.tasks}%5d  taskSum ${r.taskMs / 1e3}%8.3f s  ${r.desc.take(60)}%s")
        }
        println(f"  jobs-wall-sum ${sumJob}%.3f s  (gaps = wall - sum = ${wallS - sumJob}%.3f s: planning/driver)")
        println("  -- stages (taskSum ms: run/cpu/gc/deser/fetchWait) --")
        stages.values.filter(s => s.tasks > 0 && s.runMs + s.deserMs > 50).foreach { s =>
          println(f"  stage ${s.id}%4d  tasks ${s.tasks}%4d  run ${s.runMs}%6d  cpu ${s.cpuMs}%6d  gc ${s.gcMs}%5d  deser ${s.deserMs}%5d  fetch ${s.srFetchMs}%5d  rows ${s.rows}%9d  ${s.name.take(70)}%s")
        }
        println("  -- driver main-thread samples (10 ms) --")
        import scala.jdk.CollectionConverters._
        samples.asScala.toSeq.sortBy(-_._2).take(14).foreach { case (f, n) =>
          println(f"  ${n.toInt * 10}%6d ms  $f%s")
        }
      }
    }
    spark.stop()
  }
}
