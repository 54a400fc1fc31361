package graft

import java.sql.Timestamp

import graft.operators.Ridge
import graft.streaming.RidgeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Walk-forward streaming ridge scoring: every micro-batch must be
  * scored with EXACTLY the model a batch recompute would fit on the
  * rows seen before that batch — never with a model that saw the
  * batch's own rows.
  */
class RidgeStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Noise-free linear lattice rows (the RidgeSpec/CvEvalSpec data
    * shape) as (event_id, ts, value) triples.
    */
  private def rows(ids: Range): Seq[(Long, Timestamp, Double)] = {
    val beta = Array(2.0, 0.5, -1.2, 0.8, 0.3, -0.7, 1.1)
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ids.map { i =>
      val epoch = 1704067200L + i * 7 * 3600L
      val zdt = java.time.Instant.ofEpochSecond(epoch).atZone(java.time.ZoneOffset.UTC)
      def enc(c: Double, p: Int) =
        (round6(math.sin(c * (2.0 * math.Pi / p))), round6(math.cos(c * (2.0 * math.Pi / p))))
      val (hs, hc) = enc(zdt.getHour.toDouble, 24)
      val (ds, dc) = enc((zdt.getDayOfWeek.getValue % 7).toDouble, 7)
      val (ms, mc) = enc(zdt.getMonthValue.toDouble, 12)
      val x = Array(1.0, hs, hc, ds, dc, ms, mc)
      (i.toLong, new Timestamp(epoch * 1000L), (0 until 7).map(k => beta(k) * x(k)).sum)
    }
  }

  test("each micro-batch is scored with the pre-batch model (batch recompute parity)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val history0 = rows(0 until 400).toDF("event_id", "ts", "value")
    val batch1 = rows(400 until 500)
    val batch2 = rows(500 until 600)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val scored = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val q = RidgeStream.walkForward(
      input.toDF().toDF("event_id", "ts", "value"), history0, alpha = 1e-6) {
      (df, id) => scored.synchronized { scored(id) = df.collect().map(_.toString).toSeq }
    }
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    // Batch 1: model fitted on history0 only.
    val m1 = Ridge.fit(history0, 1e-6)
    val want1 = Ridge.predictWith(batch1.toDF("event_id", "ts", "value"), m1)
      .collect().map(_.toString).toSeq
    // Batch 2: model fitted on history0 + batch1 — and NOT on batch2.
    val m2 = Ridge.fit(history0.unionByName(batch1.toDF("event_id", "ts", "value")), 1e-6)
    val want2 = Ridge.predictWith(batch2.toDF("event_id", "ts", "value"), m2)
      .collect().map(_.toString).toSeq
    val got = scored.synchronized(scored.toMap)
    assert(got.keySet === Set(0L, 1L))
    assert(got(0L) === want1, "batch 1 not scored with the history-only model")
    assert(got(1L) === want2, "batch 2 not scored with the pre-batch-2 model")
    // Noise-free linear data -> yesterday's model still generalizes.
    assert(got(1L).nonEmpty)
  }
}
