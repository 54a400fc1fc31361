package graft

import graft.operators.CvEval

/** Cross-validated ridge evaluation: near-zero error on noise-free
  * linear data, correct fold shapes, and determinism.
  */
class CvEvalSpec extends SparkSpec {
  import spark.implicits._

  /** value is an exact linear function of the cyclical features
    * (same lattice as RidgeSpec), so every fold's ridge fit should
    * generalize with ~zero test error.
    */
  private lazy val synthetic = {
    val beta = Array(2.0, 0.5, -1.2, 0.8, 0.3, -0.7, 1.1)
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 2000).map { i =>
      val epoch = 1704067200L + i * 7 * 3600L
      val zdt = java.time.Instant.ofEpochSecond(epoch).atZone(java.time.ZoneOffset.UTC)
      def enc(c: Double, p: Int) =
        (round6(math.sin(c * (2.0 * math.Pi / p))), round6(math.cos(c * (2.0 * math.Pi / p))))
      val (hs, hc) = enc(zdt.getHour.toDouble, 24)
      val (ds, dc) = enc((zdt.getDayOfWeek.getValue % 7).toDouble, 7)
      val (ms, mc) = enc(zdt.getMonthValue.toDouble, 12)
      val x = Array(1.0, hs, hc, ds, dc, ms, mc)
      val y = (0 until 7).map(k => beta(k) * x(k)).sum
      (i.toLong, new java.sql.Timestamp(epoch * 1000L), y)
    }.toDF("event_id", "ts", "value")
  }

  test("every fold generalizes with near-zero error on noise-free data") {
    val out = CvEval.ridgeCv(synthetic, nSplits = 3, gap = 10,
      maxTrainSize = 800, testSize = 200, alpha = 1e-6).collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    out.foreach { r =>
      assert(r.getLong(1) === 200L, "test fold size")
      assert(r.getDouble(2) < 1e-3, s"fold ${r.getLong(0)} mae ${r.getDouble(2)}")
      assert(r.getDouble(3) < 1e-3, s"fold ${r.getLong(0)} rmse ${r.getDouble(3)}")
    }
  }

  test("metrics are deterministic across partitionings") {
    def run(p: Int) = CvEval.ridgeCv(synthetic.repartition(p), nSplits = 2,
      gap = 5, maxTrainSize = 500, testSize = 100, alpha = 0.5)
      .collect().map(_.toString).toSeq
    assert(run(1) === run(16))
  }
}
