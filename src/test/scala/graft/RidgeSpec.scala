package graft

import graft.operators.Ridge
import org.apache.spark.sql.functions._

/** Closed-form distributed ridge: coefficient recovery on synthetic
  * data with known ground truth, prediction residuals, and the Gram
  * frame's structural invariants.
  */
class RidgeSpec extends SparkSpec {
  import spark.implicits._

  private val beta = Array(2.0, 0.5, -1.2, 0.8, 0.3, -0.7, 1.1)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** 2000 events on a 7-hour lattice spanning ~1.6 years (all hours,
    * weekdays, and months exercised), value an EXACT linear function
    * of the operator's own 6-dp-quantized features.
    */
  private lazy val synthetic = {
    val rows = (0 until 2000).map { i =>
      val epoch = 1704067200L + i * 7 * 3600L // 2024-01-01T00:00Z + 7h steps
      val zdt = java.time.Instant.ofEpochSecond(epoch).atZone(java.time.ZoneOffset.UTC)
      val hour = zdt.getHour.toDouble
      val dow = (zdt.getDayOfWeek.getValue % 7).toDouble // Sunday=0, like dayofweek(ts)-1
      val month = zdt.getMonthValue.toDouble
      def enc(c: Double, p: Int) =
        (round6(math.sin(c * (2.0 * math.Pi / p))), round6(math.cos(c * (2.0 * math.Pi / p))))
      val (hs, hc) = enc(hour, 24)
      val (ds, dc) = enc(dow, 7)
      val (ms, mc) = enc(month, 12)
      val x = Array(1.0, hs, hc, ds, dc, ms, mc)
      val y = (0 until 7).map(k => beta(k) * x(k)).sum
      (i.toLong, new java.sql.Timestamp(epoch * 1000L), y)
    }
    rows.toDF("event_id", "ts", "value")
  }

  test("fit recovers the known coefficients at near-zero alpha") {
    val got = Ridge.fit(synthetic, alpha = 1e-6)
    assert(got.length === 7)
    (0 until 7).foreach { k =>
      assert(math.abs(got(k) - beta(k)) < 1e-3, s"beta($k): got ${got(k)}, want ${beta(k)}")
    }
  }

  test("fit is deterministic across partitionings (exact decimal Gram sums)") {
    val a = Ridge.fit(synthetic.repartition(1), alpha = 0.5)
    val b = Ridge.fit(synthetic.repartition(16), alpha = 0.5)
    assert(a.toSeq === b.toSeq)
  }

  test("predict residuals vanish on noise-free data") {
    val out = Ridge.predict(synthetic, alpha = 1e-6)
    assert(out.count() === 2000)
    val maxAbs = out.agg(max(abs(col("residual")))).head().getDouble(0)
    assert(maxAbs < 1e-3, s"max |residual| = $maxAbs")
  }

  test("larger alpha shrinks non-intercept coefficients toward zero") {
    val small = Ridge.fit(synthetic, alpha = 1e-6)
    val large = Ridge.fit(synthetic, alpha = 1e6)
    (1 until 7).foreach { k =>
      assert(math.abs(large(k)) < math.abs(small(k)) + 1e-9)
      assert(math.abs(large(k)) < 0.01, s"beta($k) not shrunk: ${large(k)}")
    }
  }

  test("gram emits the 36-cell upper triangle with n at (0,0)") {
    val cells = Ridge.gram(synthetic).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cells.size === 36)
    assert(cells((0L, 0L)) === 2000.0) // Σ intercept² = n
    assert(cells.keys.forall { case (i, j) => i <= j && j <= 7 })
  }
}
