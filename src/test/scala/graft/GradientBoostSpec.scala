package graft

import graft.operators.GradientBoost
import org.apache.spark.sql.functions._

/** Gradient-boosted stumps: recovery of a known step function,
  * determinism across partitionings, and monotone SSE improvement.
  */
class GradientBoostSpec extends SparkSpec {
  import spark.implicits._

  /** y is a pure step function of hour (10 before noon, 15 after),
    * on an hourly lattice spanning several weeks.
    */
  private lazy val stepData = (0 until 2000).map { i =>
    val epoch = 1704067200L + i * 3600L
    val hour = java.time.Instant.ofEpochSecond(epoch)
      .atZone(java.time.ZoneOffset.UTC).getHour
    val y = if (hour < 12) 10.0 else 15.0
    (i.toLong, new java.sql.Timestamp(epoch * 1000L), y)
  }.toDF("event_id", "ts", "value")

  test("first stump finds the hour<=11 step; predictions converge to the truth") {
    val (base, stumps) = GradientBoost.fit(stepData, iters = 20, lr = 0.5)
    assert(math.abs(base - 12.5) < 0.01) // balanced lattice → mean ≈ 12.5
    assert(stumps.head.feature === "hour" && stumps.head.threshold === 11)
    val out = GradientBoost.predict(stepData, iters = 20, lr = 0.5)
    val maxAbs = out.agg(max(abs(col("residual")))).head().getDouble(0)
    assert(maxAbs < 0.01, s"max |residual| = $maxAbs after 20 rounds at lr=0.5")
  }

  test("fit is deterministic across partitionings (decimal histogram sums)") {
    val a = GradientBoost.fit(stepData.repartition(1), iters = 5, lr = 0.3)
    val b = GradientBoost.fit(stepData.repartition(16), iters = 5, lr = 0.3)
    assert(a === b)
  }

  test("training SSE never increases round over round") {
    def sse(iters: Int): Double =
      GradientBoost.predict(stepData, iters = iters, lr = 0.3)
        .agg(sum(col("residual") * col("residual"))).head().getDouble(0)
    val curve = Seq(1, 3, 6, 10).map(sse)
    curve.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-6, s"SSE curve not monotone: $curve")
    }
  }
}
