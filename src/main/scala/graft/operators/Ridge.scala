package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form distributed ridge regression on the cyclical time
  * features — the "learn" half of the reference's regressor demo,
  * which fits `RidgeCV(alphas=...)` pipelines over sin/cos encodings
  * (finanalyzer/regressors/to_review/plot_cyclical_feature_engineering.py:398-411
  * and :536-555) and judges every encoding by fit quality.
  *
  * Spark-native shape: ridge has a closed form β = (XᵀX + λI)⁻¹ Xᵀy,
  * so the DISTRIBUTED part is one partial-aggregated scan that
  * accumulates the Gram matrix of the intercept-augmented vector
  * z = [1, x₁..x₆, y] — every Σ zᵢzⱼ is an exact DECIMAL sum of
  * 6-dp-quantized features (partition-order independent, oracle-
  * replayable). The d×d solve (d = 7) runs on the DRIVER on model
  * parameters only — the same legitimate exception to the no-collect
  * rule as k-means centroids — and the coefficients return to the
  * cluster as plan literals for a full-scan predictions/residuals
  * frame. Nothing corpus-sized ever crosses a shuffle: the Gram
  * aggregation ships 36 decimals + per-partition partials.
  *
  * Following sklearn's `fit_intercept=True` convention the intercept
  * is NOT penalized: λ is added to every diagonal entry except the
  * intercept's.
  */
object Ridge {

  /** Augmented-vector width: z0 = intercept, z1..z6 = cyclical
    * features (hour/dow/month sin+cos), z7 = y (the event value).
    */
  private[operators] val D = 8
  private[operators] val upperTriangle: Seq[(Int, Int)] =
    for { i <- 0 until D; j <- i until D } yield (i, j)

  /** (event_id, z0..z7), each component a 6-dp-rounded DECIMAL(18,6)
    * so pairwise products (37,12) and their sums (38,12) stay exact.
    * Feature formulas replicate [[FinAnalytics.cyclicalFeatures]]
    * op-for-op (same literal order as the DuckDB oracle). The sin/cos
    * features are bounded, but y is not: dec6 overflows DECIMAL(18,6)
    * to null for |y| ≥ ~1e12 AFTER isNotNull admitted the row — a
    * silently inconsistent normal-equation system (row counted in n
    * but absent from the y sums) — so out-of-domain values fail
    * loudly instead (same guard as [[FinAnalytics.moments]]).
    */
  private[operators] def zFrame(events: DataFrame): DataFrame = {
    def enc(c: Column, period: Int): Seq[Column] = Seq(
      dec6(sin(c * (lit(2.0) * lit(math.Pi) / period))),
      dec6(cos(c * (lit(2.0) * lit(math.Pi) / period))))
    val guardedY = when(abs(col("value")) < 1e11, dec6(col("value")))
      .otherwise(raise_error(concat(
        lit("ridge: |value| >= 1e11 overflows the exact Gram sums: "),
        col("value"))).cast(DecimalType(18, 6)))
    val zs =
      lit(1.0).cast(DecimalType(18, 6)) +:
        (enc(hour(col("ts")), 24) ++
          enc(dayofweek(col("ts")) - 1, 7) ++
          enc(month(col("ts")), 12)) :+
        guardedY
    events.filter(col("value").isNotNull)
      .select(col("event_id") +: zs.zipWithIndex.map { case (c, i) => c.as(s"z$i") }: _*)
  }

  /** The 36 upper-triangle Σ zᵢzⱼ aggregate expressions — shared by
    * the single-model fit and [[CvEval]]'s per-fold grouped variant.
    */
  private[operators] def gramSumCols: Seq[Column] =
    upperTriangle.map { case (i, j) =>
      sum(col(s"z$i") * col(s"z$j")).as(s"s_${i}_$j")
    }

  private def gramAgg(z: DataFrame): DataFrame = {
    val cols = gramSumCols
    z.agg(cols.head, cols.tail: _*)
  }

  /** Solve the ridge normal equations from a (i ≤ j) → Σ zᵢzⱼ lookup
    * (driver-side, model-parameter work only). Shared by [[fit]] and
    * [[CvEval]]'s batched per-fold solves.
    */
  private[operators] def solveFromSums(s: (Int, Int) => Double, alpha: Double): Array[Double] = {
    val d = D - 1 // 7 unknowns: intercept + 6 features
    val a = Array.tabulate(d, d) { (i, j) =>
      s(math.min(i, j), math.max(i, j)) +
        (if (i == j && i > 0) alpha else 0.0) // intercept unpenalized
    }
    val b = Array.tabulate(d)(i => s(i, D - 1))
    solve(a, b)
  }

  /** The Gram sums as rows (i, j, s) over the upper triangle of
    * z zᵀ, 0 ≤ i ≤ j < 8 — the full sufficient statistic for ridge
    * at ANY λ (z0z0 is n, z0zⱼ are the feature sums, zᵢz7 is Xᵀy,
    * z7z7 enables R²). This is the oracled surface: exact decimal
    * sums, emitted as doubles.
    */
  def gram(events: DataFrame): DataFrame = {
    val cells = upperTriangle.map { case (i, j) =>
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
        outD(col(s"s_${i}_$j"), 12).as("s"))
    }
    gramAgg(zFrame(events))
      .select(explode(array(cells: _*)).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.s").as("s"))
      .orderBy(col("i"), col("j"))
  }

  /** Fit coefficients [β₀(intercept), β₁..β₆]: one Gram scan, then a
    * driver-side 7×7 Gaussian elimination.
    */
  def fit(events: DataFrame, alpha: Double = 1.0): Array[Double] = {
    val row = gramAgg(zFrame(events)).head()
    def s(i: Int, j: Int): Double = {
      val v = row.getDecimal(upperTriangle.indexOf((i, j)))
      if (v == null) 0.0 else v.doubleValue()
    }
    solveFromSums(s, alpha)
  }

  /** Predictions + residuals over the full corpus: coefficients from
    * [[fit]] enter the plan as literals, so this is one scan with no
    * shuffle at all. ŷ and residual are 6-dp-rounded doubles.
    */
  def predict(events: DataFrame, alpha: Double = 1.0): DataFrame =
    predictWith(events, fit(events, alpha))

  /** Score with externally-fitted coefficients (the cross-validation
    * path: fit on a train slice, predict a disjoint test slice).
    */
  def predictWith(events: DataFrame, beta: Array[Double]): DataFrame = {
    val z = zFrame(events)
    val yhat = (0 until D - 1)
      .map(i => col(s"z$i").cast("double") * lit(beta(i)))
      .reduce(_ + _)
    z.select(col("event_id"),
        (col("z7").cast("double") + lit(0.0)).as("value"),
        (round(yhat, 6) + lit(0.0)).as("prediction"))
      .withColumn("residual", round(col("value") - col("prediction"), 6) + lit(0.0))
      .orderBy(col("event_id"))
  }

  /** Gaussian elimination WITHOUT pivoting; a is mutated. The normal
    * matrix XᵀX + λI is symmetric positive definite whenever it is
    * nonsingular, and on an SPD system pivot-free elimination is
    * numerically stable (it is Cholesky up to row scaling) — so no
    * data-dependent row swaps, which keeps the arithmetic a FIXED
    * sequence of IEEE ops that the DuckDB oracle replays operation-
    * for-operation (an unrolled CTE chain) for bit-identical
    * coefficients. Singularity (collinear features at λ=0) still
    * fails loudly via the pivot-magnitude require.
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    for (k <- 0 until n) {
      require(math.abs(a(k)(k)) > 1e-12,
        "ridge: singular normal equations (collinear features and alpha=0?)")
      for (r <- k + 1 until n) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k until n) a(r)(c) -= f * a(k)(c)
        b(r) -= f * b(k)
      }
    }
    val x = new Array[Double](n)
    for (k <- n - 1 to 0 by -1)
      x(k) = (b(k) - (k + 1 until n).map(c => a(k)(c) * x(c)).sum) / a(k)(k)
    x
  }
}
