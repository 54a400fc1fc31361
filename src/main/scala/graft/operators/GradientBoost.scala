package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Histogram gradient-boosted regression stumps — the distributed
  * analog of the reference demo's second model,
  * `HistGradientBoostingRegressor` over ordinal-encoded time features
  * (finanalyzer/regressors/to_review/plot_cyclical_feature_engineering.py:203-214),
  * built the way a Spark-native GBM actually works: per-iteration the
  * cluster reduces the corpus to per-(feature, bin) residual
  * HISTOGRAMS (43 bins total for hour/dow/month — one map-side-
  * combined agg scan, a few hundred bytes over the shuffle), the
  * DRIVER scans the histogram prefix sums for the best variance-
  * reducing threshold split (model-parameter work only, same
  * legitimate exception as k-means / ridge), and the chosen stump
  * re-enters the next iteration's plan as literal CASE WHEN algebra.
  * Nothing row-level ever reaches the driver, and the feature frame
  * is cached across iterations (the standard GBM trade: M histogram
  * passes over a cached projection, never M raw-corpus re-scans).
  *
  * Determinism: residuals are 6-dp-quantized and summed as exact
  * DECIMAL(18,6) per bin, so split choice and leaf values are
  * partition-order independent (ties broken by (feature, threshold)
  * order); squared-loss leaf value = shrunk mean residual.
  * Iterative trainer → rows-only gate + GradientBoostSpec.
  */
object GradientBoost {

  /** One threshold stump: x[feature] <= threshold → left else right. */
  final case class Stump(feature: String, threshold: Int, left: Double, right: Double)

  /** feature name → ordered candidate bins (inclusive domain). */
  private val featureBins: Seq[(String, Range)] =
    Seq("hour" -> (0 to 23), "dow" -> (0 to 6), "month" -> (1 to 12))

  private def featFrame(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull).select(
      col("event_id"),
      hour(col("ts")).cast("int").as("hour"),
      (dayofweek(col("ts")) - 1).cast("int").as("dow"),
      month(col("ts")).cast("int").as("month"),
      col("value").cast("double").as("y"))

  /** Fit the base score F₀ (global mean) and `iters` shrunk stumps. */
  def fit(events: DataFrame, iters: Int = 10, lr: Double = 0.1): (Double, Seq[Stump]) = {
    val df = featFrame(events).cache()
    try fitOn(df, iters, lr)
    finally df.unpersist()
  }

  private def fitOn(df: DataFrame, iters: Int, lr: Double): (Double, Seq[Stump]) = {
    val base = df.agg(sum(dec2(col("y"))).cast("double") / count(lit(1))).head().getDouble(0)
    // Bin populations never change across iterations — count them once.
    val countAggs = featureBins.flatMap { case (f, bins) =>
      bins.map(b => sum(when(col(f) === b, 1L).otherwise(0L)).as(s"n_${f}_$b"))
    }
    val nRow = df.agg(countAggs.head, countAggs.tail: _*).head()
    def n(f: String, b: Int): Long = nRow.getLong(nRow.fieldIndex(s"n_${f}_$b"))
    var predExpr: Column = lit(base)
    val stumps = Seq.newBuilder[Stump]
    for (_ <- 1 to iters) {
      // The residual is PROJECTED once per row before aggregating —
      // referencing the (iteration-deep) prediction expression inside
      // all 43 conditional sums would inline 43 copies of it into the
      // aggregate and blow up codegen time.
      val scored = df.withColumn("r",
        round(col("y") - predExpr, 6).cast(DecimalType(18, 6)))
      val sumAggs = featureBins.flatMap { case (f, bins) =>
        bins.map(b => sum(when(col(f) === b, col("r"))).as(s"s_${f}_$b"))
      }
      val row = scored.agg(sumAggs.head, sumAggs.tail: _*).head()
      def s(f: String, b: Int): Double = {
        val v = row.getDecimal(row.fieldIndex(s"s_${f}_$b"))
        if (v == null) 0.0 else v.doubleValue()
      }
      // Best split maximizes S_L²/n_L + S_R²/n_R (the SSE-reduction
      // surrogate for squared loss); deterministic (feature,
      // threshold) iteration order breaks exact ties.
      var best: (Double, Stump) = null
      featureBins.foreach { case (f, bins) =>
        val sTot = bins.map(s(f, _)).sum
        val nTot = bins.map(n(f, _)).sum
        var sL = 0.0; var nL = 0L
        bins.init.foreach { t =>
          sL += s(f, t); nL += n(f, t)
          val nR = nTot - nL; val sR = sTot - sL
          if (nL > 0 && nR > 0) {
            val score = sL * sL / nL + sR * sR / nR
            if (best == null || score > best._1) {
              best = (score, Stump(f, t, lr * sL / nL, lr * sR / nR))
            }
          }
        }
      }
      if (best != null) {
        val st = best._2
        stumps += st
        predExpr = predExpr +
          when(col(st.feature) <= st.threshold, lit(st.left)).otherwise(lit(st.right))
      }
    }
    (base, stumps.result())
  }

  /** Evaluate a fitted model as pure Column algebra. */
  private def score(base: Double, stumps: Seq[Stump]): Column =
    stumps.foldLeft(lit(base): Column) { (acc, st) =>
      acc + when(col(st.feature) <= st.threshold, lit(st.left)).otherwise(lit(st.right))
    }

  /** Fit + full-corpus predictions/residuals (one extra scan; the
    * model is plan literals, so inference is shuffle-free).
    */
  def predict(events: DataFrame, iters: Int = 10, lr: Double = 0.1): DataFrame = {
    val (base, stumps) = fit(events, iters, lr)
    featFrame(events)
      .select(col("event_id"), col("y").as("value"),
        (round(score(base, stumps), 6) + lit(0.0)).as("prediction"))
      .withColumn("residual", round(col("value") - col("prediction"), 6) + lit(0.0))
      .orderBy(col("event_id"))
  }
}
