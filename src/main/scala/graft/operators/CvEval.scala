package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series cross-validated model evaluation — the reference
  * demo's `evaluate(model, X, y, cv=ts_cv)` loop
  * (finanalyzer/regressors/to_review/plot_cyclical_feature_engineering.py:222-238),
  * which scores every feature encoding by MAE/RMSE across the
  * TimeSeriesSplit folds. Composes [[Curation.timeSplit]] (fold
  * membership), [[Ridge]] (closed-form fit on each fold's TRAIN
  * slice), and per-fold error aggregation over the TEST slice.
  *
  * Scale shape: fold membership is one prefix-sum pass; each fold's
  * fit is one Gram aggregation over the train slice (36 decimals to
  * the driver) and each fold's scoring is one filtered scan with the
  * coefficients as plan literals — nSplits × 2 passes total, nothing
  * row-level on the driver. Per-fold errors aggregate from
  * 6-dp-quantized residuals so the metrics are partition-order
  * independent. Iterative (a fit per fold) → rows-only gate +
  * CvEvalSpec.
  */
object CvEval {

  /** One row per fold: train/test sizes, MAE, RMSE of the ridge
    * model fit on that fold's expanding window.
    */
  def ridgeCv(events: DataFrame, nSplits: Int = 5, gap: Long = 48,
              maxTrainSize: Long = 10000, testSize: Long = 1000,
              alpha: Double = 1.0): DataFrame = {
    val folds = Curation.timeSplit(events, nSplits, gap, maxTrainSize, testSize)
      .select(col("fold"), col("role"), col("event_id"))
      .localCheckpoint(true) // consumed 2× per fold; computed once
    val perFold = (0L until nSplits.toLong).map { f =>
      val ids = folds.filter(col("fold") === f)
      val train = events.join(ids.filter(col("role") === "train").select(col("event_id")), "event_id")
      val beta = Ridge.fit(train, alpha)
      val test = events.join(ids.filter(col("role") === "test").select(col("event_id")), "event_id")
      Ridge.predictWith(test, beta)
        .agg(count(lit(1)).as("n_test"),
          (round(avg(abs(col("residual"))), 6) + lit(0.0)).as("mae"),
          (round(sqrt(avg(col("residual") * col("residual"))), 6) + lit(0.0)).as("rmse"))
        .select(lit(f).as("fold"), col("n_test"), col("mae"), col("rmse"))
    }
    perFold.reduce(_ unionByName _).orderBy(col("fold"))
  }
}
